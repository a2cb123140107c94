"""HEVC intra fixture ENCODER — the bitstream-writing twin of
operators/hevc_decode.py (ITU-T H.265 §7/§9 mirrored), kept simple on
purpose: CTB 16, uniform 16x16 2Nx2N CUs, DC luma+chroma prediction,
full residual coding (the encoder computes real forward-transformed,
quantized residuals so any image round-trips within quantization
error). It exists so corpus queries can grade the DECODER end-to-end
without depending on the host's libx265, and so tests can pin OUR
encoder's output against the system libde265 — interop in both
directions. Not an optimizing encoder; never meant to be.
"""

from __future__ import annotations

import numpy as np

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
    _BitW,
    add_emulation,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264_cabac import (
    RANGE_TAB_LPS,
    TRANS_IDX_LPS,
    TRANS_IDX_MPS,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
    _DCT,
    _LEVEL_SCALE,
    _SIG_MAP_4x4,
    INIT_I,
    _dequant,
    _init_ctx,
    _inv_transform,
    _last_ctx,
    _predict_intra,
    _ref_samples,
    _scan,
    _sig_ctx,
    chroma_qp,
)


class HevcCabacEnc:
    """§9.3.4 encoder mirror over the HEVC I-slice context set."""

    __slots__ = ("bits", "range", "low", "outstanding", "first", "ctx")

    def __init__(self, qp: int):
        self.bits: list[int] = []
        self.range = 510
        self.low = 0
        self.outstanding = 0
        self.first = True
        self.ctx = {
            name: [_init_ctx(v, qp) for v in vals]
            for name, vals in INIT_I.items()
        }

    def _put(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.bits.append(b)
        while self.outstanding:
            self.bits.append(1 - b)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self.low -= 512
                self._put(1)
            elif self.low < 256:
                self._put(0)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def decision(self, name: str, idx: int, bit: int) -> None:
        st = self.ctx[name][idx]
        state, mps = st
        lps = RANGE_TAB_LPS[state][(self.range >> 6) & 3]
        self.range -= lps
        if bit != mps:
            self.low += self.range
            self.range = lps
            if state == 0:
                st[1] = 1 - mps
            st[0] = TRANS_IDX_LPS[state]
        else:
            st[0] = TRANS_IDX_MPS[state]
        self._renorm()

    def bypass(self, bit: int) -> None:
        self.low <<= 1
        if bit:
            self.low += self.range
        if self.low >= 1024:
            self.low -= 1024
            self._put(1)
        elif self.low < 512:
            self._put(0)
        else:
            self.low -= 512
            self.outstanding += 1

    def bypass_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bypass((value >> i) & 1)

    def terminate(self, bit: int) -> None:
        self.range -= 2
        if bit:
            self.low += self.range
            self.range = 2
            self._renorm()
            self._put((self.low >> 9) & 1)
            self.bits.append((self.low >> 8) & 1)
            self.bits.append(1)
        else:
            self._renorm()


def _fwd_quant(res: np.ndarray, qp: int, log2n: int,
               bd: int = 8) -> np.ndarray:
    """Forward transform + quantize so that the spec dequant+inverse
    reproduces ``res`` within quantization error (float math — encoder
    freedom; conformance only constrains the decoder). ``qp`` is Qp'
    (QpBdOffset folded in, matching the decoder's dequant domain)."""
    n = 1 << log2n
    t = _DCT[n].astype(np.float64)
    norm = float(n) * 4096.0  # row norm² of the integer matrices
    coef = t @ res.astype(np.float64) @ t.T * (1 << 19) / (norm * norm)
    # stage-1 inverse shift is fixed at 7; the 19 above is 7 + 12, so
    # rescale for the bit-depth-dependent stage-2 shift (20 - bd)
    coef *= float(1 << (20 - bd)) / float(1 << 12)
    bd_shift = bd + log2n - 5
    step = 16.0 * (_LEVEL_SCALE[qp % 6] << (qp // 6)) / (1 << bd_shift)
    lvl = np.rint(coef / step).astype(np.int64)
    return np.clip(lvl, -32767, 32767)


def _enc_remaining(c: HevcCabacEnc, value: int, rice: int) -> None:
    """coeff_abs_level_remaining binarization (§9.3.3.13 mirror)."""
    if (value >> rice) <= 3:
        prefix = value >> rice
        for _ in range(prefix):
            c.bypass(1)
        c.bypass(0)
        c.bypass_bits(value & ((1 << rice) - 1), rice)
        return
    # escape: find p >= 4 with value in [((1<<(p-3))+2)<<rice, next)
    p = 4
    while value >= (((1 << (p - 3 + 1)) + 2) << rice):
        p += 1
    for _ in range(p):
        c.bypass(1)
    c.bypass(0)
    suffix = value - (((1 << (p - 3)) + 2) << rice)
    c.bypass_bits(suffix, p - 3 + rice)


def _enc_residual(c: HevcCabacEnc, coefs: np.ndarray, log2n: int,
                  c_idx: int, scan_idx: int) -> None:
    """Mirror of hevc_decode._decode_residual."""
    n = 1 << log2n
    luma = c_idx == 0
    inner = _scan(scan_idx, 4)
    inner_pos = {p: i for i, p in enumerate(inner)}
    nsb = n >> 2
    sb_scan = _scan(scan_idx, nsb)
    sb_pos = {p: i for i, p in enumerate(sb_scan)}
    ys, xs = np.nonzero(coefs)
    assert len(ys), "cbf=1 block must carry at least one coefficient"
    last_sp = max(
        sb_pos[(x >> 2, y >> 2)] * 16 + inner_pos[(x & 3, y & 3)]
        for y, x in zip(ys, xs)
    )
    last_sb, last_in = last_sp >> 4, last_sp & 15
    lx, ly = sb_scan[last_sb]
    ix, iy = inner[last_in]
    px, py = (lx << 2) + ix, (ly << 2) + iy
    if scan_idx == 2:
        px, py = py, px
    off, shift = _last_ctx(log2n, luma)
    cmax = (log2n << 1) - 1
    def last_bin(val):
        # §9.3.3.2 binarization: prefix < 4 is the value itself; above,
        # val = (2 + (prefix & 1)) << ((prefix >> 1) - 1) + suffix
        if val < 4:
            return val, 0, 0
        prefix = 3
        while True:
            prefix += 1
            bits = (prefix >> 1) - 1
            base = (2 + (prefix & 1)) << bits
            if base <= val < base + (1 << bits):
                return prefix, bits, val - base

    parts = [("last_x",) + last_bin(px), ("last_y",) + last_bin(py)]
    # syntax order: BOTH prefixes first, then both suffixes (§7.3.8.11)
    for name, prefix, _bits, _suffix in parts:
        for i in range(prefix):
            c.decision(name, off + (i >> shift), 1)
        if prefix < cmax:
            c.decision(name, off + (prefix >> shift), 0)
    for _name, prefix, bits, suffix in parts:
        if prefix > 3:
            c.bypass_bits(suffix, bits)
    csbf = np.zeros((nsb, nsb), dtype=np.uint8)
    sb_has = {}
    for i in range(last_sb + 1):
        sx, sy = sb_scan[i]
        blk = coefs[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4]
        sb_has[i] = bool(np.any(blk))
        csbf[sy, sx] = 1 if (sb_has[i] or i == 0 or i == last_sb) else 0
    c1 = 1
    for i in range(last_sb, -1, -1):
        sbx, sby = sb_scan[i]
        flag = int(csbf[sby, sbx]) if sb_has[i] or i in (0, last_sb) else 0
        if not (i == last_sb or i == 0):
            right = csbf[sby, sbx + 1] if sbx + 1 < nsb else 0
            below = csbf[sby + 1, sbx] if sby + 1 < nsb else 0
            ctx = min(1, int(right) + int(below)) + (0 if luma else 2)
            flag = 1 if sb_has[i] else 0
            c.decision("csbf", ctx, flag)
            csbf[sby, sbx] = flag
        if not flag:
            continue
        right = csbf[sby, sbx + 1] if sbx + 1 < nsb else 0
        below = csbf[sby + 1, sbx] if sby + 1 < nsb else 0
        infer_dc = 1 if (0 < i < last_sb) else 0
        sig_pos = []
        start = last_in if i == last_sb else 15
        if i == last_sb:
            sig_pos.append(start)
            start -= 1
        for sp in range(start, -1, -1):
            xin, yin = inner[sp]
            v = coefs[(sby << 2) + yin, (sbx << 2) + xin]
            sig = 1 if v else 0
            if sp > 0 or not infer_dc:
                ctx = _sig_ctx((sbx << 2) + xin, (sby << 2) + yin, log2n,
                               c_idx, scan_idx, int(right), int(below))
                c.decision("sig", ctx, sig)
                if sig:
                    sig_pos.append(sp)
                    infer_dc = 0
            else:
                # DC inferred significant: the fixture encoder must
                # ensure it really is (callers guarantee via quant)
                assert v != 0, "inferred-DC subblock without a DC coeff"
                sig_pos.append(sp)
        if not sig_pos:
            continue
        levels = []
        for sp in sig_pos:
            xin, yin = inner[sp]
            levels.append(int(coefs[(sby << 2) + yin, (sbx << 2) + xin]))
        ctx_set = (2 if (i > 0 and luma) else 0) + (1 if c1 == 0 else 0)
        c1 = 1
        gt1 = []
        for j, lvl in enumerate(levels):
            if j >= 8:
                break
            g = 1 if abs(lvl) > 1 else 0
            base = (0 if luma else 16) + 4 * ctx_set
            c.decision("gt1", base + c1, g)
            gt1.append(g)
            if g:
                c1 = 0
            elif 0 < c1 < 3:
                c1 += 1
        gt2_idx = next((j for j, g in enumerate(gt1) if g), None)
        gt2 = 0
        if gt2_idx is not None:
            gt2 = 1 if abs(levels[gt2_idx]) > 2 else 0
            c.decision("gt2", (0 if luma else 4) + ctx_set, gt2)
        for lvl in levels:
            c.bypass(1 if lvl < 0 else 0)
        rice = 0
        first2 = 1
        for j, lvl in enumerate(levels):
            a = abs(lvl)
            implied = 1
            if j < len(gt1):
                implied += gt1[j]
                if j == gt2_idx:
                    implied += gt2
            base_level = (2 + first2) if j < 8 else 1
            if implied == base_level:
                _enc_remaining(c, a - base_level, rice)
                if a > 3 * (1 << rice):
                    rice = min(rice + 1, 4)
            else:
                assert a == implied, "level not representable by flags"
            if a >= 2:
                first2 = 0


def encode_hevc_intra(frames, qp: int = 30, bit_depth: int = 8) -> bytes:
    """Encode 4:2:0 frames ((y, u, v) uint8 tuples — uint16 with
    samples 0..1023 for ``bit_depth=10``; dims multiples of 16) as an
    all-intra Annex-B stream: CTB 16, uniform 16x16 CUs, DC
    prediction, real quantized residuals at constant ``qp``.
    ``bit_depth=10`` emits a Main10 stream (profile_idc 2)."""
    if not 4 <= qp <= 51:
        raise ValueError("fixture encoder qp must be 4..51")
    if bit_depth not in (8, 10):
        raise ValueError("fixture encoder bit_depth must be 8 or 10")
    h, w = frames[0][0].shape
    if h % 16 or w % 16 or h < 16 or w < 16:
        raise ValueError("fixture encoder needs dimensions multiple of 16")
    out = bytearray()

    def nal(typ: int, rbsp: bytes) -> bytes:
        return (b"\x00\x00\x00\x01"
                + bytes([(typ << 1) & 0x7E, 0x01]) + add_emulation(rbsp))

    # SPS (mirrors parse_sps_intra field-for-field)
    wtr = _BitW()
    wtr.w(0, 4)  # vps id
    wtr.w(0, 3)
    wtr.w(1, 1)
    wtr.w(0, 2); wtr.w(0, 1)
    wtr.w(1 if bit_depth == 8 else 2, 5)  # Main / Main10 profile_idc
    wtr.w((1 << 30) | (0 if bit_depth == 8 else (1 << 29)), 32)
    wtr.w(0b1011, 4); wtr.w(0, 32); wtr.w(0, 11); wtr.w(0, 1)
    wtr.w(93, 8)
    wtr.ue(0)  # sps id
    wtr.ue(1)  # chroma 4:2:0
    wtr.ue(w); wtr.ue(h)
    wtr.w(0, 1)  # no conformance window
    wtr.ue(bit_depth - 8); wtr.ue(bit_depth - 8)  # bit depths
    wtr.ue(4)  # log2_max_poc_lsb = 8
    wtr.w(1, 1)  # sub_layer_ordering_info_present
    wtr.ue(1); wtr.ue(0); wtr.ue(0)
    wtr.ue(0)  # log2_min_cb = 3
    wtr.ue(1)  # log2_ctb = 4 (CTB 16)
    wtr.ue(0)  # log2_min_tb = 2
    wtr.ue(2)  # log2_max_tb = 4
    wtr.ue(0); wtr.ue(0)  # max trafo depths
    wtr.w(0, 1)  # scaling lists
    wtr.w(0, 1)  # amp
    wtr.w(0, 1)  # sao
    wtr.w(0, 1)  # pcm
    wtr.ue(0)  # num_short_term_ref_pic_sets
    wtr.w(0, 1)  # long term
    wtr.w(0, 1)  # temporal mvp
    wtr.w(0, 1)  # strong intra smoothing
    # VUI with video_full_range_flag=1: full-range YCbCr signalling so
    # third-party decoders (libheif's HEIC path honours the VUI range)
    # convert with the same T.871/BT.601-full math this pipeline uses —
    # keeps the fixture-encoder HEIC pin pixel-exact (§E.2.1).
    wtr.w(1, 1)  # vui_parameters_present
    wtr.w(0, 1)  # aspect_ratio_info_present
    wtr.w(0, 1)  # overscan_info_present
    wtr.w(1, 1)  # video_signal_type_present
    wtr.w(5, 3)  # video_format: unspecified
    wtr.w(1, 1)  # video_full_range_flag
    wtr.w(0, 1)  # colour_description_present
    wtr.w(0, 1)  # chroma_loc_info_present
    wtr.w(0, 1)  # neutral_chroma_indication
    wtr.w(0, 1)  # field_seq_flag
    wtr.w(0, 1)  # frame_field_info_present
    wtr.w(0, 1)  # default_display_window
    wtr.w(0, 1)  # vui_timing_info_present
    wtr.w(0, 1)  # bitstream_restriction
    wtr.w(0, 1)  # sps extension
    wtr.trailing()
    out += nal(33, wtr.payload())
    # PPS
    wtr = _BitW()
    wtr.ue(0); wtr.ue(0)
    wtr.w(0, 1)  # dependent slices
    wtr.w(0, 1)  # output flag present
    wtr.w(0, 3)  # extra slice header bits
    wtr.w(0, 1)  # sign data hiding
    wtr.w(0, 1)  # cabac init present
    wtr.ue(0); wtr.ue(0)
    wtr.se(qp - 26)  # init_qp
    wtr.w(0, 1)  # constrained intra
    wtr.w(0, 1)  # transform skip
    wtr.w(0, 1)  # cu qp delta
    wtr.se(0); wtr.se(0)  # cb/cr offsets
    wtr.w(0, 1)  # slice chroma qp offsets present
    wtr.w(0, 1); wtr.w(0, 1)  # weighted pred/bipred
    wtr.w(0, 1)  # transquant bypass
    wtr.w(0, 1); wtr.w(0, 1)  # tiles / wpp
    wtr.w(0, 1)  # loop filter across slices
    wtr.w(1, 1)  # deblocking control present
    wtr.w(0, 1)  # override enabled
    wtr.w(1, 1)  # pps deblocking DISABLED
    wtr.w(0, 1)  # pps scaling list
    wtr.w(0, 1)  # lists modification
    wtr.ue(0)  # log2 parallel merge level
    wtr.w(0, 1)  # slice header extension
    wtr.w(0, 1)  # pps extension
    wtr.trailing()
    out += nal(34, wtr.payload())

    for y_pl, u_pl, v_pl in frames:
        out += nal(20, _encode_frame(y_pl, u_pl, v_pl, qp,
                                     bit_depth))  # IDR_N_LP
    return bytes(out)


def _encode_frame(y_pl, u_pl, v_pl, qp: int, bd: int = 8) -> bytes:
    h, w = y_pl.shape
    qp_bd = 6 * (bd - 8)
    maxv = (1 << bd) - 1
    mid = 1 << (bd - 1)
    wtr = _BitW()
    wtr.w(1, 1)  # first_slice_segment_in_pic
    wtr.w(0, 1)  # no_output_of_prior_pics
    wtr.ue(0)  # pps id
    wtr.ue(2)  # slice_type I
    wtr.se(0)  # slice qp delta (deblock override absent: flag off)
    wtr.w(1, 1)  # byte_alignment: alignment_bit_equal_to_one
    while wtr.n:
        wtr.w(0, 1)
    header = wtr.payload()

    qpc_cb = chroma_qp(qp, 0, qp_bd)
    qpc_cr = chroma_qp(qp, 0, qp_bd)
    planes = [y_pl.astype(np.int32), u_pl.astype(np.int32),
              v_pl.astype(np.int32)]
    recon = [np.zeros_like(p) for p in planes]
    avail = [np.zeros(((p.shape[0] + 3) >> 2, (p.shape[1] + 3) >> 2),
                      dtype=bool) for p in planes]
    enc = HevcCabacEnc(qp)

    def code_block(plane_idx, x0, y0, log2n, qp_p):
        """DC-predict + quantize; returns (coefs or None, recon_block)."""
        n = 1 << log2n
        src = planes[plane_idx][y0 : y0 + n, x0 : x0 + n]
        left, top = _ref_samples(recon[plane_idx], avail[plane_idx],
                                 x0, y0, n, 2, mid)
        pred = _predict_intra(left, top, n, 1, plane_idx == 0, maxv)
        res = src - pred
        lvl = _fwd_quant(res, qp_p + qp_bd, log2n, bd)
        if not np.any(lvl):
            blk = np.clip(pred, 0, maxv)
            return None, blk
        r = _inv_transform(_dequant(lvl, qp_p + qp_bd, log2n, bd=bd),
                           dst=False, bd=bd)
        blk = np.clip(pred + r, 0, maxv)
        return lvl, blk

    for cy in range(0, h, 16):
        for cx in range(0, w, 16):
            # coding_quadtree at CTB: log2 4 > min 3 and fully inside
            enc.decision("split_cu", _split_ctx(cx, cy), 0)
            _SPLIT_DEPTH[(cx >> 3, cy >> 3)] = 0
            _SPLIT_DEPTH[((cx >> 3) + 1, cy >> 3)] = 0
            _SPLIT_DEPTH[(cx >> 3, (cy >> 3) + 1)] = 0
            _SPLIT_DEPTH[((cx >> 3) + 1, (cy >> 3) + 1)] = 0
            # CU 16x16: part_mode not parsed (log2 4 != min_cb 3)
            # prev_intra_luma_pred_flag: all-DC world → MPM {0,1,26},
            # DC at index 1
            enc.decision("prev_intra_luma", 0, 1)
            enc.bypass(1)  # mpm_idx = 1 (TR: "10")
            enc.bypass(0)
            enc.decision("intra_chroma", 0, 0)  # derived (DC)
            # transform tree: TB16 (no split possible at maxdepth 0)
            lvl_y, blk_y = code_block(0, cx, cy, 4, qp)
            lvl_cb, blk_cb = code_block(1, cx >> 1, cy >> 1, 3, qpc_cb)
            lvl_cr, blk_cr = code_block(2, cx >> 1, cy >> 1, 3, qpc_cr)
            enc.decision("cbf_chroma", 0, 1 if lvl_cb is not None else 0)
            enc.decision("cbf_chroma", 0, 1 if lvl_cr is not None else 0)
            enc.decision("cbf_luma", 1, 1 if lvl_y is not None else 0)
            if lvl_y is not None:
                _enc_residual(enc, lvl_y, 4, 0, 0)
            recon[0][cy : cy + 16, cx : cx + 16] = blk_y
            avail[0][cy >> 2 : (cy >> 2) + 4, cx >> 2 : (cx >> 2) + 4] = True
            if lvl_cb is not None:
                _enc_residual(enc, lvl_cb, 3, 1, 0)
            if lvl_cr is not None:
                _enc_residual(enc, lvl_cr, 3, 2, 0)
            recon[1][cy >> 1 : (cy >> 1) + 8, cx >> 1 : (cx >> 1) + 8] = blk_cb
            recon[2][cy >> 1 : (cy >> 1) + 8, cx >> 1 : (cx >> 1) + 8] = blk_cr
            for pi in (1, 2):
                avail[pi][cy >> 3 : (cy >> 3) + 2,
                          cx >> 3 : (cx >> 3) + 2] = True
            last = cx + 16 >= w and cy + 16 >= h
            enc.terminate(1 if last else 0)

    data = bytearray(header)
    cur = 0
    nb = 0
    for b in enc.bits:
        cur = (cur << 1) | b
        nb += 1
        if nb == 8:
            data.append(cur)
            cur = 0
            nb = 0
    if nb:
        data.append(cur << (8 - nb))
    return bytes(data)


# split_cu context needs left/above CU depths; the uniform encoder
# keeps a tiny global map (reset per frame is unnecessary: depths are
# always 0)
_SPLIT_DEPTH: dict = {}


def _split_ctx(cx: int, cy: int) -> int:
    ctx = 0
    if cx > 0 and _SPLIT_DEPTH.get(((cx - 1) >> 3, cy >> 3), 0) > 0:
        ctx += 1
    if cy > 0 and _SPLIT_DEPTH.get((cx >> 3, (cy - 1) >> 3), 0) > 0:
        ctx += 1
    return ctx
