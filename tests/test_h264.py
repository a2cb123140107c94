"""H.264 intra-only decoder (operators/h264.py): the SURVEY §5 tier
(a)-(e) codec verification ladder.

(a) analytic fixtures — DC-only I_16x16 macroblocks reconstruct to
    closed-form flat offsets (pixel = pred + 4*C at QP 40), chroma DC
    shifts land through the documented T.871 conversion, I_PCM carries
    exact pixels;
(b) spec-literal hand-assembled streams (the encoder writes real
    SPS/PPS/IDR CAVLC bitstreams bit by bit);
(c) cross-implementation invariants — the PUBLISHED CAVLC worked
    example (Richardson, "H.264 and MPEG-4 Video Compression", the
    standard TotalCoeff=5/T1=3 block) must encode AND decode to the
    exact published 24-bit string; the inverse core transform must
    equal an independent matrix-form model on even inputs; every
    intra prediction formula is checked against an independent
    re-derivation in this file;
(d) mutation fuzz pinning the ValueError-only tear contract;
(e) property tests — CAVLC encode->decode identity across all shipped
    nC contexts, structural table validators proven to catch
    single-entry corruption.
"""

from __future__ import annotations

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators import h264 as H


def _flat(v):
    return np.full((16, 16), v, dtype=np.int64)


def _gray_mbs(dcs):
    """I_16x16 DC-prediction MB specs with the given DC levels."""
    return [{"kind": "i16", "pred": 2, "dc": [c] if c else []} for c in dcs]


# --- (e) property: CAVLC roundtrip over all shipped contexts ---------------


def test_cavlc_roundtrip_all_contexts():
    rng = np.random.default_rng(7)
    for trial in range(3000):
        nc = int(rng.choice([0, 1, 2, 3, 8, 16, -1]))
        size = 4 if nc == -1 else int(rng.choice([15, 16]))
        coeffs = [0] * size
        for p in rng.choice(size, size=int(rng.integers(0, min(5, size))), replace=False):
            v = int(rng.integers(-2000, 2001))
            coeffs[p] = v if v else 1
        w = H._BitW()
        H.encode_residual_cavlc(w, coeffs, nc)
        w.trailing()
        assert H.decode_residual_cavlc(H._Bits(w.payload()), nc, size) == coeffs


def test_cavlc_large_level_escape_ladder():
    """Levels far beyond the 12-bit suffix force prefix>=16 escapes."""
    for lv in (2047, 2048, 5000, 40000, -40000):
        coeffs = [lv] + [0] * 15
        w = H._BitW()
        H.encode_residual_cavlc(w, coeffs, 0)
        w.trailing()
        assert H.decode_residual_cavlc(H._Bits(w.payload()), 0, 16) == coeffs


# --- (c) the published CAVLC worked example --------------------------------


def test_cavlc_published_worked_example():
    """Richardson's standard worked example: zigzag block
    [0,3,0,1,-1,-1,0,1,0...] -> TotalCoeff=5, TrailingOnes=3,
    total_zeros=3 -> the exact published bitstring
    000010001110010111101101 at nC=0. A wrong entry in coeff_token,
    total_zeros or run_before breaks this NON-CIRCULARLY (the expected
    bits come from published literature, not from this repo's code)."""
    coeffs = [0, 3, 0, 1, -1, -1, 0, 1] + [0] * 8
    w = H._BitW()
    H.encode_residual_cavlc(w, coeffs, 0)
    got = ""
    for byte in w.out:
        got += format(byte, "08b")
    got += format(w.buf & ((1 << w.n) - 1), f"0{w.n}b") if w.n else ""
    assert got == "000010001110010111101101"
    w.trailing()
    assert H.decode_residual_cavlc(H._Bits(w.payload()), 0, 16) == coeffs


# --- (e) structural validators actually catch corruption --------------------


def test_table_validator_catches_single_entry_corruption():
    codes = list(H._CT_NC01.values())
    broken = codes.copy()
    broken[5] = broken[3]  # duplicate
    with pytest.raises(AssertionError):
        H._validate_prefix_table("x", broken)
    broken2 = codes.copy()
    broken2[0] = "0000"  # prefix of the long zero-led codes
    with pytest.raises(AssertionError):
        H._validate_prefix_table("x", broken2)
    assert sorted(H._ME_CBP_INTRA) == list(range(48))


# --- (a) analytic reconstruction: I_PCM and DC-only I_16x16 -----------------


def test_pcm_roundtrip_exact():
    rng = np.random.RandomState(3)
    y = rng.randint(0, 256, (16, 16)).astype(np.int64)
    cb = np.full((8, 8), 128, np.int64)
    cr = np.full((8, 8), 128, np.int64)
    px, w, h = H.decode_idr(H.encode_idr(1, 1, [{"kind": "pcm", "y": y, "cb": cb, "cr": cr}]))
    assert (w, h) == (16, 16)
    # Cb=Cr=128 -> T.871 gives R=G=B=Y exactly
    for c in range(3):
        assert np.array_equal(px[:, :, c].astype(np.int64), y)


def test_i16_dc_only_closed_form():
    """QP 40: dequant+Hadamard turn a lone DC level C into a flat
    (256*C+32)>>6 = 4*C offset; DC prediction chains across MBs with
    hand-computed means. The expected pixels here are HAND-DERIVED from
    the spec formulas (documented in-line), not from the decoder."""
    mbs = [
        {"kind": "i16", "pred": 2, "dc": [-7]},  # pred 128 -> 128-28 = 100
        {"kind": "i16", "pred": 2, "dc": []},    # left-edge mean 100 -> 100
        {"kind": "i16", "pred": 2, "dc": [20]},  # top mean 100, +80 -> 180
        # both edges: (16*100 + 16*180 + 16) >> 5 = 140, +40 -> 180
        {"kind": "i16", "pred": 2, "dc": [10]},
    ]
    px, w, h = H.decode_idr(H.encode_idr(2, 2, mbs))
    y = px[:, :, 0].astype(int)
    assert (y[:16, :] == 100).all() and (y[16:, :] == 180).all()
    assert np.array_equal(px[:, :, 1], px[:, :, 0])


def test_i16_vertical_horizontal_plane_modes():
    """V copies the exact top row; H the exact left column; Plane on a
    constant border is that constant (a+b*0+c*0 path, hand-derived)."""
    grad = np.tile(np.arange(16, 200, 11, dtype=np.int64)[:16], (16, 1))
    base = {"kind": "pcm", "y": grad, "cb": np.full((8, 8), 128, np.int64),
            "cr": np.full((8, 8), 128, np.int64)}
    # MB(1,0): Vertical from MB(0,0)'s bottom row? no — V uses TOP MB.
    # layout 2x2: MB0 PCM gradient; MB1 right of it (H from left col);
    # MB2 below (V copies MB0 bottom row); MB3 plane over flat edges.
    flat = {"kind": "pcm", "y": _flat(77), "cb": np.full((8, 8), 128, np.int64),
            "cr": np.full((8, 8), 128, np.int64)}
    mbs = [base, flat,
           {"kind": "i16", "pred": 0, "dc": []},   # MB2: V from MB0
           {"kind": "i16", "pred": 3, "dc": []}]   # MB3: plane from MB1/MB2
    px, w, h = H.decode_idr(H.encode_idr(2, 2, mbs))
    y = px[:, :, 0].astype(np.int64)
    assert np.array_equal(y[16:, :16], np.tile(grad[15], (16, 1)))  # V exact
    # MB3 plane, hand-derived (8.3.3.4): top edge = flat 77 (MB1),
    # left edge = 181 (MB2's V-copied right column), tl = Y[15,15] =
    # grad[15,15] = 181 — tl enters the H sum at x'=7:
    # Hs = 8*(77-181) = -832, b = (5*Hs+32)>>6 = -65; Vs = 0 -> c = 0;
    # a = 16*(181+77) = 4128; pred[y][x] = (4128 - 65*(x-7) + 16) >> 5
    tlv, tv, lv = int(grad[15, 15]), 77, 181
    hs = 8 * (tv - tlv)
    b = (5 * hs + 32) >> 6
    a = 16 * (lv + tv)
    exp_row = [(a + b * (x - 7) + 16) >> 5 for x in range(16)]
    assert np.array_equal(y[16:, 16:], np.tile(exp_row, (16, 1)))
    # H mode: separate 1x2 picture
    mbs2 = [base, {"kind": "i16", "pred": 1, "dc": []}]
    px2, _, _ = H.decode_idr(H.encode_idr(2, 1, mbs2))
    y2 = px2[:, :, 0].astype(np.int64)
    assert np.array_equal(y2[:, 16:], np.tile(grad[:, 15][:, None], (1, 16)))


def _ref_pred4(mode, l, t, tl):
    """Independent re-derivation of the 9 Intra_4x4 formulas (tier c):
    written directly from ITU-T 8.3.1.2.1-9 without looking at the
    decoder's implementation."""
    p = np.zeros((4, 4), dtype=np.int64)
    full_t = list(t)  # 8 entries
    for y in range(4):
        for x in range(4):
            if mode == 0:
                p[y, x] = full_t[x]
            elif mode == 1:
                p[y, x] = l[y]
            elif mode == 2:
                p[y, x] = (sum(full_t[:4]) + sum(l) + 4) >> 3
            elif mode == 3:
                p[y, x] = (
                    (full_t[6] + 3 * full_t[7] + 2) >> 2
                    if x == y == 3
                    else (full_t[x + y] + 2 * full_t[x + y + 1] + full_t[x + y + 2] + 2) >> 2
                )
            elif mode == 4:
                if x > y:
                    p[y, x] = (full_t[x - y - 2] + 2 * full_t[x - y - 1] + full_t[x - y] + 2) >> 2
                elif x < y:
                    p[y, x] = (l[y - x - 2] + 2 * l[y - x - 1] + l[y - x] + 2) >> 2
                else:
                    p[y, x] = (full_t[0] + 2 * tl + l[0] + 2) >> 2
            elif mode == 5:
                z = 2 * x - y
                q = [tl] + full_t
                r = [tl] + list(l)
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (q[x - (y >> 1)] + q[x - (y >> 1) + 1] + 1) >> 1
                elif z > 0:
                    p[y, x] = (q[x - (y >> 1) - 1] + 2 * q[x - (y >> 1)] + q[x - (y >> 1) + 1] + 2) >> 2
                elif z == -1:
                    p[y, x] = (l[0] + 2 * tl + full_t[0] + 2) >> 2
                else:
                    p[y, x] = (r[y - 2 * x] + 2 * r[y - 2 * x - 1] + r[y - 2 * x - 2] + 2) >> 2
            elif mode == 6:
                z = 2 * y - x
                q = [tl] + list(l)
                r = [tl] + full_t
                if z >= 0 and z % 2 == 0:
                    p[y, x] = (q[y - (x >> 1)] + q[y - (x >> 1) + 1] + 1) >> 1
                elif z > 0:
                    p[y, x] = (q[y - (x >> 1) - 1] + 2 * q[y - (x >> 1)] + q[y - (x >> 1) + 1] + 2) >> 2
                elif z == -1:
                    p[y, x] = (l[0] + 2 * tl + full_t[0] + 2) >> 2
                else:
                    p[y, x] = (r[x - 2 * y] + 2 * r[x - 2 * y - 1] + r[x - 2 * y - 2] + 2) >> 2
            elif mode == 7:
                i = x + (y >> 1)
                p[y, x] = (
                    (full_t[i] + full_t[i + 1] + 1) >> 1
                    if y % 2 == 0
                    else (full_t[i] + 2 * full_t[i + 1] + full_t[i + 2] + 2) >> 2
                )
            elif mode == 8:
                z = x + 2 * y
                i = y + (x >> 1)
                if z % 2 == 0 and z < 6:
                    p[y, x] = (l[i] + l[i + 1] + 1) >> 1
                elif z % 2 == 1 and z < 5:
                    p[y, x] = (l[i] + 2 * l[i + 1] + l[i + 2] + 2) >> 2
                elif z == 5:
                    p[y, x] = (l[2] + 3 * l[3] + 2) >> 2
                else:
                    p[y, x] = l[3]
    return p


@pytest.mark.parametrize("mode", range(9))
def test_i4x4_modes_match_independent_model(mode):
    """End-to-end: a PCM top-left MB provides exact random neighbours,
    the I_4x4 MB copies predictions (zero residual); decoded pixels for
    block 0 must equal the independent formula model."""
    rng = np.random.RandomState(mode + 10)
    ytop = rng.randint(30, 220, (16, 16)).astype(np.int64)
    yleft = rng.randint(30, 220, (16, 16)).astype(np.int64)
    ytl = rng.randint(30, 220, (16, 16)).astype(np.int64)
    c128 = np.full((8, 8), 128, np.int64)
    pcm = lambda yy: {"kind": "pcm", "y": yy, "cb": c128, "cr": c128}
    mbs = [pcm(ytl), pcm(ytop), pcm(yleft), {"kind": "i4", "modes": [mode] * 16}]
    px, _, _ = H.decode_idr(H.encode_idr(2, 2, mbs))
    y = px[:, :, 0].astype(np.int64)
    blk = y[16:20, 16:20]  # block 0 of the I_4x4 MB
    l = yleft[0:4, 15]
    t = list(ytop[15, 0:8])
    tl = int(ytl[15, 15])
    exp = _ref_pred4(mode, l, t, tl)
    assert np.array_equal(blk, np.clip(exp, 0, 255)), f"mode {mode}"


def test_i16_single_ac_coefficient_matrix_model():
    """One AC coefficient through dequant + the inverse core transform:
    at QP 40 the dequantized values are all even, so the bit-exact
    butterfly equals the exact rational matrix model computed here
    independently (tier c)."""
    # AC coefficient +3 at zigzag position 5 of block 0 (matrix (0,2))
    ac = {0: [0, 0, 0, 0, 3] + [0] * 10}  # AC scan starts at zigzag 1
    mbs = [{"kind": "i16", "pred": 2, "dc": [], "ac": ac}]
    px, _, _ = H.decode_idr(H.encode_idr(1, 1, mbs))
    y = px[:, :, 0].astype(np.int64)
    # dequant at qp=40 (per=6, rem=4): position (0,2) is even-even ->
    # normAdjust v0=16, LS=16*16=256, d = (3*256) << (6-4) = 3072
    d = np.zeros((4, 4), dtype=np.float64)
    d[0, 2] = 3072.0
    T = np.array([[1, 1, 1, 0.5], [1, 0.5, -1, -1], [1, -0.5, -1, 1], [1, -1, 1, -0.5]])
    r = T @ d @ T.T
    exp = np.clip(128 + np.floor((r + 32) / 64).astype(np.int64), 0, 255)
    assert np.array_equal(y[0:4, 0:4], exp)
    # untouched blocks stay at the DC prediction 128
    assert (y[8:, 8:] == 128).all()


def test_chroma_dc_shift_through_t871():
    """A lone chroma DC level shifts Cb flat; the decoded RGB must match
    the documented T.871 conversion computed here independently."""
    # qPc for QP 40, offset 0 -> qPi 40 -> qPc 36; chroma DC scaling:
    # ((f * LS) << 6) >> 5 with f = 4*C (2x2 hadamard of lone C at (0,0)
    # spreads C to all four) ... wait: hadamard of [C,0;0,0] gives C at
    # all four positions; LS(qPc=36: rem 0 -> 10*16=160).
    C = 2
    dc = ((C * 160) << 6) >> 5  # per-block DC feeding the 4x4 transform
    offset = (dc + 32) >> 6  # flat per-pixel chroma offset
    mbs = [{"kind": "i16", "pred": 2, "dc": [], "cb_dc": [C, 0, 0, 0]}]
    px, _, _ = H.decode_idr(H.encode_idr(1, 1, mbs))
    yv, cbv = 128.0, float(128 + offset)
    r = round(yv + 1.402 * (128.0 - 128.0))
    g = round(yv - 0.344136 * (cbv - 128.0) - 0.714136 * (128.0 - 128.0))
    b = round(yv + 1.772 * (cbv - 128.0))
    assert (px[:, :, 0] == r).all()
    assert (px[:, :, 1] == g).all()
    assert (px[:, :, 2] == b).all()


def test_multi_slice_prediction_isolation():
    """Slice 2 must not predict from slice 1: its first MB sees no
    available neighbours and falls back to DC 128 (+ its own offset)."""
    mbs = _gray_mbs([-7, 0, 0, 0])  # row0 = 100; row1 in its own slice
    px1, _, _ = H.decode_idr(H.encode_idr(2, 2, mbs, slice_starts=(0,)))
    px2, _, _ = H.decode_idr(H.encode_idr(2, 2, mbs, slice_starts=(0, 2)))
    y1 = px1[:, :, 0].astype(int)
    y2 = px2[:, :, 0].astype(int)
    assert (y1[16:, :] == 100).all()  # single slice: predicted from top
    assert (y2[16:, :] == 128).all()  # second slice: isolated -> 128


def test_cropping():
    mbs = _gray_mbs([-7, 0, 0, 0])
    px, w, h = H.decode_idr(H.encode_idr(2, 2, mbs, crop=(0, 4, 0, 4)))
    assert (w, h) == (24, 24)
    assert px.shape == (24, 24, 3)


def test_emulation_prevention_roundtrip():
    """A PCM payload full of zero bytes forces 00 00 sequences through
    the RBSP escape path in both directions."""
    y = np.zeros((16, 16), dtype=np.int64)
    y[3, 3] = 200
    c0 = np.zeros((8, 8), np.int64)
    stream = H.encode_idr(1, 1, [{"kind": "pcm", "y": y, "cb": c0, "cr": c0}])
    px, _, _ = H.decode_idr(stream)
    assert int(px[3, 3, 0]) != int(px[0, 0, 0])  # structure survived


# --- declared boundaries raise ----------------------------------------------


def test_declared_boundaries_raise_value_error():
    sps = H._sps_rbsp(1, 1)
    pps = H._pps_rbsp()
    # CABAC PPS: entropy_coding_mode=1 PARSES since r11 (the former
    # boundary is closed by operators/h264_cabac.py; the flag routes
    # slice decode) — pin the flag round-trip instead of a raise
    w = H._BitW()
    w.ue(0); w.ue(0); w.w(1, 1); w.w(0, 1); w.ue(0); w.ue(0); w.ue(0)
    w.w(0, 1); w.w(0, 2); w.se(0); w.se(0); w.se(0); w.w(1, 1); w.w(0, 1); w.w(0, 1)
    w.trailing()
    assert H.parse_pps(w.payload())["cabac"] is True
    assert H.parse_pps(H._pps_rbsp())["cabac"] is False
    # interlaced SPS
    wi = H._BitW()
    wi.w(66, 8); wi.w(0, 8); wi.w(30, 8); wi.ue(0); wi.ue(0); wi.ue(2)
    wi.ue(1); wi.w(0, 1); wi.ue(0); wi.ue(0); wi.w(0, 1)  # frame_mbs_only=0
    wi.trailing()
    with pytest.raises(ValueError, match="nterlace"):
        H.parse_sps(wi.payload())
    # P slice
    wp = H._BitW()
    wp.ue(0); wp.ue(5)  # slice_type 5 = P
    wp.trailing()
    with pytest.raises(ValueError, match="I slices"):
        H._parse_slice_header(H._Bits(wp.payload()), H.parse_sps(sps), H.parse_pps(pps), 5)
    # nc47 context
    with pytest.raises(ValueError, match="nc47|4<=nC<8"):
        H.decode_residual_cavlc(H._Bits(b"\xff\xff"), 5, 16)


def test_tear_contract_fuzz():
    mbs = _gray_mbs([-7, 5, 20, 10])
    base = H.encode_idr(2, 2, mbs)
    rng = np.random.RandomState(11)
    errors = 0
    for _ in range(300):
        b = bytearray(base)
        for _k in range(rng.randint(1, 4)):
            b[rng.randint(len(b))] ^= 1 << rng.randint(8)
        try:
            H.decode_idr(bytes(b))
        except ValueError:
            errors += 1
        # any other exception type escapes and fails the test
    assert errors > 0


def test_avc_frame_hashes_through_spark(spark):
    """MP4 avc1 -> sample tables -> avcC -> intra decode -> aHash, all
    through the Arrow passes: keyframes hash to the closed-form
    constants; a torn sample and a non-keyframe yield NULL (the
    declared-boundary-per-row convention)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
        avcc_box,
        build_minimal_mp4,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        avc_frame_hashes,
        sample_video_frames,
    )

    mbs0 = _gray_mbs([-7, 0, 20, 10])   # dark top -> aHash -2^32
    mbs1 = _gray_mbs([13, 0, -20, -10])  # bright top -> 2^32-1
    sps, pps, s0 = H.annexb_to_mp4_sample(H.encode_idr(2, 2, mbs0))
    _, _, s1 = H.annexb_to_mp4_sample(H.encode_idr(2, 2, mbs1))
    torn = s0[:10]
    mp4 = build_minimal_mp4(
        [s0, s1, torn],
        width=32,
        height=32,
        config_box=avcc_box(sps, pps),
        keyframes=[1, 2, 3],
    )
    # second doc: frame 2 NOT a keyframe -> NULL without decode attempt
    mp4_nk = build_minimal_mp4(
        [s0, s1],
        width=32,
        height=32,
        config_box=avcc_box(sps, pps),
        keyframes=[1],
    )
    media = spark.createDataFrame(
        [(1, "video", bytearray(mp4), None), (2, "video", bytearray(mp4_nk), None)],
        MEDIA_SCHEMA,
    )
    frames = sample_video_frames(media, every_n=1)
    got = {
        (r.media_id, r.frame_idx): r.ahash
        for r in avc_frame_hashes(frames).collect()
    }
    assert got[(1, 0)] == -(2**32)
    assert got[(1, 1)] == 2**32 - 1
    assert got[(1, 2)] is None  # torn sample: NULL, not an exception
    assert got[(2, 0)] == -(2**32)
    assert got[(2, 1)] is None  # non-keyframe: declared inter boundary


def test_nal_length_prefix_sizes():
    """avcC lengthSizeMinusOne supports 1/2/4-byte sample prefixes —
    the decoder must honour the record's size, not assume 4."""
    import struct as _s

    mbs = _gray_mbs([-7, 0, 20, 10])
    sps, pps, _ = H.annexb_to_mp4_sample(H.encode_idr(2, 2, mbs))
    nals = [
        n for n in H.split_annexb_raw(H.encode_idr(2, 2, mbs))
        if (n[0] & 0x1F) not in (7, 8)
    ]
    for len_size, fmt in ((2, ">H"), (4, ">I")):
        sample = b"".join(_s.pack(fmt, len(n)) + n for n in nals)
        px, w, h = H.decode_access_unit(sample, sps, pps, len_size=len_size)
        assert (w, h) == (32, 32)
        assert (px[:16, :, 0] == 100).all()
    with pytest.raises(ValueError, match="unsupported"):
        H.decode_access_unit(b"\x00\x01x", sps, pps, len_size=3)


def test_oversized_sps_quarantines():
    stream = H._sps_rbsp(600, 600)  # 9600x9600 > 64 Mpx
    with pytest.raises(ValueError, match="64 Mpx"):
        H._Picture(H.parse_sps(stream), H.parse_pps(H._pps_rbsp()))
