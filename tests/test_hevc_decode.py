"""HEVC intra decoder (operators/hevc_decode.py): BIT-EXACT against
the system libde265 on REAL x265-encoded streams with the DEFAULT
in-loop toolset — deblocking, SAO, and sign hiding all ON (both via
ctypes — the VP8/libwebp ground-truth playbook), init-table + deblock
beta/tC extraction pins, named scope boundaries, 300-case tear
fuzz."""

from __future__ import annotations

import glob
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (  # noqa: E402
    INIT_I,
    _DCT,
    decode_hevc_intra,
)


def _rig():
    from hevc_rig import de265_lib, x265_lib

    if x265_lib() is None or de265_lib() is None:
        pytest.skip("no system libx265/libde265 (visible host gap)")
    from hevc_rig import decode_de265, encode_intra, make_frame

    return encode_intra, decode_de265, make_frame


def test_init_tables_match_libde265_rodata():
    """Every I-slice context init table transcribed from the spec must
    appear byte-for-byte in the system libde265's constant data
    (stored there as int32 → stride-4 scan). The r11 technique that
    pinned the shared H.264 arithmetic-engine tables."""
    hits = glob.glob("/usr/lib/*/libde265.so*") + glob.glob(
        "/usr/lib/libde265.so*"
    )
    if not hits:
        pytest.skip("no system libde265 (visible host gap)")
    blob = np.frombuffer(open(hits[0], "rb").read(), dtype=np.uint8)

    def strided_hit(vals) -> bool:
        v = np.array(vals, dtype=np.uint8)
        for i in np.where(blob == v[0])[0]:
            if i + (len(v) - 1) * 4 < len(blob) and np.array_equal(
                blob[i : i + len(v) * 4 : 4], v
            ):
                return True
        return False

    for name, vals in INIT_I.items():
        assert strided_hit(vals), f"{name} init values diverge from libde265"


def test_dct_matrices_match_cosine_form():
    """The built 4/8/16/32 matrices must track the scaled DCT-II float
    form within integer-rounding distance — this catches transcription
    typos (two sign errors in the 32-odd rows were found exactly this
    way during the build)."""
    for n, t in _DCT.items():
        k = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        f = 64 * np.sqrt(2) * np.cos(np.pi * k * (2 * x + 1) / (2 * n))
        f[0] = 64
        assert np.abs(t - f).max() < 1.5, n


@pytest.mark.parametrize(
    "kind,qp,w,h,ctu",
    [
        ("flat", 40, 64, 64, 64),
        ("grad", 32, 64, 64, 64),
        ("mixed", 22, 96, 96, 64),
        ("mixed", 27, 132, 100, 32),
        ("noise", 28, 64, 64, 64),
        ("noise", 45, 96, 96, 32),
        ("mixed", 27, 60, 36, 16),
        ("grad", 20, 128, 96, 64),
    ],
)
def test_bit_exact_vs_libde265(kind, qp, w, h, ctu):
    """Real x265-encoded intra streams (in-scope toolset) decode
    PIXEL-IDENTICAL to the system libde265 on all three planes."""
    encode_intra, decode_de265, make_frame = _rig()
    bs = encode_intra(
        [make_frame(h, w, w + h + qp, kind)], qp=qp,
        extra={b"ctu": str(ctu).encode()},
    )
    gt = decode_de265(bs)[0]
    ours = decode_hevc_intra(bs)[0]
    for c in range(3):
        assert np.array_equal(ours[c], gt[c]), f"plane {c} diverges"


def test_multi_frame_and_encoder_variants():
    encode_intra, decode_de265, make_frame = _rig()
    frames = [
        make_frame(64, 64, s, ("mixed", "noise", "grad", "flat")[s % 4])
        for s in range(4)
    ]
    bs = encode_intra(frames, qp=28)
    gt = decode_de265(bs)
    ours = decode_hevc_intra(bs)
    assert len(ours) == len(gt) == 4
    for o, g in zip(ours, gt):
        for c in range(3):
            assert np.array_equal(o[c], g[c])
    # encoder tool variants: no strong smoothing, rdoq off, deep TU split
    for extra in (
        {b"no-strong-intra-smoothing": None},
        {b"rdoq-level": b"0"},
        {b"tu-intra-depth": b"3"},
        {b"max-tu-size": b"16"},
    ):
        bs = encode_intra([make_frame(64, 64, 7, "mixed")], qp=27, extra=extra)
        gt = decode_de265(bs)[0]
        ours = decode_hevc_intra(bs)[0]
        for c in range(3):
            assert np.array_equal(ours[c], gt[c]), extra


def test_named_scope_boundaries():
    """Out-of-scope streams raise NAMED errors — never wrong pixels:
    inter (P) slices (real x265) and tiles (hand-built PPS — x265
    cannot emit tiles, so the boundary is pinned at the parser)."""
    encode_intra, _decode, make_frame = _rig()
    f = [make_frame(64, 64, 3, "mixed")]
    bs = encode_intra(f * 3, qp=30, extra={b"keyint": b"250"})
    with pytest.raises(ValueError, match="inter slice|intra-only"):
        decode_hevc_intra(bs)
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        _Bits,
        _BitW,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        parse_pps_intra,
    )

    w = _BitW()
    w.w(0x4401, 16)  # PPS NAL header
    w.ue(0)
    w.ue(0)
    for _ in range(5):  # dependent..cabac_init flags / extra bits
        w.w(0, 1)
    w.w(0, 2)  # (3-bit extra field remainder)
    w.ue(0)
    w.ue(0)
    w.se(0)  # init_qp
    w.w(0, 3)  # constrained/tskip/cuqp
    w.se(0)
    w.se(0)
    w.w(0, 3)  # slice-chroma/wp/wbp
    w.w(0, 1)  # tqb
    w.w(1, 1)  # TILES ENABLED
    w.w(0, 1)
    w.trailing()
    with pytest.raises(ValueError, match="tiles outside"):
        parse_pps_intra(w.payload())


def test_adaptive_quant_and_pure_default_bit_exact():
    """cu_qp_delta in scope: aq-mode-2 CRF streams (per-QG QP deltas,
    the QP prediction chain, per-block deblock QPs) and PURE-DEFAULT
    x265 encodes (CRF 28 + aq + cutree, and ABR) decode bit-exact."""
    encode_intra, decode_de265, make_frame = _rig()
    cases = [
        ("mixed", {b"aq-mode": b"2", b"crf": b"20", b"qp": False}),
        ("noise", {b"aq-mode": b"2", b"crf": b"33", b"qp": False}),
        ("grad", {b"qp": False}),                       # pure defaults
        ("mixed", {b"qp": False, b"bitrate": b"400"}),  # ABR
    ]
    for kind, extra in cases:
        bs = encode_intra([make_frame(96, 96, 7, kind)], extra=extra)
        gt = decode_de265(bs)[0]
        ours = decode_hevc_intra(bs)[0]
        for c in range(3):
            assert np.array_equal(ours[c], gt[c]), (kind, extra, c)


def test_default_inloop_toolset_bit_exact():
    """The r12 second wave: deblocking (intra bS=2 path incl. strong/
    weak decisions and beta/tc offsets), SAO (band + all four edge
    classes, merge flags), and sign-data-hiding all decode BIT-EXACT
    against libde265 on real x265 streams — i.e. default-toolset x265
    intra output is now fully in scope."""
    encode_intra, decode_de265, make_frame = _rig()
    cases = [
        ("mixed", 22, 96, 96, {}),
        ("noise", 30, 64, 64, {}),
        ("grad", 40, 128, 96, {}),
        ("mixed", 27, 132, 100, {b"ctu": b"32"}),
        ("noise", 24, 64, 64, {b"deblock": b"2:-2"}),
        ("grad", 33, 96, 64, {b"deblock": b"-3:3"}),
        ("flat", 45, 96, 64, {b"deblock": b"6:6"}),
        ("mixed", 20, 64, 64, {b"no-sao": None}),        # deblock only
        ("mixed", 20, 64, 64, {b"no-deblock": None}),    # SAO only
        ("noise", 35, 64, 64, {b"no-signhide": None}),   # SDH off again
    ]
    for kind, qp, w, h, extra in cases:
        bs = encode_intra([make_frame(h, w, qp + w, kind)], qp=qp,
                          extra=extra)
        gt = decode_de265(bs)[0]
        ours = decode_hevc_intra(bs)[0]
        for c in range(3):
            assert np.array_equal(ours[c], gt[c]), (kind, qp, extra, c)


def test_deblock_tables_match_libde265_rodata():
    """beta' / tC' (Tables 8-11) transcriptions appear byte-for-byte
    in libde265's constant data."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        _BETA_TABLE,
        _TC_TABLE,
    )

    hits = glob.glob("/usr/lib/*/libde265.so*")
    if not hits:
        pytest.skip("no system libde265 (visible host gap)")
    blob = open(hits[0], "rb").read()
    assert bytes(_BETA_TABLE[16:]) in blob
    assert bytes(_TC_TABLE[18:]) in blob


def test_tear_contract_fuzz():
    """300 truncations/bitflips/deletions: ValueError or a tolerant
    decode — never a raw internal error or hang."""
    encode_intra, _decode, make_frame = _rig()
    bs = encode_intra([make_frame(64, 64, 9, "mixed")], qp=30)
    rnd = random.Random(11)
    for trial in range(300):
        b = bytearray(bs)
        mode = trial % 3
        if mode == 0:
            b = b[: rnd.randrange(8, len(b))]
        elif mode == 1:
            for _ in range(rnd.randrange(1, 4)):
                b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        else:
            i = rnd.randrange(len(b) - 40)
            del b[i : i + rnd.randrange(1, 30)]
        try:
            decode_hevc_intra(bytes(b))
        except ValueError:
            pass


def test_fixture_encoder_decodes_identically_in_libde265_and_ours():
    """The from-spec fixture ENCODER's streams decode bit-identically
    in BOTH the system libde265 and our decoder — interop in the
    opposite direction from the x265 battery — and the reconstruction
    tracks the source within quantization error."""
    from hevc_rig import de265_lib

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
        encode_hevc_intra,
    )

    if de265_lib() is None:
        pytest.skip("no system libde265 (visible host gap)")
    from hevc_rig import decode_de265, make_frame

    for seed, qp, w, h, kind in [
        (3, 24, 64, 48, "mixed"),
        (7, 12, 96, 64, "noise"),
        (9, 38, 48, 48, "grad"),
        (1, 30, 16, 16, "flat"),
    ]:
        y, u, v = make_frame(h, w, seed, kind)
        bs = encode_hevc_intra([(y, u, v)], qp=qp)
        ours = decode_hevc_intra(bs)[0]
        gt = decode_de265(bs)[0]
        for c in range(3):
            assert np.array_equal(ours[c], gt[c]), (kind, qp, c)
        mean_err = np.abs(
            ours[0].astype(int) - y.astype(int)
        ).mean()
        # fixture-quality sanity (DC-only prediction): tracks the
        # source within quantization error on average
        assert mean_err <= 3 + qp / 2, (kind, qp, mean_err)


def test_hevc_mp4_keyframe_decode_chain(spark):
    """[r12] The container→decode chain: an hvc1 MP4 built around the
    fixture encoder's IRAP samples flows through sample_video_frames
    (hvcC parameter sets in the sps column) and hevc_frame_hashes to
    per-keyframe aHashes equal to direct-decode hashes."""
    import struct

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        split_annexb_raw,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
        encode_hevc_intra,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
        build_minimal_mp4,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        _ahash_pixels,
        hevc_frame_hashes,
        sample_video_frames,
    )
    frames = []
    for s in range(3):
        y = ((np.arange(48)[:, None] + np.arange(64)[None, :]) * (s + 2)
             % 256).astype(np.uint8)
        u = np.full((24, 32), 100 + s, np.uint8)
        v = np.full((24, 32), 140, np.uint8)
        frames.append((y, u, v))
    bs = encode_hevc_intra(frames, qp=26)
    nals = split_annexb_raw(bs)
    psets = [n for n in nals if (n[0] >> 1) & 0x3F >= 32]
    slices = [n for n in nals if (n[0] >> 1) & 0x3F < 32]
    samples = [struct.pack(">I", len(n)) + n for n in slices]
    body = bytearray(b"\x01" + b"\x00" * 20 + bytes([0xFC | 3, len(psets)]))
    for u_ in psets:
        body += bytes([(u_[0] >> 1) & 0x3F])
        body += struct.pack(">HH", 1, len(u_)) + u_
    hvcc = struct.pack(">I", len(body) + 8) + b"hvcC" + bytes(body)
    mp4 = build_minimal_mp4(samples, width=64, height=48, codec=b"hvc1",
                            keyframes=[1, 2, 3], config_box=hvcc)

    expect = []
    for y, _u, _v in (f for f in decode_hevc_intra(bs)):
        px = np.repeat(y[:, :, None], 3, axis=2)
        expect.append(_ahash_pixels(px, 64, 48))

    media = spark.createDataFrame(
        [(1, "video", bytearray(mp4), None)],
        "media_id long, kind string, payload binary, meta string",
    )
    out = (
        hevc_frame_hashes(sample_video_frames(media, keyframes_only=True))
        .orderBy("frame_idx")
        .collect()
    )
    assert [r.frame_idx for r in out] == [0, 1, 2]
    assert all(r.is_keyframe for r in out)
    assert [r.ahash for r in out] == expect


def test_transform_skip_bit_exact():
    """[r12] transform_skip in scope: x265 --tskip streams (screen
    content forces real 4x4 TS blocks — 175/194 TBs in the sharp
    fixture) decode bit-exact; the TS path bypasses the inverse
    transform with the §8.6.4.2 shift chain."""
    encode_intra, decode_de265, make_frame = _rig()
    scr = np.zeros((64, 64), np.uint8)
    scr[::4] = 255
    scr[:, ::6] = 128
    u = np.full((32, 32), 90, np.uint8)
    v = np.full((32, 32), 200, np.uint8)
    for qp in (15, 27):
        bs = encode_intra([(scr, u, v)], qp=qp, extra={b"tskip": None})
        gt = decode_de265(bs)[0]
        ours = decode_hevc_intra(bs)[0]
        for c in range(3):
            assert np.array_equal(ours[c], gt[c]), (qp, c)
    bs = encode_intra([make_frame(64, 64, 4, "noise")], qp=20,
                      extra={b"tskip": None})
    gt = decode_de265(bs)[0]
    ours = decode_hevc_intra(bs)[0]
    for c in range(3):
        assert np.array_equal(ours[c], gt[c])


def test_wpp_streams_bit_exact():
    """[r12] WPP (entropy_coding_sync) in scope: per-row CABAC re-init
    at NAL-domain entry points (emulation bytes counted per §7.4.7.1 —
    mapped through the stripping removal positions), context sync from
    the above row's second CTB, end_of_subset_one_bit, and the
    per-row qPY_PREV reset under aq — real x265 WPP streams decode
    bit-exact, with and without adaptive quant."""
    encode_intra, decode_de265, make_frame = _rig()
    for kind, w, h, extra in [
        ("mixed", 256, 256, {}),
        ("noise", 512, 320, {}),  # large noise: entry points cross
        ("grad", 192, 128, {}),   # emulation-prevention bytes
        ("mixed", 256, 256, {b"qp": False, b"crf": b"26",
                             b"aq-mode": b"2"}),
        ("noise", 512, 320, {b"qp": False, b"crf": b"30",
                             b"aq-mode": b"2"}),
    ]:
        e = {b"wpp": None, b"no-wpp": False, b"pools": b"4"}
        e.update(extra)
        bs = encode_intra([make_frame(h, w, 3 + w, kind)], qp=30, extra=e)
        gt = decode_de265(bs)[0]
        ours = decode_hevc_intra(bs)[0]
        for c in range(3):
            assert np.array_equal(ours[c], gt[c]), (kind, w, h, extra, c)


def test_emulation_map_roundtrip():
    import random

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        add_emulation,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        _nal_to_rbsp,
        _rbsp_to_nal,
        strip_emulation_with_map,
    )

    rnd = random.Random(0)
    for _ in range(120):
        raw = bytes(
            rnd.choice([0, 0, 0, 1, 2, 3, 255])
            for _ in range(rnd.randrange(5, 80))
        )
        nal = add_emulation(raw)
        rbsp, removed = strip_emulation_with_map(nal)
        assert rbsp == raw
        for r in range(len(rbsp)):
            n = _rbsp_to_nal(removed, r)
            assert nal[n] == rbsp[r]
            assert _nal_to_rbsp(removed, n) == r


def test_scaling_lists_default_bit_exact_and_explicit_parse():
    """[r12] scaling lists in scope: x265 '--scaling-list default'
    streams (SPS scaling_list_enabled, default Tables 7-5/7-6
    matrices) decode bit-exact; the default 8x8 matrices AND our
    diagonal-scan mapping appear byte-for-byte in libde265's rodata;
    the explicit scaling_list_data parse path is pinned on hand-built
    bits (explicit DPCM lists, ref-copy, default-by-delta)."""
    encode_intra, decode_de265, make_frame = _rig()
    for kind, qp in (("mixed", 24), ("noise", 36)):
        bs = encode_intra([make_frame(96, 96, qp, kind)], qp=qp,
                          extra={b"scaling-list": b"default"})
        gt = decode_de265(bs)[0]
        ours = decode_hevc_intra(bs)[0]
        for c in range(3):
            assert np.array_equal(ours[c], gt[c]), (kind, qp, c)

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        _DEF_SCALING_8_INTER,
        _DEF_SCALING_8_INTRA,
        _diag_positions,
        build_scaling_factors,
        parse_scaling_list_data,
    )

    hits = glob.glob("/usr/lib/*/libde265.so*")
    if hits:
        blob = open(hits[0], "rb").read()
        for flat in (_DEF_SCALING_8_INTRA, _DEF_SCALING_8_INTER):
            m = np.array(flat).reshape(8, 8)
            diag = bytes(int(m[y, x]) for x, y in _diag_positions(8))
            assert diag in blob

    # hand-built scaling_list_data: every matrix default-by-delta-0
    # except (0,0) explicit ramp and (0,1) copied from (0,0)
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        _Bits,
        _BitW,
    )

    w = _BitW()
    for size_id in range(4):
        step = 3 if size_id == 3 else 1
        for matrix_id in range(0, 6, step):
            if size_id == 0 and matrix_id == 0:
                w.w(1, 1)  # explicit
                prev = 8
                for i, (x, y) in enumerate(_diag_positions(4)):
                    want = 10 + i  # ramp 10..25
                    w.se(want - prev)
                    prev = want
            elif size_id == 0 and matrix_id == 1:
                w.w(0, 1)
                w.ue(1)  # copy from matrix 0
            else:
                w.w(0, 1)
                w.ue(0)  # default list
    w.trailing()
    data = parse_scaling_list_data(_Bits(w.payload()))
    f = build_scaling_factors(data)
    ramp = np.zeros((4, 4), dtype=np.int64)
    for i, (x, y) in enumerate(_diag_positions(4)):
        ramp[y, x] = 10 + i
    assert np.array_equal(f[(0, 0)], ramp)
    assert np.array_equal(f[(0, 1)], ramp)  # ref-copy
    assert np.array_equal(
        f[(1, 0)], np.array(_DEF_SCALING_8_INTRA).reshape(8, 8)
    )
    assert f[(2, 0)][0, 0] == 16 and f[(2, 0)][1, 1] == 16
    assert f[(3, 0)].shape == (32, 32)


def test_qg_per_cu_qp_semantics_regression():
    """Differential fuzz found a ±1 deblock divergence: a CU decoded
    BEFORE its quantization group's delta-carrying CU keeps the
    PREDICTED QP for deblock-edge purposes (per-CU completion-time
    semantics, matching libde265/HM), while the carrier and later CUs
    carry the final QP — neither a pure per-TU nor a whole-QG-refill
    rule matches both sides. Pinned with the exact reproducing stream
    (CTU 16, CRF+aq-2, deblock -3:-2, two frames)."""
    encode_intra, decode_de265, make_frame = _rig()
    extra = {b"ctu": b"16", b"qp": False, b"crf": b"23",
             b"aq-mode": b"2", b"no-signhide": None, b"deblock": b"-3:-2"}
    frames = [make_frame(96, 64, 13 * 7 + i, "mixed") for i in range(2)]
    bs = encode_intra(frames, extra=extra)
    gt = decode_de265(bs)
    ours = decode_hevc_intra(bs)
    assert len(ours) == len(gt) == 2
    for o, g in zip(ours, gt):
        for c in range(3):
            assert np.array_equal(o[c], g[c])


def test_tskip_blocks_use_scaling_lists_bit_exact():
    """[r13 ADVICE-high] §8.6.3 sets m=16 for transform_skip only when
    nTbS>4; v1 TS is always 4x4, so scaling lists DO apply to TS
    blocks. x265 --tskip + a NON-FLAT explicit 4x4 intra-luma scaling
    list (flat defaults masked this) decodes bit-exact vs libde265."""
    import tempfile

    encode_intra, decode_de265, make_frame = _rig()
    from hevc_rig import write_hm_scaling_list

    scr = np.zeros((64, 64), np.uint8)
    scr[::4] = 255
    scr[:, ::6] = 128
    u = np.full((32, 32), 90, np.uint8)
    v = np.full((32, 32), 200, np.uint8)
    with tempfile.NamedTemporaryFile("w", suffix=".txt") as f:
        write_hm_scaling_list(
            f.name,
            intra4_luma=[16, 18, 20, 24, 18, 20, 24, 28,
                         20, 24, 28, 32, 24, 28, 32, 36],
        )
        for qp in (15, 27):
            bs = encode_intra(
                [(scr, u, v)], qp=qp,
                extra={b"tskip": None, b"scaling-list": f.name.encode()},
            )
            gt = decode_de265(bs)[0]
            ours = decode_hevc_intra(bs)[0]
            for c in range(3):
                assert np.array_equal(ours[c], gt[c]), (qp, c)


def test_slice_chroma_qp_offsets_deblock_uses_pps_only():
    """[r13 ADVICE] deblocking QpC derives from the PPS chroma offsets
    ONLY (§8.7.2.5.5); dequant keeps the slice-inclusive offsets. x265
    never emits slice chroma offsets, so the rig splices
    slice_cb/cr_qp_offset into real x265 streams via NAL surgery and
    libde265 decodes the rewritten stream as ground truth. The
    slice-inclusive deblock bug showed chroma maxdiff 2 here."""
    encode_intra, decode_de265, make_frame = _rig()
    from hevc_rig import inject_slice_chroma_offsets

    frames = [make_frame(96, 64, 5, "mixed")]
    for qp, (cb, cr) in [(27, (4, -5)), (20, (-6, 3)), (32, (5, 5))]:
        st = inject_slice_chroma_offsets(
            encode_intra(frames, qp=qp), cb, cr
        )
        gt = decode_de265(st)[0]
        ours = decode_hevc_intra(st)[0]
        for c in range(3):
            assert np.array_equal(ours[c], gt[c]), (qp, cb, cr, c)


def test_st_ref_pic_set_inter_rps_uses_referenced_set_size():
    """[r13 ADVICE] slice-header st_ref_pic_set with
    inter_ref_pic_set_prediction_flag sizes its read loop from the
    REFERENCED set's NumDeltaPocs (RefRpsIdx via delta_idx_minus1),
    not from the last SPS set; the old prev_deltas=[] call desynced
    CRA slice headers."""
    from hevc_rig import BitWriter

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        _Bits,
        _st_ref_pic_set,
    )

    # SPS set 0: explicit, 3 deltas; SPS set 1: predicted from set 0
    # keeping 1 delta; slice-header set (idx=2=num_sets) predicts with
    # delta_idx_minus1=1 -> RefRpsIdx=0 (3 deltas -> 4-iteration loop).
    w = BitWriter()
    w.ue(2)          # set0: num_negative_pics
    w.ue(1)          #       num_positive_pics
    for _ in range(3):
        w.ue(0)      # delta_poc_minus1
        w.u(1, 1)    # used_by_curr_pic
    w.u(1, 1)        # set1: inter_ref_pic_set_prediction_flag
    w.u(0, 1)        #       delta_rps_sign
    w.ue(0)          #       abs_delta_rps_minus1
    for i in range(4):           # NumDeltaPocs[0] + 1
        if i == 0:
            w.u(1, 1)            # used_by_curr_pic -> kept (count=1)
        else:
            w.u(0, 1)            # not used
            w.u(0, 1)            # use_delta_flag = 0 -> dropped
    b = _Bits(w.tobytes())
    deltas = []
    for i in range(2):
        deltas = _st_ref_pic_set(b, i, 2, deltas)
    assert deltas == [3, 1]

    # slice-header set referencing set 0 via delta_idx_minus1=1
    w2 = BitWriter()
    w2.u(1, 1)       # inter_ref_pic_set_prediction_flag
    w2.ue(1)         # delta_idx_minus1 -> RefRpsIdx = 0
    w2.u(0, 1)       # delta_rps_sign
    w2.ue(4)         # abs_delta_rps_minus1
    for _ in range(4):           # sized by set 0's 3 deltas, not set 1's 1
        w2.u(1, 1)
    sentinel_bits = 11
    w2.u(0x5A7 >> 0, sentinel_bits)
    b2 = _Bits(w2.tobytes())
    out = _st_ref_pic_set(b2, 2, 2, [3, 1])
    assert out[-1] == 4
    assert b2.u(sentinel_bits) == 0x5A7  # parse consumed exactly the set

    # out-of-range RefRpsIdx tears with ValueError, not IndexError
    w3 = BitWriter()
    w3.u(1, 1)
    w3.ue(5)         # delta_idx_minus1 -> RefRpsIdx = -4
    w3.u(0, 1)
    w3.ue(0)
    w3.u(0, 8)
    with pytest.raises(ValueError):
        _st_ref_pic_set(_Bits(w3.tobytes()), 2, 2, [3, 1])


def _rig10():
    from hevc_rig import de265_lib, x265_api

    if x265_api(10) is None or de265_lib() is None:
        pytest.skip("no 10-bit x265 API / libde265 (visible host gap)")
    from hevc_rig import decode_de265, encode_intra10, make_frame10

    return encode_intra10, decode_de265, make_frame10


def test_main10_bit_exact_vs_libde265():
    """[r13] Main10 in scope: real x265 10-bit streams (via the
    multilib x265_api_get(10) encoder) decode bit-exact across the
    toolset — base QPs, conformance crop, transform-skip, cu_qp_delta
    (crf + aq-mode 2), WPP, default scaling lists, CTU 32, ABR."""
    encode_intra10, decode_de265, make_frame10 = _rig10()
    cases = [
        (dict(qp=15), (64, 64, 1, "mixed")),
        (dict(qp=27), (96, 64, 2, "mixed")),
        (dict(qp=37), (128, 96, 3, "noise")),
        (dict(qp=27, extra={b"ctu": b"32"}), (60, 44, 4, "mixed")),
        (dict(qp=22, extra={b"tskip": None}), (64, 64, 5, "grad")),
        (dict(qp=27, extra={b"qp": False, b"crf": b"26",
                            b"aq-mode": b"2"}), (128, 128, 6, "mixed")),
        (dict(qp=30, extra={b"wpp": None, b"no-wpp": False,
                            b"pools": b"4"}), (256, 128, 7, "mixed")),
        (dict(qp=24, extra={b"scaling-list": b"default"}),
         (64, 64, 8, "mixed")),
        (dict(qp=27, extra={b"qp": False, b"bitrate": b"400"}),
         (128, 96, 10, "mixed")),
    ]
    for kw, (w, h, seed, kind) in cases:
        st = encode_intra10([make_frame10(w, h, seed, kind)], **kw)
        gt = decode_de265(st)[0]
        ours = decode_hevc_intra(st)[0]
        for c in range(3):
            assert gt[c].dtype == np.uint16
            assert np.array_equal(ours[c], gt[c]), (kw, w, h, c)


def test_main10_fixture_encoder_interop():
    """[r13] The fixture encoder's Main10 output decodes identically
    in libde265 and in our decoder (the libx265-independent stream
    source), and reconstruction stays within quantization error of
    the input."""
    from hevc_rig import de265_lib

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
        encode_hevc_intra,
    )

    try:
        from hevc_rig import decode_de265, make_frame10
    except ImportError:  # pragma: no cover
        pytest.skip("rig unavailable")
    frame = make_frame10(48, 32, 5)
    for qp in (12, 27, 40):
        st = encode_hevc_intra([frame], qp=qp, bit_depth=10)
        ours = decode_hevc_intra(st)[0]
        assert all(p.dtype == np.uint16 for p in ours)
        if de265_lib() is not None:
            gt = decode_de265(st)[0]
            for c in range(3):
                assert np.array_equal(ours[c], gt[c]), (qp, c)
    # quantization-error bound at a quality QP
    st = encode_hevc_intra([frame], qp=12, bit_depth=10)
    y, u, v = decode_hevc_intra(st)[0]
    assert int(np.abs(y.astype(int) - frame[0].astype(int)).max()) <= 24


def test_main10_boundaries():
    """12-bit and mixed-depth SPS tear with named ValueErrors."""
    from hevc_rig import BitWriter

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
        encode_hevc_intra,
    )

    with pytest.raises(ValueError, match="bit_depth"):
        encode_hevc_intra([(np.zeros((16, 16), np.uint16),
                            np.zeros((8, 8), np.uint16),
                            np.zeros((8, 8), np.uint16))], bit_depth=12)
