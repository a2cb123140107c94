"""H.264 CABAC I-slice entropy coding (operators/h264_cabac.py).

Ladder: engine tables extraction-verified against libde265 (H.265
shares them verbatim), engine fuzz roundtrips, and the r10 verdict's
done-criterion — the same frame encoded CAVLC and CABAC decodes to
IDENTICAL pixels. The init-value seam and the no-real-CABAC-file host
gap are pinned visibly at the bottom.
"""

from __future__ import annotations

import glob

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators import h264 as H
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators import (
    h264_cabac as C,
)

rng = np.random.RandomState(11)


# --- engine ------------------------------------------------------------------


def test_engine_tables_match_libde265_rodata():
    """rangeTabLPS and transIdxLPS are normative constants shared
    byte-for-byte with H.265 — verify the transcription against the
    system libde265's constant data (the r11 libwebp convention)."""
    hits = glob.glob("/usr/lib/*/libde265.so*") + glob.glob(
        "/usr/lib/libde265.so*"
    )
    if not hits:
        pytest.skip("no system libde265 to compare against (visible host gap)")
    blob = open(hits[0], "rb").read()
    flat = bytes(v for row in C.RANGE_TAB_LPS for v in row)
    assert flat in blob, "rangeTabLPS transcription diverges from libde265"
    assert bytes(C.TRANS_IDX_LPS) in blob, "transIdxLPS diverges from libde265"


def test_engine_roundtrip_fuzz():
    valid_ctx = [3, 4, 5, 6, 7, 8, 9, 10, 60, 61, 64, 68, 69, 73, 77, 85,
                 105, 166, 227, 275]
    for trial in range(30):
        n = int(rng.randint(1, 500))
        ops = []
        for _ in range(n):
            r = rng.rand()
            if r < 0.6:
                ops.append(("d", int(rng.choice(valid_ctx)), int(rng.randint(0, 2))))
            elif r < 0.9:
                ops.append(("b", None, int(rng.randint(0, 2))))
            else:
                ops.append(("t", None, 0))
        ops.append(("t", None, 1))
        qp = int(rng.randint(0, 52))
        enc = C.CabacEncoder(qp)
        for kind, ctx, bit in ops:
            (enc.decision(ctx, bit) if kind == "d"
             else enc.bypass(bit) if kind == "b" else enc.terminate(bit))
        bits = enc.tobits()
        data = bytearray((len(bits) + 7) // 8)
        for i, b in enumerate(bits):
            data[i >> 3] |= b << (7 - (i & 7))
        dec = C.CabacDecoder(bytes(data) + b"\x00", 0, qp)
        for kind, ctx, bit in ops:
            got = (dec.decision(ctx) if kind == "d"
                   else dec.bypass() if kind == "b" else dec.terminate())
            assert got == bit


def test_unused_pb_contexts_raise():
    enc = C.CabacEncoder(26)
    with pytest.raises(ValueError, match="no I-slice init"):
        enc.decision(20, 0)  # a P-slice context


# --- fixtures ----------------------------------------------------------------


def _sparse(n, k=3):
    v = [0] * n
    for _ in range(k):
        v[int(rng.randint(0, n))] = int(rng.randint(-4, 5)) or 1
    return v


def _safe_modes():
    ms = []
    for b in range(16):
        bx, by = H._BLK4[b]
        opts = [2] + ([0] if by else []) + ([1] if bx else [])
        ms.append(int(rng.choice(opts)))
    return ms


def _rand_mbs(mw, mh, dense=0.4):
    mbs = []
    for a in range(mw * mh):
        if a % 3 == 0:
            mbs.append(
                {"kind": "i16", "pred": 2, "dc": _sparse(16, 4),
                 "ac": {b: _sparse(15, 2) for b in range(16) if rng.rand() < dense},
                 "chroma_mode": 0,
                 "cb_dc": _sparse(4, 1), "cr_dc": _sparse(4, 1),
                 "cb_ac": {b: _sparse(15, 2) for b in range(4) if rng.rand() < dense},
                 "cr_ac": {b: _sparse(15, 2) for b in range(4) if rng.rand() < dense}}
            )
        else:
            mbs.append(
                {"kind": "i4", "modes": _safe_modes(),
                 "coeffs": {b: _sparse(16, 3) for b in range(16) if rng.rand() < dense},
                 "chroma_mode": 0, "cb_dc": _sparse(4, 1)}
            )
    return mbs


@pytest.mark.parametrize("mw,mh,qp", [(1, 1, 40), (2, 2, 30), (4, 3, 26), (3, 2, 12)])
def test_cabac_decodes_identical_to_cavlc_twin(mw, mh, qp):
    """The r10 verdict's done-criterion: one content, two entropy
    coders, IDENTICAL pixels — any defect in the engine, binarizations,
    context derivation, or cbf bookkeeping breaks the equality."""
    mbs = _rand_mbs(mw, mh)
    cavlc = H.encode_idr(mw, mh, mbs, qp=qp)
    cabac = C.encode_idr_cabac(mw, mh, mbs, qp=qp)
    p1, w1, h1 = H.decode_idr(cavlc)
    p2, w2, h2 = H.decode_idr(cabac)
    assert (w1, h1) == (w2, h2)
    assert np.array_equal(p1, p2)


def test_cabac_compresses_better_on_real_content():
    mbs = _rand_mbs(6, 5, dense=0.5)
    cavlc = H.encode_idr(6, 5, mbs, qp=28)
    cabac = C.encode_idr_cabac(6, 5, mbs, qp=28)
    assert len(cabac) < len(cavlc)  # the point of arithmetic coding


def test_empty_residual_frame_roundtrips():
    mbs = [{"kind": "i16", "pred": 2, "dc": [0] * 16, "chroma_mode": 0}
           for _ in range(4)]
    p1, _, _ = H.decode_idr(H.encode_idr(2, 2, mbs, qp=30))
    p2, _, _ = H.decode_idr(C.encode_idr_cabac(2, 2, mbs, qp=30))
    assert np.array_equal(p1, p2)
    assert len(np.unique(p1.reshape(-1, 3), axis=0)) == 1  # uniform frame


# --- boundaries + tears -------------------------------------------------------


def test_pcm_in_cabac_is_declared_boundary():
    pcm = {"kind": "pcm", "y": np.full((16, 16), 7), "cb": np.full((8, 8), 8),
           "cr": np.full((8, 8), 9)}
    with pytest.raises(ValueError, match="I_PCM inside a CABAC slice"):
        C.encode_idr_cabac(1, 1, [pcm])


def test_tear_fuzz_cabac_stream():
    mbs = _rand_mbs(3, 3)
    blob = C.encode_idr_cabac(3, 3, mbs, qp=26)
    ref, _, _ = H.decode_idr(blob)
    cuts = sorted(set(int(x) for x in rng.randint(10, len(blob), 120)))
    for cut in cuts:
        try:
            px, w, h = H.decode_idr(blob[:cut])
            assert px.shape == ref.shape
        except ValueError:
            pass
    for _ in range(60):
        pos = int(rng.randint(len(blob) - 40, len(blob)))  # inside slice data
        mut = bytearray(blob)
        mut[pos] ^= 1 << int(rng.randint(0, 8))
        try:
            px, w, h = H.decode_idr(bytes(mut))
            assert px.shape == ref.shape
        except ValueError:
            pass


# --- the init-value seam ------------------------------------------------------


def test_init_values_are_injectable_seam():
    """CABAC_INIT_I only seeds probabilities: ANY in-range vector gives
    a self-consistent codec. Perturbing the seam must (a) still
    roundtrip encode→decode and (b) change the bitstream — proving the
    values are live, injectable, and non-semantic (the declared-seam
    contract in the module docstring)."""
    mbs = _rand_mbs(2, 2)
    base = C.encode_idr_cabac(2, 2, mbs, qp=30)
    ref, _, _ = H.decode_idr(base)
    saved = list(C.CABAC_INIT_I)
    try:
        C.CABAC_INIT_I[227] = (0, 1)  # strongest-LPS abs-level context
        alt = C.encode_idr_cabac(2, 2, mbs, qp=30)
        out, _, _ = H.decode_idr(alt)
        assert np.array_equal(out, ref)  # self-consistent under any seam
        assert alt != base  # and the seam is actually live
    finally:
        C.CABAC_INIT_I[:] = saved


def test_no_real_cabac_file_on_host_documented():
    """No CABAC-coded H.264 fixture or decoder library ships on this
    host, so the init-value transcription has no offline ground truth
    (the engine tables DO: libde265 above). Visible documented gap —
    if a real main-profile file ever appears here, wire it in."""
    hits = [
        p
        for pat in ("/usr/share/**/*.h264", "/usr/share/**/*.264")
        for p in glob.glob(pat, recursive=True)
    ]
    if not hits:
        pytest.skip(
            "no real CABAC-coded H.264 file on this host: init values "
            "verified structurally + by self-consistency only (documented gap)"
        )
    px, w, h = H.decode_idr(open(hits[0], "rb").read())
    assert px.size


def test_qp_delta_binarization_roundtrip():
    qp = 30
    for delta in (-8, -1, 0, 1, 2, 7):
        enc = C.CabacEncoder(qp)
        ctx = C.MBCtx(1, 1)
        C.CabacSliceWriter(enc, ctx).qp_delta(delta)
        enc.terminate(1)
        bits = enc.tobits()
        data = bytearray((len(bits) + 7) // 8)
        for i, b in enumerate(bits):
            data[i >> 3] |= b << (7 - (i & 7))
        dec = C.CabacDecoder(bytes(data) + b"\x00", 0, qp)
        assert C.CabacSliceReader(dec, C.MBCtx(1, 1)).qp_delta() == delta


def test_residual_categories_roundtrip():
    qp = 26
    for cat, maxc in ((0, 16), (1, 15), (2, 16), (3, 4), (4, 15)):
        for coeffs in (None, [0] * maxc, _sparse(maxc, 2),
                       [67] + [0] * (maxc - 1), [-400] + [1] * (maxc - 1)):
            enc = C.CabacEncoder(qp)
            wr = C.CabacSliceWriter(enc, C.MBCtx(1, 1))
            coded = wr.residual(cat, 0, coeffs)
            enc.terminate(1)
            bits = enc.tobits()
            data = bytearray((len(bits) + 7) // 8)
            for i, b in enumerate(bits):
                data[i >> 3] |= b << (7 - (i & 7))
            dec = C.CabacDecoder(bytes(data) + b"\x00", 0, qp)
            got = C.CabacSliceReader(dec, C.MBCtx(1, 1)).residual(cat, 0)
            want = list(coeffs or [0] * maxc) if coeffs else None
            if want and not any(want):
                want = None
            assert coded == (want is not None)
            assert got == want
