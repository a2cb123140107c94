"""Round-11 REAL third-party interop pins (the r10 convention:
every new codec lands with a real file or a visible documented skip).

The star: CPython's test-suite ``python.webp`` — a REAL libwebp
encoder's VP8X container (lossless-coded ALPH alpha + lossy VP8 key
frame) that r10 quarantined as the declared lossy boundary. The r11
from-spec RFC 6386 decoder must now produce output PIXEL-IDENTICAL
to the system libwebp (ctypes oracle — the strongest interop pin in
the repo: Y/U/V planes, alpha plane, and final RGBA all bit-exact),
and match the independent PNG decode of the same logo within the
lossy-encode tolerance even on hosts without libwebp.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import glob
import os
import struct

import numpy as np
import pytest


def _imghdr_dir():
    hits = glob.glob(
        "/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.webp"
    )
    return os.path.dirname(hits[0]) if hits else None


def _libwebp():
    for cand in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not cand:
            continue
        try:
            return ctypes.CDLL(cand)
        except OSError:
            continue
    return None


def _vp8_chunk(blob: bytes) -> bytes:
    off = 12
    while off + 8 <= len(blob):
        cid = blob[off : off + 4]
        (sz,) = struct.unpack("<I", blob[off + 4 : off + 8])
        if cid == b"VP8 ":
            return blob[off + 8 : off + 8 + sz]
        off += 8 + sz + (sz & 1)
    raise AssertionError("no VP8 chunk")


def test_real_webp_bit_exact_vs_system_libwebp():
    """python.webp through our from-spec decoder vs the real libwebp,
    plane for plane and pixel for pixel. A single wrong probability
    table entry, prediction formula, loop-filter tap, upsampling
    weight, or conversion coefficient fails this test."""
    d = _imghdr_dir()
    if d is None:
        pytest.skip("no host python.webp available")
    lib = _libwebp()
    if lib is None:
        pytest.skip("no system libwebp to compare against (visible host gap; "
                    "the PNG-twin test below still pins the decode)")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators import vp8
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
        decode_webp_rgba,
    )

    blob = open(os.path.join(d, "python.webp"), "rb").read()

    # --- YUV planes ---
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yptr = lib.WebPDecodeYUV(
        blob, len(blob), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert yptr
    H, W, S, US = h.value, w.value, stride.value, uv_stride.value
    gty = np.ctypeslib.as_array(yptr, shape=(H, S))[:, :W].copy()
    gtu = np.ctypeslib.as_array(up, shape=((H + 1) // 2, US))[:, : (W + 1) // 2].copy()
    gtv = np.ctypeslib.as_array(vp, shape=((H + 1) // 2, US))[:, : (W + 1) // 2].copy()
    y, u, v, ww, hh = vp8.decode_frame(_vp8_chunk(blob))
    assert (ww, hh) == (W, H) == (16, 16)
    assert np.array_equal(y, gty), "Y plane diverges from libwebp"
    assert np.array_equal(u, gtu), "U plane diverges from libwebp"
    assert np.array_equal(v, gtv), "V plane diverges from libwebp"

    # --- full RGBA (ALPH plane + fancy upsampling + conversion) ---
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    ptr = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    gt = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 4)).copy()
    rgba, _, _ = decode_webp_rgba(blob)
    assert np.array_equal(rgba, gt), "RGBA diverges from libwebp"


def test_real_webp_matches_png_twin():
    """Independent-decoder cross-check that runs even without a system
    libwebp: the same 16x16 logo exists as python.png; the lossy webp
    decode must agree with our PNG decoder on the opaque center within
    the encode tolerance, and the LOSSLESS alpha plane must make the
    same opacity decisions."""
    d = _imghdr_dir()
    if d is None:
        pytest.skip("no host python.webp available")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
        decode_webp_rgba,
    )

    webp = open(os.path.join(d, "python.webp"), "rb").read()
    png = open(os.path.join(d, "python.png"), "rb").read()
    rgba, w, h = decode_webp_rgba(webp)
    ref, w2, h2 = decode_image(png)
    assert (w, h) == (w2, h2) == (16, 16)
    center = np.abs(
        rgba[4:12, 4:12, :3].astype(int) - ref[4:12, 4:12].astype(int)
    )
    assert center.mean() < 12.0, f"lossy decode too far from PNG twin: {center.mean()}"
    # alpha: the snake bodies are fully opaque, the corners fully
    # transparent (the lossless ALPH plane; exact values are pinned
    # bit-for-bit against libwebp in the test above)
    assert (rgba[1, 4:11, 3] == 255).all() and (rgba[9, 5:11, 3] == 255).all()
    assert (rgba[0, 0:4, 3] == 0).all() and (rgba[15, 0:4, 3] == 0).all()


def test_real_webp_alpha_uses_short_distance_map():
    """The ALPH plane of python.webp is a headerless VP8L stream that
    uses short-distance codes — the r10 declared boundary. Nulling the
    seam must reproduce the r10 named error; the generated map decodes
    it (and the bit-exact test above pins the pixel values)."""
    d = _imghdr_dir()
    if d is None:
        pytest.skip("no host python.webp available")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators import webp as W
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
        decode_webp_rgba,
    )

    blob = open(os.path.join(d, "python.webp"), "rb").read()
    saved = W.SHORT_DISTANCE_MAP
    try:
        W.SHORT_DISTANCE_MAP = None
        with pytest.raises(ValueError, match="short-distance"):
            decode_webp_rgba(blob)
    finally:
        W.SHORT_DISTANCE_MAP = saved
    rgba, _, _ = decode_webp_rgba(blob)
    assert rgba.shape == (16, 16, 4)
