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


# ---------------------------------------------------------------------------
# r11 raster wave: every imghdrdata twin of the SAME logo through an
# independent parser pair (the r10 TIFF convention)


def test_real_sun_raster_matches_png_twin_exactly():
    d = _imghdr_dir()
    if d is None:
        pytest.skip("no host imghdrdata available")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
        sniff_image_format,
    )

    ras = open(os.path.join(d, "python.ras"), "rb").read()
    assert sniff_image_format(ras) == "ras"
    px, w, h = decode_image(ras)
    ref, _, _ = decode_image(open(os.path.join(d, "python.png"), "rb").read())
    # a REAL 32-bit RT_FORMAT_RGB file: whole-frame pixel-for-pixel
    assert (w, h) == (16, 16) and np.array_equal(px, ref)


def test_real_sgi_matches_png_twin_exactly():
    d = _imghdr_dir()
    if d is None:
        pytest.skip("no host imghdrdata available")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
        sniff_image_format,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sgi import (
        decode_sgi_rgba,
    )

    sgi = open(os.path.join(d, "python.sgi"), "rb").read()
    assert sniff_image_format(sgi) == "sgi"
    px, w, h = decode_image(sgi)
    ref, _, _ = decode_image(open(os.path.join(d, "python.png"), "rb").read())
    # a REAL RLE RGBA file: whole-frame pixel-for-pixel
    assert (w, h) == (16, 16) and np.array_equal(px, ref)
    rgba, _, _ = decode_sgi_rgba(sgi)
    assert rgba.shape == (16, 16, 4)
    assert rgba[0, 0, 3] == 0  # transparent corner


def test_real_exr_matches_png_twin_exactly():
    d = _imghdr_dir()
    if d is None:
        pytest.skip("no host imghdrdata available")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exr import (
        decode_exr,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
        sniff_image_format,
    )

    exr = open(os.path.join(d, "python.exr"), "rb").read()
    assert sniff_image_format(exr) == "exr"
    px, w, h = decode_image(exr)
    ref, _, _ = decode_image(open(os.path.join(d, "python.png"), "rb").read())
    # a REAL uncompressed half-float RGBA file storing value/255:
    # whole-frame pixel-for-pixel through the registry adapter
    assert (w, h) == (16, 16) and np.array_equal(px, ref)
    chans, _, _ = decode_exr(exr)
    assert sorted(chans) == ["A", "B", "G", "R"]
    assert chans["A"][0, 0] == 0.0 and chans["A"][8, 8] == 1.0


def test_real_xbm_and_pbm_twins_bit_exact():
    """The SAME 1-bit logo in two formats with OPPOSITE bit orders
    (XBM LSB-first, PBM MSB-first), through two independent parsers —
    any bit-order or padding defect breaks the equality."""
    d = _imghdr_dir()
    if d is None:
        pytest.skip("no host imghdrdata available")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pnm import (
        decode_pbm_bits,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xbm import (
        decode_xbm,
    )

    xb, w1, h1 = decode_xbm(open(os.path.join(d, "python.xbm"), "rb").read())
    pb, w2, h2 = decode_pbm_bits(open(os.path.join(d, "python.pbm"), "rb").read())
    assert (w1, h1) == (w2, h2) == (16, 16)
    assert np.array_equal(xb, pb)
    assert 0 < int(xb.sum()) < 256  # real ink, not all-0/all-1


def test_real_pgm_decodes_and_correlates_with_png_luma():
    d = _imghdr_dir()
    if d is None:
        pytest.skip("no host imghdrdata available")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pnm import (
        decode_pnm_gray,
    )

    g, w, h = decode_pnm_gray(open(os.path.join(d, "python.pgm"), "rb").read())
    assert (w, h) == (16, 16)
    ref, _, _ = decode_image(open(os.path.join(d, "python.png"), "rb").read())
    r, gg, b = (ref[..., i].astype(np.float64) for i in range(3))
    luma709 = 0.2126 * r + 0.7152 * gg + 0.0722 * b
    # the REAL file is the Rec.709 luma of the same logo, to within
    # its producer's rounding — every sample within 1 gray level
    assert np.abs(np.round(luma709) - g.astype(np.float64)).max() <= 1.0
