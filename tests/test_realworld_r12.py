"""Round-12 real-file / real-library pins (the python.webp/libwebp
discipline): every r12 format change lands here with a third-party
artifact or ctypes-library ground truth, or a visible documented-gap
skip."""

from __future__ import annotations

import ctypes
import glob
import tempfile

import numpy as np
import pytest


def _libtiff():
    hits = glob.glob("/usr/lib/*/libtiff.so*")
    if not hits:
        pytest.skip("no system libtiff (host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFReadRGBAImage.restype = ctypes.c_int
    lib.TIFFReadRGBAImage.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    return lib


def test_jpeg_in_tiff_photometric_2_rgb_coded_vs_real_libtiff():
    """Photometric-2 JPEG-in-TIFF stores RGB-coded JPEG components (no
    YCbCr transform — r11 advice item): a file written by the REAL
    libtiff+libjpeg with PHOTOMETRIC_RGB must decode to within IDCT
    tolerance of libtiff's own TIFFReadRGBAImage. Before the r12 fix
    the decoder applied the T.871 inverse transform to these
    components, shifting every color."""
    lib = _libtiff()
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)

    with tempfile.NamedTemporaryFile(suffix=".tif") as f:
        tif = lib.TIFFOpen(f.name.encode(), b"w")
        assert tif
        # photometric 2 (RGB) + compression 7: libjpeg encodes the
        # components in RGB color space (no forward transform)
        for tag, val in [(256, w), (257, h), (258, 8), (259, 7), (262, 2),
                         (277, 3), (284, 1), (278, 16), (65537, 95)]:
            lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                             ctypes.c_int(val))
        for r in range(h):
            row = img[r].copy()
            assert lib.TIFFWriteScanline(
                tif, row.ctypes.data_as(ctypes.c_void_p), r, 0
            ) == 1
        lib.TIFFClose(tif)
        blob = open(f.name, "rb").read()

        tif = lib.TIFFOpen(f.name.encode(), b"r")
        raster = (ctypes.c_uint32 * (w * h))()
        assert lib.TIFFReadRGBAImage(tif, w, h, raster, 0) == 1
        lib.TIFFClose(tif)
    v = np.ctypeslib.as_array(raster).reshape(h, w)
    gt = np.stack(
        [v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=-1
    ).astype(np.uint8)[::-1]

    px, ww, hh = decode_tiff(blob)
    assert (ww, hh) == (w, h)
    diff = np.abs(px.astype(int) - gt.astype(int))
    # two independent IDCTs of the same RGB-coded stream
    assert diff.max() <= 4, diff.max()
    assert diff.mean() < 0.6, diff.mean()
