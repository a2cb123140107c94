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


# The heavyweight r12 ground-truth batteries live in their own files:
# tests/test_hevc_decode.py (bit-exact vs libde265 on real x265
# streams, both directions) and tests/test_ccitt.py (real libtiff G4
# both directions). The spot-checks below keep every r12 format
# visible in this round's real-world file, per the round discipline.


def test_hevc_intra_real_x265_spot_pin():
    import sys

    sys.path.insert(0, "tools")
    from hevc_rig import de265_lib, x265_lib

    if x265_lib() is None or de265_lib() is None:
        pytest.skip("no system libx265/libde265 (visible host gap)")
    from hevc_rig import decode_de265, encode_intra, make_frame

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        decode_hevc_intra,
    )

    bs = encode_intra([make_frame(64, 64, 42, "mixed")], qp=26)
    gt = decode_de265(bs)[0]
    ours = decode_hevc_intra(bs)[0]
    for c in range(3):
        assert np.array_equal(ours[c], gt[c])


def test_ccitt_g4_real_libtiff_spot_pin():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    lib = _libtiff()
    rng = np.random.RandomState(9)
    h, w = 24, 80
    img = (rng.rand(h, w) < 0.35).astype(np.uint8)
    packed = np.packbits(img, axis=1)
    with tempfile.NamedTemporaryFile(suffix=".tif") as f:
        tif = lib.TIFFOpen(f.name.encode(), b"w")
        for tag, val in [(256, w), (257, h), (258, 1), (259, 4), (262, 0),
                         (277, 1), (284, 1), (278, h)]:
            lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                             ctypes.c_int(val))
        for r in range(h):
            row = packed[r].copy()
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
    px, _, _ = decode_tiff(blob)
    assert np.array_equal(px, gt)


def test_no_real_ogg_with_tags_on_host():
    """Visible documented gap: no third-party .ogg/.oga ships in this
    container (no /usr/share/sounds, no libvorbis), so the Ogg
    comment-metadata surface is pinned on spec-exact fixtures only —
    the transform decode stays a declared boundary for the same
    reason (a from-spec Vorbis decoder here would have only
    self-consistent validation; the LZW round showed why that is not
    enough)."""
    import glob as _glob

    hits = (_glob.glob("/usr/share/sounds/**/*.og[ga]", recursive=True)
            + _glob.glob("/usr/lib/*/libvorbis*"))
    if hits:
        pytest.fail(
            f"real Ogg material appeared on this host ({hits[:3]}) — "
            "promote the fixture-only pins to real-file pins"
        )
    pytest.skip("no real .ogg / libvorbis on this host (visible gap)")
