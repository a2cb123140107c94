"""CCITT Group 4 codec (operators/ccitt.py): REAL libtiff-written
compression-4 TIFFs decode pixel-exact (the T.4/T.6 table truth an
own-roundtrip cannot establish), our encoder's streams decode
identically in libtiff, TIFF + PDF routing, tears."""

from __future__ import annotations

import ctypes
import glob
import struct
import tempfile

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ccitt import (
    g4_decode,
    g4_encode,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
    decode_tiff,
)

rng = np.random.RandomState(1)


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


def _libtiff_rgba(lib, path, w, h):
    tif = lib.TIFFOpen(path.encode(), b"r")
    assert tif
    raster = (ctypes.c_uint32 * (w * h))()
    assert lib.TIFFReadRGBAImage(tif, w, h, raster, 0) == 1
    lib.TIFFClose(tif)
    v = np.ctypeslib.as_array(raster).reshape(h, w)
    return np.stack(
        [v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=-1
    ).astype(np.uint8)[::-1]


def test_real_libtiff_g4_files_decode_pixel_exact():
    """Files written by the REAL libtiff G4 encoder decode through our
    T.6 core + TIFF routing to exactly libtiff's own decode — both
    photometrics, widths crossing makeup-code boundaries."""
    lib = _libtiff()
    for (h, w), photo, dens in [
        ((40, 64), 0, 0.5), ((29, 100), 0, 0.9), ((64, 173), 1, 0.2),
        ((8, 1728), 0, 0.04), ((100, 31), 0, 0.97), ((5, 2048), 0, 0.5),
    ]:
        img = (rng.rand(h, w) < dens).astype(np.uint8)
        packed = np.packbits(img, axis=1)
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            tif = lib.TIFFOpen(f.name.encode(), b"w")
            assert tif
            for tag, val in [(256, w), (257, h), (258, 1), (259, 4),
                             (262, photo), (277, 1), (284, 1), (278, h)]:
                lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                                 ctypes.c_int(val))
            for r in range(h):
                row = packed[r].copy()
                assert lib.TIFFWriteScanline(
                    tif, row.ctypes.data_as(ctypes.c_void_p), r, 0
                ) == 1
            lib.TIFFClose(tif)
            blob = open(f.name, "rb").read()
            gt = _libtiff_rgba(lib, f.name, w, h)
        px, ww, hh = decode_tiff(blob)
        assert (ww, hh) == (w, h)
        assert np.array_equal(px, gt), ((h, w), photo)


def _minimal_g4_tiff(img: np.ndarray, photo: int = 0) -> bytes:
    """Hand-rolled single-strip compression-4 TIFF around our encoder's
    stream (for the reverse libtiff pin)."""
    h, w = img.shape
    strip = g4_encode(img)
    entries = []
    for tag, typ, val in [(256, 4, w), (257, 4, h), (258, 3, 1),
                          (259, 3, 4), (262, 3, photo), (273, 4, 8),
                          (277, 3, 1), (278, 4, h), (279, 4, len(strip)),
                          (284, 3, 1)]:
        fmt = "<I" if typ == 4 else "<H"
        entries.append(
            struct.pack("<HHI", tag, typ, 1)
            + struct.pack(fmt, val).ljust(4, b"\x00")
        )
    ifd = struct.pack("<H", len(entries)) + b"".join(entries)
    ifd += struct.pack("<I", 0)
    out = b"II*\x00" + struct.pack("<I", 8 + len(strip)) + strip + ifd
    return out


def test_our_encoder_decodes_identically_in_libtiff():
    """The reverse direction: our g4_encode streams wrapped in a
    minimal TIFF decode in the REAL libtiff to the source image."""
    lib = _libtiff()
    for (h, w), dens in [((40, 64), 0.5), ((23, 200), 0.1), ((64, 64), 0.95)]:
        img = (rng.rand(h, w) < dens).astype(np.uint8)
        blob = _minimal_g4_tiff(img)
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            f.write(blob)
            f.flush()
            gt = _libtiff_rgba(lib, f.name, w, h)
        # photometric 0: ink (1) is black
        expect = np.repeat(((1 - img) * 255)[:, :, None], 3, axis=2)
        assert np.array_equal(gt, expect), (h, w, dens)
        # and through our own TIFF routing
        px, _, _ = decode_tiff(blob)
        assert np.array_equal(px, expect)


def test_roundtrip_shapes_and_modes():
    cases = []
    for w, h in [(64, 40), (1728, 6), (17, 17), (3, 80), (2560, 3)]:
        img = np.zeros((h, w), np.uint8)
        img[h // 4 : h // 2, w // 4 : w // 2] = 1
        cases += [
            img,
            (rng.rand(h, w) > 0.5).astype(np.uint8),
            np.ones((h, w), np.uint8),
            np.zeros((h, w), np.uint8),
        ]
    # a shape that forces pass mode: reference black run ends before
    # the current line's run starts
    z = np.zeros((3, 32), np.uint8)
    z[0, 8:12] = 1
    z[1, 20:24] = 1
    z[2, 2:30] = 1
    cases.append(z)
    for img in cases:
        dec = g4_decode(g4_encode(img), img.shape[1], img.shape[0])
        assert np.array_equal(dec, img), img.shape


def test_rows_none_stops_at_eofb():
    img = (rng.rand(9, 40) > 0.5).astype(np.uint8)
    dec = g4_decode(g4_encode(img), 40, None)
    assert np.array_equal(dec, img)


def test_pdf_ccitt_images_decode_and_named_skips():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        build_pdf,
        extract_pdf_images,
    )

    ink = np.zeros((24, 40), np.uint8)
    ink[6:18, 10:30] = 1
    ink[2, ::3] = 1
    blob = build_pdf(["fax"], images=[{"rgb": ink, "filter": "g4"}])
    imgs = extract_pdf_images(blob)
    assert imgs[0]["fmt"] == "ppm"
    px, w, h = decode_image(imgs[0]["payload"])
    assert (w, h) == (40, 24)
    # PDF default BlackIs1=false: 0 bits are black → ink renders 0
    assert np.array_equal(px[:, :, 0], (1 - ink) * 255)
    # [r13] G3 (K >= 0) and EncodedByteAlign now DECODE (the r12 named
    # skips are closed): every CCITT framing yields the same pixels
    for f in ("g3", "g3_2d", "g3_aligned"):
        blob_g3 = build_pdf(["fax"], images=[{"rgb": ink, "filter": f}])
        imgs_g3 = extract_pdf_images(blob_g3)
        assert imgs_g3[0]["fmt"] == "ppm", f
        px3, w3, h3 = decode_image(imgs_g3[0]["payload"])
        assert np.array_equal(px3[:, :, 0], (1 - ink) * 255), f


def test_tiff_g4_boundaries_and_tears():
    img = (rng.rand(16, 64) > 0.5).astype(np.uint8)
    blob = _minimal_g4_tiff(img)
    # torn strip
    with pytest.raises(ValueError):
        decode_tiff(blob[:20] + blob[40:])
    enc = g4_encode(img)
    for cut in (1, 5, len(enc) // 2):
        with pytest.raises(ValueError):
            g4_decode(enc[:cut], 64, 16)
    # bit flips: ValueError or a decode — never a crash/hang
    for t in range(120):
        b = bytearray(enc)
        b[t % len(b)] ^= 1 << (t % 8)
        try:
            g4_decode(bytes(b), 64, 16)
        except ValueError:
            pass
