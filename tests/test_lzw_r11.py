"""Shared LZW core + the PDF filter wave (r11): one implementation
closes the TIFF compression-5 boundary AND the PDF LZWDecode filter
boundary, with ASCIIHex/ASCII85/RunLength alongside.

Ground truth ladder: ASCII85 against the stdlib's independent
implementation; LZW against REAL libtiff-written streams (the system
libtiff via ctypes — skip-guarded host gap); everything else via
exact roundtrips + torn-input contracts.
"""

from __future__ import annotations

import base64
import ctypes
import glob
import re
import tempfile

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lzw import (
    lzw_decode,
    lzw_encode,
)

rng = np.random.RandomState(3)

_CASES = [
    b"",
    b"A",
    b"AAAAAAA",
    b"TOBEORNOTTOBEORTOBEORNOT" * 3,
    bytes(rng.randint(0, 256, 5000)),   # random: fast table growth
    bytes(rng.randint(0, 4, 60000)),    # low entropy: 12-bit cap + clear
    b"ab" * 30000,                      # KwKwK chains at width boundaries
    b"a" * 50000,                       # maximal runs
]


@pytest.mark.parametrize("ec", [1, 0])
@pytest.mark.parametrize("clear_every", [None, 50])
def test_lzw_roundtrip_matrix(ec, clear_every):
    for d in _CASES:
        enc = lzw_encode(d, early_change=ec, clear_every=clear_every)
        assert lzw_decode(enc, early_change=ec) == d


def test_lzw_torn_and_malformed():
    enc = lzw_encode(_CASES[3])
    with pytest.raises(ValueError, match="torn"):
        lzw_decode(enc[: len(enc) // 2])
    def pack9(codes):
        bits = []
        for c in codes:
            bits += [(c >> i) & 1 for i in range(8, -1, -1)]
        out = bytearray((len(bits) + 7) // 8)
        for i, b in enumerate(bits):
            out[i >> 3] |= b << (7 - (i & 7))
        return bytes(out)

    with pytest.raises(ValueError, match="not a literal"):
        lzw_decode(pack9([256, 300, 257]))
    with pytest.raises(ValueError, match="beyond the table"):
        lzw_decode(pack9([256, 65, 300, 257]))
    with pytest.raises(ValueError, match="decode bound"):
        lzw_decode(lzw_encode(b"a" * 5000), max_out=100)


def test_lzw_vs_real_libtiff_streams():
    """REAL third-party LZW: the system libtiff writes LZW strips
    (with and without the horizontal-differencing predictor); our
    from-spec TIFF decoder must reproduce the pixels exactly — this
    pins the TRUE early-change width timing, which a self-roundtrip
    cannot (encoder and decoder would agree on a wrong timing)."""
    hits = glob.glob("/usr/lib/*/libtiff.so*")
    if not hits:
        pytest.skip("no system libtiff to generate real LZW streams (host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    def write_tiff(path, rgb, predictor):
        h, w = rgb.shape[:2]
        tif = lib.TIFFOpen(path.encode(), b"w")
        assert tif
        fields = [(256, w), (257, h), (258, 8), (259, 5), (262, 2),
                  (277, 3), (278, 8), (284, 1)]
        if predictor:
            fields.append((317, predictor))
        for tag, val in fields:
            lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                             ctypes.c_int(val))
        for r in range(h):
            row = rgb[r].copy()  # libtiff differences the buffer IN PLACE
            assert lib.TIFFWriteScanline(
                tif, row.ctypes.data_as(ctypes.c_void_p), r, 0
            ) == 1
        lib.TIFFClose(tif)

    noise = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    smooth = np.tile(
        np.linspace(0, 255, 56).astype(np.uint8)[None, :, None], (40, 1, 3)
    )
    for img, pred in ((noise, 1), (smooth, 2), (noise, 2)):
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            write_tiff(f.name, img, pred)
            px, w, h = decode_tiff(open(f.name, "rb").read())
        assert (w, h) == (56, 40)
        assert np.array_equal(px, img)


def test_tiff_lzw_fixture_roundtrip_and_boundaries():
    """Our own encoder side: splice an LZW strip into encode_tiff
    output? The builder writes compression 1/32773; instead pin the
    decode-side boundary messages stay live for the still-out-of-scope
    codes."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    blob = bytearray(encode_tiff(img))
    # flip compression 1 -> 6 (OLD-style JPEG): still a named boundary
    # (new-style 7 is in scope since the JPEG-in-TIFF wave below)
    i = blob.find((259).to_bytes(2, "little"))
    assert i > 0
    blob[i + 8] = 6
    with pytest.raises(ValueError, match="compression 6"):
        decode_tiff(bytes(blob))


# --- PDF filter wave -----------------------------------------------------------


def test_pdf_asciihex_ascii85_runlength_against_stdlib():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        _ascii85_decode,
        _asciihex_decode,
        _runlength_decode,
    )

    for n in (0, 1, 3, 4, 17, 1000):
        raw = bytes(rng.randint(0, 256, n))
        assert _asciihex_decode(raw.hex().upper().encode() + b">") == raw
        # whitespace-littered lowercase hex
        lit = re.sub(rb"(..)", rb"\1 \n", raw.hex().encode()) + b">"
        assert _asciihex_decode(lit) == raw
        # the stdlib is an independent ASCII85 implementation
        assert _ascii85_decode(base64.a85encode(raw) + b"~>") == raw
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="out of range"):
        _ascii85_decode(b"\x7f~>")
    assert _runlength_decode(bytes([2]) + b"abc" + bytes([254, 88, 128])) == b"abcXXX"
    with pytest.raises(ValueError, match="torn RunLength"):
        _runlength_decode(bytes([10]) + b"ab")


def test_pdf_lzw_and_a85_content_streams_extract():
    """A content stream re-encoded with LZWDecode / ASCII85Decode must
    extract to the same text as its Flate/raw twin."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        build_pdf,
        extract_pdf_text,
    )

    blob = build_pdf(["hello lzw filter\nsecond line", "page two"], compress=False)
    want = extract_pdf_text(blob)
    m = re.search(rb"<< /Length (\d+) >>\nstream\n", blob)
    ln = int(m.group(1))
    start = m.end()
    content = blob[start : start + ln]
    for fname, enc in (
        (b"LZWDecode", lzw_encode(content)),
        (b"ASCII85Decode", base64.a85encode(content) + b"~>"),
        (b"ASCIIHexDecode", content.hex().encode() + b">"),
    ):
        nb = (
            blob[: m.start()]
            + b"<< /Length %d /Filter /%s >>\nstream\n" % (len(enc), fname)
            + enc
            + blob[start + ln :]
        )
        assert extract_pdf_text(nb) == want, fname


def test_pdf_lzw_image_xobject_decodes():
    """An /Image XObject whose samples are LZW-compressed now extracts
    (the r10 'LZW skipped' row upgraded), through the shared core."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        build_pdf,
        extract_pdf_images,
    )

    rgb = np.full((16, 16, 3), 40, dtype=np.uint8)
    rgb[8:] = 200
    blob = build_pdf(["with raw image"], images=[{"rgb": rgb, "filter": "raw"}])
    # re-filter the image stream to LZWDecode
    m = re.search(
        rb"(/Subtype /Image[^>]*?)/Length (\d+) >>\nstream\n", blob, re.S
    )
    ln = int(m.group(2))
    start = m.end()
    enc = lzw_encode(blob[start : start + ln])
    nb = (
        blob[: m.start(0)]
        + m.group(1)
        + b"/Filter /LZWDecode /Length %d >>\nstream\n" % len(enc)
        + enc
        + blob[start + ln :]
    )
    imgs = extract_pdf_images(nb)
    assert len(imgs) == 1 and imgs[0]["fmt"] == "ppm"
    px, w, h = decode_image(imgs[0]["payload"])
    assert np.array_equal(px, rgb)


def test_tiff_deflate_vs_real_libtiff():
    """Deflate TIFFs (compression 8) written by the REAL libtiff must
    decode pixel-exact, with and without the predictor."""
    hits = glob.glob("/usr/lib/*/libtiff.so*")
    if not hits:
        pytest.skip("no system libtiff (host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    img = rng.randint(0, 256, (24, 31, 3)).astype(np.uint8)
    for pred in (1, 2):
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            tif = lib.TIFFOpen(f.name.encode(), b"w")
            assert tif
            for tag, val in ((256, 31), (257, 24), (258, 8), (259, 8),
                             (262, 2), (277, 3), (278, 8), (284, 1),
                             (317, pred)):
                lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                                 ctypes.c_int(val))
            for r in range(24):
                row = img[r].copy()
                assert lib.TIFFWriteScanline(
                    tif, row.ctypes.data_as(ctypes.c_void_p), r, 0
                ) == 1
            lib.TIFFClose(tif)
            px, w, h = decode_tiff(open(f.name, "rb").read())
        assert (w, h) == (31, 24) and np.array_equal(px, img), pred


def test_tiled_tiff_vs_real_libtiff():
    """TILED TIFFs written by the REAL libtiff (none/LZW/Deflate x
    predictor, incl. edge tiles that only partially cover the image)
    must decode pixel-exact — the r10 'tiled layout' boundary closed."""
    hits = glob.glob("/usr/lib/*/libtiff.so*")
    if not hits:
        pytest.skip("no system libtiff (host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteTile.restype = ctypes.c_long
    lib.TIFFWriteTile.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint16,
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    h, w, tw, tl = 40, 52, 32, 16  # edge tiles partial in both axes
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    for comp, pred in ((1, None), (5, 2), (8, 2), (32773, None)):
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            tif = lib.TIFFOpen(f.name.encode(), b"w")
            assert tif
            fields = [(256, w), (257, h), (258, 8), (259, comp), (262, 2),
                      (277, 3), (284, 1), (322, tw), (323, tl)]
            if pred:
                fields.append((317, pred))
            for tag, val in fields:
                lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                                 ctypes.c_int(val))
            for ty in range(0, h, tl):
                for tx in range(0, w, tw):
                    tile = np.zeros((tl, tw, 3), dtype=np.uint8)
                    ys, xs = min(tl, h - ty), min(tw, w - tx)
                    tile[:ys, :xs] = img[ty : ty + ys, tx : tx + xs]
                    assert lib.TIFFWriteTile(
                        tif, tile.ctypes.data_as(ctypes.c_void_p),
                        tx, ty, 0, 0
                    ) > 0
            lib.TIFFClose(tif)
            px, ww, hh = decode_tiff(open(f.name, "rb").read())
        assert (ww, hh) == (w, h)
        assert np.array_equal(px, img), (comp, pred)


def test_jpeg_in_tiff_vs_real_libtiff_libjpeg():
    """New-style JPEG-in-TIFF (compression 7, TechNote 2): files
    written by the REAL libtiff+libjpeg (JPEGTables + YCbCr strips AND
    tiles) must decode through our from-spec JPEG decoder to within
    IDCT tolerance of libtiff's OWN decode (TIFFReadRGBAImage — real
    libjpeg as the ground truth)."""
    hits = glob.glob("/usr/lib/*/libtiff.so*")
    if not hits:
        pytest.skip("no system libtiff (host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFWriteTile.restype = ctypes.c_long
    lib.TIFFWriteTile.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint16,
    ]
    lib.TIFFReadRGBAImage.restype = ctypes.c_int
    lib.TIFFReadRGBAImage.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 4) % 256,
            (yy * 5) % 256,
            ((xx + yy) * 3) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)

    for tiled, subsamp in ((False, (1, 1)), (True, (1, 1)), (False, (2, 2))):
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            tif = lib.TIFFOpen(f.name.encode(), b"w")
            assert tif
            fields = [(256, w), (257, h), (258, 8), (259, 7), (262, 6),
                      (277, 3), (284, 1), (65538, 1), (65537, 90)]
            fields += [(322, 32), (323, 16)] if tiled else [(278, 16)]
            for tag, val in fields:
                lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                                 ctypes.c_int(val))
            lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(530),
                             ctypes.c_int(subsamp[0]), ctypes.c_int(subsamp[1]))
            if tiled:
                for ty in range(0, h, 16):
                    for tx in range(0, w, 32):
                        tile = np.zeros((16, 32, 3), dtype=np.uint8)
                        tile[: min(16, h - ty), : min(32, w - tx)] = img[
                            ty : ty + 16, tx : tx + 32
                        ]
                        assert lib.TIFFWriteTile(
                            tif, tile.ctypes.data_as(ctypes.c_void_p),
                            tx, ty, 0, 0
                        ) > 0
            else:
                for r in range(h):
                    row = img[r].copy()
                    assert lib.TIFFWriteScanline(
                        tif, row.ctypes.data_as(ctypes.c_void_p), r, 0
                    ) == 1
            lib.TIFFClose(tif)
            blob = open(f.name, "rb").read()

            # ground truth: libtiff's own decode (real libjpeg)
            tif = lib.TIFFOpen(f.name.encode(), b"r")
            raster = (ctypes.c_uint32 * (w * h))()
            assert lib.TIFFReadRGBAImage(tif, w, h, raster, 0) == 1
            lib.TIFFClose(tif)
        v = np.ctypeslib.as_array(raster).reshape(h, w)
        gt = np.stack(
            [v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=-1
        ).astype(np.uint8)[::-1]  # bottom-up rows

        px, ww, hh = decode_tiff(blob)
        assert (ww, hh) == (w, h)
        diff = np.abs(px.astype(int) - gt.astype(int))
        if subsamp == (1, 1):
            # 4:4:4 — two independent IDCTs of the same DCT stream
            assert diff.max() <= 4, (tiled, subsamp, diff.max())
            assert diff.mean() < 0.6, (tiled, subsamp, diff.mean())
        else:
            # 4:2:0 — chroma UPSAMPLERS legitimately differ (libjpeg
            # triangular vs our replication), concentrated at chroma
            # edges; pin the bulk and the overall energy
            assert np.percentile(diff, 90) <= 6, (tiled, subsamp)
            assert diff.mean() < 4.0, (tiled, subsamp, diff.mean())


def test_16bit_tiff_vs_real_libtiff():
    """16-bit samples (none/LZW/Deflate) written by the REAL libtiff
    decode scaled >>8 — exact against the source's high bytes."""
    hits = glob.glob("/usr/lib/*/libtiff.so*")
    if not hits:
        pytest.skip("no system libtiff (host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    img16 = rng.randint(0, 65536, (20, 30, 3)).astype(np.uint16)
    for comp in (1, 5, 8):
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            tif = lib.TIFFOpen(f.name.encode(), b"w")
            for tag, val in ((256, 30), (257, 20), (258, 16), (259, comp),
                             (262, 2), (277, 3), (278, 8), (284, 1)):
                lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                                 ctypes.c_int(val))
            for r in range(20):
                row = img16[r].copy()
                assert lib.TIFFWriteScanline(
                    tif, row.ctypes.data_as(ctypes.c_void_p), r, 0
                ) == 1
            lib.TIFFClose(tif)
            px, w, h = decode_tiff(open(f.name, "rb").read())
        assert np.array_equal(px, (img16 >> 8).astype(np.uint8)), comp


def test_planar_tiff_vs_real_libtiff():
    """Planar configuration 2 (separate sample planes) written by the
    REAL libtiff decodes pixel-exact across all four in-scope
    compressions."""
    hits = glob.glob("/usr/lib/*/libtiff.so*")
    if not hits:
        pytest.skip("no system libtiff (host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    img = rng.randint(0, 256, (22, 17, 3)).astype(np.uint8)
    for comp in (1, 5, 8, 32773):
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            tif = lib.TIFFOpen(f.name.encode(), b"w")
            for tag, val in ((256, 17), (257, 22), (258, 8), (259, comp),
                             (262, 2), (277, 3), (278, 8), (284, 2)):
                lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                                 ctypes.c_int(val))
            for c in range(3):
                for r in range(22):
                    row = np.ascontiguousarray(img[r, :, c]).copy()
                    assert lib.TIFFWriteScanline(
                        tif, row.ctypes.data_as(ctypes.c_void_p), r, c
                    ) == 1
            lib.TIFFClose(tif)
            px, w, h = decode_tiff(open(f.name, "rb").read())
        assert np.array_equal(px, img), comp


def test_lzw_encoder_clear_on_width_boundary_regression():
    """r11 advice: when clear_every lands the flush code exactly on a
    width-bump boundary the decoder widens before reading the Clear;
    pre-fix (ec=1, ce=253) desynced with 'LZW code 512 beyond the
    table'. Pinned with the exact reproducing parameters plus a sweep."""
    import random

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lzw import (
        lzw_decode,
        lzw_encode,
    )

    rnd = random.Random(7)
    data = bytes(rnd.randrange(256) for _ in range(9000))
    for ec, ce in [(1, 253), (0, 254)]:  # the exact pre-fix failures
        assert lzw_decode(lzw_encode(data, ec, clear_every=ce), ec) == data
    for ec in (0, 1):
        for ce in range(505, 521):  # second width boundary
            assert lzw_decode(lzw_encode(data, ec, clear_every=ce), ec) == data
