"""ICO/BMP codec (operators/ico.py): 32-bpp roundtrips, palette DIBs,
largest-entry selection, PNG-encoded entries, real-world favicons,
registry dispatch, tear fuzz, decode bounds."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ico import (
    _decode_dib,
    decode_bmp,
    decode_ico,
    encode_ico,
)


@pytest.mark.parametrize("shape", [(1, 1), (16, 16), (32, 30), (256, 256)])
def test_ico_roundtrip_exact(shape):
    rng = np.random.RandomState(shape[0])
    px = rng.randint(0, 256, size=(*shape, 3)).astype(np.uint8)
    out, w, h = decode_ico(encode_ico(px))
    assert (w, h) == (shape[1], shape[0])
    assert np.array_equal(out, px)


def _bmp(dib: bytes, pal_bytes: int = 0) -> bytes:
    off = 14 + 40 + pal_bytes  # bfOffBits: header + DIB header + palette
    return b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, off) + dib


def _dib(w, h, bpp, pal_rgbx: bytes, rows_bottom_up: bytes, double=False):
    hdr = struct.pack(
        "<IiihhIIiiII", 40, w, h * (2 if double else 1), 1, bpp, 0,
        len(rows_bottom_up), 0, 0, len(pal_rgbx) // 4, 0,
    )
    return hdr + pal_rgbx + rows_bottom_up


def test_bmp_palette_depths():
    """8/4/1-bpp palette DIBs with explicit row padding."""
    # 8bpp, 3x2: palette idx rows (bottom-up), stride pads 3 -> 4
    pal = bytes((10, 20, 30, 0)) + bytes((40, 50, 60, 0))  # BGRX entries
    rows = bytes((1, 0, 1, 0)) + bytes((0, 1, 0, 0))  # bottom row first
    px, w, h = decode_bmp(_bmp(_dib(3, 2, 8, pal, rows), pal_bytes=len(pal)))
    assert (w, h) == (3, 2)
    # palette entry 0 = BGRX(10,20,30,0) -> RGB(30,20,10); stored rows
    # are bottom-up, so the SECOND stored row (indices 0,1,0) is the top
    assert tuple(px[0, 0]) == (30, 20, 10)
    assert tuple(px[0, 1]) == (60, 50, 40)
    assert tuple(px[1, 0]) == (60, 50, 40)

    # 1bpp, 9x1: bits MSB-first, stride 4
    pal1 = bytes((0, 0, 0, 0)) + bytes((255, 255, 255, 0))
    bits = bytes((0b10100000, 0b10000000, 0, 0))
    px1, w1, h1 = decode_bmp(_bmp(_dib(9, 1, 1, pal1, bits), pal_bytes=len(pal1)))
    assert (w1, h1) == (9, 1)
    assert [int(px1[0, i, 0]) for i in range(9)] == [255, 0, 255, 0, 0, 0, 0, 0, 255]

    # 4bpp, 3x1
    pal4 = b"".join(bytes((i, i, i, 0)) for i in range(16))
    nib = bytes(((0x1 << 4) | 0xF, 0x30, 0, 0))
    px4, w4, h4 = decode_bmp(_bmp(_dib(3, 1, 4, pal4, nib), pal_bytes=len(pal4)))
    assert [int(px4[0, i, 0]) for i in range(3)] == [1, 15, 3]


def test_bmp_top_down_negative_height():
    """Negative biHeight = top-down DIB (rows stored first-to-last) —
    common from real writers; must decode without the bottom-up flip
    (r8 ADVICE). ICO entries stay bottom-up-only."""
    # 24bpp 2x2 top-down: stored row 0 IS the visual top row
    rows = bytes((1, 2, 3, 4, 5, 6, 0, 0)) + bytes((7, 8, 9, 10, 11, 12, 0, 0))
    hdr = struct.pack("<IiihhIIiiII", 40, 2, -2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    px, w, h = decode_bmp(_bmp(hdr + rows))
    assert (w, h) == (2, 2)
    assert tuple(px[0, 0]) == (3, 2, 1)      # BGR -> RGB, top row first
    assert tuple(px[1, 1]) == (12, 11, 10)
    # equivalent bottom-up file must yield the identical image
    hdr_bu = struct.pack("<IiihhIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    rows_bu = rows[8:] + rows[:8]
    px_bu, _, _ = decode_bmp(_bmp(hdr_bu + rows_bu))
    assert np.array_equal(px, px_bu)
    # top-down ICO entry: still a tear (doubled-height XOR+AND has no
    # top-down form)
    with pytest.raises(ValueError, match="bad DIB dimensions"):
        _decode_dib(hdr + rows, expect_mask=True)


def test_ico_picks_largest_entry_and_png_delegation():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        encode_png,
    )

    small = encode_ico(np.full((8, 8, 3), 10, dtype=np.uint8))
    big_px = np.full((16, 16, 3), 99, dtype=np.uint8)
    big = encode_ico(big_px)
    # splice both entries into one directory (recompute offsets)
    small_dib = small[22:]
    big_dib = big[22:]
    hdr = b"\x00\x00\x01\x00\x02\x00"
    e1 = struct.pack("<BBBBHHII", 8, 8, 0, 0, 1, 32, len(small_dib), 38)
    e2 = struct.pack("<BBBBHHII", 16, 16, 0, 0, 1, 32, len(big_dib), 38 + len(small_dib))
    combo = hdr + e1 + e2 + small_dib + big_dib
    px, w, h = decode_ico(combo)
    assert (w, h) == (16, 16) and np.array_equal(px, big_px)

    # PNG-encoded entry (Vista+ style): decodes via the PNG codec
    png = encode_png(np.full((4, 4, 3), 77, dtype=np.uint8))
    e = struct.pack("<BBBBHHII", 4, 4, 0, 0, 1, 32, len(png), 22)
    ico_png = b"\x00\x00\x01\x00\x01\x00" + e + png
    px2, w2, h2 = decode_ico(ico_png)
    assert (w2, h2) == (4, 4) and int(px2[0, 0, 0]) == 77


def test_registry_dispatch():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        average_hash,
        decode_image,
        sniff_image_format,
    )

    px = np.full((32, 32, 3), 40, dtype=np.uint8)
    px[16:, :, :] = 200
    ico = encode_ico(px)
    assert sniff_image_format(ico) == "ico"
    assert decode_image(ico)[1:] == (32, 32)
    assert average_hash(ico) == -(2 ** 32)  # established two-tone formula
    bmp_payload = _bmp(
        _dib(3, 2, 8, bytes((0, 0, 0, 0)), bytes((0, 0, 0, 0)) * 2), pal_bytes=4
    )
    assert sniff_image_format(bmp_payload) == "bmp"


@pytest.mark.parametrize(
    "path,dims",
    [
        (
            "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/pyasn1/"
            "docs/source/.static/favicon.ico",
            (30, 32),
        ),
        (
            "/usr/lib/google-cloud-sdk/platform/google_appengine/php/"
            "new_project_template/favicon.ico",
            (32, 32),
        ),
    ],
)
def test_realworld_favicons(path, dims):
    if not os.path.exists(path):
        pytest.skip(f"host file absent: {path}")
    px, w, h = decode_ico(open(path, "rb").read())
    assert (w, h) == dims and px.shape == (dims[1], dims[0], 3)


def test_decode_bounds_and_unsupported():
    # oversized DIB dims quarantine before allocation
    hdr = struct.pack("<IiihhIIiiII", 40, 20000, 20000, 1, 32, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="64 Mpx"):
        _decode_dib(hdr, expect_mask=False)
    # RLE compression is a declared boundary
    hdr_rle = struct.pack("<IiihhIIiiII", 40, 4, 4, 1, 8, 1, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="BI_RGB"):
        _decode_dib(hdr_rle, expect_mask=False)


def test_tear_contract_fuzz():
    base = encode_ico(np.random.RandomState(9).randint(0, 256, size=(16, 16, 3)).astype(np.uint8))
    rng = np.random.RandomState(4)
    errors = 0
    for _ in range(300):
        b = bytearray(base)
        for _k in range(rng.randint(1, 4)):
            b[rng.randint(len(b))] ^= 1 << rng.randint(8)
        try:
            decode_ico(bytes(b))
        except ValueError:
            errors += 1
        # any other exception escapes and fails the test
    assert errors > 0
    for cut in (2, 5, 10, 21, 30, len(base) // 2):
        with pytest.raises(ValueError):
            decode_ico(base[:cut])


def test_bmp_honors_pixel_offset_gap():
    """r8 review repro: a valid BMP with a gap between palette and pixel
    array (bfOffBits > header+palette) must decode the pixels at the
    DECLARED offset, not immediately after the palette."""
    dib = _dib(2, 2, 24, b"", b"")
    rows = bytes((1, 2, 3, 4, 5, 6, 0, 0)) + bytes((7, 8, 9, 10, 11, 12, 0, 0))
    gap = b"\xde\xad\xbe\xef\xde\xad\xbe\xef"  # 8 junk bytes
    hdr40 = dib[:40]
    payload = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(gap) + len(rows), 0, 0, 14 + 40 + len(gap))
        + hdr40
        + gap
        + rows
    )
    px, w, h = decode_bmp(payload)
    assert (w, h) == (2, 2)
    # second stored row is the TOP row; BGR(7,8,9) -> RGB(9,8,7)
    assert tuple(px[0, 0]) == (9, 8, 7)
    # an offset pointing inside the header must tear
    bad = b"BM" + struct.pack("<IHHI", 0, 0, 0, 20) + hdr40 + rows
    with pytest.raises(ValueError, match="inside header|inside the file"):
        decode_bmp(bad)
