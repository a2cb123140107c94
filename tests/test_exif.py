"""EXIF parse + privacy strip (operators/exif.py): spec-literal fixture
roundtrips in both byte orders, byte-exact strip, tear-contract fuzz."""

from __future__ import annotations

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
    build_exif_app1,
    insert_app1,
    parse_exif,
    strip_metadata,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _jpeg() -> bytes:
    px = np.full((16, 16, 3), 40, dtype=np.uint8)
    px[8:, :, :] = 200
    return encode_jpeg(px, quality=90)


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_both_byte_orders(bo):
    app1 = build_exif_app1(
        {
            "make": "CamX",
            "model": "M1",
            "orientation": 6,
            "datetime": "2024:01:02 03:04:05",
            "pixel_width": 16,
            "pixel_height": 16,
        },
        gps_dms=(48, 21, 39),
        byte_order=bo,
    )
    info = parse_exif(insert_app1(_jpeg(), app1))
    assert info["has_exif"] and info["byte_order"] == bo
    assert info["make"] == "CamX" and info["model"] == "M1"
    assert info["orientation"] == 6
    assert info["datetime"] == "2024:01:02 03:04:05"
    assert (info["pixel_width"], info["pixel_height"]) == (16, 16)
    assert info["has_gps"]
    assert info["gps_lat_ref"] == "N"
    assert info["gps_lat"] == [(48, 1), (21, 1), (39, 1)]


def test_no_exif_and_strip_byte_exact():
    plain = _jpeg()
    assert parse_exif(plain) == {"has_exif": False}
    tagged = insert_app1(plain, build_exif_app1({"make": "X"}, gps_dms=(1, 2, 3)))
    stripped = strip_metadata(tagged)
    assert stripped == plain  # byte-identical: scan data provably intact
    assert parse_exif(stripped) == {"has_exif": False}
    assert strip_metadata(stripped) == stripped  # idempotent
    px_a, _, _ = decode_jpeg(tagged)
    px_b, _, _ = decode_jpeg(stripped)
    assert np.array_equal(px_a, px_b)


def test_strip_keeps_structural_segments_only():
    tagged = insert_app1(_jpeg(), build_exif_app1({"make": "X"}))
    # add a COM segment too
    com = b"\xff\xfe" + (12).to_bytes(2, "big") + b"0123456789"
    with_com = tagged[:2] + com + tagged[2:]
    out = strip_metadata(with_com)
    assert b"0123456789" not in out
    assert out == _jpeg()


def test_tear_contract_fuzz():
    tagged = insert_app1(
        _jpeg(), build_exif_app1({"make": "CamX", "orientation": 3}, gps_dms=(1, 2, 3))
    )
    rng = np.random.RandomState(7)
    errors = 0
    for _ in range(300):
        b = bytearray(tagged)
        for _k in range(rng.randint(1, 4)):
            b[rng.randint(len(b))] ^= 1 << rng.randint(8)
        for fn in (parse_exif, strip_metadata):
            try:
                fn(bytes(b))
            except ValueError:
                errors += 1
            # any other exception type escapes and fails the test
    assert errors > 0


def test_truncated_inputs_raise_value_error():
    tagged = insert_app1(_jpeg(), build_exif_app1({"make": "X"}))
    for cut in (1, 3, 10, 30, len(tagged) // 2):
        try:
            parse_exif(tagged[:cut])
        except ValueError:
            pass


def test_png_metadata_strip_and_extract():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        insert_png_text,
        png_text_chunks,
        strip_png_metadata,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[4:, :, :] = 255
    plain = encode_png(px)
    tagged = insert_png_text(
        insert_png_text(plain, "Author", "someone"), "Software", "cam-fw 1.2"
    )
    assert png_text_chunks(tagged) == {"Author": "someone", "Software": "cam-fw 1.2"}
    stripped = strip_png_metadata(tagged)
    assert stripped == plain  # byte-identical to the untagged original
    assert png_text_chunks(stripped) == {}
    a, _, _ = decode_png(tagged)
    b, _, _ = decode_png(stripped)
    assert np.array_equal(a, b)
    with pytest.raises(ValueError):
        strip_png_metadata(b"nope")


def test_strip_image_metadata_routes_jpeg_and_png(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        build_exif_app1,
        insert_app1,
        insert_png_text,
        png_text_chunks,
        strip_image_metadata,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
    )

    jpeg_tagged = insert_app1(_jpeg(), build_exif_app1({"make": "X"}, gps_dms=(1, 2, 3)))
    png_tagged = insert_png_text(
        encode_png(np.zeros((4, 4, 3), dtype=np.uint8)), "GPS", "leak"
    )
    rows = [
        (1, "image", bytearray(jpeg_tagged), (None,) * 4 + ("image/jpeg",)),
        (2, "image", bytearray(png_tagged), (None,) * 4 + ("image/png",)),
        (3, "image", bytearray(b"not an image"), (None,) * 5),
    ]
    out = {
        r.media_id: r
        for r in strip_image_metadata(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[1].stripped and out[2].stripped and not out[3].stripped
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        parse_exif,
    )

    assert parse_exif(bytes(out[1].payload)) == {"has_exif": False}
    assert png_text_chunks(bytes(out[2].payload)) == {}
    assert bytes(out[3].payload) == b"not an image"


def test_strip_preserves_adobe_app14():
    """r8 ADVICE: the APP14 'Adobe' color-transform segment decides
    whether a 3/4-component scan is RGB, YCbCr, or YCCK — stripping it
    changes decoded pixels of Adobe-coded JPEGs, so strip_metadata must
    keep it (it carries no PII). Non-Adobe APP14 is still stripped."""
    import struct as _s

    plain = _jpeg()
    adobe = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 1])  # v100, transform=1
    app14 = b"\xff\xee" + _s.pack(">H", len(adobe) + 2) + adobe
    tagged = insert_app1(plain[:2] + app14 + plain[2:], build_exif_app1({"make": "X"}))
    out = strip_metadata(tagged)
    assert b"Adobe" in out  # APP14 Adobe survives
    assert parse_exif(out) == {"has_exif": False}  # APP1 gone
    assert out == plain[:2] + app14 + plain[2:]  # byte-exact otherwise
    # a non-Adobe APP14 payload is still removed
    other = b"NotAdobe-payload"
    app14_other = b"\xff\xee" + _s.pack(">H", len(other) + 2) + other
    assert strip_metadata(plain[:2] + app14_other + plain[2:]) == plain


def test_with_exif_quarantines_nonscalar_and_zero_denominator(spark):
    """r8 ADVICE pair: (a) a malformed orientation with count=2 must not
    tear the Arrow batch — the row coerces to the first element; (b) a
    zero GPS denominator leaves the DMS fields NULL (has_gps stays true
    from tag presence) and fractional rationals ROUND (61/2 s -> 31)."""
    import struct as _s

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        with_exif,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    # (a) patch the built APP1: orientation SHORT count 1 -> 2 (two
    # SHORTs still fit inline in the 4 value bytes)
    app1 = build_exif_app1({"orientation": 6}, byte_order="II")
    tag_le = _s.pack("<H", 0x0112)
    i = app1.index(tag_le)
    cnt_off = i + 4
    assert _s.unpack_from("<I", app1, cnt_off)[0] == 1
    patched = app1[:cnt_off] + _s.pack("<I", 2) + app1[cnt_off + 4 :]
    # value bytes: first SHORT is 6, second is the old padding (0)
    jpeg_multi = insert_app1(_jpeg(), patched)
    assert parse_exif(jpeg_multi)["orientation"] == [6, 0]  # raw parse

    # (b) zero-denominator and fractional GPS rationals
    jpeg_zero_den = insert_app1(
        _jpeg(), build_exif_app1({}, gps_dms=((10, 0), (2, 1), (3, 1)))
    )
    jpeg_frac = insert_app1(
        _jpeg(), build_exif_app1({}, gps_dms=((48, 1), (21, 1), (61, 2)))
    )
    rows = [
        (1, "image", bytearray(jpeg_multi), (None,) * 4 + ("image/jpeg",)),
        (2, "image", bytearray(jpeg_zero_den), (None,) * 4 + ("image/jpeg",)),
        (3, "image", bytearray(jpeg_frac), (None,) * 4 + ("image/jpeg",)),
    ]
    out = {
        r.media_id: r
        for r in with_exif(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    }
    assert out[1].has_exif and out[1].orientation == 6  # coerced, not torn
    assert out[2].has_gps is True  # tag presence
    assert out[2].gps_d is None and out[2].gps_m is None and out[2].gps_s is None
    assert (out[3].gps_d, out[3].gps_m, out[3].gps_s) == (48, 21, 31)  # round


def test_png_exif_chunk_extract_and_strip():
    """[r13] PNG eXIf chunks (PNG 1.5) parse through the shared TIFF
    machinery and strip_png_metadata removes them with pixels
    byte-provably unchanged."""
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        build_exif_app1,
        insert_png_exif,
        parse_png_exif,
        strip_png_metadata,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    tiff = build_exif_app1({"make": "Acme", "model": "Px"},
                           gps_dms=(10, 20, 30))[10:]
    png = insert_png_exif(encode_png(px), tiff)
    e = parse_png_exif(png)
    assert (e["make"], e["model"], e["has_gps"]) == ("Acme", "Px", True)
    stripped = strip_png_metadata(png)
    assert parse_png_exif(stripped) == {"has_exif": False}
    assert np.array_equal(decode_png(stripped)[0], px)
    assert parse_png_exif(encode_png(px)) == {"has_exif": False}


def test_webp_exif_chunk_extract_and_strip():
    """[r13] WebP EXIF chunks (VP8X extended containers) parse through
    the shared machinery (JPEG-style Exif\\0\\0 prefixes tolerated);
    strip_webp_metadata drops EXIF/XMP, rewrites the RIFF size,
    clears the VP8X flag bits, and leaves image chunks byte-identical."""
    import struct

    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        build_exif_app1,
        parse_webp_exif,
        strip_webp_metadata,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    tiff = build_exif_app1({"make": "Acme"}, gps_dms=(10, 20, 30))[10:]
    inner = encode_webp_lossless(px)[12:]
    vp8x = (b"VP8X" + struct.pack("<I", 10) + bytes([0x08, 0, 0, 0])
            + (15).to_bytes(3, "little") + (15).to_bytes(3, "little"))
    for prefix in (b"", b"Exif\x00\x00"):
        blob = prefix + tiff
        exif_chunk = (b"EXIF" + struct.pack("<I", len(blob)) + blob
                      + (b"\x00" if len(blob) & 1 else b""))
        body = vp8x + inner + exif_chunk
        webp = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
        e = parse_webp_exif(webp)
        assert (e["make"], e["has_gps"]) == ("Acme", True), prefix
        stripped = strip_webp_metadata(webp)
        assert parse_webp_exif(stripped) == {"has_exif": False}
        assert np.array_equal(decode_webp(stripped)[0], px)
        assert not (stripped[20] & 0x0C)  # VP8X EXIF/XMP flags cleared


def test_with_exif_dispatches_all_four_carriers(spark):
    """[r13] the Spark-level with_exif op now answers the same question
    for JPEG, PNG, WebP, and HEIC rows in one pass."""
    import struct as _s

    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        build_exif_app1,
        insert_app1,
        insert_png_exif,
        with_exif,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
        build_heif,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
        encode_hevc_intra,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        encode_jpeg,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_png,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
        encode_webp_lossless,
    )

    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    app1 = build_exif_app1({"make": "Acme"}, gps_dms=(10, 20, 30))
    tiff = app1[10:]
    jpeg = insert_app1(encode_jpeg(px), app1)
    png = insert_png_exif(encode_png(px), tiff)
    inner = encode_webp_lossless(px)[12:]
    vp8x = (b"VP8X" + _s.pack("<I", 10) + bytes([0x08, 0, 0, 0])
            + (15).to_bytes(3, "little") + (15).to_bytes(3, "little"))
    exif_chunk = (b"EXIF" + _s.pack("<I", len(tiff)) + tiff
                  + (b"\x00" if len(tiff) & 1 else b""))
    body = vp8x + inner + exif_chunk
    webp = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WEBP" + body
    y = np.full((32, 32), 100, np.uint8)
    u = np.full((16, 16), 128, np.uint8)
    heic = build_heif([encode_hevc_intra([(y, u, u)], qp=25)], exif=tiff)
    rows = [
        (1, "image", bytearray(jpeg), (None,) * 5),
        (2, "image", bytearray(png), (None,) * 5),
        (3, "image", bytearray(webp), (None,) * 5),
        (4, "image", bytearray(heic), (None,) * 5),
        (5, "image", bytearray(b"not an image"), (None,) * 5),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in with_exif(media).collect()}
    for mid in (1, 2, 3, 4):
        assert out[mid].has_exif and out[mid].make == "Acme", mid
        assert out[mid].has_gps, mid
    assert not out[5].has_exif
