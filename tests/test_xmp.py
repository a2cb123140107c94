"""XMP + IPTC crawl-hygiene battery (r14, r13 verdict #7): packet
parse (both RDF serializations), all four carriers (JPEG APP1 / PNG
iTXt / WebP XMP chunk / HEIC mime item) extract + strip with pixel
byte-identity, JPEG APP13 IPTC-IIM, libheif metadata-API pin for the
HEIC carrier, and the Spark with_xmp surface."""

import struct
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
    build_heif,
    decode_heif,
    extract_heif_xmp,
    strip_heif_xmp,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
    encode_hevc_intra,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
    decode_image,
    encode_png,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
    encode_webp_lossless,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xmp import (
    build_iptc_app13,
    build_xmp,
    extract_xmp_any,
    insert_jpeg_iptc,
    insert_jpeg_xmp,
    insert_png_xmp,
    insert_webp_xmp,
    parse_iptc,
    parse_xmp,
    strip_xmp_any,
    with_xmp,
)

_PKT = build_xmp("AcmeCam 2.0", "2024-01-02T03:04:05",
                 "Jane Photographer", gps=("52,30.5N", "13,24.1E"))


def _jpeg():
    return encode_jpeg_gray(np.full((16, 16), 90, np.uint8))


def _png():
    return encode_png(np.full((16, 16, 3), 128, np.uint8))


def _webp():
    return encode_webp_lossless(np.full((16, 16, 3), 99, np.uint8))


def _heic(**kw):
    y = np.full((32, 32), 100, np.uint8)
    u = np.full((16, 16), 128, np.uint8)
    v = np.full((16, 16), 128, np.uint8)
    return build_heif([encode_hevc_intra([(y, u, v)], qp=20)], **kw)


def test_parse_both_rdf_serializations():
    info = parse_xmp(_PKT)  # attribute form from build_xmp
    assert info == {
        "has_xmp": True, "creator_tool": "AcmeCam 2.0",
        "create_date": "2024-01-02T03:04:05",
        "creator": "Jane Photographer", "has_gps": True,
    }
    element_form = (
        b'<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF xmlns:rdf='
        b'"http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        b'<rdf:Description rdf:about="" '
        b'xmlns:xmp="http://ns.adobe.com/xap/1.0/">'
        b"<xmp:CreatorTool>ElemTool</xmp:CreatorTool>"
        b"</rdf:Description></rdf:RDF></x:xmpmeta>"
    )
    info2 = parse_xmp(element_form)
    assert info2["creator_tool"] == "ElemTool"
    assert info2["has_gps"] is False
    # a real packet with torn XML: has_xmp stays true, fields null
    info3 = parse_xmp(b"<x:xmpmeta truncated")
    assert info3["has_xmp"] is True and info3["creator_tool"] is None


@pytest.mark.parametrize("carrier,decode", [
    ("jpeg", lambda p: decode_jpeg(p)[0]),
    ("png", lambda p: decode_image(p)[0]),
    ("webp", lambda p: decode_image(p)[0]),
    ("heic", lambda p: decode_heif(p)[0]),
])
def test_carrier_extract_and_pixel_identical_strip(carrier, decode):
    if carrier == "jpeg":
        f = insert_jpeg_xmp(_jpeg(), _PKT)
    elif carrier == "png":
        f = insert_png_xmp(_png(), _PKT)
    elif carrier == "webp":
        f = insert_webp_xmp(_webp(), _PKT)
    else:
        f = _heic(xmp=_PKT)
    pkt = extract_xmp_any(f)
    assert pkt is not None
    assert parse_xmp(pkt)["creator_tool"] == "AcmeCam 2.0"
    before = decode(f)
    stripped = strip_xmp_any(f)
    assert extract_xmp_any(stripped) is None
    assert np.array_equal(before, decode(stripped))
    assert b"Jane Photographer" not in stripped


def test_no_xmp_carriers_return_none():
    for f in (_jpeg(), _png(), _webp(), _heic()):
        assert extract_xmp_any(f) is None
    with pytest.raises(ValueError, match="carrier"):
        extract_xmp_any(b"\x00" * 32)


def test_heic_xmp_strip_in_place():
    f = _heic(xmp=_PKT)
    stripped = strip_heif_xmp(f)
    assert len(stripped) == len(f)  # offsets untouched
    assert extract_heif_xmp(stripped) is None
    px1, _, _ = decode_heif(f)
    px2, _, _ = decode_heif(stripped)
    assert np.array_equal(px1, px2)


def test_heic_xmp_pins_against_libheif_metadata_api():
    """libheif's metadata API reads the SAME packet bytes from our
    mime item, and finds no XMP residue after the strip."""
    import ctypes

    from heif_rig import HeifError, _ck, decode_heic_rgb, heif_lib

    lib = heif_lib()
    if lib is None:
        pytest.skip("no system libheif (visible host gap)")
    lib.heif_image_handle_get_number_of_metadata_blocks.restype = ctypes.c_int
    lib.heif_image_handle_get_number_of_metadata_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p]
    lib.heif_image_handle_get_list_of_metadata_block_IDs.restype = ctypes.c_int
    lib.heif_image_handle_get_list_of_metadata_block_IDs.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
    lib.heif_image_handle_get_metadata_size.restype = ctypes.c_size_t
    lib.heif_image_handle_get_metadata_size.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32]
    lib.heif_image_handle_get_metadata.restype = HeifError
    lib.heif_image_handle_get_metadata.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p]

    def libheif_mime(payload):
        ctx = lib.heif_context_alloc()
        buf = ctypes.create_string_buffer(payload, len(payload))
        _ck(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(payload), None), "read")
        h = ctypes.c_void_p()
        _ck(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(h)), "h")
        n = lib.heif_image_handle_get_number_of_metadata_blocks(h, b"mime")
        if n == 0:
            return None
        ids = (ctypes.c_uint32 * n)()
        lib.heif_image_handle_get_list_of_metadata_block_IDs(
            h, b"mime", ids, n)
        sz = lib.heif_image_handle_get_metadata_size(h, ids[0])
        out = ctypes.create_string_buffer(sz)
        _ck(lib.heif_image_handle_get_metadata(h, ids[0], out), "meta")
        return out.raw[:sz]

    f = _heic(xmp=_PKT)
    assert libheif_mime(f) == _PKT
    stripped = strip_heif_xmp(f)
    residue = libheif_mime(stripped)
    assert residue is None or b"Jane" not in residue
    assert np.array_equal(decode_heic_rgb(f), decode_heic_rgb(stripped))


def test_iptc_roundtrip_and_strip():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        strip_metadata,
    )

    app13 = build_iptc_app13(
        {"byline": "J. Doe", "city": "Berlin", "country": "Germany",
         "title": "Skyline", "caption": "a test"},
        keywords=["k1", "k2", "k3"],
    )
    f = insert_jpeg_iptc(_jpeg(), app13)
    iptc = parse_iptc(f)
    assert iptc["byline"] == "J. Doe"
    assert iptc["city"] == "Berlin"
    assert iptc["keywords"] == ["k1", "k2", "k3"]
    before = decode_jpeg(f)[0]
    stripped = strip_metadata(f)
    assert parse_iptc(stripped) == {"has_iptc": False}
    assert np.array_equal(before, decode_jpeg(stripped)[0])
    assert parse_iptc(_jpeg()) == {"has_iptc": False}
    with pytest.raises(ValueError, match="JPEG"):
        parse_iptc(b"\x89PNG")


def test_with_xmp_spark_four_carriers(spark):
    rows = [
        (1, bytearray(insert_jpeg_xmp(_jpeg(), _PKT))),
        (2, bytearray(insert_png_xmp(_png(), _PKT))),
        (3, bytearray(insert_webp_xmp(_webp(), _PKT))),
        (4, bytearray(_heic(xmp=_PKT))),
        (5, bytearray(_png())),                      # no metadata
        (6, bytearray(insert_jpeg_iptc(
            _jpeg(), build_iptc_app13({"byline": "B"}, ["x"])))),
        (7, bytearray(b"\xff\xd8torn")),             # torn row quarantines
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in with_xmp(df).collect()}
    for mid in (1, 2, 3, 4):
        assert got[mid]["has_xmp"] is True, mid
        assert got[mid]["creator_tool"] == "AcmeCam 2.0"
        assert got[mid]["xmp_has_gps"] is True
    assert got[5]["has_xmp"] is False
    assert got[6]["has_iptc"] is True and got[6]["iptc_byline"] == "B"
    assert got[6]["n_keywords"] == 1
    assert got[7]["has_xmp"] is False and got[7]["has_iptc"] is False
