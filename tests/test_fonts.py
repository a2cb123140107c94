"""Font asset classification (r15): magic sniff, WOFF/WOFF2/sfnt
probes (REAL DejaVu TTFs as third-party artifacts), the WOFF2 Brotli
stream verify through the from-spec decoder, tear quarantines, and
the Spark census route."""

from __future__ import annotations

import glob
import struct
import zlib

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.fonts import (
    build_woff,
    build_woff2,
    font_census,
    probe_font,
    sniff_font_format,
    verify_woff2_stream,
)

_REAL_TTFS = sorted(
    glob.glob("/usr/share/fonts/truetype/dejavu/DejaVu*.ttf")
)


def test_sniff_routes_by_magic():
    assert sniff_font_format(build_woff()) == "woff"
    assert sniff_font_format(build_woff2()) == "woff2"
    assert sniff_font_format(b"\x00\x01\x00\x00xxxx") == "ttf"
    assert sniff_font_format(b"OTTOxxxx") == "otf"
    assert sniff_font_format(b"ttcfxxxx") == "ttc"
    assert sniff_font_format(b"GIF89a") is None
    assert sniff_font_format(b"") is None


def test_real_dejavu_ttfs_probe():
    if not _REAL_TTFS:
        pytest.skip("no DejaVu fonts on this host")
    for path in _REAL_TTFS[:6]:
        d = probe_font(open(path, "rb").read())
        assert d["format"] == "ttf" and d["flavor"] == "truetype"
        # every real TrueType font carries these
        for tag in ("cmap", "glyf", "head", "name"):
            assert tag in d["table_tags"], (path, tag)
        assert d["num_tables"] == len(d["table_tags"])


def test_woff_probe_and_metadata_vendor():
    d = probe_font(build_woff(vendor="Vendor & Co"))
    assert d["format"] == "woff"
    assert d["table_tags"] == ["cmap", "glyf", "head"]
    assert d["has_metadata"] and d["meta_vendor"] == "Vendor & Co"
    d2 = probe_font(build_woff(vendor=None))
    assert not d2["has_metadata"] and d2["meta_vendor"] is None


def test_woff_declared_length_and_meta_torn():
    pay = build_woff()
    with pytest.raises(ValueError, match="declared length"):
        probe_font(pay + b"x")
    mut = bytearray(pay)
    mut[-4] ^= 0xFF  # inside the zlib metadata block
    with pytest.raises(ValueError, match="metadata"):
        probe_font(bytes(mut))


def test_woff2_probe_and_stream_verify():
    pay = build_woff2(sfnt_size=512)
    d = probe_font(pay)
    assert d["format"] == "woff2" and d["compressed_size"] > 0
    assert verify_woff2_stream(pay) == 512
    # torn brotli stream quarantines: truncate the tail and re-declare
    # the total length so the header parses but the stream is short
    mut = bytearray(pay[:-5])
    struct.pack_into(">I", mut, 8, len(mut))
    with pytest.raises(ValueError, match="torn WOFF2 compressed"):
        verify_woff2_stream(bytes(mut))


def test_woff2_header_length_check():
    pay = bytearray(build_woff2())
    struct.pack_into(">I", pay, 8, len(pay) + 7)
    with pytest.raises(ValueError, match="declared length"):
        probe_font(bytes(pay))


def test_torn_sfnt_directory():
    # claims 40 tables but carries none
    pay = struct.pack(">IHHHH", 0x00010000, 40, 16, 0, 0)
    with pytest.raises(ValueError, match="torn sfnt"):
        probe_font(pay)


def test_non_font_rejected():
    with pytest.raises(ValueError, match="not a font"):
        probe_font(b"PK\x03\x04")


def test_font_census_spark_route(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        build_zip,
        explode_archives,
    )

    real = open(_REAL_TTFS[0], "rb").read() if _REAL_TTFS else None
    members = [
        ("site/fonts/a.woff", build_woff(vendor="Acme")),
        ("site/fonts/b.woff2", build_woff2()),
        ("site/fonts/torn.woff", b"wOFF" + b"\x00" * 10),
        ("site/img/x.bin", b"not a font, not routed"),
    ]
    if real:
        members.append(("site/fonts/d.ttf", real))
    bundle = build_zip(members)
    archives = spark.createDataFrame(
        [(3, bytearray(bundle))], "archive_id long, payload binary"
    )
    rows = font_census(explode_archives(archives)).collect()
    by_fmt = {r.format: r for r in rows if r.parse_error is None}
    assert by_fmt["woff"].meta_vendor == "Acme"
    assert by_fmt["woff"].num_tables == 3
    assert by_fmt["woff2"].sfnt_size == 512
    if real:
        assert by_fmt["ttf"].num_tables > 10
    torn = [r for r in rows if r.parse_error is not None]
    assert len(torn) == 1 and torn[0].n_bytes == 14
    # the non-font member never produced a row
    assert len(rows) == len(by_fmt) + 1
