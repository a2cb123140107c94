""".7z container walk (r15): fixture roundtrips across every in-scope
coder shape, CRC tamper detection, the 300-case tear/mutation fuzz
(ValueError — and only ValueError — never wrong bytes), named
out-of-scope boundaries, and the Spark archive route. Ground-truth
pins against the REAL p7zip artifact and the host libarchive live in
tests/test_realworld_r15.py."""

from __future__ import annotations

import struct
import zlib

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
    iter_archive_members,
    sniff_archive_format,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sevenzip import (
    MAGIC_7Z,
    _num,
    _Rd,
    build_7z,
    parse_7z,
)

MEMBERS = [
    ("docs/a.txt", b"hello seven zip world"),
    ("bin/table.bin", bytes(range(256)) * 8),
    ("empty.txt", b""),
    ("docs/c.txt", b"the third member carries text " * 7),
]
WANT = [(n, d) for n, d in MEMBERS if d] + [
    (n, d) for n, d in MEMBERS if not d
]

CODECS = ("copy", "lzma2", "lzma", "delta+lzma2", "bcj+lzma2")


def test_real_uint64_roundtrip():
    for v in (0, 1, 0x7F, 0x80, 0x100, 0x3FFF, 0x4000, 0xFFFF,
              0x123456, 0x12345678, 0xFFFFFFFF, 0x1234567890AB,
              (1 << 63) + 5, (1 << 64) - 1):
        r = _Rd(_num(v))
        assert r.number() == v and r.pos == len(r.buf), hex(v)


@pytest.mark.parametrize("codec", CODECS)
def test_roundtrip_every_coder_shape(codec):
    pay = build_7z(MEMBERS, codec=codec)
    assert parse_7z(pay) == WANT


def test_empty_archive():
    assert parse_7z(build_7z([])) == []


def test_unicode_names_and_nested_paths():
    members = [("päth/ünïcode-名前.txt", b"text")]
    assert parse_7z(build_7z(members, codec="lzma2")) == members


def test_substream_crc_tamper_detected():
    pay = bytearray(build_7z(MEMBERS, codec="copy"))
    # copy coder: member bytes sit verbatim after the 32-byte signature
    # header — flip one payload byte; the substream CRC must catch it
    pay[32 + 3] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        parse_7z(bytes(pay))


def test_header_crc_tamper_detected():
    pay = bytearray(build_7z(MEMBERS, codec="lzma2"))
    pay[-2] ^= 0x01  # inside the trailing raw header
    with pytest.raises(ValueError, match="CRC"):
        parse_7z(bytes(pay))


def test_aes_coder_named_boundary():
    # hand-build a folder with the AES-256 codec id — the error must
    # NAME the boundary, never decode garbage
    h = bytearray()
    h += _num(0x01)  # kHeader
    h += _num(0x04)  # kMainStreamsInfo
    h += _num(0x06) + _num(0) + _num(1)  # PackInfo, pos 0, 1 stream
    h += _num(0x09) + _num(4) + _num(0x00)  # kSize [4], kEnd
    h += _num(0x07) + _num(0x0B) + _num(1) + bytes([0])  # UnpackInfo
    h += _num(1)  # one coder
    h.append(4)  # id size 4, simple, no props
    h += b"\x06\xf1\x07\x01"  # AES-256 + SHA-256
    h += _num(0x0C) + _num(4) + _num(0x00)  # unpack sizes, kEnd
    h += _num(0x00)  # end StreamsInfo
    h += _num(0x05) + _num(1)  # FilesInfo, 1 file
    name = b"\x00" + "x.txt\x00".encode("utf-16-le")
    h += _num(0x11) + _num(len(name)) + name
    h += _num(0x00) + _num(0x00)
    header = bytes(h)
    start = struct.pack("<QQI", 4, len(header), zlib.crc32(header))
    pay = (MAGIC_7Z + b"\x00\x04" + struct.pack("<I", zlib.crc32(start))
           + start + b"\x00\x01\x02\x03" + header)
    with pytest.raises(ValueError, match="AES-256"):
        parse_7z(pay)


def test_unknown_coder_named():
    pay = bytearray(build_7z([("a.txt", b"x" * 64)], codec="lzma2"))
    idx = pay.rindex(b"\x21")  # the LZMA2 codec id byte in the header
    pay[idx] = 0x7E  # an id no table maps
    # header CRC now mismatches; rewrite it so the coder check is hit
    header = bytes(pay[32 + struct.unpack_from("<Q", pay, 12)[0]:])
    struct.pack_into("<I", pay, 28, zlib.crc32(header))
    start = bytes(pay[12:32])
    struct.pack_into("<I", pay, 8, zlib.crc32(start))
    with pytest.raises(ValueError, match="out of scope"):
        parse_7z(bytes(pay))


@pytest.mark.parametrize("codec", ("copy", "lzma2", "delta+lzma2"))
def test_tear_fuzz_never_wrong_bytes(codec):
    """Truncations at 100 positions + 200 single-byte mutations: every
    outcome is ValueError or the exact original members."""
    pay = build_7z(MEMBERS, codec=codec)
    n = len(pay)
    for i in range(100):
        cut = 1 + (i * (n - 1)) // 100
        try:
            got = parse_7z(pay[:cut])
        except ValueError:
            continue
        assert got == WANT, f"truncation at {cut} returned wrong members"
    import random

    rnd = random.Random(715)
    for _ in range(200):
        pos = rnd.randrange(n)
        bit = 1 << rnd.randrange(8)
        mut = bytearray(pay)
        mut[pos] ^= bit
        try:
            got = parse_7z(bytes(mut))
        except ValueError:
            continue
        assert got == WANT, f"mutation at {pos} returned wrong members"


def test_archive_route_sniff_and_iter():
    pay = build_7z(MEMBERS, codec="lzma2")
    assert sniff_archive_format(pay) == "7z"
    assert list(iter_archive_members(pay)) == WANT


def test_archive_route_spark_explode(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        explode_archives,
    )

    good = build_7z(MEMBERS, codec="bcj+lzma2")
    torn = good[: len(good) - 8]
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(torn))],
        "archive_id long, payload binary",
    )
    rows = explode_archives(df).collect()
    ok = sorted(
        (r.member_name, bytes(r.member_bytes))
        for r in rows
        if r.archive_id == 1 and r.parse_error is None
    )
    assert ok == sorted(WANT)
    quarantined = [r for r in rows if r.archive_id == 2]
    assert len(quarantined) == 1
    assert quarantined[0].parse_error is not None
