"""Zstandard (RFC 8878) battery — the liblz4/libbrotli playbook:
every direction pinned against the system libzstd via ctypes
(tools/zstd_rig.py).

- decode: real ZSTD_compress2 output across levels 1..22, window logs,
  checksum on/off, content-size on/off, 11 corpora → byte-identical.
- encode: our store-mode and LZ-fixture frames decode in the real
  library.
- xxHash64 vectors, skippable/multi-frame layout, dictionary-frame
  rejection (named boundary), 300-case tear fuzz (ValueError only).
"""

import random
import struct
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
    probe_zstd,
    xxhash64,
    zstd_compress_fixture,
    zstd_compress_store,
    zstd_decompress,
)


def _rig():
    from zstd_rig import zstd_lib

    if zstd_lib() is None:
        pytest.skip("no system libzstd (visible host gap)")
    from zstd_rig import ref_compress, ref_decompress

    return ref_compress, ref_decompress


_LOREM = (
    b"Lorem ipsum dolor sit amet, consectetur adipiscing elit, sed do "
    b"eiusmod tempor incididunt ut labore et dolore magna aliqua. "
)


def _corpora():
    rnd = random.Random(7)
    return {
        "empty": b"",
        "one": b"Z",
        "short": b"the quick brown fox jumps over the lazy dog",
        "lorem": _LOREM * 200,
        "lorem_big": _LOREM * 20000,  # ~2.3 MB, multi-block
        "random": bytes(rnd.randrange(256) for _ in range(100000)),
        "repetitive": b"abcabcabc" * 30000,
        "uniform": b"\x00" * 250000,
        "jsonl": b"".join(
            b'{"id": %d, "v": "%d"}\n' % (i, i * 37 % 1000)
            for i in range(20000)
        ),
        "utf8": ("héllo wörld — ζστδ フレーム 🎉 " * 5000).encode(),
        "source": Path(__file__).read_bytes(),
    }


def test_xxhash64_vectors():
    # published xxHash reference vectors (seed 0)
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxhash64(b"abc") == 0x44BC2CF5AD770999
    # seeded + length classes (4/8/32-byte paths)
    assert xxhash64(b"", seed=1) != xxhash64(b"")
    for n in (3, 4, 7, 8, 15, 31, 32, 33, 63, 100):
        h = xxhash64(bytes(range(n % 256))[:n] * 1)
        assert 0 <= h < 1 << 64


def test_real_libzstd_streams_decode_byte_identical():
    """The headline pin: 11 corpora x levels x checksum x window log,
    every stream from the REAL encoder decodes byte-identical."""
    ref_compress, _ = _rig()
    n = 0
    for name, data in _corpora().items():
        for level in (1, 3, 7, 12, 19, 22):
            for ck in (False, True):
                c = ref_compress(data, level=level, checksum=ck)
                assert zstd_decompress(c) == data, (name, level, ck)
                n += 1
        # window-log + no-content-size shapes at one mid level
        for wlog in (10, 18, 24):
            c = ref_compress(data, level=6, window_log=wlog)
            assert zstd_decompress(c) == data, (name, wlog)
            n += 1
        c = ref_compress(data, level=6, content_size=False, checksum=True)
        assert zstd_decompress(c) == data, (name, "no-fcs")
        n += 1
    assert n >= 170


def test_fixture_frames_decode_in_real_libzstd():
    _, ref_decompress = _rig()
    rnd = random.Random(3)
    cases = [
        b"",
        b"x",
        _LOREM * 100,
        bytes(rnd.randrange(256) for _ in range(5000)),
        b"\x07" * 300000,  # multi-block RLE
        b"".join(
            b'{"id": %d, "text": "doc body"}\n' % i for i in range(500)
        ),
    ]
    for d in cases:
        for mode in ("store", "lz"):
            f = zstd_compress_fixture(d, mode)
            assert zstd_decompress(f) == d
            assert ref_decompress(f, max(len(d), 1) + 32) == d


def test_multiframe_and_skippable():
    ref_compress, _ = _rig()
    a = b"frame one " * 100
    b = b"frame two " * 100
    skip = struct.pack("<II", 0x184D2A53, 7) + b"padding"
    c = ref_compress(a, level=5) + skip + ref_compress(b, level=9,
                                                       checksum=True)
    assert zstd_decompress(c) == a + b


def test_probe_and_dictionary_rejection():
    ref_compress, _ = _rig()
    c = ref_compress(b"probe me " * 50, level=3, checksum=True)
    p = probe_zstd(c)
    assert p["frames"][0]["kind"] == "zstd"
    assert p["frames"][0]["content_size"] == 450
    assert p["frames"][0]["has_checksum"] is True
    assert p["frames"][0]["dictionary_id"] == 0
    # hand-crafted dictionary frame header → named boundary
    bad = struct.pack("<I", 0xFD2FB528) + bytes([0x01, 0x58, 0x07])
    with pytest.raises(ValueError, match="[Dd]ictionary"):
        zstd_decompress(bad + b"\x01\x00\x00")


def test_checksum_detects_corruption():
    f = zstd_compress_store(b"checksummed payload " * 20, checksum=True)
    # flip one bit inside a raw block body (past header), keep layout
    bad = bytearray(f)
    bad[20] ^= 0x01
    with pytest.raises(ValueError):
        zstd_decompress(bytes(bad))


def test_tear_fuzz_valueerror_only():
    ref_compress, _ = _rig()
    base = ref_compress(b"The quick brown fox. " * 500, level=9,
                        checksum=True)
    rnd = random.Random(14)
    for case in range(300):
        data = bytearray(base)
        op = rnd.randrange(3)
        if op == 0:
            data = data[: rnd.randrange(1, len(data))]
        elif op == 1:
            for _ in range(rnd.randrange(1, 6)):
                data[rnd.randrange(len(data))] = rnd.randrange(256)
        else:
            pos = rnd.randrange(len(data))
            data[pos:pos] = bytes(
                rnd.randrange(256) for _ in range(rnd.randrange(1, 9))
            )
        try:
            zstd_decompress(bytes(data))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"case {case}: non-ValueError tear "
                f"{type(exc).__name__}: {exc}"
            )


def test_archive_route_tar_zst():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        build_tar,
        iter_archive_members,
        sniff_archive_format,
    )

    members = [("a.txt", b"alpha " * 100), ("d/b.bin", bytes(range(256)))]
    tz = zstd_compress_store(build_tar(members))
    assert sniff_archive_format(tz) == "tzst"
    got = list(iter_archive_members(tz))
    assert got == members
    # and a REAL libzstd-compressed tar takes the same route
    ref_compress, _ = _rig()
    tz2 = ref_compress(build_tar(members), level=19)
    assert list(iter_archive_members(tz2)) == members


def test_warc_http_zstd_body():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
        decode_http_body,
    )

    body = b"modern corpus shard content " * 30
    coded = zstd_compress_fixture(body, "lz")
    blk = (b"HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\n" + coded)
    status, decoded, enc = decode_http_body(blk)
    assert (status, enc) == (200, "zstd")
    assert decoded == body
    with pytest.raises(ValueError):
        decode_http_body(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\n"
            + coded[: len(coded) // 2]
        )


def test_jsonl_zst_shard_roundtrip():
    """The .jsonl.zst corpus-shard shape (The Pile / RedPajama /
    FineWeb distribution format): shard → decode → lines."""
    ref_compress, _ = _rig()
    lines = [
        b'{"doc_id": %d, "text": "document %d body"}' % (i, i)
        for i in range(1000)
    ]
    shard = ref_compress(b"\n".join(lines) + b"\n", level=9, checksum=True)
    decoded = zstd_decompress(shard)
    assert decoded.split(b"\n")[:-1] == lines


def test_dictionary_frames_decode_byte_identical():
    """[r14 second wave] RFC 8878 §5 dictionaries: real ZDICT-trained
    structured dictionaries AND raw content prefixes, frames from the
    real ZSTD_compress_usingDict, decoded byte-identical; a dictionary
    frame without its dictionary (or with the wrong one) raises the
    named ValueError."""
    _rig()
    from zstd_rig import ref_compress_dict, train_dict

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
        parse_zstd_dictionary,
    )

    samples = [
        (
            '{"id": %d, "name": "user%d", "city": "Berlin", '
            '"tags": ["a","b"]}' % (i, i)
        ).encode()
        for i in range(300)
    ]
    d = train_dict(samples)
    info = parse_zstd_dictionary(d)
    assert info["dict_id"] != 0 and len(info["content"]) > 0
    assert sorted(info["tables"]) == ["ll", "ml", "of"]
    for level in (1, 3, 9, 19):
        for s in samples[:40]:
            c = ref_compress_dict(s, d, level=level)
            assert zstd_decompress(c, dictionary=d) == s
    # raw content prefix dictionary (no magic, Dictionary_ID stays 0)
    raw = b"".join(samples[:20])
    c = ref_compress_dict(samples[3], raw, level=9)
    assert zstd_decompress(c, dictionary=raw) == samples[3]
    # the named boundaries
    c = ref_compress_dict(samples[5], d, level=3)
    with pytest.raises(ValueError, match="needs dictionary"):
        zstd_decompress(c)
    d2 = train_dict([s[::-1] for s in samples])
    if parse_zstd_dictionary(d2)["dict_id"] != info["dict_id"]:
        with pytest.raises(ValueError, match="dictionary"):
            zstd_decompress(c, dictionary=d2)


def test_negative_levels_and_long_distance_matching():
    """[r14] the fast-mode levels (-7..-1, no entropy tables / RLE
    shapes) and long-distance-matching frames (ZSTD_c_ldm + window log
    25) decode byte-identical — the remaining encoder surfaces the
    level battery missed."""
    import ctypes
    import os

    from zstd_rig import zstd_lib

    lib = zstd_lib()
    if lib is None:
        pytest.skip("no system libzstd (visible host gap)")

    def comp(data, level, ldm=0, wlog=0):
        cctx = lib.ZSTD_createCCtx()
        try:
            for param, val in ((100, level), (160, ldm), (101, wlog)):
                rc = lib.ZSTD_CCtx_setParameter(cctx, param, val)
                assert not lib.ZSTD_isError(rc)
            cap = lib.ZSTD_compressBound(len(data))
            dst = ctypes.create_string_buffer(cap)
            n = lib.ZSTD_compress2(cctx, dst, cap, data, len(data))
            assert not lib.ZSTD_isError(n)
            return dst.raw[:n]
        finally:
            lib.ZSTD_freeCCtx(cctx)

    path = "/root/testdata/sf0.01/documents.parquet"
    data = open(path, "rb").read() if os.path.exists(path) else _LOREM * 5000
    for lvl in (-7, -3, -1):
        assert zstd_decompress(comp(data, lvl)) == data, lvl
    big = data * 8
    assert zstd_decompress(comp(big, 12, ldm=1, wlog=25)) == big
