"""XZ / LZMA battery — both directions pinned against the system
liblzma (stdlib ``lzma`` binds it): real encoder output across
presets 0-9/EXTREME x all four check types x FORMAT_XZ/ALONE decodes
byte-identical; our store-mode .xz decodes in the real library;
BCJ/delta named boundaries; 300-case tear fuzz (ValueError only)."""

import lzma
import random

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xz import (
    crc64,
    lzma_alone_decompress,
    lzma2_decompress,
    xz_compress_store,
    xz_decompress,
)

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
        "lorem_big": _LOREM * 20000,
        "random": bytes(rnd.randrange(256) for _ in range(100000)),
        "repetitive": b"abcabcabc" * 30000,
        "uniform": bytes(250000),
        "jsonl": b"".join(
            b'{"id": %d, "v": "%d"}\n' % (i, i * 37 % 1000)
            for i in range(20000)
        ),
        "utf8": ("héllo wörld — ξζ 🎉 " * 5000).encode(),
    }


def test_crc64_vector():
    # ECMA-182 reflected check value for "123456789"
    assert crc64(b"123456789") == 0x995DC9BBDF1939FA


def test_real_liblzma_streams_decode_byte_identical():
    checks = [lzma.CHECK_NONE, lzma.CHECK_CRC32, lzma.CHECK_CRC64,
              lzma.CHECK_SHA256]
    n = 0
    for name, d in _corpora().items():
        for preset in (0, 1, 6, 9, 9 | lzma.PRESET_EXTREME):
            for ck in checks:
                c = lzma.compress(d, preset=preset, check=ck)
                assert xz_decompress(c) == d, (name, preset, ck)
                n += 1
    assert n == 200


def test_lzma_alone_format():
    for name, d in _corpora().items():
        for preset in (1, 6, 9):
            c = lzma.compress(d, format=lzma.FORMAT_ALONE, preset=preset)
            assert lzma_alone_decompress(c) == d, (name, preset)


def test_raw_lzma2_chunks():
    filters = [{"id": lzma.FILTER_LZMA2, "preset": 6}]
    for name, d in _corpora().items():
        c = lzma.compress(d, format=lzma.FORMAT_RAW, filters=filters)
        assert lzma2_decompress(c) == d, name


def test_store_mode_decodes_in_real_liblzma():
    for name, d in _corpora().items():
        f = xz_compress_store(d)
        assert lzma.decompress(f) == d, name
        assert xz_decompress(f) == d, name


def test_multistream_concatenation_with_padding():
    a = b"stream one " * 500
    b = b"stream two " * 500
    c = lzma.compress(a, preset=6) + b"\x00" * 8 + lzma.compress(
        b, preset=1, check=lzma.CHECK_CRC64
    )
    assert xz_decompress(c) == a + b
    # stdlib agrees on the unpadded concatenation (it stops at padding)
    c2 = lzma.compress(a, preset=6) + lzma.compress(
        b, preset=1, check=lzma.CHECK_CRC64
    )
    assert xz_decompress(c2) == a + b == lzma.decompress(c2)


def test_delta_filter_chains_decode():
    """[r14 second wave] the delta pre-filter decodes at every
    distance 1..256 (real liblzma FILTER_DELTA streams)."""
    d = bytes((i * 3 + (i >> 3)) & 0xFF for i in range(100000))
    for dist in (1, 2, 4, 8, 16, 255, 256):
        c = lzma.compress(d, filters=[
            {"id": lzma.FILTER_DELTA, "dist": dist},
            {"id": lzma.FILTER_LZMA2, "preset": 6},
        ])
        assert xz_decompress(c) == d, dist


def test_x86_bcj_filter_on_real_elf_binaries():
    """[r14 second wave] the x86 BCJ pre-filter (CALL/JMP rel32
    conversion) decodes REAL liblzma FILTER_X86 streams of REAL ELF
    shared objects byte-identical — the densest possible E8/E9 corpus,
    millions of bytes each."""
    import glob as _g

    paths = sorted(_g.glob("/usr/lib/x86_64-linux-gnu/libzstd.so.*.*"))
    paths += sorted(_g.glob("/usr/lib/x86_64-linux-gnu/liblzma.so.*.*"))
    if not paths:
        pytest.skip("no ELF corpus on this host")
    for path in paths[:2]:
        blob = open(path, "rb").read()
        for preset in (1, 6):
            c = lzma.compress(blob, filters=[
                {"id": lzma.FILTER_X86},
                {"id": lzma.FILTER_LZMA2, "preset": preset},
            ])
            assert xz_decompress(c) == blob, (path, preset)
    # delta+x86 stacked chain reverses in the right order
    blob = open(paths[0], "rb").read()[:200000]
    c = lzma.compress(blob, filters=[
        {"id": lzma.FILTER_DELTA, "dist": 1},
        {"id": lzma.FILTER_X86},
        {"id": lzma.FILTER_LZMA2, "preset": 4},
    ])
    assert xz_decompress(c) == blob


def test_other_bcj_archs_stay_named_boundaries():
    d = bytes(range(256)) * 100
    arm = lzma.compress(d, filters=[
        {"id": lzma.FILTER_ARM64} if hasattr(lzma, "FILTER_ARM64")
        else {"id": lzma.FILTER_ARM},
        {"id": lzma.FILTER_LZMA2, "preset": 6},
    ])
    with pytest.raises(ValueError, match="BCJ/delta"):
        xz_decompress(arm)


def test_check_detects_corruption():
    base = lzma.compress(b"checksummed " * 100, preset=6,
                         check=lzma.CHECK_CRC32)
    # find the block body region and flip a bit — any of header CRC,
    # LZMA2 structure, or the block check must catch it
    bad = bytearray(base)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(ValueError):
        xz_decompress(bytes(bad))


def test_tear_fuzz_valueerror_only():
    base = lzma.compress(b"The quick brown fox. " * 500, preset=9,
                         check=lzma.CHECK_CRC64)
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
            xz_decompress(bytes(data))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"case {case}: non-ValueError tear "
                f"{type(exc).__name__}: {exc}"
            )


def test_archive_route_tar_xz():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        build_tar,
        iter_archive_members,
        sniff_archive_format,
    )

    members = [("a.txt", b"alpha " * 100), ("d/b.bin", bytes(range(256)))]
    tx = lzma.compress(build_tar(members), preset=6)
    assert sniff_archive_format(tx) == "txz"
    assert list(iter_archive_members(tx)) == members
    # our store-mode frame takes the same route
    tx2 = xz_compress_store(build_tar(members))
    assert list(iter_archive_members(tx2)) == members


def test_jsonl_xz_shard_roundtrip():
    lines = [
        b'{"doc_id": %d, "text": "document %d body"}' % (i, i)
        for i in range(1000)
    ]
    shard = lzma.compress(b"\n".join(lines) + b"\n", preset=9)
    assert xz_decompress(shard).split(b"\n")[:-1] == lines
