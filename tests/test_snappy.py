"""Raw snappy codec pinned BOTH directions against the real snappy
library on this host (pyarrow.compress/decompress delegates to it)."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.snappy import (
    snappy_compress,
    snappy_decompress,
)


def _corpora():
    rng = random.Random(3)
    return [
        b"",
        b"a",
        b"hello hello hello hello world" * 50,
        bytes(rng.randrange(256) for _ in range(5000)),
        b"the quick brown fox " * 400,
        b"\x00" * 100000,                      # long overlapping RLE
        open("/root/repo/README.md", "rb").read(),
        bytes(range(256)) * 300,               # incompressible-ish
    ]


def test_decode_pinned_on_real_snappy_output():
    for c in _corpora():
        real = pa.compress(c, codec="snappy", asbytes=True)
        assert snappy_decompress(real) == c


def test_encode_accepted_by_real_snappy():
    for c in _corpora():
        ours = snappy_compress(c)
        back = pa.decompress(ours, decompressed_size=len(c),
                             codec="snappy", asbytes=True)
        assert back == c
        assert snappy_decompress(ours) == c


def test_overlapping_copy_semantics():
    # offset < length: the RLE idiom — 'ab' then copy(len 8, off 2)
    raw = b"\x0a" + b"\x04ab" + b"\x1e\x02\x00"
    assert snappy_decompress(raw) == b"ab" * 5


def test_bad_offsets_and_lengths_tear():
    with pytest.raises(ValueError):
        snappy_decompress(b"\x05" + b"\x0d\x00\x00")  # offset 0
    with pytest.raises(ValueError):
        snappy_decompress(b"\x05" + b"\x0d\xff\xff")  # off > out
    with pytest.raises(ValueError):
        snappy_decompress(b"\x7f\x00ab")  # length mismatch


def test_tear_fuzz_valueerror_only():
    base = pa.compress(b"payload " * 2000, codec="snappy",
                       asbytes=True)
    rng = random.Random(29)
    for case in range(300):
        mut = bytearray(base)
        if case % 2:
            mut = mut[: rng.randrange(0, len(mut))]
        else:
            for _ in range(rng.randrange(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            out = snappy_decompress(bytes(mut))
            assert len(out) < 1 << 24
        except ValueError:
            pass
