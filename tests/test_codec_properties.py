"""Hypothesis property tests for the from-spec codecs — shrinking
counterexamples beat fixed fuzz seeds for the bit-level formats."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
    decode_flac,
    encode_flac,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
    build_minimal_mp4,
    extract_samples,
    probe_mp4,
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
    st.sampled_from([1, 2]),
    st.sampled_from([64, 200, 4096]),
)
def test_flac_roundtrip_lossless(vals, ch, blocksize):
    n = len(vals) - (len(vals) % ch or ch) + ch if len(vals) % ch else len(vals)
    arr = np.array(vals[: max(ch, n)], dtype=np.int64)
    if arr.size % ch:
        arr = arr[: arr.size - (arr.size % ch)]
    if arr.size == 0:
        arr = np.zeros(ch, dtype=np.int64)
    x = arr.reshape(-1, ch)
    y, sr, ch2, bps = decode_flac(encode_flac(x, 16000, blocksize=blocksize))
    assert ch2 == ch and np.array_equal(y, x)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 3),
    st.integers(1, 3),
    st.integers(0, 2**32 - 1),
    st.sampled_from([30, 75, 100]),
)
def test_jpeg_progressive_equals_baseline(bh, bw, seed, quality):
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (bh * 8, bw * 8, 3)).astype(np.uint8)
    base, _, _ = decode_jpeg(encode_jpeg(px, quality=quality))
    prog, _, _ = decode_jpeg(encode_jpeg_progressive(px, quality=quality))
    assert np.array_equal(base, prog)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(min_size=1, max_size=60), min_size=1, max_size=20))
def test_mp4_sample_extraction_byte_exact(samples):
    mp4 = build_minimal_mp4(samples)
    t = probe_mp4(mp4)["tracks"][0]
    assert t["n_samples"] == len(samples)
    assert extract_samples(mp4, t, range(len(samples))) == samples


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(1, 400), min_size=0, max_size=12))
def test_warc_incremental_equals_batch_under_any_chunking(cuts):
    """iter_warc_records must produce the batch parser's exact output no
    matter where the byte stream is split into chunks."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
        build_warc,
        iter_warc_records,
        parse_warc_records,
    )

    recs = [
        {
            "warc_type": "response",
            "target_uri": f"http://h/{i}",
            "warc_date": "2026-01-01T00:00:00Z",
            "record_id": f"<urn:uuid:{i}>",
            "content_type": "text/plain",
            "block": (f"body {i} " * (i + 1)).encode(),
        }
        for i in range(3)
    ]
    data = build_warc(recs)
    chunks, prev = [], 0
    for c in sorted(set(min(c, len(data)) for c in cuts)):
        chunks.append(data[prev:c])
        prev = c
    chunks.append(data[prev:])
    assert list(iter_warc_records(iter(chunks))) == parse_warc_records(data)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.integers(2, 18),
    st.booleans(),
    st.sampled_from([0, 3, 7]),
    st.booleans(),
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_webp_vp8l_roundtrip_lossless(h, w, ncol, sg, cb, lz, pal, seed):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    px = colors[rng.integers(0, ncol, (h, w))]
    blob = encode_webp_lossless(
        px,
        subtract_green=sg and not pal,
        cache_bits=cb,
        lz77_rows=lz,
        palette=pal and not sg,
    )
    rgb, got_w, got_h = decode_webp(blob)
    assert (got_w, got_h) == (w, h)
    assert (rgb == px).all()


@settings(max_examples=40, deadline=None)
@given(
    st.sampled_from(["pcm8", "pcm16", "pcm24", "pcm32"]),
    st.lists(st.integers(-128, 127), min_size=1, max_size=400),
    st.sampled_from([8000, 11025, 44100]),
    st.booleans(),
)
def test_au_integer_roundtrip_lossless(enc, vals, rate, annotate):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.au import (
        encode_au,
        parse_au,
    )

    scale = {"pcm8": 128, "pcm16": 32768, "pcm24": 1 << 23, "pcm32": 1 << 31}[enc]
    x = np.array(vals, dtype=np.int64)
    blob = encode_au(x, rate, enc, annotation=b"anno" if annotate else b"")
    mono, sr, ch = parse_au(blob)
    assert sr == rate and ch == 1
    assert np.array_equal(np.rint(mono * scale).astype(np.int64), x)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(-128, 127), min_size=1, max_size=300),
    st.booleans(),
    st.sampled_from([8000, 22050]),
)
def test_8svx_roundtrip(vals, stereo, rate):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.svx import (
        encode_8svx,
        parse_8svx,
    )

    x = np.array(vals, dtype=np.int64)
    if stereo:
        x = np.stack([x, x[::-1]], axis=1)
    mono, sr, ch = parse_8svx(encode_8svx(x, rate))
    assert sr == rate and ch == (2 if stereo else 1)
    want = x.mean(axis=1) / 128.0 if stereo else x / 128.0
    assert np.array_equal(mono, want)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-128, 127), min_size=1, max_size=200))
def test_8svx_fib_delta_is_contractive(vals):
    """The greedy Fibonacci-delta coder is lossy in general, but every
    decoded step must stay a valid table walk within int8 rails and the
    decode must track the encoder's internal state exactly."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.svx import (
        FIB_DELTAS,
        _fib_decode,
        _fib_encode,
    )

    x = np.array(vals, dtype=np.int64)
    dec = _fib_decode(_fib_encode(x))
    assert len(dec) >= len(x)
    assert dec.min() >= -128 and dec.max() <= 127
    diffs = np.diff(dec)
    for i, d in enumerate(diffs):
        if int(d) not in FIB_DELTAS:
            # a non-table step can only be a rail clamp: the landing
            # value must sit exactly on an int8 rail
            assert dec[i + 1] in (-128, 127), (i, int(d), int(dec[i + 1]))
