"""8SVX codec (operators/svx.py): REAL CPython file pinned sample-for-
sample, mono/stereo roundtrips, Fibonacci-delta exactness + clamping,
declared-scope quarantines, registry dispatch, 300-case tear fuzz."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.svx import (
    FIB_DELTAS,
    _fib_decode,
    _fib_encode,
    encode_8svx,
    parse_8svx,
)


def _real_path():
    hits = sorted(glob.glob("/root/.pyenv/versions/*/lib/python*/test/sndhdrdata/sndhdr.8svx"))
    return hits[-1] if hits else None


def test_real_file_pinned_sample_for_sample():
    """CPython's sndhdr.8svx (a real third-party writer: 'File created
    by Sound Ex...' ANNO): 44100 Hz, CHAN 6 stereo as sequential
    blocks, BODY hex 0100ff010000 0000ff00 -> left [1,0,-1,1,0],
    right [0,0,0,-1,0], mono the exact halves."""
    path = _real_path()
    if path is None:
        pytest.skip("no host sndhdr.8svx")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        sniff_audio_format,
    )

    blob = open(path, "rb").read()
    assert sniff_audio_format(blob) == "8svx"
    mono, sr, ch = decode_audio(blob)
    assert (sr, ch) == (44100, 2) and len(mono) == 5
    want = (np.array([1, 0, -1, 1, 0]) + np.array([0, 0, 0, -1, 0])) / 2.0 / 128.0
    assert np.array_equal(mono, want)


def test_mono_roundtrip_exact():
    rng = np.random.default_rng(5)
    x = rng.integers(-128, 128, 300, dtype=np.int64)
    mono, sr, ch = parse_8svx(encode_8svx(x, 16574, annotation=b"fixture"))
    assert (sr, ch) == (16574, 1)
    assert np.array_equal(np.rint(mono * 128).astype(np.int64), x)


def test_stereo_sequential_blocks():
    left = np.arange(-10, 10, dtype=np.int64)
    right = np.arange(10, -10, -1, dtype=np.int64)
    x = np.stack([left, right], axis=1)
    mono, sr, ch = parse_8svx(encode_8svx(x, 8000))
    assert ch == 2
    assert np.array_equal(mono, (left + right) / 2.0 / 128.0)


def test_fib_delta_exact_when_deltas_representable():
    """A sample chain whose consecutive differences are table entries
    roundtrips EXACTLY through the Fibonacci-delta coder."""
    rng = np.random.default_rng(9)
    vals = [7]
    for _ in range(199):
        d = FIB_DELTAS[int(rng.integers(0, 16))]
        nxt = max(-128, min(127, vals[-1] + d))
        if nxt != vals[-1] + d:
            nxt = vals[-1]  # hit the rail: use delta 0 instead
        vals.append(nxt)
    x = np.array(vals, dtype=np.int64)
    mono, sr, ch = parse_8svx(encode_8svx(x, 11025, fib=True))
    got = np.rint(mono * 128).astype(np.int64)
    # fib bodies pad to an even nibble count with a trailing 0-delta
    assert np.array_equal(got[: len(x)], x)
    assert len(got) <= len(x) + 1


def test_fib_decode_clamps_at_rails():
    # start at 120, two +21 deltas: 127 (clamped), stays 127... then -34
    body = bytes([0, 120, (15 << 4) | 15, (0 << 4) | 8])
    out = _fib_decode(body)
    assert list(out) == [120, 127, 127, 93, 93]
    # and the encoder's nearest-delta greedy stays in range
    assert _fib_encode(np.array([120, 127, 127, 93, 93]))


def test_declared_scope_quarantines():
    base = bytearray(encode_8svx(np.zeros(6, dtype=np.int64), 8000))
    vh = base.index(b"VHDR") + 8
    bad = bytearray(base)
    bad[vh + 15] = 2  # sCompression = 2
    with pytest.raises(ValueError, match="compression 2"):
        parse_8svx(bytes(bad))
    bad = bytearray(base)
    bad[vh + 14] = 3  # ctOctave = 3
    with pytest.raises(ValueError, match="multi-octave"):
        parse_8svx(bytes(bad))
    with pytest.raises(ValueError, match="not an 8SVX"):
        parse_8svx(b"FORM\x00\x00\x00\x04AIFF")
    with pytest.raises(ValueError, match="out of int8"):
        encode_8svx(np.array([300]), 8000)
    with pytest.raises(ValueError, match="fib \\+ stereo"):
        encode_8svx(np.zeros((4, 2), dtype=np.int64), 8000, fib=True)


def test_tear_contract_fuzz():
    rng = np.random.default_rng(13)
    x = rng.integers(-128, 128, 150, dtype=np.int64)
    blob = encode_8svx(x, 8000, annotation=b"note")
    for trial in range(300):
        mutated = bytearray(blob)
        if trial % 2 == 0:
            mutated = mutated[: int(rng.integers(0, len(mutated)))]
        else:
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            parse_8svx(bytes(mutated))
        except ValueError:
            pass


# ---- r10 second-review regression pins --------------------------------------


def test_fib_even_sample_count_no_phantom_tail():
    """An even sample count means an odd delta count -> the coder pads a
    0-delta nibble; the VHDR sample count must trim the phantom sample."""
    x = np.array([10, 11], dtype=np.int64)
    mono, sr, ch = parse_8svx(encode_8svx(x, 8000, fib=True))
    assert np.array_equal(np.rint(mono * 128).astype(np.int64), x)
    assert len(mono) == 2


def test_fib_negative_initial_sample():
    """Initial byte >= 128 (negative int8) must sign-extend without
    NumPy-2 overflow hazards."""
    x = np.array([-50, -49, -51], dtype=np.int64)
    mono, _, _ = parse_8svx(encode_8svx(x, 8000, fib=True))
    assert np.array_equal(np.rint(mono * 128).astype(np.int64)[:3], x)
    assert list(_fib_decode(bytes([0, 206, (9 << 4) | 7]))) == [-50, -49, -50]


def test_torn_chan_chunk_raises_value_error():
    blob = bytearray(encode_8svx(np.zeros((4, 2), dtype=np.int64), 8000))
    i = blob.index(b"CHAN")
    torn = bytes(blob[: i + 4]) + struct.pack(">I", 2) + b"\x00\x00"
    with pytest.raises(ValueError, match="torn 8SVX CHAN|torn 8SVX chunk"):
        parse_8svx(torn)


def test_encoder_rejects_uword_overflow_rate():
    with pytest.raises(ValueError, match="UWORD"):
        encode_8svx(np.zeros(4, dtype=np.int64), 96000)
    with pytest.raises(ValueError, match="UWORD"):
        encode_8svx(np.zeros(4, dtype=np.int64), 0)


def test_anno_cksize_excludes_pad():
    blob = encode_8svx(np.zeros(4, dtype=np.int64), 8000, annotation=b"abc")
    i = blob.index(b"ANNO")
    (sz,) = struct.unpack(">I", blob[i + 4 : i + 8])
    assert sz == 3 and blob[i + 8 : i + 11] == b"abc"
    assert blob[i + 11] == 0  # pad byte outside ckSize
    mono, _, _ = parse_8svx(blob)  # and the walk still lands on BODY
    assert len(mono) == 4


def test_empty_body_quarantines():
    blob = bytearray(encode_8svx(np.zeros(2, dtype=np.int64), 8000))
    i = blob.index(b"BODY")
    empty = bytes(blob[: i + 4]) + struct.pack(">I", 0)
    with pytest.raises(ValueError, match="no samples"):
        parse_8svx(empty)
