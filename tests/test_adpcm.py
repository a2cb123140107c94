"""ADPCM WAV codecs (operators/adpcm.py): the IMA core cross-pinned
EXACTLY against CPython's own C implementation (audioop — a real
independent codec), WAV block layouts, parse_wav routing, tears."""

from __future__ import annotations

import struct
import warnings

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.adpcm import (
    decode_ima_wav_blocks,
    decode_ms_adpcm_blocks,
    encode_ima_wav_blocks,
    encode_ms_adpcm_blocks,
    ima_encode_step,
    ima_step,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
    parse_wav,
)

rng = np.random.RandomState(3)


def _sig(n=4000, amp=15000):
    return (np.sin(np.linspace(0, 40, n)) * amp).astype(np.int16)


def test_ima_core_exact_vs_audioop_both_directions():
    """audioop.lin2adpcm/adpcm2lin is CPython's C implementation of
    the same Intel/DVI core — our decode of ITS stream and its decode
    of OUR nibbles must both match our core sample-for-sample."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    x = (_sig() + rng.randint(-500, 500, 4000)).astype(np.int16)
    frag, _state = audioop.lin2adpcm(x.tobytes(), 2, None)
    ref = np.frombuffer(audioop.adpcm2lin(frag, 2, None)[0], dtype=np.int16)
    pred = idx = 0
    ours = []
    for byte in frag:  # audioop packs the FIRST sample in the HIGH nibble
        for nib in (byte >> 4, byte & 0xF):
            pred, idx = ima_step(pred, idx, nib)
            ours.append(pred)
    assert np.array_equal(np.array(ours[: len(ref)], dtype=np.int16), ref)

    pred = idx = 0
    nibs = []
    for s in x:
        nib, pred, idx = ima_encode_step(int(s), pred, idx)
        nibs.append(nib)
    packed = bytes(
        (nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs) - 1, 2)
    )
    ref2 = np.frombuffer(audioop.adpcm2lin(packed, 2, None)[0], dtype=np.int16)
    pred = idx = 0
    ours2 = []
    for nib in nibs:
        pred, idx = ima_step(pred, idx, nib)
        ours2.append(pred)
    assert np.array_equal(np.array(ours2[: len(ref2)], dtype=np.int16), ref2)


def _wav(fmt_code, ch, sr, balign, bits, body):
    fmt = struct.pack("<HHIIHH", fmt_code, ch, sr, sr * balign, balign, bits)
    fmt += b"\x00\x00"
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    return out


@pytest.mark.parametrize("ch", [1, 2])
def test_ima_wav_end_to_end(ch):
    sig = _sig()
    s = np.repeat(sig, ch) if ch == 2 else sig
    data, ba = encode_ima_wav_blocks(s, ch, samples_per_block=249)
    x, sr, gotch = parse_wav(_wav(0x11, ch, 8000, ba, 4, data))
    assert (sr, gotch) == (8000, ch)
    ref = sig.astype(np.float64) / 32768.0
    m = min(len(x), len(ref))
    rms = np.sqrt(np.mean((x[100:m] - ref[100:m]) ** 2))
    assert rms < 0.005 * np.sqrt(np.mean(ref[100:m] ** 2)) + 1e-4


@pytest.mark.parametrize("ch", [1, 2])
def test_ms_adpcm_wav_end_to_end(ch):
    sig = _sig()
    s = np.repeat(sig, ch) if ch == 2 else sig
    data, ba = encode_ms_adpcm_blocks(s, ch, samples_per_block=200)
    x, sr, gotch = parse_wav(_wav(0x02, ch, 8000, ba, 4, data))
    assert (sr, gotch) == (8000, ch)
    ref = sig.astype(np.float64) / 32768.0
    m = min(len(x), len(ref))
    rms = np.sqrt(np.mean((x[100:m] - ref[100:m]) ** 2))
    assert rms < 0.01 * np.sqrt(np.mean(ref[100:m] ** 2)) + 1e-4


def test_block_header_predictor_is_exact_at_block_starts():
    # the first sample of every IMA block is stored verbatim
    sig = _sig(1000)
    data, ba = encode_ima_wav_blocks(sig, 1, samples_per_block=249)
    dec = decode_ima_wav_blocks(data, 1, ba)
    for b, f in enumerate(range(0, 750, 249)):
        assert dec[b * 249 + (0 if b == 0 else 0)] is not None
    assert int(dec[0]) == int(sig[0])
    assert int(dec[249]) == int(sig[249])


def test_tears_and_ranges():
    with pytest.raises(ValueError, match="no whole block"):
        decode_ima_wav_blocks(b"", 1, 256)
    with pytest.raises(ValueError, match="step index"):
        decode_ima_wav_blocks(struct.pack("<hBB", 0, 99, 0) + b"\x00" * 4, 1, 8)
    with pytest.raises(ValueError, match="predictor index"):
        decode_ms_adpcm_blocks(bytes([9]) + b"\x00" * 6, 1, 7)
    with pytest.raises(ValueError, match="no whole block"):
        decode_ms_adpcm_blocks(b"\x00" * 3, 1, 32)
    sig = _sig(600)
    data, ba = encode_ima_wav_blocks(sig, 1, samples_per_block=249)
    x, _, _ = parse_wav(_wav(0x11, 1, 8000, ba, 4, data))
    assert len(x) > 0
    with pytest.raises(ValueError, match="bits-per-sample"):
        parse_wav(_wav(0x11, 1, 8000, ba, 8, data))


def test_unknown_format_still_quarantines():
    with pytest.raises(ValueError, match="outside the declared scope"):
        parse_wav(_wav(0x0055, 1, 8000, 1, 0, b"\x00" * 10))  # MP3-in-WAV


def test_fact_chunk_trims_last_block_padding():
    sig = _sig(700)  # not a block multiple: the encoder pads block 3
    data, ba = encode_ima_wav_blocks(sig, 1, samples_per_block=249)
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 8000 * ba, ba, 4) + b"\x00\x00"
    fact = struct.pack("<I", 700)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", 4) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    x, sr, ch = parse_wav(blob)
    assert len(x) == 700  # exact, not padded to the block boundary


def test_ms_adpcm_negative_predictor_truncates_toward_zero():
    """Microsoft spec / ffmpeg use C integer division by 256 for the
    predictor sum; a floor shift differs by 1 on negative sums and the
    error propagates through s1/s2 (r11 advice). Pair 5 = (460, -208)
    with s1=1, s2=3 gives sum = -164, the discriminating case:
    trunc -> 0, floor shift -> -1."""
    import struct as _struct

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.adpcm import (
        MS_ADAPT,
        MS_COEFFS,
        _trunc256,
        decode_ms_adpcm_blocks,
    )

    assert _trunc256(-257) == -1  # floor shift would give -2
    assert _trunc256(257) == 1 and _trunc256(-256) == -1

    co1, co2 = MS_COEFFS[5]  # (460, -208): non-256-multiple negative sums
    s1, s2, delta = 1, 3, 16
    raw_sum = s1 * co1 + s2 * co2
    assert raw_sum < 0 and raw_sum % 256 != 0  # the discriminating case
    # block: pred_idx=5, delta, s1, s2, then one data byte = nibbles (1, 0)
    block = bytes([5]) + _struct.pack("<hhh", delta, s1, s2) + bytes([0x10])
    out = decode_ms_adpcm_blocks(block, channels=1, block_align=8)
    expect_3rd = int(raw_sum / 256) + 1 * delta  # trunc toward zero, nib=+1
    assert list(out[:3]) == [s2, s1, expect_3rd]
    # floor-shift implementation would produce expect_3rd - 1
    assert (raw_sum >> 8) + delta == expect_3rd - 1
    # 4th sample: state advanced (s2,s1)=(s1,expect_3rd), delta adapted
    d2 = max(16, (MS_ADAPT[1] * delta) >> 8)
    expect_4th = int((expect_3rd * co1 + s1 * co2) / 256) + 0 * d2
    assert out[3] == expect_4th
