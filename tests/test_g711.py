"""G.711 μ-law/A-law (operators/g711.py): code-identity over all 256
codes, decode-table spec pins, quantization-error bounds, RIFF parser
scope (PCM + companded + EXTENSIBLE), quarantine contract vs the stdlib
``wave`` module, registry dispatch, tear fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
    ALAW_DECODE_TABLE,
    ULAW_DECODE_TABLE,
    alaw_to_linear16,
    encode_wav_g711,
    linear16_to_alaw,
    linear16_to_ulaw,
    parse_wav,
    ulaw_to_linear16,
)


def test_alaw_code_identity_all_codes():
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(linear16_to_alaw(alaw_to_linear16(codes)), codes)


def test_ulaw_code_identity_all_codes():
    """encode(decode(c)) == c for every μ-law code except 0x7F (−0),
    which canonically collapses onto the +0 code 0xFF."""
    codes = np.arange(256, dtype=np.uint8)
    re = linear16_to_ulaw(ulaw_to_linear16(codes))
    mismatch = np.nonzero(re != codes)[0]
    assert mismatch.tolist() == [0x7F]
    assert re[0x7F] == 0xFF
    assert ULAW_DECODE_TABLE[0x7F] == 0 and ULAW_DECODE_TABLE[0xFF] == 0


def test_decode_table_spec_pins():
    """Pin published G.711 landmark values: the extreme and zero codes."""
    # μ-law: code 0x80 is the most negative (−32124), 0x00 is +max? no —
    # stored complemented: code 0x00 → u=0xFF → sign, e=7, m=15 → −32124
    assert ULAW_DECODE_TABLE[0x00] == -32124
    assert ULAW_DECODE_TABLE[0x80] == 32124
    assert ULAW_DECODE_TABLE[0xFF] == 0
    # A-law: a = c ^ 0x55; c=0x55 → a=0 → e=0, m=0, negative → −8
    assert ALAW_DECODE_TABLE[0x55] == -8
    assert ALAW_DECODE_TABLE[0xD5] == 8  # bit7 set = positive
    assert ALAW_DECODE_TABLE[0x2A] == -32256  # a=0x7F: e=7 m=15 negative
    assert ALAW_DECODE_TABLE[0xAA] == 32256
    assert ALAW_DECODE_TABLE.min() == -32256 and ALAW_DECODE_TABLE.max() == 32256
    assert ULAW_DECODE_TABLE.min() == -32124 and ULAW_DECODE_TABLE.max() == 32124


def test_quantization_error_bounds_full_range():
    x = np.arange(-32768, 32768, dtype=np.int32)
    err_u = np.abs(ulaw_to_linear16(linear16_to_ulaw(x)).astype(np.int32) - x)
    err_a = np.abs(alaw_to_linear16(linear16_to_alaw(x)).astype(np.int32) - x)
    # half the top-segment step (+ the clip shelf for μ-law)
    assert err_u.max() <= 644
    assert err_a.max() <= 512


def test_decode_monotonic_within_sign():
    """Decoded magnitude grows with (exponent, mantissa) — a table-build
    defect (wrong bias, wrong shift) breaks strict monotonicity."""
    # μ-law positive codes by decoded value: complemented storage means
    # codes 0xFF down to 0x80 decode to 0, …, 32124
    pos_u = ULAW_DECODE_TABLE[np.arange(0xFF, 0x7F, -1)]
    assert np.all(np.diff(pos_u) > 0) and pos_u[0] == 0
    pos_a = sorted(int(ALAW_DECODE_TABLE[c]) for c in range(256) if (c ^ 0x55) & 0x80)
    assert np.all(np.diff(pos_a) > 0)


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_g711_wav_roundtrip(law):
    rng = np.random.RandomState(3 if law == "ulaw" else 4)
    x = (rng.randint(-32768, 32768, size=800)).astype(np.int16)
    blob = encode_wav_g711(x, 8000, law=law)
    mono, sr, ch = parse_wav(blob)
    assert (sr, ch) == (8000, 1)
    dec = (
        ulaw_to_linear16(linear16_to_ulaw(x))
        if law == "ulaw"
        else alaw_to_linear16(linear16_to_alaw(x))
    )
    assert np.allclose(mono, dec.astype(np.float64) / 32768.0)


def test_g711_wav_stereo_downmix():
    x = np.array([1000, 3000, -1000, -3000], dtype=np.int16)  # L R L R
    blob = encode_wav_g711(x, 8000, law="alaw", channels=2)
    mono, sr, ch = parse_wav(blob)
    assert ch == 2 and len(mono) == 2
    dec = alaw_to_linear16(linear16_to_alaw(x)).astype(np.float64) / 32768.0
    assert np.allclose(mono, dec.reshape(-1, 2).mean(axis=1))


def test_parse_wav_pcm16_matches_legacy():
    import io
    import wave

    x = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(x.tobytes())
    mono, sr, ch = parse_wav(buf.getvalue())
    assert (sr, ch) == (16000, 1)
    assert np.allclose(mono, x.astype(np.float64) / 32768.0)


def test_parse_wav_extensible_wrapping():
    """WAVE_FORMAT_EXTENSIBLE with a μ-law SubFormat GUID decodes."""
    x = np.array([500, -500, 8000], dtype=np.int16)
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
        WAVE_FORMAT_MULAW,
    )

    codes = linear16_to_ulaw(x).tobytes()
    guid = struct.pack("<H", WAVE_FORMAT_MULAW) + b"\x00\x00" + bytes(12)
    fmt = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8)
        + struct.pack("<H", 22)
        + struct.pack("<HI", 8, 0x4)
        + guid[:16]
    )
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(codes))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(codes))
        + codes
    )
    mono, sr, ch = parse_wav(blob)
    assert (sr, ch) == (8000, 1)
    assert np.allclose(mono, ulaw_to_linear16(linear16_to_ulaw(x)) / 32768.0)


def test_float_wav_decodes():
    """IEEE-float WAVs (fmt 3) are in scope: exact passthrough, clamped."""
    x = np.array([0.25, -0.75, 1.5, -2.0], dtype=np.float32)
    for bits, dt in ((32, "<f4"), (64, "<f8")):
        body = x.astype(dt).tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * bits // 8, bits // 8, bits)
        blob = (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(body))
            + body
        )
        mono, sr, ch = parse_wav(blob)
        assert (sr, ch) == (44100, 1)
        assert np.allclose(mono, [0.25, -0.75, 1.0, -1.0])

    # non-finite samples are structural damage: tear
    bad = np.array([0.1, np.nan], dtype=np.float32).tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(bad))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(bad))
        + bad
    )
    with pytest.raises(ValueError, match="non-finite"):
        parse_wav(blob)


def test_out_of_scope_format_quarantines_with_valueerror():
    """An out-of-scope format (MP3-in-WAV, 0x0055) must raise
    ValueError (quarantine), not the wave.Error the stdlib parser this
    replaced would throw. (MS-ADPCM, the r10 example here, is IN scope
    since r11 — tests/test_adpcm.py.)"""
    fmt = struct.pack("<HHIIHH", 0x55, 1, 8000, 4000, 256, 0)
    body = b"\x00" * 8
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    with pytest.raises(ValueError, match="0x0055"):
        parse_wav(blob)


def test_registry_dispatch_g711():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        sniff_audio_format,
    )

    x = (2000 * np.sin(np.arange(400) * 0.1)).astype(np.int16)
    blob = encode_wav_g711(x, 8000, law="ulaw")
    assert sniff_audio_format(blob) == "wav"
    mono, sr, ch = decode_audio(blob)
    assert (sr, ch) == (8000, 1)
    assert len(mono) == 400


def test_tear_contract_fuzz():
    rng = np.random.RandomState(9)
    x = rng.randint(-32768, 32768, size=64).astype(np.int16)
    blob = encode_wav_g711(x, 8000, law="alaw")
    for trial in range(300):
        mutated = bytearray(blob[: rng.randint(0, len(blob))]) if trial % 2 else bytearray(blob)
        if trial % 2 == 0 and mutated:
            mutated[rng.randint(0, len(mutated))] ^= 1 << rng.randint(0, 8)
        try:
            parse_wav(bytes(mutated))
        except ValueError:
            pass  # the only legal failure mode
