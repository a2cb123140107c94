"""AIFF/AIFF-C codec (operators/aiff.py): 80-bit extended-float
sample-rate field, BE + sowt PCM roundtrips, signed 8-bit semantics,
declared-scope quarantines, registry dispatch, tear fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.aiff import (
    _decode_extended80,
    encode_aiff,
    encode_extended80,
    parse_aiff,
)


def test_extended80_common_rates_exact():
    for r in (8000, 11025, 16000, 22050, 32000, 44100, 48000, 96000, 192000):
        assert _decode_extended80(encode_extended80(float(r))) == float(r)


def test_extended80_spec_pin_44100():
    """Published layout pin: 44100 Hz encodes as 400E AC44 0000 0000 0000
    (exponent 0x400E, mantissa 0xAC44... left-justified)."""
    assert encode_extended80(44100.0) == bytes.fromhex("400eac44000000000000")
    assert _decode_extended80(bytes.fromhex("400eac44000000000000")) == 44100.0
    # 8000 Hz: 400B FA00...
    assert encode_extended80(8000.0) == bytes.fromhex("400bfa00000000000000")


@pytest.mark.parametrize("sowt", [False, True])
def test_pcm16_roundtrip(sowt):
    rng = np.random.RandomState(5 + int(sowt))
    x = rng.randint(-32768, 32768, size=700).astype(np.int16)
    mono, sr, ch = parse_aiff(encode_aiff(x, 44100, aifc_sowt=sowt))
    assert (sr, ch) == (44100, 1)
    assert np.allclose(mono, x.astype(np.float64) / 32768.0)


def test_stereo_downmix():
    st = np.array([100, 300, -100, -300], dtype=np.int16)
    mono, sr, ch = parse_aiff(encode_aiff(st, 8000, channels=2))
    assert ch == 2 and len(mono) == 2
    assert np.allclose(mono, [200 / 32768.0, -200 / 32768.0])


def test_aiff_8bit_is_signed():
    """AIFF 8-bit PCM is SIGNED (WAV's is unsigned) — build by hand."""
    comm = struct.pack(">HIH", 1, 3, 8) + encode_extended80(8000.0)
    data = struct.pack(">II", 0, 0) + bytes([0x7F, 0x80, 0x00])
    blob = (
        b"FORM"
        + struct.pack(">I", 4 + 8 + len(comm) + 8 + len(data) + (len(data) & 1))
        + b"AIFF"
        + b"COMM"
        + struct.pack(">I", len(comm))
        + comm
        + b"SSND"
        + struct.pack(">I", len(data))
        + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    mono, sr, ch = parse_aiff(blob)
    assert np.allclose(mono, [127 / 128.0, -1.0, 0.0])


def test_compressed_aifc_quarantines():
    x = np.zeros(8, dtype=np.int16)
    blob = bytearray(encode_aiff(x, 8000, aifc_sowt=True))
    i = blob.find(b"sowt")
    blob[i : i + 4] = b"ima4"
    with pytest.raises(ValueError, match="ima4"):
        parse_aiff(bytes(blob))


def test_registry_dispatch():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        sniff_audio_format,
    )

    x = (3000 * np.sin(np.arange(300) * 0.2)).astype(np.int16)
    for sowt in (False, True):
        blob = encode_aiff(x, 16000, aifc_sowt=sowt)
        assert sniff_audio_format(blob) == "aiff"
        mono, sr, ch = decode_audio(blob)
        assert (sr, ch) == (16000, 1) and len(mono) == 300


def test_tear_contract_fuzz():
    rng = np.random.RandomState(13)
    x = rng.randint(-32768, 32768, size=64).astype(np.int16)
    blob = encode_aiff(x, 8000)
    for trial in range(300):
        mutated = bytearray(blob)
        if trial % 2 == 0:
            mutated = bytearray(blob[: rng.randint(0, len(blob))])
        elif mutated:
            mutated[rng.randint(0, len(mutated))] ^= 1 << rng.randint(0, 8)
        try:
            parse_aiff(bytes(mutated))
        except ValueError:
            pass  # the only legal failure mode


def test_truncated_ssnd_tears():
    """COMM declaring more frames than SSND carries is a torn download,
    not a shorter file — it must quarantine, never silently truncate."""
    x = np.arange(100, dtype=np.int16)
    blob = bytearray(encode_aiff(x, 8000))
    # chop 40 bytes of sample data off the end AND shrink the SSND and
    # FORM sizes so the chunk walk itself stays intact
    cut = 40
    i = blob.find(b"SSND")
    (ssnd_sz,) = struct.unpack(">I", blob[i + 4 : i + 8])
    struct.pack_into(">I", blob, i + 4, ssnd_sz - cut)
    (form_sz,) = struct.unpack(">I", blob[4:8])
    struct.pack_into(">I", blob, 4, form_sz - cut)
    torn = bytes(blob[: len(blob) - cut])
    with pytest.raises(ValueError, match="frames"):
        parse_aiff(torn)


def test_extended80_encoder_rejects_non_finite():
    """ADVICE r9: inf looped forever in the normalization, NaN failed
    confusingly at int(); the encoder now mirrors the decoder's guard."""
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError, match="non-finite"):
            encode_extended80(bad)
