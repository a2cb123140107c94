"""Sun/NeXT AU codec (operators/au.py): header pins, every in-scope
encoding roundtripped, REAL CPython files for every integer depth
cross-checked against our independent WAV/AIFF decoders of the same
clip, declared-scope quarantines, annotation/unknown-size handling,
registry dispatch, 300-case tear fuzz."""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.au import (
    encode_au,
    parse_au,
)


def _rng():
    return np.random.default_rng(77)


def _audiodata() -> str:
    hits = sorted(glob.glob("/root/.pyenv/versions/*/lib/python*/test/audiodata"))
    if not hits:
        pytest.skip("no host CPython audiodata")
    return hits[-1]


def test_header_pin():
    blob = encode_au(np.array([0, 1000, -1000], dtype=np.int64), 8000, "pcm16")
    assert blob[:4] == b".snd"
    off, size, enc, rate, ch = struct.unpack(">IIIII", blob[4:24])
    assert (off, size, enc, rate, ch) == (24, 6, 3, 8000, 1)
    assert blob[24:26] == b"\x00\x00" and blob[26:28] == b"\x03\xe8"


@pytest.mark.parametrize(
    "enc,scale",
    [("pcm8", 128), ("pcm16", 32768), ("pcm24", 1 << 23), ("pcm32", 1 << 31)],
)
def test_integer_roundtrips_exact(enc, scale):
    rng = _rng()
    lim = min(scale - 1, 1 << 23)
    x = rng.integers(-lim, lim, 300, dtype=np.int64)
    if enc == "pcm32":
        x = x * 128  # exercise the upper bytes too
    mono, sr, ch = parse_au(encode_au(x, 22050, enc))
    assert (sr, ch) == (22050, 1)
    back = np.rint(mono * scale).astype(np.int64)
    assert np.array_equal(back, x)


def test_stereo_downmix_and_float_encodings():
    x = np.stack([np.linspace(-0.5, 0.5, 64), np.linspace(0.5, -0.5, 64)], axis=1)
    for enc in ("float32", "float64"):
        mono, sr, ch = parse_au(encode_au(x, 44100, enc))
        assert ch == 2 and sr == 44100
        tol = 1e-6 if enc == "float32" else 0
        assert np.abs(mono - x.mean(axis=1)).max() <= tol


def test_g711_encodings_code_identity():
    """mu/A-law roundtrip through AU matches the WAV-path tables: encode
    the exact decode-table values and recover them bit-for-bit."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
        ALAW_DECODE_TABLE,
        ULAW_DECODE_TABLE,
    )

    for enc, table in (("ulaw", ULAW_DECODE_TABLE), ("alaw", ALAW_DECODE_TABLE)):
        vals = table.astype(np.int64)
        mono, sr, ch = parse_au(encode_au(vals, 8000, enc))
        back = np.rint(mono * 32768.0).astype(np.int64)
        assert np.array_equal(back, vals), enc


def test_annotation_gap_and_unknown_size():
    x = np.arange(-50, 50, dtype=np.int64)
    blob = bytearray(encode_au(x, 8000, "pcm16", annotation=b"created by tests"))
    mono, sr, ch = parse_au(bytes(blob))
    assert len(mono) == 100
    # unknown data size (0xFFFFFFFF): everything after the offset is data
    blob[8:12] = b"\xff\xff\xff\xff"
    mono2, _, _ = parse_au(bytes(blob))
    assert np.array_equal(mono2, mono)


def test_declared_scope_quarantines():
    base = encode_au(np.zeros(4, dtype=np.int64), 8000, "pcm16")
    for enc_id in (0, 8, 23, 24, 26, 99):  # ADPCM/DSP/unknown
        bad = bytearray(base)
        bad[12:16] = struct.pack(">I", enc_id)
        with pytest.raises(ValueError, match="declared scope|implausible|AU"):
            parse_au(bytes(bad))
    with pytest.raises(ValueError, match="not an AU"):
        parse_au(b"RIFF" + base[4:])
    with pytest.raises(ValueError, match="offset"):
        bad = bytearray(base)
        bad[4:8] = struct.pack(">I", 8)
        parse_au(bytes(bad))
    with pytest.raises(ValueError, match="unknown AU encoding"):
        encode_au(np.zeros(4), 8000, "adpcm")


def test_real_files_every_integer_depth_vs_wav_twin():
    """CPython's pluck-pcm{8,16,24,32}.au (real sox/audioop-written AU
    files) against the same clip's real WAV (8/16/24/32-bit) through our
    INDEPENDENT WAV parser — depth by depth."""
    d = _audiodata()
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        sniff_audio_format,
    )

    for depth, bound in [("pcm8", 1 / 127.0), ("pcm16", 16 / 32768.0),
                         ("pcm24", 16 / 32768.0), ("pcm32", 16 / 32768.0)]:
        au = open(os.path.join(d, f"pluck-{depth}.au"), "rb").read()
        assert sniff_audio_format(au) == "au"
        am, asr, ach = decode_audio(au)
        wav = open(os.path.join(d, f"pluck-{depth}.wav"), "rb").read()
        wm, wsr, wch = decode_audio(wav)
        assert (asr, ach) == (wsr, wch) == (11025, 2)
        assert len(am) == len(wm)
        # bound = measured source delta between CPython's independently
        # generated files (<=10 int16 LSB) + narrower-depth scaling
        assert float(np.abs(am - wm).max()) <= bound, depth


def test_real_ulaw_au_decodes_through_registry():
    d = _audiodata()
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_audio,
    )

    am, sr, ch = decode_audio(open(os.path.join(d, "pluck-ulaw.au"), "rb").read())
    ref, _, _ = decode_audio(open(os.path.join(d, "pluck-pcm16.au"), "rb").read())
    assert (sr, ch) == (11025, 2) and len(am) == len(ref)
    # G.711 companding quantization bound (largest segment step, 16-bit)
    assert float(np.abs(am - ref).max()) <= 1024 / 32768.0
    assert float(np.corrcoef(am, ref)[0, 1]) > 0.999


def test_tear_contract_fuzz():
    rng = _rng()
    x = rng.integers(-30000, 30000, 200, dtype=np.int64)
    blob = encode_au(x, 16000, "pcm16", annotation=b"note")
    for trial in range(300):
        mutated = bytearray(blob)
        if trial % 2 == 0:
            mutated = mutated[: int(rng.integers(0, len(mutated)))]
        else:
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            parse_au(bytes(mutated))
        except ValueError:
            pass


def test_encoder_rejects_out_of_range_samples():
    """r10 review finding: numpy astype would silently two's-complement
    wrap mis-scaled samples at every depth except 24-bit; all four
    integer depths now fail loudly."""
    for enc, bad in [
        ("pcm8", 200),
        ("pcm16", 1 << 20),
        ("pcm24", 1 << 23),
        ("pcm32", 1 << 40),
    ]:
        with pytest.raises(ValueError, match="out of range"):
            encode_au(np.array([0, bad], dtype=np.int64), 8000, enc)
