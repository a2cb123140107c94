"""From-spec Sun/NeXT AU (.au/.snd) audio codec.

The oldest still-crawled audio container (Unix system sounds, early-web
clips, CPython's own test corpus). Written from the PUBLIC format
description (the Sun audio file format, NeXT SNDSoundStruct header;
also summarized in RFC 2046's audio/basic registration): a 24-byte
big-endian header — magic ``.snd``, data offset, data size
(0xFFFFFFFF = unknown), encoding id, sample rate, channel count — an
optional annotation gap, then interleaved big-endian samples.

Declared scope (everything else quarantines with a named per-payload
error): encodings 1 (8-bit G.711 μ-law — decoded through the SAME
ITU-T table as the WAV path, ``operators/g711.py``), 2 (8-bit signed
linear), 3 (16-bit), 4 (24-bit), 5 (32-bit linear), 6 (float32),
7 (float64), 27 (8-bit G.711 A-law). ADPCM variants (23-26) and DSP
encodings are named seams for a native swap.

Reference parity: the media ingestion surface (`README.md:1-109` of
the reference repo); rows flow through the same decode_audio registry
(envelope/spectral dedup, transcode) as WAV/FLAC/MP3/AIFF.

Real-file interop: CPython ships the same pluck clip as
``pluck-pcm{8,16,24,32}.au`` and ``pluck-ulaw.au`` — every in-scope
integer encoding cross-checks against our independent AIFF/WAV
decoders of the same audio (tests/test_au.py).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b".snd"

#: encoding id -> (name, bytes per sample); None size = table-companded
_SCOPE = {
    1: ("ulaw", 1),
    2: ("pcm8", 1),
    3: ("pcm16", 2),
    4: ("pcm24", 3),
    5: ("pcm32", 4),
    6: ("float32", 4),
    7: ("float64", 8),
    27: ("alaw", 1),
}


def parse_au(payload: bytes):
    """Parse an AU payload to (mono float64 samples in [-1, 1],
    sample_rate, n_channels)."""
    if len(payload) < 24 or payload[:4] != _MAGIC:
        raise ValueError("not an AU stream")
    off, size, enc, rate, ch = struct.unpack(">IIIII", payload[4:24])
    if off < 24:
        raise ValueError("AU data offset inside the header")
    if off > len(payload):
        raise ValueError("torn AU stream: data offset past end")
    if ch < 1 or ch > 64:
        raise ValueError(f"implausible AU channel count {ch}")
    if rate < 1:
        raise ValueError("implausible AU sample rate")
    if enc not in _SCOPE:
        raise ValueError(
            f"AU encoding {enc} outside the declared scope "
            "(ADPCM/DSP variants quarantine — swap in a native decoder "
            "via register_audio_decoder('au', ...))"
        )
    name, bps = _SCOPE[enc]
    data = payload[off:]
    if size != 0xFFFFFFFF:
        if len(data) < size:
            raise ValueError("torn AU stream: data shorter than header size")
        data = data[:size]
    usable = len(data) - (len(data) % (bps * ch))
    if usable <= 0:
        raise ValueError("AU stream with no complete sample frame")
    data = data[:usable]

    if name == "ulaw":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
            ulaw_to_linear16,
        )

        x = ulaw_to_linear16(np.frombuffer(data, dtype=np.uint8)) / 32768.0
    elif name == "alaw":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
            alaw_to_linear16,
        )

        x = alaw_to_linear16(np.frombuffer(data, dtype=np.uint8)) / 32768.0
    elif name == "pcm8":
        x = np.frombuffer(data, dtype=np.int8).astype(np.float64) / 128.0
    elif name == "pcm16":
        x = np.frombuffer(data, dtype=">i2").astype(np.float64) / 32768.0
    elif name == "pcm24":
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif name == "pcm32":
        x = np.frombuffer(data, dtype=">i4").astype(np.float64) / float(1 << 31)
    elif name == "float32":
        x = np.frombuffer(data, dtype=">f4").astype(np.float64)
        if not np.isfinite(x).all():
            raise ValueError("non-finite AU float samples")
    else:  # float64
        x = np.frombuffer(data, dtype=">f8").astype(np.float64)
        if not np.isfinite(x).all():
            raise ValueError("non-finite AU float samples")
    frames = x.reshape(-1, ch)
    mono = frames.mean(axis=1)
    return mono, int(rate), int(ch)


def encode_au(
    samples: np.ndarray, sample_rate: int, encoding: str = "pcm16", annotation: bytes = b""
) -> bytes:
    """Spec-literal AU writer for fixtures and transcode.

    ``samples``: int array at the target depth's native scale for the
    integer encodings (int8 range for pcm8, int16 for pcm16/ulaw/alaw,
    int24 range for pcm24, int32 for pcm32), or float64 in [-1, 1] for
    float32/float64; 1-D (mono) or [n, ch]."""
    enc_id = {v[0]: k for k, v in _SCOPE.items()}.get(encoding)
    if enc_id is None:
        raise ValueError(f"unknown AU encoding {encoding!r}")
    x = np.asarray(samples)
    ch = 1 if x.ndim == 1 else x.shape[1]
    flat = x.reshape(-1)

    def _check_range(bits: int) -> None:
        v = flat.astype(np.int64)
        lim = 1 << (bits - 1)
        if (v > lim - 1).any() or (v < -lim).any():
            # raise instead of numpy's silent two's-complement wrap —
            # a mis-scaled fixture must fail loudly, not corrupt audio
            raise ValueError(f"pcm{bits} sample out of range")

    if encoding == "pcm8":
        _check_range(8)
        body = flat.astype(np.int8).tobytes()
    elif encoding == "pcm16":
        _check_range(16)
        body = flat.astype(">i2").tobytes()
    elif encoding == "pcm24":
        _check_range(24)
        v = flat.astype(np.int64)
        u = np.where(v < 0, v + (1 << 24), v)
        out = np.empty((len(u), 3), dtype=np.uint8)
        out[:, 0] = (u >> 16) & 0xFF
        out[:, 1] = (u >> 8) & 0xFF
        out[:, 2] = u & 0xFF
        body = out.tobytes()
    elif encoding == "pcm32":
        _check_range(32)
        body = flat.astype(">i4").tobytes()
    elif encoding == "float32":
        body = flat.astype(">f4").tobytes()
    elif encoding == "float64":
        body = flat.astype(">f8").tobytes()
    elif encoding == "ulaw":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
            linear16_to_ulaw,
        )

        body = linear16_to_ulaw(flat.astype(np.int64)).tobytes()
    else:  # alaw
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
            linear16_to_alaw,
        )

        body = linear16_to_alaw(flat.astype(np.int64)).tobytes()
    if annotation and not annotation.endswith(b"\x00"):
        annotation += b"\x00"
    off = 24 + len(annotation)
    header = _MAGIC + struct.pack(">IIIII", off, len(body), enc_id, sample_rate, ch)
    return header + annotation + body
