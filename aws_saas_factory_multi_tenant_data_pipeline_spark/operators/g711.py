"""G.711 companded audio (μ-law / A-law) + a self-contained RIFF/WAVE
parser, pure stdlib+numpy — the telephony/call-center slice of a crawled
audio corpus (8 kHz voice dumps ship as fmt-code 6/7 WAVs, which the
stdlib ``wave`` module rejects outright).

Public structure only (ITU-T Recommendation G.711, 1988 — the segmented
companding tables are fully determined by the published formulas; RIFF
WAVE layout per the Microsoft/IBM Multimedia Programming Interface
spec): a WAV file is a ``RIFF``/``WAVE`` chunk list; the ``fmt `` chunk
carries format code 1 (integer PCM), 6 (A-law), 7 (μ-law) or 0xFFFE
(WAVE_FORMAT_EXTENSIBLE, real code in the first two SubFormat GUID
bytes); sample payloads live in the ``data`` chunk, chunks pad to even
offsets.

μ-law decode (G.711 Table 2a/2b, the 8-bit code is stored complemented):
with ``c' = ~c``, sign = bit 7, exponent e = bits 6..4, mantissa m =
bits 3..0, the 16-bit linear value is ``(((m<<3) + 0x84) << e) - 0x84``
(max 32124). A-law (Table 1a/1b, stored with even bits toggled by 0x55):
with ``c' = c ^ 0x55``, ``e == 0`` gives ``(m<<4) + 8``, ``e > 0`` gives
``((m<<4) + 0x108) << (e-1)`` (max 32256); bit 7 SET marks positive.
Encoders are the published segment searches; both directions are exact
integer maps, so ``encode(decode(code)) == code`` for every code (the
two μ-law zero codes collapse to the canonical +0) — pinned in tests.

Declared scope (per-row-quarantinable ValueError boundaries, the codec
convention): integer PCM 8/16/24/32-bit, IEEE float 32/64-bit (fmt 3,
clamped to [-1, 1], non-finite samples tear), A-law, μ-law, and [r11]
the two real-world ADPCM variants — IMA/DVI (0x11) and Microsoft
(0x02), operators/adpcm.py, the IMA core cross-pinned EXACTLY against
CPython's own C audioop implementation (the r10 'no trustworthy
in-container source' objection resolved by a real independent codec
on this host). MPEG-in-WAV and the remaining exotic format codes
quarantine with a named error.
"""

from __future__ import annotations

import struct

import numpy as np

#: WAVE format codes in declared scope
WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_EXTENSIBLE = 0xFFFE

_BIAS = 0x84  # μ-law bias (G.711: 33 quantization steps, <<2)
_CLIP = 32635  # μ-law clip so that magnitude + bias stays in 15 bits


def _build_ulaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int16)
    for c in range(256):
        u = ~c & 0xFF
        e = (u >> 4) & 0x07
        m = u & 0x0F
        t = (((m << 3) + _BIAS) << e) - _BIAS
        out[c] = -t if u & 0x80 else t
    return out


def _build_alaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int16)
    for c in range(256):
        a = c ^ 0x55
        e = (a >> 4) & 0x07
        m = a & 0x0F
        t = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
        out[c] = t if a & 0x80 else -t
    return out


ULAW_DECODE_TABLE: np.ndarray = _build_ulaw_decode_table()
ALAW_DECODE_TABLE: np.ndarray = _build_alaw_decode_table()


def ulaw_to_linear16(codes: np.ndarray) -> np.ndarray:
    """Vectorized μ-law byte → 16-bit linear (int16)."""
    return ULAW_DECODE_TABLE[np.asarray(codes, dtype=np.uint8)]


def alaw_to_linear16(codes: np.ndarray) -> np.ndarray:
    """Vectorized A-law byte → 16-bit linear (int16)."""
    return ALAW_DECODE_TABLE[np.asarray(codes, dtype=np.uint8)]


def linear16_to_ulaw(samples: np.ndarray) -> np.ndarray:
    """Vectorized 16-bit linear → μ-law byte (the G.711 segment search:
    bias, clip, locate the exponent segment, take the 4 mantissa bits,
    complement)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    # exponent = position of the leading bit above bit 7 (segments 0..7)
    e = (np.floor(np.log2(mag)).astype(np.int32) - 7).clip(0, 7)
    m = (mag >> (e + 3)) & 0x0F
    return (~(sign | (e << 4) | m) & 0xFF).astype(np.uint8)


def linear16_to_alaw(samples: np.ndarray) -> np.ndarray:
    """Vectorized 16-bit linear → A-law byte (segment search on the
    12-bit magnitude, XOR 0x55 transmission toggle; bit 7 set = positive
    per G.711's sign convention)."""
    x = np.asarray(samples, dtype=np.int32)
    pos = x >= 0
    v = x >> 3  # 16-bit → 13-bit domain (arithmetic shift)
    v = np.minimum(np.where(pos, v, -v - 1), 0xFFF)
    seg = np.where(
        v < 32, 0, (np.floor(np.log2(np.maximum(v, 1))).astype(np.int32) - 4)
    ).clip(0, 7)
    m = (v >> np.maximum(seg, 1)) & 0x0F
    code = (seg << 4) | m
    code = np.where(pos, code | 0x80, code)
    return ((code ^ 0x55) & 0xFF).astype(np.uint8)


def parse_wav(payload: bytes):
    """Parse a RIFF/WAVE payload to (mono float64 samples in [-1, 1],
    sample_rate, n_channels) — integer PCM 8/16-bit, A-law and μ-law.

    Replaces the stdlib ``wave`` path so that (a) G.711 voice WAVs
    decode instead of tearing, and (b) every malformed/out-of-scope
    input raises ValueError — the quarantine contract — rather than
    ``wave.Error``, which would abort a batch.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = None
    data = None
    fact_frames = None
    off = 12
    n = len(payload)
    while off + 8 <= n:
        cid = payload[off : off + 4]
        (sz,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + sz]
        if len(body) < sz:
            raise ValueError(f"torn WAV chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact" and sz >= 4:
            # exact frame count — authoritative for block codecs whose
            # last block pads (ADPCM)
            (fact_frames,) = struct.unpack("<I", body[:4])
        off += 8 + sz + (sz & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("torn fmt chunk")
    code, ch, sr, _brate, balign, bits = struct.unpack("<HHIIHH", fmt[:16])
    if code == WAVE_FORMAT_EXTENSIBLE:
        # real code = first two bytes of the SubFormat GUID (fmt offset 24)
        if len(fmt) < 26:
            raise ValueError("torn WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (code,) = struct.unpack("<H", fmt[24:26])
    if ch == 0 or sr == 0:
        raise ValueError("bad WAV fmt fields")
    if code == WAVE_FORMAT_PCM:
        if bits == 16:
            usable = len(data) - (len(data) % 2)
            x = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 24:
            # [r10] little-endian packed 24-bit (the studio-export width;
            # real-file interop: CPython's pluck-pcm24.wav)
            usable = len(data) - (len(data) % 3)
            b = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int64)
                | (b[:, 1].astype(np.int64) << 8)
                | (b[:, 2].astype(np.int64) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            usable = len(data) - (len(data) % 4)
            x = np.frombuffer(data[:usable], dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise ValueError(f"unsupported PCM width {bits}")
    elif code == WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            usable = len(data) - (len(data) % 4)
            x = np.frombuffer(data[:usable], dtype="<f4").astype(np.float64)
        elif bits == 64:
            usable = len(data) - (len(data) % 8)
            x = np.frombuffer(data[:usable], dtype="<f8").copy()
        else:
            raise ValueError(f"unsupported float width {bits}")
        if not np.all(np.isfinite(x)):
            raise ValueError("non-finite float WAV samples")
        x = np.clip(x, -1.0, 1.0)
    elif code == WAVE_FORMAT_MULAW:
        if bits not in (0, 8):
            raise ValueError(f"bad mu-law bits-per-sample {bits}")
        x = ulaw_to_linear16(np.frombuffer(data, dtype=np.uint8)).astype(np.float64)
        x /= 32768.0
    elif code == WAVE_FORMAT_ALAW:
        if bits not in (0, 8):
            raise ValueError(f"bad A-law bits-per-sample {bits}")
        x = alaw_to_linear16(np.frombuffer(data, dtype=np.uint8)).astype(np.float64)
        x /= 32768.0
    elif code == 0x0011:  # IMA/DVI ADPCM [r11] (operators/adpcm.py)
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.adpcm import (
            decode_ima_wav_blocks,
        )

        if bits not in (0, 4):
            raise ValueError(f"bad IMA ADPCM bits-per-sample {bits}")
        x = decode_ima_wav_blocks(data, ch, balign).astype(np.float64) / 32768.0
    elif code == 0x0002:  # Microsoft ADPCM [r11]
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.adpcm import (
            decode_ms_adpcm_blocks,
        )

        if bits not in (0, 4):
            raise ValueError(f"bad MS-ADPCM bits-per-sample {bits}")
        x = decode_ms_adpcm_blocks(data, ch, balign).astype(np.float64) / 32768.0
    else:
        raise ValueError(f"WAV format code 0x{code:04X} outside the declared scope")
    frames = x.shape[0] // ch
    if fact_frames is not None and 0 < fact_frames < frames:
        frames = fact_frames  # trim ADPCM last-block padding
    x = x[: frames * ch]
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, int(sr), int(ch)


def encode_wav_g711(
    samples16: np.ndarray, sample_rate: int, law: str = "ulaw", channels: int = 1
) -> bytes:
    """Build a G.711 WAV (fmt code 6/7 + fact chunk, the canonical
    non-PCM layout) from int16 samples — the fixture/transcode writer.
    Interleaved input for multi-channel (frame-major)."""
    x = np.asarray(samples16, dtype=np.int16)
    if law == "ulaw":
        codes, code_id = linear16_to_ulaw(x), WAVE_FORMAT_MULAW
    elif law == "alaw":
        codes, code_id = linear16_to_alaw(x), WAVE_FORMAT_ALAW
    else:
        raise ValueError(f"unknown companding law {law!r}")
    body = codes.tobytes()
    n_frames = len(codes) // max(channels, 1)
    # non-PCM fmt chunks carry the 2-byte cbSize field (0 here) — the
    # 18-byte layout strict consumers (ACM, libsndfile validation)
    # require for any format code other than 1
    fmt = struct.pack(
        "<HHIIHHH",
        code_id,
        channels,
        sample_rate,
        sample_rate * channels,
        channels,
        8,
        0,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
