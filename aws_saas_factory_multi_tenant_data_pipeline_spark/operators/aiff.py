"""AIFF / AIFF-C audio decode, pure stdlib+numpy — the Apple-ecosystem
slice of a crawled audio corpus (podcast masters, sampler libraries,
pre-MP3 archives ship as .aif/.aiff/.aifc).

Public structure only (Apple "Audio Interchange File Format 1.3", 1989,
and the AIFF-C extension, 1991 — both EA-IFF-85 chunk files): a
``FORM`` container of type ``AIFF`` or ``AIFC``; the ``COMM`` chunk
carries channels (u16), frame count (u32), sample size (u16) and the
sample rate as an 80-bit IEEE 754 extended float (sign, 15-bit biased
exponent, explicit-leading-bit 64-bit mantissa — decoded here from the
published layout); ``SSND`` carries an offset/blocksize header then the
interleaved PCM frames. Chunks are big-endian and pad to even offsets.

Declared scope (per-row-quarantinable ValueError boundaries, the codec
convention): integer PCM 8/16-bit — big-endian for plain AIFF and
AIFF-C ``NONE``, little-endian for AIFF-C ``sowt`` (the QuickTime
byte-swap variant). Compressed AIFF-C (μ/A-law ``ulaw``/``alaw``,
``ima4``, ``fl32``…) quarantines with a named error; the G.711 laws
already decode via the WAV path and can be routed here if such corpora
appear.

Returns follow the audio-registry contract: (mono float64 samples in
[-1, 1], sample_rate, n_channels); ValueError on torn input.
"""

from __future__ import annotations

import struct

import numpy as np


def _decode_extended80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (the COMM sample-rate field):
    1 sign bit, 15-bit exponent (bias 16383), 64-bit mantissa with an
    EXPLICIT leading integer bit."""
    if len(b) != 10:
        raise ValueError("extended float field must be 10 bytes")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    if not 16383 - 70 < exp < 16383 + 70:
        # far outside any plausible sample rate: corrupted field (and a
        # naive 2.0**e here would overflow the host float)
        raise ValueError("AIFF sample-rate exponent out of range")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def encode_extended80(x: float) -> bytes:
    """Inverse of :func:`_decode_extended80` for the fixture writer
    (exact for the integer sample rates AIFF files actually carry)."""
    if x != x or x in (float("inf"), float("-inf")):
        # mirror the decoder's guard: inf would loop forever in the
        # normalization below, NaN would fail confusingly at int(x)
        raise ValueError("non-finite AIFF sample rate")
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    exp = 16383 + 63
    while x >= 1 << 64:
        x /= 2.0
        exp += 1
    while x < 1 << 63:
        x *= 2.0
        exp -= 1
    return struct.pack(">HQ", sign | exp, int(x))


def parse_aiff(payload: bytes):
    """Parse an AIFF/AIFF-C payload to (mono float64 samples in [-1, 1],
    sample_rate, n_channels)."""
    if len(payload) < 12 or payload[:4] != b"FORM":
        raise ValueError("not an AIFF stream")
    form_type = payload[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        raise ValueError(f"not an AIFF form type: {form_type!r}")
    comm = None
    ssnd = None
    off = 12
    n = len(payload)
    while off + 8 <= n:
        cid = payload[off : off + 4]
        (sz,) = struct.unpack(">I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + sz]
        if len(body) < sz:
            raise ValueError(f"torn AIFF chunk {cid!r}")
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        off += 8 + sz + (sz & 1)  # chunks pad to even offsets
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    if len(comm) < 18:
        raise ValueError("torn COMM chunk")
    ch, n_frames, bits = struct.unpack(">HIH", comm[:8])
    sr = _decode_extended80(comm[8:18])
    little = False
    if form_type == b"AIFC":
        if len(comm) < 22:
            raise ValueError("torn AIFF-C COMM chunk")
        comp = comm[18:22]
        if comp == b"sowt":
            little = True
        elif comp != b"NONE":
            raise ValueError(
                f"AIFF-C compression {comp!r} outside the declared scope"
            )
    if ch == 0 or sr <= 0 or not float(sr).is_integer():
        raise ValueError("bad AIFF COMM fields")
    if len(ssnd) < 8:
        raise ValueError("torn SSND chunk")
    (data_off,) = struct.unpack(">I", ssnd[:4])
    data = ssnd[8 + data_off :]
    if bits == 16:
        usable = len(data) - (len(data) % 2)
        dt = "<i2" if little else ">i2"
        x = np.frombuffer(data[:usable], dtype=dt).astype(np.float64) / 32768.0
    elif bits == 8:
        # AIFF 8-bit is SIGNED (unlike WAV's unsigned 8-bit)
        x = np.frombuffer(data, dtype=np.int8).astype(np.float64) / 128.0
    else:
        raise ValueError(f"unsupported AIFF sample size {bits}")
    if x.shape[0] // ch < n_frames:
        # COMM declares more frames than SSND carries: a truncated
        # download, not a decodable file — the quarantine contract
        raise ValueError(
            f"AIFF SSND carries {x.shape[0] // ch} frames of the "
            f"{n_frames} COMM declares"
        )
    x = x[: n_frames * ch]
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, int(sr), int(ch)


def encode_aiff(
    samples16: np.ndarray,
    sample_rate: int,
    channels: int = 1,
    aifc_sowt: bool = False,
) -> bytes:
    """Spec-literal AIFF (or AIFF-C ``sowt``) writer — the fixture
    builder. Interleaved int16 input (frame-major)."""
    x = np.asarray(samples16, dtype=np.int16)
    n_frames = len(x) // max(channels, 1)
    body = x.astype("<i2" if aifc_sowt else ">i2").tobytes()
    comm = struct.pack(">HIH", channels, n_frames, 16) + encode_extended80(
        float(sample_rate)
    )
    if aifc_sowt:
        comm += b"sowt" + bytes([4]) + b"sowt\x00"  # pstring name, padded
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = b""
    if aifc_sowt:
        chunks += b"FVER" + struct.pack(">II", 4, 0xA2805140)  # AIFC version 1
    chunks += b"COMM" + struct.pack(">I", len(comm)) + comm
    if len(comm) & 1:
        chunks += b"\x00"
    chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        chunks += b"\x00"
    form_type = b"AIFC" if aifc_sowt else b"AIFF"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks
