"""From-spec 8SVX audio codec (EA IFF 85 "8-Bit Sampled Voice").

The Amiga-era voice format still present in retro archives and the
CPython test corpus (a REAL third-party file, sndhdr.8svx, pins the
container walk, VHDR fields, stereo CHAN layout, and BODY samples in
tests). Written from the PUBLIC specification: "8SVX" IFF FORM
(Electronic Arts / Commodore-Amiga, 1985) — VHDR Voice8Header
(oneShotHiSamples, repeatHiSamples, samplesPerHiCycle ULONGs;
samplesPerSec UWORD; ctOctave, sCompression UBYTEs; Fixed volume),
optional CHAN (2 = LEFT, 4 = RIGHT, 6 = STEREO with the two channels
stored as SEQUENTIAL BLOCKS, left first — not interleaved), BODY of
signed 8-bit samples.

sCompression 1 is the spec's Fibonacci-delta scheme: the BODY holds a
pad byte, the initial sample value, then two 4-bit codes per byte
(HIGH nibble first), each indexing the published 16-entry delta table
(the mirrored Fibonacci numbers); samples accumulate from the initial
value. The table is transcribed from the published spec appendix and
structurally validated at import (strictly increasing, Fibonacci
construction); decode clamps the running value to int8 like the
reference player. Anything else (ctOctave > 1 multi-octave bodies,
unknown compression) quarantines with a named error.
"""

from __future__ import annotations

import struct

import numpy as np

#: Fibonacci-delta table (8SVX spec appendix): ±Fibonacci numbers
#: mirrored around 0/-1. Structural validation below — do not edit
#: without re-deriving from the spec.
FIB_DELTAS = (-34, -21, -13, -8, -5, -3, -2, -1, 0, 1, 2, 3, 5, 8, 13, 21)

# import-time structural validators (the transcribed-table convention):
# strictly increasing, and each positive tail entry is the sum of the
# previous two (Fibonacci), mirrored on the negative side
assert all(a < b for a, b in zip(FIB_DELTAS, FIB_DELTAS[1:]))
assert FIB_DELTAS[9:] == (1, 2, 3, 5, 8, 13, 21)
assert all(
    FIB_DELTAS[9:][i + 2] == FIB_DELTAS[9:][i + 1] + FIB_DELTAS[9:][i]
    for i in range(len(FIB_DELTAS[9:]) - 2)
)
assert FIB_DELTAS[:8] == tuple(-x for x in (34, 21, 13, 8, 5, 3, 2, 1))

_CHAN_LEFT, _CHAN_RIGHT, _CHAN_STEREO = 2, 4, 6


def _fib_decode(body: bytes) -> np.ndarray:
    """Fibonacci-delta unpack: pad byte, initial value, then 2 codes per
    byte (high nibble first); running value clamped to int8."""
    if len(body) < 2:
        raise ValueError("torn 8SVX Fibonacci-delta body")
    # sign-extend without np.int8(): an out-of-bound Python int raises
    # OverflowError under NumPy 2
    x = (body[1] ^ 0x80) - 0x80
    out = [x]
    for byte in body[2:]:
        for code in (byte >> 4, byte & 0x0F):
            x += FIB_DELTAS[code]
            x = -128 if x < -128 else (127 if x > 127 else x)
            out.append(x)
    return np.asarray(out, dtype=np.int64)


def _fib_encode(samples: np.ndarray) -> bytes:
    """Greedy nearest-delta Fibonacci encoder (lossy in general; exact
    when consecutive differences are table entries — the fixture path)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.size == 0:
        raise ValueError("empty 8SVX body")
    out = bytearray([0, int(s[0]) & 0xFF])
    x = int(s[0])
    nibbles: list[int] = []
    for v in s[1:]:
        want = int(v) - x
        code = min(range(16), key=lambda c: abs(FIB_DELTAS[c] - want))
        x += FIB_DELTAS[code]
        x = -128 if x < -128 else (127 if x > 127 else x)
        nibbles.append(code)
    if len(nibbles) % 2:
        nibbles.append(8)  # delta 0
    for hi, lo in zip(nibbles[::2], nibbles[1::2]):
        out.append((hi << 4) | lo)
    return bytes(out)


def parse_8svx(payload: bytes):
    """Parse an 8SVX payload to (mono float64 samples in [-1, 1],
    sample_rate, n_channels)."""
    if len(payload) < 12 or payload[:4] != b"FORM" or payload[8:12] != b"8SVX":
        raise ValueError("not an 8SVX stream")
    vhdr = None
    body = None
    chan = None
    off = 12
    n = len(payload)
    while off + 8 <= n:
        cid = payload[off : off + 4]
        (sz,) = struct.unpack(">I", payload[off + 4 : off + 8])
        data = payload[off + 8 : off + 8 + sz]
        if len(data) < sz:
            raise ValueError(f"torn 8SVX chunk {cid!r}")
        if cid == b"VHDR":
            vhdr = data
        elif cid == b"BODY":
            body = data
        elif cid == b"CHAN":
            if len(data) < 4:
                raise ValueError("torn 8SVX CHAN chunk")
            (chan,) = struct.unpack(">I", data[:4])
        off += 8 + sz + (sz & 1)
    if vhdr is None or body is None:
        raise ValueError("8SVX missing VHDR/BODY chunk")
    if len(vhdr) < 20:
        raise ValueError("torn 8SVX VHDR")
    one_shot, repeat, _cycle, rate, ct_octave, comp, _vol = struct.unpack(
        ">IIIHBBI", vhdr[:20]
    )
    if rate < 1:
        raise ValueError("implausible 8SVX sample rate")
    if ct_octave > 1:
        raise ValueError("multi-octave 8SVX outside the declared scope")
    if comp == 1:
        samples = _fib_decode(body)
    elif comp == 0:
        samples = np.frombuffer(body, dtype=np.int8).astype(np.int64)
    else:
        raise ValueError(f"8SVX compression {comp} outside the declared scope")
    ch = 2 if chan == _CHAN_STEREO else 1
    if chan not in (None, _CHAN_LEFT, _CHAN_RIGHT, _CHAN_STEREO):
        raise ValueError(f"8SVX CHAN mask {chan} outside the declared scope")
    if samples.size == 0:
        raise ValueError("8SVX body with no samples")
    per = one_shot + repeat  # samples per channel, when VHDR declares it
    if ch == 2:
        # stereo stores SEQUENTIAL channel blocks (left then right);
        # split on the declared per-channel count when present so a
        # trailing pad (fib nibble pad, IFF even pad) cannot shear the
        # blocks by one — size//2 is the per=0 fallback only
        half = per if 0 < per <= samples.size // 2 else samples.size // 2
        if half == 0:
            raise ValueError("8SVX stereo body with no complete channel block")
        mono = (samples[:half] + samples[half : 2 * half]) / 2.0 / 128.0
    else:
        if per and samples.size > per:
            # drop trailing pad for BOTH compressions: the fib coder
            # pads odd delta counts with a 0-delta nibble, which would
            # otherwise surface as a phantom final sample
            samples = samples[:per]
        mono = samples.astype(np.float64) / 128.0
    return mono, int(rate), ch


def encode_8svx(
    samples: np.ndarray,
    sample_rate: int,
    fib: bool = False,
    annotation: bytes = b"",
) -> bytes:
    """Spec-literal 8SVX writer: int8-range samples, 1-D (mono) or
    [n, 2] (stereo, written as sequential blocks + CHAN 6)."""
    x = np.asarray(samples, dtype=np.int64)
    if (x > 127).any() or (x < -128).any():
        raise ValueError("8SVX sample out of int8 range")
    if not 1 <= sample_rate <= 0xFFFF:
        # VHDR carries the rate as a UWORD; fail with a named error
        # instead of struct.error at pack time
        raise ValueError("8SVX sample rate outside the UWORD field range")
    stereo = x.ndim == 2
    if stereo:
        if x.shape[1] != 2:
            raise ValueError("8SVX stereo needs [n, 2] samples")
        if fib:
            raise ValueError("fixture writer: fib + stereo not combined")
        flat = np.concatenate([x[:, 0], x[:, 1]])
    else:
        flat = x
    if fib:
        body = _fib_encode(flat)
        per = len(flat)
    else:
        body = flat.astype(np.int8).tobytes()
        per = x.shape[0] if stereo else flat.size
    vhdr = struct.pack(">IIIHBBI", per, 0, 32, sample_rate, 1, 1 if fib else 0, 0x10000)
    chunks = b"VHDR" + struct.pack(">I", len(vhdr)) + vhdr
    if annotation:
        # EA IFF 85 ckSize excludes the even-alignment pad byte
        chunks += b"ANNO" + struct.pack(">I", len(annotation)) + annotation
        if len(annotation) % 2:
            chunks += b"\x00"
    if stereo:
        chunks += b"CHAN" + struct.pack(">II", 4, _CHAN_STEREO)
    if len(body) % 2:
        chunks += b"BODY" + struct.pack(">I", len(body)) + body + b"\x00"
    else:
        chunks += b"BODY" + struct.pack(">I", len(body)) + body
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"8SVX" + chunks
