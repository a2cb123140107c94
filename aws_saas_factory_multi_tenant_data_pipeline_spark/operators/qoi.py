"""QOI ("Quite OK Image") decode + spec-literal encoder, pure
stdlib+numpy — the lossless interchange format modern dataset dumps and
game-asset corpora increasingly carry alongside PNG.

Public structure only (the one-page QOI specification, qoiformat.org,
Dominic Szablewski, 2022, CC0): a 14-byte header (``qoif`` magic,
big-endian u32 width/height, channel count 3|4, colorspace byte) and a
byte-stream of eight chunk kinds over a running pixel state — a
previous-pixel register, a 64-entry recently-seen array indexed by
``(3r + 5g + 7b + 11a) mod 64``, and wrap-around byte arithmetic:

- ``QOI_OP_RGB``  (0xFE + 3 bytes)  explicit RGB, alpha carried over,
- ``QOI_OP_RGBA`` (0xFF + 4 bytes)  explicit RGBA,
- ``QOI_OP_INDEX`` (0b00iiiiii)      recall from the seen-array,
- ``QOI_OP_DIFF`` (0b01drdgdb)       per-channel −2..1 delta,
- ``QOI_OP_LUMA`` (0b10 + 1 byte)    −32..31 green delta, the red/blue
  deltas expressed relative to it (−8..7),
- ``QOI_OP_RUN``  (0b11rrrrrr)       repeat previous pixel 1..62 times,

terminated by seven 0x00 bytes and one 0x01.

Declared scope (per-row-quarantinable boundaries, the same convention
as the other codecs — torn structure raises ValueError and the row
quarantines instead of aborting the batch):
- both channel counts decode; this pipeline's MEDIA rows are RGB, so
  alpha is dropped after decode (the GIF/ICO convention — no alpha
  plane to carry),
- the stream must supply exactly width*height pixels; trailing bytes
  after the last pixel are ignored (the round-8 GIF tolerance
  decision: real-world writers pad, strict readers should not tear),
  but a stream that exhausts early is torn,
- a 64 Mpx decode bound rejects crafted headers before allocation.

The encoder emits REAL chunk streams (greedy run/index/diff/luma
selection, the reference heuristic) so decode fixtures exercise every
chunk kind, not a degenerate RGB-only path.

Reference parity: media ingestion surface (`README.md:1-109` of the
reference — multimodal corpus columns); decoded rows flow through the
same aHash/pHash dedup, EXIF audit, and shard-writer machinery as the
other image formats.
"""

from __future__ import annotations

import struct

import numpy as np

#: same declared decode bound as the other image codecs (64 Mpx)
_MAX_PIXELS = 1 << 26

_MAGIC = b"qoif"
_END_MARKER = b"\x00" * 7 + b"\x01"


def _hash_rgba(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode_qoi(payload: bytes):
    """Decode a QOI payload to (uint8 pixels [h, w, 3], width, height).

    Alpha (channels=4 files) is decoded for state correctness — the
    seen-array hash and carry-over semantics depend on it — then
    dropped from the returned plane.
    """
    if len(payload) < 14 or payload[:4] != _MAGIC:
        raise ValueError("not a QOI stream")
    w, h = struct.unpack(">II", payload[4:12])
    channels, colorspace = payload[12], payload[13]
    if channels not in (3, 4):
        raise ValueError(f"bad QOI channel count {channels}")
    if colorspace not in (0, 1):
        raise ValueError(f"bad QOI colorspace {colorspace}")
    if w == 0 or h == 0:
        raise ValueError("bad QOI dimensions")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"image {w}x{h} exceeds the 64 Mpx decode bound")

    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    data = payload
    ln = len(data)
    while i < n:
        if pos >= ln:
            raise ValueError("QOI stream ran out before the last pixel")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            if pos + 3 > ln:
                raise ValueError("torn QOI_OP_RGB")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > ln:
                raise ValueError("torn QOI_OP_RGBA")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF (bias 2, wraparound)
                r = (r + ((byte >> 4) & 0x3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 0x3) - 2) & 0xFF
                b = (b + (byte & 0x3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA (green bias 32, red/blue rel. bias 8)
                if pos >= ln:
                    raise ValueError("torn QOI_OP_LUMA")
                dg = (byte & 0x3F) - 32
                rb = data[pos]
                pos += 1
                r = (r + dg - 8 + ((rb >> 4) & 0xF)) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg - 8 + (rb & 0xF)) & 0xFF
            else:  # QOI_OP_RUN (length 1..62; 63/64 are the RGB/RGBA tags)
                run = (byte & 0x3F) + 1
                if i + run > n:
                    # overrun is structural, not padding: tear
                    raise ValueError("QOI run overruns the pixel count")
                out[i : i + run] = (r, g, b, a)
                i += run
                continue
        index[_hash_rgba(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    # trailing bytes (end marker / writer padding) are deliberately not
    # validated — the pixel budget is the contract (GIF convention)
    return out[:, :3].reshape(h, w, 3).copy(), w, h


def encode_qoi(pixels: np.ndarray, channels: int = 3) -> bytes:
    """Spec-literal greedy QOI encoder (the reference heuristic: run,
    then seen-index, then DIFF, then LUMA, then explicit RGB/RGBA).

    ``pixels`` is uint8 [h, w, 3] or [h, w, 4]; ``channels`` selects the
    header's declared channel count (alpha=255 is synthesized when
    encoding RGB input as channels=4).
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("pixels must be [h, w, 3|4] uint8")
    if channels not in (3, 4):
        raise ValueError(f"bad channel count {channels}")
    h, w = px.shape[:2]
    if px.shape[2] == 3:
        flat = np.concatenate(
            [px.reshape(-1, 3), np.full((h * w, 1), 255, dtype=np.uint8)], axis=1
        )
    else:
        flat = px.reshape(-1, 4)

    out = bytearray()
    out += _MAGIC
    out += struct.pack(">II", w, h)
    out.append(channels)
    out.append(0)  # sRGB with linear alpha — metadata only per the spec

    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b, a in flat.tolist():
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = _hash_rgba(r, g, b, a)
        if index[hidx] == (r, g, b, a):
            out.append(hidx)
        else:
            index[hidx] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                dr_dg = dr - dg
                db_dg = db - dg
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
                elif -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7:
                    out.append(0x80 | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END_MARKER
    return bytes(out)
