"""GIF decode (GIF87a + GIF89a) and a spec-literal encoder, pure
stdlib+numpy — the remaining still-image format a crawled corpus
actually contains (icons, diagrams, early-web imagery) after
PPM/PNG/JPEG.

Public structure only (CompuServe GIF89a specification, 1990; W3C note):
header + logical screen descriptor, global/local color tables,
extension blocks (0x21, length-prefixed sub-blocks), image descriptors
(0x2C) with optional interlacing (the 4-pass row order of Appendix E),
and LZW-compressed index streams (variable code width 3..12 bits,
CLEAR/EOI codes, the KwKwK first-entry case).

Declared scope (each a documented, per-row-quarantinable boundary, the
same convention as the other codecs):
- the FIRST image descriptor decodes (animation frames beyond it are
  container repetition, not new pixel science); extensions are skipped
  structurally,
- GIF89a transparency renders as the palette color at the transparent
  index (this pipeline's MEDIA rows are RGB; there is no alpha plane to
  carry),
- ValueError — and only ValueError — on torn/overflowing structure.

The encoder emits a REAL LZW stream (dictionary growth + CLEAR resets at
code 4095) so decode fixtures exercise the actual decompressor, not a
degenerate uncompressed path.
"""

from __future__ import annotations

import struct

import numpy as np

#: Appendix-E interlace passes: (first row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_color_table(data: bytes, off: int, n: int) -> tuple[np.ndarray, int]:
    end = off + 3 * n
    if end > len(data):
        raise ValueError("truncated color table")
    tab = np.frombuffer(data[off:end], dtype=np.uint8).reshape(n, 3)
    return tab, end


def _read_subblocks(data: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate length-prefixed sub-blocks until the 0 terminator."""
    out = bytearray()
    while True:
        if off >= len(data):
            raise ValueError("truncated sub-block stream")
        n = data[off]
        off += 1
        if n == 0:
            return bytes(out), off
        if off + n > len(data):
            raise ValueError("truncated sub-block")
        out += data[off : off + n]
        off += n


def _lzw_decode(blob: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF-variant LZW: little-endian bit packing, CLEAR/EOI, width grows
    after the dictionary fills the current width, capped at 12 bits."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(blob):
                raise ValueError("LZW stream ran out before EOI")
            acc |= blob[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(f"LZW code {code} before any root")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        if len(out) >= max_pixels:
            # Tolerate trailing pixels/garbage codes before EOI — real
            # encoders occasionally emit them and browsers decode such
            # files fine. The image needs exactly max_pixels indices;
            # stop consuming here (still allocation-bounded: the loop
            # can overshoot by at most one table entry).
            return out[:max_pixels]
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def decode_gif(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode the first image of a GIF87a/GIF89a payload to an (h, w, 3)
    uint8 RGB array. Raises ValueError on torn structure."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated logical screen descriptor")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    off = 13
    gct = None
    if flags & 0x80:
        gct, off = _read_color_table(payload, off, 2 << (flags & 7))
    while True:
        if off >= len(payload):
            raise ValueError("no image descriptor before end of data")
        block = payload[off]
        off += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF trailer before any image descriptor")
        if block == 0x21:  # extension: label + sub-blocks
            if off >= len(payload):
                raise ValueError("truncated extension")
            off += 1  # label
            _, off = _read_subblocks(payload, off)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02X}")
        if off + 9 > len(payload):
            raise ValueError("truncated image descriptor")
        _left, _top, w, h = struct.unpack_from("<HHHH", payload, off)
        iflags = payload[off + 8]
        off += 9
        table = gct
        if iflags & 0x80:
            table, off = _read_color_table(payload, off, 2 << (iflags & 7))
        if table is None:
            raise ValueError("image has no color table")
        if w == 0 or h == 0:
            raise ValueError("empty image dimensions")
        if w * h > 1 << 26:
            # declared decode bound (64 Mpx): a crafted descriptor
            # claiming 65535x65535 would otherwise license multi-GB
            # allocations inside an executor before any pixel arrives —
            # oversized rows quarantine as ValueError like any tear
            raise ValueError(f"image {w}x{h} exceeds the 64 Mpx decode bound")
        if off >= len(payload):
            raise ValueError("missing LZW minimum code size")
        min_code = payload[off]
        off += 1
        blob, off = _read_subblocks(payload, off)
        idx = _lzw_decode(blob, min_code, w * h)
        if len(idx) < w * h:
            raise ValueError(f"LZW yielded {len(idx)} of {w * h} pixels")
        arr = np.asarray(idx[: w * h], dtype=np.int32)
        if arr.max() >= len(table):
            raise ValueError("pixel index outside color table")
        rows = arr.reshape(h, w)
        if iflags & 0x40:  # interlaced: Appendix-E 4-pass row order
            out_rows = np.empty_like(rows)
            src = 0
            for first, step in _INTERLACE_PASSES:
                for y in range(first, h, step):
                    out_rows[y] = rows[src]
                    src += 1
            rows = out_rows
        return table[rows].astype(np.uint8), int(w), int(h)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF LZW encoder (dictionary growth, CLEAR reset at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq: tuple[int, ...] = ()
    for v in indices.tolist():
        cand = seq + (v,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (v,)
    if seq:
        emit(table[seq], width)
        # Mirror the decoder's post-final-code table add: after decoding
        # the last data code the decoder inserts one more entry, and if
        # that lands next_code exactly on 2^width it reads the NEXT code
        # (EOI) at width+1 — so EOI must be emitted at the bumped width
        # or a strict decoder tears at end-of-stream.
        if next_code < 4096 and next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    px: np.ndarray, palette: list[tuple[int, int, int]], interlace: bool = False
) -> bytes:
    """Encode an (h, w) array of palette INDICES as a single-image
    GIF89a with the given palette — the spec-literal fixture builder
    (decode expectations known by construction)."""
    px = np.asarray(px)
    h, w = px.shape
    if not 1 <= len(palette) <= 256:
        raise ValueError("GIF palettes hold 1..256 colors")
    if px.max() >= len(palette):
        raise ValueError("index outside palette")
    n = max(2, 1 << (len(palette) - 1).bit_length())
    size_field = n.bit_length() - 2  # n == 2 << size_field
    pal = bytearray()
    for i in range(n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        pal += bytes((r, g, b))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes((0x80 | size_field, 0, 0))
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes((0x40 if interlace else 0,))
    rows = px
    if interlace:
        order = []
        for first, step in _INTERLACE_PASSES:
            order.extend(range(first, h, step))
        rows = px[order]
    min_code = max(2, size_field + 1)
    out.append(min_code)
    blob = _lzw_encode(rows.reshape(-1).astype(np.int32), min_code)
    for i in range(0, len(blob), 255):
        chunk = blob[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
