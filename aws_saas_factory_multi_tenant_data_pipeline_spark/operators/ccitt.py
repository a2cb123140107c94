"""CCITT Group 4 (ITU-T T.6 MMR) + Group 3 (ITU-T T.4) bilevel codec
— stdlib + numpy.

One run-length core closes the whole CCITT fax family (the
operators/lzw.py convention): TIFF compressions 2 (Modified Huffman),
3 (T.4 1-D and mixed 2-D, fill bits honored) and 4 (T.6), plus the
PDF CCITTFaxDecode filter at every K — K < 0 (G4), K = 0 (pure 1-D,
EndOfLine and EncodedByteAlign parameters), K > 0 (mixed EOL+tag
framing) — the most common remaining filters in scanned-document
corpora. [r13] closed the former "K >= 0" named boundary. The T.4
white/black run-length tables (terminating + makeup + shared extended
makeup) and the T.4/T.6 vertical/horizontal/pass mode codes are
transcribed from the public spec; REAL libtiff-written G4 AND
G3/MH files (all five writer variants: MH, 1-D, 2-D, ±FILLBITS) are
decoded pixel-exact via the system libtiff in tests/test_ccitt.py and
tests/test_realworld_r13.py (the LZW-wave discipline: a
self-consistent roundtrip cannot validate absolute code tables, the
third-party artifact can). Fixture encoders included for both
generations (T.4 uncompressed mode stays a NAMED boundary).

Decode contract: ValueError — and only ValueError — on torn or
malformed input.

Scale shape: runs inside Arrow ``mapInPandas`` media passes,
partition-local, one payload per call.
"""

from __future__ import annotations

import numpy as np

# --- T.4 run-length code tables (bits, code) --------------------------------

_WHITE_TERM = {
    0: (8, 0x35), 1: (6, 0x07), 2: (4, 0x7), 3: (4, 0x8), 4: (4, 0xB),
    5: (4, 0xC), 6: (4, 0xE), 7: (4, 0xF), 8: (5, 0x13), 9: (5, 0x14),
    10: (5, 0x07), 11: (5, 0x08), 12: (6, 0x08), 13: (6, 0x03),
    14: (6, 0x34), 15: (6, 0x35), 16: (6, 0x2A), 17: (6, 0x2B),
    18: (7, 0x27), 19: (7, 0x0C), 20: (7, 0x08), 21: (7, 0x17),
    22: (7, 0x03), 23: (7, 0x04), 24: (7, 0x28), 25: (7, 0x2B),
    26: (7, 0x13), 27: (7, 0x24), 28: (7, 0x18), 29: (8, 0x02),
    30: (8, 0x03), 31: (8, 0x1A), 32: (8, 0x1B), 33: (8, 0x12),
    34: (8, 0x13), 35: (8, 0x14), 36: (8, 0x15), 37: (8, 0x16),
    38: (8, 0x17), 39: (8, 0x28), 40: (8, 0x29), 41: (8, 0x2A),
    42: (8, 0x2B), 43: (8, 0x2C), 44: (8, 0x2D), 45: (8, 0x04),
    46: (8, 0x05), 47: (8, 0x0A), 48: (8, 0x0B), 49: (8, 0x52),
    50: (8, 0x53), 51: (8, 0x54), 52: (8, 0x55), 53: (8, 0x24),
    54: (8, 0x25), 55: (8, 0x58), 56: (8, 0x59), 57: (8, 0x5A),
    58: (8, 0x5B), 59: (8, 0x4A), 60: (8, 0x4B), 61: (8, 0x32),
    62: (8, 0x33), 63: (8, 0x34),
}
_WHITE_MAKEUP = {
    64: (5, 0x1B), 128: (5, 0x12), 192: (6, 0x17), 256: (7, 0x37),
    320: (8, 0x36), 384: (8, 0x37), 448: (8, 0x64), 512: (8, 0x65),
    576: (8, 0x68), 640: (8, 0x67), 704: (9, 0xCC), 768: (9, 0xCD),
    832: (9, 0xD2), 896: (9, 0xD3), 960: (9, 0xD4), 1024: (9, 0xD5),
    1088: (9, 0xD6), 1152: (9, 0xD7), 1216: (9, 0xD8), 1280: (9, 0xD9),
    1344: (9, 0xDA), 1408: (9, 0xDB), 1472: (9, 0x98), 1536: (9, 0x99),
    1600: (9, 0x9A), 1664: (6, 0x18), 1728: (9, 0x9B),
}
_BLACK_TERM = {
    0: (10, 0x37), 1: (3, 0x2), 2: (2, 0x3), 3: (2, 0x2), 4: (3, 0x3),
    5: (4, 0x3), 6: (4, 0x2), 7: (5, 0x3), 8: (6, 0x5), 9: (6, 0x4),
    10: (7, 0x4), 11: (7, 0x5), 12: (7, 0x7), 13: (8, 0x4),
    14: (8, 0x7), 15: (9, 0x18), 16: (10, 0x17), 17: (10, 0x18),
    18: (10, 0x8), 19: (11, 0x67), 20: (11, 0x68), 21: (11, 0x6C),
    22: (11, 0x37), 23: (11, 0x28), 24: (11, 0x17), 25: (11, 0x18),
    26: (12, 0xCA), 27: (12, 0xCB), 28: (12, 0xCC), 29: (12, 0xCD),
    30: (12, 0x68), 31: (12, 0x69), 32: (12, 0x6A), 33: (12, 0x6B),
    34: (12, 0xD2), 35: (12, 0xD3), 36: (12, 0xD4), 37: (12, 0xD5),
    38: (12, 0xD6), 39: (12, 0xD7), 40: (12, 0x6C), 41: (12, 0x6D),
    42: (12, 0xDA), 43: (12, 0xDB), 44: (12, 0x54), 45: (12, 0x55),
    46: (12, 0x56), 47: (12, 0x57), 48: (12, 0x64), 49: (12, 0x65),
    50: (12, 0x52), 51: (12, 0x53), 52: (12, 0x24), 53: (12, 0x37),
    54: (12, 0x38), 55: (12, 0x27), 56: (12, 0x28), 57: (12, 0x58),
    58: (12, 0x59), 59: (12, 0x2B), 60: (12, 0x2C), 61: (12, 0x5A),
    62: (12, 0x66), 63: (12, 0x67),
}
_BLACK_MAKEUP = {
    64: (10, 0xF), 128: (12, 0xC8), 192: (12, 0xC9), 256: (12, 0x5B),
    320: (12, 0x33), 384: (12, 0x34), 448: (12, 0x35), 512: (13, 0x6C),
    576: (13, 0x6D), 640: (13, 0x4A), 704: (13, 0x4B), 768: (13, 0x4C),
    832: (13, 0x4D), 896: (13, 0x72), 960: (13, 0x73), 1024: (13, 0x74),
    1088: (13, 0x75), 1152: (13, 0x76), 1216: (13, 0x77),
    1280: (13, 0x52), 1344: (13, 0x53), 1408: (13, 0x54),
    1472: (13, 0x55), 1536: (13, 0x5A), 1600: (13, 0x5B),
    1664: (13, 0x64), 1728: (13, 0x65),
}
# extended makeup codes 1792.. are shared by both colors (T.4 Table 3)
_EXT_MAKEUP = {
    1792: (11, 0x8), 1856: (11, 0xC), 1920: (11, 0xD), 1984: (12, 0x12),
    2048: (12, 0x13), 2112: (12, 0x14), 2176: (12, 0x15),
    2240: (12, 0x16), 2304: (12, 0x17), 2368: (13, 0x1C),
    2432: (13, 0x1D), 2496: (13, 0x1E), 2560: (13, 0x1F),
}


def _build_lut(*tables) -> dict:
    out = {}
    for tab in tables:
        for run, (bits, code) in tab.items():
            key = (bits, code)
            if key in out:
                raise ValueError(f"T.4 table collision at {key}")
            out[key] = run
    return out


_WHITE_LUT = _build_lut(_WHITE_TERM, _WHITE_MAKEUP, _EXT_MAKEUP)
_BLACK_LUT = _build_lut(_BLACK_TERM, _BLACK_MAKEUP, _EXT_MAKEUP)


class _BitR:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = len(data) * 8

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("torn G4 stream: ran out of bits")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def peek12(self) -> int:
        v = 0
        p = self.pos
        for _ in range(12):
            v <<= 1
            if p < self.nbits:
                v |= (self.data[p >> 3] >> (7 - (p & 7))) & 1
            p += 1
        return v


def _read_run(r: _BitR, lut: dict) -> int:
    """One T.4 run: makeup chain (>= 64 multiples) + terminating."""
    total = 0
    while True:
        bits = 0
        code = 0
        run = None
        while bits < 14:
            code = (code << 1) | r.bit()
            bits += 1
            run = lut.get((bits, code))
            if run is not None:
                break
        if run is None:
            raise ValueError("invalid T.4 run-length code")
        total += run
        if run < 64:
            return total
        # makeup: a terminating code (or another makeup per T.4 §2.4.1.3
        # for runs > 2623) must follow


def g4_decode(data: bytes, columns: int, rows: int | None = None,
              max_rows: int = 1 << 16,
              byte_align: bool = False) -> np.ndarray:
    """Decode a T.6 (MMR / Group 4) stream to a [rows, columns] uint8
    array with 1 = BLACK (the CCITT convention; callers map polarity).
    ``rows=None`` decodes until EOFB or bit exhaustion.
    ``byte_align`` starts every coded line on a byte boundary (the PDF
    EncodedByteAlign parameter, r13)."""
    if columns <= 0 or columns > 1 << 20:
        raise ValueError("G4 columns out of range")
    r = _BitR(data)
    out = []
    # reference line as changing-element positions (color flips), an
    # imaginary all-white line above row 0
    ref: list = [columns, columns]
    while True:
        if rows is not None and len(out) >= rows:
            break
        if byte_align:
            r.pos = (r.pos + 7) & ~7
        if rows is None:
            if r.nbits - r.pos < 8 and all(
                not ((r.data[i >> 3] >> (7 - (i & 7))) & 1)
                for i in range(r.pos, r.nbits)
            ):
                break  # zero-padding tail
            if r.peek12() == 1:  # EOL → EOFB
                break
        if len(out) >= max_rows:
            raise ValueError("G4 stream exceeds the row bound")
        cur: list = []
        a0 = -1
        color = 0  # 0 = white
        while a0 < columns:
            # b1: first ref transition strictly right of a0 whose color
            # parity is a flip to the OPPOSITE of the current color —
            # ref[even] are white→black flips (i & 1 == 0 == white),
            # ref[odd] black→white, so the needed parity equals `color`
            i = 0
            while i < len(ref) and ref[i] <= a0:
                i += 1
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else columns
            b2 = ref[i + 1] if i + 1 < len(ref) else columns
            # mode code
            if r.peek12() == 1:
                raise ValueError("G4 EOL inside image data (G3 stream?)")
            bit = r.bit()
            if bit:  # V0
                a1 = b1
                cur.append(a1)
                a0 = a1
                color ^= 1
                continue
            bit2 = r.bit()
            bit3 = r.bit()
            if bit2 == 1:  # 01x → VL1(010)/VR1(011)
                a1 = b1 + (1 if bit3 else -1)
                if not 0 <= a1 <= columns:
                    raise ValueError("G4 vertical offset out of line")
                cur.append(a1)
                a0 = a1
                color ^= 1
                continue
            if bit3 == 1:  # 001 → horizontal
                start = a0 if a0 > 0 else 0
                run1 = _read_run(r, _BLACK_LUT if color else _WHITE_LUT)
                run2 = _read_run(r, _WHITE_LUT if color else _BLACK_LUT)
                a1 = start + run1
                a2 = a1 + run2
                if a2 > columns:
                    raise ValueError("G4 horizontal runs overflow the line")
                cur.append(a1)
                cur.append(a2)
                a0 = a2
                continue
            bit4 = r.bit()
            if bit4 == 1:  # 0001 → pass
                a0 = b2
                continue
            bit5 = r.bit()
            bit6 = r.bit()
            if bit5 == 1:  # 00001x → VR2/VL2
                a1 = b1 + (2 if bit6 else -2)
                if not 0 <= a1 <= columns:
                    raise ValueError("G4 vertical offset out of line")
                cur.append(a1)
                a0 = a1
                color ^= 1
                continue
            if bit6 == 1:  # 000001x → VR3/VL3
                bit7 = r.bit()
                a1 = b1 + (3 if bit7 else -3)
                if not 0 <= a1 <= columns:
                    raise ValueError("G4 vertical offset out of line")
                cur.append(a1)
                a0 = a1
                color ^= 1
                continue
            raise ValueError("invalid G4 mode code")
        # materialize the row from its transitions
        row = np.zeros(columns, dtype=np.uint8)
        val = 0
        prev = 0
        for t in cur:
            t = min(t, columns)
            if val:
                row[prev:t] = 1
            prev = t
            val ^= 1
        if val and prev < columns:
            row[prev:] = 1
        out.append(row)
        ref = [t for t in cur if t < columns]
        ref += [columns, columns]
    if rows is not None and len(out) < rows:
        raise ValueError("G4 stream shorter than the declared rows")
    if not out:
        raise ValueError("empty G4 stream")
    return np.stack(out)


# --- fixture encoder --------------------------------------------------------


def _runs_codes(run: int, lut_term, lut_makeup) -> list:
    out = []
    while run >= 64:
        avail = [m for m in list(lut_makeup) + list(_EXT_MAKEUP) if m <= run]
        m = max(avail)
        out.append(
            lut_makeup.get(m) or _EXT_MAKEUP[m]
        )
        run -= m
        if run < 64:
            break
    out.append(lut_term[run])
    return out


def g4_encode(img: np.ndarray) -> bytes:
    """Encode a [rows, cols] 0/1 array (1 = black) as T.6 + EOFB.
    Mode choice mirrors real encoders: vertical when |a1-b1| <= 3,
    else horizontal; pass when b2 < a1."""
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("g4_encode needs a 2-D bilevel array")
    h, w = img.shape
    bits: list = []

    def put(nbits: int, code: int):
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    def transitions(row) -> list:
        t = []
        val = 0
        for x in range(w):
            if row[x] != val:
                t.append(x)
                val = row[x]
        return t

    ref = []
    for y in range(h):
        cur = transitions(img[y])
        a0 = -1
        color = 0
        ci = 0
        while a0 < w:
            a1 = cur[ci] if ci < len(cur) else w
            i = 0
            while i < len(ref) and ref[i] <= a0:
                i += 1
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            if b2 < a1:  # pass
                put(4, 0b0001)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                if d == 0:
                    put(1, 1)
                elif d == 1:
                    put(3, 0b011)
                elif d == -1:
                    put(3, 0b010)
                elif d == 2:
                    put(6, 0b000011)
                elif d == -2:
                    put(6, 0b000010)
                elif d == 3:
                    put(7, 0b0000011)
                else:
                    put(7, 0b0000010)
                a0 = a1
                color ^= 1
                ci += 1
            else:  # horizontal: two runs from a0
                a2 = cur[ci + 1] if ci + 1 < len(cur) else w
                start = a0 if a0 > 0 else 0
                put(3, 0b001)
                for t, run in ((color, a1 - start), (1 - color, a2 - a1)):
                    codes = _runs_codes(
                        run,
                        _BLACK_TERM if t else _WHITE_TERM,
                        _BLACK_MAKEUP if t else _WHITE_MAKEUP,
                    )
                    for nb, code in codes:
                        put(nb, code)
                a0 = a2
                ci += 2
        ref = cur
    # EOFB: two EOLs
    put(12, 1)
    put(12, 1)
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        out[i >> 3] |= b << (7 - (i & 7))
    return bytes(out)


# --- T.4 Group 3 (r13: closes the "K >= 0" named boundary) -------------------


def _skip_eol(r: _BitR, required: bool) -> bool:
    """Consume optional fill zeros + one EOL (eleven 0s + 1, T.4
    §2.3.1.1.1). Returns True if an EOL was consumed. Fill bits are
    only legal as zeros directly ahead of an EOL, so scanning is safe:
    no run/mode code is twelve zeros."""
    start = r.pos
    zeros = 0
    while r.pos < r.nbits:
        if r.bit():
            if zeros >= 11:
                return True
            r.pos -= 1  # the 1 belongs to image data
            break
        zeros += 1
        if zeros > 64 + 11:
            raise ValueError("T.4 fill run too long (torn stream?)")
    if required and zeros < 11:
        raise ValueError("T.4 EOL missing where required")
    if zeros < 11:
        r.pos = start
    return False


def _decode_1d_row(r: _BitR, columns: int) -> list:
    """One T.4 1-D (MH) row → transition positions (color flips)."""
    cur: list = []
    pos = 0
    color = 0
    while pos < columns:
        run = _read_run(r, _BLACK_LUT if color else _WHITE_LUT)
        pos += run
        if pos > columns:
            raise ValueError("T.4 1-D runs overflow the line")
        cur.append(pos)
        color ^= 1
    return cur


def _decode_2d_row(r: _BitR, ref: list, columns: int) -> list:
    """One 2-D-coded row against ``ref`` (shared with the T.6 core —
    the mode alphabet is identical; only EOL framing differs)."""
    cur: list = []
    a0 = -1
    color = 0
    while a0 < columns:
        i = 0
        while i < len(ref) and ref[i] <= a0:
            i += 1
        if (i & 1) != color:
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns
        if r.peek12() == 1:
            raise ValueError("T.4 EOL inside a 2-D row (torn stream)")
        bit = r.bit()
        if bit:  # V0
            cur.append(b1)
            a0 = b1
            color ^= 1
            continue
        bit2 = r.bit()
        bit3 = r.bit()
        if bit2 == 1:  # VL1/VR1
            a1 = b1 + (1 if bit3 else -1)
            if not 0 <= a1 <= columns:
                raise ValueError("T.4 vertical offset out of line")
            cur.append(a1)
            a0 = a1
            color ^= 1
            continue
        if bit3 == 1:  # horizontal
            start = a0 if a0 > 0 else 0
            run1 = _read_run(r, _BLACK_LUT if color else _WHITE_LUT)
            run2 = _read_run(r, _WHITE_LUT if color else _BLACK_LUT)
            a1 = start + run1
            a2 = a1 + run2
            if a2 > columns:
                raise ValueError("T.4 horizontal runs overflow the line")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
            continue
        bit4 = r.bit()
        if bit4 == 1:  # pass
            a0 = b2
            continue
        bit5 = r.bit()
        bit6 = r.bit()
        if bit5 == 1:
            a1 = b1 + (2 if bit6 else -2)
        elif bit6 == 1:
            a1 = b1 + (3 if r.bit() else -3)
        else:
            raise ValueError("invalid T.4 2-D mode code")
        if not 0 <= a1 <= columns:
            raise ValueError("T.4 vertical offset out of line")
        cur.append(a1)
        a0 = a1
        color ^= 1
    return cur


def _row_from_transitions(cur: list, columns: int) -> np.ndarray:
    row = np.zeros(columns, dtype=np.uint8)
    val = 0
    prev = 0
    for t in cur:
        t = min(t, columns)
        if val:
            row[prev:t] = 1
        prev = t
        val ^= 1
    if val and prev < columns:
        row[prev:] = 1
    return row


def g3_decode(data: bytes, columns: int, rows: int | None = None,
              two_d: bool = False, byte_align: bool = False,
              eols: bool = True, max_rows: int = 1 << 16) -> np.ndarray:
    """Decode a T.4 (Group 3) stream to [rows, columns] uint8, 1 =
    black. Three framings cover the real carriers:

    - ``eols=True, two_d=False``: classic G3 1-D — EOL before every
      row (TIFF compression 3 default; PDF K=0 streams that carry
      EOLs).
    - ``eols=True, two_d=True``: mixed 1-D/2-D — EOL + tag bit per row
      (TIFF T4Options bit 0; PDF K > 0).
    - ``eols=False``: Modified Huffman — no EOLs; TIFF compression 2
      rows are byte-aligned (``byte_align=True``), PDF K=0 without
      EncodedByteAlign packs rows back-to-back.

    RTC (six EOLs) or bit exhaustion on a row boundary ends a
    ``rows=None`` decode. ValueError — and only ValueError — on torn
    input.
    """
    if columns <= 0 or columns > 1 << 20:
        raise ValueError("G3 columns out of range")
    r = _BitR(data)
    out = []
    ref: list = [columns, columns]
    while True:
        if rows is not None and len(out) >= rows:
            break
        if len(out) >= max_rows:
            raise ValueError("G3 stream exceeds the row bound")
        if byte_align:
            r.pos = (r.pos + 7) & ~7
        if r.pos >= r.nbits:
            if rows is None:
                break
            raise ValueError("G3 stream shorter than the declared rows")
        saw_eol = _skip_eol(r, required=False) if eols else False
        if eols and not saw_eol and out:
            # between-row EOL is mandatory in EOL framing; before row 0
            # some writers omit it
            if rows is None:
                break
            raise ValueError("T.4 EOL missing between rows")
        if r.pos >= r.nbits:
            break
        is_2d = False
        if two_d:
            if not saw_eol:
                raise ValueError("T.4 2-D framing requires EOL tag bits")
            is_2d = r.bit() == 0
        if rows is None and saw_eol:
            # RTC: an EOL (+ tag in 2-D framing) followed directly by
            # another EOL carries no row data — the page is over
            save = r.pos
            if r.nbits - r.pos < 12 or _skip_eol(r, required=False):
                break
            r.pos = save
        if is_2d:
            cur = _decode_2d_row(r, ref, columns)
        else:
            cur = _decode_1d_row(r, columns)
        out.append(_row_from_transitions(cur, columns))
        ref = [t for t in cur if t < columns] + [columns, columns]
    if rows is not None and len(out) < rows:
        raise ValueError("G3 stream shorter than the declared rows")
    if not out:
        raise ValueError("empty G3 stream")
    return np.stack(out)


def g3_encode(img: np.ndarray, two_d_k: int = 0, byte_align: bool = False,
              eols: bool = True) -> bytes:
    """Encode a [rows, cols] 0/1 array (1 = black) as T.4. ``two_d_k``
    = 0 emits pure 1-D rows; k > 1 emits a 2-D row after each 1-D row
    up to k-1 per group (the fax K parameter). ``eols=False`` +
    ``byte_align=True`` is the TIFF compression-2 (MH) shape."""
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("g3_encode needs a 2-D bilevel array")
    h, w = img.shape
    bits: list = []

    def put(nbits: int, code: int):
        for i in range(nbits - 1, -1, -1):
            bits.append((code >> i) & 1)

    def align():
        while len(bits) % 8:
            bits.append(0)

    def transitions(row) -> list:
        t = []
        val = 0
        for x in range(w):
            if row[x] != val:
                t.append(int(x))
                val = row[x]
        return t

    def put_1d(row):
        pos = 0
        color = 0
        tr = transitions(row) + [w]
        for t in tr:
            run = t - pos
            for nb, code in _runs_codes(
                run,
                _BLACK_TERM if color else _WHITE_TERM,
                _BLACK_MAKEUP if color else _WHITE_MAKEUP,
            ):
                put(nb, code)
            pos = t
            color ^= 1
            if pos >= w:
                break

    def put_2d(row, ref):
        cur = transitions(row)
        a0 = -1
        color = 0
        ci = 0
        while a0 < w:
            a1 = cur[ci] if ci < len(cur) else w
            i = 0
            while i < len(ref) and ref[i] <= a0:
                i += 1
            if (i & 1) != color:
                i += 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            if b2 < a1:
                put(4, 0b0001)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                put(*{0: (1, 1), 1: (3, 0b011), -1: (3, 0b010),
                      2: (6, 0b000011), -2: (6, 0b000010),
                      3: (7, 0b0000011), -3: (7, 0b0000010)}[d])
                a0 = a1
                color ^= 1
                ci += 1
            else:
                a2 = cur[ci + 1] if ci + 1 < len(cur) else w
                start = a0 if a0 > 0 else 0
                put(3, 0b001)
                for t, run in ((color, a1 - start), (1 - color, a2 - a1)):
                    for nb, code in _runs_codes(
                        run,
                        _BLACK_TERM if t else _WHITE_TERM,
                        _BLACK_MAKEUP if t else _WHITE_MAKEUP,
                    ):
                        put(nb, code)
                a0 = a2
                ci += 2

    ref: list = []
    since_1d = 0
    for y in range(h):
        if byte_align:
            align()
        if eols:
            put(12, 1)
        use_2d = two_d_k > 1 and 0 < since_1d < two_d_k
        if two_d_k > 1:
            if eols:
                put(1, 0 if use_2d else 1)  # tag: 1 = 1-D
            since_1d = since_1d + 1 if use_2d else 1
        cur_row = img[y]
        if use_2d:
            put_2d(cur_row, ref)
        else:
            put_1d(cur_row)
        ref = transitions(cur_row)
    if eols:
        for _ in range(6):  # RTC
            if byte_align:
                align()
            put(12, 1)
            if two_d_k > 1:
                put(1, 1)
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        out[i >> 3] |= b << (7 - (i & 7))
    return bytes(out)
