"""LZW codec — the TIFF 6.0 §13 / PDF ISO 32000-1 §7.4.4 variant
(MSB-first codes, 9→12-bit widths, ClearCode 256, EOI 257, the
"early change" width switch both formats share).

One core closes TWO r10 declared boundaries at once: TIFF
compression 5 (operators/tiff.py) and the PDF LZWDecode stream
filter (operators/pdf.py). Fixture encoder included (emits an
initial Clear, optional periodic Clears to exercise table resets,
and the spec's early-change width bumps); decode(encode(x)) is
pinned byte-exact, plus adversarial torn/overfull streams raise."""

from __future__ import annotations

_CLEAR = 256
_EOI = 257
_MAX_WIDTH = 12


def lzw_decode(data: bytes, early_change: int = 1,
               max_out: int = 1 << 28) -> bytes:
    """Decode an LZW stream. ValueError — and only ValueError — on
    torn or malformed input."""
    if early_change not in (0, 1):
        raise ValueError("LZW early_change must be 0 or 1")
    out = bytearray()
    nbits = len(data) * 8
    pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def read_code() -> int | None:
        nonlocal pos
        if pos + width > nbits:
            return None
        v = 0
        p = pos
        for _ in range(width):
            v = (v << 1) | ((data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        pos = p
        return v

    while True:
        code = read_code()
        if code is None:
            raise ValueError("torn LZW stream: ran out before EOI")
        if code == _CLEAR:
            table = []
            width = 9
            prev = None
            continue
        if code == _EOI:
            return bytes(out)
        if prev is None:
            if code > 255:
                raise ValueError(f"LZW first code {code} after Clear not a literal")
            entry = bytes([code])
        elif code < 256:
            entry = bytes([code])
        elif code - 258 < len(table):
            entry = table[code - 258]
        elif code - 258 == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"LZW code {code} beyond the table")
        out += entry
        if len(out) > max_out:
            raise ValueError("LZW output exceeds the decode bound")
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # width switch (TIFF 6.0 §13 / libtiff timing): the decoder
        # widens when its next assignable code reaches 2^w - earlyChange
        next_code = 258 + len(table)
        if next_code >= (1 << width) - early_change and width < _MAX_WIDTH:
            width += 1


def lzw_encode(data: bytes, early_change: int = 1,
               clear_every: int | None = None) -> bytes:
    """Fixture encoder (same dialect). ``clear_every``: emit a Clear
    after that many output codes (exercises decoder table resets);
    always Clears when the table is full (the 12-bit cap)."""
    bits: list[int] = []
    width = 9

    def emit(code: int) -> None:
        nonlocal width
        for i in range(width - 1, -1, -1):
            bits.append((code >> i) & 1)

    table: dict[bytes, int] = {}
    next_code = 258
    emit(_CLEAR)
    seq = b""
    n_codes = 0
    for i in range(len(data)):
        c = data[i : i + 1]
        cand = seq + c
        if len(cand) == 1 or cand in table:
            seq = cand
            continue
        code = seq[0] if len(seq) == 1 else table[seq]
        emit(code)
        n_codes += 1
        table[cand] = next_code
        next_code += 1
        # encoder runs one table entry ahead of the decoder at the same
        # stream position: bump at 2^w + 1 - earlyChange
        if next_code + early_change > (1 << width) and width < _MAX_WIDTH:
            width += 1
        seq = c
        if next_code >= (1 << _MAX_WIDTH) - 1 or (
            clear_every and n_codes >= clear_every
        ):
            emit(seq[0] if len(seq) == 1 else table[seq])
            seq = b""
            # on reading that flush code the decoder appends the entry
            # for the PREVIOUS code, catching up to this table — if its
            # next assignable code crosses 2^w - earlyChange it widens
            # BEFORE reading the Clear, so the Clear must be emitted at
            # the new width (r11 advice: desync when clear_every lands
            # exactly on a width boundary)
            if next_code + early_change >= (1 << width) and width < _MAX_WIDTH:
                width += 1
            emit(_CLEAR)
            table = {}
            next_code = 258
            width = 9
            n_codes = 0
    if seq:
        emit(seq[0] if len(seq) == 1 else table[seq])
        # same decoder-side catch-up applies before the EOI read
        if next_code + early_change >= (1 << width) and width < _MAX_WIDTH:
            width += 1
    emit(_EOI)
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        out[i >> 3] |= b << (7 - (i & 7))
    return bytes(out)
