"""Zstandard (RFC 8878) frame decoder + store-mode encoder — from spec, r14.

``.jsonl.zst`` shards and ``.tar.zst`` archives are how modern LLM
corpora actually ship (The Pile, RedPajama, FineWeb); until this round
a ``.zst`` payload quarantined. This module implements the frame
format from the PUBLIC RFC 8878 / zstd format specification:

- frame header (window descriptor, single-segment, frame content
  size, dictionary-ID fields §3.1.1.1),
- raw / RLE / compressed blocks (§3.1.1.2),
- the literals section — raw, RLE, and Huffman-coded (1- and
  4-stream), with direct or FSE-compressed weight descriptions and
  treeless repeat blocks (§3.1.1.3.1),
- the sequences section — predefined / RLE / FSE-compressed / repeat
  table modes for literal-length, offset, and match-length codes,
  interleaved backward bitstream, repeat-offset ring (§3.1.1.3.2),
- skippable frames (§3.1.2) and multi-frame concatenation,
- the xxHash64 content checksum (public xxHash spec; low 32 bits),
- dictionaries (§5, r14 second wave): structured ZDICT dictionaries
  (magic 0xEC30A437 — entropy-table seeds for treeless/repeat first
  blocks, repeat-offset init, content window prefix) AND raw content
  prefixes, both pinned against real ZDICT_trainFromBuffer /
  ZSTD_compress_usingDict output. A dictionary frame decoded WITHOUT
  its dictionary raises a named ValueError instead of producing wrong
  bytes (shared-dictionary compression is how small-doc corpora ship
  efficiently).

Both directions are pinned against the system libzstd via ctypes
(tools/zstd_rig.py, tests/test_zstd.py): real ZSTD_compress2 output
across levels/window-logs/checksum settings decodes byte-identical
here, and this module's store-mode frames decode in the real library.

Encoder: ``zstd_compress_store`` emits valid raw/RLE-block frames
(the hevc_enc fixture-encoder convention — correct, not
ratio-chasing) the reference library accepts.

Decode contract: ValueError — and only ValueError — on torn input.
Scale shape: runs inside Arrow ``mapInPandas`` archive/WARC passes,
partition-local, one payload per call (operators/archives.py,
sources/warc.py). Pure-Python throughput is an honest-trade floor
priced in SCALE.md; the one-function native swap seam is
``zstd_decompress`` itself (same signature as every host binding).
"""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_SKIP_MAGIC_BASE = 0x184D2A50  # 0x184D2A50..5F are skippable frames
_BLOCK_MAX = 1 << 17  # 128 KiB hard cap (spec Block_Maximum_Size)
_HUF_MAX_BITS = 11  # spec: Huffman code lengths never exceed 11 bits

# --- xxHash64 (public spec; the frame checksum primitive) ---------------------

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64(data: bytes, seed: int = 0) -> int:
    """Reference xxHash64 (64-bit lanes, the published algorithm)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        end = n - (n % 32)
        words = struct.unpack_from(f"<{end // 8}Q", data)
        for j in range(0, end // 8, 4):
            v1 = (_rotl64((v1 + words[j] * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl64((v2 + words[j + 1] * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl64((v3 + words[j + 2] * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl64((v4 + words[j + 3] * _P2) & _M64, 31) * _P1) & _M64
        i = end
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
            + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl64((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl64(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M64
        h = (_rotl64(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# --- bitstreams ---------------------------------------------------------------


class _BackBits:
    """Backward bitstream (§3.1.1.3.2.4): the last byte's highest set
    bit is a padding sentinel; values are read from just below it,
    moving toward the first byte. Reads past the start zero-fill and
    leave ``pos`` negative — FSE weight decoding's documented
    termination condition.

    Performance shape (r14 second pass): a SLIDING byte window, not
    one whole-stream Python int — big-int shifts cost O(stream size)
    per read, which made literal-heavy blocks quadratic (measured
    0.5 MB/s on low-level web text; ~40x after this fix)."""

    __slots__ = ("b", "i", "window", "nbits")

    def __init__(self, b: bytes):
        if not b or b[-1] == 0:
            raise ValueError("torn zstd backward bitstream")
        self.b = b
        self.i = len(b) - 1
        w = b[self.i]
        self.nbits = w.bit_length() - 1  # drop the sentinel bit
        self.window = w & ((1 << self.nbits) - 1)

    @property
    def pos(self) -> int:
        return self.nbits + 8 * self.i

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        nbits = self.nbits
        if nbits < n:
            b = self.b
            i = self.i
            window = self.window
            while nbits < n and i > 0:
                i -= 1
                window = (window << 8) | b[i]
                nbits += 8
            self.i = i
            self.window = window
            self.nbits = nbits
            if nbits < n:
                # past the stream start: zero-fill the missing low bits
                v = (window << (n - nbits)) & ((1 << n) - 1) if nbits > 0 \
                    else 0
                self.nbits = nbits - n  # negative, by contract
                self.window = 0
                return v
        nbits -= n
        v = self.window >> nbits
        self.nbits = nbits
        self.window &= (1 << nbits) - 1
        return v


class _FwdBits:
    """Forward little-endian bitstream (FSE table descriptions,
    §4.1.1): bits are read LSB-first within each byte."""

    __slots__ = ("b", "pos")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0

    def peek(self, n: int) -> int:
        end = (self.pos + n + 7) // 8
        if end > len(self.b):
            raise ValueError("torn zstd FSE table description")
        chunk = int.from_bytes(self.b[self.pos // 8 : end], "little")
        return (chunk >> (self.pos % 8)) & ((1 << n) - 1)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos += n
        return v

    def skip(self, n: int) -> None:
        self.pos += n


# --- FSE (§4.1) ---------------------------------------------------------------


def _fse_distribution(stream: bytes, max_al: int):
    """Parse an FSE table description → (normalized freqs, accuracy
    log, bytes consumed). ``-1`` marks a "less than 1" probability."""
    fb = _FwdBits(stream)
    al = fb.read(4) + 5
    if al > max_al:
        raise ValueError(f"zstd FSE accuracy log {al} > {max_al}")
    remaining = (1 << al) + 1
    freqs: list[int] = []
    while remaining > 1:
        if len(freqs) > 255:
            raise ValueError("zstd FSE table has too many symbols")
        bits_n = remaining.bit_length()
        val = fb.peek(bits_n)
        lower_mask = (1 << (bits_n - 1)) - 1
        threshold = (1 << bits_n) - 1 - remaining
        if (val & lower_mask) < threshold:
            fb.skip(bits_n - 1)
            value = val & lower_mask
        elif val > lower_mask:
            fb.skip(bits_n)
            value = val - threshold
        else:
            fb.skip(bits_n)
            value = val
        prob = value - 1
        freqs.append(prob)
        remaining -= 1 if prob < 0 else prob
        if prob == 0:
            while True:
                rep = fb.read(2)
                freqs.extend([0] * rep)
                if rep < 3:
                    break
    if remaining != 1:
        raise ValueError("zstd FSE probabilities overshoot the table")
    return freqs, al, (fb.pos + 7) // 8


class _FseTable:
    __slots__ = ("al", "sym", "nb", "base")

    def __init__(self, al, sym, nb, base):
        self.al = al
        self.sym = sym
        self.nb = nb
        self.base = base


def _fse_build(freqs: list[int], al: int) -> _FseTable:
    """Build the FSE decode table (§4.1.1): spread symbols with the
    standard (size/2 + size/8 + 3) step, then assign per-cell nbBits
    and baseline from the per-symbol occurrence counters."""
    size = 1 << al
    sym = [0] * size
    nb = [0] * size
    base = [0] * size
    high = size - 1
    ctr: dict[int, int] = {}
    for s, f in enumerate(freqs):
        if f == -1:
            if high < 0:
                raise ValueError("zstd FSE table overflow")
            sym[high] = s
            high -= 1
            ctr[s] = 1
        elif f > 0:
            ctr[s] = f
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, f in enumerate(freqs):
        if f > 0:
            for _ in range(f):
                sym[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd FSE spread did not close")
    for i in range(size):
        s = sym[i]
        x = ctr[s]
        ctr[s] = x + 1
        bits = al - (x.bit_length() - 1)
        nb[i] = bits
        base[i] = (x << bits) - size
    return _FseTable(al, sym, nb, base)


def _rle_table(symbol: int) -> _FseTable:
    return _FseTable(0, [symbol], [0], [0])


# --- Huffman (§4.2) -----------------------------------------------------------


def _fse_decode_weights(stream: bytes) -> list[int]:
    """Two interleaved FSE states decode Huffman weights until the
    backward bitstream is exhausted (§4.2.1.2): after a state update
    overdraws, the OTHER state emits one final weight and decoding
    stops."""
    freqs, al, q = _fse_distribution(stream, 6)
    table = _fse_build(freqs, al)
    bits = _BackBits(stream[q:])
    s1 = bits.read(al)
    s2 = bits.read(al)
    if bits.pos < 0:
        raise ValueError("zstd Huffman weight stream shorter than states")
    weights: list[int] = []
    while True:
        weights.append(table.sym[s1])
        s1 = table.base[s1] + bits.read(table.nb[s1])
        if bits.pos < 0:
            weights.append(table.sym[s2])
            break
        weights.append(table.sym[s2])
        s2 = table.base[s2] + bits.read(table.nb[s2])
        if bits.pos < 0:
            weights.append(table.sym[s1])
            break
        if len(weights) > 254:
            raise ValueError("zstd Huffman weight stream does not end")
    return weights


class _HufTable:
    __slots__ = ("max_bits", "sym", "nb")

    def __init__(self, max_bits, sym, nb):
        self.max_bits = max_bits
        self.sym = sym
        self.nb = nb


def _huf_build(weights: list[int]) -> _HufTable:
    """Canonical Huffman decode table from explicit weights plus the
    implicit last one (§4.2.1.3): symbol s spans 2^(weight-1) cells,
    longest codes first, natural symbol order within a bit length."""
    total = sum(1 << (w - 1) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd Huffman weights are all zero")
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ValueError("zstd Huffman weights do not complete a power of 2")
    weights = weights + [left.bit_length()]
    if max_bits > _HUF_MAX_BITS:
        raise ValueError(f"zstd Huffman depth {max_bits} > {_HUF_MAX_BITS}")
    size = 1 << max_bits
    nbits = [max_bits + 1 - w if w > 0 else 0 for w in weights]
    rank_count = [0] * (max_bits + 1)
    for b in nbits:
        if b:
            rank_count[b] += 1
    rank_idx = [0] * (max_bits + 2)
    rank_idx[max_bits] = 0
    for b in range(max_bits, 0, -1):
        rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (
            1 << (max_bits - b)
        )
    sym = bytearray(size)
    nb = bytearray(size)
    for s, b in enumerate(nbits):
        if not b:
            continue
        span = 1 << (max_bits - b)
        start = rank_idx[b]
        if start + span > size:
            raise ValueError("zstd Huffman table overflow")
        for i in range(start, start + span):
            sym[i] = s
            nb[i] = b
        rank_idx[b] += span
    return _HufTable(max_bits, sym, nb)


def _huf_read_table(sub: bytes):
    """Huffman tree description (§4.2.1.1) → (table, bytes consumed):
    headerByte < 128 is an FSE-compressed weight stream of that size,
    ≥ 128 is (headerByte - 127) direct 4-bit weights."""
    if not sub:
        raise ValueError("torn zstd Huffman tree description")
    hb = sub[0]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        if 1 + nbytes > len(sub):
            raise ValueError("torn zstd direct Huffman weights")
        weights = []
        for i in range(n):
            byte = sub[1 + i // 2]
            weights.append(byte >> 4 if i % 2 == 0 else byte & 15)
        return _huf_build(weights), 1 + nbytes
    if 1 + hb > len(sub):
        raise ValueError("torn zstd FSE Huffman weights")
    return _huf_build(_fse_decode_weights(sub[1 : 1 + hb])), 1 + hb


def _huf_decode(stream: bytes, huf: _HufTable, count: int) -> bytearray:
    """Per-symbol Huffman decode over the backward stream — the
    literal-heavy hot loop (r14 second pass: sliding byte window in
    locals; peek max_bits, consume the hit's length)."""
    bits = _BackBits(stream)
    mb = huf.max_bits
    symt = huf.sym
    nbt = huf.nb
    b = bits.b
    i = bits.i
    window = bits.window
    nbits = bits.nbits
    mask = (1 << mb) - 1
    out = bytearray(count)
    for k in range(count):
        if nbits < mb:
            while nbits < mb and i > 0:
                i -= 1
                window = (window << 8) | b[i]
                nbits += 8
            if nbits < mb:
                if nbits <= 0:
                    raise ValueError("zstd Huffman stream ran out of bits")
                idx = (window << (mb - nbits)) & mask
                take = nbt[idx]
                if take > nbits:
                    raise ValueError("zstd Huffman stream overdrawn")
                out[k] = symt[idx]
                nbits -= take
                window &= (1 << nbits) - 1
                continue
        idx = window >> (nbits - mb)
        out[k] = symt[idx]
        nbits -= nbt[idx]
        window &= (1 << nbits) - 1
    if nbits != 0 or i != 0:
        raise ValueError("zstd Huffman stream not fully consumed")
    return out


# --- literals section (§3.1.1.3.1) --------------------------------------------


def _decode_literals(b: bytes, prev_huf):
    """→ (literals, offset past the section, current Huffman table)."""
    if not b:
        raise ValueError("torn zstd literals section")
    h0 = b[0]
    ltype = h0 & 3
    sf = (h0 >> 2) & 3
    if ltype <= 1:  # Raw / RLE
        if sf in (0, 2):
            rs = h0 >> 3
            p = 1
        elif sf == 1:
            if len(b) < 2:
                raise ValueError("torn zstd literals header")
            rs = (h0 >> 4) | (b[1] << 4)
            p = 2
        else:
            if len(b) < 3:
                raise ValueError("torn zstd literals header")
            rs = (h0 >> 4) | (b[1] << 4) | (b[2] << 12)
            p = 3
        if rs > _BLOCK_MAX:
            raise ValueError("zstd literals exceed the 128 KiB block cap")
        if ltype == 0:
            if p + rs > len(b):
                raise ValueError("torn zstd raw literals")
            return b[p : p + rs], p + rs, prev_huf
        if p + 1 > len(b):
            raise ValueError("torn zstd RLE literals")
        return b[p : p + 1] * rs, p + 1, prev_huf
    # Compressed / Treeless
    if sf == 0:
        streams = 1
        need = 3
    elif sf == 1:
        streams = 4
        need = 3
    elif sf == 2:
        streams = 4
        need = 4
    else:
        streams = 4
        need = 5
    if len(b) < need:
        raise ValueError("torn zstd literals header")
    if need == 3:
        rs = (h0 >> 4) | ((b[1] & 0x3F) << 4)
        cs = (b[1] >> 6) | (b[2] << 2)
    elif need == 4:
        rs = (h0 >> 4) | (b[1] << 4) | ((b[2] & 3) << 12)
        cs = (b[2] >> 2) | (b[3] << 6)
    else:
        rs = (h0 >> 4) | (b[1] << 4) | ((b[2] & 0x3F) << 12)
        cs = (b[2] >> 6) | (b[3] << 2) | (b[4] << 10)
    p = need
    if rs > _BLOCK_MAX:
        raise ValueError("zstd literals exceed the 128 KiB block cap")
    if p + cs > len(b):
        raise ValueError("torn zstd compressed literals")
    sub = b[p : p + cs]
    q = 0
    if ltype == 2:
        huf, q = _huf_read_table(sub)
    else:
        huf = prev_huf
        if huf is None:
            raise ValueError("zstd treeless literals with no previous table")
    if streams == 1:
        return bytes(_huf_decode(sub[q:], huf, rs)), p + cs, huf
    if cs - q < 6:
        raise ValueError("torn zstd 4-stream jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", sub, q)
    q += 6
    s4 = (cs - q) - s1 - s2 - s3
    chunk = (rs + 3) // 4
    c4 = rs - 3 * chunk
    if s4 <= 0 or c4 < 0:
        raise ValueError("zstd 4-stream sizes are inconsistent")
    lits = bytearray()
    for sz, cnt in ((s1, chunk), (s2, chunk), (s3, chunk), (s4, c4)):
        lits += _huf_decode(sub[q : q + sz], huf, cnt)
        q += sz
    return bytes(lits), p + cs, huf


# --- sequences section (§3.1.1.3.2) -------------------------------------------

_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = ([1, 4, 3, 2, 2, 2, 2, 2, 2] + [1] * 37 + [-1] * 7, 6)
_OF_DEFAULT = ([1] * 6 + [2] * 3 + [1] * 15 + [-1] * 5, 5)

_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]

_MAX_AL = {"ll": 9, "of": 8, "ml": 9}
_DEFAULTS = {"ll": _LL_DEFAULT, "of": _OF_DEFAULT, "ml": _ML_DEFAULT}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}

_PREDEFINED: dict[str, _FseTable] = {}


def _predefined(kind: str) -> _FseTable:
    t = _PREDEFINED.get(kind)
    if t is None:
        freqs, al = _DEFAULTS[kind]
        t = _fse_build(freqs, al)
        _PREDEFINED[kind] = t
    return t


def _seq_table(b: bytes, p: int, mode: int, kind: str, repeat_tables):
    """Resolve one of LL/OF/ML per the 2-bit mode: 0 predefined,
    1 RLE (one symbol byte), 2 FSE-compressed (description follows),
    3 repeat the previous block's table."""
    if mode == 0:
        t = _predefined(kind)
    elif mode == 1:
        if p >= len(b):
            raise ValueError("torn zstd RLE sequence table")
        s = b[p]
        p += 1
        if s > _MAX_SYM[kind]:
            raise ValueError(f"zstd {kind} RLE symbol {s} out of range")
        t = _rle_table(s)
    elif mode == 2:
        freqs, al, q = _fse_distribution(b[p:], _MAX_AL[kind])
        if len(freqs) - 1 > _MAX_SYM[kind]:
            raise ValueError(f"zstd {kind} table symbol out of range")
        t = _fse_build(freqs, al)
        p += q
    else:
        t = repeat_tables.get(kind)
        if t is None:
            raise ValueError(
                f"zstd {kind} repeat mode with no previous table"
            )
    repeat_tables[kind] = t
    return t, p


def _decode_block(b: bytes, out: bytearray, frame_start: int, prev_huf,
                  repeat_tables, rep_offsets: list[int]):
    """Decode one compressed block into ``out`` → the Huffman table to
    carry forward. Sequence execution per §3.1.1.4 with the 3-slot
    repeat-offset ring (persisting across blocks within the frame)."""
    lits, p, prev_huf = _decode_literals(b, prev_huf)
    if p >= len(b):
        raise ValueError("torn zstd sequences section")
    b0 = b[p]
    p += 1
    if b0 == 0:
        nseq = 0
    elif b0 < 128:
        nseq = b0
    elif b0 < 255:
        if p >= len(b):
            raise ValueError("torn zstd sequence count")
        nseq = ((b0 - 128) << 8) | b[p]
        p += 1
    else:
        if p + 2 > len(b):
            raise ValueError("torn zstd sequence count")
        nseq = (b[p] | (b[p + 1] << 8)) + 0x7F00
        p += 2
    if nseq == 0:
        if p != len(b):
            raise ValueError("zstd literals-only block has trailing bytes")
        out += lits
        return prev_huf
    if p >= len(b):
        raise ValueError("torn zstd sequence modes")
    modes = b[p]
    p += 1
    if modes & 3:
        raise ValueError("zstd reserved sequence-mode bits set")
    ll_t, p = _seq_table(b, p, (modes >> 6) & 3, "ll", repeat_tables)
    of_t, p = _seq_table(b, p, (modes >> 4) & 3, "of", repeat_tables)
    ml_t, p = _seq_table(b, p, (modes >> 2) & 3, "ml", repeat_tables)
    bits = _BackBits(b[p:])
    ll_state = bits.read(ll_t.al)
    of_state = bits.read(of_t.al)
    ml_state = bits.read(ml_t.al)
    if bits.pos < 0:
        raise ValueError("zstd sequence bitstream shorter than its states")
    lit_pos = 0
    R = rep_offsets
    for i in range(nseq):
        of_code = of_t.sym[of_state]
        offset_value = (1 << of_code) + bits.read(of_code)
        ml_code = ml_t.sym[ml_state]
        ml = _ML_BASE[ml_code] + bits.read(_ML_BITS[ml_code])
        ll_code = ll_t.sym[ll_state]
        ll = _LL_BASE[ll_code] + bits.read(_LL_BITS[ll_code])
        if bits.pos < 0:
            raise ValueError("zstd sequence bitstream overdrawn")
        if offset_value > 3:
            off = offset_value - 3
            R[2] = R[1]
            R[1] = R[0]
            R[0] = off
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                off = R[0]
            elif idx == 1:
                off = R[1]
                R[1] = R[0]
                R[0] = off
            elif idx == 2:
                off = R[2]
                R[2] = R[1]
                R[1] = R[0]
                R[0] = off
            else:
                off = R[0] - 1
                if off == 0:
                    raise ValueError("zstd repeat offset underflow")
                R[2] = R[1]
                R[1] = R[0]
                R[0] = off
        if ll:
            if lit_pos + ll > len(lits):
                raise ValueError("zstd sequence overruns its literals")
            out += lits[lit_pos : lit_pos + ll]
            lit_pos += ll
        if off > len(out) - frame_start:
            raise ValueError("zstd match offset outside the frame window")
        while ml > 0:
            take = ml if ml < off else off
            src = len(out) - off
            out += out[src : src + take]
            ml -= take
        if i + 1 < nseq:
            ll_state = ll_t.base[ll_state] + bits.read(ll_t.nb[ll_state])
            ml_state = ml_t.base[ml_state] + bits.read(ml_t.nb[ml_state])
            of_state = of_t.base[of_state] + bits.read(of_t.nb[of_state])
            if bits.pos < 0:
                raise ValueError("zstd sequence state update overdrawn")
    if bits.pos != 0:
        raise ValueError("zstd sequence bitstream not fully consumed")
    out += lits[lit_pos:]
    return prev_huf


# --- dictionaries (§5) ----------------------------------------------------------

_DICT_MAGIC = 0xEC30A437


def parse_zstd_dictionary(dictionary: bytes) -> dict:
    """Parse an RFC 8878 §5 dictionary (magic 0xEC30A437, dictionary
    ID, entropy tables — Huffman literals + FSE Offsets/MatchLengths/
    LiteralsLengths — three repeat offsets, content) or treat any
    other payload as a raw-content prefix dictionary."""
    if len(dictionary) >= 8 and struct.unpack_from(
        "<I", dictionary, 0
    )[0] == _DICT_MAGIC:
        dict_id = struct.unpack_from("<I", dictionary, 4)[0]
        p = 8
        huf, q = _huf_read_table(dictionary[p:])
        p += q
        tables: dict[str, _FseTable] = {}
        for kind in ("of", "ml", "ll"):
            freqs, al, q = _fse_distribution(dictionary[p:], _MAX_AL[kind])
            if len(freqs) - 1 > _MAX_SYM[kind]:
                raise ValueError(
                    f"zstd dictionary {kind} table symbol out of range"
                )
            tables[kind] = _fse_build(freqs, al)
            p += q
        if p + 12 > len(dictionary):
            raise ValueError("torn zstd dictionary repeat offsets")
        reps = list(struct.unpack_from("<III", dictionary, p))
        p += 12
        content = dictionary[p:]
        if any(r == 0 or r > len(content) + 1 for r in reps):
            raise ValueError("zstd dictionary repeat offset out of range")
        return {
            "dict_id": dict_id,
            "content": content,
            "huf": huf,
            "tables": tables,
            "reps": reps,
        }
    return {
        "dict_id": 0,
        "content": dictionary,
        "huf": None,
        "tables": {},
        "reps": [1, 4, 8],
    }


# --- frames (§3.1.1) ----------------------------------------------------------


def _decode_frame(data: bytes, off: int, out: bytearray,
                  max_output: int, zdict: dict | None = None) -> int:
    if off >= len(data):
        raise ValueError("torn zstd frame header")
    fhd = data[off]
    off += 1
    if fhd & 0x08:
        raise ValueError("zstd frame header reserved bit set")
    fcs_flag = fhd >> 6
    single = (fhd >> 5) & 1
    checksum_flag = (fhd >> 2) & 1
    did_flag = fhd & 3
    window_size = None
    if not single:
        if off >= len(data):
            raise ValueError("torn zstd window descriptor")
        wd = data[off]
        off += 1
        wbase = 1 << (10 + (wd >> 3))
        window_size = wbase + (wbase // 8) * (wd & 7)
    did_size = (0, 1, 2, 4)[did_flag]
    if did_size:
        if off + did_size > len(data):
            raise ValueError("torn zstd dictionary ID")
        did = int.from_bytes(data[off : off + did_size], "little")
        off += did_size
        if did != 0:
            if zdict is None:
                raise ValueError(
                    f"zstd frame needs dictionary {did} and none was "
                    "supplied"
                )
            if zdict["dict_id"] not in (0, did):
                raise ValueError(
                    f"zstd frame needs dictionary {did}, supplied "
                    f"dictionary is {zdict['dict_id']}"
                )
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_flag]
    fcs = None
    if fcs_size:
        if off + fcs_size > len(data):
            raise ValueError("torn zstd frame content size")
        fcs = int.from_bytes(data[off : off + fcs_size], "little")
        off += fcs_size
        if fcs_size == 2:
            fcs += 256
    if single:
        window_size = fcs
    # the frame decodes into a local buffer seeded with the dictionary
    # content so match offsets reach the prefix naturally (§5: the
    # content acts as the initial window); entropy state seeds from the
    # dictionary's tables (treeless/repeat modes in the FIRST block).
    use_dict = zdict is not None
    prefix_len = len(zdict["content"]) if use_dict else 0
    local = bytearray(zdict["content"]) if use_dict else out
    frame_start = prefix_len if use_dict else len(out)
    prev_huf = zdict["huf"] if use_dict else None
    repeat_tables = dict(zdict["tables"]) if use_dict else {}
    rep_offsets = list(zdict["reps"]) if use_dict else [1, 4, 8]
    while True:
        if off + 3 > len(data):
            raise ValueError("torn zstd block header")
        bh = data[off] | (data[off + 1] << 8) | (data[off + 2] << 16)
        off += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:
            if bsize > _BLOCK_MAX:
                raise ValueError("zstd raw block exceeds the block cap")
            if off + bsize > len(data):
                raise ValueError("torn zstd raw block")
            local += data[off : off + bsize]
            off += bsize
        elif btype == 1:
            if off >= len(data):
                raise ValueError("torn zstd RLE block")
            if bsize > _BLOCK_MAX:
                raise ValueError("zstd RLE block exceeds the block cap")
            local += data[off : off + 1] * bsize
            off += 1
        elif btype == 2:
            if off + bsize > len(data):
                raise ValueError("torn zstd compressed block")
            before = len(local)
            prev_huf = _decode_block(
                data[off : off + bsize], local,
                0 if use_dict else frame_start, prev_huf,
                repeat_tables, rep_offsets,
            )
            if len(local) - before > _BLOCK_MAX:
                raise ValueError("zstd block decodes past the block cap")
            off += bsize
        else:
            raise ValueError("zstd reserved block type")
        if len(local) - frame_start > max_output:
            raise ValueError("zstd output exceeds the configured cap")
        if last:
            break
    if fcs is not None and len(local) - frame_start != fcs:
        raise ValueError(
            f"zstd frame decoded {len(local) - frame_start} bytes, header "
            f"promised {fcs}"
        )
    if checksum_flag:
        if off + 4 > len(data):
            raise ValueError("torn zstd content checksum")
        (stored,) = struct.unpack_from("<I", data, off)
        off += 4
        if xxhash64(bytes(local[frame_start:])) & 0xFFFFFFFF != stored:
            raise ValueError("zstd content checksum mismatch")
    if use_dict:
        out += local[prefix_len:]
    return off


def zstd_decompress(payload: bytes, max_output: int = 1 << 31,
                    dictionary: bytes | None = None) -> bytes:
    """Decode a complete Zstandard payload: one or more concatenated
    frames, skippable frames passed over (§3.1.2). ``dictionary``
    accepts both RFC 8878 §5 structured dictionaries (ZDICT output)
    and raw content prefixes. ValueError — and only ValueError — on
    torn/corrupt/out-of-scope input."""
    zdict = parse_zstd_dictionary(dictionary) if dictionary is not None \
        else None
    out = bytearray()
    off = 0
    if not payload:
        raise ValueError("empty zstd payload")
    while off < len(payload):
        if off + 4 > len(payload):
            raise ValueError("torn zstd frame magic")
        (magic,) = struct.unpack_from("<I", payload, off)
        if (magic & 0xFFFFFFF0) == _SKIP_MAGIC_BASE:
            if off + 8 > len(payload):
                raise ValueError("torn zstd skippable frame")
            (size,) = struct.unpack_from("<I", payload, off + 4)
            if off + 8 + size > len(payload):
                raise ValueError("torn zstd skippable frame body")
            off += 8 + size
            continue
        if magic != _MAGIC:
            raise ValueError(f"bad zstd magic 0x{magic:08X}")
        off = _decode_frame(payload, off + 4, out, max_output, zdict)
    return bytes(out)


def probe_zstd(payload: bytes) -> dict:
    """Frame-header probe (no decode): per frame the header facts —
    window size, content size when present, checksum/dictionary
    flags. The archive router's cheap sniff."""
    frames = []
    off = 0
    while off + 4 <= len(payload):
        (magic,) = struct.unpack_from("<I", payload, off)
        if (magic & 0xFFFFFFF0) == _SKIP_MAGIC_BASE:
            if off + 8 > len(payload):
                break
            (size,) = struct.unpack_from("<I", payload, off + 4)
            frames.append({"kind": "skippable", "size": size})
            off += 8 + size
            continue
        if magic != _MAGIC:
            break
        p = off + 4
        if p >= len(payload):
            raise ValueError("torn zstd frame header")
        fhd = payload[p]
        p += 1
        single = (fhd >> 5) & 1
        window_size = None
        if not single:
            if p >= len(payload):
                raise ValueError("torn zstd frame header")
            wd = payload[p]
            p += 1
            wbase = 1 << (10 + (wd >> 3))
            window_size = wbase + (wbase // 8) * (wd & 7)
        did_size = (0, 1, 2, 4)[fhd & 3]
        if p + did_size > len(payload):
            raise ValueError("torn zstd frame header")
        did = int.from_bytes(payload[p : p + did_size], "little") if (
            did_size
        ) else 0
        p += did_size
        fcs_size = (1 if single else 0, 2, 4, 8)[fhd >> 6]
        fcs = None
        if fcs_size:
            if p + fcs_size > len(payload):
                raise ValueError("torn zstd frame header")
            fcs = int.from_bytes(payload[p : p + fcs_size], "little")
            if fcs_size == 2:
                fcs += 256
        frames.append({
            "kind": "zstd",
            "window_size": fcs if single else window_size,
            "content_size": fcs,
            "has_checksum": bool((fhd >> 2) & 1),
            "dictionary_id": did,
        })
        break  # sizes of compressed bodies need a walk; one frame is enough
    if not frames:
        raise ValueError("not a zstd payload")
    return {"n_frames": len(frames), "frames": frames}


# --- store-mode / fixture encoders --------------------------------------------


def _code_for(value: int, bases: list[int], extras: list[int],
              lo: int) -> int:
    """Largest code whose baseline ≤ value with value in its extra-bit
    range (bases are ascending)."""
    for c in range(len(bases) - 1, lo - 1, -1):
        if bases[c] <= value < bases[c] + (1 << extras[c]):
            return c
    raise ValueError(f"no code for value {value}")


class _BackBitsW:
    """Writer twin of _BackBits: first value pushed is the first value
    the backward reader reads."""

    __slots__ = ("acc", "nbits")

    def __init__(self):
        self.acc = 0
        self.nbits = 0

    def push(self, value: int, n: int) -> None:
        if n == 0:
            return
        if value >> n:
            raise ValueError("fixture bit value out of range")
        self.acc = (self.acc << n) | value
        self.nbits += n

    def tobytes(self) -> bytes:
        v = (1 << self.nbits) | self.acc  # sentinel bit on top
        return v.to_bytes((self.nbits + 8) // 8, "little")


def zstd_compress_fixture(data: bytes, mode: str = "store") -> bytes:
    """Valid-but-simple Zstandard frames for the corpus path (the
    brotli_compress_fixture convention — libzstd-independent streams
    the REAL library accepts, pinned in tests/test_zstd.py):

    - ``store`` — raw/RLE blocks only (zstd_compress_store).
    - ``lz`` — a greedy matcher emitting COMPRESSED blocks: raw
      literals + one sequence per block through RLE-mode LL/OF/ML
      tables, exercising the sequences section, the repeat-offset
      update rule, and overlap match copies end-to-end.
    """
    if mode == "store":
        return zstd_compress_store(data, checksum=True)
    if mode != "lz":
        raise ValueError(f"zstd fixture mode {mode!r} out of range")
    n = len(data)
    out = bytearray()
    out += struct.pack("<I", _MAGIC)
    if n <= 255:
        fcs_flag, fcs_bytes = 0, struct.pack("<B", n)
    elif n - 256 <= 0xFFFF:
        fcs_flag, fcs_bytes = 1, struct.pack("<H", n - 256)
    else:
        fcs_flag, fcs_bytes = 2, struct.pack("<I", n)
    out.append((fcs_flag << 6) | (1 << 5) | (1 << 2))  # single-segment+ck
    out += fcs_bytes
    # greedy 8-gram matcher, one sequence per compressed block
    grams: dict[bytes, int] = {}
    blocks: list[tuple[bytes, tuple[int, int, int] | None]] = []
    pos = 0
    lit_start = 0
    while pos + 8 <= n:
        g = data[pos : pos + 8]
        prev = grams.get(g)
        grams[g] = pos
        ll = pos - lit_start
        if prev is not None and ll < 4000:
            ml = 8
            while (
                pos + ml < n
                and ml < 1000
                and data[prev + ml] == data[pos + ml]
            ):
                ml += 1
            blocks.append((data[lit_start:pos], (ll, pos - prev, ml)))
            pos += ml
            lit_start = pos
        else:
            pos += 1
    tail = data[lit_start:]
    body_blocks: list[bytes] = []
    for lits, seq in blocks:
        ll, off, ml = seq
        b = bytearray()
        # literals header: raw, size_format 01 (2 bytes, 12-bit size)
        b.append((0) | (1 << 2) | ((len(lits) & 0xF) << 4))
        b.append(len(lits) >> 4)
        b += lits
        b.append(1)  # one sequence
        b.append((1 << 6) | (1 << 4) | (1 << 2))  # RLE LL/OF/ML tables
        ll_code = _code_for(ll, _LL_BASE, _LL_BITS, 0)
        of_code = (off + 3).bit_length() - 1  # offset_value = off + 3
        ml_code = _code_for(ml, _ML_BASE, _ML_BITS, 0)
        b.append(ll_code)
        b.append(of_code)
        b.append(ml_code)
        w = _BackBitsW()
        # states: AL=0 → no init bits; extras in read order OF, ML, LL
        w.push((off + 3) - (1 << of_code), of_code)
        w.push(ml - _ML_BASE[ml_code], _ML_BITS[ml_code])
        w.push(ll - _LL_BASE[ll_code], _LL_BITS[ll_code])
        b += w.tobytes()
        body_blocks.append(bytes(b))
    if tail or not body_blocks:
        body_blocks.append(None)  # raw tail marker
    for i, blk in enumerate(body_blocks):
        last = 1 if i == len(body_blocks) - 1 else 0
        if blk is None:
            out += struct.pack("<I", (len(tail) << 3) | last)[:3]
            out += tail
        else:
            out += struct.pack("<I", (len(blk) << 3) | (2 << 1) | last)[:3]
            out += blk
    out += struct.pack("<I", xxhash64(data) & 0xFFFFFFFF)
    return bytes(out)


# --- store-mode encoder -------------------------------------------------------


def zstd_compress_store(data: bytes, checksum: bool = True) -> bytes:
    """Emit a valid single-segment Zstandard frame from raw (and RLE,
    when a block is uniform) blocks — the fixture-encoder convention:
    correct output the reference library accepts, not ratio-chasing.
    Frame content size is always written; checksum optional."""
    n = len(data)
    out = bytearray()
    out += struct.pack("<I", _MAGIC)
    if n <= 255:
        fcs_flag, fcs_bytes = 0, struct.pack("<B", n)
    elif n - 256 <= 0xFFFF:
        fcs_flag, fcs_bytes = 1, struct.pack("<H", n - 256)
    elif n <= 0xFFFFFFFF:
        fcs_flag, fcs_bytes = 2, struct.pack("<I", n)
    else:
        fcs_flag, fcs_bytes = 3, struct.pack("<Q", n)
    fhd = (fcs_flag << 6) | (1 << 5) | ((1 if checksum else 0) << 2)
    out.append(fhd)
    out += fcs_bytes
    pos = 0
    while True:
        chunk = data[pos : pos + _BLOCK_MAX]
        pos += len(chunk)
        last = 1 if pos >= n else 0
        if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
            bh = (len(chunk) << 3) | (1 << 1) | last
            out += struct.pack("<I", bh)[:3]
            out.append(chunk[0])
        else:
            bh = (len(chunk) << 3) | last
            out += struct.pack("<I", bh)[:3]
            out += chunk
        if last:
            break
    if checksum:
        out += struct.pack("<I", xxhash64(data) & 0xFFFFFFFF)
    return bytes(out)
