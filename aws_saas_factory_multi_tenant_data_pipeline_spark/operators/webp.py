"""From-spec WebP VP8L (lossless) decoder + spec-literal fixture encoder.

The last real-crawl image format without a decoder (r9 verdict "Next
round" #2). Pure stdlib+numpy, written from the PUBLIC specifications:

- WebP Lossless Bitstream Specification (Google; now RFC 9649) — VP8L
  signature/header, LSB-first bit packing, canonical prefix codes
  (simple and normal forms, code-length-code with repeat tokens
  16/17/18 and the optional max-symbol budget), color cache
  (0x1e35a7bd multiplicative hash), LZ77 backward references with
  prefix-coded lengths/distances, meta prefix (entropy image) groups,
  and the four transforms (predictor, color, subtract-green,
  color-indexing incl. sub-8-bit pixel bundling).
- WebP Container Specification (RIFF layout: 'WEBP' form, VP8L/VP8/
  VP8X chunks).

Reference parity: the media ingestion surface of the reference repo
(README.md:1-109) — decoded rows flow through the same aHash/pHash
dedup and feature machinery as PNG/GIF/QOI/TIFF/TGA via the codec
registry (operators/multimodal.py).

Boundary status after r11 (both r10 declared boundaries CLOSED):

- ``SHORT_DISTANCE_MAP``: LZ77 distance codes 1..120 map through a
  120-entry 2D neighborhood table. r10 shipped it as an injectable
  None (a mis-remembered entry order would silently corrupt pixels);
  r11 derives it from the spec's generation rule (see
  ``_short_distance_map``) and pins it against a REAL third-party
  stream — CPython's python.webp carries a VP8L-coded ALPH alpha
  plane that uses these codes and now decodes BIT-EXACTLY equal to
  the system libwebp's output (tests/test_realworld_r11.py). The
  seam stays injectable: set it to None to restore the named error.
- ``VP8 (lossy)`` key frames decode from spec via operators/vp8.py
  (RFC 6386, r11) — python.webp decodes end-to-end, pixel-identical
  to libwebp. Inter frames remain that module's declared boundary.

Documented transcription notes (the VP8L fixture surface is oracle-
pinned; the real-world file pins the container walk, the ALPH path,
and the short-distance map):

- Select (predictor mode 11) returns LEFT on a Manhattan-distance tie
  (``pL <= pT``, the libwebp/RFC-amended behavior); the module constant
  ``SELECT_TIE_TO_LEFT`` documents the single-bit ambiguity between
  spec revisions and is the swap seam if an interop file ever
  disagrees.
- ColorTransformElement channel packing: green_to_red in the BLUE
  channel, green_to_blue in GREEN, red_to_blue in RED (the spec's
  little-endian ARGB bit layout 0..7/8..15/16..23).
- The top-right neighbor of a rightmost-column pixel is the leftmost,
  already-reconstructed pixel of the SAME row (the contiguous-memory
  convention the spec's row-major layout implies).
"""

from __future__ import annotations

import struct

import numpy as np

def _short_distance_map() -> list[tuple[int, int]]:
    """The spec's 120-entry short-distance 2D neighborhood map,
    GENERATED rather than transcribed (closing the r10 declared
    boundary): every (dx, dy) with dy in 0..7, dx in -7..8 and
    (dy, dx) lexicographically after (0, 0), sorted by squared
    Euclidean distance with ties broken larger-dy-first then
    positive-dx-first — exactly 120 offsets. The rule is pinned
    against a REAL third-party stream in tests/test_realworld_r11.py
    (CPython's python.webp ALPH alpha plane uses these codes and must
    match the PNG twin's alpha channel losslessly)."""
    cands = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x > 0
    ]
    cands.sort(key=lambda t: (t[0] * t[0] + t[1] * t[1], -t[1], t[0] < 0))
    return cands


#: Injectable seam for the spec's 120-entry short-distance map
#: (list of (dx, dy) pairs) — r10 shipped None (declared boundary);
#: r11 defaults it to the generated spec rule, real-file-pinned.
SHORT_DISTANCE_MAP: list[tuple[int, int]] | None = _short_distance_map()

#: Select (predictor 11) tie behavior: True → LEFT wins a tie.
SELECT_TIE_TO_LEFT = True

#: Code-length-code symbol order (spec: kCodeLengthCodeOrder).
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_COLOR_INDEXING = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# bit I/O — VP8L packs LSB-first within each byte; prefix-code bits are
# consumed one at a time building the code from its MSB.


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("torn VP8L stream: bit read past end")
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go out MSB-first (the read order)."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes (the DEFLATE rule: shorter codes first, ties by
# symbol; code bits read MSB-first)


class _PrefixCode:
    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L prefix code with no symbols")
        if len(nz) == 1:
            # single-symbol code: decoded with zero bits
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        max_len = max(ln for ln, _ in nz)
        bl_count = [0] * (max_len + 1)
        for ln, _ in nz:
            bl_count[ln] += 1
        # Kraft completeness: an over-subscribed or incomplete code is a
        # corrupt stream, not a decodable one
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        total = sum(bl_count[ln] << (max_len - ln) for ln in range(1, max_len + 1))
        if total != 1 << max_len:
            raise ValueError("VP8L prefix code is not complete")
        table: dict[tuple[int, int], int] = {}
        for ln, sym in sorted(nz):
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        self.table = table

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("VP8L prefix code longer than 15 bits")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder (same canonical rule)."""
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    if len(nz) == 1:
        return {nz[0][1]: (0, 0)}
    max_len = nz[-1][0]
    bl_count = [0] * (max_len + 1)
    for ln, _ in nz:
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for ln, sym in nz:
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _limited_huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Length-limited Huffman code lengths via package-merge (exact)."""
    syms = sorted(freqs)
    if not syms:
        raise ValueError("empty histogram")
    if len(syms) == 1:
        return {syms[0]: 1}
    if len(syms) > (1 << max_len):
        raise ValueError("alphabet too large for length limit")
    # package-merge (Larmore–Hirschberg): list_1 = singletons, then
    # L-1 package+merge rounds; symbol lengths = occurrence counts in
    # the first 2n-2 coins of list_L. Exactly L-1 packaging rounds —
    # one more yields length-(L+1) codes (still Kraft-complete, so only
    # a direct max-length check catches it; pinned in tests).
    lengths = {s: 0 for s in syms}
    pkgs = []
    for _ in range(max_len - 1):
        coins = [(freqs[s], {s: 1}) for s in syms] + pkgs
        coins.sort(key=lambda c: c[0])
        pkgs = []
        for i in range(0, len(coins) - 1, 2):
            w = coins[i][0] + coins[i + 1][0]
            m: dict[int, int] = {}
            for _, d in (coins[i], coins[i + 1]):
                for s, c in d.items():
                    m[s] = m.get(s, 0) + c
            pkgs.append((w, m))
    coins = [(freqs[s], {s: 1}) for s in syms] + pkgs
    coins.sort(key=lambda c: c[0])
    for _, d in coins[: 2 * (len(syms) - 1)]:
        for s, c in d.items():
            lengths[s] += c
    return lengths


# ---------------------------------------------------------------------------
# LZ77 prefix-coded integers


def _prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits, extra_value); inverse of
    :func:`_prefix_value`."""
    if v < 1:
        raise ValueError("prefix-coded values start at 1")
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    eb = x.bit_length() - 2
    b = (x >> eb) - 2
    return 2 * eb + 2 + b, eb, x & ((1 << eb) - 1)


# ---------------------------------------------------------------------------
# prefix-code (group) reading


def _read_code_lengths(br: _BitReader, alphabet_size: int) -> list[int]:
    num_codes = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _PrefixCode(clc_lengths)
    if br.read(1):  # explicit token budget
        length_nbits = 2 + 2 * br.read(3)
        max_tokens = 2 + br.read(length_nbits)
    else:
        max_tokens = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_tokens <= 0:
            break
        max_tokens -= 1
        t = clc.decode(br)
        if t < 16:
            lengths[sym] = t
            sym += 1
            if t:
                prev = t
        elif t == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overruns alphabet")
                lengths[sym] = prev
                sym += 1
        elif t == 17:
            sym += 3 + br.read(3)
        else:  # 18
            sym += 11 + br.read(7)
        if sym > alphabet_size:
            raise ValueError("VP8L code-length repeat overruns alphabet")
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        syms = [s0]
        if num_symbols == 2:
            syms.append(br.read(8))
        for s in syms:
            if s >= alphabet_size:
                raise ValueError("VP8L simple-code symbol outside alphabet")
        pc = _PrefixCode.__new__(_PrefixCode)
        if num_symbols == 1:
            pc.single = syms[0]
            pc.table = None
            return pc
        if syms[0] == syms[1]:
            raise ValueError("VP8L simple code with duplicate symbols")
        # simple codes assign bit 0/1 in READ order (not canonical order)
        pc.single = None
        pc.table = {(1, 0): syms[0], (1, 1): syms[1]}
        return pc
    return _PrefixCode(_read_code_lengths(br, alphabet_size))


# ---------------------------------------------------------------------------
# entropy-coded image (shared by the main image and every sub-image)


def _cache_hash(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """Decode a w×h ARGB pixel list (row-major uint32)."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L color-cache bits out of range")
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_entropy_image(br, mw, mh, allow_meta=False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]  # (red<<8)|green
        n_groups = max(meta) + 1
        meta_w = mw
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    cache = [0] * cache_size
    total = w * h
    out = [0] * total
    pos = 0

    def emit(argb: int) -> None:
        nonlocal pos
        out[pos] = argb
        pos += 1
        if cache_bits:
            cache[_cache_hash(argb, cache_bits)] = argb

    while pos < total:
        if meta is not None:
            x = pos % w
            y = pos // w
            g = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            if g >= n_groups:
                raise ValueError("VP8L meta prefix index out of range")
        else:
            g = 0
        green_c, red_c, blue_c, alpha_c, dist_c = groups[g]
        s = green_c.decode(br)
        if s < 256:
            r = red_c.decode(br)
            b = blue_c.decode(br)
            a = alpha_c.decode(br)
            emit((a << 24) | (r << 16) | (s << 8) | b)
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(dist_c.decode(br), br)
            if dist_code <= 120:
                if SHORT_DISTANCE_MAP is None:
                    raise ValueError(
                        "VP8L short-distance code (<=120): the 2D neighborhood "
                        "map is a declared injectable boundary — set "
                        "operators.webp.SHORT_DISTANCE_MAP to enable"
                    )
                dx, dy = SHORT_DISTANCE_MAP[dist_code - 1]
                d = dy * w + dx
                dist = d if d >= 1 else 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                emit(out[pos - dist])
        else:
            if not cache_bits:
                raise ValueError("VP8L cache reference without a color cache")
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L cache index out of range")
            emit(cache[idx])
    return out


# ---------------------------------------------------------------------------
# inverse transforms


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _channels(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2_px(p: int, q: int) -> int:
    pa, pr, pg, pb = _channels(p)
    qa, qr, qg, qb = _channels(q)
    return _pack(_avg2(pa, qa), _avg2(pr, qr), _avg2(pg, qg), _avg2(pb, qb))


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode: int, left: int, top: int, top_left: int, top_right: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return top_right
    if mode == 4:
        return top_left
    if mode == 5:
        return _avg2_px(_avg2_px(left, top_right), top)
    if mode == 6:
        return _avg2_px(left, top_left)
    if mode == 7:
        return _avg2_px(left, top)
    if mode == 8:
        return _avg2_px(top_left, top)
    if mode == 9:
        return _avg2_px(top, top_right)
    if mode == 10:
        return _avg2_px(_avg2_px(left, top_left), _avg2_px(top, top_right))
    if mode == 11:  # Select
        lc = _channels(left)
        tc = _channels(top)
        tlc = _channels(top_left)
        p = [lc[i] + tc[i] - tlc[i] for i in range(4)]
        p_l = sum(abs(p[i] - lc[i]) for i in range(4))
        p_t = sum(abs(p[i] - tc[i]) for i in range(4))
        if SELECT_TIE_TO_LEFT:
            return left if p_l <= p_t else top
        return left if p_l < p_t else top
    if mode == 12:  # ClampAddSubtractFull
        lc = _channels(left)
        tc = _channels(top)
        tlc = _channels(top_left)
        return _pack(*[_clamp(lc[i] + tc[i] - tlc[i]) for i in range(4)])
    if mode == 13:  # ClampAddSubtractHalf
        av = _channels(_avg2_px(left, top))
        tlc = _channels(top_left)
        out = []
        for i in range(4):
            d = av[i] - tlc[i]
            # C-style truncation toward zero (the spec's integer /2)
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(_clamp(av[i] + half))
        return _pack(*out)
    raise ValueError(f"VP8L predictor mode {mode} out of range")


def _add_px(pred: int, residual: int) -> int:
    pa, pr, pg, pb = _channels(pred)
    ra, rr, rg, rb = _channels(residual)
    return _pack((pa + ra) & 0xFF, (pr + rr) & 0xFF, (pg + rg) & 0xFF, (pb + rb) & 0xFF)


def _sub_px(px: int, pred: int) -> int:
    pa, pr, pg, pb = _channels(pred)
    xa, xr, xg, xb = _channels(px)
    return _pack((xa - pa) & 0xFF, (xr - pr) & 0xFF, (xg - pg) & 0xFF, (xb - pb) & 0xFF)


def _inv_predictor(px: list[int], w: int, h: int, bits: int, modes: list[int], mw: int) -> None:
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]  # left
            elif x == 0:
                pred = px[i - w]  # top
            else:
                mode = modes[(y >> bits) * mw + (x >> bits)]
                left = px[i - 1]
                top = px[i - w]
                top_left = px[i - w - 1]
                # rightmost column: TR wraps to the leftmost pixel of the
                # current row (contiguous row-major memory)
                top_right = px[i - w + 1]
                pred = _predict(mode, left, top, top_left, top_right)
            px[i] = _add_px(pred, px[i])


def _ct_delta(t: int, c: int) -> int:
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, bits: int, elems: list[int], mw: int) -> None:
    for y in range(h):
        for x in range(w):
            i = y * w + x
            e = elems[(y >> bits) * mw + (x >> bits)]
            g2r = e & 0xFF  # blue channel
            g2b = (e >> 8) & 0xFF  # green channel
            r2b = (e >> 16) & 0xFF  # red channel
            a, r, g, b = _channels(px[i])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            px[i] = _pack(a, r, g, b)


def _inv_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        a, r, g, b = _channels(p)
        px[i] = _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inv_color_indexing(
    px: list[int], packed_w: int, w: int, h: int, palette: list[int], wb: int
) -> list[int]:
    n = len(palette)
    per = 1 << wb
    bits = 8 >> wb
    mask = (1 << bits) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            packed = px[y * packed_w + (x >> wb)]
            idx = ((packed >> 8) & 0xFF) >> ((x % per) * bits) & mask
            if idx >= n:
                raise ValueError("VP8L palette index out of range")
            out[y * w + x] = palette[idx]
    return out


# ---------------------------------------------------------------------------
# top-level decode


def decode_vp8l(data: bytes):
    """Decode a VP8L chunk payload to (argb uint8 [h, w, 4], w, h)."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L stream (bad signature)")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    return _decode_vp8l_body(br, w, h), w, h


def decode_vp8l_raw(data: bytes, w: int, h: int):
    """Decode a HEADERLESS VP8L spatial stream (no signature, no
    dimensions — the WebP container's ALPH compression method 1, where
    width/height come from the container). Returns argb [h, w, 4]."""
    return _decode_vp8l_body(_BitReader(data), w, h)


def _decode_vp8l_body(br: "_BitReader", w: int, h: int):
    xsize = w
    transforms = []
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(ttype)
        if ttype in (_T_PREDICTOR, _T_COLOR):
            bits = br.read(3) + 2
            mw = (xsize + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _decode_entropy_image(br, mw, mh, allow_meta=False)
            transforms.append((ttype, bits, sub, mw))
        elif ttype == _T_SUBTRACT_GREEN:
            transforms.append((ttype,))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, allow_meta=False)
            # palette entries are componentwise deltas off the previous
            acc = 0
            palette = []
            for p in pal:
                acc = _add_px(acc, p)
                palette.append(acc)
            wb = _width_bits(n_colors)
            packed_w = (xsize + (1 << wb) - 1) >> wb
            transforms.append((ttype, wb, palette, xsize))
            xsize = packed_w
    px = _decode_entropy_image(br, xsize, h, allow_meta=True)
    for tr in reversed(transforms):
        if tr[0] == _T_PREDICTOR:
            _inv_predictor(px, xsize, h, tr[1], [(p >> 8) & 0xFF for p in tr[2]], tr[3])
        elif tr[0] == _T_COLOR:
            _inv_color_transform(px, xsize, h, tr[1], tr[2], tr[3])
        elif tr[0] == _T_SUBTRACT_GREEN:
            _inv_subtract_green(px)
        else:
            packed_w, wb, palette, orig_w = xsize, tr[1], tr[2], tr[3]
            px = _inv_color_indexing(px, packed_w, orig_w, h, palette, wb)
            xsize = orig_w
    if xsize != w:
        raise ValueError("VP8L transform width bookkeeping failed")
    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 24) & 0xFF
    out[..., 1] = (arr >> 16) & 0xFF
    out[..., 2] = (arr >> 8) & 0xFF
    out[..., 3] = arr & 0xFF
    return out


def decode_webp_rgba(payload: bytes):
    """Decode a WebP container to (uint8 rgba [h, w, 4], w, h).

    VP8L (lossless) decodes from spec (RFC 9649); lossy VP8 KEY frames
    decode from spec (RFC 6386, operators/vp8.py, new in r11); a VP8X
    extended container is walked for the image chunk plus an optional
    ALPH lossless alpha plane."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    off = 12
    n = len(payload)
    saw = []
    alph_body = None
    while off + 8 <= n:
        cid = payload[off : off + 4]
        (sz,) = struct.unpack("<I", payload[off + 4 : off + 8])
        body = payload[off + 8 : off + 8 + sz]
        if len(body) < sz:
            raise ValueError(f"torn WebP chunk {cid!r}")
        if cid == b"ALPH":
            alph_body = body
        elif cid == b"VP8L":
            argb = decode_vp8l(body)[0]
            rgba = np.concatenate(
                [argb[..., 1:4], argb[..., 0:1]], axis=-1
            ).copy()
            return rgba, argb.shape[1], argb.shape[0]
        elif cid == b"VP8 ":
            from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.vp8 import (
                decode_alpha,
                decode_vp8,
            )

            rgb, w, h = decode_vp8(body)
            if alph_body is not None:
                alpha = decode_alpha(alph_body, w, h)
            else:
                alpha = np.full((h, w), 255, dtype=np.uint8)
            rgba = np.concatenate([rgb, alpha[..., None]], axis=-1)
            return rgba, w, h
        saw.append(cid.decode("ascii", "replace").strip())
        off += 8 + sz + (sz & 1)
    raise ValueError(f"WebP container without an image chunk (saw {saw})")


def decode_webp(payload: bytes):
    """Decode a WebP container to (uint8 rgb [h, w, 3], w, h)."""
    rgba, w, h = decode_webp_rgba(payload)
    return rgba[..., :3].copy(), w, h


# ---------------------------------------------------------------------------
# fixture encoder (spec-literal; literals + optional subtract-green,
# color cache, row-copy LZ77 with LINEAR distance codes, and palette
# bundling — each flag exercises the corresponding decoder path)


def _emit_prefix_code(bw: _BitWriter, lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Write one prefix code (simple when <=2 symbols else normal with
    repeat-17/18 zero runs) and return the symbol->(code,len) table."""
    nz = [s for s, ln in enumerate(lengths) if ln > 0]
    if 0 < len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        s0 = nz[0]
        if s0 > 1:
            bw.write(1, 1)
            bw.write(s0, 8)
        else:
            bw.write(0, 1)
            bw.write(s0, 1)
        if len(nz) == 2:
            bw.write(nz[1], 8)
            return {nz[0]: (0, 1), nz[1]: (1, 1)}
        return {nz[0]: (0, 0)}
    bw.write(0, 1)  # normal
    # tokenize: literal lengths + zero runs via 17 (3-10) / 18 (11-137)
    tokens: list[tuple[int, int]] = []  # (symbol, extra)
    i = 0
    while i < len(lengths):
        if lengths[i] == 0:
            j = i
            while j < len(lengths) and lengths[j] == 0:
                j += 1
            run = j - i
            if j == len(lengths):
                break  # trailing zeros: implicit
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, r - 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0))
            i = j
        else:
            tokens.append((lengths[i], 0))
            i += 1
    while len(tokens) < 2:
        tokens.append((0, 0))  # harmless zero-length pad (alphabets > 2)
    freqs: dict[int, int] = {}
    for t, _ in tokens:
        freqs[t] = freqs.get(t, 0) + 1
    clc_lengths_map = _limited_huffman_lengths(freqs, 7)
    clc_lengths = [0] * 19
    for s, ln in clc_lengths_map.items():
        clc_lengths[s] = ln
    num_codes = max(4, max(i for i in range(19) if clc_lengths[_CLC_ORDER[i]] > 0) + 1)
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(clc_lengths[_CLC_ORDER[i]], 3)
    # ALWAYS emit the explicit token budget: with a single-symbol (0-bit)
    # code-length code the decoder otherwise cannot know where the token
    # stream ends and would fill the whole alphabet
    bw.write(1, 1)
    n3 = 0
    while (2 + 2 * n3) < max(0, len(tokens) - 2).bit_length():
        n3 += 1
    bw.write(n3, 3)
    bw.write(len(tokens) - 2, 2 + 2 * n3)
    clc_codes = _canonical_codes(clc_lengths)
    for t, extra in tokens:
        c, ln = clc_codes[t]
        bw.write_code(c, ln)
        if t == 17:
            bw.write(extra, 3)
        elif t == 18:
            bw.write(extra, 7)
        elif t == 16:
            bw.write(extra, 2)
    return _canonical_codes(lengths)


def _lengths_for(freqs: dict[int, int], alphabet: int) -> list[int]:
    lengths = [0] * alphabet
    for s, ln in _limited_huffman_lengths(freqs, 15).items():
        lengths[s] = ln
    return lengths


def _encode_entropy_stream(
    bw: _BitWriter, symbols: list[tuple], cache_bits: int, is_main: bool = False
) -> None:
    """symbols: list of ('lit', a, r, g, b) | ('copy', length, dist) |
    ('cache', index). Emits cache bit (+ the meta-prefix-absent bit for
    the main image) + a single prefix-code group + data."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if is_main:
        bw.write(0, 1)  # no meta prefix image
    cache_size = (1 << cache_bits) if cache_bits else 0
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}
    for s in symbols:
        if s[0] == "lit":
            _, a, r, g, b = s
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        elif s[0] == "copy":
            lc = _prefix_encode(s[1])[0]
            gf[256 + lc] = gf.get(256 + lc, 0) + 1
            dc = _prefix_encode(s[2] + 120)[0]
            df[dc] = df.get(dc, 0) + 1
        else:
            gf[280 + s[1]] = gf.get(280 + s[1], 0) + 1
    # every code must exist even if unused
    for f in (rf, bf, af):
        if not f:
            f[0] = 1
    if not df:
        df[0] = 1
    gcodes = _emit_prefix_code(bw, _lengths_for(gf, 256 + 24 + cache_size))
    rcodes = _emit_prefix_code(bw, _lengths_for(rf, 256))
    bcodes = _emit_prefix_code(bw, _lengths_for(bf, 256))
    acodes = _emit_prefix_code(bw, _lengths_for(af, 256))
    dcodes = _emit_prefix_code(bw, _lengths_for(df, 40))
    for s in symbols:
        if s[0] == "lit":
            _, a, r, g, b = s
            c, ln = gcodes[g]
            bw.write_code(c, ln)
            c, ln = rcodes[r]
            bw.write_code(c, ln)
            c, ln = bcodes[b]
            bw.write_code(c, ln)
            c, ln = acodes[a]
            bw.write_code(c, ln)
        elif s[0] == "copy":
            lc, eb, ev = _prefix_encode(s[1])
            c, ln = gcodes[256 + lc]
            bw.write_code(c, ln)
            bw.write(ev, eb)
            dc, deb, dev = _prefix_encode(s[2] + 120)
            c, ln = dcodes[dc]
            bw.write_code(c, ln)
            bw.write(dev, deb)
        else:
            c, ln = gcodes[280 + s[1]]
            bw.write_code(c, ln)


def encode_webp_lossless(
    px: np.ndarray,
    subtract_green: bool = False,
    cache_bits: int = 0,
    lz77_rows: bool = False,
    palette: bool = False,
) -> bytes:
    """Encode uint8 pixels ([h,w,3] RGB or [h,w] gray) as a lossless
    WebP. Spec-literal fixture writer: literals with canonical prefix
    codes by default; the flags turn on subtract-green, the color
    cache, repeated-row LZ77 copies (linear distance codes), or the
    color-indexing transform (with pixel bundling for small palettes) —
    each exercising the matching decoder path end-to-end."""
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    h, w = px.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dimensions out of range")
    argb = [
        (0xFF << 24) | (int(p[0]) << 16) | (int(p[1]) << 8) | int(p[2])
        for row in px
        for p in row
    ]
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    xsize = w
    pixels = argb
    if subtract_green and palette:
        raise ValueError("fixture encoder: pick one transform per payload")
    if subtract_green:
        bw.write(1, 1)
        bw.write(_T_SUBTRACT_GREEN, 2)
        pixels = [
            _pack(a, (r - g) & 0xFF, g, (b - g) & 0xFF)
            for a, r, g, b in map(_channels, pixels)
        ]
    if palette:
        colors = sorted(set(pixels))
        if len(colors) > 256:
            raise ValueError("palette encoding needs <=256 distinct colors")
        bw.write(1, 1)
        bw.write(_T_COLOR_INDEXING, 2)
        bw.write(len(colors) - 1, 8)
        # palette entries are delta-coded off the previous entry
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_sub_px(c, prev))
            prev = c
        pal_syms = [
            ("lit", *(_channels(d))) for d in deltas
        ]
        _encode_entropy_stream(bw, pal_syms, cache_bits=0)
        index = {c: i for i, c in enumerate(colors)}
        wb = _width_bits(len(colors))
        per = 1 << wb
        bits = 8 >> wb
        packed_w = (w + per - 1) // per
        packed = []
        for y in range(h):
            for xp in range(packed_w):
                v = 0
                for k in range(per):
                    x = xp * per + k
                    if x < w:
                        v |= index[pixels[y * w + x]] << (k * bits)
                packed.append(_pack(0, 0, v, 0))
        pixels = packed
        xsize = packed_w
    bw.write(0, 1)  # end of transforms
    # build the symbol stream (decoder-identical cache state)
    symbols: list[tuple] = []
    cache = [None] * (1 << cache_bits) if cache_bits else []
    pos = 0
    total = len(pixels)
    while pos < total:
        y, x = divmod(pos, xsize)
        if (
            lz77_rows
            and x == 0
            and y > 0
            and xsize <= 4096  # the 24-code length alphabet caps at 4096
            and pixels[pos : pos + xsize] == pixels[pos - xsize : pos]
        ):
            symbols.append(("copy", xsize, xsize))
            if cache_bits:
                for p in pixels[pos : pos + xsize]:
                    cache[_cache_hash(p, cache_bits)] = p
            pos += xsize
            continue
        p = pixels[pos]
        if cache_bits:
            idx = _cache_hash(p, cache_bits)
            if cache[idx] == p:
                symbols.append(("cache", idx))
                pos += 1
                continue
            cache[idx] = p
        symbols.append(("lit", *_channels(p)))
        pos += 1
    _encode_entropy_stream(bw, symbols, cache_bits, is_main=True)
    body = b"\x2f" + bw.tobytes()
    if len(body) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_vp8(rgb, qi: int = 12, use_bpred: bool = False) -> bytes:
    """Wrap the VP8 fixture encoder (operators/vp8.py) in a RIFF/WEBP
    container — the lossy twin of encode_webp_lossless, used by the
    multimodal_vp8_decode oracle query and tests."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.vp8 import (
        encode_frame,
        rgb_to_yuv,
    )

    y, u, v = rgb_to_yuv(np.asarray(rgb, dtype=np.uint8))
    payload, _ = encode_frame(y, u, v, qi=qi, use_bpred=use_bpred)
    if len(payload) & 1:
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
