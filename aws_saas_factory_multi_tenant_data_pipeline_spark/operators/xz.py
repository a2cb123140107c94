"""XZ / LZMA decoder — from the PUBLIC specs, r14.

``.xz`` (and legacy ``.lzma``) is the second corpus-shard compression
named by the r13 verdict next to zstd (Wikipedia dumps ship .xz;
older Pile-era shards ship .jsonl.xz / .tar.xz). This module
implements, from the public xz file-format specification and the LZMA
specification (the reference algorithm published with the LZMA SDK):

- the .xz container: stream header/footer (magic, stream flags,
  CRC32-protected), block headers (filter chain, optional sizes,
  header CRC32), block padding, integrity checks (None / CRC32 /
  CRC64-ECMA / SHA-256 — all four verified), the index (record list
  cross-checked against decoded blocks), stream padding and
  multi-stream concatenation,
- the LZMA2 chunk layer: uncompressed chunks, LZMA chunks with the
  state/props/dict reset modes, per-chunk range-coder init,
- the LZMA core: 11-bit adaptive binary range decoder, the 12-state
  state machine, lc/lp/pb literal contexts (normal + matched-literal
  modes), length coders, the 6-bit position-slot tree with aligned /
  spec-position reverse bit-trees, the rep0-rep3 distance ring,
- the legacy LZMA_ALONE (.lzma) framing incl. the end-of-stream
  marker path and unknown-size streams,
- a store-mode .xz encoder (LZMA2 uncompressed chunks + CRC32 check)
  the reference library accepts.

Pre-filters (r14 second wave): the DELTA filter (any distance 1..256)
and the x86 BCJ filter (CALL/JMP rel32 conversion, the published
xz-utils algorithm) decode — pinned against real liblzma
FILTER_DELTA/FILTER_X86 streams over real ELF binaries. The other BCJ
architectures (ARM/ARM64/PPC/SPARC/IA64/ARMTHUMB/RISCV) remain NAMED
out-of-scope boundaries (ValueError).

Both directions are pinned against the system liblzma (via the
stdlib ``lzma`` module, which binds it) in tests/test_xz.py: real
encoder output across presets 0-9/EXTREME, all four check types,
FORMAT_XZ/ALONE/RAW, decodes byte-identical here; our store-mode .xz
decodes in the real library.

Decode contract: ValueError — and only ValueError — on torn input.
Scale shape: runs inside Arrow ``mapInPandas`` archive/shard passes,
partition-local, one payload per call (operators/archives.py). The
pure-Python throughput floor is priced in SCALE.md; the one-function
native swap seam is ``xz_decompress`` (same signature as the host
binding).
"""

from __future__ import annotations

import struct
import zlib

_XZ_MAGIC = b"\xfd7zXZ\x00"
_XZ_FOOTER_MAGIC = b"YZ"

# --- CRC64 (ECMA-182, reflected — the xz check type 4) -------------------------

_CRC64_POLY = 0xC96C5795D7870F42
_CRC64_TABLE: list[int] = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ (_CRC64_POLY if _c & 1 else 0)
    _CRC64_TABLE.append(_c)


def crc64(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFFFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC64_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFFFFFFFFFF


# --- variable-length integers (xz spec §1.2) -----------------------------------


def _vli(data: bytes, off: int) -> tuple[int, int]:
    v = 0
    for i in range(9):
        if off + i >= len(data):
            raise ValueError("torn xz variable-length integer")
        b = data[off + i]
        v |= (b & 0x7F) << (7 * i)
        if not b & 0x80:
            if b == 0 and i > 0:
                raise ValueError("non-minimal xz variable-length integer")
            return v, off + i + 1
    raise ValueError("xz variable-length integer overruns 9 bytes")


# --- LZMA core (the published reference algorithm) -----------------------------

_STATES = 12
_LIT_STATES = 7  # states < 7 decode normal literals


class _RangeDec:
    """Binary range decoder: 32-bit range/code, 11-bit probabilities,
    renormalize under 2^24 (LZMA spec)."""

    __slots__ = ("buf", "pos", "end", "range", "code")

    def __init__(self, buf: bytes, pos: int, end: int):
        if end - pos < 5:
            raise ValueError("torn LZMA chunk: no range-coder init")
        if buf[pos] != 0:
            raise ValueError("LZMA range coder init byte is not zero")
        self.buf = buf
        self.code = int.from_bytes(buf[pos + 1 : pos + 5], "big")
        self.pos = pos + 5
        self.end = end
        self.range = 0xFFFFFFFF

    def _norm(self) -> None:
        if self.range < (1 << 24):
            if self.pos >= self.end:
                raise ValueError("LZMA range coder ran past the chunk")
            self.range = (self.range << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8) | self.buf[self.pos]) & 0xFFFFFFFF
            self.pos += 1

    def bit(self, probs: list[int], i: int) -> int:
        p = probs[i]
        bound = (self.range >> 11) * p
        if self.code < bound:
            self.range = bound
            probs[i] = p + ((2048 - p) >> 5)
            self._norm()
            return 0
        self.code -= bound
        self.range -= bound
        probs[i] = p - (p >> 5)
        self._norm()
        return 1

    def direct(self, n: int) -> int:
        res = 0
        for _ in range(n):
            self.range >>= 1
            self.code = (self.code - self.range) & 0xFFFFFFFF
            t = 0 - (self.code >> 31)
            self.code = (self.code + (self.range & t)) & 0xFFFFFFFF
            if self.code == self.range:
                raise ValueError("LZMA direct bits hit the range bound")
            res = (res << 1) + t + 1
            self._norm()
        return res

    def tree(self, probs: list[int], base: int, nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) + self.bit(probs, base + m - 1)
        return m - (1 << nbits)

    def rtree(self, probs: list[int], base: int, nbits: int) -> int:
        m = 1
        sym = 0
        for i in range(nbits):
            b = self.bit(probs, base + m - 1)
            m = (m << 1) + b
            sym |= b << i
        return sym


class _LenDec:
    __slots__ = ("choice", "low", "mid", "high")

    def __init__(self, n_pos_states: int):
        self.choice = [1024, 1024]
        self.low = [[1024] * 8 for _ in range(n_pos_states)]
        self.mid = [[1024] * 8 for _ in range(n_pos_states)]
        self.high = [1024] * 256

    def decode(self, rc: _RangeDec, pos_state: int) -> int:
        if rc.bit(self.choice, 0) == 0:
            return 2 + rc.tree(self.low[pos_state], 0, 3)
        if rc.bit(self.choice, 1) == 0:
            return 10 + rc.tree(self.mid[pos_state], 0, 3)
        return 18 + rc.tree(self.high, 0, 8)


class _LzmaState:
    """Probability model + machine state, shared across LZMA2 chunks
    until a state-reset control (so `mode 0` continuation chunks keep
    adaptation)."""

    def __init__(self, lc: int, lp: int, pb: int):
        if lc > 8 or lp > 4 or pb > 4:
            raise ValueError(f"LZMA lc/lp/pb {lc}/{lp}/{pb} out of range")
        self.lc, self.lp, self.pb = lc, lp, pb
        nps = 1 << pb
        self.is_match = [[1024] * nps for _ in range(_STATES)]
        self.is_rep = [1024] * _STATES
        self.is_rep_g0 = [1024] * _STATES
        self.is_rep_g1 = [1024] * _STATES
        self.is_rep_g2 = [1024] * _STATES
        self.is_rep0_long = [[1024] * nps for _ in range(_STATES)]
        self.literal = [1024] * (0x300 << (lc + lp))
        self.len_dec = _LenDec(nps)
        self.rep_len_dec = _LenDec(nps)
        self.slot = [[1024] * 64 for _ in range(4)]
        self.spec_pos = [1024] * 115
        self.align = [1024] * 16
        self.state = 0
        self.reps = [0, 0, 0, 0]


def _decode_props(byte: int) -> tuple[int, int, int]:
    if byte >= 9 * 5 * 5:
        raise ValueError(f"LZMA properties byte {byte} out of range")
    lc = byte % 9
    lp = (byte // 9) % 5
    pb = byte // 45
    return lc, lp, pb


def _lzma_run(
    st: _LzmaState,
    rc: _RangeDec,
    out: bytearray,
    dict_start: int,
    limit: int | None,
    allow_marker: bool,
) -> bool:
    """Decode symbols into ``out`` until ``limit`` total bytes past
    dict_start (LZMA2 chunk) or the end marker (ALONE). Returns True
    when the end marker terminated the stream.

    Performance shape (r14): the range-decoder state lives in LOCALS
    and every adaptive-bit decode is hand-inlined — measured 1.3x over
    the method-call form on text corpora (5.8 -> 7.6 MB/s/core; the
    adaptive bit-by-bit algorithm is inherently branchy); correctness
    re-validated by the full liblzma battery (tests/test_xz.py). The 32-bit invariants
    make masking unnecessary: code < range <= 2^32 always, and
    renormalization only shifts when range < 2^24."""
    lc, lp, pb = st.lc, st.lp, st.pb
    pb_mask = (1 << pb) - 1
    lp_mask = (1 << lp) - 1
    reps = st.reps
    state = st.state
    lit = st.literal
    is_match = st.is_match
    is_rep = st.is_rep
    is_rep_g0 = st.is_rep_g0
    is_rep_g1 = st.is_rep_g1
    is_rep_g2 = st.is_rep_g2
    is_rep0_long = st.is_rep0_long
    ld, rld = st.len_dec, st.rep_len_dec
    slots = st.slot
    spec_pos = st.spec_pos
    align_p = st.align
    # No per-renorm chunk-boundary check in the inlined loop: a torn
    # LZMA2 chunk does bounded garbage work until lzma2_decompress's
    # post-chunk `rc.pos != off + packed` check (or IndexError at the
    # buffer end, converted below) raises the contract ValueError.
    buf = rc.buf
    rng = rc.range
    code = rc.code
    bpos = rc.pos
    ended = False
    out_len = len(out)
    try:
        while limit is None or out_len - dict_start < limit:
            opos = out_len - dict_start
            pos_state = opos & pb_mask

            probs = is_match[state]
            pr = probs[pos_state]
            bound = (rng >> 11) * pr
            if code < bound:
                rng = bound
                probs[pos_state] = pr + ((2048 - pr) >> 5)
                b = 0
            else:
                code -= bound
                rng -= bound
                probs[pos_state] = pr - (pr >> 5)
                b = 1
            if rng < 16777216:
                rng <<= 8
                code = (code << 8) | buf[bpos]
                bpos += 1

            if b == 0:
                # ---- literal ----
                prev = out[-1] if out_len > dict_start else 0
                base = 0x300 * (((opos & lp_mask) << lc)
                                + (prev >> (8 - lc)))
                sym = 1
                if state < _LIT_STATES:
                    while sym < 0x100:
                        j = base + sym
                        pr = lit[j]
                        bound = (rng >> 11) * pr
                        if code < bound:
                            rng = bound
                            lit[j] = pr + ((2048 - pr) >> 5)
                            sym <<= 1
                        else:
                            code -= bound
                            rng -= bound
                            lit[j] = pr - (pr >> 5)
                            sym = (sym << 1) | 1
                        if rng < 16777216:
                            rng <<= 8
                            code = (code << 8) | buf[bpos]
                            bpos += 1
                else:
                    # matched literal: fold in the byte at rep0
                    if reps[0] + 1 > opos:
                        raise ValueError("LZMA matched literal before start")
                    mbyte = out[out_len - reps[0] - 1]
                    while sym < 0x100:
                        mbit = (mbyte >> 7) & 1
                        mbyte = (mbyte << 1) & 0xFF
                        j = base + ((1 + mbit) << 8) + sym
                        pr = lit[j]
                        bound = (rng >> 11) * pr
                        if code < bound:
                            rng = bound
                            lit[j] = pr + ((2048 - pr) >> 5)
                            b = 0
                        else:
                            code -= bound
                            rng -= bound
                            lit[j] = pr - (pr >> 5)
                            b = 1
                        if rng < 16777216:
                            rng <<= 8
                            code = (code << 8) | buf[bpos]
                            bpos += 1
                        sym = (sym << 1) | b
                        if mbit != b:
                            while sym < 0x100:
                                j = base + sym
                                pr = lit[j]
                                bound = (rng >> 11) * pr
                                if code < bound:
                                    rng = bound
                                    lit[j] = pr + ((2048 - pr) >> 5)
                                    sym <<= 1
                                else:
                                    code -= bound
                                    rng -= bound
                                    lit[j] = pr - (pr >> 5)
                                    sym = (sym << 1) | 1
                                if rng < 16777216:
                                    rng <<= 8
                                    code = (code << 8) | buf[bpos]
                                    bpos += 1
                            break
                out.append(sym & 0xFF)
                out_len += 1
                state = (0 if state < 4
                         else state - 3 if state < 10 else state - 6)
                continue

            # ---- match or rep ----
            pr = is_rep[state]
            bound = (rng >> 11) * pr
            if code < bound:
                rng = bound
                is_rep[state] = pr + ((2048 - pr) >> 5)
                b = 0
            else:
                code -= bound
                rng -= bound
                is_rep[state] = pr - (pr >> 5)
                b = 1
            if rng < 16777216:
                rng <<= 8
                code = (code << 8) | buf[bpos]
                bpos += 1

            if b == 0:
                # new match: length (inlined _LenDec) then distance
                lp_ = ld
                probs = lp_.choice
                pr = probs[0]
                bound = (rng >> 11) * pr
                if code < bound:
                    rng = bound
                    probs[0] = pr + ((2048 - pr) >> 5)
                    b = 0
                else:
                    code -= bound
                    rng -= bound
                    probs[0] = pr - (pr >> 5)
                    b = 1
                if rng < 16777216:
                    rng <<= 8
                    code = (code << 8) | buf[bpos]
                    bpos += 1
                if b == 0:
                    tree = lp_.low[pos_state]
                    lbase, nbits = 2, 3
                else:
                    pr = probs[1]
                    bound = (rng >> 11) * pr
                    if code < bound:
                        rng = bound
                        probs[1] = pr + ((2048 - pr) >> 5)
                        b = 0
                    else:
                        code -= bound
                        rng -= bound
                        probs[1] = pr - (pr >> 5)
                        b = 1
                    if rng < 16777216:
                        rng <<= 8
                        code = (code << 8) | buf[bpos]
                        bpos += 1
                    if b == 0:
                        tree = lp_.mid[pos_state]
                        lbase, nbits = 10, 3
                    else:
                        tree = lp_.high
                        lbase, nbits = 18, 8
                m = 1
                top = 1 << nbits
                while m < top:
                    pr = tree[m - 1]
                    bound = (rng >> 11) * pr
                    if code < bound:
                        rng = bound
                        tree[m - 1] = pr + ((2048 - pr) >> 5)
                        m <<= 1
                    else:
                        code -= bound
                        rng -= bound
                        tree[m - 1] = pr - (pr >> 5)
                        m = (m << 1) | 1
                    if rng < 16777216:
                        rng <<= 8
                        code = (code << 8) | buf[bpos]
                        bpos += 1
                length = lbase + m - top

                # distance: 6-bit slot tree, then spec/align bits
                tree = slots[min(length - 2, 3)]
                m = 1
                while m < 64:
                    pr = tree[m - 1]
                    bound = (rng >> 11) * pr
                    if code < bound:
                        rng = bound
                        tree[m - 1] = pr + ((2048 - pr) >> 5)
                        m <<= 1
                    else:
                        code -= bound
                        rng -= bound
                        tree[m - 1] = pr - (pr >> 5)
                        m = (m << 1) | 1
                    if rng < 16777216:
                        rng <<= 8
                        code = (code << 8) | buf[bpos]
                        bpos += 1
                slot = m - 64
                if slot < 4:
                    dist = slot
                else:
                    nd = (slot >> 1) - 1
                    dist = (2 | (slot & 1)) << nd
                    if slot < 14:
                        # reverse bit-tree over spec_pos
                        tbase = dist - slot - 1
                        m = 1
                        shift = 0
                        add = 0
                        for _ in range(nd):
                            pr = spec_pos[tbase + m - 1]
                            bound = (rng >> 11) * pr
                            if code < bound:
                                rng = bound
                                spec_pos[tbase + m - 1] = (
                                    pr + ((2048 - pr) >> 5))
                                m <<= 1
                            else:
                                code -= bound
                                rng -= bound
                                spec_pos[tbase + m - 1] = pr - (pr >> 5)
                                m = (m << 1) | 1
                                add |= 1 << shift
                            if rng < 16777216:
                                rng <<= 8
                                code = (code << 8) | buf[bpos]
                                bpos += 1
                            shift += 1
                        dist += add
                    else:
                        # direct bits then the 4-bit align reverse tree
                        res = 0
                        for _ in range(nd - 4):
                            rng >>= 1
                            code -= rng
                            if code < 0:
                                code += rng
                                res <<= 1
                            else:
                                res = (res << 1) + 1
                            if code == rng:
                                raise ValueError(
                                    "LZMA direct bits hit the range bound"
                                )
                            if rng < 16777216:
                                rng <<= 8
                                code = (code << 8) | buf[bpos]
                                bpos += 1
                        dist += res << 4
                        m = 1
                        shift = 0
                        add = 0
                        for _ in range(4):
                            pr = align_p[m - 1]
                            bound = (rng >> 11) * pr
                            if code < bound:
                                rng = bound
                                align_p[m - 1] = pr + ((2048 - pr) >> 5)
                                m <<= 1
                            else:
                                code -= bound
                                rng -= bound
                                align_p[m - 1] = pr - (pr >> 5)
                                m = (m << 1) | 1
                                add |= 1 << shift
                            if rng < 16777216:
                                rng <<= 8
                                code = (code << 8) | buf[bpos]
                                bpos += 1
                            shift += 1
                        dist += add
                if dist == 0xFFFFFFFF:
                    if not allow_marker:
                        raise ValueError(
                            "LZMA end marker inside a sized LZMA2 chunk"
                        )
                    ended = True
                    break
                reps[3], reps[2], reps[1] = reps[2], reps[1], reps[0]
                reps[0] = dist
                state = 7 if state < _LIT_STATES else 10
            else:
                pr = is_rep_g0[state]
                bound = (rng >> 11) * pr
                if code < bound:
                    rng = bound
                    is_rep_g0[state] = pr + ((2048 - pr) >> 5)
                    b = 0
                else:
                    code -= bound
                    rng -= bound
                    is_rep_g0[state] = pr - (pr >> 5)
                    b = 1
                if rng < 16777216:
                    rng <<= 8
                    code = (code << 8) | buf[bpos]
                    bpos += 1
                if b == 0:
                    probs = is_rep0_long[state]
                    pr = probs[pos_state]
                    bound = (rng >> 11) * pr
                    if code < bound:
                        rng = bound
                        probs[pos_state] = pr + ((2048 - pr) >> 5)
                        b = 0
                    else:
                        code -= bound
                        rng -= bound
                        probs[pos_state] = pr - (pr >> 5)
                        b = 1
                    if rng < 16777216:
                        rng <<= 8
                        code = (code << 8) | buf[bpos]
                        bpos += 1
                    if b == 0:
                        # short rep: one byte at rep0
                        if reps[0] + 1 > opos:
                            raise ValueError("LZMA short rep before start")
                        out.append(out[out_len - reps[0] - 1])
                        out_len += 1
                        state = 9 if state < _LIT_STATES else 11
                        continue
                else:
                    pr = is_rep_g1[state]
                    bound = (rng >> 11) * pr
                    if code < bound:
                        rng = bound
                        is_rep_g1[state] = pr + ((2048 - pr) >> 5)
                        b = 0
                    else:
                        code -= bound
                        rng -= bound
                        is_rep_g1[state] = pr - (pr >> 5)
                        b = 1
                    if rng < 16777216:
                        rng <<= 8
                        code = (code << 8) | buf[bpos]
                        bpos += 1
                    if b == 0:
                        dist = reps[1]
                        reps[1] = reps[0]
                    else:
                        pr = is_rep_g2[state]
                        bound = (rng >> 11) * pr
                        if code < bound:
                            rng = bound
                            is_rep_g2[state] = pr + ((2048 - pr) >> 5)
                            b = 0
                        else:
                            code -= bound
                            rng -= bound
                            is_rep_g2[state] = pr - (pr >> 5)
                            b = 1
                        if rng < 16777216:
                            rng <<= 8
                            code = (code << 8) | buf[bpos]
                            bpos += 1
                        if b == 0:
                            dist = reps[2]
                            reps[2] = reps[1]
                            reps[1] = reps[0]
                        else:
                            dist = reps[3]
                            reps[3] = reps[2]
                            reps[2] = reps[1]
                            reps[1] = reps[0]
                    reps[0] = dist
                # rep length (inlined _LenDec on the rep coder)
                lp_ = rld
                probs = lp_.choice
                pr = probs[0]
                bound = (rng >> 11) * pr
                if code < bound:
                    rng = bound
                    probs[0] = pr + ((2048 - pr) >> 5)
                    b = 0
                else:
                    code -= bound
                    rng -= bound
                    probs[0] = pr - (pr >> 5)
                    b = 1
                if rng < 16777216:
                    rng <<= 8
                    code = (code << 8) | buf[bpos]
                    bpos += 1
                if b == 0:
                    tree = lp_.low[pos_state]
                    lbase, nbits = 2, 3
                else:
                    pr = probs[1]
                    bound = (rng >> 11) * pr
                    if code < bound:
                        rng = bound
                        probs[1] = pr + ((2048 - pr) >> 5)
                        b = 0
                    else:
                        code -= bound
                        rng -= bound
                        probs[1] = pr - (pr >> 5)
                        b = 1
                    if rng < 16777216:
                        rng <<= 8
                        code = (code << 8) | buf[bpos]
                        bpos += 1
                    if b == 0:
                        tree = lp_.mid[pos_state]
                        lbase, nbits = 10, 3
                    else:
                        tree = lp_.high
                        lbase, nbits = 18, 8
                m = 1
                top = 1 << nbits
                while m < top:
                    pr = tree[m - 1]
                    bound = (rng >> 11) * pr
                    if code < bound:
                        rng = bound
                        tree[m - 1] = pr + ((2048 - pr) >> 5)
                        m <<= 1
                    else:
                        code -= bound
                        rng -= bound
                        tree[m - 1] = pr - (pr >> 5)
                        m = (m << 1) | 1
                    if rng < 16777216:
                        rng <<= 8
                        code = (code << 8) | buf[bpos]
                        bpos += 1
                length = lbase + m - top
                state = 8 if state < _LIT_STATES else 11

            # execute the match
            dist1 = reps[0] + 1
            if dist1 > opos:
                raise ValueError("LZMA match distance before stream start")
            if limit is not None and opos + length > limit:
                raise ValueError("LZMA match overruns the chunk size")
            src = out_len - dist1
            if dist1 >= length:
                out += out[src : src + length]
                out_len += length
            else:
                for _ in range(length):
                    out.append(out[src])
                    src += 1
                    out_len += 1
        return ended
    except IndexError as exc:
        raise ValueError(f"LZMA range coder ran past the chunk: {exc}") from exc
    finally:
        st.state = state
        rc.range = rng
        rc.code = code
        rc.pos = bpos


# --- LZMA2 chunk layer (xz filter 0x21) -----------------------------------------


def _dict_size_from_prop(prop: int) -> int:
    if prop > 40:
        raise ValueError(f"LZMA2 dictionary property {prop} out of range")
    if prop == 40:
        return 0xFFFFFFFF
    return (2 | (prop & 1)) << (prop // 2 + 11)


def lzma2_decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decode a complete LZMA2 chunk sequence (ends with control 0)."""
    out = bytearray()
    off = 0
    st: _LzmaState | None = None
    # props persist across state resets AND uncompressed chunks (a
    # mode-1 "reset state, reuse props" chunk is legal right after an
    # uncompressed chunk — liblzma emits exactly that around
    # incompressible sections, caught by the real-parquet pin)
    cur_props: tuple[int, int, int] | None = None
    dict_start = 0
    need_dict_reset = True
    while True:
        if off >= len(data):
            raise ValueError("torn LZMA2: no end-of-stream control")
        ctrl = data[off]
        off += 1
        if ctrl == 0:
            break
        if ctrl <= 2:  # uncompressed chunk (1 = with dict reset)
            if off + 2 > len(data):
                raise ValueError("torn LZMA2 uncompressed chunk header")
            size = ((data[off] << 8) | data[off + 1]) + 1
            off += 2
            if off + size > len(data):
                raise ValueError("torn LZMA2 uncompressed chunk")
            if ctrl == 1:
                dict_start = len(out)
                need_dict_reset = False
            elif need_dict_reset:
                raise ValueError("LZMA2 stream must start with a dict reset")
            out += data[off : off + size]
            off += size
            st = None  # uncompressed chunk forces a state reset next
            continue
        if ctrl < 0x80:
            raise ValueError(f"LZMA2 control byte 0x{ctrl:02X} out of range")
        unpacked = ((ctrl & 0x1F) << 16) + 1
        if off + 4 > len(data):
            raise ValueError("torn LZMA2 chunk header")
        unpacked += (data[off] << 8) | data[off + 1]
        packed = ((data[off + 2] << 8) | data[off + 3]) + 1
        off += 4
        mode = (ctrl >> 5) & 3
        if mode >= 2:
            if off >= len(data):
                raise ValueError("torn LZMA2 props byte")
            cur_props = _decode_props(data[off])
            off += 1
        if off + packed > len(data):
            raise ValueError("torn LZMA2 chunk body")
        if mode == 3:
            dict_start = len(out)
            need_dict_reset = False
        elif need_dict_reset:
            raise ValueError("LZMA2 stream must start with a dict reset")
        if mode == 0:
            if st is None:
                raise ValueError("LZMA2 continuation chunk with no state")
        else:
            if cur_props is None:
                raise ValueError("LZMA2 state reset before any props")
            st = _LzmaState(*cur_props)
        if len(out) - dict_start + unpacked > max_output:
            raise ValueError("LZMA2 output exceeds the configured cap")
        rc = _RangeDec(data, off, off + packed)
        _lzma_run(st, rc, out, dict_start, len(out) - dict_start + unpacked,
                  allow_marker=False)
        if rc.pos != off + packed:
            raise ValueError("LZMA2 chunk not fully consumed")
        if rc.code != 0:
            raise ValueError("LZMA2 range coder did not finish at zero")
        off += packed
    if off != len(data):
        raise ValueError("LZMA2 trailing bytes after end-of-stream")
    return bytes(out)


# --- non-LZMA2 filters (r14 second wave) -----------------------------------------


def delta_decode(data: bytes, dist: int) -> bytes:
    """Reverse the xz delta filter: out[i] = in[i] + out[i-dist]
    (byte-wise mod 256; dist 1..256)."""
    if not 1 <= dist <= 256:
        raise ValueError(f"xz delta distance {dist} out of range")
    out = bytearray(data)
    for i in range(dist, len(out)):
        out[i] = (out[i] + out[i - dist]) & 0xFF
    return bytes(out)


def _x86_msbyte(b: int) -> bool:
    return b == 0 or b == 0xFF


_X86_ALLOWED = (True, True, True, False, True, False, False, False)
_X86_BITNUM = (0, 1, 2, 2, 3, 3, 3, 3)


def bcj_x86(data: bytes, is_encoder: bool, start_offset: int = 0) -> bytes:
    """The xz x86 BCJ filter (CALL/JMP rel32 ↔ absolute conversion,
    the published xz-utils algorithm): decode direction reverses what
    the encoder did to E8/E9 targets whose MSB is 00/FF. Pinned
    byte-identical against real liblzma FILTER_X86 streams over real
    ELF binaries in tests/test_xz.py."""
    buf = bytearray(data)
    size = len(buf)
    if size < 5:
        return bytes(buf)
    prev_mask = 0
    prev_pos = -1 - 5  # "never seen": first offset is always > 5
    pos = 0
    limit = size - 5
    while pos <= limit:
        if buf[pos] not in (0xE8, 0xE9):
            pos += 1
            continue
        offset = (start_offset + pos) - prev_pos
        prev_pos = start_offset + pos
        if offset > 5:
            prev_mask = 0
        else:
            for _ in range(offset):
                prev_mask &= 0x77
                prev_mask = (prev_mask << 1) & 0xFF
        b = buf[pos + 4]
        if (
            _x86_msbyte(b)
            and _X86_ALLOWED[(prev_mask >> 1) & 7]
            and (prev_mask >> 1) < 0x10
        ):
            src = int.from_bytes(buf[pos + 1 : pos + 5], "little")
            while True:
                if is_encoder:
                    dest = (src + (start_offset + pos + 5)) & 0xFFFFFFFF
                else:
                    dest = (src - (start_offset + pos + 5)) & 0xFFFFFFFF
                if prev_mask == 0:
                    break
                i = _X86_BITNUM[prev_mask >> 1]
                b = (dest >> (24 - i * 8)) & 0xFF
                if not _x86_msbyte(b):
                    break
                src = dest ^ ((1 << (32 - i * 8)) - 1)
            buf[pos + 4] = (~(((dest >> 24) & 1) - 1)) & 0xFF
            buf[pos + 3] = (dest >> 16) & 0xFF
            buf[pos + 2] = (dest >> 8) & 0xFF
            buf[pos + 1] = dest & 0xFF
            pos += 5
        else:
            prev_mask = (prev_mask | 1) & 0xFF
            if _x86_msbyte(b):
                prev_mask |= 0x10
            pos += 1
    return bytes(buf)


# --- .xz container --------------------------------------------------------------

_CHECK_SIZES = {0: 0, 1: 4, 4: 8, 10: 32}
_FILTER_LZMA2 = 0x21
_FILTER_DELTA = 0x03
_FILTER_X86 = 0x04
_BCJ_IDS = {0x04, 0x05, 0x06, 0x07, 0x08, 0x09, 0x0A, 0x0B}


def _check(check_type: int, data: bytes, stored: bytes) -> None:
    if check_type == 0:
        return
    if check_type == 1:
        ok = struct.pack("<I", zlib.crc32(data) & 0xFFFFFFFF) == stored
    elif check_type == 4:
        ok = struct.pack("<Q", crc64(data)) == stored
    else:  # 10: SHA-256
        import hashlib

        ok = hashlib.sha256(data).digest() == stored
    if not ok:
        raise ValueError("xz block check mismatch")


def xz_decompress(payload: bytes, max_output: int = 1 << 31) -> bytes:
    """Decode a complete .xz payload (one or more concatenated streams,
    stream padding allowed). Verifies header/footer CRC32s, the block
    checks, and the index against the decoded blocks. ValueError — and
    only ValueError — on torn/corrupt/out-of-scope input."""
    try:
        return _xz_decompress(payload, max_output)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"torn xz payload: {exc}") from exc


def _xz_decompress(payload: bytes, max_output: int) -> bytes:
    out = bytearray()
    off = 0
    if not payload:
        raise ValueError("empty xz payload")
    while off < len(payload):
        if payload[off : off + 6] != _XZ_MAGIC:
            raise ValueError("bad xz stream magic")
        flags = payload[off + 6 : off + 8]
        if len(flags) < 2 or flags[0] != 0:
            raise ValueError("bad xz stream flags")
        check_type = flags[1] & 0x0F
        if flags[1] & 0xF0:
            raise ValueError("reserved xz stream flag bits set")
        if check_type not in _CHECK_SIZES:
            raise ValueError(f"xz check type {check_type} out of scope")
        (hcrc,) = struct.unpack_from("<I", payload, off + 8)
        if zlib.crc32(flags) & 0xFFFFFFFF != hcrc:
            raise ValueError("xz stream header CRC mismatch")
        off += 12
        records: list[tuple[int, int]] = []
        while True:
            if off >= len(payload):
                raise ValueError("torn xz stream: no index")
            first = payload[off]
            if first == 0:  # index indicator
                break
            header_size = (first + 1) * 4
            hdr = payload[off : off + header_size]
            if len(hdr) < header_size:
                raise ValueError("torn xz block header")
            (bcrc,) = struct.unpack_from("<I", hdr, header_size - 4)
            if zlib.crc32(hdr[:-4]) & 0xFFFFFFFF != bcrc:
                raise ValueError("xz block header CRC mismatch")
            bflags = hdr[1]
            n_filters = (bflags & 3) + 1
            if bflags & 0x3C:
                raise ValueError("reserved xz block flag bits set")
            p = 2
            comp_size = unc_size = None
            if bflags & 0x40:
                comp_size, p = _vli(hdr, p)
            if bflags & 0x80:
                unc_size, p = _vli(hdr, p)
            filters = []
            for _ in range(n_filters):
                fid, p = _vli(hdr, p)
                psize, p = _vli(hdr, p)
                props = hdr[p : p + psize]
                if len(props) < psize:
                    raise ValueError("torn xz filter properties")
                p += psize
                filters.append((fid, props))
            if any(hdr[p : header_size - 4].strip(b"\x00")):
                raise ValueError("xz block header padding is not zero")
            ids = [f[0] for f in filters]
            if not filters or filters[-1][0] != _FILTER_LZMA2:
                raise ValueError(f"xz filter chain {ids} out of range")
            for fid, _p in filters[:-1]:
                if fid == _FILTER_X86 or fid == _FILTER_DELTA:
                    continue
                if fid in _BCJ_IDS:
                    raise ValueError(
                        f"xz BCJ/delta filter chain {ids} outside the "
                        "declared scope (only delta and x86 decode)"
                    )
                raise ValueError(f"xz filter chain {ids} out of range")
            props = filters[-1][1]
            if len(props) != 1:
                raise ValueError("xz LZMA2 filter needs 1 property byte")
            _dict_size_from_prop(props[0])  # validates
            off += header_size
            body_start = off
            # the compressed size is either declared or found by decoding;
            # LZMA2 is self-terminating, so decode from here and measure.
            if comp_size is not None:
                body = payload[body_start : body_start + comp_size]
                if len(body) < comp_size:
                    raise ValueError("torn xz block body")
                block_out = lzma2_decompress(body, max_output - len(out))
                consumed = comp_size
            else:
                block_out, consumed = _lzma2_measure(
                    payload, body_start, max_output - len(out)
                )
            # pre-filters reverse in decode order (last listed = closest
            # to raw data = LZMA2; the others undo right-to-left)
            for fid, fprops in reversed(filters[:-1]):
                if fid == _FILTER_DELTA:
                    if len(fprops) != 1:
                        raise ValueError("xz delta filter needs 1 property")
                    block_out = delta_decode(block_out, fprops[0] + 1)
                else:  # _FILTER_X86
                    if fprops and len(fprops) != 4:
                        raise ValueError("xz x86 filter props out of range")
                    start = int.from_bytes(fprops, "little") if fprops else 0
                    block_out = bcj_x86(block_out, is_encoder=False,
                                        start_offset=start)
            if unc_size is not None and len(block_out) != unc_size:
                raise ValueError("xz block decoded size disagrees with header")
            out += block_out
            off = body_start + consumed
            pad = (4 - (header_size + consumed) % 4) % 4
            if payload[off : off + pad].strip(b"\x00"):
                raise ValueError("xz block padding is not zero")
            off += pad
            csize = _CHECK_SIZES[check_type]
            stored = payload[off : off + csize]
            if len(stored) < csize:
                raise ValueError("torn xz block check")
            _check(check_type, block_out, stored)
            off += csize
            # index "unpadded size" = header + body + check, NO padding
            records.append((header_size + consumed + csize, len(block_out)))
        # index
        idx_start = off
        off += 1
        n_rec, off = _vli(payload, off)
        if n_rec != len(records):
            raise ValueError(
                f"xz index lists {n_rec} blocks, stream has {len(records)}"
            )
        for unpadded, unc in records:
            u, off = _vli(payload, off)
            s, off = _vli(payload, off)
            if u != unpadded:
                raise ValueError("xz index unpadded size mismatch")
            if s != unc:
                raise ValueError("xz index uncompressed size mismatch")
        pad = (4 - (off - idx_start) % 4) % 4
        if payload[off : off + pad].strip(b"\x00"):
            raise ValueError("xz index padding is not zero")
        off += pad
        (icrc,) = struct.unpack_from("<I", payload, off)
        if zlib.crc32(payload[idx_start:off]) & 0xFFFFFFFF != icrc:
            raise ValueError("xz index CRC mismatch")
        off += 4
        index_size = off - idx_start
        # stream footer
        foot = payload[off : off + 12]
        if len(foot) < 12:
            raise ValueError("torn xz stream footer")
        (fcrc,) = struct.unpack_from("<I", foot, 0)
        if zlib.crc32(foot[4:10]) & 0xFFFFFFFF != fcrc:
            raise ValueError("xz stream footer CRC mismatch")
        (backward,) = struct.unpack_from("<I", foot, 4)
        if (backward + 1) * 4 != index_size:
            raise ValueError("xz footer backward size disagrees with index")
        if foot[8:10] != flags:
            raise ValueError("xz footer stream flags disagree with header")
        if foot[10:12] != _XZ_FOOTER_MAGIC:
            raise ValueError("bad xz stream footer magic")
        off += 12
        # stream padding (4-byte zero groups) before a possible next stream
        while off + 4 <= len(payload) and payload[off : off + 4] == b"\x00" * 4:
            off += 4
        if off < len(payload) and payload[off : off + 6] != _XZ_MAGIC:
            raise ValueError("xz trailing bytes after stream padding")
    return bytes(out)


def _lzma2_measure(payload: bytes, start: int,
                   max_output: int) -> tuple[bytes, int]:
    """Decode an LZMA2 sequence whose compressed size was not declared
    in the block header: walk the chunk layer to find the terminator,
    then decode the exact slice."""
    off = start
    while True:
        if off >= len(payload):
            raise ValueError("torn LZMA2: no end-of-stream control")
        ctrl = payload[off]
        off += 1
        if ctrl == 0:
            break
        if ctrl <= 2:
            if off + 2 > len(payload):
                raise ValueError("torn LZMA2 uncompressed chunk header")
            off += 2 + ((payload[off] << 8) | payload[off + 1]) + 1
        elif ctrl >= 0x80:
            if off + 4 > len(payload):
                raise ValueError("torn LZMA2 chunk header")
            packed = ((payload[off + 2] << 8) | payload[off + 3]) + 1
            off += 4 + packed + (1 if (ctrl >> 5) & 2 else 0)
        else:
            raise ValueError(f"LZMA2 control byte 0x{ctrl:02X} out of range")
    body = payload[start:off]
    return lzma2_decompress(body, max_output), off - start


# --- legacy .lzma (LZMA_ALONE) ---------------------------------------------------


def lzma_alone_decompress(payload: bytes, max_output: int = 1 << 31) -> bytes:
    """Decode the 13-byte-header legacy .lzma format (props byte, LE32
    dictionary size, LE64 uncompressed size or all-FF for
    marker-terminated)."""
    if len(payload) < 13 + 5:
        raise ValueError("torn .lzma payload")
    lc, lp, pb = _decode_props(payload[0])
    (usize,) = struct.unpack_from("<Q", payload, 5)
    st = _LzmaState(lc, lp, pb)
    rc = _RangeDec(payload, 13, len(payload))
    out = bytearray()
    if usize == 0xFFFFFFFFFFFFFFFF:
        ended = _lzma_run(st, rc, out, 0, max_output, allow_marker=True)
        if not ended:
            raise ValueError(".lzma unknown-size stream hit the output cap")
    else:
        if usize > max_output:
            raise ValueError(".lzma output exceeds the configured cap")
        # a marker is PERMITTED (and emitted by some encoders) even when
        # the size is known — accept either termination
        ended = _lzma_run(st, rc, out, 0, usize, allow_marker=True)
        if len(out) != usize:
            raise ValueError(".lzma decoded size disagrees with header")
    return bytes(out)


def lzma_raw_decompress(payload: bytes, props: bytes, unpack_size: int,
                        max_output: int = 1 << 31) -> bytes:
    """Decode a headerless LZMA1 stream against 7z-style coder
    properties (5 bytes: lc/lp/pb byte + LE32 dictionary size) to a
    KNOWN unpack size — the .7z folder coder shape (operators/
    sevenzip.py); an end marker is permitted but not required."""
    if len(props) < 1:
        raise ValueError("LZMA coder properties missing")
    lc, lp, pb = _decode_props(props[0])
    if unpack_size > max_output:
        raise ValueError("LZMA output exceeds the configured cap")
    if unpack_size == 0:
        return b""
    if len(payload) < 5:
        raise ValueError("torn LZMA raw stream")
    st = _LzmaState(lc, lp, pb)
    rc = _RangeDec(payload, 0, len(payload))
    out = bytearray()
    _lzma_run(st, rc, out, 0, unpack_size, allow_marker=True)
    if len(out) != unpack_size:
        raise ValueError("LZMA raw stream decoded size disagrees")
    return bytes(out)


# --- store-mode encoder ----------------------------------------------------------


def xz_compress_store(data: bytes) -> bytes:
    """Emit a valid single-stream .xz from LZMA2 uncompressed chunks
    (CRC32 check) — the fixture-encoder convention: correct output the
    reference library accepts, not ratio-chasing."""
    flags = bytes([0, 1])  # CRC32 check
    out = bytearray()
    out += _XZ_MAGIC + flags + struct.pack("<I", zlib.crc32(flags))
    records: list[tuple[int, int]] = []
    if data:
        # block header: no declared sizes, one LZMA2 filter (64 MiB dict)
        hdr = bytearray([2, 0])  # real size 12 = (2+1)*4
        hdr += bytes([_FILTER_LZMA2, 1, 26])  # VLI id, props size, prop
        hdr += b"\x00" * 3  # pad 5 -> 8, +CRC -> 12
        hdr += struct.pack("<I", zlib.crc32(bytes(hdr)))
        out += hdr
        body = bytearray()
        pos = 0
        while pos < len(data):
            chunk = data[pos : pos + 0x10000]
            pos += len(chunk)
            body.append(1 if not body else 2)
            body += struct.pack(">H", len(chunk) - 1)
            body += chunk
        body.append(0)
        out += body
        bpad = (4 - (len(hdr) + len(body)) % 4) % 4
        out += b"\x00" * bpad
        out += struct.pack("<I", zlib.crc32(data))
        records.append((len(hdr) + len(body) + 4, len(data)))
    # index
    idx = bytearray([0, len(records)])
    for unpadded, unc in records:
        for v in (unpadded, unc):
            while True:
                b = v & 0x7F
                v >>= 7
                idx.append(b | (0x80 if v else 0))
                if not v:
                    break
    ipad = (4 - len(idx) % 4) % 4
    idx += b"\x00" * ipad
    idx += struct.pack("<I", zlib.crc32(bytes(idx)))
    out += idx
    backward = len(idx) // 4 - 1
    foot_body = struct.pack("<I", backward) + flags
    out += struct.pack("<I", zlib.crc32(foot_body)) + foot_body
    out += _XZ_FOOTER_MAGIC
    return bytes(out)
