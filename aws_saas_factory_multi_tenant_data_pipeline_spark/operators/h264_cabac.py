"""CABAC entropy coding for H.264 I-slices (ITU-T H.264 §9.3).

Real-world H.264 defaults to main/high profile, which means CABAC —
the r9/r10 decoder covered CAVLC baseline keyframes only, with CABAC
as a named boundary (r10 verdict "Next round" #3). This module adds
the CABAC side for I-slice intra decoding: the arithmetic decoding
engine (§9.3.3.2), I-slice context initialization (§9.3.1.1), the
binarizations and context derivations for every I-slice syntax
element (§9.3.2, §9.3.3.1), the residual block decode
(§9.3.3.1.1.9), and the mirrored ENCODER (§9.3.4) the fixture
pipeline uses.

Verification ladder (tests/test_h264_cabac.py):
- The engine transition tables (rangeTabLPS, transIdxLPS) are the
  NORMATIVE constants of §9.3.3.2.1 — H.265 §9.3.4.3 reuses the
  identical tables, and this host ships libde265/libx265, so the
  transcription is verified byte-for-byte against their constant
  data at test time (the r11 libwebp convention).
- Engine encode→decode roundtrips on adversarial random
  bit/probability sequences (decision, bypass, terminate).
- END-TO-END: the same frame encoded once CAVLC and once CABAC must
  decode to IDENTICAL pixels (the r10 verdict's done-criterion).

Declared seam: CABAC_INIT_I (the §9.3.1.1 Table 9-12 I-slice init
values for ctxIdx 0..275) is a best-effort spec transcription that
cannot be independently re-verified offline — no H.264 decoder
library or CABAC-coded fixture ships on this host (checked; the
visible skip in tests documents it). It is a MODULE-LEVEL INJECTABLE
(the webp SHORT_DISTANCE_MAP convention): any (m, n) vector produces
a self-consistent codec (init values only seed probabilities), so
the encode/decode pair is correct for any seam value, and real-file
interop — when a CABAC file appears — pins or corrects the values
without touching code.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# engine tables (§9.3.3.2.1 Table 9-44 / 9-45 — shared verbatim with
# H.265, test-verified against libde265's rodata)

RANGE_TAB_LPS = (
    (128, 176, 208, 240), (128, 167, 197, 227), (128, 158, 187, 216),
    (123, 150, 178, 205), (116, 142, 169, 195), (111, 135, 160, 185),
    (105, 128, 152, 175), (100, 122, 144, 166), (95, 116, 137, 158),
    (90, 110, 130, 150), (85, 104, 123, 142), (81, 99, 117, 135),
    (77, 94, 111, 128), (73, 89, 105, 122), (69, 85, 100, 116),
    (66, 80, 95, 110), (62, 76, 90, 104), (59, 72, 86, 99),
    (56, 69, 81, 94), (53, 65, 77, 89), (51, 62, 73, 85),
    (48, 59, 69, 80), (46, 56, 66, 76), (43, 53, 63, 72),
    (41, 50, 59, 69), (39, 48, 56, 65), (37, 45, 54, 62),
    (35, 43, 51, 59), (33, 41, 48, 56), (32, 39, 46, 53),
    (30, 37, 43, 50), (29, 35, 41, 48), (27, 33, 39, 45),
    (26, 31, 37, 43), (24, 30, 35, 41), (23, 28, 33, 39),
    (22, 27, 32, 37), (21, 26, 30, 35), (20, 24, 29, 33),
    (19, 23, 27, 31), (18, 22, 26, 30), (17, 21, 25, 28),
    (16, 20, 23, 27), (15, 19, 22, 25), (14, 18, 21, 24),
    (14, 17, 20, 23), (13, 16, 19, 22), (12, 15, 18, 21),
    (12, 14, 17, 20), (11, 14, 16, 19), (11, 13, 15, 18),
    (10, 12, 15, 17), (10, 12, 14, 16), (9, 11, 13, 15),
    (9, 11, 12, 14), (8, 10, 12, 14), (8, 9, 11, 13),
    (7, 9, 11, 12), (7, 9, 10, 12), (7, 8, 10, 11),
    (6, 8, 9, 11), (6, 7, 9, 10), (6, 7, 8, 9),
    (2, 2, 2, 2),
)

TRANS_IDX_LPS = (
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
)

TRANS_IDX_MPS = tuple(min(i + 1, 62) if i < 63 else 63 for i in range(64))

# ---------------------------------------------------------------------------
# I-slice context initialization (§9.3.1.1 Table 9-12, ctxIdx 0..275).
# INJECTABLE SEAM — see module docstring. Entries are (m, n); indices
# that I-slice decoding never touches (P/B mb_type/mvd/ref_idx, field
# coding) are None and raise if ever consulted.

_N = None

CABAC_INIT_I: list = [
    # 0..10: mb_type (SI 0-2 unused here, I 3-10)
    (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
    (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51),
    # 11..59: P/B-slice syntax — never consulted in an I slice
    *([_N] * 49),
    # 60..63: mb_qp_delta
    (0, 41), (0, 63), (0, 63), (0, 63),
    # 64..67: intra_chroma_pred_mode
    (-9, 83), (4, 86), (0, 97), (-7, 72),
    # 68: prev_intra4x4_pred_mode_flag, 69: rem_intra4x4_pred_mode
    (13, 41), (3, 62),
    # 70..72: mb_field_decoding_flag (frame-only scope: unused)
    (0, 45), (-4, 78), (-3, 96),
    # 73..76: coded_block_pattern luma
    (-27, 126), (-28, 98), (-25, 101), (-23, 67),
    # 77..84: coded_block_pattern chroma
    (-28, 82), (-20, 94), (-16, 83), (-22, 110),
    (-21, 91), (-18, 102), (-13, 93), (-29, 127),
    # 85..104: coded_block_flag (cats 0..4)
    (-7, 92), (-5, 89), (-7, 96), (-13, 108),
    (-3, 46), (-1, 65), (-1, 57), (-9, 93),
    (-3, 74), (-9, 92), (-8, 87), (-23, 126),
    (5, 54), (6, 60), (6, 59), (6, 69),
    (-1, 48), (0, 68), (-4, 69), (-8, 88),
    # 105..165: significant_coeff_flag (frame, cats 0..4)
    (-2, 85), (-6, 78), (-1, 75), (-7, 77), (2, 54), (5, 50),
    (-3, 68), (1, 50), (6, 42), (-4, 81), (1, 63), (-4, 70),
    (0, 67), (2, 57), (-2, 76), (11, 35), (4, 64), (1, 61),
    (11, 35), (18, 25), (12, 24), (13, 29), (13, 36), (-10, 93),
    (-7, 73), (-2, 73), (13, 46), (9, 49), (-7, 100), (9, 53),
    (2, 53), (5, 53), (-2, 61), (0, 56), (0, 56), (-13, 63),
    (-5, 60), (-1, 62), (4, 57), (-6, 69), (4, 57), (14, 39),
    (4, 51), (13, 68),
    (3, 64), (1, 61), (9, 63), (7, 50), (16, 39), (5, 44),
    (4, 52), (11, 48), (-5, 60), (-1, 59), (0, 59), (22, 33),
    (5, 44), (14, 43), (-1, 78), (0, 60), (9, 69),
    # 166..226: last_significant_coeff_flag (frame, cats 0..4)
    (11, 28), (2, 40), (3, 44), (0, 49), (0, 46), (2, 44),
    (2, 51), (0, 47), (4, 39), (2, 62), (6, 46), (0, 54),
    (3, 54), (2, 58), (4, 63), (6, 51), (6, 57), (7, 53),
    (6, 52), (6, 55), (11, 45), (14, 36), (8, 53), (-1, 82),
    (7, 55), (-3, 78), (15, 46), (22, 31), (-1, 84), (25, 7),
    (30, -7), (28, 3), (28, 4), (32, 0), (34, -1), (30, 6),
    (30, 6), (32, 9), (31, 19), (26, 27), (26, 30), (37, 20),
    (28, 34), (17, 70),
    (1, 67), (5, 59), (9, 67), (16, 30), (18, 32), (18, 35),
    (22, 29), (24, 31), (23, 38), (18, 43), (20, 41), (11, 63),
    (9, 59), (9, 64), (-1, 94), (-2, 89), (-9, 108),
    # 227..275: coeff_abs_level_minus1 (cats 0..4)
    (-6, 76), (-2, 44), (0, 45), (0, 52), (-3, 64), (-2, 59),
    (-4, 70), (-4, 75), (-8, 82), (-17, 102), (-9, 77), (3, 24),
    (0, 42), (0, 48), (0, 55), (-6, 59), (-7, 71), (-12, 83),
    (-11, 87), (-30, 119), (1, 58), (-3, 29), (-1, 36), (1, 38),
    (2, 43), (-6, 55), (0, 58), (0, 64), (-3, 74), (-10, 90),
    (0, 70), (-4, 29), (5, 31), (7, 42), (1, 59), (-2, 58),
    (-3, 72), (-3, 81), (-11, 97), (0, 58),
    (8, 5), (10, 14), (14, 18), (13, 27), (2, 40), (0, 58),
    (-3, 70), (-6, 79), (-8, 85),
]

#: end_of_slice_flag / I_PCM escape: the terminate context (§9.3.3.2.4)
CTX_TERMINATE = 276


def _validate_tables() -> None:
    assert len(RANGE_TAB_LPS) == 64 and all(len(r) == 4 for r in RANGE_TAB_LPS)
    assert RANGE_TAB_LPS[63] == (2, 2, 2, 2)
    for j in range(62):
        for c in range(4):
            assert RANGE_TAB_LPS[j][c] >= RANGE_TAB_LPS[j + 1][c]
    assert len(TRANS_IDX_LPS) == 64 and TRANS_IDX_LPS[63] == 63
    assert all(TRANS_IDX_LPS[i] <= i + 1 for i in range(64))
    assert len(CABAC_INIT_I) == 276
    for i, mn in enumerate(CABAC_INIT_I):
        if mn is None:
            assert 11 <= i <= 59, f"ctx {i} must be initialized"
        else:
            m, n = mn
            assert -128 <= m <= 127 and -128 <= n <= 127, (i, mn)


_validate_tables()


def init_states(qp: int) -> list:
    """§9.3.1.1: preCtxState = Clip3(1, 126, ((m * Clip3(0, 51, QP))
    >> 4) + n); state 0..62 + MPS flag."""
    qp = max(0, min(51, qp))
    states: list = [None] * 277
    for idx, mn in enumerate(CABAC_INIT_I):
        if mn is None:
            continue
        m, n = mn
        pre = ((m * qp) >> 4) + n
        pre = max(1, min(126, pre))
        if pre <= 63:
            states[idx] = [63 - pre, 0]
        else:
            states[idx] = [pre - 64, 1]
    return states


# ---------------------------------------------------------------------------
# arithmetic decoding engine (§9.3.3.2)


class CabacDecoder:
    __slots__ = ("data", "pos", "range", "offset", "states")

    def __init__(self, data: bytes, bit_pos: int, qp: int):
        """`data` is the RBSP; `bit_pos` the first bit of slice data
        (after cabac_alignment_one_bit padding, byte aligned)."""
        if bit_pos % 8:
            raise ValueError("CABAC slice data must start byte-aligned")
        self.data = data
        self.pos = bit_pos
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()
        if self.offset >= 510:
            raise ValueError("CABAC initial offset out of range (torn stream)")
        self.states = init_states(qp)

    def _bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("torn CABAC stream: read past end")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def decision(self, ctx_idx: int) -> int:
        st = self.states[ctx_idx]
        if st is None:
            raise ValueError(f"CABAC context {ctx_idx} has no I-slice init")
        state, mps = st
        lps = RANGE_TAB_LPS[state][(self.range >> 6) & 3]
        self.range -= lps
        if self.offset >= self.range:
            bit = 1 - mps
            self.offset -= self.range
            self.range = lps
            if state == 0:
                st[1] = 1 - mps
            st[0] = TRANS_IDX_LPS[state]
        else:
            bit = mps
            st[0] = TRANS_IDX_MPS[state]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return bit

    def bypass(self) -> int:
        self.offset = (self.offset << 1) | self._bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return 0


class CabacEncoder:
    """§9.3.4 mirror with outstanding-bit carry resolution."""

    __slots__ = ("bits", "range", "low", "outstanding", "first", "states")

    def __init__(self, qp: int):
        self.bits: list[int] = []
        self.range = 510
        self.low = 0
        self.outstanding = 0
        self.first = True
        self.states = init_states(qp)

    def _put(self, b: int) -> None:
        if self.first:
            self.first = False
        else:
            self.bits.append(b)
        while self.outstanding:
            self.bits.append(1 - b)
            self.outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self.low -= 512
                self._put(1)
            elif self.low < 256:
                self._put(0)
            else:
                self.low -= 256
                self.outstanding += 1
            self.range <<= 1
            self.low <<= 1

    def decision(self, ctx_idx: int, bit: int) -> None:
        st = self.states[ctx_idx]
        if st is None:
            raise ValueError(f"CABAC context {ctx_idx} has no I-slice init")
        state, mps = st
        lps = RANGE_TAB_LPS[state][(self.range >> 6) & 3]
        self.range -= lps
        if bit != mps:
            self.low += self.range
            self.range = lps
            if state == 0:
                st[1] = 1 - mps
            st[0] = TRANS_IDX_LPS[state]
        else:
            st[0] = TRANS_IDX_MPS[state]
        self._renorm()

    def bypass(self, bit: int) -> None:
        self.low <<= 1
        if bit:
            self.low += self.range
        if self.low >= 1024:
            self.low -= 1024
            self._put(1)
        elif self.low < 512:
            self._put(0)
        else:
            self.low -= 512
            self.outstanding += 1

    def terminate(self, bit: int) -> None:
        self.range -= 2
        if bit:
            self.low += self.range
            self.range = 2
            self._renorm()
            # flush (§9.3.4.6): emit the two low bits, LSB forced 1
            self._put((self.low >> 9) & 1)
            self.bits.append((self.low >> 8) & 1)
            self.bits.append(1)
        else:
            self._renorm()

    def tobits(self) -> list[int]:
        return self.bits

# ---------------------------------------------------------------------------
# I-slice syntax (§9.3.2 binarizations + §9.3.3.1 context derivation)

#: residual block categories (§9.3.3.1.3 Table 9-40)
CAT_LUMA_DC, CAT_LUMA_AC, CAT_LUMA_4x4, CAT_CHROMA_DC, CAT_CHROMA_AC = range(5)
_CBF_OFF = (0, 4, 8, 12, 16)    # + 85
_SIG_OFF = (0, 15, 29, 44, 47)  # + 105 (sig) / + 166 (last)
_ABS_OFF = (0, 10, 20, 30, 39)  # + 227
_MAXC = (16, 15, 16, 4, 15)


class MBCtx:
    """Per-MB bookkeeping both CABAC sides share (the encoder mirrors
    the decoder's context state exactly by updating the same fields)."""

    def __init__(self, mw: int, mh: int):
        self.mw, self.mh = mw, mh
        n = mw * mh
        self.cbp_luma = np.zeros(n, dtype=np.int16)
        self.cbp_chroma = np.zeros(n, dtype=np.int16)
        self.chroma_mode = np.zeros(n, dtype=np.int16)
        self.is_i4 = np.zeros(n, dtype=bool)
        self.is_pcm = np.zeros(n, dtype=bool)
        self.y2_cbf = np.zeros(n, dtype=np.int8)
        self.cdc_cbf = np.zeros((2, n), dtype=np.int8)
        self.qp_delta_nz = np.zeros(n, dtype=bool)
        self.slice_of = np.full(n, -1, dtype=np.int32)
        self.done = np.zeros(n, dtype=bool)
        self.luma_cbf = np.zeros((mh * 4, mw * 4), dtype=np.int8)
        self.c_cbf = [np.zeros((mh * 2, mw * 2), dtype=np.int8) for _ in range(2)]
        self.prev_addr_in_slice: int | None = None

    def _avail(self, mbx: int, mby: int, slice_id: int) -> int | None:
        if not (0 <= mbx < self.mw and 0 <= mby < self.mh):
            return None
        a = mby * self.mw + mbx
        if self.slice_of[a] != slice_id or not self.done[a]:
            return None
        return a

    # -- syntax-element ctxIdxInc derivations (§9.3.3.1.1.x) ---------------

    def mb_type_inc(self, addr: int, slice_id: int) -> int:
        mbx, mby = addr % self.mw, addr // self.mw
        inc = 0
        for n in (self._avail(mbx - 1, mby, slice_id),
                  self._avail(mbx, mby - 1, slice_id)):
            if n is not None and not self.is_i4[n]:
                inc += 1
        return inc

    def chroma_mode_inc(self, addr: int, slice_id: int) -> int:
        mbx, mby = addr % self.mw, addr // self.mw
        inc = 0
        for n in (self._avail(mbx - 1, mby, slice_id),
                  self._avail(mbx, mby - 1, slice_id)):
            if n is not None and not self.is_pcm[n] and self.chroma_mode[n] != 0:
                inc += 1
        return inc

    def cbp_luma_inc(self, addr: int, slice_id: int, blk8: int, cur_bits: int) -> int:
        """§9.3.3.1.1.4: condTermFlagN = 1 when the neighbouring 8x8
        block's cbp bit is ZERO (inverted); unavailable → 0."""
        mbx, mby = addr % self.mw, addr // self.mw
        bx, by = blk8 & 1, blk8 >> 1

        def bit(nx, ny, nblk, same_mb):
            if same_mb:
                return (cur_bits >> nblk) & 1
            n = self._avail(nx, ny, slice_id)
            if n is None:
                return None
            if self.is_pcm[n]:
                return 1
            return (int(self.cbp_luma[n]) >> nblk) & 1

        left = (
            bit(mbx, mby, blk8 - 1, True)
            if bx
            else bit(mbx - 1, mby, blk8 + 1, False)
        )
        above = (
            bit(mbx, mby, blk8 - 2, True)
            if by
            else bit(mbx, mby - 1, blk8 + 2, False)
        )
        inc = 0
        if left is not None and left == 0:
            inc += 1
        if above is not None and above == 0:
            inc += 2
        return inc

    def cbp_chroma_inc(self, addr: int, slice_id: int, binidx: int) -> int:
        mbx, mby = addr % self.mw, addr // self.mw
        inc = 0
        for k, n in enumerate((self._avail(mbx - 1, mby, slice_id),
                               self._avail(mbx, mby - 1, slice_id))):
            if n is None:
                continue
            c = 2 if self.is_pcm[n] else int(self.cbp_chroma[n])
            cond = (c != 0) if binidx == 0 else (c == 2)
            if cond:
                inc += 1 << k
        return inc

    def qp_delta_inc(self) -> int:
        p = self.prev_addr_in_slice
        return 1 if p is not None and self.qp_delta_nz[p] else 0

    # -- coded_block_flag neighbours (§9.3.3.1.1.9) -------------------------

    def _cbf_term(self, n_addr, val) -> int:
        """condTermFlagN given resolved neighbour (None = MB missing →
        1 for intra; (addr, v) = use v)."""
        if n_addr is None:
            return 1
        return int(val)

    def cbf_inc_mb(self, addr: int, slice_id: int, which) -> int:
        """MB-granular blocks (luma DC / chroma DC): which(n) -> cbf."""
        mbx, mby = addr % self.mw, addr // self.mw
        inc = 0
        for k, n in enumerate((self._avail(mbx - 1, mby, slice_id),
                               self._avail(mbx, mby - 1, slice_id))):
            if n is None:
                term = 1  # unavailable neighbour of an intra MB
            elif self.is_pcm[n]:
                term = 1
            else:
                term = int(which(n))
            inc += term << k
        return inc

    def cbf_inc_blk(self, addr: int, slice_id: int, grid, gx: int, gy: int,
                    scale: int) -> int:
        """4x4-granular blocks (luma / chroma AC): neighbours via the
        cbf grids; same-MB earlier blocks are already recorded."""
        inc = 0
        for k, (nx, ny) in enumerate(((gx - 1, gy), (gx, gy - 1))):
            if not (0 <= nx < self.mw * scale and 0 <= ny < self.mh * scale):
                term = 1  # outside the picture: intra default
            else:
                owner = (ny // scale) * self.mw + (nx // scale)
                if owner == addr:
                    term = int(grid[ny, nx])
                elif self.slice_of[owner] != slice_id or not self.done[owner]:
                    term = 1
                elif self.is_pcm[owner]:
                    term = 1
                else:
                    term = int(grid[ny, nx])
            inc += term << k
        return inc


class CabacSliceReader:
    """Syntax-element decode for one I slice."""

    def __init__(self, dec: CabacDecoder, ctx: MBCtx):
        self.d = dec
        self.ctx = ctx

    # -- macroblock layer ----------------------------------------------------

    def mb_type(self, addr: int, slice_id: int) -> int:
        d = self.d
        if d.decision(3 + self.ctx.mb_type_inc(addr, slice_id)) == 0:
            return 0  # I_NxN
        if d.terminate():
            return 25  # I_PCM
        t = 1
        t += 12 * d.decision(6)
        if d.decision(7):
            t += 4 + 4 * d.decision(8)
        t += 2 * d.decision(9)
        t += d.decision(10)
        return t

    def i4_mode(self, pred: int) -> int:
        d = self.d
        if d.decision(68):
            return pred
        rem = d.decision(69)
        rem += 2 * d.decision(69)
        rem += 4 * d.decision(69)
        return rem if rem < pred else rem + 1

    def chroma_mode(self, addr: int, slice_id: int) -> int:
        d = self.d
        if d.decision(64 + self.ctx.chroma_mode_inc(addr, slice_id)) == 0:
            return 0
        if d.decision(67) == 0:
            return 1
        return 3 if d.decision(67) else 2

    def cbp(self, addr: int, slice_id: int) -> tuple[int, int]:
        d = self.d
        luma = 0
        for blk8 in range(4):
            inc = self.ctx.cbp_luma_inc(addr, slice_id, blk8, luma)
            if d.decision(73 + inc):
                luma |= 1 << blk8
        chroma = 0
        if d.decision(77 + self.ctx.cbp_chroma_inc(addr, slice_id, 0)):
            chroma = 2 if d.decision(81 + self.ctx.cbp_chroma_inc(addr, slice_id, 1)) else 1
        return luma, chroma

    def qp_delta(self) -> int:
        d = self.d
        if d.decision(60 + self.ctx.qp_delta_inc()) == 0:
            return 0
        k = 1
        if d.decision(62):
            k = 2
            while k < 87 and d.decision(63):
                k += 1
            if k >= 87:
                raise ValueError("mb_qp_delta unary run out of range")
        # inverse of the §9.3.2.7 mapping: odd k → positive
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def end_of_slice(self) -> int:
        return self.d.terminate()

    # -- residual (§9.3.3.1.1.9) ----------------------------------------------

    def residual(self, cat: int, cbf_inc: int):
        """Returns scan-order coefficients (list of _MAXC[cat]) or None
        when coded_block_flag = 0."""
        d = self.d
        if d.decision(85 + _CBF_OFF[cat] + cbf_inc) == 0:
            return None
        maxc = _MAXC[cat]
        sig = [0] * maxc
        last_found = False
        for i in range(maxc - 1):
            if d.decision(105 + _SIG_OFF[cat] + i):
                sig[i] = 1
                if d.decision(166 + _SIG_OFF[cat] + i):
                    last_found = True
                    break
        if not last_found:
            sig[maxc - 1] = 1
        coeffs = [0] * maxc
        num_eq1 = num_gt1 = 0
        cap = 4 - (1 if cat == CAT_CHROMA_DC else 0)
        for i in range(maxc - 1, -1, -1):
            if not sig[i]:
                continue
            inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
            lm1 = d.decision(227 + _ABS_OFF[cat] + inc0)
            if lm1:
                ctx_n = 227 + _ABS_OFF[cat] + 5 + min(cap, num_gt1)
                while lm1 < 14 and d.decision(ctx_n):
                    lm1 += 1
                if lm1 == 14:
                    k = 0
                    while d.bypass():
                        lm1 += 1 << k
                        k += 1
                        if k > 30:
                            raise ValueError("coeff_abs_level EG0 out of range")
                    while k:
                        k -= 1
                        lm1 += d.bypass() << k
            level = lm1 + 1
            if d.bypass():
                level = -level
            coeffs[i] = level
            if abs(level) > 1:
                num_gt1 += 1
            else:
                num_eq1 += 1
        return coeffs


class CabacSliceWriter:
    """Exact mirror of CabacSliceReader (fixture encoder side)."""

    def __init__(self, enc: CabacEncoder, ctx: MBCtx):
        self.e = enc
        self.ctx = ctx

    def mb_type(self, addr: int, slice_id: int, mb_type: int) -> None:
        e = self.e
        inc = self.ctx.mb_type_inc(addr, slice_id)
        if mb_type == 0:
            e.decision(3 + inc, 0)
            return
        if mb_type == 25:
            raise ValueError("I_PCM inside a CABAC slice: fixture boundary")
        e.decision(3 + inc, 1)
        e.terminate(0)
        t = mb_type - 1
        e.decision(6, 1 if t >= 12 else 0)
        cbpc = (t % 12) // 4
        pm = t % 4
        if cbpc == 0:
            e.decision(7, 0)
        else:
            e.decision(7, 1)
            e.decision(8, cbpc - 1)
        e.decision(9, (pm >> 1) & 1)
        e.decision(10, pm & 1)

    def i4_mode(self, pred: int, mode: int) -> None:
        e = self.e
        if mode == pred:
            e.decision(68, 1)
            return
        e.decision(68, 0)
        rem = mode if mode < pred else mode - 1
        e.decision(69, rem & 1)
        e.decision(69, (rem >> 1) & 1)
        e.decision(69, (rem >> 2) & 1)

    def chroma_mode(self, addr: int, slice_id: int, mode: int) -> None:
        e = self.e
        inc = self.ctx.chroma_mode_inc(addr, slice_id)
        if mode == 0:
            e.decision(64 + inc, 0)
            return
        e.decision(64 + inc, 1)
        if mode == 1:
            e.decision(67, 0)
            return
        e.decision(67, 1)
        e.decision(67, 1 if mode == 3 else 0)

    def cbp(self, addr: int, slice_id: int, luma: int, chroma: int) -> None:
        e = self.e
        cur = 0
        for blk8 in range(4):
            inc = self.ctx.cbp_luma_inc(addr, slice_id, blk8, cur)
            bit = (luma >> blk8) & 1
            e.decision(73 + inc, bit)
            cur |= bit << blk8
        e.decision(77 + self.ctx.cbp_chroma_inc(addr, slice_id, 0),
                   1 if chroma else 0)
        if chroma:
            e.decision(81 + self.ctx.cbp_chroma_inc(addr, slice_id, 1),
                       1 if chroma == 2 else 0)

    def qp_delta(self, delta: int) -> None:
        e = self.e
        k = 2 * delta - 1 if delta > 0 else -2 * delta
        if k == 0:
            e.decision(60 + self.ctx.qp_delta_inc(), 0)
            return
        e.decision(60 + self.ctx.qp_delta_inc(), 1)
        for j in range(1, k):
            e.decision(62 if j == 1 else 63, 1)
        e.decision(62 if k == 1 else 63, 0)

    def end_of_slice(self, bit: int) -> None:
        self.e.terminate(bit)

    def residual(self, cat: int, cbf_inc: int, coeffs) -> bool:
        """Returns True when coded (any nonzero)."""
        e = self.e
        maxc = _MAXC[cat]
        vals = list(coeffs or [])
        vals += [0] * (maxc - len(vals))
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            e.decision(85 + _CBF_OFF[cat] + cbf_inc, 0)
            return False
        e.decision(85 + _CBF_OFF[cat] + cbf_inc, 1)
        last = nz[-1]
        for i in range(maxc - 1):
            sig = 1 if vals[i] else 0
            e.decision(105 + _SIG_OFF[cat] + i, sig)
            if sig:
                e.decision(166 + _SIG_OFF[cat] + i, 1 if i == last else 0)
                if i == last:
                    break
        num_eq1 = num_gt1 = 0
        cap = 4 - (1 if cat == CAT_CHROMA_DC else 0)
        for i in range(maxc - 1, -1, -1):
            v = vals[i]
            if not v:
                continue
            a = abs(v)
            lm1 = a - 1
            inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
            e.decision(227 + _ABS_OFF[cat] + inc0, 1 if lm1 else 0)
            if lm1:
                ctx_n = 227 + _ABS_OFF[cat] + 5 + min(cap, num_gt1)
                for _ in range(min(lm1, 14) - 1):
                    e.decision(ctx_n, 1)
                if lm1 < 14:
                    e.decision(ctx_n, 0)
                else:
                    suf = lm1 - 14
                    k = 0
                    while suf >= (1 << k):
                        e.bypass(1)
                        suf -= 1 << k
                        k += 1
                    e.bypass(0)
                    while k:
                        k -= 1
                        e.bypass((suf >> k) & 1)
            e.bypass(1 if v < 0 else 0)
            if a > 1:
                num_gt1 += 1
            else:
                num_eq1 += 1
        return True

# ---------------------------------------------------------------------------
# slice-level decode (wired in by operators/h264.py decode_idr when
# pps.entropy_coding_mode_flag = 1) — reconstruction reuses the CAVLC
# path's spec-exact helpers verbatim.


def decode_cabac_slice(pic, rbsp: bytes, bits, hdr: dict, slice_id: int) -> None:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators import h264 as H

    # cabac_alignment_one_bit: pad to the next byte with 1-bits (§7.3.4)
    while bits.pos % 8:
        if bits.u(1) != 1:
            raise ValueError("cabac_alignment_one_bit is zero (torn stream)")
    qp = hdr["qp"]
    dec = CabacDecoder(rbsp, bits.pos, qp)
    if getattr(pic, "cabac_ctx", None) is None:
        pic.cabac_ctx = MBCtx(pic.mw, pic.mh)
    ctx = pic.cabac_ctx
    ctx.prev_addr_in_slice = None
    rd = CabacSliceReader(dec, ctx)
    addr = hdr["first_mb"]
    n_mbs = pic.mw * pic.mh
    while addr < n_mbs:
        ctx.slice_of[addr] = slice_id
        qp = _decode_mb_cabac(pic, rd, addr, slice_id, qp)
        ctx.done[addr] = True
        ctx.prev_addr_in_slice = addr
        addr += 1
        if rd.end_of_slice():
            break


def _decode_mb_cabac(pic, rd: CabacSliceReader, addr: int, slice_id: int,
                     qp: int) -> int:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        _BLK4,
        _ZZ,
        _chroma_neighbours,
        _chroma_qp,
        _dequant_4x4,
        _inv_4x4,
        _inv_hadamard_4x4,
        _luma_neighbours,
        _pred4x4,
        _pred16x16,
        _pred_chroma,
        _scale_chroma_dc,
        _scale_luma_dc,
    )

    ctx = rd.ctx
    mw = pic.mw
    mbx, mby = addr % mw, addr // mw
    px0, py0 = mbx * 16, mby * 16
    cx0, cy0 = mbx * 8, mby * 8
    g0x, g0y = mbx * 4, mby * 4
    pic.mb_slice[addr] = slice_id

    mb_type = rd.mb_type(addr, slice_id)
    if mb_type == 25:
        raise ValueError(
            "I_PCM inside a CABAC slice: declared boundary (raw-sample "
            "re-alignment + engine re-init; PCM fixtures use CAVLC)"
        )

    if mb_type == 0:  # I_NxN
        pic.is_i4[addr] = True
        ctx.is_i4[addr] = True
        modes = []
        for blk in range(16):
            bx, by = _BLK4[blk]
            gbx, gby = g0x + bx, g0y + by

            def nmode(x, y):
                if not pic._blk_ok(x, y, slice_id, addr):
                    return 2
                m = int(pic.i4_mode[y, x])
                return m if m >= 0 else 2

            def nmode_cur(x, y):
                if 0 <= x < pic.mw * 4 and 0 <= y < pic.mh * 4 and (
                    (y // 4) * mw + (x // 4) == addr
                ):
                    m = int(pic.i4_mode[y, x])
                    return m if m >= 0 else 2
                return nmode(x, y)

            pred = min(nmode_cur(gbx - 1, gby), nmode_cur(gbx, gby - 1))
            mode = rd.i4_mode(pred)
            modes.append(mode)
            pic.i4_mode[gby, gbx] = mode
        chroma_mode = rd.chroma_mode(addr, slice_id)
        cbp_luma, cbp_chroma = rd.cbp(addr, slice_id)
        delta = 0
        if cbp_luma or cbp_chroma:
            delta = rd.qp_delta()
            qp = (qp + delta + 52) % 52
        ctx.qp_delta_nz[addr] = delta != 0
        luma_coeffs = {}
        for blk in range(16):
            bx, by = _BLK4[blk]
            gbx, gby = g0x + bx, g0y + by
            if cbp_luma & (1 << (blk >> 2)):
                inc = ctx.cbf_inc_blk(addr, slice_id, ctx.luma_cbf, gbx, gby, 4)
                c = rd.residual(CAT_LUMA_4x4, inc)
                if c is not None:
                    luma_coeffs[blk] = c
                ctx.luma_cbf[gby, gbx] = 1 if c is not None else 0
                pic.luma_tc[gby, gbx] = (
                    sum(1 for v in c if v) if c is not None else 0
                )
            else:
                ctx.luma_cbf[gby, gbx] = 0
                pic.luma_tc[gby, gbx] = 0
        cb_dc, cr_dc, cb_ac, cr_ac = _chroma_residual_cabac(
            pic, rd, cbp_chroma, mbx, mby, slice_id, addr
        )
        for blk in range(16):
            bx, by = _BLK4[blk]
            x0, y0 = px0 + bx * 4, py0 + by * 4
            l, t, tl, hl, ht, htl = _luma_neighbours(pic, x0, y0, 4, slice_id, addr)
            p = _pred4x4(modes[blk], l, t, tl, hl, ht, htl)
            if blk in luma_coeffs:
                mat = np.zeros((4, 4), dtype=np.int64)
                for i, v in enumerate(luma_coeffs[blk]):
                    mat[_ZZ[i]] = v
                r = _inv_4x4(_dequant_4x4(mat, qp, skip_dc=False))
                p = p + ((r + 32) >> 6)
            pic.Y[y0 : y0 + 4, x0 : x0 + 4] = np.clip(p, 0, 255)
            pic.blk_done[g0y + by, g0x + bx] = True
        ctx.cbp_luma[addr] = cbp_luma
        ctx.y2_cbf[addr] = 0
    else:  # I_16x16
        t16 = mb_type - 1
        pm = t16 % 4
        cbp_chroma = (t16 // 4) % 3
        cbp_luma = 15 if t16 >= 12 else 0
        chroma_mode = rd.chroma_mode(addr, slice_id)
        delta = rd.qp_delta()
        qp = (qp + delta + 52) % 52
        ctx.qp_delta_nz[addr] = delta != 0
        inc = ctx.cbf_inc_mb(addr, slice_id, lambda n: ctx.y2_cbf[n])
        dc_scan = rd.residual(CAT_LUMA_DC, inc)
        ctx.y2_cbf[addr] = 1 if dc_scan is not None else 0
        dc_scan = dc_scan or [0] * 16
        luma_coeffs = {}
        if cbp_luma:
            for blk in range(16):
                bx, by = _BLK4[blk]
                gbx, gby = g0x + bx, g0y + by
                inc = ctx.cbf_inc_blk(addr, slice_id, ctx.luma_cbf, gbx, gby, 4)
                c = rd.residual(CAT_LUMA_AC, inc)
                if c is not None:
                    luma_coeffs[blk] = c
                ctx.luma_cbf[gby, gbx] = 1 if c is not None else 0
                pic.luma_tc[gby, gbx] = (
                    sum(1 for v in c if v) if c is not None else 0
                )
        else:
            ctx.luma_cbf[g0y : g0y + 4, g0x : g0x + 4] = 0
            pic.luma_tc[g0y : g0y + 4, g0x : g0x + 4] = 0
        cb_dc, cr_dc, cb_ac, cr_ac = _chroma_residual_cabac(
            pic, rd, cbp_chroma, mbx, mby, slice_id, addr
        )
        l, tt, tl, hl, ht, _ = _luma_neighbours(pic, px0, py0, 16, slice_id, addr)
        pred = _pred16x16(pm, l, tt, tl, hl, ht)
        dc_mat = np.zeros((4, 4), dtype=np.int64)
        for i, v in enumerate(dc_scan):
            dc_mat[_ZZ[i]] = v
        dc = _scale_luma_dc(_inv_hadamard_4x4(dc_mat), qp)
        for blk in range(16):
            bx, by = _BLK4[blk]
            mat = np.zeros((4, 4), dtype=np.int64)
            if blk in luma_coeffs:
                for i, v in enumerate(luma_coeffs[blk]):
                    mat[_ZZ[1 + i]] = v
            d = _dequant_4x4(mat, qp, skip_dc=True)
            d[0, 0] = dc[by, bx]
            r = (_inv_4x4(d) + 32) >> 6
            x0, y0 = px0 + bx * 4, py0 + by * 4
            pic.Y[y0 : y0 + 4, x0 : x0 + 4] = np.clip(
                pred[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] + r, 0, 255
            )
            pic.blk_done[g0y + by, g0x + bx] = True
        pic.i4_mode[g0y : g0y + 4, g0x : g0x + 4] = 2
        ctx.cbp_luma[addr] = cbp_luma

    # chroma reconstruction — identical math to the CAVLC path
    ctx.cbp_chroma[addr] = cbp_chroma
    ctx.chroma_mode[addr] = chroma_mode
    qpc = _chroma_qp(qp, pic.pps["chroma_qp_off"])
    for comp, plane, dc_scan_c, ac in (
        (0, pic.Cb, cb_dc, cb_ac),
        (1, pic.Cr, cr_dc, cr_ac),
    ):
        l, t, tl, hl, ht = _chroma_neighbours(pic, comp, cx0, cy0, slice_id, addr)
        pred = _pred_chroma(chroma_mode, l, t, tl, hl, ht)
        f = np.array(
            [[dc_scan_c[0], dc_scan_c[1]], [dc_scan_c[2], dc_scan_c[3]]],
            dtype=np.int64,
        )
        g = np.zeros((2, 2), dtype=np.int64)
        g[0, 0] = f[0, 0] + f[0, 1] + f[1, 0] + f[1, 1]
        g[0, 1] = f[0, 0] - f[0, 1] + f[1, 0] - f[1, 1]
        g[1, 0] = f[0, 0] + f[0, 1] - f[1, 0] - f[1, 1]
        g[1, 1] = f[0, 0] - f[0, 1] - f[1, 0] + f[1, 1]
        dcs = _scale_chroma_dc(g, qpc)
        for cblk in range(4):
            bx, by = cblk % 2, cblk // 2
            mat = np.zeros((4, 4), dtype=np.int64)
            if cblk in ac:
                for i, v in enumerate(ac[cblk]):
                    mat[_ZZ[1 + i]] = v
            d = _dequant_4x4(mat, qpc, skip_dc=True)
            d[0, 0] = dcs[by, bx]
            r = (_inv_4x4(d) + 32) >> 6
            x0, y0 = cx0 + bx * 4, cy0 + by * 4
            plane[y0 : y0 + 4, x0 : x0 + 4] = np.clip(
                pred[by * 4 : by * 4 + 4, bx * 4 : bx * 4 + 4] + r, 0, 255
            )
    pic.mb_decoded[addr] = True
    return qp


def _chroma_residual_cabac(pic, rd, cbp_chroma, mbx, mby, slice_id, addr):
    ctx = rd.ctx
    cb_dc = [0, 0, 0, 0]
    cr_dc = [0, 0, 0, 0]
    cb_ac: dict[int, list[int]] = {}
    cr_ac: dict[int, list[int]] = {}
    if cbp_chroma:
        for comp, out in ((0, cb_dc), (1, cr_dc)):
            inc = ctx.cbf_inc_mb(addr, slice_id, lambda n, c=comp: ctx.cdc_cbf[c][n])
            c = rd.residual(CAT_CHROMA_DC, inc)
            ctx.cdc_cbf[comp][addr] = 1 if c is not None else 0
            if c is not None:
                out[:] = c
    else:
        ctx.cdc_cbf[0][addr] = 0
        ctx.cdc_cbf[1][addr] = 0
    if cbp_chroma == 2:
        for comp, store, grid, tc_grid in (
            (0, cb_ac, ctx.c_cbf[0], pic.cb_tc),
            (1, cr_ac, ctx.c_cbf[1], pic.cr_tc),
        ):
            for cblk in range(4):
                cbx = mbx * 2 + cblk % 2
                cby = mby * 2 + cblk // 2
                inc = ctx.cbf_inc_blk(addr, slice_id, grid, cbx, cby, 2)
                c = rd.residual(CAT_CHROMA_AC, inc)
                grid[cby, cbx] = 1 if c is not None else 0
                tc_grid[cby, cbx] = sum(1 for v in c if v) if c is not None else 0
                if c is not None:
                    store[cblk] = c
    else:
        for grid, tc_grid in ((ctx.c_cbf[0], pic.cb_tc), (ctx.c_cbf[1], pic.cr_tc)):
            grid[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
            tc_grid[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
    return cb_dc, cr_dc, cb_ac, cr_ac

# ---------------------------------------------------------------------------
# fixture encoder: the CABAC twin of operators/h264.py encode_idr —
# same per-MB spec dicts, entropy_coding_mode_flag = 1.


def _pps_rbsp_cabac() -> bytes:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import _BitW

    w = _BitW()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.w(1, 1)  # entropy_coding_mode: CABAC
    w.w(0, 1)
    w.ue(0)
    w.ue(0)
    w.ue(0)
    w.w(0, 1)
    w.w(0, 2)
    w.se(0)  # pic_init_qp_minus26 -> 26
    w.se(0)
    w.se(0)
    w.w(1, 1)  # deblocking_filter_control_present
    w.w(0, 1)
    w.w(0, 1)
    w.trailing()
    return w.payload()


def encode_idr_cabac(mb_w: int, mb_h: int, mbs: list, qp: int = 40,
                     crop=(0, 0, 0, 0)) -> bytes:
    """Annex-B SPS+PPS+IDR stream with CABAC slice data. Accepts the
    SAME per-MB specs as h264.encode_idr ('i16'/'i4'; 'pcm' is the
    declared CABAC fixture boundary). Single slice."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        _BLK4,
        _BitW,
        _nal,
        _sps_rbsp,
    )

    if len(mbs) != mb_w * mb_h:
        raise ValueError("need one MB spec per macroblock")
    out = _nal(3, 7, _sps_rbsp(mb_w, mb_h, crop)) + _nal(3, 8, _pps_rbsp_cabac())
    w = _BitW()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I
    w.ue(0)  # pps_id
    w.w(0, 4)  # frame_num
    w.ue(0)  # idr_pic_id
    w.w(0, 1)
    w.w(0, 1)
    w.se(qp - 26)  # slice_qp_delta
    w.ue(1)  # disable_deblocking_filter_idc
    while w.n % 8:
        w.w(1, 1)  # cabac_alignment_one_bit
    enc = CabacEncoder(qp)
    ctx = MBCtx(mb_w, mb_h)
    i4_modes = np.full((mb_h * 4, mb_w * 4), -1, dtype=np.int8)
    wr = CabacSliceWriter(enc, ctx)
    slice_id = 1
    n = mb_w * mb_h
    for addr in range(n):
        ctx.slice_of[addr] = slice_id
        _encode_mb_cabac(wr, ctx, i4_modes, addr, mbs[addr], slice_id)
        ctx.done[addr] = True
        ctx.prev_addr_in_slice = addr
        wr.end_of_slice(1 if addr == n - 1 else 0)
    for b in enc.tobits():
        w.w(b, 1)
    # CABAC slice data ends byte-aligned with the flush's trailing 1
    # acting as the stop bit; pad with zero bits to a whole byte
    while w.n % 8:
        w.w(0, 1)
    return out + _nal(3, 5, w.payload())


def _encode_mb_cabac(wr: CabacSliceWriter, ctx: MBCtx, i4_modes, addr: int,
                     mb: dict, slice_id: int) -> None:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import _BLK4

    mw = ctx.mw
    mbx, mby = addr % mw, addr // mw
    g0x, g0y = mbx * 4, mby * 4
    kind = mb["kind"]
    if kind == "pcm":
        raise ValueError("I_PCM inside a CABAC slice: fixture boundary")

    cb_dc = list(mb.get("cb_dc") or [0, 0, 0, 0])
    cr_dc = list(mb.get("cr_dc") or [0, 0, 0, 0])
    cb_ac = dict(mb.get("cb_ac") or {})
    cr_ac = dict(mb.get("cr_ac") or {})
    has_c_ac = any(any(v) for v in list(cb_ac.values()) + list(cr_ac.values()))
    has_c_dc = any(cb_dc) or any(cr_dc)
    cbp_chroma = 2 if has_c_ac else (1 if has_c_dc else 0)
    chroma_mode = mb.get("chroma_mode", 0)

    if kind == "i16":
        ac = dict(mb.get("ac") or {})
        has_ac = any(any(v) for v in ac.values())
        cbp_luma = 15 if has_ac else 0
        mb_type = 1 + mb["pred"] + 4 * cbp_chroma + (12 if cbp_luma else 0)
        wr.mb_type(addr, slice_id, mb_type)
        wr.chroma_mode(addr, slice_id, chroma_mode)
        wr.qp_delta(0)
        ctx.qp_delta_nz[addr] = False
        dc = list(mb.get("dc") or [])
        dc = dc + [0] * (16 - len(dc))
        inc = ctx.cbf_inc_mb(addr, slice_id, lambda n: ctx.y2_cbf[n])
        coded = wr.residual(CAT_LUMA_DC, inc, dc)
        ctx.y2_cbf[addr] = 1 if coded else 0
        if cbp_luma:
            for blk in range(16):
                bx, by = _BLK4[blk]
                gbx, gby = g0x + bx, g0y + by
                coeffs = list(ac.get(blk) or [0] * 15)
                inc = ctx.cbf_inc_blk(addr, slice_id, ctx.luma_cbf, gbx, gby, 4)
                coded = wr.residual(CAT_LUMA_AC, inc, coeffs)
                ctx.luma_cbf[gby, gbx] = 1 if coded else 0
        else:
            ctx.luma_cbf[g0y : g0y + 4, g0x : g0x + 4] = 0
        i4_modes[g0y : g0y + 4, g0x : g0x + 4] = 2
        ctx.cbp_luma[addr] = cbp_luma
    elif kind == "i4":
        coeffs = dict(mb.get("coeffs") or {})
        cbp_luma = 0
        for blk, c in coeffs.items():
            if any(c):
                cbp_luma |= 1 << (blk >> 2)
        wr.mb_type(addr, slice_id, 0)
        ctx.is_i4[addr] = True
        modes = mb["modes"]
        for blk in range(16):
            bx, by = _BLK4[blk]
            gbx, gby = g0x + bx, g0y + by

            def nmode(x, y):
                if not (0 <= x < mw * 4 and 0 <= y < ctx.mh * 4):
                    return 2
                owner = (y // 4) * mw + (x // 4)
                if ctx.slice_of[owner] != slice_id:
                    return 2
                if not ctx.done[owner] and owner != addr:
                    return 2
                m = int(i4_modes[y, x])
                return m if m >= 0 else 2

            pred = min(nmode(gbx - 1, gby), nmode(gbx, gby - 1))
            wr.i4_mode(pred, modes[blk])
            i4_modes[gby, gbx] = modes[blk]
        wr.chroma_mode(addr, slice_id, chroma_mode)
        wr.cbp(addr, slice_id, cbp_luma, cbp_chroma)
        if cbp_luma or cbp_chroma:
            wr.qp_delta(0)
        ctx.qp_delta_nz[addr] = False
        for blk in range(16):
            bx, by = _BLK4[blk]
            gbx, gby = g0x + bx, g0y + by
            if cbp_luma & (1 << (blk >> 2)):
                c = list(coeffs.get(blk) or [0] * 16)
                inc = ctx.cbf_inc_blk(addr, slice_id, ctx.luma_cbf, gbx, gby, 4)
                coded = wr.residual(CAT_LUMA_4x4, inc, c)
                ctx.luma_cbf[gby, gbx] = 1 if coded else 0
            else:
                ctx.luma_cbf[gby, gbx] = 0
        ctx.cbp_luma[addr] = cbp_luma
    else:
        raise ValueError(f"unknown MB kind {kind!r}")

    # chroma residuals (shared)
    ctx.cbp_chroma[addr] = cbp_chroma
    ctx.chroma_mode[addr] = chroma_mode
    if cbp_chroma:
        for comp, dcv in ((0, cb_dc), (1, cr_dc)):
            inc = ctx.cbf_inc_mb(addr, slice_id, lambda n, c=comp: ctx.cdc_cbf[c][n])
            coded = wr.residual(CAT_CHROMA_DC, inc, dcv)
            ctx.cdc_cbf[comp][addr] = 1 if coded else 0
    else:
        ctx.cdc_cbf[0][addr] = 0
        ctx.cdc_cbf[1][addr] = 0
    if cbp_chroma == 2:
        for comp, store, grid in ((0, cb_ac, ctx.c_cbf[0]), (1, cr_ac, ctx.c_cbf[1])):
            for cblk in range(4):
                cbx = mbx * 2 + cblk % 2
                cby = mby * 2 + cblk // 2
                c = list(store.get(cblk) or [0] * 15)
                inc = ctx.cbf_inc_blk(addr, slice_id, grid, cbx, cby, 2)
                coded = wr.residual(CAT_CHROMA_AC, inc, c)
                grid[cby, cbx] = 1 if coded else 0
    else:
        for grid in (ctx.c_cbf[0], ctx.c_cbf[1]):
            grid[mby * 2 : mby * 2 + 2, mbx * 2 : mbx * 2 + 2] = 0
