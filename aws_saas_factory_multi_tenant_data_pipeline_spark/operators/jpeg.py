"""JPEG codec — stdlib + numpy, built from the public spec
(ITU-T T.81 / ISO 10918-1; tables from Annex K, color transform from
ITU-T T.871 JFIF).

The container ships no image libraries, so like the PNG codec this is a
from-the-spec implementation. DECODER: baseline sequential DCT (SOF0/1)
AND progressive (SOF2 — spectral selection, successive approximation,
EOB runs, DC/AC refinement scans per T.81 G.2), Huffman entropy coding,
8-bit samples, grayscale or YCbCr with arbitrary sampling factors
(4:4:4, 4:2:0, 4:2:2 all fall out of the general H×V handling), restart
markers, APPn/COM skipping. Scans accumulate into per-component
coefficient planes; one batched dequantize+IDCT renders at EOI — so
baseline is just the one-scan special case of the same machinery.
Arithmetic coding and hierarchical/lossless modes are rejected with a
clear ValueError — different compression modes, not tears.

Tear contract (same as PNG): :func:`decode_jpeg` either returns pixels
or raises ``ValueError`` — never an IndexError/struct.error/infinite
loop — so a corrupt payload in a 100 TB crawl becomes a quarantine row,
not an executor crash. Pinned by mutation fuzz in
``tests/test_multimodal_jpeg.py``.

The encoder (:func:`encode_jpeg`) writes baseline 4:4:4 or 4:2:0 with
the Annex K example tables scaled by the libjpeg quality formula; it
exists so tests can state decoded values ANALYTICALLY (solid-color
blocks are DC-only: decoded = round(q·round(8·(v−128)/q)/8)+128) and so
the aHash/dedup pipeline has real JPEG payloads to chew on.

Scale shape: the codec runs inside Arrow ``mapInPandas`` passes
(`operators/multimodal.py`), one payload per call, partition-local —
payloads never transit the driver and the plumbing is the same as every
other media format.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K example tables (public spec constants) -------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# K.1 luminance / K.2 chrominance quantization tables (zigzag order here
# is NOT used — these are in natural row-major order)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# K.3 typical Huffman tables: (bits[1..16], huffval)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8×8 DCT basis: C[u, x] = c(u)/2 · cos((2x+1)uπ/16); spatial = Cᵀ·S·C
_C = np.zeros((8, 8))
for _u in range(8):
    cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _build_huffman(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol map per T.81 Annex C code assignment."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over byte-unstuffed entropy data; raises
    ValueError on overrun (the torn-tail contract)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted mid-symbol")
            self.buf = (self.buf << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        out = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return out

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed value."""
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes, color_transform: bool = True):
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG. Returns
    ``(pixels, w, h)`` with pixels an (h, w, 3) uint8 array (grayscale
    replicated to 3 channels). ``color_transform=False`` skips the
    T.871 YCbCr->RGB step for 3-component streams whose components are
    already RGB-coded (JPEG-in-TIFF photometric 2). Raises ValueError —
    and only ValueError — on anything unparseable."""
    try:
        return _decode_jpeg_inner(payload, color_transform)
    except ValueError:
        raise
    except Exception as exc:  # tear contract: never a raw internal error
        raise ValueError(f"corrupt JPEG: {type(exc).__name__}: {exc}") from exc


class _CoefStore:
    """Per-component DCT coefficient planes in ZIGZAG-index order —
    progressive scans refine these across multiple passes; baseline fills
    them in one pass. Arrays are padded to the interleaved MCU grid;
    ``real`` holds the non-padded block dims used by non-interleaved
    scans (T.81 A.2.2: partial-MCU components only carry real blocks)."""

    def __init__(self, frame) -> None:
        fh, fw, comps = frame
        self.hmax = max(hs for _, hs, _, _ in comps)
        self.vmax = max(vs for _, _, vs, _ in comps)
        self.mcux = (fw + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (fh + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coefs: dict[int, np.ndarray] = {}
        self.real: dict[int, tuple[int, int]] = {}
        for cid, hs, vs, _tq in comps:
            comp_w = (fw * hs + self.hmax - 1) // self.hmax
            comp_h = (fh * vs + self.vmax - 1) // self.vmax
            self.coefs[cid] = np.zeros(
                (self.mcuy * vs, self.mcux * hs, 64), dtype=np.int64
            )
            self.real[cid] = ((comp_h + 7) // 8, (comp_w + 7) // 8)


def _decode_jpeg_inner(payload: bytes, color_transform: bool = True):
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → table
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    progressive = False
    restart_interval = 0
    store: _CoefStore | None = None
    i = 2
    n = len(payload)
    while True:
        if i + 2 > n:
            raise ValueError("truncated before EOI")
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if i + 2 > n:
            raise ValueError("truncated segment header")
        (seglen,) = struct.unpack(">H", payload[i : i + 2])
        if seglen < 2 or i + seglen > n:
            raise ValueError("truncated segment")
        seg = payload[i + 2 : i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if tbl.size != 64:
                    raise ValueError("truncated DQT")
                natural = np.zeros(64, dtype=np.int64)
                natural[ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = natural.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17 : j + 17 + cnt])
                if len(vals) != cnt:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _build_huffman(bits, vals)
                j += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if frame is not None:
                raise ValueError("multiple SOF markers")
            progressive = marker == 0xC2
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            if fh == 0 or fw == 0:
                raise ValueError("zero image dimension")
            if fh * fw > 1 << 26:
                # declared decode bound (64 Mpx, same as the GIF/PNG
                # decoders): a crafted SOF claiming 65535x65535 would
                # otherwise attempt multi-GB coefficient-plane
                # allocations inside an executor; oversized rows
                # quarantine as ValueError like any tear
                raise ValueError(
                    f"image {fw}x{fh} exceeds the 64 Mpx decode bound"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad sampling factors {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS header")
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0  # baseline ignores the band fields
            if store is None:
                store = _CoefStore(frame)
            i = _decode_scan_into(
                payload, i, frame, scan, (ss, se, ah, al), huff,
                restart_interval, store,
            )
        # APPn, COM, DNL, anything else with a length: skipped
    if store is None or frame is None:
        raise ValueError("no image scan before EOI")
    return _render(frame, store, qt, color_transform)


def _split_entropy(payload: bytes, i: int):
    """Split entropy-coded bytes starting at ``i`` into restart intervals
    (0xFF00 unstuffed, RSTn as boundaries). Returns (intervals, end)
    where ``end`` is the offset of the terminating marker's 0xFF."""
    intervals, cur = [], bytearray()
    j, n = i, len(payload)
    while j < n:
        b = payload[j]
        if b == 0xFF:
            if j + 1 >= n:
                break
            m = payload[j + 1]
            if m == 0x00:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                intervals.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break  # next real marker ends the scan
        cur.append(b)
        j += 1
    intervals.append(bytes(cur))
    return intervals, j


def _decode_scan_into(payload, i, frame, scan, band, huff, restart_interval, store):
    """Decode ONE scan's entropy data into the coefficient store and
    return the offset just past it. Handles baseline (full-band) and all
    four progressive scan kinds (DC/AC × first/refinement)."""
    fh, fw, comps = frame
    ss, se, ah, al = band
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    order = []  # (cs, hs, vs, dc_table|None, ac_table|None)
    for cs, td, ta in scan:
        if cs not in byid:
            raise ValueError(f"scan references unknown component {cs}")
        hs, vs, _tq = byid[cs]
        need_dc = ss == 0 and ah == 0  # DC first / baseline
        need_ac = se > 0
        dct = huff.get((0, td)) if ss == 0 else None
        act = huff.get((1, ta)) if need_ac else None
        if need_dc and ss == 0 and dct is None:
            raise ValueError("missing DC Huffman table for scan")
        if need_ac and act is None:
            raise ValueError("missing AC Huffman table for scan")
        order.append((cs, hs, vs, dct, act))
    if ss > 0 and len(order) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if ss > se or se > 63:
        raise ValueError(f"bad spectral band {ss}..{se}")

    intervals, end = _split_entropy(payload, i)
    interleaved = len(order) > 1
    if interleaved:
        total_units = store.mcux * store.mcuy
    else:
        by_real, bx_real = store.real[order[0][0]]
        total_units = by_real * bx_real
    per_interval = restart_interval if restart_interval else total_units
    unit = 0
    for interval in intervals:
        if unit >= total_units:
            break
        reader = _BitReader(interval)
        pred = {cs: 0 for cs, _, _, _, _ in order}
        eobrun = [0]  # boxed: EOB runs span blocks within an interval
        for _ in range(min(per_interval, total_units - unit)):
            if interleaved:
                my, mx = divmod(unit, store.mcux)
                for cs, hs, vs, dct, act in order:
                    for by in range(vs):
                        for bx in range(hs):
                            blk = store.coefs[cs][my * vs + by, mx * hs + bx]
                            _decode_band(
                                reader, blk, ss, se, ah, al, dct, act, pred, cs,
                                eobrun,
                            )
            else:
                cs, hs, vs, dct, act = order[0]
                by, bx = divmod(unit, bx_real)
                blk = store.coefs[cs][by, bx]
                _decode_band(reader, blk, ss, se, ah, al, dct, act, pred, cs, eobrun)
            unit += 1
    if unit < total_units:
        raise ValueError(f"truncated scan: {unit}/{total_units} units decoded")
    return end


def _decode_band(reader, blk, ss, se, ah, al, dct, act, pred, cs, eobrun):
    """One block's worth of one scan (T.81 F.2.2 baseline; G.2 progressive)."""
    if ss == 0:
        if ah == 0:  # DC first (or baseline: DC then fall through to AC)
            s = reader.decode(dct)
            if s > 11:
                raise ValueError(f"bad DC category {s}")
            diff = _extend(reader.read(s), s) if s else 0
            pred[cs] += diff
            blk[0] = pred[cs] << al
        else:  # DC refinement: one bit per block
            if reader.read(1):
                blk[0] |= 1 << al
        if se == 0:
            return
        k = 1
    else:
        k = ss
    if ah == 0:  # AC first pass (al=0 == baseline AC)
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        while k <= se:
            rs = reader.decode(act)
            r, size = rs >> 4, rs & 0x0F
            if size == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                eobrun[0] = (1 << r) - 1  # EOBn: this block + (2^r-1+bits) more
                if r:
                    eobrun[0] += reader.read(r)
                return
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            blk[k] = _extend(reader.read(size), size) << al
            k += 1
        return
    # AC refinement (G.1.2.3): correction bits for known coefficients,
    # newly-significant coefficients carry ±1 at this bit position
    p1, m1 = 1 << al, -1 << al

    def sweep(j):  # correction bits for every nonzero coef in j..Se
        while j <= se:
            if blk[j] != 0:
                if reader.read(1) and (blk[j] & p1) == 0:
                    blk[j] += p1 if blk[j] >= 0 else m1
            j += 1

    if eobrun[0] > 0:  # a block inside an EOB run: whole band is sweep
        eobrun[0] -= 1
        sweep(k)
        return
    while k <= se:
        rs = reader.decode(act)
        r, size = rs >> 4, rs & 0x0F
        newval = 0
        if size:
            if size != 1:
                raise ValueError("bad refinement magnitude")
            newval = p1 if reader.read(1) else m1
        else:
            if r != 15:
                # EOBn ends (1<<r)+extra blocks INCLUDING this one: the
                # current block still sweeps its remaining band (an EOB1
                # with r=0 must not skip that — eobrun counts the rest)
                extra = reader.read(r) if r else 0
                eobrun[0] = (1 << r) - 1 + extra
                sweep(k)
                return
            # r == 15: skip 16 zero-history coefficients
        while k <= se:
            if blk[k] != 0:
                if reader.read(1) and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            else:
                r -= 1
                if r < 0:
                    break
            k += 1
        if newval and k <= se:
            blk[k] = newval
        k += 1


def _render(frame, store, qt, color_transform=True):
    """Dequantize + batched IDCT + upsample + color transform."""
    fh, fw, comps = frame
    out = []
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise ValueError(f"missing quantization table {tq}")
        zz = store.coefs[cid]  # (by, bx, 64) zigzag order
        by, bx = zz.shape[:2]
        natural = np.zeros((by, bx, 64), dtype=np.int64)
        natural[..., ZIGZAG] = zz
        deq = natural.reshape(by, bx, 8, 8) * qt[tq].reshape(1, 1, 8, 8)
        # batched IDCT: out[i,j] = Σ_u Σ_v C[u,i]·M[u,v]·C[v,j]
        spatial = np.einsum("ui,abuv,vj->abij", _C, deq.astype(np.float64), _C) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if hs < store.hmax or vs < store.vmax:
            # index-map nearest-neighbor upsample: output pixel i reads
            # source sample i·vs//vmax. For divisor ratios this equals
            # np.repeat (i//factor); for spec-legal NON-divisor ratios
            # (e.g. luma 3x1 with chroma 2x1 → factor 1.5) it is the
            # correct fractional mapping, where an integer repeat factor
            # would mis-shape the plane and quarantine a valid file.
            rows = (np.arange(fh) * vs) // store.vmax
            cols = (np.arange(fw) * hs) // store.hmax
            plane = plane[rows][:, cols]
        out.append(plane[:fh, :fw])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2), fw, fh
    if len(out) != 3:
        raise ValueError(f"unsupported component count {len(out)}")
    if not color_transform:
        px = np.clip(np.round(np.stack(out, axis=2)), 0, 255).astype(np.uint8)
        return px, fw, fh
    y, cb, cr = out
    # ITU-T T.871 inverse transform
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return px, fw, fh


# --- encoder ----------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _encode_codes(bits, huffval):
    """symbol → (code, length), inverse of _build_huffman."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def quality_tables(quality: int):
    """Annex K tables scaled with the libjpeg quality convention."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qs = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        qs.append(np.clip(t, 1, 255).astype(np.int64))
    return qs[0].reshape(8, 8), qs[1].reshape(8, 8)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(w, block, qtab, pred_key, pred, dc_codes, ac_codes):
    s = _C @ (block - 128.0) @ _C.T  # forward DCT-II (orthonormal pair)
    q = np.round(s / qtab).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred[pred_key]
    pred[pred_key] = dc
    cat = _category(diff)
    code, length = dc_codes[cat]
    w.write(code, length)
    if cat:
        w.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        cat = _category(v)
        code, length = ac_codes[(run << 4) | cat]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)


def encode_jpeg(
    pixels, quality: int = 90, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode an (h, w, 3) uint8 array as baseline JFIF JPEG with the
    Annex K example Huffman tables. ``subsampling``: '444' or '420';
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience feature real crawl JPEGs use)."""
    pixels = np.asarray(pixels, dtype=np.float64)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) pixels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w_, _ = pixels.shape
    r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
    # ITU-T T.871 forward transform
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qy, qc = quality_tables(quality)
    sub = 2 if subsampling == "420" else 1
    hs, vs = sub, sub  # luma sampling factors
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcux = (w_ + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h

    def pad(plane, ph, pw):
        out = np.empty((ph, pw))
        ch_, cw_ = plane.shape
        out[:ch_, :cw_] = plane
        out[ch_:, :cw_] = plane[ch_ - 1 : ch_, :]  # edge replicate
        out[:, cw_:] = out[:, cw_ - 1 : cw_]
        return out

    ypad = pad(y, mcuy * mcu_h, mcux * mcu_w)
    if sub == 2:  # 2x2 box average then pad to chroma MCU grid
        che = pad(cb, ((h + 1) // 2) * 2, ((w_ + 1) // 2) * 2)
        cre = pad(cr, ((h + 1) // 2) * 2, ((w_ + 1) // 2) * 2)
        cbd = (che[0::2, 0::2] + che[0::2, 1::2] + che[1::2, 0::2] + che[1::2, 1::2]) / 4
        crd = (cre[0::2, 0::2] + cre[0::2, 1::2] + cre[1::2, 0::2] + cre[1::2, 1::2]) / 4
        cbd = pad(cbd, mcuy * 8, mcux * 8)
        crd = pad(crd, mcuy * 8, mcux * 8)
    else:
        cbd = pad(cb, mcuy * 8, mcux * 8)
        crd = pad(cr, mcuy * 8, mcux * 8)

    dc_l = _encode_codes(*HT_DC_LUMA)
    ac_l = _encode_codes(*HT_AC_LUMA)
    dc_c = _encode_codes(*HT_DC_CHROMA)
    ac_c = _encode_codes(*HT_AC_CHROMA)
    bw = _BitWriter()
    pred = {"y": 0, "cb": 0, "cr": 0}
    mcu_count = 0
    rst_no = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_no % 8)])
                rst_no += 1
                pred = {"y": 0, "cb": 0, "cr": 0}
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    _encode_block(
                        bw, ypad[y0 : y0 + 8, x0 : x0 + 8], qy, "y", pred, dc_l, ac_l
                    )
            y0, x0 = my * 8, mx * 8
            _encode_block(bw, cbd[y0 : y0 + 8, x0 : x0 + 8], qc, "cb", pred, dc_c, ac_c)
            _encode_block(bw, crd[y0 : y0 + 8, x0 : x0 + 8], qc, "cr", pred, dc_c, ac_c)
            mcu_count += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq: int, tbl) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(int(v) for v in tbl.reshape(-1)[ZIGZAG]))

    def dht(tc: int, th: int, table) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w_, 3)
        + bytes([1, (hs << 4) | vs, 0])  # Y
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    return (
        b"\xff\xd8"
        + jfif
        + dqt(0, qy)
        + dqt(1, qc)
        + sof
        + dht(0, 0, HT_DC_LUMA)
        + dht(1, 0, HT_AC_LUMA)
        + dht(0, 1, HT_DC_CHROMA)
        + dht(1, 1, HT_AC_CHROMA)
        + dri
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def encode_jpeg_gray(pixels, quality: int = 90) -> bytes:
    """Encode an (h, w) uint8 array as a single-component (grayscale)
    baseline JPEG — exercises the decoder's 1-component path."""
    pixels = np.asarray(pixels, dtype=np.float64)
    if pixels.ndim != 2:
        raise ValueError("expected (h, w) gray pixels")
    h, w_ = pixels.shape
    qy, _ = quality_tables(quality)
    mcux, mcuy = (w_ + 7) // 8, (h + 7) // 8
    ypad = np.empty((mcuy * 8, mcux * 8))
    ypad[:h, :w_] = pixels
    ypad[h:, :w_] = pixels[h - 1 : h, :]
    ypad[:, w_:] = ypad[:, w_ - 1 : w_]
    dc_l = _encode_codes(*HT_DC_LUMA)
    ac_l = _encode_codes(*HT_AC_LUMA)
    bw = _BitWriter()
    pred = {"y": 0}
    for my in range(mcuy):
        for mx in range(mcux):
            _encode_block(
                bw, ypad[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qy, "y", pred,
                dc_l, ac_l,
            )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes([0]) + bytes(int(v) for v in qy.reshape(-1)[ZIGZAG]))
        + seg(0xC0, struct.pack(">BHHB", 8, h, w_, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(HT_DC_LUMA[0]) + bytes(HT_DC_LUMA[1]))
        + seg(0xC4, bytes([0x10]) + bytes(HT_AC_LUMA[0]) + bytes(HT_AC_LUMA[1]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )


# --- progressive encoder ----------------------------------------------------


def _quantized_planes(pixels, quality: int):
    """(h, w, per-component zigzag coefficient arrays) for 4:4:4: color
    transform, pad to 8-multiples, forward DCT, quantize, zigzag."""
    pixels = np.asarray(pixels, dtype=np.float64)
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) pixels")
    h, w_, _ = pixels.shape
    r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    qy, qc = quality_tables(quality)
    by, bx = (h + 7) // 8, (w_ + 7) // 8
    planes = []
    for plane, qtab in ((y, qy), (cb, qc), (cr, qc)):
        padded = np.empty((by * 8, bx * 8))
        padded[:h, :w_] = plane
        padded[h:, :w_] = plane[h - 1 : h, :]
        padded[:, w_:] = padded[:, w_ - 1 : w_]
        blocks = (
            padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        )  # (by, bx, 8, 8)
        s = np.einsum("iu,abuv,jv->abij", _C, blocks, _C)
        q = np.round(s / qtab.reshape(1, 1, 8, 8)).astype(np.int64)
        planes.append(q.reshape(by, bx, 64)[..., ZIGZAG])
    return h, w_, by, bx, planes


#: AC Huffman table for the progressive scans: the Annex K baseline AC
#: tables carry only EOB(0x00)/ZRL(0xF0) among the size-0 symbols, but
#: progressive needs the EOBn family (0x10..0xE0). A flat canonical
#: table covering every (run, size) symbol keeps the encoder trivial —
#: compression ratio is irrelevant here; the tables ship in the DHT
#: segment so any spec decoder reads them.
HT_AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0], list(range(256)))


class _RefineState:
    """AC-refinement emission state: buffered correction bits + EOB run
    (the encoder mirror of the decoder's G.1.2.3 walk)."""

    def __init__(self, writer, ac_codes) -> None:
        self.w = writer
        self.ac = ac_codes
        self.bits: list[int] = []  # correction bits pending emission
        self.eobrun = 0

    def flush_eob(self) -> None:
        if self.eobrun == 0 and not self.bits:
            return
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            code, length = self.ac[r << 4]
            self.w.write(code, length)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
        for bit in self.bits:
            self.w.write(bit, 1)
        self.bits = []
        self.eobrun = 0


def encode_jpeg_progressive(pixels, quality: int = 90) -> bytes:
    """Progressive (SOF2) 4:4:4 encoder exercising all four scan kinds
    the decoder implements: DC first with successive approximation
    (Al=1), DC refinement, per-component AC first passes at Al=1 (with
    cross-block EOB runs), and AC refinement scans (correction bits +
    newly-significant coefficients). Scan script: the classic
    spectral-selection + successive-approximation ladder."""
    h, w_, by, bx, planes = _quantized_planes(pixels, quality)
    qy, qc = quality_tables(quality)
    dc_tabs = [_encode_codes(*HT_DC_LUMA), _encode_codes(*HT_DC_CHROMA),
               _encode_codes(*HT_DC_CHROMA)]
    ac_flat = _encode_codes(*HT_AC_PROG)
    ac_tabs = [ac_flat, ac_flat, ac_flat]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(comps, ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for ci in comps:
            td = 0 if ci == 0 else 1
            body += bytes([ci + 1, (td << 4) | td])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = [b"\xff\xd8", seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    out.append(seg(0xDB, bytes([0]) + bytes(int(v) for v in qy.reshape(-1)[ZIGZAG])))
    out.append(seg(0xDB, bytes([1]) + bytes(int(v) for v in qc.reshape(-1)[ZIGZAG])))
    out.append(
        seg(
            0xC2,
            struct.pack(">BHHB", 8, h, w_, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
    )
    out.append(seg(0xC4, bytes([0x00]) + bytes(HT_DC_LUMA[0]) + bytes(HT_DC_LUMA[1])))
    out.append(seg(0xC4, bytes([0x01]) + bytes(HT_DC_CHROMA[0]) + bytes(HT_DC_CHROMA[1])))
    out.append(seg(0xC4, bytes([0x10]) + bytes(HT_AC_PROG[0]) + bytes(HT_AC_PROG[1])))
    out.append(seg(0xC4, bytes([0x11]) + bytes(HT_AC_PROG[0]) + bytes(HT_AC_PROG[1])))

    # scan 1: interleaved DC first, Al=1
    bw = _BitWriter()
    pred = [0, 0, 0]
    for yb in range(by):
        for xb in range(bx):
            for ci in range(3):
                dc = int(planes[ci][yb, xb, 0]) >> 1  # arithmetic point transform
                diff = dc - pred[ci]
                pred[ci] = dc
                cat = _category(diff)
                code, length = dc_tabs[ci][cat]
                bw.write(code, length)
                if cat:
                    bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    bw.flush()
    out += [sos([0, 1, 2], 0, 0, 0, 1), bytes(bw.out)]

    # scan 2: interleaved DC refinement, Ah=1 Al=0 — one bit per block
    bw = _BitWriter()
    for yb in range(by):
        for xb in range(bx):
            for ci in range(3):
                bw.write(int(planes[ci][yb, xb, 0]) & 1, 1)
    bw.flush()
    out += [sos([0, 1, 2], 0, 0, 1, 0), bytes(bw.out)]

    # per component: AC first pass (band 1-63, Al=1) then AC refinement
    for ci in range(3):
        ac = ac_tabs[ci]
        bw = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                code, length = ac[r << 4]
                bw.write(code, length)
                if r:
                    bw.write(eobrun - (1 << r), r)
                eobrun = 0

        for yb in range(by):
            for xb in range(bx):
                zz = planes[ci][yb, xb]
                # point transform: truncate toward zero (T.81 G.1.2.2)
                t = [int(v) // 2 if v >= 0 else -((-int(v)) // 2) for v in zz]
                last_nz = 0
                for k in range(63, 0, -1):
                    if t[k]:
                        last_nz = k
                        break
                if last_nz == 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(1, last_nz + 1):
                    v = t[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac[0xF0]
                        bw.write(code, length)
                        run -= 16
                    cat = _category(v)
                    code, length = ac[(run << 4) | cat]
                    bw.write(code, length)
                    bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
                    run = 0
                if last_nz < 63:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        bw.flush()
        out += [sos([ci], 1, 63, 0, 1), bytes(bw.out)]

    for ci in range(3):
        bw = _BitWriter()
        st = _RefineState(bw, ac_tabs[ci])
        for yb in range(by):
            for xb in range(bx):
                zz = planes[ci][yb, xb]
                pending: list[int] = []  # correction bits since last emitted RS
                run = 0
                last_sig = 0  # last k with |v| == 1 (newly significant)
                for k in range(63, 0, -1):
                    if abs(int(zz[k])) == 1:
                        last_sig = k
                        break
                for k in range(1, last_sig + 1):
                    v = int(zz[k])
                    a = abs(v)
                    if a == 0:
                        run += 1
                        continue
                    # any nonzero coefficient flushes pending ZRLs first —
                    # the decoder's per-symbol traversal windows close at
                    # the 16th zero-history skip, so correction bits must
                    # not leak across a ZRL boundary (T.81 G.1.2.3 order)
                    while run > 15:
                        st.flush_eob()
                        code, length = ac_tabs[ci][0xF0]
                        bw.write(code, length)
                        run -= 16
                        for bit in pending:
                            bw.write(bit, 1)
                        pending = []
                    if a > 1:  # history-nonzero: correction bit only
                        pending.append(a & 1)
                        continue
                    # newly significant (|v| == 1)
                    st.flush_eob()
                    code, length = ac_tabs[ci][(run << 4) | 1]
                    bw.write(code, length)
                    bw.write(1 if v > 0 else 0, 1)
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                    run = 0
                # block tail (everything past the last newly-significant
                # coefficient): the decoder's EOB sweep reads correction
                # bits for the remaining history-nonzero coefs — unless
                # the band closed exactly at k=63, where no EOB is read
                if last_sig < 63:
                    tail_bits = [
                        abs(int(zz[k])) & 1
                        for k in range(last_sig + 1, 64)
                        if abs(int(zz[k])) > 1
                    ]
                    st.eobrun += 1
                    st.bits += pending + tail_bits
                    if st.eobrun == 0x7FFF:
                        st.flush_eob()
        st.flush_eob()
        bw.flush()
        out += [sos([ci], 1, 63, 1, 0), bytes(bw.out)]

    out.append(b"\xff\xd9")
    return b"".join(out)
