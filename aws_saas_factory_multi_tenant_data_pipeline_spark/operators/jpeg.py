"""Baseline JPEG codec — stdlib + numpy, built from the public spec
(ITU-T T.81 / ISO 10918-1; tables from Annex K, color transform from
ITU-T T.871 JFIF).

The container ships no image libraries, so like the PNG codec this is a
from-the-spec implementation: baseline sequential DCT, Huffman entropy
coding, 8-bit samples, grayscale or YCbCr with arbitrary sampling
factors (4:4:4, 4:2:0, 4:2:2 all fall out of the general H×V handling),
restart markers, APPn/COM skipping. Progressive (SOF2) and arithmetic
coding are rejected with a clear ValueError — they are different
compression modes, not tears.

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


def decode_jpeg(payload: bytes):
    """Decode a baseline sequential JPEG. Returns ``(pixels, w, h)`` with
    pixels an (h, w, 3) uint8 array (grayscale replicated to 3 channels).
    Raises ValueError — and only ValueError — on anything unparseable."""
    try:
        return _decode_jpeg_inner(payload)
    except ValueError:
        raise
    except Exception as exc:  # tear contract: never a raw internal error
        raise ValueError(f"corrupt JPEG: {type(exc).__name__}: {exc}") from exc


def _decode_jpeg_inner(payload: bytes):
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → table
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    i = 2
    n = len(payload)
    while True:
        if i + 4 > n:
            raise ValueError("truncated before SOS")
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("EOI before SOS")
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
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (baseline/extended seq.)
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            if fh == 0 or fw == 0:
                raise ValueError("zero image dimension")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad sampling factors {hs}x{vs}")
                comps.append((cid, hs, vs, tq))
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise ValueError("progressive JPEG not supported (baseline only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                payload, i, frame, scan, qt, huff, restart_interval
            )
        # APPn, COM, DNL, anything else with a length: skipped


def _decode_scan(payload, i, frame, scan, qt, huff, restart_interval):
    fh, fw, comps = frame
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    order = []  # (hs, vs, qtab, dc_table, ac_table) per scan component
    for cs, td, ta in scan:
        if cs not in byid:
            raise ValueError(f"scan references unknown component {cs}")
        hs, vs, tq = byid[cs]
        if tq not in qt:
            raise ValueError(f"missing quantization table {tq}")
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("missing Huffman table for scan")
        order.append((cs, hs, vs, qt[tq], huff[(0, td)], huff[(1, ta)]))
    hmax = max(hs for _, hs, _, _, _, _ in order)
    vmax = max(vs for _, _, vs, _, _, _ in order)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    # split entropy-coded data into restart intervals, unstuffing 0xFF00
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
            break  # EOI or next marker ends the scan
        cur.append(b)
        j += 1
    intervals.append(bytes(cur))
    # decode MCUs
    planes = {
        cs: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cs, hs, vs, _, _, _ in order
    }
    total_mcus = mcux * mcuy
    per_interval = restart_interval if restart_interval else total_mcus
    mcu = 0
    for interval in intervals:
        if mcu >= total_mcus:
            break
        reader = _BitReader(interval)
        pred = {cs: 0 for cs, _, _, _, _, _ in order}
        for _ in range(min(per_interval, total_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for cs, hs, vs, qtab, dct, act in order:
                for by in range(vs):
                    for bx in range(hs):
                        block = _decode_block(reader, dct, act, qtab, pred, cs)
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
    if mcu < total_mcus:
        raise ValueError(f"truncated scan: {mcu}/{total_mcus} MCUs decoded")
    # upsample each plane to full size (pixel replication) and crop
    out = []
    for cs, hs, vs, _, _, _ in order:
        p = planes[cs]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:fh, :fw])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2), fw, fh
    if len(out) != 3:
        raise ValueError(f"unsupported component count {len(out)}")
    y, cb, cr = out
    # ITU-T T.871 inverse transform
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return px, fw, fh


def _decode_block(reader, dct, act, qtab, pred, cs):
    coef = np.zeros(64, dtype=np.int64)
    s = reader.decode(dct)
    if s > 11:
        raise ValueError(f"bad DC category {s}")
    diff = _extend(reader.read(s), s) if s else 0
    pred[cs] += diff
    coef[0] = pred[cs]
    k = 1
    while k < 64:
        rs = reader.decode(act)
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(reader.read(size), size)
        k += 1
    natural = np.zeros(64, dtype=np.int64)
    natural[ZIGZAG] = coef
    deq = natural.reshape(8, 8) * qtab
    return _C.T @ deq @ _C + 128.0


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
    total_mcus = mcux * mcuy
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
