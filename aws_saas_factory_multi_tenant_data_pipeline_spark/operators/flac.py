"""FLAC codec — stdlib + numpy, built from the public spec (RFC 9639 /
xiph.org format documentation).

FLAC is the audio counterpart of PNG for a training-data pipeline:
lossless (so every test is BIT-EXACT, no tolerance), container-simple,
and the format real speech corpora ship in (LibriSpeech distributes
FLAC). This implements:

- **decoder**: STREAMINFO parse, frame sync + header (blocksize /
  samplerate / channel-assignment / sample-size codes, UTF-8-coded
  frame number, CRC-8), subframe types CONSTANT / VERBATIM / FIXED
  (orders 0-4) / LPC (any order), wasted bits, Rice-coded residual
  partitions (both 4- and 5-bit parameter methods, escape-to-raw),
  stereo decorrelation (left/side, right/side, mid/side), frame CRC-16,
  and the STREAMINFO **MD5 check over the decoded PCM** — an
  independent end-to-end invariant: the decoder recomputes the
  signature of its own output and compares against what the encoder
  stored, so encoder and decoder cannot be wrong "in the same way"
  without breaking the md5.
- **encoder**: 16-bit mono/stereo, fixed predictors (orders 0-2 chosen
  per frame by residual magnitude), single-partition Rice residuals,
  CRC-8/CRC-16, STREAMINFO with the PCM md5.

Tear contract (same as PNG/JPEG): :func:`decode_flac` raises ValueError
— and only ValueError — on anything unparseable; a torn tail never
reads as a clean end-of-stream (total-samples + md5 both catch it).

Scale shape: the codec runs inside Arrow ``mapInPandas`` passes
(`operators/multimodal.py`), partition-local, payloads never transit
the driver — identical plumbing to every other media format.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110

#: spec blocksize code table (frame header bits 16-19); 6/7 are
#: get-8/16-bits-from-end codes
_BLOCKSIZE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050, 7: 24000,
    8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader; ValueError on overrun (tear contract)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.bitpos = bitpos

    def read(self, n: int) -> int:
        end = self.bitpos + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC bitstream exhausted")
        out = 0
        pos = self.bitpos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.bitpos = pos
        return out

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1_000_000:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def decode_flac(payload: bytes):
    """Decode a FLAC stream. Returns ``(samples, sample_rate, channels,
    bits_per_sample)`` with samples an int64 array shaped (n, channels).
    Raises ValueError — and only ValueError — on anything unparseable,
    including an MD5 mismatch between STREAMINFO and the decoded PCM."""
    try:
        return _decode_flac_inner(payload)
    except ValueError:
        raise
    except Exception as exc:  # tear contract
        raise ValueError(f"corrupt FLAC: {type(exc).__name__}: {exc}") from exc


def _decode_flac_inner(payload: bytes):
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    i = 4
    streaminfo = None
    last = False
    while not last:
        if i + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        hdr = payload[i]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[i + 1 : i + 4])
        body = payload[i + 4 : i + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated metadata block")
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            b = _Bits(body)
            b.read(16)  # min blocksize
            b.read(16)  # max blocksize
            b.read(24)
            b.read(24)
            sr = b.read(20)
            ch = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            md5 = body[18:34]
            streaminfo = (sr, ch, bps, total, md5)
        i += 4 + blen
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    sr, ch, bps, total, md5 = streaminfo
    out = []
    got = 0
    while got < total:
        frame, i = _decode_frame(payload, i, streaminfo)
        out.append(frame)
        got += frame.shape[0]
    if got != total:
        raise ValueError(f"decoded {got} samples, STREAMINFO says {total}")
    samples = np.concatenate(out, axis=0) if out else np.zeros((0, ch), np.int32)
    # the end-to-end invariant: recompute the PCM signature
    if md5 != b"\x00" * 16:
        h = hashlib.md5()
        h.update(_pcm_bytes(samples, bps))
        if h.digest() != md5:
            raise ValueError("decoded PCM md5 does not match STREAMINFO")
    return samples, sr, ch, bps


def _pcm_bytes(samples: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian signed PCM — the byte stream FLAC's
    STREAMINFO md5 is defined over."""
    width = (bps + 7) // 8
    inter = samples.reshape(-1)
    if width == 2:
        return inter.astype("<i2").tobytes()
    if width == 1:
        return inter.astype("i1").tobytes()
    if width == 4:
        return inter.astype("<i4").tobytes()
    # 20/24-bit: 3 bytes LE
    arr = inter.astype("<i4").tobytes()
    return b"".join(arr[k : k + 3] for k in range(0, len(arr), 4))


def _read_utf8_number(b: _Bits) -> int:
    first = b.read(8)
    if first < 0x80:
        return first
    n = 0
    while first & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("bad UTF-8-coded frame number")
    val = first & (0x7F >> n)
    for _ in range(n - 1):
        c = b.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        val = (val << 6) | (c & 0x3F)
    return val


def _decode_frame(payload: bytes, i: int, streaminfo):
    sr0, ch0, bps0, _total, _md5 = streaminfo
    hdr_start = i
    b = _Bits(payload, i * 8)
    if b.read(14) != _SYNC:
        raise ValueError(f"lost frame sync at byte {i}")
    b.read(1)  # reserved
    b.read(1)  # blocking strategy
    bs_code = b.read(4)
    sr_code = b.read(4)
    ca = b.read(4)
    ss_code = b.read(3)
    b.read(1)  # reserved
    _read_utf8_number(b)
    if bs_code == 0:
        raise ValueError("reserved blocksize code 0")
    elif bs_code == 6:
        blocksize = b.read(8) + 1
    elif bs_code == 7:
        blocksize = b.read(16) + 1
    else:
        blocksize = _BLOCKSIZE[bs_code]
    if sr_code == 12:
        b.read(8)
    elif sr_code in (13, 14):
        b.read(16)
    elif sr_code == 15:
        raise ValueError("invalid sample-rate code 15")
    bps = bps0 if ss_code == 0 else _SAMPLE_SIZE.get(ss_code)
    if bps is None:
        raise ValueError(f"reserved sample-size code {ss_code}")
    b.align()
    hdr_bytes = payload[hdr_start : b.bitpos // 8]
    crc = b.read(8)
    if _crc8(hdr_bytes) != crc:
        raise ValueError("frame header CRC-8 mismatch")
    if ca <= 7:
        nch = ca + 1
        if nch != ch0:
            raise ValueError("frame channel count disagrees with STREAMINFO")
        chans = [_decode_subframe(b, blocksize, bps) for _ in range(nch)]
    elif ca in (8, 9, 10):  # left/side, right/side, mid/side
        if ch0 != 2:
            raise ValueError("stereo decorrelation in non-stereo stream")
        if ca == 8:  # left + side
            left = _decode_subframe(b, blocksize, bps)
            side = _decode_subframe(b, blocksize, bps + 1)
            chans = [left, left - side]
        elif ca == 9:  # side + right
            side = _decode_subframe(b, blocksize, bps + 1)
            right = _decode_subframe(b, blocksize, bps)
            chans = [right + side, right]
        else:  # mid + side
            mid = _decode_subframe(b, blocksize, bps)
            side = _decode_subframe(b, blocksize, bps + 1)
            m2 = (mid << 1) | (side & 1)
            chans = [(m2 + side) >> 1, (m2 - side) >> 1]
    else:
        raise ValueError(f"reserved channel assignment {ca}")
    b.align()
    frame_bytes = payload[hdr_start : b.bitpos // 8]
    crc16 = b.read(16)
    if _crc16(frame_bytes) != crc16:
        raise ValueError("frame CRC-16 mismatch")
    return np.stack(chans, axis=1).astype(np.int64), b.bitpos // 8


def _decode_subframe(b: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if b.read(1):
        raise ValueError("subframe header padding bit set")
    stype = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = 1 + b.unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = b.sread(bps)
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([b.sread(bps) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [b.sread(bps) for _ in range(order)]
        resid = _decode_residual(b, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for t in range(order, blocksize):
            if order == 0:
                p = 0
            elif order == 1:
                p = out[t - 1]
            elif order == 2:
                p = 2 * out[t - 1] - out[t - 2]
            elif order == 3:
                p = 3 * out[t - 1] - 3 * out[t - 2] + out[t - 3]
            else:
                p = 4 * out[t - 1] - 6 * out[t - 2] + 4 * out[t - 3] - out[t - 4]
            out[t] = p + resid[t - order]
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warm = [b.sread(bps) for _ in range(order)]
        prec = b.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision code")
        shift = b.sread(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [b.sread(prec) for _ in range(order)]
        resid = _decode_residual(b, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for t in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(out[t - 1 - j])
            out[t] = (acc >> shift) + resid[t - order]
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted


def _decode_residual(b: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = b.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = b.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("blocksize not divisible by partition count")
    out = np.empty(blocksize - order, dtype=np.int64)
    pos = 0
    for p in range(nparts):
        count = blocksize // nparts - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("partition smaller than predictor order")
        param = b.read(pbits)
        if param == escape:
            raw = b.read(5)
            for k in range(count):
                out[pos + k] = b.sread(raw) if raw else 0
        else:
            for k in range(count):
                q = b.unary()
                r = b.read(param) if param else 0
                zz = (q << param) | r
                out[pos + k] = (zz >> 1) ^ -(zz & 1)  # unzigzag
        pos += count
    return out


# --- encoder ----------------------------------------------------------------


class _BitW:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.buf = (self.buf << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.buf >> self.nbits) & 0xFF)
        self.buf &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > (7 - nbytes) + 6 * (nbytes - 1) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | ((n >> shift) & (0x3F >> (nbytes - 2))))
    for k in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _best_fixed_order(x: np.ndarray) -> int:
    """Pick the fixed predictor (0-2) with the smallest residual mass."""
    best, order = None, 0
    for o in range(3):
        if len(x) <= o:
            break
        d = x.astype(np.int64)
        for _ in range(o):
            d = np.diff(d)
        mass = np.abs(d[o:] if o == 0 else d).sum()
        if best is None or mass < best:
            best, order = mass, o
    return order


def _rice_param(resid: np.ndarray) -> int:
    if resid.size == 0:
        return 0
    mean = max(1.0, float(np.abs(resid).mean()))
    p = int(np.ceil(np.log2(mean + 1)))
    return min(14, max(0, p))


def encode_flac(samples, sample_rate: int, bps: int = 16, blocksize: int = 4096) -> bytes:
    """Encode int PCM (shape (n,) mono or (n, ch)) as FLAC: fixed
    predictors, single-partition Rice residuals, independent channels,
    STREAMINFO md5 over the raw PCM."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if not 1 <= ch <= 8:
        raise ValueError("1..8 channels")
    lim = 1 << (bps - 1)
    if n and (x.min() < -lim or x.max() >= lim):
        raise ValueError(f"samples out of {bps}-bit range")
    x = x.astype(np.int64)
    md5 = hashlib.md5(_pcm_bytes(x, bps)).digest()

    frames = bytearray()
    fno = 0
    for start in range(0, max(n, 1), blocksize):
        blk = x[start : start + blocksize]
        if blk.shape[0] == 0:
            break
        frames += _encode_frame(blk, fno, sample_rate, bps)
        fno += 1

    w = _BitW()
    w.write(blocksize, 16)
    w.write(blocksize, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sample_rate, 20)
    w.write(ch - 1, 3)
    w.write(bps - 1, 5)
    w.write(n, 36)
    streaminfo = bytes(w.out) + md5
    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo
    return header + bytes(frames)


def _encode_frame(blk: np.ndarray, fno: int, sample_rate: int, bps: int) -> bytes:
    nsamp, ch = blk.shape
    w = _BitW()
    w.write(_SYNC, 14)
    w.write(0, 1)
    w.write(0, 1)  # fixed blocksize stream
    w.write(7, 4)  # blocksize: 16-bit at end
    w.write(0, 4)  # sample rate: from STREAMINFO
    w.write(ch - 1, 4)  # independent channels
    w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
    w.write(0, 1)
    for byte in _utf8_number(fno):
        w.write(byte, 8)
    w.write(nsamp - 1, 16)
    hdr = bytes(w.out)
    w.write(_crc8(hdr), 8)
    for c in range(ch):
        _encode_subframe(w, blk[:, c], bps)
    w.align()
    frame = bytes(w.out)
    w.write(_crc16(frame), 16)
    return bytes(w.out)


def _encode_subframe(w: _BitW, x: np.ndarray, bps: int) -> None:
    w.write(0, 1)
    if np.all(x == x[0]):
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    order = _best_fixed_order(x)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for t in range(order):
        w.write(int(x[t]), bps)
    d = x.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    resid = d
    param = _rice_param(resid)
    w.write(0, 2)  # method 0: 4-bit params
    w.write(0, 4)  # partition order 0 (single partition)
    w.write(param, 4)
    for v in resid:
        v = int(v)
        zz = (v << 1) ^ (v >> 63)  # zigzag
        q, r = zz >> param, zz & ((1 << param) - 1)
        if q > 1_000_000:
            raise ValueError("rice quotient blow-up (bad parameter)")
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        if param:
            w.write(r, param)


# --- VORBIS_COMMENT metadata (the ID3 twin for FLAC) [r12] -------------------


def _walk_metadata(payload: bytes):
    """Yield (offset, is_last, block_type, body) for each metadata
    block; returns the frame-data offset via StopIteration value."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    i = 4
    last = False
    while not last:
        if i + 4 > len(payload):
            raise ValueError("truncated metadata block header")
        hdr = payload[i]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[i + 1 : i + 4])
        body = payload[i + 4 : i + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated metadata block")
        yield i, last, btype, body
        i += 4 + blen


def parse_vorbis_comment_body(data: bytes, what: str = "VORBIS_COMMENT"):
    """vendor + [(KEY, value)] from the shared Vorbis comment layout
    (little-endian lengths — the one LE corner of the BE FLAC format)."""
    if len(data) < 8:
        raise ValueError(f"torn {what} block")
    (vlen,) = struct.unpack_from("<I", data, 0)
    if 4 + vlen + 4 > len(data):
        raise ValueError(f"torn {what} vendor string")
    vendor = data[4 : 4 + vlen].decode("utf-8", "replace")
    off = 4 + vlen
    (n,) = struct.unpack_from("<I", data, off)
    off += 4
    if n > 1 << 16:
        raise ValueError(f"{what} comment count out of range")
    tags = []
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError(f"torn {what} comment length")
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if off + ln > len(data):
            raise ValueError(f"torn {what} comment body")
        item = data[off : off + ln].decode("utf-8", "replace")
        off += ln
        key, _, val = item.partition("=")
        tags.append((key.upper(), val))
    return vendor, tags


def build_vorbis_comment_body(vendor: str, tags) -> bytes:
    vb = vendor.encode("utf-8")
    out = bytearray(struct.pack("<I", len(vb)) + vb)
    out += struct.pack("<I", len(tags))
    for k, v in tags:
        item = f"{k}={v}".encode("utf-8")
        out += struct.pack("<I", len(item)) + item
    return bytes(out)


def extract_flac_tags(payload: bytes) -> dict:
    """Extract the VORBIS_COMMENT block (type 4) of a native .flac:
    {vendor, tags}; empty tags when the block is absent."""
    vendor, tags = "", []
    for _off, _last, btype, body in _walk_metadata(payload):
        if btype == 4:
            vendor, tags = parse_vorbis_comment_body(body)
    return {"vendor": vendor, "tags": tags}


def strip_flac_tags(payload: bytes, keep: tuple = ()) -> bytes:
    """Privacy strip: rewrite the metadata chain with the
    VORBIS_COMMENT block replaced by a ``keep``-filtered one (added if
    absent and ``keep`` matched nothing → empty block still written so
    the strip is visible); STREAMINFO and all other blocks ride
    through verbatim, audio frames untouched."""
    meta = extract_flac_tags(payload)
    kept = [(k, v) for k, v in meta["tags"] if k in keep]
    blocks = []
    frames_off = None
    for off, last, btype, body in _walk_metadata(payload):
        frames_off = off + 4 + len(body)
        if btype == 4:
            continue
        blocks.append((btype, body))
    new_body = build_vorbis_comment_body("", kept)
    blocks.append((4, new_body))
    out = bytearray(b"fLaC")
    for i, (btype, body) in enumerate(blocks):
        hdr = btype | (0x80 if i == len(blocks) - 1 else 0)
        out.append(hdr)
        out += struct.pack(">I", len(body))[1:]
        out += body
    return bytes(out) + payload[frames_off:]
