"""OpenEXR scanline codec — from the public OpenEXR File Layout
specification (openexr.com, "Technical Introduction" + file layout
doc). HDR training images ship as EXR; this decodes the scanline
forms a data pipeline actually meets.

A REAL third-party file ships in every CPython checkout
(test/imghdrdata/python.exr, uncompressed half-float RGBA) — decoded
here and pinned against the PNG twin of the same logo
(tests/test_realworld_r11.py: the lossless ALPHA channel must agree
exactly; color channels are linear-light and compared through the
sRGB transfer curve).

Layout: magic 0x762f3101 | version int32 (flags must be scanline) |
attributes (name\\0 type\\0 size data ... empty name ends) | line
offset table (int64 per chunk) | chunks of [y int32, size int32,
data]. Channel list entries: name\\0, pixelType int32 (0 uint, 1
half, 2 float), pLinear+3 reserved, xSampling, ySampling. Chunk data
is per scanline, channels in chlist order, each width*bytes.

Compression: NONE (0), RLE (1), ZIPS (2, 1 line/chunk) and ZIP (3,
16 lines/chunk) — the zlib forms apply the spec's byte reorder
(split even/odd halves) + delta predictor after inflation; RLE uses
the spec's [count, value] / [count|0x80, literals] packets over the
same reordered bytes. PIZ/PXR24/B44/DWA raise as declared boundaries
(wavelet/huffman tables are not guessed)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

EXR_MAGIC = 0x01312F76  # little-endian on disk: 76 2f 31 01

_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_LINES_PER_CHUNK = {0: 1, 1: 1, 2: 1, 3: 16}


def _postdecode(buf: bytes) -> bytes:
    """Inverse of the EXR zip/rle pre-compression transform: integrate
    the deltas, then interleave the two halves (spec: 'reconstruct'
    then 'interleave')."""
    b = bytearray(buf)
    for i in range(1, len(b)):
        b[i] = (b[i] + b[i - 1] - 128) & 0xFF
    half = (len(b) + 1) // 2
    out = bytearray(len(b))
    out[0::2] = b[:half]
    out[1::2] = b[half:]
    return bytes(out)


def _predecode(buf: bytes) -> bytes:
    """Forward transform (fixture encoder): de-interleave then delta."""
    b = bytearray(len(buf))
    half = (len(buf) + 1) // 2
    b[:half] = buf[0::2]
    b[half:] = buf[1::2]
    out = bytearray(len(b))
    prev = 0
    for i in range(len(b)):
        out[i] = (b[i] - prev + 128) & 0xFF if i else b[0]
        prev = b[i]
    return bytes(out)


def _unrle(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        cnt = struct.unpack("b", data[i : i + 1])[0]
        i += 1
        if cnt < 0:
            cnt = -cnt
            if i + cnt > n:
                raise ValueError("torn EXR RLE literal run")
            out += data[i : i + cnt]
            i += cnt
        else:
            if i >= n:
                raise ValueError("torn EXR RLE repeat run")
            out += bytes([data[i]]) * (cnt + 1)
            i += 1
    return bytes(out)


def _parse_header(payload: bytes):
    if len(payload) < 8:
        raise ValueError("torn EXR header")
    (magic, version) = struct.unpack("<II", payload[:8])
    if magic != EXR_MAGIC:
        raise ValueError("not an EXR payload (bad magic)")
    if version & 0x200:
        raise ValueError("multi-part EXR is a declared boundary")
    if version & 0x800:
        raise ValueError("deep-data EXR is a declared boundary")
    if version & 0x40:
        raise ValueError("tiled EXR is a declared boundary")
    attrs = {}
    i = 8
    while True:
        e = payload.index(b"\x00", i)
        name = payload[i:e].decode("latin-1")
        i = e + 1
        if not name:
            break
        e = payload.index(b"\x00", i)
        typ = payload[i:e].decode("latin-1")
        i = e + 1
        (sz,) = struct.unpack("<I", payload[i : i + 4])
        i += 4
        attrs[name] = (typ, payload[i : i + sz])
        i += sz
    return attrs, i


def _parse_channels(data: bytes):
    chans = []
    i = 0
    while i < len(data) and data[i] != 0:
        e = data.index(b"\x00", i)
        name = data[i:e].decode("latin-1")
        i = e + 1
        ptype, _plin, _xs, _ys = struct.unpack("<IIII", data[i : i + 16])
        i += 16
        if ptype not in (_PT_UINT, _PT_HALF, _PT_FLOAT):
            raise ValueError(f"EXR pixel type {ptype} out of range")
        chans.append((name, ptype))
    return chans


def decode_exr(payload: bytes):
    """Decode a scanline EXR to (channels dict name -> float32 [h, w],
    w, h). Values are the file's linear-light floats, no transfer
    curve applied. ValueError — and only ValueError — on torn input."""
    try:
        return _decode_exr_inner(payload)
    except ValueError:
        raise
    except Exception as exc:  # struct.error / zlib.error on torn input
        raise ValueError(f"torn EXR payload: {exc}") from exc


def _decode_exr_inner(payload: bytes):
    attrs, off = _parse_header(payload)
    for req in ("channels", "compression", "dataWindow"):
        if req not in attrs:
            raise ValueError(f"EXR without required attribute {req}")
    comp = attrs["compression"][1][0]
    if comp not in _LINES_PER_CHUNK:
        raise ValueError(
            f"EXR compression {comp} (PIZ/PXR24/B44/DWA) is a declared boundary"
        )
    x0, y0, x1, y1 = struct.unpack("<4i", attrs["dataWindow"][1])
    w, h = x1 - x0 + 1, y1 - y0 + 1
    if w <= 0 or h <= 0 or w * h > 1 << 26:
        raise ValueError("EXR dataWindow out of range")
    chans = _parse_channels(attrs["channels"][1])
    if not chans:
        raise ValueError("EXR without channels")
    sizes = {_PT_UINT: 4, _PT_HALF: 2, _PT_FLOAT: 4}
    lpc = _LINES_PER_CHUNK[comp]
    n_chunks = (h + lpc - 1) // lpc
    need = off + 8 * n_chunks
    if len(payload) < need:
        raise ValueError("torn EXR line-offset table")
    offsets = struct.unpack(f"<{n_chunks}q", payload[off:need])
    out = {name: np.empty((h, w), dtype=np.float32) for name, _ in chans}
    row_bytes = sum(sizes[pt] for _, pt in chans) * w
    for ci, coff in enumerate(offsets):
        if coff + 8 > len(payload):
            raise ValueError("torn EXR chunk header")
        y, dsize = struct.unpack("<ii", payload[coff : coff + 8])
        data = payload[coff + 8 : coff + 8 + dsize]
        if len(data) < dsize:
            raise ValueError("torn EXR chunk data")
        lines = min(lpc, y1 - y + 1) if comp == 3 else lpc
        raw_need = row_bytes * lines
        if comp == 0 or dsize >= raw_need:
            # spec: when compression does not shrink a chunk, the raw
            # bytes are stored instead
            raw = data
        elif comp == 1:
            raw = _postdecode(_unrle(data))
        else:
            raw = _postdecode(zlib.decompress(data))
        if len(raw) < raw_need:
            raise ValueError("torn EXR scanline data")
        p = 0
        for li in range(lines):
            ry = y - y0 + li
            if not 0 <= ry < h:
                raise ValueError("EXR chunk y outside the data window")
            for name, pt in chans:
                nb = sizes[pt] * w
                seg = raw[p : p + nb]
                p += nb
                if pt == _PT_HALF:
                    vals = np.frombuffer(seg, dtype="<f2").astype(np.float32)
                elif pt == _PT_FLOAT:
                    vals = np.frombuffer(seg, dtype="<f4").astype(np.float32)
                else:
                    vals = np.frombuffer(seg, dtype="<u4").astype(np.float32)
                out[name][ry] = vals
    return out, w, h


def _to_u8(c: np.ndarray) -> np.ndarray:
    return np.clip(np.round(c * 255.0), 0, 255).astype(np.uint8)


def decode_exr_rgb(payload: bytes):
    """Registry adapter: R/G/B (or replicated Y) scaled value*255 to
    8-bit — the identity mapping the REAL python.exr pins PIXEL-EXACT
    against its PNG twin. EXR proper is linear-light; pipelines that
    want display mapping apply their transfer curve to the float
    channels from :func:`decode_exr` instead."""
    chans, w, h = decode_exr(payload)
    if all(k in chans for k in ("R", "G", "B")):
        rgb = np.stack([_to_u8(chans[c]) for c in ("R", "G", "B")], axis=-1)
    elif "Y" in chans:
        g = _to_u8(chans["Y"])
        rgb = np.repeat(g[..., None], 3, axis=2)
    else:
        raise ValueError(f"EXR without RGB or Y channels ({sorted(chans)})")
    return rgb, w, h


def _rle(data: bytes) -> bytes:
    """EXR RLE packets: count>=0 -> count+1 repeats of next byte;
    count<0 -> -count literals (signed int8 counts)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 127:
            run += 1
        if run >= 3:
            out += struct.pack("b", run - 1) + data[i : i + 1]
            i += run
        else:
            j = i
            lit = 0
            while j < n and lit < 127:
                r2 = 1
                while j + r2 < n and data[j + r2] == data[j] and r2 < 3:
                    r2 += 1
                if r2 >= 3:
                    break
                j += r2
                lit += r2
            lit = max(lit, 1)
            lit = min(lit, 127, n - i)
            out += struct.pack("b", -lit) + data[i : i + lit]
            i += lit
    return bytes(out)


def encode_exr(channels: dict, w: int, h: int, compression: int = 0) -> bytes:
    """Fixture encoder: half-float scanline EXR, compression NONE (0),
    RLE (1), ZIPS (2) or ZIP (3); channels stored in sorted (spec)
    order."""
    if compression not in (0, 1, 2, 3):
        raise ValueError("fixture encoder writes NONE/RLE/ZIPS/ZIP only")
    names = sorted(channels)
    chlist = b""
    for n in names:
        chlist += n.encode() + b"\x00" + struct.pack("<IIII", _PT_HALF, 0, 1, 1)
    chlist += b"\x00"

    def attr(name: str, typ: str, data: bytes) -> bytes:
        return name.encode() + b"\x00" + typ.encode() + b"\x00" + struct.pack("<I", len(data)) + data

    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    head = struct.pack("<II", EXR_MAGIC, 2)
    head += attr("channels", "chlist", chlist)
    head += attr("compression", "compression", bytes([compression]))
    head += attr("dataWindow", "box2i", box)
    head += attr("displayWindow", "box2i", box)
    head += attr("lineOrder", "lineOrder", b"\x00")
    head += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    head += attr("screenWindowCenter", "v2f", struct.pack("<ff", 0.0, 0.0))
    head += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    head += b"\x00"
    lpc = _LINES_PER_CHUNK[compression]
    chunks = []
    for y in range(0, h, lpc):
        lines = min(lpc, h - y)
        raw = b""
        for li in range(lines):
            for n in names:
                row = np.asarray(channels[n][y + li], dtype="<f2")
                raw += row.tobytes()
        if compression == 0:
            data = raw
        elif compression == 1:
            z = _rle(_predecode(raw))
            data = z if len(z) < len(raw) else raw
        else:
            z = zlib.compress(_predecode(raw))
            data = z if len(z) < len(raw) else raw
        chunks.append((y, data))
    n_chunks = len(chunks)
    table_off = len(head)
    body_off = table_off + 8 * n_chunks
    offsets = []
    pos = body_off
    for y, data in chunks:
        offsets.append(pos)
        pos += 8 + len(data)
    out = bytearray(head)
    out += struct.pack(f"<{n_chunks}q", *offsets)
    for y, data in chunks:
        out += struct.pack("<ii", y, len(data)) + data
    return bytes(out)
