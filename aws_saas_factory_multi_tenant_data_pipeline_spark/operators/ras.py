"""Sun Raster (.ras) codec — from the public rasterfile(5) layout.

A REAL third-party file ships in every CPython checkout
(test/imghdrdata/python.ras, 32-bit RT_FORMAT_RGB) — decoded here and
pinned pixel-for-pixel against the independent PNG decode of the same
logo (tests/test_realworld_r11.py), the r10 TIFF convention.

Format (all header fields big-endian int32):
magic 0x59a66a95 | width | height | depth (1/8/24/32) | length |
type (0 old, 1 standard, 2 byte-RLE, 3 RGB) | maptype (0 none,
1 equal-RGB planes) | maplength — then the colormap, then rows each
padded to a 16-bit boundary. 24/32-bit standard (type<=1) pixels are
BGR-ordered; RT_FORMAT_RGB (type 3) pixels are RGB-ordered; 32-bit
pixels carry the pad byte FIRST. Type 2 wraps the row bytes in the
0x80-escape RLE (0x80 0x00 = literal 0x80; 0x80 n v = v repeated n+1).

Declared boundary: maptype 2 (raw colormap) raises — its semantics
are display-specific, never guessed into pixels.
"""

from __future__ import annotations

import struct

import numpy as np

RAS_MAGIC = 0x59A66A95


def _unrle(data: bytes, need: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < need:
        b = data[i]
        if b != 0x80:
            out.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("torn Sun Raster RLE escape")
        cnt = data[i + 1]
        if cnt == 0:
            out.append(0x80)
            i += 2
            continue
        if i + 2 >= n:
            raise ValueError("torn Sun Raster RLE run")
        out += bytes([data[i + 2]]) * (cnt + 1)
        i += 3
    if len(out) < need:
        raise ValueError("torn Sun Raster image data")
    return bytes(out[:need])


def decode_ras(payload: bytes):
    """Decode a Sun Raster payload to (rgb uint8 [h, w, 3], w, h)."""
    if len(payload) < 32:
        raise ValueError("torn Sun Raster header")
    magic, w, h, depth, length, rtype, maptype, maplen = struct.unpack(
        ">8I", payload[:32]
    )
    if magic != RAS_MAGIC:
        raise ValueError("not a Sun Raster payload (bad magic)")
    if rtype > 3:
        raise ValueError(f"Sun Raster type {rtype} out of range")
    if depth not in (1, 8, 24, 32):
        raise ValueError(f"Sun Raster depth {depth} unsupported")
    if maptype == 2:
        raise ValueError("Sun Raster raw colormap (maptype 2) is a declared boundary")
    if maptype not in (0, 1):
        raise ValueError(f"Sun Raster maptype {maptype} out of range")
    cmap = None
    body = payload[32 + maplen :]
    if maptype == 1:
        if maplen % 3 or 32 + maplen > len(payload):
            raise ValueError("torn Sun Raster colormap")
        ncol = maplen // 3
        raw = payload[32 : 32 + maplen]
        cmap = np.stack(
            [
                np.frombuffer(raw[0:ncol], dtype=np.uint8),
                np.frombuffer(raw[ncol : 2 * ncol], dtype=np.uint8),
                np.frombuffer(raw[2 * ncol : 3 * ncol], dtype=np.uint8),
            ],
            axis=1,
        )
    row_bytes = (w * depth + 7) // 8
    stride = row_bytes + (row_bytes & 1)  # 16-bit row padding
    need = stride * h
    data = _unrle(body, need) if rtype == 2 else body[:need]
    if len(data) < need:
        raise ValueError("torn Sun Raster image data")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride)[:, :row_bytes]
    if depth == 1:
        bits = np.unpackbits(rows, axis=1)[:, :w]
        if cmap is not None:
            if cmap.shape[0] < 2:
                raise ValueError("Sun Raster 1-bit colormap too small")
            rgb = cmap[bits]
        else:
            # convention: bit set = black ink on white
            g = np.where(bits == 1, 0, 255).astype(np.uint8)
            rgb = np.repeat(g[..., None], 3, axis=2)
    elif depth == 8:
        if cmap is None:
            rgb = np.repeat(rows[:, :w, None], 3, axis=2)
        else:
            idx = np.minimum(rows[:, :w], cmap.shape[0] - 1)
            rgb = cmap[idx]
    else:
        ncomp = depth // 8
        px = rows.reshape(h, w, ncomp)
        if depth == 32:
            px = px[..., 1:]  # pad byte first
        if rtype == 3:
            rgb = px.copy()
        else:
            rgb = px[..., ::-1].copy()  # standard order is BGR
    return np.ascontiguousarray(rgb.astype(np.uint8)), int(w), int(h)


def encode_ras(rgb, rtype: int = 1, depth: int = 24) -> bytes:
    """Fixture encoder: 24/32-bit, type 1 (BGR) / 3 (RGB) / 2 (RLE over
    the type-1 byte order)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    if depth not in (24, 32):
        raise ValueError("fixture encoder writes 24/32-bit only")
    px = rgb if rtype == 3 else rgb[..., ::-1]
    if depth == 32:
        px = np.concatenate([np.zeros((h, w, 1), np.uint8), px], axis=2)
    row_bytes = w * (depth // 8)
    pad = row_bytes & 1
    body = bytearray()
    for r in range(h):
        body += px[r].tobytes()
        if pad:
            body += b"\x00"
    raw = bytes(body)
    if rtype == 2:
        enc = bytearray()
        i = 0
        while i < len(raw):
            v = raw[i]
            run = 1
            while i + run < len(raw) and raw[i + run] == v and run < 256:
                run += 1
            if run >= 3:
                enc += bytes([0x80, run - 1, v])
                i += run
            elif v == 0x80:
                enc += bytes([0x80, 0])
                i += 1
            else:
                enc.append(v)
                i += 1
        data = bytes(enc)
    else:
        data = raw
    head = struct.pack(
        ">8I", RAS_MAGIC, w, h, depth, len(data), rtype, 0, 0
    )
    return head + data
