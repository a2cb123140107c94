"""SGI image (.sgi/.rgb) codec — from the public SGI Image File
Format specification (Paul Haeberli, sgi.com, 1.00).

A REAL third-party file ships in every CPython checkout
(test/imghdrdata/python.sgi, RLE RGBA) — decoded here and pinned
pixel-for-pixel against the independent PNG decode of the same logo
(tests/test_realworld_r11.py).

Layout (big-endian): magic 474 (0x01da) | storage u8 (0 VERBATIM,
1 RLE) | bpc u8 | dimension u16 | xsize u16 | ysize u16 | zsize u16 |
pixmin u32 | pixmax u32 | 4 dummy | 80-byte name | colormap u32 |
404 pad (512-byte header). Pixel data is CHANNEL-PLANAR with rows
stored BOTTOM-TO-TOP. RLE: ysize*zsize u32 start offsets then u32
lengths; row packets: n = byte & 0x7f — high bit set copies the next
n literal bytes, clear repeats the next byte n times, n == 0 ends.

Declared boundaries: bpc 2 (16-bit) and colormap != 0 raise — named
errors, never guessed pixels.
"""

from __future__ import annotations

import struct

import numpy as np

SGI_MAGIC = 474


def _unrle_row(data: bytes, width: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        i += 1
        cnt = b & 0x7F
        if cnt == 0:
            break
        if b & 0x80:
            if i + cnt > n:
                raise ValueError("torn SGI RLE literal run")
            out += data[i : i + cnt]
            i += cnt
        else:
            if i >= n:
                raise ValueError("torn SGI RLE repeat run")
            out += bytes([data[i]]) * cnt
            i += 1
    if len(out) < width:
        raise ValueError("torn SGI RLE row")
    return bytes(out[:width])


def decode_sgi(payload: bytes):
    """Decode an SGI payload to (rgb uint8 [h, w, 3], w, h). zsize 1 →
    gray replicated; 3 → RGB; 4 → RGBA with alpha dropped here (the
    registry's RGB contract); use :func:`decode_sgi_rgba` for alpha."""
    rgba, w, h = decode_sgi_rgba(payload)
    return rgba[..., :3].copy(), w, h


def decode_sgi_rgba(payload: bytes):
    if len(payload) < 512:
        raise ValueError("torn SGI header")
    magic, storage, bpc, dim, w, h, z = struct.unpack(">HBBHHHH", payload[:12])
    if magic != SGI_MAGIC:
        raise ValueError("not an SGI payload (bad magic)")
    if storage > 1:
        raise ValueError(f"SGI storage {storage} out of range")
    if bpc != 1:
        raise ValueError("SGI 16-bit (bpc 2) is a declared boundary")
    (cmap,) = struct.unpack(">I", payload[104:108])
    if cmap != 0:
        raise ValueError(f"SGI colormap {cmap} is a declared boundary")
    if dim == 1:
        h, z = 1, 1
    elif dim == 2:
        z = 1
    if z not in (1, 3, 4):
        raise ValueError(f"SGI zsize {z} unsupported")
    planes = np.empty((z, h, w), dtype=np.uint8)
    if storage == 0:
        need = 512 + w * h * z
        if len(payload) < need:
            raise ValueError("torn SGI verbatim data")
        raw = np.frombuffer(payload[512:need], dtype=np.uint8)
        planes = raw.reshape(z, h, w)
    else:
        tab = 512
        ntab = h * z
        if len(payload) < 512 + 8 * ntab:
            raise ValueError("torn SGI RLE offset tables")
        starts = struct.unpack(f">{ntab}I", payload[tab : tab + 4 * ntab])
        lens = struct.unpack(
            f">{ntab}I", payload[tab + 4 * ntab : tab + 8 * ntab]
        )
        for c in range(z):
            for r in range(h):
                k = c * h + r
                s, ln = starts[k], lens[k]
                if s + ln > len(payload):
                    raise ValueError("torn SGI RLE row data")
                planes[c, r] = np.frombuffer(
                    _unrle_row(payload[s : s + ln], w), dtype=np.uint8
                )
    planes = planes[:, ::-1, :]  # rows are stored bottom-to-top
    if z == 1:
        rgb = np.repeat(planes[0][..., None], 3, axis=2)
        a = np.full((h, w), 255, dtype=np.uint8)
    elif z == 3:
        rgb = np.stack([planes[0], planes[1], planes[2]], axis=-1)
        a = np.full((h, w), 255, dtype=np.uint8)
    else:
        rgb = np.stack([planes[0], planes[1], planes[2]], axis=-1)
        a = planes[3]
    rgba = np.concatenate([rgb, a[..., None]], axis=2)
    return np.ascontiguousarray(rgba), int(w), int(h)


def _rle_row(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 127:
            run += 1
        if run >= 3:
            out += bytes([run, row[i]])
            i += run
        else:
            j = i
            lit = 0
            while j < n and lit < 127:
                run2 = 1
                while j + run2 < n and row[j + run2] == row[j] and run2 < 3:
                    run2 += 1
                if run2 >= 3 or lit + run2 > 127:
                    break
                j += run2
                lit += run2
            if lit == 0:  # forced split inside a pair at the 127 cap
                lit = 1
            out += bytes([0x80 | lit]) + row[i : i + lit]
            i += lit
    out.append(0)
    return bytes(out)


def encode_sgi(rgba, storage: int = 1) -> bytes:
    """Fixture encoder: zsize from the input's last axis (2D gray → 1),
    VERBATIM or RLE, bpc 1."""
    arr = np.asarray(rgba, dtype=np.uint8)
    if arr.ndim == 2:
        planes = arr[None, ...]
    else:
        planes = np.transpose(arr, (2, 0, 1))
    z, h, w = planes.shape
    planes = planes[:, ::-1, :]  # store bottom-to-top
    head = struct.pack(
        ">HBBHHHH", SGI_MAGIC, storage, 1, 3 if z > 1 else 2, w, h, z
    )
    head += struct.pack(">II", 0, 255) + b"\x00" * 4
    head += b"fixture".ljust(80, b"\x00")
    head += struct.pack(">I", 0)
    head += b"\x00" * (512 - len(head))
    if storage == 0:
        return head + planes.tobytes()
    rows = []
    for c in range(z):
        for r in range(h):
            rows.append(_rle_row(planes[c, r].tobytes()))
    starts = []
    off = 512 + 8 * h * z
    for rb in rows:
        starts.append(off)
        off += len(rb)
    body = struct.pack(f">{len(rows)}I", *starts)
    body += struct.pack(f">{len(rows)}I", *[len(rb) for rb in rows])
    return head + body + b"".join(rows)
