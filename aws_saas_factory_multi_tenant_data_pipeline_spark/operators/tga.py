"""TGA (Truevision Targa) decode + spec-literal encoder, pure
stdlib+numpy — the game-asset/texture slice of a crawled media corpus
(mod archives, 3D-asset dumps, screenshot tools ship .tga).

Public structure only (Truevision "TGA File Format Specification 2.0",
1991): an 18-byte little-endian header (ID length, color-map spec,
image type, origin, width/height, pixel depth, image descriptor), an
optional image ID block, an optional color map, then pixel data —
raw (types 2/3) or run-length encoded (types 10/11) with 1-byte packet
headers (bit 7 = RLE, low 7 bits = count−1, max 128 px per packet).
Pixels are BGR(A) byte order; descriptor bit 5 selects top-down rows
(screen origin), bits 0-3 give the attribute (alpha) depth.

Declared scope (per-row-quarantinable ValueError boundaries, the codec
convention): true-color 24/32-bit (types 2/10), grayscale 8-bit
(types 3/11), both row origins; alpha is dropped after decode (the
RGB MEDIA convention). Color-mapped types 1/9 and 15/16-bit depths
quarantine with named errors. A 64 Mpx bound rejects crafted headers
before allocation.

Sniffing note: TGA has NO magic number — the format is routed by
extension (`_EXT_KIND`) and validated structurally; the registry's
payload sniffer cannot claim it, so `decode_tga` is exposed for the
extension-routed ingest path and for direct registry swaps.
"""

from __future__ import annotations

import struct

import numpy as np

#: same declared decode bound as the other image codecs (64 Mpx)
_MAX_PIXELS = 1 << 26


def decode_tga(payload: bytes):
    """Decode a TGA payload to (uint8 pixels [h, w, 3], width, height)."""
    if len(payload) < 18:
        raise ValueError("not a TGA stream (short header)")
    (
        id_len,
        cmap_type,
        img_type,
        _cmap_first,
        cmap_len,
        _cmap_bits,
        _x0,
        _y0,
        w,
        h,
        depth,
        desc,
    ) = struct.unpack("<BBBHHBHHHHBB", payload[:18])
    if img_type in (1, 9):
        raise ValueError("color-mapped TGA outside the declared scope")
    if img_type not in (2, 3, 10, 11):
        raise ValueError(f"TGA image type {img_type} outside the declared scope")
    if cmap_type not in (0, 1):
        raise ValueError(f"bad TGA color-map type {cmap_type}")
    if w == 0 or h == 0:
        raise ValueError("bad TGA dimensions")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"image {w}x{h} exceeds the 64 Mpx decode bound")
    gray = img_type in (3, 11)
    if gray and depth != 8:
        raise ValueError(f"grayscale TGA depth {depth} outside the declared scope")
    if not gray and depth not in (24, 32):
        raise ValueError(f"true-color TGA depth {depth} outside the declared scope")
    bpp = depth // 8
    off = 18 + id_len
    if cmap_type == 1:
        off += cmap_len * ((_cmap_bits + 7) // 8)
    if off > len(payload):
        raise ValueError("torn TGA header blocks")

    n = w * h
    if img_type in (2, 3):  # raw
        need = n * bpp
        if off + need > len(payload):
            raise ValueError("TGA pixel data ran out")
        flat = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    else:  # RLE
        out = np.empty(n * bpp, dtype=np.uint8)
        got = 0
        pos = off
        ln = len(payload)
        while got < n * bpp:
            if pos >= ln:
                raise ValueError("TGA RLE stream ran out")
            hdr = payload[pos]
            pos += 1
            count = (hdr & 0x7F) + 1
            if hdr & 0x80:  # run packet: one pixel repeated
                if pos + bpp > ln:
                    raise ValueError("torn TGA RLE run packet")
                px = np.frombuffer(payload, dtype=np.uint8, count=bpp, offset=pos)
                pos += bpp
                end = got + count * bpp
                if end > n * bpp:
                    raise ValueError("TGA RLE overruns the pixel count")
                out[got:end] = np.tile(px, count)
                got = end
            else:  # literal packet
                need = count * bpp
                if pos + need > ln:
                    raise ValueError("torn TGA RLE literal packet")
                end = got + need
                if end > n * bpp:
                    raise ValueError("TGA RLE overruns the pixel count")
                out[got:end] = np.frombuffer(
                    payload, dtype=np.uint8, count=need, offset=pos
                )
                pos += need
                got = end
        flat = out

    if gray:
        img = np.repeat(flat.reshape(h, w)[:, :, None], 3, axis=2)
    else:
        px = flat.reshape(h, w, bpp)
        img = px[:, :, 2::-1]  # BGR(A) → RGB, alpha dropped
    if not desc & 0x20:  # bit 5 clear = bottom-up storage (the default)
        img = img[::-1]
    return np.ascontiguousarray(img), w, h


def encode_tga(
    pixels: np.ndarray,
    rle: bool = False,
    top_down: bool = False,
) -> bytes:
    """Spec-literal TGA writer — the fixture builder. ``pixels`` is
    uint8 [h, w] (grayscale) or [h, w, 3] (RGB); emits types 2/3 raw or
    10/11 RLE with real run/literal packets."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        gray = True
        flat_px = px
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w = px.shape[:2]
        gray = False
        flat_px = px[:, :, ::-1]  # RGB → BGR
    else:
        raise ValueError("pixels must be [h, w] or [h, w, 3] uint8")
    if not top_down:
        flat_px = flat_px[::-1]
    bpp = 1 if gray else 3
    img_type = (3 if gray else 2) + (8 if rle else 0)
    desc = 0x20 if top_down else 0x00
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0, 0, 0, w, h, bpp * 8, desc
    )
    flat = flat_px.reshape(-1, bpp)
    if not rle:
        return hdr + flat.tobytes()
    out = bytearray(hdr)
    n = flat.shape[0]
    i = 0
    while i < n:
        # find run of equal pixels
        j = i + 1
        while j < n and j - i < 128 and np.array_equal(flat[j], flat[i]):
            j += 1
        if j - i >= 2:
            out.append(0x80 | (j - i - 1))
            out += flat[i].tobytes()
            i = j
            continue
        # literal run until the next >=2 repeat or 128 px
        k = i
        while k < n and k - i < 128:
            if k + 1 < n and np.array_equal(flat[k], flat[k + 1]):
                break
            k += 1
        out.append(k - i - 1)
        out += flat[i:k].tobytes()
        i = k
    return bytes(out)
