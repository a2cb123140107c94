"""ICO (favicon) and BMP decode, pure stdlib struct + numpy — the
formats a web crawl's icon/asset sweep actually yields after
PNG/JPEG/GIF.

Public structure only: the Windows ICONDIR/ICONDIRENTRY layout and the
BITMAPINFOHEADER DIB (MSDN/Wikipedia-documented since Windows 3.x):
bottom-up BGR(A) rows padded to 4 bytes, palettes for <=8 bpp, the ICO
XOR+AND mask pair (height doubled in the header), and modern PNG-encoded
ICO entries (Vista+), which delegate to this package's PNG decoder.

Declared scope (per-row-quarantinable ValueError boundaries, the same
convention as the other codecs):
- BI_RGB (uncompressed) DIBs at 1/4/8/24/32 bpp; RLE/bitfields raise,
- the LARGEST directory entry decodes (an .ico is a size set of the
  same mark; picking max area matches what browsers rasterize),
- transparency flattens: 32-bpp alpha and the AND mask are parsed but
  the output is RGB (this pipeline's MEDIA rows carry no alpha plane).
"""

from __future__ import annotations

import struct

import numpy as np

#: same declared decode bound as the GIF/PNG/JPEG decoders
_MAX_PIXELS = 1 << 26


def _decode_dib(
    data: bytes, expect_mask: bool, pixel_off: int | None = None
) -> tuple[np.ndarray, int, int]:
    """Decode a BITMAPINFOHEADER DIB (as found in .ico entries and after
    a BM file header). ``expect_mask``: ICO doubles biHeight to cover
    the 1-bpp AND mask below the XOR image. ``pixel_off``: explicit
    pixel-array offset relative to the DIB start (BMP's bfOffBits —
    real writers may leave a gap after the palette); must not point
    inside the header/palette."""
    if len(data) < 40:
        raise ValueError("truncated BITMAPINFOHEADER")
    (
        bisize,
        w,
        h2,
        planes,
        bpp,
        comp,
        _imgsize,
        _xppm,
        _yppm,
        used,
        _important,
    ) = struct.unpack_from("<IiihhIIiiII", data, 0)
    if bisize < 40:
        raise ValueError(f"unsupported DIB header size {bisize}")
    if comp != 0:
        raise ValueError(f"only BI_RGB DIBs supported (compression={comp})")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp}")
    # Negative biHeight marks a top-down DIB (rows stored first-to-last)
    # — common from real BMP writers. ICO entries stay bottom-up-only:
    # the doubled-height XOR+AND convention has no top-down form.
    top_down = (not expect_mask) and h2 < 0
    h = h2 // 2 if expect_mask else (-h2 if top_down else h2)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad DIB dimensions {w}x{h}")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"image {w}x{h} exceeds the 64 Mpx decode bound")
    off = bisize
    pal = None
    if bpp <= 8:
        n = used or (1 << bpp)
        if n > 1 << bpp:
            raise ValueError(f"palette claims {n} entries at {bpp} bpp")
        end = off + 4 * n
        if end > len(data):
            raise ValueError("truncated DIB palette")
        pal = np.frombuffer(data[off:end], dtype=np.uint8).reshape(n, 4)[
            :, [2, 1, 0]
        ]  # BGRX -> RGB
        off = end
    if pixel_off is not None:
        if pixel_off < off:
            raise ValueError("BMP pixel offset points inside header/palette")
        off = pixel_off
    stride = ((w * bpp + 31) // 32) * 4
    need = off + stride * h
    if need > len(data):
        raise ValueError("truncated DIB pixel data")
    rows = np.frombuffer(data[off : off + stride * h], dtype=np.uint8).reshape(
        h, stride
    )
    if not top_down:
        rows = rows[::-1]  # bottom-up storage order
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]  # BGRA->RGB
    elif bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)[:, :, [2, 1, 0]]
    else:
        bits = np.unpackbits(rows, axis=1)  # MSB-first, matches DIB packing
        if bpp == 1:
            idx = bits[:, :w]
        elif bpp == 4:
            nibbles = bits.reshape(h, -1, 4)
            idx = (
                nibbles[:, :, 0] * 8
                + nibbles[:, :, 1] * 4
                + nibbles[:, :, 2] * 2
                + nibbles[:, :, 3]
            )[:, :w]
        else:  # 8
            idx = rows[:, :w].astype(np.int64)
        idx = idx.astype(np.int64)
        if idx.max() >= len(pal):
            raise ValueError("pixel index outside DIB palette")
        px = pal[idx]
    return np.ascontiguousarray(px.astype(np.uint8)), int(w), int(h)


def decode_bmp(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a standalone .bmp (BITMAPFILEHEADER + BI_RGB DIB)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 14:
        raise ValueError("truncated BITMAPFILEHEADER")
    # honor bfOffBits: real writers may leave a gap between the palette
    # and the pixel array — ignoring it silently shifts every pixel
    # (r8 self-review repro)
    (off_bits,) = struct.unpack_from("<I", payload, 10)
    if off_bits < 14:
        raise ValueError("BMP pixel offset inside the file header")
    return _decode_dib(payload[14:], expect_mask=False, pixel_off=off_bits - 14)


def decode_ico(payload: bytes, decoders: dict | None = None):
    """Decode the LARGEST image of an .ico payload to (pixels HxWx3
    uint8, w, h); PNG-encoded entries (Vista+) route through the image
    codec registry."""
    if payload[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO payload")
    if len(payload) < 6:
        raise ValueError("truncated ICONDIR")
    (count,) = struct.unpack_from("<H", payload, 4)
    if count == 0:
        raise ValueError("ICO with zero images")
    best = None
    for i in range(count):
        base = 6 + 16 * i
        if base + 16 > len(payload):
            raise ValueError("truncated ICONDIRENTRY")
        bw, bh = payload[base], payload[base + 1]
        w, h = bw or 256, bh or 256
        size, off = struct.unpack_from("<II", payload, base + 8)
        if off + size > len(payload):
            raise ValueError("ICONDIRENTRY points outside payload")
        if best is None or w * h > best[0]:
            best = (w * h, off, size)
    _area, off, size = best
    blob = payload[off : off + size]
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            decode_image,
        )

        return decode_image(blob, decoders)
    return _decode_dib(blob, expect_mask=True)


def encode_ico(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a single-image 32-bpp ICO —
    the spec-literal fixture builder (alpha 255, empty AND mask)."""
    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    if w > 256 or h > 256:
        raise ValueError("ICO images are at most 256x256")
    bgra = np.zeros((h, w, 4), dtype=np.uint8)
    bgra[:, :, 0] = px[:, :, 2]
    bgra[:, :, 1] = px[:, :, 1]
    bgra[:, :, 2] = px[:, :, 0]
    bgra[:, :, 3] = 255
    xor_rows = bgra[::-1].reshape(h, w * 4).tobytes()
    mask_stride = ((w + 31) // 32) * 4
    and_mask = b"\x00" * (mask_stride * h)
    dib = (
        struct.pack(
            "<IiihhIIiiII", 40, w, h * 2, 1, 32, 0, len(xor_rows), 0, 0, 0, 0
        )
        + xor_rows
        + and_mask
    )
    entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(dib), 22
    )
    return b"\x00\x00\x01\x00\x01\x00" + entry + dib
