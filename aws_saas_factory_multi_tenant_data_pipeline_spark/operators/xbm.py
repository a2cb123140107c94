"""XBM (X BitMap) codec — the X11 C-source bitmap format (public
X11/Xlib documentation; the format IS a C array literal).

A REAL third-party file ships in every CPython checkout
(test/imghdrdata/python.xbm) — its bit pattern is pinned bit-for-bit
against the PBM (P4) twin of the same logo through two INDEPENDENT
parsers (tests/test_realworld_r11.py).

Layout: ``#define <name>_width W``, ``#define <name>_height H``,
optional hotspot defines, then ``static [unsigned] char
<name>_bits[] = { 0xNN, ... }``. Bits are LSB-FIRST within each byte
(the opposite of PBM), rows padded to whole bytes; a set bit is
foreground (ink)."""

from __future__ import annotations

import re

import numpy as np

_DEF_RE = re.compile(rb"#define\s+\w*?_?(width|height|x_hot|y_hot)\s+(\d+)")
_BYTE_RE = re.compile(rb"0[xX]([0-9a-fA-F]{1,2})")


def decode_xbm(payload: bytes):
    """Decode XBM source text to (bits uint8 [h, w] with 1 = ink, w, h)."""
    if b"#define" not in payload[:256]:
        raise ValueError("not an XBM payload (no #define header)")
    dims = {}
    for m in _DEF_RE.finditer(payload):
        dims[m.group(1).decode()] = int(m.group(2))
    w, h = dims.get("width"), dims.get("height")
    if not w or not h:
        raise ValueError("XBM without width/height defines")
    brace = payload.find(b"{")
    if brace < 0:
        raise ValueError("XBM without a bits array")
    vals = [int(m.group(1), 16) for m in _BYTE_RE.finditer(payload[brace:])]
    stride = (w + 7) // 8
    if len(vals) < stride * h:
        raise ValueError("torn XBM bits array")
    rows = np.array(vals[: stride * h], dtype=np.uint8).reshape(h, stride)
    bits = np.unpackbits(rows, axis=1, bitorder="little")[:, :w]
    return bits, w, h


def decode_xbm_rgb(payload: bytes):
    """Registry adapter: ink black on white, (rgb [h, w, 3], w, h)."""
    bits, w, h = decode_xbm(payload)
    g = np.where(bits == 1, 0, 255).astype(np.uint8)
    return np.repeat(g[..., None], 3, axis=2), w, h


def encode_xbm(bits, name: str = "fixture") -> bytes:
    """Fixture encoder: 1 = ink; mirrors decode_xbm exactly."""
    arr = np.asarray(bits, dtype=np.uint8)
    h, w = arr.shape
    packed = np.packbits(arr, axis=1, bitorder="little")
    body = ", ".join(f"0x{b:02x}" for b in packed.flatten())
    return (
        f"#define {name}_width {w}\n#define {name}_height {h}\n"
        f"static unsigned char {name}_bits[] = {{\n{body}}};\n"
    ).encode()
