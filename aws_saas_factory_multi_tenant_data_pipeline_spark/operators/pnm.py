"""Netpbm PBM/PGM codecs (P1/P2/P4/P5) — completing the PNM family
next to the existing P3/P6 PPM decoder (operators/multimodal.py).

REAL third-party files ship in every CPython checkout
(test/imghdrdata/python.pbm P4, python.pgm P5); the PBM bit pattern
is additionally cross-checked bit-for-bit against the XBM twin of the
same logo through two independent parsers
(tests/test_realworld_r11.py).

Format (netpbm man pages, public): ASCII header tokens (magic, width,
height, [maxval]) with '#' comments; P1/P2 ASCII samples; P4 packed
bits MSB-FIRST (1 = black), rows byte-padded; P5 one byte per sample
(maxval <= 255)."""

from __future__ import annotations

import numpy as np


def _header(payload: bytes, n_tokens: int):
    toks, i, n = [], 2, len(payload)
    while len(toks) < n_tokens and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < n_tokens:
        raise ValueError("truncated PNM header")
    return [int(t) for t in toks], i


def decode_pnm_gray(payload: bytes):
    """Decode P1/P2/P4/P5 to (gray uint8 [h, w], w, h) — bitmaps map
    1(black) -> 0 and 0(white) -> 255, the display convention."""
    magic = payload[:2]
    if magic in (b"P1", b"P4"):
        (w, h), i = _header(payload, 2)
        if magic == b"P1":
            # P1 digits need no separating whitespace (netpbm pbm(5))
            vals = [c - 0x30 for c in payload[i:] if c in (0x30, 0x31)]
            bits = np.array(vals, dtype=np.uint8)
            if bits.size < w * h:
                raise ValueError("truncated P1 body")
            bits = bits[: w * h].reshape(h, w)
        else:
            stride = (w + 7) // 8
            body = payload[i + 1 : i + 1 + stride * h]
            if len(body) < stride * h:
                raise ValueError("truncated P4 body")
            rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
            bits = np.unpackbits(rows, axis=1)[:, :w]
        return np.where(bits == 1, 0, 255).astype(np.uint8), w, h
    if magic in (b"P2", b"P5"):
        (w, h, maxval), i = _header(payload, 3)
        if not 0 < maxval <= 255:
            raise ValueError("only maxval<=255 PGM supported")
        if magic == b"P2":
            px = np.array(payload[i:].split(), dtype=np.int32)
            if px.size < w * h:
                raise ValueError("truncated P2 body")
            px = px[: w * h]
        else:
            body = payload[i + 1 : i + 1 + w * h]
            if len(body) < w * h:
                raise ValueError("truncated P5 body")
            px = np.frombuffer(body, dtype=np.uint8).astype(np.int32)
        if maxval != 255:
            px = px * 255 // maxval
        return px.reshape(h, w).astype(np.uint8), w, h
    raise ValueError("not a PBM/PGM payload")


def decode_pnm_rgb(payload: bytes):
    """Registry adapter: (rgb [h, w, 3], w, h)."""
    g, w, h = decode_pnm_gray(payload)
    return np.repeat(g[..., None], 3, axis=2), w, h


def decode_pbm_bits(payload: bytes):
    """The raw bitmap (1 = black ink) for P1/P4 — the XBM cross-check."""
    g, w, h = decode_pnm_gray(payload)
    if payload[:2] not in (b"P1", b"P4"):
        raise ValueError("not a bitmap PNM")
    return (g == 0).astype(np.uint8), w, h


def encode_pnm(arr, magic: bytes) -> bytes:
    """Fixture encoder for all four forms."""
    a = np.asarray(arr)
    h, w = a.shape
    if magic == b"P4":
        packed = np.packbits(a.astype(np.uint8), axis=1)
        return b"P4\n%d %d\n" % (w, h) + packed.tobytes()
    if magic == b"P1":
        body = "\n".join(" ".join(str(int(v)) for v in row) for row in a)
        return b"P1\n%d %d\n" % (w, h) + body.encode() + b"\n"
    if magic == b"P5":
        return b"P5\n%d %d\n255\n" % (w, h) + a.astype(np.uint8).tobytes()
    if magic == b"P2":
        body = "\n".join(" ".join(str(int(v)) for v in row) for row in a)
        return b"P2\n%d %d\n255\n" % (w, h) + body.encode() + b"\n"
    raise ValueError(f"unknown PNM magic {magic!r}")
