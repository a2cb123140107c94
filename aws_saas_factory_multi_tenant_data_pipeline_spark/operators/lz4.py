"""LZ4 block + frame codec — stdlib + from-spec, r13.

LZ4 is a first-class lakehouse/crawl compression (parquet codec,
.tar.lz4 crawl dumps, Kafka message sets); the archives family gains
it here from the PUBLIC specs — the block format (lz4_Block_format.md:
token, LSIC length extension, little-endian 16-bit offsets, minmatch
4, overlap copies, end-of-block rules) and the frame format
(lz4_Frame_format.md v1.6.x: magic 0x184D2204, FLG/BD descriptor with
its xxHash32-derived header checksum, independent/linked blocks,
optional block checksums, content size, content checksum), plus a
from-spec xxHash32 (the frame format's checksum primitive, public
xxHash spec) — all pinned BOTH DIRECTIONS against the system liblz4
via ctypes (tests/test_realworld_r13.py: our decoder on real
liblz4-frame output, real liblz4 decoding our encoder's frames).

Encoder: a correct greedy hash-chain matcher (fixture-grade, not
ratio-chasing) whose output is valid LZ4 the reference library
accepts — the hevc_enc convention.

Decode contract: ValueError — and only ValueError — on torn input.
Scale shape: runs inside Arrow ``mapInPandas`` archive passes,
partition-local, one payload per call (operators/archives.py).
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204

# --- xxHash32 (public spec; the frame format's checksum primitive) -----------

_P1, _P2, _P3, _P4, _P5 = (
    2654435761, 2246822519, 3266489917, 668265263, 374761393,
)
_M = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M


def xxhash32(data: bytes, seed: int = 0) -> int:
    """Reference xxHash32 (32-bit lanes, the published algorithm)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 16:
            for _ in range(1):
                pass
            a, b, c, d = struct.unpack_from("<IIII", data, i)
            v1 = (_rotl((v1 + a * _P2) & _M, 13) * _P1) & _M
            v2 = (_rotl((v2 + b * _P2) & _M, 13) * _P1) & _M
            v3 = (_rotl((v3 + c * _P2) & _M, 13) * _P1) & _M
            v4 = (_rotl((v4 + d * _P2) & _M, 13) * _P1) & _M
            i += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 4:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl((h + k * _P3) & _M, 17) * _P4) & _M
        i += 4
    while i < n:
        h = (_rotl((h + data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 15
    h = (h * _P2) & _M
    h ^= h >> 13
    h = (h * _P3) & _M
    h ^= h >> 16
    return h


# --- block format ------------------------------------------------------------


def lz4_block_decompress(src: bytes, max_size: int = 1 << 28) -> bytes:
    """One raw LZ4 block → bytes (lz4_Block_format.md)."""
    out = bytearray()
    i = 0
    n = len(src)
    while True:
        if i >= n:
            raise ValueError("torn LZ4 block: missing token")
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise ValueError("torn LZ4 literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise ValueError("torn LZ4 literals")
        out += src[i:i + lit_len]
        i += lit_len
        if len(out) > max_size:
            raise ValueError("LZ4 output exceeds the size bound")
        if i == n:
            return bytes(out)  # last sequence: literals only
        if i + 2 > n:
            raise ValueError("torn LZ4 match offset")
        (offset,) = struct.unpack_from("<H", src, i)
        i += 2
        if offset == 0 or offset > len(out):
            raise ValueError("LZ4 match offset out of window")
        match_len = (token & 0xF)
        if match_len == 15:
            while True:
                if i >= n:
                    raise ValueError("torn LZ4 match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += 4
        pos = len(out) - offset
        if offset >= match_len:
            out += out[pos:pos + match_len]
        else:
            for _ in range(match_len):  # overlap-correct byte copy
                out.append(out[pos])
                pos += 1
        if len(out) > max_size:
            raise ValueError("LZ4 output exceeds the size bound")


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy hash-chain LZ4 block encoder (valid output the reference
    library decodes byte-identically; fixture-grade ratio). Honors the
    end-of-block rules: the last 5 bytes are literals and the last
    match starts >= 12 bytes before the end."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x00"

    def write_seq(lit_start: int, lit_end: int, match_len: int,
                  offset: int) -> None:
        nonlocal out
        lit_len = lit_end - lit_start
        tok_lit = min(lit_len, 15)
        tok_match = min(match_len - 4, 15) if match_len else 0
        out.append((tok_lit << 4) | tok_match)
        rem = lit_len - 15
        while rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        out += src[lit_start:lit_end]
        if match_len:
            out += struct.pack("<H", offset)
            rem = match_len - 4 - 15
            while rem >= 0:
                out.append(min(rem, 255))
                if rem < 255:
                    break
                rem -= 255

    table: dict = {}
    i = 0
    anchor = 0
    limit = n - 12  # matches must not start in the last 12 bytes
    while i <= limit and n >= 13:
        key = src[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and src[cand:cand + 4] == key:
            mlen = 4
            # cap so the last 5 bytes stay literal
            cap = n - 5 - i
            while mlen < cap and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            if mlen >= 4:
                write_seq(anchor, i, mlen, i - cand)
                i += mlen
                anchor = i
                continue
        i += 1
    write_seq(anchor, n, 0, 0)
    return bytes(out)


# --- frame format ------------------------------------------------------------


def lz4_decompress(payload: bytes, max_size: int = 1 << 28) -> bytes:
    """LZ4 FRAME → bytes (lz4_Frame_format.md). Supports independent
    AND linked blocks, block checksums, content size, content
    checksum; skippable frames (magic 0x184D2A50..5F) are skipped.
    Dictionary-id frames are a named boundary."""
    i = 0
    n = len(payload)
    out = bytearray()
    saw_frame = False
    while i < n:
        if i + 4 > n:
            raise ValueError("torn LZ4 frame magic")
        (magic,) = struct.unpack_from("<I", payload, i)
        i += 4
        if (magic & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            if i + 4 > n:
                raise ValueError("torn LZ4 skippable frame size")
            (sz,) = struct.unpack_from("<I", payload, i)
            i += 4 + sz
            if i > n:
                raise ValueError("torn LZ4 skippable frame body")
            continue
        if magic != _MAGIC:
            raise ValueError(f"LZ4 frame magic {magic:#x} invalid")
        saw_frame = True
        if i + 2 > n:
            raise ValueError("torn LZ4 frame descriptor")
        flg = payload[i]
        bd = payload[i + 1]
        version = flg >> 6
        if version != 1:
            raise ValueError(f"LZ4 frame version {version} out of range")
        b_indep = (flg >> 5) & 1
        b_checksum = (flg >> 4) & 1
        c_size = (flg >> 3) & 1
        c_checksum = (flg >> 2) & 1
        dict_id = flg & 1
        if flg & 2:
            raise ValueError("LZ4 frame reserved FLG bit set")
        if dict_id:
            raise ValueError(
                "LZ4 dictionary-id frames outside the declared scope"
            )
        if bd & 0x8F:
            raise ValueError("LZ4 frame reserved BD bits set")
        bmax_id = (bd >> 4) & 7
        if bmax_id < 4:
            raise ValueError("LZ4 block-max-size id out of range")
        desc_start = i
        i += 2
        declared = None
        if c_size:
            if i + 8 > n:
                raise ValueError("torn LZ4 content size")
            (declared,) = struct.unpack_from("<Q", payload, i)
            i += 8
        if i >= n:
            raise ValueError("torn LZ4 header checksum")
        hc = payload[i]
        want = (xxhash32(payload[desc_start:i]) >> 8) & 0xFF
        if hc != want:
            raise ValueError("LZ4 frame header checksum mismatch")
        i += 1
        frame_start_len = len(out)
        while True:
            if i + 4 > n:
                raise ValueError("torn LZ4 block size")
            (bsize,) = struct.unpack_from("<I", payload, i)
            i += 4
            if bsize == 0:  # EndMark
                break
            uncompressed = bool(bsize & 0x80000000)
            bsize &= 0x7FFFFFFF
            if i + bsize > n:
                raise ValueError("torn LZ4 block body")
            blk = payload[i:i + bsize]
            i += bsize
            if b_checksum:
                if i + 4 > n:
                    raise ValueError("torn LZ4 block checksum")
                (bc,) = struct.unpack_from("<I", payload, i)
                i += 4
                if bc != xxhash32(blk):
                    raise ValueError("LZ4 block checksum mismatch")
            if uncompressed:
                out += blk
            elif b_indep:
                out += lz4_block_decompress(blk, max_size)
            else:
                # linked blocks: matches may reach into the previous
                # 64 KB of decoded output — decode against the tail
                # and strip the prefix
                prefix = bytes(out[max(frame_start_len,
                                       len(out) - 65536):len(out)])
                merged = _block_decompress_with_prefix(
                    blk, prefix, max_size
                )
                out += merged
            if len(out) > max_size:
                raise ValueError("LZ4 output exceeds the size bound")
        if c_checksum:
            if i + 4 > n:
                raise ValueError("torn LZ4 content checksum")
            (cc,) = struct.unpack_from("<I", payload, i)
            i += 4
            if cc != xxhash32(bytes(out[frame_start_len:])):
                raise ValueError("LZ4 content checksum mismatch")
        if declared is not None and len(out) - frame_start_len != declared:
            raise ValueError("LZ4 content size disagrees with the frame")
    if not saw_frame:
        raise ValueError("no LZ4 frame in payload")
    return bytes(out)


def _block_decompress_with_prefix(src: bytes, prefix: bytes,
                                  max_size: int) -> bytes:
    full = bytearray(prefix)
    base = len(prefix)
    i = 0
    n = len(src)
    while True:
        if i >= n:
            raise ValueError("torn LZ4 block: missing token")
        token = src[i]
        i += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if i >= n:
                    raise ValueError("torn LZ4 literal length")
                b = src[i]
                i += 1
                lit_len += b
                if b != 255:
                    break
        if i + lit_len > n:
            raise ValueError("torn LZ4 literals")
        full += src[i:i + lit_len]
        i += lit_len
        if len(full) - base > max_size:
            raise ValueError("LZ4 output exceeds the size bound")
        if i == n:
            return bytes(full[base:])
        if i + 2 > n:
            raise ValueError("torn LZ4 match offset")
        (offset,) = struct.unpack_from("<H", src, i)
        i += 2
        if offset == 0 or offset > len(full):
            raise ValueError("LZ4 match offset out of window")
        match_len = token & 0xF
        if match_len == 15:
            while True:
                if i >= n:
                    raise ValueError("torn LZ4 match length")
                b = src[i]
                i += 1
                match_len += b
                if b != 255:
                    break
        match_len += 4
        pos = len(full) - offset
        if offset >= match_len:
            full += full[pos:pos + match_len]
        else:
            for _ in range(match_len):
                full.append(full[pos])
                pos += 1


def lz4_compress(data: bytes, block_size: int = 1 << 16,
                 content_checksum: bool = True,
                 block_checksum: bool = False,
                 content_size: bool = True) -> bytes:
    """Bytes → one independent-blocks LZ4 frame the reference library
    decodes (the fixture-encoder direction of the liblz4 pin)."""
    out = bytearray(struct.pack("<I", _MAGIC))
    flg = (1 << 6) | (1 << 5)  # version 1, independent blocks
    if block_checksum:
        flg |= 1 << 4
    if content_size:
        flg |= 1 << 3
    if content_checksum:
        flg |= 1 << 2
    bd = 4 << 4  # 64 KB block max (id 4)
    desc = bytes([flg, bd])
    if content_size:
        desc += struct.pack("<Q", len(data))
    out += desc
    out.append((xxhash32(desc) >> 8) & 0xFF)
    for off in range(0, len(data), block_size) or [0]:
        chunk = data[off:off + block_size]
        comp = lz4_block_compress(chunk)
        if len(comp) >= len(chunk) and chunk:
            out += struct.pack("<I", 0x80000000 | len(chunk)) + chunk
            blk = chunk
        else:
            out += struct.pack("<I", len(comp)) + comp
            blk = comp
        if block_checksum:
            out += struct.pack("<I", xxhash32(blk))
    if not data:
        comp = lz4_block_compress(b"")
        out += struct.pack("<I", len(comp)) + comp
        if block_checksum:
            out += struct.pack("<I", xxhash32(comp))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxhash32(data))
    return bytes(out)
