"""Baseline TIFF decode + a spec-literal encoder, pure stdlib+numpy —
the scanned-document / scientific-imagery slice of a crawled corpus
(arXiv figure dumps, OCR datasets, fax archives ship as .tif).

Public structure only (TIFF 6.0 specification, Adobe 1992, §2-§9
baseline): a header (``II``/``MM`` byte order + magic 42 + IFD0
offset), one IFD of 12-byte tagged entries (read with the same
bounds-checked reader the EXIF operator uses — EXIF *is* a TIFF IFD
tree), and image data in strips addressed by StripOffsets /
StripByteCounts / RowsPerStrip. Compressions: 1 (none), 5 (LZW
[r11] — the shared operators/lzw.py core, early-change dialect,
horizontal-differencing Predictor 2, pinned against REAL
libtiff-written streams via ctypes in tests), 8/32946 (Deflate
[r11], zlib strips + the same predictor path, equally real-file
pinned) and
32773 (PackBits — the Apple run-length scheme of TIFF 6.0 §9: literal
runs for n in 0..127, repeat runs for n in -1..-127, -128 is a noop).

Declared scope (per-row-quarantinable ValueError boundaries, the codec
convention): 8-bit grayscale (PhotometricInterpretation 0 WhiteIsZero
— inverted per spec — and 1 BlackIsZero), 8-bit RGB, and 8-bit palette
(ColorMap's 16-bit entries scaled down); chunky planar config only.
JPEG compression, tiled layout (TileWidth present), planar
config 2, sample depths other than 8, and extra-sample alpha planes
quarantine with named errors — each is a seam a native binding
(libtiff) can fill through the codec registry at scale.

Reference parity: the media ingestion surface (`README.md:1-109` of
the reference); decoded rows flow through the same aHash/pHash dedup
and EXIF-audit machinery as PNG/JPEG/GIF/ICO/QOI.
"""

from __future__ import annotations

import struct

import numpy as np

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import _read_ifd

#: same declared decode bound as the other image codecs (64 Mpx)
_MAX_PIXELS = 1 << 26

_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES_PER_PIXEL = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_BYTE_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_JPEG_TABLES = 347
_T_COLOR_MAP = 320
_T_EXTRA_SAMPLES = 338
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_BYTE_COUNTS = 325


def packbits_decode(blob: bytes, expected: int) -> bytes:
    """TIFF 6.0 §9 PackBits: returns exactly ``expected`` bytes or tears."""
    out = bytearray()
    pos = 0
    n = len(blob)
    while len(out) < expected:
        if pos >= n:
            raise ValueError("PackBits stream ran out")
        c = blob[pos]
        pos += 1
        if c < 128:  # literal run of c+1 bytes
            if pos + c + 1 > n:
                raise ValueError("torn PackBits literal run")
            out += blob[pos : pos + c + 1]
            pos += c + 1
        elif c == 128:  # noop
            continue
        else:  # repeat run: next byte 257-c times
            if pos >= n:
                raise ValueError("torn PackBits repeat run")
            out += bytes([blob[pos]]) * (257 - c)
            pos += 1
    if len(out) > expected:
        # a run crossing the row/strip boundary is structural damage
        raise ValueError("PackBits output overruns the strip size")
    return bytes(out)


def packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits encoder (TIFF 6.0 recommends restarting at each
    row): repeat runs for >=3 equal bytes, literal runs otherwise."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length of equal bytes
        j = i + 1
        while j < n and j - i < 127 and row[j] == row[i]:
            j += 1
        if j - i >= 3:
            out.append((257 - (j - i)) & 0xFF)
            out.append(row[i])
            i = j
            continue
        # literal: scan until a >=3 run starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += row[i:k]
        i = k
    return bytes(out)


def _first(v, default=None):
    if v is None:
        return default
    if isinstance(v, (list, tuple)):
        v = v[0] if v else None
    if not isinstance(v, int):
        # a damaged entry decoded under the wrong type (RATIONAL tuple,
        # ASCII string): structural damage, quarantine
        raise ValueError(f"malformed TIFF tag value {v!r}")
    return v


def _int_list(v, what: str) -> list[int]:
    if isinstance(v, int):
        return [v]
    if not isinstance(v, list) or not all(isinstance(x, int) for x in v):
        raise ValueError(f"malformed TIFF {what} table")
    return v



def _decode_chunk(raw: bytes, comp: int, rows: int, row_bytes: int,
                  predictor: int, spp: int) -> bytes:
    """Decompress + un-predict one strip/tile to exactly rows*row_bytes."""
    if comp == 32773:
        raw = packbits_decode(raw, rows * row_bytes)
    elif comp == 5:
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lzw import (
            lzw_decode,
        )

        raw = lzw_decode(raw, early_change=1, max_out=rows * row_bytes + row_bytes)
    elif comp in (8, 32946):
        import zlib

        try:
            raw = zlib.decompress(raw)
        except zlib.error as exc:
            raise ValueError(f"torn Deflate TIFF chunk: {exc}") from exc
    if len(raw) < rows * row_bytes:
        raise ValueError("TIFF chunk shorter than its row span")
    buf = bytearray(raw[: rows * row_bytes])
    if predictor == 2:
        for r in range(rows):
            base = r * row_bytes
            for i in range(spp, row_bytes):
                buf[base + i] = (buf[base + i] + buf[base + i - spp]) & 0xFF
    return bytes(buf)


def _decode_jpeg_chunk(raw: bytes, tables, rows: int, width: int,
                       transform: bool = True) -> bytes:
    """Decode one JPEG-in-TIFF strip/tile to rows*width*3 RGB bytes —
    abbreviated streams get the shared JPEGTables spliced after SOI.
    ``transform=False`` for photometric-2 TIFFs whose JPEG components
    are RGB-coded (no YCbCr transform — TIFF 6.0 TechNote 2)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
    )

    if raw[:2] != b"\xff\xd8":
        raise ValueError("JPEG-in-TIFF chunk without SOI")
    if tables:
        if tables[:2] != b"\xff\xd8" or tables[-2:] != b"\xff\xd9":
            raise ValueError("malformed JPEGTables stream")
        merged = tables[:-2] + raw[2:]
    else:
        merged = raw
    px, jw, jh = decode_jpeg(merged, color_transform=transform)
    if jw < width or jh < rows:
        raise ValueError(
            f"JPEG-in-TIFF chunk {jw}x{jh} smaller than its {width}x{rows} span"
        )
    import numpy as np

    return np.ascontiguousarray(px[:rows, :width]).tobytes()


def decode_tiff(payload: bytes):
    """Decode a baseline TIFF payload to (uint8 pixels [h, w, 3],
    width, height)."""
    if len(payload) < 8:
        raise ValueError("not a TIFF stream")
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    ifd = _read_ifd(payload, ifd_off, bo)

    w = _first(ifd.get(_T_WIDTH))
    h = _first(ifd.get(_T_LENGTH))
    if not w or not h:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"image {w}x{h} exceeds the 64 Mpx decode bound")
    comp = _first(ifd.get(_T_COMPRESSION), 1)
    photo = _first(ifd.get(_T_PHOTOMETRIC))
    spp = _first(ifd.get(_T_SAMPLES_PER_PIXEL), 1)
    planar = _first(ifd.get(_T_PLANAR), 1)
    bits = ifd.get(_T_BITS, [8])
    if isinstance(bits, int):
        bits = [bits]
    if photo is None:
        raise ValueError("TIFF missing PhotometricInterpretation")
    if planar not in (1, 2):
        raise ValueError(f"planar configuration {planar} outside the declared scope")
    if planar == 2 and comp == 7:
        raise ValueError("planar JPEG-in-TIFF outside the declared scope")
    if comp not in (1, 2, 3, 4, 5, 7, 8, 32773, 32946):
        raise ValueError(f"TIFF compression {comp} outside the declared scope")
    predictor = _first(ifd.get(_T_PREDICTOR), 1)
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} outside the declared scope")
    jpeg_tables = ifd.get(_T_JPEG_TABLES)
    if jpeg_tables is not None and not isinstance(jpeg_tables, (bytes, bytearray)):
        raise ValueError("malformed JPEGTables tag")
    if comp in (2, 3, 4):
        # [r12] CCITT Group 4 (T.6) + [r13] Group 3 (T.4: compression 3
        # with T4Options 1-D/2-D/fill-bits) + Modified Huffman
        # (compression 2: 1-D rows, each byte-aligned, no EOLs) — the
        # shared run-length core (operators/ccitt.py, real-libtiff
        # pinned); whole-strip coded blocks, 1-bit samples widened to
        # 8 with stored = CCITT-black so the photometric branch below
        # handles display polarity
        if bits != [1] or spp != 1:
            raise ValueError(
                "CCITT TIFF must be 1-bit single-sample (bilevel fax)"
            )
        if photo not in (0, 1):
            raise ValueError("CCITT TIFF with non-bilevel photometric")
        if _T_TILE_WIDTH in ifd or _T_TILE_LENGTH in ifd:
            raise ValueError("tiled CCITT TIFF outside the declared scope")
        if planar == 2:
            raise ValueError("planar CCITT TIFF outside the declared scope")
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ccitt import (
            g3_decode,
            g4_decode,
        )

        t4opts = _first(ifd.get(292), 0)  # T4Options (comp 3 only)
        if comp == 3 and (t4opts & 2):
            raise ValueError(
                "T.4 uncompressed mode outside the declared scope"
            )

        def _ccitt_block(blk, cols, nrows):
            if comp == 4:
                return g4_decode(blk, cols, nrows)
            if comp == 2:
                return g3_decode(blk, cols, nrows, two_d=False,
                                 byte_align=True, eols=False)
            # comp 3: EOL-framed; fill bits before EOLs are consumed
            # by the EOL scanner, so T4Options bit 2 needs no flag
            return g3_decode(blk, cols, nrows, two_d=bool(t4opts & 1))

        offsets = _int_list(ifd.get(_T_STRIP_OFFSETS), "strip offset")
        counts = _int_list(ifd.get(_T_STRIP_BYTE_COUNTS), "strip byte-count")
        if len(offsets) != len(counts):
            raise ValueError("strip offset/count tables disagree")
        rows_per_strip = _first(ifd.get(_T_ROWS_PER_STRIP), h)
        rows_done = 0
        parts = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(payload):
                raise ValueError(f"strip {si} out of range")
            rows_here = min(rows_per_strip, h - rows_done)
            if rows_here <= 0:
                break
            parts.append(
                _ccitt_block(payload[off : off + cnt], w, rows_here)
            )
            rows_done += rows_here
        if rows_done < h:
            raise ValueError("G4 strips cover fewer rows than ImageLength")
        gray = (np.concatenate(parts) * 255).astype(np.uint8)
        if photo == 0:  # WhiteIsZero: stored 0 (G4 white) displays 255
            gray = 255 - gray
        return np.repeat(gray[:, :, None], 3, axis=2), w, h
    if all(b == 16 for b in bits) and comp != 7:
        # [r11] 16-bit samples (scientific/photo scans): decoded at
        # full width, scaled >>8 to the registry's 8-bit contract
        # (the ICO-32bpp convention); byte order follows the header
        deep = True
        if predictor == 2:
            raise ValueError(
                "16-bit TIFF with predictor 2 outside the declared scope "
                "(differencing is per 16-bit sample)"
            )
    elif any(b != 8 for b in bits):
        raise ValueError(f"bits-per-sample {bits} outside the declared scope")
    else:
        deep = False
    if comp == 7:
        # [r11] new-style JPEG-in-TIFF (TechNote 2): each strip/tile is
        # a JPEG stream sharing the JPEGTables (tag 347) DQT/DHT; the
        # from-spec operators/jpeg.py decoder does the work, so YCbCr
        # photometric (6) decodes straight to RGB here. REAL
        # libtiff+libjpeg files are pinned in tests/test_lzw_r11.py.
        if photo not in (2, 6) or spp != 3:
            raise ValueError(
                "JPEG-in-TIFF outside the declared scope (YCbCr/RGB "
                "3-sample chunky only)"
            )
        # photometric 2 stores RGB-coded JPEG components: no YCbCr
        # inverse transform (r11 advice — applying it silently shifts
        # every color); photometric 6 is the usual YCbCr-coded path
        jpeg_transform = photo == 6
        photo = 2  # decoded output is RGB
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples per pixel")
    if photo in (0, 1, 3) and spp != 1:
        raise ValueError("gray/palette TIFF must have 1 sample per pixel")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"photometric {photo} outside the declared scope")
    if photo == 2 and spp > 3:
        # [r10] RGBA in scope: exactly ONE declared extra sample (tag 338,
        # TIFF 6.0 §18) rides as a 4th 8-bit chunky sample and is dropped —
        # the ICO-32bpp convention. Real libtiff RGBA files (CPython's
        # python.tiff) decode through this path; anything wider stays a
        # named boundary.
        extra = ifd.get(_T_EXTRA_SAMPLES)
        if isinstance(extra, (list, tuple)):
            n_extra = len(extra)
        else:
            n_extra = 1 if extra is not None else 0
        if spp != 4 or n_extra != 1:
            raise ValueError(
                "multi-extra-sample TIFF outside the declared scope"
            )

    if _T_TILE_WIDTH in ifd or _T_TILE_LENGTH in ifd:
        # [r11] tiled layout (TIFF 6.0 §15) — tiles are full tw x tl
        # blocks (edge tiles padded), decompressed like strips and
        # pasted clipped; REAL libtiff-written tiled files are pinned
        # in tests/test_lzw_r11.py
        if deep:
            raise ValueError("16-bit tiled TIFF outside the declared scope")
        if planar == 2:
            raise ValueError("planar tiled TIFF outside the declared scope")
        tw = _first(ifd.get(_T_TILE_WIDTH))
        tl = _first(ifd.get(_T_TILE_LENGTH))
        t_off = ifd.get(_T_TILE_OFFSETS)
        t_cnt = ifd.get(_T_TILE_BYTE_COUNTS)
        if not tw or not tl or t_off is None or t_cnt is None:
            raise ValueError("tiled TIFF missing tile tables")
        t_off = _int_list(t_off, "tile offset")
        t_cnt = _int_list(t_cnt, "tile byte-count")
        ta = (w + tw - 1) // tw
        td = (h + tl - 1) // tl
        if len(t_off) < ta * td or len(t_cnt) < ta * td:
            raise ValueError("tile tables shorter than the tile grid")
        img = np.zeros((h, w, spp), dtype=np.uint8)
        row_bytes = tw * spp
        for ty in range(td):
            for tx in range(ta):
                k = ty * ta + tx
                off, cnt = t_off[k], t_cnt[k]
                if off + cnt > len(payload):
                    raise ValueError(f"tile {k} out of range")
                if comp == 7:
                    buf = _decode_jpeg_chunk(
                        payload[off : off + cnt], jpeg_tables, tl, tw,
                        jpeg_transform,
                    )
                else:
                    buf = _decode_chunk(
                        payload[off : off + cnt], comp, tl, row_bytes,
                        predictor, spp
                    )
                tile = np.frombuffer(buf, dtype=np.uint8).reshape(tl, tw, spp)
                y0, x0 = ty * tl, tx * tw
                ys, xs = min(tl, h - y0), min(tw, w - x0)
                img[y0 : y0 + ys, x0 : x0 + xs] = tile[:ys, :xs]
        data = img.tobytes()
        rows_done = h
    else:
        offsets = ifd.get(_T_STRIP_OFFSETS)
        counts = ifd.get(_T_STRIP_BYTE_COUNTS)
        if offsets is None or counts is None:
            raise ValueError("TIFF missing strip tables")
        offsets = _int_list(offsets, "strip offset")
        counts = _int_list(counts, "strip byte-count")
        if len(offsets) != len(counts):
            raise ValueError("strip offset/count tables disagree")
        rows_per_strip = _first(ifd.get(_T_ROWS_PER_STRIP), h)

        unit = 2 if deep else 1
        if planar == 2 and spp > 1:
            # [r11] planar configuration 2 (TIFF 6.0 §14): the strip
            # table covers plane 0's strips, then plane 1's, ... —
            # decode each plane like a 1-sample image, interleave after
            spp_strips = (h + rows_per_strip - 1) // rows_per_strip
            if len(offsets) < spp_strips * spp:
                raise ValueError("planar strip table shorter than spp planes")
            row_bytes = w * unit
            planes = []
            for c in range(spp):
                pdata = bytearray()
                rows_done = 0
                for si in range(spp_strips):
                    k = c * spp_strips + si
                    off, cnt = offsets[k], counts[k]
                    if off + cnt > len(payload):
                        raise ValueError(f"strip {k} out of range")
                    rows_here = min(rows_per_strip, h - rows_done)
                    pdata += _decode_chunk(
                        payload[off : off + cnt], comp, rows_here, row_bytes,
                        predictor, 1
                    )
                    rows_done += rows_here
                if rows_done < h:
                    raise ValueError("plane strips cover fewer rows than ImageLength")
                planes.append(
                    np.frombuffer(bytes(pdata), dtype=np.uint8).reshape(h, w * unit)
                )
            inter = np.empty((h, w * spp * unit), dtype=np.uint8)
            for c in range(spp):
                for u in range(unit):
                    inter[:, c * unit + u :: spp * unit] = planes[c][:, u::unit]
            data = inter.tobytes()
            rows_done = h
        else:
            row_bytes = w * spp * unit
            data = bytearray()
            rows_done = 0
            for si, (off, cnt) in enumerate(zip(offsets, counts)):
                if off + cnt > len(payload):
                    raise ValueError(f"strip {si} out of range")
                rows_here = min(rows_per_strip, h - rows_done)
                if rows_here <= 0:
                    break
                if comp == 7:
                    data += _decode_jpeg_chunk(
                        payload[off : off + cnt], jpeg_tables, rows_here, w,
                        jpeg_transform,
                    )
                else:
                    data += _decode_chunk(
                        payload[off : off + cnt], comp, rows_here, row_bytes,
                        predictor, spp
                    )
                rows_done += rows_here
            if rows_done < h:
                raise ValueError("strips cover fewer rows than ImageLength")
            data = bytes(data)

    if deep:
        arr16 = np.frombuffer(bytes(data), dtype=("<u2" if bo == "<" else ">u2"))
        arr = (arr16 >> 8).astype(np.uint8)
    else:
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
    if photo == 2:
        px = arr.reshape(h, w, spp)[:, :, :3]
        return px.copy(), w, h
    gray = arr.reshape(h, w)
    if photo == 0:  # WhiteIsZero: 0 is white per TIFF 6.0 §4
        gray = 255 - gray
    if photo == 3:
        cmap = ifd.get(_T_COLOR_MAP)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("palette TIFF missing a 256-entry ColorMap")
        cm = (np.asarray(cmap, dtype=np.uint32).reshape(3, 256) >> 8).astype(np.uint8)
        px = cm.T[gray]
        return px.copy(), w, h
    return np.repeat(gray[:, :, None], 3, axis=2), w, h


def encode_tiff(
    pixels: np.ndarray,
    byte_order: str = "<",
    photometric: int | None = None,
    rows_per_strip: int | None = None,
    packbits: bool = False,
    palette: np.ndarray | None = None,
) -> bytes:
    """Spec-literal baseline TIFF writer — the fixture builder.

    ``pixels`` is uint8 [h, w] (gray or palette indices when ``palette``
    is given) or [h, w, 3] (RGB). Emits real strip tables (several
    strips when ``rows_per_strip`` splits the image) and real PackBits
    streams when asked, in either byte order.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        spp = 1
        if photometric is None:
            photometric = 3 if palette is not None else 1
        flat_rows = px
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w = px.shape[:2]
        spp = 3
        photometric = 2
        flat_rows = px.reshape(h, w * 3)
    else:
        raise ValueError("pixels must be [h, w] or [h, w, 3] uint8")
    if photometric == 0:
        flat_rows = 255 - flat_rows  # stored inverted so decode re-inverts
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    rps = rows_per_strip or h

    strips: list[bytes] = []
    for r0 in range(0, h, rps):
        rows = flat_rows[r0 : r0 + rps]
        raw = rows.tobytes()
        if packbits:
            raw = b"".join(packbits_encode(bytes(r.tobytes())) for r in rows)
        strips.append(raw)

    def entry(tag: int, typ: int, cnt: int, val: bytes) -> bytes:
        return struct.pack(bo + "HHI", tag, typ, cnt) + val.ljust(4, b"\x00")[:4]

    # layout: header(8) | pixel strips | [colormap] | IFD | overflow arrays
    header_sz = 8
    strip_offs = []
    pos = header_sz
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    cmap_bytes = b""
    cmap_off = pos
    if photometric == 3:
        if palette is None or palette.shape != (256, 3):
            raise ValueError("palette TIFFs need a [256, 3] palette")
        cm16 = (palette.astype(np.uint16) << 8) | palette.astype(np.uint16)
        cmap_bytes = cm16.T.astype(("<" if bo == "<" else ">") + "u2").tobytes()
        pos += len(cmap_bytes)
    ifd_off = pos

    n_strips = len(strips)
    entries: list[tuple[int, int, int, bytes]] = []
    long1 = lambda v: struct.pack(bo + "I", v)  # noqa: E731
    short1 = lambda v: struct.pack(bo + "H", v)  # noqa: E731
    entries.append((_T_WIDTH, 4, 1, long1(w)))
    entries.append((_T_LENGTH, 4, 1, long1(h)))
    entries.append((_T_BITS, 3, spp, b""))  # value resolved below
    entries.append((_T_COMPRESSION, 3, 1, short1(32773 if packbits else 1)))
    entries.append((_T_PHOTOMETRIC, 3, 1, short1(photometric)))
    entries.append((_T_STRIP_OFFSETS, 4, n_strips, b""))
    entries.append((_T_SAMPLES_PER_PIXEL, 3, 1, short1(spp)))
    entries.append((_T_ROWS_PER_STRIP, 4, 1, long1(rps)))
    entries.append((_T_STRIP_BYTE_COUNTS, 4, n_strips, b""))
    entries.append((_T_PLANAR, 3, 1, short1(1)))
    if photometric == 3:
        entries.append((_T_COLOR_MAP, 3, 3 * 256, long1(cmap_off)))

    # overflow arrays live after the IFD
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def resolve_array(typ: int, values: list[int]) -> bytes:
        nonlocal overflow
        fmt = {3: "H", 4: "I"}[typ]
        size = {3: 2, 4: 4}[typ]
        raw = struct.pack(bo + f"{len(values)}{fmt}", *values)
        if len(raw) <= 4:
            return raw
        off = overflow_off + len(overflow)
        overflow += raw
        return struct.pack(bo + "I", off)

    final_entries = []
    for tag, typ, cnt, val in entries:
        if tag == _T_BITS:
            val = resolve_array(3, [8] * spp)
        elif tag == _T_STRIP_OFFSETS:
            val = resolve_array(4, strip_offs)
        elif tag == _T_STRIP_BYTE_COUNTS:
            val = resolve_array(4, [len(s) for s in strips])
        final_entries.append(entry(tag, typ, cnt, val))

    ifd = struct.pack(bo + "H", len(final_entries)) + b"".join(final_entries)
    ifd += struct.pack(bo + "I", 0)  # next-IFD pointer

    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    out = magic + struct.pack(bo + "I", ifd_off)
    return out + b"".join(strips) + cmap_bytes + ifd + bytes(overflow)


def encode_tiff_extended(
    pixels: np.ndarray,
    byte_order: str = "<",
    compression: int = 1,
    predictor: int = 1,
    tiled: bool = False,
    tile_wh: tuple[int, int] = (16, 16),
    bits: int = 8,
    planar: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """[r12] Fixture writer for the r11 extended decode surface: LZW
    (compression 5, both predictors), Deflate (8, both predictors),
    tiled layout (§15), 16-bit samples (stored v*257 so the decoder's
    >>8 returns the source exactly), planar configuration 2, and
    new-style JPEG-in-TIFF (compression 7, one full JPEG per chunk).
    Scope mirrors the decoder's declared boundaries (no 16-bit tiles,
    no planar tiles, predictor on 8-bit only)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        spp = 1
        photometric = 1
        raster = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w = px.shape[:2]
        spp = 3
        photometric = 2
        raster = px
    else:
        raise ValueError("pixels must be [h, w] or [h, w, 3] uint8")
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    if compression in (2, 3, 4):
        # [r12] G4 + [r13] G3/MH bilevel: pixels is an ink mask
        # (nonzero = black), written photometric 0 (WhiteIsZero)
        # single strip. compression 3 uses ``predictor`` as a variant
        # selector (1 = 1-D rows, 2 = mixed 2-D via T4Options bit 0).
        if px.ndim != 2:
            raise ValueError("CCITT fixture needs a 2-D ink mask")
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ccitt import (
            g3_encode,
            g4_encode,
        )

        ink = (px > 0).astype(np.uint8)
        t4opts = None
        if compression == 4:
            strip = g4_encode(ink)
        elif compression == 2:
            strip = g3_encode(ink, byte_align=True, eols=False)
        else:
            two_d = predictor == 2
            strip = g3_encode(ink, two_d_k=4 if two_d else 0, eols=True)
            t4opts = 1 if two_d else 0
        tag_list = [(256, 4, w), (257, 4, h), (258, 3, 1),
                    (259, 3, compression), (262, 3, 0), (273, 4, 8),
                    (277, 3, 1), (278, 4, h),
                    (279, 4, len(strip)), (284, 3, 1)]
        if t4opts is not None:
            tag_list.append((292, 4, t4opts))
        tag_list.sort()
        entries4 = []
        for tag, typ, val in tag_list:
            fmt = "I" if typ == 4 else "H"
            entries4.append(
                struct.pack(bo + "HHI", tag, typ, 1)
                + struct.pack(bo + fmt, val).ljust(4, b"\x00")
            )
        ifd4 = struct.pack(bo + "H", len(entries4)) + b"".join(entries4)
        ifd4 += struct.pack(bo + "I", 0)
        magic = b"II*\x00" if bo == "<" else b"MM\x00*"
        return magic + struct.pack(bo + "I", 8 + len(strip)) + strip + ifd4
    if compression not in (1, 5, 7, 8):
        raise ValueError("fixture compression must be 1/5/7/8")
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    if predictor == 2 and bits != 8:
        raise ValueError("predictor 2 fixture is 8-bit only")
    if compression == 7:
        if spp != 3 or bits != 8 or planar != 1:
            raise ValueError("JPEG-in-TIFF fixture is 8-bit chunky RGB")
        photometric = 6  # YCbCr-coded chunks (our encode_jpeg output)
    if tiled and (bits == 16 or planar == 2):
        raise ValueError("tiled fixture is 8-bit chunky (decoder scope)")

    unit = 2 if bits == 16 else 1

    def pack_rows(block: np.ndarray) -> bytes:
        # block is [rows, cols, samples] uint8
        if bits == 16:
            deep = block.astype(np.uint16) * 257
            return deep.astype(bo + "u2").tobytes()
        return block.tobytes()

    def compress(chunk_rows: np.ndarray, n_samples: int) -> bytes:
        if compression == 7:
            from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
                encode_jpeg,
            )

            return encode_jpeg(np.ascontiguousarray(chunk_rows))
        raw = pack_rows(chunk_rows)
        if predictor == 2:
            arr = np.frombuffer(raw, dtype=np.uint8).reshape(
                chunk_rows.shape[0], -1
            ).astype(np.int16)
            diff = arr.copy()
            diff[:, n_samples:] = arr[:, n_samples:] - arr[:, :-n_samples]
            raw = (diff & 0xFF).astype(np.uint8).tobytes()
        if compression == 5:
            from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lzw import (
                lzw_encode,
            )

            return lzw_encode(raw, early_change=1)
        if compression == 8:
            import zlib

            return zlib.compress(raw)
        return raw

    chunks: list[bytes] = []
    tile_tags = strip_tags = None
    if tiled:
        tw, tl = tile_wh
        if tw % 16 or tl % 16:
            raise ValueError("TIFF tiles must be multiples of 16")
        for ty in range(0, h, tl):
            for tx in range(0, w, tw):
                tile = np.zeros((tl, tw, spp), dtype=np.uint8)
                blk = raster[ty : ty + tl, tx : tx + tw]
                tile[: blk.shape[0], : blk.shape[1]] = blk
                chunks.append(compress(tile, spp))
        tile_tags = (tw, tl)
    else:
        rps = rows_per_strip or h
        if planar == 2 and spp > 1:
            for c in range(spp):
                for r0 in range(0, h, rps):
                    chunks.append(
                        compress(raster[r0 : r0 + rps, :, c : c + 1], 1)
                    )
        else:
            for r0 in range(0, h, rps):
                chunks.append(compress(raster[r0 : r0 + rps], spp))
        strip_tags = rps

    # layout: header(8) | chunks | IFD | overflow arrays
    chunk_offs = []
    pos = 8
    for c in chunks:
        chunk_offs.append(pos)
        pos += len(c)
    ifd_off = pos

    long1 = lambda v: struct.pack(bo + "I", v)  # noqa: E731
    short1 = lambda v: struct.pack(bo + "H", v)  # noqa: E731
    entries: list[tuple[int, int, int, bytes | None]] = [
        (_T_WIDTH, 4, 1, long1(w)),
        (_T_LENGTH, 4, 1, long1(h)),
        (_T_BITS, 3, spp, None),
        (_T_COMPRESSION, 3, 1, short1(compression)),
        (_T_PHOTOMETRIC, 3, 1, short1(photometric)),
        (_T_SAMPLES_PER_PIXEL, 3, 1, short1(spp)),
        (_T_PLANAR, 3, 1, short1(planar)),
    ]
    if predictor != 1:
        entries.append((_T_PREDICTOR, 3, 1, short1(predictor)))
    if tiled:
        entries += [
            (_T_TILE_WIDTH, 4, 1, long1(tile_tags[0])),
            (_T_TILE_LENGTH, 4, 1, long1(tile_tags[1])),
            (_T_TILE_OFFSETS, 4, len(chunks), None),
            (_T_TILE_BYTE_COUNTS, 4, len(chunks), None),
        ]
    else:
        entries += [
            (_T_STRIP_OFFSETS, 4, len(chunks), None),
            (_T_ROWS_PER_STRIP, 4, 1, long1(strip_tags)),
            (_T_STRIP_BYTE_COUNTS, 4, len(chunks), None),
        ]
    entries.sort(key=lambda e: e[0])

    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def resolve_array(typ: int, values: list[int]) -> bytes:
        nonlocal overflow
        fmt = {3: "H", 4: "I"}[typ]
        raw = struct.pack(bo + f"{len(values)}{fmt}", *values)
        if len(raw) <= 4:
            return raw
        off = overflow_off + len(overflow)
        overflow += raw
        return struct.pack(bo + "I", off)

    final = []
    for tag, typ, cnt, val in entries:
        if tag == _T_BITS:
            val = resolve_array(3, [bits] * spp)
        elif tag in (_T_STRIP_OFFSETS, _T_TILE_OFFSETS):
            val = resolve_array(4, chunk_offs)
        elif tag in (_T_STRIP_BYTE_COUNTS, _T_TILE_BYTE_COUNTS):
            val = resolve_array(4, [len(c) for c in chunks])
        final.append(
            struct.pack(bo + "HHI", tag, typ, cnt) + val.ljust(4, b"\x00")[:4]
        )

    ifd = struct.pack(bo + "H", len(final)) + b"".join(final)
    ifd += struct.pack(bo + "I", 0)
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    return (
        magic + struct.pack(bo + "I", ifd_off)
        + b"".join(chunks) + ifd + bytes(overflow)
    )
