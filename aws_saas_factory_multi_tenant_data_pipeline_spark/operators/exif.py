"""EXIF metadata: parse and privacy-strip, pure stdlib struct.

A crawled image corpus carries camera metadata in JPEG APP1 segments —
including GPS coordinates, i.e. PII a training pipeline must be able to
(a) EXTRACT for auditing/filtering and (b) STRIP before publication,
without touching the pixel data (no re-encode: a byte-level segment
rewrite keeps the scan data bit-identical, so perceptual hashes and any
downstream decode are unchanged — which the tests and the corpus oracle
pin). Public structure: JPEG markers (ITU-T T.81 §B), TIFF 6.0 IFDs,
EXIF 2.x tag ids (JEITA CP-3451).

Declared scope: baseline TIFF types BYTE/ASCII/SHORT/LONG/RATIONAL, the
IFD0 + EXIF + GPS IFDs, both byte orders; MakerNote contents opaque.
ValueError-only tear contract, like every codec in this package.
"""

from __future__ import annotations

import struct

#: tag ids surfaced by :func:`parse_exif` (public EXIF 2.x / TIFF ids)
_TAG_NAMES = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0xA002: "pixel_width",
    0xA003: "pixel_height",
}
_GPS_NAMES = {
    0x0001: "gps_lat_ref",
    0x0002: "gps_lat",
    0x0003: "gps_lon_ref",
    0x0004: "gps_lon",
}
_EXIF_IFD_TAG = 0x8769
_GPS_IFD_TAG = 0x8825

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}


def _read_ifd(tiff: bytes, off: int, bo: str) -> dict[int, object]:
    """One IFD -> {tag: decoded value}; RATIONALs become (num, den)."""
    if off + 2 > len(tiff):
        raise ValueError("IFD offset out of range")
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    out: dict[int, object] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(tiff):
            raise ValueError("truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", tiff, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip, do not tear
        total = size * cnt
        if total <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", tiff, base + 8)
        if voff + total > len(tiff):
            raise ValueError(f"tag 0x{tag:04X} value out of range")
        raw = tiff[voff : voff + total]
        if typ == 2:  # ASCII
            out[tag] = raw.split(b"\0", 1)[0].decode("ascii", "replace")
        elif typ == 3:
            out[tag] = list(struct.unpack(bo + f"{cnt}H", raw))
        elif typ in (1, 4):
            fmt = "B" if typ == 1 else "I"
            out[tag] = list(struct.unpack(bo + f"{cnt}{fmt}", raw))
        elif typ == 5:
            vals = struct.unpack(bo + f"{2 * cnt}I", raw)
            out[tag] = [(vals[2 * j], vals[2 * j + 1]) for j in range(cnt)]
        elif typ == 7:  # UNDEFINED: raw bytes (JPEGTables, ExifVersion)
            out[tag] = raw
    return out


def _iter_segments(payload: bytes):
    """Yield (marker, seg_start, seg_end) for each marker segment up to
    and excluding SOS; raises ValueError on torn structure."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        marker = payload[i + 1]
        if marker == 0xDA:  # SOS: entropy data follows
            return
        (ln,) = struct.unpack_from(">H", payload, i + 2)
        if ln < 2 or i + 2 + ln > len(payload):
            raise ValueError("truncated JPEG segment")
        yield marker, i, i + 2 + ln
        i += 2 + ln
    raise ValueError("no SOS marker found")


def parse_exif(payload: bytes) -> dict:
    """Extract EXIF fields from a JPEG payload: named IFD0/EXIF tags
    (make, model, orientation, datetime, pixel dimensions) plus the GPS
    IFD (refs + degree/minute/second rationals). Returns
    ``{"has_exif": False}`` when no APP1/Exif segment exists; raises
    ValueError only on structurally torn input."""
    app1 = None
    for marker, s, e in _iter_segments(payload):
        if marker == 0xE1 and payload[s + 4 : s + 10] == b"Exif\x00\x00":
            app1 = payload[s + 10 : e]
            break
    if app1 is None:
        return {"has_exif": False}
    return parse_exif_tiff(app1)


def parse_exif_tiff(tiff: bytes) -> dict:
    """Parse a bare TIFF-format Exif block (the payload after the JPEG
    APP1 "Exif\0\0" marker — the SAME block a HEIF ``Exif`` item or a
    PNG eXIf chunk carries, r13: shared with operators/heif.py).

    A torn block raises ValueError (struct.error/IndexError from short
    reads are normalized, r14 ADVICE) so with_exif's per-row quarantine
    catches it instead of tearing the whole Arrow batch."""
    try:
        return _parse_exif_tiff(tiff)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"torn TIFF Exif block: {exc}") from exc


def _parse_exif_tiff(tiff: bytes) -> dict:
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("bad TIFF byte order")
    (magic,) = struct.unpack_from(bo + "H", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    ifd0 = _read_ifd(tiff, ifd0_off, bo)
    out: dict = {"has_exif": True, "byte_order": "II" if bo == "<" else "MM"}
    merged = dict(ifd0)
    if _EXIF_IFD_TAG in ifd0:
        merged.update(_read_ifd(tiff, ifd0[_EXIF_IFD_TAG][0], bo))
    for tag, name in _TAG_NAMES.items():
        if tag in merged:
            v = merged[tag]
            out[name] = v[0] if isinstance(v, list) and len(v) == 1 else v
    if _GPS_IFD_TAG in ifd0:
        gps = _read_ifd(tiff, ifd0[_GPS_IFD_TAG][0], bo)
        for tag, name in _GPS_NAMES.items():
            if tag in gps:
                out[name] = gps[tag]
        out["has_gps"] = any(t in gps for t in (0x0002, 0x0004))
    else:
        out["has_gps"] = False
    return out


def strip_metadata(payload: bytes) -> bytes:
    """Remove every APP1-APP15 and COM segment from a JPEG — EXIF (and
    its GPS), XMP, ICC, comments — WITHOUT re-encoding: the scan data
    and every structural segment (APP0/JFIF, DQT, DHT, SOF, SOS...) are
    copied byte-identically, so the decoded pixels (and any perceptual
    hash) are provably unchanged.

    Exception (r8 ADVICE): APP14 segments carrying the Adobe color-
    transform signature are PRESERVED — that flag tells standard
    decoders whether a 3/4-component scan is RGB, YCbCr, or YCCK, so
    removing it would change the decoded pixels of Adobe-coded JPEGs
    (Photoshop output), breaking the pixels-unchanged guarantee. It
    carries no PII (a 12-byte transform descriptor, T-REC-T.872 §6.5.3).
    Non-Adobe APP14 payloads are still stripped."""
    out = bytearray(b"\xff\xd8")
    last = 2
    for marker, s, e in _iter_segments(payload):
        adobe_app14 = marker == 0xEE and payload[s + 4 : s + 9] == b"Adobe"
        if (0xE1 <= marker <= 0xEF or marker == 0xFE) and not adobe_app14:
            out += payload[last:s]  # copy everything before the segment
        else:
            out += payload[last:e]
        last = e
    out += payload[last:]
    return bytes(out)


def build_exif_app1(
    tags: dict | None = None,
    gps_dms: tuple[int, int, int] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Assemble a spec-literal APP1/Exif segment (TIFF IFD0 + EXIF IFD +
    optional GPS IFD) — the fixture builder: expected parse results are
    known by construction. ``tags`` may carry make/model/orientation/
    datetime/pixel_width/pixel_height; ``gps_dms`` adds a northern
    latitude as (deg, min, sec) rationals."""
    tags = tags or {}
    bo = "<" if byte_order == "II" else ">"

    entries0: list[tuple[int, int, int, bytes]] = []
    entries_exif: list[tuple[int, int, int, bytes]] = []
    entries_gps: list[tuple[int, int, int, bytes]] = []
    heap = bytearray()

    def ascii_v(s: str) -> tuple[int, int, bytes]:
        b = s.encode("ascii") + b"\0"
        return 2, len(b), b

    def short_v(v: int) -> tuple[int, int, bytes]:
        return 3, 1, struct.pack(bo + "H", v)

    def long_v(v: int) -> tuple[int, int, bytes]:
        return 4, 1, struct.pack(bo + "I", v)

    def rat3_v(d, m, s) -> tuple[int, int, bytes]:
        # each component is an int (denominator 1) or an explicit
        # (numerator, denominator) pair — the latter lets fixtures pin
        # fractional / zero-denominator rationals
        parts = []
        for v in (d, m, s):
            n, den = v if isinstance(v, tuple) else (v, 1)
            parts += [n, den]
        return 5, 3, struct.pack(bo + "6I", *parts)

    if "make" in tags:
        entries0.append((0x010F, *ascii_v(tags["make"])))
    if "model" in tags:
        entries0.append((0x0110, *ascii_v(tags["model"])))
    if "orientation" in tags:
        entries0.append((0x0112, *short_v(tags["orientation"])))
    if "datetime" in tags:
        entries0.append((0x0132, *ascii_v(tags["datetime"])))
    if "pixel_width" in tags:
        entries_exif.append((0xA002, *long_v(tags["pixel_width"])))
    if "pixel_height" in tags:
        entries_exif.append((0xA003, *long_v(tags["pixel_height"])))
    if gps_dms is not None:
        entries_gps.append((0x0001, *ascii_v("N")))
        entries_gps.append((0x0002, *rat3_v(*gps_dms)))

    def ifd_size(entries):
        return 2 + 12 * len(entries) + 4

    ifd0_extra = (1 if entries_exif else 0) + (1 if entries_gps else 0)
    ifd0_off = 8
    exif_off = ifd0_off + ifd_size(entries0) + 12 * ifd0_extra
    gps_off = exif_off + (ifd_size(entries_exif) if entries_exif else 0)
    heap_off = gps_off + (ifd_size(entries_gps) if entries_gps else 0)

    def render_ifd(entries, heap_base):
        body = struct.pack(bo + "H", len(entries))
        heap_local = bytearray()
        for tag, typ, cnt, raw in entries:
            body += struct.pack(bo + "HHI", tag, typ, cnt)
            if len(raw) <= 4:
                body += raw + b"\0" * (4 - len(raw))
            else:
                body += struct.pack(bo + "I", heap_base + len(heap_local))
                heap_local += raw
        body += struct.pack(bo + "I", 0)  # next-IFD pointer
        return body, heap_local

    # two-pass: sizes first (above), then render with heap offsets
    pending = []
    ifd0_full = list(entries0)
    if entries_exif:
        ifd0_full.append((_EXIF_IFD_TAG, *long_v(exif_off)))
    if entries_gps:
        ifd0_full.append((_GPS_IFD_TAG, *long_v(gps_off)))
    ifd0_full.sort(key=lambda e: e[0])  # TIFF requires ascending tags
    for entries in (ifd0_full, entries_exif, entries_gps):
        if entries or entries is ifd0_full:
            body, hp = render_ifd(entries, heap_off + sum(len(h) for _b, h in pending))
            pending.append((body, hp))
    tiff = bytearray()
    tiff += (b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
    tiff += struct.pack(bo + "I", ifd0_off)
    for body, _h in pending:
        tiff += body
    for _body, h in pending:
        tiff += h
    seg = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI of an existing JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]


# --- Spark surface ---------------------------------------------------------

def parse_exif_any(payload: bytes) -> dict:
    """Carrier-dispatched EXIF extraction (r13 second wave): JPEG APP1
    segments, PNG eXIf chunks, WebP EXIF chunks, and HEIC Exif items
    all parse through the one shared TIFF-block parser — the crawl
    pipeline asks one question regardless of which image format the
    camera wrote. Unrecognized payloads raise ValueError (callers
    quarantine per-row)."""
    if payload[:2] == b"\xff\xd8":
        return parse_exif(payload)
    if payload.startswith(_PNG_SIG):
        return parse_png_exif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return parse_webp_exif(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
            extract_heif_exif,
        )

        return extract_heif_exif(payload)
    raise ValueError("payload is not a recognized EXIF carrier")


def with_exif(media):
    """Arrow-batched EXIF extraction over MEDIA_SCHEMA rows — ALL four
    carriers (JPEG APP1 / PNG eXIf / WebP EXIF / HEIC Exif items,
    dispatched by magic through parse_exif_any, r13): named tags + GPS
    presence and DMS latitude components. Unrecognized / torn /
    metadata-free rows yield has_exif=false with NULL fields
    (quarantine-style, nothing dropped)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("has_exif", T.BooleanType(), False),
            T.StructField("byte_order", T.StringType(), True),
            T.StructField("make", T.StringType(), True),
            T.StructField("model", T.StringType(), True),
            T.StructField("orientation", T.IntegerType(), True),
            T.StructField("datetime", T.StringType(), True),
            T.StructField("pixel_width", T.IntegerType(), True),
            T.StructField("pixel_height", T.IntegerType(), True),
            T.StructField("has_gps", T.BooleanType(), True),
            T.StructField("gps_d", T.IntegerType(), True),
            T.StructField("gps_m", T.IntegerType(), True),
            T.StructField("gps_s", T.IntegerType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rec = {c: None for c in cols}
                rec["media_id"] = int(mid)
                rec["has_exif"] = False
                try:
                    info = parse_exif_any(bytes(payload))
                    for k in ("has_exif", "byte_order", "make", "model",
                              "orientation", "datetime", "pixel_width",
                              "pixel_height", "has_gps"):
                        if k in info:
                            v = info[k]
                            # malformed EXIF (e.g. orientation with
                            # count=2, seen from broken crawl writers)
                            # leaves a list here — coerce to the first
                            # element so the per-row quarantine contract
                            # holds instead of tearing the whole Arrow
                            # batch on an IntegerType mismatch (r8 ADVICE)
                            if isinstance(v, list):
                                v = v[0] if v else None
                            rec[k] = v
                    lat = info.get("gps_lat")
                    # a zero denominator is unparseable, NOT "denominator
                    # 1": leave the DMS fields NULL (has_gps still set
                    # from tag presence); valid rationals round, so 61/2
                    # seconds reports 31, not a floored 30 (r8 ADVICE)
                    if (
                        lat
                        and len(lat) == 3
                        and all(
                            isinstance(p, tuple) and len(p) == 2 and p[1] != 0
                            for p in lat
                        )
                    ):
                        # half-up integer rounding (not Python's banker's
                        # round): 61/2 s reports 31
                        rec["gps_d"], rec["gps_m"], rec["gps_s"] = (
                            (2 * n + d) // (2 * d) for n, d in lat
                        )
                except (ValueError, TypeError):
                    pass
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(op, schema)


def strip_image_metadata(media):
    """Privacy pass: JPEG payloads lose their APP1-APP15/COM segments
    (EXIF incl. GPS, XMP, ICC, comments) and PNG payloads their
    tEXt/zTXt/iTXt/eXIf/tIME chunks — byte-identically in the pixel
    data either way; other rows pass through unchanged. Adds
    ``stripped``. Arrow pass, partition-preserving."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
    )

    out_schema = T.StructType(
        list(MEDIA_SCHEMA.fields)
        + [T.StructField("stripped", T.BooleanType(), False)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, flags = [], []
            for payload in pdf["payload"]:
                try:
                    b = bytes(payload)
                    if b[:2] == b"\xff\xd8":
                        payloads.append(strip_metadata(b))
                        flags.append(True)
                        continue
                    if b.startswith(_PNG_SIG):
                        payloads.append(strip_png_metadata(b))
                        flags.append(True)
                        continue
                except (ValueError, TypeError):
                    pass
                payloads.append(payload)
                flags.append(False)
            yield pdf.assign(payload=payloads, stripped=flags)

    return media.mapInPandas(op, out_schema)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: ancillary metadata chunks a privacy strip removes (text, compressed
#: text, international text, embedded EXIF, modification time)
_PNG_META_CHUNKS = {b"tEXt", b"zTXt", b"iTXt", b"eXIf", b"tIME"}


def strip_png_metadata(payload: bytes) -> bytes:
    """Remove PNG metadata chunks (tEXt/zTXt/iTXt/eXIf/tIME — where
    authorship, software, GPS-bearing EXIF, and timestamps live) by
    byte-level chunk copy: every remaining chunk, CRCs included, is
    bit-identical, so decoded pixels are provably unchanged."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    out = bytearray(_PNG_SIG)
    i, n = 8, len(payload)
    while i + 12 <= n:
        (ln,) = struct.unpack_from(">I", payload, i)
        typ = payload[i + 4 : i + 8]
        end = i + 12 + ln
        if end > n:
            raise ValueError("truncated PNG chunk")
        if typ not in _PNG_META_CHUNKS:
            out += payload[i:end]
        if typ == b"IEND":
            return bytes(out)
        i = end
    raise ValueError("PNG missing IEND")


def png_text_chunks(payload: bytes) -> dict[str, str]:
    """Extract uncompressed tEXt keyword->value pairs (the audit-side
    companion of :func:`strip_png_metadata`)."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    out: dict[str, str] = {}
    i, n = 8, len(payload)
    while i + 12 <= n:
        (ln,) = struct.unpack_from(">I", payload, i)
        typ = payload[i + 4 : i + 8]
        end = i + 12 + ln
        if end > n:
            raise ValueError("truncated PNG chunk")
        if typ == b"tEXt":
            body = payload[i + 8 : i + 8 + ln]
            if b"\x00" in body:
                k, v = body.split(b"\x00", 1)
                out[k.decode("latin-1")] = v.decode("latin-1", "replace")
        if typ == b"IEND":
            break
        i = end
    return out


def insert_png_text(payload: bytes, keyword: str, value: str) -> bytes:
    """Insert a tEXt chunk after IHDR (fixture builder)."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    body = keyword.encode("latin-1") + b"\x00" + value.encode("latin-1")
    chunk = struct.pack(">I", len(body)) + b"tEXt" + body
    chunk += struct.pack(">I", zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF)
    (ihdr_len,) = struct.unpack_from(">I", payload, 8)
    cut = 8 + 12 + ihdr_len  # end of IHDR chunk
    return payload[:cut] + chunk + payload[cut:]


def parse_png_exif(payload: bytes) -> dict:
    """Extract EXIF from a PNG ``eXIf`` chunk (PNG 1.5 extension —
    the chunk body IS the TIFF block, parsed by the shared r13
    machinery). {"has_exif": False} when absent."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    i, n = 8, len(payload)
    while i + 12 <= n:
        (ln,) = struct.unpack_from(">I", payload, i)
        typ = payload[i + 4:i + 8]
        end = i + 12 + ln
        if end > n:
            raise ValueError("truncated PNG chunk")
        if typ == b"eXIf":
            return parse_exif_tiff(payload[i + 8:i + 8 + ln])
        if typ == b"IEND":
            break
        i = end
    return {"has_exif": False}


def insert_png_exif(payload: bytes, tiff: bytes) -> bytes:
    """Fixture helper: splice an ``eXIf`` chunk (with a correct CRC)
    after IHDR."""
    import zlib as _z

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    (ihdr_len,) = struct.unpack_from(">I", payload, 8)
    cut = 8 + 12 + ihdr_len
    chunk = struct.pack(">I", len(tiff)) + b"eXIf" + tiff
    chunk += struct.pack(">I", _z.crc32(b"eXIf" + tiff) & 0xFFFFFFFF)
    return payload[:cut] + chunk + payload[cut:]


_WEBP_META_CHUNKS = (b"EXIF", b"XMP ")


def parse_webp_exif(payload: bytes) -> dict:
    """Extract EXIF from a WebP ``EXIF`` chunk (extended VP8X
    container). A JPEG-style "Exif\\0\\0" prefix, present in files from
    some writers, is tolerated. {"has_exif": False} when absent."""
    if len(payload) < 16 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    off, n = 12, len(payload)
    while off + 8 <= n:
        cid = payload[off:off + 4]
        (sz,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8:off + 8 + sz]
        if len(body) < sz:
            raise ValueError(f"torn WebP chunk {cid!r}")
        if cid == b"EXIF":
            if body[:6] == b"Exif\x00\x00":
                body = body[6:]
            return parse_exif_tiff(body)
        off += 8 + sz + (sz & 1)
    return {"has_exif": False}


def strip_webp_metadata(payload: bytes) -> bytes:
    """Drop EXIF/XMP chunks from a WebP container, rewriting the RIFF
    size and clearing the VP8X EXIF/XMP flag bits (bits 3/2 of the
    feature byte); image chunks are byte-identical."""
    if len(payload) < 16 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    off, n = 12, len(payload)
    body_out = bytearray()
    while off + 8 <= n:
        cid = payload[off:off + 4]
        (sz,) = struct.unpack_from("<I", payload, off + 4)
        end = off + 8 + sz
        if end > n:
            raise ValueError(f"torn WebP chunk {cid!r}")
        if cid not in _WEBP_META_CHUNKS:
            chunk = bytearray(payload[off:end + (sz & 1)])
            if cid == b"VP8X" and sz >= 1:
                chunk[8] &= ~0x0C  # clear EXIF (bit 3) + XMP (bit 2)
            body_out += chunk
        off = end + (sz & 1)
    return b"RIFF" + struct.pack("<I", 4 + len(body_out)) + b"WEBP" \
        + bytes(body_out)
