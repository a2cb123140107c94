"""XMP + IPTC metadata extraction and strip — the r14 crawl-hygiene
wave (r13 verdict "Next round" #7).

EXIF (operators/exif.py) is not the only PII carrier in crawl
imagery: XMP packets (ISO 16684-1 / Adobe XMP — RDF/XML) carry
creator names, creation timestamps, and GPS coordinates too, and
IPTC-IIM blocks (the newswire standard) carry bylines and locations.
This module covers:

- XMP packet parsing (``parse_xmp``): creator tool, create date,
  dc:creator, GPS presence — both the element and the attribute RDF
  serializations (writers use either),
- carrier-dispatched extraction (``extract_xmp_any``): JPEG APP1
  (the ``http://ns.adobe.com/xap/1.0/`` header), PNG iTXt
  (keyword ``XML:com.adobe.xmp``, PNG 1.2 extension), WebP ``XMP ``
  chunks (VP8X containers), HEIC ``mime`` items (ISO 23008-12 §A.3,
  operators/heif.py),
- IPTC-IIM in JPEG APP13 (Photoshop 3.0 / 8BIM resource 0x0404):
  byline, city, country, keywords, caption datasets,
- strips: JPEG (strip_metadata already drops APP1/APP13
  byte-provably), PNG (strip_png_metadata drops iTXt), WebP
  (strip_webp_metadata drops ``XMP ``), HEIC (strip_heif_xmp —
  in-place space fill, offsets untouched),
- fixture writers (``build_xmp``, ``build_iptc_app13``,
  ``insert_*``) so the corpus path never depends on host libraries,
- the Spark surface ``with_xmp`` (Arrow ``mapInPandas`` over
  MEDIA_SCHEMA, quarantine-style per-row tolerance — the with_exif
  twin).

Torn carriers raise ValueError; torn XML inside a well-framed packet
yields has_xmp=true with NULL fields (the packet is real, its content
is not parseable — that distinction matters for hygiene audits).
"""

from __future__ import annotations

import re
import struct

_XMP_JPEG_HEADER = b"http://ns.adobe.com/xap/1.0/\x00"
_XMP_PNG_KEYWORD = b"XML:com.adobe.xmp"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# --- packet parse --------------------------------------------------------------

_FIELDS = {
    "creator_tool": "CreatorTool",
    "create_date": "CreateDate",
}
_GPS_KEYS = ("GPSLatitude", "GPSLongitude")


def parse_xmp(packet: bytes) -> dict:
    """Extract the hygiene-relevant facts from an XMP packet:
    creator_tool, create_date, creator (first dc:creator list item),
    has_gps (exif:GPSLatitude/GPSLongitude present in either RDF
    shape). Unparseable XML inside a real packet → has_xmp true,
    fields None."""
    out: dict = {
        "has_xmp": True,
        "creator_tool": None,
        "create_date": None,
        "creator": None,
        "has_gps": False,
    }
    try:
        import xml.etree.ElementTree as ET

        # the packet may carry <?xpacket?> PIs and padding — locate the
        # xmpmeta element proper
        m = re.search(rb"<x:xmpmeta.*?</x:xmpmeta>", packet, re.S)
        root = ET.fromstring(m.group(0) if m else packet)
    except Exception:
        return out
    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    for el in root.iter():
        name = local(el.tag)
        for field, key in _FIELDS.items():
            if name == key and el.text and out[field] is None:
                out[field] = el.text.strip()
        if name in _GPS_KEYS:
            out["has_gps"] = True
        if name == "creator" and out["creator"] is None:
            # dc:creator is an rdf:Seq of rdf:li
            for li in el.iter():
                if local(li.tag) == "li" and li.text:
                    out["creator"] = li.text.strip()
                    break
        for attr, val in el.attrib.items():
            aname = local(attr)
            for field, key in _FIELDS.items():
                if aname == key and out[field] is None:
                    out[field] = val
            if aname in _GPS_KEYS:
                out["has_gps"] = True
    return out


def build_xmp(creator_tool: str = "", create_date: str = "",
              creator: str = "", gps: tuple[str, str] | None = None) -> bytes:
    """Fixture XMP packet (attribute serialization + a dc:creator Seq,
    xpacket-wrapped — the shape real writers emit)."""
    attrs = 'xmlns:xmp="http://ns.adobe.com/xap/1.0/"'
    props = []
    if creator_tool:
        props.append(f'xmp:CreatorTool="{creator_tool}"')
    if create_date:
        props.append(f'xmp:CreateDate="{create_date}"')
    gps_el = ""
    if gps is not None:
        attrs += ' xmlns:exif="http://ns.adobe.com/exif/1.0/"'
        gps_el = (f"<exif:GPSLatitude>{gps[0]}</exif:GPSLatitude>"
                  f"<exif:GPSLongitude>{gps[1]}</exif:GPSLongitude>")
    creator_el = ""
    if creator:
        attrs += ' xmlns:dc="http://purl.org/dc/elements/1.1/"'
        creator_el = (f"<dc:creator><rdf:Seq><rdf:li>{creator}</rdf:li>"
                      "</rdf:Seq></dc:creator>")
    xml = (
        '<?xpacket begin="﻿" id="W5M0MpCehiHzreSzNTczkc9d"?>'
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">'
        '<rdf:RDF xmlns:rdf='
        '"http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        f'<rdf:Description rdf:about="" {attrs} {" ".join(props)}>'
        f"{gps_el}{creator_el}</rdf:Description></rdf:RDF></x:xmpmeta>"
        '<?xpacket end="w"?>'
    )
    return xml.encode("utf-8")


# --- carrier extraction ---------------------------------------------------------


def extract_xmp_any(payload: bytes) -> bytes | None:
    """Return the raw XMP packet from any of the four carriers
    (JPEG APP1 / PNG iTXt / WebP XMP chunk / HEIC mime item), or None.
    Torn containers raise ValueError."""
    if payload[:2] == b"\xff\xd8":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
            _iter_segments,
        )

        for marker, s, e in _iter_segments(payload):
            if marker == 0xE1 and payload[
                s + 4 : s + 4 + len(_XMP_JPEG_HEADER)
            ] == _XMP_JPEG_HEADER:
                return payload[s + 4 + len(_XMP_JPEG_HEADER) : e]
        return None
    if payload.startswith(_PNG_SIG):
        return _png_xmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        off, n = 12, len(payload)
        while off + 8 <= n:
            cid = payload[off : off + 4]
            (sz,) = struct.unpack_from("<I", payload, off + 4)
            if off + 8 + sz > n:
                raise ValueError(f"torn WebP chunk {cid!r}")
            if cid == b"XMP ":
                return payload[off + 8 : off + 8 + sz]
            off += 8 + sz + (sz & 1)
        return None
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
            extract_heif_xmp,
        )

        return extract_heif_xmp(payload)
    raise ValueError("payload is not a recognized XMP carrier")


def _png_xmp(payload: bytes) -> bytes | None:
    import zlib

    off = 8
    n = len(payload)
    while off + 8 <= n:
        (ln,) = struct.unpack_from(">I", payload, off)
        ctype = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + ln]
        if len(body) < ln:
            raise ValueError("torn PNG chunk")
        if ctype == b"iTXt":
            kw_end = body.find(b"\x00")
            if kw_end == _XMP_PNG_KEYWORD.__len__() and body.startswith(
                _XMP_PNG_KEYWORD
            ):
                comp_flag = body[kw_end + 1]
                # skip comp flag, comp method, language tag, translated kw
                p = kw_end + 3
                p = body.index(b"\x00", p) + 1
                p = body.index(b"\x00", p) + 1
                text = body[p:]
                if comp_flag:
                    try:
                        text = zlib.decompress(text)
                    except zlib.error as exc:
                        raise ValueError(
                            f"torn compressed PNG XMP: {exc}"
                        ) from exc
                return text
        if ctype == b"IEND":
            break
        off += 12 + ln
    return None


def strip_xmp_any(payload: bytes) -> bytes:
    """Carrier-dispatched XMP/metadata strip: JPEG and PNG/WebP reuse
    the byte-provable strips (metadata segments/chunks removed, image
    data untouched); HEIC XMP is space-filled in place."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        strip_metadata,
        strip_png_metadata,
        strip_webp_metadata,
    )

    if payload[:2] == b"\xff\xd8":
        return strip_metadata(payload)
    if payload.startswith(_PNG_SIG):
        return strip_png_metadata(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return strip_webp_metadata(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
            strip_heif_xmp,
        )

        return strip_heif_xmp(payload)
    raise ValueError("payload is not a recognized XMP carrier")


# --- fixture insertion ----------------------------------------------------------


def insert_jpeg_xmp(jpeg: bytes, packet: bytes) -> bytes:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        insert_app1,
    )

    body = _XMP_JPEG_HEADER + packet
    app1 = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return insert_app1(jpeg, app1)


def insert_png_xmp(png: bytes, packet: bytes) -> bytes:
    import zlib

    if not png.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    (ihdr_len,) = struct.unpack_from(">I", png, 8)
    cut = 8 + 12 + ihdr_len
    body = _XMP_PNG_KEYWORD + b"\x00\x00\x00\x00\x00" + packet
    chunk = struct.pack(">I", len(body)) + b"iTXt" + body
    chunk += struct.pack(">I", zlib.crc32(b"iTXt" + body) & 0xFFFFFFFF)
    return png[:cut] + chunk + png[cut:]


def insert_webp_xmp(webp: bytes, packet: bytes) -> bytes:
    """Wrap/extend into a VP8X container carrying an ``XMP `` chunk."""
    if webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    chunks = webp[12:]
    if chunks[:4] != b"VP8X":
        # synthesize a VP8X header (XMP flag, canvas dims from nothing
        # is wrong — use 16x16 placeholder ONLY for fixture simple
        # containers; real writers always have VP8X)
        vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x04, 0, 0, 0]) \
            + b"\x0f\x00\x00\x0f\x00\x00"
        chunks = vp8x + chunks
    else:
        chunks = bytearray(chunks)
        chunks[8] |= 0x04  # XMP flag (bit 2)
        chunks = bytes(chunks)
    xmp_chunk = b"XMP " + struct.pack("<I", len(packet)) + packet
    if len(packet) & 1:
        xmp_chunk += b"\x00"
    body = b"WEBP" + chunks + xmp_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- IPTC-IIM (JPEG APP13 / Photoshop 8BIM 0x0404) ------------------------------

_IPTC_DATASETS = {
    (2, 5): "title",
    (2, 25): "keywords",
    (2, 80): "byline",
    (2, 90): "city",
    (2, 101): "country",
    (2, 120): "caption",
}


def parse_iptc(payload: bytes) -> dict:
    """Extract IPTC-IIM datasets from a JPEG's APP13 Photoshop block
    (resource 0x0404). {"has_iptc": False} when absent; keywords
    accumulate (the dataset is repeatable)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        _iter_segments,
    )

    if payload[:2] != b"\xff\xd8":
        raise ValueError("IPTC parsing covers JPEG APP13 carriers")
    blob = None
    for marker, s, e in _iter_segments(payload):
        if marker == 0xED and payload[s + 4 : s + 18] == b"Photoshop 3.0\x00":
            blob = payload[s + 18 : e]
            break
    if blob is None:
        return {"has_iptc": False}
    out: dict = {"has_iptc": False, "keywords": []}
    p = 0
    while p + 12 <= len(blob):
        if blob[p : p + 4] != b"8BIM":
            raise ValueError("torn Photoshop resource block")
        (res_id,) = struct.unpack_from(">H", blob, p + 4)
        name_len = blob[p + 6]
        p += 7 + name_len
        if (name_len + 1) & 1:
            p += 1
        (size,) = struct.unpack_from(">I", blob, p)
        p += 4
        data = blob[p : p + size]
        if len(data) < size:
            raise ValueError("torn Photoshop resource data")
        p += size + (size & 1)
        if res_id != 0x0404:
            continue
        out["has_iptc"] = True
        q = 0
        while q + 5 <= len(data):
            if data[q] != 0x1C:
                raise ValueError("torn IPTC dataset marker")
            rec, ds = data[q + 1], data[q + 2]
            (ln,) = struct.unpack_from(">H", data, q + 3)
            if ln & 0x8000:
                raise ValueError(
                    "IPTC extended-length datasets outside the declared scope"
                )
            val = data[q + 5 : q + 5 + ln]
            if len(val) < ln:
                raise ValueError("torn IPTC dataset value")
            q += 5 + ln
            name = _IPTC_DATASETS.get((rec, ds))
            if name == "keywords":
                out["keywords"].append(val.decode("utf-8", "replace"))
            elif name:
                out[name] = val.decode("utf-8", "replace")
    return out


def build_iptc_app13(fields: dict, keywords: list[str] | None = None) -> bytes:
    """Fixture APP13 segment: Photoshop 3.0 / 8BIM 0x0404 wrapping
    IPTC-IIM datasets."""
    rev = {v: k for k, v in _IPTC_DATASETS.items()}
    iim = b""
    for name, val in fields.items():
        rec, ds = rev[name]
        raw = val.encode("utf-8")
        iim += bytes([0x1C, rec, ds]) + struct.pack(">H", len(raw)) + raw
    for kw in keywords or []:
        raw = kw.encode("utf-8")
        iim += bytes([0x1C, 2, 25]) + struct.pack(">H", len(raw)) + raw
    res = b"8BIM" + struct.pack(">H", 0x0404) + b"\x00\x00"
    res += struct.pack(">I", len(iim)) + iim
    if len(iim) & 1:
        res += b"\x00"
    body = b"Photoshop 3.0\x00" + res
    return b"\xff\xed" + struct.pack(">H", len(body) + 2) + body


def insert_jpeg_iptc(jpeg: bytes, app13: bytes) -> bytes:
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app13 + jpeg[2:]


# --- Spark surface ---------------------------------------------------------------


def with_xmp(media):
    """Arrow-batched XMP+IPTC extraction over MEDIA_SCHEMA rows — all
    four XMP carriers plus JPEG IPTC in one pass (the with_exif twin).
    Unrecognized / torn / metadata-free rows yield has_xmp=false,
    has_iptc=false with NULL fields (quarantine-style)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("has_xmp", T.BooleanType(), False),
        T.StructField("creator_tool", T.StringType(), True),
        T.StructField("create_date", T.StringType(), True),
        T.StructField("creator", T.StringType(), True),
        T.StructField("xmp_has_gps", T.BooleanType(), True),
        T.StructField("has_iptc", T.BooleanType(), False),
        T.StructField("iptc_byline", T.StringType(), True),
        T.StructField("iptc_city", T.StringType(), True),
        T.StructField("n_keywords", T.IntegerType(), True),
    ])

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rec = {c: None for c in cols}
                rec["media_id"] = int(mid)
                rec["has_xmp"] = False
                rec["has_iptc"] = False
                payload = bytes(payload)
                try:
                    packet = extract_xmp_any(payload)
                    if packet is not None:
                        info = parse_xmp(packet)
                        rec["has_xmp"] = True
                        rec["creator_tool"] = info["creator_tool"]
                        rec["create_date"] = info["create_date"]
                        rec["creator"] = info["creator"]
                        rec["xmp_has_gps"] = info["has_gps"]
                except (ValueError, TypeError):
                    pass
                if payload[:2] == b"\xff\xd8":
                    try:
                        iptc = parse_iptc(payload)
                        if iptc.get("has_iptc"):
                            rec["has_iptc"] = True
                            rec["iptc_byline"] = iptc.get("byline")
                            rec["iptc_city"] = iptc.get("city")
                            rec["n_keywords"] = len(iptc.get("keywords", []))
                    except (ValueError, TypeError):
                        pass
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "payload").mapInPandas(op, schema)
