"""ID3v2 tag parsing and stripping — the audio counterpart of the EXIF
operator (operators/exif.py): crawled audio carries title/artist/
comment/geo metadata in an ID3v2 prefix (and an ID3v1 trailer); the
pipeline needs EXTRACT for auditing/routing and STRIP for publication,
without touching the audio frames (byte-level block removal — the MP3
frame data is bit-identical afterwards, which tests pin by comparing
probe spans and decoded PCM). Public structure: id3v2.3.0 / id3v2.4.0
informal standards (id3.org).

Declared scope: ID3v2.3 (plain big-endian frame sizes) and v2.4
(syncsafe frame sizes, optional footer), text encodings ISO-8859-1 /
UTF-16 with BOM / UTF-16BE / UTF-8, the extended header skipped,
unsynchronisation and v2.2 (3-byte ids) rejected with clear errors.
ValueError-only tear contract.
"""

from __future__ import annotations

#: text frame ids surfaced with friendly names
_TEXT_FRAMES = {
    "TIT2": "title",
    "TPE1": "artist",
    "TALB": "album",
    "TCON": "genre",
    "TRCK": "track",
    "TYER": "year",   # v2.3
    "TDRC": "year",   # v2.4 recording time
    "TSSE": "encoder",
}


def _syncsafe(b: bytes) -> int:
    v = 0
    for x in b:
        if x & 0x80:
            raise ValueError("bad syncsafe integer")
        v = (v << 7) | x
    return v


def _decode_text(body: bytes) -> str:
    if not body:
        return ""
    enc, data = body[0], body[1:]
    if enc == 0:
        s = data.decode("latin-1", "replace")
    elif enc == 1:
        s = data.decode("utf-16", "replace")  # BOM-led
    elif enc == 2:
        s = data.decode("utf-16-be", "replace")
    elif enc == 3:
        s = data.decode("utf-8", "replace")
    else:
        raise ValueError(f"bad text encoding {enc}")
    return s.rstrip("\x00")


def _tag_span(payload: bytes) -> tuple[int, int] | None:
    """(start, end) byte span of the leading ID3v2 block, or None."""
    if payload[:3] != b"ID3":
        return None
    if len(payload) < 10:
        raise ValueError("truncated ID3v2 header")
    size = _syncsafe(payload[6:10])
    end = 10 + size
    if payload[5] & 0x10:
        end += 10  # v2.4 footer not counted in the syncsafe size
    if end > len(payload):
        raise ValueError("ID3v2 size exceeds payload")
    return 0, end


def parse_id3(payload: bytes) -> dict:
    """Extract ID3v2 text frames (+ COMM comments) from an MP3 payload.
    Returns {"has_id3": False} when no tag; ValueError only on torn
    structure."""
    span = _tag_span(payload)
    if span is None:
        return {"has_id3": False}
    major, flags = payload[3], payload[5]
    if major not in (3, 4):
        raise ValueError(f"ID3v2.{major} not supported (declared: 2.3/2.4)")
    if flags & 0x80:
        raise ValueError("unsynchronised ID3v2 not supported (declared)")
    body = payload[10 : 10 + _syncsafe(payload[6:10])]
    i = 0
    if flags & 0x40:  # extended header: skip by its own size field
        ehs = _syncsafe(body[0:4]) if major == 4 else int.from_bytes(body[0:4], "big") + 4
        i = ehs
    out: dict = {"has_id3": True, "id3_version": f"2.{major}", "frames": []}
    comments = []
    while i + 10 <= len(body):
        fid = body[i : i + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        if not all(0x20 <= c < 0x7F for c in fid):
            raise ValueError(f"bad frame id at {i}")
        raw_sz = body[i + 4 : i + 8]
        fsz = _syncsafe(raw_sz) if major == 4 else int.from_bytes(raw_sz, "big")
        fb = body[i + 10 : i + 10 + fsz]
        if len(fb) != fsz:
            raise ValueError(f"truncated frame {fid!r}")
        name = fid.decode("ascii")
        out["frames"].append(name)
        if name in _TEXT_FRAMES:
            out[_TEXT_FRAMES[name]] = _decode_text(fb)
        elif name == "COMM" and len(fb) >= 4:
            enc = fb[0]
            rest = fb[4:]  # skip language
            if enc in (1, 2):
                parts = rest.split(b"\x00\x00", 1)
            else:
                parts = rest.split(b"\x00", 1)
            text = parts[1] if len(parts) > 1 else parts[0]
            comments.append(_decode_text(bytes([enc]) + text))
        i += 10 + fsz
    if comments:
        out["comments"] = comments
    return out


def strip_id3(payload: bytes) -> bytes:
    """Remove the leading ID3v2 block and any ID3v1 trailer. The audio
    frame bytes are untouched — probe spans and decoded PCM are
    bit-identical (tests pin both)."""
    span = _tag_span(payload)
    start = span[1] if span else 0
    end = len(payload)
    if end - start >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128
    return payload[start:end]


def build_id3v2(fields: dict, version: int = 4, padding: int = 16) -> bytes:
    """Assemble a spec-literal ID3v2.3/2.4 tag from friendly field names
    (title/artist/album/encoder/comment...) — the fixture builder;
    expected parse results are known by construction. Text frames are
    UTF-8 for v2.4 and ISO-8859-1 for v2.3 (each version's native
    default)."""
    rev = {v: k for k, v in _TEXT_FRAMES.items() if not (version == 3 and k == "TDRC") and not (version == 4 and k == "TYER")}
    frames = b""
    for name, value in fields.items():
        if name == "comment":
            if version == 4:
                body = b"\x03eng\x00" + value.encode("utf-8")
            else:
                body = b"\x00eng\x00" + value.encode("latin-1")
            fid = b"COMM"
        else:
            fid = rev[name].encode("ascii")
            if version == 4:
                body = b"\x03" + value.encode("utf-8")
            else:
                body = b"\x00" + value.encode("latin-1")
        sz = len(body)
        raw_sz = (
            bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
            if version == 4
            else sz.to_bytes(4, "big")
        )
        frames += fid + raw_sz + b"\x00\x00" + body
    total = len(frames) + padding
    hdr = b"ID3" + bytes([version, 0, 0]) + bytes(
        [(total >> 21) & 0x7F, (total >> 14) & 0x7F, (total >> 7) & 0x7F, total & 0x7F]
    )
    return hdr + frames + b"\x00" * padding


# --- Spark surface ---------------------------------------------------------

def with_id3(media):
    """Arrow-batched ID3 extraction over MEDIA_SCHEMA rows; non-MP3 /
    untagged / torn rows yield has_id3=false with NULL fields."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("has_id3", T.BooleanType(), False),
            T.StructField("id3_version", T.StringType(), True),
            T.StructField("title", T.StringType(), True),
            T.StructField("artist", T.StringType(), True),
            T.StructField("album", T.StringType(), True),
            T.StructField("encoder", T.StringType(), True),
            T.StructField("comment", T.StringType(), True),
            T.StructField("n_frames", T.IntegerType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rec = {c: None for c in cols}
                rec["media_id"] = int(mid)
                rec["has_id3"] = False
                try:
                    info = parse_id3(bytes(payload))
                    rec["has_id3"] = info["has_id3"]
                    for k in ("id3_version", "title", "artist", "album", "encoder"):
                        if k in info:
                            rec[k] = info[k]
                    if info.get("comments"):
                        rec["comment"] = info["comments"][0]
                    if "frames" in info:
                        rec["n_frames"] = len(info["frames"])
                except (ValueError, TypeError):
                    pass
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(op, schema)


def strip_audio_metadata(media):
    """Privacy pass for audio: MP3 rows lose their ID3v2 block and
    ID3v1 trailer (frame bytes untouched); other rows pass through.
    Adds ``stripped``."""
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
                    if b[:3] == b"ID3" or (
                        len(b) >= 128 and b[-128:-125] == b"TAG"
                    ):
                        payloads.append(strip_id3(b))
                        flags.append(True)
                        continue
                except (ValueError, TypeError):
                    pass
                payloads.append(payload)
                flags.append(False)
            yield pdf.assign(payload=payloads, stripped=flags)

    return media.mapInPandas(op, out_schema)
