"""WARC (Web ARChive, ISO 28500) ingest — the Common Crawl container.

A 100 TB training-data pipeline's raw input is overwhelmingly WARC: tens
of thousands of ~1 GB ``.warc.gz`` files, each a concatenation of
per-record gzip members framed by WARC headers. This module reads them
with the stdlib only:

- :func:`parse_warc_records` — the record parser (WARC/1.x header block,
  ``Content-Length`` framing, CRLF discipline), plus per-record-member
  gzip streams via ``zlib`` (the Common Crawl layout: each record its own
  gzip member, so records are seekable without inflating the whole file);
- :func:`http_response_body` — split the HTTP envelope of ``response``
  records into (status, headers, body);
- :func:`read_warc` — the distributed reader: Spark's ``binaryFile``
  source lists paths on the driver and ships bytes straight to executors,
  one task per file — the natural parallelism unit, since Common Crawl
  publishes many similarly-sized files. Records explode inside an
  Arrow ``mapInPandas`` pass; no driver-side parsing ever.

Scale shape: parsing is partition-local (file → records is a flat map);
the only shuffle is whatever the caller does downstream. Malformed
records surface as rows with ``warc_type = NULL`` and the error text in
``parse_error`` — the A5 quarantine convention, never an executor crash.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("block", T.BinaryType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


def gunzip_members(data: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the .warc.gz layout) into
    one byte stream; plain (non-gzip) input passes through unchanged.
    Non-gzip bytes AFTER at least one valid member are corruption — that
    raises rather than silently truncating the archive (a torn tail must
    never read as a clean end-of-file)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out, rest = [], data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        out.append(d.flush())
        rest = d.unused_data
    if rest:
        raise ValueError(
            f"{len(rest)} trailing non-gzip bytes after the last gzip member"
        )
    return b"".join(out)


def parse_warc_records(data: bytes) -> list[dict]:
    """Parse a (decompressed) WARC byte stream into record dicts with the
    WARC_RECORD_SCHEMA fields (minus source_file/record_idx). A framing
    error emits one final record carrying ``parse_error`` and stops — a
    torn tail must not look like a clean end-of-file."""
    records: list[dict] = []
    i, n = 0, len(data)
    while i < n:
        # skip inter-record CRLFs
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        try:
            hdr_end = data.index(b"\r\n\r\n", i)
        except ValueError:
            records.append(_err_record("torn record header at offset %d" % i))
            break
        header = data[i:hdr_end].decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            records.append(_err_record("missing WARC/ version line at offset %d" % i))
            break
        fields = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            records.append(_err_record("missing/bad Content-Length at offset %d" % i))
            break
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        if len(block) != length:
            records.append(_err_record("truncated block at offset %d" % i))
            break
        records.append(
            {
                "warc_type": fields.get("warc-type"),
                "target_uri": fields.get("warc-target-uri"),
                "warc_date": fields.get("warc-date"),
                "record_id": fields.get("warc-record-id"),
                "content_type": fields.get("content-type"),
                "content_length": length,
                "block": block,
                "parse_error": None,
            }
        )
        i = hdr_end + 4 + length
    return records


def _err_record(msg: str) -> dict:
    return {
        "warc_type": None,
        "target_uri": None,
        "warc_date": None,
        "record_id": None,
        "content_type": None,
        "content_length": None,
        "block": None,
        "parse_error": msg,
    }


def http_response_body(block: bytes) -> tuple[int | None, bytes]:
    """(status_code, body) from an HTTP response block; (None, block) when
    the block is not an HTTP envelope."""
    if not block.startswith(b"HTTP/"):
        return None, block
    try:
        sep = block.index(b"\r\n\r\n")
        status = int(block[:sep].split(b"\r\n", 1)[0].split(b" ")[1])
        return status, block[sep + 4 :]
    except (ValueError, IndexError):
        return None, block


def build_warc(records: list[dict]) -> bytes:
    """Assemble a WARC/1.0 byte stream (the test/synthesis writer — the
    parser is independently tested against spec-literal bytes). Each
    record dict: warc_type, target_uri, warc_date, record_id,
    content_type, block (bytes)."""
    out = []
    for r in records:
        headers = [
            "WARC/1.0",
            f"WARC-Type: {r['warc_type']}",
            f"WARC-Record-ID: {r['record_id']}",
            f"WARC-Date: {r['warc_date']}",
        ]
        if r.get("target_uri"):
            headers.append(f"WARC-Target-URI: {r['target_uri']}")
        headers.append(f"Content-Type: {r['content_type']}")
        headers.append(f"Content-Length: {len(r['block'])}")
        out.append("\r\n".join(headers).encode("utf-8"))
        out.append(b"\r\n\r\n")
        out.append(r["block"])
        out.append(b"\r\n\r\n")
    return b"".join(out)


def read_warc(spark: SparkSession, path: str, glob: str = "*.warc*") -> DataFrame:
    """Distributed WARC reader: one binaryFile task per archive file,
    records exploded executor-side. Returns WARC_RECORD_SCHEMA rows."""
    raw = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    recs = parse_warc_records(gunzip_members(bytes(content)))
                except Exception as exc:  # undecodable archive → one error row
                    recs = [_err_record(f"archive error: {exc}")]
                for idx, r in enumerate(recs):
                    rows.append({"source_file": path_, "record_idx": idx, **r})
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in WARC_RECORD_SCHEMA.fields],
            )

    return raw.select("path", "content").mapInPandas(op, WARC_RECORD_SCHEMA)
