"""EPUB ingestion — the books-corpus slice (r10 verdict "Next round"
#5): an EPUB is an OCF zip of XHTML chapters whose READING ORDER is
the OPF spine, not the zip member order. Composes the existing
machinery — operators/archives.py zip walking, operators/html.py
html_to_text (with its generated DuckDB twin) — plus the small OCF/
OPF walk this module adds. Public specifications:

- EPUB Open Container Format (OCF) 3.3: the ``mimetype`` member
  (``application/epub+zip``), ``META-INF/container.xml`` rootfile
  discovery (W3C, epub-33 §4).
- EPUB Packages 3.3: the OPF ``<manifest>`` (id → href/media-type)
  and ``<spine>`` (itemref reading order, linear="no" exclusion),
  Dublin Core metadata (dc:title / dc:language / dc:identifier).

Reference parity: the reference pipeline ingests semi-structured
documents into tenant lakes (README.md:1-109); EPUB is the standard
packaging of the public-domain books slice every LLM corpus carries.

Tear contract (the archives.py convention): a torn zip, missing
mimetype/container/OPF/spine member, or unresolvable idref raises
ValueError — and only ValueError; the Spark-side exploder turns that
into a visible quarantine row, never a dropped task.
"""

from __future__ import annotations

import posixpath
import re
from collections.abc import Iterator
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
    build_zip,
    iter_archive_members,
)

_XHTML_TYPES = {"application/xhtml+xml", "text/html"}


def _attr(tag: bytes, name: str) -> str | None:
    m = re.search(
        rb"""(?is)\b%s\s*=\s*["']([^"']*)["']""" % name.encode(), tag
    )
    return m.group(1).decode("utf-8", "replace") if m else None


def parse_epub(payload: bytes) -> dict:
    """Parse an EPUB container to metadata + spine-ordered chapters.

    Returns ``{"title", "language", "identifier", "opf_path",
    "chapters": [{"order", "idref", "href", "xhtml"}...]}`` where
    ``order`` is the SPINE position (reading order) — the whole point
    of the OPF walk: zip member order is storage order, not reading
    order. Non-XHTML manifest items (images, css) are not chapters;
    spine itemrefs with linear="no" are auxiliary content and skipped.
    """
    members: dict[str, bytes] = {}
    for name, data in iter_archive_members(payload):
        members[name] = data
    mt = members.get("mimetype")
    if mt is None or mt.strip() != b"application/epub+zip":
        raise ValueError("not an EPUB: missing or wrong mimetype member")
    container = members.get("META-INF/container.xml")
    if container is None:
        raise ValueError("EPUB without META-INF/container.xml")
    root = re.search(
        rb"""(?is)<rootfile\b[^>]*>""", container
    )
    opf_path = _attr(root.group(0), "full-path") if root else None
    if not opf_path:
        raise ValueError("EPUB container.xml without a rootfile full-path")
    opf = members.get(opf_path)
    if opf is None:
        raise ValueError(f"EPUB rootfile {opf_path!r} missing from the zip")
    opf_dir = posixpath.dirname(opf_path)

    manifest: dict[str, tuple[str, str]] = {}
    for m in re.finditer(rb"(?is)<(?:opf:)?item\b[^>]*>", opf):
        tag = m.group(0)
        iid = _attr(tag, "id")
        href = _attr(tag, "href")
        mtyp = _attr(tag, "media-type") or ""
        if iid and href:
            manifest[iid] = (href, mtyp.strip().lower())

    def dc(field: str) -> str | None:
        m = re.search(
            rb"(?is)<dc:%s\b[^>]*>(.*?)</dc:%s>" % (field.encode(), field.encode()),
            opf,
        )
        return m.group(1).decode("utf-8", "replace").strip() if m else None

    chapters = []
    order = 0
    spine = re.search(rb"(?is)<(?:opf:)?spine\b[^>]*>(.*?)</(?:opf:)?spine>", opf)
    if spine is None:
        raise ValueError("EPUB OPF without a spine")
    for m in re.finditer(rb"(?is)<(?:opf:)?itemref\b[^>]*>", spine.group(1)):
        tag = m.group(0)
        idref = _attr(tag, "idref")
        if not idref:
            continue
        if (_attr(tag, "linear") or "yes").strip().lower() == "no":
            continue
        if idref not in manifest:
            raise ValueError(f"EPUB spine idref {idref!r} not in the manifest")
        href, mtyp = manifest[idref]
        if mtyp not in _XHTML_TYPES:
            continue
        path = posixpath.normpath(posixpath.join(opf_dir, unquote(href)))
        body = members.get(path)
        if body is None:
            raise ValueError(f"EPUB chapter {path!r} missing from the zip")
        chapters.append(
            {
                "order": order,
                "idref": idref,
                "href": href,
                "xhtml": body.decode("utf-8", "replace"),
            }
        )
        order += 1
    return {
        "title": dc("title"),
        "language": dc("language"),
        "identifier": dc("identifier"),
        "opf_path": opf_path,
        "chapters": chapters,
    }


EPUB_CHAPTER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("order", T.IntegerType(), True),
        T.StructField("href", T.StringType(), True),
        T.StructField("xhtml", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


def explode_epub_chapters(
    epubs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """One EPUB row → one row per spine chapter in READING order
    (+ metadata on every row); a torn container contributes a visible
    parse_error quarantine row. Text extraction stays a downstream
    Spark column op (operators/html.py html_to_text) so the whole
    chain remains oracle-replayable."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in EPUB_CHAPTER_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                try:
                    book = parse_epub(bytes(payload))
                    for ch in book["chapters"]:
                        rows.append(
                            {
                                "doc_id": did,
                                "order": ch["order"],
                                "href": ch["href"],
                                "xhtml": ch["xhtml"],
                                "title": book["title"],
                                "language": book["language"],
                                "parse_error": None,
                            }
                        )
                except (ValueError, TypeError) as exc:
                    rows.append(
                        {
                            "doc_id": did,
                            "order": None,
                            "href": None,
                            "xhtml": None,
                            "title": None,
                            "language": None,
                            "parse_error": str(exc),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return epubs.select(id_col, payload_col).mapInPandas(op, EPUB_CHAPTER_SCHEMA)


def build_epub(
    chapters: list[tuple[str, str]],
    title: str = "Fixture Book",
    language: str = "en",
    identifier: str = "urn:fixture",
    spine_order: list[int] | None = None,
) -> bytes:
    """Spec-literal fixture EPUB: OCF zip with the STORED ``mimetype``
    member first, container.xml, an OPF under OEBPS/, and the chapter
    XHTML files. ``chapters`` are (href, xhtml-body) in STORAGE order;
    ``spine_order`` (a permutation of indices) sets the READING order,
    deliberately decoupled from storage order so a parser that walks
    the zip instead of the spine fails the oracle."""
    n = len(chapters)
    spine = spine_order if spine_order is not None else list(range(n))
    if sorted(spine) != list(range(n)):
        raise ValueError("spine_order must be a permutation of the chapters")
    items = "\n".join(
        f'<item id="c{i}" href="{href}" media-type="application/xhtml+xml"/>'
        for i, (href, _) in enumerate(chapters)
    )
    itemrefs = "\n".join(f'<itemref idref="c{i}"/>' for i in spine)
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" '
        'unique-identifier="uid">\n'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">\n'
        f'<dc:identifier id="uid">{identifier}</dc:identifier>\n'
        f"<dc:title>{title}</dc:title>\n"
        f"<dc:language>{language}</dc:language>\n"
        "</metadata>\n"
        f"<manifest>\n{items}\n</manifest>\n"
        f"<spine>\n{itemrefs}\n</spine>\n"
        "</package>\n"
    )
    container = (
        '<?xml version="1.0"?>\n'
        '<container version="1.0" '
        'xmlns="urn:oasis:names:tc:opendocument:xmlns:container">\n'
        "<rootfiles>\n"
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>\n'
        "</rootfiles>\n"
        "</container>\n"
    )
    members = [("mimetype", b"application/epub+zip")]
    members.append(("META-INF/container.xml", container.encode()))
    members.append(("OEBPS/content.opf", opf.encode()))
    for href, body in chapters:
        members.append((f"OEBPS/{href}", body.encode()))
    return build_zip(members, stored=True)
