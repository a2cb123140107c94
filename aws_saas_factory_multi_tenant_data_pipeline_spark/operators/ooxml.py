"""Office document text extraction — .docx / .xlsx / .pptx (OOXML,
ECMA-376) and .odt (ODF, OASIS) — the largest high-quality document
slice of a real crawl after PDF/HTML (r14 verdict "Next round" #1).

All four formats are zip containers of XML parts; the extraction-
relevant structure is public and small:

- **.docx** (WordprocessingML): ``word/document.xml`` — ``w:p``
  paragraphs of ``w:r`` runs; text lives in ``w:t`` (``xml:space=
  "preserve"`` keeps leading/trailing spaces), ``w:tab`` is a tab,
  ``w:br``/``w:cr`` are line breaks. Title in ``docProps/core.xml``
  (``dc:title``).
- **.xlsx** (SpreadsheetML): cell strings are INDIRECT — a cell
  ``<c t="s"><v>17</v></c>`` holds an index into
  ``xl/sharedStrings.xml`` (``si`` entries, themselves possibly
  rich-text split across ``r/t`` runs; phonetic ``rPh`` runs are
  reading aids, not body text). Inline strings (``t="inlineStr"``,
  ``is/t``) and formula string results (``t="str"``, value in ``v``)
  also carry text; numeric cells don't. Sheet ORDER is
  ``xl/workbook.xml``'s ``sheet`` list, resolved through
  ``xl/_rels/workbook.xml.rels`` r:id → target — never the zip
  member order.
- **.pptx** (PresentationML): slide ORDER is ``ppt/presentation.xml``
  ``p:sldIdLst`` r:id order resolved through
  ``ppt/_rels/presentation.xml.rels`` — slide FILE NAMES are not
  ordinals (``slide10.xml`` sorts before ``slide2.xml`` by name and a
  repackaged deck can permute names arbitrarily). Text is ``a:t``
  inside ``a:p`` paragraphs.
- **.odt** (OpenDocument): ``mimetype`` member (stored first, OCF
  style) is ``application/vnd.oasis.opendocument.text``;
  ``content.xml`` holds ``text:p``/``text:h`` paragraphs where runs
  of spaces are ENCODED as ``<text:s text:c="N"/>``, tabs as
  ``<text:tab/>``, line breaks as ``<text:line-break/>`` — a naive
  XML text walk silently drops them. Title in ``meta.xml``.

Reference parity: the reference lake ingests semi-structured tenant
documents schema-on-read (src/main/cdk/ingestion/lib/glue-stack/
glue-stack.ts:32-44); office containers are the standard enterprise/
crawl packaging of that slice. Zip walking reuses
operators/archives.iter_archive_members; the tear contract is the
archives.py convention — ValueError, and only ValueError, so the
Spark exploder quarantines per-row.

Hostile-XML guard: payload XML carrying DTD/entity declarations
(``<!DOCTYPE`` / ``<!ENTITY``) is rejected with ValueError before
parsing — expat expands internal entities (billion-laughs class) and
no office writer emits DTDs; the quarantine row names the reason.
"""

from __future__ import annotations

import posixpath
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
    build_zip,
    iter_archive_members,
)

_ODT_MIME = b"application/vnd.oasis.opendocument.text"


def _local(tag) -> str:
    """Namespace-free local name ('{ns}p' -> 'p')."""
    if not isinstance(tag, str):  # comments / PIs
        return ""
    return tag.rsplit("}", 1)[-1]


def _parse_xml(data: bytes, what: str) -> ET.Element:
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        raise ValueError(f"{what}: DTD/entity declarations out of scope")
    try:
        return ET.fromstring(data)
    except ET.ParseError as exc:
        raise ValueError(f"{what}: malformed XML: {exc}") from exc


def _members(payload: bytes) -> dict[str, bytes]:
    return dict(iter_archive_members(payload))


def sniff_office_format(payload: bytes) -> str | None:
    """'docx' / 'xlsx' / 'pptx' / 'odt' / 'doc' (legacy CFB, [r15]
    second wave) by container content (the part that names the
    format), None when it's a zip/CFB of something else. Extension is
    advisory only — crawls rename freely."""
    if payload[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        # CFB container: legacy .doc when a WordDocument stream exists
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
            parse_cfb,
        )

        try:
            streams = parse_cfb(payload)["streams"]
        except ValueError:
            return None
        if "WordDocument" in streams:
            return "doc"
        if "Workbook" in streams or "Book" in streams:
            return "xls"
        if "PowerPoint Document" in streams:
            return "ppt"
        return None
    if payload[:4] not in (b"PK\x03\x04", b"PK\x05\x06"):
        return None
    try:
        members = _members(payload)
    except ValueError:
        return None
    mt = members.get("mimetype", b"").strip()
    if mt == _ODT_MIME:
        return "odt"
    if "word/document.xml" in members:
        return "docx"
    if "xl/workbook.xml" in members:
        return "xlsx"
    if "ppt/presentation.xml" in members:
        return "pptx"
    return None


# --- .docx ---------------------------------------------------------------------


def _docx_para_text(p: ET.Element) -> str:
    """Text of one w:p: runs in document order; w:t verbatim (the
    xml:space semantics are the XML parser's), run-level w:tab a tab,
    w:br / w:cr newlines. w:tab inside w:tabs (tab-STOP definitions
    under w:pPr) is formatting, not text."""
    parts: list[str] = []
    for r in p.iter():
        if _local(r.tag) != "r":
            continue
        for el in r:
            t = _local(el.tag)
            if t == "t":
                parts.append(el.text or "")
            elif t == "tab":
                parts.append("\t")
            elif t in ("br", "cr"):
                parts.append("\n")
    return "".join(parts)


def _core_title(members: dict[str, bytes]) -> str | None:
    core = members.get("docProps/core.xml")
    if core is None:
        return None
    root = _parse_xml(core, "docProps/core.xml")
    for el in root.iter():
        if _local(el.tag) == "title":
            return el.text or ""
    return None


def parse_docx(payload: bytes) -> dict:
    """{'paragraphs': [str...], 'title': str|None} in document order."""
    members = _members(payload)
    doc = members.get("word/document.xml")
    if doc is None:
        raise ValueError("docx without word/document.xml")
    root = _parse_xml(doc, "word/document.xml")
    body = next((el for el in root.iter() if _local(el.tag) == "body"), None)
    if body is None:
        raise ValueError("docx document.xml without a w:body")
    paragraphs = [
        _docx_para_text(p) for p in body.iter() if _local(p.tag) == "p"
    ]
    return {"paragraphs": paragraphs, "title": _core_title(members)}


# --- .xlsx ---------------------------------------------------------------------


def _si_text(si: ET.Element) -> str:
    """One sharedStrings si: plain t, or rich-text r/t runs
    concatenated; t inside rPh (phonetic reading aids) excluded."""
    parts: list[str] = []

    def walk(el: ET.Element) -> None:
        t = _local(el.tag)
        if t == "rPh":
            return
        if t == "t":
            parts.append(el.text or "")
            return
        for ch in el:
            walk(ch)

    walk(si)
    return "".join(parts)


def _rels(members: dict[str, bytes], rels_path: str) -> dict[str, str]:
    data = members.get(rels_path)
    if data is None:
        raise ValueError(f"missing relationships part {rels_path!r}")
    root = _parse_xml(data, rels_path)
    out = {}
    for el in root.iter():
        if _local(el.tag) == "Relationship":
            out[el.get("Id", "")] = el.get("Target", "")
    return out


def _rid(el: ET.Element) -> str | None:
    for k, v in el.attrib.items():
        if _local(k) == "id" and "}" in k:  # r:id, never the plain id
            return v
    return None


def parse_xlsx(payload: bytes) -> dict:
    """{'sheets': [{'name', 'rows': [[cell-texts]...]}...], 'title'} —
    sheets in WORKBOOK order (r:id through the rels), string cells
    only (shared / inline / formula-string); numeric cells are data,
    not text."""
    members = _members(payload)
    wb = members.get("xl/workbook.xml")
    if wb is None:
        raise ValueError("xlsx without xl/workbook.xml")
    shared: list[str] = []
    ss = members.get("xl/sharedStrings.xml")
    if ss is not None:
        sroot = _parse_xml(ss, "xl/sharedStrings.xml")
        shared = [el_text for el in sroot
                  if _local(el.tag) == "si"
                  for el_text in (_si_text(el),)]
    rels = _rels(members, "xl/_rels/workbook.xml.rels")
    wroot = _parse_xml(wb, "xl/workbook.xml")
    sheets = []
    for el in wroot.iter():
        if _local(el.tag) != "sheet":
            continue
        rid = _rid(el)
        if rid is None or rid not in rels:
            raise ValueError(f"xlsx sheet {el.get('name')!r} without rels")
        target = posixpath.normpath(posixpath.join("xl", rels[rid]))
        part = members.get(target)
        if part is None:
            raise ValueError(f"xlsx sheet part {target!r} missing")
        sroot = _parse_xml(part, target)
        rows: list[list[str]] = []
        for row in sroot.iter():
            if _local(row.tag) != "row":
                continue
            cells: list[str] = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                ctype = c.get("t", "n")
                if ctype == "s":
                    v = next(
                        (x for x in c if _local(x.tag) == "v"), None
                    )
                    if v is None:
                        continue
                    try:
                        idx = int((v.text or "").strip())
                        cells.append(shared[idx])
                    except (ValueError, IndexError) as exc:
                        raise ValueError(
                            f"xlsx shared-string index {v.text!r} out of "
                            f"range"
                        ) from exc
                elif ctype == "inlineStr":
                    is_el = next(
                        (x for x in c if _local(x.tag) == "is"), None
                    )
                    if is_el is not None:
                        cells.append(_si_text(is_el))
                elif ctype == "str":
                    v = next((x for x in c if _local(x.tag) == "v"), None)
                    if v is not None:
                        cells.append(v.text or "")
                # 'n' / 'b' / 'e' / 'd' cells are data, not text
            if cells:
                rows.append(cells)
        sheets.append({"name": el.get("name", ""), "rows": rows})
    return {"sheets": sheets, "title": _core_title(members)}


# --- .pptx ---------------------------------------------------------------------


def parse_pptx(payload: bytes) -> dict:
    """{'slides': [{'order', 'part', 'text'}...], 'title'} — slides in
    PRESENTATION order (p:sldIdLst r:id resolved through the rels);
    slide text is a:p paragraphs (a:t runs concatenated) joined with
    newlines. Zip member order and slide file numbering are storage
    artifacts — a repacked deck permutes both."""
    members = _members(payload)
    pres = members.get("ppt/presentation.xml")
    if pres is None:
        raise ValueError("pptx without ppt/presentation.xml")
    rels = _rels(members, "ppt/_rels/presentation.xml.rels")
    proot = _parse_xml(pres, "ppt/presentation.xml")
    sld_ids = []
    for el in proot.iter():
        if _local(el.tag) == "sldId":
            rid = _rid(el)
            if rid is None or rid not in rels:
                raise ValueError("pptx sldId without a resolvable r:id")
            sld_ids.append(rid)
    slides = []
    for order, rid in enumerate(sld_ids):
        target = posixpath.normpath(posixpath.join("ppt", rels[rid]))
        part = members.get(target)
        if part is None:
            raise ValueError(f"pptx slide part {target!r} missing")
        sroot = _parse_xml(part, target)
        paras = []
        for p in sroot.iter():
            if _local(p.tag) != "p":
                continue
            paras.append(
                "".join(
                    el.text or ""
                    for el in p.iter()
                    if _local(el.tag) == "t"
                )
            )
        slides.append(
            {"order": order, "part": target, "text": "\n".join(paras)}
        )
    return {"slides": slides, "title": _core_title(members)}


# --- .odt ----------------------------------------------------------------------


def _odt_collect(el: ET.Element, out: list[str]) -> None:
    t = _local(el.tag)
    if t == "s":  # run-length encoded spaces
        c = 1
        for k, v in el.attrib.items():
            if _local(k) == "c":
                c = int(v)
        out.append(" " * c)
        return
    if t == "tab":
        out.append("\t")
        return
    if t == "line-break":
        out.append("\n")
        return
    if t in ("note", "annotation"):  # footnotes aren't body text
        return
    if el.text:
        out.append(el.text)
    for ch in el:
        _odt_collect(ch, out)
        if ch.tail:
            out.append(ch.tail)


def parse_odt(payload: bytes) -> dict:
    """{'paragraphs': [str...], 'title': str|None} — text:p / text:h
    in document order with text:s / text:tab / text:line-break
    expanded (the whitespace ODF run-length-encodes)."""
    members = _members(payload)
    if members.get("mimetype", b"").strip() != _ODT_MIME:
        raise ValueError("not an ODT: missing or wrong mimetype member")
    content = members.get("content.xml")
    if content is None:
        raise ValueError("odt without content.xml")
    root = _parse_xml(content, "content.xml")
    body = next(
        (el for el in root.iter() if _local(el.tag) == "text"), None
    )
    if body is None:
        raise ValueError("odt content.xml without office:text")
    paragraphs = []
    for p in body.iter():
        if _local(p.tag) not in ("p", "h"):
            continue
        parts: list[str] = []
        if p.text:
            parts.append(p.text)
        for ch in p:
            _odt_collect(ch, parts)
            if ch.tail:
                parts.append(ch.tail)
        paragraphs.append("".join(parts))
    title = None
    meta = members.get("meta.xml")
    if meta is not None:
        mroot = _parse_xml(meta, "meta.xml")
        for el in mroot.iter():
            if _local(el.tag) == "title":
                title = el.text or ""
                break
    return {"paragraphs": paragraphs, "title": title}


# --- unified front door ----------------------------------------------------------


def _cfb_title(payload: bytes) -> str | None:
    """Title from a CFB container's SummaryInformation, when present."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
        parse_cfb,
        parse_summary_information,
    )

    si = parse_cfb(payload)["streams"].get("\x05SummaryInformation")
    return parse_summary_information(si)["title"] if si else None


def office_to_text(payload: bytes) -> dict:
    """Sniff + extract: {'format', 'text', 'title', 'n_blocks'} where
    blocks are paragraphs (docx/odt), string-bearing rows (xlsx), or
    slides (pptx); text joins blocks with newlines (xlsx cells within
    a row join with tabs). ValueError on non-office zips and torn
    containers — the quarantine contract."""
    fmt = sniff_office_format(payload)
    if fmt is None:
        raise ValueError("not an office container")
    if fmt == "docx":
        d = parse_docx(payload)
        blocks = d["paragraphs"]
    elif fmt == "xlsx":
        d = parse_xlsx(payload)
        blocks = [
            "\t".join(row) for sh in d["sheets"] for row in sh["rows"]
        ]
    elif fmt == "pptx":
        d = parse_pptx(payload)
        blocks = [s["text"] for s in d["slides"]]
    elif fmt == "doc":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
            parse_doc,
        )

        d = parse_doc(payload)
        blocks = d["text"].split("\n") if d["text"] else []
    elif fmt == "xls":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.biff import (
            parse_xls,
        )

        x = parse_xls(payload)
        blocks = []
        for sh in x["sheets"]:
            rows: dict[int, list] = {}
            for r, c, v in sh["cells"]:
                if isinstance(v, str):
                    rows.setdefault(r, []).append((c, v))
            for r in sorted(rows):
                blocks.append("\t".join(
                    v for _, v in sorted(rows[r])))
        d = {"title": _cfb_title(payload)}
    elif fmt == "ppt":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ppt97 import (
            parse_ppt,
        )

        blocks = parse_ppt(payload)["texts"]
        d = {"title": _cfb_title(payload)}
    else:
        d = parse_odt(payload)
        blocks = d["paragraphs"]
    return {
        "format": fmt,
        "text": "\n".join(blocks),
        "title": d["title"],
        "n_blocks": len(blocks),
    }


OFFICE_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("n_blocks", T.IntegerType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)

#: extensions the archive router treats as office documents
OFFICE_EXTS = ("docx", "xlsx", "pptx", "odt")


def extract_office_text(
    docs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """One container row → one extracted-text row; torn/hostile
    containers contribute a visible parse_error quarantine row (the
    A5 convention), never a task failure."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in OFFICE_TEXT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                did = int(did)
                try:
                    d = office_to_text(bytes(payload))
                    rows.append(
                        {
                            "doc_id": did,
                            "format": d["format"],
                            "title": d["title"],
                            "text": d["text"],
                            "n_blocks": d["n_blocks"],
                            "parse_error": None,
                        }
                    )
                except (ValueError, TypeError) as exc:
                    rows.append(
                        {
                            "doc_id": did,
                            "format": None,
                            "title": None,
                            "text": None,
                            "n_blocks": None,
                            "parse_error": str(exc),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, payload_col).mapInPandas(
        op, OFFICE_TEXT_SCHEMA
    )


def office_members_to_text(members: DataFrame) -> DataFrame:
    """Route exploded archive members into office text extraction by
    extension (advisory pre-filter; the content sniff decides), the
    members_to_media convention: members of torn archives excluded
    wholesale, doc identity = xxhash64(archive_id, member_name)."""
    from pyspark.sql import functions as F

    torn = (
        members.where(F.col("parse_error").isNotNull())
        .select("archive_id")
        .distinct()
    )
    ext = F.lower(F.element_at(F.split(F.col("member_name"), "\\."), -1))
    cands = (
        members.where(F.col("parse_error").isNull())
        .join(torn, "archive_id", "left_anti")
        .where(ext.isin(*OFFICE_EXTS))
        .select(
            F.xxhash64("archive_id", "member_name").alias("doc_id"),
            F.col("member_bytes").alias("payload"),
        )
    )
    return extract_office_text(cands)


# --- fixture builders -------------------------------------------------------------

_ESC = {"&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;"}


def _esc(s: str) -> str:
    return re.sub(r"[&<>\"]", lambda m: _ESC[m.group(0)], s)


_CT_DOCX = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">\n'
    '<Default Extension="xml" ContentType="application/xml"/>\n'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>\n'
    "</Types>\n"
).encode()

_RELS_NS = "http://schemas.openxmlformats.org/package/2006/relationships"
_R_NS = (
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
)


def _rels_xml(pairs: list[tuple[str, str, str]]) -> bytes:
    rows = "\n".join(
        f'<Relationship Id="{rid}" Type="{typ}" Target="{target}"/>'
        for rid, typ, target in pairs
    )
    return (
        f'<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<Relationships xmlns="{_RELS_NS}">\n{rows}\n</Relationships>\n'
    ).encode()


def _core_xml(title: str) -> bytes:
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<cp:coreProperties "
        'xmlns:cp="http://schemas.openxmlformats.org/package/2006/'
        'metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">\n'
        f"<dc:title>{_esc(title)}</dc:title>\n"
        "</cp:coreProperties>\n"
    ).encode()


def _split_runs(s: str, n: int = 3) -> list[str]:
    """Character-position splits (may land mid-word or ON a space —
    the xml:space trap a naive extractor fails)."""
    if len(s) < n:
        return [s]
    cuts = [len(s) * i // n for i in range(1, n)]
    out, prev = [], 0
    for c in cuts + [len(s)]:
        out.append(s[prev:c])
        prev = c
    return [p for p in out if p]


def build_docx(paragraphs: list[str], title: str = "Fixture") -> bytes:
    """Spec-literal .docx: every paragraph split into ~3 runs at raw
    character positions with xml:space='preserve' (leading/trailing
    run spaces survive only through the attribute — the trap)."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    paras = []
    for p in paragraphs:
        runs = "".join(
            f'<w:r><w:t xml:space="preserve">{_esc(r)}</w:t></w:r>'
            for r in _split_runs(p)
        ) or "<w:r><w:t/></w:r>"
        paras.append(f"<w:p>{runs}</w:p>")
    doc = (
        f'<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<w:document xmlns:w="{w}"><w:body>{"".join(paras)}'
        f"</w:body></w:document>\n"
    ).encode()
    return build_zip(
        [
            ("[Content_Types].xml", _CT_DOCX),
            (
                "_rels/.rels",
                _rels_xml(
                    [
                        ("rId1", f"{_R_NS}/officeDocument",
                         "word/document.xml"),
                        ("rId2", f"{_R_NS}/metadata/core-properties",
                         "docProps/core.xml"),
                    ]
                ),
            ),
            ("word/document.xml", doc),
            ("docProps/core.xml", _core_xml(title)),
        ]
    )


def build_xlsx(
    rows: list[list[str]], title: str = "Fixture",
    sheet_name: str = "Sheet1",
) -> bytes:
    """Spec-literal .xlsx with the sharedStrings TRAPS a naive XML
    grep fails: the string table is stored in REVERSED first-use
    order (cell indices remap), every 3rd entry is rich-text split
    across two r/t runs, and each row carries a numeric cell that
    must NOT leak into extracted text."""
    order: list[str] = []
    for row in rows:
        for cell in row:
            if cell not in order:
                order.append(cell)
    stored = list(reversed(order))  # the indirection trap
    index = {s: i for i, s in enumerate(stored)}
    sis = []
    for i, s in enumerate(stored):
        if i % 3 == 2 and len(s) > 1:
            mid = len(s) // 2
            sis.append(
                f'<si><r><t xml:space="preserve">{_esc(s[:mid])}</t></r>'
                f'<r><t xml:space="preserve">{_esc(s[mid:])}</t></r></si>'
            )
        else:
            sis.append(
                f'<si><t xml:space="preserve">{_esc(s)}</t></si>'
            )
    ss = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        f'2006/main" count="{len(stored)}" uniqueCount="{len(stored)}">'
        f'{"".join(sis)}</sst>\n'
    ).encode()
    srows = []
    for rix, row in enumerate(rows, start=1):
        cells = "".join(
            f'<c r="{chr(65 + cix)}{rix}" t="s"><v>{index[cell]}</v></c>'
            for cix, cell in enumerate(row)
        )
        cells += (
            f'<c r="{chr(65 + len(row))}{rix}"><v>{rix * 10}</v></c>'
        )
        srows.append(f'<row r="{rix}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        f'{"".join(srows)}</sheetData></worksheet>\n'
    ).encode()
    wb = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" '
        f'xmlns:r="{_R_NS}"><sheets>'
        f'<sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>\n"
    ).encode()
    return build_zip(
        [
            ("[Content_Types].xml", _CT_DOCX),
            (
                "_rels/.rels",
                _rels_xml(
                    [
                        ("rId1", f"{_R_NS}/officeDocument",
                         "xl/workbook.xml"),
                        ("rId2", f"{_R_NS}/metadata/core-properties",
                         "docProps/core.xml"),
                    ]
                ),
            ),
            ("xl/workbook.xml", wb),
            (
                "xl/_rels/workbook.xml.rels",
                _rels_xml(
                    [("rId1", f"{_R_NS}/worksheet",
                      "worksheets/sheet1.xml")]
                ),
            ),
            ("xl/sharedStrings.xml", ss),
            ("xl/worksheets/sheet1.xml", sheet),
            ("docProps/core.xml", _core_xml(title)),
        ]
    )


def build_pptx(slides: list[str], title: str = "Fixture") -> bytes:
    """Spec-literal .pptx with the slide-ORDER trap: slide files are
    named in REVERSED presentation order (presentation position i
    lives in slide{n-i}.xml) and stored in name order — only the
    sldIdLst → rels walk reads the deck correctly; a name-sort or
    zip-order walk reverses the text."""
    p_ns = "http://schemas.openxmlformats.org/presentationml/2006/main"
    a_ns = "http://schemas.openxmlformats.org/drawingml/2006/main"
    n = len(slides)
    members = [("[Content_Types].xml", _CT_DOCX)]
    members.append(
        (
            "_rels/.rels",
            _rels_xml(
                [
                    ("rId1", f"{_R_NS}/officeDocument",
                     "ppt/presentation.xml"),
                    ("rId2", f"{_R_NS}/metadata/core-properties",
                     "docProps/core.xml"),
                ]
            ),
        )
    )
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 2}"/>' for i in range(n)
    )
    pres = (
        f'<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<p:presentation xmlns:p="{p_ns}" xmlns:r="{_R_NS}">'
        f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>\n"
    ).encode()
    members.append(("ppt/presentation.xml", pres))
    rels = [
        (f"rId{i + 2}", f"{_R_NS}/slide", f"slides/slide{n - i}.xml")
        for i in range(n)
    ]
    members.append(("ppt/_rels/presentation.xml.rels", _rels_xml(rels)))
    slide_parts = []
    for i, text in enumerate(slides):
        paras = "".join(
            "<a:p>"
            + "".join(
                f'<a:r><a:t>{_esc(r)}</a:t></a:r>'
                for r in _split_runs(para, 2)
            )
            + "</a:p>"
            for para in text.split("\n")
        )
        xml = (
            f'<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<p:sld xmlns:p="{p_ns}" xmlns:a="{a_ns}"><p:cSld>'
            f"<p:spTree><p:sp><p:txBody>{paras}</p:txBody></p:sp>"
            f"</p:spTree></p:cSld></p:sld>\n"
        ).encode()
        slide_parts.append((f"ppt/slides/slide{n - i}.xml", xml))
    members.extend(sorted(slide_parts))  # zip in NAME order — the trap
    members.append(("docProps/core.xml", _core_xml(title)))
    return build_zip(members)


def build_odt(paragraphs: list[str], title: str = "Fixture") -> bytes:
    """Spec-literal .odt with the whitespace-encoding trap: in every
    paragraph the LAST inter-word space is emitted as <text:s/> and
    every 4th paragraph wraps its tail in a text:span — an itertext
    walk that ignores text:s drops the space and fails the oracle."""
    t_ns = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    o_ns = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    paras = []
    for i, p in enumerate(paragraphs):
        cut = p.rfind(" ")
        if cut == -1:
            paras.append(f"<text:p>{_esc(p)}</text:p>")
            continue
        head, tail = p[:cut], p[cut + 1 :]
        if i % 4 == 3:
            tail = f"<text:span>{_esc(tail)}</text:span>"
        else:
            tail = _esc(tail)
        paras.append(f"<text:p>{_esc(head)}<text:s/>{tail}</text:p>")
    content = (
        f'<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<office:document-content xmlns:office="{o_ns}" '
        f'xmlns:text="{t_ns}"><office:body><office:text>'
        f'{"".join(paras)}</office:text></office:body>'
        f"</office:document-content>\n"
    ).encode()
    meta = (
        f'<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<office:document-meta xmlns:office="{o_ns}" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/"><office:meta>'
        f"<dc:title>{_esc(title)}</dc:title></office:meta>"
        f"</office:document-meta>\n"
    ).encode()
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<manifest:manifest xmlns:manifest="urn:oasis:names:tc:'
        'opendocument:xmlns:manifest:1.0"/>\n'
    ).encode()
    return build_zip(
        [
            ("mimetype", _ODT_MIME),
            ("META-INF/manifest.xml", manifest),
            ("content.xml", content),
            ("meta.xml", meta),
        ]
    )
