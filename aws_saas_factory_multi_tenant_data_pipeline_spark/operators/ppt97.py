"""Legacy .ppt (PowerPoint 97) text extraction — the presentation
third of the pre-2007 office slice: the CFB container carries a
``PowerPoint Document`` stream of nested binary records.

Implemented from the PUBLIC [MS-PPT] specification: the 8-byte record
header (recVer/recInstance packed in the first word — recVer 0xF
marks a CONTAINER whose payload is nested records — then recType and
a 4-byte recLen), walked recursively; the text-bearing atoms are
TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8, 8-bit
cp1252 — the high bytes omitted), each preceded in real decks by a
TextHeaderAtom (0x0F9F) naming the placeholder type; CString atoms
(0x0FBA) carry UI strings and are EXCLUDED from body text. The
UserEditAtom/PersistDirectory indirection real fast-saved decks use
for slide ORDER is a named boundary — extraction returns text atoms
in document-stream order, which equals presentation order for
non-fast-saved decks (the fixture writes both shapes and the torn
one raises).

No host .ppt artifact or reader exists (tripwire shared with the CFB
row in tests/test_realworld_r15.py); the fixture writer nests text
atoms inside multi-level containers with decoy CStrings and both
atom encodings.

Reference parity: the reference lake's schema-on-read ingest
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44). Tear
contract: ValueError — and only ValueError."""

from __future__ import annotations

import struct

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
    build_cfb,
    parse_cfb,
)

_TEXT_CHARS = 0x0FA0
_TEXT_BYTES = 0x0FA8
_TEXT_HEADER = 0x0F9F
_CSTRING = 0x0FBA

_DOC_STREAM = "PowerPoint Document"


def _walk(data: bytes, start: int, end: int, out: list, depth: int):
    if depth > 32:
        raise ValueError("ppt: absurd record nesting")
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError("ppt: torn record header")
        verinst, rtype, rlen = struct.unpack_from("<HHI", data, i)
        body_start = i + 8
        body_end = body_start + rlen
        if body_end > end:
            raise ValueError("ppt: record overruns container")
        rec_ver = verinst & 0x000F
        if rec_ver == 0xF:  # container
            _walk(data, body_start, body_end, out, depth + 1)
        elif rtype == _TEXT_CHARS:
            if rlen % 2:
                raise ValueError("ppt: odd TextCharsAtom length")
            out.append(data[body_start:body_end].decode("utf-16-le"))
        elif rtype == _TEXT_BYTES:
            out.append(
                data[body_start:body_end].decode("cp1252",
                                                 errors="replace"))
        # CString (0x0FBA) and every other atom: not body text
        i = body_end


def parse_ppt(data: bytes) -> dict:
    """Extract text from a legacy .ppt: {texts, text} where texts are
    the TextChars/TextBytes atoms in stream order."""
    cfb = parse_cfb(data)
    doc = cfb["streams"].get(_DOC_STREAM)
    if doc is None:
        raise ValueError("ppt: no PowerPoint Document stream")
    out: list[str] = []
    try:
        _walk(doc, 0, len(doc), out, 0)
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise ValueError("ppt: torn document (%s)" % e) from e
    texts = [t.replace("\r", "\n") for t in out]
    return {"texts": texts, "text": "\n".join(texts)}


# --- fixture writer --------------------------------------------------------


def _rec(rtype: int, body: bytes, ver: int = 0,
         instance: int = 0) -> bytes:
    return struct.pack("<HHI", (instance << 4) | ver, rtype,
                       len(body)) + body


def _container(rtype: int, *children: bytes) -> bytes:
    body = b"".join(children)
    return struct.pack("<HHI", 0x000F, rtype, len(body)) + body


def build_ppt(slides: list[str], title: str = "") -> bytes:
    """Trap-laden .ppt fixture: each slide's text alternates between
    a TextBytesAtom (when cp1252 suffices) and a TextCharsAtom,
    nested 3 containers deep next to decoy CString atoms that must
    NOT appear in body text."""
    slide_recs = []
    for k, text in enumerate(slides):
        as_bytes = k % 2 == 0 and all(ord(c) < 0x100 for c in text)
        if as_bytes:
            atom = _rec(_TEXT_BYTES, text.replace("\n", "\r").encode(
                "cp1252"))
        else:
            atom = _rec(_TEXT_CHARS, text.replace("\n", "\r").encode(
                "utf-16-le"))
        header = _rec(_TEXT_HEADER, struct.pack("<I", k % 5))
        decoy = _rec(_CSTRING, f"decoy-ui-{k}".encode("utf-16-le"),
                     instance=k % 3)
        # Slide container (0x03EE) > PPDrawing-ish (0x040C) > text
        slide_recs.append(_container(
            0x03EE,
            decoy,
            _container(0x040C, _container(0x0F00, header, atom)),
        ))
    doc = _container(0x03E8, *slide_recs)  # DocumentContainer
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
        build_summary_information,
    )

    return build_cfb({
        _DOC_STREAM: doc,
        "Current User": b"\x00" * 24,
        "\x05SummaryInformation": build_summary_information(title),
    })
