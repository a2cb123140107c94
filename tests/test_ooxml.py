"""Office text extraction (r15): the four container walks with their
fixture traps (sharedStrings indirection, pptx slide-order
permutation, docx xml:space runs, odt text:s whitespace encoding),
hostile-XML quarantine, the Spark exploder contract, and the archive
route. The REAL LibreOffice-written ODT pin lives in
tests/test_realworld_r15.py."""

from __future__ import annotations

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
    build_zip,
    iter_archive_members,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ooxml import (
    build_docx,
    build_odt,
    build_pptx,
    build_xlsx,
    extract_office_text,
    office_members_to_text,
    office_to_text,
    parse_docx,
    parse_odt,
    parse_pptx,
    parse_xlsx,
    sniff_office_format,
)

PARAS = [
    "the quick brown fox jumps",
    "over & under <the> lazy dog",
    "tabs\tand spaces survive",
    "a fourth paragraph closes the fixture",
]


def test_sniff_routes_all_four():
    assert sniff_office_format(build_docx(PARAS)) == "docx"
    assert sniff_office_format(build_xlsx([["a"]])) == "xlsx"
    assert sniff_office_format(build_pptx(["s"])) == "pptx"
    assert sniff_office_format(build_odt(PARAS)) == "odt"
    assert sniff_office_format(build_zip([("x.txt", b"y")])) is None
    assert sniff_office_format(b"not a zip") is None


def test_docx_runs_and_entities_and_title():
    pay = build_docx(PARAS, title="T & <X>")
    d = parse_docx(pay)
    assert d["paragraphs"] == PARAS
    assert d["title"] == "T & <X>"
    # the builder splits at raw character positions: at least one run
    # must start or end with a space (the xml:space trap is live)
    assert b'xml:space="preserve"' in dict(
        iter_archive_members(pay)
    )["word/document.xml"]


def test_docx_tab_and_break_elements():
    # hand-built paragraph with w:tab and w:br elements (not chars)
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{w}"><w:body><w:p>'
        "<w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r>"
        "</w:p></w:body></w:document>"
    ).encode()
    base = dict(iter_archive_members(build_docx(["x"])))
    base["word/document.xml"] = doc
    d = parse_docx(build_zip(list(base.items())))
    assert d["paragraphs"] == ["a\tb\nc"]


def test_docx_tab_stop_definitions_are_not_text():
    # w:tab inside w:tabs (pPr) must not emit a tab character
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (
        f'<w:document xmlns:w="{w}"><w:body><w:p>'
        '<w:pPr><w:tabs><w:tab w:val="left" w:pos="720"/></w:tabs>'
        "</w:pPr><w:r><w:t>plain</w:t></w:r></w:p></w:body>"
        "</w:document>"
    ).encode()
    base = dict(iter_archive_members(build_docx(["x"])))
    base["word/document.xml"] = doc
    assert parse_docx(build_zip(list(base.items())))["paragraphs"] == [
        "plain"
    ]


def test_xlsx_shared_string_indirection_trap():
    pay = build_xlsx([[p] for p in PARAS], title="Sheet fixture")
    d = parse_xlsx(pay)
    assert [r for s in d["sheets"] for row in s["rows"] for r in row] \
        == PARAS
    # the trap is live: the string table is NOT in first-use order
    ss = dict(iter_archive_members(pay))["xl/sharedStrings.xml"]
    first_si = ss.index(b"<si>")
    assert PARAS[-1].split(" ")[0].encode() in ss[first_si:first_si + 120]


def test_xlsx_rich_text_and_inline_and_formula_strings():
    import re

    pay = build_xlsx([["alpha"], ["beta"], ["gamma delta epsilon"]])
    ss = dict(iter_archive_members(pay))["xl/sharedStrings.xml"]
    assert re.search(rb"<si><r>", ss)  # rich-text split present
    # hand-add inline + formula-string cells
    sheet = dict(iter_archive_members(pay))
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet["xl/worksheets/sheet1.xml"] = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>inline text</t></is>'
        '</c><c r="B1" t="str"><v>formula result</v></c>'
        '<c r="C1"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    d = parse_xlsx(build_zip(list(sheet.items())))
    assert d["sheets"][0]["rows"] == [["inline text", "formula result"]]


def test_xlsx_numeric_cells_not_text():
    d = office_to_text(build_xlsx([["only text"]]))
    assert d["text"] == "only text"  # the numeric B cell never leaks


def test_xlsx_out_of_range_shared_index_tears():
    pay = build_xlsx([["a"]])
    m = dict(iter_archive_members(pay))
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    m["xl/worksheets/sheet1.xml"] = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>99</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    with pytest.raises(ValueError, match="shared-string index"):
        parse_xlsx(build_zip(list(m.items())))


def test_pptx_slide_order_is_presentation_order_not_name_order():
    slides = [f"slide body {i}" for i in range(12)]
    pay = build_pptx(slides, title="Deck")
    d = parse_pptx(pay)
    assert [s["text"] for s in d["slides"]] == slides
    # trap live: presentation position 0 is stored in slide12.xml
    assert d["slides"][0]["part"] == "ppt/slides/slide12.xml"
    # and a zip-order walk would reverse: member order is name-sorted
    names = [n for n, _ in iter_archive_members(pay)
             if n.startswith("ppt/slides/")]
    assert names == sorted(names)


def test_odt_whitespace_encoding_expands():
    pay = build_odt(PARAS, title="Odt fixture")
    d = parse_odt(pay)
    assert d["paragraphs"] == PARAS
    assert d["title"] == "Odt fixture"
    # trap live: at least one text:s element in content.xml
    assert b"<text:s/>" in dict(iter_archive_members(pay))["content.xml"]


def test_odt_tab_linebreak_and_counted_spaces():
    t_ns = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    o_ns = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    content = (
        f'<office:document-content xmlns:office="{o_ns}" '
        f'xmlns:text="{t_ns}"><office:body><office:text>'
        '<text:p>a<text:s text:c="3"/>b<text:tab/>c<text:line-break/>d'
        "</text:p></office:text></office:body></office:document-content>"
    ).encode()
    m = dict(iter_archive_members(build_odt(["x"])))
    m["content.xml"] = content
    d = parse_odt(build_zip([(n, m[n]) for n in
                             ("mimetype", "META-INF/manifest.xml",
                              "content.xml", "meta.xml")]))
    assert d["paragraphs"] == ["a   b\tc\nd"]


def test_hostile_xml_quarantined():
    m = dict(iter_archive_members(build_docx(["x"])))
    m["word/document.xml"] = (
        b"<!DOCTYPE lol [<!ENTITY a 'aaaa'>]>" + m["word/document.xml"]
    )
    with pytest.raises(ValueError, match="DTD/entity"):
        office_to_text(build_zip(list(m.items())))


def test_office_to_text_non_office_zip_tears():
    with pytest.raises(ValueError, match="not an office container"):
        office_to_text(build_zip([("readme.txt", b"hi")]))


def test_extract_office_text_spark_with_quarantine(spark):
    good = [
        (0, build_docx(PARAS, title="D")),
        (1, build_xlsx([[p] for p in PARAS], title="X")),
        (2, build_pptx(PARAS, title="P")),
        (3, build_odt(PARAS, title="O")),
        (4, b"PK\x03\x04 torn zip"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in good],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in extract_office_text(df).collect()}
    expected = "\n".join(PARAS)
    for i, fmt in ((0, "docx"), (1, "xlsx"), (2, "pptx"), (3, "odt")):
        assert rows[i].format == fmt
        assert rows[i].text == expected
        assert rows[i].parse_error is None
    assert rows[4].parse_error is not None and rows[4].format is None


def test_office_members_to_text_archive_route(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        explode_archives,
    )

    bundle = build_zip(
        [
            ("reports/q1.docx", build_docx(["quarterly text"])),
            ("data/t.odt", build_odt(["odt body"])),
            ("ignore/readme.txt", b"not office"),
        ]
    )
    archives = spark.createDataFrame(
        [(7, bytearray(bundle))], "archive_id long, payload binary"
    )
    out = office_members_to_text(explode_archives(archives)).collect()
    texts = sorted(r.text for r in out if r.parse_error is None)
    assert texts == ["odt body", "quarterly text"]
