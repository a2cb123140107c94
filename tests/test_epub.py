"""EPUB ingestion (operators/epub.py): OCF/OPF walk, spine-vs-storage
ordering, metadata, tear contract, Spark exploder.

No real third-party EPUB exists on this host (checked once with a
full recursive sweep of /usr, /opt, /root/.pyenv: zero *.epub) — the
documented-gap skip at the bottom keeps that visible (probing the
plausible doc directories cheaply), the r10 convention.
"""

from __future__ import annotations

import glob

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.epub import (
    build_epub,
    explode_epub_chapters,
    parse_epub,
)


def _chapters(n=3):
    return [
        (
            f"text/ch{i}.xhtml",
            f'<?xml version="1.0"?><html><head><title>c{i}</title></head>'
            f"<body><h1>chapter {i}</h1><p>alpha &amp; beta {i}</p></body></html>",
        )
        for i in range(n)
    ]


def test_spine_order_governs_not_zip_order():
    blob = build_epub(_chapters(), spine_order=[2, 0, 1])
    book = parse_epub(blob)
    assert [c["href"] for c in book["chapters"]] == [
        "text/ch2.xhtml",
        "text/ch0.xhtml",
        "text/ch1.xhtml",
    ]
    assert [c["order"] for c in book["chapters"]] == [0, 1, 2]


def test_metadata_extracted():
    blob = build_epub(_chapters(1), title="A & B", language="de",
                      identifier="urn:isbn:123")
    book = parse_epub(blob)
    assert book["title"] == "A &amp; B".replace("&amp;", "&") or book["title"] == "A & B"
    assert book["language"] == "de"
    assert book["identifier"] == "urn:isbn:123"
    assert book["opf_path"] == "OEBPS/content.opf"


def test_non_xhtml_manifest_items_are_not_chapters():
    import io
    import zipfile

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        build_zip,
    )

    blob = build_epub(_chapters(2))
    zin = zipfile.ZipFile(io.BytesIO(blob))
    members = []
    for i in zin.infolist():
        data = zin.read(i)
        if i.filename.endswith(".opf"):
            # a css manifest item referenced from the spine: not a chapter
            data = data.replace(
                b"<manifest>",
                b'<manifest>\n<item id="css" href="s.css" media-type="text/css"/>',
            ).replace(b"<spine>", b'<spine>\n<itemref idref="css"/>')
        members.append((i.filename, data))
    members.append(("OEBPS/s.css", b"p { color: red }"))
    book = parse_epub(build_zip(members, stored=True))
    assert [c["idref"] for c in book["chapters"]] == ["c0", "c1"]


def test_linear_no_itemrefs_skipped():
    blob = build_epub(_chapters(3), spine_order=[0, 1, 2])
    # rebuild with linear="no" on the middle itemref via the builder's
    # output: patch the OPF member through a parse/rebuild cycle
    import io
    import zipfile

    zin = zipfile.ZipFile(io.BytesIO(blob))
    members = [(i.filename, zin.read(i)) for i in zin.infolist()]
    members = [
        (n, d.replace(b'<itemref idref="c1"/>', b'<itemref idref="c1" linear="no"/>'))
        if n.endswith(".opf")
        else (n, d)
        for n, d in members
    ]
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        build_zip,
    )

    book = parse_epub(build_zip(members, stored=True))
    assert [c["idref"] for c in book["chapters"]] == ["c0", "c2"]
    assert [c["order"] for c in book["chapters"]] == [0, 1]


def test_tear_contract():
    blob = build_epub(_chapters())
    with pytest.raises(ValueError):
        parse_epub(blob[:-30])
    with pytest.raises(ValueError, match="mimetype"):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
            build_zip,
        )

        parse_epub(build_zip([("mimetype", b"application/zip")], stored=True))
    with pytest.raises(ValueError, match="container.xml"):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
            build_zip,
        )

        parse_epub(
            build_zip([("mimetype", b"application/epub+zip")], stored=True)
        )


def test_spine_idref_must_resolve():
    import io
    import zipfile

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        build_zip,
    )

    blob = build_epub(_chapters(2))
    zin = zipfile.ZipFile(io.BytesIO(blob))
    members = [
        (
            i.filename,
            zin.read(i).replace(b'idref="c1"', b'idref="ghost"')
            if i.filename.endswith(".opf")
            else zin.read(i),
        )
        for i in zin.infolist()
    ]
    with pytest.raises(ValueError, match="ghost"):
        parse_epub(build_zip(members, stored=True))


def test_spark_exploder_and_quarantine(spark):
    rows = [
        (1, build_epub(_chapters(2), spine_order=[1, 0], title="B1")),
        (2, b"not a zip at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = explode_epub_chapters(df).orderBy("doc_id", "order").collect()
    good = [r for r in out if r.parse_error is None]
    bad = [r for r in out if r.parse_error is not None]
    assert [(r.doc_id, r.order, r.href) for r in good] == [
        (1, 0, "text/ch1.xhtml"),
        (1, 1, "text/ch0.xhtml"),
    ]
    assert good[0].title == "B1"
    assert len(bad) == 1 and bad[0].doc_id == 2


def test_real_epub_host_gap_documented():
    """No real third-party .epub ships with this container — keep the
    gap VISIBLE (the r10 TGA/QOI convention) and self-healing: if one
    ever appears on the host, this test starts exercising it."""
    hits = [
        p
        for root in (
            "/usr/share/doc/*",
            "/usr/share/doc/*/*",
            "/usr/share/*",
            "/opt/*",
        )
        for p in glob.glob(f"{root}/*.epub")
    ]
    if not hits:
        pytest.skip("no real host .epub available (documented gap)")
    book = parse_epub(open(hits[0], "rb").read())
    assert book["chapters"]
