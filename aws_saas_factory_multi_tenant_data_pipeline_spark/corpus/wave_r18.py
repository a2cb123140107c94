"""Round-15 operator wave (r14 verdict "Next round" #1/#4/#7): the
office-document slice (docx/xlsx/pptx/odt through operators/ooxml.py
with its fixture traps), the .7z container walk (operators/
sevenzip.py, libarchive-pinned), and the web-font asset census
(operators/fonts.py, real-DejaVu-pinned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "text_office_extract",
    oracle="""
        SELECT doc_id,
               CASE doc_id % 7 WHEN 0 THEN 'docx' WHEN 1 THEN 'xlsx'
                    WHEN 2 THEN 'pptx' WHEN 3 THEN 'odt'
                    WHEN 4 THEN 'doc' WHEN 5 THEN 'xls'
                    ELSE 'ppt' END AS format,
               CAST((len(string_split(text, ' ')) + 7) // 8 AS INT)
                 AS n_blocks,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               TRUE AS text_ok,
               TRUE AS title_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "text", "documents", "office"),
    doc="Office document text extraction END-TO-END, ALL SEVEN "
    "formats through the one sniffing front door (the [r15] "
    "docx/xlsx/pptx/odt walk, operators/ooxml.py, WIDENED late-r15 "
    "with the legacy trio doc/xls/ppt over the [MS-CFB] walk — "
    "sharedStrings indirection through workbook rels, pptx slide "
    "order from sldIdLst with file names stored in REVERSED "
    "presentation order, docx xml:space runs split at raw character "
    "positions, odt <text:s/> whitespace expansion, .doc FAST-SAVE "
    "piece tables with per-piece 8/16-bit switching past a decoy "
    "0Table, .xls SST split mid-string by CONTINUE with the encoding "
    "restated at the boundary, .ppt text atoms in nested containers; "
    "real-LibreOffice ODT pin in tests/test_realworld_r15.py): per "
    "doc the text packs into 8-word paragraphs, builds the carrier "
    "its doc_id%7 selects WITH the traps live, extracts through "
    "office_to_text, and the hash grades block structure, byte-exact "
    "text equality, and the dc:title/OLEPS-title roundtrip "
    "(operators/ooxml.py, operators/cfb.py, operators/biff.py, "
    "operators/ppt97.py).",
)
def text_office_extract(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.biff import (
            build_xls,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
            build_doc,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ooxml import (
            build_docx,
            build_odt,
            build_pptx,
            build_xlsx,
            office_to_text,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ppt97 import (
            build_ppt,
        )

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                text = str(text)
                words = text.split(" ")
                paras = [
                    " ".join(words[i : i + 8])
                    for i in range(0, len(words), 8)
                ]
                title = f"Doc {did} & <{did % 7}>"
                mode = did % 7
                if mode == 0:
                    pay = build_docx(paras, title=title)
                    fmt = "docx"
                elif mode == 1:
                    pay = build_xlsx([[p] for p in paras], title=title)
                    fmt = "xlsx"
                elif mode == 2:
                    pay = build_pptx(paras, title=title)
                    fmt = "pptx"
                elif mode == 3:
                    pay = build_odt(paras, title=title)
                    fmt = "odt"
                elif mode == 4:
                    pay = build_doc(paras, title=title,
                                    fast_save=did % 2 == 0)
                    fmt = "doc"
                elif mode == 5:
                    pay = build_xls([("S1", [[p] for p in paras])],
                                    title=title)
                    fmt = "xls"
                else:
                    pay = build_ppt(paras, title=title)
                    fmt = "ppt"
                got = office_to_text(pay)
                rows.append({
                    "doc_id": did,
                    "format": fmt,
                    "n_blocks": len(paras),
                    "n_chars": len(text),
                    "text_ok": got["text"] == "\n".join(paras)
                    and got["format"] == fmt
                    and got["n_blocks"] == len(paras),
                    "title_ok": got["title"] == title,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "n_blocks", "n_chars",
                         "text_ok", "title_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, format string, n_blocks int, n_chars long,"
        " text_ok boolean, title_ok boolean",
    ).orderBy("doc_id")


@register(
    "archive_7z_extract",
    oracle="""
        SELECT doc_id,
               CASE doc_id % 5 WHEN 0 THEN 'copy' WHEN 1 THEN 'lzma2'
                    WHEN 2 THEN 'lzma' WHEN 3 THEN 'delta+lzma2'
                    ELSE 'bcj+lzma2' END AS codec,
               CAST(3 AS INT) AS n_members,
               'doc.txt,meta.bin,empty.txt' AS names,
               CAST(strlen(text) + 8 AS BIGINT) AS total_bytes,
               TRUE AS roundtrip_ok
        FROM documents WHERE doc_id < 150
        ORDER BY doc_id
    """,
    tags=("B10", "archive"),
    doc=".7z archive ingestion END-TO-END (the [r15] container walk, "
    "operators/sevenzip.py — signature header + REAL_UINT64 numbers + "
    "property tree + bind-pair coder chains + per-substream CRC32, "
    "every fixture shape cross-validated byte-for-byte against the "
    "host libarchive AND the real p7zip artifact parsing in "
    "tests/test_realworld_r15.py): per doc a 3-member archive (text + "
    "8-byte id record + an empty file through the empty-stream/"
    "empty-file bit vectors) builds with the coder its doc_id%5 "
    "selects — Copy / LZMA2 / LZMA / Delta+LZMA2 / BCJ+LZMA2, the "
    "filter chains exercising bind pairs — routes through "
    "sniff_archive_format + iter_archive_members, and the member "
    "census/byte totals/byte-identity land in the hash "
    "(operators/sevenzip.py, operators/archives.py, operators/xz.py).",
)
def archive_7z_extract(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 150).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
            iter_archive_members,
            sniff_archive_format,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sevenzip import (
            build_7z,
        )

        codecs = ["copy", "lzma2", "lzma", "delta+lzma2", "bcj+lzma2"]
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = str(text).encode("utf-8")
                members = [
                    ("doc.txt", body),
                    ("meta.bin", did.to_bytes(8, "big")),
                    ("empty.txt", b""),
                ]
                codec = codecs[did % 5]
                pay = build_7z(members, codec=codec)
                if sniff_archive_format(pay) != "7z":
                    raise ValueError("7z failed the archive sniff")
                got = list(iter_archive_members(pay))
                ok = got == [
                    ("doc.txt", body),
                    ("meta.bin", did.to_bytes(8, "big")),
                    ("empty.txt", b""),
                ]
                rows.append({
                    "doc_id": did,
                    "codec": codec,
                    "n_members": len(got),
                    "names": ",".join(n for n, _ in got),
                    "total_bytes": sum(len(b) for _, b in got),
                    "roundtrip_ok": ok,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "codec", "n_members", "names",
                         "total_bytes", "roundtrip_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, codec string, n_members int, names string,"
        " total_bytes long, roundtrip_ok boolean",
    ).orderBy("doc_id")


@register(
    "crawl_font_census",
    oracle="""
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'woff' WHEN 1 THEN 'woff2'
                    ELSE 'ttf' END AS format,
               CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 3
                    ELSE CAST(2 + doc_id % 4 AS INT) END AS num_tables,
               CAST(doc_id % 3 = 0 AS BOOLEAN) AS has_metadata,
               CASE WHEN doc_id % 3 = 0
                    THEN 'Vendor' || CAST(doc_id % 6 AS VARCHAR)
                    ELSE NULL END AS meta_vendor,
               CASE WHEN doc_id % 3 = 1
                    THEN CAST(strlen(text) AS BIGINT)
                    ELSE NULL END AS woff2_stream_bytes
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "crawl", "multimodal", "fonts"),
    doc="Web-font asset census (the [r15] WOFF/WOFF2/sfnt probe, "
    "operators/fonts.py — crawls are full of font assets that would "
    "otherwise land as unknown binaries; REAL DejaVu TTFs pinned in "
    "tests/test_fonts.py): per doc the format rotates by doc_id%3 — "
    "a WOFF (zlib-XML extended metadata, vendor extracted), a WOFF2 "
    "whose SINGLE Brotli font-data stream carries the doc text and is "
    "length-verified through the from-spec RFC 7932 decoder, or a "
    "TTF whose table count varies — and the probe facts land in the "
    "hash (operators/fonts.py, operators/brotli.py).",
)
def crawl_font_census(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.fonts import (
            _sfnt_fixture,
            build_woff,
            build_woff2,
            probe_font,
            verify_woff2_stream,
        )

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = str(text).encode("utf-8")
                mode = did % 3
                stream_bytes = None
                if mode == 0:
                    pay = build_woff(vendor=f"Vendor{did % 6}")
                elif mode == 1:
                    pay = build_woff2(
                        sfnt_size=len(body), font_data=body
                    )
                    stream_bytes = verify_woff2_stream(pay)
                else:
                    tags = [b"cmap", b"glyf", b"head", b"name",
                            b"OS/2", b"post"][: 2 + did % 4]
                    pay = _sfnt_fixture(tags)
                info = probe_font(pay)
                rows.append({
                    "doc_id": did,
                    "format": info["format"],
                    "num_tables": info["num_tables"],
                    "has_metadata": info["has_metadata"],
                    "meta_vendor": info["meta_vendor"],
                    "woff2_stream_bytes": stream_bytes,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "format", "num_tables",
                         "has_metadata", "meta_vendor",
                         "woff2_stream_bytes"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, format string, num_tables int, has_metadata"
        " boolean, meta_vendor string, woff2_stream_bytes long",
    ).orderBy("doc_id")
