"""Round-15 second operator wave: structured-dump and mail-corpus
ingest — the SQLite database-file reader (operators/sqlite_file.py,
pinned row-for-row against the host SQLite engine) and the
RFC 5322 / MIME mail ingest (operators/mail.py, pinned against
CPython's own email package)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "ingest_sqlite_dump",
    oracle="""
        SELECT doc_id,
               CAST(CASE doc_id % 3 WHEN 0 THEN 512 WHEN 1 THEN 1024
                    ELSE 4096 END AS INT) AS page_size,
               CAST(2 AS INT) AS n_tables,
               CAST(len(string_split(text, ' ')) AS INT) AS n_rows,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               TRUE AS read_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "ingest", "documents", "sqlite"),
    doc="SQLite database-file ingestion END-TO-END (the [r15] from-spec "
    "b-tree/record reader, operators/sqlite_file.py — page-size "
    "rotation 512/1024/4096 exercising multi-level interiors and "
    "overflow chains at 512, an INTEGER PRIMARY KEY rowid-alias table "
    "plus a WITHOUT ROWID key-order table per database): per doc the "
    "HOST SQLite engine itself builds and serializes the database in "
    "the executor (one table row per word + the full doc text as an "
    "overflow-length row), our reader walks the file bytes, and "
    "read_ok lands in the hash only when the decoded rows equal the "
    "engine's own SELECT output AND the header facts match the "
    "rotation (operators/sqlite_file.py).",
)
def ingest_sqlite_dump(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        import sqlite3

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sqlite_file import (
            parse_sqlite_header,
            sqlite_dump,
        )

        sizes = [512, 1024, 4096]
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                text = str(text)
                words = text.split(" ")
                ps = sizes[did % 3]
                conn = sqlite3.connect(":memory:")
                conn.execute(f"pragma page_size={ps}")
                conn.execute(
                    "create table docs(i integer primary key, w text)"
                )
                conn.executemany(
                    "insert into docs values (?,?)",
                    list(enumerate(words)),
                )
                # full doc text as one row: overflow chains at ps=512
                conn.execute(
                    "create table kv(k text primary key, v text)"
                    " without rowid"
                )
                conn.execute("insert into kv values ('text', ?)",
                             (text,))
                conn.execute("insert into kv values ('id', ?)",
                             (str(did),))
                conn.commit()
                data = conn.serialize()
                hdr = parse_sqlite_header(data)
                dump = sqlite_dump(data)
                engine_docs = [list(r) for r in conn.execute(
                    "select * from docs order by rowid")]
                engine_kv = [list(r) for r in conn.execute(
                    "select * from kv order by k")]
                ok = (
                    hdr["page_size"] == ps
                    and not hdr["wal"]
                    and set(dump) == {"docs", "kv"}
                    and dump["docs"] == engine_docs
                    and dump["kv"] == engine_kv
                    and [w for _, w in dump["docs"]] == words
                    and dict(dump["kv"])["text"] == text
                )
                rows.append({
                    "doc_id": did,
                    "page_size": ps,
                    "n_tables": len(dump),
                    "n_rows": len(dump["docs"]),
                    "n_chars": len(text),
                    "read_ok": ok,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "page_size", "n_tables", "n_rows",
                         "n_chars", "read_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, page_size int, n_tables int, n_rows int,"
        " n_chars long, read_ok boolean",
    ).orderBy("doc_id")


@register(
    "ingest_mbox_mail",
    oracle="""
        SELECT doc_id,
               CAST(3 AS INT) AS n_messages,
               CAST(5 AS INT) AS n_parts,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               TRUE AS parity_ok,
               TRUE AS subject_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "ingest", "documents", "mail"),
    doc="Mail-corpus ingestion END-TO-END (the [r15] RFC 5322/2045/"
    "2046/2047 + mbox walk, operators/mail.py — QP/base64 transfer "
    "decoding with binascii.a2b_qp-exact lenient semantics, "
    "encoded-word subjects with the adjacency rule, multipart/"
    "alternative recursion, attachment disposition): per doc CPython's "
    "own email generator builds a 3-message mbox in the executor "
    "(plain QP body carrying the doc text, a multipart/alternative "
    "pair, an attachment message; mboxrd stuffing applied so doc "
    "lines starting 'From ' can't tear the split), our parser walks "
    "it, and parity_ok lands in the hash only when every leaf part "
    "(content type, decoded payload, filename) and every decoded "
    "subject equals CPython's email.parser over the same bytes "
    "(operators/mail.py).",
)
def ingest_mbox_mail(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        import re as _re
        from email import policy
        from email.message import EmailMessage
        from email.parser import BytesParser

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mail import (
            parse_message,
            split_mbox,
        )

        def _stuff(raw: bytes) -> bytes:
            return _re.sub(rb"(?m)^(>*From )", rb">\1", raw)

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                text = str(text)
                words = text.split(" ")
                half = max(1, len(words) // 2)
                subjects = [
                    f"Ärende {did} — €uro",
                    f"Re: pärt twö {did}",
                    f"attachment {did}",
                ]
                m0 = EmailMessage()
                m0["Subject"] = subjects[0]
                m0.set_content(" ".join(words[:half]),
                               cte="quoted-printable")
                m1 = EmailMessage()
                m1["Subject"] = subjects[1]
                m1.set_content(" ".join(words[half:]))
                m1.add_alternative(
                    "<p>" + " ".join(words[half:][:5]) + "</p>",
                    subtype="html")
                m2 = EmailMessage()
                m2["Subject"] = subjects[2]
                m2.set_content("see attachment")
                m2.add_attachment(
                    did.to_bytes(8, "big") * 4,
                    maintype="application", subtype="octet-stream",
                    filename=f"doc{did}.bin")
                mbox = b"".join(
                    b"From corpus@example Thu Jan  1 00:00:00 1970\n"
                    + _stuff(m.as_bytes(policy=policy.SMTP)) + b"\n"
                    for m in (m0, m1, m2)
                )
                msgs = split_mbox(mbox, unstuff=True)
                parity = len(msgs) == 3
                n_parts = 0
                for raw, want_subj in zip(msgs, subjects):
                    ours = parse_message(raw)
                    std = BytesParser(
                        policy=policy.default).parsebytes(raw)
                    leaves = [p for p in std.walk()
                              if not p.is_multipart()]
                    n_parts += len(ours["parts"])
                    if len(ours["parts"]) != len(leaves):
                        parity = False
                        continue
                    for op_, sp in zip(ours["parts"], leaves):
                        content = sp.get_content()
                        same = (
                            op_["content_type"]
                            == sp.get_content_type()
                            and op_["filename"] == sp.get_filename()
                            and (op_["text"] == content
                                 if isinstance(content, str)
                                 else op_["payload"] == content)
                        )
                        parity = parity and same
                    parity = parity and ours["subject"] == want_subj \
                        and ours["subject"] == std["subject"]
                rows.append({
                    "doc_id": did,
                    "n_messages": len(msgs),
                    "n_parts": n_parts,
                    "n_chars": len(text),
                    "parity_ok": parity,
                    "subject_ok": parity,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_messages", "n_parts", "n_chars",
                         "parity_ok", "subject_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, n_messages int, n_parts int, n_chars long,"
        " parity_ok boolean, subject_ok boolean",
    ).orderBy("doc_id")


@register(
    "text_rtf_extract",
    oracle="""
        SELECT doc_id,
               CAST((len(string_split(text, ' ')) + 7) // 8 AS INT)
                 AS n_pars,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               'cp1252' AS codepage,
               TRUE AS text_ok,
               TRUE AS title_excluded
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "text", "documents", "rtf"),
    doc="RTF text extraction END-TO-END (the [r15] control-word "
    "interpreter, operators/rtf.py — \\ucN fallback-skip protocol "
    "live on every other non-ASCII char, codepage \\'xx escapes on "
    "the rest, skipped destinations containing \\par, a \\bin blob "
    "of brace/backslash bytes mid-document, the info-group title "
    "that must NOT leak; no host RTF reader exists — the tripwire "
    "lives in tests/test_realworld_r15.py): per doc the text packs "
    "into 8-word paragraphs, builds the trap fixture, extracts, and "
    "byte-exact text equality + the title exclusion land in the "
    "hash (operators/rtf.py).",
)
def text_rtf_extract(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.rtf import (
            build_rtf,
            rtf_to_text,
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
                title = f"secret-title-{did}"
                pay = build_rtf(paras, title=title)
                got = rtf_to_text(pay)
                rows.append({
                    "doc_id": did,
                    "n_pars": got["n_pars"],
                    "n_chars": len(text),
                    "codepage": got["codepage"],
                    "text_ok": got["text"] == "\n".join(paras),
                    "title_excluded": title not in got["text"],
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_pars", "n_chars", "codepage",
                         "text_ok", "title_excluded"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, n_pars int, n_chars long, codepage string,"
        " text_ok boolean, title_excluded boolean",
    ).orderBy("doc_id")


@register(
    "ingest_bplist_assets",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               CAST(doc_id % 4 = 0 AS BOOLEAN) AS has_uid,
               TRUE AS parity_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "ingest", "documents", "bplist"),
    doc="Binary property-list ingestion END-TO-END (the [r15] "
    "bplist00 reader, operators/bplist.py — Apple-ecosystem dumps in "
    "crawls; sized ints with the signed-8-byte rule, UTF-16BE "
    "strings, extended lengths, keyed-archiver UIDs, cycle-guarded "
    "recursion): per doc the HOST plistlib writer builds the blob in "
    "the executor (word list + nested metadata dict + a UID on every "
    "4th doc + the full text as a long UTF-16-worthy string), our "
    "reader decodes the same bytes, and parity_ok lands in the hash "
    "only when the object tree equals plistlib.loads AND the word "
    "list round-trips (operators/bplist.py).",
)
def ingest_bplist_assets(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        import plistlib

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.bplist import (
            parse_bplist,
            sniff_bplist,
        )

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                text = str(text)
                words = text.split(" ")
                obj = {
                    "doc_id": did,
                    "words": words,
                    "meta": {
                        "chars": len(text),
                        "flag": did % 2 == 0,
                        "ratio": did / 7.0,
                        "blob": did.to_bytes(8, "big"),
                        "title": f"döc {did} — €",
                    },
                    "text": text,
                }
                if did % 4 == 0:
                    obj["archiver_ref"] = plistlib.UID(did % 100)
                data = plistlib.dumps(obj, fmt=plistlib.FMT_BINARY)
                got = parse_bplist(data)
                ok = (
                    sniff_bplist(data)
                    and got == plistlib.loads(data)
                    and got["words"] == words
                    and got["text"] == text
                )
                rows.append({
                    "doc_id": did,
                    "n_words": len(got["words"]),
                    "n_chars": got["meta"]["chars"],
                    "has_uid": "archiver_ref" in got,
                    "parity_ok": ok,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_words", "n_chars", "has_uid",
                         "parity_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, n_words int, n_chars long, has_uid boolean,"
        " parity_ok boolean",
    ).orderBy("doc_id")


@register(
    "text_doc_extract",
    oracle="""
        SELECT doc_id,
               CAST((len(string_split(text, ' ')) + 7) // 8 AS INT)
                 AS n_paras,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               CAST(doc_id % 2 = 0 AS BOOLEAN) AS fast_saved,
               TRUE AS text_ok,
               TRUE AS title_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "text", "documents", "office", "cfb"),
    doc="Legacy .doc text extraction END-TO-END (the [r15] second-wave "
    "CFB/OLE2 walk + [MS-DOC] piece table, operators/cfb.py — FIB "
    "fWhichTblStm selects 1Table past a 0xEE decoy 0Table, the Clx "
    "walk skips a Prc block, and on even docs the FAST-SAVE shape is "
    "live: pieces alternate 8-bit cp1252/UTF-16LE and are stored in "
    "REVERSED file order, so a read-after-header extractor returns "
    "shuffled mojibake; title rides the [MS-OLEPS] "
    "SummaryInformation property set; no host CFB reader — tripwire "
    "in tests/test_realworld_r15.py): per doc the text packs into "
    "8-word paragraphs, builds the container, extracts through the "
    "UNIFIED office front door (sniff_office_format -> 'doc'), and "
    "byte-exact text + title land in the hash (operators/cfb.py, "
    "operators/ooxml.py).",
)
def text_doc_extract(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
            build_doc,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ooxml import (
            office_to_text,
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
                title = f"Légacy {did} — €"
                fast = did % 2 == 0
                pay = build_doc(paras, title=title, fast_save=fast)
                got = office_to_text(pay)
                rows.append({
                    "doc_id": did,
                    "n_paras": len(paras),
                    "n_chars": len(text),
                    "fast_saved": fast,
                    "text_ok": got["format"] == "doc"
                    and got["text"] == "\n".join(paras)
                    and got["n_blocks"] == len(paras),
                    "title_ok": got["title"] == title,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_paras", "n_chars", "fast_saved",
                         "text_ok", "title_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, n_paras int, n_chars long, fast_saved boolean,"
        " text_ok boolean, title_ok boolean",
    ).orderBy("doc_id")


@register(
    "text_legacy_sheets_extract",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'xls' ELSE 'ppt' END
                 AS format,
               CAST((len(string_split(text, ' ')) + 7) // 8 AS INT)
                 AS n_blocks,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               TRUE AS text_ok,
               TRUE AS title_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "text", "documents", "office", "cfb"),
    doc="Legacy .xls/.ppt text extraction END-TO-END (the [r15] "
    "second-wave BIFF8 + PPT97 walks over the CFB container, "
    "operators/biff.py + operators/ppt97.py — the SST split by a "
    "CONTINUE record MID-STRING with the encoding switched at the "
    "boundary, rich-run/ExtRst trailing payloads stepped over, "
    "LABELSST shared-slot indirection, RK integer encodings, PPT "
    "text atoms nested 3 containers deep beside decoy CStrings; no "
    "host reader — tripwire shared with the CFB row): per doc the "
    "text packs into 8-word blocks, builds the carrier its doc_id%2 "
    "selects (xls rows of one string cell + row-number cells, ppt "
    "slides), extracts through the UNIFIED office front door, and "
    "byte-exact text + the OLEPS title land in the hash "
    "(operators/biff.py, operators/ppt97.py, operators/ooxml.py).",
)
def text_legacy_sheets_extract(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.biff import (
            build_xls,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ooxml import (
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
                blocks = [
                    " ".join(words[i : i + 8])
                    for i in range(0, len(words), 8)
                ]
                title = f"Légacy shéet {did}"
                if did % 2 == 0:
                    pay = build_xls(
                        [("S1", [[b, ri] for ri, b in
                                 enumerate(blocks)])],
                        title=title)
                    fmt = "xls"
                else:
                    pay = build_ppt(blocks, title=title)
                    fmt = "ppt"
                got = office_to_text(pay)
                rows.append({
                    "doc_id": did,
                    "format": fmt,
                    "n_blocks": len(blocks),
                    "n_chars": len(text),
                    "text_ok": got["format"] == fmt
                    and got["text"] == "\n".join(blocks)
                    and got["n_blocks"] == len(blocks),
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
    "ingest_msg_mail",
    oracle="""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               CAST(1 + doc_id % 3 AS INT) AS n_recipients,
               CAST(doc_id % 2 AS INT) AS n_attachments,
               CAST(doc_id % 4 = 0 AS BOOLEAN) AS has_embedded,
               TRUE AS roundtrip_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "ingest", "documents", "mail", "cfb"),
    doc="Outlook .msg ingestion END-TO-END (the [r15] second-wave "
    "[MS-OXMSG] property-stream walk over the CFB container, "
    "operators/msg.py — __substg typed streams with UTF-16/cp1252 "
    "variants, recipient and attachment storages, and on every 4th "
    "doc an EMBEDDED message in a type-000D storage parsed "
    "recursively; no host .msg reader — the CFB tripwire covers it): "
    "per doc a message carries the doc text as body, doc_id%3+1 "
    "recipients, doc_id%2 attachments, and roundtrip_ok lands in the "
    "hash only when subject/body/recipients/attachment bytes and the "
    "embedded message all read back exactly (operators/msg.py, "
    "operators/cfb.py).",
)
def ingest_msg_mail(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.msg import (
            build_msg,
            parse_msg,
        )

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                text = str(text)
                subject = f"Nächricht {did} — €"
                recips = [(f"Pérson {k}", f"p{k}.d{did}@example.com")
                          for k in range(1 + did % 3)]
                attaches = [("data.bin", did.to_bytes(8, "big") * 5)
                            ] if did % 2 else []
                inner = ({"subject": f"inner {did}",
                          "body": text[:64],
                          "recipients": [("I", "i@example.com")]}
                         if did % 4 == 0 else None)
                pay = build_msg(subject, text,
                                sender=f"s{did}@example.com",
                                recipients=recips,
                                attachments=attaches,
                                attached_msg=inner,
                                eightbit_body=False)
                r = parse_msg(pay)
                ok = (
                    r["subject"] == subject
                    and r["body"] == text
                    and [(x["name"], x["smtp"])
                         for x in r["recipients"]] == recips
                    and [(a["filename"], a["data"])
                         for a in r["attachments"]]
                    == attaches
                    and (len(r["attached_messages"]) == 1
                         and r["attached_messages"][0]["subject"]
                         == f"inner {did}"
                         and r["attached_messages"][0]["body"]
                         == text[:64]
                         if inner else not r["attached_messages"])
                )
                rows.append({
                    "doc_id": did,
                    "n_chars": len(text),
                    "n_recipients": len(r["recipients"]),
                    "n_attachments": len(r["attachments"]),
                    "has_embedded": bool(r["attached_messages"]),
                    "roundtrip_ok": ok,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_chars", "n_recipients",
                         "n_attachments", "has_embedded",
                         "roundtrip_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, n_chars long, n_recipients int,"
        " n_attachments int, has_embedded boolean,"
        " roundtrip_ok boolean",
    ).orderBy("doc_id")


@register(
    "ingest_avro_container",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'deflate' ELSE 'null' END
                 AS codec,
               CAST(len(string_split(text, ' ')) AS INT) AS n_records,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               TRUE AS roundtrip_ok,
               TRUE AS schema_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "ingest", "documents", "avro"),
    doc="Avro object-container ingestion END-TO-END (the [r15] "
    "second-wave from-spec reader/writer, operators/avro_file.py — "
    "zigzag varints, union/enum/fixed/array/map encodings, per-block "
    "sync verification, raw-deflate codec; the CANONICAL Java Avro "
    "implementation on Spark's classpath pins both directions in "
    "tests/test_avro_file.py): per doc one record per word (word, "
    "position, an every-5th-null union, an enum by position) plus a "
    "full-text record, written with the codec its doc_id%2 selects "
    "in 40-record blocks, decoded back, and roundtrip_ok lands in "
    "the hash only when every record and the schema survive "
    "byte-exact (operators/avro_file.py).",
)
def ingest_avro_container(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.avro_file import (
            build_avro,
            parse_avro,
            sniff_avro,
        )

        schema = {
            "type": "record", "name": "W", "namespace": "corpus",
            "fields": [
                {"name": "word", "type": "string"},
                {"name": "pos", "type": "long"},
                {"name": "maybe", "type": ["null", "long"]},
                {"name": "kind", "type": {
                    "type": "enum", "name": "K",
                    "symbols": ["EVEN", "ODD", "TEXT"]}},
            ],
        }
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                text = str(text)
                words = text.split(" ")
                recs = [
                    {"word": w, "pos": i,
                     "maybe": None if i % 5 == 0 else i * did,
                     "kind": "EVEN" if i % 2 == 0 else "ODD"}
                    for i, w in enumerate(words)
                ]
                recs.append({"word": text, "pos": -1, "maybe": None,
                             "kind": "TEXT"})
                codec = "deflate" if did % 2 == 0 else "null"
                pay = build_avro(
                    schema, recs, codec=codec,
                    sync=did.to_bytes(16, "big"), block_records=40)
                got = parse_avro(pay)
                ok = (
                    sniff_avro(pay)
                    and got["codec"] == codec
                    and got["schema"] == schema
                    and got["records"] == recs
                    and got["records"][-1]["word"] == text
                )
                rows.append({
                    "doc_id": did,
                    "codec": codec,
                    "n_records": len(recs) - 1,
                    "n_chars": len(text),
                    "roundtrip_ok": ok,
                    "schema_ok": got["schema"]["name"] == "W",
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "codec", "n_records", "n_chars",
                         "roundtrip_ok", "schema_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, codec string, n_records int, n_chars long,"
        " roundtrip_ok boolean, schema_ok boolean",
    ).orderBy("doc_id")


@register(
    "ingest_parquet_from_spec",
    oracle="""
        SELECT doc_id, lang, source,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(strlen(text) AS BIGINT) AS n_text_chars
        FROM documents
        ORDER BY doc_id
    """,
    tags=("B10", "ingest", "documents", "parquet"),
    doc="From-spec parquet decode of the REAL test table — a standing "
    "THREE-ENGINE agreement gate (the [r15] second-wave reader, "
    "operators/parquet_file.py — thrift compact footer, v1/v2 data "
    "pages, PLAIN + RLE_DICTIONARY + RLE-boolean + DELTA families, "
    "snappy/gzip/zstd pages with snappy itself from spec and pinned "
    "on the host library): the executor opens the driver-written "
    "documents.parquet bytes (parquet-cpp 16.1.0, snappy + "
    "RLE_DICTIONARY) and decodes it with OUR pure-Python reader "
    "while the driver's DuckDB oracle reads the SAME file with its "
    "own C++ reader — every row, string byte, and the n_chars "
    "column land in the hash, so any disagreement between the two "
    "independent decoders fails the gate (pyarrow is the third "
    "engine, pinned in tests/test_parquet_file.py). This query is "
    "the VERIFICATION channel; the distributed scan path for "
    "parquet is Spark's native reader (operators/parquet_file.py, "
    "operators/snappy.py).",
)
def ingest_parquet_from_spec(spark, sf_dir):
    import pandas as pd

    path = f"{sf_dir}/documents.parquet"

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.parquet_file import (
            read_parquet,
        )

        for _ in batches:
            data = open(path, "rb").read()
            r = read_parquet(data)
            cols = r["columns"]
            yield pd.DataFrame({
                "doc_id": cols["doc_id"],
                "lang": cols["lang"],
                "source": cols["source"],
                "n_chars": cols["n_chars"],
                "n_text_chars": [len(t) for t in cols["text"]],
            })

    return (
        spark.range(1)
        .mapInPandas(
            op,
            "doc_id long, lang string, source string,"
            " n_chars long, n_text_chars long",
        )
        .orderBy("doc_id")
    )


@register(
    "ingest_parquet_vectors",
    oracle="""
        SELECT vec_id,
               CAST(label AS INT) AS label,
               CAST(len(embedding) AS INT) AS dim,
               TRUE AS values_ok
        FROM embeddings
        ORDER BY vec_id
    """,
    tags=("B10", "ingest", "embeddings", "parquet"),
    doc="From-spec parquet decode of the REAL embeddings table — the "
    "LIST-column (dremel rep/def level) half of the three-engine "
    "gate (the [r15] reader, operators/parquet_file.py — one-level "
    "LIST assembly: null list / empty list / null element / value "
    "from the d_rep thresholds): the executor decodes the driver's "
    "embeddings.parquet (list<float> through RLE_DICTIONARY + "
    "snappy) with OUR reader, values_ok additionally checks every "
    "float32 against pyarrow's decode of the same bytes "
    "bit-for-bit, and vec_id/label/dim land in the driver hash "
    "against DuckDB's own reader (operators/parquet_file.py).",
)
def ingest_parquet_vectors(spark, sf_dir):
    import pandas as pd

    path = f"{sf_dir}/embeddings.parquet"

    def op(batches):
        import io
        import struct as _s

        import pyarrow.parquet as pq

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.parquet_file import (
            read_parquet,
        )

        for _ in batches:
            data = open(path, "rb").read()
            r = read_parquet(data)
            cols = r["columns"]
            ref = pq.read_table(io.BytesIO(data))
            ref_emb = ref.column("embedding").to_pylist()
            oks = []
            for ours, theirs in zip(cols["embedding"], ref_emb):
                oks.append(
                    ours is not None and theirs is not None
                    and len(ours) == len(theirs)
                    and all(_s.pack("<f", a) == _s.pack("<f", b)
                            for a, b in zip(ours, theirs))
                )
            yield pd.DataFrame({
                "vec_id": cols["vec_id"],
                "label": cols["label"],
                "dim": [len(e) if e is not None else -1
                        for e in cols["embedding"]],
                "values_ok": oks,
            })

    return (
        spark.range(1)
        .mapInPandas(
            op,
            "vec_id long, label int, dim int, values_ok boolean",
        )
        .orderBy("vec_id")
    )
