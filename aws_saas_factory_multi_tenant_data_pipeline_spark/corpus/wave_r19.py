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
