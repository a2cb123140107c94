"""End-to-end web-crawl corpus prep on synthetic data.

Demonstrates the full Common Crawl-shaped pipeline this engine ships:

    WARC archives → distributed record read → robots.txt gate →
    HTML→text extraction → URL canonicalization → exact + near dedup →
    quality scoring → leakage-safe split → token-budget selection

Run:  python examples/crawl_prep.py
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
    normalize_text,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import html_to_text
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
    filter_by_robots,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.selection import (
    budget_select,
    leakage_safe_split,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
    quality_model_score,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.urlnorm import (
    canonicalize_url,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
    build_warc,
    http_response_body,
    read_warc,
)


def synthesize_archives(root: str, n_pages: int = 60) -> None:
    """Write a handful of .warc.gz files with HTML pages (some duplicated,
    some robots-disallowed, one 404)."""
    topics = ["galaxies and stars", "sourdough baking", "tensor calculus"]
    recs_by_file: dict[int, list] = {}
    for i in range(n_pages):
        body_txt = f"an article about {topics[i % 3]} number {i // 6}"
        status = "404 Not Found" if i % 29 == 28 else "200 OK"
        html = (
            f"<html><head><title>p{i}</title></head><body><h1>Site</h1>"
            f"<p>{body_txt}</p><script>t({i})</script></body></html>"
        )
        http = f"HTTP/1.1 {status}\r\nContent-Type: text/html\r\n\r\n{html}".encode()
        recs_by_file.setdefault(i // 12, []).append(
            {
                "warc_type": "response",
                "target_uri": f"HTTP://Site{i % 4}.Example:80/p/{i}?utm_source=x&id={i}",
                "warc_date": "2026-01-01T00:00:00Z",
                "record_id": f"<urn:uuid:p{i}>",
                "content_type": "application/http;msgtype=response",
                "block": http,
            }
        )
    for fidx, recs in recs_by_file.items():
        with open(os.path.join(root, f"crawl-{fidx}.warc.gz"), "wb") as f:
            f.write(b"".join(gzip.compress(build_warc([r])) for r in recs))


def main() -> None:
    spark = get_spark("crawl-prep-example", cpus=8, shuffle_partitions=8)
    workdir = tempfile.mkdtemp(prefix="crawl_prep_")
    synthesize_archives(workdir)

    # 1. distributed WARC read (one binaryFile task per archive)
    records = read_warc(spark, workdir)
    print(f"records: {records.count()} (incl. parse errors: "
          f"{records.where(F.col('parse_error').isNotNull()).count()})")

    # 2. HTTP split + 200-only
    @F.pandas_udf("struct<status:int, body:string>")
    def split_http(block):
        import pandas as pd

        return pd.DataFrame(
            [
                {"status": s, "body": b.decode("utf-8", "replace")}
                for s, b in (http_response_body(bytes(x)) for x in block)
            ]
        )

    pages = (
        records.where(F.col("warc_type") == "response")
        .withColumn("http", split_http("block"))
        .where(F.col("http.status") == 200)
        .select(F.col("target_uri").alias("url"), F.col("http.body").alias("html"))
    )

    # 3. robots gate (site3 disallows /p/)
    robots = spark.createDataFrame(
        [("site3.example", "User-agent: *\nDisallow: /p/\n")],
        "host string, robots_txt string",
    )
    allowed = filter_by_robots(pages, robots, url_col="url")
    print(f"after robots gate: {allowed.count()}")

    # 4. canonical URLs + text extraction + normalization
    corpus = allowed.select(
        canonicalize_url(F.col("url")).alias("url"),
        normalize_text(html_to_text(F.col("html"))).alias("text"),
    )

    # 5. exact dedup by text, then near-dup pairs for the split
    deduped = exact_dedup(corpus, text_col="text", id_col="url")
    print(f"after exact dedup: {deduped.count()}")
    docs = deduped.withColumn(
        "doc_id", F.xxhash64("url").bitwiseAND((1 << 62) - 1)
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)

    # 6. quality + leakage-safe split + 300-token budget selection
    scored = quality_model_score(docs).select("doc_id", "url", "text", "quality_score")
    toks = scored.withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
    )
    split = leakage_safe_split(toks, pairs)
    final = budget_select(
        split.where(F.col("split") == "train"), 300,
        score_col="quality_score", tokens_col="n_tokens",
    )
    final.where(F.col("is_selected")).select(
        "url", "quality_score", "n_tokens", "split"
    ).show(10, truncate=60)
    picked = final.where(F.col("is_selected"))
    print(
        f"train docs selected under the 300-token budget: {picked.count()} "
        f"({picked.agg(F.sum('n_tokens')).collect()[0][0]} tokens)"
    )


if __name__ == "__main__":
    main()
