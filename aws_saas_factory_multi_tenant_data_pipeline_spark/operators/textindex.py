"""Persisted inverted text index: term search without a corpus scan.

Completes the engine's index family (dedup band index, IVF list index,
file-stats skipping index): a token → posting-list table laid out so a
term query reads only the partitions that can contain its terms, plus
the corpus statistics BM25 needs, captured at build time.

Layout:
- ``<root>/postings/bucket=<b>/``: rows (token, doc_id, tf, dl),
  partitioned by ``bucket = md5-hash(token) mod n_buckets``. A query for
  k terms reads ≤ k buckets — at 100 TB the difference between touching
  1/n_buckets of the index and scanning the corpus. The bucket function
  is md5-based so the DRIVER can compute a term's bucket without a JVM
  round-trip (the same portability trick as the oracle hashes).
- ``<root>/meta/``: one row (n_docs, sum_dl) — corpus stats for scoring.

Query-time scoring reproduces :func:`operators.ranking.bm25_rank`
exactly: document frequency comes from the pruned postings (identical to
the corpus df by construction), avgdl from meta — equality with the
direct corpus computation is pinned in tests and the corpus query
``text_index_search`` shares the generated BM25 oracle.

Maintenance contract: rebuild per corpus version (the index is derived
data, like the dedup/IVF indexes); incremental append works by writing
new postings into the same bucket layout and adding a meta row —
``n_docs``/``sum_dl`` aggregate additively.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import DEC
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import tokens

N_BUCKETS = 64


def term_bucket(token: str) -> int:
    """Driver-side bucket of a term — MUST match the Spark-side expression
    in :func:`build_text_index` (md5 first 15 hex digits mod N_BUCKETS)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16) % N_BUCKETS


def _bucket_col(tok_col):
    return F.pmod(
        F.conv(F.substring(F.md5(tok_col), 1, 15), 16, 10).cast("long"), F.lit(N_BUCKETS)
    ).cast("int")


def build_text_index(
    docs: DataFrame,
    root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """One corpus pass → postings + meta. The explode shuffles once keyed
    on (doc, token) for tf, then writes repartitioned by bucket so each
    bucket directory is a bounded number of files."""
    toks = docs.withColumn("__toks", tokens(F.col(text_col))).select(
        F.col(id_col).alias("doc_id"), F.size("__toks").alias("dl"), F.col("__toks")
    )
    postings = (
        toks.select("doc_id", "dl", F.explode("__toks").alias("token"))
        .groupBy("doc_id", "dl", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", _bucket_col(F.col("token")))
    )
    (
        postings.repartition("bucket")
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(os.path.join(root, "postings"))
    )
    meta = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    meta.coalesce(1).write.mode(mode).parquet(os.path.join(root, "meta"))


def search_text_index(
    spark: SparkSession,
    root: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k from the index alone — no corpus access. Reads only the
    buckets the query terms hash to (partition-pruned; pinned in tests),
    which for a handful of terms is a constant number of small files
    regardless of corpus size."""
    if not terms:
        raise ValueError("terms must be non-empty")
    buckets = sorted({term_bucket(t) for t in terms})
    postings = spark.read.parquet(os.path.join(root, "postings")).where(
        F.col("bucket").isin(buckets) & F.col("token").isin(list(terms))
    )
    meta = spark.read.parquet(os.path.join(root, "meta")).agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum(F.col("sum_dl").cast(DEC)).cast("double") / F.sum("n_docs")).alias("avgdl"),
    )
    dfreq = postings.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    scored = postings.join(F.broadcast(dfreq), "token").crossJoin(F.broadcast(meta))
    idf = F.log(
        (F.col("n_docs") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, 6)
    agg = (
        scored.groupBy("doc_id")
        .agg(F.sum(term_score.cast(DEC)).cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return agg.withColumn("rank", F.row_number().over(w)).select("doc_id", "score", "rank")
