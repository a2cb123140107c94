"""Lexical relevance ranking (BM25) over the documents table.

The reference delegates all querying to Athena SQL (`athena-stack.ts:16`)
which has no ranking primitive; a training-data/search pipeline needs one
to select or weight documents against a term query. BM25 (Robertson et
al.; the +1 idf variant Lucene uses, so idf is never negative) is the
standard: tf saturation via k1, document-length normalization via b.

Plan shape (100 TB): ONE tokens projection feeds both the per-document
length and the term frequencies; the query-term filter prunes the explode
to |terms| rows per doc BEFORE the shuffle; document frequencies and the
corpus aggregate (N, avgdl) are tiny frames broadcast back. Per-term
scores round to 6 dp and sum as DECIMAL(38,6), so the final score is
bit-identical across engines and partition orders (the ``text_bm25_rank``
oracle replays the whole formula in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import DEC
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import tokens
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.fanout import (
    fan_out_scan,
)


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    Returns (id, score, rank); score 6 dp, ties broken by ascending id.
    Documents matching no query term never enter the shuffle (score 0 by
    definition — BM25 has no coordination bonus for absent terms).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    # ONE tokenization pass, materialized compact: (id, doc length, the
    # doc's query-term occurrences only). The frame drops the text column
    # — bytes per doc, not the document — and every downstream consumer
    # (corpus aggregate, document frequencies, scoring) reads it instead
    # of re-running the regex tokenizer over the full corpus (the first
    # cut re-tokenized up to 3× through the gl/dfreq/scored lineages).
    term_list = list(terms)
    # r16 (guide §2.5 input parallelism): the regex tokenizer is this
    # operator's dominant cost and a single-file documents scan arrives
    # as 1-2 partitions — conditional fan-out spreads the tokenize pass
    # across the session (sf1 A/B: 1.8 s → 1.0 s, rows identical; no-op
    # on already-parallel inputs, see fanout.py).
    docs = fan_out_scan(docs, id_col)
    stats = (
        docs.withColumn("__toks", tokens(F.col(text_col)))
        .select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            F.filter("__toks", lambda x: x.isin(term_list)).alias("__qt"),
        )
        .localCheckpoint(eager=True)
    )
    gl = stats.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        (F.sum(F.col("__dl").cast(DEC)).cast("double") / F.count(F.lit(1))).alias("__avgdl"),
    )
    tf = (
        stats.select(id_col, "__dl", F.explode("__qt").alias("__tok"))
        .groupBy(id_col, "__dl", "__tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
    scored = tf.join(F.broadcast(dfreq), "__tok").crossJoin(F.broadcast(gl))
    idf = F.log(
        (F.col("__n_docs") - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("__tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
    )
    term_score = F.round(idf * F.col("__tf") * F.lit(k1 + 1.0) / denom, 6)
    agg = (
        scored.groupBy(id_col)
        .agg(F.sum(term_score.cast(DEC)).cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return agg.withColumn("rank", F.row_number().over(w)).select(id_col, "score", "rank")
