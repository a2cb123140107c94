"""Three-tier ANN retrieval cascade over an embedding corpus.

Demonstrates the round-9 similarity stack as it would run at 100 TB —
each tier trades recall for a memory/compute budget, and survivors of
a cheap tier feed the next:

    tier 1: 1-bit binary signatures (8 bytes/vector, 512x smaller) —
            Hamming top-N via one codegen'd bit_count(xor) per row
    tier 2: product quantization (4 bytes/vector) — trained codebooks,
            ADC re-scoring of tier-1 survivors (m table lookups/row)
    tier 3: exact cosine over the tiny tier-2 shortlist — the final
            ranking users see

All three tiers are deterministic integer/exact arithmetic, so the
whole cascade is reproducible run-to-run (and the component operators
are oracle-checked in the corpus: similarity_binary_hamming,
similarity_pq_adc, similarity_topk_cosine).

Run:  python examples/ann_cascade.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pq import (
    binary_hamming_topk,
    binary_quantize,
    pq_encode,
    pq_topk_adc,
    pq_train,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
    dot,
    norm,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("ann-cascade")
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()
    queries = emb.where("vec_id % 101 = 3").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n = emb.count()
    print(f"corpus: {n} vectors; queries: {queries.count()}")

    # ---- tier 1: binary signatures, Hamming top-64 --------------------------
    sigs = binary_quantize(emb, dim=64)
    qsigs = queries.join(
        sigs, queries.query_id == sigs.vec_id
    ).select("query_id", "sig")
    coarse = binary_hamming_topk(sigs, qsigs, topk=64)
    print("tier 1 (binary/Hamming) kept", coarse.count(), "candidates")

    # ---- tier 2: PQ-ADC re-score, each query WITHIN its own survivors --------
    books = pq_train(emb, m=4, k=4, iterations=1)
    codes = pq_encode(emb, books, m=4)
    refined = pq_topk_adc(
        codes,
        queries,
        books,
        topk=16,
        m=4,
        candidates=coarse.select("query_id", "vec_id"),
    )
    print(
        "tier 2 (PQ-ADC) kept",
        refined.count(),
        "candidates (16 per query, ranked inside each query's own tier-1 set)",
    )

    # ---- tier 3: exact cosine over ONLY the surviving (query, vec) pairs -----
    from pyspark.sql import Window

    cand = refined.select("query_id", "vec_id").join(emb, "vec_id").select(
        "query_id", "vec_id", F.col("embedding").alias("__cv")
    )
    q2 = queries.select("query_id", F.col("embedding").alias("__qv"))
    cos = F.round(dot(F.col("__cv"), F.col("__qv"))
                  / (norm(F.col("__cv")) * norm(F.col("__qv"))), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    final = (
        cand.join(F.broadcast(q2), "query_id")
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
    )
    print("tier 3 (exact cosine over the per-query shortlist) top-5:")
    final.orderBy("query_id", "rank").show(20, truncate=False)


if __name__ == "__main__":
    main()
