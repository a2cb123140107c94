"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once warm-up-free except a shared session/JVM spin-up
query (excluded from timings). Results are forced with a count() on the
final DataFrame (no driver-side collect of payloads).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import load_all

#: headline set: one per major operator family (SURVEY.md §2)
HEADLINE = [
    "agg_pricing_summary",     # B4 flagship (TPC-H Q1 shape)
    "join_inner_star",         # B3 fact-dim star
    "join_star_multiway",      # B3 6-way join (TPC-H Q5 shape)
    "join_asof",               # B3 as-of (union+window plan)
    "win_topk_per_group",      # B5 windows
    "count_distinct_multi",    # B4 distinct
    "stream_tumbling_hour",    # B8 window agg
    "stream_session_30m",      # B8 sessionization
    "fn_string",               # B7 string-heavy scan
    "dedup_exact",             # B10 dedup
    "dedup_minhash_lsh",       # B10 MinHash-LSH
    "similarity_topk_cosine",  # B10 ANN baseline
    "text_tfidf_top_terms",    # B10 text analytics
]


def _bench_ingest(spark, n_rows: int = 200_000) -> float:
    """The reference's actual workload: validate+enrich+partition-derive a
    raw JSON event stream and write the partitioned lake (A8/A2/A4). The
    reference's Flink path runs parallelism=2 with a 60 s sink buffer
    (kinesis-stack.ts:194-205) — i.e. its floor is minutes; this measures
    our whole batch-equivalent pipeline end-to-end including the write.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.ingest import ingest_batch
    from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import write_lake

    raw = spark.range(n_rows).select(
        F.concat(F.lit("tenant-"), (F.col("id") % 8).cast("string")).alias("tenant_id"),
        F.to_json(
            F.struct(
                F.struct(
                    F.concat(F.lit("dev"), (F.col("id") % 5).cast("string")).alias("device"),
                    F.concat(F.lit("evt"), (F.col("id") % 50).cast("string")).alias("event"),
                    F.when(F.col("id") % 2 == 0, "US").otherwise("EU").alias("region"),
                ).alias("Data")
            )
        ).alias("raw"),
    )
    out = tempfile.mkdtemp(prefix="mtdp_bench_lake_")
    t0 = time.time()
    res = ingest_batch(raw, ingest_ts=1700000000)
    write_lake(res.valid, out)
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark("mtdp-bench", cpus=cpus, shuffle_partitions=cpus)
    registry = load_all()

    # JVM/session warm-up (not timed): tiny scan touching the parquet reader
    registry["join_cross"].spark_fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].spark_fn
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    timings["ingest_pipeline"] = round(_bench_ingest(spark), 3)

    out = {
        "metric": "headline_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
