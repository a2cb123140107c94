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
