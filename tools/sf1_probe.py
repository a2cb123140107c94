"""SCALE.md tenth wave: measure the heaviest headline queries at
sf0.1 AND the locally-materialized sf1 (tools/make_sf1.py — 10× rows,
6M lineitem) and print the 10× scaling ratio. A healthy plan lands
near-linear (ratio ≤ ~13 on a 10× data step once fixed overhead
amortizes); well above that flags a quadratic pair join or per-round
re-derivation. Run on a quiet host after `python tools/make_sf1.py`.

Usage: python tools/sf1_probe.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import load_all

DEFAULT = [
    "graph_pagerank",
    "similarity_pq_adc",
    "lake_branch_wap_roundtrip",
    "dedup_semantic",
    "similarity_bitext_margin",
    "agg_pricing_summary",
    "join_star_multiway",
    "dedup_minhash_portable",
    "text_bm25_rank",
    "llm_budget_select",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    registry = load_all()
    spark = get_spark("sf1-probe", cpus=32, shuffle_partitions=32)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dirs = {
        "sf0.1": "/root/testdata/sf0.1",
        "sf1": os.path.join(repo, ".scale", "sf1"),
    }
    if not os.path.isdir(sf_dirs["sf1"]):
        sys.exit("run tools/make_sf1.py first")
    registry["agg_pricing_summary"].spark_fn(
        spark, sf_dirs["sf0.1"]
    ).count()  # warm JVM
    out = {}
    for name in names:
        fn = registry[name].spark_fn
        times = {}
        for sf, d in sf_dirs.items():
            fn(spark, d).count()  # warm codegen + page cache
            best = min(
                (lambda: (lambda t0: (fn(spark, d).count(),
                                      time.time() - t0)[1])(time.time()))()
                for _ in range(3)
            )
            times[sf] = round(best, 3)
        times["ratio_10x"] = round(times["sf1"] / max(times["sf0.1"], 1e-9), 2)
        out[name] = times
        print(name, json.dumps(times), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
