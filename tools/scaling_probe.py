"""Scale-factor sweep: measure headline queries at sf0.001/0.01/0.1 and
print per-query wall times plus the 0.01→0.1 scaling ratio.

A query whose plan is healthy scales sub-linearly to linearly in data
size at these (tiny) scales, because fixed scheduling/codegen overhead
dominates small inputs: ratios well ABOVE ~10× on a 10× data step are
the red flag (a quadratic pair join, a plan re-derivation per round).
This is measured evidence for the SCALE.md claims — run it after any
plan-shape change.

Usage: python tools/scaling_probe.py [query ...]   (defaults below)
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
    "agg_pricing_summary",
    "join_star_multiway",
    "dedup_minhash_lsh",
    "text_bm25_rank",
    "graph_pagerank",
    "dedup_semantic",
    "similarity_topk_cosine",
]
SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    registry = load_all()
    spark = get_spark("scaling-probe", cpus=32, shuffle_partitions=32)
    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    registry["join_cross"].spark_fn(spark, os.path.join(base, SFS[0])).count()  # warm JVM
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name].spark_fn
        times = {}
        for sf in SFS:
            sf_dir = os.path.join(base, sf)
            fn(spark, sf_dir).count()  # warm codegen/page cache per sf
            t0 = time.time()
            fn(spark, sf_dir).count()
            times[sf] = round(time.time() - t0, 3)
        ratio = round(times["sf0.1"] / max(times["sf0.01"], 1e-9), 2)
        out[name] = {**times, "x10_ratio": ratio}
        print(f"{name:26s} " + "  ".join(f"{sf}={times[sf]:6.3f}s" for sf in SFS)
              + f"  10x-data ratio={ratio}")
    print(json.dumps({"scaling": out}))


if __name__ == "__main__":
    main()
