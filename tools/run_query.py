"""Run any corpus query by name and print its result.

Usage:
    python tools/run_query.py                       # list queries
    python tools/run_query.py agg_pricing_summary   # run on default sf dir
    python tools/run_query.py join_asof /root/testdata/sf0.01 --explain
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import load_all


def main() -> int:
    registry = load_all()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    if not args:
        for name, spec in sorted(registry.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:32s} [{kind:9s}] {spec.doc.strip().splitlines()[0][:80]}")
        return 0
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if name not in registry:
        print(f"unknown query {name!r}; run with no args to list")
        return 1
    spark = get_spark("run-query")
    df = registry[name].spark_fn(spark, sf_dir)
    if explain:
        df.explain("formatted")
    df.show(50, truncate=False)
    print(f"({df.count()} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
