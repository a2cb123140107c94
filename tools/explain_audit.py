"""Plan-quality audit: print the scale-critical facts of each headline
query's physical plan (SURVEY.md §4 — the properties that must hold at
100 TB, not just pass at test scale).

For every query in bench.py's HEADLINE set (plus any names given on the
command line) this prints: join strategies chosen, exchange count,
whole-stage-codegen span count, parquet pushed filters, and flags
red-flag operators (BroadcastNestedLoopJoin, CartesianProduct,
row-at-a-time Python eval in a non-UDF query).

Usage:  python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import load_all

RED_FLAGS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def audit(spark, registry, name: str, sf_dir: str) -> str:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.plans import codegen_stage_count

    spec = registry[name]
    df = spec.spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts = {
        "BHJ": plan.count("BroadcastHashJoin"),
        "SMJ": plan.count("SortMergeJoin"),
        "SHJ": plan.count("ShuffledHashJoin"),
        "exch": plan.count("Exchange"),
        "agg": plan.count("HashAggregate"),
        # executes the query: under AQE the codegen'd plan is post-run
        "codegen": codegen_stage_count(df),
    }
    pushed = sorted(set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)))
    pushed_s = "; ".join(p[:70] for p in pushed if p) or "-"
    # a BNLJ with a tiny broadcast side is the documented plan for the B10
    # brute-force baselines (SCALE.md); it is a red flag everywhere else
    b10 = "B10" in spec.tags
    flags = [f for f in RED_FLAGS if f in plan and not b10]
    if "BatchEvalPython" in plan and not b10 and not name.startswith("udf_"):
        flags.append("BatchEvalPython")
    line = (
        f"{name:28s} joins BHJ={counts['BHJ']} SMJ={counts['SMJ']} "
        f"SHJ={counts['SHJ']} | exchanges={counts['exch']} "
        f"hashAgg={counts['agg']} codegenSpans={counts['codegen']}\n"
        f"{'':28s} pushed: {pushed_s}"
    )
    if flags:
        line += f"\n{'':28s} !! RED FLAGS: {', '.join(flags)}"
    return line


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)]
    registry = load_all()
    if not names:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        names = [n for n in bench.HEADLINE if n in registry]
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown query {unknown}; run tools/run_query.py with no args to list")
        return 1
    spark = get_spark("explain-audit")
    any_flag = False
    for n in names:
        out = audit(spark, registry, n, sf_dir)
        print(out)
        any_flag = any_flag or "RED FLAGS" in out
    return 1 if any_flag else 0


if __name__ == "__main__":
    sys.exit(main())
