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

#: Queries whose plans legitimately contain a red-flag operator, with the
#: reason. A BroadcastNestedLoopJoin is fine when the broadcast side is a
#: SINGLE aggregate row (min/max frame, count, collapsed centroid array):
#: one row against N is a projection, not a quadratic join. It is also the
#: definition of the brute-force similarity baseline. Everything else
#: stays flagged — keep this list short and justified.
EXPECTED_FLAGS: dict[str, set[str]] = {
    # brute-force exact top-k: the crossJoin IS the documented baseline;
    # only the 8-row query side broadcasts (SCALE.md)
    "similarity_topk_cosine": {"BroadcastNestedLoopJoin", "CartesianProduct"},
    # exact mining baseline: src×tgt crossJoin with the (label==1) side
    # broadcast is the documented oracle form; the 100 TB path feeds
    # LSH/IVF candidates through the same margin scoring
    # (operators/similarity.py bitext_mine docstring)
    "similarity_bitext_margin": {"BroadcastNestedLoopJoin"},
    # 1-row broadcast of the global (min,max) frame for scale factors
    "lake_zorder_layout": {"BroadcastNestedLoopJoin"},
    # 1-row broadcast of the collapsed centroid array (zero-shuffle argmax)
    "dedup_semantic": {"BroadcastNestedLoopJoin"},
    # 1-row broadcast of the node count for the teleport term
    "graph_pagerank": {"BroadcastNestedLoopJoin"},
    # 1-row broadcast of the corpus doc count (idf denominator)
    "text_tfidf_top_terms": {"BroadcastNestedLoopJoin"},
    # 1-row broadcast of the global (N, avgdl) BM25 constants
    "text_bm25_rank": {"BroadcastNestedLoopJoin"},
    # pack queries inherit their components' 1-row aggregate broadcasts:
    # r4_mgmt/r5: the z-order global (min,max) frame; r5_pack2: PageRank's
    # node count; r6_pack: the Bloom dense-bit row + the HLL totals row
    "r4_mgmt_pack": {"BroadcastNestedLoopJoin"},
    "r5_pack": {"BroadcastNestedLoopJoin"},
    "r5_pack2": {"BroadcastNestedLoopJoin"},
    "r6_pack": {"BroadcastNestedLoopJoin"},
    # 1-row broadcasts: budget_select's global (min,max) bin frame and
    # DSIR's (target_total, raw_total) frame
    "selection_pack": {"BroadcastNestedLoopJoin"},
    "llm_budget_select": {"BroadcastNestedLoopJoin"},
    "llm_dsir_importance": {"BroadcastNestedLoopJoin"},
    # 1-row broadcast of the (rows, keys, max) totals frame
    "ops_skew_report": {"BroadcastNestedLoopJoin"},
    # inherits ops_skew_report's totals broadcast
    "r7_pack": {"BroadcastNestedLoopJoin"},
    # 1-row broadcasts of the collapsed per-query ADC lookup table and the
    # m·k codebook (operators/pq.py pq_encode/pq_topk_adc) — the
    # dedup_semantic pattern: one row against N is a projection
    "similarity_pq_adc": {"BroadcastNestedLoopJoin"},
    # 1-row broadcast of the collapsed query-token-matrix frame
    # (operators/similarity.py maxsim_rerank)
    "similarity_maxsim_rerank": {"BroadcastNestedLoopJoin"},
    # 1-row broadcast of the tiny query-signature set; the scan side is
    # one codegen'd bit_count(xor) per row (operators/pq.py
    # binary_hamming_topk)
    "similarity_binary_hamming": {"BroadcastNestedLoopJoin"},
    # inherits the three ANN components' 1-row broadcasts above
    "media_pack4": {"BroadcastNestedLoopJoin"},
}


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
    allowed = EXPECTED_FLAGS.get(name, set())
    flags = [f for f in RED_FLAGS if f in plan and f not in allowed]
    if (
        "BatchEvalPython" in plan
        and "BatchEvalPython" not in allowed
        and not name.startswith("udf_")  # the B9 survey rows ARE row-wise UDFs
    ):
        # no blanket tag exemption: a media/B10 query that regresses from
        # Arrow (MapInPandas/ArrowEvalPython) to row-at-a-time Python must
        # show up here unless its name is listed in EXPECTED_FLAGS
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
