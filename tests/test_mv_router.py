"""Materialized-view routing (plans/mv_router.py): a covered aggregate
request is answered from the rollup with results EQUAL to the fact-table
aggregation; uncovered requests fall back."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.plans.mv_router import (
    AggRequest,
    RollupSpec,
    route,
)


def _setup(spark, sf_smoke):
    fact = t(spark, sf_smoke, "events").select(
        F.concat(F.lit("tenant-"), F.pmod("user_id", F.lit(4)).cast("string")).alias("tenant"),
        F.col("ts").cast("date").alias("day"),
        "event_type",
        "value",
    )
    rollup = fact.groupBy("tenant", "day").agg(
        F.sum("value").alias("sum_value"),
        F.count("value").alias("cnt_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    spec = RollupSpec(
        name="daily",
        df=rollup,
        dims=("tenant", "day"),
        partials={
            "sum_value": ("sum", "value"),
            "cnt_value": ("count", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
    )
    return fact, spec


def _rows(df):
    out = []
    for r in df.collect():
        row = []
        for v in r:
            row.append(round(v, 6) if isinstance(v, float) else v)
        out.append(tuple(row))
    return sorted(out)


def test_covered_request_routes_to_rollup_and_matches_fact(spark, sf_smoke):
    fact, spec = _setup(spark, sf_smoke)
    req = AggRequest(
        dims=("tenant",),
        aggs={
            "total": ("sum", "value"),
            "n": ("count", "value"),
            "lo": ("min", "value"),
            "hi": ("max", "value"),
            "mean": ("avg", "value"),
        },
    )
    routed, used = route(req, [spec], fact)
    assert used == "daily"
    direct, none_used = route(req, [], fact)
    assert none_used is None
    assert _rows(routed) == _rows(direct)


def test_dim_filter_applies_on_rollup(spark, sf_smoke):
    fact, spec = _setup(spark, sf_smoke)
    req = AggRequest(
        dims=("tenant",),
        aggs={"total": ("sum", "value")},
        filter=F.col("tenant") == "tenant-1",
        filter_cols=("tenant",),
    )
    routed, used = route(req, [spec], fact)
    assert used == "daily"
    rows = routed.collect()
    assert len(rows) == 1 and rows[0]["tenant"] == "tenant-1"
    direct, _ = route(req, [], fact)
    assert _rows(routed) == _rows(direct)


def test_uncovered_requests_fall_back_to_fact(spark, sf_smoke):
    fact, spec = _setup(spark, sf_smoke)
    # dim not in the rollup
    by_type = AggRequest(dims=("event_type",), aggs={"total": ("sum", "value")})
    _, used = route(by_type, [spec], fact)
    assert used is None
    # aggregate not derivable from stored partials
    distinct_users = AggRequest(dims=("tenant",), aggs={"d": ("count_distinct", "value")})
    _, used2 = route(distinct_users, [spec], fact)
    assert used2 is None
    # filter on a non-rollup column
    filtered = AggRequest(
        dims=("tenant",),
        aggs={"total": ("sum", "value")},
        filter=F.col("event_type") == "click",
        filter_cols=("event_type",),
    )
    _, used3 = route(filtered, [spec], fact)
    assert used3 is None
