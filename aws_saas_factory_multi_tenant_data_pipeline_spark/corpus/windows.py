"""B5 window functions: ranking, analytic (lag/lead/first/last), framed
aggregates (running/moving, ROWS and RANGE frames), top-k per group.

Window orderings always end in a unique key so every function is
deterministic; windowed double sums go through the decimal-exact cast.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t

DEC = "decimal(38,6)"


@register(
    "win_rank_family",
    oracle="""
        SELECT c_custkey, c_nationkey,
               ROW_NUMBER()   OVER w AS rn,
               RANK()         OVER w AS rnk,
               DENSE_RANK()   OVER w AS drnk,
               NTILE(4)       OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_custkey
    """,
    tags=("B5",),
    doc="row_number / rank / dense_rank / ntile / percent_rank.",
)
def win_rank_family(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    ).orderBy("c_custkey")


@register(
    "win_lag_lead",
    oracle="""
        SELECT o_custkey, o_orderkey,
               LAG(o_orderkey)      OVER w AS prev_order,
               LEAD(o_orderkey)     OVER w AS next_order,
               LAG(o_totalprice, 2, -1.0)  OVER w AS prev2_price,
               FIRST_VALUE(o_orderkey) OVER w AS first_order,
               LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("B5",),
    doc="lag / lead (with default), first_value / last_value with explicit frames.",
)
def win_lag_lead(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "win_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("B5",),
    doc="Running (cumulative) aggregates with ROWS frame.",
)
def win_running_sum(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spend"),
        F.count("*").over(w).alias("running_n"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "win_moving_frames",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_4row,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                    OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                          RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS qty_range5
        FROM lineitem
        WHERE l_suppkey <= 20
        ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    tags=("B5",),
    doc="Moving ROWS frame and numeric RANGE frame.",
)
def win_moving_frames(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_suppkey") <= 20)
    w_rows = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, W.currentRow)
    )
    # fractional RANGE bounds aren't expressible via Window.rangeBetween (int
    # API) — use the SQL frame syntax for that column
    qty_range5 = F.expr(
        "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (PARTITION BY l_suppkey "
        "ORDER BY l_quantity RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) AS DOUBLE)"
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast(DEC)).over(w_rows).cast("double").alias("qty_4row"),
        qty_range5.alias("qty_range5"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@register(
    "win_topk_per_group",
    oracle="""
        SELECT * FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer)
        WHERE rn <= 3
        ORDER BY c_nationkey, rn
    """,
    tags=("B5",),
    doc="Top-k per group: the canonical row_number ≤ k pattern.",
)
def win_topk_per_group(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    )


@register(
    "win_percentile_frames",
    oracle="""
        SELECT event_id, event_type,
               ROUND(median(value) OVER w, 6) AS med_11,
               ROUND(quantile_cont(value, 0.9) OVER w, 6) AS p90_11,
               ROUND(MIN(value) OVER w, 6) AS min_11
        FROM events
        WHERE event_id <= 2000
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    tags=("B5",),
    doc="Order-statistic aggregates over a moving window frame: median / "
    "p90 / min within the trailing 11 rows per event_type — the rolling-"
    "quantile monitoring shape (holistic window aggregates, exact "
    "percentile() ≡ DuckDB quantile_cont). Ordering made total with the "
    "event_id tiebreak so frames are identical across engines.",
)
def win_percentile_frames(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").where(F.col("event_id") <= 2000)
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, W.currentRow)
    )
    return e.select(
        "event_id",
        "event_type",
        F.round(F.percentile(F.col("value"), F.lit(0.5)).over(w), 6).alias("med_11"),
        F.round(F.percentile(F.col("value"), F.lit(0.9)).over(w), 6).alias("p90_11"),
        F.round(F.min("value").over(w), 6).alias("min_11"),
    ).orderBy("event_id")
