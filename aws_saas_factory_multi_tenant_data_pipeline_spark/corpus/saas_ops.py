"""SaaS-operations analytics the reference's operators run over the lake:
per-tenant usage metering / cost attribution, and the mergeable
partial-aggregate algebra behind incremental rollup maintenance
(``lake.maintain_rollup``).

The reference bills by tenant (its whole point is tenant isolation down to
the partition; SURVEY.md §1) but ships no metering query — these are the
queries its operators would write first. Tenant derivation follows the
corpus convention: ``tenant-<user_id % 4>``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import dsum, sql_dsum


@register(
    "tenant_usage_metering",
    oracle=f"""
        WITH usage AS (
            SELECT 'tenant-' || CAST(user_id % 4 AS VARCHAR) AS tenant_id,
                   CAST(ts AS DATE) AS day,
                   COUNT(*) AS n_events,
                   COUNT(DISTINCT user_id) AS active_users,
                   {sql_dsum('value')} AS metered_value,
                   CAST(SUM(LENGTH(props) + 64) AS BIGINT) AS payload_bytes
            FROM events
            GROUP BY 1, 2)
        SELECT tenant_id, day, n_events, active_users, metered_value,
               payload_bytes,
               CAST(payload_bytes AS DOUBLE)
                 / SUM(payload_bytes) OVER (PARTITION BY day) AS day_cost_share
        FROM usage
        ORDER BY tenant_id, day
    """,
    tags=("EXT", "A7", "B4", "B5"),
    doc="Per-tenant daily usage metering + cost attribution: events, active "
    "users, metered value, payload bytes (64 B envelope overhead per "
    "record, mirroring the Kinesis record envelope), and each tenant's "
    "share of the day's bytes via a windowed total. Scale: one shuffle on "
    "(tenant, day) for the agg; the day-window runs over the tiny "
    "aggregated frame, not the fact table.",
)
def tenant_usage_metering(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    usage = (
        e.select(
            F.concat(F.lit("tenant-"), F.pmod("user_id", F.lit(4)).cast("string")).alias(
                "tenant_id"
            ),
            F.col("ts").cast("date").alias("day"),
            "user_id",
            "value",
            (F.length("props") + F.lit(64)).alias("rec_bytes"),
        )
        .groupBy("tenant_id", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("active_users"),
            dsum("value").alias("metered_value"),
            F.sum("rec_bytes").cast("bigint").alias("payload_bytes"),
        )
    )
    day_total = Window.partitionBy("day")
    return usage.withColumn(
        "day_cost_share",
        F.col("payload_bytes").cast("double") / F.sum("payload_bytes").over(day_total),
    ).orderBy("tenant_id", "day")


@register(
    "rollup_partial_merge",
    oracle=f"""
        WITH full_recompute AS (
            SELECT 'tenant-' || CAST(user_id % 4 AS VARCHAR) AS tenant_id,
                   CAST(ts AS DATE) AS day,
                   COUNT(*) AS n_events,
                   {sql_dsum('value')} AS total_value
            FROM events
            GROUP BY 1, 2)
        SELECT tenant_id, day, n_events, total_value
        FROM full_recompute
        ORDER BY tenant_id, day
    """,
    tags=("EXT", "B4"),
    doc="Incremental-rollup algebra as a gradable dataflow: the fact rows "
    "are split into a base batch and a late-arriving delta (event_id % 7), "
    "each aggregated to PARTIAL (count, decimal-sum) rollups "
    "independently, then merged by re-aggregation — the exact merge "
    "``lake.maintain_rollup`` relies on. The oracle states the full "
    "recompute, so any non-mergeable drift in the partial algebra breaks "
    "the hash. Scale: this is why a 100 TB rollup never re-reads history — "
    "partials are unioned and re-summed, touching only delta partitions.",
)
def rollup_partial_merge(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        F.concat(F.lit("tenant-"), F.pmod("user_id", F.lit(4)).cast("string")).alias("tenant_id"),
        F.col("ts").cast("date").alias("day"),
        "event_id",
        "value",
    )
    base = e.where(F.pmod("event_id", F.lit(7)) != 0)
    delta = e.where(F.pmod("event_id", F.lit(7)) == 0)

    def partial(df):
        # decimal partial sums stay decimal until the final merge so the
        # re-aggregation is order-independent (FIXTURES.md determinism)
        return df.groupBy("tenant_id", "day").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("value_partial"),
        )

    merged = (
        partial(base)
        .unionByName(partial(delta))
        .groupBy("tenant_id", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_partial").cast("double").alias("total_value"),
        )
    )
    return merged.orderBy("tenant_id", "day")


@register(
    "funnel_view_click_purchase",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY 1),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
            WHERE e.event_type = 'click' GROUP BY 1),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
            WHERE e.event_type = 'purchase' GROUP BY 1)
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_view_click,
               (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
    tags=("EXT", "B3", "B4"),
    doc="Ordered funnel (view → click → purchase): per user, the first "
    "view, the first click strictly after it, the first purchase strictly "
    "after that — stage counts of users surviving each step. Scale: all "
    "three aggregations and both joins are keyed on user_id, so one "
    "hash-partitioning is reused across the whole cascade; no stage ever "
    "widens beyond the per-user event history.",
)
def funnel_view_click_purchase(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = [
        df.agg(F.count("*").cast("bigint").alias(name))
        for df, name in ((v, "n_view"), (c, "n_view_click"), (p, "n_full_funnel"))
    ]
    out = counts[0].crossJoin(F.broadcast(counts[1])).crossJoin(F.broadcast(counts[2]))
    return out


@register(
    "cohort_retention",
    oracle="""
        WITH firstseen AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY 1)
        SELECT cohort_day,
               CAST(FLOOR(DATE_DIFF('day', cohort_day, CAST(e.ts AS DATE)) / 7)
                    AS BIGINT) AS week_offset,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e JOIN firstseen f ON e.user_id = f.user_id
        GROUP BY 1, 2
        ORDER BY cohort_day, week_offset
    """,
    tags=("EXT", "B3", "B4"),
    doc="Cohort retention: users grouped by first-seen day, activity "
    "counted per week offset since the cohort day — the standard "
    "retention triangle. Scale: first-seen is a user_id-keyed agg whose "
    "output is |users| rows; the join back is on the same key (shuffle "
    "reuse), and the retention agg output is |cohorts × weeks|, tiny.",
)
def cohort_retention(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    firstseen = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    return (
        e.join(firstseen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "week_offset")
    )


@register(
    "lake_upsert_roundtrip",
    oracle="""
        WITH base AS (
            SELECT c_custkey AS id, c_name AS name, c_acctbal AS val,
                   CAST(c_nationkey % 4 AS BIGINT) AS part
            FROM customer WHERE c_custkey <= 400),
        changes AS (
            SELECT c_custkey AS id, 'upd-' || c_name AS name, c_acctbal + 1000 AS val,
                   CAST(c_nationkey % 4 AS BIGINT) AS part,
                   (c_custkey % 10 = 0) AS is_deleted
            FROM customer WHERE c_custkey BETWEEN 101 AND 200
            UNION ALL
            SELECT c_custkey + 10000, 'new-' || c_name, c_acctbal,
                   CAST(c_nationkey % 4 AS BIGINT), FALSE
            FROM customer WHERE c_custkey BETWEEN 1 AND 50),
        merged AS (
            SELECT id, name, val, part FROM base
            WHERE id NOT IN (SELECT id FROM changes)
            UNION ALL
            SELECT id, name, val, part FROM changes WHERE NOT is_deleted)
        SELECT part, COUNT(*) AS n_rows,
               CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS val_sum,
               COUNT(*) FILTER (WHERE name LIKE 'upd-%') AS n_updated,
               COUNT(*) FILTER (WHERE name LIKE 'new-%') AS n_inserted
        FROM merged
        GROUP BY part
        ORDER BY part
    """,
    tags=("B1", "B10"),
    doc="MERGE-style keyed upsert roundtrip (lake.upsert_partitioned): "
    "build a partitioned lake table from customer, apply a deterministic "
    "changeset (updates + inserts + every-10th-key deletes), read the "
    "lake back and summarize per partition. The oracle computes the same "
    "merge relationally — proving the partition-scoped anti-join + "
    "dynamic-overwrite write path equals the declarative MERGE semantics. "
    "Only changeset-touched partitions are rewritten (bounded driver-side "
    "key list + static pruning, as maintain_rollup does).",
)
def lake_upsert_roundtrip(spark, sf_dir):
    import os as _os

    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus.sources_sinks import _SCRATCH
    from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import dsum
    from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import upsert_partitioned

    c = t(spark, sf_dir, "customer")
    base = c.where(F.col("c_custkey") <= 400).select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("val"),
        F.pmod("c_nationkey", F.lit(4)).cast("long").alias("part"),
    )
    root = _os.path.join(_SCRATCH, "upsert_lake")
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    base.write.partitionBy("part").parquet(root)
    updates = c.where(F.col("c_custkey").between(101, 200)).select(
        F.col("c_custkey").alias("id"),
        F.concat(F.lit("upd-"), F.col("c_name")).alias("name"),
        (F.col("c_acctbal") + 1000).alias("val"),
        F.pmod("c_nationkey", F.lit(4)).cast("long").alias("part"),
        (F.pmod("c_custkey", F.lit(10)) == 0).alias("is_deleted"),
    )
    inserts = c.where(F.col("c_custkey").between(1, 50)).select(
        (F.col("c_custkey") + 10000).alias("id"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("name"),
        F.col("c_acctbal").alias("val"),
        F.pmod("c_nationkey", F.lit(4)).cast("long").alias("part"),
        F.lit(False).alias("is_deleted"),
    )
    upsert_partitioned(
        spark,
        root,
        updates.unionByName(inserts),
        key_cols=["id"],
        partition_cols=["part"],
        delete_col="is_deleted",
    )
    back = spark.read.parquet(root)
    return (
        back.groupBy("part")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("val").alias("val_sum"),
            F.count(F.when(F.col("name").like("upd-%"), 1)).alias("n_updated"),
            F.count(F.when(F.col("name").like("new-%"), 1)).alias("n_inserted"),
        )
        .orderBy("part")
    )


@register(
    "dim_scd2_apply",
    oracle="""
        WITH current_dim AS (
            SELECT c_custkey AS id, c_mktsegment AS segment,
                   TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
                   CAST(NULL AS TIMESTAMP) AS valid_to,
                   TRUE AS is_current
            FROM customer WHERE c_custkey <= 300),
        changes AS (
            SELECT c_custkey AS id, 'wave1-' || c_mktsegment AS segment,
                   TIMESTAMP '1996-06-01 00:00:00' AS effective_ts
            FROM customer WHERE c_custkey <= 300 AND c_custkey % 3 = 0
            UNION ALL
            SELECT c_custkey, 'wave2-' || c_mktsegment,
                   TIMESTAMP '1997-09-15 00:00:00'
            FROM customer WHERE c_custkey <= 300 AND c_custkey % 6 = 0),
        new_versions AS (
            SELECT id, segment,
                   effective_ts AS valid_from,
                   LEAD(effective_ts) OVER (PARTITION BY id ORDER BY effective_ts)
                       AS valid_to,
                   LEAD(effective_ts) OVER (PARTITION BY id ORDER BY effective_ts)
                       IS NULL AS is_current
            FROM changes),
        first_change AS (
            SELECT id, MIN(effective_ts) AS closes_at FROM changes GROUP BY id),
        closed AS (
            SELECT d.id, d.segment,
                   d.valid_from,
                   CASE WHEN d.is_current AND f.closes_at IS NOT NULL
                        THEN f.closes_at ELSE d.valid_to END AS valid_to,
                   CASE WHEN f.closes_at IS NOT NULL THEN FALSE
                        ELSE d.is_current END AS is_current
            FROM current_dim d LEFT JOIN first_change f USING (id)),
        dim AS (
            SELECT * FROM closed UNION ALL SELECT * FROM new_versions)
        SELECT id, segment,
               STRFTIME(valid_from, '%Y-%m-%d %H:%M:%S') AS vf,
               COALESCE(STRFTIME(valid_to, '%Y-%m-%d %H:%M:%S'), 'open') AS vt,
               is_current
        FROM dim
        ORDER BY id, vf
    """,
    tags=("B10", "B4"),
    doc="SCD type-2 dimension versioning (operators.scd.scd2_apply): two "
    "change waves over a customer-segment dim — every change becomes a "
    "[valid_from, valid_to) version, the key's open row closes at its "
    "first change, unchanged keys pass through, closed history is "
    "immutable. The oracle replicates the same window+join algebra; "
    "timestamps rendered as strings ('open' for null) for hash parity. "
    "One key shuffle shared by the window and the close-join.",
)
def dim_scd2_apply(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.scd import scd2_apply

    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    current = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    wave1 = c.where(F.pmod("c_custkey", F.lit(3)) == 0).select(
        F.col("c_custkey").alias("id"),
        F.concat(F.lit("wave1-"), F.col("c_mktsegment")).alias("segment"),
        F.lit("1996-06-01 00:00:00").cast("timestamp").alias("effective_ts"),
    )
    wave2 = c.where(F.pmod("c_custkey", F.lit(6)) == 0).select(
        F.col("c_custkey").alias("id"),
        F.concat(F.lit("wave2-"), F.col("c_mktsegment")).alias("segment"),
        F.lit("1997-09-15 00:00:00").cast("timestamp").alias("effective_ts"),
    )
    dim = scd2_apply(current, wave1.unionByName(wave2), key_cols=["id"])
    return dim.select(
        "id",
        "segment",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("vf"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("open")
        ).alias("vt"),
        "is_current",
    ).orderBy("id", "vf")


@register(
    "table_constraints_check",
    oracle="""
        WITH base AS (
            SELECT COUNT(*) AS total,
                   COUNT(*) FILTER (WHERE o_custkey IS NULL) AS v_nn,
                   COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')
                                       OR o_orderstatus IS NULL) AS v_av,
                   COUNT(*) FILTER (WHERE o_totalprice NOT BETWEEN 0 AND 100000
                                       OR o_totalprice IS NULL) AS v_rng,
                   COUNT(*) FILTER (WHERE NOT COALESCE(
                       o_orderpriority SIMILAR TO '[1-5]-[A-Z]+', FALSE)) AS v_re,
                   COUNT(*) FILTER (WHERE NOT COALESCE(
                       year(o_orderdate) BETWEEN 1992 AND 1998, FALSE)) AS v_ex
            FROM orders),
        dups AS (
            SELECT COALESCE(SUM(n - 1), 0) AS v_uq
            FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
            WHERE n > 1)
        SELECT "constraint", kind, violations, total_rows, (violations = 0) AS passed
        FROM (
            SELECT 'accepted_values(o_orderstatus)' AS "constraint",
                   'accepted_values' AS kind, CAST(v_av AS BIGINT) AS violations,
                   CAST(total AS BIGINT) AS total_rows FROM base
            UNION ALL
            SELECT 'in_range(o_totalprice)', 'in_range', CAST(v_rng AS BIGINT),
                   CAST(total AS BIGINT) FROM base
            UNION ALL
            SELECT 'matches(o_orderpriority)', 'matches', CAST(v_re AS BIGINT),
                   CAST(total AS BIGINT) FROM base
            UNION ALL
            SELECT 'not_null(o_custkey)', 'not_null', CAST(v_nn AS BIGINT),
                   CAST(total AS BIGINT) FROM base
            UNION ALL
            SELECT 'orderdate_in_tpch_years', 'expression', CAST(v_ex AS BIGINT),
                   CAST(total AS BIGINT) FROM base
            UNION ALL
            SELECT 'row_count[1000,None]', 'row_count',
                   CASE WHEN total >= 1000 THEN 0 ELSE 1 END,
                   CAST(total AS BIGINT) FROM base
            UNION ALL
            SELECT 'unique(o_orderkey)', 'unique', CAST(v_uq AS BIGINT),
                   CAST(total AS BIGINT) FROM dups CROSS JOIN base
        )
        ORDER BY "constraint"
    """,
    tags=("B10", "B4"),
    doc="Declarative data-quality gate (operators.constraints): not-null, "
    "accepted-values, range, regex, custom-expression, row-count and "
    "uniqueness checks over orders — all row-level rules fused into ONE "
    "scan + one aggregate (adding a rule adds a column, not a job); "
    "uniqueness adds its keyed aggregate. The in_range ceiling is set so "
    "some rows violate: the report itself (violation counts) is the "
    "oracle-compared output.",
)
def table_constraints_check(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.constraints import (
        accepted_values,
        check_constraints,
        expression,
        in_range,
        matches,
        not_null,
        row_count,
        unique,
    )

    o = t(spark, sf_dir, "orders")
    report = check_constraints(
        o,
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            in_range("o_totalprice", 0, 100000),
            matches("o_orderpriority", r"^[1-5]-[A-Z]+$"),
            expression(
                "orderdate_in_tpch_years",
                F.year("o_orderdate").between(1992, 1998),
            ),
            row_count(min_rows=1000),
            unique(["o_orderkey"]),
        ],
    )
    return report
