"""Round-7 graded-window packs: SaaS-ops analytics + sketch/stats.

Gives nine more SURVEY §2 rows a hard driver verdict in two slots:

  ops_pack     — ordered funnel (view→click→purchase), cohort retention
                 triangle, per-tenant usage metering + cost attribution,
                 and per-tenant usage-anomaly z-scores (4 §2 rows; all
                 were local-oracle-only before this round)
  sketch_pack2 — portable count-min sketch (build + probe + measured
                 overestimate), exact bitmap count-distinct, Benford
                 first-digit audit, CCNet perplexity buckets, and
                 curriculum phase assignment (5 §2 rows)

Slots are freed by `dedup_exact` (its hash-groupBy exact-dedup shape
stays driver-exercised through `stream_dedup_batch_equiv`'s
dropDuplicates batch-equivalence slot and `dedup_pack`'s canonical-
survivor branch) and `stream_static_join` (a broadcast equi-join +
groupBy, the exact plan shape `join_equi_variants` grades; its real
streaming form stays pinned in tests/test_streaming.py). Both remain
oracle-green at the tail head.

Packs reuse the already-oracle-green component queries verbatim: the
Spark side calls the component `spark_fn` and reduces its result; the
oracle wraps the component oracle SQL as a subquery and applies the
same reduction — so a pack can only diverge if a component does.
Unified output schema (kind, k, n, val), the r4_mgmt_pack convention.
Double reductions go through dsum/sql_dsum (decimal(38,6) quantized,
order-independent) so no float-merge-order wobble enters the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    ext_llm_wave3,
    ext_llm_wave4,
    saas_ops,
    saas_ops_wave2,
    saas_ops_wave3,
    sketches_variant,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import dsum, sql_dsum


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


@register(
    "ops_pack",
    oracle=f"""
        WITH funnel AS ({_oracle("funnel_view_click_purchase")}),
        cohort AS ({_oracle("cohort_retention")}),
        meter AS ({_oracle("tenant_usage_metering")}),
        anom AS ({_oracle("tenant_usage_anomaly")}),
        funnel_rows AS (
            SELECT 'funnel' AS kind, 'view' AS k, n_view AS n,
                   CAST(n_view AS DOUBLE) AS val FROM funnel
            UNION ALL
            SELECT 'funnel', 'view_click', n_view_click,
                   CAST(n_view_click AS DOUBLE) FROM funnel
            UNION ALL
            SELECT 'funnel', 'full', n_full_funnel,
                   CAST(n_full_funnel AS DOUBLE) FROM funnel),
        cohort_rows AS (
            SELECT 'cohort' AS kind, CAST(week_offset AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   CAST(SUM(active_users *
                            (1 + DATE_DIFF('day', DATE '2024-01-01', cohort_day)))
                        AS DOUBLE) AS val
            FROM cohort GROUP BY 2),
        meter_rows AS (
            SELECT 'meter' AS kind, tenant_id AS k,
                   CAST(SUM(n_events) AS BIGINT) AS n,
                   ROUND({sql_dsum("metered_value")}
                         + (CAST(SUM(payload_bytes) AS BIGINT) % 1000003)
                         + SUM(active_users) * 13
                         + {sql_dsum("day_cost_share")} * 1000, 6) AS val
            FROM meter GROUP BY 2),
        anom_rows AS (
            SELECT 'anomaly' AS kind, tenant_id AS k,
                   CAST(SUM(n_events) AS BIGINT) AS n,
                   ROUND({sql_dsum("COALESCE(z, 0)")}
                         + 1000 * SUM(CASE WHEN is_anomaly THEN 1 ELSE 0 END),
                         6) AS val
            FROM anom GROUP BY 2)
        SELECT kind, k, n, val FROM funnel_rows
        UNION ALL SELECT kind, k, n, val FROM cohort_rows
        UNION ALL SELECT kind, k, n, val FROM meter_rows
        UNION ALL SELECT kind, k, n, val FROM anom_rows
        ORDER BY kind, k
    """,
    tags=("B10", "saas", "ops", "pack"),
    doc="Round-7 SaaS-ops analytics pack — one driver slot covering four "
    "§2 rows: the ordered view→click→purchase funnel (stage survivor "
    "counts), the cohort retention triangle (per week-offset cohort "
    "count + date-weighted active-user checksum), per-tenant usage "
    "metering with windowed cost attribution (event/user counts, "
    "metered value, payload bytes, day cost share), and per-tenant "
    "usage-anomaly z-scores (z mass + anomaly-flag count). Component "
    "spark_fns and oracles reused verbatim — the pack can only diverge "
    "if a component does.",
)
def ops_pack(spark, sf_dir):
    funnel = _fn("funnel_view_click_purchase")(spark, sf_dir)
    funnel_rows = (
        funnel.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("view").alias("k"), F.col("n_view").alias("n")
                    ),
                    F.struct(
                        F.lit("view_click").alias("k"),
                        F.col("n_view_click").alias("n"),
                    ),
                    F.struct(
                        F.lit("full").alias("k"), F.col("n_full_funnel").alias("n")
                    ),
                )
            ).alias("s")
        )
        .select(
            F.lit("funnel").alias("kind"),
            F.col("s.k").alias("k"),
            F.col("s.n").alias("n"),
            F.col("s.n").cast("double").alias("val"),
        )
    )
    cohort = _fn("cohort_retention")(spark, sf_dir)
    cohort_rows = (
        cohort.groupBy(F.col("week_offset").cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col("active_users")
                * (1 + F.datediff(F.col("cohort_day"), F.lit("2024-01-01")))
            )
            .cast("double")
            .alias("val"),
        )
        .select(F.lit("cohort").alias("kind"), "k", "n", "val")
    )
    meter = _fn("tenant_usage_metering")(spark, sf_dir)
    meter_rows = (
        meter.groupBy(F.col("tenant_id").alias("k"))
        .agg(
            F.sum("n_events").cast("bigint").alias("n"),
            F.round(
                dsum("metered_value")
                + F.pmod(F.sum("payload_bytes").cast("bigint"), F.lit(1000003))
                + F.sum("active_users") * 13
                + dsum("day_cost_share") * 1000,
                6,
            ).alias("val"),
        )
        .select(F.lit("meter").alias("kind"), "k", "n", "val")
    )
    anom = _fn("tenant_usage_anomaly")(spark, sf_dir)
    anom_rows = (
        anom.groupBy(F.col("tenant_id").alias("k"))
        .agg(
            F.sum("n_events").cast("bigint").alias("n"),
            F.round(
                dsum(F.coalesce(F.col("z"), F.lit(0.0)))
                + 1000 * F.sum(F.when(F.col("is_anomaly"), 1).otherwise(0)),
                6,
            ).alias("val"),
        )
        .select(F.lit("anomaly").alias("kind"), "k", "n", "val")
    )
    return (
        funnel_rows.unionByName(cohort_rows)
        .unionByName(meter_rows)
        .unionByName(anom_rows)
        .orderBy("kind", "k")
    )


@register(
    "sketch_pack2",
    oracle=f"""
        WITH cms AS ({_oracle("sketch_countmin_portable")}),
        bmap AS ({_oracle("agg_bitmap_exact_distinct")}),
        benford AS ({_oracle("agg_benford_digits")}),
        ccnet AS ({_oracle("text_ccnet_buckets")}),
        curr AS ({_oracle("llm_curriculum_phases")}),
        cms_rows AS (
            SELECT 'cms' AS kind, split_part(key, '/', 1) AS k,
                   COUNT(*) AS n,
                   CAST(SUM(exact_n * 3 + overestimate * 7) AS DOUBLE) AS val
            FROM cms GROUP BY 2),
        bmap_rows AS (
            SELECT 'bitmap' AS kind, event_type AS k, distinct_users AS n,
                   CAST(distinct_users AS DOUBLE) AS val
            FROM bmap),
        benford_rows AS (
            SELECT 'benford' AS kind, CAST(digit AS VARCHAR) AS k, n,
                   ROUND(share + 7 * benford_p + 31 * abs_dev, 6) AS val
            FROM benford),
        ccnet_rows AS (
            SELECT 'ccnet' AS kind, bucket AS k, n_docs AS n,
                   ROUND(nll_mass + min_doc * 7 + max_doc, 6) AS val
            FROM ccnet),
        curr_rows AS (
            SELECT 'curriculum' AS kind, CAST(phase AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   ROUND({sql_dsum("quality_score")}
                         + (CAST(SUM(doc_id) AS BIGINT) % 1000003), 6) AS val
            FROM curr GROUP BY 2)
        SELECT kind, k, n, val FROM cms_rows
        UNION ALL SELECT kind, k, n, val FROM bmap_rows
        UNION ALL SELECT kind, k, n, val FROM benford_rows
        UNION ALL SELECT kind, k, n, val FROM ccnet_rows
        UNION ALL SELECT kind, k, n, val FROM curr_rows
        ORDER BY kind, k
    """,
    tags=("B4", "B10", "sketch", "pack"),
    doc="Round-7 sketch/stats pack — one driver slot covering five §2 "
    "rows: the portable count-min sketch (per-event-type probe counts "
    "+ exact/overestimate checksum, so the CMS error behavior is in "
    "the hash), exact bitmap count-distinct per event type, the "
    "Benford first-digit audit (share/expectation/deviation), CCNet "
    "perplexity buckets (tercile routing + NLL mass + doc-id bounds), "
    "and curriculum phase assignment (per-phase count, quality mass, "
    "doc-membership checksum). Component spark_fns and oracles reused "
    "verbatim — the pack can only diverge if a component does.",
)
def sketch_pack2(spark, sf_dir):
    cms = _fn("sketch_countmin_portable")(spark, sf_dir)
    cms_rows = (
        cms.groupBy(F.split_part(F.col("key"), F.lit("/"), F.lit(1)).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("exact_n") * 3 + F.col("overestimate") * 7)
            .cast("double")
            .alias("val"),
        )
        .select(F.lit("cms").alias("kind"), "k", "n", "val")
    )
    bmap = _fn("agg_bitmap_exact_distinct")(spark, sf_dir)
    bmap_rows = bmap.select(
        F.lit("bitmap").alias("kind"),
        F.col("event_type").alias("k"),
        F.col("distinct_users").alias("n"),
        F.col("distinct_users").cast("double").alias("val"),
    )
    benford = _fn("agg_benford_digits")(spark, sf_dir)
    benford_rows = benford.select(
        F.lit("benford").alias("kind"),
        F.col("digit").cast("string").alias("k"),
        F.col("n"),
        F.round(
            F.col("share") + 7 * F.col("benford_p") + 31 * F.col("abs_dev"), 6
        ).alias("val"),
    )
    ccnet = _fn("text_ccnet_buckets")(spark, sf_dir)
    ccnet_rows = ccnet.select(
        F.lit("ccnet").alias("kind"),
        F.col("bucket").alias("k"),
        F.col("n_docs").alias("n"),
        F.round(
            F.col("nll_mass") + F.col("min_doc") * 7 + F.col("max_doc"), 6
        ).alias("val"),
    )
    curr = _fn("llm_curriculum_phases")(spark, sf_dir)
    curr_rows = (
        curr.groupBy(F.col("phase").cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                dsum("quality_score")
                + F.pmod(F.sum("doc_id").cast("bigint"), F.lit(1000003)),
                6,
            ).alias("val"),
        )
        .select(F.lit("curriculum").alias("kind"), "k", "n", "val")
    )
    return (
        cms_rows.unionByName(bmap_rows)
        .unionByName(benford_rows)
        .unionByName(ccnet_rows)
        .unionByName(curr_rows)
        .orderBy("kind", "k")
    )
