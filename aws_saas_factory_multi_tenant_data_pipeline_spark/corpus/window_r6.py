"""Round-6 graded-window packs.

The driver grades a 50-slot prefix of the registry; after round 5 the
corpus-selection family (leakage-safe split, token-budget selection,
DSIR importance, tier-dependent quota) and a time-series/statistics
family (as-of tolerance join, equi-depth histogram, feature hashing,
vocabulary OOV audit) were oracle-green locally but sat past slot 50.
These two packs give eight more SURVEY §2 rows a hard driver verdict,
in slots freed by `filter_predicates` (its predicate shapes are
exercised by virtually every other slot — every pack filters — and by
`tenant_scoped_scan`'s pruned scan) and `collect_list_sorted` (ordered
collect semantics are also driver-covered through `fn_scalar_pack`'s
array branch and `llm_pipeline_pack`'s sequence packing).

Packs reuse the already-oracle-green component queries verbatim: the
Spark side calls the component `spark_fn` and reduces its result; the
oracle wraps the component oracle SQL as a subquery and applies the
same reduction — so a pack can only diverge if a component does.
Unified output schema (kind, k, n, val), the r4_mgmt_pack convention.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    aggregates,
    ext_llm_wave3,
    joins,
    saas_ops_wave3,
    wave_r6,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import dsum, sql_dsum


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


@register(
    "selection_pack",
    oracle=f"""
        WITH leak AS ({_oracle("llm_leakage_safe_split")}),
        budget AS ({_oracle("llm_budget_select")}),
        dsir AS ({_oracle("llm_dsir_importance")}),
        quota AS ({_oracle("tenant_tiered_quota")}),
        leak_rows AS (
            SELECT 'leak' AS kind, split AS k, n_docs AS n,
                   CAST(n_clusters * 1000003 + doc_sum AS DOUBLE) AS val
            FROM leak),
        budget_rows AS (
            SELECT 'budget' AS kind, source AS k, n_docs AS n,
                   CAST(n_selected * 1000003 + tokens_selected AS DOUBLE) AS val
            FROM budget),
        dsir_rows AS (
            SELECT 'dsir' AS kind, CAST(doc_id % 8 AS VARCHAR) AS k,
                   CAST(SUM(n_tokens) AS BIGINT) AS n,
                   ROUND({sql_dsum("importance")}, 6) AS val
            FROM dsir GROUP BY 2),
        quota_rows AS (
            SELECT 'quota' AS kind, tenant_id || ':' || tier AS k,
                   accepted AS n, CAST(rejected AS DOUBLE) AS val
            FROM quota)
        SELECT kind, k, n, val FROM leak_rows
        UNION ALL SELECT kind, k, n, val FROM budget_rows
        UNION ALL SELECT kind, k, n, val FROM dsir_rows
        UNION ALL SELECT kind, k, n, val FROM quota_rows
        ORDER BY kind, k
    """,
    tags=("B10", "selection", "pack"),
    doc="Round-6 corpus-selection pack — one driver slot covering four "
    "§2 rows: leakage-safe cluster-atomic splits (per-split doc counts, "
    "cluster counts, id sums), token-budget selection (per-source "
    "selected counts + token totals under the quantized boundary "
    "search), DSIR importance resampling (token totals + decimal-exact "
    "importance sums per id bucket), and tier-dependent quota admission "
    "(accepted/rejected per tenant:tier). Each branch calls the "
    "component query's own spark_fn and the oracle wraps the component "
    "oracle verbatim — the pack can only diverge if a component does.",
)
def selection_pack(spark, sf_dir):
    leak = _fn("llm_leakage_safe_split")(spark, sf_dir)
    leak_rows = leak.select(
        F.lit("leak").alias("kind"),
        F.col("split").alias("k"),
        F.col("n_docs").alias("n"),
        (F.col("n_clusters") * 1000003 + F.col("doc_sum"))
        .cast("double")
        .alias("val"),
    )
    budget = _fn("llm_budget_select")(spark, sf_dir)
    budget_rows = budget.select(
        F.lit("budget").alias("kind"),
        F.col("source").alias("k"),
        F.col("n_docs").alias("n"),
        (F.col("n_selected") * 1000003 + F.col("tokens_selected"))
        .cast("double")
        .alias("val"),
    )
    dsir = _fn("llm_dsir_importance")(spark, sf_dir)
    dsir_rows = (
        dsir.groupBy((F.col("doc_id") % 8).cast("string").alias("k"))
        .agg(
            F.sum("n_tokens").cast("bigint").alias("n"),
            F.round(dsum("importance"), 6).alias("val"),
        )
        .select(F.lit("dsir").alias("kind"), "k", "n", "val")
    )
    quota = _fn("tenant_tiered_quota")(spark, sf_dir)
    quota_rows = quota.select(
        F.lit("quota").alias("kind"),
        F.concat(F.col("tenant_id"), F.lit(":"), F.col("tier")).alias("k"),
        F.col("accepted").alias("n"),
        F.col("rejected").cast("double").alias("val"),
    )
    return (
        leak_rows.unionByName(budget_rows)
        .unionByName(dsir_rows)
        .unionByName(quota_rows)
        .orderBy("kind", "k")
    )


@register(
    "ts_stats_pack",
    oracle=f"""
        WITH asof_q AS ({_oracle("join_asof_tolerance")}),
        hist AS ({_oracle("agg_histogram_equidepth")}),
        feat AS ({_oracle("text_feature_hashing")}),
        oov AS ({_oracle("vocab_oov_rate")}),
        asof_rows AS (
            SELECT 'asof' AS kind, CAST(user_id % 8 AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   CAST(SUM(((click_us % 1000003) * 31
                             + COALESCE(purchase_event_id, -1)) % 1000003)
                        AS DOUBLE) AS val
            FROM asof_q GROUP BY 2),
        hist_rows AS (
            SELECT 'hist' AS kind, CAST(bucket AS VARCHAR) AS k, n,
                   ROUND(lo + hi + total, 2) AS val
            FROM hist),
        feat_rows AS (
            SELECT 'feat' AS kind, CAST(doc_id % 8 AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   CAST(SUM((dot_check * 131 + n_tokens * 17 + n_dims_hit)
                            % 1000003) AS DOUBLE) AS val
            FROM feat GROUP BY 2),
        oov_rows AS (
            SELECT 'oov' AS kind, CAST(doc_id % 8 AS VARCHAR) AS k,
                   CAST(SUM(n_oov) AS BIGINT) AS n,
                   ROUND({sql_dsum("oov_rate")}, 6) AS val
            FROM oov GROUP BY 2)
        SELECT kind, k, n, val FROM asof_rows
        UNION ALL SELECT kind, k, n, val FROM hist_rows
        UNION ALL SELECT kind, k, n, val FROM feat_rows
        UNION ALL SELECT kind, k, n, val FROM oov_rows
        ORDER BY kind, k
    """,
    tags=("B3", "B4", "B10", "pack"),
    doc="Round-6 time-series/statistics pack — one driver slot covering "
    "four §2 rows: as-of join WITH tolerance (per-user-bucket row counts "
    "+ matched-purchase checksums — the matched event id pins which row "
    "the as-of picked), equi-depth histogram (per-bucket counts + "
    "lo/hi/decimal-total), feature hashing (per-bucket dot-product "
    "checksums), and vocabulary OOV audit (OOV counts + decimal-exact "
    "rate sums). Component spark_fns and oracles reused verbatim.",
)
def ts_stats_pack(spark, sf_dir):
    asof = _fn("join_asof_tolerance")(spark, sf_dir)
    asof_rows = (
        asof.groupBy((F.col("user_id") % 8).cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    (F.col("click_us") % 1000003) * 31
                    + F.coalesce(F.col("purchase_event_id"), F.lit(-1))
                )
                % 1000003
            )
            .cast("double")
            .alias("val"),
        )
        .select(F.lit("asof").alias("kind"), "k", "n", "val")
    )
    hist = _fn("agg_histogram_equidepth")(spark, sf_dir)
    hist_rows = hist.select(
        F.lit("hist").alias("kind"),
        F.col("bucket").cast("string").alias("k"),
        F.col("n"),
        F.round(F.col("lo") + F.col("hi") + F.col("total"), 2).alias("val"),
    )
    feat = _fn("text_feature_hashing")(spark, sf_dir)
    feat_rows = (
        feat.groupBy((F.col("doc_id") % 8).cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    F.col("dot_check") * 131
                    + F.col("n_tokens") * 17
                    + F.col("n_dims_hit")
                )
                % 1000003
            )
            .cast("double")
            .alias("val"),
        )
        .select(F.lit("feat").alias("kind"), "k", "n", "val")
    )
    oov = _fn("vocab_oov_rate")(spark, sf_dir)
    oov_rows = (
        oov.groupBy((F.col("doc_id") % 8).cast("string").alias("k"))
        .agg(
            F.sum("n_oov").cast("bigint").alias("n"),
            F.round(dsum("oov_rate"), 6).alias("val"),
        )
        .select(F.lit("oov").alias("kind"), "k", "n", "val")
    )
    return (
        asof_rows.unionByName(hist_rows)
        .unionByName(feat_rows)
        .unionByName(oov_rows)
        .orderBy("kind", "k")
    )
