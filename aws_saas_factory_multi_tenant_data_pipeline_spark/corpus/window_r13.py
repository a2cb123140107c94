"""Round-11 graded-window packs (r10 verdict "Next round" #1): hard
driver verdicts for the three round-10 tail-only rows, with ZERO
families losing driver coverage.

One new slot:

  doc_pipeline_pack — PDF text extraction (SURVEY 410), robots.txt
                      Sitemap discovery (411), keep-first duplicated-
                      span removal (412) — all were local-oracle-only
                      in r10.

The slot is freed by MERGING, not displacing (the r9/r10
win_family_pack / agg_distinct_grouping_pack convention):
`join_family_pack` wraps join_equi_variants + join_range_theta
verbatim — the B3 equi-join (all four types) and theta/range-join
families keep hard driver verdicts in one slot. The merged originals
move to the tail head, still oracle-green locally — no SURVEY §2 row
downgrades from driver ✅.

Packs reuse the already-oracle-green component queries verbatim: the
Spark side calls the component `spark_fn` and reduces its result; the
oracle wraps the component oracle SQL as a CTE and applies the same
reduction — a pack can only diverge if a component does. Unified
output schema (kind, k, n, val), the r4_mgmt_pack convention:
integers are stringified into `k` (integer → VARCHAR is exact and
engine-identical), ONE unscaled BIGINT rides in `n`, doubles ride in
`val`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    joins,
    wave_r12,
    window50,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


def _ks(*cols):
    """Spark side of the k-string reduction: integers/bools must
    already be cast to string."""
    return F.concat_ws(":", *cols).alias("k")


@register(
    "join_family_pack",
    oracle=f"""
        WITH eq AS ({_oracle("join_equi_variants")}),
        rt AS ({_oracle("join_range_theta")}),
        eq_rows AS (
            SELECT 'equi' AS kind,
                   concat_ws(':', op, CAST(k AS VARCHAR)) AS k,
                   CAST(cnt AS BIGINT) AS n, 0.0 AS val
            FROM eq),
        rt_rows AS (
            SELECT 'range' AS kind, CAST(bucket_id AS VARCHAR) AS k,
                   CAST(n_events AS BIGINT) AS n,
                   CAST(sum_value AS DOUBLE) AS val
            FROM rt)
        SELECT kind, k, n, val FROM eq_rows
        UNION ALL SELECT kind, k, n, val FROM rt_rows
        ORDER BY kind, k
    """,
    tags=("B3", "pack"),
    doc="B3 join-family pack — join_equi_variants (inner/left/right/"
    "full equi-joins as labeled branches) and join_range_theta (non-"
    "equi broadcast range join) merged into one driver slot; every "
    "output row of both components rides in the pack hash verbatim, so "
    "neither B3 family loses its driver verdict. Component spark_fns "
    "and oracles reused verbatim — the pack can only diverge if a "
    "component does.",
)
def join_family_pack(spark, sf_dir):
    eq = _fn("join_equi_variants")(spark, sf_dir)
    eq_rows = eq.select(
        F.lit("equi").alias("kind"),
        _ks(F.col("op"), F.col("k").cast("string")),
        F.col("cnt").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    rt = _fn("join_range_theta")(spark, sf_dir)
    rt_rows = rt.select(
        F.lit("range").alias("kind"),
        F.col("bucket_id").cast("string").alias("k"),
        F.col("n_events").cast("long").alias("n"),
        F.col("sum_value").cast("double").alias("val"),
    )
    return eq_rows.unionByName(rt_rows).orderBy("kind", "k")


@register(
    "doc_pipeline_pack",
    oracle=f"""
        WITH pdf AS ({_oracle("text_pdf_extract")}),
        rs AS ({_oracle("crawl_robots_sitemaps")}),
        sp AS ({_oracle("dedup_span_removal_keep_first")}),
        pdf_rows AS (
            SELECT 'pdf' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_pages AS VARCHAR), text_md5) AS k,
                   CAST(n_chars AS BIGINT) AS n, 0.0 AS val
            FROM pdf),
        rs_rows AS (
            SELECT 'robots' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(pos AS VARCHAR), url) AS k,
                   CAST(0 AS BIGINT) AS n, 0.0 AS val
            FROM rs),
        sp_rows AS (
            SELECT 'span' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_removed AS VARCHAR), cleaned_md5) AS k,
                   CAST(n_tokens AS BIGINT) AS n, 0.0 AS val
            FROM sp)
        SELECT kind, k, n, val FROM pdf_rows
        UNION ALL SELECT kind, k, n, val FROM rs_rows
        UNION ALL SELECT kind, k, n, val FROM sp_rows
        ORDER BY kind, k
    """,
    tags=("B10", "text", "crawl", "dedup", "pack"),
    doc="Round-11 document-pipeline pack — one driver slot covering the "
    "three §2 rows that were local-oracle-only in r10: PDF text "
    "extraction (ISO 32000-1 parser over spec-literal two-page PDFs "
    "with ToUnicode CMap shifts; page count + char count + full-text "
    "md5 stated analytically), robots.txt Sitemap discovery (RFC 9309 "
    "§2.3 directives extracted by GENERATED Spark/DuckDB twins and "
    "canonicalized into seed URLs), and keep-first duplicated-span "
    "removal (Lee et al. ACL 2022 training policy; cleaned-token-"
    "stream md5 replayed in SQL). Component spark_fns and oracles "
    "reused verbatim — the pack can only diverge if a component does.",
)
def doc_pipeline_pack(spark, sf_dir):
    pdf = _fn("text_pdf_extract")(spark, sf_dir)
    pdf_rows = pdf.select(
        F.lit("pdf").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("n_pages").cast("string"),
            F.col("text_md5"),
        ),
        F.col("n_chars").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    rs = _fn("crawl_robots_sitemaps")(spark, sf_dir)
    rs_rows = rs.select(
        F.lit("robots").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("pos").cast("string"),
            F.col("url"),
        ),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    sp = _fn("dedup_span_removal_keep_first")(spark, sf_dir)
    sp_rows = sp.select(
        F.lit("span").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("n_removed").cast("string"),
            F.col("cleaned_md5"),
        ),
        F.col("n_tokens").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return pdf_rows.unionByName(rs_rows).unionByName(sp_rows).orderBy("kind", "k")
