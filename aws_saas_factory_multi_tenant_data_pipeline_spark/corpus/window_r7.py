"""Round-6 graded-window pack #3: media codecs + sketch/ops.

Gives four more SURVEY §2 rows a hard driver verdict in one slot —
JPEG decode (baseline AND progressive, via the analytic aHash oracle),
FLAC decode (lossless envelope-hash oracle), the KMV bottom-k sample
sketch (including its exact-merge property), and the key-skew
diagnostic report. The slot is freed by `similarity_topk_cosine`, whose
brute-force cosine top-k shape stays driver-exercised through
`r5_pack`'s hard-negative branch (the same windowed top-k over cosine
scores, plus the label pushdown) and remains oracle-green at the tail
head.

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
    wave_r7,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


@register(
    "r7_pack",
    oracle=f"""
        WITH jpeg AS ({_oracle("multimodal_jpeg_ahash")}),
        flac AS ({_oracle("multimodal_flac_envelope")}),
        kmv AS ({_oracle("sketch_kmv_sample")}),
        skew AS ({_oracle("ops_skew_report")}),
        jpeg_rows AS (
            SELECT 'jpeg' AS kind, CAST(doc_id % 8 AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   CAST(SUM((ahash % 1000003) * 7
                            + first_bright_row * 31 + progressive) AS DOUBLE) AS val
            FROM jpeg GROUP BY 2),
        flac_rows AS (
            SELECT 'flac' AS kind, CAST(doc_id % 8 AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   CAST(SUM(envhash % 1000003 + n_loud_frames) AS DOUBLE) AS val
            FROM flac GROUP BY 2),
        kmv_rows AS (
            SELECT 'kmv' AS kind, kmv.kind || ':' || stat AS k,
                   CAST(1 AS BIGINT) AS n, est AS val
            FROM kmv),
        skew_rows AS (
            SELECT 'skew' AS kind, skew.kind || ':' || COALESCE(key, '-') AS k,
                   n,
                   ROUND(COALESCE(mean_n, 0) + COALESCE(share, 0)
                         + COALESCE(skew_ratio, 0), 6) AS val
            FROM skew)
        SELECT kind, k, n, val FROM jpeg_rows
        UNION ALL SELECT kind, k, n, val FROM flac_rows
        UNION ALL SELECT kind, k, n, val FROM kmv_rows
        UNION ALL SELECT kind, k, n, val FROM skew_rows
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "sketch", "pack"),
    doc="Round-6 media/sketch pack — one driver slot covering four §2 "
    "rows: full JPEG decode (baseline even ids, progressive SOF2 odd "
    "ids → analytic aHash checksums per id bucket), lossless FLAC "
    "decode (envelope-hash checksums — exact, no tolerance), the KMV "
    "bottom-k sketch (every quantile/count estimate AND the oneshot≡"
    "merged exact-merge property), and the key-skew diagnostic "
    "(summary + hot-key shares). Component spark_fns and oracles "
    "reused verbatim — the pack can only diverge if a component does.",
)
def r7_pack(spark, sf_dir):
    jpeg = _fn("multimodal_jpeg_ahash")(spark, sf_dir)
    jpeg_rows = (
        jpeg.groupBy((F.col("doc_id") % 8).cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("ahash") % 1000003) * 7
                + F.col("first_bright_row") * 31
                + F.col("progressive")
            )
            .cast("double")
            .alias("val"),
        )
        .select(F.lit("jpeg").alias("kind"), "k", "n", "val")
    )
    flac = _fn("multimodal_flac_envelope")(spark, sf_dir)
    flac_rows = (
        flac.groupBy((F.col("doc_id") % 8).cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("envhash") % 1000003 + F.col("n_loud_frames"))
            .cast("double")
            .alias("val"),
        )
        .select(F.lit("flac").alias("kind"), "k", "n", "val")
    )
    kmv = _fn("sketch_kmv_sample")(spark, sf_dir)
    kmv_rows = kmv.select(
        F.lit("kmv").alias("kind"),
        F.concat(F.col("kind"), F.lit(":"), F.col("stat")).alias("k"),
        F.lit(1).cast("bigint").alias("n"),
        F.col("est").alias("val"),
    )
    skew = _fn("ops_skew_report")(spark, sf_dir)
    skew_rows = skew.select(
        F.lit("skew").alias("kind"),
        F.concat(F.col("kind"), F.lit(":"), F.coalesce(F.col("key"), F.lit("-"))).alias(
            "k"
        ),
        F.col("n"),
        F.round(
            F.coalesce(F.col("mean_n"), F.lit(0.0))
            + F.coalesce(F.col("share"), F.lit(0.0))
            + F.coalesce(F.col("skew_ratio"), F.lit(0.0)),
            6,
        ).alias("val"),
    )
    return (
        jpeg_rows.unionByName(flac_rows)
        .unionByName(kmv_rows)
        .unionByName(skew_rows)
        .orderBy("kind", "k")
    )
