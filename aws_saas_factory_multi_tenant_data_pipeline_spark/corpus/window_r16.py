"""Round-13 graded-window packs (r12 verdict "Next round" #1/#2/#4/#5):
hard driver verdicts for the round's new rows with ZERO families
losing driver coverage.

Two slots were freed by MERGING (the r9-r12 convention):

  udf_scalar_py_pandas + udf_family_pack → udf_b9_pack (the whole B9
      family in one slot, every component output row verbatim); the
      freed slot carries `stream_sink_roundtrip` — A3's own driver
      verdict via a REAL availableNow foreachBatch streaming query.
  dedup_minhash_portable + dedup_pack → dedup_family_pack (disjoint
      kinds, both components verbatim); the freed slot carries
      `r13_pack` — HEIC decode (the closed quarantine) + HEVC Main10
      + the AV1/AVIF probe, giving all three r13 rows (incl.
      video_av1_probe) hard driver verdicts in one slot.

The merged originals and the r13 standalone forms move to the tail,
still oracle-green locally — no SURVEY §2 row downgrades from
driver ✅.

Packs reuse the already-oracle-green component queries verbatim: the
Spark side calls the component `spark_fn` and reduces its result; the
oracle wraps the component oracle SQL as a CTE and applies the same
reduction — a pack can only diverge if a component does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    wave_r15,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


@register(
    "r13_pack",
    oracle=f"""
        WITH hc AS ({_oracle("multimodal_heic_decode")}),
        m10 AS ({_oracle("video_hevc_main10")}),
        av AS ({_oracle("video_av1_probe")}),
        hc_rows AS (
            SELECT 'heic' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_items AS VARCHAR),
                             CAST(n_tiles AS VARCHAR),
                             CAST(rotation AS VARCHAR)) AS k,
                   CAST(ahash AS BIGINT) AS n, 0.0 AS val
            FROM hc),
        m10_rows AS (
            SELECT 'main10' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(bit_depth AS VARCHAR),
                             CAST(n_px AS VARCHAR)) AS k,
                   CAST(ahash AS BIGINT) AS n, 0.0 AS val
            FROM m10),
        av_rows AS (
            SELECT 'av1' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(width AS VARCHAR),
                             CAST(height AS VARCHAR),
                             CAST(profile AS VARCHAR),
                             CAST(bit_depth AS VARCHAR),
                             CAST(monochrome AS VARCHAR)) AS k,
                   CAST(n_obus AS BIGINT) AS n, 0.0 AS val
            FROM av)
        SELECT kind, k, n, val FROM hc_rows
        UNION ALL SELECT kind, k, n, val FROM m10_rows
        UNION ALL SELECT kind, k, n, val FROM av_rows
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "image", "video", "pack"),
    doc="Round-13 pack — one driver slot carrying the round's three "
    "media rows verbatim: HEIC decode (HEIF items through the "
    "from-spec HEVC intra decoder — single/grid/irot, libheif-pinned), "
    "HEVC Main10 decode (10-bit end-to-end, libde265-bit-exact in "
    "tests), and the AV1/AVIF structure probe (OBU walk + sequence "
    "header + av1C cross-check, real libheif/libaom artifacts pinned "
    "in tests). All-integer outputs ride in the exact k/n channels. "
    "Component spark_fns and oracles reused verbatim — the pack can "
    "only diverge if a component does.",
)
def r13_pack(spark, sf_dir):
    hc = _fn("multimodal_heic_decode")(spark, sf_dir)
    hc_rows = hc.select(
        F.lit("heic").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("n_items").cast("string"),
            F.col("n_tiles").cast("string"),
            F.col("rotation").cast("string"),
        ).alias("k"),
        F.col("ahash").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    m10 = _fn("video_hevc_main10")(spark, sf_dir)
    m10_rows = m10.select(
        F.lit("main10").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("bit_depth").cast("string"),
            F.col("n_px").cast("string"),
        ).alias("k"),
        F.col("ahash").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    av = _fn("video_av1_probe")(spark, sf_dir)
    av_rows = av.select(
        F.lit("av1").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("width").cast("string"),
            F.col("height").cast("string"),
            F.col("profile").cast("string"),
            F.col("bit_depth").cast("string"),
            F.col("monochrome").cast("string"),
        ).alias("k"),
        F.col("n_obus").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return (
        hc_rows.unionByName(m10_rows)
        .unionByName(av_rows)
        .orderBy("kind", "k")
    )


@register(
    "udf_b9_pack",
    oracle=f"""
        WITH sc AS ({_oracle("udf_scalar_py_pandas")}),
        fp AS ({_oracle("udf_family_pack")}),
        sc_rows AS (
            SELECT 'udfsc' AS kind,
                   concat_ws(':', CAST(o_orderkey AS VARCHAR),
                             size_band) AS k,
                   CAST(price_cents AS BIGINT) AS n, 0.0 AS val
            FROM sc)
        SELECT kind, k, n, val FROM sc_rows
        UNION ALL SELECT kind, k, n, val FROM fp
        ORDER BY kind, k
    """,
    tags=("B9", "pack"),
    doc="B9 family pack (r13 merge) — udf_scalar_py_pandas (the two "
    "scalar-UDF rows: row-at-a-time Python UDF + vectorized pandas "
    "UDF, byte-equal outputs) and udf_family_pack (grouped-map + "
    "grouped-agg pandas UDFs + the Python UDTF) in one driver slot; "
    "every output row of both components rides in the pack hash "
    "verbatim (the scalar rows reduce to the exact k/n channels), so "
    "no B9 §2 row loses its driver verdict. The freed slot carries "
    "stream_sink_roundtrip (A3's own driver verdict). Component "
    "spark_fns and oracles reused verbatim.",
)
def udf_b9_pack(spark, sf_dir):
    sc = _fn("udf_scalar_py_pandas")(spark, sf_dir)
    sc_rows = sc.select(
        F.lit("udfsc").alias("kind"),
        F.concat_ws(
            ":", F.col("o_orderkey").cast("string"), F.col("size_band")
        ).alias("k"),
        F.col("price_cents").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    fp = _fn("udf_family_pack")(spark, sf_dir)
    return sc_rows.unionByName(fp).orderBy("kind", "k")


@register(
    "dedup_family_pack",
    oracle=f"""
        WITH mh AS ({_oracle("dedup_minhash_portable")}),
        dp AS ({_oracle("dedup_pack")}),
        mh_rows AS (
            SELECT 'minhash' AS kind,
                   concat_ws(':', CAST(id_a AS VARCHAR),
                             CAST(id_b AS VARCHAR)) AS k,
                   CAST(0 AS BIGINT) AS n, jaccard AS val
            FROM mh)
        SELECT kind, k, n, val FROM mh_rows
        UNION ALL SELECT kind, k, n, val FROM dp
        ORDER BY kind, k
    """,
    tags=("B10", "dedup", "pack"),
    doc="Dedup family pack (r13 merge) — dedup_minhash_portable (the "
    "full MinHash-LSH pipeline, md5-portable hash mode, verified "
    "Jaccard in the val channel) and dedup_pack (SimHash + blocked "
    "Levenshtein + PPJoin prefix-filter + canonical-survivor "
    "selection) in one driver slot; kinds are disjoint so every "
    "output row of both components rides in the pack hash verbatim — "
    "no dedup §2 row loses its driver verdict. The freed slot carries "
    "r13_pack. Component spark_fns and oracles reused verbatim.",
)
def dedup_family_pack(spark, sf_dir):
    mh = _fn("dedup_minhash_portable")(spark, sf_dir)
    mh_rows = mh.select(
        F.lit("minhash").alias("kind"),
        F.concat_ws(
            ":", F.col("id_a").cast("string"), F.col("id_b").cast("string")
        ).alias("k"),
        F.lit(0).cast("long").alias("n"),
        F.col("jaccard").alias("val"),
    )
    dp = _fn("dedup_pack")(spark, sf_dir)
    return mh_rows.unionByName(dp).orderBy("kind", "k")
