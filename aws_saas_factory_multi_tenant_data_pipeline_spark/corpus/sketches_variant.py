"""Sketch aggregates and semi-structured (VARIANT) access — Spark 4.x
surface that matters at 100 TB (SURVEY.md §2 B4/B7 extensions).

- Bitmap exact-distinct: the two-level bitmap pattern
  (bitmap_bit_position → bitmap_construct_agg per bucket → sum of
  bitmap_count) computes an EXACT count-distinct with mergeable partial
  state — unlike count(DISTINCT) it never re-shuffles raw values, so the
  map-side combine stays effective on high-cardinality keys. Oracle ✔
  (it is exact).
- HLL sketches (Apache DataSketches): mergeable approximate distinct —
  the pattern for incremental / cross-partition rollups where even
  bitmaps are too big. ◐ (estimate; tolerance asserted in
  tests/test_operators_ext.py, DuckDB's approx_count_distinct uses a
  different HLL so values are engine-specific by design).
- VARIANT: parse-once binary JSON (parse_json / variant_get) — replaces
  repeated get_json_object string parsing on hot paths; Athena's
  json_extract_scalar analog over the reference's JSON lake
  (FirehoseStreamingSinkJob.java:78-81 keeps payloads as opaque JSON).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("B4",),
    doc="Exact count-distinct via two-level bitmap aggregation "
    "(bitmap_construct_agg per 32k-bucket, then sum of bitmap_count) — "
    "mergeable partial state, no raw-value reshuffle.",
)
def agg_bitmap_exact_distinct(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    per_bucket = (
        ev.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("cnt"))
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("cnt").alias("distinct_users"))
        .orderBy("event_type")
    )


@register(
    "agg_hll_sketch_distinct",
    oracle=None,  # ◐ approximate; ±5% vs exact asserted in tests/test_operators_ext.py
    tags=("B4",),
    doc="Mergeable HLL distinct: per-type partial sketches union'd with "
    "hll_union_agg, then estimated — the incremental-rollup pattern "
    "(DataSketches HLL, lgConfigK=12).",
)
def agg_hll_sketch_distinct(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    # two-level merge: partial sketch per (type, hour) then union per type —
    # exactly how a 100 TB rollup would reuse hourly partial sketches
    partial = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    return (
        partial.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
        .orderBy("event_type")
    )


@register(
    "fn_variant_json",
    oracle="""
        SELECT event_id,
               CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
               CAST(json_extract(props, '$.missing') AS INTEGER) AS k_missing
        FROM events
        ORDER BY event_id
        LIMIT 100
    """,
    tags=("B7",),
    doc="VARIANT semi-structured access: parse_json once, variant_get "
    "paths (typed) — Spark 4 replacement for per-path get_json_object "
    "string re-parsing; missing path → NULL via try_variant_get.",
)
def fn_variant_json(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.select("event_id", F.parse_json("props").alias("v"))
        .select(
            "event_id",
            F.variant_get("v", "$.k", "int").alias("k_val"),
            F.try_variant_get("v", "$.missing", "int").alias("k_missing"),
        )
        .orderBy("event_id")
        .limit(100)
    )


_CMS_D, _CMS_W = 4, 256


@register(
    "sketch_countmin_portable",
    oracle=f"""
        WITH base AS (
            SELECT event_type || '/' || CAST(user_id % 50 AS VARCHAR) AS key,
                   user_id % 50 AS b
            FROM events),
        cells AS (
            SELECT j,
                   CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || key), 1, 15)
                        AS BIGINT) % {_CMS_W} AS col
            FROM base, range(0, {_CMS_D}) t(j)),
        counters AS (SELECT j, col, COUNT(*) AS c FROM cells GROUP BY 1, 2),
        probes AS (SELECT DISTINCT key FROM base WHERE b < 10),
        probe_cells AS (
            SELECT key, j,
                   CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || key), 1, 15)
                        AS BIGINT) % {_CMS_W} AS col
            FROM probes, range(0, {_CMS_D}) t(j)),
        est AS (
            SELECT p.key, MIN(c.c) AS cm_estimate
            FROM probe_cells p JOIN counters c ON p.j = c.j AND p.col = c.col
            GROUP BY p.key),
        exact AS (SELECT key, COUNT(*) AS exact_n FROM base GROUP BY key)
        SELECT e.key, x.exact_n, e.cm_estimate,
               e.cm_estimate - x.exact_n AS overestimate
        FROM est e JOIN exact x ON e.key = x.key
        ORDER BY e.key
    """,
    tags=("B4", "B10"),
    doc="Count-min sketch, fully oracle-backed (unlike the HLL row, whose "
    "sketch bytes are engine-specific): d=4 x w=256 counters from "
    "md5-derived cells — the counter build is one groupBy with map-side "
    "combine, counters merge by addition (the mergeable-rollup "
    "property), and point estimates are min-over-rows. Probing ~250 "
    "keys into 256 columns forces real collisions, so the overestimate "
    "column exercises the CMS error behavior, and est >= exact always.",
)
def sketch_countmin_portable(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        F.concat(
            F.col("event_type"), F.lit("/"), F.pmod("user_id", F.lit(50)).cast("string")
        ).alias("key"),
        F.pmod("user_id", F.lit(50)).alias("b"),
    )

    def cell(j, key_col):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(j)), F.lit(":"), key_col)), 1, 15
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(_CMS_W))

    cells = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), cell(j, F.col("key")).alias("col"))
                    for j in range(_CMS_D)
                ]
            )
        ).alias("jc")
    ).select(F.col("jc.j").alias("j"), F.col("jc.col").alias("col"))
    counters = cells.groupBy("j", "col").agg(F.count(F.lit(1)).alias("c"))

    probes = base.where(F.col("b") < 10).select("key").distinct()
    probe_cells = probes.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), cell(j, F.col("key")).alias("col"))
                    for j in range(_CMS_D)
                ]
            )
        ).alias("jc"),
    ).select("key", F.col("jc.j").alias("j"), F.col("jc.col").alias("col"))
    est = (
        probe_cells.join(counters, on=["j", "col"])
        .groupBy("key")
        .agg(F.min("c").alias("cm_estimate"))
    )
    exact = base.groupBy("key").agg(F.count(F.lit(1)).alias("exact_n"))
    return (
        est.join(exact, on="key")
        .select(
            "key",
            "exact_n",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_n")).alias("overestimate"),
        )
        .orderBy("key")
    )
