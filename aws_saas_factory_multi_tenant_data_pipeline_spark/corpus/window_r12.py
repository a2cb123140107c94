"""Round-10 graded-window packs: hard driver verdicts for the eight
round-9 tail-only rows (r9 verdict "Next round" #1), with ZERO families
losing driver coverage.

Two new slots:

  crawl_pack2 — crawl link-graph extraction, Unicode script profile,
                TGA decode, AIFF/AIFF-C roundtrip (4 §2 rows; all were
                local-oracle-only in r9)
  lake_pack2  — lake orphan-file GC, write-lineage audit, corrupt-file-
                resilient scan, 1-bit binary quantization + Hamming
                top-k (4 §2 rows, likewise)

Slots are freed by MERGING, not displacing (the r9 win_family_pack /
setop_sort_pack convention): `udf_family_pack` wraps udf_grouped_map_agg
+ udf_table_function verbatim (the B9 grouped-map, grouped-agg, and
table-function families keep hard driver verdicts in one slot), and
`agg_distinct_grouping_pack` wraps count_distinct_multi +
grouping_sets_mixed verbatim (the B4 multi-distinct and grouping-sets
families likewise). The merged originals move to the tail head, still
oracle-green locally — no SURVEY §2 row downgrades from driver ✅.

Packs reuse the already-oracle-green component queries verbatim: the
Spark side calls the component `spark_fn` and reduces its result; the
oracle wraps the component oracle SQL as a CTE and applies the same
reduction — a pack can only diverge if a component does. Unified output
schema (kind, k, n, val), the r4_mgmt_pack convention. Reduction rules
(collision-proof at any sf): integers are stringified into `k` (integer
→ VARCHAR is exact and engine-identical), ONE unscaled BIGINT rides in
`n`, doubles ride in `val`, and full-range BIGINT hashes enter `val`
only mod 1000003 (doubles are exact to 2^53; a raw aHash is not
representable).
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
    udfs,
    wave_r10,
    wave_r11,
    wave_r12,
    window50,
    window_r4,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
    SCRIPT_RANGES,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


#: DuckDB spelling of Spark's F.pmod(x, 1000003)
_SQL_PMOD = "(((({x}) % 1000003) + 1000003) % 1000003)"

_SCRIPTS = sorted(SCRIPT_RANGES)


def _ks(*cols):
    """Spark side of the k-string reduction: nullable columns arrive
    pre-wrapped; integers/bools must already be cast to string."""
    return F.concat_ws(":", *cols).alias("k")


@register(
    "crawl_pack2",
    oracle=f"""
        WITH lg AS ({_oracle("crawl_link_graph")}),
        sp AS ({_oracle("text_script_profile")}),
        tga AS ({_oracle("multimodal_tga_decode")}),
        aiff AS ({_oracle("audio_aiff_roundtrip")}),
        lg_rows AS (
            SELECT 'link' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), url) AS k,
                   CAST(n AS BIGINT) AS n, 0.0 AS val
            FROM lg),
        sp_rows AS (
            SELECT 'script' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             {", ".join(f"CAST(n_{s} AS VARCHAR)" for s in _SCRIPTS)},
                             main_script) AS k,
                   CAST(n_scripted AS BIGINT) AS n,
                   main_share AS val
            FROM sp),
        tga_rows AS (
            SELECT 'tga' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="ahash")} AS DOUBLE) AS val
            FROM tga),
        aiff_rows AS (
            SELECT 'aiff' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_samples AS VARCHAR),
                             CAST(sample_rate AS VARCHAR)) AS k,
                   CAST(weighted_sum AS BIGINT) AS n, 0.0 AS val
            FROM aiff)
        SELECT kind, k, n, val FROM lg_rows
        UNION ALL SELECT kind, k, n, val FROM sp_rows
        UNION ALL SELECT kind, k, n, val FROM tga_rows
        UNION ALL SELECT kind, k, n, val FROM aiff_rows
        ORDER BY kind, k
    """,
    tags=("B10", "crawl", "multimodal", "text", "pack"),
    doc="Round-10 crawl/media pack — one driver slot covering four §2 "
    "rows that were local-oracle-only in r9: crawl link-graph extraction "
    "(href matcher + URL canonicalization replayed character-for-"
    "character by the generated DuckDB twin), the Unicode script profile "
    "(per-script counts from the same public block-range table, dominant "
    "script + share), TGA decode via the registry's explicit-dict "
    "no-sniff path (raw/RLE × gray/RGB × both row origins, analytic "
    "two-tone aHash), and the AIFF/AIFF-C roundtrip (position-weighted "
    "PCM sum + 80-bit extended-float rate recovery, both byte orders). "
    "Component spark_fns and oracles reused verbatim — the pack can only "
    "diverge if a component does.",
)
def crawl_pack2(spark, sf_dir):
    lg = _fn("crawl_link_graph")(spark, sf_dir)
    lg_rows = lg.select(
        F.lit("link").alias("kind"),
        _ks(F.col("doc_id").cast("string"), F.col("url")),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    sp = _fn("text_script_profile")(spark, sf_dir)
    sp_rows = sp.select(
        F.lit("script").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            *[F.col(f"n_{s}").cast("string") for s in _SCRIPTS],
            F.col("main_script"),
        ),
        F.col("n_scripted").cast("long").alias("n"),
        F.col("main_share").alias("val"),
    )
    tga = _fn("multimodal_tga_decode")(spark, sf_dir)
    tga_rows = tga.select(
        F.lit("tga").alias("kind"),
        F.col("doc_id").cast("string").alias("k"),
        F.lit(0).cast("long").alias("n"),
        F.pmod(F.col("ahash"), F.lit(1000003)).cast("double").alias("val"),
    )
    aiff = _fn("audio_aiff_roundtrip")(spark, sf_dir)
    aiff_rows = aiff.select(
        F.lit("aiff").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("n_samples").cast("string"),
            F.col("sample_rate").cast("string"),
        ),
        F.col("weighted_sum").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return (
        lg_rows.unionByName(sp_rows)
        .unionByName(tga_rows)
        .unionByName(aiff_rows)
        .orderBy("kind", "k")
    )


@register(
    "lake_pack2",
    oracle=f"""
        WITH vac AS ({_oracle("lake_vacuum_orphans")}),
        lin AS ({_oracle("lake_lineage_audit")}),
        cs AS ({_oracle("scan_corrupt_resilient")}),
        bq AS ({_oracle("similarity_binary_hamming")}),
        vac_rows AS (
            SELECT 'vac' AS kind, concat_ws(':', kind, k) AS k,
                   CAST(n AS BIGINT) AS n, CAST(val AS DOUBLE) AS val
            FROM vac),
        lin_rows AS (
            SELECT 'lin' AS kind,
                   concat_ws(':', op, CAST(n_roots AS VARCHAR),
                             CAST(n_files AS VARCHAR),
                             CAST(CAST(has_event_id AS INT) AS VARCHAR)) AS k,
                   CAST(n_rows AS BIGINT) AS n, 0.0 AS val
            FROM lin),
        cs_rows AS (
            SELECT 'scan' AS kind, concat_ws(':', kind, k) AS k,
                   CAST(n AS BIGINT) AS n, CAST(val AS DOUBLE) AS val
            FROM cs),
        bq_rows AS (
            SELECT 'bq' AS kind,
                   concat_ws(':', CAST(query_id AS VARCHAR),
                             CAST(vec_id AS VARCHAR),
                             CAST(hamming AS VARCHAR),
                             CAST(rank AS VARCHAR)) AS k,
                   CAST(0 AS BIGINT) AS n, 0.0 AS val
            FROM bq)
        SELECT kind, k, n, val FROM vac_rows
        UNION ALL SELECT kind, k, n, val FROM lin_rows
        UNION ALL SELECT kind, k, n, val FROM cs_rows
        UNION ALL SELECT kind, k, n, val FROM bq_rows
        ORDER BY kind, k
    """,
    tags=("B10", "B1", "data-mgmt", "lake", "similarity", "pack"),
    doc="Round-10 lake-lifecycle/retrieval pack — one driver slot "
    "covering four §2 rows that were local-oracle-only in r9: orphan-"
    "file GC (aborted-CAS + torn-write reclaim with grace/branch/"
    "history/unlogged-commit protections, end state + per-type checksum "
    "pinned), the write-lineage provenance audit (two-stage chain, "
    "input roots/files/rows/schema), the corrupt-file-resilient scan "
    "(strict read fails loudly, resilient read degrades to exactly the "
    "intact residue classes), and 1-bit binary quantization + Hamming "
    "top-k (bit packing incl. the signed bit-63 case and every rank "
    "replayed in SQL). Component spark_fns and oracles reused verbatim "
    "— the pack can only diverge if a component does.",
)
def lake_pack2(spark, sf_dir):
    vac = _fn("lake_vacuum_orphans")(spark, sf_dir)
    vac_rows = vac.select(
        F.lit("vac").alias("kind"),
        _ks(F.col("kind"), F.col("k")),
        F.col("n").cast("long").alias("n"),
        F.col("val").cast("double").alias("val"),
    )
    lin = _fn("lake_lineage_audit")(spark, sf_dir)
    lin_rows = lin.select(
        F.lit("lin").alias("kind"),
        _ks(
            F.col("op"),
            F.col("n_roots").cast("string"),
            F.col("n_files").cast("string"),
            F.col("has_event_id").cast("int").cast("string"),
        ),
        F.col("n_rows").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    cs = _fn("scan_corrupt_resilient")(spark, sf_dir)
    cs_rows = cs.select(
        F.lit("scan").alias("kind"),
        _ks(F.col("kind"), F.col("k")),
        F.col("n").cast("long").alias("n"),
        F.col("val").cast("double").alias("val"),
    )
    bq = _fn("similarity_binary_hamming")(spark, sf_dir)
    bq_rows = bq.select(
        F.lit("bq").alias("kind"),
        _ks(
            F.col("query_id").cast("string"),
            F.col("vec_id").cast("string"),
            F.col("hamming").cast("string"),
            F.col("rank").cast("string"),
        ),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return (
        vac_rows.unionByName(lin_rows)
        .unionByName(cs_rows)
        .unionByName(bq_rows)
        .orderBy("kind", "k")
    )


@register(
    "udf_family_pack",
    oracle=f"""
        WITH gm AS ({_oracle("udf_grouped_map_agg")}),
        tf AS ({_oracle("udf_table_function")}),
        gm_rows AS (
            SELECT 'grouped' AS kind,
                   concat_ws(':', kind, event_type) AS k,
                   CAST(metric AS BIGINT) AS n, 0.0 AS val
            FROM gm),
        tf_rows AS (
            SELECT 'tablefn' AS kind,
                   concat_ws(':', CAST(r_regionkey AS VARCHAR), ch) AS k,
                   CAST(0 AS BIGINT) AS n, 0.0 AS val
            FROM tf)
        SELECT kind, k, n, val FROM gm_rows
        UNION ALL SELECT kind, k, n, val FROM tf_rows
        ORDER BY kind, k
    """,
    tags=("B9", "pack"),
    doc="B9 UDF-family pack — merges two long-graded UDF slots into one "
    "with NOTHING reduced: every output row of udf_grouped_map_agg "
    "(applyInPandas grouped-map + grouped-agg pandas UDAF, labeled "
    "branches, integer-exact metrics riding in n) and udf_table_function "
    "(explode/LATERAL VIEW table function, duplicate char rows included "
    "verbatim) rides in the hash. Frees one graded slot for crawl_pack2 "
    "while all three B9 families keep hard driver verdicts "
    "(udf_scalar_py_pandas keeps its own slot).",
)
def udf_family_pack(spark, sf_dir):
    gm = _fn("udf_grouped_map_agg")(spark, sf_dir)
    gm_rows = gm.select(
        F.lit("grouped").alias("kind"),
        _ks(F.col("kind"), F.col("event_type")),
        F.col("metric").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    tf = _fn("udf_table_function")(spark, sf_dir)
    tf_rows = tf.select(
        F.lit("tablefn").alias("kind"),
        _ks(F.col("r_regionkey").cast("string"), F.col("ch")),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return gm_rows.unionByName(tf_rows).orderBy("kind", "k")


@register(
    "agg_distinct_grouping_pack",
    oracle=f"""
        WITH cd AS ({_oracle("count_distinct_multi")}),
        gs AS ({_oracle("grouping_sets_mixed")}),
        cd_rows AS (
            SELECT 'distinct' AS kind,
                   concat_ws(':', l_returnflag, CAST(n_supp AS VARCHAR),
                             CAST(n_part AS VARCHAR),
                             CAST(n_supp_part AS VARCHAR)) AS k,
                   CAST(n_rows AS BIGINT) AS n, 0.0 AS val
            FROM cd),
        gs_rows AS (
            SELECT 'gsets' AS kind,
                   concat_ws(':', COALESCE(o_orderstatus, '~'),
                             COALESCE(o_orderpriority, '~')) AS k,
                   CAST(n AS BIGINT) AS n, total AS val
            FROM gs)
        SELECT kind, k, n, val FROM cd_rows
        UNION ALL SELECT kind, k, n, val FROM gs_rows
        ORDER BY kind, k
    """,
    tags=("B4", "pack"),
    doc="B4 aggregation pack — merges two long-graded aggregation slots "
    "into one with NOTHING reduced: every output row of "
    "count_distinct_multi (single- and multi-column COUNT(DISTINCT) per "
    "return flag, all four counts stringified into k / riding in n) and "
    "grouping_sets_mixed (explicit GROUPING SETS with NULL group keys "
    "coalesced to '~' on both engines, decimal-exact totals in val) "
    "rides in the hash verbatim. Frees one graded slot for lake_pack2 "
    "while both B4 families keep hard driver verdicts.",
)
def agg_distinct_grouping_pack(spark, sf_dir):
    cd = _fn("count_distinct_multi")(spark, sf_dir)
    cd_rows = cd.select(
        F.lit("distinct").alias("kind"),
        _ks(
            F.col("l_returnflag"),
            F.col("n_supp").cast("string"),
            F.col("n_part").cast("string"),
            F.col("n_supp_part").cast("string"),
        ),
        F.col("n_rows").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    gs = _fn("grouping_sets_mixed")(spark, sf_dir)
    gs_rows = gs.select(
        F.lit("gsets").alias("kind"),
        _ks(
            F.coalesce(F.col("o_orderstatus"), F.lit("~")),
            F.coalesce(F.col("o_orderpriority"), F.lit("~")),
        ),
        F.col("n").cast("long").alias("n"),
        F.col("total").alias("val"),
    )
    return cd_rows.unionByName(gs_rows).orderBy("kind", "k")


# Round-10 second window wave: one more same-tier merge frees a slot so
# the seven r10 oracles get hard driver verdicts THIS round (component
# modules wave_r12/window_r4 are imported in the header block above).


@register(
    "stream_window_pack",
    oracle=f"""
        WITH ss AS ({_oracle("stream_sliding_session")}),
        ld AS ({_oracle("stream_late_drop")}),
        ss_rows AS (
            SELECT 'slide' AS kind, concat_ws(':', kind, k) AS k,
                   CAST(n AS BIGINT) AS n, 0.0 AS val
            FROM ss),
        ld_rows AS (
            SELECT 'late' AS kind,
                   concat_ws(':', event_type, CAST(win_start AS VARCHAR)) AS k,
                   CAST(n AS BIGINT) AS n, sum_value AS val
            FROM ld)
        SELECT kind, k, n, val FROM ss_rows
        UNION ALL SELECT kind, k, n, val FROM ld_rows
        ORDER BY kind, k
    """,
    tags=("B8", "pack"),
    doc="B8 windowed-streaming pack — merges two long-graded streaming "
    "slots into one with NOTHING reduced: every output row of "
    "stream_sliding_session (sliding + session window batch twins) and "
    "stream_late_drop (the SPARK-24634 two-watermark late-drop replay, "
    "decimal-exact sums riding in val) rides in the hash verbatim. "
    "Frees one graded slot for r10_pack while both B8 families keep "
    "hard driver verdicts (stream_dedup_batch_equiv keeps its own "
    "slot; the real streaming forms stay pinned in "
    "tests/test_streaming.py).",
)
def stream_window_pack(spark, sf_dir):
    ss = _fn("stream_sliding_session")(spark, sf_dir)
    ss_rows = ss.select(
        F.lit("slide").alias("kind"),
        _ks(F.col("kind"), F.col("k")),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    ld = _fn("stream_late_drop")(spark, sf_dir)
    ld_rows = ld.select(
        F.lit("late").alias("kind"),
        _ks(F.col("event_type"), F.col("win_start").cast("string")),
        F.col("n").cast("long").alias("n"),
        F.col("sum_value").alias("val"),
    )
    return ss_rows.unionByName(ld_rows).orderBy("kind", "k")


@register(
    "r10_pack",
    oracle=f"""
        WITH webp AS ({_oracle("multimodal_webp_decode")}),
        au AS ({_oracle("audio_au_roundtrip")}),
        svx AS ({_oracle("audio_8svx_roundtrip")}),
        smap AS ({_oracle("crawl_sitemap_frontier")}),
        spans AS ({_oracle("dedup_duplicated_spans")}),
        drift AS ({_oracle("lake_schema_drift_report")}),
        stats AS ({_oracle("lake_analyze_stats")}),
        webp_rows AS (
            SELECT 'webp' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST((((ahash % 1000003) + 1000003) % 1000003) AS DOUBLE) AS val
            FROM webp),
        au_rows AS (
            SELECT 'au' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_samples AS VARCHAR),
                             CAST(sample_rate AS VARCHAR),
                             CAST(bits AS VARCHAR)) AS k,
                   CAST(weighted_sum AS BIGINT) AS n, 0.0 AS val
            FROM au),
        svx_rows AS (
            SELECT 'svx' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_samples AS VARCHAR),
                             CAST(sample_rate AS VARCHAR),
                             CAST(channels AS VARCHAR)) AS k,
                   CAST(weighted_sum AS BIGINT) AS n, 0.0 AS val
            FROM svx),
        smap_rows AS (
            SELECT 'smap' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), kind,
                             CAST(pos AS VARCHAR), url, lastmod) AS k,
                   CAST(0 AS BIGINT) AS n, 0.0 AS val
            FROM smap),
        span_rows AS (
            SELECT 'spans' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(span_start AS VARCHAR),
                             CAST(span_len AS VARCHAR)) AS k,
                   CAST(n_windows AS BIGINT) AS n, 0.0 AS val
            FROM spans),
        drift_rows AS (
            SELECT 'drift' AS kind, concat_ws(':', kind, k) AS k,
                   CAST(n AS BIGINT) AS n, 0.0 AS val
            FROM drift),
        stats_rows AS (
            SELECT 'stats' AS kind, k,
                   CAST(n AS BIGINT) AS n, 0.0 AS val
            FROM stats)
        SELECT kind, k, n, val FROM webp_rows
        UNION ALL SELECT kind, k, n, val FROM au_rows
        UNION ALL SELECT kind, k, n, val FROM svx_rows
        UNION ALL SELECT kind, k, n, val FROM smap_rows
        UNION ALL SELECT kind, k, n, val FROM span_rows
        UNION ALL SELECT kind, k, n, val FROM drift_rows
        UNION ALL SELECT kind, k, n, val FROM stats_rows
        ORDER BY kind, k
    """,
    tags=("B10", "B1", "multimodal", "crawl", "dedup", "data-mgmt", "pack"),
    doc="Round-10 pack — one driver slot covering the seven §2 rows this "
    "round added or oracle-promoted: WebP VP8L decode (analytic aHash "
    "rotating the feature surface), Sun AU decode (all four integer "
    "depths), 8SVX decode (Fibonacci-delta + stereo blocks), sitemap "
    "frontier extraction (index + urlset, CDATA, entities, "
    "canonicalization), exact duplicated-span dedup (Lee et al. "
    "gaps-and-islands replay), the schema-drift report, and ANALYZE "
    "catalog statistics. Component spark_fns and oracles reused "
    "verbatim — the pack can only diverge if a component does.",
)
def r10_pack(spark, sf_dir):
    webp = _fn("multimodal_webp_decode")(spark, sf_dir)
    webp_rows = webp.select(
        F.lit("webp").alias("kind"),
        F.col("doc_id").cast("string").alias("k"),
        F.lit(0).cast("long").alias("n"),
        F.pmod(F.col("ahash"), F.lit(1000003)).cast("double").alias("val"),
    )

    def audio(name, kind, extra):
        df = _fn(name)(spark, sf_dir)
        return df.select(
            F.lit(kind).alias("kind"),
            _ks(
                F.col("doc_id").cast("string"),
                F.col("n_samples").cast("string"),
                F.col("sample_rate").cast("string"),
                F.col(extra).cast("string"),
            ),
            F.col("weighted_sum").cast("long").alias("n"),
            F.lit(0.0).alias("val"),
        )

    au_rows = audio("audio_au_roundtrip", "au", "bits")
    svx_rows = audio("audio_8svx_roundtrip", "svx", "channels")
    smap = _fn("crawl_sitemap_frontier")(spark, sf_dir)
    smap_rows = smap.select(
        F.lit("smap").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("kind"),
            F.col("pos").cast("string"),
            F.col("url"),
            F.col("lastmod"),
        ),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    spans = _fn("dedup_duplicated_spans")(spark, sf_dir)
    span_rows = spans.select(
        F.lit("spans").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("span_start").cast("string"),
            F.col("span_len").cast("string"),
        ),
        F.col("n_windows").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    drift = _fn("lake_schema_drift_report")(spark, sf_dir)
    drift_rows = drift.select(
        F.lit("drift").alias("kind"),
        _ks(F.col("kind"), F.col("k")),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    stats = _fn("lake_analyze_stats")(spark, sf_dir)
    stats_rows = stats.select(
        F.lit("stats").alias("kind"),
        F.col("k"),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return (
        webp_rows.unionByName(au_rows)
        .unionByName(svx_rows)
        .unionByName(smap_rows)
        .unionByName(span_rows)
        .unionByName(drift_rows)
        .unionByName(stats_rows)
        .orderBy("kind", "k")
    )
