"""Round-5 graded-window packs.

The driver grades a 50-slot prefix of the registry; after round 4, the
dedup family beyond MinHash (SimHash, PPJoin prefix-filtered Jaccard,
blocked Levenshtein, canonical-survivor selection) and the lake
data-management family (keyed upsert/MERGE, SCD2 versioning, snapshot
time travel, schema-evolution reads) were oracle-green locally but sat
past slot 50. These two packs give eight more SURVEY §2 rows a hard
driver verdict, in two slots freed by `scan_project` (its parquet
scan+projection path is identically exercised by `scan_formats_roundtrip`
and nearly every other slot) and `join_semi_anti` (semi/anti semantics
are also driver-covered through the subquery EXISTS/IN rewrites and
locally by `subq_in_notin`).

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
    ext_llm,
    ext_llm_wave2,
    ext_llm_wave4,
    saas_ops,
    saas_ops_wave2,
    wave_r6,
    wave_r9,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import dsum, sql_dsum


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


@register(
    "dedup_pack",
    oracle=f"""
        WITH sim AS ({_oracle("dedup_simhash_portable")}),
        lev AS ({_oracle("dedup_fuzzy_levenshtein")}),
        pre AS ({_oracle("dedup_ngram_prefix")}),
        canon AS ({_oracle("dedup_select_canonical")}),
        sim_rows AS (
            SELECT 'simhash' AS kind, CAST(doc_id % 8 AS VARCHAR) AS k,
                   COUNT(*) AS n, CAST(SUM(simhash % 1000003) AS DOUBLE) AS val
            FROM sim GROUP BY 2),
        lev_rows AS (
            SELECT 'lev' AS kind, 'd' || CAST(dist AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   CAST(SUM((id_a * 211 + id_b) % 1000003) AS DOUBLE) AS val
            FROM lev GROUP BY 2),
        pre_rows AS (
            SELECT 'ppjoin' AS kind, CAST(id_a % 4 AS VARCHAR) AS k,
                   COUNT(*) AS n, ROUND({sql_dsum("jaccard")}, 6) AS val
            FROM pre GROUP BY 2),
        canon_rows AS (
            SELECT 'canon' AS kind, CAST(cluster_id AS VARCHAR) AS k,
                   n_members AS n, keep_doc + keep_score AS val
            FROM canon)
        SELECT kind, k, n, val FROM sim_rows
        UNION ALL SELECT kind, k, n, val FROM lev_rows
        UNION ALL SELECT kind, k, n, val FROM pre_rows
        UNION ALL SELECT kind, k, n, val FROM canon_rows
        ORDER BY kind, k
    """,
    tags=("B10", "dedup", "pack"),
    doc="Round-5 dedup pack — one driver slot covering four §2 rows: "
    "portable SimHash signatures (every 60-bit signature checksummed), "
    "blocked-Levenshtein near-dup pairs (per-distance counts + pair-key "
    "checksums), PPJoin prefix-filtered exact-Jaccard pairs (counts + "
    "decimal-exact similarity sums), and canonical-survivor selection "
    "(every cluster's size, kept doc, and kept score). Each branch calls "
    "the component query's own spark_fn and the oracle wraps the "
    "component oracle verbatim — the pack can only diverge if a "
    "component does.",
)
def dedup_pack(spark, sf_dir):
    sim = _fn("dedup_simhash_portable")(spark, sf_dir)
    sim_rows = (
        sim.groupBy((F.col("doc_id") % 8).cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("simhash") % 1000003).cast("double").alias("val"),
        )
        .select(F.lit("simhash").alias("kind"), "k", "n", "val")
    )
    lev = _fn("dedup_fuzzy_levenshtein")(spark, sf_dir)
    lev_rows = (
        lev.groupBy(F.concat(F.lit("d"), F.col("dist").cast("string")).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("id_a") * 211 + F.col("id_b")) % 1000003)
            .cast("double")
            .alias("val"),
        )
        .select(F.lit("lev").alias("kind"), "k", "n", "val")
    )
    pre = _fn("dedup_ngram_prefix")(spark, sf_dir)
    pre_rows = (
        pre.groupBy((F.col("id_a") % 4).cast("string").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(dsum("jaccard"), 6).alias("val"),
        )
        .select(F.lit("ppjoin").alias("kind"), "k", "n", "val")
    )
    canon = _fn("dedup_select_canonical")(spark, sf_dir)
    canon_rows = canon.select(
        F.lit("canon").alias("kind"),
        F.col("cluster_id").cast("string").alias("k"),
        F.col("n_members").alias("n"),
        (F.col("keep_doc") + F.col("keep_score")).alias("val"),
    )
    return (
        sim_rows.unionByName(lev_rows)
        .unionByName(pre_rows)
        .unionByName(canon_rows)
        .orderBy("kind", "k")
    )


@register(
    "lake_pack",
    oracle=f"""
        WITH up AS ({_oracle("lake_upsert_roundtrip")}),
        scd AS ({_oracle("dim_scd2_apply")}),
        tt AS ({_oracle("lake_time_travel")}),
        evo AS ({_oracle("scan_schema_evolution")}),
        opt AS ({_oracle("lake_optimize_snapshot_roundtrip")}),
        up_rows AS (
            SELECT 'upsert' AS kind, CAST(part AS VARCHAR) AS k,
                   n_rows AS n, val_sum AS val
            FROM up
            UNION ALL
            SELECT 'upsert_mix', CAST(part AS VARCHAR),
                   n_updated * 1000 + n_inserted, 0.0
            FROM up),
        scd_rows AS (
            SELECT 'scd2' AS kind, CAST(is_current AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(('0x' || substr(md5(
                        CAST(id AS VARCHAR) || '|' || segment || '|' || vf
                        || '|' || vt), 1, 8)) AS BIGINT)) AS DOUBLE) AS val
            FROM scd GROUP BY 2),
        tt_rows AS (
            SELECT 'tt' AS kind, snapshot || '/' || o_orderstatus AS k,
                   n, total AS val
            FROM tt),
        evo_rows AS (
            SELECT 'evo' AS kind, CAST(has_price AS VARCHAR) AS k,
                   n, cust_sum AS val
            FROM evo
            UNION ALL
            SELECT 'evo_price', CAST(has_price AS VARCHAR),
                   n, COALESCE(price_sum, 0.0)
            FROM evo),
        opt_rows AS (
            SELECT 'opt_' || kind AS kind, k, n, CAST(val AS DOUBLE) AS val
            FROM opt)
        SELECT kind, k, n, val FROM up_rows
        UNION ALL SELECT kind, k, n, val FROM scd_rows
        UNION ALL SELECT kind, k, n, val FROM tt_rows
        UNION ALL SELECT kind, k, n, val FROM evo_rows
        UNION ALL SELECT kind, k, n, val FROM opt_rows
        ORDER BY kind, k
    """,
    tags=("B1", "B10", "data-mgmt", "pack"),
    doc="Round-5 lake pack — one driver slot covering six §2 rows: keyed "
    "MERGE-style upsert roundtrip (per-partition row counts, decimal-"
    "exact value sums, update/insert mix), SCD2 dimension versioning "
    "(every version row md5-checksummed, grouped by currency), snapshot "
    "time travel (both versions re-aggregated), mergeSchema evolution "
    "reads, and [r9] the OPTIMIZE + optimistic-CAS snapshot roundtrip "
    "(post-rewrite content checksum identical, files-not-increased, "
    "stale expected_version commit raises and does not disturb v2). "
    "Each branch performs the REAL lake write+read via the component "
    "query's spark_fn; the oracle wraps the component oracle verbatim.",
)
def lake_pack(spark, sf_dir):
    up = _fn("lake_upsert_roundtrip")(spark, sf_dir)
    up_rows = up.select(
        F.lit("upsert").alias("kind"),
        F.col("part").cast("string").alias("k"),
        F.col("n_rows").alias("n"),
        F.col("val_sum").alias("val"),
    ).unionByName(
        up.select(
            F.lit("upsert_mix").alias("kind"),
            F.col("part").cast("string").alias("k"),
            (F.col("n_updated") * 1000 + F.col("n_inserted")).alias("n"),
            F.lit(0.0).alias("val"),
        )
    )
    scd = _fn("dim_scd2_apply")(spark, sf_dir)
    row_h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("id").cast("string"), "segment", "vf", "vt"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    scd_rows = (
        scd.groupBy(F.col("is_current").cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(row_h).cast("double").alias("val"))
        .select(F.lit("scd2").alias("kind"), "k", "n", "val")
    )
    tt = _fn("lake_time_travel")(spark, sf_dir)
    tt_rows = tt.select(
        F.lit("tt").alias("kind"),
        F.concat_ws("/", "snapshot", "o_orderstatus").alias("k"),
        "n",
        F.col("total").alias("val"),
    )
    evo = _fn("scan_schema_evolution")(spark, sf_dir)
    evo_rows = evo.select(
        F.lit("evo").alias("kind"),
        F.col("has_price").cast("string").alias("k"),
        "n",
        F.col("cust_sum").alias("val"),
    ).unionByName(
        evo.select(
            F.lit("evo_price").alias("kind"),
            F.col("has_price").cast("string").alias("k"),
            "n",
            F.coalesce("price_sum", F.lit(0.0)).alias("val"),
        )
    )
    opt = _fn("lake_optimize_snapshot_roundtrip")(spark, sf_dir)
    opt_rows = opt.select(
        F.concat(F.lit("opt_"), F.col("kind")).alias("kind"),
        "k",
        "n",
        F.col("val").cast("double").alias("val"),
    )
    return (
        up_rows.unionByName(scd_rows)
        .unionByName(tt_rows)
        .unionByName(evo_rows)
        .unionByName(opt_rows)
        .orderBy("kind", "k")
    )


@register(
    "r6_pack",
    oracle=f"""
        WITH png AS ({_oracle("multimodal_png_decode")}),
        bloom AS ({_oracle("llm_bloom_decontaminate")}),
        hll AS ({_oracle("sketch_hll_portable")}),
        png_rows AS (
            SELECT 'png' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   w * 1000 + h AS n,
                   mean_r + 256.0 * mean_g + 65536.0 * mean_b AS val
            FROM png WHERE decoded),
        bloom_rows AS (
            SELECT 'bloom' AS kind, CAST(doc_id % 16 AS VARCHAR) AS k,
                   CAST(SUM(n_grams) AS BIGINT) AS n,
                   CAST(SUM(maybe_hits) * 100000 + SUM(true_hits) AS DOUBLE) AS val
            FROM bloom GROUP BY 2),
        hll_rows AS (
            SELECT 'hll' AS kind, event_type AS k,
                   sum_units AS n, hll_estimate AS val
            FROM hll
            UNION ALL
            SELECT 'hll_sketch', event_type,
                   n_empty,
                   CAST(CAST(('0x' || substr(registers_md5, 1, 13)) AS BIGINT) AS DOUBLE)
            FROM hll)
        SELECT kind, k, n, val FROM png_rows
        UNION ALL SELECT kind, k, n, val FROM bloom_rows
        UNION ALL SELECT kind, k, n, val FROM hll_rows
        ORDER BY kind, k
    """,
    tags=("B4", "B10", "pack"),
    doc="Round-6 pack — one driver slot covering three new §2 rows: real "
    "PNG decode (per-doc channel means folded into one checksum value, "
    "decoded=TRUE rows only so a stub fall-through empties the branch "
    "and fails rows), Bloom-filter decontamination (per-bucket gram/"
    "maybe/true-hit sums — false positives included), and the portable "
    "HyperLogLog (exact integer harmonic sums, unrounded IEEE estimates, "
    "and the register-array md5 re-hashed to a number). Components "
    "reused verbatim, oracle composed from their SQL.",
)
def r6_pack(spark, sf_dir):
    png = _fn("multimodal_png_decode")(spark, sf_dir)
    png_rows = png.where(F.col("decoded")).select(
        F.lit("png").alias("kind"),
        F.col("doc_id").cast("string").alias("k"),
        (F.col("w") * 1000 + F.col("h")).alias("n"),
        (
            F.col("mean_r") + F.lit(256.0) * F.col("mean_g") + F.lit(65536.0) * F.col("mean_b")
        ).alias("val"),
    )
    bloom = _fn("llm_bloom_decontaminate")(spark, sf_dir)
    bloom_rows = (
        bloom.groupBy((F.col("doc_id") % 16).cast("string").alias("k"))
        .agg(
            F.sum("n_grams").alias("n"),
            (F.sum("maybe_hits") * 100000 + F.sum("true_hits")).cast("double").alias("val"),
        )
        .select(F.lit("bloom").alias("kind"), "k", "n", "val")
    )
    hll = _fn("sketch_hll_portable")(spark, sf_dir)
    hll_rows = hll.select(
        F.lit("hll").alias("kind"),
        F.col("event_type").alias("k"),
        F.col("sum_units").alias("n"),
        F.col("hll_estimate").alias("val"),
    ).unionByName(
        hll.select(
            F.lit("hll_sketch").alias("kind"),
            F.col("event_type").alias("k"),
            F.col("n_empty").alias("n"),
            F.conv(F.substring("registers_md5", 1, 13), 16, 10)
            .cast("double")
            .alias("val"),
        )
    )
    return (
        png_rows.unionByName(bloom_rows).unionByName(hll_rows).orderBy("kind", "k")
    )


@register(
    "r6_pack2",
    oracle=f"""
        WITH ah AS ({_oracle("multimodal_image_ahash_dedup")}),
        wc AS ({_oracle("ingest_warc_roundtrip")}),
        hx AS ({_oracle("text_html_extract")}),
        uc AS ({_oracle("url_canonicalize_dedup")}),
        ah_rows AS (
            SELECT 'ahash' AS kind, 'h' || CAST(hamming AS VARCHAR) AS k,
                   COUNT(*) AS n,
                   CAST(SUM((id_a * 211 + id_b) % 1000003) AS DOUBLE) AS val
            FROM ah GROUP BY 2),
        wc_rows AS (
            SELECT 'warc' AS kind, CAST(doc_id % 8 AS VARCHAR) AS k,
                   CAST(SUM(content_length) AS BIGINT) AS n,
                   CAST(SUM(CAST(('0x' || substr(body_md5, 1, 12)) AS BIGINT) % 1000003)
                        AS DOUBLE) AS val
            FROM wc GROUP BY 2),
        hx_rows AS (
            SELECT 'html' AS kind, CAST(doc_id % 8 AS VARCHAR) AS k,
                   CAST(SUM(text_bytes) AS BIGINT) AS n,
                   CAST(SUM(CAST(('0x' || substr(text_md5, 1, 12)) AS BIGINT) % 1000003)
                        AS DOUBLE) AS val
            FROM hx GROUP BY 2),
        uc_rows AS (
            SELECT 'url' AS kind, CAST(first_doc % 16 AS VARCHAR) AS k,
                   CAST(SUM(n_variants) AS BIGINT) AS n,
                   CAST(SUM(CAST(('0x' || substr(md5(curl), 1, 12)) AS BIGINT) % 1000003)
                        AS DOUBLE) AS val
            FROM uc GROUP BY 2)
        SELECT kind, k, n, val FROM ah_rows
        UNION ALL SELECT kind, k, n, val FROM wc_rows
        UNION ALL SELECT kind, k, n, val FROM hx_rows
        UNION ALL SELECT kind, k, n, val FROM uc_rows
        ORDER BY kind, k
    """,
    tags=("B10", "pack"),
    doc="Round-6 crawl-pipeline pack — one driver slot covering four §2 "
    "rows: perceptual-hash image near-dup pairs (per-hamming counts + "
    "pair checksums), WARC ingest roundtrip (Content-Length sums + body "
    "md5 checksums), HTML-to-text extraction (byte sums + text md5 "
    "checksums), and URL canonicalization groups (variant counts + "
    "canonical-URL checksums). Components reused verbatim; oracle "
    "composed from their SQL.",
)
def r6_pack2(spark, sf_dir):
    def md5_checksum(col):
        return F.sum(
            F.conv(F.substring(col, 1, 12), 16, 10).cast("long") % 1000003
        ).cast("double")

    ah = _fn("multimodal_image_ahash_dedup")(spark, sf_dir)
    ah_rows = (
        ah.groupBy(F.concat(F.lit("h"), F.col("hamming").cast("string")).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("id_a") * 211 + F.col("id_b")) % 1000003)
            .cast("double")
            .alias("val"),
        )
        .select(F.lit("ahash").alias("kind"), "k", "n", "val")
    )
    wc = _fn("ingest_warc_roundtrip")(spark, sf_dir)
    wc_rows = (
        wc.groupBy((F.col("doc_id") % 8).cast("string").alias("k"))
        .agg(
            F.sum("content_length").alias("n"),
            md5_checksum(F.col("body_md5")).alias("val"),
        )
        .select(F.lit("warc").alias("kind"), "k", "n", "val")
    )
    hx = _fn("text_html_extract")(spark, sf_dir)
    hx_rows = (
        hx.groupBy((F.col("doc_id") % 8).cast("string").alias("k"))
        .agg(
            F.sum("text_bytes").alias("n"),
            md5_checksum(F.col("text_md5")).alias("val"),
        )
        .select(F.lit("html").alias("kind"), "k", "n", "val")
    )
    uc = _fn("url_canonicalize_dedup")(spark, sf_dir)
    uc_rows = (
        uc.groupBy((F.col("first_doc") % 16).cast("string").alias("k"))
        .agg(
            F.sum("n_variants").alias("n"),
            md5_checksum(F.md5(F.col("curl"))).alias("val"),
        )
        .select(F.lit("url").alias("kind"), "k", "n", "val")
    )
    return (
        ah_rows.unionByName(wc_rows)
        .unionByName(hx_rows)
        .unionByName(uc_rows)
        .orderBy("kind", "k")
    )
