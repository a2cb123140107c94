"""Round-12 graded-window packs (r11 verdict "Next round" #1): hard
driver verdicts for the four round-11 tests-only verification-channel
rows, with ZERO families losing driver coverage.

One new slot:

  r12_pack — the extended TIFF decode surface (SURVEY 431/435/439:
             LZW + both predictors, Deflate, tiled layout, 16-bit,
             planar-2, JPEG-in-TIFF), the analytic ADPCM WAV oracle
             (433), the Ogg container probe (437 — previously
             tail-only), and the HEVC stream probe (441 — previously
             tests-only with no corpus query at all).

The slot is freed by MERGING, not displacing (the r9-r11
win_family_pack / join_family_pack convention): `media_family_pack`
wraps media_pack + media_pack2 verbatim — both components already
emit the unified (kind, k, n, val) schema with disjoint kind labels,
so the merge is a pure UNION ALL on both sides and all seven
underlying §2 rows (EXIF strip, ID3 strip, zip/tar ingest, WebDataset
shards, MJPEG frames, MP3 spectral, bitext mining) keep hard driver
verdicts in one slot. The merged originals move to the tail head,
still oracle-green locally — no SURVEY §2 row downgrades from
driver ✅.

Packs reuse the already-oracle-green component queries verbatim: the
Spark side calls the component `spark_fn` and reduces its result; the
oracle wraps the component oracle SQL as a CTE and applies the same
reduction — a pack can only diverge if a component does. All four
r12_pack components are integer/string-only, so everything rides in
the exact `k`/`n` channels (val pinned 0.0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    wave_r13,
    wave_r14,
    window_r9,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


@register(
    "media_family_pack",
    oracle=f"""
        WITH mp1 AS ({_oracle("media_pack")}),
        mp2 AS ({_oracle("media_pack2")})
        SELECT kind, k, n, val FROM mp1
        UNION ALL SELECT kind, k, n, val FROM mp2
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "privacy", "similarity", "pack"),
    doc="Media family pack — media_pack (EXIF extract + GPS strip, "
    "ID3v2 extract + strip, zip/tar ingestion, WebDataset shard "
    "writer) and media_pack2 (MJPEG frame decode, MP3 L3 spectral, "
    "bitext margin mining) merged into one driver slot; both already "
    "emit the unified (kind, k, n, val) schema with disjoint kinds, "
    "so every output row of both components rides in the pack hash "
    "verbatim and none of the seven §2 rows loses its driver verdict. "
    "Component spark_fns and oracles reused verbatim — the pack can "
    "only diverge if a component does.",
)
def media_family_pack(spark, sf_dir):
    a = _fn("media_pack")(spark, sf_dir)
    b = _fn("media_pack2")(spark, sf_dir)
    return a.unionByName(b).orderBy("kind", "k")


@register(
    "r12_pack",
    oracle=f"""
        WITH tx AS ({_oracle("multimodal_tiff_extended")}),
        ad AS ({_oracle("audio_adpcm_roundtrip")}),
        hv AS ({_oracle("video_hevc_probe")}),
        og AS ({_oracle("audio_ogg_probe")}),
        hd AS ({_oracle("multimodal_hevc_decode")}),
        tx_rows AS (
            SELECT 'tiffx' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(ahash AS BIGINT) AS n, 0.0 AS val
            FROM tx),
        ad_rows AS (
            SELECT 'adpcm' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_samples AS VARCHAR)) AS k,
                   CAST(checksum AS BIGINT) AS n, 0.0 AS val
            FROM ad),
        hv_rows AS (
            SELECT 'hevc' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(width AS VARCHAR),
                             CAST(height AS VARCHAR),
                             CAST(bit_depth AS VARCHAR),
                             CAST(profile_idc AS VARCHAR),
                             CAST(level_idc AS VARCHAR),
                             CAST(n_irap AS VARCHAR),
                             CAST(n_idr AS VARCHAR)) AS k,
                   CAST(n_nals AS BIGINT) AS n, 0.0 AS val
            FROM hv),
        hd_rows AS (
            SELECT 'hevcd' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_px AS VARCHAR)) AS k,
                   CAST(ahash AS BIGINT) AS n, 0.0 AS val
            FROM hd),
        og_rows AS (
            SELECT 'ogg' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), codec,
                             CAST(channels AS VARCHAR),
                             CAST(sample_rate AS VARCHAR),
                             CAST(pre_skip AS VARCHAR),
                             CAST(n_pages AS VARCHAR)) AS k,
                   CAST(dur_s AS BIGINT) AS n, 0.0 AS val
            FROM og)
        SELECT kind, k, n, val FROM tx_rows
        UNION ALL SELECT kind, k, n, val FROM ad_rows
        UNION ALL SELECT kind, k, n, val FROM hv_rows
        UNION ALL SELECT kind, k, n, val FROM og_rows
        UNION ALL SELECT kind, k, n, val FROM hd_rows
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "audio", "video", "image", "pack"),
    doc="Round-12 pack — one driver slot giving the four r11 "
    "tests-only verification-channel rows hard driver verdicts: the "
    "extended TIFF decode surface (LZW both predictors / Deflate / "
    "tiled / 16-bit / planar-2 / JPEG-in-TIFF, every path real-"
    "libtiff-pinned in tests), the analytic IMA+MS ADPCM WAV decode, "
    "the Ogg container probe (real-CRC page walk, Vorbis/Opus id "
    "headers, granule duration semantics), and the HEVC stream probe "
    "(SPS geometry/profile/level via Exp-Golomb + conformance-window "
    "cropping, IRAP/IDR census, hvcC MP4 plumbing every third doc) — "
    "plus the round's own flagship: full HEVC INTRA DECODE (CABAC/"
    "quadtree/prediction/transforms, libde265-bit-exact in tests) "
    "through the analytic two-tone aHash oracle. "
    "All-integer outputs ride in the exact k/n channels. Component "
    "spark_fns and oracles reused verbatim — the pack can only "
    "diverge if a component does.",
)
def r12_pack(spark, sf_dir):
    tx = _fn("multimodal_tiff_extended")(spark, sf_dir)
    tx_rows = tx.select(
        F.lit("tiffx").alias("kind"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("ahash").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    ad = _fn("audio_adpcm_roundtrip")(spark, sf_dir)
    ad_rows = ad.select(
        F.lit("adpcm").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("n_samples").cast("string"),
        ).alias("k"),
        F.col("checksum").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    hv = _fn("video_hevc_probe")(spark, sf_dir)
    hv_rows = hv.select(
        F.lit("hevc").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("width").cast("string"), F.col("height").cast("string"),
            F.col("bit_depth").cast("string"),
            F.col("profile_idc").cast("string"),
            F.col("level_idc").cast("string"),
            F.col("n_irap").cast("string"), F.col("n_idr").cast("string"),
        ).alias("k"),
        F.col("n_nals").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    hd = _fn("multimodal_hevc_decode")(spark, sf_dir)
    hd_rows = hd.select(
        F.lit("hevcd").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("n_px").cast("string"),
        ).alias("k"),
        F.col("ahash").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    og = _fn("audio_ogg_probe")(spark, sf_dir)
    og_rows = og.select(
        F.lit("ogg").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("codec"),
            F.col("channels").cast("string"),
            F.col("sample_rate").cast("string"),
            F.col("pre_skip").cast("string"),
            F.col("n_pages").cast("string"),
        ).alias("k"),
        F.col("dur_s").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return (
        tx_rows.unionByName(ad_rows)
        .unionByName(hv_rows)
        .unionByName(og_rows)
        .unionByName(hd_rows)
        .orderBy("kind", "k")
    )
