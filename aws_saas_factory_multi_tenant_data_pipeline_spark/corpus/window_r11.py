"""Round-9 second-wave graded-window packs: hard driver verdicts for
the session's seven new oracle-backed operators, with ZERO families
losing driver coverage (the window_r10 convention).

Two slot changes:

  setop_sort_pack — MERGES the two long-graded B6 slots (setop_family +
                    sort_nulls_limit) verbatim: every labeled set-op row
                    and every top-100 sort row rides in the pack hash.
                    Frees one slot; both B6 families keep hard driver
                    verdicts. The originals move to the tail head,
                    still locally oracle-green.
  media_pack4     — the freed slot: QOI decode, baseline TIFF decode,
                    G.711 voice WAV decode, PQ train/encode/ADC search,
                    MaxSim late-interaction reranking, asymmetric
                    containment dedup, and the H.264 keyframe decode
                    chain (7 §2 rows; all were tail-oracle-only).

Packs reuse the already-oracle-green component queries verbatim: the
Spark side calls the component `spark_fn` and reduces its result; the
oracle wraps the component oracle SQL as a CTE and applies the same
reduction — a pack can only diverge if a component does. Unified output
schema (kind, k, n, val), the r4_mgmt_pack reduction rules: integers
stringified into `k`, ONE unscaled BIGINT in `n`, doubles in `val`,
full-range BIGINT hashes enter `val` only mod 1000003.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    setops,
    wave_r10,
    wave_r11,
    window50,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


#: DuckDB spelling of Spark's F.pmod(x, 1000003)
_SQL_PMOD = "(((({x}) % 1000003) + 1000003) % 1000003)"


def _ks(*cols):
    return F.concat_ws(":", *cols).alias("k")


@register(
    "setop_sort_pack",
    oracle=f"""
        WITH so AS ({_oracle("setop_family")}),
        srt AS ({_oracle("sort_nulls_limit")}),
        so_rows AS (
            SELECT 'setop' AS kind,
                   concat_ws(':', op, CAST(k AS VARCHAR)) AS k,
                   CAST(n AS BIGINT) AS n, 0.0 AS val
            FROM so),
        srt_rows AS (
            SELECT 'sort' AS kind,
                   concat_ws(':', CAST(o_orderkey AS VARCHAR), o_orderstatus,
                             COALESCE(prio, '~')) AS k,
                   CAST(0 AS BIGINT) AS n, 0.0 AS val
            FROM srt)
        SELECT kind, k, n, val FROM so_rows
        UNION ALL SELECT kind, k, n, val FROM srt_rows
        ORDER BY kind, k
    """,
    tags=("B6", "setops", "pack"),
    doc="B6 pack — merges the two long-graded B6 slots into one with "
    "NOTHING reduced: every labeled UNION ALL/UNION/INTERSECT/EXCEPT "
    "row of setop_family and every top-100 row of sort_nulls_limit "
    "(multi-key sort, NULLS FIRST, unique tie-break) rides in the hash "
    "verbatim. Frees one graded slot for media_pack4 while both B6 "
    "families keep hard driver verdicts.",
)
def setop_sort_pack(spark, sf_dir):
    so = _fn("setop_family")(spark, sf_dir)
    so_rows = so.select(
        F.lit("setop").alias("kind"),
        _ks(F.col("op"), F.col("k").cast("string")),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    srt = _fn("sort_nulls_limit")(spark, sf_dir)
    srt_rows = srt.select(
        F.lit("sort").alias("kind"),
        _ks(
            F.col("o_orderkey").cast("string"),
            F.col("o_orderstatus"),
            F.coalesce(F.col("prio"), F.lit("~")),
        ),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return so_rows.unionByName(srt_rows).orderBy("kind", "k")


@register(
    "media_pack4",
    oracle=f"""
        WITH qoi AS ({_oracle("multimodal_qoi_decode")}),
        tif AS ({_oracle("multimodal_tiff_decode")}),
        g711 AS ({_oracle("audio_g711_voice")}),
        pq AS ({_oracle("similarity_pq_adc")}),
        ms AS ({_oracle("similarity_maxsim_rerank")}),
        ct AS ({_oracle("dedup_containment")}),
        h264 AS ({_oracle("multimodal_h264_keyframes")}),
        qoi_rows AS (
            SELECT 'qoi' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="ahash")} AS DOUBLE) AS val
            FROM qoi),
        tif_rows AS (
            SELECT 'tiff' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="ahash")} AS DOUBLE) AS val
            FROM tif),
        g711_rows AS (
            SELECT 'g711' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_samples AS VARCHAR)) AS k,
                   CAST(weighted_sum AS BIGINT) AS n, 0.0 AS val
            FROM g711),
        pq_rows AS (
            SELECT 'pq' AS kind,
                   concat_ws(':', CAST(query_id AS VARCHAR),
                             CAST(vec_id AS VARCHAR),
                             CAST(rank AS VARCHAR)) AS k,
                   CAST(adc_dist AS BIGINT) AS n, 0.0 AS val
            FROM pq),
        ms_rows AS (
            SELECT 'maxsim' AS kind,
                   concat_ws(':', CAST(query_id AS VARCHAR),
                             CAST(doc_id AS VARCHAR),
                             CAST(rank AS VARCHAR)) AS k,
                   CAST(score AS BIGINT) AS n, 0.0 AS val
            FROM ms),
        ct_rows AS (
            SELECT 'contain' AS kind,
                   concat_ws(':', CAST(id_a AS VARCHAR), CAST(id_b AS VARCHAR),
                             CAST(n_a AS VARCHAR), CAST(n_b AS VARCHAR),
                             contained) AS k,
                   CAST(shared AS BIGINT) AS n,
                   c_ab + c_ba AS val
            FROM ct),
        h264_rows AS (
            SELECT 'h264' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(frame_idx AS VARCHAR),
                             CAST(CAST(is_keyframe AS INT) AS VARCHAR)) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="ahash")} AS DOUBLE) AS val
            FROM h264)
        SELECT kind, k, n, val FROM qoi_rows
        UNION ALL SELECT kind, k, n, val FROM tif_rows
        UNION ALL SELECT kind, k, n, val FROM g711_rows
        UNION ALL SELECT kind, k, n, val FROM pq_rows
        UNION ALL SELECT kind, k, n, val FROM ms_rows
        UNION ALL SELECT kind, k, n, val FROM ct_rows
        UNION ALL SELECT kind, k, n, val FROM h264_rows
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "similarity", "dedup", "pack"),
    doc="Round-9 second-wave pack — one driver slot covering seven §2 "
    "rows that were tail-oracle-only: QOI decode (two-tone analytic "
    "aHash through the chunk-stream state machine), baseline TIFF "
    "decode (byte order x PackBits x photometric x multi-strip "
    "rotation), G.711 voice WAV decode (ITU-T formula replayed in SQL, "
    "position-weighted), PQ ANN end-to-end (training replayed "
    "hash-for-hash on BIGINT micro-units; ranks exact), MaxSim "
    "late-interaction reranking (integer ColBERT scoring replayed in "
    "SQL), asymmetric containment dedup (both directions + swallowed "
    "side), and the H.264 intra keyframe chain (four closed-form "
    "per-frame aHash constants). Component spark_fns and oracles "
    "reused verbatim — the pack can only diverge if a component does.",
)
def media_pack4(spark, sf_dir):
    def hash_rows(name, kind, hash_col):
        df = _fn(name)(spark, sf_dir)
        return df.select(
            F.lit(kind).alias("kind"),
            F.col("doc_id").cast("string").alias("k"),
            F.lit(0).cast("long").alias("n"),
            F.pmod(F.col(hash_col), F.lit(1000003)).cast("double").alias("val"),
        )

    qoi_rows = hash_rows("multimodal_qoi_decode", "qoi", "ahash")
    tif_rows = hash_rows("multimodal_tiff_decode", "tiff", "ahash")
    g711 = _fn("audio_g711_voice")(spark, sf_dir)
    g711_rows = g711.select(
        F.lit("g711").alias("kind"),
        _ks(F.col("doc_id").cast("string"), F.col("n_samples").cast("string")),
        F.col("weighted_sum").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    pq = _fn("similarity_pq_adc")(spark, sf_dir)
    pq_rows = pq.select(
        F.lit("pq").alias("kind"),
        _ks(
            F.col("query_id").cast("string"),
            F.col("vec_id").cast("string"),
            F.col("rank").cast("string"),
        ),
        F.col("adc_dist").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    ms = _fn("similarity_maxsim_rerank")(spark, sf_dir)
    ms_rows = ms.select(
        F.lit("maxsim").alias("kind"),
        _ks(
            F.col("query_id").cast("string"),
            F.col("doc_id").cast("string"),
            F.col("rank").cast("string"),
        ),
        F.col("score").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    ct = _fn("dedup_containment")(spark, sf_dir)
    ct_rows = ct.select(
        F.lit("contain").alias("kind"),
        _ks(
            F.col("id_a").cast("string"),
            F.col("id_b").cast("string"),
            F.col("n_a").cast("string"),
            F.col("n_b").cast("string"),
            F.col("contained"),
        ),
        F.col("shared").cast("long").alias("n"),
        (F.col("c_ab") + F.col("c_ba")).alias("val"),
    )
    h264 = _fn("multimodal_h264_keyframes")(spark, sf_dir)
    h264_rows = h264.select(
        F.lit("h264").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("frame_idx").cast("string"),
            F.col("is_keyframe").cast("int").cast("string"),
        ),
        F.lit(0).cast("long").alias("n"),
        F.pmod(F.col("ahash"), F.lit(1000003)).cast("double").alias("val"),
    )
    return (
        qoi_rows.unionByName(tif_rows)
        .unionByName(g711_rows)
        .unionByName(pq_rows)
        .unionByName(ms_rows)
        .unionByName(ct_rows)
        .unionByName(h264_rows)
        .orderBy("kind", "k")
    )
