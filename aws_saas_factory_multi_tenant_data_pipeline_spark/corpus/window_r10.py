"""Round-9 graded-window packs: hard driver verdicts for the round-8
analytic tail oracles, with ZERO families losing driver coverage.

Two new slots:

  crawl_pack  — robots.txt RFC 9309 gate, MP4 frame sampling (both
                modes), WebDataset sample grouping (tar last-wins), and
                the MP3 frame/layer probe (4 §2 rows; all were local-
                oracle-only before this round)
  media_pack3 — GIF decode, ICO/BMP decode, image pHash (DCT), audio
                spectral fingerprint, audio envelope hash (WAV + FLAC
                transcode branch), and both audio resample oracles
                (integer-ratio + fractional) (6 §2 rows)

Slots are freed by MERGING, not displacing: `win_family_pack` wraps
win_rank_family + win_lag_lead verbatim (the B5 ranking and offset
families keep hard driver verdicts in one slot), and
`fn_string_datetime_pack` wraps fn_string + fn_datetime verbatim (the
B7 string and date/time families likewise). The merged originals move
to the tail head, still oracle-green locally — unlike a displacement,
no SURVEY §2 row downgrades from driver ✅ to local ✅.

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
    scalar_functions,
    wave_r8,
    wave_r9,
    windows,
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
    """Spark side of the k-string reduction: nullable columns arrive
    pre-wrapped; integers/bools must already be cast to string."""
    return F.concat_ws(":", *cols).alias("k")


@register(
    "crawl_pack",
    oracle=f"""
        WITH robots AS ({_oracle("crawl_robots_gate")}),
        frames AS ({_oracle("multimodal_frame_sampling")}),
        wds AS ({_oracle("webdataset_samples")}),
        mp3 AS ({_oracle("audio_mp3_probe")}),
        robots_rows AS (
            SELECT 'robots' AS kind,
                   concat_ws(':', host, CAST(n_allowed AS VARCHAR)) AS k,
                   CAST(n_urls AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="allow_doc_sum")} AS DOUBLE) AS val
            FROM robots),
        frame_rows AS (
            SELECT 'frame' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), mode,
                             CAST(frame_idx AS VARCHAR),
                             CAST(CAST(is_keyframe AS INT) AS VARCHAR),
                             CAST(byte0 AS VARCHAR)) AS k,
                   CAST(n_bytes AS BIGINT) AS n,
                   0.0 AS val
            FROM frames),
        wds_rows AS (
            SELECT 'wds' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), sample_key,
                             exts, CAST(n_parts AS VARCHAR)) AS k,
                   CAST(total_bytes AS BIGINT) AS n,
                   0.0 AS val
            FROM wds),
        mp3_rows AS (
            SELECT 'mp3' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(sample_rate AS VARCHAR),
                             CAST(channels AS VARCHAR),
                             CAST(CAST(cbr AS INT) AS VARCHAR),
                             CAST(bitrate_kbps AS VARCHAR),
                             CAST(first_off AS VARCHAR)) AS k,
                   CAST(n_frames AS BIGINT) AS n,
                   CAST(stream_bytes AS DOUBLE) AS val
            FROM mp3)
        SELECT kind, k, n, val FROM robots_rows
        UNION ALL SELECT kind, k, n, val FROM frame_rows
        UNION ALL SELECT kind, k, n, val FROM wds_rows
        UNION ALL SELECT kind, k, n, val FROM mp3_rows
        ORDER BY kind, k
    """,
    tags=("B10", "crawl", "multimodal", "pack"),
    doc="Round-9 crawl-pipeline pack — one driver slot covering four §2 "
    "rows that were local-oracle-only in r8: the robots.txt RFC 9309 "
    "gate (per-host allow counts + allowed-doc checksum; precedence/"
    "longest-match/wildcard replayed as SQL CASE in the component "
    "oracle), MP4 frame sampling in both modes (every-Nth and keyframe-"
    "only; per-frame sizes and first payload byte), WebDataset sample "
    "grouping with tar last-wins semantics, and the MP3 frame/layer "
    "probe (header math + ID3v2 skip; CBR detection, frame counts, "
    "stream bytes). Component spark_fns and oracles reused verbatim — "
    "the pack can only diverge if a component does.",
)
def crawl_pack(spark, sf_dir):
    robots = _fn("crawl_robots_gate")(spark, sf_dir)
    robots_rows = robots.select(
        F.lit("robots").alias("kind"),
        _ks(F.col("host"), F.col("n_allowed").cast("string")),
        F.col("n_urls").cast("long").alias("n"),
        F.pmod(F.col("allow_doc_sum"), F.lit(1000003)).cast("double").alias("val"),
    )
    frames = _fn("multimodal_frame_sampling")(spark, sf_dir)
    frame_rows = frames.select(
        F.lit("frame").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("mode"),
            F.col("frame_idx").cast("string"),
            F.col("is_keyframe").cast("int").cast("string"),
            F.col("byte0").cast("string"),
        ),
        F.col("n_bytes").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    wds = _fn("webdataset_samples")(spark, sf_dir)
    wds_rows = wds.select(
        F.lit("wds").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("sample_key"),
            F.col("exts"),
            F.col("n_parts").cast("string"),
        ),
        F.col("total_bytes").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    mp3 = _fn("audio_mp3_probe")(spark, sf_dir)
    mp3_rows = mp3.select(
        F.lit("mp3").alias("kind"),
        _ks(
            F.col("doc_id").cast("string"),
            F.col("sample_rate").cast("string"),
            F.col("channels").cast("string"),
            F.col("cbr").cast("int").cast("string"),
            F.col("bitrate_kbps").cast("string"),
            F.col("first_off").cast("string"),
        ),
        F.col("n_frames").cast("long").alias("n"),
        F.col("stream_bytes").cast("double").alias("val"),
    )
    return (
        robots_rows.unionByName(frame_rows)
        .unionByName(wds_rows)
        .unionByName(mp3_rows)
        .orderBy("kind", "k")
    )


@register(
    "media_pack3",
    oracle=f"""
        WITH gif AS ({_oracle("multimodal_gif_decode")}),
        ico AS ({_oracle("multimodal_ico_decode")}),
        ph AS ({_oracle("image_phash_dct")}),
        tone AS ({_oracle("audio_spectral_tone")}),
        env AS ({_oracle("audio_envelope_hash")}),
        rse AS ({_oracle("audio_resample_exact")}),
        rsf AS ({_oracle("audio_resample_fractional")}),
        gif_rows AS (
            SELECT 'gif' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="ahash")} AS DOUBLE) AS val
            FROM gif),
        ico_rows AS (
            SELECT 'ico' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="ahash")} AS DOUBLE) AS val
            FROM ico),
        ph_rows AS (
            SELECT 'phash' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="phash")} AS DOUBLE) AS val
            FROM ph),
        tone_rows AS (
            SELECT 'tone' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="fingerprint")} AS DOUBLE) AS val
            FROM tone),
        env_rows AS (
            SELECT 'env' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), kind) AS k,
                   CAST(0 AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="envhash")} AS DOUBLE) AS val
            FROM env),
        rse_rows AS (
            SELECT 'rs_exact' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(n_out AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="checksum")} AS DOUBLE) AS val
            FROM rse),
        rsf_rows AS (
            SELECT 'rs_frac' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(n_out AS BIGINT) AS n,
                   CAST({_SQL_PMOD.format(x="checksum")} AS DOUBLE) AS val
            FROM rsf)
        SELECT kind, k, n, val FROM gif_rows
        UNION ALL SELECT kind, k, n, val FROM ico_rows
        UNION ALL SELECT kind, k, n, val FROM ph_rows
        UNION ALL SELECT kind, k, n, val FROM tone_rows
        UNION ALL SELECT kind, k, n, val FROM env_rows
        UNION ALL SELECT kind, k, n, val FROM rse_rows
        UNION ALL SELECT kind, k, n, val FROM rsf_rows
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "pack"),
    doc="Round-9 media pack — one driver slot covering six §2 rows that "
    "were local-oracle-only in r8: GIF87a/89a decode (interlaced two-"
    "tone analytic aHash), ICO/BMP decode (largest-entry DIB analytic "
    "aHash), image pHash via the two-rank-1-step DCT, the audio "
    "spectral fingerprint (nibble-replication closed form incl. the "
    "two's-complement case), the audio envelope hash over BOTH the WAV "
    "and FLAC→WAV-transcode branches (transcode bit-identity is in the "
    "hash), and both audio resample oracles (integer-ratio exact + "
    "fractional IEEE-chain replay). Component spark_fns and oracles "
    "reused verbatim — the pack can only diverge if a component does.",
)
def media_pack3(spark, sf_dir):
    def simple(name, kind, id_col, hash_col, n_col=None):
        df = _fn(name)(spark, sf_dir)
        return df.select(
            F.lit(kind).alias("kind"),
            F.col(id_col).cast("string").alias("k"),
            (F.col(n_col).cast("long") if n_col else F.lit(0).cast("long")).alias("n"),
            F.pmod(F.col(hash_col), F.lit(1000003)).cast("double").alias("val"),
        )

    gif_rows = simple("multimodal_gif_decode", "gif", "doc_id", "ahash")
    ico_rows = simple("multimodal_ico_decode", "ico", "doc_id", "ahash")
    ph_rows = simple("image_phash_dct", "phash", "doc_id", "phash")
    tone_rows = simple("audio_spectral_tone", "tone", "doc_id", "fingerprint")
    env = _fn("audio_envelope_hash")(spark, sf_dir)
    env_rows = env.select(
        F.lit("env").alias("kind"),
        _ks(F.col("doc_id").cast("string"), F.col("kind")),
        F.lit(0).cast("long").alias("n"),
        F.pmod(F.col("envhash"), F.lit(1000003)).cast("double").alias("val"),
    )
    rse_rows = simple(
        "audio_resample_exact", "rs_exact", "doc_id", "checksum", n_col="n_out"
    )
    rsf_rows = simple(
        "audio_resample_fractional", "rs_frac", "doc_id", "checksum", n_col="n_out"
    )
    return (
        gif_rows.unionByName(ico_rows)
        .unionByName(ph_rows)
        .unionByName(tone_rows)
        .unionByName(env_rows)
        .unionByName(rse_rows)
        .unionByName(rsf_rows)
        .orderBy("kind", "k")
    )


@register(
    "win_family_pack",
    oracle=f"""
        WITH rk AS ({_oracle("win_rank_family")}),
        ll AS ({_oracle("win_lag_lead")}),
        rk_rows AS (
            SELECT 'rank' AS kind,
                   concat_ws(':', CAST(c_custkey AS VARCHAR),
                             CAST(c_nationkey AS VARCHAR),
                             CAST(rn AS VARCHAR), CAST(rnk AS VARCHAR),
                             CAST(drnk AS VARCHAR),
                             CAST(quartile AS VARCHAR)) AS k,
                   CAST(0 AS BIGINT) AS n,
                   pct_rank AS val
            FROM rk),
        ll_rows AS (
            SELECT 'offset' AS kind,
                   concat_ws(':', CAST(o_custkey AS VARCHAR),
                             CAST(o_orderkey AS VARCHAR),
                             COALESCE(CAST(prev_order AS VARCHAR), '~'),
                             COALESCE(CAST(next_order AS VARCHAR), '~'),
                             CAST(first_order AS VARCHAR),
                             CAST(last_order AS VARCHAR)) AS k,
                   CAST(0 AS BIGINT) AS n,
                   COALESCE(prev2_price, -1.0) AS val
            FROM ll)
        SELECT kind, k, n, val FROM rk_rows
        UNION ALL SELECT kind, k, n, val FROM ll_rows
        ORDER BY kind, k
    """,
    tags=("B5", "windows", "pack"),
    doc="B5 window-family pack — merges the two long-graded window slots "
    "into one with NOTHING reduced: every output row of win_rank_family "
    "(row_number/rank/dense_rank/ntile/percent_rank) and win_lag_lead "
    "(lag/lead/first/last over ordered partitions) rides in the hash "
    "verbatim (integers stringified into k, the percent_rank and "
    "lag-offset doubles in val). Frees one graded slot for crawl_pack "
    "while both B5 families keep hard driver verdicts.",
)
def win_family_pack(spark, sf_dir):
    rk = _fn("win_rank_family")(spark, sf_dir)
    rk_rows = rk.select(
        F.lit("rank").alias("kind"),
        _ks(
            F.col("c_custkey").cast("string"),
            F.col("c_nationkey").cast("string"),
            F.col("rn").cast("string"),
            F.col("rnk").cast("string"),
            F.col("drnk").cast("string"),
            F.col("quartile").cast("string"),
        ),
        F.lit(0).cast("long").alias("n"),
        F.col("pct_rank").alias("val"),
    )
    ll = _fn("win_lag_lead")(spark, sf_dir)
    ll_rows = ll.select(
        F.lit("offset").alias("kind"),
        _ks(
            F.col("o_custkey").cast("string"),
            F.col("o_orderkey").cast("string"),
            F.coalesce(F.col("prev_order").cast("string"), F.lit("~")),
            F.coalesce(F.col("next_order").cast("string"), F.lit("~")),
            F.col("first_order").cast("string"),
            F.col("last_order").cast("string"),
        ),
        F.lit(0).cast("long").alias("n"),
        F.coalesce(F.col("prev2_price"), F.lit(-1.0)).alias("val"),
    )
    return rk_rows.unionByName(ll_rows).orderBy("kind", "k")


@register(
    "fn_string_datetime_pack",
    oracle=f"""
        WITH s AS ({_oracle("fn_string")}),
        dt AS ({_oracle("fn_datetime")}),
        s_rows AS (
            SELECT 'str' AS kind,
                   concat_ws(':', CAST(p_partkey AS VARCHAR), lname,
                             ubrand, trimmed, first8,
                             CAST(nlen AS VARCHAR), joined, replaced,
                             padded, CAST(first_a AS VARCHAR), first_word,
                             devoweled, formatted,
                             CAST(CAST(has_gold AS INT) AS VARCHAR),
                             CAST(CAST(starts_lower AS INT) AS VARCHAR)) AS k,
                   CAST(0 AS BIGINT) AS n, 0.0 AS val
            FROM s),
        dt_rows AS (
            SELECT 'dt' AS kind,
                   concat_ws(':', CAST(o_orderkey AS VARCHAR),
                             CAST(y AS VARCHAR), CAST(m AS VARCHAR),
                             CAST(d AS VARCHAR), CAST(h AS VARCHAR),
                             CAST(mi AS VARCHAR),
                             CAST(CAST(month_start AS DATE) AS VARCHAR),
                             CAST(CAST(plus30 AS DATE) AS VARCHAR),
                             CAST(CAST(minus7 AS DATE) AS VARCHAR),
                             CAST(days_since_95 AS VARCHAR),
                             CAST(months_since_95 AS VARCHAR),
                             CAST(od AS VARCHAR), formatted) AS k,
                   epoch_s AS n, 0.0 AS val
            FROM dt)
        SELECT kind, k, n, val FROM s_rows
        UNION ALL SELECT kind, k, n, val FROM dt_rows
        ORDER BY kind, k
    """,
    tags=("B7", "functions", "pack"),
    doc="B7 scalar-function pack — merges the two long-graded function "
    "slots into one with NOTHING reduced: every output column of "
    "fn_string (case/trim/substr/split/replace/pad/instr/regex/format "
    "over part names) and fn_datetime (extract/trunc/add/diff/format/"
    "epoch over order dates) rides in the hash verbatim as a stringified "
    "k (integer->VARCHAR and DATE->ISO casts are engine-identical; "
    "epoch_s rides in n). Frees one graded slot for media_pack3 while "
    "both B7 families keep hard driver verdicts.",
)
def fn_string_datetime_pack(spark, sf_dir):
    s = _fn("fn_string")(spark, sf_dir)
    s_rows = s.select(
        F.lit("str").alias("kind"),
        _ks(
            F.col("p_partkey").cast("string"),
            F.col("lname"),
            F.col("ubrand"),
            F.col("trimmed"),
            F.col("first8"),
            F.col("nlen").cast("string"),
            F.col("joined"),
            F.col("replaced"),
            F.col("padded"),
            F.col("first_a").cast("string"),
            F.col("first_word"),
            F.col("devoweled"),
            F.col("formatted"),
            F.col("has_gold").cast("int").cast("string"),
            F.col("starts_lower").cast("int").cast("string"),
        ),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    dt = _fn("fn_datetime")(spark, sf_dir)
    dt_rows = dt.select(
        F.lit("dt").alias("kind"),
        _ks(
            F.col("o_orderkey").cast("string"),
            F.col("y").cast("string"),
            F.col("m").cast("string"),
            F.col("d").cast("string"),
            F.col("h").cast("string"),
            F.col("mi").cast("string"),
            F.col("month_start").cast("string"),
            F.col("plus30").cast("string"),
            F.col("minus7").cast("string"),
            F.col("days_since_95").cast("string"),
            F.col("months_since_95").cast("string"),
            F.col("od").cast("string"),
            F.col("formatted"),
        ),
        F.col("epoch_s").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return s_rows.unionByName(dt_rows).orderBy("kind", "k")
