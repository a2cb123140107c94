"""Round-6-session operator wave: KMV bottom-k sample sketch.

Completes the portable-sketch family (HLL = distinct counts, CMS =
frequencies, Bloom = membership, KMV = uniform sampling + quantiles +
a second distinct estimator) — see ``operators/kmv.py`` for the scale
shape (TakeOrderedAndProject, one scan, no shuffle, k-row state).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t

_K = 128
_DENOM = "4503599627370496.0"  # 16^13 = 2^52 — 13 hex digits are double-exact


def _kmv_oracle_branch(kind: str) -> str:
    """One (kind, stat, est) branch of the oracle. The 'merged' branch is
    the SAME computation as 'oneshot' — that IS the claim: bottom-k of
    shard-wise bottom-k's equals bottom-k of the union, exactly."""
    # ceil(q·128): 32, 64, 96, 116
    return f"""
        SELECT '{kind}' AS kind, s.stat, s.est FROM (
            WITH sk AS (
                SELECT CAST(o_orderkey AS VARCHAR) AS row_id,
                       CAST(o_totalprice AS DOUBLE) AS value,
                       md5('kmv:' || CAST(o_orderkey AS VARCHAR)) AS rank_hash
                FROM orders
                ORDER BY rank_hash, row_id
                LIMIT {_K}),
            ranked AS (
                SELECT value, rank_hash,
                       ROW_NUMBER() OVER (ORDER BY rank_hash, row_id) AS rn
                FROM sk),
            by_value AS (
                SELECT value, rn,
                       ROW_NUMBER() OVER (ORDER BY value, rn) AS vr
                FROM ranked)
            SELECT 'q25' AS stat, ROUND(value, 6) AS est FROM by_value WHERE vr = 32
            UNION ALL
            SELECT 'q50', ROUND(value, 6) FROM by_value WHERE vr = 64
            UNION ALL
            SELECT 'q75', ROUND(value, 6) FROM by_value WHERE vr = 96
            UNION ALL
            SELECT 'q90', ROUND(value, 6) FROM by_value WHERE vr = 116
            UNION ALL
            SELECT 'n_est',
                   -- small-sketch mirror: a sketch that never filled holds
                   -- the entire population → exact n, not (n-1)/u_n
                   CASE WHEN (SELECT MAX(rn) FROM ranked) < {_K}
                        THEN CAST((SELECT MAX(rn) FROM ranked) AS DOUBLE)
                        ELSE ROUND(((SELECT MAX(rn) FROM ranked) - 1.0)
                                   / (CAST(('0x' || substr(rank_hash, 1, 13)) AS BIGINT)
                                      / {_DENOM}), 6) END
            FROM ranked WHERE rn = (SELECT MAX(rn) FROM ranked)
            UNION ALL
            SELECT 'hash_check',
                   ROUND(CAST(SUM(CAST(('0x' || substr(rank_hash, 1, 13)) AS BIGINT))
                              AS DOUBLE) / {_DENOM}, 6)
            FROM ranked
        ) s
    """


@register(
    "sketch_kmv_sample",
    oracle=f"""
        SELECT kind, stat, est FROM (
            {_kmv_oracle_branch("oneshot")}
            UNION ALL
            {_kmv_oracle_branch("merged")}
        ) ORDER BY kind, stat
    """,
    tags=("B4", "B10", "sketch"),
    doc="KMV bottom-k sample sketch over orders (k=128, md5 rank-hash): "
    "type-1 quantile estimates (q25/50/75/90), the KMV row-count "
    "estimate (k-1)/u_k, and a membership checksum over the exact "
    "52-bit hash prefixes — every number a deterministic function of "
    "the k-row sketch, stated twice: once from a one-shot sketch of the "
    "table, once from MERGING three shard sketches (o_orderkey % 3). "
    "The two branches must be IDENTICAL rows — the oracle states the "
    "exact-merge property itself, not just each branch. Plan: "
    "TakeOrderedAndProject (per-partition top-k + k-row driver merge), "
    "one scan per sketch, no shuffle, no global sort.",
)
def sketch_kmv_sample(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.kmv import (
        bottomk_sketch,
        kmv_estimates,
        merge_bottomk,
    )

    o = t(spark, sf_dir, "orders")
    # (r15 note: a one-scan per-shard rank-window variant —
    # bottomk_sketch_sharded — was measured SLOWER here at sf0.1, 1.23 s
    # vs 0.98 s: the per-shard exchange + sort costs more than three
    # parallel TakeOrdered scans of a 150k-row table. The sharded form
    # remains the right shape when |shards| is large; at 3 shards the
    # filtered scans win.)
    shards = [
        bottomk_sketch(
            o.where(F.col("o_orderkey") % 3 == i), "o_orderkey", "o_totalprice", k=_K
        )
        for i in range(3)
    ]
    # r15: materialize BOTH sketches in one tagged frame — one driver job
    # runs all four TakeOrdered scans in parallel instead of two separate
    # checkpoint jobs inside kmv_estimates; the estimates then read the
    # ≤2k cached rows (pre_materialized skips the redundant re-checkpoint)
    both = (
        bottomk_sketch(o, "o_orderkey", "o_totalprice", k=_K)
        .select(F.lit("oneshot").alias("__kind"), "*")
        .unionByName(merge_bottomk(shards, k=_K).select(F.lit("merged").alias("__kind"), "*"))
        .localCheckpoint(eager=True)
    )
    oneshot = kmv_estimates(
        both.where(F.col("__kind") == "oneshot").drop("__kind"),
        k=_K,
        pre_materialized=True,
    )
    merged = kmv_estimates(
        both.where(F.col("__kind") == "merged").drop("__kind"),
        k=_K,
        pre_materialized=True,
    )
    return (
        oneshot.select(F.lit("oneshot").alias("kind"), "stat", "est")
        .unionByName(merged.select(F.lit("merged").alias("kind"), "stat", "est"))
        .orderBy("kind", "stat")
    )


@register(
    "ops_skew_report",
    oracle="""
        WITH per_key AS (
            SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n
            FROM events GROUP BY 1),
        totals AS (
            SELECT CAST(SUM(n) AS BIGINT) AS rows_, COUNT(*) AS keys_,
                   MAX(n) AS max_ FROM per_key),
        summary AS (
            SELECT 'summary' AS kind, CAST(NULL AS VARCHAR) AS key,
                   rows_ AS n, keys_ AS n_keys,
                   ROUND(CAST(rows_ AS DOUBLE) / keys_, 6) AS mean_n,
                   CAST(NULL AS DOUBLE) AS share,
                   ROUND(max_ * keys_ / CAST(rows_ AS DOUBLE), 6) AS skew_ratio
            FROM totals),
        top AS (
            SELECT 'hot_key' AS kind, key, CAST(n AS BIGINT) AS n,
                   CAST(NULL AS BIGINT) AS n_keys,
                   CAST(NULL AS DOUBLE) AS mean_n,
                   ROUND(CAST(n AS DOUBLE) / rows_, 6) AS share,
                   CAST(NULL AS DOUBLE) AS skew_ratio
            FROM per_key, totals
            ORDER BY n DESC, key LIMIT 8)
        SELECT kind, key, n, n_keys, mean_n, share, skew_ratio FROM summary
        UNION ALL
        SELECT kind, key, n, n_keys, mean_n, share, skew_ratio FROM top
        ORDER BY kind, n DESC, key
    """,
    tags=("B10", "saas", "ops"),
    doc="Key-skew diagnostic report over the events stream keyed by "
    "user_id: one summary row (row/key counts, mean key mass, max/mean "
    "skew ratio) + the 8 heaviest keys with their row share — the "
    "measured evidence behind the salted-join / AQE-skew decision. One "
    "map-side-combined groupBy; everything downstream is key-count-sized "
    "(operators/skew.py skew_report).",
)
def ops_skew_report(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.skew import (
        skew_report,
    )

    return skew_report(t(spark, sf_dir, "events"), "user_id", top_n=8)


@register(
    "multimodal_jpeg_ahash",
    oracle="""
        SELECT doc_id,
               CAST(doc_id % 2 AS INT) AS progressive,
               CAST((11 + doc_id % 16) // 4 AS INT) AS first_bright_row,
               -CAST(POWER(2, 8 * ((11 + doc_id % 16) // 4)) AS BIGINT) AS ahash
        FROM documents WHERE doc_id < 200
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal"),
    doc="JPEG decode → perceptual aHash with an ANALYTIC oracle: per doc "
    "a 32×32 two-tone image (dark top, bright bottom, split row varying "
    "with doc_id) is encoded as REAL JPEG — baseline for even ids, "
    "PROGRESSIVE (SOF2 scan ladder) for odd ids — then decoded by the "
    "full T.81 decoder and hashed. The contrast is ≥64 gray levels "
    "against a ≤±2 codec error, so the bit pattern is provably "
    "independent of DCT rounding: bright rows r≥ceil(split/4) set bytes "
    "r of the hash, i.e. signed aHash = -(2^(8·r0)) exactly. The oracle "
    "never sees a JPEG byte — any framing, Huffman, scan-ladder, or "
    "refinement defect changes the hash or drops rows "
    "(operators/jpeg.py; operators/multimodal.py average_hash).",
)
def multimodal_jpeg_ahash(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select("doc_id")

    def op(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 8 + did % 16  # source row where bright begins
                a = (did * 7) % 96  # dark tone (< 96)
                b = 160 + (did * 11) % 96  # bright tone (>= 160)
                px = np.full((32, 32, 3), a, dtype=np.uint8)
                px[split:, :, :] = b
                enc = encode_jpeg_progressive if did % 2 else encode_jpeg
                payload = enc(px, quality=90)
                rows.append(
                    {
                        "doc_id": did,
                        "progressive": did % 2,
                        "first_bright_row": (split + 3) // 4,
                        "ahash": average_hash(payload),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "progressive", "first_bright_row", "ahash"]
            )

    return d.mapInPandas(
        op, "doc_id long, progressive int, first_bright_row int, ahash long"
    ).orderBy("doc_id")


@register(
    "multimodal_flac_envelope",
    oracle="""
        SELECT doc_id,
               CAST(16 + doc_id % 32 AS INT) AS n_loud_frames,
               CAST(POWER(2, 16 + doc_id % 32) AS BIGINT) - 1 AS envhash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal"),
    doc="FLAC decode → audio envelope hash with an ANALYTIC oracle: per "
    "doc a 3200-sample PCM signal (loud sine for the first m/64, quiet "
    "for the rest, m varying with doc_id) is encoded as REAL FLAC "
    "(fixed predictors + Rice residuals), decoded by the full RFC 9639 "
    "chain (frame sync, CRC-8/16, STREAMINFO md5 cross-check), and "
    "RMS-envelope hashed. FLAC is LOSSLESS, so the expected bits are "
    "exact — envhash = 2^m − 1, stated by the oracle without seeing a "
    "FLAC byte. Any predictor, Rice, framing, or CRC defect changes "
    "the hash or drops rows (operators/flac.py; "
    "operators/multimodal.py audio_hash).",
)
def multimodal_flac_envelope(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
        encode_flac,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        audio_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        for pdf in batches:
            rows = []
            t_ax = np.arange(3200)
            for did in pdf["doc_id"]:
                did = int(did)
                m = 16 + did % 32
                loud = 8000 + (did % 5) * 1000
                quiet = 50 + did % 50
                amp = np.where(t_ax < m * 50, loud, quiet)
                x = (amp * np.sin(t_ax * 0.2)).astype(np.int64)
                payload = encode_flac(x, 16000)
                rows.append(
                    {
                        "doc_id": did,
                        "n_loud_frames": m,
                        "envhash": audio_hash(payload),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_loud_frames", "envhash"])

    return d.mapInPandas(
        op, "doc_id long, n_loud_frames int, envhash long"
    ).orderBy("doc_id")
