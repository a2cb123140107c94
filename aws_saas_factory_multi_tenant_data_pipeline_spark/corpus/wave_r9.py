"""Round-8 operator wave: analytic oracles for three tests-only rows.

Each of these operators has an SQL-checkable end state that was only
pytest-pinned before this round (round-7 verdict, "Next round" #4/#7):

- crawl_robots_gate   — the RFC 9309 robots.txt gate over a FIXED policy
  corpus: per-host allow/deny counts and an allowed-doc-id checksum are
  a closed-form function of the deterministic URL construction, so the
  oracle replays the longest-match / most-specific-agent decisions as
  plain CASE logic (group precedence §2.2.1, longest-octet rule §2.2.2,
  wildcard + $-anchor patterns, missing-policy default-allow all pinned).
- multimodal_frame_sampling — ISO-BMFF sample-table extraction: a
  spec-literal MP4 per doc (sample count, sizes, payload bytes, and sync
  table all stated functions of doc_id) is sampled in BOTH modes
  (every_n and keyframes_only); frame indices, keyframe flags, byte
  counts, and first payload byte are stated analytically.
- audio_envelope_hash — the audio near-dup envelope hash: a per-window
  two-level PCM signal (window w loud iff (doc_id + w) % 3 == 0) makes
  the 16-bit envelope exactly Σ 2^w over loud windows — through the WAV
  path directly AND through FLAC → transcode_audio → WAV (the codec
  registry seam), which must agree bit-for-bit since FLAC is lossless.

Reference parity: the reference pipeline's edge validation / error
routing (README.md:41-47) is the quarantine convention these operators
follow; the analytics themselves are [EXT] training-data-pipeline rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "crawl_robots_gate",
    oracle="""
        WITH urls AS (
            SELECT doc_id,
                   'h' || CAST(doc_id % 4 AS VARCHAR) || '.example.com' AS host,
                   CASE WHEN doc_id % 4 = 0 THEN
                            -- h0: '*' group; Disallow /private/ + /*.tmp$
                            NOT (doc_id % 3 = 0 OR doc_id % 11 = 0)
                        WHEN doc_id % 4 = 1 THEN
                            -- h1: specific mtdp-bot group SHADOWS the
                            -- '*' Disallow-all (RFC 9309 2.2.1); within
                            -- it, Allow /p3/f1 (6 octets) outranks
                            -- Disallow /p3 (3 octets)
                            CASE WHEN doc_id % 3 = 0 THEN TRUE
                                 WHEN doc_id % 7 = 3 THEN
                                     CAST(doc_id AS VARCHAR) LIKE '1%'
                                 ELSE TRUE END
                        -- h2: only an other-bot group exists -> no rules
                        -- for mtdp-bot; h3: no robots row at all
                        ELSE TRUE END AS allowed
            FROM documents WHERE doc_id < 400)
        SELECT host,
               COUNT(*) AS n_urls,
               CAST(SUM(CASE WHEN allowed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_allowed,
               CAST(COALESCE(SUM(CASE WHEN allowed THEN doc_id END), 0)
                    AS BIGINT) AS allow_doc_sum
        FROM urls
        GROUP BY host
        ORDER BY host
    """,
    tags=("B10", "crawl"),
    doc="RFC 9309 robots.txt curation gate with an ANALYTIC oracle: a "
    "deterministic URL corpus (path private/pN + .tmp/.html extension, "
    "all functions of doc_id) is gated by a FIXED four-host policy set "
    "exercising group precedence (a specific mtdp-bot group shadows a "
    "'*' Disallow-all), the longest-octet-match rule (Allow /p3/f1 "
    "outranks Disallow /p3), wildcard + $-anchored patterns "
    "(Disallow /*.tmp$), a non-matching-agent-only policy, and the "
    "missing-policy default-allow. The oracle replays every decision as "
    "CASE logic over doc_id — any parser/matcher/join defect changes a "
    "count or the allowed-id checksum (operators/robots.py "
    "filter_by_robots; RFC 9309 2.2.1-2.2.2).",
)
def crawl_robots_gate(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        filter_by_robots,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    path = F.concat(
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("/private/f"), F.col("doc_id").cast("string")),
        ).otherwise(
            F.concat(
                F.lit("/p"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit("/f"),
                F.col("doc_id").cast("string"),
            )
        ),
        F.when(F.col("doc_id") % 11 == 0, F.lit(".tmp")).otherwise(F.lit(".html")),
    )
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            (F.col("doc_id") % 4).cast("string"),
            F.lit(".example.com"),
            path,
        ).alias("url"),
    )
    robots = spark.createDataFrame(
        [
            (
                "h0.example.com",
                "User-agent: *\nDisallow: /private/\nDisallow: /*.tmp$\n",
            ),
            (
                "h1.example.com",
                "User-agent: *\nDisallow: /\n"
                "User-agent: mtdp-bot\nDisallow: /p3\nAllow: /p3/f1\n",
            ),
            ("h2.example.com", "User-agent: other-bot\nDisallow: /\n"),
        ],
        "host string, robots_txt string",
    )
    gated = filter_by_robots(
        pages, robots, user_agent="mtdp-bot", keep_disallowed=True
    )
    return (
        gated.groupBy(
            F.concat(
                F.lit("h"),
                (F.col("doc_id") % 4).cast("string"),
                F.lit(".example.com"),
            ).alias("host")
        )
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.col("allowed").cast("int")).cast("long").alias("n_allowed"),
            F.coalesce(
                F.sum(F.when(F.col("allowed"), F.col("doc_id"))), F.lit(0)
            ).cast("long").alias("allow_doc_sum"),
        )
        .orderBy("host")
    )


@register(
    "multimodal_frame_sampling",
    oracle="""
        WITH docs AS (
            SELECT doc_id, 5 + doc_id % 6 AS n_samples
            FROM documents WHERE doc_id < 48),
        every3 AS (
            SELECT doc_id, 'every3' AS mode, fi AS frame_idx
            FROM docs CROSS JOIN (VALUES (0), (3), (6), (9)) AS f(fi)
            WHERE fi < n_samples),
        keys AS (
            SELECT doc_id, 'key' AS mode, fi AS frame_idx
            FROM docs CROSS JOIN (VALUES (0), (4)) AS f(fi)),
        allrows AS (
            SELECT * FROM every3 UNION ALL SELECT * FROM keys)
        SELECT doc_id, mode, frame_idx,
               frame_idx IN (0, 4) AS is_keyframe,
               CAST(10 + (doc_id + frame_idx) % 7 AS BIGINT) AS n_bytes,
               CAST((doc_id + frame_idx) % 251 AS BIGINT) AS byte0
        FROM allrows
        ORDER BY doc_id, mode, frame_idx
    """,
    tags=("B10", "multimodal", "video"),
    doc="MP4 frame sampling with an ANALYTIC oracle: per doc a "
    "spec-literal ISO-BMFF file is assembled whose sample count "
    "(5 + doc_id % 6), per-sample size (10 + (doc_id+i) % 7), payload "
    "fill byte ((doc_id+i) % 251), and sync table ({1,5}) are all "
    "stated functions of doc_id; sample_video_frames then runs in BOTH "
    "modes (every_n=3 and keyframes_only) and the oracle states the "
    "expected frame indices, keyframe flags, byte counts, and first "
    "payload byte without reading a byte of MP4 — any stsz/stss/stsc/"
    "stco walk or extraction defect changes the row set "
    "(operators/mp4.py build_minimal_mp4/extract_samples; "
    "operators/multimodal.py sample_video_frames; ISO 14496-12).",
)
def multimodal_frame_sampling(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
        build_minimal_mp4,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_video_frames,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select("doc_id")

    def op(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 5 + did % 6
                samples = [
                    bytes([(did + i) % 251]) * (10 + (did + i) % 7)
                    for i in range(n)
                ]
                rows.append(
                    {
                        "media_id": did,
                        "kind": "video",
                        "payload": build_minimal_mp4(
                            samples, width=16, height=16, keyframes=[1, 5]
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    every3 = sample_video_frames(media, every_n=3).withColumn(
        "mode", F.lit("every3")
    )
    keys = sample_video_frames(media, keyframes_only=True).withColumn(
        "mode", F.lit("key")
    )
    both = every3.unionByName(keys)
    return both.select(
        F.col("media_id").alias("doc_id"),
        "mode",
        "frame_idx",
        "is_keyframe",
        F.length(F.col("frame_bytes")).cast("long").alias("n_bytes"),
        F.conv(F.hex(F.substring(F.col("frame_bytes"), 1, 1)), 16, 10)
        .cast("long")
        .alias("byte0"),
    ).orderBy("doc_id", "mode", "frame_idx")


@register(
    "audio_envelope_hash",
    oracle="""
        WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 48),
        bits AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN (doc_id + w) % 3 = 0
                                 THEN CAST(POWER(2, w) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS envhash
            FROM docs CROSS JOIN (
                VALUES (0),(1),(2),(3),(4),(5),(6),(7),
                       (8),(9),(10),(11),(12),(13),(14),(15)) AS f(w)
            GROUP BY doc_id)
        SELECT doc_id, kind, envhash
        FROM bits CROSS JOIN (VALUES ('flacwav'), ('wav')) AS k(kind)
        ORDER BY doc_id, kind
    """,
    tags=("B10", "multimodal", "audio", "dedup"),
    doc="Audio near-dup envelope hash with an ANALYTIC oracle: per doc a "
    "1024-sample PCM signal whose 16 equal windows are loud (constant "
    "amplitude 0.5) iff (doc_id + w) % 3 == 0 and silent otherwise — so "
    "window RMS is exactly 0.5 or 0, the mean is strictly between, and "
    "the 16-bit envelope hash equals Σ 2^w over loud windows, stated in "
    "SQL. Runs through TWO paths that must agree bit-for-bit: the WAV "
    "payload directly, and a FLAC encode -> transcode_audio (codec-"
    "registry dispatch) -> WAV -> hash chain, pinning that the audio "
    "dedup row survives the registry seam (operators/multimodal.py "
    "audio_hash/transcode_audio; operators/flac.py encode_flac).",
)
def audio_envelope_hash(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_wav,
        transcode_audio,
        with_audio_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
            encode_flac,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                x = np.zeros(1024, dtype=np.float64)
                ints = np.zeros(1024, dtype=np.int64)
                for w in range(16):
                    if (did + w) % 3 == 0:
                        x[w * 64 : (w + 1) * 64] = 0.5
                        ints[w * 64 : (w + 1) * 64] = 16384  # 0.5 in int16
                # media_id parity carries the path: even = direct WAV,
                # odd = FLAC (transcode_audio rewrites meta.mime, so the
                # id is the only stable path marker)
                rows.append(
                    {
                        "media_id": did * 2,
                        "kind": "audio",
                        "payload": encode_wav(x, 8000),
                        "meta": None,
                    }
                )
                rows.append(
                    {
                        "media_id": did * 2 + 1,
                        "kind": "audio",
                        "payload": encode_flac(ints.tolist(), 8000),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    # the FLAC rows go through the registry transcode first — lossless,
    # so both paths must produce the identical envelope
    uniform = transcode_audio(media).drop("transcoded")
    hashed = with_audio_hash(uniform, n_frames=16, out_col="envhash")
    return hashed.select(
        F.floor(F.col("media_id") / 2).cast("long").alias("doc_id"),
        F.when(F.pmod(F.col("media_id"), F.lit(2)) == 0, F.lit("wav"))
        .otherwise(F.lit("flacwav"))
        .alias("kind"),
        F.col("envhash").cast("long").alias("envhash"),
    ).orderBy("doc_id", "kind")
