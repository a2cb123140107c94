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


@register(
    "audio_mp3_probe",
    oracle="""
        WITH d AS (
            SELECT doc_id,
                   CASE doc_id % 4 WHEN 0 THEN 96 WHEN 1 THEN 128
                                   WHEN 2 THEN 192 ELSE 320 END AS br,
                   CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                                   ELSE 32000 END AS sr,
                   3 + doc_id % 5 AS n,
                   (doc_id % 7) * 13 AS id3b
            FROM documents WHERE doc_id < 96)
        SELECT doc_id,
               sr AS sample_rate,
               CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS channels,
               CAST(n AS BIGINT) AS n_frames,
               TRUE AS cbr,
               br AS bitrate_kbps,
               CAST(CASE WHEN id3b = 0 THEN 0 ELSE 10 + id3b END
                    AS BIGINT) AS first_off,
               CAST(n * ((144 * br * 1000) // sr) + n // 2 AS BIGINT)
                   AS stream_bytes
        FROM d
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "audio"),
    doc="MP3 frame-layer probe with an ANALYTIC oracle: per doc a "
    "structurally-valid MPEG-1 Layer III stream is synthesized with a "
    "doc-derived bitrate/sample-rate/frame-count/ID3v2-prefix and "
    "alternating padding bits; probe_mp3 walks it and the oracle states "
    "the frame count, CBR verdict, first frame offset (pinning the "
    "syncsafe ID3v2 skip) and total stream bytes (pinning the classic "
    "(144*br/sr)+padding frame-sizing math, e.g. 417/418 at 128k/44.1k) "
    "without seeing a byte (operators/mp3.py probe_mp3/build_mp3; "
    "ISO 11172-3 2.4.1.3).",
)
def audio_mp3_probe(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 96).select("doc_id")

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp3 import (
            build_mp3,
            probe_mp3,
        )

        brs = [96, 128, 192, 320]
        srs = [44100, 48000, 32000]
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                payload = build_mp3(
                    3 + did % 5,
                    bitrate_kbps=brs[did % 4],
                    sample_rate=srs[did % 3],
                    stereo=did % 2 == 0,
                    id3v2_bytes=(did % 7) * 13,
                )
                info = probe_mp3(payload)
                rows.append(
                    {
                        "doc_id": did,
                        "sample_rate": info["sample_rate"],
                        "channels": info["channels"],
                        "n_frames": info["n_frames"],
                        "cbr": info["cbr"],
                        "bitrate_kbps": info["bitrate_kbps"],
                        "first_off": info["frames"][0][0],
                        "stream_bytes": sum(fb for _off, fb in info["frames"]),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "n_frames",
                    "cbr", "bitrate_kbps", "first_off", "stream_bytes",
                ],
            )

    return d.mapInPandas(
        op,
        "doc_id long, sample_rate int, channels int, n_frames long, "
        "cbr boolean, bitrate_kbps int, first_off long, stream_bytes long",
    ).orderBy("doc_id")


@register(
    "webdataset_samples",
    oracle="""
        WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 64),
        sk AS (
            SELECT doc_id, s, 10 + (doc_id + s) % 5 AS base,
                   (doc_id + s) % 2 = 0 AS has_json
            FROM docs CROSS JOIN (VALUES (0), (1), (2), (3)) AS v(s)
            WHERE s < 2 + doc_id % 3)
        SELECT doc_id,
               lpad(CAST(s AS VARCHAR), 4, '0') AS sample_key,
               CAST(CASE WHEN has_json THEN 3 ELSE 2 END AS INT) AS n_parts,
               CASE WHEN has_json THEN 'bin,json,txt' ELSE 'bin,txt' END
                   AS exts,
               CAST(CASE WHEN s = 0 AND doc_id % 3 = 0
                         THEN (base + 3) + 50
                         ELSE 2 * (base + 3) END
                    + CASE WHEN has_json THEN base + 4 ELSE 0 END
                    AS BIGINT) AS total_bytes
        FROM sk
        ORDER BY doc_id, sample_key
    """,
    tags=("B10", "multimodal", "archives"),
    doc="WebDataset sample grouping with an ANALYTIC oracle: per doc a "
    "tar is built whose members follow the {sample:04d}.{ext} naming "
    "with doc-derived sample counts, extension sets, and member sizes; "
    "every third doc carries a DUPLICATE (sample, ext) member appended "
    "later in the archive with a different size, pinning tar append-"
    "override (last-wins) semantics. explode_archives -> "
    "group_webdataset_samples; the oracle states sample keys, part "
    "counts, sorted extension lists, and total member bytes "
    "(operators/archives.py group_webdataset_samples).",
)
def webdataset_samples(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        explode_archives,
        group_webdataset_samples,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
            build_tar,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                members = []
                for s in range(2 + did % 3):
                    base = 10 + (did + s) % 5
                    exts = ["bin", "txt"] + (
                        ["json"] if (did + s) % 2 == 0 else []
                    )
                    for ext in exts:
                        members.append(
                            (f"{s:04d}.{ext}", b"x" * (base + len(ext)))
                        )
                if did % 3 == 0:
                    members.append(("0000.txt", b"y" * 50))  # last wins
                rows.append({"archive_id": did, "payload": build_tar(members)})
            yield pd.DataFrame(rows, columns=["archive_id", "payload"])

    archives = d.mapInPandas(op, "archive_id long, payload binary")
    grouped = group_webdataset_samples(explode_archives(archives))
    return grouped.select(
        F.col("archive_id").alias("doc_id"),
        "sample_key",
        F.col("n_parts").cast("int").alias("n_parts"),
        F.array_join(F.array_sort(F.map_keys(F.col("parts"))), ",").alias("exts"),
        F.aggregate(
            F.map_values(F.col("parts")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + F.length(v),
        ).alias("total_bytes"),
    ).orderBy("doc_id", "sample_key")


@register(
    "audio_spectral_tone",
    oracle="""
        WITH d AS (
            SELECT doc_id, 1 + (doc_id % 6) * 5 AS k
            FROM documents WHERE doc_id < 48),
        b AS (
            SELECT doc_id, (k * 16) // 33 AS band FROM d),
        n AS (
            SELECT doc_id,
                   CAST(POWER(2, band % 4) AS BIGINT) AS nib
            FROM b)
        SELECT doc_id,
               CAST(nib * CAST(1229782938247303441 AS HUGEINT)
                    - CASE WHEN nib >= 8
                           THEN CAST(18446744073709551616 AS HUGEINT)
                           ELSE CAST(0 AS HUGEINT) END
                    AS BIGINT) AS fingerprint
        FROM n
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "audio", "dedup"),
    doc="Spectral audio fingerprint with an ANALYTIC oracle: per doc a "
    "pure tone at an exact per-window FFT bin k = 1 + (doc_id%6)*5 "
    "(64-sample windows, 16 windows) makes each window's rFFT a single "
    "peak at bin k; the 10%-of-peak floor discards every leakage/"
    "quantization bin, so the per-window nibble is exactly "
    "2^(((k*16)//33) % 4) and the 64-bit fingerprint is nib * "
    "0x1111111111111111 (two's complement when the nibble's high bit is "
    "set — the k=16 doc pins the negative case). Runs through WAV "
    "encode + the codec registry (operators/multimodal.py "
    "spectral_fingerprint/with_spectral_fingerprint).",
)
def audio_spectral_tone(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_spectral_fingerprint,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            encode_wav,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                k = 1 + (did % 6) * 5
                n = np.arange(1024, dtype=np.float64)
                x = 0.4 * np.sin(2.0 * np.pi * k * n / 64.0)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "payload": encode_wav(x, 8000),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_spectral_fingerprint(media, out_col="fingerprint")
        .select(F.col("media_id").alias("doc_id"), "fingerprint")
        .orderBy("doc_id")
    )


@register(
    "image_phash_dct",
    oracle="""
        WITH docs AS (
            SELECT doc_id,
                   6 + doc_id % 12 AS ystep,
                   3 + doc_id % 6 AS xstep,
                   ((6 + doc_id % 12) * 8) % 17 + 5 AS y2,
                   ((3 + doc_id % 6) * 6) % 17 + 6 AS x2
            FROM documents WHERE doc_id < 48),
        au AS (
            SELECT doc_id, u,
                   SUM((CASE WHEN u = 0 THEN 1.0/sqrt(2.0) ELSE 1.0 END)
                       * sqrt(2.0/32.0) * cos((2*y+1) * u * pi() / 64.0)
                       * (CASE WHEN y < ystep THEN 20.0 ELSE 41.0 END)) AS a,
                   SUM((CASE WHEN u = 0 THEN 1.0/sqrt(2.0) ELSE 1.0 END)
                       * sqrt(2.0/32.0) * cos((2*y+1) * u * pi() / 64.0)
                       * (CASE WHEN y < y2 THEN 3.0 ELSE 7.0 END)) AS c
            FROM docs
            CROSS JOIN generate_series(0, 7) AS gu(u)
            CROSS JOIN generate_series(0, 31) AS gy(y)
            GROUP BY doc_id, u),
        bv AS (
            SELECT doc_id, v,
                   SUM((CASE WHEN v = 0 THEN 1.0/sqrt(2.0) ELSE 1.0 END)
                       * sqrt(2.0/32.0) * cos((2*x+1) * v * pi() / 64.0)
                       * (CASE WHEN x < xstep THEN 1.0 ELSE 2.0 END)) AS b,
                   SUM((CASE WHEN v = 0 THEN 1.0/sqrt(2.0) ELSE 1.0 END)
                       * sqrt(2.0/32.0) * cos((2*x+1) * v * pi() / 64.0)
                       * (CASE WHEN x < x2 THEN 2.0 ELSE 5.0 END)) AS d
            FROM docs
            CROSS JOIN generate_series(0, 7) AS gv(v)
            CROSS JOIN generate_series(0, 31) AS gx(x)
            GROUP BY doc_id, v),
        blk AS (
            SELECT au.doc_id, u * 8 + v - 1 AS i,
                   au.a * bv.b + au.c * bv.d AS val
            FROM au JOIN bv USING (doc_id)
            WHERE NOT (u = 0 AND v = 0)),
        med AS (
            SELECT doc_id, quantile_cont(val, 0.5) AS m
            FROM blk GROUP BY doc_id)
        SELECT blk.doc_id,
               CAST(SUM(CASE WHEN val > m
                             THEN CAST(POWER(2, i) AS BIGINT) ELSE 0 END)
                    AS BIGINT) AS phash
        FROM blk JOIN med USING (doc_id)
        GROUP BY blk.doc_id
        ORDER BY blk.doc_id
    """,
    tags=("B10", "multimodal", "dedup"),
    doc="DCT perceptual hash (pHash) with an ANALYTIC oracle: per doc a "
    "32x32 grayscale image is the SUM OF TWO RANK-1 step patterns "
    "(a(y)b(x) + c(y)d(x), integer pixels <= 117), so every 8x8 "
    "low-frequency DCT coefficient is a(u)b(v)+c(u)d(v) — four 32-term "
    "cosine sums the oracle computes directly in SQL. The two-component "
    "design breaks the rank-1 product symmetry that creates exact "
    "coefficient ties: all 48 doc variants were verified to keep every "
    "non-median coefficient >= 0.014 from the median (12 orders above "
    "trig ulp noise), so the > median bit decisions are engine-stable; "
    "the median of 63 values is an exact order statistic in both "
    "engines and the max bit index is 62, so the hash is non-negative "
    "(operators/multimodal.py perceptual_hash; PNG roundtrip lossless).",
)
def image_phash_dct(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_perceptual_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            encode_png,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                ystep = 6 + did % 12
                xstep = 3 + did % 6
                y2 = (ystep * 8) % 17 + 5
                x2 = (xstep * 6) % 17 + 6
                a = np.where(np.arange(32) < ystep, 20, 41)
                b = np.where(np.arange(32) < xstep, 1, 2)
                c = np.where(np.arange(32) < y2, 3, 7)
                dd = np.where(np.arange(32) < x2, 2, 5)
                g = (np.outer(a, b) + np.outer(c, dd)).astype(np.uint8)
                px = np.repeat(g[:, :, None], 3, axis=2)
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "payload": encode_png(px),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_perceptual_hash(media, out_col="phash")
        .select(F.col("media_id").alias("doc_id"), "phash")
        .orderBy("doc_id")
    )


@register(
    "audio_resample_exact",
    oracle="""
        SELECT d.doc_id,
               CAST(256 AS BIGINT) AS n_out,
               CAST(SUM(i * (((d.doc_id * 7 + (2 * i) * 13) % 24001)
                             - 12000)) AS BIGINT) AS checksum
        FROM (SELECT doc_id FROM documents WHERE doc_id < 48) d
        CROSS JOIN generate_series(0, 255) AS g(i)
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """,
    tags=("B10", "multimodal", "audio"),
    doc="Linear-interp audio resample with an EXACT oracle: per doc a "
    "512-sample int16 WAV (v[n] = ((doc*7 + n*13) % 24001) - 12000, "
    "|v| <= 12000 so the 32768-decode/32767-encode asymmetry rounds "
    "back to the identical integer) is resampled 8000 -> 4000 Hz; the "
    "integer rate ratio makes every interpolation weight 0, so output "
    "sample i IS input sample 2i bit-exactly, and the oracle states the "
    "output length and the position-weighted sample checksum in SQL. "
    "Pins the position arithmetic, the interpolation identity path, and "
    "the 16-bit WAV re-encode (operators/multimodal.py "
    "resample_wav/resample_audio).",
)
def audio_resample_exact(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resample_audio,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select("doc_id")

    def build(batches):
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = np.arange(512, dtype=np.int64)
                v = ((did * 7 + n * 13) % 24001 - 12000).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(v.tobytes())
                rows.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "payload": buf.getvalue(),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    def probe(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            decode_wav,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x, _sr, _ch = decode_wav(bytes(payload))
                pcm = np.round(x * 32768.0).astype(np.int64)  # exact ints back
                rows.append(
                    {
                        "doc_id": int(mid),
                        "n_out": len(pcm),
                        "checksum": int(
                            (np.arange(len(pcm), dtype=np.int64) * pcm).sum()
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_out", "checksum"])

    media = d.mapInPandas(build, MEDIA_SCHEMA)
    out = resample_audio(media, 4000)
    return out.mapInPandas(
        probe, "doc_id long, n_out long, checksum long"
    ).orderBy("doc_id")


@register(
    "audio_resample_fractional",
    oracle="""
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 48),
        y AS (
            SELECT d.doc_id, g.i,
                   g.i * (8000.0 / 6000.0) AS pos
            FROM d CROSS JOIN generate_series(0, 383) AS g(i)),
        interp AS (
            SELECT doc_id, i,
                   GREATEST(LEAST(CAST(FLOOR(pos) AS BIGINT), 511), 0) AS lo,
                   pos FROM y),
        vals AS (
            SELECT doc_id, i, lo,
                   LEAST(lo + 1, 511) AS hi,
                   pos - lo AS frac
            FROM interp),
        out AS (
            SELECT doc_id, i,
                   CAST(ROUND(
                       ((((doc_id * 7 + lo * 13) % 24001 - 12000) / 32768.0)
                            * (1.0 - frac)
                        + (((doc_id * 7 + hi * 13) % 24001 - 12000) / 32768.0)
                            * frac) * 32767.0) AS BIGINT) AS v
            FROM vals)
        SELECT doc_id,
               CAST(384 AS BIGINT) AS n_out,
               CAST(SUM(i * v) AS BIGINT) AS checksum
        FROM out
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "audio"),
    doc="FRACTIONAL-ratio audio resample with a double-exact oracle: the "
    "8000 -> 6000 Hz path exercises real linear interpolation (fracs "
    "cycle ~0, 1/3, 2/3), and the oracle replays the EXACT IEEE double "
    "chain — pos = i*(8000.0/6000.0), clipped floor, "
    "x[lo]*(1-frac)+x[hi]*frac on /32768-normalized samples, *32767, "
    "round — in SQL with the identical operation order, so both engines "
    "produce bit-identical doubles; the only engine-divergent step "
    "(banker's vs half-away rounding) was verified tie-free across all "
    "48 doc variants (min distance from .5 is 1e-5, eight orders above "
    "double noise). Pins the interpolation weights themselves, which "
    "the integer-ratio twin (audio_resample_exact) cannot "
    "(operators/multimodal.py resample_wav).",
)
def audio_resample_fractional(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resample_audio,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select("doc_id")

    def build(batches):
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = np.arange(512, dtype=np.int64)
                v = ((did * 7 + n * 13) % 24001 - 12000).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(v.tobytes())
                rows.append(
                    {
                        "media_id": did,
                        "kind": "audio",
                        "payload": buf.getvalue(),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    def probe(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            decode_wav,
        )

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x, _sr, _ch = decode_wav(bytes(payload))
                pcm = np.round(x * 32768.0).astype(np.int64)
                rows.append(
                    {
                        "doc_id": int(mid),
                        "n_out": len(pcm),
                        "checksum": int(
                            (np.arange(len(pcm), dtype=np.int64) * pcm).sum()
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "n_out", "checksum"])

    media = d.mapInPandas(build, MEDIA_SCHEMA)
    out = resample_audio(media, 6000)
    return out.mapInPandas(
        probe, "doc_id long, n_out long, checksum long"
    ).orderBy("doc_id")


@register(
    "lake_optimize_snapshot_roundtrip",
    oracle="""
        WITH e AS (
            SELECT event_id, event_type, user_id
            FROM events WHERE event_id < 4000),
        opt_rows AS (
            SELECT 'optimized' AS kind, event_type AS k,
                   COUNT(*) AS n,
                   CAST(SUM(event_id) AS BIGINT) AS val
            FROM e GROUP BY 2),
        snap_rows AS (
            SELECT 'snapshot_v2' AS kind, event_type AS k,
                   COUNT(*) AS n,
                   CAST(SUM(event_id) AS BIGINT) AS val
            FROM e WHERE event_id % 2 = 1 GROUP BY 2),
        contract_rows AS (
            SELECT 'contract' AS kind, 'files_not_increased' AS k,
                   CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS val
            UNION ALL
            SELECT 'contract', 'stale_commit_raised', 1, 0
            UNION ALL
            SELECT 'contract', 'version_after', 2, 0)
        SELECT kind, k, n, val FROM opt_rows
        UNION ALL SELECT kind, k, n, val FROM snap_rows
        UNION ALL SELECT kind, k, n, val FROM contract_rows
        ORDER BY kind, k
    """,
    tags=("B10", "data-mgmt", "lake"),
    doc="OPTIMIZE + optimistic snapshot commits, end-state-checked: a "
    "flat table written as 16 deliberate small files is OPTIMIZE'd "
    "(compaction + user_id clustering via the rename-aside swap) and "
    "the read-back per-type content checksum must be IDENTICAL to the "
    "pre-optimize data (a rewrite that loses/duplicates a row flips the "
    "hash), with files-not-increased pinned as a contract row. Then the "
    "snapshot table: v1, a CAS-guarded v2 (expected_version=1), and a "
    "STALE second expected_version=1 commit that must raise "
    "ConcurrentSnapshotError and must NOT disturb v2 — the final "
    "version pointer and v2's content checksum are in the hash "
    "(lake.optimize_table / write_snapshot; Delta/Iceberg optimistic-"
    "concurrency semantics).",
)
def lake_optimize_snapshot_roundtrip(spark, sf_dir):
    import os
    import shutil

    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus.sources_sinks import (
        _SCRATCH,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import (
        ConcurrentSnapshotError,
        latest_snapshot_version,
        optimize_table,
        read_snapshot,
        write_snapshot,
    )

    e = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") < 4000)
        .select("event_id", "event_type", "user_id")
    )

    # --- OPTIMIZE: content must survive the rewrite byte-for-byte ---
    flat = os.path.join(_SCRATCH, "w9_optimize_flat")
    shutil.rmtree(flat, ignore_errors=True)
    shutil.rmtree(flat + "__opt_tmp", ignore_errors=True)
    shutil.rmtree(flat + "__opt_old", ignore_errors=True)
    e.repartition(16).write.mode("overwrite").parquet(flat)  # small files
    report = optimize_table(spark, flat, order_by=["user_id"])
    files_ok = int(report["files_after"] <= report["files_before"])
    opt_rows = (
        spark.read.parquet(flat)
        .groupBy(F.col("event_type").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("long").alias("val"),
        )
        .select(F.lit("optimized").alias("kind"), "k", "n", "val")
    )

    # --- optimistic snapshot commits: CAS succeeds once, stale raises ---
    snap = os.path.join(_SCRATCH, "w9_optimize_snap")
    shutil.rmtree(snap, ignore_errors=True)
    write_snapshot(e.where(F.col("event_id") % 2 == 0), snap)  # v1
    write_snapshot(
        e.where(F.col("event_id") % 2 == 1), snap, expected_version=1
    )  # v2 via CAS
    stale_raised = 0
    try:
        write_snapshot(e.limit(1), snap, expected_version=1)  # stale CAS
    except ConcurrentSnapshotError:
        stale_raised = 1
    version_after = latest_snapshot_version(snap)
    snap_rows = (
        read_snapshot(spark, snap)
        .groupBy(F.col("event_type").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("long").alias("val"),
        )
        .select(F.lit("snapshot_v2").alias("kind"), "k", "n", "val")
    )

    contract = spark.createDataFrame(
        [
            ("contract", "files_not_increased", files_ok, 0),
            ("contract", "stale_commit_raised", stale_raised, 0),
            ("contract", "version_after", version_after, 0),
        ],
        "kind string, k string, n long, val long",
    )
    return (
        opt_rows.unionByName(snap_rows).unionByName(contract).orderBy("kind", "k")
    )


@register(
    "multimodal_gif_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * ((8 + doc_id % 16 + 3) // 4)) AS BIGINT)
                   AS ahash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="GIF decode END-TO-END with an ANALYTIC oracle (the [r8] codec): "
    "per doc a 32x32 two-tone INTERLACED GIF89a (bright split at row "
    "8 + doc_id % 16, palette {40,200} grays) is decoded through the "
    "codec registry and average-hashed; two-tone means the hash is "
    "palette-exact regardless of LZW/interlace details and equals "
    "-(2^(8*ceil(split/4))) — the same closed form the PNG/MJPEG "
    "oracles pin — so any LZW, interlace-reorder, palette, or registry "
    "dispatch defect flips the hash (operators/gif.py decode_gif; "
    "CompuServe GIF89a spec incl. Appendix-E interlacing).",
)
def multimodal_gif_decode(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.gif import (
            encode_gif,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 8 + did % 16
                idx = np.zeros((32, 32), dtype=np.int32)
                idx[split:, :] = 1
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "payload": encode_gif(
                            idx, [(40, 40, 40), (200, 200, 200)], interlace=True
                        ),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_average_hash(media)
        .select(F.col("media_id").alias("doc_id"), "ahash")
        .orderBy("doc_id")
    )


@register(
    "multimodal_ico_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * ((8 + doc_id % 16 + 3) // 4)) AS BIGINT)
                   AS ahash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="ICO (favicon) decode END-TO-END with an ANALYTIC oracle (the "
    "[r8] codec): per doc a 32x32 two-tone 32-bpp ICO (bright split at "
    "row 8 + doc_id % 16, grays 40/200) is decoded through the codec "
    "registry and average-hashed; the two-tone design makes the hash "
    "exactly -(2^(8*ceil(split/4))) — the same closed form the "
    "PNG/GIF/MJPEG oracles pin — so any ICONDIR walk, DIB row-order "
    "(bottom-up), BGRA channel-order, or registry dispatch defect flips "
    "the hash (operators/ico.py decode_ico; Windows ICONDIR/"
    "BITMAPINFOHEADER layout).",
)
def multimodal_ico_decode(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ico import (
            encode_ico,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 8 + did % 16
                px = np.full((32, 32, 3), 40, dtype=np.uint8)
                px[split:, :, :] = 200
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "payload": encode_ico(px),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_average_hash(media)
        .select(F.col("media_id").alias("doc_id"), "ahash")
        .orderBy("doc_id")
    )
