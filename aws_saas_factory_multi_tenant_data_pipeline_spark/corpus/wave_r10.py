"""Round-9 operator wave: the H.264 keyframe decode oracle + analytic
oracles for two formerly tests-only lifecycle rows (write lineage,
corrupt-file-resilient scan — r8 verdict "Next round" #8).

multimodal_h264_keyframes — real video-frame hashing end-to-end: per
doc a spec-literal MP4 (avc1 track, avcC parameter sets, two IDR
samples) is assembled by the from-spec H.264 encoder; the keyframes are
extracted by the container sample tables, decoded by the scoped
intra-only CAVLC decoder (``operators/h264.py``), and aHashed. Every
reconstructed pixel is a closed-form function of doc_id (DC-only
I_16x16 macroblocks: pixel = prediction + 4*C at QP 40, with the DC
prediction chain hand-derived per macroblock), so the per-frame aHash
is one of four CONSTANTS stated analytically in the oracle without
seeing a byte of H.264:

- even docs carry a horizontal two-tone split (dark top): frame 0
  hashes to -2^32 (bright bottom subsample rows), the inverted frame 1
  to 2^32-1;
- odd docs carry a vertical split: frame 0 to the 0xF0-per-row byte
  pattern (signed -1085102592571150096), frame 1 to 0x0F-per-row
  (1085102592571150095).

Any defect in CAVLC, dequantization, the Hadamard/core transforms, DC
prediction, avcC plumbing, or the hash path flips whole-row constants.
This is the north-star multimodal-column pipeline (SURVEY §2 line 279)
closing its last decode gap; reference parity: the media ingestion
surface (`README.md:1-109`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "multimodal_h264_keyframes",
    oracle="""
        SELECT doc_id,
               f AS frame_idx,
               TRUE AS is_keyframe,
               CAST(CASE
                    WHEN doc_id % 2 = 0 AND f = 0 THEN -4294967296
                    WHEN doc_id % 2 = 0 THEN 4294967295
                    WHEN f = 0 THEN -1085102592571150096
                    ELSE 1085102592571150095
                    END AS BIGINT) AS ahash
        FROM documents CROSS JOIN (VALUES (0), (1)) AS fr(f)
        WHERE doc_id < 48
        ORDER BY doc_id, frame_idx
    """,
    tags=("B10", "multimodal", "video"),
    doc="H.264 keyframe decode end-to-end with an ANALYTIC oracle: per "
    "doc a spec-literal avc1 MP4 (avcC SPS/PPS, two length-prefixed IDR "
    "samples from the from-spec encoder) is keyframe-sampled via the "
    "ISO-BMFF tables and decoded by the scoped intra-only CAVLC "
    "decoder. Frames are DC-only I_16x16 two-tone splits whose "
    "reconstruction is hand-derived (pixel = pred + 4*C at QP 40; the "
    "DC prediction chain per macroblock is stated in wave_r10.py), so "
    "each aHash is one of four constants the oracle states without "
    "reading a byte (operators/h264.py decode_access_unit; "
    "operators/mp4.py avcC; multimodal.avc_frame_hashes; ITU-T H.264 "
    "7.3/8.3/8.5/9.2).",
)
def multimodal_h264_keyframes(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        annexb_to_mp4_sample,
        encode_idr,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
        avcc_box,
        build_minimal_mp4,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        avc_frame_hashes,
        sample_video_frames,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select("doc_id")

    def dc_mb(level: int) -> dict:
        return {"kind": "i16", "pred": 2, "dc": [level] if level else []}

    def op(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                # dark = 128 + 4*dd, bright = dark + 8*k (both even, the
                # difference a multiple of 8 so the mid-predicted corner
                # MB's residual (bright-dark)/8 stays a whole DC level)
                dd = -(3 + did % 5)
                k = 2 + did % 7
                horiz = did % 2 == 0

                def frame(invert: bool) -> bytes:
                    # MB0 establishes the first tone from the 128
                    # default prediction; the same-tone neighbour copies
                    # it (DC pred, zero residual); the cross-tone MB
                    # shifts by +-(bright-dark) = 8k/4 = 2k levels; the
                    # corner MB predicts the midpoint (top+left)/2 and
                    # shifts by +-k levels to land on its tone exactly.
                    c0 = dd if not invert else dd + 2 * k
                    cx = 2 * k if not invert else -2 * k
                    c3 = k if not invert else -k
                    if horiz:
                        mbs = [dc_mb(c0), dc_mb(0), dc_mb(cx), dc_mb(c3)]
                    else:
                        mbs = [dc_mb(c0), dc_mb(cx), dc_mb(0), dc_mb(c3)]
                    return encode_idr(2, 2, mbs)

                parts = [
                    annexb_to_mp4_sample(frame(False)),
                    annexb_to_mp4_sample(frame(True)),
                ]
                payload = build_minimal_mp4(
                    [p[2] for p in parts],
                    width=32,
                    height=32,
                    config_box=avcc_box(parts[0][0], parts[0][1]),
                    keyframes=[1, 2],
                )
                rows.append(
                    {
                        "media_id": did,
                        "kind": "video",
                        "payload": payload,
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    frames = sample_video_frames(media, keyframes_only=True)
    return (
        avc_frame_hashes(frames)
        .select(
            F.col("media_id").alias("doc_id"),
            "frame_idx",
            "is_keyframe",
            "ahash",
        )
        .orderBy("doc_id", "frame_idx")
    )


@register(
    "lake_lineage_audit",
    oracle="""
        WITH c1 AS (SELECT COUNT(*) AS n FROM events WHERE event_id < 500),
        c2 AS (SELECT COUNT(*) AS n FROM events
               WHERE event_id < 500 AND event_id % 3 = 0)
        SELECT 'stage1' AS op, CAST(1 AS BIGINT) AS n_roots,
               CAST(-1 AS BIGINT) AS n_files,
               CAST(n AS BIGINT) AS n_rows, TRUE AS has_event_id
        FROM c1
        UNION ALL
        SELECT 'stage2', 1, 3, CAST(n AS BIGINT), TRUE FROM c2
        ORDER BY op
    """,
    tags=("B10", "data-mgmt", "lake"),
    doc="Write-lineage provenance audit, end-state-checked (SURVEY line "
    "332, tests-only before r9): a two-stage write chain records "
    "lineage via lake.record_lineage — stage1 writes an events subset "
    "(input root = the events parquet dir, exactly ONE root at any sf), "
    "stage2 reads the 3-file stage1 output back and writes a filtered "
    "child (input_roots = [stage1 dir], n_input_files = 3 pinned by the "
    "repartition(3) write). The recorded log is read back through "
    "read_lineage and reduced to SQL-statable facts: per-op input-root "
    "count, input-file count, the audited row count carried in extra, "
    "and an event_id column presence flag from the recorded schema. "
    "Logs and outputs are rebuilt from scratch each run (append-log "
    "idempotency).",
)
def lake_lineage_audit(spark, sf_dir):
    import os
    import shutil

    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus.sources_sinks import (
        _SCRATCH,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import (
        read_lineage,
        record_lineage,
    )

    a = os.path.join(_SCRATCH, "w10_lineage_a")
    b = os.path.join(_SCRATCH, "w10_lineage_b")
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)

    src = t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    n1 = src.count()
    # parquet write FIRST: overwrite mode clears the target dir, so the
    # lineage record must land after it
    src.repartition(3).write.mode("overwrite").parquet(a)
    record_lineage(src, a, "stage1", extra={"n_rows": n1})

    staged = spark.read.parquet(a).where(F.col("event_id") % 3 == 0)
    n2 = staged.count()
    staged.write.mode("overwrite").parquet(b)
    record_lineage(staged, b, "stage2", extra={"n_rows": n2})

    rows = []
    for root in (a, b):
        for e in read_lineage(root):
            rows.append(
                (
                    e["op"],
                    len(e["input_roots"]),
                    e["n_input_files"] if e["op"] == "stage2" else -1,
                    e["n_rows"],
                    "event_id" in e["schema"],
                )
            )
    return spark.createDataFrame(
        rows,
        "op string, n_roots long, n_files long, n_rows long, has_event_id boolean",
    ).orderBy("op")


@register(
    "scan_corrupt_resilient",
    oracle="""
        WITH survivors AS (
            SELECT event_type, value FROM events
            WHERE event_id < 2000 AND event_id % 4 <> 0)
        SELECT 'rows' AS kind, event_type AS k,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS val
        FROM survivors GROUP BY event_type
        UNION ALL
        SELECT 'contract', 'strict_read_failed', 1, 0
        UNION ALL
        SELECT 'contract', 'n_files', 4, 0
        ORDER BY kind, k
    """,
    tags=("B1", "data-mgmt"),
    doc="Corrupt-file-resilient scan, end-state-checked (SURVEY line "
    "342, tests-only before r9): four parquet files with KNOWN content "
    "(file i = events where event_id % 4 = i, written one residue class "
    "at a time so membership is SQL-statable), file 0 then truncated to "
    "10 bytes. read_parquet_resilient (per-read ignoreCorruptFiles + "
    "explicit schema) must degrade to EXACTLY the three intact residue "
    "classes — per-type counts and fixed-point value sums pinned — "
    "while the strict default read fails loudly (contract row). "
    "(sources.read_parquet_resilient; the in-lake Firehose error/ "
    "analog, reference README.md:41-47 quarantine convention.)",
)
def scan_corrupt_resilient(spark, sf_dir):
    import glob
    import os
    import shutil

    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus.sources_sinks import (
        _SCRATCH,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.sources import (
        read_parquet_resilient,
    )

    root = os.path.join(_SCRATCH, "w10_corrupt_scan")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    src = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") < 2000)
        .select("event_id", "event_type", "value")
    )
    schema = src.schema
    # one file per residue class, moved into the shared dir so each
    # file's membership is a pure function of event_id
    for i in range(4):
        part = os.path.join(root, f"__part{i}")
        src.where(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        (data_file,) = glob.glob(os.path.join(part, "*.parquet"))
        os.replace(data_file, os.path.join(root, f"class-{i}.parquet"))
        shutil.rmtree(part)
    victim = os.path.join(root, "class-0.parquet")
    blob = open(victim, "rb").read()
    open(victim, "wb").write(blob[:10])  # truncate: torn footer + magic

    strict_failed = 0
    try:
        spark.read.schema(schema).parquet(root).count()
    except Exception:
        strict_failed = 1

    res = read_parquet_resilient(spark, root, schema=schema)
    rows = res.groupBy(F.col("event_type").alias("k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1000).cast("long")).cast("long").alias("val"),
    ).select(F.lit("rows").alias("kind"), "k", "n", "val")
    contract = spark.createDataFrame(
        [
            ("contract", "strict_read_failed", strict_failed, 0),
            ("contract", "n_files", 4, 0),
        ],
        "kind string, k string, n long, val long",
    )
    return rows.unionByName(contract).orderBy("kind", "k")
