"""Round-13 operator wave (r12 verdict "Next round" #1/#4/#5): the
HEIC quarantine closes (HEIF items → the from-spec HEVC intra decoder,
grid + irot included), the AV1 OBU probe gives AVIF its honest first
slice, and the streaming sink (A3 — the last §2 row without a
CORRECTNESS-visible verdict) gets an availableNow-trigger lake
roundtrip."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "multimodal_heic_decode",
    oracle="""
        SELECT doc_id,
               CASE
                 WHEN doc_id % 3 = 1 THEN -CAST(POWER(2, 32) AS BIGINT)
                 WHEN doc_id % 3 = 2
                   THEN CAST(POWER(2, 8 * (6 - doc_id % 4)) AS BIGINT) - 1
                 ELSE -CAST(POWER(2, 8 * (2 + doc_id % 4)) AS BIGINT)
               END AS ahash,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 5 ELSE 1 END AS INT)
                 AS n_items,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 4 ELSE 0 END AS INT)
                 AS n_tiles,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 180 ELSE 0 END AS INT)
                 AS rotation
        FROM documents WHERE doc_id < 48
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="HEIC DECODE end-to-end with an ANALYTIC oracle (the [r13] "
    "container — closes the r11/r12 named HEIF quarantine: ISO 23008-12 "
    "items routed through the from-spec HEVC intra decoder, pinned "
    "PIXEL-EXACT against the system libheif in tests/test_heif.py on "
    "single items, 2x2 grids, rotations, and libheif's own encodes): "
    "per doc a 32x32 two-tone luma frame (split at row 8 + 4*(doc_id%4)) "
    "is fixture-encoded and wrapped three ways by doc_id%3 — plain hvc1 "
    "primary item, a 2x2 grid of 16x16 tiles split at the tile boundary "
    "(iloc construction-method-1 idat payload), or an irot-180 item "
    "whose rotation flips the tone split to the top — then sniffed and "
    "decoded through the codec registry and average-hashed; the probe "
    "fields (item/tile census, rotation) ride alongside so the "
    "container walk is graded with the pixels "
    "(operators/heif.py; ISO/IEC 23008-12 §6, ISO/IEC 14496-12 §8.11).",
)
def multimodal_heic_decode(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select(
        "doc_id"
    )

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
            build_heif,
            probe_heif,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
            encode_hevc_intra,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            _ahash_pixels,
            decode_image,
            sniff_image_format,
        )

        def two_tone(h, w, split, dark):
            y = np.full((h, w), dark, dtype=np.uint8)
            y[split:] = dark + 140
            u = np.full((h // 2, w // 2), 128, dtype=np.uint8)
            v = np.full_like(u, 128)
            return y, u, v

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                dark = 30 + did % 21
                split = 8 + 4 * (did % 4)
                qp = 18 + did % 10
                mode = did % 3
                if mode == 1:
                    # grid: tone split at the 16-row tile boundary —
                    # top tiles dark, bottom tiles bright
                    tiles = []
                    for r in range(2):
                        for c in range(2):
                            ty = np.full(
                                (16, 16),
                                dark if r == 0 else dark + 140,
                                dtype=np.uint8,
                            )
                            tu = np.full((8, 8), 128, dtype=np.uint8)
                            tiles.append(
                                encode_hevc_intra([(ty, tu, tu)], qp=qp)
                            )
                    payload = build_heif(tiles, grid=(2, 2, 32, 32))
                else:
                    st = encode_hevc_intra(
                        [two_tone(32, 32, split, dark)], qp=qp
                    )
                    payload = build_heif(
                        [st], rotation=180 if mode == 2 else 0
                    )
                if sniff_image_format(payload) != "heif":
                    raise ValueError("HEIC payload failed format sniff")
                px, w, h = decode_image(payload)
                p = probe_heif(payload)
                rows.append(
                    {
                        "doc_id": did,
                        "ahash": _ahash_pixels(px, w, h),
                        "n_items": p["n_items"],
                        "n_tiles": p["n_tiles"],
                        "rotation": p["rotation"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "ahash", "n_items", "n_tiles",
                         "rotation"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, ahash long, n_items int, n_tiles int, rotation int",
    ).orderBy("doc_id")


@register(
    "video_hevc_main10",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * (2 + doc_id % 4)) AS BIGINT) AS ahash,
               CAST(10 AS INT) AS bit_depth,
               CAST(1024 AS BIGINT) AS n_px
        FROM documents WHERE doc_id < 40
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "video"),
    doc="HEVC Main10 (10-bit) intra decode END-TO-END with an ANALYTIC "
    "oracle (the [r13] scope growth — bit depth threaded through "
    "dequant/transform/QpBdOffset/SAO/deblock, pinned BIT-EXACT "
    "against libde265 on real x265-10bit streams across the toolset "
    "in tests/test_hevc_decode.py): per doc a 32x32 10-bit two-tone "
    "luma frame (tones (30+doc_id%21)*4 / +560, split at row "
    "8+4*(doc_id%4)) is fixture-encoded as a Main10 stream "
    "(profile_idc 2, bit_depth ue(2)) at QP 18+doc_id%14 and decoded "
    "back — the stream probe grades the signalled bit depth, the "
    "decoded uint16 planes scale >>2 into the same closed-form aHash "
    "as the 8-bit twin; any bdShift/stage-2-shift/Qp'-domain defect "
    "flips it (operators/hevc_decode.py, hevc_enc.py; ITU-T H.265 "
    "A.3.5 Main10).",
)
def video_hevc_main10(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 40).select(
        "doc_id"
    )

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc import (
            probe_hevc_annexb,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
            decode_hevc_intra,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
            encode_hevc_intra,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            _ahash_pixels,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                dark = (30 + did % 21) * 4
                split = 8 + 4 * (did % 4)
                y = np.full((32, 32), dark, dtype=np.uint16)
                y[split:] = dark + 560
                u = np.full((16, 16), 512, dtype=np.uint16)
                v = np.full((16, 16), 440 + did % 31, dtype=np.uint16)
                bs = encode_hevc_intra([(y, u, v)], qp=18 + did % 14,
                                       bit_depth=10)
                info = probe_hevc_annexb(bs)
                yd, _u, _v = decode_hevc_intra(bs)[0]
                y8 = (yd >> 2).astype(np.uint8)
                px = np.repeat(y8[:, :, None], 3, axis=2)
                rows.append({
                    "doc_id": did,
                    "ahash": _ahash_pixels(px, 32, 32),
                    "bit_depth": int(info["bit_depth_luma"]),
                    "n_px": int(yd.size),
                })
            yield pd.DataFrame(
                rows, columns=["doc_id", "ahash", "bit_depth", "n_px"]
            )

    return d.mapInPandas(
        op, "doc_id long, ahash long, bit_depth int, n_px long"
    ).orderBy("doc_id")


@register(
    "video_av1_probe",
    oracle="""
        SELECT doc_id,
               CAST(32 + 16 * (doc_id % 5) AS INT) AS width,
               CAST(24 + 8 * (doc_id % 7) AS INT) AS height,
               CAST(CASE WHEN doc_id % 4 = 3 THEN 2 ELSE 0 END AS INT)
                 AS profile,
               CAST(CASE WHEN doc_id % 4 = 1 THEN 10
                         WHEN doc_id % 4 = 3 THEN 12
                         ELSE 8 END AS INT) AS bit_depth,
               CAST(doc_id % 4 = 2 AS BOOLEAN) AS monochrome,
               CAST(2 AS INT) AS n_obus
        FROM documents WHERE doc_id < 44
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "video"),
    doc="AV1/AVIF structure probe (the [r13] honest first slice of the "
    "AVIF boundary): per doc a fixture AVIF (av01 item + av1C record + "
    "OBU stream with a reduced-still sequence header) rotates geometry "
    "(32+16*(id%5) x 24+8*(id%7)), bit depth 8/10/12, monochrome, and "
    "profile (0/2); probe_avif walks the container, parses the av1C "
    "AND the §5.5 sequence header, and cross-checks them — the parse "
    "direction is pinned on REAL libheif/libaom-written AVIF files in "
    "tests/test_realworld_r13.py, and the transform decode remains a "
    "named quarantine (operators/av1.py; AV1 spec §5.2-5.5, "
    "AV1-ISOBMFF §2.3).",
)
def video_av1_probe(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 44).select(
        "doc_id"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.av1 import (
            build_avif,
            probe_avif,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = 32 + 16 * (did % 5)
                h = 24 + 8 * (did % 7)
                mode = did % 4
                bd = {0: 8, 1: 10, 2: 8, 3: 12}[mode]
                prof = 2 if mode == 3 else 0
                mono = mode == 2
                payload = build_avif(w, h, profile=prof, bit_depth=bd,
                                     monochrome=mono)
                p = probe_avif(payload)
                rows.append({
                    "doc_id": did,
                    "width": p["width"],
                    "height": p["height"],
                    "profile": p["profile"],
                    "bit_depth": p["bit_depth"],
                    "monochrome": p["monochrome"],
                    "n_obus": p["n_obus"],
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "profile",
                         "bit_depth", "monochrome", "n_obus"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, width int, height int, profile int, bit_depth int,"
        " monochrome boolean, n_obus int",
    ).orderBy("doc_id")


@register(
    "stream_sink_roundtrip",
    oracle="""
        SELECT 'e' || CAST(event_id AS VARCHAR) AS event,
               't' || CAST(event_id % 3 AS VARCHAR) AS tenant,
               'd' || CAST(event_id % 4 AS VARCHAR) AS device,
               CASE WHEN event_id % 2 = 0 THEN 'US' ELSE 'EU' END
                 AS region,
               '2023' AS year,
               '22' AS hour,
               CAST(9 AS BIGINT) AS n_quarantined
        FROM events WHERE event_id < 60 AND event_id % 7 <> 3
        ORDER BY event
    """,
    tags=("A3", "A4", "A5", "B8"),
    doc="STREAMING SINK ROUNDTRIP — the A3 row's own driver verdict "
    "(r12 verdict #5; until r13 the sink was pytest-only because its "
    "batch twin carried the oracle): 60 raw JSON records (every 7th "
    "malformed) are written to a file source, a REAL availableNow "
    "foreachBatch streaming query (start_ingest_stream — checkpointed, "
    "the A1→A5 pipeline) ingests them into a Hive-partitioned lake "
    "with a pinned ingest timestamp, and the committed lake plus the "
    "quarantine dir are read BACK and hashed — partition layout "
    "(tenant/year/hour from the A4 strftime columns), enrich fields, "
    "and the A5 error split all ride in the oracle "
    "(streaming/__init__.py:52; reference kinesis-stack.ts:137-162).",
)
def stream_sink_roundtrip(spark, sf_dir):
    import json
    import os
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="sink_roundtrip_")
    try:
        src = os.path.join(work, "src")
        lake = os.path.join(work, "lake")
        ckpt = os.path.join(work, "ckpt")
        os.makedirs(src)
        ids = [r.event_id for r in (
            t(spark, sf_dir, "events")
            .where(F.col("event_id") < 60)
            .select("event_id").distinct().collect()
        )]
        with open(os.path.join(src, "batch0.json"), "w") as f:
            for i in sorted(int(x) for x in ids):
                if i % 7 == 3:
                    f.write(json.dumps(
                        {"tenant_id": f"t{i % 3}", "raw": "{oops"}
                    ) + "\n")
                    continue
                rec = {
                    "tenant_id": f"t{i % 3}",
                    "raw": json.dumps({"Data": {
                        "device": f"d{i % 4}",
                        "event": f"e{i}",
                        "region": "US" if i % 2 == 0 else "EU",
                    }}),
                }
                f.write(json.dumps(rec) + "\n")
        from pyspark.sql import types as T

        from aws_saas_factory_multi_tenant_data_pipeline_spark.sources import (
            read_lake,
            stream_json_source,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.streaming import (
            start_ingest_stream,
        )

        schema = T.StructType([
            T.StructField("tenant_id", T.StringType()),
            T.StructField("raw", T.StringType()),
        ])
        q = start_ingest_stream(
            stream_json_source(spark, src, schema), lake, ckpt,
            available_now=True, ingest_ts=1700000000,
        )
        q.awaitTermination(300)
        out = read_lake(spark, lake).select(
            "event", "tenant", "device", "region", "year", "hour"
        )
        n_quar = (
            spark.read.json(os.path.join(lake, "error",
                                         "validation-failed")).count()
        )
        # materialize before the temp dir disappears
        rows = out.collect()
        result = spark.createDataFrame(
            rows, "event string, tenant string, device string, "
            "region string, year string, hour string",
        ).withColumn("n_quarantined", F.lit(int(n_quar)).cast("long"))
        return result.orderBy("event")
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "similarity_bitext_candidates",
    oracle="""
        WITH src AS (
            SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE label = 0),
        tgt AS (
            SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE label = 1),
        pairs AS (
            SELECT src_id, tgt_id,
                   ROUND(list_dot_product(s.v, t.v)
                         / (sqrt(list_dot_product(s.v, s.v))
                            * sqrt(list_dot_product(t.v, t.v))), 6) AS cosine
            FROM src s CROSS JOIN tgt t
            WHERE s.src_id % 8 = t.tgt_id % 8),
        ranked AS (
            SELECT src_id, tgt_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY src_id
                                      ORDER BY cosine DESC, tgt_id) AS rs,
                   ROW_NUMBER() OVER (PARTITION BY tgt_id
                                      ORDER BY cosine DESC, src_id) AS rt
            FROM pairs),
        sx AS (SELECT src_id, SUM(CAST(cosine AS DECIMAL(18,6))) AS sx,
                      COUNT(*) AS cx
               FROM ranked WHERE rs <= 4 GROUP BY src_id),
        sy AS (SELECT tgt_id, SUM(CAST(cosine AS DECIMAL(18,6))) AS sy,
                      COUNT(*) AS cy
               FROM ranked WHERE rt <= 4 GROUP BY tgt_id),
        scored AS (
            SELECT p.src_id, p.tgt_id, p.cosine,
                   ROUND(p.cosine * (2 * sx.cx * sy.cy)
                         / CAST(sx.sx * sy.cy + sy.sy * sx.cx AS DOUBLE), 6)
                       AS margin
            FROM pairs p JOIN sx USING (src_id) JOIN sy USING (tgt_id)),
        fwd AS (
            SELECT src_id, tgt_id, cosine, margin,
                   ROW_NUMBER() OVER (PARTITION BY src_id
                                      ORDER BY margin DESC, tgt_id) AS r
            FROM scored),
        back AS (
            SELECT src_id, tgt_id,
                   ROW_NUMBER() OVER (PARTITION BY tgt_id
                                      ORDER BY margin DESC, src_id) AS rb
            FROM scored)
        SELECT f.src_id, f.tgt_id, f.cosine, f.margin,
               (f.margin > 1.05) AS mined
        FROM fwd f JOIN back b
          ON f.src_id = b.src_id AND f.tgt_id = b.tgt_id AND b.rb = 1
        WHERE f.r = 1
        ORDER BY f.src_id
    """,
    tags=("B10", "similarity"),
    doc="Candidate-fed bitext mining — THE 100 TB FORM of "
    "similarity_bitext_margin (the [r13] sf1-probe finding: the exact "
    "cross-join form measured 39.8x on a 10x data step — quadratic by "
    "documented contract — vs 2.8x for the LSH-candidate path and "
    "13.7x for IVF, SCALE.md tenth wave): the SAME Artetxe-Schwenk "
    "margin scoring (per-side k=4 candidate-neighborhood means, "
    "DECIMAL-exact sums) over a deterministic blocked candidate set "
    "(src_id % 8 = tgt_id % 8 — SQL-replayable, standing in for the "
    "LSH/IVF retrievers whose candidates feed the same function), "
    "MUTUAL-best setting (forward ∩ backward winners — the "
    "highest-precision CCMatrix form, exercising the semi-join "
    "branch). With candidates ⊇ all pairs the function equals "
    "bitext_mine row-for-row (pinned in tests) "
    "(operators/similarity.py bitext_mine_candidates/_lsh/_ann).",
)
def similarity_bitext_candidates(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        bitext_mine_candidates,
    )

    emb = t(spark, sf_dir, "embeddings")
    src = emb.where(F.col("label") == 0)
    tgt = emb.where(F.col("label") == 1)
    cand = (
        src.select(F.col("vec_id").alias("src_id"))
        .join(
            tgt.select(F.col("vec_id").alias("tgt_id")),
            F.col("src_id") % 8 == F.col("tgt_id") % 8,
        )
    )
    return bitext_mine_candidates(
        src, tgt, cand, k=4, threshold=1.05, mutual=True
    ).orderBy("src_id")


@register(
    "archive_lz4_roundtrip",
    oracle="""
        SELECT doc_id,
               CAST(2 AS INT) AS n_members,
               'doc.txt,meta.bin' AS names,
               CAST(strlen(text) + 8 AS BIGINT) AS total_bytes
        FROM documents WHERE doc_id < 200
        ORDER BY doc_id
    """,
    tags=("B10", "archive"),
    doc="tar.lz4 archive ingestion END-TO-END (the [r13] LZ4 frame "
    "codec, from the public block/frame specs with a from-spec "
    "xxHash32, pinned BOTH DIRECTIONS against the system liblz4 in "
    "tests/test_realworld_r13.py): per doc a 2-member tar (the doc "
    "text + an 8-byte id record) is LZ4-frame-compressed "
    "(content-size + content-checksum flags) and exploded back "
    "through the archive machinery — sniff routes the frame, the "
    "decoder verifies the header checksum and xxHash32 content "
    "checksum, and the member census/byte totals land in the oracle; "
    "a frame byte-identity check (decompress∘compress == tar) rides "
    "inside the op (operators/lz4.py, operators/archives.py).",
)
def archive_lz4_roundtrip(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
            build_tar,
            iter_archive_members,
            sniff_archive_format,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lz4 import (
            lz4_compress,
            lz4_decompress,
        )

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = str(text).encode("utf-8")
                tar = build_tar([
                    ("doc.txt", body),
                    ("meta.bin", did.to_bytes(8, "big")),
                ])
                lz = lz4_compress(tar)
                if sniff_archive_format(lz) != "tlz4":
                    raise ValueError("LZ4 tar failed the archive sniff")
                if lz4_decompress(lz) != tar:
                    raise ValueError("LZ4 roundtrip not byte-identical")
                members = list(iter_archive_members(lz))
                rows.append({
                    "doc_id": did,
                    "n_members": len(members),
                    "names": ",".join(m[0] for m in members),
                    "total_bytes": sum(len(m[1]) for m in members),
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_members", "names", "total_bytes"],
            )

    return d.mapInPandas(
        op, "doc_id long, n_members int, names string, total_bytes long"
    ).orderBy("doc_id")


@register(
    "text_brotli_decode",
    oracle="""
        SELECT doc_id,
               CAST(200 AS INT) AS status,
               CASE WHEN doc_id % 3 = 0 THEN 'gzip' ELSE 'br' END
                 AS encoding,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               TRUE AS roundtrip_ok
        FROM documents WHERE doc_id < 150
        ORDER BY doc_id
    """,
    tags=("B10", "text", "crawl"),
    doc="HTTP content-decoding END-TO-END for the crawl pipeline (the "
    "[r13] from-spec RFC 7932 BROTLI decoder — full prefix-code/"
    "context-model/distance-ring/static-dictionary surface, pinned "
    "byte-identical against REAL libbrotlienc output at every quality "
    "0..11 in tests/test_brotli.py, spec tables extraction-checked "
    "against libbrotlicommon): per doc an HTTP response block carries "
    "the doc text under Content-Encoding br (fixture-encoder streams "
    "— uncompressed meta-blocks or compressed literals-only form by "
    "parity, both shapes the real libbrotlidec accepts) or gzip every "
    "third doc; sources/warc.decode_http_body decodes it and the "
    "byte-identity of the roundtrip rides in the hash "
    "(operators/brotli.py, sources/warc.py).",
)
def text_brotli_decode(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 150).select(
        "doc_id", "text"
    )

    def op(batches):
        import zlib

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.brotli import (
            brotli_compress_fixture,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
            decode_http_body,
        )

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = str(text).encode("utf-8")
                if did % 3 == 0:
                    coded = zlib.compress(body, 9, wbits=31)
                    enc = b"gzip"
                else:
                    mode = ("literals" if did % 3 == 1 else
                            "uncompressed")
                    coded = brotli_compress_fixture(body, mode)
                    enc = b"br"
                blk = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                       b"Content-Encoding: " + enc + b"\r\n\r\n" + coded)
                status, decoded, encoding = decode_http_body(blk)
                rows.append({
                    "doc_id": did,
                    "status": int(status),
                    "encoding": encoding,
                    "n_bytes": len(decoded),
                    "roundtrip_ok": decoded == body,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "status", "encoding", "n_bytes",
                         "roundtrip_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, status int, encoding string, n_bytes long,"
        " roundtrip_ok boolean",
    ).orderBy("doc_id")


@register(
    "multimodal_heic_exif",
    oracle="""
        SELECT doc_id,
               'Make' || CAST(doc_id % 9 AS VARCHAR) AS make,
               CAST(doc_id % 2 = 1 AS BOOLEAN) AS has_gps,
               FALSE AS gps_after_strip,
               TRUE AS pixels_intact,
               CAST(3 AS INT) AS n_items
        FROM documents WHERE doc_id < 60
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image", "privacy"),
    doc="HEIC Exif extraction + PII strip END-TO-END (the [r13] second "
    "wave — the JPEG APP1 crawl-hygiene pipeline extended to iPhone "
    "imagery: ISO 23008-12 A.2.1 Exif items parse through the shared "
    "TIFF machinery, and strip_heif_exif redacts IN PLACE with a "
    "minimal empty-IFD block so no container offset moves; the Exif "
    "bytes and the stripped container are pinned against libheif's "
    "metadata API in tests/test_heif.py): per doc a HEIC with an Exif "
    "item (make rotates, odd docs carry a GPS IFD) plus a thumbnail "
    "item is built, the camera fields and GPS flag are extracted, the "
    "container is stripped, and the hash grades extraction, the "
    "post-strip GPS absence, and pixel byte-identity across the strip "
    "(operators/heif.py, operators/exif.py).",
)
def multimodal_heic_exif(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 60).select(
        "doc_id"
    )

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
            build_exif_app1,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
            build_heif,
            decode_heif,
            extract_heif_exif,
            probe_heif,
            strip_heif_exif,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
            encode_hevc_intra,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                y = np.full((32, 32), 40 + did % 50, dtype=np.uint8)
                y[12:] = 200
                u = np.full((16, 16), 128, dtype=np.uint8)
                st = encode_hevc_intra([(y, u, u)], qp=20 + did % 8)
                thumb = encode_hevc_intra(
                    [(y[::2, ::2].copy(),
                      np.full((8, 8), 128, dtype=np.uint8),
                      np.full((8, 8), 128, dtype=np.uint8))],
                    qp=30,
                )
                tiff = build_exif_app1(
                    {"make": f"Make{did % 9}", "model": "M"},
                    gps_dms=(40 + did % 20, did % 60, 5)
                    if did % 2 == 1 else None,
                )[10:]
                payload = build_heif([st], exif=tiff, thumbnail=thumb)
                e = extract_heif_exif(payload)
                px1, _, _ = decode_heif(payload)
                stripped = strip_heif_exif(payload)
                e2 = extract_heif_exif(stripped)
                px2, _, _ = decode_heif(stripped)
                rows.append({
                    "doc_id": did,
                    "make": e.get("make"),
                    "has_gps": bool(e.get("has_gps")),
                    "gps_after_strip": bool(e2.get("has_gps")),
                    "pixels_intact": bool(np.array_equal(px1, px2)),
                    "n_items": probe_heif(payload)["n_items"],
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "make", "has_gps", "gps_after_strip",
                         "pixels_intact", "n_items"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, make string, has_gps boolean, gps_after_strip"
        " boolean, pixels_intact boolean, n_items int",
    ).orderBy("doc_id")


@register(
    "multimodal_exif_family",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
                    WHEN doc_id % 3 = 1 THEN 'png' ELSE 'webp' END
                 AS carrier,
               'Make' || CAST(doc_id % 7 AS VARCHAR) AS make,
               CAST(doc_id % 2 = 1 AS BOOLEAN) AS has_gps,
               FALSE AS gps_after_strip,
               TRUE AS pixels_intact
        FROM documents WHERE doc_id < 72
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image", "privacy"),
    doc="EXIF extraction + PII strip across the three remaining "
    "crawl image carriers in one graded rotation (the [r13] second "
    "wave — with HEIC landed separately, camera/GPS hygiene now "
    "covers JPEG APP1, PNG eXIf chunks (PNG 1.5), and WebP EXIF "
    "chunks (VP8X extended containers), ALL through the one shared "
    "TIFF-block parser exif.parse_exif_tiff): per doc an image with "
    "an EXIF block (make rotates, odd docs carry GPS) is wrapped by "
    "doc_id%3 in JPEG/PNG/WebP, the camera fields and GPS flag are "
    "extracted, the carrier-specific strip runs, and the hash grades "
    "extraction, post-strip GPS absence, and pixel identity across "
    "the strip (operators/exif.py).",
)
def multimodal_exif_family(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 72).select(
        "doc_id"
    )

    def op(batches):
        import struct as _s

        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
            build_exif_app1,
            insert_app1,
            insert_png_exif,
            parse_exif,
            parse_png_exif,
            parse_webp_exif,
            strip_metadata,
            strip_png_metadata,
            strip_webp_metadata,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
            decode_webp,
            encode_webp_lossless,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rng = np.random.RandomState(did)
                px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
                app1 = build_exif_app1(
                    {"make": f"Make{did % 7}", "model": "M"},
                    gps_dms=(30 + did % 30, did % 60, 1)
                    if did % 2 == 1 else None,
                )
                tiff = app1[10:]
                mode = did % 3
                if mode == 0:
                    img = insert_app1(encode_jpeg(px), app1)
                    e = parse_exif(img)
                    p1 = decode_jpeg(img)[0]
                    stripped = strip_metadata(img)
                    e2 = parse_exif(stripped)
                    p2 = decode_jpeg(stripped)[0]
                    carrier = "jpeg"
                elif mode == 1:
                    img = insert_png_exif(encode_png(px), tiff)
                    e = parse_png_exif(img)
                    p1 = decode_png(img)[0]
                    stripped = strip_png_metadata(img)
                    e2 = parse_png_exif(stripped)
                    p2 = decode_png(stripped)[0]
                    carrier = "png"
                else:
                    inner = encode_webp_lossless(px)[12:]
                    vp8x = (b"VP8X" + _s.pack("<I", 10)
                            + bytes([0x08, 0, 0, 0])
                            + (15).to_bytes(3, "little")
                            + (15).to_bytes(3, "little"))
                    exif_chunk = (b"EXIF" + _s.pack("<I", len(tiff))
                                  + tiff
                                  + (b"\x00" if len(tiff) & 1 else b""))
                    body = vp8x + inner + exif_chunk
                    img = (b"RIFF" + _s.pack("<I", 4 + len(body))
                           + b"WEBP" + body)
                    e = parse_webp_exif(img)
                    p1 = decode_webp(img)[0]
                    stripped = strip_webp_metadata(img)
                    e2 = parse_webp_exif(stripped)
                    p2 = decode_webp(stripped)[0]
                    carrier = "webp"
                rows.append({
                    "doc_id": did,
                    "carrier": carrier,
                    "make": e.get("make"),
                    "has_gps": bool(e.get("has_gps")),
                    "gps_after_strip": bool(e2.get("has_gps")),
                    "pixels_intact": bool(np.array_equal(p1, p2)),
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "carrier", "make", "has_gps",
                         "gps_after_strip", "pixels_intact"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, carrier string, make string, has_gps boolean,"
        " gps_after_strip boolean, pixels_intact boolean",
    ).orderBy("doc_id")
