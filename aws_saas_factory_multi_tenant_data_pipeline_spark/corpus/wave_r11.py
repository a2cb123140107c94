"""Round-9 second operator wave: new codec/media surface with analytic
oracles (QOI images, G.711 companded WAV audio, baseline TIFF), each
wired through the same codec-registry dispatch as the other formats.

Reference parity: the media ingestion surface (`README.md:1-109` of the
reference — multimodal corpus columns); every decoded row flows through
the SAME aHash/pHash dedup, EXIF audit, and shard-writer machinery as
the earlier formats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "multimodal_qoi_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * ((8 + doc_id % 16 + 3) // 4)) AS BIGINT)
                   AS ahash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="QOI decode END-TO-END with an ANALYTIC oracle (the [r9] codec): "
    "per doc a 32x32 two-tone QOI image (bright split at row "
    "8 + doc_id % 16, grays 40/200) is encoded by the spec-literal "
    "greedy encoder — the two-tone rows exercise RGB, RUN (62-cap "
    "splitting across the 32-wide rows) and seen-INDEX chunks — then "
    "decoded through the codec registry and average-hashed; two-tone "
    "means the hash is palette-exact and equals -(2^(8*ceil(split/4))) "
    "— the same closed form the PNG/GIF/ICO/MJPEG oracles pin — so any "
    "chunk-decode, seen-array-hash, wraparound, or registry dispatch "
    "defect flips the hash (operators/qoi.py; QOI specification, "
    "qoiformat.org 2022).",
)
def multimodal_qoi_decode(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.qoi import (
            encode_qoi,
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
                        "payload": encode_qoi(px),
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
    "audio_g711_voice",
    oracle="""
        WITH codes AS (
            SELECT d.doc_id, t.i,
                   CAST((d.doc_id * 5 + t.i) % 256 AS INTEGER) AS c
            FROM (SELECT doc_id FROM documents WHERE doc_id < 24) d
            CROSS JOIN (SELECT UNNEST(RANGE(256)) AS i) t
        ),
        vals AS (
            SELECT doc_id, i,
                   CASE WHEN doc_id % 2 = 1 THEN
                       -- mu-law (G.711 Table 2): u = ~c, sign bit 7,
                       -- value = (((m*8)+132) * 2^e) - 132
                       (CASE WHEN ((255 - c) & 128) > 0 THEN -1 ELSE 1 END)
                       * (((((255 - c) & 15) * 8 + 132)
                           * CAST(POWER(2, ((255 - c) >> 4) & 7) AS BIGINT))
                          - 132)
                   ELSE
                       -- A-law (G.711 Table 1): a = c XOR 0x55, bit 7
                       -- SET = positive; e=0: m*16+8, else (m*16+264)*2^(e-1)
                       (CASE WHEN (xor(c, 85) & 128) > 0 THEN 1 ELSE -1 END)
                       * (CASE WHEN ((xor(c, 85) >> 4) & 7) = 0
                               THEN (xor(c, 85) & 15) * 16 + 8
                               ELSE ((xor(c, 85) & 15) * 16 + 264)
                                    * CAST(POWER(2, ((xor(c, 85) >> 4) & 7) - 1)
                                           AS BIGINT)
                          END)
                   END AS v
            FROM codes
        )
        SELECT doc_id,
               CAST(SUM((i + 1) * v) AS BIGINT) AS weighted_sum,
               CAST(COUNT(*) AS BIGINT) AS n_samples
        FROM vals GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "audio"),
    doc="G.711 companded voice WAV decode END-TO-END with the decode "
    "formula REPLAYED IN SQL (the robots.txt convention): per doc, 256 "
    "codes (a rotation of the full code space) are lifted to their "
    "exact reconstruction levels, companded back by the segment-search "
    "encoder into a real fmt-6/7 WAV, and decoded through the audio "
    "codec registry; because every sample is a reconstruction level, "
    "encode-decode is the identity on values (G.711's code-identity "
    "property, the two mu-law zero codes both decoding to 0), so the "
    "position-weighted sum equals the ITU-T formula stated in the "
    "oracle bit-for-bit. Any companding-table, segment-search, RIFF "
    "layout, or sample-order defect shifts the weighted sum "
    "(operators/g711.py; ITU-T G.711 1988).",
)
def audio_g711_voice(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 24).select("doc_id")

    out_schema = "doc_id long, weighted_sum long, n_samples long"

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
            ALAW_DECODE_TABLE,
            ULAW_DECODE_TABLE,
            encode_wav_g711,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            decode_audio,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                codes = ((did * 5 + np.arange(256)) % 256).astype(np.uint8)
                law = "ulaw" if did % 2 else "alaw"
                table = ULAW_DECODE_TABLE if did % 2 else ALAW_DECODE_TABLE
                samples = table[codes]  # exact reconstruction levels
                blob = encode_wav_g711(samples, 8000, law=law)
                mono, sr, ch = decode_audio(blob)
                ints = np.rint(mono * 32768.0).astype(np.int64)
                rows.append(
                    {
                        "doc_id": did,
                        "weighted_sum": int(
                            np.sum((np.arange(256) + 1) * ints)
                        ),
                        "n_samples": len(ints),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "weighted_sum", "n_samples"]
            )

    return d.mapInPandas(op, out_schema).orderBy("doc_id")


@register(
    "multimodal_tiff_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * ((8 + doc_id % 16 + 3) // 4)) AS BIGINT)
                   AS ahash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="Baseline TIFF decode END-TO-END with an ANALYTIC oracle (the "
    "[r9] codec): per doc a 32x32 two-tone TIFF (bright split at row "
    "8 + doc_id % 16, grays 40/200) rotates through the codec's whole "
    "declared surface — byte order II/MM by doc parity, PackBits vs "
    "uncompressed by doc_id % 3, gray/RGB/palette photometrics (incl. "
    "WhiteIsZero inversion) by doc_id % 4, multi-strip layout (5-row "
    "strips) — then decodes through the codec registry and "
    "average-hashes to -(2^(8*ceil(split/4))), the same closed form "
    "the PNG/GIF/ICO/QOI oracles pin; any IFD walk, strip table, "
    "PackBits, ColorMap, polarity, or byte-order defect flips the "
    "hash (operators/tiff.py; TIFF 6.0 specification, Adobe 1992).",
)
def multimodal_tiff_decode(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
            encode_tiff,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 8 + did % 16
                bo = "<" if did % 2 == 0 else ">"
                pb = did % 3 == 0
                mode = did % 4
                if mode == 0:  # RGB
                    px = np.full((32, 32, 3), 40, dtype=np.uint8)
                    px[split:, :, :] = 200
                    blob = encode_tiff(px, byte_order=bo, packbits=pb,
                                       rows_per_strip=5)
                elif mode in (1, 2):  # gray, both polarities
                    g = np.full((32, 32), 40, dtype=np.uint8)
                    g[split:, :] = 200
                    blob = encode_tiff(g, byte_order=bo, packbits=pb,
                                       photometric=mode - 1, rows_per_strip=5)
                else:  # palette
                    pal = np.zeros((256, 3), dtype=np.uint8)
                    pal[1] = (40, 40, 40)
                    pal[2] = (200, 200, 200)
                    idx = np.full((32, 32), 1, dtype=np.uint8)
                    idx[split:, :] = 2
                    blob = encode_tiff(idx, byte_order=bo, packbits=pb,
                                       palette=pal, rows_per_strip=5)
                rows.append(
                    {"media_id": did, "kind": "image", "payload": blob,
                     "meta": None}
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_average_hash(media)
        .select(F.col("media_id").alias("doc_id"), "ahash")
        .orderBy("doc_id")
    )
