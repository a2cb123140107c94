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
