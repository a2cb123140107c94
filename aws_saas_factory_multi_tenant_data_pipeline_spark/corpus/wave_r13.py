"""Round-11 operator wave (r10 verdict "Next round" #2): the lossy
VP8 key-frame codec lands with an ANALYTIC oracle query, closing the
last real-crawl image boundary — CPython's python.webp (ALPH + lossy
VP8) now decodes end-to-end, BIT-EXACT vs the system libwebp
(tests/test_realworld_r11.py); this query grades the same decoder
over generated fixtures at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "multimodal_vp8_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * (2 + doc_id % 5)) AS BIGINT) AS ahash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="Lossy WebP/VP8 key-frame decode END-TO-END with an ANALYTIC "
    "oracle (the [r11] codec closing the r10 lossy boundary — most "
    "real-world .webp traffic is VP8, and the REAL python.webp is "
    "pinned bit-exact vs the system libwebp in tests): per doc a "
    "32x32 two-tone RIFF/WEBP/VP8 image (bright split at row "
    "8 + 4*(doc_id % 5), grays 40/200) rotates the decoder surface — "
    "quantizer index (doc_id * 7) % 56 + 4 sweeps the dequant tables, "
    "odd docs use B_PRED (16 subblock predictions, plane-3 tokens, no "
    "Y2), even docs 16x16 DC_PRED (Y2 + IWHT path); 2x2 macroblocks "
    "exercise above/left prediction and entropy contexts — then "
    "decodes through the codec registry's RIFF sniffer and average-"
    "hashes to -(2^(8*(2 + doc_id%5))), the same closed form the "
    "PNG/GIF/ICO/QOI/TGA/WebP-VP8L oracles pin. The split sits on a "
    "4-row boundary so quantization noise (bounded by the DC step) "
    "can never flip an aHash cell; any bool-decoder, token-tree, "
    "context, dequant, IDCT/IWHT, prediction, or conversion defect "
    "flips whole rows (operators/vp8.py; RFC 6386).",
)
def multimodal_vp8_decode(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
            encode_webp_vp8,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 8 + 4 * (did % 5)
                px = np.full((32, 32, 3), 40, dtype=np.uint8)
                px[split:, :, :] = 200
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "payload": encode_webp_vp8(
                            px,
                            qi=4 + (did * 7) % 56,
                            use_bpred=did % 2 == 1,
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
