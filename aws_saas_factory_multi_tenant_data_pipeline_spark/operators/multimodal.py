"""Multimodal column plumbing (SURVEY.md §2 B10).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side plumbing — schema, partition-preserving mapInPandas, Arrow
batch shapes — is real and tested; the actual codec step is stubbed (the
image/audio libraries are not in this container) behind a deterministic
fake so the dataflow is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal record schema
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→feature-extract.

    REAL decode (PIL/torchaudio/ffmpeg) is not available in this container;
    this derives a stable pseudo-feature from the payload digest so the
    distributed plumbing (batching, schema, partitioning) is fully testable.
    """
    h = hashlib.sha256(payload or b"").digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_features(media: DataFrame, batch_dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, partition-preserving.

    At scale: no shuffle — each executor decodes its own partitions; put a
    ``repartition(n)`` upstream only to right-size decode parallelism.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "payload_bytes": payloads.map(lambda p: len(p or b"")),
                    "feature": payloads.map(lambda p: _fake_decode_features(p, batch_dim)),
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: passes target dims through the stub codec.

    The codec call is a stub (no imaging libs here): payload passes through
    unchanged, meta is updated — the schema/partitioning contract is what
    this validates.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf.assign(meta=meta)

    return media.mapInPandas(op, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled frame."""
    n_frames = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    frame_idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (
        media.where(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(frame_idx))
        .select("media_id", "frame_idx", "payload", "meta")
    )


_EXT_KIND = {
    "png": ("image", "image/png"),
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "mp4": ("video", "video/mp4"),
}


def ingest_media_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Ingest raw media files into the canonical MEDIA_SCHEMA via Spark's
    built-in ``binaryFile`` source (distributed file read — payload bytes
    go straight to executors, the driver only lists paths). ``media_id`` is
    the xxhash64 of the file path (stable across re-ingests); kind/mime are
    derived from the extension; codec-dependent meta stays NULL until the
    decode step (stubbed, module docstring).
    """
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    kind_expr = F.lit(None).cast("string")
    mime_expr = F.lit(None).cast("string")
    for e, (kind, mime) in _EXT_KIND.items():
        kind_expr = F.when(ext == e, kind).otherwise(kind_expr)
        mime_expr = F.when(ext == e, mime).otherwise(mime_expr)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        kind_expr.alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            mime_expr.alias("mime"),
        ).alias("meta"),
    )
