"""Multimodal column plumbing (SURVEY.md §2 B10).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side plumbing — schema, partition-preserving mapInPandas, Arrow
batch shapes — is real and tested. The codec step is REAL for the
dependency-free formats — PPM images (P6/P3, pure numpy) and PCM WAV
audio (stdlib ``wave``) are actually decoded to pixel/sample arrays and
summarized into features — and a deterministic digest-derived stub covers
compressed formats (PNG/JPEG/MP3/MP4 libraries are not in this
container); the ``decoded`` output column says which path a row took.
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
        T.StructField("decoded", T.BooleanType(), True),
    ]
)


def decode_ppm(payload: bytes):
    """Real PPM decode (P6 binary / P3 ascii), pure numpy: returns
    (pixels HxWx3 uint8, width, height) or raises ValueError."""
    import numpy as np

    if not payload or payload[:2] not in (b"P6", b"P3"):
        raise ValueError("not a PPM payload")
    # tokenize the header, honoring '#' comments
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i : i + 1]
        if c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = (int(t) for t in toks)
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    if payload[:2] == b"P6":
        body = payload[i + 1 : i + 1 + w * h * 3]  # single whitespace after maxval
        if len(body) != w * h * 3:
            raise ValueError("truncated PPM body")
        px = np.frombuffer(body, dtype=np.uint8)
    else:
        px = np.array(payload[i:].split(), dtype=np.uint8)
        if px.size != w * h * 3:
            raise ValueError("truncated P3 body")
    return px.reshape(h, w, 3), w, h


def decode_wav(payload: bytes):
    """Real PCM WAV decode via stdlib ``wave``: returns (mono float64
    samples in [-1, 1], sample_rate, n_channels) or raises."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as wf:
        sr = wf.getframerate()
        ch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr, ch


def _real_decode_features(payload: bytes, dim: int = 8):
    """Decode-and-summarize for the real formats; None when not decodable."""
    import numpy as np

    try:
        if payload[:2] in (b"P6", b"P3"):
            px, w, h = decode_ppm(payload)
            f = px.astype(np.float64) / 255.0
            vals = [
                w / 10000.0,
                h / 10000.0,
                f[..., 0].mean(),
                f[..., 1].mean(),
                f[..., 2].mean(),
                f[..., 0].std(),
                f[..., 1].std(),
                f[..., 2].std(),
            ]
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            x, sr, ch = decode_wav(payload)
            zc = float((x[:-1] * x[1:] < 0).mean()) if x.size > 1 else 0.0
            vals = [
                sr / 100000.0,
                x.size / 1e6,
                float(x.mean()),
                float(np.sqrt((x ** 2).mean())) if x.size else 0.0,
                float(x.min()) if x.size else 0.0,
                float(x.max()) if x.size else 0.0,
                zc,
                ch / 10.0,
            ]
        else:
            return None
    except Exception:
        return None
    return [round(float(v), 6) for v in vals[:dim]]


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
            real = payloads.map(lambda p: _real_decode_features(p or b"", batch_dim))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "payload_bytes": payloads.map(lambda p: len(p or b"")),
                    "feature": [
                        r if r is not None else _fake_decode_features(p or b"", batch_dim)
                        for r, p in zip(real, payloads)
                    ],
                    "decoded": [r is not None for r in real],
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for PPM payloads, pure numpy: decode,
    index-map ``src = (dst * src_dim) // dst_dim`` per axis, re-encode as
    binary P6. Deterministic — exact pixel values are unit-tested against
    a hand-computed reference."""
    import numpy as np

    px, w, h = decode_ppm(payload)
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    out = px[ys][:, xs]
    return b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize: REAL nearest-neighbor for PPM payloads (pure numpy,
    decode → index-map → re-encode P6); compressed formats pass through
    payload-unchanged with updated meta (codec libs absent — the
    documented stub path, flagged by meta.mime). Arrow-batched
    mapInPandas either way; schema and partitioning are preserved.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                try:
                    payloads.append(resize_ppm(bytes(payload), width, height))
                except (ValueError, TypeError):
                    payloads.append(payload)  # stub path: not a PPM
            meta = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            yield pdf.assign(payload=payloads, meta=meta)

    return media.mapInPandas(op, MEDIA_SCHEMA)


def resample_wav(payload: bytes, target_sr: int) -> bytes:
    """REAL linear-interpolation resample for PCM WAV payloads: decode to
    mono float, interpolate onto the target-rate time grid (index map
    ``src_pos = dst_i * src_sr / dst_sr``, endpoints clamped), re-encode
    16-bit mono WAV. Pure stdlib wave + numpy; deterministic."""
    import io
    import wave

    import numpy as np

    x, sr, _ch = decode_wav(payload)
    if len(x) == 0:
        raise ValueError("empty WAV payload")
    n_out = max(1, int(round(len(x) * target_sr / sr)))
    src_pos = np.arange(n_out, dtype=np.float64) * (sr / target_sr)
    lo = np.clip(np.floor(src_pos).astype(np.int64), 0, len(x) - 1)
    hi = np.clip(lo + 1, 0, len(x) - 1)
    frac = src_pos - lo
    y = x[lo] * (1.0 - frac) + x[hi] * frac
    pcm = np.clip(np.round(y * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(target_sr)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def resample_audio(media: DataFrame, target_sr: int) -> DataFrame:
    """Audio resample: REAL linear interpolation for PCM WAV payloads;
    compressed formats pass through payload-unchanged with updated meta
    (the documented stub path). Arrow-batched mapInPandas."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                try:
                    payloads.append(resample_wav(bytes(payload), target_sr))
                except Exception:
                    payloads.append(payload)  # stub path: not decodable PCM
            meta = pdf["meta"].map(lambda m: {**(m or {}), "sample_rate": target_sr})
            yield pdf.assign(payload=payloads, meta=meta)

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
    "ppm": ("image", "image/x-portable-pixmap"),
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
