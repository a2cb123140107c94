"""End-to-end multimodal corpus prep on synthetic data.

Demonstrates the round-6 media surface — every codec is the REAL
stdlib implementation (operators/jpeg.py, flac.py, mp4.py, png in
multimodal.py), no image/audio libraries involved:

    media directory → binaryFile ingest → feature extraction
    (decoded=True across PNG / baseline+progressive JPEG / FLAC / WAV)
    → perceptual aHash image dedup (banded, never all-pairs)
    → audio envelope-hash near-dup
    → MP4 container parse + keyframe sampling (byte-exact units)

Run:  python examples/media_prep.py
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import encode_flac
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
    encode_jpeg,
    encode_jpeg_progressive,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
    build_minimal_mp4,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
    ahash_near_duplicates,
    encode_png,
    extract_features,
    ingest_media_dir,
    mjpeg_frame_hashes,
    sample_video_frames,
    with_audio_hash,
    with_average_hash,
)


def synthesize(src: str) -> None:
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    near = base.copy()
    near[0, 0] ^= 3  # near-duplicate: one pixel nudged
    far = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    with open(os.path.join(src, "a_base.png"), "wb") as f:
        f.write(encode_png(base))
    with open(os.path.join(src, "a_near.jpg"), "wb") as f:
        f.write(encode_jpeg(near, quality=100))  # cross-FORMAT near-dup
    with open(os.path.join(src, "b_prog.jpeg"), "wb") as f:
        f.write(encode_jpeg_progressive(far, quality=95))
    t = np.arange(16000)
    tone = (9000 * np.sin(t * 0.05) * (t < 8000)).astype(np.int64)
    with open(os.path.join(src, "speech.flac"), "wb") as f:
        f.write(encode_flac(tone, 16000))
    with open(os.path.join(src, "speech_louder.flac"), "wb") as f:
        f.write(encode_flac((tone * 1.5).astype(np.int64), 16000))  # volume edit
    frames = [bytes([i]) * 64 for i in range(12)]
    with open(os.path.join(src, "clip.mp4"), "wb") as f:
        f.write(build_minimal_mp4(frames, width=64, height=48, keyframes=[1, 7]))
    # a real (restricted-table) MP3: the scoped Layer III decode covers it
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp3 import (
        build_mp3_frame_l3,
    )

    mp3_frames = [
        build_mp3_frame_l3(
            [[((k + i) % 15) - 7 for i in range(16)] + [0] * 560, [0] * 576]
        )
        for k in range(6)
    ]
    with open(os.path.join(src, "clip.mp3"), "wb") as f:
        f.write(b"".join(mp3_frames))
    # an MJPEG clip: every access unit IS a JPEG, so frames decode
    # end-to-end with zero new codec code (two near-identical frames +
    # one different frame -> a frame-level near-dup pair)
    fa = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    fb = fa.copy()
    fb[0, 0] ^= 2
    jframes = [encode_jpeg(p, quality=100) for p in (fa, fb, far[:32, :32])]
    with open(os.path.join(src, "clip_mjpeg.mp4"), "wb") as f:
        f.write(
            build_minimal_mp4(
                jframes, width=32, height=32, codec=b"jpeg", keyframes=[1]
            )
        )


def main() -> None:
    spark = get_spark("media-prep", cpus=4, shuffle_partitions=4)
    src = tempfile.mkdtemp(prefix="media_prep_")
    synthesize(src)

    media = ingest_media_dir(spark, src, glob="*.{png,jpg,jpeg,flac,mp4,mp3}")
    print(f"ingested {media.count()} media files")

    feats = extract_features(media)
    decoded = feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("decoded").cast("int")).alias("real")
    )
    print("real-decode coverage (decoded=True means no stub):")
    decoded.show()

    images = media.where(F.col("kind") == "image")
    pairs = ahash_near_duplicates(with_average_hash(images), max_hamming=3)
    print("image near-duplicates across formats (PNG vs JPEG of ~same pixels):")
    pairs.show()

    audio = media.where(F.col("kind") == "audio")
    apairs = ahash_near_duplicates(with_audio_hash(audio), max_hamming=3)
    print("audio near-duplicates (volume-edited FLAC pair):")
    apairs.show()

    kf = sample_video_frames(media, keyframes_only=True)
    print("MP4 keyframe samples (byte-exact container extraction):")
    kf.select("media_id", "frame_idx", "is_keyframe", "codec", "width", "height").show()

    # MJPEG end-to-end: container extraction -> JPEG decode -> frame aHash
    # -> frame-level near-dup pairs (H.264 tracks yield NULL hashes)
    fh = mjpeg_frame_hashes(sample_video_frames(media, every_n=1))
    keyed = fh.where(F.col("ahash").isNotNull()).select(
        F.xxhash64("media_id", "frame_idx").alias("media_id"), "ahash"
    )
    print("MJPEG frame hashes + frame-level near-duplicate pairs:")
    fh.show()
    ahash_near_duplicates(keyed, max_hamming=3).show()

    # privacy pass: strip EXIF/GPS from JPEGs, PNG text chunks, ID3 tags
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        strip_image_metadata,
        with_exif,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.id3 import (
        strip_audio_metadata,
        with_id3,
    )

    print("image metadata audit (EXIF/GPS) and strip flags:")
    with_exif(images).select("media_id", "has_exif", "has_gps").show(3)
    strip_image_metadata(images).select("media_id", "stripped").show(3)
    print("audio metadata audit (ID3) and strip flags:")
    with_id3(audio).select("media_id", "has_id3", "encoder").show(3)
    strip_audio_metadata(audio).select("media_id", "stripped").show(3)

    # normalize audio formats, then pack everything into training shards
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        write_tar_shards,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        transcode_audio,
    )

    print("audio transcode to uniform PCM WAV:")
    transcode_audio(media, target_sr=16000).select(
        "media_id", "transcoded", "meta.sample_rate"
    ).show(3)
    shard_dir = tempfile.mkdtemp(prefix="media_prep_shards_")
    print("WebDataset-style shard manifest:")
    write_tar_shards(media, shard_dir, n_shards=2).show()
    spark.stop()


if __name__ == "__main__":
    main()
