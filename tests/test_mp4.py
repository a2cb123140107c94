"""MP4 / ISO-BMFF container parsing: box walk, track metadata, sample
tables, byte-exact extraction, tear contract, and the Spark frame path."""

from __future__ import annotations

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
    build_minimal_mp4,
    extract_samples,
    iter_boxes,
    probe_mp4,
)


def _samples(n=9):
    return [bytes([i]) * (12 + 5 * i) for i in range(n)]


def test_probe_metadata_and_sample_table():
    mp4 = build_minimal_mp4(
        _samples(), width=320, height=240, timescale=600, sample_delta=20,
        keyframes=[1, 5, 9],
    )
    info = probe_mp4(mp4)
    assert info["brand"] == "isom"
    assert info["timescale"] == 600 and info["duration"] == 9 * 20
    (t,) = info["tracks"]
    assert t["handler"] == "vide" and t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (320, 240)
    assert t["n_samples"] == 9 and t["keyframes"] == [1, 5, 9]
    # byte-exact sample spans: sizes and contiguity in mdat
    sizes = [sz for _off, sz in t["samples"]]
    assert sizes == [len(s) for s in _samples()]
    offs = [off for off, _sz in t["samples"]]
    assert all(b == a + s for a, b, s in zip(offs, offs[1:], sizes))


def test_extract_samples_byte_exact():
    samples = _samples(6)
    mp4 = build_minimal_mp4(samples)
    t = probe_mp4(mp4)["tracks"][0]
    assert extract_samples(mp4, t, range(6)) == samples
    assert extract_samples(mp4, t, [5, 0]) == [samples[5], samples[0]]
    with pytest.raises(ValueError, match="out of range"):
        extract_samples(mp4, t, [6])


def test_absent_stss_means_all_sync():
    t = probe_mp4(build_minimal_mp4(_samples(4)))["tracks"][0]
    assert t["keyframes"] == [1, 2, 3, 4]


def test_box_walk_rejects_overrun():
    mp4 = bytearray(build_minimal_mp4(_samples(3)))
    mp4[0:4] = (2**31).to_bytes(4, "big")  # first box claims 2 GiB
    with pytest.raises(ValueError, match="overruns"):
        list(iter_boxes(bytes(mp4)))


def test_mutation_fuzz_valueerror_only():
    import random

    rnd = random.Random(17)
    base = build_minimal_mp4(_samples(8), keyframes=[1, 4])
    for _ in range(300):
        data = bytearray(base)
        op = rnd.random()
        if op < 0.4:
            i = rnd.randrange(len(data))
            data[i] ^= rnd.randrange(1, 256)
        elif op < 0.8:
            data = data[: rnd.randrange(len(data))]
        else:
            i = rnd.randrange(len(data))
            data[i:i] = bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 9)))
        try:
            info = probe_mp4(bytes(data))
            assert isinstance(info, dict)
        except ValueError:
            pass  # the only permitted failure mode


def test_spark_sample_video_frames(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_video_frames,
    )

    samples = _samples(10)
    mp4 = build_minimal_mp4(samples, keyframes=[1, 6])
    rows = [
        (0, "video", bytearray(mp4), (None, None, None, 10, "video/mp4")),
        (1, "video", bytearray(b"not an mp4"), (None,) * 4 + ("video/mp4",)),
        (2, "audio", bytearray(b"x"), (None,) * 4 + (None,)),  # filtered out
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_video_frames(media, every_n=3).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r)
    good = sorted(by_media[0], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in good] == [0, 3, 6, 9]
    assert [bytes(r.frame_bytes) for r in good] == [samples[i] for i in (0, 3, 6, 9)]
    assert good[0].is_keyframe is True  # sample 1 is a sync sample
    assert good[1].is_keyframe is False
    assert good[0].codec == "avc1" and good[0].width == 64
    assert by_media[1][0].parse_error is not None  # torn payload → quarantine row
    assert 2 not in by_media  # non-video rows filtered
    # keyframes-only mode
    kf = sorted(
        (r.frame_idx for r in sample_video_frames(media, keyframes_only=True).collect()
         if r.media_id == 0)
    )
    assert kf == [0, 5]
