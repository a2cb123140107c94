"""The codec-swap seam, proven executable (SCALE.md's "swap in
libjpeg-turbo at 100 TB" contract): every feature/hash/dedup operator
decodes through ONE registry table; registering a stand-in decoder
changes the decode path (observable when the stand-in distorts), a
semantically-equal "fast" stand-in keeps every downstream result
byte-identical, and reset restores the stdlib codecs. The mapInPandas
wrappers snapshot the tables at plan-build time, so registration
reaches the Python workers via the closure — which these tests exercise
THROUGH Spark, not just locally."""

from __future__ import annotations

import io
import struct
import wave as wave_mod

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    average_hash,
    audio_hash,
    decode_audio,
    decode_image,
    decode_png,
    decode_wav,
    encode_png,
    perceptual_hash,
    register_audio_decoder,
    register_image_decoder,
    reset_decoders,
    sniff_audio_format,
    sniff_image_format,
    with_average_hash,
)


@pytest.fixture(autouse=True)
def _restore_registry():
    yield
    reset_decoders()


def _png_payload(seed: int) -> bytes:
    import numpy as np

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    return encode_png(px)


def _wav_payload() -> bytes:
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        n = 4096
        # amplitude ramps across the file so per-window RMS varies —
        # a flat envelope would hash to 0 (no window beats the mean)
        samples = [
            int(12000 * (i / n) * (1 if (i % 64) < 32 else -1)) for i in range(n)
        ]
        wf.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def test_sniffers_route_by_magic():
    assert sniff_image_format(_png_payload(1)) == "png"
    assert sniff_image_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert sniff_image_format(b"P6\n1 1\n255\n...") == "ppm"
    assert sniff_image_format(b"garbage") is None
    assert sniff_audio_format(_wav_payload()) == "wav"
    assert sniff_audio_format(b"fLaC....") == "flac"
    assert sniff_audio_format(b"garbage") is None


def test_register_unknown_format_rejected():
    # webp became a known format in r10 and avif a named quarantine
    # key in r11 (swap seam for a native AV1 decoder) — jxl is the
    # canonical unknown now
    with pytest.raises(ValueError, match="unknown image format"):
        register_image_decoder("jxl", lambda p: None)
    # ogg became a named quarantine key in r11 (probe + swap seam) —
    # aac is the canonical unknown audio format now
    with pytest.raises(ValueError, match="unknown audio format"):
        register_audio_decoder("aac", lambda p: None)


def test_swap_changes_path_passthrough_preserves_results_local():
    png = _png_payload(7)
    baseline_a = average_hash(png)
    baseline_p = perceptual_hash(png)

    # a DISTORTING stand-in proves dispatch goes through the registry
    def inverted(payload):
        px, w, h = decode_png(payload)
        return 255 - px, w, h

    register_image_decoder("png", inverted)
    assert average_hash(png) != baseline_a

    # a pass-through "fast" decoder (the libjpeg swap shape): identical
    # pixels in, so every downstream hash must be identical out
    calls = []

    def fast(payload):
        calls.append(1)
        return decode_png(payload)

    register_image_decoder("png", fast)
    assert average_hash(png) == baseline_a
    assert perceptual_hash(png) == baseline_p
    assert len(calls) == 2  # BOTH hashes actually took the registered path

    reset_decoders()
    assert average_hash(png) == baseline_a
    assert decode_image(png)[1:] == decode_png(png)[1:]


def test_swap_audio_decoder_local():
    wav = _wav_payload()
    baseline = audio_hash(wav)

    def half_volume(payload):
        x, sr, ch = decode_wav(payload)
        return x * 0.5, sr, ch

    register_audio_decoder("wav", half_volume)
    # RMS-envelope bits threshold on the MEAN rms, so uniform scaling
    # preserves the hash — the swap is invisible downstream (the point)
    assert audio_hash(wav) == baseline

    def silence(payload):
        x, sr, ch = decode_wav(payload)
        return x * 0.0, sr, ch

    register_audio_decoder("wav", silence)
    assert audio_hash(wav) != baseline  # distortion IS visible -> dispatched
    reset_decoders()
    assert audio_hash(wav) == baseline
    assert decode_audio(wav)[1] == 16000


def test_swap_reaches_spark_workers_via_plan_snapshot(spark):
    """The real contract: a decoder registered on the DRIVER must be the
    one running inside the Python workers for plans built after the
    registration, and plans built before keep the stdlib codecs."""
    rows = [
        (i, "image", bytearray(_png_payload(i)), (None,) * 4 + ("image/png",))
        for i in range(4)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    baseline = {r.media_id: r.ahash for r in with_average_hash(media).collect()}
    assert all(v is not None for v in baseline.values())

    def inverted(payload):
        px, w, h = decode_png(payload)
        return 255 - px, w, h

    register_image_decoder("png", inverted)
    swapped = {r.media_id: r.ahash for r in with_average_hash(media).collect()}
    assert swapped != baseline  # driver-side registration reached workers

    def fast(payload):  # semantically-equal stand-in: results must not move
        return decode_png(payload)

    register_image_decoder("png", fast)
    same = {r.media_id: r.ahash for r in with_average_hash(media).collect()}
    assert same == baseline

    # a plan BUILT before a later registration keeps its snapshot
    plan = with_average_hash(media)
    register_image_decoder("png", inverted)
    assert {r.media_id: r.ahash for r in plan.collect()} == baseline

    reset_decoders()
    assert {
        r.media_id: r.ahash for r in with_average_hash(media).collect()
    } == baseline


def test_transcode_audio_normalizes_formats(spark):
    """FLAC and decodable MP3 payloads become mono 16-bit PCM WAV within
    one LSB of the decoded samples; undecodable payloads pass through
    unchanged with transcoded=false (nothing silently dropped)."""
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
        encode_flac,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp3 import (
        build_mp3_frame_l3,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_audio,
        decode_wav,
        transcode_audio,
    )

    tone = (np.sin(np.arange(4000) * 0.05) * 12000).astype(np.int64)
    flac = encode_flac(tone, 16000)
    mp3 = build_mp3_frame_l3([[4, -4, 3, 3] * 4 + [0] * 560, [0] * 576])
    rows = [
        (1, "audio", bytearray(flac), (None, None, 16000, None, "audio/flac")),
        (2, "audio", bytearray(mp3), (None, None, 44100, None, "audio/mpeg")),
        (3, "audio", bytearray(b"garbage-not-audio"), (None,) * 4 + ("x",)),
        (4, "image", bytearray(b"P6\n1 1\n255\nabc"), (None,) * 5),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in transcode_audio(media).collect()}
    assert set(out) == {1, 2, 3}  # image row filtered, audio rows all kept
    assert out[1].transcoded and out[2].transcoded and not out[3].transcoded
    assert bytes(out[3].payload) == b"garbage-not-audio"  # untouched
    for mid, src in [(1, flac), (2, mp3)]:
        y, ysr, _ = decode_wav(bytes(out[mid].payload))
        x, xsr, _ = decode_audio(src)
        assert ysr == xsr and out[mid].meta.sample_rate == xsr
        assert np.abs(
            np.round(y * 32768) - np.round(x * 32767)
        ).max() <= 1.0  # within one LSB of the decoded samples
    # resample path: FLAC 16 kHz -> 8 kHz halves the sample count
    out8 = {r.media_id: r for r in transcode_audio(media, target_sr=8000).collect()}
    y8, sr8, _ = decode_wav(bytes(out8[1].payload))
    assert sr8 == 8000 and abs(y8.size - 2000) <= 1
    assert out8[1].meta.sample_rate == 8000


def test_heif_avif_named_quarantines_and_swap_seam():
    """ISO-BMFF stills sniff to their registry keys (never silent
    unknown rows). r13: HEIC decodes from spec (torn stub payloads tear
    with a ValueError from the container walk, not a quarantine
    message); AVIF stays a NAMED quarantine and a LIVE swap seam for
    native decoders."""
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
        register_image_decoder,
        reset_decoders,
        sniff_image_format,
    )

    heic = b"\x00\x00\x00\x1c" + b"ftypheic" + b"\x00" * 16
    avif = b"\x00\x00\x00\x1c" + b"ftypavif" + b"\x00" * 16
    assert sniff_image_format(heic) == "heif"
    assert sniff_image_format(avif) == "avif"
    with pytest.raises(ValueError, match="meta"):  # real decode path now
        decode_image(heic)
    with pytest.raises(ValueError, match="AV1"):
        decode_image(avif)
    try:
        register_image_decoder(
            "avif", lambda p: (np.zeros((2, 2, 3), dtype=np.uint8), 2, 2)
        )
        px, w, h = decode_image(avif)
        assert (w, h) == (2, 2)
    finally:
        reset_decoders()
    with pytest.raises(ValueError, match="AV1"):
        decode_image(avif)


# --- stream-codec registry (r15): shards / HTTP bodies / compressed tars ---------


def test_stream_codec_registry_unknown_rejected():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.codecs import (
        register_codec_decoder,
        reset_codec_decoders,
    )

    with pytest.raises(ValueError, match="unknown stream codec"):
        register_codec_decoder("snappy", lambda p: p)
    reset_codec_decoders()


def test_stream_codec_passthrough_and_distorting_stand_in_local():
    """A semantically-equal stand-in keeps results byte-identical; a
    distorting stand-in is observable (proves the path is LIVE); reset
    restores the from-spec decoder."""
    import gzip

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.codecs import (
        register_codec_decoder,
        reset_codec_decoders,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
        decode_http_body,
    )

    body = b"registry seam proof " * 20
    blk = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        + gzip.compress(body, mtime=0)
    )
    try:
        _, out, _ = decode_http_body(blk)
        assert out == body
        register_codec_decoder("gzip", lambda p: gzip.decompress(p))
        _, out, _ = decode_http_body(blk)
        assert out == body  # pass-through stand-in: byte-identical
        register_codec_decoder("gzip", lambda p: b"DISTORTED")
        _, out, _ = decode_http_body(blk)
        assert out == b"DISTORTED"  # the dispatch is live
    finally:
        reset_codec_decoders()
    _, out, _ = decode_http_body(blk)
    assert out == body


def test_stream_codec_swap_reaches_spark_and_snapshot_pins_plans(spark):
    """Through Spark: a distorting stand-in registered BEFORE plan
    build reaches the workers via the closure snapshot; a plan built
    BEFORE registration keeps the decoder set it closed over (the
    multimodal plan-snapshot convention)."""
    import gzip

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        explode_jsonl_shards,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.codecs import (
        register_codec_decoder,
        reset_codec_decoders,
    )

    payload = gzip.compress(b'{"k": 1}\n{"k": 2}\n', mtime=0)
    shards = spark.createDataFrame(
        [(1, bytearray(payload))], "shard_id long, payload binary"
    )
    # plan built with the default decoder — snapshot taken NOW
    before = explode_jsonl_shards(shards)
    try:
        register_codec_decoder(
            "gzip", lambda p: b'{"k": "swapped"}\n'
        )
        after = explode_jsonl_shards(shards)  # snapshot sees the stand-in
        rows_before = before.orderBy("line_no").collect()
        rows_after = after.orderBy("line_no").collect()
        assert [r.line for r in rows_before] == ['{"k": 1}', '{"k": 2}']
        assert [r.line for r in rows_after] == ['{"k": "swapped"}']
    finally:
        reset_codec_decoders()


def test_stream_codec_registry_covers_compressed_tar_route():
    """iter_archive_members honors an injected snapshot for .tar.zst
    (and the default registry decodes it from spec)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        build_tar,
        iter_archive_members,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.codecs import (
        CODEC_DECODERS,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
        zstd_compress_fixture,
    )

    tar = build_tar([("doc.txt", b"seam"), ("m.bin", b"\x01\x02")])
    shard = zstd_compress_fixture(tar, "lz")
    assert dict(iter_archive_members(shard)) == {
        "doc.txt": b"seam", "m.bin": b"\x01\x02"
    }
    # injected snapshot: a stand-in that returns a DIFFERENT tar
    other = build_tar([("swapped.txt", b"x")])
    snap = dict(CODEC_DECODERS)
    snap["zstd"] = lambda p: other
    assert dict(iter_archive_members(shard, snap)) == {
        "swapped.txt": b"x"
    }
