"""MP3 frame-layer parsing: header math, ID3 skip, CBR/VBR, duration,
and the tear contract."""

from __future__ import annotations

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp3 import (
    build_mp3,
    probe_mp3,
)


def test_probe_basic_stream():
    data = build_mp3(50, bitrate_kbps=128, sample_rate=44100)
    info = probe_mp3(data)
    assert info["version"] == "MPEG1" and info["layer"] == 3
    assert info["sample_rate"] == 44100 and info["channels"] == 2
    assert info["n_frames"] == 50 and info["cbr"] is True
    assert info["bitrate_kbps"] == 128
    # 50 frames × 1152 samples at 44.1 kHz
    assert info["duration_s"] == round(50 * 1152 / 44100, 6)
    # frame spans tile the stream exactly
    offs = info["frames"]
    assert offs[0][0] == 0
    assert all(b == a + s for (a, s), (b, _s2) in zip(offs, offs[1:]))
    assert offs[-1][0] + offs[-1][1] == len(data)


def test_frame_size_padding_math():
    # 128 kbps at 44100: 417 bytes unpadded, 418 padded (the classic pair)
    info = probe_mp3(build_mp3(4, 128, 44100))
    sizes = [s for _o, s in info["frames"]]
    assert sizes == [417, 418, 417, 418]


def test_id3v2_prefix_skipped():
    info = probe_mp3(build_mp3(10, 192, 48000, id3v2_bytes=333))
    assert info["n_frames"] == 10 and info["sample_rate"] == 48000
    assert info["bitrate_kbps"] == 192


def test_id3v2_footer_flag_skipped():
    """ID3v2.4 footer flag (0x10): the 10-byte '3DI' footer is NOT
    counted in the syncsafe size (id3v2.4.0-structure §3.1), so a tag
    with a footer carries 10 extra bytes before the first frame."""
    size = 77
    tag = (
        b"ID3\x04\x00\x10"
        + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                 (size >> 7) & 0x7F, size & 0x7F])
        + bytes(size)
        + b"3DI\x04\x00\x10"
        + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                 (size >> 7) & 0x7F, size & 0x7F])
    )
    assert len(tag) == 10 + size + 10
    info = probe_mp3(tag + build_mp3(5, 128, 44100))
    assert info["n_frames"] == 5 and info["bitrate_kbps"] == 128


def test_id3v1_trailer_skipped():
    data = build_mp3(6, 64, 32000, stereo=False) + b"TAG" + bytes(125)
    info = probe_mp3(data)
    assert info["n_frames"] == 6 and info["channels"] == 1


def test_tear_contract():
    data = build_mp3(8, 128, 44100)
    with pytest.raises(ValueError, match="torn final frame"):
        probe_mp3(data[:-10])
    with pytest.raises(ValueError, match="lost frame sync"):
        probe_mp3(data[:417] + b"garbage here" + data[417:])
    with pytest.raises(ValueError):
        probe_mp3(b"not audio at all")


def test_mutation_fuzz_valueerror_only():
    import random

    rnd = random.Random(23)
    base = build_mp3(12, 160, 44100, id3v2_bytes=40)
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
            info = probe_mp3(bytes(data))
            assert info["n_frames"] >= 1
        except ValueError:
            pass  # the only permitted failure mode
