"""ID3v2 parse/strip (operators/id3.py): real-world v2.4 interop, both
version roundtrips, encodings, audio-bit-exactness of strip, tear fuzz."""

from __future__ import annotations

import os

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.id3 import (
    build_id3v2,
    parse_id3,
    strip_id3,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp3 import (
    build_mp3_frame_l3,
    decode_mp3,
    probe_mp3,
)

REAL_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


@pytest.mark.skipif(not os.path.exists(REAL_MP3), reason="no real mp3 on host")
def test_real_world_id3v24_tag():
    data = open(REAL_MP3, "rb").read()
    info = parse_id3(data)
    assert info["id3_version"] == "2.4"
    assert info["encoder"] == "Lavf53.5.0"  # ffmpeg-written TSSE, UTF-8
    stripped = strip_id3(data)
    assert parse_id3(stripped) == {"has_id3": False}
    assert probe_mp3(stripped)["n_frames"] == probe_mp3(data)["n_frames"]
    a, _, _ = decode_mp3(data)
    b, _, _ = decode_mp3(stripped)
    assert np.array_equal(a, b)  # strip never touches audio bytes


@pytest.mark.parametrize("ver", [3, 4])
def test_roundtrip_both_versions(ver):
    audio = build_mp3_frame_l3([[2, 2] + [0] * 574, [0] * 576])
    tag = build_id3v2(
        {"title": "T\xfctle", "artist": "A/B", "encoder": "e", "comment": "hi"},
        version=ver,
    )
    tagged = tag + audio
    info = parse_id3(tagged)
    assert info["id3_version"] == f"2.{ver}"
    assert info["title"] == "T\xfctle" and info["artist"] == "A/B"
    assert info["comments"] == ["hi"]
    assert sorted(info["frames"]) == ["COMM", "TIT2", "TPE1", "TSSE"]
    assert strip_id3(tagged) == audio
    assert strip_id3(tagged + b"TAG" + bytes(125)) == audio  # ID3v1 too


def test_utf16_text_frames():
    body = b"\x01" + "héllo".encode("utf-16")  # BOM-led UTF-16
    sz = len(body)
    frame = b"TIT2" + bytes([0, 0, (sz >> 7) & 0x7F, sz & 0x7F]) + b"\x00\x00" + body
    total = len(frame)
    tag = b"ID3\x04\x00\x00" + bytes(
        [(total >> 21) & 0x7F, (total >> 14) & 0x7F, (total >> 7) & 0x7F, total & 0x7F]
    ) + frame
    assert parse_id3(tag + b"")["title"] == "héllo"


def test_declared_boundaries():
    with pytest.raises(ValueError, match="ID3v2.2"):
        parse_id3(b"ID3\x02\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="unsynchronised"):
        parse_id3(b"ID3\x04\x00\x80\x00\x00\x00\x00")


def test_tear_contract_fuzz():
    audio = build_mp3_frame_l3([[1, 1] + [0] * 574, [0] * 576])
    base = build_id3v2({"title": "x", "comment": "y"}, version=4) + audio
    rng = np.random.RandomState(11)
    errors = 0
    for _ in range(300):
        b = bytearray(base)
        for _k in range(rng.randint(1, 4)):
            b[rng.randint(len(b))] ^= 1 << rng.randint(8)
        for fn in (parse_id3, strip_id3):
            try:
                fn(bytes(b))
            except ValueError:
                errors += 1
    assert errors > 0
