"""Ogg container probe (operators/ogg.py): page walk with real CRCs,
codec id headers, granule/duration semantics, lacing continuation,
tears. No real .ogg ships on this host (visible scope note in the
module docstring); the fixture writer is spec-exact RFC 3533."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ogg import (
    _ogg_crc,
    build_ogg,
    build_opus_head,
    build_vorbis_id_packet,
    parse_ogg_pages,
    probe_ogg,
)

rng = np.random.RandomState(3)


def test_crc_spec_vector():
    # CRC of the zeroed-CRC page must reproduce the stored value on
    # every page the writer emits (self-consistency over random bodies)
    for n in (0, 1, 254, 255, 256, 600):
        blob = build_ogg([build_vorbis_id_packet(1, 8000), rng.randint(0, 256, n, dtype=np.uint8).tobytes()])
        assert len(list(parse_ogg_pages(blob))) >= 2  # CRC verified inside


def test_vorbis_probe_fields():
    blob = build_ogg(
        [build_vorbis_id_packet(2, 44100), b"\x03vorbis" + b"\x00" * 8, b"x" * 50],
        granules=[0, 0, 441000],
    )
    p = probe_ogg(blob)
    assert (p["codec"], p["channels"], p["sample_rate"]) == ("vorbis", 2, 44100)
    assert p["duration_seconds"] == 10.0 and p["last_granule"] == 441000
    assert p["n_pages"] == 3 and p["eos"]


def test_opus_probe_subtracts_preskip():
    blob = build_ogg(
        [build_opus_head(1, 312, 16000), b"OpusTags" + b"\x00" * 8, b"y" * 20],
        granules=[0, 0, 312 + 96000],
    )
    p = probe_ogg(blob)
    assert (p["codec"], p["sample_rate"], p["pre_skip"]) == ("opus", 48000, 312)
    assert p["duration_seconds"] == 2.0
    assert p["input_sample_rate"] == 16000


def test_long_packet_lacing_continuation():
    # 255*k-byte packets need the terminating 0 lacing value
    for n in (255, 510, 600, 1000):
        blob = build_ogg([build_vorbis_id_packet(1, 8000), rng.randint(0, 256, n, dtype=np.uint8).tobytes()])
        pages = list(parse_ogg_pages(blob))
        assert sum(len(p["body"]) for p in pages) == 30 + n


def test_tears_and_boundaries():
    blob = build_ogg([build_vorbis_id_packet(1, 8000), b"z" * 40])
    mut = bytearray(blob)
    mut[40] ^= 1
    with pytest.raises(ValueError, match="CRC mismatch"):
        probe_ogg(bytes(mut))
    with pytest.raises(ValueError, match="torn"):
        probe_ogg(blob[:-3])
    with pytest.raises(ValueError, match="capture pattern"):
        probe_ogg(b"NotO" + blob[4:])
    with pytest.raises(ValueError, match="unrecognized Ogg codec"):
        probe_ogg(build_ogg([b"mystery-codec-header"]))
    # multiplexed: two serials
    a = build_ogg([build_vorbis_id_packet(1, 8000)], serial=1)
    b = build_ogg([build_opus_head(1, 0, 48000)], serial=2)
    with pytest.raises(ValueError, match="multiplexed"):
        probe_ogg(a + b)
    # non-BOS first page
    nb = bytearray(blob)
    nb[5] = 0  # clear BOS flag on page 0
    page0_len = 27 + blob[26] + sum(blob[27 : 27 + blob[26]])
    z = bytes(nb[:22]) + b"\x00\x00\x00\x00" + bytes(nb[26:page0_len])
    struct.pack_into("<I", nb, 22, _ogg_crc(z))
    with pytest.raises(ValueError, match="not BOS"):
        probe_ogg(bytes(nb))


def test_registry_sniff_and_named_quarantine():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        sniff_audio_format,
    )

    blob = build_ogg([build_vorbis_id_packet(1, 8000)])
    assert sniff_audio_format(blob) == "ogg"
    with pytest.raises(ValueError, match="probe_ogg"):
        decode_audio(blob)


def test_flac_in_ogg_streaminfo_offsets():
    # Build the FLAC-in-Ogg mapping ident packet (RFC draft / Xiph
    # mapping 1.0) around a REAL STREAMINFO written by our flac
    # encoder: 0x7F 'FLAC' major minor nheaders(BE16) + native fLaC
    # stream.  The metadata block header after 'fLaC' is 4 bytes, so
    # STREAMINFO data starts at ident offset 17.
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import encode_flac

    pcm = (rng.randint(-2000, 2000, (960, 2))).astype(np.int64)
    flac = encode_flac(pcm, 44100, blocksize=480)
    assert flac[:4] == b"fLaC"
    ident = b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 0) + flac[: 4 + 4 + 34]
    blob = build_ogg([ident, b"frame-data"], granules=[0, 960])
    out = probe_ogg(blob)
    assert out["codec"] == "flac"
    assert out["sample_rate"] == 44100
    assert out["channels"] == 2
    assert out["duration_seconds"] == pytest.approx(960 / 44100)


def test_ogg_tags_extract_strip_and_boundaries():
    """[r12] Comment-metadata extraction + privacy strip: long
    comment packets spanning 255-lacing pages, UTF-8, framing bit,
    keep-filtering, torn/foreign contracts."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ogg import (
        _comment_packet,
        extract_ogg_tags,
        strip_ogg_tags,
    )

    big = "x" * 700  # comment packet > 255 bytes → lacing continuation
    tags = [("TITLE", "tïtle ☃"), ("LYRICS", big), ("A", "b=c")]
    blob = build_ogg(
        [build_vorbis_id_packet(1, 8000), _comment_packet("vorbis", "v", tags),
         b"audio" * 50],
        granules=[0, 0, 16000],
    )
    m = extract_ogg_tags(blob)
    assert m["tags"][0] == ("TITLE", "tïtle ☃")
    assert m["tags"][1] == ("LYRICS", big)
    assert m["tags"][2] == ("A", "b=c")  # value keeps its own '='
    out = strip_ogg_tags(blob)
    assert extract_ogg_tags(out)["tags"] == []
    assert probe_ogg(out)["duration_seconds"] == 2.0
    # wrong signature
    bad = build_ogg(
        [build_vorbis_id_packet(1, 8000), b"\x04vorbisnope", b"a"],
        granules=[0, 0, 800],
    )
    with pytest.raises(ValueError, match="signature"):
        extract_ogg_tags(bad)
    # torn comment body
    short = _comment_packet("vorbis", "v", [("T", "x" * 60)])[:-40]
    torn = build_ogg(
        [build_vorbis_id_packet(1, 8000), short, b"a"], granules=[0, 0, 800]
    )
    with pytest.raises(ValueError, match="torn"):
        extract_ogg_tags(torn)
    # FLAC-in-Ogg metadata [r12 second wave]: native VORBIS_COMMENT
    # blocks ride in the header packets after the ident
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
        build_vorbis_comment_body,
        encode_flac,
    )

    flac = encode_flac(np.zeros((480, 1), dtype=np.int64), 8000)
    ident = b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 1) + flac[:42]
    vc = build_vorbis_comment_body("v", [("TITLE", "f"), ("GEO_LOCATION", "1,1")])
    vc_pkt = bytes([4]) + struct.pack(">I", len(vc))[1:] + vc
    fblob = build_ogg([ident, vc_pkt, b"frames"], granules=[0, 0, 480])
    fm = extract_ogg_tags(fblob)
    assert fm["codec"] == "flac" and len(fm["tags"]) == 2
    fo = strip_ogg_tags(fblob, keep=("TITLE",))
    assert extract_ogg_tags(fo)["tags"] == [("TITLE", "f")]
    # no comment block at all: empty tags, strip still works
    fblob2 = build_ogg([ident, b"frames"], granules=[0, 480])
    assert extract_ogg_tags(fblob2)["tags"] == []
