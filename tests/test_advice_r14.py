"""Regression tests pinning the five r13 ADVICE findings (r14).

1. (high) Main10 tiles inside a HEIF grid were truncated to uint8 —
   the canvas now inherits the tile dtype and mixed depths raise.
2. (med) torn TIFF Exif blocks escaped as struct.error past
   with_exif's per-row quarantine — now normalized to ValueError.
3. (med) torn gzip/deflate HTTP bodies raised zlib.error through
   decode_http_body's documented ValueError contract — normalized.
4. (low) 10-bit thumbnails decoded with 8-bit YCbCr constants —
   now scaled like decode_heif.
5. (low) AV1 sequence headers with initial_display_delay_present=1
   were misparsed — the per-op syntax is now consumed (§5.5.1).
"""

import struct
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
    build_heif,
    decode_heif,
    decode_heif_yuv,
    extract_heif_thumbnail,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
    encode_hevc_intra,
)


def _make_frame(w, h, seed, kind="mixed"):
    rnd = np.random.default_rng(seed)
    if kind == "grad":
        y = (np.add.outer(np.arange(h), np.arange(w)) % 220 + 16).astype(
            np.uint8
        )
    else:
        y = rnd.integers(16, 235, (h, w), dtype=np.uint8)
    u = rnd.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)
    v = rnd.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)
    return y, u, v


# --- 1. Main10 grid dtype -----------------------------------------------------


def test_main10_grid_keeps_uint16_canvas():
    """A 2x1 grid of fixture-encoder Main10 tiles must decode the same
    pixels as the single-tile decode of each tile — previously the
    uint8 canvas truncated 10-bit values mod 256."""
    from hevc_rig import make_frame10

    tiles = [
        encode_hevc_intra([make_frame10(48, 32, s)], qp=20, bit_depth=10)
        for s in (5, 6)
    ]
    f = build_heif(tiles, grid=(1, 2, 96, 32))
    y, u, v = decode_heif_yuv(f)
    assert y.dtype == np.uint16 and u.dtype == np.uint16
    assert y.shape == (32, 96)
    # each half must equal the standalone tile decode bit-exactly
    for i, tile in enumerate(tiles):
        ty, tu, tv = decode_heif_yuv(build_heif([tile]))
        assert np.array_equal(y[:, i * 48:(i + 1) * 48], ty)
        assert np.array_equal(u[:, i * 24:(i + 1) * 24], tu)
        assert np.array_equal(v[:, i * 24:(i + 1) * 24], tv)
    # and values must actually exceed 8 bits somewhere (the truncation
    # symptom was mod-256 wraparound)
    assert int(y.max()) > 255


def test_main10_grid_pixel_exact_vs_libheif():
    from heif_rig import decode_heic_rgb, heif_lib
    from hevc_rig import de265_lib, make_frame10, x265_api

    if x265_api(10) is None or de265_lib() is None:
        pytest.skip("no 10-bit x265 API / libde265 (visible host gap)")
    if heif_lib() is None:
        pytest.skip("no system libheif (visible host gap)")
    from hevc_rig import encode_intra10

    tiles = [
        encode_intra10([make_frame10(64, 64, s)], qp=24,
                       extra={b"range": b"full"})
        for s in (7, 8)
    ]
    f = build_heif(tiles, grid=(1, 2, 128, 64))
    ours, w, h = decode_heif(f)
    gt = decode_heic_rgb(f)
    assert ours.dtype == np.uint8
    assert np.array_equal(ours, gt)


def test_mixed_depth_grid_raises():
    from hevc_rig import make_frame10

    t8 = encode_hevc_intra([_make_frame(48, 32, 1)], qp=24)
    t10 = encode_hevc_intra([make_frame10(48, 32, 2)], qp=24, bit_depth=10)
    f = build_heif([t8, t10], grid=(1, 2, 96, 32))
    with pytest.raises(ValueError, match="bit depth"):
        decode_heif_yuv(f)


# --- 2. torn TIFF Exif → ValueError ------------------------------------------


def test_torn_tiff_exif_is_valueerror():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        parse_exif_tiff,
    )

    for torn in (b"II", b"II*\x00", b"II*\x00\x08\x00\x00\x00",
                 b"MM\x00*\x00\x00\x00\x08\x00"):
        with pytest.raises(ValueError):
            parse_exif_tiff(torn)


def test_torn_webp_exif_quarantines_not_tears(spark):
    """A WebP whose EXIF chunk body is just b'II' must land in the
    has_exif=false/quarantine path of with_exif, not kill the task."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        with_exif,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
        encode_webp_lossless,
    )

    px = np.zeros((8, 8, 3), np.uint8)
    base = encode_webp_lossless(px)
    # wrap into an extended-format WebP with a torn EXIF chunk
    body = base[12:]  # strip RIFF header, keep VP8L chunk
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(
        [0x08, 0, 0, 0]) + b"\x07\x00\x00\x07\x00\x00"
    exif = b"EXIF" + struct.pack("<I", 2) + b"II"
    riff_body = b"WEBP" + vp8x + body + exif
    torn_webp = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    df = spark.createDataFrame(
        [(1, bytearray(torn_webp)), (2, bytearray(base))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r.asDict() for r in with_exif(df).collect()}
    assert rows[1]["has_exif"] is False
    assert rows[2]["has_exif"] is False


# --- 3. torn gzip/deflate HTTP body → ValueError ------------------------------


def test_torn_gzip_deflate_bodies_raise_valueerror():
    import zlib

    from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
        decode_http_body,
    )

    good = zlib.compress(b"hello world " * 40)
    gz = zlib.compressobj(wbits=16 + zlib.MAX_WBITS)
    good_gz = gz.compress(b"hello world " * 40) + gz.flush()

    def block(enc, body):
        return (b"HTTP/1.1 200 OK\r\nContent-Encoding: " + enc
                + b"\r\n\r\n" + body)

    # sanity: intact bodies decode
    assert decode_http_body(block(b"gzip", good_gz))[1] == b"hello world " * 40
    assert decode_http_body(block(b"deflate", good))[1] == b"hello world " * 40
    # torn bodies: ValueError, never zlib.error
    for enc, body in [(b"gzip", good_gz[:8]), (b"gzip", b"\x1f\x8b\x00"),
                      (b"deflate", good[:4]), (b"deflate", b"\x00\x01")]:
        with pytest.raises(ValueError):
            decode_http_body(block(enc, body))


# --- 4. 10-bit thumbnail ------------------------------------------------------


def test_main10_thumbnail_scaled_not_wrapped():
    from hevc_rig import make_frame10

    main = encode_hevc_intra([_make_frame(64, 48, 3)], qp=27)
    y10, u10, v10 = make_frame10(16, 16, 4)
    thumb = encode_hevc_intra([(y10, u10, v10)], qp=4, bit_depth=10)
    f = build_heif([main], thumbnail=thumb)
    px, w, h = extract_heif_thumbnail(f)
    assert px.dtype == np.uint8 and (w, h) == (16, 16)
    # reference conversion straight from the 10-bit source planes
    yf = y10.astype(np.float64)
    cb = np.repeat(np.repeat(u10, 2, 0), 2, 1)[:16, :16].astype(np.float64)
    cr = np.repeat(np.repeat(v10, 2, 0), 2, 1)[:16, :16].astype(np.float64)
    want = np.clip(np.round(np.stack([
        yf + 1.402 * (cr - 512.0),
        yf - 0.344136 * (cb - 512.0) - 0.714136 * (cr - 512.0),
        yf + 1.772 * (cb - 512.0),
    ], 2)), 0, 1023).astype(np.int64) >> 2
    # qp=4 intra keeps the thumbnail within a couple of codes
    assert np.abs(px.astype(np.int64) - want).max() <= 8


# --- 5. AV1 per-op initial display delay --------------------------------------


def test_av1_initial_display_delay_consumed():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.av1 import (
        _BitW,
        parse_sequence_header,
    )

    w = _BitW()
    w.u(0, 3)   # seq_profile
    w.u(0, 1)   # still_picture
    w.u(0, 1)   # reduced_still_picture_header = 0 (general shape)
    w.u(0, 1)   # timing_info_present
    w.u(1, 1)   # initial_display_delay_present_flag = 1
    w.u(0, 5)   # operating_points_cnt_minus_1
    w.u(0, 12)  # operating_point_idc
    w.u(5, 5)   # seq_level_idx
    w.u(1, 1)   # initial_display_delay_present_for_this_op
    w.u(3, 4)   # initial_display_delay_minus_1
    w.u(7, 4)   # frame_width_bits_minus_1
    w.u(7, 4)   # frame_height_bits_minus_1
    w.u(199, 8)  # max_frame_width_minus_1 -> 200
    w.u(99, 8)   # max_frame_height_minus_1 -> 100
    w.u(0, 1)   # frame_id_numbers_present
    w.u(1, 1)   # use_128x128_superblock
    w.u(0, 1)   # enable_filter_intra
    w.u(0, 1)   # enable_intra_edge_filter
    w.u(0, 1)   # enable_interintra_compound
    w.u(0, 1)   # enable_masked_compound
    w.u(0, 1)   # enable_warped_motion
    w.u(0, 1)   # enable_dual_filter
    w.u(0, 1)   # enable_order_hint
    w.u(1, 1)   # seq_choose_screen_content_tools
    w.u(0, 1)   # seq_choose_integer_mv (force_sct truthy -> read)
    w.u(0, 1)   # seq_force_integer_mv
    w.u(0, 1)   # enable_superres
    w.u(0, 1)   # enable_cdef
    w.u(0, 1)   # enable_restoration
    # color_config: 8-bit profile 0
    w.u(0, 1)   # high_bitdepth
    w.u(0, 1)   # monochrome
    w.u(0, 1)   # color_description_present
    w.u(0, 1)   # color_range
    w.u(0, 2)   # chroma_sample_position
    w.u(0, 1)   # separate_uv_delta_q
    w.u(0, 1)   # film_grain_params_present
    hdr = parse_sequence_header(w.tobytes())
    assert (hdr["width"], hdr["height"]) == (200, 100)
    assert hdr["seq_level_idx"] == 5
    assert hdr["bit_depth"] == 8
