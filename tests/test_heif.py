"""HEIF/HEIC container + decode battery (r13). The pixel ground truth
is the system libheif via ctypes (tools/heif_rig.py) on full-range
streams — libheif's no-colr default conversion is BT.601 full range
(= ITU-T T.871, the repo's canonical conversion), so every comparison
here is PIXEL-EXACT, no tolerances. Limited-range/VUI signalling is a
documented non-acted-on boundary (operators/heif.py docstring)."""

from __future__ import annotations

import os
import random
import struct
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
    build_heif,
    decode_heif,
    decode_heif_yuv,
    probe_heif,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
    encode_hevc_intra,
)


def _make_frame(w, h, seed, kind="mixed"):
    from hevc_rig import make_frame

    return make_frame(w, h, seed, kind)


def _fixture_heic(w=48, h=32, seed=3, qp=30, **kw) -> bytes:
    """Library-independent HEIC: fixture-encoder stream in a built
    container (the corpus path — no host libs involved)."""
    st = encode_hevc_intra([_make_frame(w, h, seed, "grad")], qp=qp)
    return build_heif([st], **kw)


def _rig():
    from heif_rig import decode_heic_rgb, heif_lib

    if heif_lib() is None:
        pytest.skip("no system libheif (visible host gap)")
    return decode_heic_rgb


def _x265(frames, qp=27):
    from hevc_rig import encode_intra, x265_lib

    if x265_lib() is None:
        pytest.skip("no system libx265 (visible host gap)")
    # full-range VUI so libheif's conversion matches T.871 exactly
    return encode_intra(frames, qp=qp, extra={b"range": b"full"})


def test_probe_single_item():
    f = _fixture_heic()
    p = probe_heif(f)
    assert p["brand"] == "heic"
    assert p["primary_type"] == "hvc1"
    assert (p["width"], p["height"]) == (48, 32)
    assert p["n_items"] == 1 and p["n_tiles"] == 0
    assert p["rotation"] == 0


def test_probe_grid_and_rotation():
    tiles = [
        encode_hevc_intra([_make_frame(32, 32, 10 + s, "mixed")], qp=30)
        for s in range(6)
    ]
    f = build_heif(tiles, grid=(2, 3, 90, 60), rotation=180)
    p = probe_heif(f)
    assert p["primary_type"] == "grid"
    assert p["n_tiles"] == 6
    assert (p["width"], p["height"]) == (90, 60)
    assert p["rotation"] == 180
    assert p["item_census"] == {"grid": 1, "hvc1": 6}


def test_decode_fixture_stream_matches_input():
    """No host libs: fixture-encoder HEVC in a built container decodes
    back to the encoded planes exactly (the encoder mirrors the CABAC
    decode, so reconstruction is deterministic)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        decode_hevc_intra,
    )

    frame = _make_frame(48, 32, 3, "grad")
    st = encode_hevc_intra([frame], qp=30)
    want = decode_hevc_intra(st)[0]
    got = decode_heif_yuv(build_heif([st]))
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_grid_assembly_no_host_libs():
    """Grid assembly is pure container logic: 2x2 tiles of distinct
    flat colors land in the right quadrants after crop."""
    tiles = []
    lums = [40, 90, 150, 210]
    for lum in lums:
        y = np.full((32, 32), lum, np.uint8)
        u = np.full((16, 16), 100, np.uint8)
        v = np.full((16, 16), 160, np.uint8)
        tiles.append(encode_hevc_intra([(y, u, v)], qp=12))
    f = build_heif(tiles, grid=(2, 2, 60, 50))
    y, u, v = decode_heif_yuv(f)
    assert y.shape == (50, 60)
    for (r0, c0), lum in zip([(0, 0), (0, 32), (32, 0), (32, 32)], lums):
        block = y[r0:min(r0 + 32, 50), c0:min(c0 + 32, 60)]
        assert abs(int(block.mean()) - lum) <= 2, (r0, c0, lum)


def test_single_item_pixel_exact_vs_libheif():
    decode_heic_rgb = _rig()
    st = _x265([_make_frame(96, 64, 9, "mixed")])
    f = build_heif([st])
    ours, w, h = decode_heif(f)
    gt = decode_heic_rgb(f)
    assert (h, w) == (64, 96)
    assert np.array_equal(ours, gt)


def test_grid_pixel_exact_vs_libheif():
    decode_heic_rgb = _rig()
    tiles = [_x265([_make_frame(64, 64, 20 + s, "mixed")]) for s in range(4)]
    f = build_heif(tiles, grid=(2, 2, 120, 100))
    ours, w, h = decode_heif(f)
    gt = decode_heic_rgb(f)
    assert (h, w) == (100, 120)
    assert np.array_equal(ours, gt)


@pytest.mark.parametrize("rot", [90, 180, 270])
def test_rotation_pixel_exact_vs_libheif(rot):
    decode_heic_rgb = _rig()
    st = _x265([_make_frame(96, 64, 9, "mixed")])
    f = build_heif([st], rotation=rot)
    ours, w, h = decode_heif(f)
    gt = decode_heic_rgb(f)
    assert ours.shape == gt.shape
    assert np.array_equal(ours, gt)


def test_libheif_encoded_artifact_pixel_exact():
    """Fully third-party artifact: libheif's own x265 plugin encodes
    (full-range output is its default), our decoder matches its
    decode bit-exact — independence from our container writer."""
    from heif_rig import encode_heic, heif_lib

    if heif_lib() is None:
        pytest.skip("no system libheif (visible host gap)")
    decode_heic_rgb = _rig()
    y, u, v = _make_frame(96, 64, 7, "mixed")
    f = encode_heic(y, u, v, quality=80)
    p = probe_heif(f)
    assert p["primary_type"] == "hvc1"
    ours, w, h = decode_heif(f)
    gt = decode_heic_rgb(f)
    assert np.array_equal(ours, gt)


def test_fixture_encoder_heic_pixel_exact_vs_libheif():
    """The corpus path (fixture encoder, full-range VUI) decodes
    pixel-identically in libheif and in our stack."""
    decode_heic_rgb = _rig()
    f = _fixture_heic()
    ours, w, h = decode_heif(f)
    gt = decode_heic_rgb(f)
    assert np.array_equal(ours, gt)


def test_registry_sniff_and_decode():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
        sniff_image_format,
    )

    f = _fixture_heic()
    assert sniff_image_format(f) == "heif"
    px, w, h = decode_image(f)
    assert (h, w) == (32, 48) and px.shape == (32, 48, 3)


def test_named_boundaries():
    f = _fixture_heic()
    with pytest.raises(ValueError, match="imir"):
        # splice an imir property in place of irot
        g = build_heif(
            [encode_hevc_intra([_make_frame(48, 32, 3, "grad")], qp=30)],
            rotation=90,
        )
        g = g.replace(b"irot", b"imir")
        decode_heif(g)
    with pytest.raises(ValueError, match="rotation"):
        build_heif([b"\x00"], rotation=45)
    with pytest.raises(ValueError, match="ftyp"):
        probe_heif(b"\x00" * 64)
    # protected item
    raw = bytearray(f)
    i = raw.find(b"infe")
    raw[i + 10:i + 12] = struct.pack(">H", 1)  # protection_index
    with pytest.raises(ValueError):
        decode_heif(bytes(raw))


def test_tear_fuzz_valueerror_only():
    """300-case mutation/truncation fuzz (house codec convention):
    decode either succeeds or raises ValueError — never IndexError/
    struct.error/KeyError."""
    f = bytearray(_fixture_heic())
    rnd = random.Random(13)
    for case in range(300):
        data = bytearray(f)
        op = rnd.randrange(3)
        if op == 0:
            data = data[:rnd.randrange(1, len(data))]
        elif op == 1:
            for _ in range(rnd.randrange(1, 6)):
                data[rnd.randrange(len(data))] = rnd.randrange(256)
        else:
            pos = rnd.randrange(len(data))
            data[pos:pos] = bytes(rnd.randrange(256)
                                  for _ in range(rnd.randrange(1, 9)))
        try:
            decode_heif(bytes(data))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"case {case}: non-ValueError tear {type(exc).__name__}: "
                f"{exc}"
            )


def test_main10_heic_pixel_exact_vs_libheif():
    """[r13] 10-bit HEIC: a real x265 Main10 stream (full-range VUI)
    in the container decodes to the same 8-bit RGB as libheif
    (T.871 at 10 bits, clip, >> 2), and the fixture-encoder Main10
    path agrees too."""
    from hevc_rig import de265_lib, make_frame10, x265_api

    decode_heic_rgb = _rig()
    if x265_api(10) is None or de265_lib() is None:
        pytest.skip("no 10-bit x265 API / libde265 (visible host gap)")
    from hevc_rig import encode_intra10

    st = encode_intra10([make_frame10(96, 64, 7)], qp=24,
                        extra={b"range": b"full"})
    f = build_heif([st])
    p = probe_heif(f)
    assert (p["width"], p["height"]) == (96, 64)
    ours, w, h = decode_heif(f)
    gt = decode_heic_rgb(f)
    assert ours.dtype == np.uint8
    assert np.array_equal(ours, gt)
    # fixture-encoder Main10 (libx265-independent source)
    st2 = encode_hevc_intra([make_frame10(48, 32, 5)], qp=20,
                            bit_depth=10)
    f2 = build_heif([st2])
    ours2, w2, h2 = decode_heif(f2)
    gt2 = decode_heic_rgb(f2)
    assert np.array_equal(ours2, gt2)


def test_exif_item_extract_strip_and_thumbnail():
    """[r13 second wave] Exif items (ISO 23008-12 A.2.1) parse through
    the shared TIFF machinery; strip_heif_exif redacts IN PLACE (same
    byte length, offsets untouched, pixels byte-identical, GPS/camera
    fields gone); thmb-referenced thumbnails decode."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        build_exif_app1,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
        extract_heif_exif,
        extract_heif_thumbnail,
        strip_heif_exif,
    )

    main = encode_hevc_intra([_make_frame(64, 48, 3, "mixed")], qp=27)
    thumb = encode_hevc_intra([_make_frame(16, 16, 4, "grad")], qp=30)
    tiff = build_exif_app1({"make": "Acme", "model": "Cam9"},
                           gps_dms=(52, 30, 10))[10:]
    f = build_heif([main], exif=tiff, thumbnail=thumb)
    p = probe_heif(f)
    assert p["has_exif"] and p["n_thumbnails"] == 1 and p["n_items"] == 3
    e = extract_heif_exif(f)
    assert (e["make"], e["model"], e["has_gps"]) == ("Acme", "Cam9", True)
    tpx, tw, th = extract_heif_thumbnail(f)
    assert (tw, th) == (16, 16) and tpx.shape == (16, 16, 3)
    px1, _, _ = decode_heif(f)
    stripped = strip_heif_exif(f)
    assert len(stripped) == len(f)
    e2 = extract_heif_exif(stripped)
    assert not e2["has_gps"] and "make" not in e2
    px2, _, _ = decode_heif(stripped)
    assert np.array_equal(px1, px2)
    # no-exif container: extract returns the has_exif=False shape,
    # strip is the identity, thumbnail tears loudly
    g = build_heif([main])
    assert extract_heif_exif(g) == {"has_exif": False}
    assert strip_heif_exif(g) == g
    with pytest.raises(ValueError, match="thumbnail"):
        extract_heif_thumbnail(g)


def test_exif_item_pins_against_libheif_metadata_api():
    """The Exif bytes libheif's metadata API reads from OUR container
    equal what we wrote; libheif decodes the STRIPPED container with
    byte-identical pixels and no camera/GPS bytes in its metadata."""
    from heif_rig import HeifError, _ck, decode_heic_rgb, heif_lib

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        build_exif_app1,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
        strip_heif_exif,
    )

    lib = heif_lib()
    if lib is None:
        pytest.skip("no system libheif (visible host gap)")
    import ctypes

    lib.heif_image_handle_get_number_of_metadata_blocks.restype = \
        ctypes.c_int
    lib.heif_image_handle_get_number_of_metadata_blocks.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p]
    lib.heif_image_handle_get_list_of_metadata_block_IDs.restype = \
        ctypes.c_int
    lib.heif_image_handle_get_list_of_metadata_block_IDs.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
    lib.heif_image_handle_get_metadata_size.restype = ctypes.c_size_t
    lib.heif_image_handle_get_metadata_size.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32]
    lib.heif_image_handle_get_metadata.restype = HeifError
    lib.heif_image_handle_get_metadata.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p]

    def libheif_exif(payload):
        ctx = lib.heif_context_alloc()
        buf = ctypes.create_string_buffer(payload, len(payload))
        _ck(lib.heif_context_read_from_memory_without_copy(
            ctx, buf, len(payload), None), "read")
        h = ctypes.c_void_p()
        _ck(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(h)), "h")
        n = lib.heif_image_handle_get_number_of_metadata_blocks(h, b"Exif")
        if n == 0:
            return None
        ids = (ctypes.c_uint32 * n)()
        lib.heif_image_handle_get_list_of_metadata_block_IDs(
            h, b"Exif", ids, n)
        sz = lib.heif_image_handle_get_metadata_size(h, ids[0])
        out = ctypes.create_string_buffer(sz)
        _ck(lib.heif_image_handle_get_metadata(h, ids[0], out), "meta")
        return out.raw[:sz]

    st = encode_hevc_intra([_make_frame(64, 48, 3, "mixed")], qp=27)
    tiff = build_exif_app1({"make": "Acme", "model": "Cam9"},
                           gps_dms=(52, 30, 10))[10:]
    f = build_heif([st], exif=tiff)
    assert libheif_exif(f) == b"\x00\x00\x00\x00" + tiff
    stripped = strip_heif_exif(f)
    assert np.array_equal(decode_heic_rgb(f), decode_heic_rgb(stripped))
    residue = libheif_exif(stripped)
    assert b"Acme" not in residue and b"Cam9" not in residue
