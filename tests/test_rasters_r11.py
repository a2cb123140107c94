"""r11 raster wave (Sun Raster / SGI / XBM / PBM-PGM / OpenEXR):
roundtrips, feature matrices, tear fuzz. Real-file pins live in
tests/test_realworld_r11.py."""

from __future__ import annotations

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exr import (
    decode_exr,
    decode_exr_rgb,
    encode_exr,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pnm import (
    decode_pbm_bits,
    decode_pnm_gray,
    encode_pnm,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ras import (
    decode_ras,
    encode_ras,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sgi import (
    decode_sgi_rgba,
    encode_sgi,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xbm import (
    decode_xbm,
    encode_xbm,
)

rng = np.random.RandomState(11)


@pytest.mark.parametrize("rtype,depth", [(1, 24), (3, 24), (1, 32), (3, 32), (2, 24), (2, 32)])
def test_ras_roundtrip(rtype, depth):
    img = rng.randint(0, 256, (11, 13, 3)).astype(np.uint8)
    out, w, h = decode_ras(encode_ras(img, rtype=rtype, depth=depth))
    assert (w, h) == (13, 11) and np.array_equal(out, img)


def test_ras_rle_escape_byte():
    img = np.full((4, 6, 3), 0x80, dtype=np.uint8)  # all-0x80 stresses escapes
    img[0, 0] = (0x80, 1, 0x80)
    out, _, _ = decode_ras(encode_ras(img, rtype=2))
    assert np.array_equal(out, img)


def test_ras_boundaries():
    img = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    blob = bytearray(encode_ras(img))
    blob[0] ^= 1
    with pytest.raises(ValueError, match="magic"):
        decode_ras(bytes(blob))
    with pytest.raises(ValueError, match="torn"):
        decode_ras(encode_ras(img)[:-8])


@pytest.mark.parametrize("storage", [0, 1])
@pytest.mark.parametrize("z", [1, 3, 4])
def test_sgi_roundtrip(storage, z):
    shape = (9, 7) if z == 1 else (9, 7, z)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    out, w, h = decode_sgi_rgba(encode_sgi(img, storage=storage))
    assert (w, h) == (7, 9)
    if z == 1:
        assert np.array_equal(out[..., 0], img)
    else:
        assert np.array_equal(out[..., :3], img[..., :3])
        if z == 4:
            assert np.array_equal(out[..., 3], img[..., 3])


def test_sgi_boundaries():
    img = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
    blob = encode_sgi(img)
    with pytest.raises(ValueError, match="magic"):
        decode_sgi_rgba(b"\x00\x00" + blob[2:])
    with pytest.raises(ValueError, match="torn"):
        decode_sgi_rgba(blob[:-6])
    # bpc 2 declared boundary
    hacked = blob[:3] + b"\x02" + blob[4:]
    with pytest.raises(ValueError, match="bpc 2"):
        decode_sgi_rgba(hacked)


def test_xbm_roundtrip_and_tears():
    bits = (rng.rand(10, 13) > 0.5).astype(np.uint8)
    out, w, h = decode_xbm(encode_xbm(bits))
    assert (w, h) == (13, 10) and np.array_equal(out, bits)
    with pytest.raises(ValueError):
        decode_xbm(b"int x = 1;")
    with pytest.raises(ValueError, match="torn"):
        decode_xbm(encode_xbm(bits)[: len(encode_xbm(bits)) // 2])


@pytest.mark.parametrize("magic", [b"P1", b"P2", b"P4", b"P5"])
def test_pnm_roundtrip(magic):
    if magic in (b"P1", b"P4"):
        arr = (rng.rand(9, 11) > 0.5).astype(np.uint8)
        out, w, h = decode_pbm_bits(encode_pnm(arr, magic))
    else:
        arr = rng.randint(0, 256, (9, 11)).astype(np.uint8)
        out, w, h = decode_pnm_gray(encode_pnm(arr, magic))
    assert (w, h) == (11, 9) and np.array_equal(out, arr)


def test_pnm_tears():
    arr = rng.randint(0, 256, (6, 6)).astype(np.uint8)
    with pytest.raises(ValueError, match="truncated"):
        decode_pnm_gray(encode_pnm(arr, b"P5")[:-10])
    with pytest.raises(ValueError):
        decode_pnm_gray(b"P7\n1 1\n255\n\x00")


@pytest.mark.parametrize("comp", [0, 1, 2, 3])
def test_exr_roundtrip(comp):
    chans = {k: rng.rand(20, 13).astype(np.float32) for k in ("R", "G", "B", "A")}
    blob = encode_exr(chans, 13, 20, compression=comp)
    back, w, h = decode_exr(blob)
    assert (w, h) == (13, 20)
    for k in chans:
        assert np.allclose(
            back[k], np.asarray(chans[k], dtype=np.float16).astype(np.float32)
        )


def test_exr_boundaries_and_tears():
    chans = {"Y": rng.rand(8, 8).astype(np.float32)}
    blob = encode_exr(chans, 8, 8)
    with pytest.raises(ValueError, match="magic"):
        decode_exr(b"\x00" + blob[1:])
    # PIZ (4) is a declared boundary — patch the compression attr byte
    idx = blob.index(b"compression\x00compression\x00") + len(
        b"compression\x00compression\x00"
    ) + 4
    with pytest.raises(ValueError, match="declared boundary"):
        decode_exr(blob[:idx] + b"\x04" + blob[idx + 1 :])
    with pytest.raises(ValueError, match="torn"):
        decode_exr(blob[:-20])
    rgb, w, h = decode_exr_rgb(blob)  # Y-only replicates to gray
    assert rgb.shape == (8, 8, 3)
    assert np.array_equal(rgb[..., 0], rgb[..., 1])


def test_exr_zip_multiline_blocks():
    # ZIP (16 lines/chunk) with a non-multiple height exercises the
    # short final block
    chans = {"R": rng.rand(37, 5).astype(np.float32)}
    back, w, h = decode_exr(encode_exr(chans, 5, 37, compression=3))
    assert (w, h) == (5, 37)
    assert np.allclose(
        back["R"], np.asarray(chans["R"], dtype=np.float16).astype(np.float32)
    )


def test_tear_fuzz_300_rasters():
    """100 truncations x three formats: ValueError or a well-formed
    decode — never a crash, never a malformed shape."""
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    blobs = [
        encode_ras(img, rtype=2),
        encode_sgi(img, storage=1),
        encode_exr({"R": img[..., 0] / 255.0}, 16, 16, compression=3),
    ]
    for blob in blobs:
        cuts = sorted(set(int(x) for x in rng.randint(0, len(blob), 100)))
        for cut in cuts:
            try:
                if blob[:2] == b"\x01\xda":
                    decode_sgi_rgba(blob[:cut])
                elif blob[:4] == b"\x76\x2f\x31\x01":
                    decode_exr(blob[:cut])
                else:
                    decode_ras(blob[:cut])
            except ValueError:
                pass


def test_sgi_rle_literal_cap_127():
    """Regression: a literal run hitting the 127-packet cap mid-pair
    must split, never emit count 0 (the end marker) — found by the
    512x512 noise throughput probe, invisible at small widths."""
    img = rng.randint(0, 256, (8, 512, 3)).astype(np.uint8)
    out, w, h = decode_sgi_rgba(encode_sgi(img, storage=1))
    assert np.array_equal(out[..., :3], img)
    flat_pairs = np.tile(np.array([3, 4], np.uint8), (4, 200))[:, :399]
    img2 = np.repeat(flat_pairs[..., None], 3, axis=2)
    out2, _, _ = decode_sgi_rgba(encode_sgi(img2, storage=1))
    assert np.array_equal(out2[..., :3], img2)


def test_pnm_p1_dense_digits():
    """P1 digits need no separating whitespace (netpbm pbm(5))."""
    bits, w, h = decode_pbm_bits(b"P1\n4 2\n1010\n0110\n")
    assert (w, h) == (4, 2)
    assert bits.tolist() == [[1, 0, 1, 0], [0, 1, 1, 0]]


def test_exr_rle_flat_chunks_actually_compress():
    # flat content must take the RLE branch (not the raw fallback)
    chans = {"R": np.full((20, 13), 0.5, dtype=np.float32)}
    blob = encode_exr(chans, 13, 20, compression=1)
    none = encode_exr(chans, 13, 20, compression=0)
    assert len(blob) < len(none)
    back, _, _ = decode_exr(blob)
    assert np.allclose(back["R"], 0.5)
