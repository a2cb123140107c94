"""TGA codec (operators/tga.py): raw + RLE roundtrips over gray/RGB and
both row origins, BGR order + bottom-up spec pins, RLE packet-boundary
sweep, declared-scope quarantines, registry-dict dispatch, tear fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tga import (
    decode_tga,
    encode_tga,
)


@pytest.mark.parametrize("rle", [False, True])
@pytest.mark.parametrize("top_down", [False, True])
def test_rgb_roundtrip(rle, top_down):
    rng = np.random.RandomState(7 + int(rle) + 2 * int(top_down))
    px = rng.randint(0, 256, size=(13, 9, 3)).astype(np.uint8)
    dec, w, h = decode_tga(encode_tga(px, rle=rle, top_down=top_down))
    assert (w, h) == (9, 13)
    assert np.array_equal(dec, px)


@pytest.mark.parametrize("rle", [False, True])
def test_gray_roundtrip(rle):
    g = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    dec, w, h = decode_tga(encode_tga(g, rle=rle))
    assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))


def test_bgr_and_bottomup_spec_pins():
    """Type-2 raw pixels are BGR and rows store bottom-up by default."""
    px = np.zeros((2, 1, 3), dtype=np.uint8)
    px[0, 0] = (255, 0, 0)  # top row red
    px[1, 0] = (0, 0, 255)  # bottom row blue
    blob = encode_tga(px)
    # first stored pixel = BOTTOM row, BGR: blue=(255,0,0) in BGR bytes
    assert blob[18:21] == bytes((255, 0, 0))
    dec, _, _ = decode_tga(blob)
    assert tuple(dec[0, 0]) == (255, 0, 0)


def test_32bit_alpha_dropped():
    """Hand-built 32-bit raw TGA: BGRA → RGB with alpha dropped."""
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 1, 1, 32, 0x20)
    blob = hdr + bytes((10, 20, 30, 99))  # B G R A
    dec, w, h = decode_tga(blob)
    assert tuple(dec[0, 0]) == (30, 20, 10)


def test_rle_packet_boundary_sweep():
    """Runs of 1..260 pixels cross the 128-px packet cap."""
    for n in range(1, 261, 13):
        px = np.full((1, n + 1, 3), 7, dtype=np.uint8)
        px[0, 0] = (1, 2, 3)
        dec, w, h = decode_tga(encode_tga(px, rle=True))
        assert np.array_equal(dec, px), n


def test_declared_scope_quarantines():
    with pytest.raises(ValueError, match="color-mapped"):
        decode_tga(struct.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 4, 24, 0, 0, 1, 1, 8, 0))
    with pytest.raises(ValueError, match="depth 16"):
        decode_tga(struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 1, 1, 16, 0))
    with pytest.raises(ValueError, match="64 Mpx"):
        decode_tga(
            struct.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 60000, 60000, 24, 0)
        )


def test_registry_dict_dispatch():
    """TGA has no magic: reachable via an explicit decoders dict, and a
    registered swap must replace it like any other format."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        IMAGE_DECODERS,
        register_image_decoder,
        reset_decoders,
        sniff_image_format,
    )

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    blob = encode_tga(px)
    assert sniff_image_format(blob) is None  # never payload-sniffed
    dec, w, h = IMAGE_DECODERS["tga"](blob)
    assert np.array_equal(dec, px)
    try:
        register_image_decoder("tga", lambda b: (px + 1, 4, 4))
        assert np.array_equal(IMAGE_DECODERS["tga"](blob)[0], px + 1)
    finally:
        reset_decoders()
    assert np.array_equal(IMAGE_DECODERS["tga"](blob)[0], px)


def test_tear_contract_fuzz():
    rng = np.random.RandomState(31)
    px = rng.randint(0, 256, size=(9, 9, 3)).astype(np.uint8)
    for trial in range(300):
        blob = encode_tga(px, rle=trial % 2 == 0)
        mutated = bytearray(blob)
        if trial % 2 == 0:
            mutated = bytearray(blob[: rng.randint(0, len(blob))])
        elif mutated:
            mutated[rng.randint(0, len(mutated))] ^= 1 << rng.randint(0, 8)
        try:
            decode_tga(bytes(mutated))
        except ValueError:
            pass  # the only legal failure mode
