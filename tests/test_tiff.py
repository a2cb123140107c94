"""Baseline TIFF codec (operators/tiff.py): roundtrips across byte
orders / strip splits / PackBits, spec pins for PackBits and
WhiteIsZero, palette ColorMap scaling, declared-scope quarantines,
registry dispatch, tear fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("rps", [None, 3])
def test_rgb_roundtrip(bo, packbits, rps):
    rng = np.random.RandomState(17)
    px = rng.randint(0, 256, size=(13, 9, 3)).astype(np.uint8)
    dec, w, h = decode_tiff(
        encode_tiff(px, byte_order=bo, rows_per_strip=rps, packbits=packbits)
    )
    assert (w, h) == (9, 13)
    assert np.array_equal(dec, px)


@pytest.mark.parametrize("photometric", [0, 1])
def test_gray_roundtrip_both_polarities(photometric):
    g = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    dec, w, h = decode_tiff(encode_tiff(g, photometric=photometric, packbits=True))
    assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))


def test_whiteiszero_stored_inverted():
    """Spec pin (TIFF 6.0 §4): photometric 0 stores 0 = white. The
    encoder inverts on write, so the raw strip bytes differ from the
    logical grays but decode restores them."""
    g = np.full((2, 2), 10, dtype=np.uint8)
    blob = encode_tiff(g, photometric=0)
    # strips start at offset 8; stored byte must be 255-10
    assert blob[8] == 245
    dec, _, _ = decode_tiff(blob)
    assert dec[0, 0, 0] == 10


def test_palette_colormap_16bit_scaling():
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[5] = (250, 120, 7)
    idx = np.full((4, 4), 5, dtype=np.uint8)
    blob = encode_tiff(idx, palette=pal)
    dec, _, _ = decode_tiff(blob)
    assert tuple(dec[0, 0]) == (250, 120, 7)


def test_packbits_spec_pins():
    """TIFF 6.0 §9 worked semantics: literal header n copies n+1,
    repeat header n copies 257-n, 0x80 is a noop."""
    assert packbits_decode(bytes([0x02, 0x41, 0x42, 0x43]), 3) == b"ABC"
    assert packbits_decode(bytes([0xFE, 0x61]), 3) == b"aaa"  # 257-254=3
    assert packbits_decode(bytes([0x80, 0x00, 0x58]), 1) == b"X"
    with pytest.raises(ValueError):
        packbits_decode(bytes([0x05, 0x41]), 6)  # torn literal


def test_packbits_encoder_rle_choice():
    row = b"AAABBBBBBCDEF"
    enc = packbits_encode(row)
    assert packbits_decode(enc, len(row)) == row
    assert len(enc) < len(row)  # the runs actually compressed
    # run crossing nothing: long literal roundtrip
    lit = bytes(range(200))
    assert packbits_decode(packbits_encode(lit), 200) == lit


def test_packbits_row_boundary_sweep():
    rng = np.random.RandomState(4)
    for n in range(1, 300, 7):
        row = bytes(rng.randint(0, 4, size=n).astype(np.uint8))
        assert packbits_decode(packbits_encode(row), n) == row


def test_multi_strip_layout_real_tables():
    """5 rows at rows_per_strip=2 → 3 strips with real offsets/counts."""
    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    blob = encode_tiff(px, rows_per_strip=2)
    dec, w, h = decode_tiff(blob)
    assert np.array_equal(dec, px)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda ifd: ifd.replace(b"II*\x00", b"II+\x00"), "not a TIFF"),
        (None, None),
    ],
)
def test_bad_magic(mutate, msg):
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = encode_tiff(px)
    if mutate is None:
        decode_tiff(blob)
        return
    with pytest.raises(ValueError, match=msg):
        decode_tiff(mutate(blob))


def test_declared_scope_quarantines():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    base = encode_tiff(px)

    def patch_tag(blob: bytes, tag: int, value: int) -> bytes:
        # walk IFD entries (LE fixture) and overwrite a SHORT value
        (ifd_off,) = struct.unpack_from("<I", blob, 4)
        (n,) = struct.unpack_from("<H", blob, ifd_off)
        out = bytearray(blob)
        for i in range(n):
            base_off = ifd_off + 2 + 12 * i
            (t,) = struct.unpack_from("<H", blob, base_off)
            if t == tag:
                struct.pack_into("<H", out, base_off + 8, value)
        return bytes(out)

    with pytest.raises(ValueError, match="compression"):
        # old-style JPEG (6, deprecated by TIFF TechNote 2) stays a
        # boundary; LZW (5) and new-style JPEG (7) are IN scope since
        # r11 — tests/test_lzw_r11.py pins both against real libtiff
        decode_tiff(patch_tag(base, 259, 6))
    with pytest.raises(ValueError, match="planar"):
        decode_tiff(patch_tag(base, 284, 2))
    with pytest.raises(ValueError, match="photometric"):
        decode_tiff(patch_tag(base, 262, 6))  # YCbCr

    g = np.zeros((2, 2), dtype=np.uint8)
    # 16-bit is IN scope since r11 (real-libtiff pinned); 12-bit stays
    # a named boundary
    with pytest.raises(ValueError, match="bits-per-sample"):
        decode_tiff(patch_tag(encode_tiff(g), 258, 12))
    # 16-bit declared on 8-bit-sized data must TEAR, not mis-decode
    with pytest.raises(ValueError, match="shorter"):
        decode_tiff(patch_tag(encode_tiff(g), 258, 16))


def test_oversized_header_quarantines():
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    blob = bytearray(encode_tiff(px))
    (ifd_off,) = struct.unpack_from("<I", blob, 4)
    (n,) = struct.unpack_from("<H", blob, ifd_off)
    for i in range(n):
        base_off = ifd_off + 2 + 12 * i
        (t,) = struct.unpack_from("<H", blob, base_off)
        if t in (256, 257):
            struct.pack_into("<I", blob, base_off + 8, 1 << 16)
    with pytest.raises(ValueError, match="64 Mpx"):
        decode_tiff(bytes(blob))


def test_registry_dispatch_and_hash():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        average_hash,
        decode_image,
        sniff_image_format,
    )

    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[16:, :] = 200
    for bo in ("<", ">"):
        blob = encode_tiff(px, byte_order=bo, packbits=True)
        assert sniff_image_format(blob) == "tiff"
        dec, w, h = decode_image(blob)
        assert np.array_equal(dec, px)
        assert average_hash(blob) == -(2**32)


def test_tear_contract_fuzz():
    rng = np.random.RandomState(23)
    px = rng.randint(0, 256, size=(9, 9, 3)).astype(np.uint8)
    for trial in range(300):
        bo = "<" if trial % 2 else ">"
        blob = encode_tiff(px, byte_order=bo, packbits=trial % 3 == 0)
        mutated = bytearray(blob)
        if trial % 2 == 0:
            mutated = bytearray(blob[: rng.randint(8, len(blob))])
        else:
            mutated[rng.randint(0, len(mutated))] ^= 1 << rng.randint(0, 8)
        try:
            decode_tiff(bytes(mutated))
        except ValueError:
            pass  # the only legal failure mode
