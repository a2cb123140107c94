"""QOI codec (operators/qoi.py): exhaustive chunk-kind roundtrips,
spec-literal byte pins of every op encoding, seen-array hash semantics,
wraparound arithmetic, registry dispatch, tear fuzz."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.qoi import (
    _hash_rgba,
    decode_qoi,
    encode_qoi,
)


@pytest.mark.parametrize("channels", [3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (7, 5), (32, 32), (61, 47)])
def test_roundtrip_random(shape, channels):
    rng = np.random.RandomState(shape[0] * 10 + channels)
    px = rng.randint(0, 256, size=(*shape, 3)).astype(np.uint8)
    dec, w, h = decode_qoi(encode_qoi(px, channels=channels))
    assert (w, h) == (shape[1], shape[0])
    assert np.array_equal(dec, px)


def test_roundtrip_every_chunk_kind():
    """One image engineered to force RUN, INDEX, DIFF, LUMA and RGB
    chunks, verified by inspecting the emitted tag bytes."""
    row = []
    row += [(10, 20, 30)] * 5            # RUN after the first RGB
    row += [(11, 21, 31)]                # DIFF (+1, +1, +1)
    row += [(30, 41, 52)]                # LUMA (dg=20, dr-dg=-1, db-dg=0)
    row += [(200, 0, 77)]                # RGB (large jump)
    row += [(10, 20, 30)]                # INDEX (seen earlier)
    px = np.array([row], dtype=np.uint8)
    blob = encode_qoi(px)
    body = blob[14:-8]
    tags = set()
    i = 0
    while i < len(body):
        b = body[i]
        if b == 0xFE:
            tags.add("rgb"); i += 4
        elif b == 0xFF:
            tags.add("rgba"); i += 5
        else:
            t = b >> 6
            tags.add(("index", "diff", "luma", "run")[t])
            i += 2 if t == 2 else 1
    assert {"run", "index", "diff", "luma", "rgb"} <= tags
    dec, w, h = decode_qoi(blob)
    assert np.array_equal(dec, px)


def test_spec_byte_pins():
    """Pin the exact spec encodings: header layout, RUN bias −1, DIFF
    bias 2, LUMA biases 32/8, and the end marker."""
    px = np.array([[(0, 0, 0)]], dtype=np.uint8)
    blob = encode_qoi(px)
    assert blob[:4] == b"qoif"
    assert struct.unpack(">II", blob[4:12]) == (1, 1)
    assert blob[12] == 3 and blob[13] == 0
    # first pixel (0,0,0,255) vs state (0,0,0,255): a run of 1 → 0xC0
    assert blob[14] == 0xC0
    assert blob[-8:] == b"\x00" * 7 + b"\x01"

    # DIFF: (1,255,0) from (0,0,0) is dr=+1, dg=-1, db=0 → 0b01_11_01_10
    px = np.array([[(1, 255, 0)]], dtype=np.uint8)
    assert encode_qoi(px)[14] == 0b01_11_01_10

    # LUMA: dg=+10, dr-dg=-8, db-dg=+7 → 0x80|42 then 0x00|0x0F
    px = np.array([[(2, 10, 17)]], dtype=np.uint8)
    blob = encode_qoi(px)
    assert blob[14] == 0x80 | (10 + 32)
    assert blob[15] == ((-8 + 8) << 4) | (7 + 8)


def test_hash_function_spec():
    # (3r + 5g + 7b + 11a) mod 64, the published constant set
    assert _hash_rgba(0, 0, 0, 255) == (11 * 255) % 64
    assert _hash_rgba(255, 255, 255, 255) == (255 * (3 + 5 + 7 + 11)) % 64


def test_wraparound_diff():
    """DIFF deltas wrap mod 256 per the spec: 255 → 0 is dr=+1."""
    px = np.array([[(255, 255, 255), (0, 254, 255)]], dtype=np.uint8)
    # force prev=(255,255,255) via an RGB chunk, then the wrap step
    dec, _, _ = decode_qoi(encode_qoi(px))
    assert np.array_equal(dec, px)


def test_run_boundary_sweep():
    """Runs of every length 1..130 roundtrip (62-cap splitting)."""
    for n in range(1, 131):
        px = np.full((1, n + 1, 3), 42, dtype=np.uint8)
        px[0, 0] = (1, 2, 3)
        dec, w, h = decode_qoi(encode_qoi(px))
        assert np.array_equal(dec, px), n


def test_index_collision_semantics():
    """Two colors hashing to the same slot: the second overwrites, and a
    later recall of the first must re-encode, not INDEX-recall."""
    a = (0, 0, 0, 255)
    # find b with same hash as a
    target = _hash_rgba(*a)
    b = None
    for r in range(1, 256):
        if _hash_rgba(r, 0, 0, 255) == target:
            b = (r, 0, 0)
            break
    assert b is not None
    px = np.array([[(0, 0, 0), b, (0, 0, 0)]], dtype=np.uint8)
    dec, _, _ = decode_qoi(encode_qoi(px))
    assert np.array_equal(dec, px)


def test_rgba_input_drops_alpha_plane():
    rng = np.random.RandomState(3)
    px4 = rng.randint(0, 256, size=(9, 11, 4)).astype(np.uint8)
    dec, w, h = decode_qoi(encode_qoi(px4, channels=4))
    assert np.array_equal(dec, px4[:, :, :3])


def test_registry_dispatch_and_hashes():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        average_hash,
        decode_image,
        sniff_image_format,
    )

    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[16:, :] = 255
    blob = encode_qoi(px)
    assert sniff_image_format(blob) == "qoi"
    dec, w, h = decode_image(blob)
    assert (w, h) == (32, 32)
    assert np.array_equal(dec, px)
    # two-tone split at row 16 → aHash = -(2^32), the established
    # analytic formula (dark top, bright bottom)
    assert average_hash(blob) == -(2**32)


def test_tear_contract_fuzz():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    blob = encode_qoi(px)
    for trial in range(300):
        cut = rng.randint(0, len(blob) - 9)  # keep it short of the pixels
        mutated = bytearray(blob[:cut]) if trial % 2 else bytearray(blob)
        if trial % 2 == 0:
            mutated[rng.randint(0, len(mutated))] ^= 1 << rng.randint(0, 8)
        try:
            decode_qoi(bytes(mutated))
        except ValueError:
            pass  # quarantine path: the only legal failure mode


def test_trailing_garbage_decodes():
    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    dec, _, _ = decode_qoi(encode_qoi(px) + b"\x99" * 16)
    assert np.array_equal(dec, px)


def test_early_exhaustion_tears():
    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    blob = encode_qoi(px)
    with pytest.raises(ValueError):
        decode_qoi(blob[:16])


def test_oversized_header_quarantines_before_allocation():
    hdr = b"qoif" + struct.pack(">II", 1 << 16, 1 << 16) + bytes((3, 0))
    with pytest.raises(ValueError, match="64 Mpx"):
        decode_qoi(hdr + b"\x00" * 32)


def test_run_overrun_tears():
    # 2x1 image whose stream claims a 5-pixel run after pixel 1
    hdr = b"qoif" + struct.pack(">II", 2, 1) + bytes((3, 0))
    with pytest.raises(ValueError, match="overrun"):
        decode_qoi(hdr + bytes((0xFE, 1, 2, 3, 0xC0 | 4)) + b"\x00" * 7 + b"\x01")
