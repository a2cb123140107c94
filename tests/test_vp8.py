"""VP8 key-frame codec tests (operators/vp8.py, RFC 6386).

Ladder (module docstring): bit-exact fixture roundtrips both MB
flavors, bool-coder inverse, exact-transform pins, tear fuzz. The
REAL-FILE interop pins (python.webp bit-exact vs system libwebp and
vs the PNG twin) live in tests/test_realworld_r11.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators import vp8


def _planes(seed: int, size: int):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 256, (size, size)).astype(np.uint8)
    u = rng.randint(0, 256, (size // 2, size // 2)).astype(np.uint8)
    v = rng.randint(0, 256, (size // 2, size // 2)).astype(np.uint8)
    return y, u, v


def test_bool_coder_roundtrip():
    rng = np.random.RandomState(3)
    probs = rng.randint(1, 256, 4000).tolist()
    bits = rng.randint(0, 2, 4000).tolist()
    be = vp8.BoolEncoder()
    for p, b in zip(probs, bits):
        be.write_bool(p, b)
    data = be.flush()
    bd = vp8.BoolDecoder(data)
    out = [bd.read_bool(p) for p in probs]
    assert out == bits
    assert bd.overrun == 0


def test_bool_literals_and_trees():
    be = vp8.BoolEncoder()
    be.write_literal(7, 93)
    be.write_signed(4, -11)
    for leaf in range(10):
        be.write_tree(vp8.BMODE_TREE, vp8.KF_BMODE_PROB[3][7], leaf)
    for leaf in (0, 1, 2, 3, 4):
        be.write_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, leaf)
    data = be.flush()
    bd = vp8.BoolDecoder(data)
    assert bd.read_literal(7) == 93
    assert bd.read_signed(4) == -11
    for leaf in range(10):
        assert bd.read_tree(vp8.BMODE_TREE, vp8.KF_BMODE_PROB[3][7]) == leaf
    for leaf in (0, 1, 2, 3, 4):
        assert bd.read_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB) == leaf


def test_idct_dc_only_pin():
    # DC-only block: every output = (dc + 4) >> 3 per the exact math
    out = vp8.idct4x4([40] + [0] * 15)
    assert all(v == (40 + 4) >> 3 for row in out for v in row)
    out = vp8.idct4x4([-40] + [0] * 15)
    assert all(v == (-40 + 4) >> 3 for row in out for v in row)


def test_iwht_uniform_pin():
    # uniform DC in: iwht distributes it evenly across the 16 outputs
    out = vp8.iwht4x4([64] + [0] * 15)
    assert out == [(64 + 3) >> 3] + [8] * 15 or len(set(out)) == 1
    # exact inverse of the encoder's forward WHT on arbitrary data
    rng = np.random.RandomState(5)
    for _ in range(50):
        dcs = rng.randint(-2048, 2048, 16).tolist()
        f = vp8._fwht4x4(dcs)
        back = vp8.iwht4x4(f)
        assert max(abs(a - b) for a, b in zip(back, dcs)) <= 1


def test_fdct_idct_inverse_within_rounding():
    rng = np.random.RandomState(11)
    for _ in range(100):
        blk = rng.randint(-255, 256, 16).tolist()
        f = vp8._fdct4x4(blk)
        back = vp8.idct4x4(f)
        flat = [v for row in back for v in row]
        assert max(abs(a - b) for a, b in zip(flat, blk)) <= 2


@pytest.mark.parametrize("use_bpred", [False, True])
@pytest.mark.parametrize("size,qi", [(16, 12), (32, 40), (48, 4), (64, 90)])
def test_roundtrip_bit_exact(use_bpred, size, qi):
    """decode(encode(x)) equals the encoder's recorded reconstruction
    EXACTLY — bool coder, token trees, contexts, zigzag, dequant,
    IDCT/IWHT, and both intra paths verified as mutual inverses."""
    y, u, v = _planes(size + qi, size)
    payload, (ry, ru, rv) = vp8.encode_frame(y, u, v, qi=qi, use_bpred=use_bpred)
    dy, du, dv, w, h = vp8.decode_frame(payload)
    assert (w, h) == (size, size)
    assert np.array_equal(dy, ry)
    assert np.array_equal(du, ru)
    assert np.array_equal(dv, rv)


def test_roundtrip_high_quality_is_near_lossless():
    y, u, v = _planes(99, 32)
    payload, (ry, _, _) = vp8.encode_frame(y, u, v, qi=0)
    assert np.abs(ry.astype(int) - y.astype(int)).max() <= 24
    dy, _, _, _, _ = vp8.decode_frame(payload)
    assert np.array_equal(dy, ry)


def test_flat_image_encodes_tiny_and_decodes_flat():
    y = np.full((16, 16), 200, dtype=np.uint8)
    u = np.full((8, 8), 100, dtype=np.uint8)
    v = np.full((8, 8), 60, dtype=np.uint8)
    payload, (ry, ru, rv) = vp8.encode_frame(y, u, v, qi=20)
    dy, du, dv, _, _ = vp8.decode_frame(payload)
    assert np.array_equal(dy, ry) and len(np.unique(dy)) == 1
    assert int(np.unique(dy)[0]) == 200  # DC path reproduces a flat MB
    assert np.array_equal(du, ru) and np.array_equal(dv, rv)


def test_inter_frame_is_declared_boundary():
    y, u, v = _planes(1, 16)
    payload, _ = vp8.encode_frame(y, u, v)
    # flip the key-frame bit in the tag
    bad = bytes([payload[0] | 1]) + payload[1:]
    with pytest.raises(ValueError, match="inter"):
        vp8.decode_frame(bad)


def test_bad_start_code_and_dims_rejected():
    y, u, v = _planes(2, 16)
    payload, _ = vp8.encode_frame(y, u, v)
    bad = payload[:3] + b"\x9d\x01\x2b" + payload[6:]
    with pytest.raises(ValueError, match="start code"):
        vp8.decode_frame(bad)
    with pytest.raises(ValueError, match="shorter"):
        vp8.decode_frame(payload[:8])


def test_tear_fuzz_300():
    """Truncations at every depth and 100 byte-corruptions: decode
    either raises ValueError or returns a well-formed frame — never
    crashes, never returns a malformed shape."""
    y, u, v = _planes(21, 32)
    payload, _ = vp8.encode_frame(y, u, v, qi=30)
    rng = np.random.RandomState(7)
    cuts = sorted(set(int(x) for x in rng.randint(0, len(payload), 200)))
    for cut in cuts:
        try:
            dy, du, dv, w, h = vp8.decode_frame(payload[:cut])
            assert dy.shape == (32, 32)
        except ValueError:
            pass
    for _ in range(100):
        pos = int(rng.randint(0, len(payload)))
        mut = bytearray(payload)
        mut[pos] ^= 1 << int(rng.randint(0, 8))
        try:
            dy, du, dv, w, h = vp8.decode_frame(bytes(mut))
            assert dy.shape[0] == h and dy.shape[1] == w
            assert du.shape == ((h + 1) // 2, (w + 1) // 2)
        except ValueError:
            pass


def test_alpha_raw_and_filters():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.vp8 import (
        decode_alpha,
    )

    rng = np.random.RandomState(13)
    plane = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    raw = bytes([0]) + plane.tobytes()
    assert np.array_equal(decode_alpha(raw, 8, 8), plane)
    # horizontal filter: residuals r[c] = a[c] - left; inverse restores
    filt = np.zeros_like(plane)
    for r in range(8):
        for c in range(8):
            left = plane[r, c - 1] if c else (plane[r - 1, 0] if r else 0)
            filt[r, c] = (int(plane[r, c]) - int(left)) & 0xFF
    enc = bytes([0b0100]) + filt.tobytes()
    assert np.array_equal(decode_alpha(enc, 8, 8), plane)
    with pytest.raises(ValueError, match="reserved ALPH compression"):
        decode_alpha(bytes([3]) + plane.tobytes(), 8, 8)
    with pytest.raises(ValueError, match="torn raw ALPH"):
        decode_alpha(bytes([0]) + plane.tobytes()[:10], 8, 8)


def test_upsample_fancy_flat_invariant():
    # a constant chroma plane upsamples to the same constant
    c = np.full((4, 4), 77, dtype=np.uint8)
    out = vp8._upsample_fancy(c, 8, 8)
    assert (out == 77).all()


def test_structural_validators_ran():
    # module import runs _validate_tables(); spot-pin a few normative
    # values (RFC 6386 §11.5 / §13.5 / §14.1)
    assert vp8.KF_BMODE_PROB[0][0] == (231, 120, 48, 89, 115, 113, 120, 152, 112)
    assert vp8.DEFAULT_COEFF_PROBS[0][1][0][:6] == (253, 136, 254, 255, 228, 219)
    assert vp8.DC_QLOOKUP[127] == 157 and vp8.AC_QLOOKUP[127] == 284
    assert vp8.KF_YMODE_PROB == (145, 156, 163, 128)
    assert vp8.KF_UV_MODE_PROB == (142, 114, 183)
