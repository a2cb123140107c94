"""Baseline JPEG codec: analytic decode references, subsampling,
restart markers, the ValueError-only tear contract, and the Spark-side
media paths (features / resize / aHash) accepting JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F  # noqa: F401  (Spark-path tests)

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
    quality_tables,
)


def _expected_solid(v: int, q00: int) -> set[int]:
    """Analytic decode of a solid gray v: the block is DC-only, S00 =
    8·(v−128) exactly, quantize/dequantize/IDCT/round by hand — computed
    INDEPENDENTLY of the codec under test. When S00/q00 lands exactly on
    a .5 quantizer boundary the spec doesn't fix the direction (float
    DCT ulps decide), so both neighbors are admitted; every other case
    pins a single exact value."""
    import math

    s00 = 8 * (v - 128)
    ratio = s00 / q00
    dcs = {c for c in (math.floor(ratio), math.ceil(ratio)) if abs(c - ratio) <= 0.5}
    return {
        int(min(255, max(0, round(c * q00 / 8 + 128)))) for c in dcs
    }


@pytest.mark.parametrize("v", [0, 37, 91, 128, 200, 255])
@pytest.mark.parametrize("quality", [25, 50, 90, 100])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_solid_gray_decodes_to_analytic_value(v, quality, sub):
    q00 = int(quality_tables(quality)[0][0, 0])
    want = _expected_solid(v, q00)
    px = np.full((16, 16, 3), v, dtype=np.uint8)
    dec, w, h = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=sub))
    assert (w, h) == (16, 16)
    got = np.unique(dec).tolist()
    assert len(got) == 1 and got[0] in want, f"v={v} q00={q00} got={got} want={want}"


def test_smooth_roundtrip_q100_within_two():
    px = np.linspace(0, 255, 32 * 48 * 3).reshape(32, 48, 3).astype(np.uint8)
    dec, w, h = decode_jpeg(encode_jpeg(px, quality=100))
    assert (w, h) == (48, 32)
    assert int(np.abs(dec.astype(int) - px.astype(int)).max()) <= 2


def test_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    base, _, _ = decode_jpeg(encode_jpeg(px, quality=90))
    for ri in (1, 3, 8):
        with_rst, _, _ = decode_jpeg(encode_jpeg(px, quality=90, restart_interval=ri))
        assert np.array_equal(base, with_rst), f"restart_interval={ri}"


def test_grayscale_single_component():
    g = (np.arange(24 * 24).reshape(24, 24) * 11 % 256).astype(np.uint8)
    dec, w, h = decode_jpeg(encode_jpeg_gray(g, quality=100))
    assert (w, h) == (24, 24)
    assert np.array_equal(dec[..., 0], dec[..., 1])  # replicated channels
    assert int(np.abs(dec[..., 0].astype(int) - g.astype(int)).max()) <= 1


def test_odd_dimensions_and_420():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (17, 23, 3)).astype(np.uint8)
    dec, w, h = decode_jpeg(encode_jpeg(px, quality=95, subsampling="420"))
    assert (w, h) == (23, 17) and dec.shape == (17, 23, 3)


def test_progressive_equals_baseline_bit_exact():
    """Progressive (SOF2) decode: the scan ladder (DC successive
    approximation, per-component AC first passes with cross-block EOB
    runs, AC refinement with correction bits) reconstructs the SAME
    quantized coefficients as one baseline scan — so decoded pixels are
    bit-identical to the baseline encoding of the same image."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(11)
    for _ in range(12):
        h, w = rng.randint(8, 48), rng.randint(8, 48)
        q = int(rng.choice([25, 50, 90, 100]))
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        base, _, _ = decode_jpeg(encode_jpeg(px, quality=q))
        prog, pw, ph = decode_jpeg(encode_jpeg_progressive(px, quality=q))
        assert (pw, ph) == (w, h)
        assert np.array_equal(base, prog), (h, w, q)


@pytest.mark.parametrize("v", [0, 37, 128, 200, 255])
def test_progressive_solid_gray_analytic(v):
    """Solid blocks stay DC-only through the progressive ladder — the
    same analytic expectation as the baseline test."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    q00 = int(quality_tables(90)[0][0, 0])
    want = _expected_solid(v, q00)
    px = np.full((16, 16, 3), v, dtype=np.uint8)
    dec, w, h = decode_jpeg(encode_jpeg_progressive(px, quality=90))
    got = np.unique(dec).tolist()
    assert len(got) == 1 and got[0] in want


def test_progressive_mutation_fuzz_valueerror_only():
    """The tear contract holds for multi-scan streams too."""
    import random

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rnd = random.Random(77)
    px = (np.arange(12 * 20 * 3) % 256).reshape(12, 20, 3).astype(np.uint8)
    base = encode_jpeg_progressive(px, quality=80)
    for _ in range(200):
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
            out, w, h = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8 and out.shape == (h, w, 3)
        except ValueError:
            pass  # the only permitted failure mode


def _build_nondivisor_jpeg(y_dcs):
    """Hand-assemble a baseline JPEG with luma 3x1 / chroma 2x1 sampling
    (spec-legal, hmax=3 not divisible by hs=2 → fractional upsample
    ratio 1.5). 24x8 image, one MCU: 3 luma + 2 Cb + 2 Cr blocks, all
    DC-only. ``y_dcs`` are the three luma block means (chroma flat 128
    → grayscale output)."""
    import struct

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        HT_AC_CHROMA,
        HT_AC_LUMA,
        HT_DC_CHROMA,
        HT_DC_LUMA,
        ZIGZAG,
        _BitWriter,
        _encode_block,
        _encode_codes,
    )

    qy = np.ones((8, 8), dtype=np.int64)  # quality-100-style: exact DC
    qc = np.ones((8, 8), dtype=np.int64)
    dc_l, ac_l = _encode_codes(*HT_DC_LUMA), _encode_codes(*HT_AC_LUMA)
    dc_c, ac_c = _encode_codes(*HT_DC_CHROMA), _encode_codes(*HT_AC_CHROMA)
    bw = _BitWriter()
    pred = {"y": 0, "cb": 0, "cr": 0}
    for v in y_dcs:  # 3 luma blocks (3x1), raster order inside the MCU
        _encode_block(bw, np.full((8, 8), float(v)), qy, "y", pred, dc_l, ac_l)
    for _ in range(2):  # 2 Cb blocks (2x1)
        _encode_block(bw, np.full((8, 8), 128.0), qc, "cb", pred, dc_c, ac_c)
    for _ in range(2):  # 2 Cr blocks
        _encode_block(bw, np.full((8, 8), 128.0), qc, "cr", pred, dc_c, ac_c)
    bw.flush()

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tq, tbl):
        return seg(0xDB, bytes([tq]) + bytes(int(x) for x in tbl.reshape(-1)[ZIGZAG]))

    def dht(tc, th, table):
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, 8, 24, 3)
        + bytes([1, 0x31, 0])  # Y: 3x1
        + bytes([2, 0x21, 1])  # Cb: 2x1 — NON-divisor vs hmax=3
        + bytes([3, 0x21, 1]),  # Cr: 2x1
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + dqt(0, qy)
        + dqt(1, qc)
        + sof
        + dht(0, 0, HT_DC_LUMA)
        + dht(1, 0, HT_AC_LUMA)
        + dht(0, 1, HT_DC_CHROMA)
        + dht(1, 1, HT_AC_CHROMA)
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def test_nondivisor_sampling_ratio_decodes():
    """Spec-legal luma 3x1 / chroma 2x1 (fractional upsample 1.5x) must
    decode, not be quarantined as corrupt — an integer repeat factor
    (hmax//hs = 1) would mis-shape the chroma plane. Flat 128 planes
    decode to exactly 128 everywhere regardless of upsample phase."""
    dec, w, h = decode_jpeg(_build_nondivisor_jpeg([128, 128, 128]))
    assert (w, h) == (24, 8)
    assert dec.shape == (8, 24, 3)
    assert np.unique(dec).tolist() == [128]


def test_nondivisor_sampling_luma_geometry():
    """Luma is full-resolution even when chroma upsamples fractionally:
    three DC-only luma blocks (dark, mid, bright) land on their own
    8-column spans, pinning that the index-map upsample doesn't touch
    full-res components."""
    dec, w, h = decode_jpeg(_build_nondivisor_jpeg([30, 128, 220]))
    assert (w, h) == (24, 8)
    for j, want in ((0, 30), (8, 128), (16, 220)):
        block = dec[:, j : j + 8, :].astype(np.int64)
        assert abs(int(block.mean()) - want) <= 2, (j, want, block.mean())


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"P6\n1 1\n255\nabc")


def test_mutation_fuzz_valueerror_only():
    """Random byte flips / truncations / splices must either decode (a
    flipped entropy bit is still a valid image) or raise ValueError —
    never any other exception (the tear contract all codecs share)."""
    import random

    rnd = random.Random(42)
    px = (np.arange(16 * 16 * 3) % 256).reshape(16, 16, 3).astype(np.uint8)
    base = encode_jpeg(px, quality=80, restart_interval=2)
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
            out, w, h = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8 and out.shape == (h, w, 3)
        except ValueError:
            pass  # the only permitted failure mode


def test_ahash_accepts_jpeg_payloads():
    """aHash over a high-contrast JPEG equals the analytic bit pattern
    (top half dark, bottom half bright — ±2 codec error cannot flip a
    bit across a 255-point contrast)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        average_hash,
    )

    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[16:, :, :] = 255
    got = average_hash(encode_jpeg(px, quality=90))
    want = 0
    for i in range(32, 64):  # bottom 4 rows of the 8×8 grid exceed the mean
        want |= 1 << i
    if want & (1 << 63):
        want -= 1 << 64
    assert got == want


def test_spark_feature_and_resize_paths_decode_jpeg(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    px = np.linspace(0, 255, 24 * 24 * 3).reshape(24, 24, 3).astype(np.uint8)
    payload = encode_jpeg(px, quality=95)
    rows = [
        (0, "image", bytearray(payload), (24, 24, None, None, "image/jpeg")),
        (1, "image", bytearray(b"\xff\xd8 torn"), (None,) * 4 + ("image/jpeg",)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[0].decoded is True  # real JPEG decode, not the digest stub
    assert feats[1].decoded is False  # torn payload falls to the stub
    resized = {r.media_id: bytes(r.payload) for r in resize_images(media, 8, 8).collect()}
    out, w, h = decode_jpeg(resized[0])
    assert (w, h) == (8, 8)
    assert resized[1] == b"\xff\xd8 torn"  # undecodable → passthrough


# --- pHash (DCT perceptual hash) --------------------------------------------


def test_phash_robust_to_brightness_shift_where_ahash_is_not():
    """The pHash upgrade claim, demonstrated: a +60 brightness shift on
    half the image flips many aHash bits (mean moves) but few pHash bits
    (low-frequency structure is preserved)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        average_hash,
        encode_png,
        perceptual_hash,
    )

    rng = np.random.RandomState(4)
    base = rng.randint(0, 180, (64, 64, 3)).astype(np.uint8)
    shifted = np.clip(base.astype(int) + 60, 0, 255).astype(np.uint8)
    pa, pb = encode_png(base), encode_png(shifted)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    d_phash = ham(perceptual_hash(pa), perceptual_hash(pb))
    assert d_phash <= 3, d_phash  # uniform shift only perturbs DC (dropped)


def test_phash_cross_format_and_distinct_images(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        ahash_near_duplicates,
        encode_png,
        with_perceptual_hash,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        encode_jpeg,
    )

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    other = rng.randint(0, 256, (48, 48, 3)).astype(np.uint8)
    rows = [
        (0, "image", bytearray(encode_png(img)), (None,) * 4 + ("image/png",)),
        (1, "image", bytearray(encode_jpeg(img, quality=95)), (None,) * 4 + ("image/jpeg",)),
        (2, "image", bytearray(encode_png(other)), (None,) * 4 + ("image/png",)),
        (3, "image", bytearray(b"torn"), (None,) * 4 + (None,)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = with_perceptual_hash(media)
    hmap = {r.media_id: r.ahash for r in hashes.collect()}
    assert hmap[3] is None  # undecodable → NULL
    pairs = {
        (r.id_a, r.id_b)
        for r in ahash_near_duplicates(hashes.where(F.col("ahash").isNotNull())).collect()
    }
    assert (0, 1) in pairs  # PNG vs JPEG of the same pixels
    assert (0, 2) not in pairs and (1, 2) not in pairs


# --- spectral audio fingerprint ---------------------------------------------


def test_spectral_fingerprint_analytic_tone_bands():
    """A pure tone's strongest rFFT bin is known analytically, so the
    fingerprint's per-window band bits are predictable: frequency f over
    a window of W samples at rate sr peaks at bin round(f·W/sr), which
    quantizes to band (bin·16)//nbins."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
        encode_flac,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        spectral_fingerprint,
    )

    sr, n = 16000, 16_000
    t = np.arange(n)
    # multiples of sr/W = 16 Hz land EXACTLY on an rFFT bin — a half-bin
    # frequency (e.g. 3000 → 187.5 cycles) splits leakage equally between
    # neighbors and the argmax is float-luck, not analytic
    for f in (512.0, 3008.0, 6496.0):
        x = (12000 * np.sin(2 * np.pi * f * t / sr)).astype(np.int64)
        fp = spectral_fingerprint(encode_flac(x, sr), n_windows=16, top_k=1)
        W = n // 16
        nbins = W // 2 + 1
        peak_bin = round(f * W / sr)
        band = (peak_bin * 16) // nbins
        word = 1 << band
        want_word = (word ^ (word >> 4) ^ (word >> 8) ^ (word >> 12)) & 0xF
        # every window holds the same tone → every nibble equals the
        # xor-fold of the band's one-hot; bands 4-15 land on bit band%4,
        # so high-frequency tones contribute non-zero nibbles too
        assert want_word == 1 << (band % 4)
        expect = 0
        for i in range(16):
            expect |= want_word << (4 * i)
        if expect & (1 << 63):
            expect -= 1 << 64
        assert fp == expect, (f, band)


def test_spectral_fingerprint_volume_and_noise_robust():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
        encode_flac,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        spectral_fingerprint,
    )

    sr, n = 16000, 16_000
    t = np.arange(n)
    rng = np.random.RandomState(2)
    x = (9000 * np.sin(2 * np.pi * 1200 * t / sr)
         + 5000 * np.sin(2 * np.pi * 5200 * t / sr)).astype(np.int64)
    quiet = (x * 0.4).astype(np.int64)
    noisy = np.clip(x + rng.randint(-400, 400, n), -32768, 32767).astype(np.int64)
    fp = spectral_fingerprint(encode_flac(x, sr))
    assert spectral_fingerprint(encode_flac(quiet, sr)) == fp  # volume-invariant
    assert spectral_fingerprint(encode_flac(noisy, sr)) == fp  # noise-robust
