"""Stdlib PNG codec: decode (all five scanline filters, five color types),
encode round-trip, resize, and the Arrow feature-extraction path.

The decoder is tested against an INDEPENDENT forward implementation: the
test filters scanlines itself (straight from RFC 2083 §6.2-6.6) and builds
the chunk stream with its own writer, so `decode_png` is checked against
the spec, not against `encode_png`.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_png,
    encode_png,
    extract_features,
    resize_images,
    resize_png,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png(w, h, color, channels, scanlines, plte=None, depth=8, interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(scanlines))
    return out + _chunk(b"IEND", b"")


def _forward_filter(px: np.ndarray, ftype_per_row) -> bytes:
    """Independent reference filtering (RFC 2083): px is HxWxC uint8."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    out = b""
    for y in range(h):
        f = ftype_per_row[y]
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        line = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            line[x] = (cur[x] - pred) % 256
        out += bytes([f]) + line.astype(np.uint8).tobytes()
    return out


def test_decode_all_five_filters_rgb():
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8).astype(np.uint8)
    scan = _forward_filter(px, [0, 1, 2, 3, 4])
    payload = _png(4, 5, 2, 3, scan)
    got, w, h = decode_png(payload)
    assert (w, h) == (4, 5)
    assert np.array_equal(got, px)


def test_decode_color_types_normalize_to_rgb():
    # gray (0): value broadcast to all three channels
    g = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    got, w, h = decode_png(_png(4, 3, 0, 1, _forward_filter(g, [0, 1, 4])))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    # gray+alpha (4): alpha dropped
    ga = np.stack([g[..., 0], np.full((3, 4), 200, np.uint8)], axis=2)
    got, _, _ = decode_png(_png(4, 3, 4, 2, _forward_filter(ga, [0, 2, 3])))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    # RGBA (6): alpha dropped
    rgb = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    rgba = np.concatenate([rgb, np.full((3, 4, 1), 9, np.uint8)], axis=2)
    got, _, _ = decode_png(_png(4, 3, 6, 4, _forward_filter(rgba, [4, 4, 1])))
    assert np.array_equal(got, rgb)
    # palette (3): indices resolved through PLTE
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8).reshape(2, 2, 1)
    got, _, _ = decode_png(_png(2, 2, 3, 1, _forward_filter(idx, [0, 1]), plte=pal))
    assert np.array_equal(
        got, np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [7, 8, 9]]], np.uint8)
    )


def test_encode_decode_roundtrip_exact():
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(7, 9, 3), dtype=np.uint8)
    got, w, h = decode_png(encode_png(px))
    assert (w, h) == (9, 7)
    assert np.array_equal(got, px)


def test_decode_rejects_malformed():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(px)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n1 1\n255\nabc")
    # corrupt one IDAT byte → CRC failure
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # interlace and 16-bit rejected clearly
    scan = _forward_filter(px, [0, 0])
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(_png(2, 2, 2, 3, scan, interlace=1))
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(_png(2, 2, 2, 3, scan, depth=16))


def test_resize_png_nearest_neighbor():
    src = np.zeros((4, 4, 3), dtype=np.uint8)
    for y in range(4):
        for x in range(4):
            src[y, x] = (10 * y, 10 * x, y + x)
    out = resize_png(encode_png(src), 2, 2)
    px, w, h = decode_png(out)
    assert (w, h) == (2, 2)
    assert np.array_equal(px, src[[0, 2]][:, [0, 2]])


def test_png_through_feature_and_resize_operators(spark):
    # 2x4 image: first k pixels of channel c are 255 → mean_c = k/8 exact
    def img(kr, kg, kb):
        a = np.zeros((2, 4, 3), dtype=np.uint8)
        flat = a.reshape(8, 3)
        flat[:kr, 0] = 255
        flat[:kg, 1] = 255
        flat[:kb, 2] = 255
        return encode_png(a)

    rows = [
        (1, "image", bytearray(img(2, 4, 8)), (4, 2, None, None, "image/png")),
        (2, "image", bytearray(b"\xffJPEG-ish junk"), (4, 2, None, None, "image/jpeg")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["decoded"] is True
    f = feats[1]["feature"]
    assert [round(v, 6) for v in f[2:5]] == [0.25, 0.5, 1.0]
    assert feats[2]["decoded"] is False  # junk falls to the digest stub

    resized = {r["media_id"]: r for r in resize_images(media, 2, 1).collect()}
    px, w, h = decode_png(bytes(resized[1]["payload"]))
    assert (w, h) == (2, 1)
    assert bytes(resized[2]["payload"]) == b"\xffJPEG-ish junk"


def test_average_hash_identical_and_perturbed(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        average_hash,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    h1 = average_hash(encode_png(px))
    h2 = average_hash(encode_png(px.copy()))
    assert h1 == h2  # content-determined
    assert -(1 << 63) <= h1 < (1 << 63)  # signed-64 range (LongType-safe)
    # a strong local perturbation flips few bits
    px2 = px.copy()
    px2[0, 0] = 255 - px2[0, 0]
    h3 = average_hash(encode_png(px2))
    assert bin((h1 ^ h3) & ((1 << 64) - 1)).count("1") <= 4


def test_ahash_band_join_complete_vs_bruteforce(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        ahash_near_duplicates,
    )

    # random signed-64 hashes with planted near-dups
    import random

    rnd = random.Random(42)

    def signed(u):
        return u - (1 << 64) if u & (1 << 63) else u

    rows = []
    base_hashes = [rnd.getrandbits(64) for _ in range(40)]
    i = 0
    for hb in base_hashes:
        rows.append((i, signed(hb)))
        i += 1
        flipped = hb ^ (1 << rnd.randrange(64)) ^ (1 << rnd.randrange(64))
        rows.append((i, signed(flipped)))  # hamming ≤ 2 from its base
        i += 1
    df = spark.createDataFrame(rows, "media_id long, ahash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in ahash_near_duplicates(df, max_hamming=3).collect()
    }
    # brute force reference
    want = set()
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            d = bin((rows[a][1] ^ rows[b][1]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want.add((rows[a][0], rows[b][0], d))
    assert got == want and len(want) >= 40  # every planted pair found


def test_decode_property_random_filters_and_shapes():
    """Hypothesis-style sweep without fixtures: random pixel content,
    random per-row filter choices, random shapes and color types — decode
    must invert the independent forward filter exactly, every time."""
    rng = np.random.RandomState(123)
    for trial in range(25):
        h = int(rng.randint(1, 9))
        w = int(rng.randint(1, 9))
        color, channels = [(0, 1), (2, 3), (4, 2), (6, 4)][int(rng.randint(4))]
        px = rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8).astype(np.uint8)
        ftypes = rng.randint(0, 5, size=h).tolist()
        payload = _png(w, h, color, channels, _forward_filter(px, ftypes))
        got, gw, gh = decode_png(payload)
        assert (gw, gh) == (w, h)
        if color == 2:
            want = px
        elif color == 6:
            want = px[..., :3]
        elif color == 0:
            want = np.repeat(px, 3, axis=2)
        else:
            want = np.repeat(px[..., :1], 3, axis=2)
        assert np.array_equal(got, want), (trial, h, w, color, ftypes)


def test_incremental_ahash_index(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        build_ahash_index,
        incremental_ahash_duplicates,
    )

    root = str(tmp_path / "ahash_index")

    def hashes(rows):
        return spark.createDataFrame(rows, "media_id long, ahash long")

    base = 0x0123456789ABCDEF
    build_ahash_index(hashes([(1, base), (2, base ^ 0xFFFF0000)]), root)

    # batch A: one near-dup of image 1 (2 bits), one unrelated
    batch_a = hashes([(10, base ^ 0b101), (11, 0x7EDCBA9876543210)])
    m = {
        (r["new_id"], r["matched_id"]): r["hamming"]
        for r in incremental_ahash_duplicates(batch_a, root).collect()
    }
    assert m == {(10, 1): 2}
    # batch B arrives later and matches batch A's image (index was updated)
    batch_b = hashes([(20, base ^ 0b100)])
    m2 = {
        (r["new_id"], r["matched_id"]): r["hamming"]
        for r in incremental_ahash_duplicates(batch_b, root).collect()
    }
    assert (20, 1) in m2 and m2[(20, 1)] == 1
    assert (20, 10) in m2 and m2[(20, 10)] == 1  # sees the PREVIOUS batch
    # no self-matching within the probing batch itself
    assert all(a != b for a, b in m2)


def test_audio_hash_envelope_near_dup(spark):
    import io
    import wave

    import numpy as np
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        ahash_near_duplicates,
        audio_hash,
        with_audio_hash,
    )

    def wav(envelope, sr=8000, dur=1.0):
        t = np.arange(int(sr * dur)) / sr
        x = np.sin(2 * np.pi * 440 * t) * envelope(t)
        pcm = np.clip(np.round(x * 20000), -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes(pcm.tobytes())
        return buf.getvalue()

    rng = np.random.RandomState(5)
    env_a = lambda t: 0.3 + 0.7 * np.abs(np.sin(2 * np.pi * 1.5 * t))  # noqa: E731
    env_b = lambda t: np.where((t * 8).astype(int) % 2 == 0, 1.0, 0.05)  # noqa: E731
    a1 = wav(env_a)
    a2 = wav(lambda t: env_a(t) * 0.8)  # same envelope, quieter → same SHAPE
    b1 = wav(env_b)

    h_a1, h_a2, h_b1 = audio_hash(a1), audio_hash(a2), audio_hash(b1)

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(h_a1, h_a2) <= 3  # volume change barely moves the envelope bits
    assert ham(h_a1, h_b1) > 10  # different material is far away
    assert -(1 << 63) <= h_a1 < (1 << 63)

    # through the distributed path and the shared banded machinery
    rows = [
        (1, "audio", bytearray(a1), (None, None, 8000, None, "audio/wav")),
        (2, "audio", bytearray(a2), (None, None, 8000, None, "audio/wav")),
        (3, "audio", bytearray(b1), (None, None, 8000, None, "audio/wav")),
        (4, "audio", bytearray(b"\x00junk"), (None, None, None, None, "audio/mpeg")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = with_audio_hash(media)
    assert hashes.where(F.col("ahash").isNull()).count() == 1  # the junk row
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ahash_near_duplicates(hashes, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_decode_mutation_fuzz_always_valueerror():
    """Any torn/mutated PNG must raise ValueError (never struct.error or
    zlib.error — those would escape the resize path's per-row guard)."""
    import random

    rng2 = np.random.RandomState(77)
    good = encode_png(rng2.randint(0, 256, size=(6, 6, 3), dtype=np.uint8))
    rnd = random.Random(7)
    raised_other = []
    for _ in range(400):
        data = bytearray(good)
        op = rnd.random()
        if op < 0.45:
            data[rnd.randrange(8, len(data))] ^= rnd.randrange(1, 256)
        elif op < 0.9:
            data = data[: rnd.randrange(9, len(data))]
        else:
            i = rnd.randrange(8, len(data))
            data[i:i] = bytes(rnd.randrange(256) for _ in range(rnd.randrange(1, 6)))
        try:
            decode_png(bytes(data))  # may succeed (benign mutation) — fine
        except ValueError:
            pass
        except Exception as exc:  # noqa: BLE001
            raised_other.append(type(exc).__name__)
    assert not raised_other, set(raised_other)


def test_ppm_decode_mutation_fuzz_always_valueerror():
    """Same tear contract as decode_png: PPM parse failures are always
    ValueError, so the resize path's per-row guard is complete."""
    import random

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
    )

    good = b"P6\n4 2\n255\n" + bytes(range(24))
    rnd = random.Random(3)
    for _ in range(400):
        d = bytearray(good)
        if rnd.random() < 0.5:
            d[rnd.randrange(len(d))] ^= rnd.randrange(1, 256)
        else:
            d = d[: rnd.randrange(2, len(d))]
        try:
            decode_ppm(bytes(d))
        except ValueError:
            pass


def test_png_zip_bomb_and_oversize_quarantine():
    """r8 hardening: (a) an IDAT zip bomb (tiny compressed, GBs claimed)
    must raise ValueError after at most expected+1 inflated bytes; (b) a
    header claiming > 64 Mpx quarantines before any allocation."""
    import struct
    import zlib

    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_png,
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    # (a) 4x4 gray image header, but IDAT inflates to ~50 MB of zeros
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (50 << 20), 9)  # ~50 KB compressed
    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(png)

    # (b) oversized header
    ihdr_big = struct.pack(">IIBBBBB", 65535, 65535, 8, 0, 0, 0, 0)
    png_big = (
        sig
        + chunk(b"IHDR", ihdr_big)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="64 Mpx"):
        decode_png(png_big)


def test_jpeg_oversized_sof_quarantines():
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    import numpy as np
    import struct

    base = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = base.find(b"\xff\xc0")
    # SOF0 segment: marker(2) len(2) prec(1) h(2) w(2)
    struct.pack_into(">HH", base, i + 5, 65535, 65535)
    with pytest.raises(ValueError, match="64 Mpx"):
        decode_jpeg(bytes(base))


def test_png_truncated_zlib_trailer_quarantines():
    """r8 review repro: an IDAT stream cut before its adler32 trailer
    can still inflate to exactly the expected byte count — it must
    STILL raise (torn payload, unverified integrity)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    base = encode_png(np.full((6, 6, 3), 90, dtype=np.uint8))
    # locate the IDAT chunk, strip the zlib stream's last 4 bytes
    i = base.index(b"IDAT") - 4
    (length,) = struct.unpack(">I", base[i : i + 4])
    data = base[i + 8 : i + 8 + length]
    cut = data[:-4]
    new_chunk = (
        struct.pack(">I", len(cut))
        + b"IDAT"
        + cut
        + struct.pack(">I", zlib.crc32(b"IDAT" + cut) & 0xFFFFFFFF)
    )
    torn = base[:i] + new_chunk + base[i + 12 + length :]
    with pytest.raises(ValueError):
        decode_png(torn)
