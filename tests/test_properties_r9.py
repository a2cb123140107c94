"""Hypothesis property tests for the round-9 codec surface — pure
Python, no Spark session, so example counts can be GENEROUS (the
round-8 lesson: a 1.4%-of-inputs LZW boundary bug escaped a 40-example
suite; these run 300+ examples per property in a few seconds).

Roundtrip identity for QOI / TIFF / TGA / AIFF, companding fixed-point
idempotence for G.711, and PackBits/extended-float inverses.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

SETTINGS = dict(max_examples=300, deadline=None, derandomize=True)

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _pixels(draw, h, w, channels, palette_like=False):
    n = h * w * channels
    if palette_like:
        vals = draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
        arr = (np.array(vals, dtype=np.uint8) * 60).reshape(
            (h, w, channels) if channels > 1 else (h, w)
        )
    else:
        vals = draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
        arr = np.array(vals, dtype=np.uint8).reshape(
            (h, w, channels) if channels > 1 else (h, w)
        )
    return arr


@settings(**SETTINGS)
@given(st.data())
def test_qoi_roundtrip_property(data):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.qoi import (
        decode_qoi,
        encode_qoi,
    )

    h, w = data.draw(_dims)
    channels = data.draw(st.sampled_from([3, 4]))
    # mix run-heavy (palette-like) and noise content: both chunk regimes
    px = _pixels(data.draw, h, w, 3, palette_like=data.draw(st.booleans()))
    dec, dw, dh = decode_qoi(encode_qoi(px, channels=channels))
    assert (dw, dh) == (w, h)
    assert np.array_equal(dec, px)


@settings(**SETTINGS)
@given(st.data())
def test_tiff_roundtrip_property(data):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
        encode_tiff,
    )

    h, w = data.draw(_dims)
    bo = data.draw(st.sampled_from(["<", ">"]))
    pb = data.draw(st.booleans())
    rps = data.draw(st.sampled_from([None, 1, 3]))
    mode = data.draw(st.sampled_from(["rgb", "gray0", "gray1", "pal"]))
    if mode == "rgb":
        px = _pixels(data.draw, h, w, 3, palette_like=pb)
        want = px
        blob = encode_tiff(px, byte_order=bo, packbits=pb, rows_per_strip=rps)
    elif mode == "pal":
        pal = np.arange(768, dtype=np.uint32).astype(np.uint8).reshape(256, 3)
        idx = _pixels(data.draw, h, w, 1, palette_like=True)
        want = pal[idx]
        blob = encode_tiff(
            idx, byte_order=bo, packbits=pb, rows_per_strip=rps, palette=pal
        )
    else:
        g = _pixels(data.draw, h, w, 1, palette_like=pb)
        want = np.repeat(g[:, :, None], 3, axis=2)
        blob = encode_tiff(
            g,
            byte_order=bo,
            packbits=pb,
            rows_per_strip=rps,
            photometric=int(mode[-1]),
        )
    dec, dw, dh = decode_tiff(blob)
    assert (dw, dh) == (w, h)
    assert np.array_equal(dec, want)


@settings(**SETTINGS)
@given(st.data())
def test_tga_roundtrip_property(data):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tga import (
        decode_tga,
        encode_tga,
    )

    h, w = data.draw(_dims)
    rle = data.draw(st.booleans())
    td = data.draw(st.booleans())
    gray = data.draw(st.booleans())
    if gray:
        g = _pixels(data.draw, h, w, 1, palette_like=data.draw(st.booleans()))
        want = np.repeat(g[:, :, None], 3, axis=2)
        blob = encode_tga(g, rle=rle, top_down=td)
    else:
        px = _pixels(data.draw, h, w, 3, palette_like=data.draw(st.booleans()))
        want = px
        blob = encode_tga(px, rle=rle, top_down=td)
    dec, dw, dh = decode_tga(blob)
    assert (dw, dh) == (w, h)
    assert np.array_equal(dec, want)


@settings(**SETTINGS)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=400))
def test_g711_fixed_point_idempotence(samples):
    """encode∘decode is the identity on the code space, so ONE
    encode-decode roundtrip reaches a fixed point: re-encoding the
    decoded signal reproduces the code stream byte-for-byte (both
    laws), and re-decoding changes nothing."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
        alaw_to_linear16,
        linear16_to_alaw,
        linear16_to_ulaw,
        ulaw_to_linear16,
    )

    x = np.array(samples, dtype=np.int16)
    for enc, dec in (
        (linear16_to_ulaw, ulaw_to_linear16),
        (linear16_to_alaw, alaw_to_linear16),
    ):
        c1 = enc(x)
        y = dec(c1)
        c2 = enc(y)
        assert np.array_equal(c1, c2)
        assert np.array_equal(dec(c2), y)


@settings(**SETTINGS)
@given(
    st.lists(st.integers(-32768, 32767), min_size=2, max_size=300),
    st.sampled_from([8000, 16000, 22050, 44100]),
    st.booleans(),
    st.sampled_from([1, 2]),
)
def test_aiff_roundtrip_property(samples, rate, sowt, channels):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.aiff import (
        encode_aiff,
        parse_aiff,
    )

    x = np.array(samples, dtype=np.int16)
    x = x[: (len(x) // channels) * channels]
    if len(x) < channels:
        return
    mono, sr, ch = parse_aiff(
        encode_aiff(x, rate, channels=channels, aifc_sowt=sowt)
    )
    assert (sr, ch) == (rate, channels)
    want = x.astype(np.float64) / 32768.0
    if channels > 1:
        want = want.reshape(-1, channels).mean(axis=1)
    assert np.allclose(mono, want)


@settings(**SETTINGS)
@given(st.binary(min_size=0, max_size=600))
def test_packbits_roundtrip_property(row):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        packbits_decode,
        packbits_encode,
    )

    assert packbits_decode(packbits_encode(row), len(row)) == row


@settings(**SETTINGS)
@given(st.integers(1, 1 << 20))
def test_extended80_integer_rates_exact(rate):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.aiff import (
        _decode_extended80,
        encode_extended80,
    )

    assert _decode_extended80(encode_extended80(float(rate))) == float(rate)
