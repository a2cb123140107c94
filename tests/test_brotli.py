"""Brotli decoder (operators/brotli.py): REAL libbrotlienc streams at
every quality and several windows decode byte-identical; our fixture
encoder's streams decode byte-identical in the REAL libbrotlidec (both
directions, the G4/HEVC/LZ4 discipline); the RFC data tables are
extraction-cross-checked against libbrotlicommon's exports; tears."""

from __future__ import annotations

import ctypes
import glob
import hashlib
import random

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.brotli import (
    brotli_compress_fixture,
    brotli_decompress,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.brotli_data import (
    DICTIONARY_SHA256,
    TRANSFORMS,
    context_lut,
    static_dictionary,
)


def _lib(name):
    hits = glob.glob(f"/usr/lib/*/lib{name}.so*")
    if not hits:
        pytest.skip(f"no system lib{name} (visible host gap)")
    return ctypes.CDLL(hits[0])


def _ref_compress(data, quality=9, lgwin=22, mode=0):
    enc = _lib("brotlienc")
    enc.BrotliEncoderCompress.restype = ctypes.c_int
    enc.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]
    out_sz = ctypes.c_size_t(len(data) + 1024)
    buf = ctypes.create_string_buffer(out_sz.value)
    assert enc.BrotliEncoderCompress(
        quality, lgwin, mode, len(data), data, ctypes.byref(out_sz), buf
    ) == 1
    return buf.raw[:out_sz.value]


def _ref_decompress(data, hint=1 << 22):
    dec = _lib("brotlidec")
    dec.BrotliDecoderDecompress.restype = ctypes.c_int
    dec.BrotliDecoderDecompress.argtypes = [
        ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]
    out_sz = ctypes.c_size_t(hint)
    buf = ctypes.create_string_buffer(out_sz.value)
    assert dec.BrotliDecoderDecompress(
        len(data), data, ctypes.byref(out_sz), buf
    ) == 1
    return buf.raw[:out_sz.value]


def _cases():
    rnd = random.Random(11)
    with open("/root/testdata/sf0.001/documents.parquet", "rb") as f:
        real = f.read()[:80000]
    text = (b"The quick brown fox jumps over the lazy dog. " * 200
            + "Unicode: éü中文 text. ".encode() * 50)
    return {
        "empty": b"",
        "one": b"x",
        "text": text,
        "html": (b"<html><head><title>Example</title></head><body>"
                 + b"<p>hello world of the data</p>" * 300
                 + b"</body></html>"),
        "random": bytes(rnd.randrange(256) for _ in range(20000)),
        "repeat": b"abcabcabc" * 5000,
        "parquet": real,
        "json": b'{"key": "value", "n": 123, "arr": [1,2,3]}' * 800,
    }


def test_real_libbrotli_streams_decode_byte_identical():
    """EVERY encoder quality 0..11 x windows 18/22/24 x 8 corpora —
    incl. dictionary+transform-heavy text — decodes byte-identical."""
    for q in range(12):
        for lgwin in (18, 22, 24):
            for name, data in _cases().items():
                comp = _ref_compress(data, q, lgwin)
                assert brotli_decompress(comp) == data, (q, lgwin, name)


def test_fixture_encoder_decodes_in_real_libbrotlidec():
    rnd = random.Random(5)
    cases = [b"", b"x", b"hello world" * 100, bytes(range(256)) * 300,
             bytes(rnd.randrange(256) for _ in range(200000))]
    for mode in ("uncompressed", "literals"):
        for data in cases:
            st = brotli_compress_fixture(data, mode)
            assert brotli_decompress(st) == data, (mode, len(data))
            assert _ref_decompress(st) == data, (mode, len(data))


def test_spec_tables_match_libbrotlicommon_exports():
    """The embedded RFC tables (Appendix A dictionary, Appendix B
    transforms, §7.1 context lut) are byte-identical to the system
    libbrotlicommon's exports — the libde265-rodata discipline."""
    com = _lib("brotlicommon")

    class BD(ctypes.Structure):
        _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                    ("offsets_by_length", ctypes.c_uint32 * 32),
                    ("data_size", ctypes.c_size_t),
                    ("data", ctypes.POINTER(ctypes.c_uint8))]

    com.BrotliGetDictionary.restype = ctypes.POINTER(BD)
    d = com.BrotliGetDictionary().contents
    blob = ctypes.string_at(d.data, d.data_size)
    ours = static_dictionary()
    assert ours == blob
    assert hashlib.sha256(ours).hexdigest() == DICTIONARY_SHA256

    tbl = ctypes.string_at(
        ctypes.addressof(
            ctypes.c_uint8.in_dll(com, "_kBrotliContextLookupTable")
        ),
        2048,
    )
    assert context_lut() == tbl

    class BT(ctypes.Structure):
        _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                    ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                    ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                    ("num_transforms", ctypes.c_uint32),
                    ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                    ("params", ctypes.POINTER(ctypes.c_uint8)),
                    ("cutOffTransforms", ctypes.c_int16 * 10)]

    com.BrotliGetTransforms.restype = ctypes.POINTER(BT)
    t = com.BrotliGetTransforms().contents
    assert t.num_transforms == len(TRANSFORMS) == 121
    ps = ctypes.string_at(t.prefix_suffix, t.prefix_suffix_size)
    trip = ctypes.string_at(t.transforms, 121 * 3)
    for i in range(121):
        def s_at(idx):
            off = t.prefix_suffix_map[idx]
            return ps[off + 1:off + 1 + ps[off]].decode("latin1")
        assert TRANSFORMS[i] == (
            s_at(trip[3 * i]), trip[3 * i + 1], s_at(trip[3 * i + 2])
        ), i


def test_tear_fuzz_valueerror_only():
    base = _ref_compress(b"the quick brown fox " * 300, 9, 22)
    rnd = random.Random(29)
    for case in range(300):
        data = bytearray(base)
        op = rnd.randrange(3)
        if op == 0:
            data = data[:rnd.randrange(1, len(data))]
        elif op == 1:
            for _ in range(rnd.randrange(1, 4)):
                data[rnd.randrange(len(data))] ^= 1 << rnd.randrange(8)
        else:
            pos = rnd.randrange(len(data))
            data[pos:pos] = bytes(rnd.randrange(256)
                                  for _ in range(rnd.randrange(1, 9)))
        try:
            brotli_decompress(bytes(data), max_size=1 << 24)
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"case {case}: non-ValueError tear "
                f"{type(exc).__name__}: {exc}"
            )


def test_size_bound_and_large_window_boundary():
    comp = _ref_compress(b"a" * 100000, 5, 22)
    with pytest.raises(ValueError, match="size bound"):
        brotli_decompress(comp, max_size=1000)


def test_warc_record_with_brotli_body_end_to_end():
    """A WARC response record whose HTTP body is Content-Encoding: br
    decodes through the crawl chain (warc parse -> decode_http_body ->
    brotli) to the original page bytes."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
        build_warc,
        decode_http_body,
        parse_warc_records,
    )

    page = b"<html><body>" + b"<p>of the and in a to</p>" * 200 + b"</body></html>"
    coded = brotli_compress_fixture(page, "literals")
    block = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
             b"Content-Encoding: br\r\n\r\n" + coded)
    warc = build_warc([{
        "warc_type": "response",
        "target_uri": "http://example.com/",
        "warc_date": "2024-01-01T00:00:00Z",
        "record_id": "<urn:uuid:r13-br-1>",
        "content_type": "application/http; msgtype=response",
        "block": block,
    }])
    recs = parse_warc_records(warc)
    assert len(recs) == 1
    status, body, enc = decode_http_body(recs[0]["block"])
    assert (status, enc) == (200, "br")
    assert body == page
