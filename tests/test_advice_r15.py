"""Regression tests pinning the four r14 ADVICE findings (r15).

1. (low) dechunk_http_body accepted negative hex chunk sizes —
   int(b'-2', 16) parses, the slice was empty, and the trailing-CRLF
   check coincidentally matched, so corrupt framing was silently
   skipped. Now raises the quarantine ValueError like http.client.
2. (low) probe_zstd read header bytes unguarded — truncation right
   after the magic raised IndexError (breaking the ValueError-only
   contract) and a truncated frame-content-size field silently parsed
   as 0. Now every header read is bounds-checked.
3. (low) the inlined LZMA hot loop carried a dead `end_` local — the
   chunk boundary is enforced by lzma2_decompress's post-chunk
   position check (documented in place); a chunk header that LIES
   about its packed size raises the contract ValueError.
4. (low) raw (btype 0) zstd blocks were not validated against the
   128 KiB Block_Maximum_Size — the decoder accepted streams the
   spec (and libzstd) reject. Now capped like the RLE branch.
"""

import struct

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xz import (
    lzma2_decompress,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
    probe_zstd,
    zstd_compress_fixture,
    zstd_decompress,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
    dechunk_http_body,
)


# --- 1. negative chunked sizes -------------------------------------------------


def test_negative_chunk_size_raises():
    # the exact shape from the finding: '-2\r\n' then the terminator
    body = b"-2\r\n0\r\n\r\n"
    with pytest.raises(ValueError, match="negative chunk size"):
        dechunk_http_body(body)


def test_negative_chunk_size_matches_http_client():
    # http.client rejects negative sizes too — pin the divergence closed
    import http.client
    import io

    body = b"-2\r\n0\r\n\r\n"

    class _Sock:
        def __init__(self, data):
            self._f = io.BytesIO(data)

        def makefile(self, *_a, **_k):
            return self._f

    resp = http.client.HTTPResponse(_Sock(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body
    ))
    resp.begin()
    with pytest.raises(Exception):  # http.client raises IncompleteRead
        resp.read()


def test_valid_chunked_still_parses():
    body = b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n"
    assert dechunk_http_body(body) == b"Wikipedia"


# --- 2. probe_zstd header bounds ------------------------------------------------

_MAGIC = b"\x28\xb5\x2f\xfd"


def test_probe_zstd_truncated_after_magic():
    with pytest.raises(ValueError, match="torn zstd frame header"):
        probe_zstd(_MAGIC)


def test_probe_zstd_truncated_fcs_field():
    # fhd 0xE0: single-segment, 8-byte fcs — but supply only 3 fcs bytes;
    # previously int.from_bytes on the short slice silently parsed
    fhd = bytes([0xE0])
    with pytest.raises(ValueError, match="torn zstd frame header"):
        probe_zstd(_MAGIC + fhd + b"\x01\x02\x03")


def test_probe_zstd_truncated_window_descriptor():
    # fhd 0x00: not single-segment, so a window descriptor byte must follow
    with pytest.raises(ValueError, match="torn zstd frame header"):
        probe_zstd(_MAGIC + bytes([0x00]))


def test_probe_zstd_valid_frame_still_probes():
    frame = zstd_compress_fixture(b"hello zstd probe" * 10, "lz")
    info = probe_zstd(frame)
    assert info["n_frames"] == 1
    assert info["frames"][0]["kind"] == "zstd"


# --- 3. LZMA2 packed-size boundary ----------------------------------------------


def test_lzma2_lying_packed_size_raises():
    import lzma

    data = b"the quick brown fox jumps over the lazy dog " * 200
    raw = bytearray(lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
    ))
    # chunk layout: ctrl(1) unpacked-1(2 BE) packed-1(2 BE) props(1) —
    # declare a packed size 10 bytes short; the decoder must convert the
    # bounded garbage work to the contract ValueError, never wrong bytes
    packed = ((raw[3] << 8) | raw[4]) + 1
    lie = packed - 10
    raw[3] = (lie - 1) >> 8
    raw[4] = (lie - 1) & 0xFF
    with pytest.raises(ValueError):
        lzma2_decompress(bytes(raw))


def test_lzma2_torn_chunk_body_raises():
    import lzma

    data = b"abcd" * 500
    raw = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    with pytest.raises(ValueError):
        lzma2_decompress(raw[: len(raw) // 2])


# --- 4. zstd raw-block cap -------------------------------------------------------


def test_zstd_oversized_raw_block_rejected():
    # a fully-present raw block of 128 KiB + 1: spec-illegal
    # (Block_Maximum_Size), libzstd rejects it, we previously accepted
    bsize = (1 << 17) + 1
    fhd = bytes([0xE0])  # single-segment, 8-byte fcs
    fcs = struct.pack("<Q", bsize)
    bh = 1 | (0 << 1) | (bsize << 3)  # last=1, btype=raw
    frame = _MAGIC + fhd + fcs + bh.to_bytes(3, "little") + b"x" * bsize
    with pytest.raises(ValueError, match="block cap"):
        zstd_decompress(frame)


def test_zstd_max_legal_raw_block_accepted():
    bsize = 1 << 17
    fhd = bytes([0xE0])
    fcs = struct.pack("<Q", bsize)
    bh = 1 | (bsize << 3)
    payload = b"y" * bsize
    frame = _MAGIC + fhd + fcs + bh.to_bytes(3, "little") + payload
    assert zstd_decompress(frame) == payload
