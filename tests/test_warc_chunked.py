"""Transfer-Encoding: chunked dechunking (r14) — pinned against
CPython http.client's own chunked parser (the third-party artifact:
the stdlib reads the same bytes through a fake socket), plus torn
framing and the chunked+content-coding stack."""

import io
import random

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
    dechunk_http_body,
    decode_http_body,
)


def _chunk(body: bytes, sizes: list[int], ext: bool = False,
           trailers: bool = False) -> bytes:
    out = bytearray()
    p = 0
    for sz in sizes:
        part = body[p : p + sz]
        if not part:
            break
        line = b"%x" % len(part)
        if ext:
            line += b";name=value"
        out += line + b"\r\n" + part + b"\r\n"
        p += sz
    rest = body[p:]
    if rest:
        out += b"%x\r\n" % len(rest) + rest + b"\r\n"
    out += b"0\r\n"
    if trailers:
        out += b"X-Checksum: abc\r\n"
    out += b"\r\n"
    return bytes(out)


def _stdlib_dechunk(raw_body: bytes) -> bytes:
    """CPython's chunked parser over a fake socket."""
    import http.client

    class _Sock:
        def __init__(self, data):
            self._f = io.BytesIO(data)

        def makefile(self, *a, **k):
            return self._f

    head = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n")
    resp = http.client.HTTPResponse(_Sock(head + raw_body))
    resp.begin()
    return resp.read()


@pytest.mark.parametrize("ext,trailers", [
    (False, False), (True, False), (False, True), (True, True),
])
def test_dechunk_pins_against_stdlib_http_client(ext, trailers):
    rnd = random.Random(5)
    for body in (b"", b"x", b"hello world " * 100,
                 bytes(rnd.randrange(256) for _ in range(5000))):
        sizes = [1, 7, 100, 999, 4096]
        raw = _chunk(body, sizes, ext=ext, trailers=trailers)
        ours = dechunk_http_body(raw)
        assert ours == body
        assert ours == _stdlib_dechunk(raw)


def test_chunked_plus_content_codings():
    import zlib

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
        zstd_compress_fixture,
    )

    body = b"a crawl response body " * 50
    for enc, coded in (
        (b"zstd", zstd_compress_fixture(body, "lz")),
        (b"gzip", zlib.compress(body, 9, wbits=31)),
    ):
        blk = (b"HTTP/1.1 200 OK\r\nContent-Encoding: " + enc
               + b"\r\nTransfer-Encoding: chunked\r\n\r\n"
               + _chunk(coded, [13, 64, 1000]))
        status, decoded, e = decode_http_body(blk)
        assert (status, decoded) == (200, body)
        assert e == enc.decode()


def test_torn_and_out_of_scope():
    good = _chunk(b"hello world", [5])
    # torn framings → ValueError only
    for bad in (good[:-4], good[:3], b"zz\r\nhello\r\n0\r\n\r\n",
                b"5\r\nhelloXX0\r\n\r\n", b"5\r\nhel"):
        with pytest.raises(ValueError):
            dechunk_http_body(bad)
    # fuzz: 200 mutations, ValueError only
    rnd = random.Random(9)
    base = _chunk(b"The quick brown fox " * 30, [16, 64, 256])
    for case in range(200):
        data = bytearray(base)
        op = rnd.randrange(3)
        if op == 0:
            data = data[: rnd.randrange(1, len(data))]
        elif op == 1:
            for _ in range(rnd.randrange(1, 4)):
                data[rnd.randrange(len(data))] = rnd.randrange(256)
        else:
            pos = rnd.randrange(len(data))
            data[pos:pos] = bytes(rnd.randrange(256)
                                  for _ in range(rnd.randrange(1, 5)))
        try:
            dechunk_http_body(bytes(data))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"case {case}: {type(exc).__name__}: {exc}")
    # other transfer codings are a named boundary
    blk = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n"
           + good)
    with pytest.raises(ValueError, match="transfer-encoding"):
        decode_http_body(blk)
