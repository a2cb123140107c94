"""Byte-stream compression codec registry (r14 verdict "Next round"
#3) — the swap seam the image/audio decoders already have
(multimodal.register_image_decoder), now for the transport codecs.

Every production byte-stream decode path — archive shards
(operators/archives._decode_shard), compressed tar containers
(iter_archive_members), HTTP content codings (sources/warc.
decode_http_body) — dispatches through ONE injectable table. The
defaults are the from-spec decoders (zstd/xz/lz4/brotli) and the
stdlib bindings (gzip/bz2/deflate); at 100 TB the honest-trade rows
in SCALE.md (pure-Python zstd ~3.5-4.4 MB/s/core on literal-heavy
blocks vs libzstd's hundreds) say a native binding will be wanted —
with this seam that swap is ONE registry call, exactly like swapping
in a libjpeg binding for images.

Snapshot discipline (the multimodal convention): Spark plan builders
take ``dict(CODEC_DECODERS)`` at PLAN-BUILD time and close over the
snapshot, so a driver-side re-registration never changes a running
plan under its feet; plans built after the call use the new decoder.

Contract: every decoder takes the complete payload bytes and returns
the decompressed bytes, raising ValueError — and only ValueError —
on torn/corrupt input (the per-row quarantine path).
"""

from __future__ import annotations

from collections.abc import Callable


def _gzip_decode(payload: bytes) -> bytes:
    import gzip
    import zlib

    try:
        return gzip.decompress(payload)
    except (zlib.error, EOFError, OSError) as exc:
        raise ValueError(f"torn gzip stream: {exc}") from exc


def _bz2_decode(payload: bytes) -> bytes:
    import bz2

    try:
        return bz2.decompress(payload)
    except (OSError, EOFError) as exc:
        raise ValueError(f"torn bzip2 stream: {exc}") from exc


def _deflate_decode(payload: bytes) -> bytes:
    """HTTP 'deflate': zlib wrapper per RFC 9110, but some servers send
    raw deflate under the same token — try both before quarantining."""
    import zlib

    try:
        return zlib.decompress(payload)
    except zlib.error:
        try:
            return zlib.decompress(payload, -zlib.MAX_WBITS)
        except zlib.error as exc:
            raise ValueError(f"torn deflate stream: {exc}") from exc


def _zstd_decode(payload: bytes) -> bytes:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
        zstd_decompress,
    )

    return zstd_decompress(payload)


def _xz_decode(payload: bytes) -> bytes:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xz import (
        xz_decompress,
    )

    return xz_decompress(payload)


def _lz4_decode(payload: bytes) -> bytes:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lz4 import (
        lz4_decompress,
    )

    return lz4_decompress(payload)


def _brotli_decode(payload: bytes) -> bytes:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.brotli import (
        brotli_decompress,
    )

    return brotli_decompress(payload)


def _default_decoders() -> dict[str, Callable[[bytes], bytes]]:
    return {
        "zstd": _zstd_decode,
        "xz": _xz_decode,
        "gzip": _gzip_decode,
        "bz2": _bz2_decode,
        "lz4": _lz4_decode,
        "br": _brotli_decode,
        "deflate": _deflate_decode,
        "plain": lambda payload: payload,
    }


#: the LIVE table — snapshot with dict(CODEC_DECODERS) at plan build
CODEC_DECODERS: dict[str, Callable[[bytes], bytes]] = _default_decoders()


def register_codec_decoder(name: str, fn: Callable[[bytes], bytes]) -> None:
    """Swap the decoder for a stream codec (e.g. a libzstd binding at
    scale). Plans built AFTER the call use ``fn``; plans built before
    keep the decoder set they closed over."""
    if name not in _default_decoders():
        raise ValueError(
            f"unknown stream codec {name!r} (no route dispatches to it)"
        )
    CODEC_DECODERS[name] = fn


def reset_codec_decoders() -> None:
    """Restore the from-spec/stdlib decoders for every codec."""
    CODEC_DECODERS.clear()
    CODEC_DECODERS.update(_default_decoders())


def decode_stream(
    payload: bytes,
    codec: str,
    decoders: dict[str, Callable[[bytes], bytes]] | None = None,
) -> bytes:
    """Dispatch one decode through ``decoders`` (a plan-time snapshot)
    or the live registry. Unknown codec → ValueError (quarantine)."""
    table = CODEC_DECODERS if decoders is None else decoders
    fn = table.get(codec)
    if fn is None:
        raise ValueError(f"stream codec {codec!r} out of range")
    return fn(payload)
