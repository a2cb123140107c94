"""ctypes rig over the system libzstd — the third-party ground truth
for operators/zstd.py (the liblz4/libbrotli playbook): ZSTD_compress2
with advanced parameters produces the pin streams, ZSTD_decompress
adjudicates our store-mode encoder's frames.

Gotchas (memory: host-codec-libs-ground-truth): argtypes are set for
every bound symbol before the first call — size_t defaults would
truncate pointers and segfault.
"""

from __future__ import annotations

import ctypes
import glob

# public stable advanced-parameter enum values (zstd.h)
ZSTD_c_compressionLevel = 100
ZSTD_c_windowLog = 101
ZSTD_c_contentSizeFlag = 200
ZSTD_c_checksumFlag = 201

_LIB = None
_MISSING = False


def zstd_lib():
    global _LIB, _MISSING
    if _LIB is not None or _MISSING:
        return _LIB
    hits = (
        glob.glob("/usr/lib/*/libzstd.so*")
        + glob.glob("/usr/lib/libzstd.so*")
        + glob.glob("/lib/*/libzstd.so*")
    )
    if not hits:
        _MISSING = True
        return None
    lib = ctypes.CDLL(sorted(hits)[0])
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
    lib.ZSTD_getErrorName.restype = ctypes.c_char_p
    lib.ZSTD_getErrorName.argtypes = [ctypes.c_size_t]
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_freeCCtx.restype = ctypes.c_size_t
    lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
    lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
    lib.ZSTD_CCtx_setParameter.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    lib.ZSTD_compress2.restype = ctypes.c_size_t
    lib.ZSTD_compress2.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
    ]
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
    ]
    _LIB = lib
    return lib


def ref_compress(data: bytes, level: int = 3, checksum: bool = False,
                 window_log: int = 0, content_size: bool = True) -> bytes:
    """Real libzstd frame via ZSTD_compress2 (advanced API so checksum
    / window-log / content-size knobs are exercised)."""
    lib = zstd_lib()
    cctx = lib.ZSTD_createCCtx()
    if not cctx:
        raise RuntimeError("ZSTD_createCCtx failed")
    try:
        for param, val in (
            (ZSTD_c_compressionLevel, level),
            (ZSTD_c_checksumFlag, 1 if checksum else 0),
            (ZSTD_c_contentSizeFlag, 1 if content_size else 0),
            (ZSTD_c_windowLog, window_log),
        ):
            rc = lib.ZSTD_CCtx_setParameter(cctx, param, val)
            if lib.ZSTD_isError(rc):
                raise RuntimeError(
                    f"setParameter({param},{val}): "
                    f"{lib.ZSTD_getErrorName(rc).decode()}"
                )
        cap = lib.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(cap)
        n = lib.ZSTD_compress2(cctx, dst, cap, data, len(data))
        if lib.ZSTD_isError(n):
            raise RuntimeError(
                f"ZSTD_compress2: {lib.ZSTD_getErrorName(n).decode()}"
            )
        return dst.raw[:n]
    finally:
        lib.ZSTD_freeCCtx(cctx)


def ref_decompress(data: bytes, cap: int | None = None) -> bytes:
    lib = zstd_lib()
    if cap is None:
        cap = max(1, len(data) * 64, 1 << 20)
    dst = ctypes.create_string_buffer(cap)
    n = lib.ZSTD_decompress(dst, cap, data, len(data))
    if lib.ZSTD_isError(n):
        raise RuntimeError(
            f"ZSTD_decompress: {lib.ZSTD_getErrorName(n).decode()}"
        )
    return dst.raw[:n]


def train_dict(samples: list[bytes], dict_size: int = 4096) -> bytes:
    """ZDICT_trainFromBuffer over concatenated samples."""
    lib = zstd_lib()
    lib.ZDICT_trainFromBuffer.restype = ctypes.c_size_t
    lib.ZDICT_trainFromBuffer.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_uint,
    ]
    lib.ZDICT_isError.restype = ctypes.c_uint
    lib.ZDICT_isError.argtypes = [ctypes.c_size_t]
    blob = b"".join(samples)
    sizes = (ctypes.c_size_t * len(samples))(*[len(s) for s in samples])
    dst = ctypes.create_string_buffer(dict_size)
    n = lib.ZDICT_trainFromBuffer(dst, dict_size, blob, sizes, len(samples))
    if lib.ZDICT_isError(n):
        raise RuntimeError(f"ZDICT_trainFromBuffer failed: code {n}")
    return dst.raw[:n]


def ref_compress_dict(data: bytes, dictionary: bytes, level: int = 3) -> bytes:
    """ZSTD_compress_usingDict (writes the dictionary ID into the
    frame header for structured dictionaries)."""
    lib = zstd_lib()
    lib.ZSTD_compress_usingDict.restype = ctypes.c_size_t
    lib.ZSTD_compress_usingDict.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
    ]
    cctx = lib.ZSTD_createCCtx()
    try:
        cap = lib.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(cap)
        n = lib.ZSTD_compress_usingDict(
            cctx, dst, cap, data, len(data), dictionary, len(dictionary),
            level,
        )
        if lib.ZSTD_isError(n):
            raise RuntimeError(
                f"compress_usingDict: {lib.ZSTD_getErrorName(n).decode()}"
            )
        return dst.raw[:n]
    finally:
        lib.ZSTD_freeCCtx(cctx)
