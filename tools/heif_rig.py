"""Development rig: encode/decode HEIC with the system libheif via
ctypes — the third-party ground truth for operators/heif.py (the
VP8/libwebp playbook). libheif carries its own x265 encode plugin and
libde265 decode plugin, so an encode→decode roundtrip through it is a
fully independent artifact source. Enum values below are from the
public libheif heif.h and are verified empirically by the roundtrip
tests (the enum-permutation gotcha from the libwebp rig).
"""

from __future__ import annotations

import ctypes
import glob

import numpy as np

COLORSPACE_YCBCR = 0
CHROMA_420 = 1
CHANNEL_Y, CHANNEL_CB, CHANNEL_CR = 0, 1, 2
COMPRESSION_HEVC = 1
COMPRESSION_AV1 = 4


class HeifError(ctypes.Structure):
    _fields_ = [
        ("code", ctypes.c_int),
        ("subcode", ctypes.c_int),
        ("message", ctypes.c_char_p),
    ]


# NOTE: heif_context_write's heif_writer callback returns heif_error
# BY VALUE, which ctypes callbacks cannot do — the rig writes through
# heif_context_write_to_file instead (same output bytes).


def heif_lib():
    hits = glob.glob("/usr/lib/*/libheif.so*") + glob.glob(
        "/usr/lib/libheif.so*"
    )
    if not hits:
        return None
    lib = ctypes.CDLL(hits[0])
    lib.heif_context_alloc.restype = ctypes.c_void_p
    lib.heif_context_free.argtypes = [ctypes.c_void_p]
    lib.heif_context_read_from_memory_without_copy.restype = HeifError
    lib.heif_context_read_from_memory_without_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p
    ]
    lib.heif_context_get_primary_image_handle.restype = HeifError
    lib.heif_context_get_primary_image_handle.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)
    ]
    lib.heif_decode_image.restype = HeifError
    lib.heif_decode_image.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
    ]
    lib.heif_image_get_plane_readonly.restype = ctypes.POINTER(
        ctypes.c_ubyte
    )
    lib.heif_image_get_plane_readonly.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)
    ]
    lib.heif_image_get_width.restype = ctypes.c_int
    lib.heif_image_get_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.heif_image_get_height.restype = ctypes.c_int
    lib.heif_image_get_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.heif_image_handle_release.argtypes = [ctypes.c_void_p]
    lib.heif_image_release.argtypes = [ctypes.c_void_p]
    lib.heif_context_get_encoder_for_format.restype = HeifError
    lib.heif_context_get_encoder_for_format.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)
    ]
    lib.heif_encoder_set_lossy_quality.restype = HeifError
    lib.heif_encoder_set_lossy_quality.argtypes = [
        ctypes.c_void_p, ctypes.c_int
    ]
    lib.heif_encoder_release.argtypes = [ctypes.c_void_p]
    lib.heif_image_create.restype = HeifError
    lib.heif_image_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.heif_image_add_plane.restype = HeifError
    lib.heif_image_add_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.heif_image_get_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)
    ]
    lib.heif_context_encode_image.restype = HeifError
    lib.heif_context_encode_image.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.heif_context_write_to_file.restype = HeifError
    lib.heif_context_write_to_file.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p
    ]
    return lib


def _ck(err: HeifError, what: str):
    if err.code != 0:
        msg = err.message.decode("latin1") if err.message else ""
        raise RuntimeError(f"libheif {what}: code {err.code} {msg}")


def encode_heic(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                quality: int = 75, compression: int = COMPRESSION_HEVC,
                ) -> bytes:
    """Encode 4:2:0 planes to a real HEIC (or AVIF with
    compression=COMPRESSION_AV1) file via libheif's own x265/libaom
    plugins — fully third-party artifacts."""
    lib = heif_lib()
    if lib is None:
        raise RuntimeError("no system libheif")
    h, w = y.shape
    ctx = lib.heif_context_alloc()
    enc = ctypes.c_void_p()
    _ck(lib.heif_context_get_encoder_for_format(
        ctx, compression, ctypes.byref(enc)), "get_encoder")
    _ck(lib.heif_encoder_set_lossy_quality(enc, quality), "set_quality")
    img = ctypes.c_void_p()
    _ck(lib.heif_image_create(w, h, COLORSPACE_YCBCR, CHROMA_420,
                              ctypes.byref(img)), "image_create")
    for ch, plane in ((CHANNEL_Y, y), (CHANNEL_CB, u), (CHANNEL_CR, v)):
        ph, pw = plane.shape
        _ck(lib.heif_image_add_plane(img, ch, pw, ph, 8), "add_plane")
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane(img, ch, ctypes.byref(stride))
        src = np.ascontiguousarray(plane, dtype=np.uint8)
        for row in range(ph):
            ctypes.memmove(
                ctypes.addressof(ptr.contents) + row * stride.value,
                src[row].ctypes.data, pw,
            )
    handle = ctypes.c_void_p()
    _ck(lib.heif_context_encode_image(ctx, img, enc, None,
                                      ctypes.byref(handle)), "encode")
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".heic")
    os.close(fd)
    try:
        _ck(lib.heif_context_write_to_file(ctx, path.encode()), "write")
        with open(path, "rb") as f:
            out = f.read()
    finally:
        os.unlink(path)
    lib.heif_image_handle_release(handle)
    lib.heif_image_release(img)
    lib.heif_encoder_release(enc)
    lib.heif_context_free(ctx)
    return out


def decode_heic_rgb(payload: bytes) -> np.ndarray:
    """Ground-truth decode: primary item → uint8 [h,w,3] RGB via
    libheif. This is libheif's NATIVE output path (decode +
    BT.601-full-range conversion, nearest-neighbor chroma upsample —
    empirically identical to ITU-T T.871, the repo's canonical
    conversion), so the pixel-exact pin runs here. The YCbCr output
    path below is NOT pinnable: libheif converts YCbCr→RGB→YCbCr
    internally, which is lossy (maxdiff ~23 observed even on
    lossless streams)."""
    lib = heif_lib()
    if lib is None:
        raise RuntimeError("no system libheif")
    ctx = lib.heif_context_alloc()
    buf = ctypes.create_string_buffer(payload, len(payload))
    _ck(lib.heif_context_read_from_memory_without_copy(
        ctx, buf, len(payload), None), "read")
    handle = ctypes.c_void_p()
    _ck(lib.heif_context_get_primary_image_handle(
        ctx, ctypes.byref(handle)), "primary_handle")
    img = ctypes.c_void_p()
    _ck(lib.heif_decode_image(handle, ctypes.byref(img),
                              1, 10, None), "decode")  # RGB interleaved
    w = lib.heif_image_get_width(img, 10)
    h = lib.heif_image_get_height(img, 10)
    stride = ctypes.c_int()
    ptr = lib.heif_image_get_plane_readonly(img, 10, ctypes.byref(stride))
    raw = ctypes.string_at(ptr, stride.value * h)
    rgb = (
        np.frombuffer(raw, dtype=np.uint8)
        .reshape(h, stride.value)[:, :w * 3]
        .reshape(h, w, 3)
        .copy()
    )
    lib.heif_image_release(img)
    lib.heif_image_handle_release(handle)
    lib.heif_context_free(ctx)
    return rgb


def decode_heic_yuv(payload: bytes):
    """libheif decode to YCbCr planes — dims/structure checks only;
    see decode_heic_rgb for why this path is not pixel-pinnable."""
    lib = heif_lib()
    if lib is None:
        raise RuntimeError("no system libheif")
    ctx = lib.heif_context_alloc()
    buf = ctypes.create_string_buffer(payload, len(payload))
    _ck(lib.heif_context_read_from_memory_without_copy(
        ctx, buf, len(payload), None), "read")
    handle = ctypes.c_void_p()
    _ck(lib.heif_context_get_primary_image_handle(
        ctx, ctypes.byref(handle)), "primary_handle")
    img = ctypes.c_void_p()
    _ck(lib.heif_decode_image(handle, ctypes.byref(img),
                              COLORSPACE_YCBCR, CHROMA_420, None), "decode")
    planes = []
    for ch in (CHANNEL_Y, CHANNEL_CB, CHANNEL_CR):
        w = lib.heif_image_get_width(img, ch)
        h = lib.heif_image_get_height(img, ch)
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane_readonly(img, ch,
                                                ctypes.byref(stride))
        raw = ctypes.string_at(ptr, stride.value * h)
        planes.append(
            np.frombuffer(raw, dtype=np.uint8)
            .reshape(h, stride.value)[:, :w].copy()
        )
    lib.heif_image_release(img)
    lib.heif_image_handle_release(handle)
    lib.heif_context_free(ctx)
    return tuple(planes)
