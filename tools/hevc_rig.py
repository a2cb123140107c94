"""Development rig: encode intra frames with the system libx265 and
decode them with the system libde265, both via ctypes — the ground
truth pair for the from-spec HEVC intra decoder. Used by
tests/test_hevc_decode.py; kept in tools/ so debugging scripts can
import it too."""

from __future__ import annotations

import ctypes
import glob
import struct

import numpy as np


class X265Nal(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_uint32),
        ("sizeBytes", ctypes.c_uint32),
        ("payload", ctypes.POINTER(ctypes.c_ubyte)),
    ]


def x265_lib():
    hits = glob.glob("/usr/lib/*/libx265.so*") + glob.glob("/usr/lib/libx265.so*")
    if not hits:
        return None
    lib = ctypes.CDLL(hits[0])
    if not hasattr(lib, "x265_encoder_open_199"):
        return None
    lib.x265_param_alloc.restype = ctypes.c_void_p
    lib.x265_param_default.argtypes = [ctypes.c_void_p]
    lib.x265_param_parse.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p
    ]
    lib.x265_param_parse.restype = ctypes.c_int
    lib.x265_encoder_open_199.restype = ctypes.c_void_p
    lib.x265_encoder_open_199.argtypes = [ctypes.c_void_p]
    lib.x265_encoder_close.argtypes = [ctypes.c_void_p]
    lib.x265_param_free.argtypes = [ctypes.c_void_p]
    lib.x265_picture_alloc.restype = ctypes.c_void_p
    lib.x265_picture_init.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.x265_picture_free.argtypes = [ctypes.c_void_p]
    lib.x265_encoder_encode.restype = ctypes.c_int
    lib.x265_encoder_encode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(X265Nal)),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    return lib


# x265_picture field offsets for X265_BUILD 199 (x265 3.5), confirmed
# by probing x265_picture_init output: pts/dts/userData (0/8/16),
# planes[3] (24/32/40), stride[3] (48/52/56), bitDepth==8 at 60,
# sliceType at 64, poc at 68, colorSpace==1 (I420) at 72.
_OFF_PLANES = 24
_OFF_STRIDE = 48


def encode_intra(
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    qp: int = 30,
    extra: dict | None = None,
) -> bytes:
    """Encode 4:2:0 frames (y, u, v uint8 arrays) as an all-intra
    Annex-B stream with x265's DEFAULT in-loop toolset (deblocking +
    SAO + sign hiding all ON — in scope since r12's second wave); only
    structural knobs are pinned: all-intra, single frame thread, no
    WPP, aq-mode 0 (cu_qp_delta is the remaining named boundary).
    Returns the full bitstream (headers before the first IDR)."""
    lib = x265_lib()
    if lib is None:
        raise RuntimeError("no system libx265")
    h, w = frames[0][0].shape
    p = lib.x265_param_alloc()
    lib.x265_param_default(p)
    opts = {
        b"input-res": f"{w}x{h}".encode(),
        b"fps": b"25",
        b"log-level": b"none",
        b"keyint": b"1",
        b"bframes": b"0",
        b"frame-threads": b"1",
        b"no-wpp": None,
        b"aq-mode": b"0",
        b"qp": str(qp).encode(),
        b"repeat-headers": None,
        b"no-info": None,
    }
    for k, v in (extra or {}).items():
        kk = k if isinstance(k, bytes) else k.encode()
        if v is False:  # remove a default knob (e.g. swap qp for crf)
            opts.pop(kk, None)
            continue
        opts[kk] = v if (v is None or isinstance(v, bytes)) else str(v).encode()
    for k, v in opts.items():
        r = lib.x265_param_parse(p, k, v)
        if r != 0:
            raise RuntimeError(f"x265 rejected {k!r}={v!r} ({r})")
    enc = lib.x265_encoder_open_199(p)
    if not enc:
        raise RuntimeError("x265_encoder_open failed")
    out = bytearray()
    nals = ctypes.POINTER(X265Nal)()
    n = ctypes.c_uint32()

    def drain(rc):
        if rc > 0:
            for i in range(n.value):
                out.extend(
                    ctypes.string_at(nals[i].payload, nals[i].sizeBytes)
                )

    pic = lib.x265_picture_alloc()
    keep = []
    for y, u, v in frames:
        lib.x265_picture_init(p, pic)
        bufs = [np.ascontiguousarray(a, dtype=np.uint8) for a in (y, u, v)]
        keep.append(bufs)
        for ch, a in enumerate(bufs):
            ctypes.memmove(
                pic + _OFF_PLANES + 8 * ch,
                struct.pack("<Q", a.ctypes.data),
                8,
            )
            ctypes.memmove(
                pic + _OFF_STRIDE + 4 * ch,
                struct.pack("<i", a.shape[1]),
                4,
            )
        rc = lib.x265_encoder_encode(
            ctypes.c_void_p(enc), ctypes.byref(nals), ctypes.byref(n),
            ctypes.c_void_p(pic), None,
        )
        drain(rc)
    while True:
        rc = lib.x265_encoder_encode(
            ctypes.c_void_p(enc), ctypes.byref(nals), ctypes.byref(n),
            None, None,
        )
        if rc <= 0:
            break
        drain(rc)
    lib.x265_picture_free(pic)
    lib.x265_encoder_close(ctypes.c_void_p(enc))
    lib.x265_param_free(p)
    return bytes(out)


def de265_lib():
    hits = glob.glob("/usr/lib/*/libde265.so*") + glob.glob(
        "/usr/lib/libde265.so*"
    )
    if not hits:
        return None
    lib = ctypes.CDLL(hits[0])
    lib.de265_new_decoder.restype = ctypes.c_void_p
    lib.de265_push_data.restype = ctypes.c_int
    lib.de265_push_data.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_longlong, ctypes.c_void_p,
    ]
    lib.de265_flush_data.argtypes = [ctypes.c_void_p]
    lib.de265_decode.restype = ctypes.c_int
    lib.de265_decode.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
    lib.de265_get_next_picture.restype = ctypes.c_void_p
    lib.de265_get_next_picture.argtypes = [ctypes.c_void_p]
    lib.de265_get_image_width.restype = ctypes.c_int
    lib.de265_get_image_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.de265_get_image_height.restype = ctypes.c_int
    lib.de265_get_image_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.de265_get_image_plane.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.de265_get_image_plane.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)
    ]
    lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
    return lib


def decode_de265(stream: bytes) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode an Annex-B stream with the system libde265; returns
    (y, u, v) uint8 arrays per picture."""
    lib = de265_lib()
    if lib is None:
        raise RuntimeError("no system libde265")
    ctx = lib.de265_new_decoder()
    if not ctx:
        raise RuntimeError("de265_new_decoder failed")
    err = lib.de265_push_data(ctx, stream, len(stream), 0, None)
    if err != 0:
        raise RuntimeError(f"de265_push_data error {err}")
    lib.de265_flush_data(ctx)
    pics = []
    more = ctypes.c_int(1)
    while more.value:
        err = lib.de265_decode(ctx, ctypes.byref(more))
        if err != 0 and err != 1005:  # 1005: waiting for input at EOS
            raise RuntimeError(f"de265_decode error {err}")
        img = lib.de265_get_next_picture(ctx)
        while img:
            planes = []
            for ch in range(3):
                w = lib.de265_get_image_width(img, ch)
                h = lib.de265_get_image_height(img, ch)
                stride = ctypes.c_int()
                ptr = lib.de265_get_image_plane(img, ch, ctypes.byref(stride))
                buf = ctypes.string_at(ptr, stride.value * h)
                planes.append(
                    np.frombuffer(buf, dtype=np.uint8)
                    .reshape(h, stride.value)[:, :w]
                    .copy()
                )
            pics.append(tuple(planes))
            img = lib.de265_get_next_picture(ctx)
    lib.de265_free_decoder(ctx)
    return pics


def make_frame(w: int, h: int, seed: int, kind: str = "mixed"):
    """Deterministic test frames: gradients + shapes + noise."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "flat":
        y = np.full((h, w), 100 + seed % 100, dtype=np.uint8)
    elif kind == "grad":
        y = ((xx * 255) // max(w - 1, 1)).astype(np.uint8)
    elif kind == "noise":
        y = rng.randint(0, 256, (h, w), dtype=np.uint8)
    else:
        y = ((xx + 2 * yy + seed * 7) % 256).astype(np.uint8)
        y[h // 4 : h // 2, w // 4 : w // 2] = 230
        y = (y.astype(np.int32) + rng.randint(-8, 9, (h, w))).clip(0, 255).astype(np.uint8)
    u = ((128 + (xx[: (h + 1) // 2 * 2 : 2, : (w + 1) // 2 * 2 : 2] - yy[: (h + 1) // 2 * 2 : 2, : (w + 1) // 2 * 2 : 2]) // 4) % 256).astype(np.uint8)
    v = ((128 + seed * 3 + yy[: (h + 1) // 2 * 2 : 2, : (w + 1) // 2 * 2 : 2] // 2) % 256).astype(np.uint8)
    return y, u, v
