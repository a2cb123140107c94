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
    lib.de265_get_bits_per_pixel.restype = ctypes.c_int
    lib.de265_get_bits_per_pixel.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.de265_free_decoder.argtypes = [ctypes.c_void_p]
    return lib


def decode_de265(stream: bytes) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Decode an Annex-B stream with the system libde265; returns
    (y, u, v) arrays per picture — uint8 for 8-bit streams, uint16
    (little-endian plane data) for Main10."""
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
                bpp = lib.de265_get_bits_per_pixel(img, ch)
                stride = ctypes.c_int()
                ptr = lib.de265_get_image_plane(img, ch, ctypes.byref(stride))
                buf = ctypes.string_at(ptr, stride.value * h)
                if bpp > 8:
                    arr = (np.frombuffer(buf, dtype="<u2")
                           .reshape(h, stride.value // 2)[:, :w].copy())
                else:
                    arr = (np.frombuffer(buf, dtype=np.uint8)
                           .reshape(h, stride.value)[:, :w].copy())
                planes.append(arr)
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


def split_nals(stream: bytes):
    """Split an Annex-B stream into (start_code, nal_bytes) pairs."""
    idxs = []
    j, n = 0, len(stream)
    while j < n - 2:
        if stream[j] == 0 and stream[j + 1] == 0:
            if stream[j + 2] == 1:
                idxs.append((j, 3))
                j += 3
                continue
            if j + 3 < n and stream[j + 2] == 0 and stream[j + 3] == 1:
                idxs.append((j, 4))
                j += 4
                continue
        j += 1
    out = []
    for k, (pos, sc) in enumerate(idxs):
        end = idxs[k + 1][0] if k + 1 < len(idxs) else n
        out.append((stream[pos:pos + sc], stream[pos + sc:end]))
    return out


class BitWriter:
    """MSB-first bit writer (Exp-Golomb capable) for NAL surgery."""

    def __init__(self):
        self.bits = []

    def u(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v):
        v += 1
        nb = v.bit_length()
        self.u(0, nb - 1)
        self.u(v, nb)

    def se(self, v):
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def copy(self, data, start, end):
        for p in range(start, end):
            self.bits.append((data[p >> 3] >> (7 - (p & 7))) & 1)

    def tobytes(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            acc = 0
            for b in self.bits[i:i + 8]:
                acc = (acc << 1) | b
            out.append(acc)
        return bytes(out)


def inject_slice_chroma_offsets(stream: bytes, cb_off: int, cr_off: int) -> bytes:
    """Rewrite an in-scope single-slice intra stream so every slice
    header carries slice_cb/cr_qp_offset: flip the PPS
    pps_slice_chroma_qp_offsets_present_flag IN PLACE (a u(1), no bit
    shift), then splice two se(v) codes into each slice header after
    slice_qp_delta, re-padding the header byte-alignment. x265 never
    emits slice chroma offsets, so this is the only way to exercise
    that path on a real-encoder stream while keeping libde265 as the
    ground truth (it decodes the rewritten stream natively)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators import (
        hevc_decode as hd,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        add_emulation,
    )

    sps = pps = None
    out = bytearray()
    for sc, nal in split_nals(stream):
        ntype = (nal[0] >> 1) & 0x3F
        rbsp, _ = hd.strip_emulation_with_map(nal)
        if ntype == 33:
            sps = hd.parse_sps_intra(rbsp)
            out += sc + nal
            continue
        if ntype == 34:
            b = hd._Bits(rbsp)
            b.u(16)
            b.ue(); b.ue(); b.u(1); b.u(1); b.u(3); b.u(1); b.u(1)
            b.ue(); b.ue(); b.se(); b.u(1); b.u(1)
            if b.u(1):  # cu_qp_delta_enabled
                b.ue()
            b.se(); b.se()
            flagpos = b.pos
            new = bytearray(rbsp)
            if (new[flagpos >> 3] >> (7 - (flagpos & 7))) & 1:
                raise ValueError("PPS already has slice chroma offsets")
            new[flagpos >> 3] |= 1 << (7 - (flagpos & 7))
            pps = hd.parse_pps_intra(bytes(new))
            out += sc + add_emulation(bytes(new))
            continue
        if ntype in (16, 17, 18, 19, 20, 21) and pps is not None:
            ppsu = dict(pps)
            ppsu["slice_chroma_qp_offsets_present"] = 0
            b = hd._Bits(rbsp)
            b.u(16)
            b.u(1)  # first_slice_segment_in_pic
            if ntype in hd.IRAP_TYPES:
                b.u(1)
            b.ue()
            for _ in range(pps["extra_slice_header_bits"]):
                b.u(1)
            b.ue()  # slice_type
            if pps["output_flag_present"]:
                b.u(1)
            if ntype not in (19, 20):
                b.u(sps["log2_max_poc_lsb"])
                if not b.u(1):
                    hd._st_ref_pic_set(b, sps["num_st_rps"],
                                       sps["num_st_rps"], sps["rps_deltas"])
                elif sps["num_st_rps"] > 1:
                    b.u(max(1, (sps["num_st_rps"] - 1).bit_length()))
                if sps["temporal_mvp"]:
                    b.u(1)
            if sps["sao_enabled"]:
                b.u(1)
                b.u(1)
            b.se()  # slice_qp_delta
            insert_at = b.pos
            hdr = hd.parse_slice_header_intra(rbsp, ntype, sps, ppsu)
            data_pos = hdr["data_pos"]
            align = None  # the alignment one-bit: last set bit pre-CABAC
            for p in range(data_pos - 1, insert_at - 1, -1):
                if (rbsp[p >> 3] >> (7 - (p & 7))) & 1:
                    align = p
                    break
            w = BitWriter()
            w.copy(rbsp, 0, insert_at)
            w.se(cb_off)
            w.se(cr_off)
            w.copy(rbsp, insert_at, align)
            w.u(1, 1)
            new = w.tobytes() + rbsp[data_pos // 8:]
            out += sc + add_emulation(new)
            continue
        out += sc + nal
    return bytes(out)


def write_hm_scaling_list(path: str, intra4_luma=None):
    """Write an HM/x265-format scaling-list file: all matrices flat 16
    except an optional non-flat INTRA4X4_LUMA (the discriminator for
    the §8.6.3 transform-skip scaling rule — v1 TS is always 4x4, so
    scaling lists apply to TS blocks too)."""
    n4 = ["INTRA4X4_LUMA", "INTRA4X4_CHROMAU", "INTRA4X4_CHROMAV",
          "INTER4X4_LUMA", "INTER4X4_CHROMAU", "INTER4X4_CHROMAV"]
    n8 = [s.replace("4X4", "8X8") for s in n4]
    n16 = [s.replace("4X4", "16X16") for s in n4]
    n32 = ["INTRA32X32_LUMA", "INTER32X32_LUMA"]
    lines = []
    for n in n4:
        lines.append(n + " =")
        vals = (intra4_luma if (n == "INTRA4X4_LUMA" and intra4_luma)
                else [16] * 16)
        lines.append(",".join(map(str, vals)))
    for group, dc in ((n8, False), (n16, True), (n32, True)):
        for n in group:
            lines.append(n + " =")
            lines.append(",".join(["16"] * 64))
            if dc:
                lines.append(n + "_DC =")
                lines.append("16")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


# --- Main10 rig (r13): the multilib x265 exposes per-depth encoders
# through x265_api_get; the field layout below is the public x265.h
# x265_api struct for X265_BUILD 199 (x265 3.5), bit_depth verified at
# runtime against the requested depth.


class X265Api(ctypes.Structure):
    _fields_ = [
        ("api_major_version", ctypes.c_int),
        ("api_build_number", ctypes.c_int),
        ("sizeof_param", ctypes.c_int),
        ("sizeof_picture", ctypes.c_int),
        ("sizeof_analysis_data", ctypes.c_int),
        ("sizeof_zone", ctypes.c_int),
        ("sizeof_zonecfg", ctypes.c_int),
        ("bit_depth", ctypes.c_int),
        ("version_str", ctypes.c_char_p),
        ("build_info_str", ctypes.c_char_p),
        ("param_alloc", ctypes.CFUNCTYPE(ctypes.c_void_p)),
        ("param_free", ctypes.CFUNCTYPE(None, ctypes.c_void_p)),
        ("param_default", ctypes.CFUNCTYPE(None, ctypes.c_void_p)),
        ("param_parse", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_char_p)),
        ("param_apply_profile", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.c_char_p)),
        ("param_default_preset", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_char_p)),
        ("picture_alloc", ctypes.CFUNCTYPE(ctypes.c_void_p)),
        ("picture_free", ctypes.CFUNCTYPE(None, ctypes.c_void_p)),
        ("picture_init", ctypes.CFUNCTYPE(
            None, ctypes.c_void_p, ctypes.c_void_p)),
        ("encoder_open", ctypes.CFUNCTYPE(
            ctypes.c_void_p, ctypes.c_void_p)),
        ("encoder_parameters", ctypes.CFUNCTYPE(
            None, ctypes.c_void_p, ctypes.c_void_p)),
        ("encoder_reconfig", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p)),
        ("encoder_reconfig_zone", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p)),
        ("encoder_headers", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(X265Nal)),
            ctypes.POINTER(ctypes.c_uint32))),
        ("encoder_encode", ctypes.CFUNCTYPE(
            ctypes.c_int, ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(X265Nal)),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_void_p,
            ctypes.c_void_p)),
        ("encoder_get_stats", ctypes.CFUNCTYPE(
            None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32)),
        ("encoder_log", ctypes.CFUNCTYPE(
            None, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p)),
        ("encoder_close", ctypes.CFUNCTYPE(None, ctypes.c_void_p)),
        ("cleanup", ctypes.CFUNCTYPE(None)),
    ]


def x265_api(bit_depth: int = 10):
    hits = glob.glob("/usr/lib/*/libx265.so*") + glob.glob(
        "/usr/lib/libx265.so*"
    )
    if not hits:
        return None
    lib = ctypes.CDLL(hits[0])
    if not hasattr(lib, "x265_api_get_199"):
        return None
    lib.x265_api_get_199.restype = ctypes.POINTER(X265Api)
    api = lib.x265_api_get_199(bit_depth)
    if not api:
        return None
    a = api.contents
    if a.bit_depth != bit_depth or a.api_build_number != 199:
        return None
    return a


_OFF_PIC_BITDEPTH = 60


def encode_intra10(frames, qp: int = 30, extra: dict | None = None) -> bytes:
    """Encode 10-bit 4:2:0 frames (uint16 arrays, samples 0..1023) as
    an all-intra Main10 Annex-B stream via the x265 10-bit API.
    Same structural knobs as encode_intra."""
    a = x265_api(10)
    if a is None:
        raise RuntimeError("no 10-bit x265 API on this host")
    h, w = frames[0][0].shape
    p = a.param_alloc()
    a.param_default(p)
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
        if v is False:
            opts.pop(kk, None)
            continue
        opts[kk] = v if (v is None or isinstance(v, bytes)) else str(v).encode()
    for k, v in opts.items():
        if a.param_parse(p, k, v) != 0:
            raise RuntimeError(f"x265-10bit rejected {k!r}={v!r}")
    enc = a.encoder_open(p)
    if not enc:
        raise RuntimeError("x265 10-bit encoder_open failed")
    out = bytearray()
    nals = ctypes.POINTER(X265Nal)()
    n = ctypes.c_uint32()

    def drain(rc):
        if rc > 0:
            for i in range(n.value):
                out.extend(
                    ctypes.string_at(nals[i].payload, nals[i].sizeBytes)
                )

    pic = a.picture_alloc()
    keep = []
    for y, u, v in frames:
        a.picture_init(p, pic)
        bufs = [np.ascontiguousarray(x, dtype=np.uint16) for x in (y, u, v)]
        keep.append(bufs)
        for ch, arr in enumerate(bufs):
            ctypes.memmove(
                pic + _OFF_PLANES + 8 * ch,
                struct.pack("<Q", arr.ctypes.data), 8,
            )
            ctypes.memmove(
                pic + _OFF_STRIDE + 4 * ch,
                struct.pack("<i", arr.shape[1] * 2), 4,  # stride in bytes
            )
        ctypes.memmove(pic + _OFF_PIC_BITDEPTH, struct.pack("<i", 10), 4)
        drain(a.encoder_encode(enc, ctypes.byref(nals), ctypes.byref(n),
                               pic, None))
    while True:
        rc = a.encoder_encode(enc, ctypes.byref(nals), ctypes.byref(n),
                              None, None)
        if rc <= 0:
            break
        drain(rc)
    a.picture_free(pic)
    a.encoder_close(enc)
    a.param_free(p)
    return bytes(out)


def make_frame10(w: int, h: int, seed: int, kind: str = "mixed"):
    """10-bit test frames: the 8-bit pattern scaled with low-bit noise
    so the two extra bits carry real signal."""
    y8, u8, v8 = make_frame(w, h, seed, kind)
    rng = np.random.RandomState(seed + 99)
    return tuple(
        (a.astype(np.uint16) << 2)
        | rng.randint(0, 4, a.shape).astype(np.uint16)
        for a in (y8, u8, v8)
    )
