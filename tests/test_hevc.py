"""HEVC stream probe (operators/hevc.py): REAL x265-generated
parameter sets parse back to the exact requested geometry; NAL/IRAP
census; hvcC box walk; tears."""

from __future__ import annotations

import ctypes
import glob
import struct

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc import (
    IRAP_TYPES,
    hvcc_sample_to_annexb,
    nal_header,
    parse_hvcc,
    probe_hevc_annexb,
)


def _x265():
    hits = glob.glob("/usr/lib/*/libx265.so*")
    if not hits:
        return None
    lib = ctypes.CDLL(hits[0])
    if not hasattr(lib, "x265_encoder_open_199"):
        return None
    lib.x265_param_alloc.restype = ctypes.c_void_p
    lib.x265_param_default.argtypes = [ctypes.c_void_p]
    lib.x265_param_parse.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.x265_param_parse.restype = ctypes.c_int
    lib.x265_encoder_open_199.restype = ctypes.c_void_p
    lib.x265_encoder_open_199.argtypes = [ctypes.c_void_p]
    lib.x265_encoder_close.argtypes = [ctypes.c_void_p]
    lib.x265_param_free.argtypes = [ctypes.c_void_p]
    return lib


class _X265Nal(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_uint32),
        ("sizeBytes", ctypes.c_uint32),
        ("payload", ctypes.POINTER(ctypes.c_ubyte)),
    ]


def _real_headers(lib, w, h):
    lib.x265_encoder_headers.restype = ctypes.c_int
    lib.x265_encoder_headers.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(_X265Nal)),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    p = lib.x265_param_alloc()
    lib.x265_param_default(p)
    assert lib.x265_param_parse(p, b"input-res", f"{w}x{h}".encode()) == 0
    assert lib.x265_param_parse(p, b"fps", b"25") == 0
    assert lib.x265_param_parse(p, b"log-level", b"none") == 0
    enc = lib.x265_encoder_open_199(p)
    assert enc
    nals = ctypes.POINTER(_X265Nal)()
    n = ctypes.c_uint32()
    assert lib.x265_encoder_headers(
        ctypes.c_void_p(enc), ctypes.byref(nals), ctypes.byref(n)
    ) > 0
    raw = [
        bytes(bytearray(nals[i].payload[j] for j in range(nals[i].sizeBytes)))
        for i in range(n.value)
    ]
    lib.x265_encoder_close(ctypes.c_void_p(enc))
    lib.x265_param_free(p)
    return raw


def test_real_x265_parameter_sets_parse_exactly():
    """Geometry round-trips through a REAL encoder's SPS — including
    a non-multiple-of-8 frame, which exercises the conformance-window
    cropping math."""
    lib = _x265()
    if lib is None:
        pytest.skip("no system libx265 (visible host gap)")
    for w, h in ((320, 240), (1920, 1080), (176, 144), (202, 118)):
        blob = b"".join(_real_headers(lib, w, h))
        p = probe_hevc_annexb(blob)
        assert (p["width"], p["height"]) == (w, h)
        assert p["profile_idc"] == 1 and p["bit_depth_luma"] == 8
        assert p["chroma_format_idc"] == 1  # 4:2:0
        assert p["nal_types"][32] == 1 and p["nal_types"][33] == 1
        assert p["nal_types"][34] == 1  # VPS/SPS/PPS each once


def _nal(typ: int, body: bytes = b"\x00") -> bytes:
    return bytes([(typ << 1) & 0x7E, 0x01]) + body


def test_nal_header_and_irap_census():
    assert nal_header(_nal(33))[0] == 33
    assert set(IRAP_TYPES) == set(range(16, 24))
    with pytest.raises(ValueError, match="forbidden"):
        nal_header(b"\x80\x01")
    with pytest.raises(ValueError, match="temporal_id_plus1"):
        nal_header(b"\x42\x00")


def test_hvcc_walk_and_sample_conversion():
    lib = _x265()
    if lib is None:
        pytest.skip("no system libx265 (visible host gap)")
    raw = _real_headers(lib, 320, 240)
    # strip start codes, build an hvcC with one array per NAL type
    units = [r.lstrip(b"\x00")[1:] for r in raw[:3]]  # drop 00..01
    box = bytearray(b"\x01" + b"\x00" * 20 + bytes([0xFC | 3, len(units)]))
    for u in units:
        typ = (u[0] >> 1) & 0x3F
        box += bytes([typ]) + struct.pack(">H", 1) + struct.pack(">H", len(u)) + u
    nls, nals = parse_hvcc(bytes(box))
    assert nls == 4 and len(nals) == 3
    sample = b"".join(struct.pack(">I", len(n)) + n for n in nals)
    annexb = hvcc_sample_to_annexb(sample, 4)
    p = probe_hevc_annexb(annexb)
    assert (p["width"], p["height"]) == (320, 240)
    with pytest.raises(ValueError, match="torn hvcC"):
        parse_hvcc(bytes(box)[:-3])
    with pytest.raises(ValueError, match="torn HEVC NAL"):
        hvcc_sample_to_annexb(sample[:-2], 4)


def test_probe_requires_sps():
    with pytest.raises(ValueError, match="without an SPS"):
        probe_hevc_annexb(b"\x00\x00\x00\x01" + _nal(34) + b"\x00\x00\x00\x01" + _nal(19))
    with pytest.raises(ValueError, match="Annex-B"):
        probe_hevc_annexb(b"")


def test_hevc_mp4_track_end_to_end():
    """An hvc1 MP4 track carrying REAL x265 parameter sets: probe_mp4
    surfaces the hvcC config; samples convert to Annex-B; the probe
    reads geometry + counts the stss-marked IRAP keyframes."""
    lib = _x265()
    if lib is None:
        pytest.skip("no system libx265 (visible host gap)")
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
        build_minimal_mp4,
        extract_samples,
        probe_mp4,
    )

    raw = _real_headers(lib, 320, 240)
    units = [r.lstrip(b"\x00")[1:] for r in raw[:3]]
    body = bytearray(b"\x01" + b"\x00" * 20 + bytes([0xFC | 3, len(units)]))
    for u in units:
        body += bytes([(u[0] >> 1) & 0x3F]) + struct.pack(">H", 1)
        body += struct.pack(">H", len(u)) + u
    hvcc = struct.pack(">I", len(body) + 8) + b"hvcC" + bytes(body)

    def nal(typ, payload=b"\x12\x34"):
        u = bytes([(typ << 1) & 0x7E, 0x01]) + payload
        return struct.pack(">I", len(u)) + u

    # sample 0: param sets + IDR; samples 1-2: non-IRAP; sample 3: CRA
    s0 = b"".join(struct.pack(">I", len(u)) + u for u in units) + nal(19)
    samples = [s0, nal(1), nal(0), nal(21)]
    mp4 = build_minimal_mp4(
        samples, width=320, height=240, codec=b"hvc1",
        keyframes=[0, 3], config_box=hvcc,
    )
    info = probe_mp4(mp4)
    tr = info["tracks"][0]
    assert tr["codec"] == "hvc1"
    assert tr["hvcc"]["nal_length_size"] == 4
    assert len(tr["hvcc"]["param_sets"]) == 3
    assert tr["keyframes"] == [0, 3]

    annexb = hvcc_sample_to_annexb(
        extract_samples(mp4, tr, [0])[0], tr["hvcc"]["nal_length_size"]
    )
    p = probe_hevc_annexb(annexb)
    assert (p["width"], p["height"]) == (320, 240)
    assert p["n_idr"] == 1 and p["n_irap"] == 1
    # the CRA sample
    annexb3 = hvcc_sample_to_annexb(
        extract_samples(mp4, tr, [3])[0], tr["hvcc"]["nal_length_size"]
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc import (
        nal_header as nh,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        split_annexb_raw,
    )

    types = [nh(x)[0] for x in split_annexb_raw(annexb3)]
    assert types == [21]
