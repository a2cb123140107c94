"""HEVC/H.265 stream probe — parameter-set parsing + IRAP keyframe
selection (ITU-T H.265 §7.3; ISO 14496-15 §8.3 for the MP4 hvcC box).

The H.265 twin of the repo's H.264 CONTAINER story (avcC plumbing,
keyframe selection): modern crawls carry HEVC in MP4s, and a video
pipeline needs dimensions/profile/bit-depth and the keyframe map
WITHOUT a transform decode — full HEVC intra decode is the declared
boundary (an r12-class build; the system libde265 is the ready-made
oracle when it lands).

Interop: REAL x265-generated parameter sets (the system libx265 via
ctypes emits VPS/SPS/PPS for requested resolutions/profiles without
feeding frames) parse back to the exact requested geometry in
tests/test_hevc.py.
"""

from __future__ import annotations

import struct

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
    _Bits,
    split_annexb_raw,
    strip_emulation,
)

# nal_unit_type names (§7.4.2.2)
NAL_VPS, NAL_SPS, NAL_PPS = 32, 33, 34
IRAP_TYPES = frozenset(range(16, 24))  # BLA/IDR/CRA (§3.73: 16..23)
IDR_TYPES = frozenset((19, 20))


def nal_header(nal: bytes) -> tuple[int, int, int]:
    """(nal_unit_type, nuh_layer_id, temporal_id) from the 2-byte
    H.265 NAL header."""
    if len(nal) < 2:
        raise ValueError("torn HEVC NAL header")
    if nal[0] & 0x80:
        raise ValueError("HEVC forbidden_zero_bit set")
    typ = (nal[0] >> 1) & 0x3F
    layer = ((nal[0] & 1) << 5) | (nal[1] >> 3)
    tid = (nal[1] & 7) - 1
    if tid < 0:
        raise ValueError("HEVC nuh_temporal_id_plus1 is zero")
    return typ, layer, tid


def _profile_tier_level(b: _Bits, max_sub_layers_minus1: int) -> dict:
    out = {
        "profile_space": b.u(2),
        "tier_flag": b.u(1),
        "profile_idc": b.u(5),
    }
    b.u(32)  # general_profile_compatibility_flags
    b.u(4)  # progressive/interlaced/non-packed/frame-only flags
    b.u(32)
    b.u(11)  # 43 reserved bits total
    b.u(1)  # general_inbld_flag / reserved
    out["level_idc"] = b.u(8)
    present = []
    for _ in range(max_sub_layers_minus1):
        present.append((b.u(1), b.u(1)))
    if max_sub_layers_minus1 > 0:
        for _ in range(8 - max_sub_layers_minus1):
            b.u(2)  # reserved_zero_2bits alignment
    for pp, lp in present:
        if pp:
            b.u(88)  # sub-layer profile block
        if lp:
            b.u(8)  # sub-layer level
    return out


_SUB_WH = {0: (1, 1), 1: (2, 2), 2: (2, 1), 3: (1, 1)}


def parse_sps_hevc(rbsp: bytes) -> dict:
    """Parse an H.265 SPS RBSP (after the 2-byte NAL header) to the
    probe fields: cropped width/height, chroma format, bit depths,
    profile/tier/level."""
    b = _Bits(rbsp)
    b.u(16)  # NAL header
    b.u(4)  # sps_video_parameter_set_id
    max_sub = b.u(3)
    b.u(1)  # temporal_id_nesting
    ptl = _profile_tier_level(b, max_sub)
    sps_id = b.ue()
    chroma = b.ue()
    if chroma > 3:
        raise ValueError(f"HEVC chroma_format_idc {chroma} out of range")
    if chroma == 3:
        b.u(1)  # separate_colour_plane_flag
    w = b.ue()
    h = b.ue()
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
        raise ValueError(f"HEVC luma dimensions {w}x{h} out of range")
    crop = (0, 0, 0, 0)
    if b.u(1):  # conformance_window_flag
        crop = (b.ue(), b.ue(), b.ue(), b.ue())
    bd_luma = b.ue() + 8
    bd_chroma = b.ue() + 8
    sw, sh = _SUB_WH[chroma]
    width = w - (crop[0] + crop[1]) * sw
    height = h - (crop[2] + crop[3]) * sh
    if width <= 0 or height <= 0:
        raise ValueError("HEVC conformance window crops everything")
    return {
        "sps_id": sps_id,
        "chroma_format_idc": chroma,
        "width": int(width),
        "height": int(height),
        "bit_depth_luma": bd_luma,
        "bit_depth_chroma": bd_chroma,
        **ptl,
    }


def probe_hevc_annexb(data: bytes) -> dict:
    """Probe an Annex-B HEVC elementary stream: geometry/profile from
    the first SPS, NAL census, IRAP/IDR keyframe counts."""
    nals = split_annexb_raw(data)
    if not nals:
        raise ValueError("no HEVC NAL units")
    sps = None
    census: dict[int, int] = {}
    n_irap = n_idr = 0
    for nal in nals:
        typ, layer, _tid = nal_header(nal)
        census[typ] = census.get(typ, 0) + 1
        if layer != 0:
            continue  # base layer only (probe scope)
        if typ == NAL_SPS and sps is None:
            sps = parse_sps_hevc(strip_emulation(nal))
        elif typ in IRAP_TYPES:
            n_irap += 1
            if typ in IDR_TYPES:
                n_idr += 1
    if sps is None:
        raise ValueError("HEVC stream without an SPS")
    return {
        **sps,
        "n_nals": len(nals),
        "n_irap": n_irap,
        "n_idr": n_idr,
        "nal_types": dict(sorted(census.items())),
    }


def parse_hvcc(box: bytes) -> tuple[int, list[bytes]]:
    """Parse an MP4 HEVCDecoderConfigurationRecord (ISO 14496-15
    §8.3.3.1) → (nal_length_size, parameter-set NALs in array order)."""
    if len(box) < 23:
        raise ValueError("torn hvcC box")
    if box[0] != 1:
        raise ValueError(f"hvcC configurationVersion {box[0]} out of range")
    nal_length_size = (box[21] & 3) + 1
    n_arrays = box[22]
    nals = []
    off = 23
    for _ in range(n_arrays):
        if off + 3 > len(box):
            raise ValueError("torn hvcC array header")
        n_units = struct.unpack_from(">H", box, off + 1)[0]
        off += 3
        for _ in range(n_units):
            if off + 2 > len(box):
                raise ValueError("torn hvcC unit length")
            (ln,) = struct.unpack_from(">H", box, off)
            off += 2
            if off + ln > len(box):
                raise ValueError("torn hvcC unit body")
            nals.append(box[off : off + ln])
            off += ln
    return nal_length_size, nals


def hvcc_sample_to_annexb(sample: bytes, nal_length_size: int) -> bytes:
    """Length-prefixed MP4 HEVC sample → Annex-B byte stream."""
    out = bytearray()
    off = 0
    n = len(sample)
    while off < n:
        if off + nal_length_size > n:
            raise ValueError("torn length-prefixed HEVC sample")
        ln = int.from_bytes(sample[off : off + nal_length_size], "big")
        off += nal_length_size
        if off + ln > n:
            raise ValueError("torn HEVC NAL in sample")
        out += b"\x00\x00\x00\x01" + sample[off : off + ln]
        off += ln
    return bytes(out)


# --- fixture builders (r12) -------------------------------------------------


def build_sps_hevc(
    coded_w: int,
    coded_h: int,
    chroma: int = 1,
    bit_depth: int = 8,
    profile_idc: int = 1,
    level_idc: int = 93,
    tier: int = 0,
    crop: tuple[int, int, int, int] = (0, 0, 0, 0),
    sps_id: int = 0,
) -> bytes:
    """[r12] Spec-exact SPS NAL payload (2-byte header + RBSP with
    emulation prevention) carrying exactly the fields the probe reads —
    the fixture twin of :func:`parse_sps_hevc`, independently verified
    against real x265 output in tests/test_hevc.py. ``crop`` is
    (left, right, top, bottom) in chroma units (§7.4.3.2.1)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
        _BitW,
        add_emulation,
    )

    w = _BitW()
    w.w((NAL_SPS << 1) << 8 | 0x01, 16)  # nal header: layer 0, tid+1 = 1
    w.w(0, 4)  # sps_video_parameter_set_id
    w.w(0, 3)  # max_sub_layers_minus1
    w.w(1, 1)  # temporal_id_nesting
    # profile_tier_level (general only; no sub-layers)
    w.w(0, 2)  # profile_space
    w.w(tier, 1)
    w.w(profile_idc, 5)
    w.w(1 << (31 - profile_idc), 32)  # compatibility flags
    w.w(0b1011, 4)  # progressive=1, interlaced=0, non-packed=1, frame-only=1
    w.w(0, 32)
    w.w(0, 11)
    w.w(0, 1)
    w.w(level_idc, 8)
    w.ue(sps_id)
    w.ue(chroma)
    if chroma == 3:
        w.w(0, 1)
    w.ue(coded_w)
    w.ue(coded_h)
    if any(crop):
        w.w(1, 1)  # conformance_window_flag
        for c in crop:
            w.ue(c)
    else:
        w.w(0, 1)
    w.ue(bit_depth - 8)  # luma
    w.ue(bit_depth - 8)  # chroma
    w.trailing()
    return add_emulation(w.payload())


def build_hevc_annexb(
    coded_w: int,
    coded_h: int,
    irap_types: list[int],
    n_trail: int = 0,
    **sps_kwargs,
) -> bytes:
    """[r12] Minimal-but-valid Annex-B HEVC elementary stream for the
    probe: VPS + SPS + PPS then one NAL per entry of ``irap_types``
    (each in §7.4.2.2's 16..23 IRAP range) followed by ``n_trail``
    TRAIL_R (type 1) slices. Slice bodies are opaque to the probe."""

    def nal(typ: int, body: bytes) -> bytes:
        return b"\x00\x00\x00\x01" + bytes([(typ << 1) & 0x7E, 0x01]) + body

    out = bytearray()
    out += nal(NAL_VPS, b"\x0c\x01\xff\xff")
    out += b"\x00\x00\x00\x01" + build_sps_hevc(coded_w, coded_h, **sps_kwargs)
    out += nal(NAL_PPS, b"\xc0\xf2")
    for i, typ in enumerate(irap_types):
        if typ not in IRAP_TYPES:
            raise ValueError(f"irap type {typ} outside 16..23")
        out += nal(typ, bytes([0x80, 0x10 + (i & 0x0F), 0x40]))
    for i in range(n_trail):
        out += nal(1, bytes([0x02, 0x30 + (i & 0x0F)]))
    return bytes(out)
