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
