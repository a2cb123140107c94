"""HEVC/H.265 intra decoder — stdlib + numpy, built from the public
spec (ITU-T H.265 §7-§9: CABAC per §9.3 with the shared H.264 §9.3.4
arithmetic core, coding quadtree §7.3.8.4, intra prediction §8.4.4,
inverse transforms §8.6, residual coding §7.3.8.11/§9.3.4.2).

Scope (declared, the H.264/VP8 convention): intra-only IRAP pictures
(IDR/CRA/BLA I-slices), 4:2:0 at 8-bit (Main) AND 10-bit (Main10,
r13 — bit depth threaded through dequant bdShift, the 20-BitDepth
stage-2 transform shift, QpBdOffset cu_qp_delta wrap + Qp' dequant
domain, SAO cMax 31 + band width, deblock β/tC << (bd-8), prediction
mid/max values; output planes are uint16 for 10-bit), one slice
segment per picture,
BOTH in-loop filters IN SCOPE — deblocking (§8.7.2; intra pictures:
every edge bS = 2; β/tC tables extraction-verified against libde265)
and SAO (§8.7.3: band + all four edge classes, CTU merge flags) — so
DEFAULT-toolset x265 intra streams decode bit-exact. WPP (entropy sync) IS in scope — per-row
CABAC re-init at NAL-domain entry points with above-row context sync;
cu_qp_delta, transform_skip, and scaling lists (default or explicit
§7.3.4 data) also in scope, so adaptive-quant, screen-content, and
HVS-quantized streams decode; sign-data-hiding in scope. Out of scope:
tiles, dependent slices, multi-slice pictures, PCM, transquant bypass,
inter prediction (P/B). Everything in scope decodes BIT-EXACT against the
system libde265 (ctypes ground truth, tests/test_hevc_decode.py) on
real x265-encoded streams — the VP8/libwebp playbook.

Context-model init values below are the initType-0 (I-slice) rows of
Tables 9-5..9-31; every table was additionally extraction-verified
byte-for-byte (stride-4 int32) against the system libde265's compiled
constant data (tests/test_hevc_decode.py::test_init_tables_match_
libde265_rodata), the same technique that pinned the H.264 CABAC
engine tables in round 11.

Tear contract: decode_hevc_intra either returns frames or raises
ValueError — never a raw IndexError/struct.error — so a torn payload
in a crawl becomes a quarantine row, not an executor crash.

Scale shape: the decoder runs inside Arrow ``mapInPandas`` passes
(`operators/multimodal.py` convention), one payload per call,
partition-local.
"""

from __future__ import annotations

import numpy as np

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
    _Bits,
    split_annexb_raw,
    strip_emulation,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264_cabac import (
    RANGE_TAB_LPS,
    TRANS_IDX_LPS,
    TRANS_IDX_MPS,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc import (
    IRAP_TYPES,
    NAL_PPS,
    NAL_SPS,
    NAL_VPS,
    nal_header,
)

# --- parameter sets ---------------------------------------------------------


def _profile_tier_level(b: _Bits, max_sub_layers_minus1: int) -> dict:
    out = {
        "profile_space": b.u(2),
        "tier_flag": b.u(1),
        "profile_idc": b.u(5),
    }
    b.u(32)
    b.u(4)
    b.u(32)
    b.u(11)
    b.u(1)
    out["level_idc"] = b.u(8)
    present = [(b.u(1), b.u(1)) for _ in range(max_sub_layers_minus1)]
    if max_sub_layers_minus1 > 0:
        for _ in range(8 - max_sub_layers_minus1):
            b.u(2)
    for pp, lp in present:
        if pp:
            b.u(88)
        if lp:
            b.u(8)
    return out


def _st_ref_pic_set(b: _Bits, idx: int, num_sets: int, prev_deltas) -> list:
    """Parse (to skip) one st_ref_pic_set (§7.3.7). Returns the delta
    count list so later sets can size inter-RPS prediction reads."""
    pred = b.u(1) if idx != 0 else 0
    if pred:
        # RefRpsIdx = idx - (delta_idx_minus1 + 1); delta_idx is only
        # coded in the slice header (idx == num_sets) and is implicitly
        # 1 for SPS sets (§7.4.8) — so size the read loop from the
        # REFERENCED set's NumDeltaPocs, not always the last one.
        delta_idx = 1
        if idx == num_sets:
            delta_idx = b.ue() + 1  # delta_idx_minus1
        ref_idx = idx - delta_idx
        if ref_idx < 0 or ref_idx >= len(prev_deltas):
            raise ValueError("HEVC st_ref_pic_set inter-RPS index out of range")
        b.u(1)  # delta_rps_sign
        b.ue()  # abs_delta_rps_minus1
        n_prev = prev_deltas[ref_idx]
        count = 0
        for _ in range(n_prev + 1):
            used = b.u(1)
            if not used:
                if b.u(1):
                    count += 1
            else:
                count += 1
        return prev_deltas + [count]
    neg = b.ue()
    pos = b.ue()
    if neg > 64 or pos > 64:
        raise ValueError("HEVC st_ref_pic_set count out of range")
    for _ in range(neg + pos):
        b.ue()
        b.u(1)
    return prev_deltas + [neg + pos]


# default scaling lists (Tables 7-5/7-6; raster order here — stored
# diagonally in the spec/libde265, where BOTH the values and our scan
# mapping are extraction-verified in tests)
_DEF_SCALING_8_INTRA = (
    16, 16, 16, 16, 17, 18, 21, 24,
    16, 16, 16, 16, 17, 19, 22, 25,
    16, 16, 17, 18, 20, 22, 25, 29,
    16, 16, 18, 21, 24, 27, 31, 36,
    17, 17, 20, 24, 30, 35, 41, 47,
    18, 19, 22, 27, 35, 44, 54, 65,
    21, 22, 25, 31, 41, 54, 70, 88,
    24, 25, 29, 36, 47, 65, 88, 115,
)
_DEF_SCALING_8_INTER = (
    16, 16, 16, 16, 17, 18, 20, 24,
    16, 16, 16, 17, 18, 20, 24, 25,
    16, 16, 17, 18, 20, 24, 25, 28,
    16, 17, 18, 20, 24, 25, 28, 33,
    17, 18, 20, 24, 25, 28, 33, 41,
    18, 20, 24, 25, 28, 33, 41, 54,
    20, 24, 25, 28, 33, 41, 54, 71,
    24, 25, 28, 33, 41, 54, 71, 91,
)


def _diag_positions(n: int):
    out = []
    x = y = 0
    while len(out) < n * n:
        while y >= 0:
            if x < n and y < n:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
    return out


def _default_list(size_id: int, matrix_id: int) -> tuple:
    """Raster-order default ScalingList (§7.4.5) + default DC 16."""
    if size_id == 0:
        return (16,) * 16
    intra = matrix_id < 3 if size_id < 3 else matrix_id == 0
    return _DEF_SCALING_8_INTRA if intra else _DEF_SCALING_8_INTER


def parse_scaling_list_data(b: _Bits) -> dict:
    """§7.3.4: per (sizeId, matrixId) raster lists + DC values."""
    lists: dict = {}
    dcs: dict = {}
    for size_id in range(4):
        step = 3 if size_id == 3 else 1
        for matrix_id in range(0, 6, step):
            if not b.u(1):  # scaling_list_pred_mode_flag == 0
                delta = b.ue()
                if delta == 0:
                    lists[(size_id, matrix_id)] = _default_list(
                        size_id, matrix_id
                    )
                    dcs[(size_id, matrix_id)] = 16
                else:
                    ref = matrix_id - delta * step
                    if (size_id, ref) not in lists:
                        raise ValueError(
                            "HEVC scaling list references an unparsed matrix"
                        )
                    lists[(size_id, matrix_id)] = lists[(size_id, ref)]
                    dcs[(size_id, matrix_id)] = dcs[(size_id, ref)]
                continue
            coef_num = min(64, 1 << (4 + (size_id << 1)))
            next_coef = 8
            dc = 16
            if size_id > 1:
                dc = b.se() + 8
                if not 1 <= dc <= 255:
                    raise ValueError("HEVC scaling-list DC out of range")
                next_coef = dc
            n = 4 if size_id == 0 else 8
            grid = [[0] * n for _ in range(n)]
            for x, y in _diag_positions(n)[:coef_num]:
                next_coef = (next_coef + b.se() + 256) % 256
                if next_coef == 0:
                    raise ValueError("HEVC scaling-list coefficient zero")
                grid[y][x] = next_coef
            lists[(size_id, matrix_id)] = tuple(
                v for row in grid for v in row
            )
            dcs[(size_id, matrix_id)] = dc
    return {"lists": lists, "dcs": dcs}


def _default_scaling_data() -> dict:
    lists = {}
    dcs = {}
    for size_id in range(4):
        step = 3 if size_id == 3 else 1
        for matrix_id in range(0, 6, step):
            lists[(size_id, matrix_id)] = _default_list(size_id, matrix_id)
            dcs[(size_id, matrix_id)] = 16
    return {"lists": lists, "dcs": dcs}


def build_scaling_factors(data: dict) -> dict:
    """§7.4.5 ScalingFactor construction: 4x4/8x8 direct, 16x16 = 8x8
    upsampled x2 with the DC override, 32x32 = x4 (intra/inter only)."""
    out = {}
    for (size_id, matrix_id), flat in data["lists"].items():
        n = 4 if size_id == 0 else 8
        m = np.array(flat, dtype=np.int64).reshape(n, n)
        if size_id <= 1:
            out[(size_id, matrix_id)] = m
        else:
            rep = 2 if size_id == 2 else 4
            f = np.repeat(np.repeat(m, rep, axis=0), rep, axis=1)
            f[0, 0] = data["dcs"][(size_id, matrix_id)]
            out[(size_id, matrix_id)] = f
    return out


def parse_sps_intra(rbsp: bytes) -> dict:
    """Full SPS parse for the intra decoder (§7.3.2.2)."""
    b = _Bits(rbsp)
    b.u(16)  # NAL header
    b.u(4)
    max_sub = b.u(3)
    b.u(1)
    ptl = _profile_tier_level(b, max_sub)
    sps = {"ptl": ptl}
    sps["sps_id"] = b.ue()
    chroma = b.ue()
    if chroma == 3:
        b.u(1)
    sps["chroma_format_idc"] = chroma
    w = b.ue()
    h = b.ue()
    crop = (0, 0, 0, 0)
    if b.u(1):
        crop = (b.ue(), b.ue(), b.ue(), b.ue())
    sps["pic_width"] = w
    sps["pic_height"] = h
    sps["crop"] = crop
    sps["bit_depth_luma"] = b.ue() + 8
    sps["bit_depth_chroma"] = b.ue() + 8
    sps["log2_max_poc_lsb"] = b.ue() + 4
    sub_layer_ordering = b.u(1)
    for _ in range((max_sub + 1) if sub_layer_ordering else 1):
        b.ue()
        b.ue()
        b.ue()
    sps["log2_min_cb"] = b.ue() + 3
    sps["log2_ctb"] = sps["log2_min_cb"] + b.ue()
    sps["log2_min_tb"] = b.ue() + 2
    sps["log2_max_tb"] = sps["log2_min_tb"] + b.ue()
    sps["max_trafo_depth_inter"] = b.ue()
    sps["max_trafo_depth_intra"] = b.ue()
    sps["scaling_list_enabled"] = b.u(1)
    sps["scaling_data"] = None
    if sps["scaling_list_enabled"]:
        if b.u(1):  # sps_scaling_list_data_present_flag
            sps["scaling_data"] = parse_scaling_list_data(b)
        else:
            sps["scaling_data"] = _default_scaling_data()
    sps["amp_enabled"] = b.u(1)
    sps["sao_enabled"] = b.u(1)
    sps["pcm_enabled"] = b.u(1)
    if sps["pcm_enabled"]:
        raise ValueError("HEVC PCM outside the declared scope")
    num_sets = b.ue()
    if num_sets > 64:
        raise ValueError("HEVC num_short_term_ref_pic_sets out of range")
    deltas: list = []
    for i in range(num_sets):
        deltas = _st_ref_pic_set(b, i, num_sets, deltas)
    sps["num_st_rps"] = num_sets
    sps["rps_deltas"] = deltas
    if b.u(1):  # long_term_ref_pics_present
        n_lt = b.ue()
        for _ in range(n_lt):
            b.u(sps["log2_max_poc_lsb"])
            b.u(1)
    sps["temporal_mvp"] = b.u(1)
    sps["strong_intra_smoothing"] = b.u(1)
    # vui/extensions: not needed by the decode process
    if sps["chroma_format_idc"] != 1:
        raise ValueError(
            f"HEVC chroma_format_idc {chroma} outside the declared "
            "scope (4:2:0 only)"
        )
    if sps["bit_depth_luma"] != sps["bit_depth_chroma"]:
        raise ValueError(
            "HEVC mixed luma/chroma bit depths outside the declared scope"
        )
    if sps["bit_depth_luma"] not in (8, 10):
        raise ValueError(
            f"HEVC bit depth {sps['bit_depth_luma']} outside the declared "
            "scope (Main 8-bit and Main10 only)"
        )
    return sps


def parse_pps_intra(rbsp: bytes) -> dict:
    """Full PPS parse for the intra decoder (§7.3.2.3)."""
    b = _Bits(rbsp)
    b.u(16)  # NAL header
    pps = {"pps_id": b.ue(), "sps_id": b.ue()}
    pps["dependent_slices"] = b.u(1)
    pps["output_flag_present"] = b.u(1)
    pps["extra_slice_header_bits"] = b.u(3)
    pps["sign_data_hiding"] = b.u(1)
    pps["cabac_init_present"] = b.u(1)
    b.ue()  # num_ref_idx_l0_default_active_minus1
    b.ue()  # num_ref_idx_l1_default_active_minus1
    pps["init_qp"] = 26 + b.se()
    pps["constrained_intra_pred"] = b.u(1)
    pps["transform_skip"] = b.u(1)
    pps["cu_qp_delta_enabled"] = b.u(1)
    pps["diff_cu_qp_delta_depth"] = b.ue() if pps["cu_qp_delta_enabled"] else 0
    pps["cb_qp_offset"] = b.se()
    pps["cr_qp_offset"] = b.se()
    pps["slice_chroma_qp_offsets_present"] = b.u(1)
    pps["weighted_pred"] = b.u(1)
    pps["weighted_bipred"] = b.u(1)
    pps["transquant_bypass"] = b.u(1)
    pps["tiles_enabled"] = b.u(1)
    pps["entropy_coding_sync"] = b.u(1)
    if pps["tiles_enabled"]:
        raise ValueError("HEVC tiles outside the declared scope")
    pps["loop_filter_across_slices"] = b.u(1)
    pps["deblocking_control_present"] = b.u(1)
    pps["deblocking_override_enabled"] = 0
    pps["deblocking_disabled"] = 0
    pps["beta_offset_div2"] = 0
    pps["tc_offset_div2"] = 0
    if pps["deblocking_control_present"]:
        pps["deblocking_override_enabled"] = b.u(1)
        pps["deblocking_disabled"] = b.u(1)
        if not pps["deblocking_disabled"]:
            pps["beta_offset_div2"] = b.se()
            pps["tc_offset_div2"] = b.se()
    pps["scaling_data"] = None
    if b.u(1):  # pps_scaling_list_data_present
        pps["scaling_data"] = parse_scaling_list_data(b)
    pps["lists_modification"] = b.u(1)
    b.ue()  # log2_parallel_merge_level_minus2
    pps["slice_header_extension"] = b.u(1)
    if pps["transquant_bypass"]:
        raise ValueError("HEVC transquant bypass outside the declared scope")
    return pps


def parse_slice_header_intra(rbsp: bytes, nal_type: int, sps: dict,
                             pps: dict) -> dict:
    """I-slice segment header (§7.3.6.1); returns fields + the bit
    position of the first CABAC byte."""
    b = _Bits(rbsp)
    b.u(16)  # NAL header
    first = b.u(1)
    if not first:
        raise ValueError(
            "HEVC multi-slice pictures outside the declared scope"
        )
    if nal_type in IRAP_TYPES:
        b.u(1)  # no_output_of_prior_pics_flag
    slice_pps = b.ue()
    if slice_pps != pps["pps_id"]:
        raise ValueError("HEVC slice references an unknown PPS")
    for _ in range(pps["extra_slice_header_bits"]):
        b.u(1)
    slice_type = b.ue()
    if slice_type != 2:
        raise ValueError(
            f"HEVC slice_type {slice_type} outside the declared scope "
            "(intra I-slices only)"
        )
    if pps["output_flag_present"]:
        b.u(1)
    if nal_type not in (19, 20):  # non-IDR IRAP carries POC + RPS
        b.u(sps["log2_max_poc_lsb"])
        if not b.u(1):  # short_term_ref_pic_set_sps_flag
            _st_ref_pic_set(b, sps["num_st_rps"], sps["num_st_rps"],
                            sps["rps_deltas"])
        elif sps["num_st_rps"] > 1:
            bits = max(1, (sps["num_st_rps"] - 1).bit_length())
            b.u(bits)
        # long-term/temporal-mvp: absent in scope (flags off in SPS)
        if sps["temporal_mvp"]:
            b.u(1)
    sao_luma = sao_chroma = 0
    if sps["sao_enabled"]:
        sao_luma = b.u(1)
        sao_chroma = b.u(1)
    qp = pps["init_qp"] + b.se()
    if not -6 * (sps["bit_depth_luma"] - 8) <= qp <= 51:
        raise ValueError(f"HEVC slice QP {qp} out of range")
    cb_off, cr_off = 0, 0
    if pps["slice_chroma_qp_offsets_present"]:
        cb_off = b.se()
        cr_off = b.se()
    deblock_disabled = pps["deblocking_disabled"]
    beta_off = pps["beta_offset_div2"]
    tc_off = pps["tc_offset_div2"]
    if pps["deblocking_control_present"] and pps["deblocking_override_enabled"]:
        if b.u(1):  # deblocking_filter_override_flag
            deblock_disabled = b.u(1)
            if not deblock_disabled:
                beta_off = b.se()
                tc_off = b.se()
    if pps["loop_filter_across_slices"] and (
        sao_luma or sao_chroma or not deblock_disabled
    ):
        b.u(1)  # slice_loop_filter_across_slices_enabled_flag
    entry_points: list[int] = []
    if pps["entropy_coding_sync"]:
        n_ep = b.ue()
        if n_ep > 1 << 12:
            raise ValueError("HEVC entry-point count out of range")
        if n_ep:
            ep_len = b.ue() + 1
            if ep_len > 32:
                raise ValueError("HEVC entry-point offset length out of range")
            entry_points = [b.u(ep_len) + 1 for _ in range(n_ep)]
    if pps["slice_header_extension"]:
        n = b.ue()
        for _ in range(n):
            b.u(8)
    # byte_alignment(): alignment_bit_equal_to_one + zeros
    if b.u(1) != 1:
        raise ValueError("HEVC slice header alignment bit missing")
    while b.pos % 8:
        if b.u(1):
            raise ValueError("HEVC slice header alignment not zero-padded")
    return {"qp": qp, "cb_qp_offset": pps["cb_qp_offset"] + cb_off,
            "cr_qp_offset": pps["cr_qp_offset"] + cr_off,
            # deblocking QpC derives from the PPS offsets ONLY
            # (§8.7.2.5.5, matches libde265); the slice-inclusive
            # offsets above are for dequant.
            "pps_cb_qp_offset": pps["cb_qp_offset"],
            "pps_cr_qp_offset": pps["cr_qp_offset"],
            "deblock": not deblock_disabled,
            "entry_points": entry_points,
            "sao_luma": sao_luma, "sao_chroma": sao_chroma,
            "beta_offset_div2": beta_off, "tc_offset_div2": tc_off,
            "data_pos": b.pos}


def strip_emulation_with_map(data: bytes):
    """NAL payload → (rbsp, removal_rbsp_positions): like
    strip_emulation but also returns, for each removed emulation byte,
    the RBSP index it would have preceded — needed because WPP entry
    point offsets count emulation bytes (§7.4.7.1 NAL domain)."""
    out = bytearray()
    removed: list[int] = []
    zeros = 0
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if zeros >= 2 and b == 3 and i + 1 < n and data[i + 1] <= 3:
            removed.append(len(out))
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out), removed


def _nal_to_rbsp(removed: list[int], nal_pos: int) -> int:
    """Convert a NAL-domain byte offset to the RBSP domain."""
    import bisect

    # removal k sat at NAL index removed[k] + k
    lo, hi = 0, len(removed)
    while lo < hi:
        mid = (lo + hi) // 2
        if removed[mid] + mid < nal_pos:
            lo = mid + 1
        else:
            hi = mid
    return nal_pos - lo


def _rbsp_to_nal(removed: list[int], rbsp_pos: int) -> int:
    import bisect

    return rbsp_pos + bisect.bisect_right(removed, rbsp_pos)


# --- CABAC (§9.3) -----------------------------------------------------------
#
# The binary arithmetic core (rangeTabLPS, state transitions, renorm)
# is IDENTICAL to H.264 §9.3.4 and imported from h264_cabac (where it
# is extraction-verified against libde265). HEVC differs in the
# context-variable set and the init derivation (§9.3.2.2):
#   m = (initValue >> 4) * 5 - 45;  n = ((initValue & 15) << 3) - 16
#   pre = Clip3(1, 126, ((m * Clip3(0, 51, QpY)) >> 4) + n)
# Init values below are the initType-0 (I-slice) spec rows, each
# extraction-verified against libde265's rodata (stride-4 int32).

INIT_I = {
    "sao_merge": (153,),
    "cu_qp_delta": (154, 154),
    "transform_skip": (139, 139),
    "sao_type": (200,),
    "split_cu": (139, 141, 157),
    "part_mode": (184,),
    "prev_intra_luma": (184,),
    "intra_chroma": (63,),
    "split_transform": (153, 138, 138),
    "cbf_luma": (111, 141),
    "cbf_chroma": (94, 138, 182, 154),
    # shared by last_sig_coeff_x_prefix and _y_prefix (Tables 9-25/26)
    "last_x": (110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111,
               143, 127, 111, 79, 108, 123, 63),
    "last_y": (110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111,
               143, 127, 111, 79, 108, 123, 63),
    "csbf": (91, 171, 134, 141),
    "sig": (111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141,
            179, 153, 125, 107, 125, 141, 179, 153, 125, 107, 125, 141,
            179, 153, 125, 140, 139, 182, 182, 152, 136, 152, 136, 153,
            136, 139, 111, 136, 139, 111),
    "gt1": (140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92,
            139, 107, 122, 152, 140, 179, 166, 182, 140, 227, 122, 197),
    "gt2": (138, 153, 136, 167, 152, 152),
}


def _init_ctx(init_value: int, qp: int) -> list:
    m = (init_value >> 4) * 5 - 45
    n = ((init_value & 15) << 3) - 16
    pre = ((m * min(51, max(0, qp))) >> 4) + n
    pre = min(126, max(1, pre))
    if pre > 63:
        return [pre - 64, 1]  # [pStateIdx, valMps]
    return [63 - pre, 0]


class HevcCabac:
    """§9.3.4.3 arithmetic decoder over HEVC context variables."""

    __slots__ = ("data", "pos", "range", "offset", "ctx")

    def __init__(self, data: bytes, bit_pos: int, qp: int):
        if bit_pos % 8:
            raise ValueError("HEVC slice data must start byte-aligned")
        self.data = data
        self.pos = bit_pos
        self.range = 510
        self.offset = 0
        for _ in range(9):
            self.offset = (self.offset << 1) | self._bit()
        if self.offset >= 510:
            raise ValueError("HEVC CABAC initial offset out of range")
        self.ctx = {
            name: [_init_ctx(v, qp) for v in vals]
            for name, vals in INIT_I.items()
        }

    def _bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("torn HEVC CABAC stream: read past end")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def decision(self, name: str, idx: int) -> int:
        st = self.ctx[name][idx]
        state, mps = st
        lps = RANGE_TAB_LPS[state][(self.range >> 6) & 3]
        self.range -= lps
        if self.offset >= self.range:
            bit = 1 - mps
            self.offset -= self.range
            self.range = lps
            if state == 0:
                st[1] = 1 - mps
            st[0] = TRANS_IDX_LPS[state]
        else:
            bit = mps
            st[0] = TRANS_IDX_MPS[state]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return bit

    def bypass(self) -> int:
        self.offset = (self.offset << 1) | self._bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def bypass_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bypass()
        return v

    def terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._bit()
        return 0


# --- scan orders (§6.5) -----------------------------------------------------


def _diag_scan(size: int):
    out = []
    x = y = 0
    while len(out) < size * size:
        while y >= 0:
            if x < size and y < size:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
    return out


def _horiz_scan(size: int):
    return [(x, y) for y in range(size) for x in range(size)]


def _vert_scan(size: int):
    return [(x, y) for x in range(size) for y in range(size)]


#: scanIdx → generator; 0 = up-right diagonal, 1 = horizontal, 2 = vertical
_SCAN_GEN = (_diag_scan, _horiz_scan, _vert_scan)
_SCANS: dict = {}


def _scan(scan_idx: int, size: int):
    key = (scan_idx, size)
    if key not in _SCANS:
        _SCANS[key] = _SCAN_GEN[scan_idx](size)
    return _SCANS[key]


# 4x4 sig_coeff_flag context map (§9.3.4.2.5)
_SIG_MAP_4x4 = (0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8)


# --- inverse transforms (§8.6) ----------------------------------------------
#
# DCT-II matrices built from the spec's 4-point base + the odd-row
# coefficient tables via the even/odd symmetry T[k][N-1-n] =
# (-1)^k T[k][n]; DST-VII for 4x4 intra luma.

_T4 = np.array(
    [[64, 64, 64, 64],
     [83, 36, -36, -83],
     [64, -64, -64, 64],
     [36, -83, 83, -36]], dtype=np.int64)

_ODD8 = np.array(
    [[89, 75, 50, 18],
     [75, -18, -89, -50],
     [50, -89, 18, 75],
     [18, -50, 75, -89]], dtype=np.int64)

_ODD16 = np.array(
    [[90, 87, 80, 70, 57, 43, 25, 9],
     [87, 57, 9, -43, -80, -90, -70, -25],
     [80, 9, -70, -87, -25, 57, 90, 43],
     [70, -43, -87, 9, 90, 25, -80, -57],
     [57, -80, -25, 90, -9, -87, 43, 70],
     [43, -90, 57, 25, -87, 70, 9, -80],
     [25, -70, 90, -80, 43, 9, -57, 87],
     [9, -25, 43, -57, 70, -80, 87, -90]], dtype=np.int64)

_ODD32 = np.array(
    [[90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4],
     [90, 82, 67, 46, 22, -4, -31, -54, -73, -85, -90, -88, -78, -61, -38, -13],
     [88, 67, 31, -13, -54, -82, -90, -78, -46, -4, 38, 73, 90, 85, 61, 22],
     [85, 46, -13, -67, -90, -73, -22, 38, 82, 88, 54, -4, -61, -90, -78, -31],
     [82, 22, -54, -90, -61, 13, 78, 85, 31, -46, -90, -67, 4, 73, 88, 38],
     [78, -4, -82, -73, 13, 85, 67, -22, -88, -61, 31, 90, 54, -38, -90, -46],
     [73, -31, -90, -22, 78, 67, -38, -90, -13, 82, 61, -46, -88, -4, 85, 54],
     [67, -54, -78, 38, 85, -22, -90, 4, 90, 13, -88, -31, 82, 46, -73, -61],
     [61, -73, -46, 82, 31, -88, -13, 90, -4, -90, 22, 85, -38, -78, 54, 67],
     [54, -85, -4, 88, -46, -61, 82, 13, -90, 38, 67, -78, -22, 90, -31, -73],
     [46, -90, 38, 54, -90, 31, 61, -88, 22, 67, -85, 13, 73, -82, 4, 78],
     [38, -88, 73, -4, -67, 90, -46, -31, 85, -78, 13, 61, -90, 54, 22, -82],
     [31, -78, 90, -61, 4, 54, -88, 82, -38, -22, 73, -90, 67, -13, -46, 85],
     [22, -61, 85, -90, 73, -38, -4, 46, -78, 90, -82, 54, -13, -31, 67, -88],
     [13, -38, 61, -78, 88, -90, 85, -73, 54, -31, 4, 22, -46, 67, -82, 90],
     [4, -13, 22, -31, 38, -46, 54, -61, 67, -73, 78, -82, 85, -88, 90, -90]],
    dtype=np.int64)

_DST4 = np.array(
    [[29, 55, 74, 84],
     [74, 74, 0, -74],
     [84, -29, -74, 55],
     [55, -84, 74, -29]], dtype=np.int64)


def _build_dct(n: int) -> np.ndarray:
    if n == 4:
        return _T4
    half = _build_dct(n // 2)
    odd = {8: _ODD8, 16: _ODD16, 32: _ODD32}[n]
    t = np.zeros((n, n), dtype=np.int64)
    for k in range(n // 2):
        # full-row index 2k is always even → symmetric second half;
        # odd rows are antisymmetric (T[k][N-1-n] = (-1)^k T[k][n])
        t[2 * k, : n // 2] = half[k]
        t[2 * k, n // 2 :] = half[k][::-1]
        t[2 * k + 1, : n // 2] = odd[k]
        t[2 * k + 1, n // 2 :] = -odd[k][::-1]
    return t


_DCT = {n: _build_dct(n) for n in (4, 8, 16, 32)}
_LEVEL_SCALE = (40, 45, 51, 57, 64, 72)

# chroma QP mapping (Table 8-10): qPi 30..43 → qPc
_CHROMA_QP_MAP = (29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37)


def chroma_qp(qp_y: int, offset: int, qp_bd_offset: int = 0) -> int:
    """§8.6.1 QpC derivation (Table 8-10); qPi clips to
    [-QpBdOffsetC, 57] — the lower bound only bites above 8-bit."""
    qpi = min(57, max(-qp_bd_offset, qp_y + offset))
    if qpi < 30:
        return qpi
    if qpi > 43:
        return qpi - 6
    return _CHROMA_QP_MAP[qpi - 30]


def _dequant(coefs: np.ndarray, qp: int, log2n: int,
             m=None, bd: int = 8) -> np.ndarray:
    """§8.6.3 scaling: flat m=16, or a ScalingFactor matrix when the
    stream carries scaling lists. ``qp`` is Qp' (QpBdOffset included —
    always >= 0); bdShift = BitDepth + log2(nTbS) - 5."""
    bd_shift = bd + log2n - 5
    scale = _LEVEL_SCALE[qp % 6] << (qp // 6)
    mm = 16 if m is None else m
    d = (coefs * mm * scale + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767)


def _inv_transform(coefs: np.ndarray, dst: bool, bd: int = 8) -> np.ndarray:
    """§8.6.4 two-stage inverse transform (stage shifts 7 and
    20 - BitDepth)."""
    n = coefs.shape[0]
    t = _DST4 if dst else _DCT[n]
    tmp = (t.T @ coefs + 64) >> 7
    tmp = np.clip(tmp, -32768, 32767)
    s2 = 20 - bd
    return (tmp @ t + (1 << (s2 - 1))) >> s2


# --- intra prediction (§8.4.4) ----------------------------------------------

_ANGLES = (32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21,
           -26, -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13,
           17, 21, 26, 32)
_INV_ANGLES = {-2: -4096, -5: -1638, -9: -910, -13: -630, -17: -482,
               -21: -390, -26: -315, -32: -256}


def _ref_samples(plane: np.ndarray, avail: np.ndarray, x0: int, y0: int,
                 n: int, log2_min: int, mid: int = 128):
    """Reference array construction + substitution (§8.4.4.2.2).
    Returns (left[2n+1], top[2n+1]) where left[0] == top[0] == corner:
    left[i] = p[-1][i-1], top[i] = p[i-1][-1]."""
    h, w = plane.shape
    g = log2_min  # availability grid granularity (min TB log2 = 2)
    corner_ok = x0 > 0 and y0 > 0 and avail[(y0 - 1) >> g, (x0 - 1) >> g]
    left = np.full(2 * n + 1, -1, dtype=np.int32)
    top = np.full(2 * n + 1, -1, dtype=np.int32)
    if corner_ok:
        left[0] = top[0] = plane[y0 - 1, x0 - 1]
    if x0 > 0:
        for i in range(2 * n):
            y = y0 + i
            if y < h and avail[y >> g, (x0 - 1) >> g]:
                left[1 + i] = plane[y, x0 - 1]
    if y0 > 0:
        for i in range(2 * n):
            x = x0 + i
            if x < w and avail[(y0 - 1) >> g, x >> g]:
                top[1 + i] = plane[y0 - 1, x]
    # substitution: scan from left[2n] (bottom-left) → corner → top[2n]
    seq = np.concatenate([left[::-1], top[1:]])  # length 4n+1
    if (seq < 0).all():
        seq[:] = mid  # 1 << (BitDepth - 1)
    else:
        first = np.argmax(seq >= 0)
        seq[:first] = seq[first]
        for i in range(first + 1, len(seq)):
            if seq[i] < 0:
                seq[i] = seq[i - 1]
    left = seq[: 2 * n + 1][::-1].copy()
    top = np.concatenate([seq[2 * n : 2 * n + 1], seq[2 * n + 1 :]]).copy()
    return left, top


def _filter_refs(left: np.ndarray, top: np.ndarray, n: int, mode: int,
                 strong: bool, bd: int = 8):
    """§8.4.4.2.3 reference smoothing (luma, nTbS > 4)."""
    if mode == 1 or n == 4:
        return left, top
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thres = {8: 7, 16: 1, 32: 0}[n]
    if min_dist <= thres:
        return left, top
    if n == 32 and strong:
        bd_thres = 1 << (bd - 5)
        bi_top = abs(int(top[0]) + int(top[2 * n]) - 2 * int(top[n])) < bd_thres
        bi_left = abs(int(left[0]) + int(left[2 * n]) - 2 * int(left[n])) < bd_thres
        if bi_top and bi_left:
            fl = left.copy()
            ft = top.copy()
            i = np.arange(1, 2 * n)
            fl[1 : 2 * n] = ((2 * n - i) * int(left[0]) + i * int(left[2 * n]) + n) >> 6
            ft[1 : 2 * n] = ((2 * n - i) * int(top[0]) + i * int(top[2 * n]) + n) >> 6
            return fl, ft
    fl = left.copy()
    ft = top.copy()
    fl[0] = ft[0] = (int(left[1]) + 2 * int(left[0]) + int(top[1]) + 2) >> 2
    fl[1 : 2 * n] = (left[: 2 * n - 1] + 2 * left[1 : 2 * n] + left[2 : 2 * n + 1] + 2) >> 2
    ft[1 : 2 * n] = (top[: 2 * n - 1] + 2 * top[1 : 2 * n] + top[2 : 2 * n + 1] + 2) >> 2
    # last samples stay unfiltered (spec keeps p[-1][2N-1], p[2N-1][-1])
    fl[2 * n] = left[2 * n]
    ft[2 * n] = top[2 * n]
    return fl, ft


def _predict_intra(left: np.ndarray, top: np.ndarray, n: int, mode: int,
                   is_luma: bool, maxv: int = 255) -> np.ndarray:
    """§8.4.4.2.4-6 sample prediction; returns [n, n] int32.
    left[1+i] = p[-1][i], top[1+i] = p[i][-1], left[0] = p[-1][-1]."""
    out = np.empty((n, n), dtype=np.int32)
    if mode == 0:  # planar
        x = np.arange(n)
        y = np.arange(n)
        px_left = left[1 : n + 1]  # p[-1][y]
        px_top = top[1 : n + 1]  # p[x][-1]
        tr = int(top[n + 1])  # p[nTbS][-1]
        bl = int(left[n + 1])  # p[-1][nTbS]
        h = (n - 1 - x)[None, :] * px_left[:, None] + (x + 1)[None, :] * tr
        v = (n - 1 - y)[:, None] * px_top[None, :] + (y + 1)[:, None] * bl
        out = (h + v + n) >> (int(np.log2(n)) + 1)
        return out
    if mode == 1:  # DC
        dc = (int(top[1 : n + 1].sum()) + int(left[1 : n + 1].sum()) + n) >> (
            int(np.log2(n)) + 1
        )
        out[:, :] = dc
        if is_luma and n < 32:
            out[0, 1:] = (top[2 : n + 1] + 3 * dc + 2) >> 2
            out[1:, 0] = (left[2 : n + 1] + 3 * dc + 2) >> 2
            out[0, 0] = (int(left[1]) + 2 * dc + int(top[1]) + 2) >> 2
        return out
    angle = _ANGLES[mode - 2]
    if mode >= 18:  # vertical-ish: main reference is the top row
        main, side = top, left
    else:
        main, side = left, top
    ref = np.empty(3 * n + 2, dtype=np.int32)  # ref[n + k] = spec ref[k]
    base = n
    ref[base : base + 2 * n + 1] = main[: 2 * n + 1]
    if angle < 0:
        inv = _INV_ANGLES[angle]
        last = (n * angle) >> 5
        for k in range(-1, last - 1, -1):
            # side[idx] = p[-1][-1 + idx] (idx 0 is the corner sample)
            ref[base + k] = side[min((k * inv + 128) >> 8, 2 * n)]
    idx = np.arange(1, n + 1)
    i_idx = (idx * angle) >> 5
    i_fact = (idx * angle) & 31
    pred = np.empty((n, n), dtype=np.int32)
    cols = np.arange(n)
    for j in range(n):  # j = distance index (y for vertical, x for horiz)
        off = base + i_idx[j] + 1
        row_ref = ref[off + cols]
        if i_fact[j]:
            row_next = ref[off + cols + 1]
            pred[j] = ((32 - i_fact[j]) * row_ref + i_fact[j] * row_next + 16) >> 5
        else:
            pred[j] = row_ref
    if mode >= 18:
        out = pred  # pred[y][x]
        if mode == 26 and is_luma and n < 32:
            edge = top[1] + ((left[1 : n + 1].astype(np.int32) - int(left[0])) >> 1)
            out[:, 0] = np.clip(edge, 0, maxv)
    else:
        out = pred.T  # computed [x][y] → transpose
        if mode == 10 and is_luma and n < 32:
            edge = left[1] + ((top[1 : n + 1].astype(np.int32) - int(top[0])) >> 1)
            out[0, :] = np.clip(edge, 0, maxv)
    return out


# --- residual coding (§7.3.8.11 / §9.3.4.2) ---------------------------------


def _last_ctx(log2n: int, luma: bool):
    if luma:
        return 3 * (log2n - 2) + ((log2n - 1) >> 2), (log2n + 1) >> 2
    return 15, log2n - 2


def _sig_ctx(xc: int, yc: int, log2n: int, c_idx: int, scan_idx: int,
             csbf_right: int, csbf_below: int) -> int:
    if log2n == 2:
        sig = _SIG_MAP_4x4[(yc << 2) + xc]
    elif xc + yc == 0:
        sig = 0
    else:
        prev = csbf_right + 2 * csbf_below
        xp, yp = xc & 3, yc & 3
        if prev == 0:
            sig = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
        elif prev == 1:
            sig = 2 if yp == 0 else (1 if yp == 1 else 0)
        elif prev == 2:
            sig = 2 if xp == 0 else (1 if xp == 1 else 0)
        else:
            sig = 2
        if c_idx == 0:
            if (xc >> 2) or (yc >> 2):
                sig += 3
            sig += (9 if scan_idx == 0 else 15) if log2n == 3 else 21
        else:
            sig += 9 if log2n == 3 else 12
    return sig if c_idx == 0 else 27 + sig


def _read_remaining(c: HevcCabac, rice: int) -> int:
    prefix = 0
    while prefix < 32 and c.bypass():
        prefix += 1
    if prefix >= 32:
        raise ValueError("torn HEVC stream: runaway Rice prefix")
    if prefix <= 3:
        return (prefix << rice) + c.bypass_bits(rice)
    return (((1 << (prefix - 3)) + 2) << rice) + c.bypass_bits(
        prefix - 3 + rice
    )


def _decode_residual(c: HevcCabac, log2n: int, c_idx: int,
                     scan_idx: int, sdh: bool = False,
                     ts_enabled: bool = False):
    n = 1 << log2n
    luma = c_idx == 0
    ts = 0
    if ts_enabled and log2n == 2:
        # §7.3.8.11: transform_skip_flag for 4x4 TBs (v1 max TS size)
        ts = c.decision("transform_skip", 0 if luma else 1)
    # last significant coefficient position
    off, shift = _last_ctx(log2n, luma)
    cmax = (log2n << 1) - 1
    name_x, name_y = ("last_x", "last_y")
    px = 0
    while px < cmax and c.decision(name_x, off + (px >> shift)):
        px += 1
    py = 0
    while py < cmax and c.decision(name_y, off + (py >> shift)):
        py += 1
    if px > 3:
        bits = (px >> 1) - 1
        px = ((2 + (px & 1)) << bits) + c.bypass_bits(bits)
    if py > 3:
        bits = (py >> 1) - 1
        py = ((2 + (py & 1)) << bits) + c.bypass_bits(bits)
    if scan_idx == 2:
        px, py = py, px
    if px >= n or py >= n:
        raise ValueError("HEVC last-significant position out of block")

    inner = _scan(scan_idx, 4)
    inner_pos = {p: i for i, p in enumerate(inner)}
    nsb = n >> 2
    sb_scan = _scan(scan_idx, nsb)
    sb_pos = {p: i for i, p in enumerate(sb_scan)}
    last_sb = sb_pos[(px >> 2, py >> 2)]
    last_in_sb = inner_pos[(px & 3, py & 3)]

    coefs = np.zeros((n, n), dtype=np.int64)
    csbf = np.zeros((nsb, nsb), dtype=np.uint8)
    c1 = 1  # greater1Ctx carried across subblocks
    for i in range(last_sb, -1, -1):
        sbx, sby = sb_scan[i]
        if i == last_sb or i == 0:
            flag = 1
        else:
            right = csbf[sby, sbx + 1] if sbx + 1 < nsb else 0
            below = csbf[sby + 1, sbx] if sby + 1 < nsb else 0
            ctx = min(1, right + below) + (0 if luma else 2)
            flag = c.decision("csbf", ctx)
        csbf[sby, sbx] = flag
        infer_dc = 1 if (flag and 0 < i < last_sb) else 0
        if not flag:
            continue
        right = csbf[sby, sbx + 1] if sbx + 1 < nsb else 0
        below = csbf[sby + 1, sbx] if sby + 1 < nsb else 0
        sig_pos = []
        start = last_in_sb if i == last_sb else 15
        if i == last_sb:
            sig_pos.append(start)  # the last coefficient itself
            start -= 1
        for sp in range(start, -1, -1):
            if sp > 0 or not infer_dc:
                xin, yin = inner[sp]
                ctx = _sig_ctx((sbx << 2) + xin, (sby << 2) + yin, log2n,
                               c_idx, scan_idx, right, below)
                if c.decision("sig", ctx):
                    sig_pos.append(sp)
                    infer_dc = 0
            else:
                sig_pos.append(sp)  # inferred DC of a coded subblock
        if not sig_pos:
            continue
        # greater1 flags (first 8), greater2 (first gt1), signs, levels
        ctx_set = (2 if (i > 0 and luma) else 0) + (1 if c1 == 0 else 0)
        c1 = 1
        gt1 = []
        for j, sp in enumerate(sig_pos):
            if j >= 8:
                break
            base = (0 if luma else 16) + 4 * ctx_set
            g = c.decision("gt1", base + c1)
            gt1.append(g)
            if g:
                c1 = 0
            elif 0 < c1 < 3:
                c1 += 1
        gt2 = 0
        gt2_idx = next((j for j, g in enumerate(gt1) if g), None)
        if gt2_idx is not None:
            gt2 = c.decision("gt2", (0 if luma else 4) + ctx_set)
        # sign data hiding (§8.6.2/7.3.8.11): when enabled and the
        # subblock's sig span exceeds 3 scan positions, the sign of
        # the LAST-parsed coefficient (lowest scan position) is not
        # coded — it is the parity of the subblock's absolute sum
        hidden = sdh and (sig_pos[0] - sig_pos[-1]) > 3
        signs = [c.bypass() for _ in range(len(sig_pos) - (1 if hidden else 0))]
        rice = 0
        first2 = 1
        levels = []
        for j, sp in enumerate(sig_pos):
            lvl = 1
            if j < len(gt1):
                lvl += gt1[j]
                if j == gt2_idx:
                    lvl += gt2
            base_level = (2 + first2) if j < 8 else 1
            if lvl == base_level:
                lvl = base_level + _read_remaining(c, rice)
                if lvl > 3 * (1 << rice):
                    rice = min(rice + 1, 4)
            if lvl >= 2:
                first2 = 0
            levels.append(lvl)
        if hidden:
            signs.append(1 if sum(levels) & 1 else 0)
        for j, sp in enumerate(sig_pos):
            xin, yin = inner[sp]
            coefs[(sby << 2) + yin, (sbx << 2) + xin] = (
                -levels[j] if signs[j] else levels[j]
            )
    return coefs, ts


# --- frame decode -----------------------------------------------------------


class _FrameDecoder:
    def __init__(self, sps: dict, pps: dict, hdr: dict, rbsp: bytes,
                 emu_removed: list | None = None):
        self.sps = sps
        self.pps = pps
        self.bd = sps["bit_depth_luma"]
        self.maxv = (1 << self.bd) - 1
        self.mid = 1 << (self.bd - 1)
        self.qp_bd = 6 * (self.bd - 8)  # QpBdOffsetY == QpBdOffsetC here
        self.qp = hdr["qp"]
        self.qp_cb = chroma_qp(self.qp, hdr["cb_qp_offset"], self.qp_bd)
        self.qp_cr = chroma_qp(self.qp, hdr["cr_qp_offset"], self.qp_bd)
        w, h = sps["pic_width"], sps["pic_height"]
        self.w, self.h = w, h
        self.cw, self.ch = w >> 1, h >> 1
        self.planes = [
            np.zeros((h, w), dtype=np.int32),
            np.zeros((self.ch, self.cw), dtype=np.int32),
            np.zeros((self.ch, self.cw), dtype=np.int32),
        ]
        self.avail_y = np.zeros(((h + 3) >> 2, (w + 3) >> 2), dtype=bool)
        self.avail_c = np.zeros(
            ((self.ch + 3) >> 2, (self.cw + 3) >> 2), dtype=bool
        )
        lmin = sps["log2_min_cb"]
        self.lmin = lmin
        self.ct_depth = np.zeros(
            ((h + (1 << lmin) - 1) >> lmin, (w + (1 << lmin) - 1) >> lmin),
            dtype=np.int8,
        )
        self.mode_y = np.full(((h + 3) >> 2, (w + 3) >> 2), 1, dtype=np.int8)
        # MPM availability is z-scan PARSE order (§6.4.1): a PU's modes
        # are available to later PUs of the same CU before any of the
        # CU's samples are reconstructed — tracked separately from the
        # reconstruction-time sample availability grid
        self.mode_avail = np.zeros_like(self.avail_y)
        self.sdh = bool(pps["sign_data_hiding"])
        self.hdr = hdr
        # TU-edge grids for the deblocking filter (4-sample cells)
        self.edge_v_y = np.zeros_like(self.avail_y)
        self.edge_h_y = np.zeros_like(self.avail_y)
        self.edge_v_c = np.zeros_like(self.avail_c)
        self.edge_h_c = np.zeros_like(self.avail_c)
        self.rbsp = rbsp
        self.emu_removed = emu_removed or []
        self.cabac = HevcCabac(rbsp, hdr["data_pos"], self.qp)
        # cu_qp_delta (§8.6.1): per-4x4 luma QP map + quant-group state
        self.qp_enabled = bool(pps["cu_qp_delta_enabled"])
        self.log2_min_qg = sps["log2_ctb"] - pps["diff_cu_qp_delta_depth"]
        self.qp_map = np.full(self.avail_y.shape, self.qp, dtype=np.int16)
        self.qp_prev = self.qp  # last CU's QP in decoding order
        self.cur_qp = self.qp
        self.qp_pred = self.qp
        self.qp_delta_coded = True  # no QG open yet
        self.qg_rect = (0, 0, 1 << sps["log2_ctb"])
        self.ts_enabled = bool(pps["transform_skip"])
        sd = pps["scaling_data"] or sps["scaling_data"]
        self.scaling = build_scaling_factors(sd) if sd else None

    def _parse_sao(self, ctb_x, ctb_y):
        """§7.3.8.3: per-CTU SAO parameters (merge or explicit).
        Returns [ [type, offsets(4), band_pos_or_eo_class] per cIdx ]."""
        c = self.cabac
        hdr = self.hdr
        if ctb_x > 0 and c.decision("sao_merge", 0):
            return self.sao_params[ctb_y][ctb_x - 1]
        if ctb_y > 0 and c.decision("sao_merge", 0):
            return self.sao_params[ctb_y - 1][ctb_x]
        out = []
        for c_idx in range(3):
            if (c_idx == 0 and not hdr["sao_luma"]) or (
                c_idx > 0 and not hdr["sao_chroma"]
            ):
                out.append((0, (0, 0, 0, 0), 0))
                continue
            if c_idx == 2:
                typ = out[1][0]  # cr shares cb's type
            else:
                if c.decision("sao_type", 0):
                    typ = 1 + c.bypass()
                else:
                    typ = 0
            if typ == 0:
                out.append((0, (0, 0, 0, 0), 0))
                continue
            # sao_offset_abs cMax = (1 << (Min(bitDepth, 10) - 5)) - 1
            cmax = (1 << (min(self.bd, 10) - 5)) - 1
            offs = []
            for _ in range(4):
                v = 0
                while v < cmax and c.bypass():
                    v += 1
                offs.append(v)
            if typ == 1:  # band: explicit signs + band position
                offs = [
                    (-v if (v and c.bypass()) else v) for v in offs
                ]
                extra = c.bypass_bits(5)
            else:  # edge: categories 1,2 positive / 3,4 negative
                offs = [offs[0], offs[1], -offs[2], -offs[3]]
                if c_idx == 2:
                    extra = out[1][2]  # cr shares cb's EO class
                else:
                    extra = c.bypass_bits(2)
            out.append((typ, tuple(offs), extra))
        return out

    def _apply_sao(self):
        """§8.7.3 on the deblocked picture: per CTB, per component,
        band or edge offsets; output into fresh planes so every
        neighbor read sees pre-SAO samples."""
        ctb = 1 << self.sps["log2_ctb"]
        neigh = {0: (0, -1), 1: (-1, 0), 2: (-1, -1), 3: (-1, 1)}
        for pi in range(3):
            src = self.planes[pi]
            dst = src.copy()
            shift = 1 if pi else 0
            h, w = src.shape
            for cy, row in enumerate(self.sao_params):
                for cx, params in enumerate(row):
                    typ, offs, extra = params[pi]
                    if typ == 0:
                        continue
                    x0 = (cx * ctb) >> shift
                    y0 = (cy * ctb) >> shift
                    x1 = min(w, ((cx + 1) * ctb) >> shift)
                    y1 = min(h, ((cy + 1) * ctb) >> shift)
                    blk = src[y0:y1, x0:x1].astype(np.int32)
                    if typ == 1:  # band offset (band width scales w/ bd)
                        band = blk >> (self.bd - 5)
                        res = blk.copy()
                        for k in range(4):
                            res[band == ((extra + k) & 31)] += offs[k]
                        dst[y0:y1, x0:x1] = np.clip(res, 0, self.maxv)
                    else:  # edge offset
                        dy, dx = neigh[extra]
                        ys, xs = np.mgrid[y0:y1, x0:x1]
                        n0y, n0x = ys + dy, xs + dx
                        n1y, n1x = ys - dy, xs - dx
                        ok = (
                            (n0y >= 0) & (n0y < h) & (n0x >= 0) & (n0x < w)
                            & (n1y >= 0) & (n1y < h) & (n1x >= 0) & (n1x < w)
                        )
                        n0 = src[np.clip(n0y, 0, h - 1), np.clip(n0x, 0, w - 1)].astype(np.int32)
                        n1 = src[np.clip(n1y, 0, h - 1), np.clip(n1x, 0, w - 1)].astype(np.int32)
                        idx = 2 + np.sign(blk - n0) + np.sign(blk - n1)
                        res = blk.copy()
                        # edgeIdx→category: {0:1, 1:2, 2:none, 3:3, 4:4}
                        for eidx, k in ((0, 0), (1, 1), (3, 2), (4, 3)):
                            sel = ok & (idx == eidx)
                            res[sel] += offs[k]
                        dst[y0:y1, x0:x1] = np.clip(res, 0, self.maxv)
            self.planes[pi] = dst

    def decode(self):
        ctb = 1 << self.sps["log2_ctb"]
        n_cols = (self.w + ctb - 1) // ctb
        n_rows = (self.h + ctb - 1) // ctb
        use_sao = bool(self.hdr.get("sao_luma") or self.hdr.get("sao_chroma"))
        self.sao_params = [[None] * n_cols for _ in range(n_rows)]
        wpp = bool(self.pps["entropy_coding_sync"])
        entry_points = self.hdr.get("entry_points") or []
        if wpp and len(entry_points) != max(0, n_rows - 1):
            raise ValueError(
                "HEVC WPP entry-point count does not match the CTB rows"
            )
        data0 = self.hdr["data_pos"] >> 3  # first slice-data byte
        wpp_sync = None  # context snapshot after CTU 1 of each row
        for row, y0 in enumerate(range(0, self.h, ctb)):
            if wpp:
                # §8.6.1: with entropy sync, qPY_PREV resets to
                # SliceQpY at the start of every CTB row
                self.cur_qp = self.qp
            if wpp and row > 0:
                # §9.3.1: re-init the arithmetic engine at the row's
                # entry point — offsets are NAL-domain bytes (§7.4.7.1
                # counts emulation prevention bytes), so map through
                # the removal positions — and restore the contexts
                # stored after the above row's second CTB
                nal_off = _rbsp_to_nal(self.emu_removed, data0) + sum(
                    entry_points[:row]
                )
                off = _nal_to_rbsp(self.emu_removed, nal_off)
                self.cabac = HevcCabac(self.rbsp, off * 8, self.qp)
                if wpp_sync is not None:
                    self.cabac.ctx = {
                        k: [st.copy() for st in v]
                        for k, v in wpp_sync.items()
                    }
            for col, x0 in enumerate(range(0, self.w, ctb)):
                if use_sao:
                    self.sao_params[y0 // ctb][x0 // ctb] = self._parse_sao(
                        x0 // ctb, y0 // ctb
                    )
                self._coding_quadtree(x0, y0, self.sps["log2_ctb"], 0)
                if wpp and col == min(1, n_cols - 1):
                    wpp_sync = {
                        k: [st.copy() for st in v]
                        for k, v in self.cabac.ctx.items()
                    }
                last = x0 + ctb >= self.w and y0 + ctb >= self.h
                end = self.cabac.terminate()
                if bool(end) != last:
                    raise ValueError(
                        "HEVC end_of_slice_segment_flag mismatch "
                        "(desynced CABAC or truncated slice)"
                    )
                if wpp and not last and x0 + ctb >= self.w:
                    if self.cabac.terminate() != 1:
                        raise ValueError(
                            "HEVC end_of_subset_one_bit missing at a "
                            "WPP row end"
                        )
        if self.hdr.get("deblock"):
            bo = self.hdr["beta_offset_div2"]
            to = self.hdr["tc_offset_div2"]
            qm = self.qp_map

            def qp_luma(py, px, qy, qx):
                return (int(qm[py >> 2, px >> 2])
                        + int(qm[qy >> 2, qx >> 2]) + 1) >> 1

            def qp_chroma(off):
                def f(py, px, qy, qx):
                    # chroma tC uses the average LUMA QP of the two
                    # sides mapped through the chroma table (§8.7.2.5.5)
                    avg = (int(qm[(py * 2) >> 2, (px * 2) >> 2])
                           + int(qm[(qy * 2) >> 2, (qx * 2) >> 2]) + 1) >> 1
                    return chroma_qp(avg, off)
                return f

            _deblock_plane(self.planes[0], self.edge_v_y, self.edge_h_y,
                           qp_luma, bo, to, luma=True, bd=self.bd)
            _deblock_plane(self.planes[1], self.edge_v_c, self.edge_h_c,
                           qp_chroma(self.hdr["pps_cb_qp_offset"]), bo, to,
                           luma=False, bd=self.bd)
            _deblock_plane(self.planes[2], self.edge_v_c, self.edge_h_c,
                           qp_chroma(self.hdr["pps_cr_qp_offset"]), bo, to,
                           luma=False, bd=self.bd)
        if use_sao:
            self._apply_sao()
        dt = np.uint8 if self.bd == 8 else np.uint16
        return (
            np.clip(self.planes[0], 0, self.maxv).astype(dt),
            np.clip(self.planes[1], 0, self.maxv).astype(dt),
            np.clip(self.planes[2], 0, self.maxv).astype(dt),
        )

    # -- coding quadtree (§7.3.8.4)

    def _coding_quadtree(self, x0, y0, log2n, depth):
        size = 1 << log2n
        if self.qp_enabled and log2n >= self.log2_min_qg:
            # a new quantization group begins (§7.3.8.8 note / §8.6.1):
            # finalize the previous QG's QP as qPY_PREV, then predict
            self.qp_prev = self.cur_qp
            a = b = self.qp_prev
            lctb = self.sps["log2_ctb"]
            # neighbors count only when inside the SAME CTB (§8.6.1)
            if x0 > 0 and ((x0 - 1) >> lctb) == (x0 >> lctb):
                a = int(self.qp_map[y0 >> 2, (x0 - 1) >> 2])
            if y0 > 0 and ((y0 - 1) >> lctb) == (y0 >> lctb):
                b = int(self.qp_map[(y0 - 1) >> 2, x0 >> 2])
            self.qp_pred = (a + b + 1) >> 1
            self.cur_qp = self.qp_pred
            self.qp_delta_coded = False
            self.qg_rect = (x0, y0, size)
        inside = x0 + size <= self.w and y0 + size <= self.h
        if inside and log2n > self.sps["log2_min_cb"]:
            ctx = 0
            if x0 > 0:
                ctx += int(
                    self.ct_depth[y0 >> self.lmin, (x0 - 1) >> self.lmin]
                    > depth
                )
            if y0 > 0:
                ctx += int(
                    self.ct_depth[(y0 - 1) >> self.lmin, x0 >> self.lmin]
                    > depth
                )
            split = self.cabac.decision("split_cu", ctx)
        else:
            split = log2n > self.sps["log2_min_cb"]
        if split:
            half = size >> 1
            for dx, dy in ((0, 0), (half, 0), (0, half), (half, half)):
                x1, y1 = x0 + dx, y0 + dy
                if x1 < self.w and y1 < self.h:
                    self._coding_quadtree(x1, y1, log2n - 1, depth + 1)
        else:
            self.ct_depth[
                y0 >> self.lmin : (y0 + size) >> self.lmin,
                x0 >> self.lmin : (x0 + size) >> self.lmin,
            ] = depth
            self._coding_unit(x0, y0, log2n)

    # -- coding unit (§7.3.8.5) — always MODE_INTRA in an I-slice

    def _mpm_candidate(self, x, y, cur_x0, cur_y0):
        """Neighbor luma mode for MPM: DC when unavailable or (above)
        outside the current CTU (§8.4.2)."""
        if x < 0 or y < 0:
            return 1
        if y == cur_y0 - 1:  # above neighbor
            if (y >> self.sps["log2_ctb"]) != (cur_y0 >> self.sps["log2_ctb"]):
                return 1
        if not self.mode_avail[y >> 2, x >> 2]:
            return 1
        return int(self.mode_y[y >> 2, x >> 2])

    def _coding_unit(self, x0, y0, log2n):
        c = self.cabac
        size = 1 << log2n
        part_nxn = False
        if log2n == self.sps["log2_min_cb"] and c.decision("part_mode", 0) == 0:
            part_nxn = True
        pb = size >> 1 if part_nxn else size
        pus = (
            [(x0, y0), (x0 + pb, y0), (x0, y0 + pb), (x0 + pb, y0 + pb)]
            if part_nxn
            else [(x0, y0)]
        )
        prev_flags = [c.decision("prev_intra_luma", 0) for _ in pus]
        modes = []
        for i, (xp, yp) in enumerate(pus):
            cand_a = self._mpm_candidate(xp - 1, yp, xp, yp)
            cand_b = self._mpm_candidate(xp, yp - 1, xp, yp)
            if cand_a == cand_b:
                if cand_a < 2:
                    mpm = [0, 1, 26]
                else:
                    mpm = [cand_a, 2 + ((cand_a + 29) % 32),
                           2 + ((cand_a - 2 + 1) % 32)]
            else:
                mpm = [cand_a, cand_b]
                if 0 not in mpm:
                    mpm.append(0)
                elif 1 not in mpm:
                    mpm.append(1)
                else:
                    mpm.append(26)
            if prev_flags[i]:
                idx = 0
                if c.bypass():
                    idx = 1 + c.bypass()
                mode = mpm[idx]
            else:
                rem = c.bypass_bits(5)
                for m in sorted(mpm):
                    if rem >= m:
                        rem += 1
                mode = rem
            modes.append(mode)
            self.mode_y[yp >> 2 : (yp + pb) >> 2, xp >> 2 : (xp + pb) >> 2] = mode
            self.mode_avail[
                yp >> 2 : (yp + pb) >> 2, xp >> 2 : (xp + pb) >> 2
            ] = True
        if c.decision("intra_chroma", 0):
            cand = (0, 26, 10, 1)[c.bypass_bits(2)]
            chroma_mode = 34 if cand == modes[0] else cand
        else:
            chroma_mode = modes[0]
        self._transform_tree(
            x0, y0, x0, y0, log2n, 0, 0, part_nxn, modes, chroma_mode, 1, 1
        )
        # deblock QP semantics (matches libde265/HM): each CU carries
        # the QG value as of ITS OWN completion — prediction for CUs
        # decoded before the QG's delta carrier, final from the
        # carrier on (dequant inside the carrier is unaffected: the
        # delta parses at the first cbf TU, before any residual use)
        self.qp_map[
            y0 >> 2 : (y0 + size) >> 2, x0 >> 2 : (x0 + size) >> 2
        ] = self.cur_qp

    # -- transform tree (§7.3.8.8)

    def _transform_tree(self, x0, y0, x_base, y_base, log2n, depth, blk_idx,
                        part_nxn, modes, chroma_mode, cbf_cb_par, cbf_cr_par):
        c = self.cabac
        sps = self.sps
        max_depth = sps["max_trafo_depth_intra"] + (1 if part_nxn else 0)
        can_parse = (
            log2n <= sps["log2_max_tb"]
            and log2n > sps["log2_min_tb"]
            and depth < max_depth
            and not (part_nxn and depth == 0)
        )
        if can_parse:
            split = c.decision("split_transform", 5 - log2n)
        else:
            split = int(
                log2n > sps["log2_max_tb"] or (part_nxn and depth == 0)
            )
        cbf_cb, cbf_cr = cbf_cb_par, cbf_cr_par
        if log2n > 2:
            if depth == 0 or cbf_cb_par:
                cbf_cb = c.decision("cbf_chroma", depth)
            else:
                cbf_cb = 0
            if depth == 0 or cbf_cr_par:
                cbf_cr = c.decision("cbf_chroma", depth)
            else:
                cbf_cr = 0
        if split:
            half = 1 << (log2n - 1)
            for bi, (dx, dy) in enumerate(
                ((0, 0), (half, 0), (0, half), (half, half))
            ):
                self._transform_tree(
                    x0 + dx, y0 + dy, x0, y0, log2n - 1, depth + 1, bi,
                    part_nxn, modes, chroma_mode, cbf_cb, cbf_cr,
                )
            return
        cbf_luma = c.decision("cbf_luma", 1 if depth == 0 else 0)
        self._transform_unit(
            x0, y0, x_base, y_base, log2n, depth, blk_idx, part_nxn,
            modes, chroma_mode, cbf_luma, cbf_cb, cbf_cr,
        )

    # -- transform unit: parse residuals + reconstruct in decode order

    def _luma_mode_at(self, x0, y0):
        return int(self.mode_y[y0 >> 2, x0 >> 2])

    def _scan_for(self, log2n, c_idx, mode):
        if log2n == 2 or (log2n == 3 and c_idx == 0):
            if 6 <= mode <= 14:
                return 2
            if 22 <= mode <= 30:
                return 1
        return 0

    def _parse_cu_qp_delta(self):
        c = self.cabac
        prefix = 0
        while prefix < 5 and c.decision("cu_qp_delta", 0 if prefix == 0 else 1):
            prefix += 1
        val = prefix
        if prefix == 5:  # EG0 suffix
            k = 0
            while c.bypass():
                k += 1
                if k > 16:
                    raise ValueError("torn cu_qp_delta EG0 prefix")
            val = 5 + (1 << k) - 1 + c.bypass_bits(k)
        if val and c.bypass():
            val = -val
        # §8.6.1: QpY = ((qPY_PRED + delta + 52 + 2*QpBdOffsetY)
        #               % (52 + QpBdOffsetY)) - QpBdOffsetY
        off = self.qp_bd
        self.cur_qp = (
            (self.qp_pred + val + 52 + 2 * off) % (52 + off)
        ) - off
        self.qp_delta_coded = True

    def _transform_unit(self, x0, y0, x_base, y_base, log2n, depth, blk_idx,
                        part_nxn, modes, chroma_mode, cbf_luma, cbf_cb,
                        cbf_cr):
        if (self.qp_enabled and not self.qp_delta_coded
                and (cbf_luma or cbf_cb or cbf_cr)):
            self._parse_cu_qp_delta()
        mode = self._luma_mode_at(x0, y0)
        res = None
        if cbf_luma:
            res = _decode_residual(
                self.cabac, log2n, 0, self._scan_for(log2n, 0, mode),
                self.sdh, self.ts_enabled,
            )
        self._reconstruct(0, x0, y0, log2n, mode, res, self.cur_qp)
        if log2n > 2:
            cx, cy, clog2 = x0 >> 1, y0 >> 1, log2n - 1
            self._chroma_unit(cx, cy, clog2, chroma_mode, cbf_cb, cbf_cr)
        elif blk_idx == 3:
            cx, cy, clog2 = x_base >> 1, y_base >> 1, 2
            self._chroma_unit(cx, cy, clog2, chroma_mode, cbf_cb, cbf_cr)

    def _chroma_unit(self, cx, cy, clog2, chroma_mode, cbf_cb, cbf_cr):
        scan = self._scan_for(clog2, 1, chroma_mode)
        res_cb = (
            _decode_residual(self.cabac, clog2, 1, scan, self.sdh,
                             self.ts_enabled)
            if cbf_cb else None
        )
        res_cr = (
            _decode_residual(self.cabac, clog2, 2, scan, self.sdh,
                             self.ts_enabled)
            if cbf_cr else None
        )
        hdr = self.hdr
        qcb = chroma_qp(self.cur_qp, hdr["cb_qp_offset"], self.qp_bd)
        qcr = chroma_qp(self.cur_qp, hdr["cr_qp_offset"], self.qp_bd)
        self._reconstruct(1, cx, cy, clog2, chroma_mode, res_cb, qcb)
        self._reconstruct(2, cx, cy, clog2, chroma_mode, res_cr, qcr)

    def _reconstruct(self, plane_idx, x0, y0, log2n, mode, res, qp):
        n = 1 << log2n
        plane = self.planes[plane_idx]
        avail = self.avail_y if plane_idx == 0 else self.avail_c
        left, top = _ref_samples(plane, avail, x0, y0, n, 2, self.mid)
        if plane_idx == 0:
            left, top = _filter_refs(
                left, top, n, mode,
                bool(self.sps["strong_intra_smoothing"]), self.bd,
            )
        pred = _predict_intra(left, top, n, mode, plane_idx == 0, self.maxv)
        if res is not None:
            coefs, ts = res
            m = None
            # §8.6.3: m[x][y]=16 for transform_skip only when nTbS>4;
            # v1 transform-skip is always 4x4, so scaling lists DO
            # apply to TS blocks (verified bit-exact vs libde265 on
            # x265 --tskip + non-flat explicit 4x4 scaling lists).
            if self.scaling is not None:
                m = self.scaling[(log2n - 2, plane_idx)]
            # dequant runs in the Qp' domain (QpBdOffset folded in)
            d = _dequant(coefs, qp + self.qp_bd, log2n, m, self.bd)
            if ts:
                # §8.6.4.2 transform skip: r = (d << 7), then the
                # §8.6.5 stage-2 shift (20 - BitDepth)
                s2 = 20 - self.bd
                r = ((d << 7) + (1 << (s2 - 1))) >> s2
            else:
                r = _inv_transform(d, dst=(plane_idx == 0 and n == 4),
                                   bd=self.bd)
            pred = pred + r
        h = min(n, plane.shape[0] - y0)
        w = min(n, plane.shape[1] - x0)
        plane[y0 : y0 + h, x0 : x0 + w] = np.clip(pred[:h, :w], 0, self.maxv)
        if plane_idx == 0:
            ev, eh = self.edge_v_y, self.edge_h_y
        else:
            ev, eh = self.edge_v_c, self.edge_h_c
        ev[y0 >> 2 : (y0 + h + 3) >> 2, x0 >> 2] = True
        eh[y0 >> 2, x0 >> 2 : (x0 + w + 3) >> 2] = True
        if plane_idx != 1:  # luma, or cr (chroma marked once, after cr)
            avail[y0 >> 2 : (y0 + n + 3) >> 2, x0 >> 2 : (x0 + n + 3) >> 2][
                : (h + 3) >> 2, : (w + 3) >> 2
            ] = True


def decode_hevc_intra(stream: bytes, max_frames: int | None = None):
    """Decode an Annex-B all-intra HEVC stream to a list of
    (y, u, v) uint8 planes. ValueError — and only ValueError — on torn
    or out-of-scope input."""
    try:
        return _decode_hevc_inner(stream, max_frames)
    except ValueError:
        raise
    except Exception as exc:  # tear contract
        raise ValueError(
            f"corrupt HEVC stream: {type(exc).__name__}: {exc}"
        ) from exc


def _decode_hevc_inner(stream: bytes, max_frames):
    nals = split_annexb_raw(stream)
    if not nals:
        raise ValueError("no HEVC NAL units")
    sps = pps = None
    frames = []
    for nal in nals:
        typ, layer, _tid = nal_header(nal)
        if layer != 0:
            continue
        if typ == NAL_SPS:
            sps = parse_sps_intra(strip_emulation(nal))
        elif typ == NAL_PPS:
            pps = parse_pps_intra(strip_emulation(nal))
        elif typ in IRAP_TYPES:
            if sps is None or pps is None:
                raise ValueError("HEVC slice before SPS/PPS")
            rbsp, removed = strip_emulation_with_map(nal)
            hdr = parse_slice_header_intra(rbsp, typ, sps, pps)
            dec = _FrameDecoder(sps, pps, hdr, rbsp, removed)
            y, u, v = dec.decode()
            cl, crr, ct, cb = sps["crop"]
            if any((cl, crr, ct, cb)):
                y = y[2 * ct : sps["pic_height"] - 2 * cb,
                      2 * cl : sps["pic_width"] - 2 * crr]
                u = u[ct : (sps["pic_height"] >> 1) - cb,
                      cl : (sps["pic_width"] >> 1) - crr]
                v = v[ct : (sps["pic_height"] >> 1) - cb,
                      cl : (sps["pic_width"] >> 1) - crr]
            frames.append((y, u, v))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        elif typ < 32:
            raise ValueError(
                f"HEVC inter slice (NAL type {typ}) outside the declared "
                "scope (intra-only decoder)"
            )
    if not frames:
        raise ValueError("HEVC stream contains no IRAP slice")
    return frames


# --- deblocking filter (§8.7.2) — intra pictures: every edge bS = 2 --------

_BETA_TABLE = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10,
    11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24, 26, 28, 30, 32, 34,
    36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56, 58, 60, 62, 64,
)
_TC_TABLE = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6,
    7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24,
)


def _clip1(v, maxv=255):
    return 0 if v < 0 else (maxv if v > maxv else int(v))


def _filter_luma_segment(get, put, qp, beta_off, tc_off, bd=8):
    """One 4-line luma edge segment. ``get(i, k)`` reads sample k of
    line i where k = 0..7 maps p3,p2,p1,p0,q0,q1,q2,q3; ``put``
    writes back. bS = 2 (intra). β/tC scale by 1 << (BitDepth - 8)
    (§8.7.2.5.3)."""
    maxv = (1 << bd) - 1
    beta = _BETA_TABLE[min(51, max(0, qp + (beta_off << 1)))] << (bd - 8)
    tc = _TC_TABLE[min(53, max(0, qp + 2 + (tc_off << 1)))] << (bd - 8)
    if beta == 0 and tc == 0:
        return
    p = [[get(i, 3 - j) for j in range(4)] for i in range(4)]  # p0..p3
    q = [[get(i, 4 + j) for j in range(4)] for i in range(4)]
    dp0 = abs(p[0][2] - 2 * p[0][1] + p[0][0])
    dp3 = abs(p[3][2] - 2 * p[3][1] + p[3][0])
    dq0 = abs(q[0][2] - 2 * q[0][1] + q[0][0])
    dq3 = abs(q[3][2] - 2 * q[3][1] + q[3][0])
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    d = dpq0 + dpq3
    if d >= beta:
        return
    strong = True
    for dpq, i in ((dpq0, 0), (dpq3, 3)):
        if not (
            2 * dpq < (beta >> 2)
            and abs(p[i][3] - p[i][0]) + abs(q[i][0] - q[i][3]) < (beta >> 3)
            and abs(p[i][0] - q[i][0]) < ((5 * tc + 1) >> 1)
        ):
            strong = False
            break
    if strong:
        for i in range(4):
            p0, p1, p2, p3 = p[i]
            q0, q1, q2, q3 = q[i]
            lo, hi = -2 * tc, 2 * tc
            np0 = p0 + max(lo, min(hi, ((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3) - p0))
            np1 = p1 + max(lo, min(hi, ((p2 + p1 + p0 + q0 + 2) >> 2) - p1))
            np2 = p2 + max(lo, min(hi, ((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3) - p2))
            nq0 = q0 + max(lo, min(hi, ((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3) - q0))
            nq1 = q1 + max(lo, min(hi, ((q2 + q1 + q0 + p0 + 2) >> 2) - q1))
            nq2 = q2 + max(lo, min(hi, ((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3) - q2))
            for k, v in ((1, np2), (2, np1), (3, np0), (4, nq0), (5, nq1), (6, nq2)):
                put(i, k, _clip1(v, maxv))
        return
    dep = (dp0 + dp3) < ((beta + (beta >> 1)) >> 3)
    deq = (dq0 + dq3) < ((beta + (beta >> 1)) >> 3)
    for i in range(4):
        p0, p1, p2, _p3 = p[i]
        q0, q1, q2, _q3 = q[i]
        delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
        if abs(delta) >= tc * 10:
            continue
        delta = max(-tc, min(tc, delta))
        put(i, 3, _clip1(p0 + delta, maxv))
        put(i, 4, _clip1(q0 - delta, maxv))
        half = tc >> 1
        if dep:
            dp = max(-half, min(half, (((p2 + p0 + 1) >> 1) - p1 + delta) >> 1))
            put(i, 2, _clip1(p1 + dp, maxv))
        if deq:
            dq = max(-half, min(half, (((q2 + q0 + 1) >> 1) - q1 - delta) >> 1))
            put(i, 5, _clip1(q1 + dq, maxv))


def _filter_chroma_segment(get, put, qp_c, tc_off, bd=8):
    """One 4-line chroma edge segment (bS = 2: p0/q0 only)."""
    maxv = (1 << bd) - 1
    tc = _TC_TABLE[min(53, max(0, qp_c + 2 + (tc_off << 1)))] << (bd - 8)
    if tc == 0:
        return
    for i in range(4):
        p1, p0, q0, q1 = get(i, 2), get(i, 3), get(i, 4), get(i, 5)
        delta = (((q0 - p0) << 2) + p1 - q1 + 4) >> 3
        delta = max(-tc, min(tc, delta))
        put(i, 3, _clip1(p0 + delta, maxv))
        put(i, 4, _clip1(q0 - delta, maxv))


def _deblock_plane(plane, edge_v, edge_h, qp_of, beta_off, tc_off,
                   luma: bool, bd: int = 8):
    """§8.7.2 two-pass filter. ``edge_v[y4, x4]`` marks a vertical TU
    edge at sample column x4*4 covering rows y4*4..y4*4+3 (same idea
    for edge_h). Luma filters the 8-grid; chroma its own 8-grid.
    ``qp_of(py, px, qy, qx)`` returns the edge QP from the two sides'
    sample coords (plane-local) — constant for CQP, per-block with
    cu_qp_delta."""
    h, w = plane.shape
    grid = 8
    # vertical edges
    for x in range(grid, w, grid):
        for y0 in range(0, h, 4):
            if not edge_v[y0 >> 2, x >> 2]:
                continue
            seg = plane[y0 : y0 + 4]
            if seg.shape[0] < 4:
                continue
            qp = qp_of(y0, x - 1, y0, x)

            def get(i, k, seg=seg, x=x):
                return int(seg[i, x - 4 + k])

            def put(i, k, v, seg=seg, x=x):
                seg[i, x - 4 + k] = v

            if luma:
                _filter_luma_segment(get, put, qp, beta_off, tc_off, bd)
            else:
                _filter_chroma_segment(get, put, qp, tc_off, bd)
    # horizontal edges (on the vertical pass's output)
    for y in range(grid, h, grid):
        for x0 in range(0, w, 4):
            if not edge_h[y >> 2, x0 >> 2]:
                continue
            if x0 + 4 > w:
                continue
            qp = qp_of(y - 1, x0, y, x0)

            def get(i, k, y=y, x0=x0):
                return int(plane[y - 4 + k, x0 + i])

            def put(i, k, v, y=y, x0=x0):
                plane[y - 4 + k, x0 + i] = v

            if luma:
                _filter_luma_segment(get, put, qp, beta_off, tc_off, bd)
            else:
                _filter_chroma_segment(get, put, qp, tc_off, bd)
