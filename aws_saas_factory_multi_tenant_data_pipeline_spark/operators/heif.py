"""HEIF/HEIC still-image container — ISO/IEC 23008-12 items over the
ISO/IEC 14496-12 box structure, with the coded payload decoded by the
from-spec HEVC intra decoder (``operators/hevc_decode.py``). Closes the
r11/r12 named HEIC quarantine with parts the repo already owned: the
box walker is shared with MP4 (``operators/mp4.py``), the hvcC record
parser and length-prefix-to-Annex-B conversion come from
``operators/hevc.py``, and the pixel pipeline is pinned against the
system libheif via ctypes (tools/heif_rig.py — the VP8/libwebp
playbook, tests/test_realworld_r13.py).

Scope (declared): primary-item decode for ``hvc1`` coded items and
``grid`` derived items (the iPhone layout: tiles are hvc1 items
referenced by a ``dimg`` ref, row-major, cropped to ispe), iloc
construction methods 0 (file offsets) and 1 (idat), ``irot`` rotation
applied. Out of scope, each a named ValueError: ``iovl`` overlays,
``imir`` mirroring, protected items, Main10 payloads follow the HEVC
decoder's own scope, AVIF (``av01`` items — see the AV1 probe in
operators/av1.py). VUI/nclx colour signalling (range, matrix) is
metadata this pipeline does not act on — RGB conversion is always
ITU-T T.871 (= BT.601 full range), the documented house convention
shared with the H.264/JPEG decoders; the libheif pixel-exact pin
therefore uses full-range streams (libheif converts limited-range
streams with fixed-point BT.601-limited math, maxdiff 1 vs float).

Reference behavior parity: the reference pipeline has no media layer
(its query surface is an Athena scan — athena-stack…ts:16); this is
part of the [EXT] multimodal mandate (SURVEY.md §2 B10).

Tear contract: ``probe_heif``/``decode_heif`` raise ValueError — never
a raw IndexError/struct.error — so torn crawl payloads become
quarantine rows, not executor crashes. Scale shape: runs inside Arrow
``mapInPandas`` passes (operators/multimodal.py registry), one payload
per call, partition-local; decode happens only on demand — probes stay
on the metadata path.
"""

from __future__ import annotations

import struct

import numpy as np

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp4 import (
    iter_boxes,
)

_HEIC_BRANDS = {b"heic", b"heix", b"heim", b"heis", b"hevc", b"hevx",
                b"mif1", b"msf1"}


def _u(data: bytes, off: int, n: int) -> int:
    if off + n > len(data):
        raise ValueError("torn HEIF box field")
    return int.from_bytes(data[off:off + n], "big")


def _fullbox(data: bytes, bs: int) -> tuple[int, int, int]:
    """(version, flags, first_payload_offset) of a FullBox body."""
    v = _u(data, bs, 1)
    flags = _u(data, bs + 1, 3)
    return v, flags, bs + 4


def _parse_pitm(data, bs, be):
    v, _fl, off = _fullbox(data, bs)
    return _u(data, off, 2 if v == 0 else 4)


def _parse_iinf(data, bs, be):
    v, _fl, off = _fullbox(data, bs)
    n = _u(data, off, 2 if v == 0 else 4)
    off += 2 if v == 0 else 4
    items = {}
    for typ, cs, ce in iter_boxes(data, off, be):
        if typ != b"infe":
            continue
        iv, _ifl, ioff = _fullbox(data, cs)
        if iv < 2:
            raise ValueError(f"HEIF infe version {iv} outside scope (>=2)")
        item_id = _u(data, ioff, 2 if iv == 2 else 4)
        ioff += 2 if iv == 2 else 4
        protection = _u(data, ioff, 2)
        item_type = data[ioff + 2:ioff + 6]
        if len(item_type) != 4:
            raise ValueError("torn HEIF infe item_type")
        items[item_id] = {"type": item_type, "protected": protection != 0}
    if len(items) != n:
        raise ValueError(
            f"HEIF iinf declares {n} items, found {len(items)} infe boxes"
        )
    return items


def _parse_iloc(data, bs, be):
    v, _fl, off = _fullbox(data, bs)
    if v > 2:
        raise ValueError(f"HEIF iloc version {v} out of range")
    sizes = _u(data, off, 2)
    offset_size = (sizes >> 12) & 0xF
    length_size = (sizes >> 8) & 0xF
    base_offset_size = (sizes >> 4) & 0xF
    index_size = sizes & 0xF if v in (1, 2) else 0
    off += 2
    count = _u(data, off, 2 if v < 2 else 4)
    off += 2 if v < 2 else 4
    locs = {}
    for _ in range(count):
        item_id = _u(data, off, 2 if v < 2 else 4)
        off += 2 if v < 2 else 4
        method = 0
        if v in (1, 2):
            method = _u(data, off, 2) & 0xF
            off += 2
        off += 2  # data_reference_index (0 = this file; others torn below)
        base = _u(data, off, base_offset_size) if base_offset_size else 0
        off += base_offset_size
        n_ext = _u(data, off, 2)
        off += 2
        extents = []
        for _ in range(n_ext):
            off += index_size
            eo = _u(data, off, offset_size) if offset_size else 0
            off += offset_size
            el = _u(data, off, length_size) if length_size else 0
            off += length_size
            extents.append((base + eo, el))
        locs[item_id] = {"method": method, "extents": extents}
    return locs


def _parse_ipma(data, bs, be):
    v, flags, off = _fullbox(data, bs)
    count = _u(data, off, 4)
    off += 4
    assoc = {}
    for _ in range(count):
        item_id = _u(data, off, 2 if v < 1 else 4)
        off += 2 if v < 1 else 4
        n = _u(data, off, 1)
        off += 1
        idxs = []
        for _ in range(n):
            if flags & 1:
                raw = _u(data, off, 2)
                off += 2
                idxs.append(raw & 0x7FFF)
            else:
                raw = _u(data, off, 1)
                off += 1
                idxs.append(raw & 0x7F)
        assoc[item_id] = idxs
    return assoc


def _parse_iref(data, bs, be):
    v, _fl, off = _fullbox(data, bs)
    idn = 2 if v == 0 else 4
    refs = {}
    for typ, cs, ce in iter_boxes(data, off, be):
        from_id = _u(data, cs, idn)
        n = _u(data, cs + idn, 2)
        p = cs + idn + 2
        to_ids = [_u(data, p + i * idn, idn) for i in range(n)]
        refs.setdefault(typ, {})[from_id] = to_ids
    return refs


def _parse_meta(data: bytes, bs: int, be: int) -> dict:
    _v, _fl, off = _fullbox(data, bs)
    meta = {"items": {}, "iloc": {}, "props": [], "ipma": {}, "refs": {},
            "idat": b"", "primary": None}
    for typ, cs, ce in iter_boxes(data, off, be):
        if typ == b"pitm":
            meta["primary"] = _parse_pitm(data, cs, ce)
        elif typ == b"iinf":
            meta["items"] = _parse_iinf(data, cs, ce)
        elif typ == b"iloc":
            meta["iloc"] = _parse_iloc(data, cs, ce)
        elif typ == b"iprp":
            for t2, c2, e2 in iter_boxes(data, cs, ce):
                if t2 == b"ipco":
                    for t3, c3, e3 in iter_boxes(data, c2, e2):
                        meta["props"].append((t3, data[c3:e3]))
                elif t2 == b"ipma":
                    meta["ipma"] = _parse_ipma(data, c2, e2)
        elif typ == b"iref":
            meta["refs"] = _parse_iref(data, cs, ce)
        elif typ == b"idat":
            meta["idat"] = data[cs:ce]
    if meta["primary"] is None:
        raise ValueError("HEIF meta has no pitm (primary item)")
    if not meta["items"]:
        raise ValueError("HEIF meta has no iinf item table")
    return meta


def _find_meta(payload: bytes) -> tuple[dict, bytes]:
    brand = None
    meta = None
    try:
        for typ, bs, be in iter_boxes(payload):
            if typ == b"ftyp":
                brand = payload[bs:bs + 4]
            elif typ == b"meta":
                meta = _parse_meta(payload, bs, be)
    except ValueError:
        raise
    except Exception as exc:  # torn box structure
        raise ValueError(f"corrupt HEIF container: {exc}") from exc
    if brand is None:
        raise ValueError("HEIF payload has no ftyp box")
    if meta is None:
        raise ValueError("HEIF payload has no meta box")
    return meta, brand


def _item_props(meta: dict, item_id: int) -> list[tuple[bytes, bytes]]:
    out = []
    for idx in meta["ipma"].get(item_id, []):
        if not 1 <= idx <= len(meta["props"]):
            raise ValueError("HEIF ipma property index out of range")
        out.append(meta["props"][idx - 1])
    return out


def _item_data(payload: bytes, meta: dict, item_id: int) -> bytes:
    loc = meta["iloc"].get(item_id)
    if loc is None:
        raise ValueError(f"HEIF item {item_id} has no iloc entry")
    if loc["method"] == 0:
        src = payload
    elif loc["method"] == 1:
        src = meta["idat"]
    else:
        raise ValueError(
            "HEIF iloc construction_method 2 (item_offset) outside scope"
        )
    out = bytearray()
    for off, ln in loc["extents"]:
        if off + ln > len(src):
            raise ValueError("HEIF iloc extent outside payload")
        out += src[off:off + ln]
    return bytes(out)


def _ispe(props) -> tuple[int, int] | None:
    for typ, body in props:
        if typ == b"ispe":
            if len(body) < 12:
                raise ValueError("torn HEIF ispe")
            return (
                struct.unpack_from(">I", body, 4)[0],
                struct.unpack_from(">I", body, 8)[0],
            )
    return None


def _irot(props) -> int:
    for typ, body in props:
        if typ == b"irot":
            if not body:
                raise ValueError("torn HEIF irot")
            return body[0] & 3
        if typ == b"imir":
            raise ValueError("HEIF imir mirroring outside the declared scope")
    return 0


def probe_heif(payload: bytes) -> dict:
    """Structure probe (no pixel decode — the metadata path): brand,
    item census, primary item type/geometry, grid layout."""
    meta, brand = _find_meta(payload)
    pid = meta["primary"]
    if pid not in meta["items"]:
        raise ValueError("HEIF primary item missing from iinf")
    ptype = meta["items"][pid]["type"]
    props = _item_props(meta, pid)
    wh = _ispe(props)
    census: dict = {}
    for it in meta["items"].values():
        k = it["type"].decode("latin1")
        census[k] = census.get(k, 0) + 1
    out = {
        "brand": brand.decode("latin1"),
        "primary_type": ptype.decode("latin1"),
        "n_items": len(meta["items"]),
        "item_census": dict(sorted(census.items())),
        "width": wh[0] if wh else None,
        "height": wh[1] if wh else None,
        "rotation": _irot(props) * 90,
        "n_tiles": 0,
        "n_thumbnails": sum(
            1 for v in meta["refs"].get(b"thmb", {}).values() for _ in v
        ),
        "has_exif": any(
            it["type"] == b"Exif" for it in meta["items"].values()
        ),
    }
    if ptype == b"grid":
        out["n_tiles"] = len(meta["refs"].get(b"dimg", {}).get(pid, []))
    return out


def _decode_hvc1_item(payload: bytes, meta: dict, item_id: int):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc import (
        hvcc_sample_to_annexb,
        parse_hvcc,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        decode_hevc_intra,
    )

    item = meta["items"].get(item_id)
    if item is None:
        raise ValueError(f"HEIF item {item_id} missing from iinf")
    if item["protected"]:
        raise ValueError("HEIF protected items outside the declared scope")
    if item["type"] != b"hvc1":
        raise ValueError(
            f"HEIF coded item type {item['type']!r} outside scope (hvc1 only;"
            " av01 is the AVIF boundary)"
        )
    props = _item_props(meta, item_id)
    hvcc = None
    for typ, body in props:
        if typ == b"hvcC":
            hvcc = body
    if hvcc is None:
        raise ValueError("HEIF hvc1 item has no hvcC property")
    len_size, param_nals = parse_hvcc(hvcc)
    annexb = bytearray()
    for nal in param_nals:
        annexb += b"\x00\x00\x00\x01" + nal
    annexb += hvcc_sample_to_annexb(
        _item_data(payload, meta, item_id), len_size
    )
    frames = decode_hevc_intra(bytes(annexb), max_frames=1)
    if not frames:
        raise ValueError("HEIF hvc1 item decoded to no picture")
    y, u, v = frames[0]
    wh = _ispe(props)
    if wh is not None:
        w, h = wh
        if w > y.shape[1] or h > y.shape[0]:
            raise ValueError("HEIF ispe larger than the coded picture")
        y = y[:h, :w]
        u = u[:(h + 1) // 2, :(w + 1) // 2]
        v = v[:(h + 1) // 2, :(w + 1) // 2]
    return y, u, v


def decode_heif_yuv(payload: bytes):
    """Decode the primary item to 4:2:0 (y, u, v) uint8 planes —
    PRE-rotation. The coded layer is pinned bit-exact against libde265
    on the extracted item stream; the full-image pin runs at RGB
    against libheif's native output (tools/heif_rig.decode_heic_rgb —
    its no-colr default is BT.601 full range + nearest-neighbor
    upsample, byte-identical to the T.871 conversion below; libheif's
    own YCbCr output path is a lossy RGB roundtrip and NOT pinnable)."""
    meta, _brand = _find_meta(payload)
    pid = meta["primary"]
    ptype = meta["items"].get(pid, {}).get("type")
    if ptype == b"hvc1":
        return _decode_hvc1_item(payload, meta, pid)
    if ptype != b"grid":
        raise ValueError(
            f"HEIF primary item type {ptype!r} outside scope "
            "(hvc1 or grid)"
        )
    grid = _item_data(payload, meta, pid)
    if len(grid) < 8:
        raise ValueError("torn HEIF grid item")
    if grid[0] != 0:
        raise ValueError(f"HEIF grid version {grid[0]} out of range")
    wide = grid[1] & 1
    rows = grid[2] + 1
    cols = grid[3] + 1
    if wide:
        if len(grid) < 12:
            raise ValueError("torn HEIF grid item (32-bit fields)")
        out_w, out_h = struct.unpack_from(">II", grid, 4)
    else:
        out_w, out_h = struct.unpack_from(">HH", grid, 4)
    tile_ids = meta["refs"].get(b"dimg", {}).get(pid, [])
    if len(tile_ids) != rows * cols:
        raise ValueError(
            f"HEIF grid {rows}x{cols} expects {rows * cols} dimg tiles, "
            f"got {len(tile_ids)}"
        )
    tiles = [_decode_hvc1_item(payload, meta, tid) for tid in tile_ids]
    th, tw = tiles[0][0].shape
    dt = tiles[0][0].dtype
    for t in tiles:
        if t[0].shape != (th, tw):
            raise ValueError("HEIF grid tiles disagree on size")
        if t[0].dtype != dt:
            raise ValueError("HEIF grid tiles disagree on bit depth")
    y = np.zeros((rows * th, cols * tw), dt)
    u = np.zeros((rows * th // 2, cols * tw // 2), dt)
    v = np.zeros_like(u)
    for i, (ty, tu, tv) in enumerate(tiles):
        r, c = divmod(i, cols)
        y[r * th:(r + 1) * th, c * tw:(c + 1) * tw] = ty
        u[r * th // 2:(r + 1) * th // 2, c * tw // 2:(c + 1) * tw // 2] = tu
        v[r * th // 2:(r + 1) * th // 2, c * tw // 2:(c + 1) * tw // 2] = tv
    if out_w > y.shape[1] or out_h > y.shape[0]:
        raise ValueError("HEIF grid output size larger than the tile canvas")
    return (
        y[:out_h, :out_w],
        u[:(out_h + 1) // 2, :(out_w + 1) // 2],
        v[:(out_h + 1) // 2, :(out_w + 1) // 2],
    )


def decode_heif(payload: bytes):
    """Registry-contract decode: primary item → (uint8 [h,w,3] RGB,
    width, height), ``irot`` applied (counter-clockwise multiples of
    90°, ISO 23008-12 §6.5.10), T.871 colour conversion. Main10
    payloads convert at 10 bits then scale >> 2 (matching libheif's
    8-bit RGB output bit-exactly on full-range streams)."""
    y, u, v = decode_heif_yuv(payload)
    meta, _brand = _find_meta(payload)
    rot = _irot(_item_props(meta, meta["primary"]))
    h, w = y.shape
    mid = 512.0 if y.dtype == np.uint16 else 128.0
    maxv = 1023 if y.dtype == np.uint16 else 255
    yf = y.astype(np.float64)
    cb = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(
        np.float64
    )
    cr = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(
        np.float64
    )
    r = yf + 1.402 * (cr - mid)
    g = yf - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
    b = yf + 1.772 * (cb - mid)
    px = np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, maxv
    ).astype(np.int64)
    if maxv == 1023:
        px >>= 2
    px = px.astype(np.uint8)
    if rot:
        px = np.rot90(px, k=rot)
    hh, ww = px.shape[:2]
    return px, int(ww), int(hh)


# --- fixture builder (r13) ---------------------------------------------------


def _split_annexb(stream: bytes) -> list[bytes]:
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
        out.append(stream[pos + sc:end])
    return out


def _hvcc_from_nals(param_nals: list[bytes]) -> bytes:
    """HEVCDecoderConfigurationRecord (ISO 14496-15 §8.3.3.1) from
    VPS/SPS/PPS NALs; the 12 profile/level bytes are lifted verbatim
    from the SPS profile_tier_level, which is byte-aligned at RBSP
    offset 3 (2-byte NAL header + 1 byte of vps_id/max_sub/nesting)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        parse_sps_intra,
        strip_emulation_with_map,
    )

    sps_nal = next(n for n in param_nals if ((n[0] >> 1) & 0x3F) == 33)
    sps_rbsp, _ = strip_emulation_with_map(sps_nal)
    sps = parse_sps_intra(sps_rbsp)
    ptl = sps_rbsp[3:15]
    rec = bytearray()
    rec.append(1)                      # configurationVersion
    rec += ptl                         # profile space..level_idc
    rec += struct.pack(">H", 0xF000)   # min_spatial_segmentation_idc
    rec.append(0xFC)                   # parallelismType
    rec.append(0xFC | sps.get("chroma_format_idc", 1))
    rec.append(0xF8 | (sps["bit_depth_luma"] - 8))
    rec.append(0xF8 | (sps["bit_depth_chroma"] - 8))
    rec += struct.pack(">H", 0)        # avgFrameRate
    rec.append((0 << 6) | (1 << 3) | (1 << 2) | 3)  # 1 layer, len size 4
    rec.append(len(param_nals))
    for nal in param_nals:
        typ = (nal[0] >> 1) & 0x3F
        rec.append(0x80 | typ)         # array_completeness=1
        rec += struct.pack(">H", 1)
        rec += struct.pack(">H", len(nal)) + nal
    return bytes(rec)


def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + typ + body


def _fbox(typ: bytes, body: bytes, ver: int = 0, flags: int = 0) -> bytes:
    return _box(typ, bytes([ver]) + flags.to_bytes(3, "big") + body)


def build_heif(
    tile_streams: list[bytes],
    grid: tuple[int, int, int, int] | None = None,
    rotation: int = 0,
    exif: bytes | None = None,
    thumbnail: bytes | None = None,
    xmp: bytes | None = None,
) -> bytes:
    """Write a HEIC container around coded Annex-B HEVC intra streams
    (one per tile). ``grid=(rows, cols, out_w, out_h)`` makes the
    primary item a grid of ``rows*cols`` hvc1 tiles (the grid payload
    rides in ``idat`` via iloc construction method 1, exercising that
    path); otherwise a single stream becomes the hvc1 primary item.
    ``rotation`` (ccw degrees, multiple of 90) emits an ``irot``
    property. Codec-agnostic by design: the corpus feeds streams from
    the CABAC-mirror fixture encoder (operators/hevc_enc.py) so corpus
    queries never depend on host libraries; tests also feed real x265
    output and pin the result against libheif."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        parse_sps_intra,
        strip_emulation_with_map,
    )

    if rotation % 90:
        raise ValueError("HEIF irot rotation must be a multiple of 90")
    if grid is not None and grid[0] * grid[1] != len(tile_streams):
        raise ValueError("grid shape disagrees with the tile count")
    tiles = []
    for stream in tile_streams:
        nals = _split_annexb(stream)
        params = [n for n in nals if ((n[0] >> 1) & 0x3F) in (32, 33, 34)]
        slices = [n for n in nals if ((n[0] >> 1) & 0x3F) < 32]
        if not params or not slices:
            raise ValueError("tile stream missing parameter sets or slices")
        sps_nal = next(n for n in params if ((n[0] >> 1) & 0x3F) == 33)
        sps = parse_sps_intra(strip_emulation_with_map(sps_nal)[0])
        cl, cr_, ct, cb_ = sps.get("crop", (0, 0, 0, 0))
        w = sps["pic_width"] - 2 * (cl + cr_)
        h = sps["pic_height"] - 2 * (ct + cb_)
        sample = b"".join(
            struct.pack(">I", len(n)) + n for n in slices
        )
        tiles.append({
            "hvcc": _hvcc_from_nals(params),
            "sample": sample,
            "w": w,
            "h": h,
        })

    thumb = None
    if thumbnail is not None:
        nals = _split_annexb(thumbnail)
        params = [n for n in nals if ((n[0] >> 1) & 0x3F) in (32, 33, 34)]
        slices = [n for n in nals if ((n[0] >> 1) & 0x3F) < 32]
        sps_nal = next(n for n in params if ((n[0] >> 1) & 0x3F) == 33)
        tsps = parse_sps_intra(strip_emulation_with_map(sps_nal)[0])
        cl, cr_, ct, cb_ = tsps.get("crop", (0, 0, 0, 0))
        thumb = {
            "hvcc": _hvcc_from_nals(params),
            "sample": b"".join(
                struct.pack(">I", len(n)) + n for n in slices
            ),
            "w": tsps["pic_width"] - 2 * (cl + cr_),
            "h": tsps["pic_height"] - 2 * (ct + cb_),
        }

    is_grid = grid is not None
    tile_ids = list(range(1, len(tiles) + 1))
    grid_id = len(tiles) + 1 if is_grid else None
    primary = grid_id if is_grid else tile_ids[0]
    next_id = (grid_id or len(tiles)) + 1
    exif_id = None
    if exif is not None:
        exif_id = next_id
        next_id += 1
    thumb_id = None
    if thumb is not None:
        thumb_id = next_id
        next_id += 1
    xmp_id = None
    if xmp is not None:
        xmp_id = next_id
        next_id += 1

    # properties: per-tile hvcC + ispe pairs; grid ispe; optional irot
    props: list[bytes] = []
    prop_idx: dict = {}
    assoc: dict[int, list[int]] = {}
    for tid, t in zip(tile_ids, tiles):
        key = ("hvcc", t["hvcc"])
        if key not in prop_idx:
            props.append(_box(b"hvcC", t["hvcc"]))
            prop_idx[key] = len(props)
        ik = ("ispe", t["w"], t["h"])
        if ik not in prop_idx:
            props.append(_fbox(b"ispe", struct.pack(">II", t["w"], t["h"])))
            prop_idx[ik] = len(props)
        assoc[tid] = [prop_idx[key], prop_idx[ik]]
    if is_grid:
        rows, cols, out_w, out_h = grid
        gk = ("ispe", out_w, out_h)
        if gk not in prop_idx:
            props.append(_fbox(b"ispe", struct.pack(">II", out_w, out_h)))
            prop_idx[gk] = len(props)
        assoc[grid_id] = [prop_idx[gk]]
    if rotation:
        props.append(_box(b"irot", bytes([(rotation // 90) % 4])))
        assoc[primary] = assoc.get(primary, []) + [len(props)]
    if thumb is not None:
        props.append(_box(b"hvcC", thumb["hvcc"]))
        hv_idx = len(props)
        props.append(_fbox(b"ispe", struct.pack(">II", thumb["w"],
                                                thumb["h"])))
        assoc[thumb_id] = [hv_idx, len(props)]

    items = [(tid, b"hvc1") for tid in tile_ids]
    if is_grid:
        items.append((grid_id, b"grid"))
        rows, cols, out_w, out_h = grid
        idat = bytes([0, 0, rows - 1, cols - 1]) + struct.pack(
            ">HH", out_w, out_h
        )
    else:
        idat = b""
    exif_payload = b""
    if exif is not None:
        # ISO 23008-12 §A.2.1: exif_tiff_header_offset then the block
        exif_payload = struct.pack(">I", 0) + exif
        items.append((exif_id, b"Exif"))
    if thumb is not None:
        items.append((thumb_id, b"hvc1"))
    if xmp is not None:
        items.append((xmp_id, b"mime"))

    hdlr = _fbox(b"hdlr", struct.pack(">I", 0) + b"pict" + bytes(12) + b"\x00")
    pitm = _fbox(b"pitm", struct.pack(">H", primary))
    infes = b"".join(
        _fbox(
            b"infe",
            struct.pack(">HH", iid, 0) + typ + b"\x00"
            # mime items carry a content_type cstring after item_name
            + (b"application/rdf+xml\x00" if typ == b"mime" else b""),
            ver=2,
        )
        for iid, typ in items
    )
    iinf = _fbox(b"iinf", struct.pack(">H", len(items)) + infes)
    ipma_body = struct.pack(">I", len(assoc))
    for iid in sorted(assoc):
        ipma_body += struct.pack(">HB", iid, len(assoc[iid]))
        for idx in assoc[iid]:
            ipma_body += bytes([0x80 | idx])  # essential, 7-bit index
    iprp = _box(b"iprp", _box(b"ipco", b"".join(props))
                + _fbox(b"ipma", ipma_body))
    iref_boxes = b""
    if is_grid:
        iref_boxes += _box(
            b"dimg",
            struct.pack(">HH", grid_id, len(tile_ids))
            + b"".join(struct.pack(">H", t) for t in tile_ids),
        )
    if exif_id is not None:
        iref_boxes += _box(
            b"cdsc", struct.pack(">HHH", exif_id, 1, primary)
        )
    if thumb_id is not None:
        iref_boxes += _box(
            b"thmb", struct.pack(">HHH", thumb_id, 1, primary)
        )
    if xmp_id is not None:
        iref_boxes += _box(
            b"cdsc", struct.pack(">HHH", xmp_id, 1, primary)
        )
    iref = _fbox(b"iref", iref_boxes) if iref_boxes else b""
    idat_box = _box(b"idat", idat) if idat else b""

    # iloc v1: tiles via file offsets (method 0), grid via idat
    # (method 1). Offsets need the final layout — two-pass: sizes are
    # invariant to the offset VALUES (fixed 4-byte fields).
    extra_items = []  # (item_id, payload) with file offsets
    if exif_id is not None:
        extra_items.append((exif_id, exif_payload))
    if thumb_id is not None:
        extra_items.append((thumb_id, thumb["sample"]))
    if xmp_id is not None:
        extra_items.append((xmp_id, xmp))

    def iloc_box(tile_offsets):
        body = bytes([0x44, 0x00])  # offset_size=4,length_size=4,base=0,idx=0
        entries = b""
        n = len(tiles) + (1 if is_grid else 0) + len(extra_items)
        for tid, t in zip(tile_ids, tiles):
            entries += struct.pack(
                ">HHHHII", tid, 0, 0, 1,
                tile_offsets[tid], len(t["sample"]),
            )
        if is_grid:
            entries += struct.pack(">HHHHII", grid_id, 1, 0, 1, 0, len(idat))
        for iid, pay in extra_items:
            entries += struct.pack(
                ">HHHHII", iid, 0, 0, 1, tile_offsets.get(iid, 0),
                len(pay),
            )
        return _fbox(b"iloc", body + struct.pack(">H", n) + entries, ver=1)

    zero_offsets = {tid: 0 for tid in tile_ids}
    meta_body = hdlr + pitm + iinf + iref + iprp + iloc_box(zero_offsets) \
        + idat_box
    ftyp = _box(b"ftyp", b"heic" + struct.pack(">I", 0) + b"mif1heic")
    meta_size = len(_fbox(b"meta", meta_body))
    mdat_payload_start = len(ftyp) + meta_size + 8
    offsets = {}
    pos = mdat_payload_start
    for tid, t in zip(tile_ids, tiles):
        offsets[tid] = pos
        pos += len(t["sample"])
    for iid, pay in extra_items:
        offsets[iid] = pos
        pos += len(pay)
    meta = _fbox(b"meta", hdlr + pitm + iinf + iref + iprp
                 + iloc_box(offsets) + idat_box)
    if len(meta) != meta_size:
        raise AssertionError("HEIF meta size changed between passes")
    mdat = _box(b"mdat", b"".join(t["sample"] for t in tiles)
                + b"".join(pay for _iid, pay in extra_items))
    return ftyp + meta + mdat


# --- metadata items (r13 second wave): Exif + thumbnails ---------------------


def extract_heif_exif(payload: bytes) -> dict:
    """Parse the Exif item attached to the primary item (ISO 23008-12
    §A.2.1: a ``cdsc``-referenced item of type ``Exif`` whose payload
    is a 4-byte exif_tiff_header_offset followed by the Exif data —
    the same TIFF block a JPEG APP1 segment carries, parsed by the
    shared operators/exif.py machinery). Returns the parse_exif dict
    ({"has_exif": False} when the container has no Exif item)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        parse_exif_tiff,
    )

    meta, _brand = _find_meta(payload)
    pid = meta["primary"]
    for item_id, item in meta["items"].items():
        if item["type"] != b"Exif":
            continue
        refs = meta["refs"].get(b"cdsc", {}).get(item_id, [])
        if refs and pid not in refs:
            continue
        body = _item_data(payload, meta, item_id)
        if len(body) < 4:
            raise ValueError("torn HEIF Exif item")
        off = 4 + struct.unpack_from(">I", body, 0)[0]
        tiff = body[off:]
        if tiff[:6] == b"Exif\x00\x00":  # tolerated JPEG-style prefix
            tiff = tiff[6:]
        return parse_exif_tiff(tiff)
    return {"has_exif": False}


def strip_heif_exif(payload: bytes) -> bytes:
    """Privacy strip (the JPEG strip_metadata twin for HEIC): redact
    every Exif item's payload IN PLACE with a minimal valid empty-IFD0
    TIFF block zero-padded to the original extent length — no offsets
    move, the container stays byte-compatible for every reader, and
    the camera/GPS bytes are destroyed. Coded image data is untouched
    (asserted byte-identical decode in tests)."""
    meta, _brand = _find_meta(payload)
    out = bytearray(payload)
    stripped = False
    for item_id, item in meta["items"].items():
        if item["type"] != b"Exif":
            continue
        loc = meta["iloc"].get(item_id)
        if loc is None or loc["method"] != 0:
            raise ValueError(
                "HEIF Exif strip supports file-offset items only"
            )
        first = True
        for off, ln in loc["extents"]:
            if off + ln > len(out):
                raise ValueError("HEIF Exif extent outside payload")
            out[off:off + ln] = bytes(ln)
            if first and ln >= 16:
                # exif_tiff_header_offset = 0, then II*\0 + IFD0 with
                # zero entries and no next-IFD pointer
                blank = (struct.pack(">I", 0) + b"II*\x00"
                         + struct.pack("<I", 8) + struct.pack("<H", 0)
                         + struct.pack("<I", 0))
                out[off:off + len(blank)] = blank
            first = False
        stripped = True
    if not stripped:
        return payload
    return bytes(out)


def extract_heif_xmp(payload: bytes) -> bytes | None:
    """Return the XMP packet carried by a ``mime`` item (content type
    application/rdf+xml, cdsc-referenced to the primary item — ISO
    23008-12 §A.3), or None when the container has no XMP. Detection
    is by item type + packet sniff so writers that omit the cdsc
    reference still surface their metadata (crawl-hygiene bias)."""
    meta, _brand = _find_meta(payload)
    pid = meta["primary"]
    for item_id, item in meta["items"].items():
        if item["type"] != b"mime":
            continue
        refs = meta["refs"].get(b"cdsc", {}).get(item_id, [])
        if refs and pid not in refs:
            continue
        body = _item_data(payload, meta, item_id)
        head = bytes(body[:4096])
        if b"<x:xmpmeta" in head or b"adobe:ns:meta/" in head:
            return bytes(body)
    return None


def strip_heif_xmp(payload: bytes) -> bytes:
    """Privacy strip for HEIC XMP (the strip_heif_exif twin): every
    XMP mime item's extents are overwritten IN PLACE with spaces (the
    packet padding character) — no container offset moves, coded
    pixels byte-identical, the GPS/owner XML destroyed."""
    meta, _brand = _find_meta(payload)
    out = bytearray(payload)
    stripped = False
    for item_id, item in meta["items"].items():
        if item["type"] != b"mime":
            continue
        body = _item_data(payload, meta, item_id)
        head = bytes(body[:4096])
        if b"<x:xmpmeta" not in head and b"adobe:ns:meta/" not in head:
            continue
        loc = meta["iloc"].get(item_id)
        if loc is None or loc["method"] != 0:
            raise ValueError("HEIF XMP strip supports file-offset items only")
        for off, ln in loc["extents"]:
            if off + ln > len(out):
                raise ValueError("HEIF XMP extent outside payload")
            out[off:off + ln] = b" " * ln
        stripped = True
    if not stripped:
        return payload
    return bytes(out)


def extract_heif_thumbnail(payload: bytes):
    """Decode the primary item's thumbnail (a ``thmb``-referenced hvc1
    item) → (uint8 [h,w,3] RGB, w, h); ValueError when the container
    carries none."""
    meta, _brand = _find_meta(payload)
    pid = meta["primary"]
    for item_id, item in meta["items"].items():
        refs = meta["refs"].get(b"thmb", {}).get(item_id, [])
        if pid not in refs:
            continue
        y, u, v = _decode_hvc1_item(payload, meta, item_id)
        h, w = y.shape
        mid = 512.0 if y.dtype == np.uint16 else 128.0
        maxv = 1023 if y.dtype == np.uint16 else 255
        yf = y.astype(np.float64)
        cb = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.float64)
        cr = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.float64)
        r = yf + 1.402 * (cr - mid)
        g = yf - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
        b = yf + 1.772 * (cb - mid)
        px = np.clip(np.round(np.stack([r, g, b], 2)), 0, maxv).astype(
            np.int64
        )
        if maxv == 1023:
            px >>= 2
        px = px.astype(np.uint8)
        return px, int(w), int(h)
    raise ValueError("HEIF container carries no thumbnail item")
