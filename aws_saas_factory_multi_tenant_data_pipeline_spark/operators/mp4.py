"""MP4 / ISO Base Media File Format container parsing — stdlib only,
built from the public spec (ISO/IEC 14496-12).

MP4 is a CONTAINER, and the container layer is pure structured parsing:
box walk, track metadata (codec fourcc, dimensions, timescale,
duration), and the sample tables (stsz/stsc/stco/stss) that map every
video frame to its exact byte range in the file. That is everything a
training-data pipeline's frame-sampling step needs BEFORE a codec
touches anything: pick every Nth sample (or keyframes only) and hand
the raw access-unit bytes to whatever decoder exists downstream. The
pixel decode itself (H.264/H.265) genuinely exceeds stdlib reach and
stays stubbed — but the container layer here is real, tested against
hand-assembled spec-literal files, and turns the video column from
"opaque payload" into "typed samples with byte-accurate extraction".

Tear contract (same as the other codecs): :func:`probe_mp4` and
:func:`extract_samples` raise ValueError — and only ValueError — on
anything unparseable.

Scale shape: runs inside Arrow ``mapInPandas`` passes, partition-local,
payloads never transit the driver — identical plumbing to every other
media format.
"""

from __future__ import annotations

import struct

_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf", b"udta",
    b"mvex", b"moof", b"traf",
}


def iter_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (fourcc, payload_start, payload_end) for the top-level boxes
    in data[start:end]; 64-bit largesize and size-0 (to-EOF) handled."""
    end = len(data) if end is None else end
    i = start
    while i < end:
        if i + 8 > end:
            raise ValueError(f"truncated box header at offset {i}")
        (size,) = struct.unpack(">I", data[i : i + 4])
        typ = data[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            hdr = 16
        elif size == 0:
            size = end - i  # box extends to end of file
        if size < hdr or i + size > end:
            raise ValueError(f"box '{typ.decode('latin1')}' overruns file")
        yield typ, i + hdr, i + size
        i += size


def _find(data: bytes, path: list[bytes], start: int, end: int):
    """All (payload_start, payload_end) spans matching a box path."""
    spans = [(start, end)]
    for name in path:
        nxt = []
        for s, e in spans:
            for typ, ps, pe in iter_boxes(data, s, e):
                if typ == name:
                    nxt.append((ps, pe))
        spans = nxt
    return spans


def probe_mp4(payload: bytes) -> dict:
    """Parse the container: brand, movie timescale/duration, and per
    track: handler, codec fourcc, width/height, sample count, keyframe
    sample numbers, and the full per-sample (offset, size) table."""
    try:
        return _probe_inner(payload)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt MP4: {type(exc).__name__}: {exc}") from exc


def _probe_inner(payload: bytes) -> dict:
    brand = None
    moov = None
    for typ, s, e in iter_boxes(payload):
        if typ == b"ftyp":
            brand = payload[s : s + 4].decode("latin1")
        elif typ == b"moov":
            moov = (s, e)
    if moov is None:
        raise ValueError("no moov box (not an MP4 movie)")
    out: dict = {"brand": brand, "tracks": []}
    for s, e in _find(payload, [b"mvhd"], *moov):
        ver = payload[s]
        if ver == 1:
            ts, dur = struct.unpack(">IQ", payload[s + 20 : s + 32])
        else:
            ts, dur = struct.unpack(">II", payload[s + 12 : s + 20])
        out["timescale"], out["duration"] = ts, dur
    for ts_, te_ in _find(payload, [b"trak"], *moov):
        out["tracks"].append(_parse_track(payload, ts_, te_))
    return out


def _parse_track(payload: bytes, ts_: int, te_: int) -> dict:
    tr: dict = {}
    for s, e in _find(payload, [b"tkhd"], ts_, te_):
        ver = payload[s]
        # width/height: 16.16 fixed point at the end of tkhd
        w, h = struct.unpack(">II", payload[e - 8 : e])
        tr["width"], tr["height"] = w >> 16, h >> 16
        tr["track_id"] = struct.unpack(
            ">I", payload[s + (20 if ver == 1 else 12) : s + (24 if ver == 1 else 16)]
        )[0]
    for s, e in _find(payload, [b"mdia", b"mdhd"], ts_, te_):
        ver = payload[s]
        if ver == 1:
            mts, mdur = struct.unpack(">IQ", payload[s + 20 : s + 32])
        else:
            mts, mdur = struct.unpack(">II", payload[s + 12 : s + 20])
        tr["timescale"], tr["duration"] = mts, mdur
    for s, e in _find(payload, [b"mdia", b"hdlr"], ts_, te_):
        tr["handler"] = payload[s + 8 : s + 12].decode("latin1")
    stbl = _find(payload, [b"mdia", b"minf", b"stbl"], ts_, te_)
    if not stbl:
        raise ValueError("track missing sample table")
    sb, se = stbl[0]
    for s, e in _find(payload, [b"stsd"], sb, se):
        (n_entries,) = struct.unpack(">I", payload[s + 4 : s + 8])
        if n_entries >= 1:
            tr["codec"] = payload[s + 12 : s + 16].decode("latin1")
            # visual sample entries carry codec config boxes (avcC for
            # AVC: SPS/PPS NALs + NAL length size) after the 78-byte
            # fixed VisualSampleEntry header
            entry_start, entry_end = s + 8, e
            cfg_off = entry_start + 8 + 78
            if tr.get("handler") == "vide" and cfg_off < entry_end:
                try:
                    for typ2, ps2, pe2 in iter_boxes(payload, cfg_off, entry_end):
                        if typ2 == b"avcC":
                            tr["avcc"] = parse_avcc(payload[ps2:pe2])
                        elif typ2 == b"hvcC":
                            # [r11] HEVC tracks (hvc1/hev1): parameter
                            # sets + NAL length size for the probe/
                            # keyframe-sampling path (operators/hevc.py)
                            from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc import (
                                parse_hvcc,
                            )

                            nls, ps_nals = parse_hvcc(payload[ps2:pe2])
                            tr["hvcc"] = {
                                "nal_length_size": nls,
                                "param_sets": ps_nals,
                            }
                except ValueError:
                    pass  # config boxes absent/nonstandard: no config
    sizes = _parse_stsz(payload, sb, se)
    tr["n_samples"] = len(sizes)
    chunk_offsets = _parse_stco(payload, sb, se)
    stsc = _parse_stsc(payload, sb, se)
    tr["samples"] = _sample_spans(sizes, chunk_offsets, stsc)
    tr["keyframes"] = _parse_stss(payload, sb, se, len(sizes))
    return tr


def _parse_stsz(payload, sb, se):
    for s, e in _find(payload, [b"stsz"], sb, se):
        fixed, count = struct.unpack(">II", payload[s + 4 : s + 12])
        if fixed:
            return [fixed] * count
        return list(struct.unpack(f">{count}I", payload[s + 12 : s + 12 + 4 * count]))
    raise ValueError("missing stsz")


def _parse_stco(payload, sb, se):
    for s, e in _find(payload, [b"stco"], sb, se):
        (count,) = struct.unpack(">I", payload[s + 4 : s + 8])
        return list(struct.unpack(f">{count}I", payload[s + 8 : s + 8 + 4 * count]))
    for s, e in _find(payload, [b"co64"], sb, se):
        (count,) = struct.unpack(">I", payload[s + 4 : s + 8])
        return list(struct.unpack(f">{count}Q", payload[s + 8 : s + 8 + 8 * count]))
    raise ValueError("missing stco/co64")


def _parse_stsc(payload, sb, se):
    for s, e in _find(payload, [b"stsc"], sb, se):
        (count,) = struct.unpack(">I", payload[s + 4 : s + 8])
        ent = []
        for k in range(count):
            first, per, _desc = struct.unpack(
                ">III", payload[s + 8 + 12 * k : s + 20 + 12 * k]
            )
            ent.append((first, per))
        return ent
    raise ValueError("missing stsc")


def _parse_stss(payload, sb, se, n_samples):
    for s, e in _find(payload, [b"stss"], sb, se):
        (count,) = struct.unpack(">I", payload[s + 4 : s + 8])
        return list(struct.unpack(f">{count}I", payload[s + 8 : s + 8 + 4 * count]))
    return list(range(1, n_samples + 1))  # absent stss → every sample a sync


def _sample_spans(sizes, chunk_offsets, stsc):
    """(offset, size) per sample from the three sample tables — the
    stsc run-length mapping gives samples-per-chunk for every chunk."""
    spans = []
    n_chunks = len(chunk_offsets)
    per_chunk = []
    for idx, (first, per) in enumerate(stsc):
        last = stsc[idx + 1][0] - 1 if idx + 1 < len(stsc) else n_chunks
        per_chunk += [per] * (last - first + 1)
    si = 0
    for ci, off in enumerate(chunk_offsets):
        cur = off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            spans.append((cur, sizes[si]))
            cur += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError(f"sample tables disagree: mapped {si}/{len(sizes)} samples")
    return spans


def extract_samples(payload: bytes, track: dict, indices) -> list[bytes]:
    """Raw access-unit bytes for 0-based sample ``indices`` of a probed
    track — byte-exact extraction, no codec involvement."""
    out = []
    for i in indices:
        if not 0 <= i < len(track["samples"]):
            raise ValueError(f"sample index {i} out of range")
        off, size = track["samples"][i]
        chunk = payload[off : off + size]
        if len(chunk) != size:
            raise ValueError(f"sample {i} overruns file (torn mdat)")
        out.append(chunk)
    return out


def parse_avcc(body: bytes) -> dict:
    """AVCDecoderConfigurationRecord (ISO 14496-15): SPS/PPS NAL bytes
    (header + escaped payload) and the sample NAL length-prefix size."""
    if len(body) < 7 or body[0] != 1:
        raise ValueError("bad avcC configuration record")
    len_size = (body[4] & 3) + 1
    n_sps = body[5] & 0x1F
    off = 6
    sps = []
    for _ in range(n_sps):
        (ln,) = struct.unpack(">H", body[off : off + 2])
        sps.append(body[off + 2 : off + 2 + ln])
        off += 2 + ln
    n_pps = body[off]
    off += 1
    pps = []
    for _ in range(n_pps):
        (ln,) = struct.unpack(">H", body[off : off + 2])
        pps.append(body[off + 2 : off + 2 + ln])
        off += 2 + ln
    if any(len(x) == 0 for x in sps + pps):
        raise ValueError("empty parameter set in avcC")
    return {"len_size": len_size, "sps": sps, "pps": pps}


def avcc_box(sps_nal: bytes, pps_nal: bytes, len_size: int = 4) -> bytes:
    """Complete ``avcC`` box (header + record) for build_minimal_mp4's
    ``config_box`` parameter."""
    body = build_avcc(sps_nal, pps_nal, len_size)
    return struct.pack(">I", len(body) + 8) + b"avcC" + body


def build_avcc(sps_nal: bytes, pps_nal: bytes, len_size: int = 4) -> bytes:
    """Assemble an avcC record from complete SPS/PPS NALs (header byte +
    escaped payload) — the writer-side twin of :func:`parse_avcc`."""
    return (
        bytes([1, sps_nal[1], sps_nal[2], sps_nal[3], 0xFC | (len_size - 1), 0xE1])
        + struct.pack(">H", len(sps_nal))
        + sps_nal
        + b"\x01"
        + struct.pack(">H", len(pps_nal))
        + pps_nal
    )


# --- minimal writer (test/synthesis side) -----------------------------------


def build_minimal_mp4(
    samples: list[bytes],
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    sample_delta: int = 40,
    codec: bytes = b"avc1",
    keyframes: list[int] | None = None,
    config_box: bytes | None = None,
) -> bytes:
    """Assemble a minimal-but-valid single-video-track MP4 (ftyp + mdat +
    moov with full stbl) so the parser can be tested against files whose
    expected tables are known by construction."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    def full(typ: bytes, body: bytes, ver: int = 0, flags: int = 0) -> bytes:
        return box(typ, struct.pack(">B", ver) + flags.to_bytes(3, "big") + body)

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(samples)
    # mdat begins right after ftyp; chunk offset = ftyp + mdat header
    mdat_off = len(ftyp) + 8
    mdat = box(b"mdat", mdat_payload)
    n = len(samples)
    dur = n * sample_delta

    mvhd = full(
        b"mvhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = full(
        b"tkhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", dur)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
        flags=7,
    )
    mdhd = full(
        b"mdhd",
        struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    vmhd = full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = full(b"dref", struct.pack(">I", 1) + full(b"url ", b"", flags=1))
    dinf = box(b"dinf", dref)
    # stsd with a bare sample entry (codec fourcc + visual header)
    entry = box(
        codec,
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">H", 0x18)
        + struct.pack(">h", -1)
        + (config_box or b""),
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + entry)
    stts = full(b"stts", struct.pack(">III", 1, n, sample_delta))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))  # 1 chunk, n samples
    stsz = full(
        b"stsz",
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = full(b"stco", struct.pack(">II", 1, mdat_off))
    stbl_children = stsd + stts + stsc + stsz + stco
    if keyframes is not None:
        stbl_children += full(
            b"stss",
            struct.pack(">I", len(keyframes))
            + b"".join(struct.pack(">I", k) for k in keyframes),
        )
    stbl = box(b"stbl", stbl_children)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
