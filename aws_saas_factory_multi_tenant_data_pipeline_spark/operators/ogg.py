"""Ogg container probe — page walk, packet reassembly, codec
identification (RFC 3533 for the container; codec id headers per the
Vorbis I spec, RFC 7845 OpusHead, the FLAC-in-Ogg mapping and the
Theora spec). The container-level twin of the MP3 frame/ID3 probe
row: a crawl pipeline needs codec/rate/channels/duration WITHOUT a
full audio decode (Vorbis/Opus transform decode stays out of scope —
a named boundary, like MP3's deep tables).

Pages carry a CRC-32 (poly 0x04C11DB7, unreflected, init/xorout 0,
computed with the CRC field zeroed) — verified per page, so torn or
bit-flipped containers quarantine instead of mis-probing. The fixture
writer emits spec-exact pages (lacing, continuation flags, BOS/EOS,
granule positions) for roundtrip + tear tests."""

from __future__ import annotations

import struct

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
        _r &= 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


def parse_ogg_pages(payload: bytes):
    """Yield page dicts (flags, granule, serial, seq, segments,
    body) with per-page CRC verification. ValueError on torn input."""
    off = 0
    n = len(payload)
    while off < n:
        if n - off < 27:
            raise ValueError("torn Ogg page header")
        if payload[off : off + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        (ver, flags, granule, serial, seq, crc, nsegs) = struct.unpack_from(
            "<BBqIIIB", payload, off + 4
        )
        if ver != 0:
            raise ValueError(f"Ogg stream structure version {ver} out of range")
        lacing = payload[off + 27 : off + 27 + nsegs]
        if len(lacing) < nsegs:
            raise ValueError("torn Ogg lacing table")
        body_len = sum(lacing)
        body = payload[off + 27 + nsegs : off + 27 + nsegs + body_len]
        if len(body) < body_len:
            raise ValueError("torn Ogg page body")
        page = payload[off : off + 27 + nsegs + body_len]
        zeroed = page[:22] + b"\x00\x00\x00\x00" + page[26:]
        if _ogg_crc(zeroed) != crc:
            raise ValueError(f"Ogg page {seq} CRC mismatch")
        yield {
            "flags": flags,
            "granule": granule,
            "serial": serial,
            "seq": seq,
            "lacing": bytes(lacing),
            "body": body,
        }
        off += 27 + nsegs + body_len


def _first_packet(pages):
    """Reassemble the first packet of the first page (id headers
    always fit the first packet of the BOS page in practice)."""
    if not pages:
        raise ValueError("Ogg stream without pages")
    body = pages[0]["body"]
    end = 0
    for lv in pages[0]["lacing"]:
        end += lv
        if lv < 255:
            break
    return body[:end]


def probe_ogg(payload: bytes) -> dict:
    """Probe an Ogg container: codec, sample_rate, channels, n_pages,
    duration_seconds (from the final granule position), pre_skip
    (Opus). Granule semantics: Vorbis/FLAC granules are PCM samples at
    the stream rate; Opus granules are 48 kHz samples minus pre-skip
    (RFC 7845 §4)."""
    pages = list(parse_ogg_pages(payload))
    serials = {}
    for p in pages:
        serials.setdefault(p["serial"], []).append(p)
    if len(serials) != 1:
        raise ValueError(
            f"multiplexed Ogg ({len(serials)} streams) is a declared boundary"
        )
    stream = next(iter(serials.values()))
    if not stream[0]["flags"] & 2:
        raise ValueError("first Ogg page is not BOS")
    ident = _first_packet(stream)
    out = {
        "n_pages": len(pages),
        "eos": bool(stream[-1]["flags"] & 4),
        "pre_skip": 0,
    }
    last_granule = max((p["granule"] for p in stream if p["granule"] >= 0),
                      default=0)
    out["last_granule"] = int(last_granule)
    if ident[:7] == b"\x01vorbis" and len(ident) >= 30:
        ver, ch, rate = struct.unpack_from("<IBI", ident, 7)
        if ver != 0:
            raise ValueError(f"Vorbis version {ver} out of range")
        out.update(codec="vorbis", channels=ch, sample_rate=rate)
        out["duration_seconds"] = last_granule / rate if rate else 0.0
    elif ident[:8] == b"OpusHead" and len(ident) >= 19:
        ver, ch, pre_skip, in_rate = struct.unpack_from("<BBHI", ident, 8)
        if ver >> 4 != 0:
            raise ValueError(f"OpusHead version {ver} out of range")
        out.update(codec="opus", channels=ch, sample_rate=48000,
                   pre_skip=pre_skip)
        out["input_sample_rate"] = in_rate
        out["duration_seconds"] = max(0, last_granule - pre_skip) / 48000.0
    elif ident[:5] == b"\x7fFLAC" and len(ident) >= 13:
        # mapping header: 1 byte major, 1 minor, 2 header-count BE,
        # then the native fLaC signature + STREAMINFO
        if ident[9:13] != b"fLaC":
            raise ValueError("FLAC-in-Ogg mapping without fLaC signature")
        # after the 4-byte fLaC signature comes a 4-byte metadata block
        # header (1 type + 3 length BE); STREAMINFO data starts at 17
        if len(ident) >= 13 + 4 + 18:
            si = ident[13 + 4 :]
            rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
            ch = ((si[12] >> 1) & 7) + 1
            out.update(codec="flac", channels=ch, sample_rate=rate)
            out["duration_seconds"] = last_granule / rate if rate else 0.0
        else:
            out.update(codec="flac", channels=None, sample_rate=None,
                       duration_seconds=None)
    elif ident[:7] == b"\x80theora":
        out.update(codec="theora", channels=0, sample_rate=0,
                   duration_seconds=None)
    else:
        raise ValueError("unrecognized Ogg codec id header")
    return out


def build_ogg(packets: list[bytes], serial: int = 1, granules=None) -> bytes:
    """Fixture writer: one packet per page (with 255-lacing
    continuation across pages for long packets), BOS on the first,
    EOS on the last, spec-exact CRCs."""
    out = bytearray()
    seq = 0
    for pi, pkt in enumerate(packets):
        # split into lacing values; a packet of length k*255 needs a
        # terminating 0 lacing value
        lacing = []
        rem = len(pkt)
        while True:
            lacing.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
            if rem == 0:
                lacing.append(0)
                break
        if len(lacing) > 255:
            raise ValueError("fixture packet too long for one page")
        flags = (2 if pi == 0 else 0) | (4 if pi == len(packets) - 1 else 0)
        granule = granules[pi] if granules else (0 if pi == 0 else pi * 4800)
        head = b"OggS" + struct.pack(
            "<BBqIIIB", 0, flags, granule, serial, seq, 0, len(lacing)
        ) + bytes(lacing)
        page = head + pkt
        crc = _ogg_crc(page)
        page = page[:22] + struct.pack("<I", crc) + page[26:]
        out += page
        seq += 1
    return bytes(out)


def build_vorbis_id_packet(channels: int, rate: int) -> bytes:
    return (
        b"\x01vorbis" + struct.pack("<IBI", 0, channels, rate)
        + struct.pack("<iii", -1, 128000, -1) + b"\xb8\x01"
    )


def build_opus_head(channels: int, pre_skip: int, input_rate: int) -> bytes:
    return b"OpusHead" + struct.pack("<BBHIhB", 1, channels, pre_skip,
                                     input_rate, 0, 0)


# --- comment headers (metadata) — the ID3 twin [r12] ------------------------


def _all_packets(pages) -> tuple[list[bytes], list[int]]:
    """Reassemble every packet of a single-serial page list; returns
    (packets, granule per packet-ending page, -1 where none ends)."""
    packets: list[bytes] = []
    granules: list[int] = []
    cur = bytearray()
    for p in pages:
        body = p["body"]
        off = 0
        for lv in p["lacing"]:
            cur += body[off : off + lv]
            off += lv
            if lv < 255:
                packets.append(bytes(cur))
                granules.append(p["granule"])
                cur = bytearray()
    if cur:
        raise ValueError("torn Ogg stream: unterminated final packet")
    return packets, granules


def _parse_comment_block(data: bytes, what: str) -> tuple[str, list]:
    """vendor + TAG=value list (Vorbis I §5 comment layout, shared by
    OpusTags after its 8-byte magic)."""
    if len(data) < 8:
        raise ValueError(f"torn {what} block")
    (vlen,) = struct.unpack_from("<I", data, 0)
    if 4 + vlen + 4 > len(data):
        raise ValueError(f"torn {what} vendor string")
    vendor = data[4 : 4 + vlen].decode("utf-8", "replace")
    off = 4 + vlen
    (n,) = struct.unpack_from("<I", data, off)
    off += 4
    if n > 1 << 16:
        raise ValueError(f"{what} comment count out of range")
    tags = []
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError(f"torn {what} comment length")
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        if off + ln > len(data):
            raise ValueError(f"torn {what} comment body")
        item = data[off : off + ln].decode("utf-8", "replace")
        off += ln
        key, _, val = item.partition("=")
        tags.append((key.upper(), val))
    return vendor, tags


def extract_ogg_tags(payload: bytes) -> dict:
    """Extract the metadata block: Vorbis comment header (packet 2) or
    OpusTags. Returns {codec, vendor, tags: [(KEY, value)...]}."""
    probe = probe_ogg(payload)  # validates pages/CRCs/codec
    pages = list(parse_ogg_pages(payload))
    packets, _ = _all_packets(pages)
    if len(packets) < 2:
        raise ValueError("Ogg stream without a metadata packet")
    meta = packets[1]
    if probe["codec"] == "vorbis":
        if meta[:7] != b"\x03vorbis":
            raise ValueError("Vorbis comment header signature missing")
        vendor, tags = _parse_comment_block(meta[7:], "Vorbis comment")
    elif probe["codec"] == "opus":
        if meta[:8] != b"OpusTags":
            raise ValueError("OpusTags signature missing")
        vendor, tags = _parse_comment_block(meta[8:], "OpusTags")
    elif probe["codec"] == "flac":
        # [r12] FLAC-in-Ogg: header packets after the ident each carry
        # one native metadata block; VORBIS_COMMENT is type 4
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
            parse_vorbis_comment_body,
        )

        vendor, tags = "", []
        for pkt in packets[1:]:
            if len(pkt) < 4:
                continue
            btype = pkt[0] & 0x7F
            if btype == 4:
                vendor, tags = parse_vorbis_comment_body(pkt[4:])
                break
            if btype == 127:
                break  # audio frames begin
    else:
        raise ValueError(
            f"Ogg {probe['codec']} metadata outside the declared scope"
        )
    return {"codec": probe["codec"], "vendor": vendor, "tags": tags}


def _comment_packet(codec: str, vendor: str, tags: list) -> bytes:
    head = b"\x03vorbis" if codec == "vorbis" else b"OpusTags"
    vb = vendor.encode("utf-8")
    out = bytearray(head)
    out += struct.pack("<I", len(vb)) + vb
    out += struct.pack("<I", len(tags))
    for k, v in tags:
        item = f"{k}={v}".encode("utf-8")
        out += struct.pack("<I", len(item)) + item
    if codec == "vorbis":
        out += b"\x01"  # framing bit (Vorbis I §4.2.3)
    return bytes(out)


def strip_ogg_tags(payload: bytes, keep: tuple = ()) -> bytes:
    """Privacy strip (the ID3-strip twin): rewrite the stream with the
    comment packet replaced by an empty (or ``keep``-filtered) one —
    audio packets ride through VERBATIM, pages re-laced with fresh
    spec-exact CRCs."""
    meta = extract_ogg_tags(payload)
    pages = list(parse_ogg_pages(payload))
    packets, granules = _all_packets(pages)
    kept = [(k, v) for k, v in meta["tags"] if k in keep]
    if meta["codec"] == "flac":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
            build_vorbis_comment_body,
        )

        body = build_vorbis_comment_body("", kept)
        new_block = bytes([4]) + struct.pack(">I", len(body))[1:] + body
        replaced = False
        for i, pkt in enumerate(packets[1:], start=1):
            if len(pkt) >= 4 and (pkt[0] & 0x7F) == 4:
                packets[i] = new_block
                replaced = True
                break
        if not replaced:
            packets.insert(1, new_block)
            granules.insert(1, granules[0])
    else:
        packets[1] = _comment_packet(meta["codec"], "", kept)
    serial = pages[0]["serial"]
    return build_ogg(packets, serial=serial, granules=granules)
