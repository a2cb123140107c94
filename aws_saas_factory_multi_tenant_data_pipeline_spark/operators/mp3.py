"""MP3 (MPEG-1/2 Audio Layer III) frame-header parsing — stdlib only,
from the public ISO/IEC 11172-3 header layout.

The audio counterpart of the MP4 container layer: the FRAME layer of an
MP3 stream (sync walk, version/layer/bitrate/samplerate fields, frame
sizing, ID3v2 skip, ID3v1 trailer skip) is pure structured parsing and
gives a pipeline everything short of PCM: codec parameters, frame
count, byte-accurate frame boundaries, and a duration estimate — enough
to validate, route, deduplicate-by-container, and slice a 100 TB audio
crawl. The Huffman + hybrid-filterbank PCM decode genuinely exceeds
stdlib reach and stays stubbed (declared in SURVEY).

Tear contract: :func:`probe_mp3` raises ValueError — and only
ValueError — on anything unparseable; mid-stream garbage is reported,
never silently skipped past the first frame.
"""

from __future__ import annotations

#: MPEG-1 Layer III bitrates (kbps), index 1-14 (0=free, 15=bad)
_BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
#: MPEG-2/2.5 Layer III bitrates
_BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_SR_V1 = [44100, 48000, 32000]
_SR_V2 = [22050, 24000, 16000]
_SR_V25 = [11025, 12000, 8000]


def _frame_header(b0: int, b1: int, b2: int, b3: int):
    """Parse 4 header bytes → (version, layer, bitrate_kbps, sample_rate,
    padding, channels, samples_per_frame, frame_bytes) or None if not a
    valid Layer III sync."""
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_code = (b1 >> 3) & 0x3  # 0=2.5, 2=MPEG2, 3=MPEG1
    layer_code = (b1 >> 1) & 0x3  # 1 = Layer III
    if ver_code == 1 or layer_code != 1:
        return None
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3
    if ver_code == 3:
        version, bitrate = "MPEG1", _BITRATE_V1_L3[br_idx]
        sr = _SR_V1[sr_idx]
        spf = 1152
    else:
        version = "MPEG2" if ver_code == 2 else "MPEG2.5"
        bitrate = _BITRATE_V2_L3[br_idx]
        sr = (_SR_V2 if ver_code == 2 else _SR_V25)[sr_idx]
        spf = 576
    frame_bytes = (spf // 8 * bitrate * 1000) // sr + padding
    channels = 1 if mode == 3 else 2
    return version, 3, bitrate, sr, padding, channels, spf, frame_bytes


def probe_mp3(payload: bytes) -> dict:
    """Walk every frame of an MP3 stream (ID3v2 prefix and ID3v1 trailer
    skipped): returns version, layer, channels, sample_rate, bitrate
    stats (CBR/VBR), frame count + byte spans, and the sample-accurate
    duration. A torn or garbage-interrupted stream raises ValueError."""
    try:
        return _probe_inner(payload)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt MP3: {type(exc).__name__}: {exc}") from exc


def _probe_inner(payload: bytes) -> dict:
    i, n = 0, len(payload)
    if payload[:3] == b"ID3":
        if n < 10:
            raise ValueError("truncated ID3v2 header")
        size = 0
        for b in payload[6:10]:  # syncsafe 28-bit
            if b & 0x80:
                raise ValueError("bad ID3v2 syncsafe size")
            size = (size << 7) | b
        i = 10 + size
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: 10 trailing bytes NOT counted in the
            # syncsafe size (id3v2.4.0-structure §3.1)
            i += 10
    end = n
    if end - i >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128  # ID3v1 trailer
    frames = []
    bitrates = set()
    info = None
    total_samples = 0
    while i < end:
        if end - i < 4:
            raise ValueError(f"torn frame header at offset {i}")
        hdr = _frame_header(payload[i], payload[i + 1], payload[i + 2], payload[i + 3])
        if hdr is None:
            raise ValueError(f"lost frame sync at offset {i}")
        version, layer, bitrate, sr, _pad, ch, spf, fb = hdr
        if info is None:
            info = (version, layer, sr, ch)
        elif (version, layer, sr, ch) != info:
            raise ValueError(f"stream parameters change mid-file at offset {i}")
        if i + fb > end:
            raise ValueError(f"torn final frame at offset {i}")
        frames.append((i, fb))
        bitrates.add(bitrate)
        total_samples += spf
        i += fb
    if not frames:
        raise ValueError("no MP3 frames found")
    version, layer, sr, ch = info
    return {
        "version": version,
        "layer": layer,
        "sample_rate": sr,
        "channels": ch,
        "n_frames": len(frames),
        "frames": frames,
        "cbr": len(bitrates) == 1,
        "bitrate_kbps": max(bitrates) if len(bitrates) == 1 else None,
        "duration_s": round(total_samples / sr, 6),
    }


def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    stereo: bool = True,
    id3v2_bytes: int = 0,
) -> bytes:
    """Synthesize a structurally-valid MPEG-1 Layer III stream (headers +
    deterministic filler payload) — the parser's test fixture; actual
    audio content is irrelevant to the frame layer."""
    br_idx = _BITRATE_V1_L3.index(bitrate_kbps)
    sr_idx = _SR_V1.index(sample_rate)
    out = bytearray()
    if id3v2_bytes:
        body = bytes(id3v2_bytes)
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3v2_bytes >> 21) & 0x7F, (id3v2_bytes >> 14) & 0x7F,
             (id3v2_bytes >> 7) & 0x7F, id3v2_bytes & 0x7F]
        ) + body
    for k in range(n_frames):
        padding = k % 2  # alternate padding to exercise frame sizing
        b1 = 0xE0 | (3 << 3) | (1 << 1) | 1  # MPEG1, Layer III, no CRC
        b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
        b3 = (0 if stereo else 3) << 6
        fb = (1152 // 8 * bitrate_kbps * 1000) // sample_rate + padding
        frame = bytearray([0xFF, b1, b2, b3])
        while len(frame) < fb:
            frame.append((k * 31 + len(frame)) & 0xFF)
            if frame[-1] == 0xFF:  # avoid fake sync inside filler
                frame[-1] = 0x00
        out += frame[:fb]
    return bytes(out)
