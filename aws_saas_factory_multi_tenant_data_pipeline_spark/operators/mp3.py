"""MP3 (MPEG-1/2 Audio Layer III) frame parsing AND a scoped PCM decode
— stdlib + numpy, from the public ISO/IEC 11172-3 / 13818-3 layouts.

Two layers:

* FRAME layer (:func:`probe_mp3`): sync walk, version/layer/bitrate/
  samplerate fields, frame sizing, ID3v2 skip (incl. v2.4 footer),
  ID3v1 trailer skip — codec parameters, frame count, byte-accurate
  frame boundaries, and a duration estimate for routing/validation/
  container-dedup over a 100 TB audio crawl.
* PCM decode (:func:`decode_mp3`): the full Layer III chain — side
  information (MPEG-1 and LSF), scalefactors (both schemes), Huffman
  spectral decode with bit-exact part2_3_length accounting, power-law
  requantization, MS stereo, alias reduction, hybrid IMDCT with
  overlap-add and frequency inversion, 32-band polyphase synthesis —
  with three DECLARED boundaries (each a per-row-visible ValueError,
  see the decode section comment): Huffman tables 11-15/16-31 (spec
  Table B.7 data with no trustworthy in-container source; the table
  dict is the swap seam), intensity stereo in its LSF and short-block
  variants (the MPEG-1 long-block form IS decoded — is_pos
  scalefactors, tan(is_pos*pi/12) ratios, is_pos 7 -> MS/plain
  fallback), and a computed
  near-perfect-reconstruction synthesis prototype standing in for the
  tabulated ISO Table 3-B.3 window (injectable via
  ``synthesis_window=``). Everything through the IMDCT is spec-exact
  and pinned closed-form in tests/test_mp3_decode.py.

Tear contract: :func:`probe_mp3` and :func:`decode_mp3` raise
ValueError — and only ValueError — on anything unparseable; mid-stream
garbage is reported, never silently skipped past the first frame.
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


# --- Layer III PCM decode --------------------------------------------------
#
# From the public ISO/IEC 11172-3 §2.4 (MPEG-1) and ISO/IEC 13818-3 (LSF)
# decode chain: side information, scalefactors, Huffman spectral decode,
# requantization, MS stereo, alias reduction, hybrid IMDCT filterbank with
# overlap-add, frequency inversion, and the 32-band polyphase synthesis.
#
# DECLARED BOUNDARIES (the honest scope — each raises ValueError so the
# quarantine path stays per-row visible, matching the H.264 convention):
#
# * Huffman big-value tables: only tables whose (code, length) grids could
#   be reproduced from public spec knowledge AND pass the structural
#   completeness validator (Kraft sum == 1 + prefix-freeness, enforced at
#   import — a single wrong entry in a COMPLETE prefix code almost surely
#   breaks one of the two) are shipped: 0-3, 5-10, plus both count1
#   tables. Tables 11-15 and the 16-31 linbits families are spec data
#   (Table B.7, ~4x256 entries) this container has no trustworthy source
#   for — a granule selecting them raises "Huffman table N unavailable".
#   The table dict is the swap seam: supplying the full Table B.7 data
#   lights up full coverage with zero code changes.
# * Intensity stereo: the MPEG-1 long-block form is DECODED
#   (_apply_intensity_long, closed-form-tested); the LSF io-scheme and
#   short-block variants raise (rare in practice; MS is supported).
# * The polyphase synthesis prototype window is COMPUTED (Kaiser-windowed
#   sinc, near-perfect-reconstruction, measured in tests) rather than the
#   tabulated ISO Table 3-B.3 values (512 arbitrary constants, same
#   sourcing problem). Everything through the IMDCT is spec-exact; the
#   final synthesis is approximate-by-declared-design and injectable via
#   ``synthesis_window=`` for a spec-table or libmad-grade swap.

import numpy as np


def _validate_huffman(name: str, tab: dict) -> dict:
    """Reject any non-complete or non-prefix-free code table at import:
    MP3's tables are COMPLETE prefix codes, so Kraft sum must be exactly
    1 and no code may prefix another — a strong structural checksum."""
    kraft = 0.0
    codes = []
    for (cd, ln) in tab.values():
        if not 0 < ln <= 19 or cd >= (1 << ln):
            raise AssertionError(f"huffman {name}: bad entry {(cd, ln)}")
        kraft += 2.0 ** -ln
        codes.append(format(cd, f"0{ln}b"))
    s = sorted(codes)
    if abs(kraft - 1.0) > 1e-12 or len(set(s)) != len(s) or any(
        s[i + 1].startswith(s[i]) for i in range(len(s) - 1)
    ):
        raise AssertionError(f"huffman {name}: not a complete prefix code")
    return tab


def _grid(hlen, hcod) -> dict:
    return {
        (x, y): (hcod[x][y], hlen[x][y])
        for x in range(len(hlen))
        for y in range(len(hlen[x]))
    }


#: big-value tables (x, y) -> (code, length); key = table_select
HUFFMAN_BIG: dict[int, dict] = {
    1: _validate_huffman("t1", _grid([[1, 3], [2, 3]], [[1, 1], [1, 0]])),
    2: _validate_huffman(
        "t2",
        _grid(
            [[1, 3, 6], [3, 3, 5], [5, 5, 6]],
            [[1, 2, 1], [3, 1, 1], [3, 2, 0]],
        ),
    ),
    3: _validate_huffman(
        "t3",
        _grid(
            [[2, 2, 6], [3, 2, 5], [5, 5, 6]],
            [[3, 2, 1], [1, 1, 1], [3, 2, 0]],
        ),
    ),
    5: _validate_huffman(
        "t5",
        _grid(
            [[1, 3, 6, 7], [3, 3, 6, 7], [6, 6, 7, 8], [7, 6, 7, 8]],
            [[1, 2, 6, 5], [3, 1, 4, 4], [7, 5, 7, 1], [6, 1, 1, 0]],
        ),
    ),
    6: _validate_huffman(
        "t6",
        _grid(
            [[3, 3, 5, 7], [3, 2, 4, 5], [4, 4, 5, 6], [6, 5, 6, 7]],
            [[7, 3, 5, 1], [6, 2, 3, 2], [5, 4, 4, 1], [3, 3, 2, 0]],
        ),
    ),
    7: _validate_huffman(
        "t7",
        _grid(
            [
                [1, 3, 6, 8, 8, 9],
                [3, 4, 6, 7, 7, 8],
                [6, 5, 7, 8, 8, 9],
                [7, 7, 8, 9, 9, 9],
                [7, 7, 8, 9, 9, 10],
                [8, 8, 9, 10, 10, 10],
            ],
            [
                [1, 2, 10, 19, 16, 10],
                [3, 3, 7, 10, 5, 3],
                [11, 4, 13, 17, 8, 4],
                [12, 11, 18, 15, 11, 2],
                [7, 6, 9, 14, 3, 1],
                [6, 4, 5, 3, 2, 0],
            ],
        ),
    ),
    8: _validate_huffman(
        "t8",
        _grid(
            [
                [2, 3, 6, 8, 8, 9],
                [3, 2, 4, 8, 8, 8],
                [6, 4, 6, 8, 8, 9],
                [8, 8, 8, 9, 9, 10],
                [8, 7, 8, 9, 10, 10],
                [9, 8, 9, 9, 11, 11],
            ],
            [
                [3, 4, 6, 18, 12, 5],
                [5, 1, 2, 16, 9, 3],
                [7, 3, 5, 14, 7, 3],
                [19, 17, 15, 13, 10, 4],
                [13, 5, 8, 11, 5, 1],
                [12, 4, 4, 1, 1, 0],
            ],
        ),
    ),
    9: _validate_huffman(
        "t9",
        _grid(
            [
                [3, 3, 5, 6, 8, 9],
                [3, 3, 4, 5, 6, 8],
                [4, 4, 5, 6, 7, 8],
                [6, 5, 6, 7, 7, 8],
                [7, 6, 7, 7, 8, 9],
                [8, 7, 8, 8, 9, 9],
            ],
            [
                [7, 5, 9, 14, 15, 7],
                [6, 4, 5, 5, 6, 7],
                [7, 6, 8, 8, 8, 5],
                [15, 6, 9, 10, 5, 1],
                [11, 7, 9, 6, 4, 1],
                [14, 4, 6, 2, 6, 0],
            ],
        ),
    ),
    10: _validate_huffman(
        "t10",
        _grid(
            [
                [1, 3, 6, 8, 9, 9, 9, 10],
                [3, 4, 6, 7, 8, 9, 8, 8],
                [6, 6, 7, 8, 9, 10, 9, 9],
                [7, 7, 8, 9, 10, 10, 9, 10],
                [8, 8, 9, 10, 10, 10, 10, 10],
                [9, 9, 10, 10, 11, 11, 10, 11],
                [8, 8, 9, 10, 10, 10, 11, 11],
                [9, 8, 9, 10, 10, 11, 11, 11],
            ],
            [
                [1, 2, 10, 23, 35, 30, 12, 17],
                [3, 3, 8, 12, 18, 21, 12, 7],
                [11, 9, 15, 21, 32, 40, 19, 6],
                [14, 13, 22, 34, 46, 23, 18, 7],
                [20, 19, 33, 47, 27, 22, 9, 3],
                [31, 22, 41, 26, 21, 20, 5, 3],
                [14, 13, 10, 11, 16, 6, 5, 1],
                [9, 8, 7, 8, 4, 4, 2, 0],
            ],
        ),
    ),
}

#: count1 quadruple table A (table B.7 "count1table 0"): value v (4 bits
#: of |w|,|x|,|y|,|z|) -> (code, length)
HUFFMAN_COUNT1A = _validate_huffman(
    "count1A",
    {
        v: (c, l)
        for v, (c, l) in enumerate(
            zip(
                [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1],
                [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6],
            )
        )
    },
)
#: count1 table B: fixed 4-bit codes, code = ~v & 0xF
HUFFMAN_COUNT1B = _validate_huffman(
    "count1B", {v: ((~v) & 0xF, 4) for v in range(16)}
)

#: linbits per table id for the ESC families (the code grids themselves
#: are the unavailable spec data; kept so the boundary message is exact)
_LINBITS = dict(
    zip(range(16, 32), [1, 2, 3, 4, 6, 8, 10, 13, 4, 5, 6, 7, 8, 9, 11, 13])
)

#: scalefactor band boundaries (long: 23 edges, short: 14 edges) per rate
SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
            162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
            156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
            194, 240, 296, 364, 448, 550, 576],
    22050: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576],
    24000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162,
            194, 232, 278, 332, 394, 464, 540, 576],
    16000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168,
            200, 238, 284, 336, 396, 464, 522, 576],
}
SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
    22050: [0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192],
    24000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192],
    16000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192],
}
for _sr, _t in SFB_LONG.items():
    assert len(_t) == 23 and _t[-1] == 576 and all(
        a < b for a, b in zip(_t, _t[1:])
    ), _sr
for _sr, _t in SFB_SHORT.items():
    assert len(_t) == 14 and _t[-1] == 192 and all(
        a < b for a, b in zip(_t, _t[1:])
    ), _sr

_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]
#: MPEG-1 scalefac_compress -> (slen1, slen2)
_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3)]


class _Bits:
    """MSB-first bit reader with an exact position (the part2_3_length
    accounting the spec's sync contract depends on)."""

    __slots__ = ("b", "p")

    def __init__(self, b: bytes, pos_bits: int = 0):
        self.b = b
        self.p = pos_bits

    def u(self, n: int) -> int:
        v = 0
        b, p = self.b, self.p
        if (p + n) > len(b) * 8:
            raise ValueError("bitstream exhausted")
        for _ in range(n):
            v = (v << 1) | ((b[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.p = p
        return v

    def u1(self) -> int:
        p = self.p
        if p >= len(self.b) * 8:
            raise ValueError("bitstream exhausted")
        self.p = p + 1
        return (self.b[p >> 3] >> (7 - (p & 7))) & 1


def _decode_tables() -> dict[int, dict]:
    """Fast-decode form: table id -> {bitstring-int keyed trie}. Built
    lazily as {(length, code): (x, y)} maps for step decoding."""
    out = {}
    for tid, tab in HUFFMAN_BIG.items():
        out[tid] = {(ln, cd): xy for xy, (cd, ln) in tab.items()}
    return out


_BIG_DECODE = _decode_tables()
_C1A_DECODE = {(ln, cd): v for v, (cd, ln) in HUFFMAN_COUNT1A.items()}
_C1B_DECODE = {(ln, cd): v for v, (cd, ln) in HUFFMAN_COUNT1B.items()}


def _read_code(bits: _Bits, dec: dict, what: str):
    """Read one prefix code (max 19 bits) from the stream."""
    cd = 0
    for ln in range(1, 20):
        cd = (cd << 1) | bits.u1()
        hit = dec.get((ln, cd))
        if hit is not None:
            return hit
    raise ValueError(f"invalid {what} huffman code")


class _Granule:
    __slots__ = (
        "part2_3_length", "big_values", "global_gain", "scalefac_compress",
        "window_switching", "block_type", "mixed_block", "table_select",
        "subblock_gain", "region0_count", "region1_count", "preflag",
        "scalefac_scale", "count1table_select",
    )


def _parse_side_info(data: bytes, lsf: bool, channels: int):
    """Parse the side information block; returns (main_data_begin,
    granules[ngr][nch], side_bytes)."""
    bits = _Bits(data)
    if lsf:
        main_data_begin = bits.u(8)
        bits.u(1 if channels == 1 else 2)
        ngr = 1
        side_bytes = 9 if channels == 1 else 17
    else:
        main_data_begin = bits.u(9)
        bits.u(5 if channels == 1 else 3)
        scfsi = [[bits.u1() for _ in range(4)] for _ in range(channels)]
        ngr = 2
        side_bytes = 17 if channels == 1 else 32
    grans = []
    for _g in range(ngr):
        row = []
        for _ch in range(channels):
            g = _Granule()
            g.part2_3_length = bits.u(12)
            g.big_values = bits.u(9)
            if g.big_values > 288:
                raise ValueError(f"big_values {g.big_values} > 288")
            g.global_gain = bits.u(8)
            g.scalefac_compress = bits.u(9 if lsf else 4)
            g.window_switching = bits.u1()
            if g.window_switching:
                g.block_type = bits.u(2)
                if g.block_type == 0:
                    raise ValueError("window_switching with block_type 0")
                g.mixed_block = bits.u1()
                g.table_select = [bits.u(5), bits.u(5)]
                g.subblock_gain = [bits.u(3) for _ in range(3)]
                # spec-implied region split for switched blocks: region0
                # ends at long-band edge 8 (36 samples for pure-short),
                # region2 is empty
                g.region0_count = 7
                g.region1_count = 36
            else:
                g.block_type = 0
                g.mixed_block = 0
                g.table_select = [bits.u(5), bits.u(5), bits.u(5)]
                g.subblock_gain = [0, 0, 0]
                g.region0_count = bits.u(4)
                g.region1_count = bits.u(3)
            g.preflag = 0 if lsf else bits.u1()
            g.scalefac_scale = bits.u1()
            g.count1table_select = bits.u1()
            row.append(g)
        grans.append(row)
    return main_data_begin, grans, side_bytes, (None if lsf else scfsi)


def _read_scalefactors_v1(bits: _Bits, g: _Granule, scfsi_ch, prev):
    """MPEG-1 scalefactors: returns (long[21], short[12][3])."""
    slen1, slen2 = _SLEN[g.scalefac_compress]
    if g.block_type == 2:
        sf_s = [[0] * 3 for _ in range(13)]
        if g.mixed_block:
            sf_l = [bits.u(slen1) for _ in range(8)] + [0] * 13
            for sfb in range(3, 6):
                for w in range(3):
                    sf_s[sfb][w] = bits.u(slen1)
        else:
            sf_l = [0] * 21
            for sfb in range(6):
                for w in range(3):
                    sf_s[sfb][w] = bits.u(slen1)
        for sfb in range(6, 12):
            for w in range(3):
                sf_s[sfb][w] = bits.u(slen2)
        return sf_l, sf_s
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
    sf_l = [0] * 21
    for gi, (lo, hi, sl) in enumerate(groups):
        if scfsi_ch is not None and scfsi_ch[gi] and prev is not None:
            for sfb in range(lo, hi):
                sf_l[sfb] = prev[0][sfb]
        else:
            for sfb in range(lo, hi):
                sf_l[sfb] = bits.u(sl)
    return sf_l, [[0] * 3 for _ in range(13)]


def _read_scalefactors_lsf(bits: _Bits, g: _Granule):
    """MPEG-2 LSF scalefactors (non-intensity channel): ISO 13818-3
    modified scheme — scalefac_compress selects 4 slens and a band
    partition; preflag is implied by the >= 500 branch."""
    sfc = g.scalefac_compress
    bt = g.block_type if g.window_switching else 0
    kind = 2 if (bt == 2 and g.mixed_block) else (1 if bt == 2 else 0)
    if sfc < 400:
        slens = [(sfc >> 4) // 5, (sfc >> 4) % 5, (sfc % 16) >> 2, sfc % 4]
        nr = [(6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)][kind]
        preflag = 0
    elif sfc < 500:
        s = sfc - 400
        slens = [(s >> 2) // 5, (s >> 2) % 5, s % 4, 0]
        nr = [(6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)][kind]
        preflag = 0
    else:
        s = sfc - 500
        slens = [s // 3, s % 3, 0, 0]
        nr = [(11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)][kind]
        preflag = 1
    raw = []
    for cnt, sl in zip(nr, slens):
        for _ in range(cnt):
            raw.append(bits.u(sl) if sl else 0)
    g.preflag = preflag
    if bt == 2 and not g.mixed_block:
        sf_s = [[0] * 3 for _ in range(13)]
        for i, v in enumerate(raw[:36]):
            sf_s[i // 3][i % 3] = v
        return [0] * 21, sf_s
    if bt == 2 and g.mixed_block:
        sf_l = raw[:6] + [0] * 15
        sf_s = [[0] * 3 for _ in range(13)]
        for i, v in enumerate(raw[6:33]):
            sfb = 3 + i // 3
            sf_s[sfb][i % 3] = v
        return sf_l, sf_s
    sf_l = (raw + [0] * 21)[:21]
    return sf_l, [[0] * 3 for _ in range(13)]


def _huffman_spectrum(bits: _Bits, g: _Granule, sr: int, end_bit: int):
    """Decode the 576 quantized values of one granule; must land exactly
    inside part2_3_length (stuffing bits allowed after count1)."""
    ix = [0] * 576
    # region boundaries in sample indices, from the LONG band table
    band = SFB_LONG[sr]
    if g.window_switching and g.block_type == 2 and not g.mixed_block:
        region1_start = 36
    else:
        region1_start = band[min(g.region0_count + 1, 22)]
    if g.window_switching:
        region2_start = 576
    else:
        region2_start = band[
            min(g.region0_count + 1 + g.region1_count + 1, 22)
        ]
    big_end = g.big_values * 2
    if big_end > 576:
        raise ValueError("big_values region exceeds 576")
    i = 0
    while i < big_end:
        if i < region1_start:
            tid = g.table_select[0]
        elif i < region2_start:
            tid = g.table_select[1]
        else:
            tid = g.table_select[2] if len(g.table_select) > 2 else 0
        if tid == 0:
            ix[i] = ix[i + 1] = 0
            i += 2
            continue
        if tid in (4, 14):
            raise ValueError(f"huffman table {tid} is reserved")
        dec = _BIG_DECODE.get(tid)
        if dec is None:
            lb = _LINBITS.get(tid)
            raise ValueError(
                f"huffman table {tid} unavailable"
                + (f" (linbits {lb} family: spec Table B.7 data not "
                   f"shipped in this container)" if lb else
                   " (spec Table B.7 data not shipped in this container)")
            )
        x, y = _read_code(bits, dec, f"table {tid}")
        # (shipped tables have no linbits; ESC handling would read
        # linbits extension bits here for |v| == 15)
        if x:
            if bits.u1():
                x = -x
        if y:
            if bits.u1():
                y = -y
        ix[i], ix[i + 1] = x, y
        i += 2
    # count1 region: quadruples until the granule's bit budget is used
    c1dec = _C1B_DECODE if g.count1table_select else _C1A_DECODE
    while bits.p < end_bit and i + 4 <= 576:
        start = bits.p
        v = _read_code(bits, c1dec, "count1")
        quad = []
        for bitpos in (3, 2, 1, 0):
            mag = (v >> bitpos) & 1
            if mag and bits.u1():
                mag = -mag
            quad.append(mag)
        if bits.p > end_bit:
            # the spilled quad the spec tells decoders to discard
            bits.p = start
            break
        ix[i : i + 4] = quad
        i += 4
    if bits.p > end_bit:
        raise ValueError("huffman data overruns part2_3_length")
    bits.p = end_bit  # skip stuffing/ancillary bits
    return ix, i


def _requantize(ix, g: _Granule, sr: int, sf_l, sf_s):
    """ix (576 ints) -> xr (float64), ISO 11172-3 2.4.3.4.7.x: global
    gain, scalefactors (+pretab when preflag), subblock gain for short
    windows; |v|^(4/3) power law. Exact formula, vectorized."""
    xr = np.zeros(576)
    v = np.asarray(ix, dtype=np.float64)
    mag = np.abs(v) ** (4.0 / 3.0) * np.sign(v)
    mult = 0.5 * (g.scalefac_scale + 1)
    bt2 = g.window_switching and g.block_type == 2
    long_end = 576
    if bt2:
        long_end = SFB_LONG[sr][8] if g.mixed_block else 0
    band_l = SFB_LONG[sr]
    for sfb in range(22):
        lo, hi = band_l[sfb], band_l[sfb + 1]
        if lo >= long_end:
            break
        hi = min(hi, long_end)
        sf = sf_l[sfb] if sfb < 21 else 0
        pre = _PRETAB[sfb] if g.preflag else 0
        exp = (g.global_gain - 210) / 4.0 - mult * (sf + pre)
        xr[lo:hi] = mag[lo:hi] * 2.0 ** exp
    if bt2:
        band_s = SFB_SHORT[sr]
        first_sfb = 3 if g.mixed_block else 0
        for sfb in range(first_sfb, 13):
            lo, hi = band_s[sfb], band_s[sfb + 1]
            width = hi - lo
            for w in range(3):
                base = lo * 3 + w * width
                sf = sf_s[sfb][w] if sfb < 12 else 0
                exp = (
                    (g.global_gain - 210 - 8 * g.subblock_gain[w]) / 4.0
                    - mult * sf
                )
                xr[base : base + width] = mag[base : base + width] * 2.0 ** exp
    return xr


def _reorder_short(xr, g: _Granule, sr: int):
    """Short-block samples arrive (sfb, window, line); the filterbank
    needs (subband: 3 windows x 6 lines). Long part of a mixed block is
    left in place."""
    if not (g.window_switching and g.block_type == 2):
        return xr
    out = xr.copy()
    band_s = SFB_SHORT[sr]
    first_sfb = 3 if g.mixed_block else 0
    start_line = band_s[first_sfb]
    for sfb in range(first_sfb, 13):
        lo, hi = band_s[sfb], band_s[sfb + 1]
        width = hi - lo
        for w in range(3):
            for j in range(width):
                line = lo + j
                src = lo * 3 + w * width + j
                dst = (line // 6) * 18 + w * 6 + (line % 6)
                if dst >= start_line * 3:
                    out[dst] = xr[src]
    return out


_ALIAS_CI = np.array(
    [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
)
_ALIAS_CS = 1.0 / np.sqrt(1.0 + _ALIAS_CI ** 2)
_ALIAS_CA = _ALIAS_CI * _ALIAS_CS


def _alias_reduce(xr, g: _Granule):
    """Butterflies across subband boundaries (none for pure short
    blocks, first boundary only for mixed)."""
    if g.window_switching and g.block_type == 2:
        n_b = 1 if g.mixed_block else 0
    else:
        n_b = 31
    for sb in range(1, n_b + 1):
        for i in range(8):
            a = xr[18 * sb - 1 - i]
            b = xr[18 * sb + i]
            xr[18 * sb - 1 - i] = a * _ALIAS_CS[i] - b * _ALIAS_CA[i]
            xr[18 * sb + i] = b * _ALIAS_CS[i] + a * _ALIAS_CA[i]
    return xr


def _imdct_mats():
    m36 = np.zeros((36, 18))
    for i in range(36):
        for k in range(18):
            m36[i, k] = np.cos(np.pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
    m12 = np.zeros((12, 6))
    for i in range(12):
        for k in range(6):
            m12[i, k] = np.cos(np.pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
    i36 = np.arange(36)
    win = {0: np.sin(np.pi / 36.0 * (i36 + 0.5))}
    w1 = np.sin(np.pi / 36.0 * (i36 + 0.5)).copy()
    w1[18:24] = 1.0
    w1[24:30] = np.sin(np.pi / 12.0 * (np.arange(24, 30) - 18 + 0.5))
    w1[30:] = 0.0
    win[1] = w1
    w3 = np.sin(np.pi / 36.0 * (i36 + 0.5)).copy()
    w3[:6] = 0.0
    w3[6:12] = np.sin(np.pi / 12.0 * (np.arange(6, 12) - 6 + 0.5))
    w3[12:18] = 1.0
    win[3] = w3
    win[2] = np.sin(np.pi / 12.0 * (np.arange(12) + 0.5))  # one short win
    return m36, m12, win


_IMDCT36, _IMDCT12, _IMDCT_WIN = _imdct_mats()


def _hybrid_synthesis(xr, g: _Granule, overlap):
    """Per-subband IMDCT + window + overlap-add; returns time samples
    s[32][18] and mutates ``overlap`` (the saved second half)."""
    out = np.zeros((32, 18))
    for sb in range(32):
        X = xr[18 * sb : 18 * (sb + 1)]
        bt = g.block_type if g.window_switching else 0
        if bt == 2 and g.mixed_block and sb < 2:
            bt = 0
        if bt == 2:
            z = np.zeros(36)
            for w in range(3):
                xw = _IMDCT12 @ X[w * 6 : (w + 1) * 6]
                z[6 + 6 * w : 18 + 6 * w] += xw * _IMDCT_WIN[2]
        else:
            z = (_IMDCT36 @ X) * _IMDCT_WIN[bt]
        out[sb] = z[:18] + overlap[sb]
        overlap[sb] = z[18:]
        if sb % 2 == 1:  # frequency inversion on odd subbands
            out[sb, 1::2] = -out[sb, 1::2]
    return out


def synthesis_prototype(taps: int = 512, beta: float = 9.0) -> np.ndarray:
    """COMPUTED near-perfect-reconstruction prototype for the 32-band
    polyphase synthesis (Kaiser-windowed sinc, cutoff pi/64) — the
    declared stand-in for the tabulated ISO Table 3-B.3 window, and the
    swap seam: pass the spec table to :func:`decode_mp3` via
    ``synthesis_window=`` to get bit-faithful synthesis. Normalized so
    the matching analysis->synthesis loop has unity gain (measured by
    tests/test_mp3_decode.py; absolute output level is self-consistent,
    not spec-calibrated — scale-invariant consumers only)."""
    n = np.arange(taps)
    t = (n - (taps - 1) / 2.0) / 64.0
    h = np.sinc(t) / 64.0
    h *= np.i0(beta * np.sqrt(1 - ((n - (taps - 1) / 2) / (taps / 2)) ** 2)) / np.i0(beta)
    # unity DC reconstruction: sum of each 32-phase must average 1/32
    h *= 1.0 / (32.0 * h.sum() / 32.0)
    return h


class _SynthBank:
    """Direct cosine-modulated synthesis bank: y(32m+i) =
    sum_j sum_k S_k(m-j) * h[32j+i] * cos(pi/32*(k+0.5)*(32j+i-16)).
    16 precomputed 32x32 tap matrices per channel; mathematically
    explicit (no V/U sign-folkore), numpy matmuls."""

    def __init__(self, window: np.ndarray | None = None):
        h = synthesis_prototype() if window is None else np.asarray(window, float)
        if h.shape != (512,):
            raise ValueError("synthesis window must have 512 taps")
        t = np.arange(512)
        k = np.arange(32)
        g = h[None, :] * np.cos(
            np.pi / 32.0 * (k[:, None] + 0.5) * (t[None, :] - 16)
        )  # [32 bands, 512 taps]
        self.G = [g[:, 32 * j : 32 * (j + 1)].T.copy() for j in range(16)]
        self.fifo = [np.zeros(32) for _ in range(16)]

    def process(self, s: np.ndarray) -> np.ndarray:
        """s[32][18] -> 576 PCM samples."""
        out = np.empty(576)
        for m in range(18):
            self.fifo.insert(0, s[:, m])
            self.fifo.pop()
            acc = np.zeros(32)
            for j in range(16):
                acc += self.G[j] @ self.fifo[j]
            out[32 * m : 32 * (m + 1)] = acc
        return out


def decode_mp3(payload: bytes, synthesis_window=None):
    """Decode an MP3 (MPEG-1 / MPEG-2 / MPEG-2.5 Layer III) payload to
    (samples float64 [n, channels], sample_rate, channels). ValueError —
    and only ValueError — on torn input or on the declared boundaries
    (Huffman tables 11-31, intensity stereo); see the module section
    comment for the honest scope."""
    try:
        return _decode_inner(payload, synthesis_window)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt MP3: {type(exc).__name__}: {exc}") from exc


def _apply_intensity_long(xr_ch, rzero_right, sf_right_long, sr, ms_on):
    """ISO 11172-3 §2.4.3.4.9.3 long-block intensity stereo: scalefactor
    bands at/above the RIGHT channel's zero part are intensity-coded —
    is_pos is the right channel's RAW scalefactor for the band (band 21
    reuses band 20's), 7 means intensity off for that band (falls back
    to MS when MS is also on, else plain L/R). Below the intensity
    start, MS applies when on. Mutates ``xr_ch`` in place."""
    band = SFB_LONG[sr]
    start_sfb = next((s for s in range(22) if band[s] >= rzero_right), 22)
    l, r = xr_ch
    r2 = np.sqrt(2.0)
    if ms_on and start_sfb > 0:
        hi = band[start_sfb]
        m, s = l[:hi].copy(), r[:hi].copy()
        l[:hi] = (m + s) / r2
        r[:hi] = (m - s) / r2
    for sfb in range(start_sfb, 22):
        lo, hi = band[sfb], band[sfb + 1]
        is_pos = sf_right_long[sfb if sfb < 21 else 20]
        if is_pos == 7:
            if ms_on:
                m, s = l[lo:hi].copy(), r[lo:hi].copy()
                l[lo:hi] = (m + s) / r2
                r[lo:hi] = (m - s) / r2
            continue
        if is_pos == 6:
            frac_l, frac_r = 1.0, 0.0  # tan(pi/2): all energy left
        else:
            ratio = np.tan(is_pos * np.pi / 12.0)
            frac_l = ratio / (1.0 + ratio)
            frac_r = 1.0 / (1.0 + ratio)
        src = l[lo:hi].copy()
        l[lo:hi] = src * frac_l
        r[lo:hi] = src * frac_r


def _decode_inner(payload: bytes, synthesis_window=None):
    info = _probe_inner(payload)
    sr, ch = info["sample_rate"], info["channels"]
    if sr not in SFB_LONG:
        raise ValueError(
            f"MPEG-2.5 rate {sr} Hz: scalefactor band tables not shipped "
            "(declared boundary; frame layer still parses these streams)"
        )
    lsf = info["version"] != "MPEG1"
    ngr = 1 if lsf else 2
    reservoir = b""
    overlap = [np.zeros((32, 18)) for _ in range(ch)]
    banks = [_SynthBank(synthesis_window) for _ in range(ch)]
    pcm = []
    for off, fb in info["frames"]:
        b1, b3 = payload[off + 1], payload[off + 3]
        protected = (b1 & 1) == 0
        mode = (b3 >> 6) & 3
        mode_ext = (b3 >> 4) & 3
        intensity = mode == 1 and (mode_ext & 1)
        if intensity and lsf:
            # LSF intensity uses a different io^((is_pos+1)/2) scheme —
            # still a declared boundary
            raise ValueError("LSF intensity stereo not supported (declared)")
        ms_stereo = mode == 1 and (mode_ext & 2)
        side_off = off + 4 + (2 if protected else 0)
        mdb, grans, side_bytes, scfsi = _parse_side_info(
            payload[side_off : side_off + 32], lsf, ch
        )
        main = payload[side_off + side_bytes : off + fb]
        if mdb > len(reservoir):
            raise ValueError("main_data_begin reaches before the reservoir")
        start_bit = (len(reservoir) - mdb) * 8
        data = reservoir + main
        bits = _Bits(data, start_bit)
        frame_pcm = np.zeros((576 * ngr, ch))
        prev_sf = [None] * ch
        for gi in range(ngr):
            xr_ch = []
            nz_ch = []
            sf_ch = []
            for c in range(ch):
                g = grans[gi][c]
                start = bits.p
                end_bit = start + g.part2_3_length
                if lsf:
                    sf_l, sf_s = _read_scalefactors_lsf(bits, g)
                else:
                    sf_l, sf_s = _read_scalefactors_v1(
                        bits, g,
                        scfsi[c] if gi == 1 else None,
                        prev_sf[c],
                    )
                prev_sf[c] = (sf_l, sf_s)
                ix, nz = _huffman_spectrum(bits, g, sr, end_bit)
                xr = _requantize(ix, g, sr, sf_l, sf_s)
                xr = _reorder_short(xr, g, sr)
                xr_ch.append(xr)
                nz_ch.append(nz)
                sf_ch.append((sf_l, sf_s))
            if intensity:
                g_r = grans[gi][1]
                if g_r.window_switching and g_r.block_type == 2:
                    raise ValueError(
                        "short-block intensity stereo not supported (declared)"
                    )
                _apply_intensity_long(
                    xr_ch, nz_ch[1], sf_ch[1][0], sr, bool(ms_stereo)
                )
            elif ms_stereo:
                m = xr_ch[0].copy()
                s = xr_ch[1].copy()
                r2 = np.sqrt(2.0)
                xr_ch[0] = (m + s) / r2
                xr_ch[1] = (m - s) / r2
            for c in range(ch):
                g = grans[gi][c]
                xr = _alias_reduce(xr_ch[c], g)
                sbs = _hybrid_synthesis(xr, g, overlap[c])
                frame_pcm[576 * gi : 576 * (gi + 1), c] = banks[c].process(sbs)
        pcm.append(frame_pcm)
        # reservoir keeps at most 511 bytes of history (the 9-bit pointer)
        reservoir = (reservoir + main)[-511:]
    out = np.concatenate(pcm, axis=0)
    return out, sr, ch


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, bits: int):
        if bits and not 0 <= v < (1 << bits):
            raise ValueError(f"value {v} does not fit {bits} bits")
        self.acc = (self.acc << bits) | v
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        return self

    def bitpos(self) -> int:
        return len(self.buf) * 8 + self.n

    def bytes_padded(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append((self.acc << (8 - self.n)) & 0xFF)
        return bytes(out)


def _pick_table(maxv: int) -> int:
    for tid in (1, 3, 5, 7, 10):
        tab = HUFFMAN_BIG[tid]
        if maxv <= max(x for x, _y in tab):
            return tid
    raise ValueError(f"|value| {maxv} exceeds the shipped table family (<= 7)")


def build_mp3_frame_l3(
    granules,
    sample_rate: int = 44100,
    bitrate_kbps: int = 320,
    global_gain: int = 210,
    ms_stereo: bool = False,
) -> bytes:
    """Assemble one real MPEG-1 Layer III frame from per-granule
    quantized spectra (the spec-literal fixture builder, the same role
    the FLAC/JPEG/MP4 builders play): ``granules`` is two entries, each
    either a flat int list (mono) or a [left, right] pair (stereo; set
    ``ms_stereo`` to mark the pair as mid/side). Values |v| <= 7; the
    leading even-length run covering everything with |v| > 1 is coded
    as big_values with one auto-selected shipped table, the remainder
    as count1 quadruples (|v| <= 1 there). Long blocks, scalefactors
    all zero (scalefac_compress 0), no reservoir (main_data_begin 0).
    The expected requantized spectrum is closed-form:
    xr[i] = sign(v) * |v|^(4/3) * 2^((global_gain - 210) / 4)."""
    if len(granules) != 2:
        raise ValueError("MPEG-1 needs exactly 2 granules")
    stereo = bool(granules[0]) and isinstance(granules[0][0], (list, tuple))
    chans = 2 if stereo else 1
    flat = []
    for gr in granules:
        flat.extend(gr if stereo else [gr])
    gr_bits = []
    gr_meta = []
    for ix in flat:
        ix = list(ix) + [0] * (576 - len(ix))
        if len(ix) > 576:
            raise ValueError("at most 576 spectral values")
        # split: big-values prefix covers everything with |v| > 1 (and
        # must be even); count1 handles the <=1 tail up to the last
        # nonzero; everything past it is rzero
        last_big = max((i for i, v in enumerate(ix) if abs(v) > 1), default=-1)
        big_end = last_big + 1
        big_end += big_end % 2
        last_nz = max((i for i, v in enumerate(ix) if v), default=-1)
        c1_end = last_nz + 1
        if (c1_end - big_end) % 4:
            c1_end += 4 - (c1_end - big_end) % 4
        if c1_end > 576:
            raise ValueError("count1 region overruns 576")
        maxv = max((abs(v) for v in ix), default=0)
        tid = _pick_table(max(maxv, 1)) if big_end else 1
        w = _BitWriter()
        tab = HUFFMAN_BIG[tid]
        for i in range(0, big_end, 2):
            x, y = ix[i], ix[i + 1]
            code, ln = tab[(abs(x), abs(y))]
            w.w(code, ln)
            if x:
                w.w(1 if x < 0 else 0, 1)
            if y:
                w.w(1 if y < 0 else 0, 1)
        for i in range(big_end, c1_end, 4):
            quad = ix[i : i + 4]
            if any(abs(v) > 1 for v in quad):
                raise ValueError("count1 region values must be in [-1, 1]")
            v = 0
            for q in quad:
                v = (v << 1) | (1 if q else 0)
            code, ln = HUFFMAN_COUNT1A[v]
            w.w(code, ln)
            for q in quad:
                if q:
                    w.w(1 if q < 0 else 0, 1)
        gr_bits.append(w)
        gr_meta.append((big_end // 2, tid))
    side = _BitWriter()
    # main_data_begin, private, scfsi (per channel)
    side.w(0, 9).w(0, 5 if chans == 1 else 3).w(0, 4 * chans)
    for w, (bv, tid) in zip(gr_bits, gr_meta):
        side.w(w.bitpos(), 12).w(bv, 9).w(global_gain, 8).w(0, 4)
        side.w(0, 1)  # no window switching (long block)
        side.w(tid, 5).w(tid, 5).w(tid, 5)
        side.w(15, 4).w(7, 3)  # region0/region1 counts (same table anyway)
        side.w(0, 1).w(0, 1).w(0, 1)  # preflag, scalefac_scale, count1 A
    main = _BitWriter()
    for w in gr_bits:
        nbits, data = w.bitpos(), w.bytes_padded()
        for i in range(nbits):
            main.w((data[i >> 3] >> (7 - (i & 7))) & 1, 1)
    payload = side.bytes_padded() + main.bytes_padded()
    br_idx = _BITRATE_V1_L3.index(bitrate_kbps)
    sr_idx = _SR_V1.index(sample_rate)
    fb = (1152 // 8 * bitrate_kbps * 1000) // sample_rate
    if 4 + len(payload) > fb:
        raise ValueError("spectra too dense for the chosen bitrate")
    if chans == 2:
        mode_bits = (1 << 6) | (1 << 5) if ms_stereo else 0  # joint-MS | stereo
    else:
        mode_bits = 3 << 6
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (br_idx << 4) | (sr_idx << 2), mode_bits])
    body = hdr + payload + bytes(fb - 4 - len(payload))
    return body


def decode_mp3_spectra(payload: bytes):
    """Decode an MP3 payload through the SPEC-EXACT stages only (side
    info, scalefactors, Huffman, requantization) and return the
    requantized spectra: a list of (frame_idx, granule_idx, channel_idx,
    xr ndarray[576]) — no stereo processing (MS/intensity NOT applied,
    so joint-stereo frames of every mode yield their raw per-channel
    spectra), no filterbank: every value is the closed-form
    sign(v)*|v|^(4/3)*2^(...) the oracle queries pin analytically.
    ValueError-only tear contract; the Huffman-table boundary is the
    same as :func:`decode_mp3`'s."""
    try:
        return _decode_spectra_inner(payload)
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt MP3: {type(exc).__name__}: {exc}") from exc


def _decode_spectra_inner(payload: bytes):
    info = _probe_inner(payload)
    sr, ch = info["sample_rate"], info["channels"]
    if sr not in SFB_LONG:
        raise ValueError(
            f"MPEG-2.5 rate {sr} Hz: scalefactor band tables not shipped "
            "(declared boundary)"
        )
    lsf = info["version"] != "MPEG1"
    ngr = 1 if lsf else 2
    reservoir = b""
    out = []
    for fi, (off, fb) in enumerate(info["frames"]):
        b1 = payload[off + 1]
        protected = (b1 & 1) == 0
        # joint-stereo modes (MS/intensity) do NOT gate here: the
        # returned spectra are PRE-stereo by contract, so every frame
        # the frame layer accepts yields its raw per-channel xr
        side_off = off + 4 + (2 if protected else 0)
        mdb, grans, side_bytes, scfsi = _parse_side_info(
            payload[side_off : side_off + 32], lsf, ch
        )
        main = payload[side_off + side_bytes : off + fb]
        if mdb > len(reservoir):
            raise ValueError("main_data_begin reaches before the reservoir")
        bits = _Bits(reservoir + main, (len(reservoir) - mdb) * 8)
        prev_sf = [None] * ch
        for gi in range(ngr):
            for c in range(ch):
                g = grans[gi][c]
                end_bit = bits.p + g.part2_3_length
                if lsf:
                    sf_l, sf_s = _read_scalefactors_lsf(bits, g)
                else:
                    sf_l, sf_s = _read_scalefactors_v1(
                        bits, g, scfsi[c] if gi == 1 else None, prev_sf[c]
                    )
                prev_sf[c] = (sf_l, sf_s)
                ix, _nz = _huffman_spectrum(bits, g, sr, end_bit)
                xr = _requantize(ix, g, sr, sf_l, sf_s)
                out.append((fi, gi, c, _reorder_short(xr, g, sr)))
        reservoir = (reservoir + main)[-511:]
    return out


def build_mp3_frame_lsf(
    ix,
    sample_rate: int = 22050,
    bitrate_kbps: int = 64,
    global_gain: int = 210,
    scalefac_compress: int = 0,
) -> bytes:
    """LSF (MPEG-2) mono fixture frame: ONE granule of up to 576
    quantized values, same big-values/count1 auto-split and closed-form
    contract as :func:`build_mp3_frame_l3`, plus an arbitrary 9-bit
    ``scalefac_compress`` so the LSF slen/partition decode path gets
    non-silent coverage (the scalefactor VALUES written are all zero
    bits, so the expected spectrum stays sign(v)*|v|^(4/3)*2^((gg-210)/4)
    when scalefac_compress < 500; the >= 500 branch implies preflag and
    scales the pretab bands down — choose < 500 for closed-form tests)."""
    ix = list(ix) + [0] * (576 - len(ix))
    last_big = max((i for i, v in enumerate(ix) if abs(v) > 1), default=-1)
    big_end = last_big + 1
    big_end += big_end % 2
    last_nz = max((i for i, v in enumerate(ix) if v), default=-1)
    c1_end = last_nz + 1
    if (c1_end - big_end) % 4:
        c1_end += 4 - (c1_end - big_end) % 4
    maxv = max((abs(v) for v in ix), default=0)
    tid = _pick_table(max(maxv, 1)) if big_end else 1
    # scalefactor bits for the chosen compress value (long block, kind 0)
    sfc = scalefac_compress
    if sfc < 400:
        slens = [(sfc >> 4) // 5, (sfc >> 4) % 5, (sfc % 16) >> 2, sfc % 4]
        nr = (6, 5, 5, 5)
    elif sfc < 500:
        s = sfc - 400
        slens = [(s >> 2) // 5, (s >> 2) % 5, s % 4, 0]
        nr = (6, 5, 7, 3)
    else:
        s = sfc - 500
        slens = [s // 3, s % 3, 0, 0]
        nr = (11, 10, 0, 0)
    w = _BitWriter()
    for cnt, sl in zip(nr, slens):
        for _ in range(cnt):
            if sl:
                w.w(0, sl)  # all-zero scalefactors keep xr closed-form
    tab = HUFFMAN_BIG[tid]
    for i in range(0, big_end, 2):
        x, y = ix[i], ix[i + 1]
        code, ln = tab[(abs(x), abs(y))]
        w.w(code, ln)
        if x:
            w.w(1 if x < 0 else 0, 1)
        if y:
            w.w(1 if y < 0 else 0, 1)
    for i in range(big_end, c1_end, 4):
        quad = ix[i : i + 4]
        if any(abs(v) > 1 for v in quad):
            raise ValueError("count1 region values must be in [-1, 1]")
        v = 0
        for q in quad:
            v = (v << 1) | (1 if q else 0)
        code, ln = HUFFMAN_COUNT1A[v]
        w.w(code, ln)
        for q in quad:
            if q:
                w.w(1 if q < 0 else 0, 1)
    side = _BitWriter()
    side.w(0, 8).w(0, 1)  # main_data_begin, private
    side.w(w.bitpos(), 12).w(big_end // 2, 9).w(global_gain, 8)
    side.w(sfc, 9)
    side.w(0, 1)  # long block
    side.w(tid, 5).w(tid, 5).w(tid, 5)
    side.w(15, 4).w(7, 3)
    side.w(0, 1).w(0, 1)  # scalefac_scale, count1 table A
    main = _BitWriter()
    nbits, data = w.bitpos(), w.bytes_padded()
    for i in range(nbits):
        main.w((data[i >> 3] >> (7 - (i & 7))) & 1, 1)
    payload = side.bytes_padded() + main.bytes_padded()
    br_idx = _BITRATE_V2_L3.index(bitrate_kbps)
    sr_idx = _SR_V2.index(sample_rate)
    fb = (576 // 8 * bitrate_kbps * 1000) // sample_rate
    if 4 + len(payload) > fb:
        raise ValueError("spectra too dense for the chosen bitrate")
    hdr = bytes([0xFF, 0xE0 | (2 << 3) | (1 << 1) | 1,
                 (br_idx << 4) | (sr_idx << 2), 3 << 6])
    return hdr + payload + bytes(fb - 4 - len(payload))


def build_mp3_frame_short(
    granule_windows,
    sample_rate: int = 44100,
    bitrate_kbps: int = 320,
    global_gain: int = 210,
    subblock_gain=(0, 0, 0),
) -> bytes:
    """MPEG-1 mono fixture frame whose FIRST granule is a pure SHORT
    block (window_switching, block_type 2, not mixed) and second granule
    silent long. ``granule_windows`` is [w0, w1, w2] — per-window lists
    of up to 6 quantized values (|v| <= 1, coded as count1 quadruples)
    that land on spectral lines 0-5 of each window. The builder writes
    them in the spec's decoded order (sfb, window, line): with the
    44.1 kHz short band table, lines 0-3 are sfb 0 and 4-5 sfb 1, so
    the interleaved source order is w0[0:4], w1[0:4], w2[0:4],
    w0[4:6], w1[4:6], w2[4:6]. After requantize+reorder the decoder
    must place window w line l at position (l//6)*18 + w*6 + (l%6) —
    which is what tests pin closed-form, proving the short-block
    scalefactor read (slen1 bits x 3 windows), the reorder map, and the
    subblock-gain exponent 2^(-2*sbg) together."""
    ws = [list(w) + [0] * (6 - len(w)) for w in granule_windows]
    if len(ws) != 3 or any(len(w) > 6 for w in ws):
        raise ValueError("need 3 windows of <= 6 values")
    if any(abs(v) > 1 for w in ws for v in w):
        raise ValueError("short-block fixture uses count1 coding: |v| <= 1")
    # decoded (huffman) order for short blocks: sfb-major, window, line
    band_s = SFB_SHORT[sample_rate]
    seq = []
    for sfb in range(13):
        lo, hi = band_s[sfb], band_s[sfb + 1]
        for w in range(3):
            for line in range(lo, hi):
                seq.append(ws[w][line] if line < 6 else 0)
    last_nz = max((i for i, v in enumerate(seq) if v), default=-1)
    c1_end = last_nz + 1
    if c1_end % 4:
        c1_end += 4 - c1_end % 4
    wtr = _BitWriter()
    for i in range(0, c1_end, 4):
        quad = seq[i : i + 4]
        v = 0
        for q in quad:
            v = (v << 1) | (1 if q else 0)
        code, ln = HUFFMAN_COUNT1A[v]
        wtr.w(code, ln)
        for q in quad:
            if q:
                wtr.w(1 if q < 0 else 0, 1)
    side = _BitWriter()
    side.w(0, 9).w(0, 5).w(0, 4)
    # granule 0: short block
    side.w(wtr.bitpos(), 12).w(0, 9).w(global_gain, 8).w(0, 4)
    side.w(1, 1)  # window_switching
    side.w(2, 2)  # block_type 2
    side.w(0, 1)  # not mixed
    side.w(1, 5).w(1, 5)  # table_select (unused, big_values 0)
    for sbg in subblock_gain:
        side.w(sbg, 3)
    side.w(0, 1).w(0, 1).w(0, 1)  # preflag, scalefac_scale, count1 A
    # granule 1: silent long
    side.w(0, 12).w(0, 9).w(global_gain, 8).w(0, 4)
    side.w(0, 1)
    side.w(1, 5).w(1, 5).w(1, 5)
    side.w(15, 4).w(7, 3)
    side.w(0, 1).w(0, 1).w(0, 1)
    main = _BitWriter()
    nbits, data = wtr.bitpos(), wtr.bytes_padded()
    for i in range(nbits):
        main.w((data[i >> 3] >> (7 - (i & 7))) & 1, 1)
    payload = side.bytes_padded() + main.bytes_padded()
    br_idx = _BITRATE_V1_L3.index(bitrate_kbps)
    sr_idx = _SR_V1.index(sample_rate)
    fb = (1152 // 8 * bitrate_kbps * 1000) // sample_rate
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (br_idx << 4) | (sr_idx << 2), 3 << 6])
    return hdr + payload + bytes(fb - 4 - len(payload))


def build_mp3_frame_l3_scaled(
    granule_ix,
    granule_sf,
    scalefac_compress: int,
    scfsi=(0, 0, 0, 0),
    preflag: int = 0,
    scalefac_scale: int = 0,
    global_gain: int = 210,
    sample_rate: int = 44100,
    bitrate_kbps: int = 320,
) -> bytes:
    """MPEG-1 mono fixture frame with REAL nonzero scalefactors — the
    piece :func:`build_mp3_frame_l3` keeps at zero. ``granule_ix`` and
    ``granule_sf`` are 2-lists: per granule the quantized values (long
    block) and the 21 scalefactors. ``scfsi`` marks the four bands
    groups (0-5, 6-10, 11-15, 16-20) whose granule-1 scalefactors are
    REUSED from granule 0 (not transmitted) — the reuse path the plain
    builder never exercises. Values must fit the slens of
    ``scalefac_compress``; expected spectrum is closed-form:
    xr[i] = sign(v)*|v|^(4/3) * 2^((gg-210)/4)
            * 2^(-(scalefac_scale+1)/2 * (sf[sfb] + preflag*pretab[sfb]))."""
    slen1, slen2 = _SLEN[scalefac_compress]
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
    gr_bits = []
    gr_meta = []
    for gi, (ix, sf) in enumerate(zip(granule_ix, granule_sf)):
        ix = list(ix) + [0] * (576 - len(ix))
        sf = list(sf) + [0] * (21 - len(sf))
        w = _BitWriter()
        for gidx, (lo, hi, sl) in enumerate(groups):
            if gi == 1 and scfsi[gidx]:
                continue  # reused from granule 0 — nothing transmitted
            for sfb in range(lo, hi):
                if sf[sfb] >= (1 << sl) and sl == 0 and sf[sfb] != 0:
                    raise ValueError(f"scalefactor {sf[sfb]} needs slen > 0")
                w.w(sf[sfb], sl)
        last_big = max((i for i, v in enumerate(ix) if abs(v) > 1), default=-1)
        big_end = last_big + 1
        big_end += big_end % 2
        last_nz = max((i for i, v in enumerate(ix) if v), default=-1)
        c1_end = last_nz + 1
        if (c1_end - big_end) % 4:
            c1_end += 4 - (c1_end - big_end) % 4
        maxv = max((abs(v) for v in ix), default=0)
        tid = _pick_table(max(maxv, 1)) if big_end else 1
        tab = HUFFMAN_BIG[tid]
        for i in range(0, big_end, 2):
            x, y = ix[i], ix[i + 1]
            code, ln = tab[(abs(x), abs(y))]
            w.w(code, ln)
            if x:
                w.w(1 if x < 0 else 0, 1)
            if y:
                w.w(1 if y < 0 else 0, 1)
        for i in range(big_end, c1_end, 4):
            quad = ix[i : i + 4]
            v = 0
            for q in quad:
                v = (v << 1) | (1 if q else 0)
            code, ln = HUFFMAN_COUNT1A[v]
            w.w(code, ln)
            for q in quad:
                if q:
                    w.w(1 if q < 0 else 0, 1)
        gr_bits.append(w)
        gr_meta.append((big_end // 2, tid))
    side = _BitWriter()
    side.w(0, 9).w(0, 5)
    for s in scfsi:
        side.w(1 if s else 0, 1)
    for w, (bv, tid) in zip(gr_bits, gr_meta):
        side.w(w.bitpos(), 12).w(bv, 9).w(global_gain, 8)
        side.w(scalefac_compress, 4)
        side.w(0, 1)
        side.w(tid, 5).w(tid, 5).w(tid, 5)
        side.w(15, 4).w(7, 3)
        side.w(preflag, 1).w(scalefac_scale, 1).w(0, 1)
    main = _BitWriter()
    for w in gr_bits:
        nbits, data = w.bitpos(), w.bytes_padded()
        for i in range(nbits):
            main.w((data[i >> 3] >> (7 - (i & 7))) & 1, 1)
    payload = side.bytes_padded() + main.bytes_padded()
    br_idx = _BITRATE_V1_L3.index(bitrate_kbps)
    sr_idx = _SR_V1.index(sample_rate)
    fb = (1152 // 8 * bitrate_kbps * 1000) // sample_rate
    if 4 + len(payload) > fb:
        raise ValueError("spectra too dense for the chosen bitrate")
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (br_idx << 4) | (sr_idx << 2), 3 << 6])
    return hdr + payload + bytes(fb - 4 - len(payload))


def build_mp3_frame_intensity(
    left_ix,
    right_ix,
    right_sf,
    ms_stereo: bool = False,
    scalefac_compress: int = 13,
    global_gain: int = 210,
) -> bytes:
    """Stereo MPEG-1 fixture frame in JOINT mode with the INTENSITY bit
    set (optionally MS too): granule 0 carries ``left_ix``/``right_ix``
    (long blocks) and the RIGHT channel's 21 scalefactors — which in the
    bands above right's zero part are the is_pos intensity positions
    the decoder must apply; granule 1 is silent. Left scalefactors stay
    zero so expected values are closed-form."""
    slen1, slen2 = _SLEN[scalefac_compress]
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]

    def one_channel(ix, sf):
        ix = list(ix) + [0] * (576 - len(ix))
        sf = list(sf) + [0] * (21 - len(sf))
        w = _BitWriter()
        for lo, hi, sl in groups:
            for sfb in range(lo, hi):
                w.w(sf[sfb], sl)
        last_big = max((i for i, v in enumerate(ix) if abs(v) > 1), default=-1)
        big_end = last_big + 1 + (last_big + 1) % 2
        last_nz = max((i for i, v in enumerate(ix) if v), default=-1)
        c1_end = last_nz + 1
        if (c1_end - big_end) % 4:
            c1_end += 4 - (c1_end - big_end) % 4
        maxv = max((abs(v) for v in ix), default=0)
        tid = _pick_table(max(maxv, 1)) if big_end else 1
        tab = HUFFMAN_BIG[tid]
        for i in range(0, big_end, 2):
            x, y = ix[i], ix[i + 1]
            code, ln = tab[(abs(x), abs(y))]
            w.w(code, ln)
            if x:
                w.w(1 if x < 0 else 0, 1)
            if y:
                w.w(1 if y < 0 else 0, 1)
        for i in range(big_end, c1_end, 4):
            quad = ix[i : i + 4]
            v = 0
            for q in quad:
                v = (v << 1) | (1 if q else 0)
            code, ln = HUFFMAN_COUNT1A[v]
            w.w(code, ln)
            for q in quad:
                if q:
                    w.w(1 if q < 0 else 0, 1)
        return w, big_end // 2, tid

    chans = [
        one_channel(left_ix, [0] * 21),
        one_channel(right_ix, right_sf),
        one_channel([0] * 576, [0] * 21),
        one_channel([0] * 576, [0] * 21),
    ]
    side = _BitWriter()
    side.w(0, 9).w(0, 3).w(0, 8)  # mdb, private(stereo:3), scfsi 2x4
    for w, bv, tid in chans:
        side.w(w.bitpos(), 12).w(bv, 9).w(global_gain, 8)
        side.w(scalefac_compress, 4)
        side.w(0, 1)
        side.w(tid, 5).w(tid, 5).w(tid, 5)
        side.w(15, 4).w(7, 3)
        side.w(0, 1).w(0, 1).w(0, 1)
    main = _BitWriter()
    for w, _bv, _tid in chans:
        nbits, data = w.bitpos(), w.bytes_padded()
        for i in range(nbits):
            main.w((data[i >> 3] >> (7 - (i & 7))) & 1, 1)
    payload = side.bytes_padded() + main.bytes_padded()
    fb = (1152 // 8 * 320 * 1000) // 44100
    if 4 + len(payload) > fb:
        raise ValueError("spectra too dense for the fixture bitrate")
    mode_ext = (3 if ms_stereo else 1) << 4
    hdr = bytes([0xFF, 0xE0 | (3 << 3) | (1 << 1) | 1,
                 (_BITRATE_V1_L3.index(320) << 4) | (0 << 2),
                 (1 << 6) | mode_ext])
    return hdr + payload + bytes(fb - 4 - len(payload))
