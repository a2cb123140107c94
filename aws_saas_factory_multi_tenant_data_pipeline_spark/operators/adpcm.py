"""ADPCM WAV codecs — IMA/DVI (format 0x11) and Microsoft (0x02),
closing the r10 "ADPCM variants" declared boundary for the two
formats real-world voice/telephony WAVs actually use.

Public specifications: the IMA "Recommended Practices for Enhancing
Digital Audio Compatibility" (the 89-entry step table + index
adjustments; also normative in the MultimediaWave spec for format
0x11 block layout) and Microsoft's WAVE ADPCM spec (format 0x02:
7 built-in predictor coefficient pairs + the 16-entry adaptation
table, per-block headers).

Ground truth: the IMA nibble core is cross-pinned against CPython's
own C implementation (``audioop.adpcm2lin`` / ``lin2adpcm`` — the
Intel/DVI variant with the same tables) in tests/test_adpcm.py; block
layouts are pinned by exact roundtrips + torn-block contracts. No
real third-party ADPCM WAV ships on this host (visible skip).
"""

from __future__ import annotations

import struct

import numpy as np

#: IMA step table (89 entries)
IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
    13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)

#: IMA index adjustment for the 3 magnitude bits
IMA_INDEX_ADJUST = (-1, -1, -1, -1, 2, 4, 6, 8)

#: MS-ADPCM built-in coefficient pairs
MS_COEFFS = ((256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232))

#: MS-ADPCM delta adaptation table (indexed by the 4-bit code)
MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
            768, 614, 512, 409, 307, 230, 230, 230)


def _validate_tables() -> None:
    assert len(IMA_STEPS) == 89 and IMA_STEPS[0] == 7 and IMA_STEPS[88] == 32767
    assert all(IMA_STEPS[i] < IMA_STEPS[i + 1] for i in range(88))
    assert len(MS_COEFFS) == 7 and MS_COEFFS[0] == (256, 0)
    assert len(MS_ADAPT) == 16 and MS_ADAPT[8] == 768


_validate_tables()


def _trunc256(v: int) -> int:
    """C integer division by 256 (truncation toward zero) — the
    Microsoft spec / ffmpeg predictor rule; a floor shift differs by 1
    for negative sums and the error propagates through s1/s2 state."""
    return -((-v) >> 8) if v < 0 else v >> 8


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def ima_step(predictor: int, index: int, nibble: int):
    """One IMA ADPCM decode step → (new predictor, new index). The
    exact core audioop.adpcm2lin implements in C (cross-pinned)."""
    step = IMA_STEPS[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    predictor = _clamp16(predictor - diff if nibble & 8 else predictor + diff)
    index = index + IMA_INDEX_ADJUST[nibble & 7]
    return predictor, (0 if index < 0 else (88 if index > 88 else index))


def ima_encode_step(sample: int, predictor: int, index: int):
    """Greedy IMA encode step → (nibble, new predictor, new index)."""
    step = IMA_STEPS[index]
    diff = sample - predictor
    nibble = 8 if diff < 0 else 0
    if diff < 0:
        diff = -diff
    if diff >= step:
        nibble |= 4
        diff -= step
    if diff >= step >> 1:
        nibble |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        nibble |= 1
    predictor, index = ima_step(predictor, index, nibble)
    return nibble, predictor, index


def decode_ima_wav_blocks(data: bytes, channels: int, block_align: int):
    """Decode WAV format-0x11 blocks to interleaved int16 samples.
    Block layout per channel: 4-byte header (int16 predictor, uint8
    step index, uint8 reserved), then 4-byte per-channel groups of 8
    nibbles (low nibble first)."""
    if channels < 1 or block_align < 4 * channels:
        raise ValueError("bad IMA ADPCM block parameters")
    out = []
    n = len(data)
    off = 0
    while off + 4 * channels <= n:
        block = data[off : off + block_align]
        if len(block) < 4 * channels:
            break
        preds = []
        idxs = []
        for c in range(channels):
            p, i, _r = struct.unpack_from("<hBB", block, 4 * c)
            if i > 88:
                raise ValueError(f"IMA step index {i} out of range")
            preds.append(p)
            idxs.append(i)
        chans = [[p] for p in preds]
        pos = 4 * channels
        while pos + 4 * channels <= len(block):
            for c in range(channels):
                grp = block[pos + 4 * c : pos + 4 * c + 4]
                for byte in grp:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[c], idxs[c] = ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
            pos += 4 * channels
        ns = min(len(ch) for ch in chans)
        inter = np.empty(ns * channels, dtype=np.int16)
        for c in range(channels):
            inter[c::channels] = np.array(chans[c][:ns], dtype=np.int16)
        out.append(inter)
        off += block_align
    if not out:
        raise ValueError("torn IMA ADPCM data: no whole block")
    return np.concatenate(out)


def encode_ima_wav_blocks(samples: np.ndarray, channels: int,
                          samples_per_block: int = 505) -> tuple[bytes, int]:
    """Encode interleaved int16 → WAV format-0x11 blocks. Returns
    (data, block_align). samples_per_block must be 8k+1."""
    if (samples_per_block - 1) % 8:
        raise ValueError("IMA samples_per_block must be 8k+1")
    x = np.asarray(samples, dtype=np.int16)
    frames = len(x) // channels
    x = x[: frames * channels].reshape(frames, channels)
    block_align = 4 * channels + ((samples_per_block - 1) // 2) * channels
    out = bytearray()
    idxs = [0] * channels
    f = 0
    while f < frames:
        take = min(samples_per_block, frames - f)
        preds = [int(x[f, c]) for c in range(channels)]
        for c in range(channels):
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        nibs: list[list[int]] = [[] for _ in range(channels)]
        for k in range(1, samples_per_block):
            src = f + k if f + k < frames else frames - 1
            for c in range(channels):
                nib, preds[c], idxs[c] = ima_encode_step(
                    int(x[src, c]), preds[c], idxs[c]
                )
                nibs[c].append(nib)
        # pack per channel in 8-nibble (4-byte) interleaved groups
        for g in range(0, samples_per_block - 1, 8):
            for c in range(channels):
                for j in range(0, 8, 2):
                    lo = nibs[c][g + j]
                    hi = nibs[c][g + j + 1]
                    out.append(lo | (hi << 4))
        f += take
    return bytes(out), block_align


def decode_ms_adpcm_blocks(data: bytes, channels: int, block_align: int):
    """Decode WAV format-0x02 blocks to interleaved int16 samples."""
    hdr = 7 * channels
    if channels < 1 or block_align < hdr:
        raise ValueError("bad MS-ADPCM block parameters")
    out = []
    off = 0
    n = len(data)
    while off + hdr <= n:
        block = data[off : off + block_align]
        if len(block) < hdr:
            break
        pred_idx = list(block[:channels])
        if any(p >= len(MS_COEFFS) for p in pred_idx):
            raise ValueError("MS-ADPCM predictor index out of range")
        deltas = list(struct.unpack_from(f"<{channels}h", block, channels))
        s1 = list(struct.unpack_from(f"<{channels}h", block, 3 * channels))
        s2 = list(struct.unpack_from(f"<{channels}h", block, 5 * channels))
        chans = [[s2[c], s1[c]] for c in range(channels)]
        c = 0
        for byte in block[hdr:]:
            for nib in (byte >> 4, byte & 0xF):
                signed = nib - 16 if nib >= 8 else nib
                co1, co2 = MS_COEFFS[pred_idx[c]]
                pred = _trunc256(s1[c] * co1 + s2[c] * co2) + signed * deltas[c]
                pred = _clamp16(pred)
                s2[c], s1[c] = s1[c], pred
                deltas[c] = max(16, (MS_ADAPT[nib] * deltas[c]) >> 8)
                chans[c].append(pred)
                c = (c + 1) % channels
        ns = min(len(ch) for ch in chans)
        inter = np.empty(ns * channels, dtype=np.int16)
        for ci in range(channels):
            inter[ci::channels] = np.array(chans[ci][:ns], dtype=np.int16)
        out.append(inter)
        off += block_align
    if not out:
        raise ValueError("torn MS-ADPCM data: no whole block")
    return np.concatenate(out)


def encode_ms_adpcm_blocks(samples: np.ndarray, channels: int,
                           samples_per_block: int = 500) -> tuple[bytes, int]:
    """Greedy MS-ADPCM encoder (predictor pair 0, adaptive delta) —
    the fixture writer; returns (data, block_align)."""
    x = np.asarray(samples, dtype=np.int16)
    frames = len(x) // channels
    x = x[: frames * channels].reshape(frames, channels)
    if samples_per_block < 2:
        raise ValueError("MS-ADPCM needs >= 2 samples per block")
    block_align = 7 * channels + ((samples_per_block - 2) * channels + 1) // 2
    out = bytearray()
    f = 0
    while f < frames:
        s2 = [int(x[f, c]) for c in range(channels)]
        s1 = [
            int(x[f + 1, c]) if f + 1 < frames else s2[c]
            for c in range(channels)
        ]
        deltas = [512] * channels
        out += bytes([0] * channels)  # predictor pair 0 per channel
        out += struct.pack(f"<{channels}h", *deltas)
        out += struct.pack(f"<{channels}h", *s1)
        out += struct.pack(f"<{channels}h", *s2)
        nibs = []
        st_s1, st_s2, st_d = list(s1), list(s2), list(deltas)
        for k in range(2, samples_per_block):
            src = f + k if f + k < frames else frames - 1
            for c in range(channels):
                co1, co2 = MS_COEFFS[0]
                base = _trunc256(st_s1[c] * co1 + st_s2[c] * co2)
                want = int(x[src, c]) - base
                d = st_d[c]
                nib_s = max(-8, min(7, (want + (d // 2 if want >= 0 else -(d // 2))) // d))
                nib = nib_s & 0xF
                pred = _clamp16(base + nib_s * d)
                st_s2[c], st_s1[c] = st_s1[c], pred
                st_d[c] = max(16, (MS_ADAPT[nib] * d) >> 8)
                nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)
        for j in range(0, len(nibs), 2):
            out.append((nibs[j] << 4) | nibs[j + 1])
        pad = block_align - (7 * channels + len(nibs) // 2)
        out += b"\x00" * pad
        f += samples_per_block
    return bytes(out), block_align
