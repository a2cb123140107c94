"""From-spec VP8 (lossy) KEY-FRAME decoder + spec-literal fixture encoder.

The last real-crawl image gap (r10 verdict "Next round" #2): most
real-world .webp traffic is lossy VP8, and the only real third-party
WebP on this host — CPython's test python.webp — is lossy, so it
quarantined under the r10 VP8L-only decoder. This module decodes VP8
key frames from the PUBLIC specification:

- RFC 6386 (VP8 Data Format and Decoding Guide): boolean arithmetic
  decoder (§7), frame/macroblock headers (§9, §10), key-frame intra
  mode coding (§11), intra prediction (§12), token/residual decoding
  with the default coefficient probabilities (§13), dequantization
  and the exact integer IDCT/IWHT (§14), and the in-loop deblocking
  filter, simple and normal (§15).
- WebP Container Specification (RIFF 'WEBP', VP8/VP8L/VP8X/ALPH
  chunks) — the container walk lives in operators/webp.py; this
  module also decodes the ALPH lossless alpha plane (a headerless
  VP8L spatial stream + PNG-like inverse row filters).

Reference parity: the media ingestion surface of the reference repo
(README.md:1-109) — decoded rows flow through the same aHash/pHash
dedup and feature machinery as PNG/JPEG/GIF/QOI/TIFF/TGA/WebP-VP8L
via the codec registry (operators/multimodal.py).

Declared boundaries (named per-payload errors, never wrong pixels):

- Inter (non-key) frames: P-frame prediction needs a reference frame
  a still-image container never carries; raises ValueError.
- Upscaling hints (horizontal_scale / vertical_scale != 0) are
  display metadata; pixels are returned at coded scale.

Verification ladder (tests/test_vp8.py + tests/test_realworld_r11.py):
1. REAL third-party interop, BIT-EXACT — CPython's python.webp
   (written by a real libwebp encoder) decodes to Y/U/V planes,
   alpha plane, and final RGBA that are PIXEL-IDENTICAL to the
   system libwebp's own WebPDecodeYUV/WebPDecodeRGBA output
   (ctypes oracle, skipped on hosts without libwebp), and matches
   the independent PNG decode of the SAME logo (python.png,
   imghdrdata) within the lossy-encode tolerance — the r10 TIFF
   convention, upgraded from pixel-tolerance to bit-exact.
2. Bit-exact roundtrip — the fixture encoder records its own
   reconstruction (dequant + IDCT + predict, the decoder's math);
   decode(encode(x)) must equal it EXACTLY, exercising the bool
   coder, token trees, contexts, Y2/WHT and intra paths both ways.
3. 300-case tear fuzz — truncated payloads raise, never return
   wrong pixels.

The probability tables below are the normative constants of RFC 6386
§11.5, §13.4 and §13.5 (import-time structural validators pin shapes
and value ranges). The transcription was verified byte-for-byte
against the same normative tables embedded in the system libwebp's
constant data — note libwebp's 4x4-mode ENUM order differs from the
RFC's (RD/VR/LD permuted), so its stored kf_bmode rows/cols are
permuted relative to the RFC layout used here; the bit-exact
real-file decode pins the layout end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# mode enums (RFC 6386 §8.2, §11.2)

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

(
    B_DC_PRED,
    B_TM_PRED,
    B_VE_PRED,
    B_HE_PRED,
    B_LD_PRED,
    B_RD_PRED,
    B_VR_PRED,
    B_VL_PRED,
    B_HD_PRED,
    B_HU_PRED,
) = range(10)

# key-frame Y mode tree + probs (RFC 6386 §11.2: kf_ymode_tree)
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)

# chroma mode tree + key-frame probs (§11.2)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)

# subblock mode tree (§11.2: bmode_tree)
BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)

# ---------------------------------------------------------------------------
# token coding (RFC 6386 §13.2)

DCT_0, DCT_1, DCT_2, DCT_3, DCT_4 = 0, 1, 2, 3, 4
DCT_CAT1, DCT_CAT2, DCT_CAT3, DCT_CAT4, DCT_CAT5, DCT_CAT6 = 5, 6, 7, 8, 9, 10
DCT_EOB = 11

COEFF_TREE = (
    -DCT_EOB, 2,
    -DCT_0, 4,
    -DCT_1, 6,
    8, 12,
    -DCT_2, 10,
    -DCT_3, -DCT_4,
    14, 16,
    -DCT_CAT1, -DCT_CAT2,
    18, 20,
    -DCT_CAT3, -DCT_CAT4,
    -DCT_CAT5, -DCT_CAT6,
)

# extra-bit probabilities per category (§13.2: Pcat1..Pcat6)
PCAT = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
CAT_BASE = (5, 7, 11, 19, 35, 67)

# coefficient position → band (§13.3: coeff_bands)
COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# zigzag scan (§13.3)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# ---------------------------------------------------------------------------
# dequantization lookups (RFC 6386 §14.1) — indexed by clamped q index

DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15,
    16, 17, 17, 18, 19, 20, 20, 21, 21, 22, 22, 23, 23,
    24, 25, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 46,
    47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59,
    60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72,
    73, 74, 75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84,
    85, 86, 87, 88, 89, 91, 93, 95, 96, 98, 100, 101, 102,
    104, 106, 108, 110, 112, 114, 116, 118, 122, 124, 126, 128, 130,
    132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
)

AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55,
    56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78,
    80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104,
    106, 108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137,
    140, 143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177,
    181, 185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229,
    234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)

# ---------------------------------------------------------------------------
# default coefficient probabilities (RFC 6386 §13.5:
# default_coeff_probs[4][8][3][11] — plane: 0 = Y-after-Y2, 1 = Y2,
# 2 = chroma, 3 = Y-with-DC)

DEFAULT_COEFF_PROBS = (
    (  # plane 0: Y beginning at coefficient 1 (macroblock has Y2)
        (
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128),
            (189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128),
            (106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128),
        ),
        (
            (1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128),
            (181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128),
            (78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128),
        ),
        (
            (1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128),
            (184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128),
            (77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128),
        ),
        (
            (1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128),
            (170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128),
            (37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128),
        ),
        (
            (1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128),
            (207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128),
            (102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128),
        ),
        (
            (1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128),
            (177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128),
            (80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128),
        ),
        (
            (1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
    (  # plane 1: Y2
        (
            (198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62),
            (131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1),
            (68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128),
        ),
        (
            (1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128),
            (184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128),
            (81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128),
        ),
        (
            (1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128),
            (99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128),
            (23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128),
        ),
        (
            (1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128),
            (109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128),
            (44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128),
        ),
        (
            (1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128),
            (94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128),
            (22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128),
        ),
        (
            (1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128),
            (124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128),
            (35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128),
        ),
        (
            (1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128),
            (121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128),
            (45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128),
        ),
        (
            (1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128),
            (203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128),
            (137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128),
        ),
    ),
    (  # plane 2: chroma
        (
            (253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128),
            (175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128),
            (73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128),
        ),
        (
            (1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128),
            (239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128),
            (155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128),
        ),
        (
            (1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128),
            (201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128),
            (69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128),
        ),
        (
            (1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128),
            (223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128),
            (141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128),
            (190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128),
            (149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128),
            (213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128),
            (55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
    (  # plane 3: Y beginning at coefficient 0 (B_PRED - no Y2)
        (
            (202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255),
            (126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128),
            (61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128),
        ),
        (
            (1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128),
            (166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128),
            (39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128),
        ),
        (
            (1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128),
            (124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128),
            (24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128),
        ),
        (
            (1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128),
            (149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128),
            (28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128),
        ),
        (
            (1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128),
            (123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128),
            (20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128),
        ),
        (
            (1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128),
            (168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128),
            (47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128),
        ),
        (
            (1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128),
            (141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128),
            (42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128),
        ),
        (
            (1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
)

# ---------------------------------------------------------------------------
# coefficient-probability UPDATE probabilities (RFC 6386 §13.4:
# coeff_update_probs[4][8][3][11] — the probability that each
# coefficient probability is explicitly refreshed in the header)

_U = (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)

COEFF_UPDATE_PROBS = (
    (  # plane 0
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255),
            (249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255),
            (234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255),
            (250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
    ),
    (  # plane 1 (Y2)
        (
            (217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255),
            (234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255),
        ),
        (
            (255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
    ),
    (  # plane 2 (chroma)
        (
            (186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255),
            (234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255),
            (251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255),
        ),
        (
            (255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
    ),
    (  # plane 3
        (
            (248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255),
            (248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255),
            (248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
    ),
)

# ---------------------------------------------------------------------------
# key-frame subblock mode probabilities (RFC 6386 §11.5:
# kf_bmode_prob[10][10][9], indexed [above mode][left mode])

KF_BMODE_PROB = (
    (  # above = B_DC_PRED
        (231, 120, 48, 89, 115, 113, 120, 152, 112),
        (152, 179, 64, 126, 170, 118, 46, 70, 95),
        (175, 69, 143, 80, 85, 82, 72, 155, 103),
        (56, 58, 10, 171, 218, 189, 17, 13, 152),
        (144, 71, 10, 38, 171, 213, 144, 34, 26),
        (114, 26, 17, 163, 44, 195, 21, 10, 173),
        (121, 24, 80, 195, 26, 62, 44, 64, 85),
        (170, 46, 55, 19, 136, 160, 33, 206, 71),
        (63, 20, 8, 114, 114, 208, 12, 9, 226),
        (81, 40, 11, 96, 182, 84, 29, 16, 36),
    ),
    (  # above = B_TM_PRED
        (134, 183, 89, 137, 98, 101, 106, 165, 148),
        (72, 187, 100, 130, 157, 111, 32, 75, 80),
        (66, 102, 167, 99, 74, 62, 40, 234, 128),
        (41, 53, 9, 178, 241, 141, 26, 8, 107),
        (104, 79, 12, 27, 217, 255, 87, 17, 7),
        (74, 43, 26, 146, 73, 166, 49, 23, 157),
        (65, 38, 105, 160, 51, 52, 31, 115, 128),
        (87, 68, 71, 44, 114, 51, 15, 186, 23),
        (47, 41, 14, 110, 182, 183, 21, 17, 194),
        (66, 45, 25, 102, 197, 189, 23, 18, 22),
    ),
    (  # above = B_VE_PRED
        (88, 88, 147, 150, 42, 46, 45, 196, 205),
        (43, 97, 183, 117, 85, 38, 35, 179, 61),
        (39, 53, 200, 87, 26, 21, 43, 232, 171),
        (56, 34, 51, 104, 114, 102, 29, 93, 77),
        (107, 54, 32, 26, 51, 1, 81, 43, 31),
        (39, 28, 85, 171, 58, 165, 90, 98, 64),
        (34, 22, 116, 206, 23, 34, 43, 166, 73),
        (68, 25, 106, 22, 64, 171, 36, 225, 114),
        (34, 19, 21, 102, 132, 188, 16, 76, 124),
        (62, 18, 78, 95, 85, 57, 50, 48, 51),
    ),
    (  # above = B_HE_PRED
        (193, 101, 35, 159, 215, 111, 89, 46, 111),
        (60, 148, 31, 172, 219, 228, 21, 18, 111),
        (112, 113, 77, 85, 179, 255, 38, 120, 114),
        (40, 42, 1, 196, 245, 209, 10, 25, 109),
        (100, 80, 8, 43, 154, 1, 51, 26, 71),
        (88, 43, 29, 140, 166, 213, 37, 43, 154),
        (61, 63, 30, 155, 67, 45, 68, 1, 209),
        (142, 78, 78, 16, 255, 128, 34, 197, 171),
        (41, 40, 5, 102, 211, 183, 4, 1, 221),
        (51, 50, 17, 168, 209, 192, 23, 25, 82),
    ),
    (  # above = B_LD_PRED
        (125, 98, 42, 88, 104, 85, 117, 175, 82),
        (95, 84, 53, 89, 128, 100, 113, 101, 45),
        (75, 79, 123, 47, 51, 128, 81, 171, 1),
        (57, 17, 5, 71, 102, 57, 53, 41, 49),
        (115, 21, 2, 10, 102, 255, 166, 23, 6),
        (38, 33, 13, 121, 57, 73, 26, 1, 85),
        (41, 10, 67, 138, 77, 110, 90, 47, 114),
        (101, 29, 16, 10, 85, 128, 101, 196, 26),
        (57, 18, 10, 102, 102, 213, 34, 20, 43),
        (117, 20, 15, 36, 163, 128, 68, 1, 26),
    ),
    (  # above = B_RD_PRED
        (138, 31, 36, 171, 27, 166, 38, 44, 229),
        (67, 87, 58, 169, 82, 115, 26, 59, 179),
        (63, 59, 90, 180, 59, 166, 93, 73, 154),
        (40, 40, 21, 116, 143, 209, 34, 39, 175),
        (57, 46, 22, 24, 128, 1, 54, 17, 37),
        (47, 15, 16, 183, 34, 223, 49, 45, 183),
        (46, 17, 33, 183, 6, 98, 15, 32, 183),
        (65, 32, 73, 115, 28, 128, 23, 128, 205),
        (40, 3, 9, 115, 51, 192, 18, 6, 223),
        (87, 37, 9, 115, 59, 77, 64, 21, 47),
    ),
    (  # above = B_VR_PRED
        (104, 55, 44, 218, 9, 54, 53, 130, 226),
        (64, 90, 70, 205, 40, 41, 23, 26, 57),
        (54, 57, 112, 184, 5, 41, 38, 166, 213),
        (30, 34, 26, 133, 152, 116, 10, 32, 134),
        (75, 32, 12, 51, 192, 255, 160, 43, 51),
        (39, 19, 53, 221, 26, 114, 32, 73, 255),
        (31, 9, 65, 234, 2, 15, 1, 118, 73),
        (88, 31, 35, 67, 102, 85, 55, 186, 85),
        (56, 21, 23, 111, 59, 205, 45, 37, 192),
        (55, 38, 70, 124, 73, 102, 1, 34, 98),
    ),
    (  # above = B_VL_PRED
        (102, 61, 71, 37, 34, 53, 31, 243, 192),
        (69, 60, 71, 38, 73, 119, 28, 222, 37),
        (68, 45, 128, 34, 1, 47, 11, 245, 171),
        (62, 17, 19, 70, 146, 85, 55, 62, 70),
        (75, 15, 9, 9, 64, 255, 184, 119, 16),
        (37, 43, 37, 154, 100, 163, 85, 160, 1),
        (63, 9, 92, 136, 28, 64, 32, 201, 85),
        (86, 6, 28, 5, 64, 255, 25, 248, 1),
        (56, 8, 17, 132, 137, 255, 55, 116, 128),
        (58, 15, 20, 82, 135, 57, 26, 121, 40),
    ),
    (  # above = B_HD_PRED
        (164, 50, 31, 137, 154, 133, 25, 35, 218),
        (51, 103, 44, 131, 131, 123, 31, 6, 158),
        (86, 40, 64, 135, 148, 224, 45, 183, 128),
        (22, 26, 17, 131, 240, 154, 14, 1, 209),
        (83, 12, 13, 54, 192, 255, 68, 47, 28),
        (45, 16, 21, 91, 64, 222, 7, 1, 197),
        (56, 21, 39, 155, 60, 138, 23, 102, 213),
        (85, 26, 85, 85, 128, 128, 32, 146, 171),
        (18, 11, 7, 63, 144, 171, 4, 4, 246),
        (35, 27, 10, 146, 174, 171, 12, 26, 128),
    ),
    (  # above = B_HU_PRED
        (190, 80, 35, 99, 180, 80, 126, 54, 45),
        (85, 126, 47, 87, 176, 51, 41, 20, 32),
        (101, 75, 128, 139, 118, 146, 116, 128, 85),
        (56, 41, 15, 176, 236, 85, 37, 9, 62),
        (146, 36, 19, 30, 171, 255, 97, 27, 20),
        (71, 30, 17, 119, 118, 255, 17, 18, 138),
        (101, 38, 60, 138, 55, 70, 43, 26, 142),
        (138, 45, 61, 62, 219, 1, 81, 188, 64),
        (32, 41, 20, 117, 151, 142, 20, 21, 163),
        (112, 19, 12, 61, 195, 128, 48, 4, 24),
    ),
)


def _validate_tables() -> None:
    """Import-time structural validators for the spec transcriptions
    (the repo's H.264/MP3 convention: shapes and ranges are pinned
    here; the REAL-FILE interop test in tests/test_vp8.py is the
    end-to-end value check — the arithmetic decoder diverges on any
    wrong entry, so a green python.webp decode validates content)."""
    assert len(DC_QLOOKUP) == 128 and len(AC_QLOOKUP) == 128
    assert all(DC_QLOOKUP[i] <= DC_QLOOKUP[i + 1] for i in range(127))
    assert all(AC_QLOOKUP[i] <= AC_QLOOKUP[i + 1] for i in range(127))
    assert DC_QLOOKUP[0] == 4 and DC_QLOOKUP[127] == 157
    assert AC_QLOOKUP[0] == 4 and AC_QLOOKUP[127] == 284
    for tbl in (DEFAULT_COEFF_PROBS, COEFF_UPDATE_PROBS):
        assert len(tbl) == 4
        for plane in tbl:
            assert len(plane) == 8
            for band in plane:
                assert len(band) == 3
                for ctx in band:
                    assert len(ctx) == 11
                    assert all(1 <= p <= 255 for p in ctx)
    assert len(KF_BMODE_PROB) == 10
    for above in KF_BMODE_PROB:
        assert len(above) == 10
        for left in above:
            assert len(left) == 9
            assert all(1 <= p <= 255 for p in left)
    assert sorted(ZIGZAG) == list(range(16))
    assert len(COEFF_BANDS) == 16 and max(COEFF_BANDS) == 7
    for cat, (base, probs) in enumerate(zip(CAT_BASE, PCAT)):
        assert len(probs) == (1, 2, 3, 4, 5, 11)[cat]
    # trees: every leaf reachable, indices in range
    for tree, n_leaves in ((KF_YMODE_TREE, 5), (UV_MODE_TREE, 4),
                           (BMODE_TREE, 10), (COEFF_TREE, 12)):
        leaves = [-x for x in tree if x <= 0]
        assert len(leaves) == n_leaves and len(tree) == 2 * (n_leaves - 1)


_validate_tables()

# ---------------------------------------------------------------------------
# boolean arithmetic coder (RFC 6386 §7)


class BoolDecoder:
    """The spec's bool_decoder: 8-bit probabilities, 8-bit range
    renormalization. Reads past the physical end decode as zero bytes
    (the spec allows it); `overrun` records how far past the end we
    went so callers can reject torn streams."""

    __slots__ = ("data", "pos", "value", "range", "bit_count", "overrun")

    def __init__(self, data: bytes):
        if len(data) < 1:
            raise ValueError("empty VP8 bool-coded partition")
        b0 = data[0]
        b1 = data[1] if len(data) > 1 else 0
        self.data = data
        self.pos = 2
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0
        self.overrun = 2 - len(data) if len(data) < 2 else 0

    def read_bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                else:
                    self.overrun += 1
                self.pos += 1
        return ret

    def read_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool(128)
        return v

    def read_signed(self, n: int) -> int:
        """Magnitude-then-sign (the spec's L(n) followed by a sign
        flag), used by the header's delta fields."""
        v = self.read_literal(n)
        return -v if self.read_bool(128) else v

    def read_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            node = tree[i + self.read_bool(probs[i >> 1])]
            if node <= 0:
                return -node
            i = node


class BoolEncoder:
    """The spec's bool_encoder (§7.3) with carry propagation into the
    emitted byte list — used only by the fixture encoder."""

    __slots__ = ("bytes", "range", "bottom", "bit_count")

    def __init__(self):
        self.bytes = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.bytes) - 1
        while i >= 0:
            if self.bytes[i] == 255:
                self.bytes[i] = 0
                i -= 1
            else:
                self.bytes[i] += 1
                return
        raise AssertionError("carry out of empty buffer")

    def write_bool(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.bytes.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def write_literal(self, n: int, v: int) -> None:
        for shift in range(n - 1, -1, -1):
            self.write_bool(128, (v >> shift) & 1)

    def write_signed(self, n: int, v: int) -> None:
        self.write_literal(n, abs(v))
        self.write_bool(128, 1 if v < 0 else 0)

    def write_tree(self, tree, probs, leaf: int, start: int = 0) -> None:
        # walk the tree recording branch bits, then emit them in order
        path = []

        def walk(i: int) -> bool:
            for b in (0, 1):
                node = tree[i + b]
                if node <= 0:
                    if -node == leaf:
                        path.append((i >> 1, b))
                        return True
                elif walk(node):
                    path.append((i >> 1, b))
                    return True
            return False

        if not walk(start):
            raise AssertionError(f"leaf {leaf} unreachable")
        for prob_idx, bit in reversed(path):
            self.write_bool(probs[prob_idx], bit)

    def flush(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.bytes.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.bytes)

# ---------------------------------------------------------------------------
# exact integer inverse transforms (RFC 6386 §14.3-14.4)

_COS = 20091  # cospi8sqrt2minus1 (scaled 2^16)
_SIN = 35468  # sinpi8sqrt2 (scaled 2^16)


def idct4x4(block):
    """RFC 6386 §14.3 — exact integer 4x4 inverse DCT; block is a
    length-16 list in natural (raster) order; returns 4x4 list."""
    tmp = [0] * 16
    for i in range(4):
        ip0, ip4, ip8, ip12 = block[i], block[i + 4], block[i + 8], block[i + 12]
        a1 = ip0 + ip8
        b1 = ip0 - ip8
        c1 = ((ip4 * _SIN) >> 16) - (ip12 + ((ip12 * _COS) >> 16))
        d1 = (ip4 + ((ip4 * _COS) >> 16)) + ((ip12 * _SIN) >> 16)
        tmp[i] = a1 + d1
        tmp[i + 12] = a1 - d1
        tmp[i + 4] = b1 + c1
        tmp[i + 8] = b1 - c1
    out = [[0] * 4 for _ in range(4)]
    for i in range(4):
        ip0, ip1, ip2, ip3 = tmp[4 * i : 4 * i + 4]
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        c1 = ((ip1 * _SIN) >> 16) - (ip3 + ((ip3 * _COS) >> 16))
        d1 = (ip1 + ((ip1 * _COS) >> 16)) + ((ip3 * _SIN) >> 16)
        out[i][0] = (a1 + d1 + 4) >> 3
        out[i][3] = (a1 - d1 + 4) >> 3
        out[i][1] = (b1 + c1 + 4) >> 3
        out[i][2] = (b1 - c1 + 4) >> 3
    return out


def iwht4x4(block):
    """RFC 6386 §14.3 — inverse Walsh-Hadamard for the Y2 block;
    returns the 16 Y-subblock DC values in raster order."""
    tmp = [0] * 16
    for i in range(4):
        a1 = block[i] + block[i + 12]
        b1 = block[i + 4] + block[i + 8]
        c1 = block[i + 4] - block[i + 8]
        d1 = block[i] - block[i + 12]
        tmp[i] = a1 + b1
        tmp[i + 4] = c1 + d1
        tmp[i + 8] = a1 - b1
        tmp[i + 12] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# frame header (RFC 6386 §9)


class FrameHeader:
    __slots__ = (
        "width", "height", "xscale", "yscale",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant", "seg_lf",
        "seg_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_deltas", "mode_lf_deltas",
        "n_parts", "y_ac_qi", "y_dc_delta", "y2_dc_delta", "y2_ac_delta",
        "uv_dc_delta", "uv_ac_delta",
        "coeff_probs", "mb_no_skip", "skip_prob",
    )


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _dequant_factors(hdr: FrameHeader, segment: int):
    """Per-segment (y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac) quantizer
    values (RFC 6386 §14.1, incl. the y2 scalings and the uv_dc cap)."""
    if hdr.seg_enabled:
        base = hdr.seg_quant[segment] if hdr.seg_abs else hdr.y_ac_qi + hdr.seg_quant[segment]
    else:
        base = hdr.y_ac_qi
    base = _clamp_q(base)
    y_dc = DC_QLOOKUP[_clamp_q(base + hdr.y_dc_delta)]
    y_ac = AC_QLOOKUP[base]
    y2_dc = DC_QLOOKUP[_clamp_q(base + hdr.y2_dc_delta)] * 2
    y2_ac = AC_QLOOKUP[_clamp_q(base + hdr.y2_ac_delta)] * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QLOOKUP[_clamp_q(base + hdr.uv_dc_delta)]
    if uv_dc > 132:
        uv_dc = 132
    uv_ac = AC_QLOOKUP[_clamp_q(base + hdr.uv_ac_delta)]
    return y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac


def parse_frame_header(data: bytes):
    """Parse the uncompressed tag + key-frame header + first-partition
    header. Returns (hdr, first_partition_bool_decoder, partitions)."""
    if len(data) < 10:
        raise ValueError("torn VP8 payload: shorter than the frame tag")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    key_frame = not (tag & 1)
    version = (tag >> 1) & 7
    part1_size = tag >> 5
    if not key_frame:
        raise ValueError(
            "VP8 inter (non-key) frame: prediction needs a reference frame "
            "a still-image container never carries (declared boundary)"
        )
    if version > 3:
        raise ValueError(f"reserved VP8 version {version}")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 key-frame start code")
    w16, h16 = struct.unpack("<HH", data[6:10])
    hdr = FrameHeader()
    hdr.width = w16 & 0x3FFF
    hdr.height = h16 & 0x3FFF
    hdr.xscale = w16 >> 14
    hdr.yscale = h16 >> 14
    if hdr.width == 0 or hdr.height == 0:
        raise ValueError("zero VP8 frame dimension")
    if 10 + part1_size > len(data):
        raise ValueError("torn VP8 payload: first partition overruns")
    bd = BoolDecoder(data[10 : 10 + part1_size])
    bd.read_literal(1)  # color_space (key frame: must be 0 for YCbCr)
    bd.read_literal(1)  # clamping_type hint
    # segmentation (§9.3)
    hdr.seg_enabled = bd.read_literal(1)
    hdr.seg_update_map = 0
    hdr.seg_abs = 0
    hdr.seg_quant = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    hdr.seg_tree_probs = [255, 255, 255]
    if hdr.seg_enabled:
        hdr.seg_update_map = bd.read_literal(1)
        update_data = bd.read_literal(1)
        if update_data:
            hdr.seg_abs = bd.read_literal(1)
            for i in range(4):
                if bd.read_literal(1):
                    hdr.seg_quant[i] = bd.read_signed(7)
            for i in range(4):
                if bd.read_literal(1):
                    hdr.seg_lf[i] = bd.read_signed(6)
        if hdr.seg_update_map:
            for i in range(3):
                if bd.read_literal(1):
                    hdr.seg_tree_probs[i] = bd.read_literal(8)
    # loop filter (§9.4)
    hdr.filter_type = bd.read_literal(1)
    hdr.filter_level = bd.read_literal(6)
    hdr.sharpness = bd.read_literal(3)
    hdr.lf_delta_enabled = bd.read_literal(1)
    hdr.ref_lf_deltas = [0, 0, 0, 0]
    hdr.mode_lf_deltas = [0, 0, 0, 0]
    if hdr.lf_delta_enabled:
        if bd.read_literal(1):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.read_literal(1):
                    hdr.ref_lf_deltas[i] = bd.read_signed(6)
            for i in range(4):
                if bd.read_literal(1):
                    hdr.mode_lf_deltas[i] = bd.read_signed(6)
    # token partitions (§9.5)
    hdr.n_parts = 1 << bd.read_literal(2)
    rest = data[10 + part1_size :]
    sizes_len = 3 * (hdr.n_parts - 1)
    if len(rest) < sizes_len:
        raise ValueError("torn VP8 payload: partition size table overruns")
    partitions = []
    off = sizes_len
    for i in range(hdr.n_parts - 1):
        psz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        if off + psz > len(rest):
            raise ValueError("torn VP8 payload: token partition overruns")
        partitions.append(BoolDecoder(rest[off : off + psz]))
        off += psz
    if off >= len(rest) and hdr.n_parts > 0 and len(rest) == off:
        raise ValueError("torn VP8 payload: empty last token partition")
    partitions.append(BoolDecoder(rest[off:]))
    # quantizers (§9.6)
    hdr.y_ac_qi = bd.read_literal(7)
    hdr.y_dc_delta = bd.read_signed(4) if bd.read_literal(1) else 0
    hdr.y2_dc_delta = bd.read_signed(4) if bd.read_literal(1) else 0
    hdr.y2_ac_delta = bd.read_signed(4) if bd.read_literal(1) else 0
    hdr.uv_dc_delta = bd.read_signed(4) if bd.read_literal(1) else 0
    hdr.uv_ac_delta = bd.read_signed(4) if bd.read_literal(1) else 0
    bd.read_literal(1)  # refresh_entropy_probs (no-op for one frame)
    # coefficient probability refresh (§13.4)
    hdr.coeff_probs = [
        [[list(ctx) for ctx in band] for band in plane]
        for plane in DEFAULT_COEFF_PROBS
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    if bd.read_bool(COEFF_UPDATE_PROBS[i][j][k][m]):
                        hdr.coeff_probs[i][j][k][m] = bd.read_literal(8)
    hdr.mb_no_skip = bd.read_literal(1)
    hdr.skip_prob = bd.read_literal(8) if hdr.mb_no_skip else 0
    if bd.overrun > 0:
        raise ValueError("torn VP8 payload: header ran past first partition")
    return hdr, bd, partitions

# ---------------------------------------------------------------------------
# intra prediction (RFC 6386 §12)


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict_whole(plane, y0: int, x0: int, size: int, mode: int,
                   have_above: bool, have_left: bool) -> None:
    """16x16 / 8x8 whole-block intra prediction written in place into
    the padded plane (borders: above=127, left=129, corner=127)."""
    if mode == DC_PRED:
        total, count = 0, 0
        if have_above:
            total += int(plane[y0 - 1, x0 : x0 + size].sum())
            count += size
        if have_left:
            total += int(plane[y0 : y0 + size, x0 - 1].sum())
            count += size
        dc = 128 if count == 0 else (total + (count >> 1)) // count
        plane[y0 : y0 + size, x0 : x0 + size] = dc
    elif mode == V_PRED:
        plane[y0 : y0 + size, x0 : x0 + size] = plane[y0 - 1, x0 : x0 + size]
    elif mode == H_PRED:
        plane[y0 : y0 + size, x0 : x0 + size] = plane[
            y0 : y0 + size, x0 - 1
        ].reshape(size, 1)
    elif mode == TM_PRED:
        p = int(plane[y0 - 1, x0 - 1])
        above = plane[y0 - 1, x0 : x0 + size].astype(np.int32)
        left = plane[y0 : y0 + size, x0 - 1].astype(np.int32)
        blk = left.reshape(size, 1) + above.reshape(1, size) - p
        plane[y0 : y0 + size, x0 : x0 + size] = np.clip(blk, 0, 255)
    else:
        raise ValueError(f"bad whole-block intra mode {mode}")


def _predict_subblock(L, r4: int, c4: int, mode: int):
    """4x4 subblock prediction (§12.3) inside the local 17x21 buffer L
    (row 0 = above row incl. corner+above-right, col 0 = left column).
    Returns a 4x4 list of predicted pixels."""
    y0, x0 = 1 + 4 * r4, 1 + 4 * c4
    # context pixels
    A = [L[y0 - 1][x0 + i] for i in range(4)]
    if c4 == 3:
        AR = [L[0][17 + i] for i in range(4)]  # the above-MB row quirk
    else:
        AR = [L[y0 - 1][x0 + 4 + i] for i in range(4)]
    Lc = [L[y0 + i][x0 - 1] for i in range(4)]
    P = L[y0 - 1][x0 - 1]
    A8 = A + AR
    pp = [Lc[3], Lc[2], Lc[1], Lc[0], P, A[0], A[1], A[2], A[3]]
    o = [[0] * 4 for _ in range(4)]
    if mode == B_DC_PRED:
        dc = (sum(A) + sum(Lc) + 4) >> 3
        for r in range(4):
            for c in range(4):
                o[r][c] = dc
    elif mode == B_TM_PRED:
        for r in range(4):
            for c in range(4):
                o[r][c] = _clip255(Lc[r] + A[c] - P)
    elif mode == B_VE_PRED:
        e = [P] + A + [AR[0]]
        row = [(e[c] + 2 * e[c + 1] + e[c + 2] + 2) >> 2 for c in range(4)]
        for r in range(4):
            o[r] = list(row)
    elif mode == B_HE_PRED:
        e = [P] + Lc + [Lc[3]]
        col = [(e[r] + 2 * e[r + 1] + e[r + 2] + 2) >> 2 for r in range(4)]
        for r in range(4):
            for c in range(4):
                o[r][c] = col[r]
    elif mode == B_LD_PRED:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i == 6:
                    o[r][c] = (A8[6] + 3 * A8[7] + 2) >> 2
                else:
                    o[r][c] = (A8[i] + 2 * A8[i + 1] + A8[i + 2] + 2) >> 2
    elif mode == B_RD_PRED:
        for r in range(4):
            for c in range(4):
                e = 4 + c - r
                o[r][c] = (pp[e - 1] + 2 * pp[e] + pp[e + 1] + 2) >> 2
    elif mode == B_VR_PRED:
        f2 = lambda e: (pp[e - 1] + 2 * pp[e] + pp[e + 1] + 2) >> 2  # noqa: E731
        f1 = lambda e: (pp[e] + pp[e + 1] + 1) >> 1  # noqa: E731
        o[3][0] = f2(2)
        o[2][0] = f2(3)
        o[3][1] = o[1][0] = f2(4)
        o[2][1] = o[0][0] = f1(4)
        o[3][2] = o[1][1] = f2(5)
        o[2][2] = o[0][1] = f1(5)
        o[3][3] = o[1][2] = f2(6)
        o[2][3] = o[0][2] = f1(6)
        o[1][3] = f2(7)
        o[0][3] = f1(7)
    elif mode == B_VL_PRED:
        g2 = lambda i: (A8[i] + 2 * A8[i + 1] + A8[i + 2] + 2) >> 2  # noqa: E731
        g1 = lambda i: (A8[i] + A8[i + 1] + 1) >> 1  # noqa: E731
        o[0][0] = g1(0)
        o[1][0] = g2(0)
        o[2][0] = o[0][1] = g1(1)
        o[1][1] = o[3][0] = g2(1)
        o[2][1] = o[0][2] = g1(2)
        o[3][1] = o[1][2] = g2(2)
        o[2][2] = o[0][3] = g1(3)
        o[3][2] = o[1][3] = g2(3)
        o[2][3] = g2(4)
        o[3][3] = g2(5)
    elif mode == B_HD_PRED:
        f2 = lambda e: (pp[e - 1] + 2 * pp[e] + pp[e + 1] + 2) >> 2  # noqa: E731
        f1 = lambda e: (pp[e] + pp[e + 1] + 1) >> 1  # noqa: E731
        o[3][0] = f1(0)
        o[3][1] = f2(1)
        o[2][0] = o[3][2] = f1(1)
        o[2][1] = o[3][3] = f2(2)
        o[2][2] = o[1][0] = f1(2)
        o[2][3] = o[1][1] = f2(3)
        o[1][2] = o[0][0] = f1(3)
        o[1][3] = o[0][1] = f2(4)
        o[0][2] = f2(5)
        o[0][3] = f2(6)
    elif mode == B_HU_PRED:
        o[0][0] = (Lc[0] + Lc[1] + 1) >> 1
        o[0][1] = (Lc[0] + 2 * Lc[1] + Lc[2] + 2) >> 2
        o[0][2] = o[1][0] = (Lc[1] + Lc[2] + 1) >> 1
        o[0][3] = o[1][1] = (Lc[1] + 2 * Lc[2] + Lc[3] + 2) >> 2
        o[1][2] = o[2][0] = (Lc[2] + Lc[3] + 1) >> 1
        o[1][3] = o[2][1] = (Lc[2] + 3 * Lc[3] + 2) >> 2
        o[2][2] = o[2][3] = o[3][0] = o[3][1] = o[3][2] = o[3][3] = Lc[3]
    else:
        raise ValueError(f"bad subblock intra mode {mode}")
    return o


# ---------------------------------------------------------------------------
# token / residual decoding (RFC 6386 §13)


def decode_coeffs(bd: BoolDecoder, probs, plane: int, ctx: int,
                  first_coeff: int, dq_dc: int, dq_ac: int):
    """Decode one 4x4 block's coefficient tokens. Returns
    (natural-order dequantized coeffs[16], any_nonzero)."""
    out = [0] * 16
    c = first_coeff
    nonzero = False
    skip_eob = False  # after a DCT_0, EOB cannot follow
    while c < 16:
        band_probs = probs[plane][COEFF_BANDS[c]][ctx]
        tok = bd.read_tree(COEFF_TREE, band_probs, start=2 if skip_eob else 0)
        if tok == DCT_EOB:
            break
        if tok == DCT_0:
            ctx = 0
            skip_eob = True
            c += 1
            continue
        if tok <= DCT_4:
            val = tok  # DCT_1..DCT_4 are literal magnitudes 1..4
        else:
            cat = tok - DCT_CAT1
            extra = 0
            for p in PCAT[cat]:
                extra = (extra << 1) | bd.read_bool(p)
            val = CAT_BASE[cat] + extra
        if bd.read_bool(128):
            val = -val
        ctx = 1 if -1 <= val <= 1 else 2
        out[ZIGZAG[c]] = val * (dq_dc if c == 0 else dq_ac)
        nonzero = True
        skip_eob = False
        c += 1
    return out, nonzero


class _MBInfo:
    __slots__ = ("ymode", "uvmode", "bmodes", "segment", "skip", "has_coeffs")

# map of 16x16 mode → implied subblock mode for kf_bmode context (§11.3)
_IMPLIED_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                  H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)


def decode_frame(data: bytes):
    """Decode a VP8 key frame. Returns (y, u, v, width, height) —
    uint8 planes cropped to the frame size (chroma at half res,
    ceil-rounded)."""
    hdr, bd, parts = parse_frame_header(data)
    mb_w = (hdr.width + 15) >> 4
    mb_h = (hdr.height + 15) >> 4

    # --- pass 1: macroblock modes (first partition) -------------------
    mbs: list[_MBInfo] = []
    above_bmodes = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for mb_r in range(mb_h):
        left_bmodes = [B_DC_PRED] * 4
        for mb_c in range(mb_w):
            mb = _MBInfo()
            mb.segment = 0
            if hdr.seg_enabled and hdr.seg_update_map:
                mb.segment = bd.read_tree(_SEGMENT_TREE, hdr.seg_tree_probs)
            mb.skip = bd.read_bool(hdr.skip_prob) if hdr.mb_no_skip else 0
            mb.ymode = bd.read_tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if mb.ymode == B_PRED:
                bm = [0] * 16
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    above = above_bmodes[mb_c][c4] if r4 == 0 else bm[i - 4]
                    left = left_bmodes[r4] if c4 == 0 else bm[i - 1]
                    bm[i] = bd.read_tree(BMODE_TREE, KF_BMODE_PROB[above][left])
                mb.bmodes = bm
            else:
                mb.bmodes = [_IMPLIED_BMODE[mb.ymode]] * 16
            above_bmodes[mb_c] = mb.bmodes[12:16]
            left_bmodes = [mb.bmodes[3], mb.bmodes[7], mb.bmodes[11], mb.bmodes[15]]
            mb.uvmode = bd.read_tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            mb.has_coeffs = False
            mbs.append(mb)
    if bd.overrun > 0:
        raise ValueError("torn VP8 payload: mode data ran past first partition")

    # --- pass 2: residuals + reconstruction --------------------------
    W, H = mb_w * 16, mb_h * 16
    yp = np.empty((H + 1, W + 5), dtype=np.int32)
    up = np.empty((H // 2 + 1, W // 2 + 5), dtype=np.int32)
    vp = np.empty((H // 2 + 1, W // 2 + 5), dtype=np.int32)
    for pl in (yp, up, vp):
        pl[0, :] = 127
        pl[1:, 0] = 129
        pl[0, 0] = 127
    # per-plane nonzero contexts: above[mb_w][4/2/2+1], left reset per row
    above_nz = [[0] * 9 for _ in range(mb_w)]
    residuals = [None] * (mb_w * mb_h)
    for mb_r in range(mb_h):
        left_nz = [0] * 9
        tbd = parts[mb_r % hdr.n_parts]
        for mb_c in range(mb_w):
            mb = mbs[mb_r * mb_w + mb_c]
            dq = _dequant_factors(hdr, mb.segment)
            has_y2 = mb.ymode != B_PRED
            coeffs = [None] * 25  # 16 Y, 4 U, 4 V, [24] = Y2
            if mb.skip:
                for i in range(8):
                    above_nz[mb_c][i] = 0
                    left_nz[i] = 0
                if has_y2:
                    above_nz[mb_c][8] = 0
                    left_nz[8] = 0
            else:
                any_nz = False
                if has_y2:
                    ctx = above_nz[mb_c][8] + left_nz[8]
                    c24, nz = decode_coeffs(tbd, hdr.coeff_probs, 1, ctx, 0,
                                            dq[2], dq[3])
                    coeffs[24] = c24
                    above_nz[mb_c][8] = left_nz[8] = int(nz)
                    any_nz |= nz
                    plane, first = 0, 1
                else:
                    plane, first = 3, 0
                anz = above_nz[mb_c]
                lnz = left_nz
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    ctx = anz[c4] + lnz[r4]
                    cf, nz = decode_coeffs(tbd, hdr.coeff_probs, plane, ctx,
                                           first, dq[0], dq[1])
                    coeffs[i] = cf
                    anz[c4] = lnz[r4] = int(nz)
                    any_nz |= nz
                for half, base in ((0, 16), (1, 20)):  # U then V
                    for i in range(4):
                        r4, c4 = i >> 1, i & 1
                        ai, li = 4 + 2 * half + c4, 4 + 2 * half + r4
                        ctx = anz[ai] + lnz[li]
                        cf, nz = decode_coeffs(tbd, hdr.coeff_probs, 2, ctx,
                                               0, dq[4], dq[5])
                        coeffs[base + i] = cf
                        anz[ai] = lnz[li] = int(nz)
                        any_nz |= nz
                mb.has_coeffs = any_nz
            residuals[mb_r * mb_w + mb_c] = coeffs
            _reconstruct_mb(yp, up, vp, mb, coeffs, mb_r, mb_c, has_y2)
        # extend the right edge for next row's above-right reads
        # (AR_EDGE_REPLICATE: libwebp replicates the last above pixel;
        # a 127-filling decoder differs only on right-edge B_PRED MBs)
        y0 = 1 + mb_r * 16
        yp[y0 : y0 + 16, W + 1 : W + 5] = yp[y0 : y0 + 16, W].reshape(16, 1)
    for pd in parts:
        if pd.overrun > 0:
            raise ValueError("torn VP8 payload: token partition exhausted")

    if hdr.filter_level:
        _loop_filter(yp, up, vp, hdr, mbs, mb_w, mb_h)

    y = yp[1 : 1 + hdr.height, 1 : 1 + hdr.width].astype(np.uint8)
    cw, ch = (hdr.width + 1) >> 1, (hdr.height + 1) >> 1
    u = up[1 : 1 + ch, 1 : 1 + cw].astype(np.uint8)
    v = vp[1 : 1 + ch, 1 : 1 + cw].astype(np.uint8)
    return y, u, v, hdr.width, hdr.height


def _reconstruct_mb(yp, up, vp, mb, coeffs, mb_r: int, mb_c: int,
                    has_y2: bool) -> None:
    y0, x0 = 1 + mb_r * 16, 1 + mb_c * 16
    have_above, have_left = mb_r > 0, mb_c > 0
    if has_y2:
        y2 = coeffs[24]
        dcs = iwht4x4(y2) if y2 is not None else [0] * 16
        _predict_whole(yp, y0, x0, 16, mb.ymode, have_above, have_left)
        for i in range(16):
            blk = coeffs[i]
            if blk is None:
                blk = [0] * 16
            blk = list(blk)
            blk[0] = dcs[i]
            if any(blk):
                res = idct4x4(blk)
                r4, c4 = i >> 2, i & 3
                sl = yp[y0 + 4 * r4 : y0 + 4 * r4 + 4, x0 + 4 * c4 : x0 + 4 * c4 + 4]
                np.clip(sl + np.asarray(res, dtype=np.int32), 0, 255, out=sl)
    else:
        # B_PRED: local 17x21 buffer (above row + left col + 4x AR)
        L = [[0] * 21 for _ in range(17)]
        for c in range(21):
            L[0][c] = int(yp[y0 - 1, x0 - 1 + c])
        for r in range(16):
            L[r + 1][0] = int(yp[y0 + r, x0 - 1])
        for i in range(16):
            r4, c4 = i >> 2, i & 3
            pred = _predict_subblock(L, r4, c4, mb.bmodes[i])
            blk = coeffs[i]
            if blk is not None and any(blk):
                res = idct4x4(blk)
            else:
                res = ((0,) * 4,) * 4
            for r in range(4):
                row = L[1 + 4 * r4 + r]
                prow = pred[r]
                rrow = res[r]
                for c in range(4):
                    row[1 + 4 * c4 + c] = _clip255(prow[c] + rrow[c])
        for r in range(16):
            for c in range(16):
                yp[y0 + r, x0 + c] = L[r + 1][c + 1]
    # chroma
    cy0, cx0 = 1 + mb_r * 8, 1 + mb_c * 8
    for plane, base in ((up, 16), (vp, 20)):
        _predict_whole(plane, cy0, cx0, 8, mb.uvmode, have_above, have_left)
        for i in range(4):
            blk = coeffs[base + i]
            if blk is not None and any(blk):
                res = idct4x4(blk)
                r4, c4 = i >> 1, i & 1
                sl = plane[cy0 + 4 * r4 : cy0 + 4 * r4 + 4,
                           cx0 + 4 * c4 : cx0 + 4 * c4 + 4]
                np.clip(sl + np.asarray(res, dtype=np.int32), 0, 255, out=sl)

# ---------------------------------------------------------------------------
# in-loop deblocking filter (RFC 6386 §15)


def _c127(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


def _u2s(v: int) -> int:
    return v - 128


def _s2u(v: int) -> int:
    return _c127(v) + 128


def _filter_common(px, use_outer: bool):
    """§15.2/§15.3 common 4-tap filter on [p1, p0, q0, q1]; mutates."""
    ps1, ps0, qs0, qs1 = (_u2s(v) for v in px)
    a = _c127(ps1 - qs1) if use_outer else 0
    a = _c127(a + 3 * (qs0 - ps0))
    f1 = _c127(a + 4) >> 3
    f2 = _c127(a + 3) >> 3
    px[2] = _s2u(qs0 - f1)
    px[1] = _s2u(ps0 + f2)
    return f1


def _normal_mask(limit: int, edge_limit: int, p3, p2, p1, p0, q0, q1, q2, q3):
    return (
        abs(p3 - p2) <= limit and abs(p2 - p1) <= limit
        and abs(p1 - p0) <= limit and abs(q1 - q0) <= limit
        and abs(q2 - q1) <= limit and abs(q3 - q2) <= limit
        and abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit
    )


def _hev(thresh: int, p1, p0, q0, q1):
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _subblock_filter(px, limit, edge_limit, thresh):
    """Normal subblock filter on 8 pixels [p3..q3]; mutates px."""
    p3, p2, p1, p0, q0, q1, q2, q3 = px
    if not _normal_mask(limit, edge_limit, *px):
        return
    hev = _hev(thresh, p1, p0, q0, q1)
    inner = px[2:6]  # p1 p0 q0 q1
    f1 = _filter_common(inner, use_outer=hev)
    px[2:6] = inner
    if not hev:
        a = (f1 + 1) >> 1
        px[5] = _s2u(_u2s(px[5]) - a)  # q1
        px[2] = _s2u(_u2s(px[2]) + a)  # p1


def _mb_filter(px, limit, edge_limit, thresh):
    """Normal macroblock-edge filter on 8 pixels [p3..q3]; mutates."""
    if not _normal_mask(limit, edge_limit, *px):
        return
    p2, p1, p0, q0, q1, q2 = (_u2s(v) for v in px[1:7])
    hev = _hev(thresh, px[2], px[3], px[4], px[5])
    w = _c127(_c127(p1 - q1) + 3 * (q0 - p0))
    if hev:
        fv = w
        f1 = _c127(fv + 4) >> 3
        f2 = _c127(fv + 3) >> 3
        q0 = _c127(q0 - f1)
        p0 = _c127(p0 + f2)
    else:
        a = _c127((27 * w + 63) >> 7)
        q0 = _c127(q0 - a)
        p0 = _c127(p0 + a)
        a = _c127((18 * w + 63) >> 7)
        q1 = _c127(q1 - a)
        p1 = _c127(p1 + a)
        a = _c127((9 * w + 63) >> 7)
        q2 = _c127(q2 - a)
        p2 = _c127(p2 + a)
    px[1] = p2 + 128
    px[2] = p1 + 128
    px[3] = p0 + 128
    px[4] = q0 + 128
    px[5] = q1 + 128
    px[6] = q2 + 128


def _simple_filter(px, edge_limit):
    """Simple filter on 4 pixels [p1, p0, q0, q1]; mutates."""
    p1, p0, q0, q1 = px
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge_limit:
        _filter_common(px, use_outer=True)


def _mb_filter_params(hdr: FrameHeader, mb: _MBInfo):
    lvl = hdr.filter_level
    if hdr.seg_enabled:
        lvl = hdr.seg_lf[mb.segment] if hdr.seg_abs else lvl + hdr.seg_lf[mb.segment]
    if hdr.lf_delta_enabled:
        lvl += hdr.ref_lf_deltas[0]  # key frame: INTRA_FRAME reference
        if mb.ymode == B_PRED:
            lvl += hdr.mode_lf_deltas[0]
    lvl = 0 if lvl < 0 else (63 if lvl > 63 else lvl)
    if lvl == 0:
        return 0, 0, 0
    interior = lvl
    if hdr.sharpness:
        interior >>= 2 if hdr.sharpness > 4 else 1
        if interior > 9 - hdr.sharpness:
            interior = 9 - hdr.sharpness
    if interior < 1:
        interior = 1
    hev_t = 0
    if lvl >= 40:
        hev_t = 2
    elif lvl >= 15:
        hev_t = 1
    return lvl, interior, hev_t


def _loop_filter(yp, up, vp, hdr: FrameHeader, mbs, mb_w: int, mb_h: int):
    """Apply the in-loop filter MB by MB (§15.1 ordering: per MB, the
    left MB edge, then interior vertical edges, then the top MB edge,
    then interior horizontal edges)."""
    simple = hdr.filter_type == 1
    for mb_r in range(mb_h):
        for mb_c in range(mb_w):
            mb = mbs[mb_r * mb_w + mb_c]
            lvl, interior, hev_t = _mb_filter_params(hdr, mb)
            if lvl == 0:
                continue
            mb_lim = (lvl + 2) * 2 + interior
            sub_lim = lvl * 2 + interior
            skip_sub = (not mb.has_coeffs) and mb.ymode != B_PRED
            y0, x0 = 1 + mb_r * 16, 1 + mb_c * 16
            cy0, cx0 = 1 + mb_r * 8, 1 + mb_c * 8
            if simple:
                if mb_c > 0:
                    _edge_pass(yp, y0, x0, 16, True, True, mb_lim, 0, 0, True)
                if not skip_sub:
                    for dx in (4, 8, 12):
                        _edge_pass(yp, y0, x0 + dx, 16, True, False, sub_lim, 0, 0, True)
                if mb_r > 0:
                    _edge_pass(yp, y0, x0, 16, False, True, mb_lim, 0, 0, True)
                if not skip_sub:
                    for dy in (4, 8, 12):
                        _edge_pass(yp, y0 + dy, x0, 16, False, False, sub_lim, 0, 0, True)
                continue
            if mb_c > 0:
                _edge_pass(yp, y0, x0, 16, True, True, mb_lim, interior, hev_t, False)
                _edge_pass(up, cy0, cx0, 8, True, True, mb_lim, interior, hev_t, False)
                _edge_pass(vp, cy0, cx0, 8, True, True, mb_lim, interior, hev_t, False)
            if not skip_sub:
                for dx in (4, 8, 12):
                    _edge_pass(yp, y0, x0 + dx, 16, True, False, sub_lim, interior, hev_t, False)
                _edge_pass(up, cy0, cx0 + 4, 8, True, False, sub_lim, interior, hev_t, False)
                _edge_pass(vp, cy0, cx0 + 4, 8, True, False, sub_lim, interior, hev_t, False)
            if mb_r > 0:
                _edge_pass(yp, y0, x0, 16, False, True, mb_lim, interior, hev_t, False)
                _edge_pass(up, cy0, cx0, 8, False, True, mb_lim, interior, hev_t, False)
                _edge_pass(vp, cy0, cx0, 8, False, True, mb_lim, interior, hev_t, False)
            if not skip_sub:
                for dy in (4, 8, 12):
                    _edge_pass(yp, y0 + dy, x0, 16, False, False, sub_lim, interior, hev_t, False)
                _edge_pass(up, cy0 + 4, cx0, 8, False, False, sub_lim, interior, hev_t, False)
                _edge_pass(vp, cy0 + 4, cx0, 8, False, False, sub_lim, interior, hev_t, False)


def _edge_pass(plane, y0: int, x0: int, length: int, vertical: bool,
               mb_edge: bool, edge_lim: int, interior: int, hev_t: int,
               simple: bool) -> None:
    """Run the chosen filter across one edge. `vertical` means the
    EDGE is vertical (pixels taken horizontally across it at x0)."""
    for i in range(length):
        if vertical:
            ys, xs = y0 + i, x0
            if simple:
                idx = [(ys, xs - 2), (ys, xs - 1), (ys, xs), (ys, xs + 1)]
            else:
                idx = [(ys, xs + d) for d in range(-4, 4)]
        else:
            ys, xs = y0, x0 + i
            if simple:
                idx = [(ys - 2, xs), (ys - 1, xs), (ys, xs), (ys + 1, xs)]
            else:
                idx = [(ys + d, xs) for d in range(-4, 4)]
        px = [int(plane[a, b]) for a, b in idx]
        if simple:
            _simple_filter(px, edge_lim)
        elif mb_edge:
            _mb_filter(px, interior, edge_lim, hev_t)
        else:
            _subblock_filter(px, interior, edge_lim, hev_t)
        for (a, b), v in zip(idx, px):
            plane[a, b] = v

# ---------------------------------------------------------------------------
# RGB ↔ YUV (BT.601, studio swing — the WebP/VP8 convention). The
# decode direction lives in yuv_to_rgb_exact below (libwebp's exact
# fixed-point matrix); this float forward path only feeds the fixture
# encoder, where exactness is defined by the recorded reconstruction.


def rgb_to_yuv(rgb):
    """Forward BT.601 studio-swing conversion + 4:2:0 2x2-mean chroma
    subsampling (fixture encoder input path)."""
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 16.0 + 0.257 * r + 0.504 * g + 0.098 * b
    u = 128.0 - 0.148 * r - 0.291 * g + 0.439 * b
    v = 128.0 + 0.439 * r - 0.368 * g - 0.071 * b
    h, w = r.shape
    ch, cw = (h + 1) // 2, (w + 1) // 2
    up = np.empty((ch, cw))
    vp = np.empty((ch, cw))
    for arr, src in ((up, u), (vp, v)):
        for rr in range(ch):
            for cc in range(cw):
                blk = src[2 * rr : 2 * rr + 2, 2 * cc : 2 * cc + 2]
                arr[rr, cc] = blk.mean()
    clip = lambda a: np.clip(np.round(a), 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(up), clip(vp)


# ---------------------------------------------------------------------------
# ALPH chunk (WebP container spec): optional lossless alpha plane


def decode_alpha(payload: bytes, width: int, height: int):
    """Decode a WebP ALPH chunk to a uint8 [h, w] alpha plane.

    Header byte: rsrv(2) | preprocessing(2) | filtering(2) |
    compression(2). Compression 0 = raw rows, 1 = a HEADERLESS VP8L
    stream (alpha in the GREEN channel). Filtering 0..3 = none /
    horizontal / vertical / gradient inverse predictors."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
        decode_vp8l_raw,
    )

    if not payload:
        raise ValueError("empty ALPH chunk")
    head = payload[0]
    if head >> 6:
        raise ValueError("reserved ALPH header bits set")
    pre = (head >> 4) & 3
    filt = (head >> 2) & 3
    comp = head & 3
    if comp == 0:
        need = width * height
        body = payload[1 : 1 + need]
        if len(body) < need:
            raise ValueError("torn raw ALPH plane")
        a = np.frombuffer(body, dtype=np.uint8).reshape(height, width).astype(np.int32)
    elif comp == 1:
        argb = decode_vp8l_raw(payload[1:], width, height)
        a = argb[..., 2].astype(np.int32)  # green channel carries alpha
    else:
        raise ValueError(f"reserved ALPH compression method {comp}")
    if filt:
        for r in range(height):
            for c in range(width):
                left = a[r, c - 1] if c else (a[r - 1, 0] if r else 0)
                top = a[r - 1, c] if r else (a[0, c - 1] if c else 0)
                if filt == 1:
                    p = left
                elif filt == 2:
                    p = top
                else:
                    tl = a[r - 1, c - 1] if (r and c) else (left if not r else top)
                    p = left + top - tl
                    p = 0 if p < 0 else (255 if p > 255 else p)
                a[r, c] = (a[r, c] + p) & 0xFF
    if pre == 1:
        # level-reduction preprocessing is a lossy hint applied at
        # ENCODE time; decode is the identity (container spec)
        pass
    return a.astype(np.uint8)


def decode_vp8(data: bytes):
    """Decode a VP8 key-frame chunk payload to (rgb uint8 [h,w,3], w, h).

    Uses the exact fixed-point conversion + fancy upsampling below, so
    output is PIXEL-IDENTICAL to libwebp's WebPDecodeRGB (verified
    bit-for-bit on CPython's python.webp in tests/test_realworld_r11.py
    whenever a system libwebp is present)."""
    y, u, v, w, h = decode_frame(data)
    return yuv_to_rgb_exact(y, u, v, w, h), w, h

# ---------------------------------------------------------------------------
# fixture encoder (spec-literal, key frame only): DC_PRED/TM 16x16 or
# B_PRED macroblocks, default probabilities, one token partition, loop
# filter level 0. Used by tests and the registry oracle; records its
# own reconstruction so decode(encode(x)) can be pinned BIT-EXACTLY.


def _fdct4x4(block):
    """Forward 4x4 DCT (the libvpx/spec companion of idct4x4: the
    inverse below reproduces inputs within quantization error; the
    encoder only needs any self-consistent forward)."""
    tmp = [0] * 16
    for i in range(4):
        ip = block[4 * i : 4 * i + 4]
        a1 = (ip[0] + ip[3]) * 8
        b1 = (ip[1] + ip[2]) * 8
        c1 = (ip[1] - ip[2]) * 8
        d1 = (ip[0] - ip[3]) * 8
        tmp[4 * i] = a1 + b1
        tmp[4 * i + 2] = a1 - b1
        tmp[4 * i + 1] = (c1 * 2217 + d1 * 5352 + 14500) >> 12
        tmp[4 * i + 3] = (d1 * 2217 - c1 * 5352 + 7500) >> 12
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[i + 12]
        b1 = tmp[i + 4] + tmp[i + 8]
        c1 = tmp[i + 4] - tmp[i + 8]
        d1 = tmp[i] - tmp[i + 12]
        out[i] = (a1 + b1 + 7) >> 4
        out[i + 8] = (a1 - b1 + 7) >> 4
        out[i + 4] = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (1 if d1 else 0)
        out[i + 12] = (d1 * 2217 - c1 * 5352 + 51000) >> 16
    return out


def _fwht4x4(block):
    """Forward Walsh-Hadamard (Y2), companion of iwht4x4."""
    tmp = [0] * 16
    for i in range(4):
        ip = block[4 * i : 4 * i + 4]
        a1 = (ip[0] + ip[2]) * 4
        d1 = (ip[1] + ip[3]) * 4
        c1 = (ip[1] - ip[3]) * 4
        b1 = (ip[0] - ip[2]) * 4
        tmp[4 * i] = a1 + d1 + (1 if a1 else 0)
        tmp[4 * i + 1] = b1 + c1
        tmp[4 * i + 2] = b1 - c1
        tmp[4 * i + 3] = a1 - d1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[i] + tmp[i + 8]
        d1 = tmp[i + 4] + tmp[i + 12]
        c1 = tmp[i + 4] - tmp[i + 12]
        b1 = tmp[i] - tmp[i + 8]
        a2 = a1 + d1
        b2 = b1 + c1
        c2 = b1 - c1
        d2 = a1 - d1
        out[i] = (a2 + (1 if a2 < 0 else 0) + 3) >> 3
        out[i + 4] = (b2 + (1 if b2 < 0 else 0) + 3) >> 3
        out[i + 8] = (c2 + (1 if c2 < 0 else 0) + 3) >> 3
        out[i + 12] = (d2 + (1 if d2 < 0 else 0) + 3) >> 3
    return out


def _quantize(coeffs, dq_dc: int, dq_ac: int):
    """Round-to-nearest quantization (encoder freedom; the decoder
    multiplies back by the same factors)."""
    out = [0] * 16
    for i, v in enumerate(coeffs):
        q = dq_dc if i == 0 else dq_ac
        out[i] = (v + (q // 2 if v >= 0 else -(q // 2))) // q if q else 0
    return out


def _encode_coeffs(be: BoolEncoder, probs, plane: int, ctx: int,
                   first_coeff: int, qcoeffs) -> bool:
    """Token-encode one quantized 4x4 block (natural order in), the
    exact mirror of decode_coeffs. Returns any_nonzero."""
    zz = [qcoeffs[ZIGZAG[c]] for c in range(16)]
    last = -1
    for c in range(15, first_coeff - 1, -1):
        if zz[c]:
            last = c
            break
    c = first_coeff
    nonzero = last >= first_coeff
    skip_eob = False
    while c < 16:
        band_probs = probs[plane][COEFF_BANDS[c]][ctx]
        start = 2 if skip_eob else 0
        if c > last:
            be.write_tree(COEFF_TREE, band_probs, DCT_EOB, start=start)
            break
        v = zz[c]
        a = abs(v)
        if a == 0:
            be.write_tree(COEFF_TREE, band_probs, DCT_0, start=start)
            ctx = 0
            skip_eob = True
            c += 1
            continue
        if a <= 4:
            be.write_tree(COEFF_TREE, band_probs, a - 1 + DCT_1, start=start)
        else:
            for cat in range(5, -1, -1):
                lo = CAT_BASE[cat]
                hi = lo + (1 << len(PCAT[cat])) - 1
                if lo <= a <= hi:
                    be.write_tree(COEFF_TREE, band_probs, DCT_CAT1 + cat,
                                  start=start)
                    extra = a - lo
                    for bit_i, p in enumerate(PCAT[cat]):
                        be.write_bool(p, (extra >> (len(PCAT[cat]) - 1 - bit_i)) & 1)
                    break
            else:
                raise ValueError(f"coefficient {a} out of token range")
        be.write_bool(128, 1 if v < 0 else 0)
        ctx = 1 if a == 1 else 2
        skip_eob = False
        c += 1
    return nonzero


def encode_frame(y, u, v, qi: int = 12, use_bpred: bool = False):
    """Encode uint8 YUV planes (dims multiples of 16 / 8) as a VP8 key
    frame; every MB is DC_PRED (16x16, with Y2) — or B_DC_PRED
    subblocks when use_bpred (exercising the no-Y2 plane-3 path).
    Returns (payload bytes, reconstruction (ry, ru, rv) uint8) where
    the reconstruction is EXACTLY what a conformant decoder outputs
    (loop filter level 0)."""
    h, w = y.shape
    if h % 16 or w % 16:
        raise ValueError("fixture encoder wants multiple-of-16 dims")
    mb_w, mb_h = w // 16, h // 16
    hdr = FrameHeader()
    hdr.seg_enabled = 0
    hdr.seg_abs = 0
    hdr.seg_quant = [0] * 4
    hdr.y_ac_qi = qi
    hdr.y_dc_delta = hdr.y2_dc_delta = hdr.y2_ac_delta = 0
    hdr.uv_dc_delta = hdr.uv_ac_delta = 0
    dq = _dequant_factors(hdr, 0)
    probs = DEFAULT_COEFF_PROBS

    # reconstruction planes (padded like the decoder's)
    W, H = mb_w * 16, mb_h * 16
    yp = np.empty((H + 1, W + 5), dtype=np.int32)
    up = np.empty((H // 2 + 1, W // 2 + 5), dtype=np.int32)
    vp = np.empty((H // 2 + 1, W // 2 + 5), dtype=np.int32)
    for pl in (yp, up, vp):
        pl[0, :] = 127
        pl[1:, 0] = 129
        pl[0, 0] = 127

    mode_be = BoolEncoder()
    # frame header fields (mirror parse_frame_header)
    mode_be.write_literal(1, 0)  # color space
    mode_be.write_literal(1, 0)  # clamping
    mode_be.write_literal(1, 0)  # segmentation off
    mode_be.write_literal(1, 0)  # filter type normal
    mode_be.write_literal(6, 0)  # filter level 0 (no loop filter)
    mode_be.write_literal(3, 0)  # sharpness
    mode_be.write_literal(1, 0)  # lf deltas off
    mode_be.write_literal(2, 0)  # one token partition
    mode_be.write_literal(7, qi)
    for _ in range(5):
        mode_be.write_literal(1, 0)  # no quantizer deltas
    mode_be.write_literal(1, 0)  # refresh entropy
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    mode_be.write_bool(COEFF_UPDATE_PROBS[i][j][k][m], 0)
    mode_be.write_literal(1, 0)  # mb_no_skip off (every MB carries tokens)

    tok_be = BoolEncoder()
    anz = [[0] * 9 for _ in range(mb_w)]
    ymode = B_PRED if use_bpred else DC_PRED
    for mb_r in range(mb_h):
        lnz = [0] * 9
        for mb_c in range(mb_w):
            # --- modes (first partition) ---
            mode_be.write_tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if use_bpred:
                # all-B_DC_PRED: context-correct prob tables, constant mode
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    # above/left submodes are B_DC everywhere by construction
                    mode_be.write_tree(BMODE_TREE, KF_BMODE_PROB[B_DC_PRED][B_DC_PRED],
                                       B_DC_PRED)
            mode_be.write_tree(UV_MODE_TREE, KF_UV_MODE_PROB, DC_PRED)
            # --- residuals + reconstruction ---
            y0, x0 = 1 + mb_r * 16, 1 + mb_c * 16
            have_above, have_left = mb_r > 0, mb_c > 0
            a = anz[mb_c]
            if not use_bpred:
                _predict_whole(yp, y0, x0, 16, DC_PRED, have_above, have_left)
                # forward transform all 16 Y blocks; collect DCs for Y2
                qblocks = []
                dcs = []
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    src = y[mb_r * 16 + 4 * r4 : mb_r * 16 + 4 * r4 + 4,
                            mb_c * 16 + 4 * c4 : mb_c * 16 + 4 * c4 + 4]
                    pred = yp[y0 + 4 * r4 : y0 + 4 * r4 + 4,
                              x0 + 4 * c4 : x0 + 4 * c4 + 4]
                    diff = (src.astype(np.int32) - pred).flatten().tolist()
                    f = _fdct4x4(diff)
                    dcs.append(f[0])
                    f[0] = 0
                    qblocks.append(_quantize(f, dq[0], dq[1]))
                y2 = _fwht4x4(dcs)
                qy2 = _quantize(y2, dq[2], dq[3])
                ctx = a[8] + lnz[8]
                nz = _encode_coeffs(tok_be, probs, 1, ctx, 0, qy2)
                a[8] = lnz[8] = int(nz)
                dq_y2 = [qy2[i] * (dq[2] if i == 0 else dq[3]) for i in range(16)]
                recon_dcs = iwht4x4(dq_y2)
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    ctx = a[c4] + lnz[r4]
                    nz = _encode_coeffs(tok_be, probs, 0, ctx, 1, qblocks[i])
                    a[c4] = lnz[r4] = int(nz)
                    dqb = [qblocks[i][j] * (dq[0] if j == 0 else dq[1])
                           for j in range(16)]
                    dqb[0] = recon_dcs[i]
                    res = idct4x4(dqb)
                    sl = yp[y0 + 4 * r4 : y0 + 4 * r4 + 4,
                            x0 + 4 * c4 : x0 + 4 * c4 + 4]
                    np.clip(sl + np.asarray(res, dtype=np.int32), 0, 255, out=sl)
            else:
                L = [[0] * 21 for _ in range(17)]
                for c in range(21):
                    L[0][c] = int(yp[y0 - 1, x0 - 1 + c])
                for r in range(16):
                    L[r + 1][0] = int(yp[y0 + r, x0 - 1])
                for i in range(16):
                    r4, c4 = i >> 2, i & 3
                    pred = _predict_subblock(L, r4, c4, B_DC_PRED)
                    src = y[mb_r * 16 + 4 * r4 : mb_r * 16 + 4 * r4 + 4,
                            mb_c * 16 + 4 * c4 : mb_c * 16 + 4 * c4 + 4]
                    diff = [
                        int(src[r, c]) - pred[r][c]
                        for r in range(4) for c in range(4)
                    ]
                    qb = _quantize(_fdct4x4(diff), dq[0], dq[1])
                    ctx = a[c4] + lnz[r4]
                    nz = _encode_coeffs(tok_be, probs, 3, ctx, 0, qb)
                    a[c4] = lnz[r4] = int(nz)
                    dqb = [qb[j] * (dq[0] if j == 0 else dq[1]) for j in range(16)]
                    res = idct4x4(dqb)
                    for r in range(4):
                        for c in range(4):
                            L[1 + 4 * r4 + r][1 + 4 * c4 + c] = _clip255(
                                pred[r][c] + res[r][c]
                            )
                for r in range(16):
                    for c in range(16):
                        yp[y0 + r, x0 + c] = L[r + 1][c + 1]
            # chroma (DC_PRED both fixtures)
            cy0, cx0 = 1 + mb_r * 8, 1 + mb_c * 8
            for plane, src_pl, half in ((up, u, 0), (vp, v, 1)):
                _predict_whole(plane, cy0, cx0, 8, DC_PRED, have_above, have_left)
                for i in range(4):
                    r4, c4 = i >> 1, i & 1
                    src = src_pl[mb_r * 8 + 4 * r4 : mb_r * 8 + 4 * r4 + 4,
                                 mb_c * 8 + 4 * c4 : mb_c * 8 + 4 * c4 + 4]
                    pred = plane[cy0 + 4 * r4 : cy0 + 4 * r4 + 4,
                                 cx0 + 4 * c4 : cx0 + 4 * c4 + 4]
                    diff = (src.astype(np.int32) - pred).flatten().tolist()
                    qb = _quantize(_fdct4x4(diff), dq[4], dq[5])
                    ai, li = 4 + 2 * half + c4, 4 + 2 * half + r4
                    ctx = a[ai] + lnz[li]
                    nz = _encode_coeffs(tok_be, probs, 2, ctx, 0, qb)
                    a[ai] = lnz[li] = int(nz)
                    dqb = [qb[j] * (dq[4] if j == 0 else dq[5]) for j in range(16)]
                    res = idct4x4(dqb)
                    sl = plane[cy0 + 4 * r4 : cy0 + 4 * r4 + 4,
                               cx0 + 4 * c4 : cx0 + 4 * c4 + 4]
                    np.clip(sl + np.asarray(res, dtype=np.int32), 0, 255, out=sl)
        y0 = 1 + mb_r * 16
        yp[y0 : y0 + 16, W + 1 : W + 5] = yp[y0 : y0 + 16, W].reshape(16, 1)

    part1 = mode_be.flush()
    tokens = tok_be.flush()
    tag = (len(part1) << 5) | (1 << 4) | 0  # key frame, version 0, shown
    head = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    head += b"\x9d\x01\x2a" + struct.pack("<HH", w, h)
    payload = head + part1 + tokens
    ry = yp[1 : 1 + h, 1 : 1 + w].astype(np.uint8)
    ru = up[1 : 1 + h // 2, 1 : 1 + w // 2].astype(np.uint8)
    rv = vp[1 : 1 + h // 2, 1 : 1 + w // 2].astype(np.uint8)
    return payload, (ry, ru, rv)

# ---------------------------------------------------------------------------
# exact fixed-point YUV → RGB with bilinear ("fancy") chroma
# upsampling — the libwebp output convention, so a bit-exact YUV
# decode converts to bit-exact RGBA. Kernel: chroma samples sit at
# half-pel centers of 2x2 luma blocks; each output pixel blends the
# four nearest chroma samples 9:3:3:1. Conversion: BT.601 studio
# swing in 14-bit fixed point with a 6-bit final shift.


def _upsample_fancy(c, height: int, width: int):
    """Bilinear 2x chroma upsample with edge replication (9:3:3:1)."""
    ch, cw = c.shape
    p = np.pad(c.astype(np.int32), 1, mode="edge")
    rows = np.arange(height)
    cols = np.arange(width)
    iy = rows >> 1
    ix = cols >> 1
    oy = np.where(rows & 1, iy + 1, iy - 1)
    ox = np.where(cols & 1, ix + 1, ix - 1)
    iy, oy = iy + 1, np.clip(oy, -1, ch) + 1  # into padded coords
    ix, ox = ix + 1, np.clip(ox, -1, cw) + 1
    near = p[np.ix_(iy, ix)]
    vert = p[np.ix_(oy, ix)]
    horz = p[np.ix_(iy, ox)]
    diag = p[np.ix_(oy, ox)]
    return (9 * near + 3 * vert + 3 * horz + diag + 8) >> 4


def yuv_to_rgb_exact(y, u, v, width: int, height: int):
    """libwebp-exact RGB conversion of a decoded 4:2:0 frame."""
    yy = y.astype(np.int32)
    uu = _upsample_fancy(u, height, width)
    vv = _upsample_fancy(v, height, width)
    mul = lambda a, c: (a * c) >> 8  # noqa: E731
    base = mul(yy, 19077)
    r = base + mul(vv, 26149) - 14234
    g = base - mul(uu, 6419) - mul(vv, 13320) + 8708
    b = base + mul(uu, 33050) - 17685
    out = np.empty((height, width, 3), dtype=np.uint8)
    for i, ch in enumerate((r, g, b)):
        out[..., i] = np.clip(ch >> 6, 0, 255).astype(np.uint8)
    return out
