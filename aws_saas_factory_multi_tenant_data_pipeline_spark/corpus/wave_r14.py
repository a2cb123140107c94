"""Round-12 operator wave (r11 verdict "Next round" #1): the four r11
tests-only §2 rows get oracle-backed corpus queries so the r12 graded
window can give them hard driver verdicts — the extended TIFF decode
surface (LZW/Deflate/tiled/16-bit/planar-2/JPEG-in-TIFF), an ANALYTIC
ADPCM WAV oracle (zero-sum nibble chains whose decode is closed-form
by construction), and an HEVC stream-probe query (SPS geometry + IRAP
census, SQL-stated from the fixture formulas).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "multimodal_tiff_extended",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * ((CASE WHEN doc_id % 7 = 5
                                    THEN 8 + 4 * (doc_id % 4)
                                    ELSE 8 + doc_id % 16 END + 3) // 4))
                    AS BIGINT) AS ahash
        FROM documents WHERE doc_id < 72
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="Extended TIFF decode surface END-TO-END (the [r11] scope "
    "growth — LZW both predictors, Deflate both predictors, tiled "
    "layout with partial edge tiles, 16-bit samples, planar "
    "configuration 2, and new-style JPEG-in-TIFF — every path pinned "
    "against REAL libtiff/libjpeg output in tests/test_lzw_r11.py): "
    "per doc a 32x32 two-tone image (bright split at row 8 + "
    "doc_id % 16; the lossy JPEG variant pins the split to multiples "
    "of 4 so no aHash row straddles the tone boundary) rotates "
    "through all seven paths by doc_id % 7 x byte order x predictor "
    "(the [r12] CCITT G4 bilevel path included), "
    "then decodes through the codec registry to the same "
    "-(2^(8*ceil(split/4))) closed form the baseline TIFF oracle "
    "pins; any LZW timing, predictor, tile-grid, 16-bit scaling, "
    "plane-interleave, or JPEG-splice defect flips the hash "
    "(operators/tiff.py; TIFF 6.0 §13-§15 + TechNote 2).",
)
def multimodal_tiff_extended(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 72).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
            encode_tiff_extended,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                variant = did % 7
                split = 8 + (4 * (did % 4) if variant == 5 else did % 16)
                bo = "<" if did % 2 == 0 else ">"
                pred = 2 if (did // 2) % 2 else 1
                rgb = did % 4 < 2
                if rgb:
                    px = np.full((32, 32, 3), 40, dtype=np.uint8)
                    px[split:] = 200
                else:
                    px = np.full((32, 32), 40, dtype=np.uint8)
                    px[split:] = 200
                if variant == 0:  # LZW strips, both predictors
                    blob = encode_tiff_extended(
                        px, byte_order=bo, compression=5, predictor=pred,
                        rows_per_strip=5 + did % 7,
                    )
                elif variant == 1:  # Deflate strips, both predictors
                    blob = encode_tiff_extended(
                        px, byte_order=bo, compression=8, predictor=pred,
                        rows_per_strip=5 + did % 7,
                    )
                elif variant == 2:  # tiled: none/LZW/Deflate
                    blob = encode_tiff_extended(
                        px, byte_order=bo,
                        compression=(1, 5, 8)[(did // 7) % 3], tiled=True,
                    )
                elif variant == 3:  # 16-bit samples: none/Deflate
                    blob = encode_tiff_extended(
                        px, byte_order=bo,
                        compression=(1, 8)[(did // 7) % 2], bits=16,
                        rows_per_strip=9,
                    )
                elif variant == 4:  # planar configuration 2
                    px3 = px if rgb else np.repeat(px[:, :, None], 3, axis=2)
                    blob = encode_tiff_extended(
                        px3, byte_order=bo,
                        compression=(1, 5, 8)[(did // 7) % 3], planar=2,
                        predictor=pred if (did // 7) % 3 else 1,
                        rows_per_strip=5,
                    )
                elif variant == 5:  # new-style JPEG-in-TIFF
                    px3 = px if rgb else np.repeat(px[:, :, None], 3, axis=2)
                    blob = encode_tiff_extended(
                        px3, byte_order=bo, compression=7,
                        tiled=(did // 7) % 2 == 1, rows_per_strip=16,
                    )
                else:  # [r12] CCITT T.6 + [r13] the full G3 family:
                    # sub-rotate G4 / MH (comp 2) / G3 1-D / G3 mixed
                    # 2-D (comp 3, predictor selects T4Options bit 0) —
                    # same ink, so the closed-form hash is unchanged
                    ink = np.zeros((32, 32), np.uint8)
                    ink[:split] = 1  # black (ink) top -> dark rows
                    ccitt_comp, ccitt_pred = (
                        (4, 1), (2, 1), (3, 1), (3, 2)
                    )[(did // 7) % 4]
                    blob = encode_tiff_extended(
                        ink, byte_order=bo, compression=ccitt_comp,
                        predictor=ccitt_pred,
                    )
                rows.append(
                    {"media_id": did, "kind": "image", "payload": blob,
                     "meta": None}
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_average_hash(media)
        .select(F.col("media_id").alias("doc_id"), "ahash")
        .orderBy("doc_id")
    )


# ---- analytic ADPCM: generated oracle --------------------------------------
#
# Zero-adaptation nibble chains make the decode closed-form BY
# CONSTRUCTION: at IMA step index 0 the step stays 7 for nibbles
# 0-3/8-11 (index adjust -1, clamped), so each nibble moves the
# predictor by exactly {0,+1,+3,+4,0,-1,-3,-4}; with MS coefficient
# pair 0 = (256, 0) and delta 16, nibbles 0-3/13-15 keep delta pinned
# (adapt 230*16>>8 = 14 -> clamped back to 16) and move the predictor
# by signed_nibble*16. The weighted checksum over the decoded stream is
# then a LINEAR function of the stored block-header samples — stated in
# SQL below with per-rotation constants generated here. Any step-table,
# index-table, trunc-division, or block-layout defect flips it.

_IMA_PAT = (1, 9, 2, 10, 3, 11, 0, 8)
_IMA_DIFF = {0: 0, 1: 1, 2: 3, 3: 4, 8: 0, 9: -1, 10: -3, 11: -4}
_MS_PAT = (1, 15, 2, 14, 3, 13, 0, 1, 15, 2, 14, 0)
_MS_SGN = {0: 0, 1: 1, 2: 2, 3: 3, 13: -3, 14: -2, 15: -1}


def _adpcm_arm_constants(arm: int) -> tuple[int, int, int]:
    """(K0, K1, D) for rotation ``arm``: the nibble-dependent parts of
    the weighted checksum (weights are 1-based global sample index)."""
    c = 0
    k0 = k1 = 0
    for j in range(8):
        c += _IMA_DIFF[_IMA_PAT[(j + arm) % 8]]
        k0 += (j + 2) * c  # block 0: global k = j+1, weight k+1
        k1 += (j + 11) * c  # block 1: global k = j+10
    d = 0
    cum = 0
    for j in range(12):
        cum += _MS_SGN[_MS_PAT[(j + arm) % 12]]
        d += (j + 21) * cum  # global k = j+20, weight k+1
    return k0, k1, d


def _adpcm_oracle() -> str:
    arms = [_adpcm_arm_constants(a) for a in range(4)]
    k0 = " ".join(f"WHEN {a} THEN {v[0]}" for a, v in enumerate(arms))
    k1 = " ".join(f"WHEN {a} THEN {v[1]}" for a, v in enumerate(arms))
    d = " ".join(f"WHEN {a} THEN {v[2]}" for a, v in enumerate(arms))
    return f"""
        SELECT doc_id,
               CAST(45 * ((doc_id*131) % 2001 - 1000)
                  + (CASE doc_id % 4 {k0} END)
                  + 126 * ((doc_id*131 + 17) % 2001 - 1000)
                  + (CASE doc_id % 4 {k1} END)
                  + 19 * ((doc_id*29) % 1601 - 800)
                  + 338 * ((doc_id*53) % 1601 - 800)
                  + 16 * (CASE doc_id % 4 {d} END) AS BIGINT) AS checksum,
               CAST(32 AS BIGINT) AS n_samples
        FROM documents WHERE doc_id < 48
        ORDER BY doc_id
    """


@register(
    "audio_adpcm_roundtrip",
    oracle=_adpcm_oracle(),
    tags=("B10", "multimodal", "audio"),
    doc="IMA + MS ADPCM WAV decode END-TO-END with a fully ANALYTIC "
    "oracle (the [r11] codecs — IMA core cross-pinned vs CPython's C "
    "audioop in tests): per doc two mono WAVs (format 0x11 with two "
    "8-nibble blocks at step index 0, format 0x02 with one 12-nibble "
    "block at coefficient pair 0/delta 16) built from zero-adaptation "
    "nibble chains whose decode is closed-form by construction; both "
    "route through parse_wav (real RIFF fmt/data walk) and the "
    "1-based-index weighted checksum of all 32 decoded samples is a "
    "linear function of the stored header samples, stated exactly in "
    "SQL with per-rotation constants. Any IMA step/index table, MS "
    "trunc-division, nibble-order, or block-layout defect flips it "
    "(operators/adpcm.py).",
)
def audio_adpcm_roundtrip(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 48).select("doc_id")

    def op(batches):
        import struct

        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
            parse_wav,
        )

        def wav(fmt_code, ba, bits, body):
            fmt = struct.pack("<HHIIHH", fmt_code, 1, 8000, 8000 * ba, ba, bits)
            fmt += b"\x00\x00"
            out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            out += b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            out += b"data" + struct.pack("<I", len(body)) + body
            return out

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                arm = did % 4
                ima = b""
                for b in range(2):
                    p0 = (did * 131 + b * 17) % 2001 - 1000
                    nibs = [_IMA_PAT[(j + arm) % 8] for j in range(8)]
                    ima += struct.pack("<hBB", p0, 0, 0) + bytes(
                        nibs[i] | (nibs[i + 1] << 4) for i in range(0, 8, 2)
                    )
                s2 = (did * 29) % 1601 - 800
                s1 = (did * 53) % 1601 - 800
                nibs = [_MS_PAT[(j + arm) % 12] for j in range(12)]
                ms = bytes([0]) + struct.pack("<hhh", 16, s1, s2) + bytes(
                    (nibs[i] << 4) | nibs[i + 1] for i in range(0, 12, 2)
                )
                xs = []
                for blob, ba, code in ((ima, 8, 0x11), (ms, 13, 0x02)):
                    x, _sr, _ch = parse_wav(wav(code, ba, 4, blob))
                    xs.append(np.rint(np.asarray(x) * 32768.0).astype(np.int64))
                allx = np.concatenate(xs)
                rows.append(
                    {
                        "doc_id": did,
                        "checksum": int(
                            np.sum((np.arange(len(allx)) + 1) * allx)
                        ),
                        "n_samples": len(allx),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "checksum", "n_samples"])

    return d.mapInPandas(
        op, "doc_id long, checksum long, n_samples long"
    ).orderBy("doc_id")


@register(
    "video_hevc_probe",
    oracle="""
        SELECT doc_id,
               CAST(64 + 16 * (doc_id % 13) - 2 * (doc_id % 2) AS INT)
                   AS width,
               CAST(64 + 16 * ((doc_id * 3) % 11) - 2 * ((doc_id // 2) % 2)
                    AS INT) AS height,
               CAST(8 + 2 * (doc_id % 2) AS INT) AS bit_depth,
               CAST(1 + doc_id % 2 AS INT) AS profile_idc,
               CAST(30 * (1 + doc_id % 5) AS INT) AS level_idc,
               CAST(3 + (1 + doc_id % 2) + (doc_id % 3) + (2 + doc_id % 5)
                    AS INT) AS n_nals,
               CAST((1 + doc_id % 2) + (doc_id % 3) AS INT) AS n_irap,
               CAST(1 + doc_id % 2 AS INT) AS n_idr
        FROM documents WHERE doc_id < 60
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "video", "crawl"),
    doc="HEVC stream probe END-TO-END (the [r11] H.265 container row "
    "— crawls need dimensions/profile/bit-depth and the keyframe map "
    "without a transform decode; the SPS parser is pinned against "
    "REAL x265-generated parameter sets via ctypes in "
    "tests/test_hevc.py): per doc a spec-exact Annex-B stream (VPS + "
    "SPS with conformance-window cropping in chroma units + PPS, "
    "then IDR_W_RADL and CRA IRAP NALs and TRAIL_R slices by "
    "closed-form counts); every third doc additionally routes "
    "through the MP4 path (hvcC box build -> parse_hvcc -> "
    "length-prefixed samples -> hvcc_sample_to_annexb) so the ISO "
    "14496-15 plumbing is graded too. Geometry/profile/level/census "
    "all SQL-stated from the fixture formulas; any Exp-Golomb, "
    "profile-tier-level, crop-arithmetic, NAL-walk, or hvcC defect "
    "flips rows (operators/hevc.py; ITU-T H.265 §7.3).",
)
def video_hevc_probe(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 60).select("doc_id")

    def op(batches):
        import struct

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.h264 import (
            split_annexb_raw,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc import (
            build_hevc_annexb,
            hvcc_sample_to_annexb,
            parse_hvcc,
            probe_hevc_annexb,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n_idr = 1 + did % 2
                n_cra = did % 3
                blob = build_hevc_annexb(
                    64 + 16 * (did % 13),
                    64 + 16 * ((did * 3) % 11),
                    irap_types=[19] * n_idr + [21] * n_cra,
                    n_trail=2 + did % 5,
                    bit_depth=8 + 2 * (did % 2),
                    profile_idc=1 + did % 2,
                    level_idc=30 * (1 + did % 5),
                    crop=(0, did % 2, 0, (did // 2) % 2),
                )
                if did % 3 == 0:
                    # MP4 route: hvcC box for the parameter sets, then
                    # length-prefixed samples back to Annex-B
                    nals = split_annexb_raw(blob)
                    psets = [n for n in nals if (n[0] >> 1) & 0x3F >= 32]
                    box = bytearray(
                        b"\x01" + b"\x00" * 20 + bytes([0xFC | 3, len(psets)])
                    )
                    for u in psets:
                        box += bytes([(u[0] >> 1) & 0x3F])
                        box += struct.pack(">HH", 1, len(u)) + u
                    nls, parsed = parse_hvcc(bytes(box))
                    slices = [n for n in nals if (n[0] >> 1) & 0x3F < 32]
                    sample = b"".join(
                        struct.pack(">I", len(n)) + n
                        for n in parsed + slices
                    )
                    blob = hvcc_sample_to_annexb(sample, nls)
                p = probe_hevc_annexb(blob)
                rows.append(
                    {
                        "doc_id": did,
                        "width": p["width"],
                        "height": p["height"],
                        "bit_depth": p["bit_depth_luma"],
                        "profile_idc": p["profile_idc"],
                        "level_idc": p["level_idc"],
                        "n_nals": p["n_nals"],
                        "n_irap": p["n_irap"],
                        "n_idr": p["n_idr"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "bit_depth",
                         "profile_idc", "level_idc", "n_nals", "n_irap",
                         "n_idr"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, width int, height int, bit_depth int, "
        "profile_idc int, level_idc int, n_nals int, n_irap int, "
        "n_idr int",
    ).orderBy("doc_id")


@register(
    "multimodal_hevc_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * (2 + doc_id % 4)) AS BIGINT) AS ahash,
               CAST(1024 AS BIGINT) AS n_px
        FROM documents WHERE doc_id < 56
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "video"),
    doc="HEVC intra DECODE end-to-end with an ANALYTIC oracle (the "
    "[r12] codec — the last big video boundary: the from-spec H.265 "
    "decoder is pinned BIT-EXACT against the system libde265 on real "
    "x265 streams in tests/test_hevc_decode.py, and the fixture "
    "encoder's output is decoded identically by libde265 and by us): "
    "per doc a 32x32 two-tone luma frame (tones rotate 30+doc_id%21 / "
    "+140, split at row 8 + 4*(doc_id%4)) is encoded by the from-spec "
    "CABAC fixture encoder at QP 18 + doc_id % 14 and decoded back "
    "through the full pipeline — slice parse, CABAC, quadtree, DC "
    "prediction, residual coding, DCT/dequant — then average-hashed; "
    "quantization error never crosses the 70-gray tone gap, so the "
    "hash equals the -(2^(8*split/4)) closed form exactly. Any CABAC "
    "table, context-selection, scan, transform, or prediction defect "
    "flips it (operators/hevc_decode.py, operators/hevc_enc.py; "
    "ITU-T H.265 §7-§9).",
)
def multimodal_hevc_decode(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 56).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
            decode_hevc_intra,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
            encode_hevc_intra,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            _ahash_pixels,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                dark = 30 + did % 21
                split = 8 + 4 * (did % 4)
                y = np.full((32, 32), dark, dtype=np.uint8)
                y[split:] = dark + 140
                u = np.full((16, 16), 128, dtype=np.uint8)
                v = np.full((16, 16), 110 + did % 31, dtype=np.uint8)
                bs = encode_hevc_intra([(y, u, v)], qp=18 + did % 14)
                yd, _ud, _vd = decode_hevc_intra(bs)[0]
                px = np.repeat(yd[:, :, None], 3, axis=2)
                rows.append(
                    {
                        "doc_id": did,
                        "ahash": _ahash_pixels(px, 32, 32),
                        "n_px": int(yd.size),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "ahash", "n_px"])

    return d.mapInPandas(
        op, "doc_id long, ahash long, n_px long"
    ).orderBy("doc_id")


@register(
    "multimodal_pdf_ccitt",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * (2 + doc_id % 5)) AS BIGINT) AS ahash,
               CAST(32 AS INT) AS width,
               CAST(32 AS INT) AS height
        FROM documents WHERE doc_id < 40
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "document", "image"),
    doc="PDF CCITTFaxDecode (Group 4) image extraction END-TO-END "
    "with an ANALYTIC oracle (the [r12] T.6 core, real-libtiff pinned "
    "both directions in tests/test_ccitt.py): per doc a PDF embeds a "
    "32x32 bilevel fax XObject (ink mask: black top 4*(2 + doc_id%5) "
    "rows, /K -1 /Columns /Rows DecodeParms); extract_pdf_images "
    "routes it through the shared MMR decoder (PDF polarity: 0 bits "
    "black when BlackIs1 is false) to a PPM whose aHash is the "
    "-(2^(8*split/4)) closed form. Any T.4 code-table, mode-code, "
    "b1/b2 tracking, or polarity defect flips it (operators/ccitt.py, "
    "operators/pdf.py; ITU-T T.6, ISO 32000-1 §7.4.6).",
)
def multimodal_pdf_ccitt(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 40).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
            build_pdf,
            extract_pdf_images,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 4 * (2 + did % 5)
                ink = np.zeros((32, 32), np.uint8)
                ink[:split] = 1
                blob = build_pdf(
                    [f"fax {did}"], images=[{"rgb": ink, "filter": "g4"}]
                )
                imgs = extract_pdf_images(blob)
                assert imgs and imgs[0]["fmt"] == "ppm", imgs
                rows.append(
                    {"media_id": did, "kind": "image",
                     "payload": imgs[0]["payload"], "meta": None}
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_average_hash(media)
        .select(
            F.col("media_id").alias("doc_id"),
            "ahash",
            F.lit(32).alias("width"),
            F.lit(32).alias("height"),
        )
        .orderBy("doc_id")
    )


@register(
    "audio_ogg_tags",
    oracle="""
        SELECT doc_id,
               (['vorbis', 'opus', 'flac'])[1 + doc_id % 3] AS codec,
               CAST(3 + doc_id % 3 AS INT) AS n_tags,
               concat('track ', CAST(doc_id AS VARCHAR)) AS title,
               CAST(doc_id % 4 = 3 AS BOOLEAN) AS had_geo,
               CAST(1 AS INT) AS n_after_strip,
               concat('track ', CAST(doc_id AS VARCHAR)) AS title_after
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "audio", "privacy"),
    doc="Ogg comment-metadata extraction + privacy strip END-TO-END "
    "(the [r12] ID3-twin for the Ogg family — crawl pipelines need "
    "tag extraction and PII stripping for Vorbis/Opus/FLAC-in-Ogg "
    "without a transform decode, which stays the named boundary): "
    "per doc a Vorbis-comment, OpusTags, or native-FLAC "
    "VORBIS_COMMENT packet (vendor + TAG=value list, "
    "Vorbis framing bit) with rotating tags incl. a GEO_LOCATION PII "
    "tag every third doc; extract_ogg_tags walks real-CRC pages, "
    "strip_ogg_tags rewrites the stream keeping only TITLE (audio "
    "packets verbatim, fresh spec-exact CRCs) and the re-extract "
    "proves the strip. Any lacing-reassembly, little-endian length, "
    "UTF-8, framing-bit, or rewrite-CRC defect flips rows "
    "(operators/ogg.py; Vorbis I §5, RFC 7845 §5.2).",
)
def audio_ogg_tags(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import struct

        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.flac import (
            build_vorbis_comment_body,
            encode_flac,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ogg import (
            _comment_packet,
            build_ogg,
            build_opus_head,
            build_vorbis_id_packet,
            extract_ogg_tags,
            strip_ogg_tags,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                codec = ("vorbis", "opus", "flac")[did % 3]
                tags = [("TITLE", f"track {did}"),
                        ("ARTIST", f"artist {did % 7}")]
                if did % 4 == 3:
                    tags.append(("GEO_LOCATION", f"52.{did},13.{did}"))
                # pad to 3 + did % 3 tags total
                while len(tags) < 3 + did % 3:
                    tags.append((f"X{len(tags)}", "v" * (did % 9)))
                if codec == "flac":
                    # native metadata blocks ride in the header packets
                    flac = encode_flac(
                        np.zeros((480, 1), dtype=np.int64), 48000,
                        blocksize=480,
                    )
                    ident = (b"\x7fFLAC" + bytes([1, 0])
                             + struct.pack(">H", 1) + flac[: 4 + 4 + 34])
                    body = build_vorbis_comment_body(
                        f"vendor-{did % 4}", tags
                    )
                    comment = (bytes([4])
                               + struct.pack(">I", len(body))[1:] + body)
                else:
                    ident = (build_vorbis_id_packet(2, 44100)
                             if codec == "vorbis"
                             else build_opus_head(2, 156, 48000))
                    comment = _comment_packet(
                        codec, f"vendor-{did % 4}", tags
                    )
                blob = build_ogg(
                    [ident, comment, b"pkt" * (40 + did % 50)],
                    serial=did + 7,
                    granules=[0, 0,
                              156 + 48000 if codec == "opus"
                              else 48000 if codec == "flac" else 44100],
                )
                meta = extract_ogg_tags(blob)
                stripped = strip_ogg_tags(blob, keep=("TITLE",))
                meta2 = extract_ogg_tags(stripped)
                tag_d = dict(meta["tags"])
                rows.append(
                    {
                        "doc_id": did,
                        "codec": meta["codec"],
                        "n_tags": len(meta["tags"]),
                        "title": tag_d.get("TITLE"),
                        "had_geo": "GEO_LOCATION" in tag_d,
                        "n_after_strip": len(meta2["tags"]),
                        "title_after": dict(meta2["tags"]).get("TITLE"),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "codec", "n_tags", "title", "had_geo",
                         "n_after_strip", "title_after"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, codec string, n_tags int, title string, "
        "had_geo boolean, n_after_strip int, title_after string",
    ).orderBy("doc_id")
