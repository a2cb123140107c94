"""Round-15 graded-window curation (r14 verdict "Next round" #1/#2):
hard driver verdicts for the round's office flagship, the four r14
tail-debt rows, and the new 7z row — with ZERO families losing
driver coverage.

Two slots are freed by MERGING (the r9-r14 convention):

  media_family_pack + media_family_pack2 → media_family_all (both
      already emit the unified (kind, k, n, val) schema with disjoint
      kinds — exif/id3/zip/wds/mjpeg/mp3/bitext vs gif/ico/phash/
      tone/env/rs_*/qoi/tiff/g711/pq/maxsim/contain/h264 — a pure
      UNION ALL on both sides; all twenty r7-r9 media/similarity §2
      rows keep hard driver verdicts in one slot). The freed slot
      carries `text_office_extract` — the r15 office-document
      flagship (docx/xlsx/pptx/odt with live fixture traps).

  r12_pack + r13_pack → media_codec_pack (disjoint kinds —
      tiffx/adpcm/hevc/hevcd/ogg vs heic/main10/av1 — pure UNION
      ALL; all eight r12/r13 codec rows keep driver verdicts). The
      freed slot carries `multimodal_xmp_family` — the r14 hygiene
      rotation promoted from the tail (r14 verdict watch item #2).

One slot is WIDENED in place:

  text_zstd_decode → text_codec_pack — the five byte-stream-codec
      ingest rows in one slot, each component reduced to the unified
      (kind, k, n, val) schema with every output value riding in the
      k/n channels verbatim (the r12_pack reduction convention):
      zstd (the r14 graded row, verdict preserved), xz + jsonl-shard
      + lz4 (the r14 tail-debt rows promoted), and 7z (the r15 row).

The merged originals and standalone forms move to the tail head,
still oracle-green locally — no SURVEY §2 row downgrades from
driver ✅. Packs reuse the already-oracle-green component queries
verbatim: the Spark side reduces the component spark_fn output; the
oracle wraps the component oracle SQL as a CTE and applies the same
reduction — a pack can only diverge if a component does.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    wave_r15,
    wave_r17,
    wave_r18,
    window_r15,
    window_r16,
    window_r17,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


@register(
    "media_family_all",
    oracle=f"""
        WITH f1 AS ({_oracle("media_family_pack")}),
        f2 AS ({_oracle("media_family_pack2")})
        SELECT kind, k, n, val FROM f1
        UNION ALL SELECT kind, k, n, val FROM f2
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "privacy", "similarity", "dedup", "pack"),
    doc="Media family pack — ALL (r15 merge): media_family_pack "
    "(EXIF/GPS strip, ID3v2 strip, zip/tar ingest, WebDataset "
    "shards, MJPEG frames, MP3 spectral, bitext mining) and "
    "media_family_pack2 (GIF/ICO/QOI/TIFF decode, pHash DCT, "
    "spectral/envelope fingerprints, both resample oracles, G.711, "
    "PQ ANN, MaxSim, containment, H.264 keyframes) in one driver "
    "slot; kinds are disjoint so every output row of both components "
    "rides in the pack hash verbatim — none of the twenty r7-r9 "
    "media/similarity §2 rows loses its driver verdict. The freed "
    "slot carries text_office_extract (the r15 office flagship). "
    "Component spark_fns and oracles reused verbatim.",
)
def media_family_all(spark, sf_dir):
    a = _fn("media_family_pack")(spark, sf_dir)
    b = _fn("media_family_pack2")(spark, sf_dir)
    return a.unionByName(b).orderBy("kind", "k")


@register(
    "media_codec_pack",
    oracle=f"""
        WITH c1 AS ({_oracle("r12_pack")}),
        c2 AS ({_oracle("r13_pack")})
        SELECT kind, k, n, val FROM c1
        UNION ALL SELECT kind, k, n, val FROM c2
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "audio", "video", "image", "pack"),
    doc="Media codec pack (r15 merge) — r12_pack (extended TIFF "
    "surface, ADPCM WAV, HEVC stream probe, Ogg probe, HEVC intra "
    "decode) and r13_pack (HEIC decode, HEVC Main10, AV1/AVIF probe) "
    "in one driver slot; kinds are disjoint so every output row of "
    "both components rides in the pack hash verbatim — none of the "
    "eight r12/r13 codec §2 rows loses its driver verdict. The freed "
    "slot carries multimodal_xmp_family (the r14 hygiene rotation "
    "promoted from the tail). Component spark_fns and oracles reused "
    "verbatim.",
)
def media_codec_pack(spark, sf_dir):
    a = _fn("r12_pack")(spark, sf_dir)
    b = _fn("r13_pack")(spark, sf_dir)
    return a.unionByName(b).orderBy("kind", "k")


@register(
    "text_codec_pack",
    oracle=f"""
        WITH zs AS ({_oracle("text_zstd_decode")}),
        xz AS ({_oracle("text_xz_decode")}),
        js AS ({_oracle("ingest_jsonl_shards")}),
        l4 AS ({_oracle("archive_lz4_roundtrip")}),
        sz AS ({_oracle("archive_7z_extract")}),
        zs_rows AS (
            SELECT 'zstd' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), route, mode,
                             CAST(roundtrip_ok AS VARCHAR)) AS k,
                   n_bytes AS n, 0.0 AS val
            FROM zs),
        xz_rows AS (
            SELECT 'xz' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), route,
                             CAST(preset AS VARCHAR),
                             CAST(roundtrip_ok AS VARCHAR)) AS k,
                   n_bytes AS n, 0.0 AS val
            FROM xz),
        js_rows AS (
            SELECT 'jsonl' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), codec,
                             CAST(shard_id AS VARCHAR),
                             CAST(text_ok AS VARCHAR)) AS k,
                   n_chars AS n, 0.0 AS val
            FROM js),
        l4_rows AS (
            SELECT 'lz4' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(n_members AS VARCHAR), names) AS k,
                   total_bytes AS n, 0.0 AS val
            FROM l4),
        sz_rows AS (
            SELECT 'sevenz' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), codec,
                             CAST(n_members AS VARCHAR), names,
                             CAST(roundtrip_ok AS VARCHAR)) AS k,
                   total_bytes AS n, 0.0 AS val
            FROM sz)
        SELECT kind, k, n, val FROM zs_rows
        UNION ALL SELECT kind, k, n, val FROM xz_rows
        UNION ALL SELECT kind, k, n, val FROM js_rows
        UNION ALL SELECT kind, k, n, val FROM l4_rows
        UNION ALL SELECT kind, k, n, val FROM sz_rows
        ORDER BY kind, k
    """,
    tags=("B10", "text", "crawl", "archives", "pack"),
    doc="Byte-stream codec ingest pack (r15) — one driver slot "
    "carrying the five compressed-corpus ingest rows verbatim: zstd "
    "(RFC 8878 from spec through BOTH production seams — the r14 "
    "graded slot, verdict preserved), xz/LZMA (liblzma-pinned, "
    ".xz + .tar.xz routes), compressed .jsonl shards (5-codec "
    "magic-sniff explode), LZ4-frame tars, and the [r15] .7z "
    "container walk (libarchive-pinned, 5 coder shapes incl. "
    "delta/BCJ bind-pair chains). All-integer/string outputs ride "
    "in the exact k/n channels (the r12_pack reduction). Component "
    "spark_fns and oracles reused verbatim — the pack can only "
    "diverge if a component does. All five decode paths dispatch "
    "through the [r15] injectable stream-codec registry "
    "(operators/codecs.py).",
)
def text_codec_pack(spark, sf_dir):
    zs = _fn("text_zstd_decode")(spark, sf_dir).select(
        F.lit("zstd").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("route"),
            F.col("mode"), F.col("roundtrip_ok").cast("string"),
        ).alias("k"),
        F.col("n_bytes").alias("n"),
        F.lit(0.0).alias("val"),
    )
    xz = _fn("text_xz_decode")(spark, sf_dir).select(
        F.lit("xz").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("route"),
            F.col("preset").cast("string"),
            F.col("roundtrip_ok").cast("string"),
        ).alias("k"),
        F.col("n_bytes").alias("n"),
        F.lit(0.0).alias("val"),
    )
    js = _fn("ingest_jsonl_shards")(spark, sf_dir).select(
        F.lit("jsonl").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("codec"),
            F.col("shard_id").cast("string"),
            F.col("text_ok").cast("string"),
        ).alias("k"),
        F.col("n_chars").alias("n"),
        F.lit(0.0).alias("val"),
    )
    l4 = _fn("archive_lz4_roundtrip")(spark, sf_dir).select(
        F.lit("lz4").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"),
            F.col("n_members").cast("string"), F.col("names"),
        ).alias("k"),
        F.col("total_bytes").alias("n"),
        F.lit(0.0).alias("val"),
    )
    sz = _fn("archive_7z_extract")(spark, sf_dir).select(
        F.lit("sevenz").alias("kind"),
        F.concat_ws(
            ":", F.col("doc_id").cast("string"), F.col("codec"),
            F.col("n_members").cast("string"), F.col("names"),
            F.col("roundtrip_ok").cast("string"),
        ).alias("k"),
        F.col("total_bytes").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return (
        zs.unionByName(xz).unionByName(js).unionByName(l4)
        .unionByName(sz).orderBy("kind", "k")
    )
