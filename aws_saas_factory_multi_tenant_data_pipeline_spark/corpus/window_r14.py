"""Round-11 second graded-window wave: a hard driver slot for the five
round-11 operator rows, with ZERO families losing driver coverage.

One new slot:

  r11_pack — lossy VP8 key-frame decode, PDF embedded-image
             extraction, EPUB ingestion, the five-format raster wave,
             and H.264 CABAC I-slices (5 §2 rows, all landed this
             round with oracles green at three scale factors).

The slot is freed by MERGING (the established convention):
`fn_family_pack2` wraps fn_scalar_pack + fn_web_time_pack verbatim —
the B7 math/array/map/json/null and url/timezone families keep hard
driver verdicts in one slot. Every DOUBLE column of the components
rides in its own (kind, val) row (doubles are never stringified —
engine-identical only through the val channel); every integer/bool/
string column rides stringified in `k`. The merged originals move to
the tail head, still oracle-green locally.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    wave_r13,
    window_r4,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


#: fn_scalar_pack's double columns — one (kind, val) row each
_FS_DOUBLES = ("adiff", "price_k", "ln_price", "sqrt_qty", "disc_sign", "nan_handled")
#: its integer/bool/string columns — stringified into one row's k
_FS_KEYS = ("qfloor", "qceil7", "key_mod7", "seq_n", "seq_has3", "seq_x10",
            "seq_even", "seq_sum", "mks", "mvs", "m_ln", "j_flag", "j_n",
            "flag_is_n", "flag_nvl")
#: fn_web_time_pack's columns (all string/int)
_WT_KEYS = ("proto", "host", "path", "query", "type_param", "encoded",
            "decoded", "ist", "pdt", "roundtrip", "pdt_hour")


def _sql_str(col: str) -> str:
    return (
        f"CAST(CAST({col} AS INT) AS VARCHAR)"
        if col in ("seq_has3", "flag_is_n")
        else f"COALESCE(CAST({col} AS VARCHAR), chr(1))"
    )


@register(
    "fn_family_pack2",
    oracle=f"""
        WITH fs AS ({_oracle("fn_scalar_pack")}),
        wt AS ({_oracle("fn_web_time_pack")}),
        fs_key AS (
            SELECT 'fs' AS kind,
                   concat_ws(':', CAST(l_orderkey AS VARCHAR),
                             CAST(l_linenumber AS VARCHAR),
                             {", ".join(_sql_str(c) for c in _FS_KEYS)}) AS k,
                   CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS n,
                   0.0 AS val
            FROM fs),
        {", ".join(
            f'''fs_{c} AS (
            SELECT 'fs:{c}' AS kind,
                   concat_ws(':', CAST(l_orderkey AS VARCHAR),
                             CAST(l_linenumber AS VARCHAR)) AS k,
                   CAST(0 AS BIGINT) AS n, CAST({c} AS DOUBLE) AS val
            FROM fs)''' for c in _FS_DOUBLES
        )},
        wt_rows AS (
            SELECT 'wt' AS kind,
                   concat_ws(':', CAST(event_id AS VARCHAR),
                             {", ".join(_sql_str(c) for c in _WT_KEYS)}) AS k,
                   CAST(event_id AS BIGINT) AS n, 0.0 AS val
            FROM wt)
        SELECT kind, k, n, val FROM fs_key
        {" ".join(f"UNION ALL SELECT kind, k, n, val FROM fs_{c}" for c in _FS_DOUBLES)}
        UNION ALL SELECT kind, k, n, val FROM wt_rows
        ORDER BY kind, k
    """,
    tags=("B7", "pack"),
    doc="B7 scalar-function family pack 2 — fn_scalar_pack (math/"
    "bitwise, array + higher-order, map, json/variant, null/misc "
    "branches) and fn_web_time_pack (url parsing + timezone "
    "conversion) merged into one driver slot; every output column of "
    "both components rides in the pack hash verbatim (doubles each in "
    "their own val-channel row — never stringified), so no B7 family "
    "loses its driver verdict. Component spark_fns and oracles reused "
    "verbatim — the pack can only diverge if a component does.",
)
def fn_family_pack2(spark, sf_dir):
    fs = _fn("fn_scalar_pack")(spark, sf_dir)
    sent = F.lit("\x01")

    def s(col):
        if col in ("seq_has3", "flag_is_n"):
            return F.col(col).cast("int").cast("string")
        return F.coalesce(F.col(col).cast("string"), sent)

    key2 = [F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")]
    parts = [
        fs.select(
            F.lit("fs").alias("kind"),
            F.concat_ws(":", *key2, *[s(c) for c in _FS_KEYS]).alias("k"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
            .cast("long")
            .alias("n"),
            F.lit(0.0).alias("val"),
        )
    ]
    for c in _FS_DOUBLES:
        parts.append(
            fs.select(
                F.lit(f"fs:{c}").alias("kind"),
                F.concat_ws(":", *key2).alias("k"),
                F.lit(0).cast("long").alias("n"),
                F.col(c).cast("double").alias("val"),
            )
        )
    wt = _fn("fn_web_time_pack")(spark, sf_dir)
    parts.append(
        wt.select(
            F.lit("wt").alias("kind"),
            F.concat_ws(
                ":",
                F.col("event_id").cast("string"),
                *[
                    F.coalesce(F.col(c).cast("string"), sent)
                    for c in _WT_KEYS
                ],
            ).alias("k"),
            F.col("event_id").cast("long").alias("n"),
            F.lit(0.0).alias("val"),
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("kind", "k")


@register(
    "r11_pack",
    oracle=f"""
        WITH vp8 AS ({_oracle("multimodal_vp8_decode")}),
        pdfi AS ({_oracle("multimodal_pdf_images")}),
        ep AS ({_oracle("text_epub_extract")}),
        ras AS ({_oracle("multimodal_raster_formats")}),
        cab AS ({_oracle("multimodal_h264_cabac")}),
        vp8_rows AS (
            SELECT 'vp8' AS kind, CAST(doc_id AS VARCHAR) AS k,
                   CAST(ahash AS BIGINT) AS n, 0.0 AS val
            FROM vp8),
        pdf_rows AS (
            SELECT 'pdf' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(img_idx AS VARCHAR), fmt) AS k,
                   CAST(ahash AS BIGINT) AS n, 0.0 AS val
            FROM pdfi),
        ep_rows AS (
            SELECT 'epub' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(ch_order AS VARCHAR), href, title,
                             language, text_md5) AS k,
                   CAST(0 AS BIGINT) AS n, 0.0 AS val
            FROM ep),
        ras_rows AS (
            SELECT 'ras' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR), fmt) AS k,
                   CAST(ahash AS BIGINT) AS n, 0.0 AS val
            FROM ras),
        cab_rows AS (
            SELECT 'cabac' AS kind,
                   concat_ws(':', CAST(doc_id AS VARCHAR),
                             CAST(mb_w AS VARCHAR), CAST(mb_h AS VARCHAR),
                             CAST(CAST(twin_match AS INT) AS VARCHAR),
                             CAST(CAST(uniform_is_128 AS INT) AS VARCHAR)) AS k,
                   CAST(n_px AS BIGINT) AS n, 0.0 AS val
            FROM cab)
        SELECT kind, k, n, val FROM vp8_rows
        UNION ALL SELECT kind, k, n, val FROM pdf_rows
        UNION ALL SELECT kind, k, n, val FROM ep_rows
        UNION ALL SELECT kind, k, n, val FROM ras_rows
        UNION ALL SELECT kind, k, n, val FROM cab_rows
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "text", "crawl", "video", "pack"),
    doc="Round-11 operator pack — one driver slot hard-grading the "
    "five §2 rows added this round: lossy VP8 key-frame decode (RFC "
    "6386, bit-exact vs libwebp on the real python.webp), PDF "
    "embedded-image extraction (DCTDecode passthrough + FlateDecode/"
    "predictor re-wrap), EPUB ingestion (OCF/OPF spine walk through "
    "the crawl html_to_text chain), the five-format raster wave (Sun "
    "Raster/SGI/OpenEXR/PNM/XBM, every one real-file-pinned), and "
    "H.264 CABAC I-slices (twin-match vs CAVLC per doc). Component "
    "spark_fns and oracles reused verbatim — the pack can only "
    "diverge if a component does.",
)
def r11_pack(spark, sf_dir):
    vp8 = _fn("multimodal_vp8_decode")(spark, sf_dir).select(
        F.lit("vp8").alias("kind"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("ahash").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    pdfi = _fn("multimodal_pdf_images")(spark, sf_dir).select(
        F.lit("pdf").alias("kind"),
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("img_idx").cast("string"),
            F.col("fmt"),
        ).alias("k"),
        F.col("ahash").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    ep = _fn("text_epub_extract")(spark, sf_dir).select(
        F.lit("epub").alias("kind"),
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("ch_order").cast("string"),
            F.col("href"),
            F.col("title"),
            F.col("language"),
            F.col("text_md5"),
        ).alias("k"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    ras = _fn("multimodal_raster_formats")(spark, sf_dir).select(
        F.lit("ras").alias("kind"),
        F.concat_ws(":", F.col("doc_id").cast("string"), F.col("fmt")).alias("k"),
        F.col("ahash").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    cab = _fn("multimodal_h264_cabac")(spark, sf_dir).select(
        F.lit("cabac").alias("kind"),
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("mb_w").cast("string"),
            F.col("mb_h").cast("string"),
            F.col("twin_match").cast("int").cast("string"),
            F.col("uniform_is_128").cast("int").cast("string"),
        ).alias("k"),
        F.col("n_px").cast("long").alias("n"),
        F.lit(0.0).alias("val"),
    )
    return (
        vp8.unionByName(pdfi)
        .unionByName(ep)
        .unionByName(ras)
        .unionByName(cab)
        .orderBy("kind", "k")
    )
