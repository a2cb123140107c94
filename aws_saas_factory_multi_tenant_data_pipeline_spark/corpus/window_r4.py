"""Round-4 graded-window packs.

The driver grades a 50-slot prefix of the registry; round 2 left 26 of
the 31 B10 (LLM-pipeline) SURVEY §2 rows without a driver verdict, and
B7's url/timezone rows, B8's watermark row, and several Tier-A rows sat
at #51+. These queries pack whole families into single oracle-checked
slots (the window50.py pattern) so the 50-slot window can cover them:

  llm_hygiene_pack       — PII redaction + Gopher rules + language ID +
                           repetition score + quality features (5 B10 rows)
  llm_sampling_pack      — quota sample + domain-mix resample +
                           shuffle-shard (3 B10 rows)
  llm_pipeline_pack      — exact + 8-gram decontamination + train/val/
                           test split + sequence packing (4 B10 rows)
  llm_text_pack          — fingerprinting + BPE-ish token count +
                           quality filter + model-based score (4 B10 rows)
  fn_web_time_pack       — B7 url family + timezone family
  fn_scalar_pack         — B7 math + array + map + json + null families
                           in one projection
  exprs_casts_pack       — B2 conditional expressions + casts
  agg_having_filter_pack — B4 HAVING + FILTER-clause aggregates
  stream_late_drop       — B8 watermark late-data drop rule as a
                           deterministic batch twin (stream parity is
                           pinned against this same rule in
                           tests/test_streaming.py)

Packs reuse the already-oracle-green component queries where possible:
the Spark side joins/unions the component DataFrames, and the oracle is
composed from the component oracle SQL as subqueries — so a pack can
only diverge if a component does.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    ext_llm,
    ext_llm_wave2,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import dsum, sql_dsum


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


# ---------------------------------------------------------------------------
# B10 packs
# ---------------------------------------------------------------------------

@register(
    "llm_hygiene_pack",
    oracle=f"""
        SELECT p.doc_id,
               p.n_email, p.n_phone, p.n_ipv4, p.redacted_md5,
               g.rule_word_count, g.rule_mean_word_len, g.rule_alpha_ratio,
               g.rule_stopwords, g.rule_symbol_ratio, g.gopher_keep,
               l.pred_lang,
               r.n_shingles, r.n_distinct, r.rep_ratio,
               q.punct_ratio, q.stopword_ratio, q.mean_word_len
        FROM ({_oracle("text_pii_redact")}) p
        JOIN ({_oracle("text_gopher_rules")}) g USING (doc_id)
        JOIN ({_oracle("text_language_id")}) l USING (doc_id)
        JOIN ({_oracle("text_repetition_score")}) r USING (doc_id)
        JOIN ({_oracle("text_quality")}) q USING (doc_id)
        ORDER BY p.doc_id
    """,
    tags=("B10",),
    doc="Corpus-hygiene pack: PII detection/redaction + Gopher rule "
    "cascade + stopword language ID + repetition score + quality features "
    "joined per doc — one driver slot covers five B10 §2 rows. Each "
    "component is a narrow no-shuffle projection; the join is on the doc "
    "key, so at 100 TB this is one pass over documents with co-located "
    "column derivations (in production you'd compute all five in a single "
    "projection; the join here preserves component-level isolation).",
)
def llm_hygiene_pack(spark, sf_dir):
    pii = _fn("text_pii_redact")(spark, sf_dir)
    gop = _fn("text_gopher_rules")(spark, sf_dir)
    lang = _fn("text_language_id")(spark, sf_dir).select("doc_id", "pred_lang")
    rep = _fn("text_repetition_score")(spark, sf_dir)
    qual = _fn("text_quality")(spark, sf_dir)
    return (
        pii.join(gop, "doc_id")
        .join(lang, "doc_id")
        .join(rep, "doc_id")
        .join(qual, "doc_id")
        .orderBy("doc_id")
    )


@register(
    "llm_sampling_pack",
    oracle=f"""
        SELECT * FROM (
        SELECT 'quota' AS family, source AS s1,
               CAST(doc_id AS BIGINT) AS i1, CAST(sample_rank AS BIGINT) AS i2,
               CAST(NULL AS BIGINT) AS i3, CAST(NULL AS BIGINT) AS i4
        FROM ({_oracle("llm_source_quota_sample")})
        UNION ALL
        SELECT 'mix', source, CAST(group_total AS BIGINT), CAST(rate_bp AS BIGINT),
               CAST(n_kept AS BIGINT), CAST(NULL AS BIGINT)
        FROM ({_oracle("llm_domain_mix_resample")})
        UNION ALL
        SELECT 'shard', CAST(NULL AS VARCHAR), CAST(shard AS BIGINT),
               CAST(n_docs AS BIGINT), CAST(total_chars AS BIGINT),
               CAST(lead_doc AS BIGINT)
        FROM ({_oracle("llm_shuffle_shard")})
        ) ORDER BY family, COALESCE(s1, ''), i1
    """,
    tags=("B10",),
    doc="Reproducible-sampling pack: per-source quota sample + domain-mix "
    "resample + global shuffle-shard as labeled union branches — one "
    "driver slot covers three B10 §2 rows. All three are hash-bucket "
    "deterministic (content-stable across engines and partitioning).",
)
def llm_sampling_pack(spark, sf_dir):
    null_l = F.lit(None).cast("long")
    quota = _fn("llm_source_quota_sample")(spark, sf_dir).select(
        F.lit("quota").alias("family"),
        F.col("source").alias("s1"),
        F.col("doc_id").cast("long").alias("i1"),
        F.col("sample_rank").cast("long").alias("i2"),
        null_l.alias("i3"),
        null_l.alias("i4"),
    )
    mix = _fn("llm_domain_mix_resample")(spark, sf_dir).select(
        F.lit("mix").alias("family"),
        F.col("source").alias("s1"),
        F.col("group_total").cast("long").alias("i1"),
        F.col("rate_bp").cast("long").alias("i2"),
        F.col("n_kept").cast("long").alias("i3"),
        null_l.alias("i4"),
    )
    shard = _fn("llm_shuffle_shard")(spark, sf_dir).select(
        F.lit("shard").alias("family"),
        F.lit(None).cast("string").alias("s1"),
        F.col("shard").cast("long").alias("i1"),
        F.col("n_docs").cast("long").alias("i2"),
        F.col("total_chars").cast("long").alias("i3"),
        F.col("lead_doc").cast("long").alias("i4"),
    )
    return (
        quota.unionByName(mix)
        .unionByName(shard)
        .orderBy("family", F.coalesce("s1", F.lit("")), "i1")
    )


@register(
    "llm_pipeline_pack",
    oracle=f"""
        SELECT * FROM (
        SELECT 'exact' AS family, CAST(NULL AS VARCHAR) AS s1, CAST(NULL AS VARCHAR) AS s2,
               CAST(contaminated_eval_doc AS BIGINT) AS i1,
               CAST(NULL AS BIGINT) AS i2, CAST(NULL AS BIGINT) AS i3
        FROM ({_oracle("llm_decontaminate")})
        UNION ALL
        SELECT 'ngram', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
               CAST(eval_id AS BIGINT), CAST(n_shared_grams AS BIGINT),
               CAST(n_train_docs AS BIGINT)
        FROM ({_oracle("llm_ngram_decontaminate")})
        UNION ALL
        SELECT 'split', source, split, CAST(n AS BIGINT),
               CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM ({_oracle("llm_train_val_split")})
        UNION ALL
        SELECT 'pack', source, CAST(NULL AS VARCHAR), CAST(seq_bin AS BIGINT),
               CAST(n_docs AS BIGINT), CAST(bin_tokens AS BIGINT)
        FROM ({_oracle("llm_sequence_pack")})
        ) ORDER BY family, COALESCE(s1, ''), COALESCE(s2, ''), i1
    """,
    tags=("B10",),
    doc="Training-pipeline pack: exact-hash + 8-gram eval decontamination "
    "+ deterministic train/val/test split + next-fit sequence packing as "
    "labeled union branches — one driver slot covers four B10 §2 rows.",
)
def llm_pipeline_pack(spark, sf_dir):
    null_l = F.lit(None).cast("long")
    null_s = F.lit(None).cast("string")
    exact = _fn("llm_decontaminate")(spark, sf_dir).select(
        F.lit("exact").alias("family"),
        null_s.alias("s1"),
        null_s.alias("s2"),
        F.col("contaminated_eval_doc").cast("long").alias("i1"),
        null_l.alias("i2"),
        null_l.alias("i3"),
    )
    ngram = _fn("llm_ngram_decontaminate")(spark, sf_dir).select(
        F.lit("ngram").alias("family"),
        null_s.alias("s1"),
        null_s.alias("s2"),
        F.col("eval_id").cast("long").alias("i1"),
        F.col("n_shared_grams").cast("long").alias("i2"),
        F.col("n_train_docs").cast("long").alias("i3"),
    )
    split = _fn("llm_train_val_split")(spark, sf_dir).select(
        F.lit("split").alias("family"),
        F.col("source").alias("s1"),
        F.col("split").alias("s2"),
        F.col("n").cast("long").alias("i1"),
        null_l.alias("i2"),
        null_l.alias("i3"),
    )
    pack = _fn("llm_sequence_pack")(spark, sf_dir).select(
        F.lit("pack").alias("family"),
        F.col("source").alias("s1"),
        null_s.alias("s2"),
        F.col("seq_bin").cast("long").alias("i1"),
        F.col("n_docs").cast("long").alias("i2"),
        F.col("bin_tokens").cast("long").alias("i3"),
    )
    return (
        exact.unionByName(ngram)
        .unionByName(split)
        .unionByName(pack)
        .orderBy("family", F.coalesce("s1", F.lit("")), F.coalesce("s2", F.lit("")), "i1")
    )


@register(
    "llm_text_pack",
    oracle=f"""
        SELECT f.doc_id, f.fingerprint, f.norm_fingerprint,
               b.n_pieces,
               k.keep,
               m.quality_score, m.quality_keep
        FROM ({_oracle("text_fingerprint")}) f
        JOIN ({_oracle("text_token_count_bpe")}) b USING (doc_id)
        JOIN ({_oracle("text_quality_filter")}) k USING (doc_id)
        JOIN ({_oracle("text_quality_model_score")}) m USING (doc_id)
        ORDER BY f.doc_id
    """,
    tags=("B10",),
    doc="Text-analysis pack: winnowing fingerprints + BPE-ish token "
    "counting + composite quality filter + model-based quality score "
    "joined per doc — one driver slot covers four B10 §2 rows.",
)
def llm_text_pack(spark, sf_dir):
    fp = _fn("text_fingerprint")(spark, sf_dir)
    bpe = _fn("text_token_count_bpe")(spark, sf_dir)
    filt = _fn("text_quality_filter")(spark, sf_dir)
    model = _fn("text_quality_model_score")(spark, sf_dir)
    return (
        fp.join(bpe, "doc_id")
        .join(filt, "doc_id")
        .join(model, "doc_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# B7 packs
# ---------------------------------------------------------------------------

@register(
    "fn_web_time_pack",
    oracle=f"""
        SELECT u.event_id,
               u.proto, u.host, u.path, u.query, u.type_param, u.encoded, u.decoded,
               z.ist, z.pdt, z.roundtrip, z.pdt_hour
        FROM ({_oracle("fn_url_family")}) u
        JOIN ({_oracle("fn_timezone")}) z USING (event_id)
        ORDER BY u.event_id
    """,
    tags=("B7",),
    doc="B7 url + timezone families in one slot: parse_url protocol/host/"
    "path/query/parameter + url_encode/url_decode joined with "
    "from_utc_timestamp/to_utc_timestamp conversions per event.",
)
def fn_web_time_pack(spark, sf_dir):
    url = _fn("fn_url_family")(spark, sf_dir)
    tz = _fn("fn_timezone")(spark, sf_dir)
    return url.join(tz, "event_id").orderBy("event_id")


@register(
    "fn_scalar_pack",
    oracle="""
        WITH base AS (
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag,
                   generate_series(1, (l_linenumber % 4) + 1) AS seq,
                   '{"f":"' || l_returnflag || '","n":' || CAST(l_linenumber AS VARCHAR) || '}' AS j
            FROM lineitem WHERE l_orderkey <= 300)
        SELECT l_orderkey, l_linenumber,
               CAST(abs(l_discount - 0.05) AS DOUBLE) AS adiff,
               CAST(round(l_extendedprice / 1000, 2) AS DOUBLE) AS price_k,
               CAST(floor(l_quantity) AS BIGINT) AS qfloor,
               CAST(ceil(l_quantity / 7) AS BIGINT) AS qceil7,
               CAST(round(ln(l_extendedprice), 6) AS DOUBLE) AS ln_price,
               CAST(round(sqrt(l_quantity), 6) AS DOUBLE) AS sqrt_qty,
               ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS key_mod7,
               CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
               len(seq) AS seq_n,
               list_contains(seq, 3) AS seq_has3,
               to_json(list_transform(seq, x -> x * 10)) AS seq_x10,
               to_json(list_filter(seq, x -> x % 2 = 0)) AS seq_even,
               CAST(list_sum(seq) AS BIGINT) AS seq_sum,
               to_json(map_keys(map(['ok','ln'],
                   [CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT)]))) AS mks,
               to_json(map_values(map(['ok','ln'],
                   [CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT)]))) AS mvs,
               map(['ok','ln'], [CAST(l_orderkey AS BIGINT),
                   CAST(l_linenumber AS BIGINT)])['ln'][1] AS m_ln,
               json_extract_string(j, '$.f') AS j_flag,
               CAST(json_extract(j, '$.n') AS BIGINT) AS j_n,
               (NULLIF(l_returnflag, 'N') IS NULL) AS flag_is_n,
               COALESCE(NULLIF(l_returnflag, 'N'), 'X') AS flag_nvl,
               -1.0 AS nan_handled
        FROM base
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("B7",),
    doc="B7 math + array + map + json + null families in one lineitem "
    "projection (the per-family originals remain in the registry tail): "
    "abs/round/floor/ceil/ln/sqrt/pmod/sign; size/contains/transform/"
    "filter/aggregate over a derived sequence; map create/keys/values/"
    "element_at; get_json_object/from_json over derived JSON; nullif/"
    "isnull/coalesce/nanvl. Pure codegen projection — scan-speed at any "
    "scale.",
)
def fn_scalar_pack(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    seq = F.sequence(F.lit(1), F.pmod(F.col("l_linenumber"), F.lit(4)) + 1)
    mp = F.map_from_arrays(
        F.array(F.lit("ok"), F.lit("ln")),
        F.array(F.col("l_orderkey").cast("long"), F.col("l_linenumber").cast("long")),
    )
    j = F.concat(
        F.lit('{"f":"'),
        F.col("l_returnflag"),
        F.lit('","n":'),
        F.col("l_linenumber").cast("string"),
        F.lit("}"),
    )
    base = li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag", seq.alias("seq"), mp.alias("mp"), j.alias("j"),
    )
    return base.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).cast("double").alias("adiff"),
        F.round(F.col("l_extendedprice") / 1000, 2).cast("double").alias("price_k"),
        F.floor("l_quantity").cast("long").alias("qfloor"),
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("qceil7"),
        F.round(F.log(F.col("l_extendedprice")), 6).cast("double").alias("ln_price"),
        F.round(F.sqrt("l_quantity"), 6).cast("double").alias("sqrt_qty"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.size("seq").alias("seq_n"),
        F.array_contains("seq", 3).alias("seq_has3"),
        F.to_json(F.transform("seq", lambda x: x * 10)).alias("seq_x10"),
        F.to_json(F.filter("seq", lambda x: x % 2 == 0)).alias("seq_even"),
        F.aggregate("seq", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("seq_sum"),
        F.to_json(F.map_keys("mp")).alias("mks"),
        F.to_json(F.map_values("mp")).alias("mvs"),
        F.element_at(F.col("mp"), F.lit("ln")).alias("m_ln"),
        F.get_json_object("j", "$.f").alias("j_flag"),
        F.from_json("j", T.StructType([T.StructField("n", T.LongType())]))["n"].alias("j_n"),
        F.isnull(F.nullif(F.col("l_returnflag"), F.lit("N"))).alias("flag_is_n"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("X")).alias("flag_nvl"),
        F.nanvl(F.lit(float("nan")).cast("double"), F.lit(-1.0)).alias("nan_handled"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# B2 / B4 packs
# ---------------------------------------------------------------------------

@register(
    "exprs_casts_pack",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 1000 THEN 'small'
                    WHEN o_totalprice < 100000 THEN 'mid'
                    ELSE 'large' END AS price_band,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_adj,
               CAST(GREATEST(CAST(o_totalprice AS DECIMAL(18,2)),
                             CAST(50000 AS DECIMAL(18,2))) AS DOUBLE) AS price_floor50k,
               LEAST(CAST(o_custkey AS BIGINT), 100) AS cust_cap,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
               CAST(o_orderkey AS DOUBLE) AS key_dbl,
               CAST(o_orderdate AS DATE) AS od_date,
               STRFTIME(o_orderdate, '%Y-%m-%d') AS od_str,
               CAST(SUBSTR(STRFTIME(o_orderdate, '%Y-%m-%d'), 1, 4) AS INTEGER) AS od_year
        FROM orders
        ORDER BY o_orderkey
    """,
    tags=("B2",),
    doc="B2 conditional expressions + casts in one orders projection: "
    "CASE WHEN / nullif / coalesce / greatest / least plus casts across "
    "decimal/double/string/date (the per-family originals remain in the "
    "registry tail).",
)
def exprs_casts_pack(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 100000, "mid")
        .otherwise("large")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_adj"
        ),
        F.greatest(
            F.col("o_totalprice").cast("decimal(18,2)"), F.lit(50000).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("price_floor50k"),
        F.least(F.col("o_custkey").cast("long"), F.lit(100)).alias("cust_cap"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderdate").cast("date").alias("od_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od_str"),
        F.substring(F.date_format("o_orderdate", "yyyy-MM-dd"), 1, 4)
        .cast("int")
        .alias("od_year"),
    ).orderBy("o_orderkey")


@register(
    "agg_having_filter_pack",
    oracle=f"""
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS spend,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               {sql_dsum("CASE WHEN o_orderpriority LIKE '1-%' THEN o_totalprice ELSE 0 END")} AS urgent_spend
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 8
        ORDER BY o_custkey
    """,
    tags=("B4",),
    doc="B4 HAVING + FILTER-clause aggregates in one orders groupBy (the "
    "per-family originals remain in the registry tail): conditional "
    "aggregates partial-merge map-side like plain sums; HAVING is a "
    "post-aggregation filter on the reduced result.",
)
def agg_having_filter_pack(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("spend"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            dsum(
                F.when(F.col("o_orderpriority").like("1-%"), F.col("o_totalprice")).otherwise(
                    F.lit(0)
                )
            ).alias("urgent_spend"),
        )
        .where(F.col("n_orders") >= 8)
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# B8: watermark late-data drop (batch twin)
# ---------------------------------------------------------------------------

@register(
    "stream_late_drop",
    oracle=f"""
        WITH base AS (
            SELECT event_id, event_type, value,
                   CAST(FLOOR(event_id / 2000) AS BIGINT) AS batch,
                   CASE WHEN event_id % 37 = 0 THEN ts - INTERVAL 45 MINUTE
                        ELSE ts END AS event_time
            FROM events),
        bmax AS (SELECT batch, MAX(event_time) AS bmax FROM base GROUP BY batch),
        wm AS (
            SELECT batch,
                   MAX(bmax) OVER (ORDER BY batch
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
                       - INTERVAL 10 MINUTE AS filter_wm
            FROM bmax),
        fin AS (SELECT MAX(bmax) - INTERVAL 10 MINUTE AS final_wm FROM bmax),
        kept AS (
            SELECT b.event_type, b.value,
                   CAST(FLOOR(epoch(b.event_time) / 900) * 900 AS BIGINT) AS win_start
            FROM base b JOIN wm USING (batch)
            WHERE wm.filter_wm IS NULL
               OR CAST(FLOOR(epoch(b.event_time) / 900) * 900 AS BIGINT) + 900
                      > epoch(wm.filter_wm)),
        agg AS (
            SELECT event_type, win_start,
                   COUNT(*) AS n,
                   {sql_dsum('value')} AS sum_value
            FROM kept GROUP BY 1, 2)
        SELECT event_type, win_start, n, sum_value
        FROM agg CROSS JOIN fin
        WHERE win_start + 900 <= epoch(final_wm)
        ORDER BY event_type, win_start
    """,
    tags=("B8",),
    doc="Watermark late-data drop rule as a deterministic batch twin "
    "(SURVEY §2 B8's last ◐ row): events are assigned to micro-batches by "
    "arrival order (event_id ranges), every 37th event arrives 45 min "
    "late. Spark's real two-watermark semantics (SPARK-24634): the "
    "late-input filter for batch k uses the PREVIOUS trigger's watermark "
    "(max event time over batches ≤ k-2, minus the 10-min delay) against "
    "the row's WINDOW END, while eviction uses the current watermark — so "
    "a row is dropped iff its 15-min window closed under the lagged "
    "watermark, and windows are emitted only once the final watermark "
    "passes their end. tests/test_streaming.py::"
    "test_late_drop_stream_matches_twin pins a real watermarked append-"
    "mode stream against this same rule (verified empirically: per-batch "
    "progress watermarks + output match it exactly). Plan: two tiny "
    "batch-level aggs broadcast into a narrow filter + one keyed agg.",
)
def stream_late_drop(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        "event_type",
        "value",
        F.floor(F.col("event_id") / 2000).cast("long").alias("batch"),
        F.when(
            F.pmod("event_id", F.lit(37)) == 0,
            F.col("ts") - F.expr("INTERVAL 45 MINUTES"),
        )
        .otherwise(F.col("ts"))
        .alias("event_time"),
    )
    bmax = base.groupBy("batch").agg(F.max("event_time").alias("bmax"))
    # batch-count rows only (≤ |events|/2000): a single-partition window is
    # fine. The -2 lag IS the semantics: the late filter uses the previous
    # trigger's watermark (computed from batches ≤ k-2), not the current one.
    prior2 = W.orderBy("batch").rowsBetween(W.unboundedPreceding, -2)
    wm = bmax.select(
        "batch",
        (F.max("bmax").over(prior2) - F.expr("INTERVAL 10 MINUTES")).alias("filter_wm"),
    )
    fin = bmax.agg((F.max("bmax") - F.expr("INTERVAL 10 MINUTES")).alias("final_wm"))
    win_start = (F.floor(F.unix_timestamp("event_time") / 900) * 900).cast("long")
    kept = (
        base.withColumn("win_start", win_start)
        .join(F.broadcast(wm), "batch")
        .where(
            F.col("filter_wm").isNull()
            | (F.col("win_start") + 900 > F.unix_timestamp("filter_wm"))
        )
    )
    agg = kept.groupBy("event_type", "win_start").agg(
        F.count("*").alias("n"), dsum("value").alias("sum_value")
    )
    return (
        agg.crossJoin(F.broadcast(fin))
        .where(F.col("win_start") + 900 <= F.unix_timestamp("final_wm"))
        .select("event_type", "win_start", "n", "sum_value")
        .orderBy("event_type", "win_start")
    )
