"""Coverage beyond the core families: statistical aggregates, pivot/unpivot,
remaining window functions (cume_dist / nth_value), second string/math/
datetime function waves, bitwise ops.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "agg_stats",
    oracle="""
        SELECT l_returnflag,
               ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
               ROUND(stddev_pop(l_quantity), 6) AS sdp_qty,
               ROUND(var_samp(l_discount), 6) AS var_disc,
               ROUND(var_pop(l_discount), 6) AS varp_disc,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
               ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qd
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("B4",),
    doc="Statistical aggregates: stddev/variance (samp+pop), corr, covar "
    "(rounded to 6 dp — merge-order float tolerance).",
)
def agg_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
            F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
            F.round(F.var_pop("l_discount"), 6).alias("varp_disc"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qd"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "pivot_status_priority",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("B4", "B6"),
    doc="PIVOT (wide conditional aggregation) via DataFrame .pivot().",
)
def pivot_status_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_n"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_n"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_n"),
    ).orderBy("o_orderpriority")


@register(
    "unpivot_stack",
    oracle="""
        SELECT c_custkey, metric, CAST(val AS DOUBLE) AS val
        FROM (
            SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
            UNION ALL
            SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) FROM customer)
        WHERE c_custkey <= 50
        ORDER BY c_custkey, metric
    """,
    tags=("B6",),
    doc="UNPIVOT via stack() (long-form melt).",
)
def unpivot_stack(spark, sf_dir):
    c = t(spark, sf_dir, "customer").where(F.col("c_custkey") <= 50)
    return (
        c.selectExpr(
            "c_custkey",
            "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)",
        )
        .orderBy("c_custkey", "metric")
    )


@register(
    "win_cume_nth",
    oracle="""
        SELECT s_suppkey,
               ROUND(cume_dist() OVER w, 6) AS cd,
               nth_value(s_suppkey, 2) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_richest
        FROM supplier
        WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        ORDER BY s_suppkey
    """,
    tags=("B5",),
    doc="cume_dist and nth_value window functions.",
)
def win_cume_nth(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return s.select(
        "s_suppkey",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("s_suppkey", 2).over(w_full).alias("second_richest"),
    ).orderBy("s_suppkey")


@register(
    "fn_string_wave2",
    oracle="""
        SELECT p_partkey,
               translate(p_name, 'aeiou', '     ') AS blanked,
               reverse(p_brand) AS rev_brand,
               repeat(left(p_type, 2), 3) AS rep2x3,
               ascii(p_name) AS first_cp,
               chr(65 + (p_size % 26)) AS size_chr,
               right(p_name, 4) AS last4,
               split_part(p_type, ' ', 1) AS type_head,
               starts_with(p_name, 'a') AS sw_a,
               ends_with(p_type, 'd') AS ew_d,
               position('o' IN p_name) AS o_pos,
               contains(p_name, 'gold') AS has_gold
        FROM part
        WHERE p_partkey <= 300
        ORDER BY p_partkey
    """,
    tags=("B7",),
    doc="String wave 2: translate/reverse/repeat/ascii/chr/left/right/"
    "split_part/starts_with/ends_with/position/contains.",
)
def fn_string_wave2(spark, sf_dir):
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        F.translate("p_name", "aeiou", "     ").alias("blanked"),
        F.reverse(F.col("p_brand")).alias("rev_brand"),
        F.repeat(F.substring("p_type", 1, 2), 3).alias("rep2x3"),
        F.ascii("p_name").alias("first_cp"),
        F.chr(F.lit(65) + F.pmod(F.col("p_size"), F.lit(26))).alias("size_chr"),
        F.substring(F.col("p_name"), -4, 4).alias("last4"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.startswith(F.col("p_name"), F.lit("a")).alias("sw_a"),
        F.endswith(F.col("p_type"), F.lit("d")).alias("ew_d"),
        F.instr(F.col("p_name"), "o").alias("o_pos"),
        F.contains(F.col("p_name"), F.lit("gold")).alias("has_gold"),
    ).orderBy("p_partkey")


@register(
    "fn_math_wave2",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(sin(l_discount), 6) AS sin_d,
               ROUND(cos(l_discount), 6) AS cos_d,
               ROUND(atan2(l_quantity, l_extendedprice), 6) AS at2,
               ROUND(degrees(l_discount), 6) AS deg_d,
               ROUND(radians(l_quantity), 6) AS rad_q,
               ROUND(cbrt(l_quantity), 6) AS cbrt_q,
               ROUND(log2(l_extendedprice), 6) AS log2_p,
               (CAST(l_orderkey AS BIGINT) & 255) AS key_and,
               (CAST(l_orderkey AS BIGINT) | 4096) AS key_or,
               xor(CAST(l_orderkey AS BIGINT), 511) AS key_xor,
               (CAST(l_orderkey AS BIGINT) << 2) AS key_shl,
               (CAST(l_orderkey AS BIGINT) >> 1) AS key_shr
        FROM lineitem
        WHERE l_orderkey <= 300
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("B7",),
    doc="Math wave 2: trig/atan2/degrees/radians/cbrt/log2 + bitwise and/or/"
    "xor/shifts.",
)
def fn_math_wave2(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    key = F.col("l_orderkey").cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 6).alias("sin_d"),
        F.round(F.cos("l_discount"), 6).alias("cos_d"),
        F.round(F.atan2(F.col("l_quantity"), F.col("l_extendedprice")), 6).alias("at2"),
        F.round(F.degrees("l_discount"), 6).alias("deg_d"),
        F.round(F.radians("l_quantity"), 6).alias("rad_q"),
        F.round(F.cbrt("l_quantity"), 6).alias("cbrt_q"),
        F.round(F.log2("l_extendedprice"), 6).alias("log2_p"),
        key.bitwiseAND(F.lit(255)).alias("key_and"),
        key.bitwiseOR(F.lit(4096)).alias("key_or"),
        key.bitwiseXOR(F.lit(511)).alias("key_xor"),
        F.shiftleft(key, 2).alias("key_shl"),
        F.shiftright(key, 1).alias("key_shr"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "fn_datetime_wave2",
    oracle="""
        SELECT o_orderkey,
               quarter(o_orderdate) AS q,
               weekofyear(o_orderdate) AS woy,
               dayofweek(o_orderdate) + 1 AS dow,
               dayofyear(o_orderdate) AS doy,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
               CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
               make_date(year(o_orderdate), month(o_orderdate), 1) AS month_first
        FROM orders
        WHERE o_orderkey <= 800
        ORDER BY o_orderkey
    """,
    tags=("B7",),
    doc="Datetime wave 2: quarter/weekofyear/dayofweek/dayofyear/last_day/"
    "add_months/trunc-to-quarter/make_date (Spark dayofweek is 1-based "
    "Sunday, DuckDB 0-based — pinned in the oracle).",
)
def fn_datetime_wave2(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 800)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(od).alias("q"),
        F.weekofyear(od).alias("woy"),
        F.dayofweek(od).alias("dow"),
        F.dayofyear(od).alias("doy"),
        F.last_day(od.cast("date")).alias("month_end"),
        F.add_months(od.cast("date"), 3).alias("plus3m"),
        F.date_trunc("quarter", od).cast("date").alias("q_start"),
        F.make_date(F.year(od), F.month(od), F.lit(1)).alias("month_first"),
    ).orderBy("o_orderkey")


@register(
    "fn_try_ops",
    oracle="""
        SELECT o_orderkey,
               TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
               TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
               CASE WHEN o_custkey - o_custkey = 0 THEN NULL
                    ELSE o_totalprice / (o_custkey - o_custkey) END AS div_by_zero,
               CAST(TRY_CAST('2024-13-45' AS DATE) AS VARCHAR) AS bad_date
        FROM orders
        WHERE o_orderkey <= 500
        ORDER BY o_orderkey
    """,
    tags=("B7",),
    doc="ANSI-safe try_* ops: try_cast of malformed values and try_divide "
    "by zero return NULL instead of raising (ANSI mode is on engine-wide).",
)
def fn_try_ops(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("prio_int"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("prio_digit"),
        F.try_divide(F.col("o_totalprice"), F.col("o_custkey") - F.col("o_custkey")).alias(
            "div_by_zero"
        ),
        F.lit("2024-13-45").try_cast("date").cast("string").alias("bad_date"),
    ).orderBy("o_orderkey")


@register(
    "agg_string_concat",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
    tags=("B4",),
    doc="String aggregation (Athena array_join(array_agg(…)) ≡ "
    "concat_ws over a sorted collect_list).",
)
def agg_string_concat(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv")
        )
        .orderBy("n_regionkey")
    )


@register(
    "agg_wave3",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag, l_orderkey, l_quantity, l_discount, l_linestatus,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_shipdate, l_orderkey) AS rf,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_shipdate DESC, l_orderkey DESC) AS rl
            FROM lineitem)
        SELECT l_returnflag,
               mode(l_linestatus ORDER BY l_linestatus) AS status_mode,
               ROUND(median(l_quantity), 6) AS med_qty,
               bool_and(l_quantity > 0) AS all_positive,
               bool_or(l_discount > 0.09) AS any_big_discount,
               MAX(CASE WHEN rf = 1 THEN l_orderkey END) AS first_shipped_order,
               MAX(CASE WHEN rl = 1 THEN l_orderkey END) AS last_shipped_order
        FROM ranked
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("B4",),
    doc="Aggregate wave 3: mode, median, bool_and/bool_or (every/any), "
    "arg_min/arg_max (min_by/max_by).",
)
def agg_wave3(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.mode("l_linestatus").alias("status_mode"),
            F.round(F.median("l_quantity"), 6).alias("med_qty"),
            F.every(F.col("l_quantity") > 0).alias("all_positive"),
            F.some(F.col("l_discount") > 0.09).alias("any_big_discount"),
            F.min_by("l_orderkey", F.struct("l_shipdate", "l_orderkey")).alias(
                "first_shipped_order"
            ),
            F.max_by("l_orderkey", F.struct("l_shipdate", "l_orderkey")).alias(
                "last_shipped_order"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "fn_collection_wave3",
    oracle="""
        WITH base AS (
            SELECT n_nationkey,
                   generate_series(1, (n_nationkey % 4) + 2) AS a,
                   generate_series(10, 10 + (n_nationkey % 4) + 1) AS b
            FROM nation)
        SELECT n_nationkey,
               to_json(list_transform(list_zip(a, b), p -> p[1] + p[2])) AS zipped_sum,
               len(regexp_extract_all(CAST(n_nationkey AS VARCHAR) || 'a1b2', '[0-9]')) AS digit_count,
               a[1] IS NOT NULL AS first_not_null,
               COALESCE(a[100], -1) AS oob_elem
        FROM base
        ORDER BY n_nationkey
    """,
    tags=("B7",),
    doc="Collection wave 3: zip_with (list_zip+transform), regexp counting, "
    "out-of-bounds element access semantics.",
)
def fn_collection_wave3(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    base = n.select(
        "n_nationkey",
        F.sequence(F.lit(1), F.pmod(F.col("n_nationkey"), F.lit(4)) + 2).alias("a"),
        F.sequence(F.lit(10), F.lit(11) + F.pmod(F.col("n_nationkey"), F.lit(4))).alias("b"),
    )
    return base.select(
        "n_nationkey",
        F.to_json(F.zip_with("a", "b", lambda x, y: x + y)).alias("zipped_sum"),
        F.size(
            F.regexp_extract_all(
                F.concat(F.col("n_nationkey").cast("string"), F.lit("a1b2")), F.lit("([0-9])"), 1
            )
        ).alias("digit_count"),
        F.col("a")[0].isNotNull().alias("first_not_null"),
        F.coalesce(F.try_element_at(F.col("a"), F.lit(100)), F.lit(-1)).alias("oob_elem"),
    ).orderBy("n_nationkey")


@register(
    "fn_division_semantics",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey AS BIGINT) // 7 AS int_div,
               CAST(o_orderkey AS DOUBLE) / 7 AS float_div,
               CAST(o_orderkey AS BIGINT) % 7 AS int_mod,
               CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_k_floor
        FROM orders
        WHERE o_orderkey <= 500
        ORDER BY o_orderkey
    """,
    tags=("B7",),
    doc="Division-semantics pin (SURVEY §2 footer): Presto/Athena integer "
    "`/` truncates while Spark `/` widens to double — the engine exposes "
    "both explicitly (`div` for truncating integer division, `/` for float).",
)
def fn_division_semantics(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.expr("CAST(o_orderkey AS BIGINT) div 7").alias("int_div"),
        (F.col("o_orderkey").cast("double") / 7).alias("float_div"),
        F.pmod(F.col("o_orderkey").cast("long"), F.lit(7)).alias("int_mod"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("price_k_floor"),
    ).orderBy("o_orderkey")


@register(
    "corpus_metering",
    oracle="""
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               COUNT(DISTINCT md5(text)) AS distinct_texts,
               ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 6)
                   AS dup_ratio,
               MIN(n_chars) AS min_chars,
               MAX(n_chars) AS max_chars
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
    tags=("B4", "B10"),
    doc="Per-source corpus metering: volumes, content-hash distinct count "
    "and duplicate ratio, size extrema — the observability rollup a "
    "training-data pipeline runs per ingest batch (hash-distinct keeps "
    "the shuffle on 16-byte digests, not document bodies).",
)
def corpus_metering(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("distinct_texts"),
            F.round(
                1.0 - F.countDistinct(F.md5("text")).cast("double") / F.count("*"), 6
            ).alias("dup_ratio"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("source")
    )


@register(
    "fn_url_family",
    oracle="""
        WITH u AS (
            SELECT event_id,
                   'https://api.tenant-' || CAST(user_id % 4 AS VARCHAR)
                     || '.example.com/v1/events/' || CAST(event_id AS VARCHAR)
                     || '?type=' || event_type || '&page=' || CAST(event_id % 7 AS VARCHAR)
                     AS url,
                   event_type || ' & more' AS to_enc
            FROM events WHERE event_id <= 500)
        SELECT event_id,
               regexp_extract(url, '^([a-z]+)://', 1) AS proto,
               regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '\\?(.*)$', 1) AS query,
               regexp_extract(url, '[?&]type=([^&]*)', 1) AS type_param,
               replace(replace(to_enc, '&', '%26'), ' ', '+') AS encoded,
               'a/b?c' AS decoded
        FROM u
        ORDER BY event_id
    """,
    tags=("B7",),
    doc="URL family (Athena url_extract_protocol/host/path/query + "
    "url_extract_parameter + url_encode/url_decode): Spark parse_url / "
    "url_encode / url_decode; oracle replicates via regexp + form-encoding "
    "rules on deterministically constructed URLs.",
)
def fn_url_family(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    url = F.concat(
        F.lit("https://api.tenant-"),
        F.pmod("user_id", F.lit(4)).cast("string"),
        F.lit(".example.com/v1/events/"),
        F.col("event_id").cast("string"),
        F.lit("?type="),
        F.col("event_type"),
        F.lit("&page="),
        F.pmod("event_id", F.lit(7)).cast("string"),
    )
    to_enc = F.concat(F.col("event_type"), F.lit(" & more"))
    return e.select(
        "event_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("type")).alias("type_param"),
        F.url_encode(to_enc).alias("encoded"),
        F.url_decode(F.lit("a%2Fb%3Fc")).alias("decoded"),
    ).orderBy("event_id")


@register(
    "fn_timezone",
    oracle="""
        SELECT event_id,
               strftime(ts + INTERVAL '5 hours' + INTERVAL '30 minutes',
                        '%Y-%m-%d %H:%M:%S') AS ist,
               strftime(ts - INTERVAL '7 hours', '%Y-%m-%d %H:%M:%S') AS pdt,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS roundtrip,
               CAST(strftime(ts - INTERVAL '7 hours', '%H') AS INTEGER) AS pdt_hour
        FROM events
        WHERE event_id <= 500
        ORDER BY event_id
    """,
    tags=("B7",),
    doc="Timezone conversion (Athena AT TIME ZONE): from_utc_timestamp / "
    "to_utc_timestamp with fixed offsets (+05:30, -07:00) — IANA zones are "
    "supported identically but a fixed offset keeps the oracle independent "
    "of the oracle session's tz database/setting. Roundtrip pins the "
    "inverse relation.",
)
def fn_timezone(spark, sf_dir):
    e = t(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    ist = F.from_utc_timestamp("ts", "+05:30")
    pdt = F.from_utc_timestamp("ts", "-07:00")
    return e.select(
        "event_id",
        F.date_format(ist, "yyyy-MM-dd HH:mm:ss").alias("ist"),
        F.date_format(pdt, "yyyy-MM-dd HH:mm:ss").alias("pdt"),
        F.date_format(
            F.to_utc_timestamp(F.from_utc_timestamp("ts", "+05:30"), "+05:30"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("roundtrip"),
        F.hour(pdt).alias("pdt_hour"),
    ).orderBy("event_id")


@register(
    "agg_bitwise",
    oracle="""
        SELECT l_returnflag,
               BIT_AND(l_linenumber) AS ln_and,
               BIT_OR(l_linenumber) AS ln_or,
               BIT_XOR(CAST(l_orderkey AS BIGINT)) AS ok_xor
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("B4",),
    doc="Bitwise aggregate family (bit_and / bit_or / bit_xor) — fully "
    "mergeable partials, codegen'd map-side combine like any sum.",
)
def agg_bitwise(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").alias("ln_and"),
            F.bit_or("l_linenumber").alias("ln_or"),
            F.bit_xor(F.col("l_orderkey").cast("bigint")).alias("ok_xor"),
        )
        .orderBy("l_returnflag")
    )
