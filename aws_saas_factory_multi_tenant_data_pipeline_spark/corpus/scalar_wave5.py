"""Wave-5 scalar/aggregate function families (SURVEY.md §2 B7/B4).

Closes the remaining Athena/Presto function-parity gaps: string distance
and codecs (levenshtein / translate / base64 / hex), bitwise operators,
datetime wave 3 (from_unixtime, months_between, timestampdiff,
make_timestamp), array set algebra (union / intersect / except /
compact), map algebra (map_concat, str_to_map, map_entries), and
higher-moment aggregates (skewness / kurtosis).

Determinism notes (FIXTURES.md §3):
- hex is case-normalized (Spark upper, DuckDB lower → lower() both sides).
- maps are never compared raw: canonical form is the sorted "k=v" string
  array derived identically in both engines.
- skewness/kurtosis: Spark (like Athena/Presto) uses the population
  estimator while DuckDB uses the sample-adjusted one, so the oracle
  derives both moments from decimal-exact power sums (sum x, x², x³, x⁴)
  with the identical closed-form double expression on each side —
  bit-identical by construction, and it pins the estimator divergence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "fn_string_wave3",
    oracle="""
        SELECT p_partkey,
               levenshtein(p_brand, p_type) AS lev_brand_type,
               translate(p_name, 'aeiou', 'AEIOU') AS name_vowels_upper,
               to_base64(encode(p_brand)) AS brand_b64,
               decode(from_base64(to_base64(encode(p_name)))) AS name_b64_roundtrip,
               lower(hex(p_brand)) AS brand_hex,
               decode(unhex(hex(p_name))) AS name_hex_roundtrip,
               strpos(p_type, 'O') AS first_o_pos
        FROM part
        ORDER BY p_partkey
        LIMIT 50
    """,
    tags=("B7",),
    doc="String distance + codec family: levenshtein, translate, "
    "base64/unbase64 and hex/unhex roundtrips (case-normalized), strpos.",
)
def fn_string_wave3(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.levenshtein("p_brand", "p_type").alias("lev_brand_type"),
            F.translate("p_name", "aeiou", "AEIOU").alias("name_vowels_upper"),
            F.base64(F.col("p_brand").cast("binary")).alias("brand_b64"),
            F.unbase64(F.base64(F.col("p_name").cast("binary")))
            .cast("string")
            .alias("name_b64_roundtrip"),
            F.lower(F.hex("p_brand")).alias("brand_hex"),
            F.unhex(F.hex("p_name")).cast("string").alias("name_hex_roundtrip"),
            F.instr("p_type", "O").alias("first_o_pos"),
        )
        .orderBy("p_partkey")
        .limit(50)
    )


@register(
    "fn_math_wave3",
    oracle="""
        SELECT p_partkey,
               p_size & CAST(p_partkey AS INTEGER) AS size_and_key,
               p_size | 8 AS size_or_8,
               xor(p_size, 21) AS size_xor_21,
               bit_count(CAST(p_size AS BIGINT)) AS size_popcount,
               CAST(factorial((p_size % 10)) AS BIGINT) AS fact_size_mod10,
               round(pi() * p_size, 6) AS size_pi,
               CAST(~p_size AS INTEGER) AS size_not
        FROM part
        ORDER BY p_partkey
        LIMIT 50
    """,
    tags=("B7",),
    doc="Bitwise operators (& | ^ ~), popcount, factorial, pi — the "
    "Presto bitwise_and/or/xor + combinatorial surface.",
)
def fn_math_wave3(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.expr("p_size & CAST(p_partkey AS INT)").alias("size_and_key"),
            F.expr("p_size | 8").alias("size_or_8"),
            F.expr("p_size ^ 21").alias("size_xor_21"),
            F.bit_count(F.col("p_size").cast("bigint")).alias("size_popcount"),
            F.factorial(F.pmod("p_size", F.lit(10))).alias("fact_size_mod10"),
            F.round(F.lit(3.14159265358979323846) * F.col("p_size"), 6).alias("size_pi"),
            F.expr("CAST(~p_size AS INT)").alias("size_not"),
        )
        .orderBy("p_partkey")
        .limit(50)
    )


@register(
    "fn_datetime_wave3",
    oracle="""
        SELECT o_orderkey,
               strftime(to_timestamp(epoch(o_orderdate)) AT TIME ZONE 'UTC',
                        '%Y-%m-%d %H:%M:%S') AS from_unixtime_str,
               CAST(date_diff('month', DATE '1995-01-01',
                              date_trunc('month', o_orderdate)) AS DOUBLE)
                   AS months_since_1995,
               date_diff('hour', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                   AS hours_since_1995,
               make_timestamp(CAST(year(o_orderdate) AS BIGINT), month(o_orderdate),
                              day(o_orderdate), 12, 0, 0.0) AS noon_that_day
        FROM orders
        ORDER BY o_orderkey
        LIMIT 50
    """,
    tags=("B7",),
    doc="Datetime wave 3: from_unixtime (epoch→string, UTC-pinned), "
    "months_between on month-aligned dates (exact integer months), "
    "timestampdiff(HOUR), make_timestamp from components.",
)
def fn_datetime_wave3(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.from_unixtime(F.unix_timestamp("o_orderdate")).alias("from_unixtime_str"),
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            ).alias("months_since_1995"),
            F.expr("timestampdiff(HOUR, TIMESTAMP '1995-01-01 00:00:00', o_orderdate)").alias(
                "hours_since_1995"
            ),
            F.expr(
                "make_timestamp(year(o_orderdate), month(o_orderdate), "
                "day(o_orderdate), 12, 0, 0)"
            ).alias("noon_that_day"),
        )
        .orderBy("o_orderkey")
        .limit(50)
    )


@register(
    "fn_array_setops",
    oracle="""
        WITH a AS (
            SELECT n_nationkey,
                   [n_regionkey, n_regionkey + 1, 7, NULL] AS xs,
                   [n_regionkey + 1, 7, 9] AS ys
            FROM nation
        )
        SELECT n_nationkey,
               to_json(list_sort(list_distinct(list_concat(
                   list_filter(xs, v -> v IS NOT NULL), ys)))) AS union_xy,
               to_json(list_sort(list_intersect(list_filter(xs, v -> v IS NOT NULL), ys)))
                   AS intersect_xy,
               to_json(list_sort(list_distinct(list_filter(xs,
                   v -> v IS NOT NULL AND NOT list_contains(ys, v))))) AS except_xy,
               to_json(list_filter(xs, v -> v IS NOT NULL)) AS compact_x
        FROM a
        ORDER BY n_nationkey
    """,
    tags=("B7",),
    doc="Array set algebra: array_union / array_intersect / array_except "
    "/ array_compact (Presto array_union etc.), null-element handling "
    "pinned via compact-before-set-op.",
)
def fn_array_setops(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    xs = F.array(
        F.col("n_regionkey"),
        F.col("n_regionkey") + 1,
        F.lit(7),
        F.lit(None).cast("int"),
    )
    ys = F.array(F.col("n_regionkey") + 1, F.lit(7), F.lit(9))
    cx = F.array_compact(xs)
    return n.select(
        "n_nationkey",
        F.to_json(F.array_sort(F.array_union(cx, ys))).alias("union_xy"),
        F.to_json(F.array_sort(F.array_intersect(cx, ys))).alias("intersect_xy"),
        F.to_json(F.array_sort(F.array_except(cx, ys))).alias("except_xy"),
        F.to_json(cx).alias("compact_x"),
    ).orderBy("n_nationkey")


@register(
    "fn_map_wave2",
    oracle="""
        SELECT n_nationkey,
               to_json(list_sort(list_transform(
                   map_entries(map_concat(MAP{'nation': n_name},
                                          MAP{'region': CAST(n_regionkey AS VARCHAR)})),
                   e -> e.key || '=' || e.value))) AS merged_entries,
               to_json(list_sort(list_transform(
                   map_entries(MAP(
                       list_transform(string_split('a=1;b=2;c=3', ';'),
                                      kv -> string_split(kv, '=')[1]),
                       list_transform(string_split('a=1;b=2;c=3', ';'),
                                      kv -> string_split(kv, '=')[2]))),
                   e -> e.key || '=' || e.value))) AS parsed_entries
        FROM nation
        ORDER BY n_nationkey
    """,
    tags=("B7",),
    doc="Map algebra wave 2: map_concat and str_to_map (Presto "
    "split_to_map); maps canonicalized to sorted 'k=v' string arrays — "
    "raw map ordering is engine-defined, never compared directly.",
)
def fn_map_wave2(spark, sf_dir):
    n = t(spark, sf_dir, "nation")

    def entries(m):
        return F.array_sort(
            F.transform(
                F.map_entries(m),
                lambda e: F.concat_ws("=", e.key, e.value.cast("string")),
            )
        )

    merged = F.map_concat(
        F.create_map(F.lit("nation"), F.col("n_name")),
        F.create_map(F.lit("region"), F.col("n_regionkey").cast("string")),
    )
    parsed = F.str_to_map(F.lit("a=1;b=2;c=3"), F.lit(";"), F.lit("="))
    return n.select(
        "n_nationkey",
        F.to_json(entries(merged)).alias("merged_entries"),
        F.to_json(entries(parsed)).alias("parsed_entries"),
    ).orderBy("n_nationkey")


@register(
    "agg_higher_moments",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2,
                   CAST(SUM(CAST(l_quantity * l_quantity * l_quantity
                                 AS DECIMAL(38,6))) AS DOUBLE) AS s3,
                   CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity
                                 AS DECIMAL(38,6))) AS DOUBLE) AS s4
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                     / pow(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skew_pop,
               round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                      - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                     / pow(s2/n - (s1/n)*(s1/n), 2.0) - 3.0, 6) AS kurt_pop
        FROM s
        ORDER BY l_returnflag
    """,
    tags=("B4",),
    doc="Population skewness/kurtosis from decimal-exact power sums — the "
    "Athena/Presto (and Spark) population estimator, derived identically "
    "in both engines because DuckDB's native skewness/kurtosis are "
    "sample-adjusted (divergence pinned, SURVEY §2 footer).",
)
def agg_higher_moments(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    dec = "decimal(38,6)"
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q.cast(dec)).cast("double").alias("s1"),
        F.sum((q * q).cast(dec)).cast("double").alias("s2"),
        F.sum((q * q * q).cast(dec)).cast("double").alias("s3"),
        F.sum((q * q * q * q).cast(dec)).cast("double").alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - m1 * m1
    m3 = F.col("s3") / F.col("n") - 3 * m1 * (F.col("s2") / F.col("n")) + 2 * m1 * m1 * m1
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m1 * (F.col("s3") / F.col("n"))
        + 6 * m1 * m1 * (F.col("s2") / F.col("n"))
        - 3 * m1 * m1 * m1 * m1
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skew_pop"),
        F.round(m4 / F.pow(m2, F.lit(2.0)) - 3.0, 6).alias("kurt_pop"),
    ).orderBy("l_returnflag")


@register(
    "fn_string_wave4",
    oracle="""
        SELECT p_partkey,
               array_to_string(list_transform(string_split(p_name, ' '),
                   w -> upper(w[1]) || lower(w[2:])), ' ') AS icap,
               translate(p_brand, 'ABE', 'xyz') AS translated,
               repeat(p_type, 2) AS doubled,
               reverse(p_name) AS rev,
               left(p_name, 5) AS l5,
               right(p_name, 5) AS r5,
               split_part(p_type, ' ', 1) AS first_part,
               substr(p_name, 1, 2) || '**' || substr(p_name, 5) AS overlaid,
               position('a' IN p_name) AS pos_a
        FROM part
        WHERE p_partkey <= 500
        ORDER BY p_partkey
    """,
    tags=("B7",),
    doc="String wave 4: initcap / translate / repeat / reverse / left / "
    "right / split_part / overlay / position (Athena-Presto parity names; "
    "initcap and overlay emulated in the oracle from primitives).",
)
def fn_string_wave4(spark, sf_dir):
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("icap"),
        F.translate("p_brand", "ABE", "xyz").alias("translated"),
        F.repeat(F.col("p_type"), 2).alias("doubled"),
        F.reverse("p_name").alias("rev"),
        F.substring("p_name", 1, 5).alias("l5"),
        F.substring(F.col("p_name"), -5, 5).alias("r5"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_part"),
        F.overlay("p_name", F.lit("**"), F.lit(3), F.lit(2)).alias("overlaid"),
        F.position(F.lit("a"), F.col("p_name")).alias("pos_a"),
    ).orderBy("p_partkey")


@register(
    "fn_datetime_wave4",
    oracle="""
        SELECT o_orderkey,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               quarter(o_orderdate) AS q,
               weekofyear(o_orderdate) AS iso_week,
               dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
               dayofyear(o_orderdate) AS doy,
               make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start,
               strftime(o_orderdate, '%A') AS day_name,
               CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start
        FROM orders
        WHERE o_orderkey <= 1000
        ORDER BY o_orderkey
    """,
    tags=("B7",),
    doc="Date/time wave 4: last_day / quarter / weekofyear (ISO both "
    "engines) / dayofweek (DuckDB 0=Sunday vs Spark 1=Sunday — +1 in the "
    "oracle) / dayofyear / make_date / day-name format / quarter trunc.",
)
def fn_datetime_wave4(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(od).alias("month_end"),
        F.quarter(od).alias("q"),
        F.weekofyear(od).alias("iso_week"),
        F.dayofweek(od).alias("dow"),
        F.dayofyear(od).alias("doy"),
        F.make_date(F.year(od), F.month(od), F.lit(1)).alias("month_start"),
        F.date_format(od, "EEEE").alias("day_name"),
        F.date_trunc("quarter", od).cast("date").alias("q_start"),
    ).orderBy("o_orderkey")


@register(
    "fn_bitwise_encoding",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_orderkey AS BIGINT) & CAST(l_linenumber AS BIGINT) AS band,
               CAST(l_orderkey AS BIGINT) | CAST(l_linenumber AS BIGINT) AS bor,
               xor(CAST(l_orderkey AS BIGINT), CAST(l_linenumber AS BIGINT)) AS bxor,
               ~CAST(l_orderkey AS BIGINT) AS bnot,
               CAST(l_linenumber AS BIGINT) << 3 AS shl,
               CAST(l_orderkey AS BIGINT) >> 2 AS shr,
               hex(CAST(l_orderkey AS BIGINT)) AS okhex,
               format('{:b}', CAST(l_orderkey AS BIGINT)) AS okbin,
               to_base64(encode(l_returnflag)) AS flag_b64,
               decode(from_base64(to_base64(encode(l_returnflag)))) AS flag_rt
        FROM lineitem
        WHERE l_orderkey <= 300
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("B7",),
    doc="Scalar bitwise + encoding family: & | ^ ~ shiftleft shiftright, "
    "hex, base-2 conv, base64 roundtrip (Athena bitwise_and/or/xor + "
    "to_base64/from_base64 parity).",
)
def fn_bitwise_encoding(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 300)
    ok = F.col("l_orderkey").cast("long")
    ln = F.col("l_linenumber").cast("long")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ok.bitwiseAND(ln).alias("band"),
        ok.bitwiseOR(ln).alias("bor"),
        ok.bitwiseXOR(ln).alias("bxor"),
        F.bitwise_not(ok).alias("bnot"),
        F.shiftleft(ln, 3).alias("shl"),
        F.shiftright(ok, 2).alias("shr"),
        F.hex(ok).alias("okhex"),
        F.conv(ok.cast("string"), 10, 2).alias("okbin"),
        F.base64(F.col("l_returnflag").cast("binary")).alias("flag_b64"),
        F.unbase64(F.base64(F.col("l_returnflag").cast("binary")))
        .cast("string")
        .alias("flag_rt"),
    ).orderBy("l_orderkey", "l_linenumber")
