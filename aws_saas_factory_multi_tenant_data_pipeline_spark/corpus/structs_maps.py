"""B7 wave 4: struct construction/access, array mutation functions, map
higher-order functions, width_bucket. Map/struct internals are projected to
sorted scalar/array outputs so the DuckDB oracle can hash-match them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "fn_struct_ops",
    oracle="""
        SELECT s_suppkey,
               s_name AS packed_name,
               CAST(s_acctbal AS DOUBLE) AS packed_bal,
               (CAST(s_nationkey AS BIGINT), CAST(s_suppkey AS BIGINT)) < (CAST(12 AS BIGINT), CAST(9999999 AS BIGINT)) AS before_nation12
        FROM supplier
        ORDER BY s_suppkey
    """,
    tags=("B7",),
    doc="Struct construction, field access, lexicographic struct comparison.",
)
def fn_struct_ops(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    packed = F.struct(
        F.col("s_name").alias("name"), F.col("s_acctbal").cast("double").alias("bal")
    )
    return s.select(
        "s_suppkey",
        packed.getField("name").alias("packed_name"),
        packed.getField("bal").alias("packed_bal"),
        (
            F.struct(F.col("s_nationkey").cast("long"), F.col("s_suppkey").cast("long"))
            < F.struct(F.lit(12).cast("long"), F.lit(9999999).cast("long"))
        ).alias("before_nation12"),
    ).orderBy("s_suppkey")


@register(
    "fn_array_mutation",
    oracle="""
        WITH base AS (
            SELECT n_nationkey, generate_series(0, (n_nationkey % 5) + 2) AS a FROM nation)
        SELECT n_nationkey,
               list_position(a, 2) AS pos_of_2,
               to_json(list_filter(a, x -> x != 1)) AS removed_1,
               CASE WHEN len(list_intersect(a, [3, 4])) > 0 THEN true ELSE false END AS overlaps_34,
               to_json(list_transform(generate_series(1, 3), x -> n_nationkey)) AS repeated,
               to_json(list_concat(a[2:], [99])) AS appended_tail
        FROM base
        ORDER BY n_nationkey
    """,
    tags=("B7",),
    doc="array_position / array_remove / arrays_overlap / array_repeat / "
    "slice+concat mutation patterns.",
)
def fn_array_mutation(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    base = n.select(
        "n_nationkey",
        F.sequence(F.lit(0), F.pmod("n_nationkey", F.lit(5)) + 2).alias("a"),
    )
    return base.select(
        "n_nationkey",
        F.array_position("a", 2).alias("pos_of_2"),
        F.to_json(F.array_remove("a", 1)).alias("removed_1"),
        F.arrays_overlap("a", F.array(F.lit(3), F.lit(4))).alias("overlaps_34"),
        F.to_json(F.array_repeat(F.col("n_nationkey"), 3)).alias("repeated"),
        F.to_json(F.concat(F.slice("a", 2, 100), F.array(F.lit(99)))).alias("appended_tail"),
    ).orderBy("n_nationkey")


@register(
    "fn_map_higher_order",
    oracle="""
        WITH m AS (
            SELECT n_nationkey,
                   map(['a','b','c'],
                       [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT), CAST(7 AS BIGINT)]) AS props
            FROM nation)
        SELECT n_nationkey,
               to_json(list_sort(list_transform(map_keys(props), k -> upper(k)))) AS upper_keys,
               to_json(list_sort(list_transform(map_values(props), v -> v * 10))) AS values_x10,
               len(list_filter(map_values(props), v -> v > 5)) AS n_big_values
        FROM m
        ORDER BY n_nationkey
    """,
    tags=("B7",),
    doc="Map higher-order functions (transform_keys / transform_values / "
    "map_filter) projected to sorted arrays for the oracle.",
)
def fn_map_higher_order(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    m = n.select(
        "n_nationkey",
        F.map_from_arrays(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            F.array(
                F.col("n_nationkey").cast("long"),
                F.col("n_regionkey").cast("long"),
                F.lit(7).cast("long"),
            ),
        ).alias("props"),
    )
    upper_keys = F.array_sort(
        F.map_keys(F.transform_keys("props", lambda k, v: F.upper(k)))
    )
    values_x10 = F.array_sort(
        F.map_values(F.transform_values("props", lambda k, v: v * 10))
    )
    n_big = F.size(F.map_values(F.map_filter("props", lambda k, v: v > 5)))
    return m.select(
        "n_nationkey",
        F.to_json(upper_keys).alias("upper_keys"),
        F.to_json(values_x10).alias("values_x10"),
        n_big.alias("n_big_values"),
    ).orderBy("n_nationkey")


@register(
    "fn_width_bucket",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 0 THEN 0
                    WHEN o_totalprice >= 500000 THEN 11
                    ELSE CAST(FLOOR(o_totalprice / 50000) AS INTEGER) + 1 END AS price_bucket
        FROM orders
        WHERE o_orderkey <= 1000
        ORDER BY o_orderkey
    """,
    tags=("B7",),
    doc="width_bucket histogram binning (DuckDB 1.0 lacks the builtin — the "
    "oracle spells out the same uniform-bucket formula).",
)
def fn_width_bucket(spark, sf_dir):
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(500000.0), F.lit(10))
        .cast("int")
        .alias("price_bucket"),
    ).orderBy("o_orderkey")
