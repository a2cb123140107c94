"""Z-order layout (operators/layout.py): the rewritten files must cover
small rectangles of BOTH dimensions, so min/max file stats prune
single-dimension predicates that a one-column sort layout cannot."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.layout import (
    cluster_by_zorder,
    zorder_key,
)

_N_FILES = 16


def _file_ranges(spark, path):
    df = spark.read.parquet(path).withColumn("f", F.input_file_name())
    return {
        r["f"]: r
        for r in df.groupBy("f")
        .agg(
            F.min("a").alias("a_lo"), F.max("a").alias("a_hi"),
            F.min("b").alias("b_lo"), F.max("b").alias("b_hi"),
        )
        .collect()
    }


def _touched(ranges, dim, lo, hi):
    return sum(1 for r in ranges.values() if not (r[f"{dim}_hi"] < lo or r[f"{dim}_lo"] > hi))


def test_zorder_key_is_exact_bit_interleave(spark):
    # pure-Python mirror: the Spark key must equal interleave(bucket(a),
    # bucket(b)) for every row, including out-of-range clamps
    import itertools

    bits, lo, hi = 6, 0.0, 64.0
    vals = [-5, 0, 1, 17, 31, 32, 63, 64, 99]
    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(itertools.product(vals, vals))]
    df = spark.createDataFrame(rows, "id int, a double, b double")
    key = zorder_key(F.col("a"), lo, hi, F.col("b"), lo, hi, bits=bits)
    got = {r["id"]: r["z"] for r in df.withColumn("z", key).collect()}

    def bucket(x):
        n = 1 << bits
        return max(0, min(n - 1, int((x - lo) / (hi - lo) * n)))

    def interleave(a, b):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for i, a, b in rows:
        assert got[i] == interleave(bucket(a), bucket(b)), (i, a, b)


def test_zorder_files_prune_both_dimensions(spark, tmp_path):
    n = 40_000
    # decorrelated uniform grid over (a, b)
    df = spark.range(n).select(
        (F.xxhash64("id", F.lit(1)) % 1000).alias("a"),
        (F.xxhash64("id", F.lit(2)) % 1000).alias("b"),
    ).where((F.col("a") >= 0) & (F.col("b") >= 0))

    z_path, s_path = str(tmp_path / "zorder"), str(tmp_path / "sorted")
    key = zorder_key(F.col("a"), 0, 1000, F.col("b"), 0, 1000, bits=8)
    cluster_by_zorder(df, key, z_path, num_files=_N_FILES)
    df.repartitionByRange(_N_FILES, F.col("a")).sortWithinPartitions("a").write.mode(
        "overwrite"
    ).parquet(s_path)

    zr, sr = _file_ranges(spark, z_path), _file_ranges(spark, s_path)
    assert len(zr) >= _N_FILES // 2 and len(sr) >= _N_FILES // 2

    # rows preserved
    assert spark.read.parquet(z_path).count() == df.count()

    # a narrow predicate on the SECOND dimension prunes z-ordered files
    # but touches every a-sorted file
    z_touch_b = _touched(zr, "b", 100, 150)
    s_touch_b = _touched(sr, "b", 100, 150)
    assert s_touch_b == len(sr)
    assert z_touch_b <= len(zr) // 2

    # the first dimension still prunes on the z-ordered layout too
    z_touch_a = _touched(zr, "a", 100, 150)
    assert z_touch_a <= len(zr) // 2
