"""Portable HyperLogLog: accuracy, merge-by-max, duplicate-insensitivity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hll import (
    hll_constants,
    hll_merge,
    hll_registers,
    hll_summary,
)


def test_hll_constants_validation():
    m, w, c = hll_constants(8)
    assert (m, w) == (256, 44)
    with pytest.raises(ValueError):
        hll_constants(3)
    with pytest.raises(ValueError):
        hll_constants(17)


def test_hll_estimate_within_expected_error(spark):
    # p=8 → standard error 1.04/sqrt(256) ≈ 6.5%; assert 3 sigma
    n = 20_000
    df = spark.range(n).select(F.col("id").alias("k"))
    est = hll_summary(hll_registers(df, "k"), p=8).collect()[0]["hll_estimate"]
    assert abs(est - n) / n < 0.20, est


def test_hll_duplicates_do_not_change_the_sketch(spark):
    a = spark.range(5_000).select(F.col("id").alias("k"))
    dup = a.unionByName(a).unionByName(a)
    ra = {(r["bucket"], r["reg"]) for r in hll_registers(a, "k").collect()}
    rd = {(r["bucket"], r["reg"]) for r in hll_registers(dup, "k").collect()}
    assert ra == rd


def test_hll_merge_equals_sketch_of_union(spark):
    a = spark.range(0, 6_000).select(F.col("id").alias("k"))
    b = spark.range(4_000, 11_000).select(F.col("id").alias("k"))  # overlap
    merged = hll_merge(hll_registers(a, "k"), hll_registers(b, "k"))
    direct = hll_registers(a.unionByName(b), "k")
    rm = {(r["bucket"], r["reg"]) for r in merged.collect()}
    rd = {(r["bucket"], r["reg"]) for r in direct.collect()}
    assert rm == rd
    # and the summary (estimate included) is therefore identical too
    sm = hll_summary(merged).collect()[0]
    sd = hll_summary(direct).collect()[0]
    assert sm["registers_md5"] == sd["registers_md5"]
    assert sm["hll_estimate"] == sd["hll_estimate"]


def test_hll_nulls_ignored_and_grouping(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", 1)], "g string, k int"
    )
    out = {r["g"]: r for r in hll_summary(hll_registers(df, "k", ["g"]), ["g"]).collect()}
    assert set(out) == {"a", "b"}
    # group a saw 2 keys, group b saw 1 → different sketches
    assert out["a"]["registers_md5"] != out["b"]["registers_md5"]
    assert out["a"]["n_empty"] == 254 and out["b"]["n_empty"] == 255


def test_hll_sketch_rollup_over_partitions(spark, tmp_path):
    """The mergeable-rollup story: per-day register tables persisted to
    the lake, a range query merges days by union+max — register-exact
    equal to sketching the raw rows of that range directly. Distinct
    counts over arbitrary ranges then cost O(days × m), never a rescan."""
    days = {
        d: spark.range(d * 1000, d * 1000 + 800).select(
            (F.col("id") % (300 + 100 * d)).alias("user")
        )
        for d in range(5)
    }
    for d, df in days.items():
        hll_registers(df, "user", p=8, seed="roll").write.parquet(
            str(tmp_path / f"day={d}")
        )
    merged = (
        spark.read.parquet(*[str(tmp_path / f"day={d}") for d in (1, 2, 3)])
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
    )
    direct = hll_registers(
        days[1].unionByName(days[2]).unionByName(days[3]), "user", p=8, seed="roll"
    )
    sm = hll_summary(merged, p=8).collect()[0]
    sd = hll_summary(direct, p=8).collect()[0]
    assert sm["registers_md5"] == sd["registers_md5"]
    assert sm["hll_estimate"] == sd["hll_estimate"]
    # sanity: the estimate tracks the true range distinct within HLL error
    true = (
        days[1].unionByName(days[2]).unionByName(days[3]).select("user").distinct().count()
    )
    assert abs(sm["hll_estimate"] - true) / true < 0.25


def test_hll_streaming_register_maintenance(spark, tmp_path):
    """Streaming sketch maintenance: each micro-batch merges its registers
    into a persisted table (union+max), so a live distinct-count dashboard
    needs no raw-event retention. After all batches, the maintained
    sketch is register-exact equal to sketching the full history."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    src = tmp_path / "in"
    reg_root = str(tmp_path / "registers")
    ckpt = tmp_path / "ck"
    src.mkdir()

    def land(fidx, lo, hi):
        spark.range(lo, hi).select(F.col("id").alias("user")).write.mode(
            "overwrite"
        ).parquet(str(src / f"f{fidx}"))

    land(0, 0, 4000)
    land(1, 2000, 7000)  # overlap: duplicate users across batches

    schema = T.StructType([T.StructField("user", T.LongType())])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )

    def merge_batch(batch_df, _bid):
        import os as _os

        new = hll_registers(batch_df, "user", p=8, seed="live")
        if _os.path.exists(reg_root):
            merged = hll_merge(batch_df.sparkSession.read.parquet(reg_root), new)
        else:
            merged = new
        # rename-aside swap so readers never see a partial table
        tmp = reg_root + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = reg_root + "__old"
        if _os.path.exists(reg_root):
            _os.rename(reg_root, old)
        _os.rename(tmp, reg_root)
        import shutil as _sh

        _sh.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    maintained = spark.read.parquet(reg_root)
    direct = hll_registers(
        spark.range(0, 7000).select(F.col("id").alias("user")), "user", p=8, seed="live"
    )
    sm = hll_summary(maintained.groupBy("bucket").agg(F.max("reg").alias("reg")), p=8).collect()[0]
    sd = hll_summary(direct, p=8).collect()[0]
    assert sm["registers_md5"] == sd["registers_md5"]
    assert sm["hll_estimate"] == sd["hll_estimate"]
    assert abs(sm["hll_estimate"] - 7000) / 7000 < 0.2
