"""KMV bottom-k sample sketch: exact merge property, partitioning
invariance, sampling-error bounds, and the degenerate k ≥ n case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.kmv import (
    bottomk_sketch,
    kmv_estimates,
    merge_bottomk,
)


def _data(spark, n=10_000):
    return spark.range(n).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 2654435761) % 1_000_000 / 100.0).alias("v"),
    )


def test_merge_equals_oneshot_exactly(spark):
    df = _data(spark)
    one = bottomk_sketch(df, "rid", "v", k=200).collect()
    shards = [
        bottomk_sketch(df.where(F.col("rid") % 4 == i), "rid", "v", k=200)
        for i in range(4)
    ]
    merged = merge_bottomk(shards, k=200).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in merged]


def test_sketch_invariant_under_repartition(spark):
    df = _data(spark, 3_000)
    a = bottomk_sketch(df, "rid", "v", k=100).collect()
    b = bottomk_sketch(df.repartition(13), "rid", "v", k=100).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_quantile_and_count_estimates_within_bounds(spark):
    n, k = 20_000, 256
    df = _data(spark, n)
    est = {
        r.stat: r.est
        for r in kmv_estimates(bottomk_sketch(df, "rid", "v", k=k)).collect()
    }
    # true quantiles of the value distribution (uniform-ish on [0, 10000))
    true = df.approxQuantile("v", [0.25, 0.5, 0.75, 0.9], 0.0001)
    spread = 10_000.0
    for stat, t in zip(("q25", "q50", "q75", "q90"), true):
        # sampling rank error ~ O(1/sqrt(k)); 4/sqrt(256) = 0.25 of spread
        # is very loose — typical error is a few percent
        assert abs(est[stat] - t) < 0.25 * spread, (stat, est[stat], t)
    assert abs(est["n_est"] - n) / n < 0.5  # KMV count estimate, loose bound
    assert est["hash_check"] > 0


def test_k_covers_input_gives_exact_quantiles(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "rid long, v double")
    est = {
        r.stat: r.est
        for r in kmv_estimates(bottomk_sketch(df, "rid", "v", k=100)).collect()
    }
    # k ≥ n: the sketch IS the data; type-1 quantiles are exact
    assert est["q25"] == 3.0  # ceil(.25·10) = 3rd smallest
    assert est["q50"] == 5.0
    assert est["q75"] == 8.0
    assert est["q90"] == 9.0


def test_unfilled_sketch_count_is_exact(spark):
    """n < k: the sketch holds the entire population, so the standard
    KMV answer is the exact count n — (n-1)/u_n would be biased ~n-1."""
    for n in (1, 7, 40):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(n)], "rid long, v double"
        )
        est = {
            r.stat: r.est
            for r in kmv_estimates(
                bottomk_sketch(df, "rid", "v", k=100), k=100
            ).collect()
        }
        assert est["n_est"] == float(n), (n, est["n_est"])


def test_full_sketch_estimate_unchanged_by_k(spark):
    """n ≥ k: passing k must not change the estimator — still (k-1)/u_k."""
    df = _data(spark, 5_000)
    without = {
        r.stat: r.est
        for r in kmv_estimates(bottomk_sketch(df, "rid", "v", k=64)).collect()
    }
    with_k = {
        r.stat: r.est
        for r in kmv_estimates(bottomk_sketch(df, "rid", "v", k=64), k=64).collect()
    }
    assert without == with_k


def test_k_validation(spark):
    with pytest.raises(ValueError):
        bottomk_sketch(_data(spark, 10), "rid", "v", k=0)


def test_sketch_plan_is_take_ordered(spark):
    """The scale claim: ORDER BY hash LIMIT k compiles to
    TakeOrderedAndProject — per-partition top-k, no global sort."""
    df = _data(spark, 5_000)
    plan = (
        bottomk_sketch(df, "rid", "v", k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "Exchange rangepartitioning" not in plan, plan[:1500]


def test_kmv_streaming_sketch_maintenance(spark, tmp_path):
    """Streaming sketch maintenance (the HLL pattern, KMV member): each
    micro-batch's bottom-k merges into a persisted k-row table, so a
    live uniform sample / quantile monitor needs no raw-row retention.
    After all batches the maintained sketch is ROW-EXACT equal to
    sketching the full history — KMV's merge is exact, not approximate."""
    import os

    import pyspark.sql.types as T

    src = tmp_path / "in"
    sk_root = str(tmp_path / "sketch")
    ckpt = tmp_path / "ck"
    src.mkdir()
    k = 64

    def land(fidx, lo, hi):
        spark.range(lo, hi).select(
            F.col("id").alias("rid"), (F.col("id") * 7 % 1000 / 3.0).alias("v")
        ).write.mode("overwrite").parquet(str(src / f"f{fidx}"))

    land(0, 0, 3000)
    land(1, 3000, 8000)

    schema = T.StructType(
        [T.StructField("rid", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )

    def merge_batch(batch_df, _bid):
        new = bottomk_sketch(batch_df, "rid", "v", k=k)
        if os.path.exists(sk_root):
            merged = merge_bottomk(
                [batch_df.sparkSession.read.parquet(sk_root), new], k=k
            )
        else:
            merged = new
        tmp = sk_root + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = sk_root + "__old"
        if os.path.exists(sk_root):
            os.rename(sk_root, old)
        os.rename(tmp, sk_root)
        import shutil

        shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    maintained = sorted(
        tuple(r)
        for r in spark.read.parquet(sk_root)
        .select("row_id", "value", "rank_hash")
        .collect()
    )
    full = spark.range(8000).select(
        F.col("id").alias("rid"), (F.col("id") * 7 % 1000 / 3.0).alias("v")
    )
    oneshot = sorted(
        tuple(r) for r in bottomk_sketch(full, "rid", "v", k=k).collect()
    )
    assert maintained == oneshot
