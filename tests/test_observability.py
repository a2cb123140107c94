"""Observation-based pipeline metrics: measured in-flight (no second
scan), exact where cheap, approximate where exactness would add a
shuffle; streaming metrics surface per micro-batch in query progress."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_saas_factory_multi_tenant_data_pipeline_spark.observability import (
    observed_ingest,
    observed_result,
    observed_stream,
)


def _raw(spark, n=100):
    return spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("tenant_id"),
        F.when(F.col("id") % 10 != 0, F.concat(F.lit("payload-"), F.col("id").cast("string"))).alias(
            "raw"
        ),
    )


def test_observed_ingest_batch_metrics(spark):
    df, obs = observed_ingest(_raw(spark, 100))
    df.count()
    m = obs.get
    assert m["n_records"] == 100
    assert m["n_null_payload"] == 10  # every 10th payload null
    assert 6 <= m["n_tenants_approx"] <= 8  # 7 tenants, approx
    # bytes: 90 non-null payloads, each "payload-<id>"
    expected = sum(len(f"payload-{i}") for i in range(100) if i % 10 != 0)
    assert m["bytes_in"] == expected


def test_observed_result_rowcount(spark):
    df, obs = observed_result(_raw(spark, 50).where(F.col("raw").isNotNull()))
    assert df.count() == 45
    assert obs.get["n_rows"] == 45


def test_observed_stream_metrics_in_progress(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as f:
        for i in range(30):
            f.write(json.dumps({"tenant_id": f"t{i % 3}", "raw": f"r{i}"}) + "\n")
    schema = T.StructType(
        [T.StructField("tenant_id", T.StringType()), T.StructField("raw", T.StringType())]
    )
    stream = observed_stream(spark.readStream.schema(schema).json(src))
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # find the progress event carrying the observed metrics
    metrics = None
    for p in q.recentProgress:
        om = p.get("observedMetrics") if isinstance(p, dict) else p["observedMetrics"]
        if om and "ingest_metrics" in om:
            metrics = om["ingest_metrics"]
            break
    assert metrics is not None, "observed metrics missing from stream progress"
    assert metrics["n_records"] == 30
    assert metrics["n_null_payload"] == 0
    assert metrics["bytes_in"] == sum(len(f"r{i}") for i in range(30))


def test_metrics_log_listener_ships_observed_metrics(spark, tmp_path):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.observability import (
        MetricsLogListener,
    )

    src = str(tmp_path / "src2")
    os.makedirs(src)
    with open(os.path.join(src, "b0.json"), "w") as f:
        for i in range(12):
            f.write(json.dumps({"tenant_id": f"t{i % 2}", "raw": f"x{i}"}) + "\n")
    log_path = str(tmp_path / "metrics.jsonl")
    listener = MetricsLogListener(log_path)
    spark.streams.addListener(listener)
    try:
        schema = T.StructType(
            [T.StructField("tenant_id", T.StringType()), T.StructField("raw", T.StringType())]
        )
        stream = observed_stream(spark.readStream.schema(schema).json(src))
        q = (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered async — wait for the progress line
        import time as _t

        entries = []
        for _ in range(40):
            if os.path.exists(log_path):
                entries = [json.loads(l) for l in open(log_path) if l.strip()]
                if any(e["event"] == "progress" and e.get("observedMetrics") for e in entries):
                    break
            _t.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)
    progress = [e for e in entries if e["event"] == "progress" and e.get("observedMetrics")]
    assert progress, f"no progress with observed metrics shipped: {entries}"
    om = progress[0]["observedMetrics"]["ingest_metrics"]
    assert om["n_records"] == 12 and om["n_null_payload"] == 0


def test_read_parquet_resilient_skips_corrupt_file(spark, tmp_path):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.sources import (
        read_parquet_resilient,
    )

    root = str(tmp_path / "tbl")
    df0 = spark.range(100).repartition(4)
    df0.write.parquet(root)
    schema = df0.schema
    # corrupt one data file in place
    victim = next(
        f for f in sorted(os.listdir(root)) if f.endswith(".parquet")
    )
    with open(os.path.join(root, victim), "wb") as f:
        f.write(b"this is not parquet")
    import pytest as _pytest

    # default read fails loudly (corruption must be noticed)
    with _pytest.raises(Exception):
        spark.read.parquet(root).count()
    # resilient read degrades to the surviving files' rows
    n = read_parquet_resilient(spark, root, schema=schema).count()
    assert 0 < n < 100


def test_bench_gate_is_quiet_decision_table():
    """The quiet-host gate (bench.py) is a pure decision over
    (calibration attempts, steal pcts, best_known) — table-tested so
    records-integrity behavior can't silently regress."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import gate_is_quiet

    b = 0.111
    assert not gate_is_quiet([], [], b)                      # nothing probed
    assert gate_is_quiet([0.120], [5.0], b)                  # historical speed wins outright
    assert not gate_is_quiet([0.300], [0.1], b)              # one slow probe: not quiet
    # r14 (r13 verdict #4): the stable-probes escape is gone — it
    # blessed the 0.164 r13 window. Stability no longer beats the
    # 1.2x-best hard cap; different silicon declares SPARK_GRAFT_BEST_CAL.
    assert not gate_is_quiet([0.300, 0.305], [0.1, 0.1], b)  # stable but over cap: reject
    assert not gate_is_quiet([0.164, 0.164], [0.0, 0.0], b)  # the r13 window: reject
    assert not gate_is_quiet([0.300, 0.305], [0.1, 5.0], b)  # stable but stolen: contended
    assert not gate_is_quiet([0.500, 0.300], [0.1, 0.1], b)  # still improving: keep waiting
    assert not gate_is_quiet([0.300, 0.500], [0.1, 0.1], b)  # degrading: not quiet
    assert gate_is_quiet([0.500, 0.300, 0.125], [9.0, 3.0, 0.2], b)  # settled to quiet
    # different silicon path: the explicit per-host reference raises the cap
    assert gate_is_quiet([0.300, 0.305], [0.1, 0.1], 0.3)
