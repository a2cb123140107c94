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
