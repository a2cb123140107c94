"""Kinesis-replay Python data source (A1 parity): shard-parallel batch
reads, trim_horizon/latest start positions, batched streaming drain, and
composition with the A2 enrich step — the reference's
source → enrich pipeline (FirehoseStreamingSinkJob.java:62-66) with the
source itself now a native Spark data source.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.replay_source import (
    KinesisReplaySource,
    write_shards,
)


def _records(n=40, tenants=4):
    return [
        (
            f"tenant-{i % tenants}",
            json.dumps({"Data": {"device": f"dev{i % 3}", "event": f"evt{i}", "region": "US"}}),
        )
        for i in range(n)
    ]


def _register(spark):
    # idempotent for the shared session fixture
    try:
        spark.dataSource.register(KinesisReplaySource)
    except Exception:
        pass


def test_batch_read_is_shard_parallel(spark, tmp_path):
    src = str(tmp_path / "shards")
    write_shards(src, _records(40), n_shards=3)
    _register(spark)
    df = spark.read.format("kinesis_replay").option("path", src).load()
    assert df.count() == 40
    # one task per shard file (Kinesis consumer-per-shard model)
    assert df.rdd.getNumPartitions() == 3
    # sequence numbers are per-shard contiguous from 0
    seqs = df.groupBy("shard").agg(
        F.min("sequence_number").alias("lo"),
        F.max("sequence_number").alias("hi"),
        F.count("*").alias("n"),
    )
    for r in seqs.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_stream_trim_horizon_drains_all_in_batches(spark, tmp_path):
    src = str(tmp_path / "shards")
    write_shards(src, _records(30), n_shards=2)
    _register(spark)
    sdf = (
        spark.readStream.format("kinesis_replay")
        .option("path", src)
        .option("starting_position", "trim_horizon")
        .option("batch_size", "7")  # forces multiple micro-batches per shard
        .load()
    )
    # Python stream sources don't support Trigger.AvailableNow (Spark falls
    # back to one batch) — run continuous micro-batches and poll the sink
    q = (
        sdf.writeStream.format("memory")
        .queryName("replay_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.sql("SELECT count(*) c FROM replay_out").collect()[0]["c"] >= 30:
            break
        time.sleep(1)
    q.stop()
    got = spark.sql("SELECT * FROM replay_out").toPandas()
    assert len(got) == 30
    assert set(got["partition_key"]) == {f"tenant-{i}" for i in range(4)}
    # batch_size=7 over 2 shards ⇒ the 30 records cannot fit in one
    # micro-batch; at least 3 batches must have run
    assert len(q.recentProgress) >= 3


def test_stream_latest_skips_preexisting(spark, tmp_path):
    src = str(tmp_path / "shards")
    write_shards(src, _records(20), n_shards=2)
    _register(spark)
    sdf = (
        spark.readStream.format("kinesis_replay")
        .option("path", src)
        .option("starting_position", "latest")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("replay_latest_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM replay_latest_out").collect()[0]["c"] == 0


def test_replay_feeds_ingest_enrich(spark, tmp_path):
    """Full A1→A2 composition: replay source → validate → enrich; the
    partition key (authenticated tenant) becomes TenantId — never the
    payload."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.ingest import enrich, validate_raw

    src = str(tmp_path / "shards")
    write_shards(src, _records(24), n_shards=2)
    _register(spark)
    raw = (
        spark.read.format("kinesis_replay")
        .option("path", src)
        .load()
        .withColumnRenamed("data", "raw")
        .withColumnRenamed("partition_key", "tenant_id")
    )
    valid = validate_raw(raw).where(F.col("_valid"))
    out = enrich(valid, tenant=None, ingest_ts=1_700_000_000)
    rows = out.select("TenantId", "device", "event", "region", "timestamp").collect()
    assert len(rows) == 24
    assert all(r["TenantId"].startswith("tenant-") for r in rows)
    assert all(r["timestamp"] == 1_700_000_000 for r in rows)
