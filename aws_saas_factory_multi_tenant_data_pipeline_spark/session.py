"""SparkSession factory with engine-wide defaults.

Scale posture: these configs are the local[N] test harness defaults; on a
real cluster the same code runs with cluster-provided parallelism. AQE is
on so skewed tenant keys / shuffle sizes re-plan at runtime (the reference
relies on Kinesis shard hashing by tenant — apigateway-stack.ts:126 — we
rely on AQE + explicit repartition-by-tenant before partitioned writes).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: number of local cores the harness uses (driver contract: SPARK_GRAFT_CPUS)
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def get_spark(
    app_name: str = "mtdp-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - UTC session timezone (oracle comparability; the reference stamps
      epoch-seconds UTC, FirehoseStreamingSinkJob.java:80)
    - AQE + skew-join handling on (tenant skew is the realistic case)
    - shuffle partitions sized to cores for local mode, not the 200 default
    - Arrow enabled for Pandas-UDF / toPandas paths
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Untagged parquet timestamp[us] (isAdjustedToUTC=false) must read as
        # TIMESTAMP, not TIMESTAMP_NTZ: the whole engine pins the session to
        # UTC, DuckDB's naive TIMESTAMP then agrees value-for-value, and
        # instant functions (unix_micros/unix_timestamp/...) stay applicable.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
