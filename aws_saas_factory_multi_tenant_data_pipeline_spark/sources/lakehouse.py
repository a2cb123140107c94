"""Lakehouse-format connectors (Delta / Iceberg / Hudi) — gated stubs.

The reference's lake is plain partitioned files on S3; table formats are
the natural upgrade at 100 TB (ACID compaction, snapshot reads). Their
jars are not on this container's classpath (SURVEY.md §7 / guide note), so
each connector probes for its runtime and raises a clear error locally
while remaining fully functional on a cluster that ships the jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class LakehouseUnavailable(RuntimeError):
    """Raised when the table-format runtime is not on the classpath."""


def _probe(spark: SparkSession, fmt: str, provider_class: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(provider_class)  # noqa: SLF001
    except Exception as exc:
        raise LakehouseUnavailable(
            f"{fmt} runtime not on the classpath; add the {fmt} jars "
            f"(spark.jars.packages) to enable this connector"
        ) from exc


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _probe(spark, "delta", "org.apache.spark.sql.delta.sources.DeltaDataSource")
    return spark.read.format("delta").load(path)


def write_delta(df: DataFrame, path: str, mode: str = "append", partition_by=()) -> None:
    _probe(df.sparkSession, "delta", "org.apache.spark.sql.delta.sources.DeltaDataSource")
    w = df.write.format("delta").mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _probe(spark, "iceberg", "org.apache.iceberg.spark.source.IcebergSource")
    return spark.read.format("iceberg").load(table)


def read_jdbc(spark: SparkSession, url: str, dbtable: str, **options) -> DataFrame:
    """Generic JDBC source (driver jar must be on the classpath)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    streaming: bool = True,
) -> DataFrame:
    """Kafka source standing in for the reference's Kinesis consumer (A1;
    FirehoseStreamingSinkJob.java:32-38 — LATEST start position ≈
    ``startingOffsets="latest"``). Needs the spark-sql-kafka jar."""
    _probe(spark, "kafka", "org.apache.spark.sql.kafka010.KafkaSourceProvider")
    reader = spark.readStream if streaming else spark.read
    return (
        reader.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
