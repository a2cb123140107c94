"""Lakehouse-format and stream-infrastructure connectors — gated stubs.

The reference's lake is plain partitioned files on S3 and its stream is a
real Kinesis stream (kinesis-stack.ts:60-66); table formats are the
natural upgrade at 100 TB (ACID compaction, snapshot reads). None of the
connector jars are on this container's classpath (SURVEY.md §7 / guide
note), so each connector probes for its runtime and raises a clear error
locally — carrying the exact ``spark.jars.packages`` coordinate to fix it
— while remaining fully functional on a cluster that ships the jars.
The offline twin for the stream connectors is the ``kinesis_replay``
Python data source (sources/replay_source.py), which reproduces shard
semantics from captured files and is oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: spark.jars.packages coordinates per connector. <SCALA> is the build's
#: Scala binary version (2.12/2.13) and <SPARK>/<VER> the Spark minor /
#: connector release matching your cluster — e.g. on Spark 3.5 / Scala
#: 2.12: io.delta:delta-spark_2.12:3.2.0. Pass them at session build:
#:   SparkSession.builder.config("spark.jars.packages", ",".join([...]))
#: or spark-submit --packages.
CONNECTOR_PACKAGES: dict[str, str] = {
    "kafka": "org.apache.spark:spark-sql-kafka-0-10_<SCALA>:<SPARK>",
    "kinesis": (
        "software.amazon.kinesis:spark-streaming-sql-kinesis-connector_<SCALA>:<VER> "
        "(awslabs/spark-sql-kinesis-connector; registers format 'aws-kinesis')"
    ),
    "delta": "io.delta:delta-spark_<SCALA>:<VER>",
    "iceberg": "org.apache.iceberg:iceberg-spark-runtime-<SPARK>_<SCALA>:<VER>",
    "hudi": "org.apache.hudi:hudi-spark<SPARK>-bundle_<SCALA>:<VER>",
}


class LakehouseUnavailable(RuntimeError):
    """Raised when the table-format runtime is not on the classpath."""


def _unavailable(fmt: str, key: str) -> LakehouseUnavailable:
    return LakehouseUnavailable(
        f"{fmt} runtime not on the classpath; add "
        f"spark.jars.packages={CONNECTOR_PACKAGES.get(key, '<connector jar>')} "
        f"to enable this connector"
    )


def _probe(spark: SparkSession, fmt: str, provider_class: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(provider_class)  # noqa: SLF001
    except Exception as exc:
        raise _unavailable(fmt, fmt) from exc


def _probe_format(spark: SparkSession, format_name: str, key: str) -> None:
    """Probe by DataSource registry lookup — works for any connector
    regardless of its provider class name (service-loader registered)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: SLF001
            format_name, spark._jsparkSession.sessionState().conf()
        )
    except Exception as exc:
        raise _unavailable(format_name, key) from exc


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


def read_kinesis(
    spark: SparkSession,
    stream_name: str,
    region: str,
    starting_position: str = "LATEST",
    format_name: str = "aws-kinesis",
) -> DataFrame:
    """LIVE Kinesis source — the reference's actual A1 consumer
    (FirehoseStreamingSinkJob.java:32-38 starts at LATEST on the stream
    defined in kinesis-stack.ts:60-66). Needs the awslabs
    spark-sql-kinesis-connector jar (CONNECTOR_PACKAGES['kinesis']) plus
    AWS credentials in the environment; raises LakehouseUnavailable with
    the exact package coordinate otherwise. Offline twin with identical
    downstream semantics: sources/replay_source.py (``kinesis_replay``).
    """
    _probe_format(spark, format_name, "kinesis")
    return (
        spark.readStream.format(format_name)
        .option("streamName", stream_name)
        .option("region", region)
        .option("startingPosition", starting_position)
        .load()
    )
