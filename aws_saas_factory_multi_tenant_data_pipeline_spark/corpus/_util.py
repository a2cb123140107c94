"""Shared helpers for corpus queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aws_saas_factory_multi_tenant_data_pipeline_spark.sources import read_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # oracle determinism depends on UTC (FIXTURES.md §3); the driver may hand
    # us a session with a different default, so pin it on every table access
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, sf_dir, name)
