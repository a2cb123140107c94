"""Query layer: tenant-scoped reads (A7) + plan-level isolation guarantees.

The reference's entire query surface is Athena SQL; its one saved query is
``SELECT * FROM "multi-tenant-db"."T" WHERE tenant='TENANTID'``
(athena-saved-query-stack.ts:13-19). Spark equivalent: a catalog/table read
with a partition-pruned tenant filter. The broader relational surface lives
in the corpus/ package (SURVEY.md §2 Tier B) — it is plain Spark SQL /
DataFrame, optimized by Catalyst; this module only adds the tenancy
invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import TenantContext


def tenant_scan(spark: SparkSession, table: str, tenant: TenantContext) -> DataFrame:
    """A7: tenant-scoped scan. The filter hits the partition column so Catalyst
    prunes ``tenant=X`` directories (PruneFileSourcePartitions) — verified by
    ``assert_partition_pruned`` in plans/.
    """
    return spark.table(table).where(F.col("tenant") == F.lit(tenant.tenant_id))


def tenant_scoped(df: DataFrame, tenant: TenantContext, col: str = "tenant") -> DataFrame:
    """Row-level tenant isolation for arbitrary DataFrames."""
    return df.where(F.col(col) == F.lit(tenant.tenant_id))


def saved_query(spark: SparkSession, table: str, tenant: TenantContext) -> DataFrame:
    """The reference's named query, verbatim semantics (SELECT * … WHERE tenant=…)."""
    return spark.sql(f"SELECT * FROM {table} WHERE tenant = '{tenant.tenant_id}'")  # noqa: S608
