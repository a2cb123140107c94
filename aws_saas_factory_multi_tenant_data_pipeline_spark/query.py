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


#: masking rules for create_masked_view (stable policy vocabulary)
MASK_RULES = ("keep", "null", "hash", "partial")


def masked_projection(df: DataFrame, policies: dict[str, str], secret: str = "") -> DataFrame:
    """Apply column-masking policies to a DataFrame projection.

    Rules per column: ``keep`` (passthrough, the default for unlisted
    columns), ``null`` (redact entirely), ``hash`` (keyed md5 surrogate
    — deterministic, so joins/distincts on the masked view still work),
    ``partial`` (first 2 characters + '***', the call-center display
    form). Pure codegen'd projections; enforcement composes with
    tenant_scoped row-level isolation for the full row+column security
    story the pooled lake needs (the reference exposes raw rows via
    Athena, athena-stack.ts:16 — masking is what a cross-tenant or
    least-privilege share requires).
    """
    from pyspark.sql import functions as F

    cols = []
    for c in df.columns:
        rule = policies.get(c, "keep")
        if rule not in MASK_RULES:
            raise ValueError(f"unknown mask rule {rule!r} for column {c!r}")
        if rule == "keep":
            cols.append(F.col(c))
        elif rule == "null":
            cols.append(F.lit(None).cast(df.schema[c].dataType).alias(c))
        elif rule == "hash":
            cols.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(secret), F.lit(c), F.col(c).cast("string"))),
                        1,
                        16,
                    ),
                ).alias(c)
            )
        else:  # partial
            cols.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.concat(F.substring(F.col(c).cast("string"), 1, 2), F.lit("***")),
                ).alias(c)
            )
    return df.select(*cols)


def create_masked_view(
    spark: SparkSession,
    table: str,
    view: str,
    policies: dict[str, str],
    secret: str = "",
) -> None:
    """Register ``view`` as the masked projection of ``table`` — the
    grant-able object: readers query the view, never the base table.
    Identifiers are validated; the masking expressions are the same ones
    :func:`masked_projection` builds, so DataFrame and SQL consumers see
    identical redaction."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import _check_ident

    _check_ident(view, "view name")
    for part in table.split("."):
        _check_ident(part, "table name")
    base = spark.table(table)
    masked = masked_projection(base, policies, secret=secret)
    masked.createOrReplaceTempView(view)


# --- parameterized saved queries (A7 generalized) ---------------------------
# The reference ships ONE named query with the tenant id baked into the SQL
# string (athena-stack.ts:13-19); real Athena usage treats named queries as
# parameter-by-convention templates. This registry makes that contract
# explicit and SAFE: templates carry named :markers and execution goes
# through Spark 4's parameterized SQL, so values are bound server-side —
# never string-interpolated (the saved_query() helper above interpolates a
# validated TenantContext; arbitrary user parameters must come through
# here).

_SAVED_QUERIES: dict[str, str] = {}


def register_saved_query(name: str, sql_template: str) -> None:
    """Register a named SQL template with :param markers."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import _check_ident

    _check_ident(name, "saved query name")
    _SAVED_QUERIES[name] = sql_template


def run_saved_query(spark: SparkSession, name: str, **params) -> DataFrame:
    """Execute a registered template with bound (not interpolated)
    parameters. Unknown names raise; parameters bind via Spark's
    parameterized `spark.sql(sql, args=...)`, so a value like
    ``tenant-1' OR '1'='1`` stays a value."""
    if name not in _SAVED_QUERIES:
        raise KeyError(f"no saved query {name!r}; registered: {sorted(_SAVED_QUERIES)}")
    return spark.sql(_SAVED_QUERIES[name], args=params)


def list_saved_queries() -> dict[str, str]:
    return dict(_SAVED_QUERIES)
