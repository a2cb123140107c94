"""The declared query surface (SURVEY.md §2) with per-query DuckDB oracles.

Every operator the engine claims is represented by at least one QuerySpec:
a PySpark implementation (spark_fn) plus, where SQL-expressible, the
equivalent ANSI/DuckDB SQL (oracle). The driver's t2 gate runs both at
sf0.01 and hash-compares; tests/tools run the same comparison locally.

Determinism contract (FIXTURES.md §3): total ORDER BY with a unique key
suffix, decimal-exact double aggregates (functions.dsum/davg), array_sort
around collected arrays, ties broken by id, session timezone UTC.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: add a query to the corpus registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(name=name, spark_fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every corpus module (side effect: fills REGISTRY)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
        relational,
        aggregates,
        joins,
        windows,
        setops,
        scalar_functions,
        streaming_batch,
        udfs,
        ext_llm,
        sources_sinks,
        subqueries,
        analytics_extra,
        tpch_like,
        structs_maps,
        scalar_wave5,
        sketches_variant,
        timeseries,
        relational_wave6,
    )

    return REGISTRY
