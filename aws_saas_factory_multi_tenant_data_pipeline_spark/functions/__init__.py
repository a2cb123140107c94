"""Scalar-function helpers shared by the query corpus (SURVEY.md §2 B7).

The oracle-determinism helpers implement FIXTURES.md §3: double aggregates
go through exact DECIMAL(38,6) summation then back to DOUBLE, which makes
Spark and DuckDB produce bit-identical results regardless of partition/sum
order. (A raw double sum is order-dependent; a decimal sum is exact. A
double's cast to decimal(38,6) rounds identically in both engines because
a binary double is never exactly on a decimal half-boundary.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Deterministic double sum: sum(cast(x as decimal(38,6))) :: double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic double mean: decimal-sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of dsum()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of davg()."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"
