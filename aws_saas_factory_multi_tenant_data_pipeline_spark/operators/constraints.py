"""Declarative data-quality constraints (the pre-ingestion gate).

A training-data or analytics pipeline needs a cheap, declarative answer
to "is this batch sane?" before it lands: null checks, domains, ranges,
uniqueness, row counts. This is the deequ/dbt-tests shape expressed
Spark-first:

* every ROW-level constraint (not_null / accepted_values / in_range /
  matches / expression) compiles to ONE conditional-count aggregate, and
  all of them run in a SINGLE scan + single partial-aggregation pass —
  adding a constraint adds a column to the agg, not a job;
* UNIQUE constraints need their own keyed aggregate (a shuffle per
  distinct key set — the unavoidable cost of global uniqueness);
* the report is a small DataFrame (one row per constraint), so the gate
  composes with quarantine routing (`ingest.ingest_batch`) and alerting.

Deterministic by construction — counts only — so the whole report is
oracle-checkable against any SQL engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One named check. ``kind`` is the rule family; ``violation`` is a
    row-level predicate marking BAD rows (None for aggregate kinds)."""

    name: str
    kind: str
    violation: Column | None = None
    key_cols: tuple[str, ...] = ()
    min_rows: int | None = None
    max_rows: int | None = None


def not_null(col: str, name: str | None = None) -> Constraint:
    return Constraint(name or f"not_null({col})", "not_null", F.col(col).isNull())


def accepted_values(col: str, values: list, name: str | None = None) -> Constraint:
    return Constraint(
        name or f"accepted_values({col})",
        "accepted_values",
        ~F.col(col).isin(values) | F.col(col).isNull(),
    )


def in_range(col: str, lo, hi, name: str | None = None) -> Constraint:
    return Constraint(
        name or f"in_range({col})",
        "in_range",
        ~F.col(col).between(lo, hi) | F.col(col).isNull(),
    )


def matches(col: str, pattern: str, name: str | None = None) -> Constraint:
    return Constraint(
        name or f"matches({col})",
        "matches",
        ~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def expression(name: str, ok: Column) -> Constraint:
    """Custom row-level rule: ``ok`` is the predicate GOOD rows satisfy."""
    return Constraint(name, "expression", ~F.coalesce(ok, F.lit(False)))


def unique(cols: list[str], name: str | None = None) -> Constraint:
    return Constraint(
        name or f"unique({','.join(cols)})", "unique", None, key_cols=tuple(cols)
    )


def row_count(min_rows: int | None = None, max_rows: int | None = None) -> Constraint:
    return Constraint(
        f"row_count[{min_rows},{max_rows}]", "row_count", None,
        min_rows=min_rows, max_rows=max_rows,
    )


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate all constraints; returns (constraint, kind, violations,
    total_rows, passed) — one row per constraint, ordered by name.

    Row-level rules share one scan/aggregation; each unique() adds one
    keyed aggregate; row_count reuses the shared pass. At 100 TB the gate
    is a single map-side-combined pass over the batch plus one shuffle
    per uniqueness key set.
    """
    row_level = [c for c in constraints if c.violation is not None]
    uniques = [c for c in constraints if c.kind == "unique"]
    counts = [c for c in constraints if c.kind == "row_count"]

    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(row_level):
        aggs.append(F.count(F.when(c.violation, 1)).alias(f"__v{i}"))
    base = df.agg(*aggs)

    reports = []
    for i, c in enumerate(row_level):
        reports.append(
            base.select(
                F.lit(c.name).alias("constraint"),
                F.lit(c.kind).alias("kind"),
                F.col(f"__v{i}").alias("violations"),
                F.col("__total").alias("total_rows"),
                (F.col(f"__v{i}") == 0).alias("passed"),
            )
        )
    for c in counts:
        lo_ok = F.lit(True) if c.min_rows is None else (F.col("__total") >= c.min_rows)
        hi_ok = F.lit(True) if c.max_rows is None else (F.col("__total") <= c.max_rows)
        ok = lo_ok & hi_ok
        reports.append(
            base.select(
                F.lit(c.name).alias("constraint"),
                F.lit(c.kind).alias("kind"),
                F.when(ok, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("violations"),
                F.col("__total").alias("total_rows"),
                ok.alias("passed"),
            )
        )
    for c in uniques:
        dup = (
            df.groupBy(*c.key_cols)
            .count()
            .where(F.col("count") > 1)
            .agg(
                F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).cast("long").alias("dups")
            )
        )
        reports.append(
            dup.crossJoin(F.broadcast(base.select("__total"))).select(
                F.lit(c.name).alias("constraint"),
                F.lit(c.kind).alias("kind"),
                F.col("dups").alias("violations"),
                F.col("__total").alias("total_rows"),
                (F.col("dups") == 0).alias("passed"),
            )
        )
    if not reports:
        raise ValueError("no constraints given")
    return reduce(lambda a, b: a.unionByName(b), reports).orderBy("constraint")
