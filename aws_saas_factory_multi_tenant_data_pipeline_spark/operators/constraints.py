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

    Execution shape (this is the point): ALL row-level rules plus every
    row_count share ONE aggregation over ONE scan — the report rows are
    exploded from a single agg row, so no union branch re-executes the
    aggregate (a naive per-branch `SELECT ... FROM base` re-runs the
    scan once per rule; Spark does not dedupe identical aggregates
    across union branches). Each unique() adds exactly one keyed
    aggregate whose group counts yield BOTH the duplicate count and the
    row total — no joins back to the shared pass. Pinned by
    tests/test_plans.py::test_constraints_single_scan.
    """
    row_level = [c for c in constraints if c.violation is not None]
    uniques = [c for c in constraints if c.kind == "unique"]
    counts = [c for c in constraints if c.kind == "row_count"]
    if not (row_level or uniques or counts):
        raise ValueError("no constraints given")

    reports = []
    if row_level or counts:
        aggs = [F.count(F.lit(1)).alias("__total")]
        for i, c in enumerate(row_level):
            aggs.append(F.count(F.when(c.violation, 1)).alias(f"__v{i}"))
        base = df.agg(*aggs)
        structs = []
        for i, c in enumerate(row_level):
            structs.append(
                F.struct(
                    F.lit(c.name).alias("constraint"),
                    F.lit(c.kind).alias("kind"),
                    F.col(f"__v{i}").cast("long").alias("violations"),
                    F.col("__total").cast("long").alias("total_rows"),
                    (F.col(f"__v{i}") == 0).alias("passed"),
                )
            )
        for c in counts:
            lo_ok = F.lit(True) if c.min_rows is None else (F.col("__total") >= c.min_rows)
            hi_ok = F.lit(True) if c.max_rows is None else (F.col("__total") <= c.max_rows)
            ok = lo_ok & hi_ok
            structs.append(
                F.struct(
                    F.lit(c.name).alias("constraint"),
                    F.lit(c.kind).alias("kind"),
                    F.when(ok, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("violations"),
                    F.col("__total").cast("long").alias("total_rows"),
                    ok.alias("passed"),
                )
            )
        reports.append(
            base.select(F.explode(F.array(*structs)).alias("r")).select("r.*")
        )
    for c in uniques:
        # group counts give BOTH the duplicate mass and the row total —
        # one keyed aggregate, no join back to the shared pass
        g = df.groupBy(*c.key_cols).agg(F.count(F.lit(1)).alias("__cnt"))
        rep = g.agg(
            F.coalesce(
                F.sum(F.when(F.col("__cnt") > 1, F.col("__cnt") - 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("violations"),
            F.coalesce(F.sum("__cnt"), F.lit(0)).cast("long").alias("total_rows"),
        )
        reports.append(
            rep.select(
                F.lit(c.name).alias("constraint"),
                F.lit(c.kind).alias("kind"),
                "violations",
                "total_rows",
                (F.col("violations") == 0).alias("passed"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), reports).orderBy("constraint")


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity audit: child rows whose key has no parent.

    The cross-table complement of the single-table rule gate above — an
    append-only lake with no enforced constraints (the reference's, and
    any Firehose-style pipeline) accumulates orphans whenever producers
    race or deletes outpace children. One left-anti join on the key:
    partial-aggregated, no driver state; at 100 TB the parent side is a
    keys-only projection, so the shuffle carries 8-byte keys, not rows.
    """
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
