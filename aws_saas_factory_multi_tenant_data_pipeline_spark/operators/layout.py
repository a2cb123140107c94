"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

Hive-style partitioning (lake.py, reference `kinesis-stack.ts:137-138`)
prunes on the partition columns only. When queries filter on TWO
non-partition dimensions (customer AND date, tenant AND device), sorting
by either one leaves the other scattered across every file — min/max
file statistics prune nothing for the second predicate. Z-ordering
interleaves the bits of both dimensions into one sort key, so each file
covers a small RECTANGLE of the (a, b) space and per-file min/max stats
become selective for both predicates at once. This is the OPTIMIZE
ZORDER BY of Delta/Iceberg, expressed with nothing but built-in bit ops
and repartitionByRange.

Determinism: bucketing is explicit min/max scaling with caller-supplied
ranges (no sampled quantiles), so the key — and therefore the oracle —
is a pure function of the row. The curve math is plain shift/and/or,
codegen'd, replayable in any SQL engine.

Scale shape: one range-shuffle on the z-key (Spark samples range bounds;
at 100 TB that is the same shuffle a plain sort-write costs), sorted
within partitions so parquet row-group stats are tight too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(
    col: Column, lo: Column | float, hi: Column | float, bits: int
) -> Column:
    """Scale a numeric column into [0, 2^bits) with explicit bounds
    (floats, or Columns when the bounds come from a broadcast min/max
    row); values outside clamp to the edge buckets."""
    n = 1 << bits
    lo_c = F.lit(float(lo)) if not isinstance(lo, Column) else lo.cast("double")
    hi_c = F.lit(float(hi)) if not isinstance(hi, Column) else hi.cast("double")
    scaled = F.floor((col.cast("double") - lo_c) / (hi_c - lo_c) * n)
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), scaled)).cast("long")


def interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton interleave of two ``bits``-wide bucket ids: a's bit i lands
    at position 2i+1, b's at 2i. A flat sum of shift/and terms — fully
    inside whole-stage codegen, no UDF."""
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        # Column.bitwiseAND/OR — Python's & | on Columns mean boolean logic
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i))
    return z


def zorder_key(
    col_a: Column, lo_a: Column | float, hi_a: Column | float,
    col_b: Column, lo_b: Column | float, hi_b: Column | float,
    bits: int = 8,
) -> Column:
    """Z-curve key over two numeric dimensions with explicit ranges."""
    return interleave_bits(
        bucketize(col_a, lo_a, hi_a, bits), bucketize(col_b, lo_b, hi_b, bits), bits
    )


def zorder_key_sql(
    expr_a: str, lo_a: str, hi_a: str,
    expr_b: str, lo_b: str, hi_b: str,
    bits: int = 8,
) -> str:
    """DuckDB twin of zorder_key — same clamp, same interleave. Bounds
    are SQL expressions (e.g. columns of a cross-joined min/max CTE)."""
    n = 1 << bits

    def bucket(expr: str, lo: str, hi: str) -> str:
        return (
            f"LEAST({n - 1}, GREATEST(0, CAST(FLOOR((CAST({expr} AS DOUBLE) - CAST({lo} AS DOUBLE))"
            f" / (CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE)) * {n}) AS BIGINT)))"
        )

    a, b = bucket(expr_a, lo_a, hi_a), bucket(expr_b, lo_b, hi_b)
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    key: Column,
    out_path: str,
    num_files: int = 8,
) -> None:
    """Rewrite ``df`` range-partitioned AND sorted by the z-key, so both
    file-level and row-group-level min/max stats are tight rectangles."""
    (
        df.withColumn("__z", key)
        .repartitionByRange(num_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
