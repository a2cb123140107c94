"""As-of and range joins (SURVEY.md §2 B3).

Athena/Presto has no as-of join; the engine defines one (latest right row
with right.ts ≤ left.ts per key) and implements it with the union+window
trick: ONE shuffle+sort per key column, no range-join explosion. That is
the 100 TB-safe plan — a naive range join then row_number would produce a
candidate blow-up proportional to |left|·|right-per-key|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row: values of the latest right row with ts ≤ left ts
    (``direction="backward"``, the default) or the earliest right row with
    ts ≥ left ts (``direction="forward"``). With ``tolerance_seconds``,
    a carried match further than the tolerance from the left timestamp is
    nulled out (pandas merge_asof semantics) — same single-shuffle plan,
    one extra carried column and a conditional projection.

    Implementation: tag and union both sides on (on, ts); a single
    ``last(..., ignoreNulls=True)`` window ordered by (ts, side) carries the
    most recent right-side values forward onto left rows (the forward
    variant simply reverses the time ordering). Right rows at an equal
    timestamp are visible to the left row (side ordering 0 < 1).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "__side",
        "__l",
        "__ts",
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        ).over(w).alias("__rts"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}") for c in right_cols],
    )
    within = F.lit(True)
    if tolerance_seconds is not None:
        ts_type = left.schema[left_ts].dataType.simpleString()
        if ts_type.startswith("timestamp"):
            gap_us = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__rts"))
        else:
            gap_us = (F.col("__ts") - F.col("__rts")).cast("double") * 1_000_000
        if direction == "forward":
            gap_us = -gap_us
        within = gap_us <= F.lit(tolerance_seconds * 1_000_000)
    out = carried.where(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[
            F.when(within, F.col(f"__rv_{c}"))
            .alias(c + suffix if c in lcols else c)
            for c in right_cols
        ],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | None,
    left_ts: str,
    right_start: str,
    right_end: str,
    how: str = "inner",
) -> DataFrame:
    """Theta/range join: left.ts ∈ [right.start, right.end], optional equi key.

    With an equi key Catalyst plans a hash/sort-merge join with the range as
    a post-filter (scales); without one it is a BroadcastNestedLoopJoin —
    fine only when one side is broadcast-small, which is the documented
    perf cliff (SURVEY.md §2 B3).
    """
    cond = (F.col(f"l.{left_ts}") >= F.col(f"r.{right_start}")) & (
        F.col(f"l.{left_ts}") <= F.col(f"r.{right_end}")
    )
    if on is not None:
        cond = (F.col(f"l.{on}") == F.col(f"r.{on}")) & cond
    return left.alias("l").join(right.alias("r"), cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (skewed) left side, replicate the
    right side across salt buckets.

    The realistic skew case for this engine is one giant tenant
    (SURVEY.md §4): hash-partitioning on the join key puts that tenant's
    rows in one task. Salting splits each key into ``salt_buckets``
    sub-keys; the right side is exploded ×buckets so every sub-key still
    finds its match. AQE's skew-join handles most cases automatically —
    this is the explicit recipe for when it can't (e.g. aggregation-free
    joins under a fixed partitioning).

    Delegates to :func:`operators.skew.salted_join` (deterministic
    row-content salt instead of the earlier rand(); replayable plans,
    same row-identical result). For the production hot-key-only variant
    (replication confined to skewed keys) call the skew module directly
    with ``hot_min_count``.
    """
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.skew import (
        salted_join as _impl,
    )

    return _impl(left, right, on, salt=salt_buckets, how=how, hot_min_count=None)


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Keyless interval join without the nested-loop cliff (SURVEY §2 B3).

    Buckets the value axis into fixed-width bins: each right interval
    explodes to every bin it overlaps, each left row maps to its single
    bin, the two sides equi-join on the bin id (hash/sort-merge — shuffles
    scale, nested loops don't), and the exact range predicate is re-checked
    post-join. A matching pair meets in exactly one bin (the left row's),
    so no dedup pass is needed. Inner join only.

    Cost model: right-side expansion = ceil(span / bin_width) + 1 rows per
    interval — pick bin_width near the typical interval span. Degenerate
    intervals (lo > hi) match nothing and are dropped up front (Spark's
    sequence() would otherwise descend).
    """
    if how != "inner":
        raise ValueError("binned_range_join supports how='inner' only")
    lb = left.withColumn("__bin", F.floor(F.col(left_val) / bin_width).cast("long"))
    rb = (
        right.where(F.col(right_lo) <= F.col(right_hi))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(right_lo) / bin_width).cast("long"),
                    F.floor(F.col(right_hi) / bin_width).cast("long"),
                )
            ),
        )
    )
    return (
        lb.join(rb, "__bin", "inner")
        .where((F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) <= F.col(right_hi)))
        .drop("__bin")
    )
