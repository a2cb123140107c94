"""Slowly-changing-dimension type-2 versioning (history-preserving upsert).

The reference's lake keeps only current state (append-only Firehose
events); SaaS analytics over dimensions (tenant plans, user segments,
price lists) needs AS-OF correctness — SCD2 is the standard answer:
every change becomes a `[valid_from, valid_to)` version row, the open
version has ``valid_to IS NULL``.

The whole apply is one window pass over the changes plus one keyed
aggregate joined back to the current table — no iteration, no UDF, so it
is a plain shuffle-bounded batch job at any scale (the key shuffle is
shared by the window and the join under the same partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"


def scd2_apply(
    current: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "effective_ts",
) -> DataFrame:
    """Apply a changeset to an SCD2 dimension table.

    ``current`` carries the key columns, attribute columns, and the three
    bookkeeping columns (``valid_from``, ``valid_to`` nullable,
    ``is_current``). ``changes`` carries the key columns, the same
    attribute columns, and ``ts_col`` (the effective timestamp of the new
    version; several versions per key are allowed and ordered by it).

    Deterministic semantics:
      * each change row becomes a version: ``valid_from = ts``,
        ``valid_to = next change ts for the key`` (None for the last),
        ``is_current`` on the last;
      * a key's previously-open version closes at that key's FIRST change
        timestamp (``is_current`` drops);
      * rows of keys with no changes — open or closed — pass through
        unchanged; already-closed history is immutable.

    Ties on ``ts_col`` within a key are rejected (two versions of one key
    cannot share an effective instant — upstream must collapse them, e.g.
    with :func:`lake.upsert_partitioned`'s ``seq_col`` rule).
    """
    kcols = list(key_cols)
    dup = (
        changes.groupBy(*kcols, ts_col).count().where(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError(f"changes carry duplicate ({kcols}, {ts_col}) versions")

    w = Window.partitionBy(*kcols).orderBy(ts_col)
    new_versions = (
        changes.withColumn(VALID_FROM, F.col(ts_col))
        .withColumn(VALID_TO, F.lead(ts_col).over(w))
        .withColumn(IS_CURRENT, F.col(VALID_TO).isNull())
        .drop(ts_col)
    )
    first_change = changes.groupBy(*kcols).agg(F.min(ts_col).alias("__closes_at"))
    out_cols = [c for c in current.columns]
    closed = (
        current.join(first_change, kcols, "left")
        .withColumn(
            VALID_TO,
            F.when(
                F.col(IS_CURRENT) & F.col("__closes_at").isNotNull(),
                F.col("__closes_at"),
            ).otherwise(F.col(VALID_TO)),
        )
        .withColumn(
            IS_CURRENT,
            F.when(F.col("__closes_at").isNotNull(), F.lit(False)).otherwise(
                F.col(IS_CURRENT)
            ),
        )
        .drop("__closes_at")
    )
    return closed.select(*out_cols).unionByName(new_versions.select(*out_cols))


def as_of(dim: DataFrame, ts, key_cols: list[str] | None = None) -> DataFrame:
    """Point-in-time view of an SCD2 table: the version row of each key
    valid at ``ts`` (``valid_from <= ts < valid_to``, open-ended rows
    included). Partition-prunable when ``valid_from`` buckets the layout.
    """
    t = F.lit(ts)
    return dim.where(
        (F.col(VALID_FROM) <= t) & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t))
    )
