"""Bottom-k (KMV) hash sample sketch — the quantile/sampling member of
the portable sketch family (HLL counts distincts, CMS counts
frequencies, Bloom answers membership; KMV SAMPLES).

The sketch is the k rows whose md5(seed:id) rank-hash is smallest — a
uniform-without-replacement row sample that is:

- **deterministic**: same rows in, same sketch out, any partitioning;
- **exactly mergeable**: bottom-k of a union == bottom-k over the
  shards' bottom-k's (the k smallest of the union are each the smallest
  within their own shard) — so per-shard / per-day sketches compose
  without error, and the merge property is ORACLE-CHECKED, not just
  property-tested;
- **bounded**: k rows regardless of input size;
- **SQL-replayable**: ORDER BY md5 LIMIT k — the whole sketch, the
  quantile estimates, and the KMV distinct estimate are plain SQL over
  the same parquet, so the driver hashes every sketch row.

Scale shape: Spark compiles ``orderBy(hash).limit(k)`` to
TakeOrderedAndProject — a per-partition top-k with a k-row driver merge,
ONE scan, no global sort, no shuffle of data rows. Estimates read the
k-row sketch only. (Bottom-k sketches: Bar-Yossef et al. 2002 /
Beyer et al. 2007 — public literature.)

Quantile estimation from the sample uses the type-1 (inverted-CDF)
definition — ``sorted[ceil(q·n)-1]`` — chosen because it is exactly
replayable in any engine (no interpolation-formula variance); rank
error is the sampling error O(1/sqrt(k)).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 16^13 = 2^52: a 13-hex-digit prefix is exact in a double (the same
#: constant the HLL/DSIR hashing uses — 15 digits silently rounds).
HASH_DENOM = float(16**13)


def _rank_hash(id_col: str, seed: str):
    return F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))


def bottomk_sketch(
    df: DataFrame,
    id_col: str,
    value_col: str,
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """Build the sketch: (row_id, value, rank_hash), the k rows with the
    smallest rank-hash. One scan, TakeOrderedAndProject, no shuffle."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        df.select(
            F.col(id_col).cast("string").alias("row_id"),
            F.col(value_col).cast("double").alias("value"),
            _rank_hash(id_col, seed).alias("rank_hash"),
        )
        .orderBy("rank_hash", "row_id")
        .limit(k)
    )


def merge_bottomk(sketches: list[DataFrame], k: int) -> DataFrame:
    """Union shard sketches and keep the k smallest — EXACTLY the sketch
    of the union (rows are distinct across shards by construction)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.orderBy("rank_hash", "row_id").limit(k)


def kmv_estimates(
    sketch: DataFrame,
    probs=(0.25, 0.5, 0.75, 0.9),
    k: int | None = None,
    pre_materialized: bool = False,
) -> DataFrame:
    """(stat, est) rows from a k-row sketch: type-1 quantile estimates of
    the value distribution, the KMV row-count estimate (n−1)/u_n with
    u_n = the largest retained hash as a fraction of hash space, and the
    sketch membership checksum (pins the exact sample, not just its
    aggregates). Everything is a deterministic function of the ≤k-row
    sketch — the windows below order k rows, never data.

    Pass ``k`` (the sketch capacity) to get the standard small-sketch
    behavior: when the sketch holds fewer than k rows it IS the whole
    population, so n_est is the exact count n — (n−1)/u_n would be
    biased (~n−1 in expectation) there.

    ``pre_materialized`` (r15): callers that already hold the sketch as
    a materialized (checkpointed/persisted) frame skip the internal
    checkpoint — re-checkpointing an already-materialized frame copies
    blocks and pays one extra driver job for nothing."""
    # one scan total: materialize the k-row sketch executor-side, then the
    # count and every estimate read k rows instead of re-running TakeOrdered
    if not pre_materialized:
        sketch = sketch.localCheckpoint(eager=True)
    n = sketch.count()
    if n == 0:
        raise ValueError("empty sketch")
    frac = F.conv(F.substring("rank_hash", 1, 13), 16, 10).cast("double") / HASH_DENOM
    ranked = sketch.select(
        "value",
        frac.alias("__frac"),
        F.row_number().over(Window.orderBy("rank_hash", "row_id")).alias("__r"),
    )
    by_value = ranked.select(
        "value",
        "__frac",
        "__r",
        F.row_number().over(Window.orderBy("value", "__r")).alias("__vr"),
    )
    # r15: ALL quantile rows come from ONE pass over the ranked frame —
    # the previous per-probs subframes each re-ran the two k-row window
    # sorts, so the assembled plan carried 2·|probs| redundant window
    # stages whose per-stage scheduling latency dominated the (k-row)
    # work. The literal (stat, target-rank) map is exploded per matching
    # row, so several probs hitting the SAME rank (tiny sketches) still
    # emit one row each, exactly as the per-probs subframes did.
    targets = [(f"q{int(q * 100)}", max(1, math.ceil(q * n))) for q in probs]
    tmap = F.array(
        *[
            F.struct(F.lit(s).alias("stat"), F.lit(c).alias("vr"))
            for s, c in targets
        ]
    )
    parts = [
        by_value.where(F.col("__vr").isin([c for _, c in targets]))
        .select(
            F.explode(F.filter(tmap, lambda t: t["vr"] == F.col("__vr"))).alias("__t"),
            "value",
        )
        .select(
            F.col("__t.stat").alias("stat"),
            F.round("value", 6).alias("est"),
        )
    ]
    # KMV row-count estimate from the largest retained hash; a sketch
    # that never filled (n < k) holds the entire population → exact n
    if k is not None and n < k:
        parts.append(
            ranked.limit(1).select(
                F.lit("n_est").alias("stat"),
                F.lit(float(n)).alias("est"),
            )
        )
    else:
        parts.append(
            ranked.where(F.col("__r") == n).select(
                F.lit("n_est").alias("stat"),
                F.round(F.lit(float(n - 1)) / F.col("__frac"), 6).alias("est"),
            )
        )
    # membership checksum: the sum of 52-bit hash prefixes identifies the
    # sample — summed as exact BIGINTs (≤ 2^52·k, no overflow, no float
    # order-dependence) and divided once at the end
    parts.append(
        sketch.agg(
            F.round(
                F.sum(F.conv(F.substring("rank_hash", 1, 13), 16, 10).cast("bigint"))
                .cast("double")
                / HASH_DENOM,
                6,
            ).alias("est")
        ).select(F.lit("hash_check").alias("stat"), "est")
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
