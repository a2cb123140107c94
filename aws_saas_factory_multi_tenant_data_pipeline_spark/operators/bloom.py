"""Portable Bloom filter for membership prefilters (SURVEY.md §2 B10).

The decontamination problem at 100 TB: "does this training document
contain any n-gram from the benchmark suite?" The exact answer is an
equi-join of corpus n-grams against the benchmark n-gram set — correct
but it shuffles every corpus n-gram. A Bloom filter built over the
benchmark set prefilters at scan speed: only rows with a `maybe` hit
proceed to the exact join, and the filter's one-sided error (no false
negatives) makes the composition exact. The same sketch serves any
membership prefilter (blocklists, seen-URL sets, dedup candidate gates).

Everything here is DETERMINISTIC and ENGINE-PORTABLE, like the MinHash/
DP/k-means portable paths: the k bit positions come from md5 (13 hex
digits = 52 bits, exact in a BIGINT and in a double), so DuckDB replays
the filter bit-for-bit and the corpus query oracle-checks both the build
and the probe — including the false-positive rows themselves.

Two probe forms, one contract:

- **broadcast probe** (`with_bloom_membership`): the filter collapses to
  ONE row holding a dense boolean array of m bits; membership is a pure
  per-row projection (`forall` over `element_at`) — zero shuffle, the
  right shape while m fits a broadcast (tens of millions of bits).
- **join probe** (`bloom_membership_join`): corpus values explode to
  their k positions and equi-join the distributed position table; a
  value is a member iff all k positions matched. No size bound — the
  position table shards like any table — at the cost of one shuffle.
  The two forms are equality-tested against each other.

Sizing: for n items at false-positive rate p, m = -n·ln(p)/ln(2)² bits
and k = (m/n)·ln(2) hashes (`bloom_params`).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for ``n_items`` at target false-positive rate ``fpp``.
    m is rounded up to a power of two so ``hash % m`` stays unbiased."""
    if n_items <= 0 or not 0 < fpp < 1:
        raise ValueError("need n_items > 0 and 0 < fpp < 1")
    m = -n_items * math.log(fpp) / (math.log(2) ** 2)
    m_bits = 1 << max(6, math.ceil(math.log2(m)))
    k = max(1, round(m_bits / n_items * math.log(2)))
    return m_bits, k


def bloom_positions(col: Column, m_bits: int, k: int, seed: str = "bloom") -> Column:
    """array<bigint> of the k bit positions for a value — md5-derived,
    replayable in any SQL engine (the portable-hash convention)."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(seed), F.lit(i), col.cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
            for i in range(k)
        ]
    )


def build_bloom(
    df: DataFrame, col: str, m_bits: int, k: int, seed: str = "bloom"
) -> DataFrame:
    """Build the filter as its SET-BIT POSITION table: (pos bigint),
    distinct. This is the distributed representation — it shards, unions
    (bloom union = position-set union), and diffs like any table; the
    dense broadcast array is derived from it at probe time. One explode +
    one distinct; NULL values contribute nothing."""
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(bloom_positions(F.col(col), m_bits, k, seed)).alias("pos"))
        .distinct()
    )


def _dense_bits(bloom: DataFrame, m_bits: int) -> DataFrame:
    """ONE row holding the m-bit filter as array<boolean> — the broadcast
    form (same collapsed-aggregate trick as the k-means centroid array)."""
    return bloom.agg(F.collect_set("pos").alias("__set")).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m_bits - 1)),
            lambda i: F.array_contains(F.col("__set"), i.cast("long")),
        ).alias("__bits")
    )


def with_bloom_membership(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int,
    seed: str = "bloom",
    out_col: str = "maybe_member",
) -> DataFrame:
    """Zero-shuffle probe: adds ``out_col`` (true iff ALL k bits are set
    — possibly a false positive, never a false negative). The filter
    broadcasts as one dense row; the corpus side is a narrow projection."""
    bits = _dense_bits(bloom, m_bits)
    pos = bloom_positions(F.col(col), m_bits, k, seed)
    member = F.forall(
        pos, lambda p: F.coalesce(F.element_at("__bits", (p + 1).cast("int")), F.lit(False))
    )
    return (
        df.crossJoin(F.broadcast(bits))
        .withColumn(out_col, F.when(F.col(col).isNotNull(), member))
        .drop("__bits")
    )


def bloom_membership_join(
    df: DataFrame,
    col: str,
    id_cols: list[str],
    bloom: DataFrame,
    m_bits: int,
    k: int,
    seed: str = "bloom",
    out_col: str = "maybe_member",
) -> DataFrame:
    """Distributed probe for filters too large to broadcast: explode each
    value's k positions, equi-join the position table, member iff all k
    matched. Returns ``id_cols + [col, out_col]`` (distinct on id_cols +
    col). Equality with the broadcast probe is property-tested."""
    probe = df.where(F.col(col).isNotNull()).select(
        *id_cols, col, F.explode(bloom_positions(F.col(col), m_bits, k, seed)).alias("pos")
    )
    hits = probe.join(bloom.withColumn("__hit", F.lit(1)), "pos", "left")
    return (
        hits.groupBy(*id_cols, col)
        .agg((F.count(F.lit(1)) == F.count("__hit")).alias(out_col))
    )
