"""Deterministic sampling / sharding operators for LLM training-data
pipelines (SURVEY.md §2 B10 [EXT]).

Everything here is content-stable: sample membership, shard assignment and
within-shard order derive from md5 over the row key plus a fixed salt, never
from random() or partition layout — so results are identical across runs,
engines (the DuckDB oracles replicate the arithmetic), repartitioning, and
cluster sizes. That property is what makes these usable for train/val
splits and reproducible corpus subsets at 100 TB.

All hot paths are built-in-function compositions (JVM, codegen):
- hash_bucket: first 4 hex chars of md5(key||salt) mod n — the shared
  primitive (same trick as ``llm_train_val_split``).
- quota_sample: fixed-size deterministic sample per group (hash-ranked
  row_number ≤ n).
- domain_mix_resample: downsample over-represented groups toward a target
  mixture (uniform by default) via per-group acceptance rates on the hash.
- shuffle_shard: global deterministic shuffle — shard id + within-shard
  sort key for writing training shards in a reproducible random order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_key(col: Column, salt: str) -> Column:
    """md5(key || salt): the content-stable ordering/sampling key."""
    return F.md5(F.concat(col.cast("string"), F.lit(salt)))


def hash_bucket(col: Column, salt: str, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets): first 4 hex chars of
    md5(col||salt) as an integer, mod n_buckets. 65536 raw buckets give
    0.0015% rate granularity; identical arithmetic runs on any engine."""
    h = F.conv(F.substring(hash_key(col, salt), 1, 4), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def quota_sample(
    df: DataFrame,
    group_col: str = "source",
    n: int = 40,
    id_col: str = "doc_id",
    salt: str = ":quota-seed-7",
) -> DataFrame:
    """Fixed-size deterministic sample: exactly min(n, |group|) rows per
    group, chosen by hash rank (md5 of the id + salt, ties by id).

    Unlike ``df.sample`` this is content-stable (same rows every run and
    every engine) and exact-size. One shuffle (the per-group window).

    Scale note: ranking every row of a huge group through the window is
    wasteful when n << |group|; at 100 TB pre-filter with
    ``hash_bucket(id, salt, B) < ceil(safety * n * B / |group|)`` (a cheap
    narrow filter using approximate group counts) and rank only the
    survivors — the window then sorts ~safety·n rows per group instead of
    all of them. The final rank ≤ n keeps the result exact as long as the
    pre-filter keeps ≥ n rows per group.
    """
    w = Window.partitionBy(group_col).orderBy(hash_key(F.col(id_col), salt), F.col(id_col))
    return df.withColumn("sample_rank", F.row_number().over(w)).where(
        F.col("sample_rank") <= n
    )


def domain_mix_resample(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = ":mix-seed-3",
    target_shares: dict[str, float] | None = None,
    rate_buckets: int = 10_000,
) -> DataFrame:
    """Resample toward a target group mixture (uniform when ``target_shares``
    is None): over-represented groups are downsampled with per-group
    acceptance rate ``min(1, target_share·total / count_g)``, applied as a
    deterministic hash-bucket cut so membership is content-stable.

    This is the standard domain-mixing step of LLM corpus assembly (e.g.
    capping web crawl vs. books vs. code to a recipe). Plan shape: one
    groupBy over the data to count groups (tiny result), broadcast the
    rate dimension back, narrow filter — no extra full-data shuffle, safe
    at 100 TB. Rates are quantized to ``rate_buckets`` (default 1/10000)
    so the cut threshold is integer arithmetic on both engines.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("__cnt"))
    totals = counts.agg(
        F.sum("__cnt").alias("__total"), F.count("*").alias("__k")
    )
    dims = counts.crossJoin(F.broadcast(totals))
    if target_shares is None:
        share = F.lit(1.0) / F.col("__k").cast("double")
    else:
        share = F.lit(0.0)
        for g, s in sorted(target_shares.items()):
            share = F.when(F.col(group_col) == g, F.lit(float(s))).otherwise(share)
    rate = F.least(
        F.lit(1.0),
        share * F.col("__total").cast("double") / F.col("__cnt").cast("double"),
    )
    dims = dims.select(
        group_col,
        F.col("__cnt").alias("group_total"),
        F.floor(rate * rate_buckets).cast("long").alias("rate_bp"),
    )
    out = df.join(F.broadcast(dims), group_col)
    return out.where(
        hash_bucket(F.col(id_col), salt, rate_buckets) < F.col("rate_bp")
    )


def shuffle_shard(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = ":shard-seed-13",
) -> DataFrame:
    """Deterministic global shuffle for training-shard writes: every row
    gets a ``shard`` in [0, n_shards) and a ``shuffle_key`` (the md5 hash)
    that defines a reproducible pseudo-random order within the shard.

    Writing ``.repartition(n_shards, "shard").sortWithinPartitions(
    "shuffle_key")`` yields the classic "globally shuffled, shard-local
    sorted" training layout with exactly one shuffle, independent of input
    partitioning — rerunning on different cluster sizes produces
    byte-identical shards.
    """
    return df.withColumn("shuffle_key", hash_key(F.col(id_col), salt)).withColumn(
        "shard", hash_bucket(F.col(id_col), salt, n_shards)
    )


def temperature_mixture_plan(
    df: DataFrame,
    token_count_col: str = "n_tokens",
    source_col: str = "source",
    total_budget: int = 1_000_000,
    alpha: float = 0.5,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Token-budget planning for a multi-source training mix: temperature-
    flattened sampling weights (the XLM-R / mBERT alpha-sampling rule)
    plus data-constrained epoch caps (Muennighoff et al. 2023: repeating
    data beyond ~4 epochs stops helping).

    Per source: natural share p_s = tokens_s / N; mixture weight
    w_s = p_s^alpha / sum(p^alpha) (alpha<1 upweights small sources);
    target_tokens = w_s * total_budget; epochs = target / available;
    planned_tokens caps at max_epochs passes over the source, shortfall
    reports the unmet budget that would need reallocation.

    Plan shape: one groupBy(source) aggregate, one 1-row broadcast for the
    corpus totals — the planner costs two tiny shuffles at any corpus size.
    """
    per_src = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(token_count_col)).cast("long").alias("available_tokens"),
    )
    totals = per_src.agg(
        F.sum("available_tokens").alias("__N"),
    )
    with_p = per_src.crossJoin(F.broadcast(totals)).withColumn(
        "__p", F.col("available_tokens") / F.col("__N")
    )
    # sum of p^alpha needs a second 1-row broadcast (it depends on per-source p)
    z = with_p.agg(F.sum(F.pow("__p", F.lit(alpha))).alias("__Z"))
    planned = (
        with_p.crossJoin(F.broadcast(z))
        .withColumn("weight", F.pow("__p", F.lit(alpha)) / F.col("__Z"))
        .withColumn(
            "target_tokens", F.floor(F.col("weight") * total_budget).cast("long")
        )
        .withColumn(
            "planned_tokens",
            F.least(
                F.col("target_tokens"),
                F.floor(F.col("available_tokens") * F.lit(float(max_epochs))).cast("long"),
            ),
        )
    )
    return planned.select(
        source_col,
        "n_docs",
        "available_tokens",
        F.round("weight", 6).alias("weight"),
        "target_tokens",
        F.round(F.col("target_tokens") / F.col("available_tokens"), 6).alias("epochs"),
        "planned_tokens",
        (F.col("target_tokens") - F.col("planned_tokens")).alias("shortfall_tokens"),
    )
