"""Skew-aware join strategies (SURVEY.md §7 risk register: tenant skew).

The reference physically partitions everything by tenant (Kinesis
partition key `apigateway-stack.ts:126`, S3 layout `kinesis-stack.ts:137`)
— which means ONE oversized tenant concentrates on one shard/prefix/task.
In Spark the same pathology appears in any shuffle join keyed on a skewed
column: every row of the hot key hashes to one reducer, and the stage
runs as long as that single task. AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin`) handles sort-merge joins after the fact;
SALTING is the declarative-plan fix that also covers shuffled-hash joins
and pre-AQE engines, and the only fix when one key exceeds a single
executor's memory.

Design (the standard two-sided recipe):
- detect hot keys with one map-side-combined ``groupBy(key).count()``
  over the probe side (the aggregate output is bounded by the key
  domain, tiny next to the fact table);
- probe side: rows with a hot key get a deterministic salt in
  ``[0, salt)`` derived from xxhash64 of the row's other columns — NOT
  the key (identical keys must spread) and NOT a random() (replays and
  retries must produce the same plan);
- build side: hot-key rows replicate ``salt`` times via
  ``explode(sequence(...))`` — replication is paid ONLY for hot keys,
  so the build side grows by |hot rows|·salt, not |rows|·salt;
- join on (key, salt). Result is row-identical to the unsalted join
  (verified by the ``join_skew_salted`` oracle), only the physical
  distribution changes: the hot key now occupies ``salt`` reducers.

At 100 TB: detection is one cheap pass; the salted shuffle moves the
same bytes as the plain join but spreads the hot key's partition over
``salt`` tasks, turning a stage bounded by max-key-frequency into one
bounded by max-key-frequency/salt.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEED = 42


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Keys whose frequency in ``df`` is at least ``min_count``.

    One aggregation with map-side partial combine; the output is bounded
    by the number of distinct hot keys (by definition few), safe to
    broadcast or collect.
    """
    return (
        df.groupBy(key).agg(F.count(F.lit(1)).alias("__freq"))
        .where(F.col("__freq") >= min_count)
        .select(key)
    )


def _probe_salt(df: DataFrame, key: str, salt: int) -> Column:
    """Deterministic salt in [0, salt) from the row's non-key columns.

    Hash everything EXCEPT the key: rows sharing the hot key must land in
    different buckets, and a pure function of the key would put them all
    in one. Rows identical in every column collapse onto one salt bucket
    — correct (they are the same row) though not load-spreading for a
    degenerate all-duplicate input.
    """
    others = [c for c in df.columns if c != key] or [key]
    return F.pmod(F.xxhash64(*[F.col(c) for c in others], F.lit(_SEED)), F.lit(salt)).cast("int")


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    hot_min_count: int | None = None,
) -> DataFrame:
    """Join ``probe`` (large, possibly key-skewed) with ``build`` on
    ``key``, spreading hot keys across ``salt`` shuffle partitions.

    ``hot_min_count``: only keys at least this frequent in ``probe`` are
    salted (the production pattern — replication cost is confined to hot
    keys). ``None`` salts every key (simpler plan: no detection pass;
    build side pays full ×salt replication — only sane when the build
    side is small but just over the broadcast threshold).

    Row-for-row equal to ``probe.join(build, key, how)`` for ``how`` in
    {inner, left}. Right/full outer are rejected: build-side rows are
    replicated, so unmatched build rows would surface ``salt`` times.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 2:
        raise ValueError("salt must be >= 2")

    if hot_min_count is not None:
        hot = F.broadcast(
            hot_keys(probe, key, hot_min_count).withColumn("__hot", F.lit(True))
        )
        p = probe.join(hot, key, "left").withColumn(
            "__salt",
            F.when(F.col("__hot").isNotNull(), _probe_salt(probe, key, salt)).otherwise(
                F.lit(0)
            ),
        ).drop("__hot")
        b = build.join(hot, key, "left").withColumn(
            "__salts",
            F.when(
                F.col("__hot").isNotNull(), F.sequence(F.lit(0), F.lit(salt - 1))
            ).otherwise(F.array(F.lit(0))),
        ).drop("__hot")
    else:
        p = probe.withColumn("__salt", _probe_salt(probe, key, salt))
        b = build.withColumn("__salts", F.sequence(F.lit(0), F.lit(salt - 1)))

    b = b.withColumn("__salt", F.explode("__salts")).drop("__salts")
    out = p.join(b, [key, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame,
    key: str,
    top_n: int = 10,
) -> DataFrame:
    """Key-skew diagnostic: the evidence behind the salted-join /
    AQE-skew decision, as a table.

    Returns one ``kind='summary'`` row (n_rows, n_keys, mean/max key
    mass, the max/mean skew ratio) plus the ``top_n`` heaviest keys with
    their share of all rows — the keys that would each land in one
    shuffle partition of any key-partitioned join or aggregation.

    Plan shape: one map-side-combined groupBy on the key, then the tiny
    per-key frame aggregates to one summary row and a TakeOrdered top-N
    — nothing after the first groupBy touches data-sized frames, so the
    report costs the same as ``count(DISTINCT key)``.
    """
    from pyspark.sql import functions as F

    per_key = df.groupBy(F.col(key).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = per_key.agg(
        F.sum("n").alias("__rows"),
        F.count(F.lit(1)).alias("__keys"),
        F.max("n").alias("__max"),
    )
    summary = totals.select(
        F.lit("summary").alias("kind"),
        F.lit(None).cast("string").alias("key"),
        F.col("__rows").cast("long").alias("n"),
        F.col("__keys").cast("long").alias("n_keys"),
        F.round(F.col("__rows").cast("double") / F.col("__keys"), 6).alias("mean_n"),
        F.lit(None).cast("double").alias("share"),
        # max/mean: >> 1 means one key dominates its shuffle partition
        F.round(
            F.col("__max") * F.col("__keys") / F.col("__rows").cast("double"), 6
        ).alias("skew_ratio"),
    )
    top = (
        per_key.crossJoin(F.broadcast(totals))
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(top_n)
        .select(
            F.lit("hot_key").alias("kind"),
            "key",
            F.col("n").cast("long").alias("n"),
            F.lit(None).cast("long").alias("n_keys"),
            F.lit(None).cast("double").alias("mean_n"),
            F.round(F.col("n").cast("double") / F.col("__rows"), 6).alias("share"),
            F.lit(None).cast("double").alias("skew_ratio"),
        )
    )
    return summary.unionByName(top).orderBy("kind", F.col("n").desc(), "key")
