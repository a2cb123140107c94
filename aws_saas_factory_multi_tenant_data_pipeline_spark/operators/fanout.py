"""Scan fan-out for compute-heavy operators over few-partition inputs.

Guide §2.5 "input skew": a single (or few-file) parquet table arrives
from the scan as 1-2 partitions, so every expression-heavy pipeline
downstream — regex tokenization, shingling, 64-aggregate signatures,
per-row cosine argmax — runs on 1-2 of the session's cores. Measured
r16 on the sf1 fixture (documents/embeddings scan = 2 partitions,
local[32]): minhash 8.9 s → 3.1 s, bm25 1.8 s → 1.0 s, semantic_dedup
6.3 s → 1.3 s from ONE hash-repartition after the read; row-identical
results at every scale factor (hash partitioning only relocates rows,
and every consumer is either keyed aggregation or per-row projection).

The seam is CONDITIONAL, so it is scale-adaptive rather than a
local[32] tune: when the scan already yields at least half the
session's shuffle parallelism (the normal case at real scale, where the
table is thousands of files), no byte moves. The repartition hashes an
id column — deterministic under retries (guide §2.5 warns only about
rand-derived keys), and no sort-before-repartition cost (that applies
to round-robin, not hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out_scan(df: DataFrame, by: str) -> DataFrame:
    """Hash-repartition ``df`` by column ``by`` to the session's shuffle
    parallelism iff the frame's current physical parallelism is less
    than half of it. Returns ``df`` unchanged otherwise.

    ``df.rdd.getNumPartitions()`` compiles the physical plan (driver
    work, no job) — call this on scan-shaped frames, not on frames with
    expensive lineage.
    """
    sess = df.sparkSession
    try:
        target = int(sess.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # non-numeric conf (never in this engine's sessions)
        return df
    if df.rdd.getNumPartitions() * 2 > target:
        return df
    # UNSIZED repartition on purpose: AQE (coalescePartitions with
    # parallelismFirst, the session default) sizes the exchange from the
    # observed bytes — a few partitions at sf0.1, ~cores at sf1 — so the
    # seam self-scales instead of pinning the local core count (guide §2
    # "scale-adaptive, not a constant"). A sized repartition(target, col)
    # was measured to inflate every downstream stage to `target` tasks at
    # fixture scale (+0.7 s of scheduling on bm25 at sf0.1) for no sf1
    # gain over the AQE-sized form.
    return df.repartition(F.col(by))
