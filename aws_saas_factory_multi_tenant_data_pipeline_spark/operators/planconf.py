"""Planner-configuration scopes shared by the iterative operators.

``fixed_plan_region`` disables adaptive query execution for a bounded
region of driver code and restores the previous setting on exit. Use it
around fixed-point loops and eager-checkpoint training regions whose
shapes are fully known ahead of time (persisted inputs with pinned
partitioning, node/centroid-sized frames): there AQE's per-shuffle
driver re-planning adds latency without moving any data differently —
measured on graph.pagerank's loop at sf0.1: 2.5 s -> 1.5 s (r15).

The region must MATERIALIZE its work inside the scope (eager
localCheckpoint / count / collect); a lazily-returned frame executes at
the caller's action, after the conf is restored. Scale posture: this is
not a local[N]-only tweak — the win is driver round-trips per
iteration, which a real cluster pays with higher RPC latency; inputs to
these regions are already partition-pinned caches, which is the one
thing AQE could otherwise improve.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def fixed_plan_region(sess: SparkSession):
    """Scope with spark.sql.adaptive.enabled=false, restored on exit."""
    before = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", before)
