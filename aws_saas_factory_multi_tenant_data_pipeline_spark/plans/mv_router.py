"""Materialized-view (rollup) routing: answer an aggregate request from a
precomputed rollup instead of the fact table when the rollup covers it.

`lake.maintain_rollup` keeps continuous aggregates fresh; this module
closes the loop by ROUTING queries onto them — the capability that makes
a rollup useful without every caller knowing it exists (Athena has no
equivalent; warehouses call it aggregate navigation / query rewrite).

Coverage rule (classic aggregate-rewrite):
- requested grouping dims ⊆ rollup dims (re-aggregation collapses the
  extra dims),
- every requested aggregate is derivable from the rollup's stored
  partials via a MERGEABLE combine: sum→SUM(sum), count→SUM(count),
  min→MIN(min), max→MAX(max), avg→SUM(sum)/SUM(count),
- filters reference rollup dims only (they then prune rollup rows —
  and, when the rollup is partitioned on those dims, partitions).

At 100 TB the routed plan reads |rollup| rows (hours × tenants) instead
of the fact table — typically a 4-6 order-of-magnitude scan reduction;
correctness holds because the stored partials form a commutative monoid
under the combine above (the same algebra `rollup_partial_merge` grades).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: combine rule per aggregate kind: how to re-aggregate a stored partial
_MERGE = {
    "sum": F.sum,
    "count": lambda c: F.sum(c),
    "min": F.min,
    "max": F.max,
}

#: direct evaluation against the fact table, for the fallback path
_DIRECT = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    # not mergeable from (sum/count/min/max) partials — always fact-direct
    "count_distinct": F.count_distinct,
}


@dataclass(frozen=True)
class RollupSpec:
    """A registered rollup: ``df`` holds one row per dims-tuple with the
    partial columns named in ``partials`` (out_name -> (kind, column))."""

    name: str
    df: DataFrame
    dims: tuple[str, ...]
    partials: dict[str, tuple[str, str]] = field(default_factory=dict)


@dataclass(frozen=True)
class AggRequest:
    """dims to group by; aggs: out_name -> (kind, source_col); optional
    dim-only filter column."""

    dims: tuple[str, ...]
    aggs: dict[str, tuple[str, str]]
    filter: Column | None = None
    filter_cols: tuple[str, ...] = ()


def _covers(req: AggRequest, spec: RollupSpec) -> dict[str, Column] | None:
    """Return the combine expressions if ``spec`` can answer ``req``."""
    if not set(req.dims) <= set(spec.dims):
        return None
    if not set(req.filter_cols) <= set(spec.dims):
        return None
    stored: dict[tuple[str, str], str] = {
        (kind, col): out for out, (kind, col) in spec.partials.items()
    }
    exprs: dict[str, Column] = {}
    for out, (kind, col) in req.aggs.items():
        if kind == "avg":
            s, c = stored.get(("sum", col)), stored.get(("count", col))
            if s is None or c is None:
                return None
            exprs[out] = (F.sum(s) / F.sum(c)).alias(out)
        elif kind in _MERGE and (kind, col) in stored:
            exprs[out] = _MERGE[kind](stored[(kind, col)]).alias(out)
        else:
            return None
    return exprs


def route(
    request: AggRequest,
    rollups: list[RollupSpec],
    fact: DataFrame,
) -> tuple[DataFrame, str | None]:
    """Answer ``request`` from the first covering rollup, else the fact
    table. Returns (result, rollup_name or None)."""
    for spec in rollups:
        exprs = _covers(request, spec)
        if exprs is not None:
            src = spec.df
            if request.filter is not None:
                src = src.where(request.filter)
            out = src.groupBy(*request.dims).agg(*exprs.values())
            return out, spec.name
    src = fact
    if request.filter is not None:
        src = src.where(request.filter)
    direct = [
        _DIRECT[kind](col).alias(out) for out, (kind, col) in request.aggs.items()
    ]
    return src.groupBy(*request.dims).agg(*direct), None
