"""Privacy / anonymity gates for multi-tenant analytics exports.

A SaaS analytics lake that exposes per-tenant aggregates (the reference's
Athena surface, `athena-stack.ts:16`) leaks identity when a released
group is too small: a (nation, market-segment) cell with one customer IS
that customer. The standard release gate is k-anonymity — every released
quasi-identifier combination must cover ≥ k individuals — optionally
strengthened with l-diversity (each released cell must also contain ≥ l
distinct values of the sensitive attribute, or the cell reveals the
sensitive value even at size k).

Scale shape: ONE groupBy on the quasi-identifier columns (map-side
partial aggregation; group count is bounded by the QI domain product,
tiny next to the input), then the suppression join broadcasts the
passing-cell list back — no second full shuffle. All codegen'd
built-ins; no UDFs, no collect of row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Per-QI-cell audit: group size, sensitive-value diversity, and the
    release verdict. ``is_k_anonymous`` = size ≥ k; ``is_l_diverse`` =
    distinct sensitive values ≥ l; ``releasable`` = both."""
    rep = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("group_n"),
        F.count_distinct(F.col(sensitive_col)).alias("sensitive_distinct"),
    )
    return rep.select(
        *qi_cols,
        "group_n",
        "sensitive_distinct",
        (F.col("group_n") >= k).alias("is_k_anonymous"),
        (F.col("sensitive_distinct") >= l).alias("is_l_diverse"),
        ((F.col("group_n") >= k) & (F.col("sensitive_distinct") >= l)).alias("releasable"),
    )


def generalized_release(
    df: DataFrame,
    levels: list[list[str]],
    k: int = 5,
    qi_sep: str = "/",
) -> DataFrame:
    """k-anonymity with a generalization ladder: cells failing k at the
    finest quasi-identifier level are retried at each coarser level
    (e.g. nation→region); rows still failing after the last level are
    suppressed into one '*' row. Returns (level, qi, group_n).

    Each rung is one groupBy over only the rows still unreleased, plus a
    broadcast semi-join on the (small) failing-cell list — the input is
    never scanned more than once per rung, and rung inputs shrink
    monotonically."""
    remaining = df
    outs: list[DataFrame] = []
    for lvl, cols in enumerate(levels):
        cells = remaining.groupBy(*cols).agg(F.count(F.lit(1)).alias("group_n"))
        outs.append(
            cells.where(F.col("group_n") >= k).select(
                F.lit(lvl).alias("level"),
                F.concat_ws(qi_sep, *[F.col(c).cast("string") for c in cols]).alias("qi"),
                "group_n",
            )
        )
        failing = cells.where(F.col("group_n") < k).select(*cols)
        remaining = remaining.join(F.broadcast(failing), on=cols, how="left_semi")
    suppressed = remaining.agg(F.count(F.lit(1)).alias("group_n")).select(
        F.lit(len(levels)).alias("level"), F.lit("*").alias("qi"), "group_n"
    )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.unionByName(suppressed).orderBy("level", "qi")


def suppress_non_anonymous(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Return only the rows belonging to releasable cells (cell-level
    suppression — the simplest k-anonymity enforcement). The passing-cell
    list is an aggregate over the QI domain, so the semi-join side is
    small and broadcasts."""
    ok = (
        k_anonymity_report(df, qi_cols, sensitive_col, k=k, l=l)
        .where(F.col("releasable"))
        .select(*qi_cols)
    )
    return df.join(F.broadcast(ok), on=qi_cols, how="left_semi")
