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


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    secret: str,
    token_len: int = 16,
    prefix: str = "pn_",
) -> DataFrame:
    """Keyed pseudonymization: replace each value in ``cols`` with a
    deterministic surrogate ``prefix || md5(secret:column:value)[:token_len]``.

    Properties the multi-tenant export path needs (GDPR Art. 4(5)
    pseudonymisation; the reference exposes raw tenant rows via Athena,
    `athena-stack.ts:16`, so any cross-tenant or external share must
    tokenize identifiers first):

    - *referential integrity*: equal values map to equal tokens, so joins,
      groupBys and COUNT(DISTINCT) over the released data still work;
    - *column separation*: the column name is folded into the hash, so the
      same value in different columns yields different tokens (no
      cross-column linkage);
    - *keyed*: without ``secret`` the mapping cannot be enumerated by
      hashing candidate values (dictionary attack needs the key);
    - *non-reversible in-band*: no lookup table is materialized; re-identi-
      fication requires replaying the keyed hash over known plaintexts.

    NULLs stay NULL (they carry no identity). Scan-speed: one md5 per
    value, codegen'd, no shuffle, no UDF.
    """
    out = df
    for c in cols:
        tok = F.concat(
            F.lit(prefix),
            F.substring(
                F.md5(F.concat_ws(":", F.lit(secret), F.lit(c), F.col(c).cast("string"))),
                1,
                token_len,
            ),
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), tok))
    return out


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    seed: str,
    epsilon: float = 1.0,
    round_dp: int = 6,
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism.

    Per released cell: ``noisy_n = n + Laplace(0, 1/ε)`` (sensitivity of a
    count under add/remove-one adjacency is 1, so scale b = 1/ε). The
    noise draw is DERANDOMIZED: u ∈ (0,1) comes from the first 13 hex
    digits of ``md5(seed || cell key)``, then the inverse CDF
    ``-b·sign(u−½)·ln(1−2|u−½|)`` maps it to Laplace. Same seed + same
    cell → same noise, so releases are reproducible, retries don't leak
    extra ε (each re-run answers with the SAME draw — the
    privacy-accounting property a cached release needs), and the whole
    mechanism is replayable in any SQL engine (the ``privacy_dp_counts``
    oracle re-derives every noisy value in DuckDB).

    ``seed`` is KEY MATERIAL, not a tuning knob: the noise is a pure
    function of (seed, cell key), so anyone holding the seed can
    recompute and subtract every draw, voiding the ε guarantee. It is
    therefore a required parameter with no default — treat it like the
    pseudonymization secret (store in a secret manager, never in the
    released artifact or the query text shipped to consumers). The cell
    key folds in the group-column NAMES as well as values, so two
    releases over different groupings never reuse a draw just because
    their value strings collide (unaccounted noise correlation).

    One map-side-combined groupBy; noise math is codegen'd arithmetic on
    the aggregate output (rows = |cell domain|, tiny). Composition /
    budget tracking across releases is the caller's ledger; this emits a
    single ε-DP view. ``round_dp`` keeps cross-engine float equality.
    """
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    b = 1.0 / epsilon
    cell_key = F.concat_ws(
        "|",
        F.lit(seed),
        *[
            F.concat_ws("=", F.lit(c), F.col(c).cast("string"))
            for c in group_cols
        ],
    )
    # 13 hex digits = 52 bits — fits a double's 53-bit mantissa exactly, so
    # the cast is lossless and the DuckDB oracle sees the identical value.
    # (15 digits = 60 bits would silently round: doubles carry 53 bits.)
    u = (F.conv(F.substring(F.md5(cell_key), 1, 13), 16, 10).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 52)
    )
    centered = u - F.lit(0.5)
    sign = F.when(centered < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    noise = -F.lit(b) * sign * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    agg = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    return agg.select(
        *group_cols,
        F.round(F.col("n") + noise, round_dp).alias("noisy_n"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
