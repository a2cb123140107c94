"""Dataset manifest / content fingerprinting (B10 data management).

Training-data pipelines need *dataset versioning*: a cheap, deterministic
answer to "is the corpus I trained on byte-identical to the one in the
lake today, and if not, which slice changed?". The fingerprint here is an
ORDER-INDEPENDENT modular sum of per-row content hashes, so it is stable
under repartitioning, shuffle order, and file layout — only actual
content changes move it — and it aggregates with map-side combine like
any sum (one shuffle at any scale). Per-group rows localize a drift to
the slice that changed; the rollup row is the whole-dataset version id.

Design notes:
- row hash = first 15 hex digits of md5 over a canonical field
  serialization (unit separator chr(31) between fields, chr(0) for NULL
  so ('a', NULL) never collides with ('a', '')) — 60 bits, replicable in
  any SQL engine (DuckDB twin: CAST('0x'||substr(md5(s),1,15) AS BIGINT)).
- group fingerprint = SUM(row_hash) mod (2^61 - 1), summed in decimal so
  no 64-bit overflow at any row count. Sum (not XOR) keeps duplicate-row
  multiplicity visible: two identical rows contribute twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: modulus for the order-independent content sum (Mersenne prime 2^61-1)
FINGERPRINT_MOD = (1 << 61) - 1

_SEP = chr(31)
_NULL = chr(0)


def row_content_hash(cols: list[str]) -> F.Column:
    """60-bit content hash of the canonical serialization of ``cols``."""
    canon = F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    )
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("decimal(38,0)")


def dataset_fingerprint(
    df: DataFrame,
    group_cols: list[str],
    content_cols: list[str],
    total_label: str = "__TOTAL__",
) -> DataFrame:
    """Per-group + whole-dataset content manifest.

    Returns one row per group plus a rollup total row (group cols =
    ``total_label``): ``n_rows``, ``content_fingerprint`` (the modular
    row-hash sum — the dataset version id), and ``content_chars``
    (serialized length sum, a cheap drift-magnitude signal).
    """
    hashed = df.select(
        *[F.col(c) for c in group_cols],
        row_content_hash(content_cols).alias("__h"),
        F.length(
            F.concat_ws(
                _SEP,
                *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in content_cols],
            )
        ).cast("long").alias("__len"),
    )
    agg = hashed.rollup(*group_cols).agg(
        F.count("*").alias("n_rows"),
        F.pmod(F.sum("__h"), F.lit(FINGERPRINT_MOD)).cast("long").alias(
            "content_fingerprint"
        ),
        F.sum("__len").alias("content_chars"),
    )
    # rollup emits intermediate grouping levels too when there are multiple
    # group cols; keep only full groups + the grand total
    if len(group_cols) > 1:
        full = F.lit(True)
        for c in group_cols:
            full = full & F.col(c).isNotNull()
        all_null = F.lit(True)
        for c in group_cols:
            all_null = all_null & F.col(c).isNull()
        agg = agg.where(full | all_null)
    return agg.select(
        *[F.coalesce(F.col(c).cast("string"), F.lit(total_label)).alias(c) for c in group_cols],
        "n_rows",
        "content_fingerprint",
        "content_chars",
    )


def manifest_diff(
    old: DataFrame,
    new: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Localize dataset drift between two manifests (``dataset_fingerprint``
    outputs): per slice, status ∈ added / removed / changed / unchanged plus
    the row-count delta.

    A full-outer join on the group key — two small inputs (one row per
    slice), so the diff costs nothing regardless of the datasets' size;
    that is the point of fingerprinting first.
    """
    o = old.select(
        *group_cols,
        F.col("n_rows").alias("old_rows"),
        F.col("content_fingerprint").alias("old_fp"),
    )
    n = new.select(
        *group_cols,
        F.col("n_rows").alias("new_rows"),
        F.col("content_fingerprint").alias("new_fp"),
    )
    j = o.join(n, group_cols, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), "added")
        .when(F.col("new_fp").isNull(), "removed")
        .when(F.col("old_fp") == F.col("new_fp"), "unchanged")
        .otherwise("changed")
    )
    return j.select(
        *group_cols,
        status.alias("status"),
        (F.coalesce(F.col("new_rows"), F.lit(0)) - F.coalesce(F.col("old_rows"), F.lit(0))).alias(
            "row_delta"
        ),
        "old_fp",
        "new_fp",
    )
