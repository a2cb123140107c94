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
