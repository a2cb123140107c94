"""Portable HyperLogLog (SURVEY.md §2 B4 approx-distinct, upgraded).

Spark's ``approx_count_distinct`` is correct but its sketch bytes are
engine-specific, so the corpus row could only ever be tolerance-tested
(the one ◐ the VERDICT kept flagging). This is the same upgrade the
MinHash/SimHash/count-min rows got: an md5-derived HLL whose EVERY step
is integer-exact and replayable in plain SQL, so the registers, the
merge, and the estimate itself are hash-checkable across engines.

Determinism contract (Flajolet et al. 2007 HLL, no bias correction —
both engines implement the same rule):

- hash: 52 bits from md5 (13 hex digits — exact in BIGINT and double);
- bucket = hash % m (m = 2^p), remainder h2 = hash div m (w = 52-p bits);
- rho = leading-zero count of h2 in w bits, plus 1 (h2 = 0 → w+1),
  computed by a GENERATED threshold CASE — no floating-point log2, whose
  exactness at power-of-two boundaries differs across libm builds;
- register[b] = max rho (idempotent → duplicate inserts are free, and
  sketches MERGE by per-bucket max — the mergeable-rollup property);
- the 2^-rho sum is kept in integer units of 2^-(w+1): ``units =
  2^(w+1-rho)`` summed as BIGINT (≤ m·2^(w+1) < 2^63), so the sum is
  order-independent — summing doubles would not be, once the exponent
  range exceeds the 53-bit mantissa;
- estimate = alpha_m·m²·2^(w+1) / sum_units: one IEEE division of two
  exactly-represented values, bit-identical in any engine; emitted
  UNROUNDED (rounding is the one step Spark and DuckDB disagree on).

Scale shape: one groupBy (group, bucket) with map-side combine — max is
the combiner — then one groupBy (group) over ≤ m rows per group. The
sketch itself is ≤ m rows per group and merges by union+max, so rollups
compose without re-scanning (same argument as the count-min counters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5-derived hash width (13 hex digits)
_HASH_BITS = 52


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_constants(p: int) -> tuple[int, int, float]:
    """(m, w, C) for precision p: bucket count, remainder bit width, and
    the combined estimate numerator alpha_m * m^2 * 2^(w+1) as the exact
    Python double both engines will parse from its repr."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    w = _HASH_BITS - p
    return m, w, _alpha(m) * m * m * float(1 << (w + 1))


def _hash52(col: Column, seed: str) -> Column:
    # the key is CAST TO STRING before hashing: integer and string keys
    # replay identically in any engine; float keys would not (double→text
    # rendering differs between Spark and DuckDB), so hash a rounded
    # decimal/string form of a float key instead
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), col.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")


def _rho(h2: Column, w: int) -> Column:
    """Leading-zero count + 1 over w bits — generated threshold chain,
    exact integer comparisons only."""
    expr = F.lit(w + 1)  # h2 == 0
    for r in range(w, 0, -1):  # rho = r when h2 >= 2^(w-r), checked low→high
        expr = F.when(h2 >= (1 << (w - r)), F.lit(r)).otherwise(expr)
    return expr


def _units(reg: Column, w: int) -> Column:
    """2^(w+1-reg) as BIGINT — generated CASE, no pow/shift-by-column."""
    expr = F.lit(None).cast("long")
    for r in range(1, w + 2):
        expr = F.when(reg == r, F.lit(1 << (w + 1 - r))).otherwise(expr)
    return expr


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    seed: str = "hll",
) -> DataFrame:
    """(group_cols..., bucket, reg) — the sketch as a table. Non-present
    buckets are implicit zeros (``hll_summary`` accounts for them), so
    the representation shards, unions, and rolls up like any table."""
    m, w, _ = hll_constants(p)
    g = list(group_cols or [])
    h = _hash52(F.col(key_col), seed)
    hb = df.where(F.col(key_col).isNotNull()).select(
        *g,
        # m is a power of two: mask/shift are the exact integer forms of
        # % m and div m (no float division anywhere near the hash bits)
        h.bitwiseAND(m - 1).cast("int").alias("bucket"),
        F.shiftright(h, p).alias("__h2"),
    )
    return hb.groupBy(*g, "bucket").agg(F.max(_rho(F.col("__h2"), w)).alias("reg"))


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge two sketches: union + per-bucket max. EXACTLY equals the
    sketch of the unioned inputs (property-tested)."""
    g = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*g, "bucket")
        .agg(F.max("reg").alias("reg"))
    )


def hll_summary(
    regs: DataFrame, group_cols: list[str] | None = None, p: int = 8
) -> DataFrame:
    """(group_cols..., registers_md5, n_empty, sum_units, hll_estimate):
    the whole sketch checksummed, the exact integer harmonic sum, and the
    raw HLL estimate (one IEEE division — unrounded on purpose)."""
    m, w, c_num = hll_constants(p)
    g = list(group_cols or [])
    per = regs.select(
        *g, "bucket", "reg", _units(F.col("reg"), w).alias("__u")
    )
    agg = per.groupBy(*g).agg(
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("bucket", "reg"))),
                    lambda s: F.concat_ws(
                        ":", s["bucket"].cast("string"), s["reg"].cast("string")
                    ),
                ),
                ",",
            )
        ).alias("registers_md5"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_empty"),
        (
            F.sum("__u") + (F.lit(m) - F.count(F.lit(1))) * F.lit(1 << (w + 1))
        ).cast("long").alias("sum_units"),
    )
    return agg.select(
        *g,
        "registers_md5",
        "n_empty",
        "sum_units",
        (F.lit(c_num) / F.col("sum_units").cast("double")).alias("hll_estimate"),
    )


# --- generated DuckDB twins --------------------------------------------------


def hll_oracle_sql(
    source_sql: str,
    key_expr: str,
    group_expr: str,
    p: int = 8,
    seed: str = "hll",
) -> str:
    """Generate the DuckDB replay of hll_registers → hll_summary over
    ``source_sql`` (a FROM-able fragment), grouping by ``group_expr`` and
    sketching ``key_expr``. Shares every constant with the Spark side."""
    m, w, c_num = hll_constants(p)
    rho = "CASE " + " ".join(
        f"WHEN h2 >= {1 << (w - r)} THEN {r}" for r in range(1, w + 1)
    ) + f" ELSE {w + 1} END"
    units = "CASE " + " ".join(
        f"WHEN reg = {r} THEN {1 << (w + 1 - r)}" for r in range(1, w + 2)
    ) + " END"
    return f"""
        WITH src AS ({source_sql}),
        h AS (
            SELECT {group_expr} AS grp,
                   CAST(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR)),
                                        1, 13)) AS BIGINT) AS hv
            FROM src WHERE {key_expr} IS NOT NULL),
        hb AS (SELECT grp, hv % {m} AS bucket, hv // {m} AS h2 FROM h),
        regs AS (
            SELECT grp, bucket, MAX({rho.replace('h2', 'h2')}) AS reg
            FROM hb GROUP BY 1, 2),
        per AS (SELECT grp, bucket, reg, {units} AS u FROM regs)
        SELECT grp,
               md5(string_agg(CAST(bucket AS VARCHAR) || ':' || CAST(reg AS VARCHAR),
                              ',' ORDER BY bucket)) AS registers_md5,
               CAST({m} - COUNT(*) AS BIGINT) AS n_empty,
               CAST(SUM(u) + ({m} - COUNT(*)) * {1 << (w + 1)} AS BIGINT) AS sum_units,
               {c_num!r} / CAST(SUM(u) + ({m} - COUNT(*)) * {1 << (w + 1)} AS DOUBLE)
                   AS hll_estimate
        FROM per
        GROUP BY grp
    """
