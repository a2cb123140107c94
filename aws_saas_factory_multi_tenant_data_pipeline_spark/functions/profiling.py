"""Table profiling: the null-rate / cardinality / min-max sweep an Athena
user runs before trusting a crawler-registered table (A6 adjunct).

One pass over the table, all columns profiled in a single aggregate — no
per-column jobs, so at 100 TB it costs one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.ShortType, T.DecimalType)


def profile_table(df: DataFrame) -> DataFrame:
    """Long-form profile: one row per column with count/nulls/distinct/min/max.

    min/max reported as strings so heterogeneous column types fit one
    schema; numeric min/max keep full precision via repr of the value.
    """
    rows = []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = f.name
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.approx_count_distinct(F.col(c)).alias(f"__ad_{c}"),
        ]
        if isinstance(f.dataType, _NUMERIC + (T.TimestampType, T.DateType, T.StringType)):
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
    wide = df.agg(*aggs).collect()[0]
    for f in df.schema.fields:
        c = f.name
        rows.append(
            (
                c,
                f.dataType.simpleString(),
                int(wide["__n"]),
                int(wide["__n"]) - int(wide[f"__nn_{c}"]),
                int(wide[f"__ad_{c}"]),
                wide[f"__min_{c}"] if f"__min_{c}" in wide.__fields__ else None,
                wide[f"__max_{c}"] if f"__max_{c}" in wide.__fields__ else None,
            )
        )
    return df.sparkSession.createDataFrame(
        rows,
        "column string, dtype string, n_rows long, n_nulls long, approx_distinct long, "
        "min_value string, max_value string",
    )
