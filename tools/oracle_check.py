"""Local stand-in for the driver's t2 oracle gate.

Runs every corpus query in PySpark and its DuckDB oracle over the same
parquet tables, canonicalizes (columns sorted by name, rows sorted by all
columns), and compares values. Floats must match bit-for-bit — the corpus
is engineered for that (decimal-exact aggregation); any mismatch prints
the first differing rows.

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import load_all
from aws_saas_factory_multi_tenant_data_pipeline_spark.sources import TESTDATA_TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif isinstance(s.dtype, pd.api.types.pandas_dtype("object").__class__) or s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str | None:
    if len(spark_pdf) != len(duck_pdf):
        return f"row count {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            neq = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            try:
                neq = ~((av == bv) | (av.isna() & bv.isna()))
            except Exception:
                neq = av.astype(str) != bv.astype(str)
        if neq.any():
            i = int(np.argmax(neq.values))
            detail = f"col {c!r}: row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r} ({int(neq.sum())} diffs)"
            if pd.api.types.is_float_dtype(av):
                detail += f" maxabsdiff={np.nanmax(np.abs(av-bv)):.3e}"
            return detail
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all()
    spark = get_spark("oracle-check")
    con = duck_connect(sf_dir)
    n_pass = n_fail = n_noracle = 0
    for name, spec in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.spark_fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"---- {name}: no oracle (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            ddf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        diff = compare(sdf, ddf)
        if diff:
            print(f"FAIL {name}: {diff} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name} (rows={len(sdf)}) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
