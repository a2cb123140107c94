"""Capture .explain("formatted") for headline queries into plans/<round>/
(round from $SPARK_GRAFT_PLANS_ROUND, default r16).

Usage:
    python tools/capture_plans.py before [query ...]   # default: all HEADLINE
    python tools/capture_plans.py after  [query ...]

Writes plans/r15/<query>_<tag>.txt. The optimization judge reads these
files to check plan claims (Exchange counts, join strategies, pushed
filters) against the code — capture BEFORE touching a query and AFTER
the change lands.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import load_all


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    if not names:
        import bench

        names = list(bench.HEADLINE)
    registry = load_all()
    spark = get_spark("capture-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for name in names:
        df = registry[name].spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
