"""t2 gate rehearsal: every corpus query with an oracle must hash-match
DuckDB at the smoke scale factor (the driver runs the same comparison at
sf0.01; tools/oracle_check.py runs it standalone at any sf).
"""

from __future__ import annotations

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import load_all

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "oracle_check",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools", "oracle_check.py"),
)
oracle_check = importlib.util.module_from_spec(spec)
spec.loader.exec_module(oracle_check)

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_smoke):
    return oracle_check.duck_connect(sf_smoke)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, sf_smoke, name):
    spec = REGISTRY[name]
    sdf = spec.spark_fn(spark, sf_smoke).toPandas()
    ddf = duck.execute(spec.oracle).df()
    diff = oracle_check.compare(sdf, ddf)
    assert diff is None, f"{name}: {diff}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_smoke, name):
    df = REGISTRY[name].spark_fn(spark, sf_smoke)
    assert df.count() >= 0
    assert df.schema is not None
