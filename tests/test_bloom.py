"""Portable Bloom filter: sizing, one-sided error, probe-form equality."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.bloom import (
    bloom_membership_join,
    bloom_params,
    build_bloom,
    with_bloom_membership,
)


def test_bloom_params_sizing():
    m, k = bloom_params(10_000, 0.01)
    assert m & (m - 1) == 0  # power of two
    assert m >= -10_000 * math.log(0.01) / math.log(2) ** 2
    assert 1 <= k <= 20
    import pytest

    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(500).select(F.concat(F.lit("m"), "id").alias("v"))
    others = spark.range(500, 3000).select(F.concat(F.lit("m"), "id").alias("v"))
    m_bits, k = bloom_params(500, 0.02)
    bloom = build_bloom(members, "v", m_bits, k)
    # every member MUST hit (one-sided error)
    probed = with_bloom_membership(members, "v", bloom, m_bits, k)
    assert probed.where(~F.col("maybe_member")).count() == 0
    # non-members hit at roughly the designed rate (generous bound)
    fp = with_bloom_membership(others, "v", bloom, m_bits, k)
    rate = fp.where(F.col("maybe_member")).count() / 2500
    assert rate < 0.1, rate
    # NULL values stay NULL, not false
    nulls = spark.createDataFrame([(None,)], "v string")
    row = with_bloom_membership(nulls, "v", bloom, m_bits, k).collect()[0]
    assert row["maybe_member"] is None


def test_bloom_probe_forms_agree(spark):
    df = spark.range(2000).select(
        F.col("id").alias("rid"), F.concat(F.lit("x"), (F.col("id") % 700)).alias("v")
    )
    members = spark.range(300).select(F.concat(F.lit("x"), "id").alias("v"))
    m_bits, k = 2048, 3
    bloom = build_bloom(members, "v", m_bits, k)
    bc = {
        (r["rid"], r["v"]): r["maybe_member"]
        for r in with_bloom_membership(df, "v", bloom, m_bits, k).collect()
    }
    jn = {
        (r["rid"], r["v"]): r["maybe_member"]
        for r in bloom_membership_join(df, "v", ["rid"], bloom, m_bits, k).collect()
    }
    assert bc == jn and len(bc) == 2000


def test_bloom_union_is_position_union(spark):
    a = spark.range(100).select(F.concat(F.lit("a"), "id").alias("v"))
    b = spark.range(100).select(F.concat(F.lit("b"), "id").alias("v"))
    m_bits, k = 1024, 3
    u1 = build_bloom(a.unionByName(b), "v", m_bits, k)
    u2 = build_bloom(a, "v", m_bits, k).unionByName(build_bloom(b, "v", m_bits, k)).distinct()
    assert u1.exceptAll(u2).count() == 0 and u2.exceptAll(u1).count() == 0
