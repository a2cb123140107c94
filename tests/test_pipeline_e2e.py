"""Reference-parity end-to-end pipeline test (SURVEY.md §5 item 2).

Encodes README Steps 8-10 of the reference as code: ingest N synthetic
(tenant, Data) events → validate/enrich → partitioned lake write → catalog
registration → tenant-scoped query, plus quarantine routing and the
partition-pruning plan assertion (§5 item 4).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.ingest import ingest_batch
from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import (
    register_table,
    write_lake,
    write_quarantine,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.plans import assert_partition_pruned
from aws_saas_factory_multi_tenant_data_pipeline_spark.query import saved_query, tenant_scan
from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import TenantContext


def _raw_records(spark, tenants=("acme", "globex"), n_per=20, with_bad=True):
    rows = []
    for t_i, tenant in enumerate(tenants):
        for i in range(n_per):
            rows.append(
                (
                    tenant,
                    json.dumps(
                        {
                            "Data": {
                                "device": ["TV", "phone", "laptop"][i % 3],
                                "event": f"evt_{i % 5}",
                                "region": ["US", "EU"][i % 2],
                            }
                        }
                    ),
                )
            )
    if with_bad:
        rows.append(("acme", "{not valid json"))
        rows.append(("acme", json.dumps({"Data": {"device": "TV"}})))  # missing fields
        rows.append(("acme", json.dumps({"other": 1})))  # missing Data
    return spark.createDataFrame(rows, "tenant_id string, raw string")


def test_ingest_validate_enrich(spark):
    raw = _raw_records(spark)
    res = ingest_batch(raw, ingest_ts=1700000000)
    valid = res.valid.toPandas()
    bad = res.quarantine.toPandas()
    assert len(valid) == 40
    assert len(bad) == 3
    # A2: enrichment fields present, epoch-seconds timestamp
    assert set(["event", "region", "device", "TenantId", "timestamp"]).issubset(valid.columns)
    assert (valid["timestamp"] == 1700000000).all()
    # A4: zero-padded partition strings derived from the timestamp (UTC)
    assert (valid["year"] == "2023").all()
    assert (valid["month"] == "11").all()
    assert (valid["hour"] == "22").all()
    # tenant comes from the auth context column, never the payload
    assert set(valid["TenantId"]) == {"acme", "globex"}


def test_lake_layout_catalog_and_tenant_query(spark, tmp_path):
    root = str(tmp_path / "lake")
    raw = _raw_records(spark)
    res = ingest_batch(raw, ingest_ts=1700000000)
    write_lake(res.valid, root)
    write_quarantine(res.quarantine, root, "validation-failed")

    # (a) physical layout: tenant=/year=/month=/day=/hour= (kinesis-stack.ts:137-138)
    p = os.path.join(root, "tenant=acme", "year=2023", "month=11", "day=14", "hour=22")
    assert os.path.isdir(p), os.listdir(root)
    # (d) quarantine at error/<type>/ (kinesis-stack.ts:139)
    assert os.path.isdir(os.path.join(root, "error", "validation-failed"))

    # (c) catalog registration + tenant-scoped read (A6 + A7)
    fq = register_table(spark, root, "events_e2e")
    scan = tenant_scan(spark, fq, TenantContext("acme"))
    got = scan.toPandas()
    assert len(got) == 20
    assert set(got["tenant"]) == {"acme"}
    # partition pruning must be visible in the physical plan (§5 item 4)
    assert_partition_pruned(scan, "tenant", "acme")
    # saved-query parity (SELECT * … WHERE tenant='X')
    assert saved_query(spark, fq, TenantContext("globex")).count() == 20


def test_tenant_isolation_property(spark, tmp_path):
    root = str(tmp_path / "lake2")
    raw = _raw_records(spark, tenants=("t1", "t2", "t3"), n_per=10, with_bad=False)
    res = ingest_batch(raw, ingest_ts=1700000000)
    write_lake(res.valid, root)
    fq = register_table(spark, root, "events_iso")
    for tenant in ("t1", "t2", "t3"):
        got = tenant_scan(spark, fq, TenantContext(tenant)).select("tenant").distinct().collect()
        assert [r["tenant"] for r in got] == [tenant]


def test_json_lake_parity_format(spark, tmp_path):
    """fmt='json' produces JSON-lines files like the reference's Firehose sink."""
    root = str(tmp_path / "jlake")
    raw = _raw_records(spark, with_bad=False)
    res = ingest_batch(raw, ingest_ts=1700000000)
    write_lake(res.valid, root, fmt="json")
    part_dir = os.path.join(root, "tenant=acme", "year=2023", "month=11", "day=14", "hour=22")
    files = [f for f in os.listdir(part_dir) if f.endswith(".json")]
    assert files
    line = open(os.path.join(part_dir, files[0])).readline()
    rec = json.loads(line)
    assert {"event", "region", "device", "TenantId", "timestamp"} <= set(rec)


def test_strict_type_validation_rejects_coerced_json(spark):
    """A8 strict contract parity (apigateway-stack.ts:130-136): a JSON
    number/boolean in a required string field is quarantined, not coerced —
    from_json alone would stringify it."""
    rows = [
        ("acme", json.dumps({"Data": {"device": "TV", "event": "e", "region": "US"}})),
        ("acme", json.dumps({"Data": {"device": 123, "event": "e", "region": "US"}})),
        ("acme", json.dumps({"Data": {"device": "TV", "event": True, "region": "US"}})),
    ]
    raw = spark.createDataFrame(rows, "tenant_id string, raw string")
    strict = ingest_batch(raw, ingest_ts=1700000000)
    assert strict.valid.count() == 1
    assert strict.quarantine.count() == 2
    loose = ingest_batch(raw, ingest_ts=1700000000, strict_types=False)
    assert loose.valid.count() == 3
