"""Oracle-checkable queries for the Tier-A rows that previously had only
e2e/unit coverage: A5 error routing + A8 edge validation (the
valid/quarantine split as a countable dataflow) and A9 auth→tenant
extraction (claim parsing + expiry as a dataflow twin of
``tenancy.from_claims``).

Both construct deterministic raw inputs FROM the events fixture (defect
classes keyed on event_id) so the DuckDB oracle can state the expected
outcome from the contract spec alone — any engine-side validation drift
breaks the hash.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "ingest_quarantine_split",
    oracle="""
        WITH raw AS (
            SELECT event_id, event_type, event_id % 5 AS defect FROM events),
        judged AS (
            -- the A8 contract (apigateway-stack.ts:91-136): required string
            -- fields device/event/region; defect 3 = numeric device (type
            -- violation), defect 4 = missing region
            SELECT event_type,
                   CASE WHEN defect IN (3, 4) THEN 'quarantined' ELSE 'valid' END AS status
            FROM raw)
        SELECT status,
               CASE WHEN status = 'valid' THEN event_type ELSE '__all__' END AS bucket,
               COUNT(*) AS n
        FROM judged
        GROUP BY 1, 2
        ORDER BY status, bucket
    """,
    tags=("A5", "A8"),
    doc="A5/A8 as a gradable dataflow: deterministic defects injected into "
    "raw JSON built from events (defect 3 = numeric device, defect 4 = "
    "missing region), run through the REAL ingest_batch validate/split; "
    "oracle states the contract outcome per defect class.",
)
def ingest_quarantine_split(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.ingest import ingest_batch

    e = t(spark, sf_dir, "events")
    m = F.pmod(F.col("event_id"), F.lit(5))
    raw_json = F.concat(
        F.lit('{"Data":{"device":'),
        F.when(m == 3, F.lit("123")).otherwise(
            F.concat(F.lit('"dev'), F.pmod("user_id", F.lit(5)).cast("string"), F.lit('"'))
        ),
        F.lit(',"event":"'),
        F.col("event_type"),
        F.lit('"'),
        F.when(m == 4, F.lit("")).otherwise(F.lit(',"region":"US"')),
        F.lit("}}"),
    )
    raw = e.select(raw_json.alias("raw"), F.lit("tenant-0").alias("tenant_id"))
    res = ingest_batch(raw, ingest_ts=1700000000)
    valid = (
        res.valid.groupBy(F.col("event").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(F.lit("valid").alias("status"), "bucket", "n")
    )
    quarantined = res.quarantine.agg(F.count("*").alias("n")).select(
        F.lit("quarantined").alias("status"), F.lit("__all__").alias("bucket"), "n"
    )
    return valid.unionByName(quarantined).orderBy("status", "bucket")


@register(
    "tenant_claims_extract",
    oracle="""
        WITH claims AS (
            SELECT event_id,
                   '{"custom:tenantId":"tenant-' || CAST(user_id % 4 AS VARCHAR)
                       || '","exp":' || CAST(epoch_us(ts) // 1000000 + 1800 AS VARCHAR) || '}'
                       AS claims_json,
                   ts
            FROM events),
        parsed AS (
            SELECT json_extract_string(claims_json, '$."custom:tenantId"') AS tenant_id,
                   CAST(json_extract(claims_json, '$.exp') AS BIGINT) AS exp
            FROM claims)
        SELECT tenant_id,
               COUNT(*) FILTER (WHERE exp >= 1735689600) AS n_valid,
               COUNT(*) FILTER (WHERE exp <  1735689600) AS n_expired
        FROM parsed
        GROUP BY tenant_id
        ORDER BY tenant_id
    """,
    tags=("A9",),
    doc="A9 as a gradable dataflow twin of tenancy.from_claims "
    "(lambda_authorizer/app.py:20-21,63-67): per-row claims JSON built from "
    "events, tenant extracted via JSON path, exp compared to a fixed 'now' "
    "(2025-01-01) — expired claims counted separately, never silently kept.",
)
def tenant_claims_extract(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    claims_json = F.concat(
        F.lit('{"custom:tenantId":"tenant-'),
        F.pmod("user_id", F.lit(4)).cast("string"),
        F.lit('","exp":'),
        (F.unix_timestamp("ts") + 1800).cast("string"),
        F.lit("}"),
    )
    now_fixed = 1735689600  # 2025-01-01T00:00:00Z, mid-fixture so both sides occur
    parsed = e.select(
        F.get_json_object(claims_json, "$['custom:tenantId']").alias("tenant_id"),
        F.get_json_object(claims_json, "$.exp").cast("long").alias("exp"),
    )
    return (
        parsed.groupBy("tenant_id")
        .agg(
            F.count(F.when(F.col("exp") >= now_fixed, 1)).alias("n_valid"),
            F.count(F.when(F.col("exp") < now_fixed, 1)).alias("n_expired"),
        )
        .orderBy("tenant_id")
    )


@register(
    "replay_source_scan",
    oracle="""
        SELECT 'shard-' || CAST(user_id % 4 AS VARCHAR) || '.jsonl' AS shard,
               COUNT(*) AS n,
               CAST(COUNT(DISTINCT 'tenant-' || CAST(user_id % 4 AS VARCHAR)) AS BIGINT)
                   AS n_keys,
               CAST(SUM(event_id) AS BIGINT) AS id_sum
        FROM events
        GROUP BY 1
        ORDER BY shard
    """,
    tags=("A1", "B1"),
    doc="A1 stream-source parity as a gradable batch scan: events sharded "
    "into 4 Kinesis-like JSONL shard files (partition_key = tenant), read "
    "back through the KinesisReplaySource Python data source (one input "
    "partition per shard, payloads never transit the driver), aggregated "
    "per shard — any loss, reorder-sensitivity, or key corruption in the "
    "source breaks the hash.",
)
def replay_source_scan(spark, sf_dir):
    import shutil

    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus.sources_sinks import _SCRATCH
    from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.replay_source import (
        KinesisReplaySource,
    )

    try:
        spark.dataSource.register(KinesisReplaySource)
    except Exception:
        pass  # already registered in this session
    e = t(spark, sf_dir, "events")
    shard_dir = os.path.join(_SCRATCH, "a1_replay_shards")
    shutil.rmtree(shard_dir, ignore_errors=True)
    os.makedirs(shard_dir, exist_ok=True)
    for s in range(4):
        rec = F.to_json(
            F.struct(
                F.concat(F.lit("tenant-"), F.pmod("user_id", F.lit(4)).cast("string")).alias(
                    "partition_key"
                ),
                F.col("event_id").cast("string").alias("data"),
            )
        )
        tmpd = os.path.join(_SCRATCH, f"a1_shard_tmp{s}")
        (
            e.where(F.pmod("user_id", F.lit(4)) == s)
            .select(rec.alias("value"))
            .coalesce(1)
            .write.mode("overwrite")
            .text(tmpd)
        )
        part_file = next(f for f in os.listdir(tmpd) if f.startswith("part-"))
        shutil.move(os.path.join(tmpd, part_file), os.path.join(shard_dir, f"shard-{s}.jsonl"))
        shutil.rmtree(tmpd)
    replayed = spark.read.format("kinesis_replay").option("path", shard_dir).load()
    return (
        replayed.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("partition_key").cast("long").alias("n_keys"),
            F.sum(F.col("data").cast("long")).cast("long").alias("id_sum"),
        )
        .orderBy("shard")
    )
