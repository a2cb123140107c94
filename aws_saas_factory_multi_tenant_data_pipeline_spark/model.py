"""Schemas for the tenant event pipeline and the lake tables.

The reference's edge contract (apigateway-stack.ts:91-111; README.md:83-89)
requires ``Data.{device,event,region}``, all strings. Post-enrichment rows
additionally carry ``TenantId`` and epoch-second ``timestamp``
(FirehoseStreamingSinkJob.java:79-81) and are lake-partitioned by
``tenant=/year=/month=/day=/hour=`` (kinesis-stack.ts:137-138,153-154).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: client payload: the only part the client controls ({"Data": {...}})
DATA_STRUCT = T.StructType(
    [
        T.StructField("device", T.StringType(), False),
        T.StructField("event", T.StringType(), False),
        T.StructField("region", T.StringType(), False),
    ]
)

#: full request envelope as POSTed: {"Data": {...}}
ENVELOPE_SCHEMA = T.StructType([T.StructField("Data", DATA_STRUCT, False)])

#: enriched lake row (flattened, as the Firehose jq step exposes it)
LAKE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("event", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("TenantId", T.StringType(), False),
        T.StructField("timestamp", T.LongType(), False),  # epoch seconds
    ]
)

#: Hive partition columns, in physical order (kinesis-stack.ts:137-138)
PARTITION_COLS = ["tenant", "year", "month", "day", "hour"]

#: required fields inside Data (edge validation, A8)
REQUIRED_DATA_FIELDS = ("device", "event", "region")
