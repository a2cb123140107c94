"""PySpark-native multi-tenant analytics engine.

A from-scratch re-expression of the capabilities of
``aws-samples/aws-saas-factory-multi-tenant-data-pipeline`` (reference at
/root/reference, studied for behavior only) on Apache Spark:

- tenant-aware streaming/batch ingest with edge validation and enrichment
  (reference: FirehoseStreamingSinkJob.java:74-82, apigateway-stack.ts:91-111)
- Hive-partitioned data lake writes ``tenant=/year=/month=/day=/hour=``
  (reference: kinesis-stack.ts:137-162) with quarantine of bad records
- catalog registration + partition discovery (reference: glue-stack.ts:32-46)
- the full relational query surface the reference delegates to Athena SQL,
  expressed via Spark SQL / DataFrame so Catalyst optimizes it
- [EXT] LLM-data-pipeline operators: dedup (exact/MinHash/SimHash),
  similarity search, text analysis, multimodal column plumbing

Everything is declarative DataFrame/SQL; no custom execution machinery.
"""

from aws_saas_factory_multi_tenant_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
