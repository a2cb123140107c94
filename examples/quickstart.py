"""Quickstart: the full engine surface in one script.

Run:  python examples/quickstart.py

Walks the reference workflow (README.md steps 8-10 of
aws-samples/aws-saas-factory-multi-tenant-data-pipeline) end-to-end on
Spark, then the analytical + LLM-pipeline extensions:

1. ingest raw tenant events (validate → enrich → quarantine)
2. write the Hive-partitioned lake, register it in the catalog
3. run the tenant-scoped saved query (partition-pruned)
4. run analytics (TPC-H-shaped SQL) over the synthetic star schema
5. dedup + similarity-search over the documents/embeddings tables
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.ingest import ingest_batch
from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import register_table, write_lake
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import exact_dedup
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import cosine_topk
from aws_saas_factory_multi_tenant_data_pipeline_spark.query import tenant_scan
from aws_saas_factory_multi_tenant_data_pipeline_spark.sources import read_table
from aws_saas_factory_multi_tenant_data_pipeline_spark.tenancy import TenantContext

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("quickstart")
    lake_root = tempfile.mkdtemp(prefix="mtdp_quickstart_lake_")

    # 1-2: ingest + partitioned lake write (A1-A5)
    events = [
        ("acme", json.dumps({"Data": {"device": "TV", "event": "page_view", "region": "US"}})),
        ("acme", json.dumps({"Data": {"device": "phone", "event": "click", "region": "EU"}})),
        ("globex", json.dumps({"Data": {"device": "laptop", "event": "signup", "region": "US"}})),
        ("acme", "{malformed json"),  # → quarantine, never the lake
    ]
    raw = spark.createDataFrame(events, "tenant_id string, raw string")
    result = ingest_batch(raw)
    write_lake(result.valid, lake_root)
    print(f"lake written: {result.valid.count()} rows, quarantined: {result.quarantine.count()}")

    # 3: catalog + tenant-scoped saved query (A6/A7, partition-pruned)
    fq = register_table(spark, lake_root, "events_quickstart")
    acme = tenant_scan(spark, fq, TenantContext("acme"))
    print(f"tenant 'acme' sees {acme.count()} rows (others invisible)")

    # 4: the Athena-style analytical surface over the star schema
    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import load_all

    registry = load_all()
    registry["agg_pricing_summary"].spark_fn(spark, SF_DIR).show(6)

    # 5: LLM-pipeline extensions
    docs = read_table(spark, SF_DIR, "documents")
    print(f"exact-dedup: {docs.count()} docs -> {exact_dedup(docs).count()} unique")
    emb = read_table(spark, SF_DIR, "embeddings")
    from pyspark.sql import functions as F

    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cosine_topk(emb, queries, k=3).show()

    # 6: the end-to-end training-data prep flow (dedup -> quality gate ->
    # token budget packing) and the content-stable train/val/test split
    registry["llm_corpus_prep"].spark_fn(spark, SF_DIR).show(6)
    registry["llm_train_val_split"].spark_fn(spark, SF_DIR).show(9)

    # 7: data management (r4): quality gate, keyed upsert, SCD2, chunking
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.constraints import (
        check_constraints,
        in_range,
        not_null,
        unique,
    )

    orders = read_table(spark, SF_DIR, "orders")
    check_constraints(
        orders,
        [not_null("o_custkey"), in_range("o_totalprice", 0, 600000), unique(["o_orderkey"])],
    ).show(truncate=False)
    registry["lake_upsert_roundtrip"].spark_fn(spark, SF_DIR).show()
    registry["dim_scd2_apply"].spark_fn(spark, SF_DIR).show(6, truncate=False)
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import chunk_documents

    chunk_documents(docs.limit(3), chunk_tokens=16, overlap=4).show(6)

    # 8: round-4 flagships — portable SemDeDup, BPE train+encode,
    # snapshot time travel with a row-level change feed
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.bpe import (
        encode_documents,
        learn_merges,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.clustering import (
        semantic_dedup,
    )

    semantic_dedup(emb, n_clusters=4, iterations=1, tau=0.3).show(6)
    merges_df = learn_merges(spark, docs, 5)
    merges_df.show()
    merges = [(r["left_sym"], r["right_sym"]) for r in merges_df.collect()]
    encode_documents(docs, merges).show(4)

    from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import (
        read_snapshot,
        write_snapshot,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cdc import change_feed

    snap_root = tempfile.mkdtemp(prefix="mtdp_quickstart_snap_")
    write_snapshot(orders.limit(100).select("o_orderkey", "o_totalprice"), snap_root)
    write_snapshot(
        orders.limit(80).select("o_orderkey", (F.col("o_totalprice") + 1).alias("o_totalprice")),
        snap_root,
    )
    print("time travel v1 rows:", read_snapshot(spark, snap_root, 1).count())
    change_feed(spark, snap_root, 1, 2, ["o_orderkey"], ["o_totalprice"]).show(5)

    # 9: round-5 flagships — BM25 search from a persisted inverted index,
    # deterministic skew-salted join, ε-DP release, fixed-point PageRank
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.privacy import (
        dp_noisy_counts,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.skew import salted_join
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.textindex import (
        build_text_index,
        search_text_index,
    )

    tix_root = tempfile.mkdtemp(prefix="mtdp_quickstart_tix_")
    build_text_index(docs, tix_root)
    search_text_index(spark, tix_root, ["spark", "window"], k=5).show()

    dim = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    salted_join(orders, dim, "o_custkey", salt=4, hot_min_count=5).groupBy(
        "o_orderstatus"
    ).count().show()

    dp_noisy_counts(orders, ["o_orderstatus"], epsilon=1.0, seed="demo").show()

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.graph import pagerank

    edges = orders.limit(500).select(
        F.col("o_custkey").alias("src"), (F.col("o_orderkey") % 50).alias("dst")
    )
    pagerank(edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))), iters=2).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
