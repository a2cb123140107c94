"""End-to-end LLM training-corpus ingest from compressed shards.

Demonstrates the r14 ingestion surface — how a user of this repo
ingests corpora the way they actually ship (.jsonl.zst / .jsonl.xz /
.jsonl.gz / .jsonl.bz2 / .jsonl.lz4 shards, The Pile / RedPajama /
FineWeb style), every decompressor the repo's own from-spec
implementation (operators/zstd.py, xz.py, lz4.py) or a stdlib
binding:

    shard files → explode_jsonl_shards (codec sniffed by magic,
    torn shards quarantined) → JSON parse → Gopher quality gate →
    exact dedup (xxhash64) → MinHash-LSH near-dup removal →
    token-budget selection → train/val/test split

Run:  python examples/corpus_ingest.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark import get_spark
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
    explode_jsonl_shards,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
    minhash_near_duplicates,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.selection import (
    budget_select,
    leakage_safe_split,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
    gopher_rules,
    token_count,
)


def _make_shards() -> list[tuple[int, bytes]]:
    """Synthesize 10 shards x 40 docs across all five codecs (in a real
    deployment these are spark.read.format('binaryFile') rows)."""
    import bz2
    import gzip
    import lzma

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lz4 import (
        lz4_compress,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
        zstd_compress_fixture,
    )

    import random

    words = ("model data training token corpus quality sample epoch "
             "gradient layer attention window batch shard filter the a "
             "of and in with for from research scaling careful").split()
    shards = []
    for sid in range(10):
        lines = []
        for j in range(40):
            did = sid * 40 + j
            rnd = random.Random(did)
            if did % 13 == 0:
                text = "#!$%" * 50  # symbol soup: Gopher drops it
            elif did % 7 == 0:
                # NEAR-duplicated content (same body, different id line —
                # exact dedup can't catch these; MinHash-LSH must)
                dup = random.Random(7)
                text = (f"doc {did}: "
                        + " ".join(dup.choice(words) for _ in range(120))
                        + ".")
            else:
                text = (f"document {did} reports that "
                        + " ".join(rnd.choice(words) for _ in range(120))
                        + ".")
            lines.append(json.dumps({"doc_id": did, "text": text}))
        blob = ("\n".join(lines) + "\n").encode()
        codec = sid % 5
        if codec == 0:
            payload = zstd_compress_fixture(blob, "lz")
        elif codec == 1:
            payload = lzma.compress(blob, preset=1)
        elif codec == 2:
            payload = gzip.compress(blob, mtime=0)
        elif codec == 3:
            payload = bz2.compress(blob)
        else:
            payload = lz4_compress(blob)
        shards.append((sid, payload))
    # one deliberately torn shard: the pipeline must quarantine, not die
    shards.append((99, shards[0][1][:20]))
    return shards


def main() -> None:
    spark = get_spark("corpus-ingest", cpus=4, shuffle_partitions=4)

    shards = spark.createDataFrame(
        [(sid, bytearray(p)) for sid, p in _make_shards()],
        "shard_id long, payload binary",
    )

    # 1. explode: one row per JSONL line, codec sniffed by magic
    lines = explode_jsonl_shards(shards)
    quarantined = lines.where(F.col("parse_error").isNotNull())
    docs = (
        lines.where(F.col("parse_error").isNull())
        .select(
            F.get_json_object("line", "$.doc_id").cast("long").alias("doc_id"),
            F.get_json_object("line", "$.text").alias("text"),
            "codec",
        )
    )
    n_docs = docs.count()
    n_quar = quarantined.count()
    print(f"exploded {n_docs} docs from 10 shards "
          f"({n_quar} shard(s) quarantined)")
    assert n_docs == 400 and n_quar == 1
    assert docs.select("codec").distinct().count() == 5

    # 2. quality gate (Gopher heuristics, pure codegen — no shuffle)
    scored = gopher_rules(docs).where(F.col("gopher_keep"))
    n_kept = scored.count()
    print(f"gopher quality gate kept {n_kept}/{n_docs}")
    assert n_kept < n_docs  # the symbol-soup docs are gone

    # 3. exact dedup on the hash, then MinHash-LSH near-dups
    exact = scored.dropDuplicates(["text"])
    pairs = minhash_near_duplicates(
        exact, num_hashes=32, bands=8, jaccard_threshold=0.8
    )
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    unique = exact.join(dupes, "doc_id", "left_anti")
    n_exact, n_unique = exact.count(), unique.count()
    print(f"dedup: {n_kept} -> exact {n_exact} -> near-dup-free {n_unique}")
    assert n_unique < n_exact  # the near-dup family needed MinHash

    # 4. token budget + leakage-safe split
    budgeted = budget_select(
        unique.withColumn("n_tokens", token_count(F.col("text")))
        .withColumn("quality_score", F.lit(1.0)),
        budget_tokens=20_000,
    ).where(F.col("is_selected"))
    final = leakage_safe_split(budgeted, pairs, id_col="doc_id")
    counts = {r["split"]: r["n"] for r in
              final.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total_tokens = final.agg(F.sum("n_tokens")).first()[0]
    print(f"budget-selected {sum(counts.values())} docs, "
          f"{total_tokens} tokens, splits={counts}")
    assert total_tokens <= 20_000

    spark.stop()
    print("corpus ingest pipeline OK")


if __name__ == "__main__":
    main()
