"""Unit tests for portable k-means / SemDeDup / IVF (operators/clustering.py)
and the BPE trainer (operators/bpe.py) against independent pure-Python
references."""

from __future__ import annotations

import collections
import math

import pytest
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.bpe import (
    encode_documents,
    learn_merges,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.clustering import (
    ivf_topk_portable,
    kmeans_portable,
    semantic_dedup,
)


def test_kmeans_assignment_is_argmax(spark, sf_smoke):
    emb = t(spark, sf_smoke, "embeddings")
    assigned = kmeans_portable(emb, n_clusters=4, iterations=1)
    rows = assigned.select("vec_id", "cluster_id", "centroid_cosine", "embedding").collect()
    assert len(rows) == emb.count()
    assert {r["cluster_id"] for r in rows} <= set(range(4))
    # a vector's stored cosine is its max over all final centroids:
    # no other assignment row may beat its own cluster's cosine
    assert all(r["centroid_cosine"] <= 1.0 + 1e-9 for r in rows)


def test_kmeans_lloyd_improves_or_holds_mean_cosine(spark, sf_smoke):
    emb = t(spark, sf_smoke, "embeddings")
    m0 = (
        kmeans_portable(emb, n_clusters=4, iterations=0)
        .agg(F.avg("centroid_cosine"))
        .collect()[0][0]
    )
    m1 = (
        kmeans_portable(emb, n_clusters=4, iterations=1)
        .agg(F.avg("centroid_cosine"))
        .collect()[0][0]
    )
    # Lloyd re-centering should not make the average member->centroid
    # cosine worse (it maximizes within-cluster coherence)
    assert m1 >= m0 - 1e-6


def test_semantic_dedup_drops_are_minimal_ids(spark, sf_smoke):
    emb = t(spark, sf_smoke, "embeddings")
    res = semantic_dedup(emb, n_clusters=4, iterations=1, tau=0.2)
    rows = res.collect()
    assert len(rows) == emb.count()
    by_cluster = collections.defaultdict(list)
    for r in rows:
        by_cluster[r["cluster_id"]].append(r)
    # within every cluster the lowest vec_id always survives
    for members in by_cluster.values():
        lowest = min(members, key=lambda r: r["vec_id"])
        assert lowest["is_kept"]


def _brute_topk(vecs: dict[int, list[float]], qid: int, k: int):
    qv = vecs[qid]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    scored = sorted(
        ((round(cos(qv, v), 6), i) for i, v in vecs.items() if i != qid),
        key=lambda p: (-p[0], p[1]),
    )
    return [i for _, i in scored[:k]]


def test_ivf_portable_recall_vs_bruteforce(spark, sf_smoke):
    emb = t(spark, sf_smoke, "embeddings")
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    queries = emb.where(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = ivf_topk_portable(emb, queries, n_clusters=4, iterations=1, k=5, nprobe=2)
    got = collections.defaultdict(list)
    for r in res.collect():
        got[r["query_id"]].append(r["vec_id"])
    assert got, "no query results"
    recalls = []
    for qid, ids in got.items():
        assert len(ids) == 5
        truth = set(_brute_topk(vecs, qid, 5))
        recalls.append(len(truth & set(ids)) / 5)
    # probing 2 of 4 lists must beat random-list recall by a wide margin
    assert sum(recalls) / len(recalls) >= 0.5


def test_persisted_ivf_index_matches_inline_search(spark, sf_smoke, tmp_path):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.clustering import (
        build_ivf_index,
        query_ivf_index,
    )

    emb = t(spark, sf_smoke, "embeddings")
    queries = emb.where(F.col("vec_id") % 23 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    root = str(tmp_path / "ivf")
    build_ivf_index(emb, root, n_clusters=4, iterations=1)
    got = sorted(
        tuple(r)
        for r in query_ivf_index(queries, root, k=5, nprobe=2).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivf_topk_portable(
            emb, queries, n_clusters=4, iterations=1, k=5, nprobe=2
        ).collect()
    )
    assert got == want and len(got) > 0
    # probed-list pruning: the lists read must carry a cluster_id filter
    # (partition pruning on the index layout)
    plan = (
        query_ivf_index(queries, root, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan


def _ref_bpe(texts: list[str], n_merges: int):
    """Pure-Python greedy BPE on word frequencies (Sennrich-style)."""
    import re

    freq = collections.Counter()
    for txt in texts:
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", txt.lower())).strip()
        for w in norm.split(" "):
            if w:
                freq[w] += 1
    vocab = {tuple(list(w) + ["_"]): c for w, c in freq.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((rank, a, b, a + b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@pytest.mark.parametrize(
    "texts",
    [
        ["low lower lowest", "new newer newest", "low low new"],
        ["aaa aa aaaa", "ab ab ab ba", "abab abab"],  # overlap-heavy merges
    ],
)
def test_bpe_matches_pure_python_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in learn_merges(spark, df, 5).orderBy("merge_rank").collect()
    ]
    assert got == _ref_bpe(texts, 5)


def test_bpe_encode_token_counts_shrink_with_merges(spark):
    texts = ["the cat sat on the mat", "the bat and the cat", "that is that"]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in learn_merges(spark, df, 4).orderBy("merge_rank").collect()
    ]
    base = {r["doc_id"]: r["n_tokens"] for r in encode_documents(df, []).collect()}
    enc = {r["doc_id"]: r["n_tokens"] for r in encode_documents(df, merges).collect()}
    # chars+markers without merges; every applied merge only shrinks docs
    for i, s in enumerate(texts):
        words = [w for w in s.split() if w]
        assert base[i] == sum(len(w) + 1 for w in words)
        assert 0 < enc[i] < base[i]


def test_bpe_encode_empty_and_punct_only_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "!!! ..."), (2, "ok")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in encode_documents(df, [("o", "k")]).collect()}
    assert rows[0]["n_tokens"] == 0 and rows[1]["n_tokens"] == 0
    assert rows[2]["n_tokens"] == 2  # 'ok' + '_'
