"""Product quantization (operators/pq.py): codebook/code invariants,
ADC optimality of the encoded row itself, blob-separation retrieval,
determinism across runs, and the zero-shuffle encode plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pq import (
    MICRO,
    pq_encode,
    pq_topk_adc,
    pq_train,
    quantize_micro,
)

_M, _K, _DIM = 4, 4, 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def trained(emb):
    cb = pq_train(emb, m=_M, k=_K, iterations=1, dim=_DIM)
    enc = pq_encode(emb, cb, m=_M, dim=_DIM)
    return cb.cache(), enc.cache()


def test_codebook_shape(trained):
    cb, _ = trained
    rows = cb.collect()
    assert len(rows) == _M * _K
    assert {(r["subspace"], r["code"]) for r in rows} == {
        (j, c) for j in range(_M) for c in range(_K)
    }
    assert all(len(r["centroid"]) == _DIM // _M for r in rows)


def test_codes_bounded(trained, emb):
    _, enc = trained
    bad = enc.where(
        (F.size("codes") != _M)
        | F.exists("codes", lambda c: (c < 0) | (c >= _K))
    ).count()
    assert bad == 0
    assert enc.count() == emb.count()


def test_own_row_achieves_min_adc(trained, emb):
    """For a query that is itself an encoded corpus row, its ADC
    distance is the minimum achievable (its codes are the per-subspace
    argmins) — rank-1 modulo code-level ties."""
    cb, enc = trained
    qs = emb.where("vec_id % 37 = 1").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = pq_topk_adc(enc, qs, cb, topk=5, m=_M, dim=_DIM).cache()
    mins = res.groupBy("query_id").agg(F.min("adc_dist").alias("min_dist"))
    own = res.where(F.col("query_id") == F.col("vec_id")).select(
        "query_id", "adc_dist"
    )
    joined = own.join(mins, "query_id")
    assert joined.where(F.col("adc_dist") != F.col("min_dist")).count() == 0
    # and every query returned exactly topk ranked rows 1..5
    counts = res.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in counts)


def test_blob_separation_retrieval(spark):
    """Two far-apart blobs: every top-k neighbor of a blob-A query is in
    blob A. PQ distances are approximate, but a 100x gap survives any
    quantization this codebook can produce."""
    rng = np.random.RandomState(0)
    rows = []
    for i in range(60):
        blob = i % 2
        base = np.full(_DIM, 10.0 if blob else -10.0)
        rows.append(
            (i, (base + rng.uniform(-0.1, 0.1, _DIM)).astype(float).tolist())
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(df, m=_M, k=_K, iterations=1, dim=_DIM)
    enc = pq_encode(df, cb, m=_M, dim=_DIM)
    qs = df.where("vec_id < 4").select(F.col("vec_id").alias("query_id"), "embedding")
    res = pq_topk_adc(enc, qs, cb, topk=10, m=_M, dim=_DIM).collect()
    for r in res:
        assert r["vec_id"] % 2 == r["query_id"] % 2, r


def test_deterministic_rerun(trained, emb):
    cb, enc = trained
    qs = emb.where("vec_id % 37 = 1").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = pq_topk_adc(enc, qs, cb, topk=5, m=_M, dim=_DIM).orderBy(
        "query_id", "rank"
    ).collect()
    cb2 = pq_train(emb, m=_M, k=_K, iterations=1, dim=_DIM)
    enc2 = pq_encode(emb, cb2, m=_M, dim=_DIM)
    b = pq_topk_adc(enc2, qs, cb2, topk=5, m=_M, dim=_DIM).orderBy(
        "query_id", "rank"
    ).collect()
    assert a == b


def test_quantize_micro_floor_semantics(spark):
    df = spark.createDataFrame(
        [(0, [0.5, -0.5, 1.0000004, -1.0000004])],
        "vec_id long, embedding array<double>",
    )
    (row,) = df.select(quantize_micro(F.col("embedding")).alias("q")).collect()
    assert row["q"] == [500000, -500000, 1000000, -1000001]
    assert MICRO == 1_000_000


def test_encode_plan_is_broadcast_only(trained, emb):
    """Encoding must not shuffle the corpus: broadcast codebook + narrow
    projection (the 100 TB contract in the module docstring)."""
    cb, _ = trained
    plan = pq_encode(emb, cb, m=_M, dim=_DIM)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # corpus-side rows never hash-repartition during encode
    assert "hashpartitioning" not in plan


def test_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=5, k=4, iterations=1, dim=_DIM)


def test_adc_hot_path_has_no_lambda(trained, emb):
    """r15 optimization pin: the per-(corpus row × query) ADC sum must
    be the UNROLLED flat expression — m dense-array reads + adds — not
    an interpreted aggregate/zip_with lambda (measured 2.5× the whole
    search phase at sf1). The lambda forms are fine on the tiny
    per-query table-build side; the pin scopes to the projection that
    defines adc_dist."""
    import re

    cb, enc = trained
    qs = emb.where("vec_id % 37 = 1").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = pq_topk_adc(enc, qs, cb, topk=5, m=_M, dim=_DIM)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    proj = next(
        ln for ln in plan.splitlines() if re.search(r"AS adc_dist#\d+", ln)
    )
    assert "lambdafunction" not in proj, proj
    assert proj.count("element_at") >= 2 * _M, proj  # m codes + m table reads
    # the top-k window still prunes before the exchange
    assert "WindowGroupLimit" in plan


# ---- MaxSim late-interaction reranker (operators/similarity.py) -----------


def _vecs(spark, rows, schema="id long, token_vecs array<array<bigint>>"):
    return spark.createDataFrame(rows, schema)


def test_maxsim_exact_scores(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        maxsim_rerank,
    )

    docs = _vecs(
        spark,
        [
            (1, [[1, 0], [0, 1]]),
            (2, [[2, 2]]),
            (3, [[-5, -5], [10, 0]]),
        ],
        "doc_id long, token_vecs array<array<bigint>>",
    )
    queries = _vecs(
        spark,
        [(100, [[1, 1], [1, 0]])],
        "query_id long, token_vecs array<array<bigint>>",
    )
    rows = {
        r["doc_id"]: (r["score"], r["rank"])
        for r in maxsim_rerank(docs, queries, topk=3).collect()
    }
    # q1=[1,1]: d1 max(1,1)=1, d2 4, d3 max(-10,10)=10
    # q2=[1,0]: d1 max(1,0)=1, d2 2, d3 max(-5,10)=10
    assert rows[1] == (2, 3)
    assert rows[2] == (6, 2)
    assert rows[3] == (20, 1)


def test_maxsim_tie_breaks_by_doc_id(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        maxsim_rerank,
    )

    docs = _vecs(
        spark,
        [(7, [[1, 1]]), (3, [[1, 1]]), (5, [[1, 1]])],
        "doc_id long, token_vecs array<array<bigint>>",
    )
    queries = _vecs(
        spark, [(0, [[4, 4]])], "query_id long, token_vecs array<array<bigint>>"
    )
    got = [
        (r["doc_id"], r["rank"])
        for r in maxsim_rerank(docs, queries, topk=3).orderBy("rank").collect()
    ]
    assert got == [(3, 1), (5, 2), (7, 3)]


def test_maxsim_skips_empty_token_sets(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        maxsim_rerank,
    )

    docs = _vecs(
        spark,
        [(1, [[1]]), (2, [])],
        "doc_id long, token_vecs array<array<bigint>>",
    )
    queries = _vecs(
        spark,
        [(10, [[1]]), (11, [])],
        "query_id long, token_vecs array<array<bigint>>",
    )
    rows = maxsim_rerank(docs, queries, topk=5).collect()
    assert {(r["query_id"], r["doc_id"]) for r in rows} == {(10, 1)}


def test_maxsim_query_side_broadcast_plan(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        maxsim_rerank,
    )

    docs = _vecs(
        spark,
        [(i, [[i, 1]]) for i in range(50)],
        "doc_id long, token_vecs array<array<bigint>>",
    )
    queries = _vecs(
        spark, [(0, [[1, 2]])], "query_id long, token_vecs array<array<bigint>>"
    )
    plan = (
        maxsim_rerank(docs, queries, topk=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan


# ---- asymmetric containment (operators/dedup.py) --------------------------


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc quoted inside a long one: containment ~1.0 for the
    short side while Jaccard stays below a dedup threshold."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"filler{i} word{i} text{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler)],
        "doc_id long, text string",
    )
    (pair,) = containment_pairs(df, tau=0.5).collect()
    assert (pair["id_a"], pair["id_b"]) == (1, 2)
    assert pair["c_ab"] == 1.0  # every shingle of the quote is inside
    assert pair["c_ba"] < 0.2
    assert pair["contained"] == "a"
    jac = ngram_jaccard_pairs(df, threshold=0.0).collect()
    assert all(r["jaccard"] < 0.2 for r in jac)


def test_containment_both_direction_flag(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        containment_pairs,
    )

    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    (pair,) = containment_pairs(df, tau=0.5).collect()
    assert pair["contained"] == "both"
    assert pair["c_ab"] == 1.0 and pair["c_ba"] == 1.0


# ---- 1-bit binary quantization (operators/pq.py) ---------------------------


def test_binary_signature_bit_packing(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pq import (
        binary_quantize,
    )

    # vector with bits 0, 5, 63 positive -> sig = 1 + 32 + min-long
    v = [-1.0] * 64
    v[0] = v[5] = v[63] = 1.0
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<double>")
    (row,) = binary_quantize(df, dim=64).collect()
    assert row["sig"] == 1 + 32 + (-(1 << 63))
    # zero counts as non-negative (>= 0) per the sign convention
    df0 = spark.createDataFrame(
        [(2, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    (r0,) = binary_quantize(df0, dim=64).collect()
    assert r0["sig"] == -1  # all 64 bits set = two's-complement -1


def test_binary_hamming_exact_and_ties(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pq import (
        binary_hamming_topk,
        binary_quantize,
    )

    base = [1.0] * 64

    def flip(k_list):
        v = list(base)
        for k in k_list:
            v[k] = -1.0
        return v

    df = spark.createDataFrame(
        [(0, base), (1, flip([3])), (2, flip([3, 7])), (3, flip([3, 7, 11]))],
        "vec_id long, embedding array<double>",
    )
    sigs = binary_quantize(df, dim=64)
    qs = sigs.where("vec_id = 0").selectExpr("vec_id as query_id", "sig")
    got = [
        (r["vec_id"], r["hamming"], r["rank"])
        for r in binary_hamming_topk(sigs, qs, topk=4).orderBy("rank").collect()
    ]
    assert got == [(0, 0, 1), (1, 1, 2), (2, 2, 3), (3, 3, 4)]


def test_binary_quantize_rejects_wide_dim(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pq import (
        binary_quantize,
    )

    df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="64-bit word"):
        binary_quantize(df, dim=65)


def test_containment_max_df_drops_boilerplate_only(spark):
    """A boilerplate footer shared by EVERY doc creates candidate pairs
    everywhere; max_df removes those shingles while a genuine subset
    pair (unique content) keeps its verdict with a conservative score."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        containment_pairs,
    )

    footer = "copyright footer terms of service apply here"
    quote = (
        "unique quoted passage alpha bravo charlie delta echo foxtrot "
        "golf hotel india juliet kilo"
    )
    rows = [(i, f"document body {i} filler words {footer}") for i in range(10)]
    rows.append((100, quote + " " + footer))
    rows.append((101, "long other text " + quote + " more trailing content " + footer))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    loose = containment_pairs(df, tau=0.5)
    strict = containment_pairs(df, tau=0.5, max_df=0.5)
    loose_pairs = {(r["id_a"], r["id_b"]) for r in loose.collect()}
    strict_rows = strict.collect()
    strict_pairs = {(r["id_a"], r["id_b"]) for r in strict_rows}
    # the footer-only pairs vanish; the genuine subset pair survives
    assert (100, 101) in strict_pairs
    assert len(strict_pairs) < len(loose_pairs)
    (pair,) = [r for r in strict_rows if (r["id_a"], r["id_b"]) == (100, 101)]
    (lpair,) = [r for r in loose.collect() if (r["id_a"], r["id_b"]) == (100, 101)]
    # conservative: shared evidence can only shrink under max_df
    assert pair["shared"] <= lpair["shared"]
    assert pair["n_a"] == lpair["n_a"]  # denominators unchanged


def test_adc_candidates_bound_is_per_query(trained, emb):
    """candidates=(query_id, vec_id) pairs restrict each query to ITS
    OWN shortlist — another query's candidates never leak in."""
    cb, enc = trained
    qs = emb.where("vec_id in (1, 2)").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = spark_df = qs.sparkSession.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "query_id long, vec_id long",
    )
    res = pq_topk_adc(enc, qs, cb, topk=5, m=_M, dim=_DIM, candidates=cands)
    got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
    assert got == {(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)}
    ranks = {r["query_id"]: max(0, r["rank"]) for r in res.collect()}
    assert set(ranks) == {1, 2}


def test_adc_keys_never_collide_at_large_k(spark):
    """ADVICE r9: the (subspace, code) map key used a fixed *1000 pack,
    silently colliding across subspaces at k > 1000. The multiplier is
    now derived from the codebook's real code range — pin exact ADC
    distances with k = 1200 codewords per subspace, where the old
    packing would have collided (e.g. (0,1000) vs (1,0))."""
    k, m, dim = 1200, 2, 2
    cb = spark.createDataFrame(
        [(s, c, [int((c + 7 * s) * MICRO)]) for s in range(m) for c in range(k)],
        "subspace int, code int, centroid array<long>",
    )
    # one encoded row whose codes sit exactly at an old-scheme collision:
    # codes [1000, 0] -> old keys (0*1000+1000)=1000 and (1*1000+0)=1000
    enc = spark.createDataFrame(
        [(1, [1000, 0]), (2, [3, 1100])], "vec_id long, codes array<int>"
    )
    qs = spark.createDataFrame([(9, [2.0, 5.0])], "query_id long, embedding array<double>")
    res = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_topk_adc(enc, qs, cb, topk=5, m=m, dim=dim).collect()
    }
    q0, q1 = 2 * MICRO, 5 * MICRO

    def cent(s, c):
        return (c + 7 * s) * MICRO

    assert res[1] == (q0 - cent(0, 1000)) ** 2 + (q1 - cent(1, 0)) ** 2
    assert res[2] == (q0 - cent(0, 3)) ** 2 + (q1 - cent(1, 1100)) ** 2


def test_adc_rejects_empty_codebook(spark):
    cb = spark.createDataFrame([], "subspace int, code int, centroid array<long>")
    enc = spark.createDataFrame([(1, [0, 0])], "vec_id long, codes array<int>")
    qs = spark.createDataFrame([(9, [0.0, 0.0])], "query_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty codebook"):
        pq_topk_adc(enc, qs, cb, topk=1, m=2, dim=2)


# ---- containment prefix filtering (r10) ------------------------------------


def _rows_sorted(df):
    return sorted(
        (
            r["id_a"], r["id_b"], r["shared"], r["n_a"], r["n_b"],
            r["c_ab"], r["c_ba"], r["contained"],
        )
        for r in df.collect()
    )


def test_containment_prefix_equals_unfiltered_on_corpus(spark):
    """Pair-set AND full-row equality vs the unfiltered form on the real
    documents table (the ngram_jaccard_pairs_prefix precedent), at two
    thresholds."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_prefix,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for tau in (0.5, 0.8):
        ref = _rows_sorted(containment_pairs(df, tau=tau))
        got = _rows_sorted(containment_pairs_prefix(df, tau=tau))
        assert got == ref and len(ref) > 0, f"tau={tau}"


def test_containment_prefix_equals_unfiltered_with_max_df(spark):
    """The max_df boilerplate drop composes with prefix filtering: kept
    sets shrink, denominators stay full — outputs must stay identical."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_prefix,
    )

    rows = [(i, f"alpha beta gamma delta x{i} y{i} z{i} footer one two three") for i in range(30)]
    rows += [(100, "unique seven words quoted wholesale inside document"),
             (101, "unique seven words quoted wholesale inside document "
                   "plus a very long tail of extra content words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = _rows_sorted(containment_pairs(df, tau=0.4, max_df=0.5))
    got = _rows_sorted(containment_pairs_prefix(df, tau=0.4, max_df=0.5))
    assert got == ref and len(ref) > 0


def test_containment_prefix_crafted_boundaries(spark):
    """Exact-threshold pairs (shared = tau*n exactly) must survive the
    prefix bound — the float-nudge direction check."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_prefix,
    )

    # doc 1: 4 shingles (6 tokens, k=3); doc 2 shares exactly 2 of them
    # -> c_12 = 0.5 exactly at tau=0.5
    d1 = "a b c d e f"             # shingles: abc bcd cde def
    d2 = "c d e f q r s t u v"     # shares cde, def among 8
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    ref = _rows_sorted(containment_pairs(df, tau=0.5))
    got = _rows_sorted(containment_pairs_prefix(df, tau=0.5))
    assert got == ref
    assert len(ref) == 1 and ref[0][7] == "a"  # the short doc is contained


def test_containment_prefix_rejects_bad_tau(spark):
    import pytest as _pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        containment_pairs_prefix,
    )

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    for bad in (0.0, -0.1, 1.5):
        with _pytest.raises(ValueError, match="prefix filtering"):
            containment_pairs_prefix(df, tau=bad)
