"""Round-5 wave operators: skew-salted join, privacy releases (keyed
pseudonymization + derandomized differential privacy), file-level data
skipping, retention TTL, mergeable histograms, hard-negative mining."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from aws_saas_factory_multi_tenant_data_pipeline_spark.lake import (
    build_file_stats_index,
    expire_partitions,
    read_with_skipping,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.privacy import (
    dp_noisy_counts,
    pseudonymize,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
    hard_negatives,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.skew import (
    hot_keys,
    salted_join,
)


def _events(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "events.parquet"))


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- salted join -----------------------------------------------------------


def test_salted_join_equals_plain_inner(spark):
    ev = _events(spark)
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    plain = ev.join(dim, "user_id", "inner")
    salted = salted_join(ev, dim, "user_id", salt=8, how="inner", hot_min_count=20)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_equals_plain_left_with_unmatched(spark):
    ev = _events(spark)
    # dim covers only even user ids → odd-user rows are unmatched on the left
    dim = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_events"))
        .where(F.col("user_id") % 2 == 0)
    )
    plain = ev.join(dim, "user_id", "left")
    salted = salted_join(ev, dim, "user_id", salt=4, how="left", hot_min_count=20)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_all_keys_mode(spark):
    ev = _events(spark).limit(500)
    dim = ev.select("user_id").distinct().withColumn("flag", F.lit(1))
    plain = ev.join(dim, "user_id", "inner")
    salted = salted_join(ev, dim, "user_id", salt=4, how="inner", hot_min_count=None)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_rejects_outer_and_bad_salt(spark):
    ev = _events(spark)
    dim = ev.select("user_id").distinct()
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(ev, dim, "user_id", how="full")
    with pytest.raises(ValueError, match="salt"):
        salted_join(ev, dim, "user_id", salt=1)


def test_hot_keys_threshold(spark):
    ev = _events(spark)
    hk = hot_keys(ev, "user_id", min_count=1)
    assert hk.count() == ev.select("user_id").distinct().count()
    assert hot_keys(ev, "user_id", min_count=10**9).count() == 0


# --- privacy: pseudonymization + DP ---------------------------------------


def test_pseudonymize_referential_integrity_and_nulls(spark):
    df = spark.createDataFrame(
        [("alice", "a@x.com"), ("bob", None), ("alice", "a@x.com")],
        ["name", "email"],
    )
    out = pseudonymize(df, ["name", "email"], secret="s1")
    rows = out.collect()
    # equal plaintext → equal token (joins/groupBys still work)
    assert rows[0].name == rows[2].name and rows[0].email == rows[2].email
    # NULL stays NULL
    assert rows[1].email is None
    # tokens are not the plaintext and carry the prefix
    assert rows[0].name.startswith("pn_") and "alice" not in rows[0].name


def test_pseudonymize_column_separation_and_key_dependence(spark):
    df = spark.createDataFrame([("x", "x")], ["a", "b"])
    out = pseudonymize(df, ["a", "b"], secret="s1").collect()[0]
    # same value, different column → different token
    assert out.a != out.b
    out2 = pseudonymize(df, ["a"], secret="s2").collect()[0]
    # different key → different token
    assert out.a != out2.a


def test_dp_counts_deterministic_and_seed_sensitive(spark):
    ev = _events(spark)
    a = dp_noisy_counts(ev, ["event_type"], epsilon=1.0, seed="s")
    b = dp_noisy_counts(ev, ["event_type"], epsilon=1.0, seed="s")
    assert _sorted_rows(a) == _sorted_rows(b)  # replays answer identically
    c = dp_noisy_counts(ev, ["event_type"], epsilon=1.0, seed="other")
    assert _sorted_rows(a) != _sorted_rows(c)  # fresh seed → fresh draw
    # true counts are NOT in the release
    assert "n" not in a.columns


def test_dp_counts_noise_scale(spark):
    ev = _events(spark)
    true = {r.event_type: r.n for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    rel = dp_noisy_counts(ev, ["event_type"], epsilon=1.0, seed="s").collect()
    for r in rel:
        # Laplace(1/ε=1): |noise| > 20 has probability e^-20 — a failure
        # here means the mechanism, not luck
        assert abs(r.noisy_n - true[r.event_type]) < 20
    with pytest.raises(ValueError):
        dp_noisy_counts(ev, ["event_type"], seed="s", epsilon=0.0)


def test_dp_counts_grouping_changes_draw(spark):
    # the cell key folds in column NAMES: a release grouped by a different
    # column whose value strings collide must NOT reuse the same noise
    ev = _events(spark).withColumn("event_kind", F.col("event_type"))
    a = {r.k: r.noisy_n for r in dp_noisy_counts(ev, ["event_type"], seed="s")
         .selectExpr("event_type as k", "noisy_n").collect()}
    b = {r.k: r.noisy_n for r in dp_noisy_counts(ev, ["event_kind"], seed="s")
         .selectExpr("event_kind as k", "noisy_n").collect()}
    assert set(a) == set(b) and a != b


# --- histogram merge property ---------------------------------------------


def test_histogram_partials_merge(spark):
    ev = _events(spark)
    bucket = F.least(F.floor(F.col("value") / 10.0).cast("long"), F.lit(9)).alias("bucket")
    full = {r.bucket: r.n for r in ev.groupBy(bucket).agg(F.count(F.lit(1)).alias("n")).collect()}
    lo = ev.where(F.col("event_id") % 2 == 0)
    hi = ev.where(F.col("event_id") % 2 == 1)
    merged: dict = {}
    for part in (lo, hi):
        for r in part.groupBy(bucket).agg(F.count(F.lit(1)).alias("n")).collect():
            merged[r.bucket] = merged.get(r.bucket, 0) + r.n
    assert merged == full


# --- file skipping ---------------------------------------------------------


def test_file_skipping_prunes_and_matches(spark, tmp_path):
    o = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    data_root = str(tmp_path / "data")
    index_root = str(tmp_path / "idx")
    o.repartitionByRange(8, "o_orderkey").write.parquet(data_root)
    n_files = build_file_stats_index(spark, data_root, ["o_orderkey"], index_root)
    assert n_files == 8
    lo, hi = 100, 300
    df, files_read, files_total = read_with_skipping(spark, index_root, "o_orderkey", lo, hi)
    assert files_total == 8
    assert 0 < files_read < files_total  # skipping actually skipped
    expected = o.where((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi))
    assert _sorted_rows(df.select(*expected.columns)) == _sorted_rows(expected)


def test_file_skipping_empty_range(spark, tmp_path):
    o = spark.read.parquet(os.path.join(SF_SMOKE, "orders.parquet"))
    data_root = str(tmp_path / "data")
    index_root = str(tmp_path / "idx")
    o.repartitionByRange(4, "o_orderkey").write.parquet(data_root)
    build_file_stats_index(spark, data_root, ["o_orderkey"], index_root)
    df, files_read, _ = read_with_skipping(spark, index_root, "o_orderkey", -50, -10)
    assert files_read == 0 and df.count() == 0


# --- retention TTL ---------------------------------------------------------


def test_expire_partitions_drops_only_old(spark, tmp_path):
    ev = _events(spark).withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    root = str(tmp_path / "lake")
    ev.repartition("day").write.partitionBy("day").parquet(root)
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    cutoff = days[len(days) // 2]
    dropped = expire_partitions(spark, root, "day", cutoff)
    assert dropped == sum(1 for d in days if d < cutoff)
    back = spark.read.parquet(root)
    kept = sorted(r.day for r in back.select(F.col("day").cast("string").alias("day")).distinct().collect())
    assert kept == [d for d in days if d >= cutoff]
    # survivors intact row-for-row
    assert back.count() == ev.where(F.col("day") >= cutoff).count()


def test_expire_partitions_rejects_bad_column(spark, tmp_path):
    with pytest.raises(ValueError):
        expire_partitions(spark, str(tmp_path), "day; DROP TABLE x", "2024-01-01")


# --- hard negatives --------------------------------------------------------


def test_hard_negatives_labels_and_ranks(spark):
    emb = spark.read.parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    out = hard_negatives(emb, k=3, anchor_filter=F.col("vec_id") < 5).collect()
    per_anchor: dict = {}
    for r in out:
        assert r.neg_label != labels[r.anchor_id]  # only wrong-label rows
        per_anchor.setdefault(r.anchor_id, []).append(r)
    for rows in per_anchor.values():
        ranks = sorted(x.rank for x in rows)
        assert ranks == list(range(1, len(rows) + 1)) and len(rows) <= 3
        # ranks follow cosine descending
        by_rank = sorted(rows, key=lambda x: x.rank)
        cosines = [x.cosine for x in by_rank]
        assert cosines == sorted(cosines, reverse=True)


# --- BM25 ------------------------------------------------------------------


def test_bm25_rejects_empty_terms(spark):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ranking import bm25_rank

    with pytest.raises(ValueError):
        bm25_rank(docs, [])


def test_bm25_scores_monotone_and_bounded(spark):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ranking import bm25_rank

    out = bm25_rank(docs, ["spark", "window"], k=10).collect()
    assert 0 < len(out) <= 10
    scores = [r.score for r in sorted(out, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)  # +1 idf keeps scores positive
    # a doc mentioning neither term never ranks
    ids = {r.doc_id for r in out}
    none_docs = {
        r.doc_id
        for r in docs.where(~F.col("text").rlike("spark|window")).select("doc_id").collect()
    }
    assert not (ids & none_docs)


# --- PageRank --------------------------------------------------------------


def test_pagerank_star_graph_center_wins(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.graph import pagerank

    # star: center 0 connected to 1..6 (symmetrized)
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + [(i, 0) for i in range(1, 7)], ["src", "dst"]
    )
    out = {r.node_id: r.rank for r in pagerank(edges, iters=6).collect()}
    assert max(out, key=out.get) == 0
    leaves = [v for k, v in out.items() if k != 0]
    assert max(leaves) - min(leaves) < 1e-12  # symmetry: all leaves equal
    # mass approximately conserved (floor division loses <=1e-12 per node/round)
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_pagerank_deterministic_and_validates(spark):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    a = sorted((r.node_id, r.rank_units) for r in pagerank(edges, iters=3).collect())
    b = sorted((r.node_id, r.rank_units) for r in pagerank(edges, iters=3).collect())
    assert a == b
    # 3-cycle: perfectly symmetric, all ranks equal
    assert len({u for _, u in a}) == 1
    with pytest.raises(ValueError):
        pagerank(edges, iters=0)
    with pytest.raises(ValueError):
        pagerank(edges, damping_pct=0)


def test_pagerank_convergence_early_exit_replayable(spark):
    """tol_units early exit (r8 verdict #3): a 3-cycle hits the exact
    integer fixed point after round 1 (uniform ranks reproduce under
    the update rule), so tol_units=0 must stop at rounds=1 — and the
    result must be BIT-IDENTICAL to a fixed iters=rounds run, which is
    what keeps pagerank_oracle_sql(iters=rounds) a valid oracle."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    info = {}
    out = sorted(
        (r.node_id, r.rank_units)
        for r in pagerank(edges, iters=10, tol_units=0, info=info).collect()
    )
    assert info["rounds"] == 1 and info["converged"] is True
    assert info["final_max_delta_units"] == 0
    fixed = sorted(
        (r.node_id, r.rank_units) for r in pagerank(edges, iters=1).collect()
    )
    assert out == fixed


def test_pagerank_tolerance_not_met_runs_all_rounds(spark):
    """With a tolerance below the actual per-round delta the exit never
    fires: all iters run, converged=False, and the ranks are identical
    to the no-tolerance run (the __prev_ru carry column must not
    perturb the update)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 7)] + [(i, 0) for i in range(1, 7)], ["src", "dst"]
    )
    info = {}
    with_tol = sorted(
        (r.node_id, r.rank_units)
        for r in pagerank(edges, iters=4, tol_units=1, info=info).collect()
    )
    assert info["rounds"] == 4 and info["converged"] is False
    assert info["final_max_delta_units"] > 1
    plain = sorted(
        (r.node_id, r.rank_units) for r in pagerank(edges, iters=4).collect()
    )
    assert with_tol == plain


def test_pagerank_early_exit_mid_run(spark):
    """A star graph converges to within a loose tolerance before a long
    iteration budget runs out: the exit fires mid-run and the result
    still equals the fixed iters=rounds twin."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.graph import (
        UNITS,
        pagerank,
    )

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)], ["src", "dst"]
    )
    info = {}
    # star = bipartite: the rank imbalance oscillates center<->leaves and
    # decays ~0.85/round, so a 1e-3-mass tolerance is met around round
    # 30 — squarely mid-run for a 60-round budget
    out = sorted(
        (r.node_id, r.rank_units)
        for r in pagerank(
            edges, iters=60, tol_units=UNITS // 10**3, info=info
        ).collect()
    )
    assert info["converged"] is True
    assert 1 < info["rounds"] < 60
    fixed = sorted(
        (r.node_id, r.rank_units)
        for r in pagerank(edges, iters=info["rounds"]).collect()
    )
    assert out == fixed


# --- inverted text index ---------------------------------------------------


def test_text_index_matches_direct_bm25_and_prunes(spark, tmp_path):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ranking import bm25_rank
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.textindex import (
        build_text_index,
        search_text_index,
        term_bucket,
    )

    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    root = str(tmp_path / "tix")
    build_text_index(docs, root)
    terms = ["spark", "window", "merge"]
    via_index = search_text_index(spark, root, terms, k=15)
    direct = bm25_rank(docs, terms, k=15)
    assert _sorted_rows(via_index) == _sorted_rows(direct)
    # partition pruning: the postings scan carries a partition filter on
    # bucket with exactly the terms' buckets (inputFiles() can't show this
    # — it lists the relation pre-pruning)
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    for b in sorted({term_bucket(t) for t in terms}):
        assert str(b) in plan.split("PartitionFilters", 1)[1][:300]


def test_text_index_rejects_empty_terms(spark, tmp_path):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.textindex import (
        search_text_index,
    )

    with pytest.raises(ValueError):
        search_text_index(spark, str(tmp_path), [])


def test_bitext_margin_cancels_hubness(spark):
    """A hub target (moderately close to EVERY source) must lose to a
    specific target (very close to one source) under margin scoring —
    and the hub's raw cosine can still be the higher one for unrelated
    sources, which is exactly the failure mode the margin fixes."""
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        bitext_mine,
    )

    def unit(v):
        v = np.asarray(v, dtype=np.float32)
        return (v / np.linalg.norm(v)).tolist()

    # sources: three distinct directions
    srcs = [
        (0, unit([1, 0, 0, 0.1])),
        (1, unit([0, 1, 0, 0.1])),
        (2, unit([0, 0, 1, 0.1])),
    ]
    # targets: one specific match per source, plus a HUB near the mean
    tgts = [
        (10, unit([1, 0.05, 0, 0.1])),   # matches src 0
        (11, unit([0.05, 1, 0, 0.1])),   # matches src 1
        (12, unit([0, 0.05, 1, 0.1])),   # matches src 2
        (13, unit([1, 1, 1, 0.3])),      # hub: close-ish to everything
    ]
    schema = "vec_id long, embedding array<float>"
    src = spark.createDataFrame(srcs, schema)
    tgt = spark.createDataFrame(tgts, schema)
    got = {r.src_id: r for r in bitext_mine(src, tgt, k=2, threshold=1.0).collect()}
    assert {got[i].tgt_id for i in (0, 1, 2)} == {10, 11, 12}
    for i, expected_tgt in [(0, 10), (1, 11), (2, 12)]:
        assert got[i].tgt_id == expected_tgt
        assert got[i].mined  # specific matches clear the margin threshold


def test_bitext_mutual_subset_of_forward(spark):
    """mutual=True keeps exactly the forward pairs whose target elects
    the source back — a subset of forward mining, and in a clean
    one-to-one geometry the two coincide."""
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        bitext_mine,
    )

    def unit(v):
        v = np.asarray(v, dtype=np.float32)
        return (v / np.linalg.norm(v)).tolist()

    src = spark.createDataFrame(
        [(0, unit([1, 0, 0.1])), (1, unit([0, 1, 0.1]))],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(10, unit([1, 0.05, 0.1])), (11, unit([0.05, 1, 0.1]))],
        "vec_id long, embedding array<float>",
    )
    fwd = {(r.src_id, r.tgt_id) for r in bitext_mine(src, tgt, k=1).collect()}
    mut = {(r.src_id, r.tgt_id) for r in bitext_mine(src, tgt, k=1, mutual=True).collect()}
    assert mut <= fwd
    assert mut == {(0, 10), (1, 11)}  # clean geometry: mutual == forward


def test_bitext_margin_small_side_uses_actual_counts(spark):
    """r8 ADVICE: with fewer than k rows on a side, the margin must use
    the ACTUAL neighbor counts — a fixed 2k numerator inflates every
    margin on small partitions. With one source and one target the
    margin of the only pair is exactly 1 (cos * (1+1) / (cos + cos))."""
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        bitext_mine,
    )

    def unit(v):
        v = np.asarray(v, dtype=np.float32)
        return (v / np.linalg.norm(v)).tolist()

    src = spark.createDataFrame(
        [(0, unit([1, 0.3, 0.1]))], "vec_id long, embedding array<float>"
    )
    tgt = spark.createDataFrame(
        [(10, unit([0.9, 0.35, 0.1]))], "vec_id long, embedding array<float>"
    )
    rows = bitext_mine(src, tgt, k=4, threshold=1.05).collect()
    assert len(rows) == 1
    r = rows[0]
    # mean-of-means degenerate case: margin == cos*(1+1)/(2*cos) == 1,
    # so nothing is mined; the old 2k form would report margin == 4
    assert abs(r.margin - 1.0) < 1e-6
    assert not r.mined


def test_bitext_margin_asymmetric_counts_mean_of_means(spark):
    """Self-review r8: with ASYMMETRIC neighbor counts (cx != cy) the
    margin must be the documented Artetxe-Schwenk mean-of-means
    cos / ((sx/cx + sy/cy) / 2), not the pooled (cx+cy)/(sx+sy) form —
    verified against a numpy replay of the full formula."""
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        bitext_mine,
    )

    rng = np.random.RandomState(11)
    svecs = {i: rng.rand(4) + 0.1 for i in range(2)}
    tvecs = {10 + j: rng.rand(4) + 0.1 for j in range(5)}
    unit = lambda v: (v / np.linalg.norm(v)).astype(np.float32)
    src = spark.createDataFrame(
        [(i, unit(v).tolist()) for i, v in svecs.items()],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(j, unit(v).tolist()) for j, v in tvecs.items()],
        "vec_id long, embedding array<float>",
    )
    k = 3  # cx = 3 (5 targets available), cy = 2 (only 2 sources)
    got = {
        (r.src_id, r.tgt_id): r.margin
        for r in bitext_mine(src, tgt, k=k, threshold=1.0).collect()
    }

    # numpy replay with round-6 cosines (the operator's contract)
    cos = {
        (i, j): round(
            float(
                np.dot(unit(sv).astype(np.float64), unit(tv).astype(np.float64))
                / (
                    np.linalg.norm(unit(sv).astype(np.float64))
                    * np.linalg.norm(unit(tv).astype(np.float64))
                )
            ),
            6,
        )
        for i, sv in svecs.items()
        for j, tv in tvecs.items()
    }
    for (i, j), m in got.items():
        top_x = sorted((cos[(i, jj)] for jj in tvecs), reverse=True)[:k]
        top_y = sorted((cos[(ii, j)] for ii in svecs), reverse=True)[:k]
        sx, cx = sum(top_x), len(top_x)
        sy, cy = sum(top_y), len(top_y)
        expected = round(cos[(i, j)] * (2 * cx * cy) / (sx * cy + sy * cx), 6)
        assert abs(m - expected) < 2e-6, (i, j, m, expected)
        assert cx == 3 and cy == 2  # the asymmetry this test exists for


def test_bitext_candidates_equals_exact_with_full_candidates(spark, sf_oracle):
    """[r13] bitext_mine_candidates with candidates ⊇ all pairs equals
    bitext_mine row-for-row — the 100 TB candidate-fed form is the
    same function when the retriever returns everything."""
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        bitext_mine,
        bitext_mine_candidates,
    )

    emb = t(spark, sf_oracle, "embeddings")
    src = emb.where(F.col("vec_id") % 2 == 0).limit(50)
    tgt = emb.where(F.col("vec_id") % 2 == 1).limit(50)
    allpairs = src.select(F.col("vec_id").alias("src_id")).crossJoin(
        tgt.select(F.col("vec_id").alias("tgt_id"))
    )
    for mutual in (False, True):
        exact = {
            (r.src_id, r.tgt_id): (r.cosine, r.margin, r.mined)
            for r in bitext_mine(src, tgt, k=4, mutual=mutual).collect()
        }
        cand = {
            (r.src_id, r.tgt_id): (r.cosine, r.margin, r.mined)
            for r in bitext_mine_candidates(
                src, tgt, allpairs, k=4, mutual=mutual
            ).collect()
        }
        assert exact == cand, mutual


def test_bitext_lsh_and_ann_recall(spark, sf_oracle):
    """[r13] the sublinear candidate generators keep useful recall on
    the mined set (property bound, approximate by design — the sf1
    probe's asymptotics: LSH 2.8x / IVF 13.7x / exact 39.8x on 10x
    data, SCALE.md tenth wave)."""
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        bitext_mine,
        bitext_mine_ann,
        bitext_mine_lsh,
    )

    emb = t(spark, sf_oracle, "embeddings")
    src = emb.where(F.col("label") == 0)
    tgt = emb.where(F.col("label") == 1)
    exact_mined = {
        (r.src_id, r.tgt_id)
        for r in bitext_mine(src, tgt, k=4).collect()
        if r.mined
    }
    assert exact_mined
    # near-orthogonal synthetic embeddings are hyperplane LSH's known
    # worst case (module docstring): recall-lean geometry — fewer
    # planes (bigger buckets), more tables — measured 0.91 here vs
    # 0.14 at the speed-lean (8, 8) defaults
    lsh_mined = {
        (r.src_id, r.tgt_id)
        for r in bitext_mine_lsh(src, tgt, k=4, n_planes=4,
                                 n_tables=16).collect()
        if r.mined
    }
    ann_mined = {
        (r.src_id, r.tgt_id)
        for r in bitext_mine_ann(src, tgt, n_clusters=8, nprobe=3,
                                 k=4).collect()
        if r.mined
    }
    lsh_recall = len(exact_mined & lsh_mined) / len(exact_mined)
    ann_recall = len(exact_mined & ann_mined) / len(exact_mined)
    assert lsh_recall >= 0.5, lsh_recall
    assert ann_recall >= 0.5, ann_recall
