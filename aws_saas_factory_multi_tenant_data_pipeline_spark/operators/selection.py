"""Training-corpus selection operators (SURVEY.md §2 B10).

Two selection primitives every corpus build eventually needs:

- :func:`leakage_safe_split` — train/val/test assignment where a
  near-duplicate CLUSTER is the atomic unit: hashing document ids (the
  plain split) lets two near-identical documents land in train and val,
  quietly leaking eval data into training. Splitting by the cluster's
  canonical id keeps whole duplicate groups on one side. Composes the
  existing pair→cluster resolution; the split itself stays the
  content-stable md5-bucket trick.

- :func:`budget_select` — the token-budget data-selection rule: keep the
  highest-quality documents whose cumulative token count fits a budget,
  deterministic ties by hashed id. The SCALABLE shape matters: no global
  sort over documents — scores are quantized into ``n_bins`` equi-width
  bins, per-bin token totals (one groupBy over ≤ n_bins rows) locate the
  boundary bin, whole bins above it are kept with a broadcast range
  check, and only the single boundary bin's documents run an ordered
  prefix window (≈ corpus/n_bins rows, not corpus-wide). The boundary
  frame is bounded by construction — ≤ n_bins rows no matter how many
  distinct score values exist (a continuous per-document score is the
  norm, not the exception) — which is what the earlier per-distinct-score
  variant could not guarantee. This is exactly how a 100 TB selection
  must run; the naive ``ORDER BY quality LIMIT``-style global sort is
  the trap.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
    dedup_clusters,
    tokens,
)

#: the previous budget_select call's persisted boundary frame — released
#: on the next call so long sessions hold at most one cached copy
_BOUNDARY_CACHE: list = []


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: str = "ls-seed",
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test') assigned PER
    NEAR-DUP CLUSTER: documents connected through ``pairs`` (id_a, id_b)
    share the bucket of their cluster's min id; unpaired documents are
    their own singleton cluster. Content-stable (md5), engine-portable,
    and leak-proof by construction — no cluster ever straddles splits.
    """
    if not (0 < train_pct and 0 < val_pct and train_pct + val_pct < 100):
        raise ValueError("need 0 < train_pct, 0 < val_pct, train+val < 100")
    clusters = dedup_clusters(pairs)  # (node_id, cluster_id)
    withc = df.join(
        clusters.select(F.col("node_id").alias(id_col), "cluster_id"),
        id_col,
        "left",
    ).withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("cluster_id").cast("string"), F.lit(":" + seed))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(100),
    )
    return withc.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def budget_select(
    df: DataFrame,
    budget_tokens: int,
    score_col: str = "quality_score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: str = "budget",
    n_bins: int = 4096,
) -> DataFrame:
    """Keep the greedy highest-quality prefix whose token total fits
    ``budget_tokens``; within a score, documents are taken in
    md5(seed:id) order (content-stable tie-break). Adds ``is_selected``.

    Exactness contract: the selected set is identical to sorting ALL
    documents by (score DESC, md5 tie, id) and taking the maximal prefix
    with cumulative tokens ≤ budget — but computed without any
    corpus-wide sort (see module docstring). NULL-score rows are kept in
    the output with ``is_selected = false`` (a NULL quality score means
    "unscorable", which a budget selection must never spend tokens on —
    and must never silently drop from the returned frame either).

    Bounded-memory contract: both boundary-search frames have ≤ ``n_bins``
    rows regardless of the score distribution (continuous per-document
    scores included), and the ordered-prefix window runs inside ONE
    SUB-bin of the boundary bin: the boundary bin is re-binned once
    before the window — by score when its scores spread, by the uniform
    md5 tie hash when they don't (the corpus-wide-constant-score case
    that used to degrade toward a global sort) — so the window input is
    ≈ corpus / n_bins² rows even under a single-value-dominated score
    column. The irreducible residual is an equal-(score, 13-hex-tie-
    prefix) class — cryptographically negligible.
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    score = F.col(score_col).cast("double")
    # 1-row min/max → broadcast: equi-width bin ids are a monotone function
    # of the score, so equal scores share a bin and bin order = score order.
    # NULL scores ride the SAME scan as bin -1 (kept, never selected) —
    # no separate corpus pass for them
    mm = df.agg(F.min(score).alias("__lo"), F.max(score).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / n_bins
    bkt = (
        F.when(score.isNull(), F.lit(-1))
        .when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor((score - F.col("__lo")) / width).cast("int"),
            )
        )
        .alias("__bkt")
    )
    binned = (
        df.crossJoin(F.broadcast(mm)).withColumn("__bkt", bkt).drop("__lo", "__hi")
    )
    per_bin = binned.where(F.col("__bkt") >= 0).groupBy("__bkt").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("__bt")
    )
    # the first unpartitioned window — over ≤ n_bins rows, by construction
    w = Window.orderBy(F.col("__bkt").desc())
    cum = per_bin.withColumn(
        "__before", F.coalesce(F.sum("__bt").over(w) - F.col("__bt"), F.lit(0))
    )
    joined = binned.join(F.broadcast(cum), "__bkt", "left")
    whole_in = (F.col("__before") + F.col("__bt")) <= budget_tokens
    boundary = (
        (F.col("__bkt") >= 0)
        & (F.col("__before") < budget_tokens)
        & ~whole_in
    )
    # every non-boundary bin is decided wholesale by its cumulative range —
    # a broadcast filter, no window anywhere near the corpus; NULL-score
    # rows (bin -1, null cum columns) coalesce to unselected
    decided = joined.where(~boundary).withColumn(
        "is_selected", F.coalesce(whole_in, F.lit(False)) & (F.col("__bkt") >= 0)
    )
    # the (single) boundary bin: re-bin ONCE before the ordered prefix so
    # a pathological distribution (all mass in one equi-width bin — e.g. a
    # corpus-wide constant score) cannot degrade toward a global sort.
    # Sub-bin ids are monotone along the exact greedy order
    # (score DESC, tie ASC): by score when the bin's scores spread, by the
    # uniform md5 tie hash (13 hex digits = 52 double-exact bits) when
    # they don't — either way ≈ bin / n_bins rows reach the window.
    tie = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    tie_u = F.conv(F.substring(tie, 1, 13), 16, 10).cast("double") / float(1 << 52)
    # persist the boundary bin (≈ corpus/n_bins rows, bounded): the
    # re-bin pass references it three times (min/max agg, sub-binning,
    # and the two decided/edge branches) — without the persist each
    # reference recomputes the corpus scan + first-level join. The cache
    # is released on the NEXT budget_select call (module-level handoff),
    # so repeated calls in a long session hold at most one boundary
    # frame — unpersisting a frame whose plan is still referenced only
    # drops the cache (Spark recomputes), never correctness
    edge_in = joined.where(boundary).persist(StorageLevel.MEMORY_AND_DISK)
    while _BOUNDARY_CACHE:
        try:
            _BOUNDARY_CACHE.pop().unpersist(blocking=False)
        except Exception:
            pass
    _BOUNDARY_CACHE.append(edge_in)
    mm2 = edge_in.agg(F.min(score).alias("__lo2"), F.max(score).alias("__hi2"))
    width2 = (F.col("__hi2") - F.col("__lo2")) / n_bins
    sub = (
        F.when(
            F.col("__hi2") == F.col("__lo2"),
            F.least(F.lit(n_bins - 1), F.floor(tie_u * n_bins).cast("int")),
        )
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor((F.col("__hi2") - score) / width2).cast("int"),
            )
        )
        .alias("__bkt2")
    )
    binned2 = (
        edge_in.crossJoin(F.broadcast(mm2))
        .withColumn("__bkt2", sub)
        .drop("__lo2", "__hi2")
    )
    per2 = binned2.groupBy("__bkt2").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("__bt2")
    )
    # the second (and last) unpartitioned window — again ≤ n_bins rows
    w2 = Window.orderBy(F.col("__bkt2"))
    cum2 = per2.withColumn(
        "__before2", F.coalesce(F.sum("__bt2").over(w2) - F.col("__bt2"), F.lit(0))
    )
    joined2 = binned2.join(F.broadcast(cum2), "__bkt2")
    before2 = F.col("__before") + F.col("__before2")
    whole2 = (before2 + F.col("__bt2")) <= budget_tokens
    boundary2 = (before2 < budget_tokens) & ~whole2
    decided2 = joined2.where(~boundary2).withColumn("is_selected", whole2)
    # only the boundary SUB-bin runs the ordered prefix, over its own rows
    wb = Window.partitionBy("__bkt2").orderBy(score.desc(), tie, F.col(id_col))
    run = F.sum(F.col(tokens_col).cast("long")).over(wb)
    edge2 = joined2.where(boundary2).withColumn(
        "is_selected", (before2 + run) <= budget_tokens
    )
    edge = decided2.unionByName(edge2).drop("__bkt2", "__bt2", "__before2")
    return decided.unionByName(edge).drop("__bkt", "__bt", "__before")


def dsir_importance(
    df: DataFrame,
    is_target,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    seed: str = "dsir",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every document by how target-like its hashed unigram profile
    is. ``is_target`` is a boolean Column marking the (small) target
    sample inside ``df``.

    Per hashed-token bucket b: ``llr(b) = ln p_target(b) − ln p_raw(b)``
    with add-one smoothing; per document: importance = round-6 MEAN of
    its tokens' llr (mean, not sum, so length doesn't masquerade as
    target-likeness). All hashing is the md5-portable kind and the two
    distributions live in one ``n_buckets``-row frame built with a single
    conditional aggregation pass, broadcast back — so scoring 100 TB is
    one tokenize pass + a broadcast join on an 8-byte bucket id. The
    ``llm_dsir_importance`` oracle replays every step (ln/exp round-6 is
    the same single-pass float contract the quality model uses).

    Returns (id, n_tokens, importance) for NON-target rows (the raw pool
    being reweighted/resampled).
    """
    toks = df.select(
        F.col(id_col),
        is_target.alias("__t"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).where(F.col("__tok") != "")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col("__tok"))), 1, 13),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    hits = toks.select(F.col(id_col), "__t", bucket.alias("__b"))
    dist = hits.groupBy("__b").agg(
        F.count(F.when(F.col("__t"), 1)).alias("__ct"),
        F.count(F.when(~F.col("__t"), 1)).alias("__cr"),
    )
    totals = dist.agg(
        F.sum("__ct").alias("__tt"), F.sum("__cr").alias("__tr")
    )
    # per-bucket llr becomes an INTEGER (micro-llr, 1e-6 units) BEFORE the
    # cross-doc aggregation: ln is the one step where engines can differ
    # by an ulp, and quantizing at the 1024-row bucket level keeps that
    # difference away from everything downstream — per-doc sums and the
    # floor-divided mean are then exact BIGINT arithmetic, bit-identical
    # in any engine at any scale. (The earlier round-6 double mean still
    # divided a decimal sum in double and re-rounded — a near-tie there
    # flipped the 6th decimal between engines at sf0.1.)
    llr_u = F.round(
        (
            F.log((F.col("__ct") + 1).cast("double") / (F.col("__tt") + n_buckets))
            - F.log((F.col("__cr") + 1).cast("double") / (F.col("__tr") + n_buckets))
        )
        * 1000000,
        0,
    ).cast("bigint")
    llr_frame = dist.crossJoin(F.broadcast(totals)).select("__b", llr_u.alias("__u"))
    # portable floor division: (s - pmod(s, n)) / n is exact integer math
    s, cnt = F.col("__s"), F.col("n_tokens")
    fdiv = (s - F.pmod(s, cnt)) / cnt
    scored = (
        hits.where(~F.col("__t"))
        .join(F.broadcast(llr_frame), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("__u").alias("__s"),
        )
        .select(
            id_col,
            "n_tokens",
            (fdiv / 1000000.0).alias("importance"),
        )
    )
    return scored
