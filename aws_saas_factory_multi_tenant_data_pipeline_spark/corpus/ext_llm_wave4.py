"""B10 [EXT] wave 4 (round 4): portable k-means / SemDeDup, fully
oracle-checked IVF ANN, and BPE vocabulary induction.

The rarity here is that *approximate* algorithms are pinned exactly:
k-means seeding/assignment/Lloyd updates and the IVF probe set use
engine-portable math (md5-ordered seeds, round-6 cosines, exact-decimal
means — operators/clustering.py), so the DuckDB oracle replays the whole
pipeline hash-for-hash instead of settling for a recall bound. Same for
the BPE trainer (operators/bpe.py): the double-space symbol-string
encoding makes the greedy merge a plain `replace` in both engines, so
the learned merge table is value-equal, not just plausible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import REGISTRY, register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.bpe import learn_merges
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.clustering import (
    ivf_topk_portable,
    semantic_dedup,
)

_C = 8  # clusters
_DIM = 64
_TAU = 0.3
_K = 5
_NPROBE = 2
_N_MERGES = 6

_DUCK_NORM = r"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"


def _cos(a: str, b: str) -> str:
    return (
        f"ROUND(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )


# k-means CTE chain shared by the SemDeDup and IVF oracles: md5-ordered
# seeds -> argmax-cosine assignment -> exact-decimal Lloyd update ->
# reassignment. Mirrors operators/clustering.kmeans_portable step for step.
_KMEANS_CTES = f"""
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        seeds AS (
            SELECT ROW_NUMBER() OVER (ORDER BY r, vec_id) - 1 AS cluster_id, v
            FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS r, vec_id, v
                  FROM e ORDER BY r, vec_id LIMIT {_C})),
        a0 AS (
            SELECT vec_id, v, cluster_id FROM (
                SELECT e.vec_id, e.v, s.cluster_id,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY {_cos('e.v', 's.v')} DESC, s.cluster_id) AS rn
                FROM e, seeds s) WHERE rn = 1),
        cent1d AS (
            SELECT cluster_id, i AS dim,
                   CAST(SUM(CAST(v[i] AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS val
            FROM a0, range(1, {_DIM + 1}) t(i) GROUP BY cluster_id, i),
        cent1 AS (
            SELECT cluster_id, list(val ORDER BY dim) AS v
            FROM cent1d GROUP BY cluster_id),
        a1 AS (
            SELECT vec_id, v, cluster_id FROM (
                SELECT e.vec_id, e.v, c.cluster_id,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY {_cos('e.v', 'c.v')} DESC, c.cluster_id) AS rn
                FROM e, cent1 c) WHERE rn = 1)"""


@register(
    "dedup_semantic",
    oracle=f"""
        WITH {_KMEANS_CTES},
        drops AS (
            SELECT DISTINCT b.vec_id
            FROM a1 a JOIN a1 b
              ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
            WHERE {_cos('a.v', 'b.v')} >= {_TAU})
        SELECT a1.vec_id, a1.cluster_id, (d.vec_id IS NULL) AS is_kept
        FROM a1 LEFT JOIN drops d ON a1.vec_id = d.vec_id
        ORDER BY a1.vec_id
    """,
    tags=("B10",),
    doc="SemDeDup (arXiv:2303.09540): md5-seeded portable k-means (1 "
    "Lloyd round, exact-decimal centroid means) then drop vectors with a "
    "lower-id neighbor at cosine >= 0.3 WITHIN their cluster. The "
    "cluster partitioning bounds pair comparisons; the oracle replays "
    "the entire clustering hash-for-hash.",
)
def dedup_semantic(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_clusters=_C, iterations=1, tau=_TAU).orderBy("vec_id")


@register(
    "similarity_ivf_portable",
    oracle=f"""
        WITH {_KMEANS_CTES},
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 101 = 0),
        probes AS (
            SELECT query_id, qv, cluster_id FROM (
                SELECT q.query_id, q.qv, c.cluster_id,
                       ROW_NUMBER() OVER (PARTITION BY q.query_id
                           ORDER BY {_cos('q.qv', 'c.v')} DESC, c.cluster_id) AS pr
                FROM q, cent1 c) WHERE pr <= {_NPROBE}),
        cands AS (
            SELECT p.query_id, a1.vec_id, {_cos('p.qv', 'a1.v')} AS cosine
            FROM probes p JOIN a1 ON p.cluster_id = a1.cluster_id
            WHERE a1.vec_id <> p.query_id)
        SELECT query_id, rank, vec_id, cosine FROM (
            SELECT query_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id) AS rank
            FROM cands) WHERE rank <= {_K}
        ORDER BY query_id, rank
    """,
    tags=("B10",),
    doc="IVF ANN with the probe set itself oracle-pinned: portable "
    "k-means inverted lists, top-2 probed lists per query, exact top-5 "
    "within probes. Complements the xxhash64 fast path "
    "(similarity_ivf_ann, recall-tested) with a hash-checkable twin.",
)
def similarity_ivf_portable(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk_portable(
        emb, queries, n_clusters=_C, iterations=1, k=_K, nprobe=_NPROBE
    ).orderBy("query_id", "rank")


@register(
    "bpe_pair_counts",
    oracle=f"""
        WITH words AS (
            SELECT w AS word, COUNT(*) AS cnt
            FROM (SELECT unnest(string_split({_DUCK_NORM}, ' ')) AS w FROM documents)
            WHERE w <> '' GROUP BY w),
        sym AS (
            SELECT list_append(regexp_split_to_array(word, ''), '_') AS syms, cnt
            FROM words),
        pairs AS (
            SELECT syms[j] || ' ' || syms[j + 1] AS pair, cnt
            FROM sym, LATERAL (SELECT unnest(range(1, len(syms))) AS j))
        SELECT pair, CAST(SUM(cnt) AS BIGINT) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair LIMIT 30
    """,
    tags=("B10",),
    doc="BPE round-0 statistics: top-30 adjacent symbol pairs (chars + "
    "end-of-word marker) weighted by word frequency. One corpus pass to "
    "the word-count table; pair stats live on the small vocab frame.",
)
def bpe_pair_counts(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.bpe import (
        pair_counts,
        symbolize,
        word_frequencies,
    )

    d = t(spark, sf_dir, "documents")
    vocab = word_frequencies(d).select(symbolize(F.col("word")).alias("s"), "cnt")
    return pair_counts(vocab).orderBy(F.desc("n"), F.asc("pair")).limit(30)


def _bpe_cte_chain(k: int) -> list[str]:
    """Shared k-round merge-loop CTEs: each round counts pairs, picks the
    (count DESC, pair ASC) winner into b{i}, and applies it with the same
    double-space `replace` the Spark side uses."""
    ctes = [
        f"""words AS (
            SELECT w AS word, COUNT(*) AS cnt
            FROM (SELECT unnest(string_split({_DUCK_NORM}, ' ')) AS w FROM documents)
            WHERE w <> '' GROUP BY w)""",
        """w0 AS (
            SELECT ' ' || array_to_string(
                       list_append(regexp_split_to_array(word, ''), '_'), '  ')
                   || ' ' AS s, cnt
            FROM words)""",
    ]
    for i in range(k):
        ctes.append(
            f"""p{i} AS (
            SELECT l[j] || ' ' || l[j + 1] AS pair, CAST(SUM(cnt) AS BIGINT) AS n
            FROM (SELECT string_split(trim(s), '  ') AS l, cnt FROM w{i}),
                 LATERAL (SELECT unnest(range(1, len(l))) AS j)
            GROUP BY 1)"""
        )
        ctes.append(f"b{i} AS (SELECT pair, n FROM p{i} ORDER BY n DESC, pair LIMIT 1)")
        ctes.append(
            f"""w{i + 1} AS (
            SELECT replace(s,
                       ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
                       ' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ') AS s,
                   cnt
            FROM w{i}, b{i})"""
        )
    return ctes


def _bpe_merges_oracle(k: int) -> str:
    selects = " UNION ALL ".join(
        f"""SELECT {i + 1} AS merge_rank, split_part(pair, ' ', 1) AS left_sym,
                   split_part(pair, ' ', 2) AS right_sym,
                   split_part(pair, ' ', 1) || split_part(pair, ' ', 2) AS merged,
                   n AS pair_count
            FROM b{i}"""
        for i in range(k)
    )
    return "WITH " + ",\n".join(_bpe_cte_chain(k)) + "\n" + selects + "\nORDER BY merge_rank"


def _bpe_encode_oracle(k: int) -> str:
    """Train (the b{i} chain) then tokenize every document with the
    learned merges — all inside one SQL statement."""
    ctes = _bpe_cte_chain(k)
    ctes.append(
        f"""d0 AS (
            SELECT doc_id,
                   ' ' || array_to_string(
                       list_transform(
                           list_filter(string_split({_DUCK_NORM}, ' '), w -> w <> ''),
                           w -> array_to_string(regexp_split_to_array(w, ''), '  ')
                                || '  _'),
                       '  ') || ' ' AS s
            FROM documents)"""
    )
    for i in range(k):
        ctes.append(
            f"""d{i + 1} AS (
            SELECT doc_id,
                   replace(s,
                       ' ' || split_part(pair, ' ', 1) || '  ' || split_part(pair, ' ', 2) || ' ',
                       ' ' || split_part(pair, ' ', 1) || split_part(pair, ' ', 2) || ' ') AS s
            FROM d{i}, b{i})"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT doc_id,
               CASE WHEN trim(s) = '' THEN 0
                    ELSE CAST(len(string_split(trim(s), '  ')) AS INT) END AS n_tokens,
               md5(CASE WHEN trim(s) = '' THEN ''
                        ELSE array_to_string(string_split(trim(s), '  '), ' ') END)
                   AS token_fp
        FROM d{k}
        ORDER BY doc_id"""
    )


@register(
    "bpe_learn_merges",
    oracle=_bpe_merges_oracle(_N_MERGES),
    tags=("B10",),
    doc="BPE vocabulary induction, merge table oracle-checked: 6 greedy "
    "merge rounds on the word-frequency table (the only corpus-scale "
    "pass is the word count). The double-space symbol encoding makes "
    "each merge a plain non-overlapping replace — identical greedy "
    "semantics in Spark and DuckDB (operators/bpe.py).",
)
def bpe_learn_merges(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return learn_merges(spark, d, _N_MERGES).orderBy("merge_rank")


@register(
    "bpe_encode",
    oracle=_bpe_encode_oracle(_N_MERGES),
    tags=("B10",),
    doc="Train-then-tokenize, end-to-end oracle-checked: learn 6 BPE "
    "merges on the corpus, then encode every document with them "
    "(per-doc token count + md5 fingerprint of the token sequence). "
    "Encoding is a narrow chain of replaces over a whole-document symbol "
    "string — safe because a learned pair's left symbol is never "
    "word-final, so no replace can straddle a word boundary "
    "(operators/bpe.py symbolize_document).",
)
def bpe_encode(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.bpe import (
        encode_documents,
    )

    d = t(spark, sf_dir, "documents")
    learned = learn_merges(spark, d, _N_MERGES).orderBy("merge_rank").collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in learned]
    return encode_documents(d, merges).orderBy("doc_id")


def _curriculum_oracle() -> str:
    scores = REGISTRY["text_quality_model_score"].oracle
    return f"""
        SELECT doc_id, quality_score,
               NTILE(4) OVER (ORDER BY quality_score DESC, doc_id) AS phase
        FROM ({scores}) s
        ORDER BY doc_id
    """


def _weighted_sample_oracle() -> str:
    scores = REGISTRY["text_quality_model_score"].oracle
    return f"""
        WITH keyed AS (
            SELECT doc_id, quality_score,
                   ROUND(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                                  AS BIGINT) + 0.5) / 4503599627370496.0)
                         / quality_score, 8) AS sample_key
            FROM ({scores}) s),
        ranked AS (
            SELECT doc_id, quality_score, sample_key,
                   ROW_NUMBER() OVER (ORDER BY sample_key DESC, doc_id) AS rank
            FROM keyed)
        SELECT doc_id, quality_score, sample_key, rank
        FROM ranked WHERE rank <= 100
        ORDER BY rank
    """


@register(
    "llm_weighted_sample",
    oracle=_weighted_sample_oracle(),
    tags=("B10",),
    doc="Quality-weighted sampling without replacement (Efraimidis-"
    "Spirakis A-ES): per-doc key = ln(u)/w with u derived from md5 of "
    "the id (content-stable — reruns and engines agree) and w = model "
    "quality score; global top-100 by key. One projection + a top-k — "
    "at scale a TakeOrderedAndProject, no full sort. The standard way "
    "to sample a corpus proportionally to quality in one pass.",
)
def llm_weighted_sample(spark, sf_dir):
    from pyspark.sql import Window as W

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        quality_model_score,
    )

    d = t(spark, sf_dir, "documents")
    scored = quality_model_score(d).select("doc_id", "quality_score")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("long")
        .cast("double")
        + 0.5
    ) / float(1 << 52)
    keyed = scored.withColumn(
        "sample_key", F.round(F.log(u) / F.col("quality_score"), 8)
    )
    w = W.orderBy(F.desc("sample_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 100)
        .orderBy("rank")
    )


@register(
    "llm_curriculum_phases",
    oracle=_curriculum_oracle(),
    tags=("B10",),
    doc="Curriculum ordering: rank the corpus by model quality score and "
    "cut it into 4 training phases (highest-quality first) with "
    "deterministic doc_id ties. NTILE here is the exact small-SF form; "
    "at 100 TB the same cut uses broadcast quantile cutpoints instead "
    "of a global window (documented trade, same assignment).",
)
def llm_curriculum_phases(spark, sf_dir):
    from pyspark.sql import Window as W

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        quality_model_score,
    )

    d = t(spark, sf_dir, "documents")
    scored = quality_model_score(d).select("doc_id", "quality_score")
    w = W.orderBy(F.desc("quality_score"), F.asc("doc_id"))
    return scored.withColumn("phase", F.ntile(4).over(w)).orderBy("doc_id")


@register(
    "dedup_ngram_prefix",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS ws FROM documents),
        sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(ws) >= 3
                        THEN list_transform(generate_series(1, len(ws) - 2),
                                            i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
                        ELSE [concat_ws(' ', ws)] END) AS shingles
            FROM toks),
        inv AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
                   COUNT(*) AS shared
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               ROUND(CAST(shared AS DOUBLE) / (n_a + n_b - shared), 6) AS jaccard
        FROM pairs
        WHERE CAST(shared AS DOUBLE) / (n_a + n_b - shared) >= 0.5
        ORDER BY id_a, id_b
    """,
    tags=("B10",),
    doc="Exact-Jaccard near-dup pairs (J >= 0.5) over the WHOLE corpus "
    "via PPJoin-style prefix filtering: the inverted index holds only "
    "each doc's |s|-ceil(0.5|s|)+1 first shingles under a global hash "
    "order, plus a length filter — provably identical results to the "
    "full-index join at ~half the index/collision cost (equality also "
    "pinned in tests at two thresholds). The oracle computes the naive "
    "full-index form: any pruning mistake changes the hash.",
)
def dedup_ngram_prefix(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs_prefix,
    )

    d = t(spark, sf_dir, "documents")
    res = ngram_jaccard_pairs_prefix(d, threshold=0.5)
    return res.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def _dataset_card_oracle() -> str:
    scores = REGISTRY["text_quality_model_score"].oracle
    return f"""
        WITH stats AS (
            SELECT d.source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN {_DUCK_NORM} = '' THEN 0
                            ELSE len(string_split({_DUCK_NORM}, ' ')) END) AS BIGINT)
                       AS token_total,
                   COUNT(DISTINCT md5(d.text)) AS distinct_docs,
                   ROUND(1.0 - CAST(COUNT(DISTINCT md5(d.text)) AS DOUBLE) / COUNT(*), 6)
                       AS dup_ratio,
                   ROUND(AVG(s.quality_score), 6) AS mean_quality
            FROM documents d JOIN ({scores}) s USING (doc_id)
            GROUP BY GROUPING SETS ((d.source), ())),
        langs AS (
            SELECT source, lang FROM (
                SELECT source, lang,
                       ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY COUNT(*) DESC, lang) AS rn
                FROM documents GROUP BY source, lang) WHERE rn = 1),
        lang_total AS (
            SELECT lang FROM (
                SELECT lang, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, lang) AS rn
                FROM documents GROUP BY lang) WHERE rn = 1)
        SELECT COALESCE(st.source, '__TOTAL__') AS source,
               st.n_docs, st.token_total, st.dup_ratio, st.mean_quality,
               COALESCE(l.lang, (SELECT lang FROM lang_total)) AS top_lang
        FROM stats st LEFT JOIN langs l ON st.source = l.source
        ORDER BY source
    """


@register(
    "llm_dataset_card",
    oracle=_dataset_card_oracle(),
    tags=("B10", "B4"),
    doc="Dataset-card generator: per-source + total rows with doc/token "
    "counts, exact duplicate ratio (distinct content md5), mean model "
    "quality, and the dominant language (deterministic argmax) — the "
    "release-documentation summary every corpus ships with. One "
    "documents scan + GROUPING SETS; the language mode runs over the "
    "tiny (source, lang) aggregate.",
)
def llm_dataset_card(spark, sf_dir):
    from pyspark.sql import Window as W

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import tokens
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        quality_model_score,
    )

    d = t(spark, sf_dir, "documents")
    scored = quality_model_score(d).select("doc_id", "quality_score")
    toks = tokens(F.col("text"))
    n_tok = F.when(F.size(toks) == 1, F.when(toks[0] == "", 0).otherwise(1)).otherwise(
        F.size(toks)
    )
    base = d.join(scored, "doc_id").select(
        "source", n_tok.alias("__nt"), F.md5("text").alias("__md5"), "quality_score"
    )
    stats = (
        base.groupingSets([["source"], []], "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("token_total"),
            F.round(
                1.0 - F.count_distinct(F.col("__md5")).cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_ratio"),
            F.round(F.avg("quality_score"), 6).alias("mean_quality"),
        )
    )
    lang_rn = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    )
    langs = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", lang_rn)
        .where(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    total_lang = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(W.orderBy(F.desc("n"), F.asc("lang"))))
        .where(F.col("rn") == 1)
        .select(F.col("lang").alias("__tl"))
    )
    return (
        stats.join(langs, on="source", how="left")
        .crossJoin(F.broadcast(total_lang))
        .select(
            F.coalesce(F.col("source"), F.lit("__TOTAL__")).alias("source"),
            "n_docs",
            "token_total",
            "dup_ratio",
            "mean_quality",
            F.coalesce(F.col("top_lang"), F.col("__tl")).alias("top_lang"),
        )
        .orderBy("source")
    )
