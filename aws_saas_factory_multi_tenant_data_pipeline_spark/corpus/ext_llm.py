"""B10 [EXT] LLM-data-pipeline operators over documents/embeddings
(BASELINE.json north_star): dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard), similarity search (brute-force + LSH), text analysis (token
counts, quality features, language ID, fingerprints), TF-IDF.

Approximate operators (MinHash, SimHash, LSH) have no SQL twin — they get
rows-only driver checks here plus recall/property tests in tests/.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_features,
    token_count,
)

# DuckDB twin of operators.dedup.normalize_text / tokens (regex classes differ
# in spelling only: \p{L}\p{N} ≡ [a-zA-Z0-9] for this ASCII corpus)
_DUCK_NORM = r"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"


@register(
    "dedup_exact",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, text, lang,
                   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents)
        SELECT doc_id, lang FROM keyed WHERE rn = 1
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Exact dedup: hash-keyed, deterministic min-id survivor.",
)
def dedup_exact(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return exact_dedup(d).select("doc_id", "lang").orderBy("doc_id")


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS ws FROM documents WHERE doc_id < 100),
        sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(ws) >= 3
                        THEN list_transform(generate_series(1, len(ws) - 2),
                                            i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
                        ELSE [concat_ws(' ', ws)] END) AS shingles
            FROM toks),
        inv AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b, COUNT(*) AS shared
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               ROUND(CAST(shared AS DOUBLE) / (n_a + n_b - shared), 6) AS jaccard
        FROM pairs
        WHERE CAST(shared AS DOUBLE) / (n_a + n_b - shared) >= 0.1
        ORDER BY id_a, id_b
    """,
    tags=("B10",),
    doc="Exact n-gram (3-shingle) Jaccard over an inverted-index self-join — "
    "the scalable near-dup ground truth (no O(n²) crossJoin).",
)
def dedup_ngram_jaccard(spark, sf_dir):
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return (
        ngram_jaccard_pairs(d, threshold=0.1)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_minhash_lsh",
    oracle=None,  # ◐ probabilistic; recall vs exact Jaccard asserted in tests/
    tags=("B10",),
    doc="MinHash-LSH near-dup candidates (64 hashes, 16 bands) verified with "
    "exact Jaccard ≥ 0.3; JVM-only expressions (transform/array_min).",
)
def dedup_minhash_lsh(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return minhash_near_duplicates(d, jaccard_threshold=0.3).orderBy("id_a", "id_b")


@register(
    "dedup_simhash",
    oracle=None,  # engine-specific hash bits; Hamming-distance properties tested in tests/
    tags=("B10",),
    doc="64-bit SimHash signatures via explode + 64 per-bit sign aggregates.",
)
def dedup_simhash(spark, sf_dir):
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return simhash(d).orderBy("doc_id")


@register(
    "similarity_topk_cosine",
    oracle="""
        WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
        queries AS (SELECT vec_id AS query_id, embedding AS q FROM embeddings WHERE vec_id < 8),
        scored AS (
            SELECT query_id, vec_id,
                   ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(q AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(q AS DOUBLE[]), CAST(q AS DOUBLE[])))), 6) AS cosine
            FROM corpus CROSS JOIN queries
            WHERE vec_id != query_id),
        ranked AS (
            SELECT query_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
            FROM scored)
        SELECT query_id, vec_id, cosine, rank
        FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank
    """,
    tags=("B10",),
    doc="Brute-force exact top-10 cosine for 8 query vectors (broadcast "
    "queries, JVM zip_with/aggregate dot products; ties by vec_id).",
)
def similarity_topk_cosine(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return cosine_topk(emb, queries, k=10).orderBy("query_id", "rank")


@register(
    "similarity_lsh_ann",
    oracle=None,  # ◐ approximate; recall vs brute force asserted in tests/
    tags=("B10",),
    doc="LSH-bucketed approximate NN (random hyperplanes, 4 tables × 12 bits) "
    "— the 100 TB path: equi-join on signatures instead of crossJoin.",
)
def similarity_lsh_ann(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return lsh_cosine_topk(emb, queries, k=10).orderBy("query_id", "rank")


@register(
    "text_stats",
    oracle=f"""
        SELECT doc_id,
               length(text) AS n_chars_calc,
               len(string_split({_DUCK_NORM}, ' ')) AS n_tokens,
               len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS n_punct,
               (n_chars = length(text)) AS n_chars_matches
        FROM documents
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Text stats: char/token/punctuation counts (whitespace tokenizer).",
)
def text_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        F.length(c).alias("n_chars_calc"),
        token_count(c).alias("n_tokens"),
        F.size(F.regexp_extract_all(c, F.lit(r"([^\p{L}\p{N}\s])"), 1)).alias("n_punct"),
        (F.col("n_chars") == F.length(c)).alias("n_chars_matches"),
    ).orderBy("doc_id")


@register(
    "text_quality",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, text, string_split({_DUCK_NORM}, ' ') AS ws FROM documents)
        SELECT doc_id,
               ROUND(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                     / GREATEST(length(text), 1), 6) AS punct_ratio,
               ROUND(CAST(len(list_intersect(list_distinct(ws),
                     ['the','a','and','of','to','in','is','it','that','for'])) AS DOUBLE)
                     / GREATEST(len(list_distinct(ws)), 1), 6) AS stopword_ratio,
               ROUND(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                     / GREATEST(len(ws), 1), 6) AS mean_word_len
        FROM toks
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Quality-filter features: punctuation ratio, stopword ratio, mean word length.",
)
def text_quality(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return quality_features(d).select(
        "doc_id", "punct_ratio", "stopword_ratio", "mean_word_len"
    ).orderBy("doc_id")


@register(
    "text_language_id",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang,
                   list_distinct(string_split(trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')) AS ws
            FROM documents),
        scores AS (
            SELECT doc_id, lang,
                   len(list_intersect(ws, ['der','die','das','und','ist','ein','eine','zu','den','von'])) AS score_de,
                   len(list_intersect(ws, ['the','a','and','of','to','in','is','it','that','for'])) AS score_en,
                   len(list_intersect(ws, ['el','la','de','que','y','en','un','una','los','por'])) AS score_es,
                   len(list_intersect(ws, ['le','la','de','et','un','une','les','des','est','pour'])) AS score_fr
            FROM toks),
        best AS (
            SELECT *, GREATEST(score_de, score_en, score_es, score_fr) AS mx FROM scores)
        SELECT doc_id, lang,
               CASE WHEN mx = 0 THEN 'und'
                    WHEN score_de = mx THEN 'de'
                    WHEN score_en = mx THEN 'en'
                    WHEN score_es = mx THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM best
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Stopword-score language ID (argmax, code-order ties) — deterministic "
    "heuristic; accuracy vs the lang column asserted in tests/.",
)
def text_language_id(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return language_id(d).select("doc_id", "lang", "pred_lang").orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_NORM} AS norm, string_split({_DUCK_NORM}, ' ') AS ws
            FROM documents),
        sh AS (
            SELECT doc_id, norm,
                   list_distinct(CASE WHEN len(ws) >= 3
                        THEN list_transform(generate_series(1, len(ws) - 2),
                                            i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
                        ELSE [concat_ws(' ', ws)] END) AS shingles
            FROM toks)
        SELECT doc_id,
               list_min(list_transform(shingles, s -> md5(s))) AS fingerprint,
               md5(norm) AS norm_fingerprint
        FROM sh
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Winnowing-style fingerprints: min-md5 over 3-shingles + whole-doc "
    "normalized md5 (md5 so both engines compute identical values).",
)
def text_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return fingerprint(d).select("doc_id", "fingerprint", "norm_fingerprint").orderBy("doc_id")


@register(
    "text_token_count_bpe",
    oracle="""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_pieces
        FROM documents
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="BPE-ish token counting (letter runs / digit runs / punct singletons).",
)
def text_token_count_bpe(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", bpe_ish_token_count(F.col("text")).alias("n_pieces")).orderBy(
        "doc_id"
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split({_DUCK_NORM}, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
            SELECT doc_id, term, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
            FROM scored)
        SELECT doc_id, term, tfidf, rk
        FROM ranked WHERE rk <= 3 AND doc_id < 50
        ORDER BY doc_id, rk
    """,
    tags=("B10",),
    doc="TF-IDF top-3 terms per doc: explode → tf/df aggs → window top-k "
    "(ties by term; idf = ln(N/df)).",
)
def text_tfidf_top_terms(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import tokens

    d = t(spark, sf_dir, "documents")
    # r15: split the corpus-global statistics from the scored slice.
    # df/n_docs must see EVERY document, but tf and both output windows
    # only matter for the doc_id < 50 slice the query returns — so the
    # slice filter is pushed into its own scan (PushedFilters carries
    # doc_id < 50) and only ~50 docs' terms reach the tf aggregation and
    # the rank window, instead of the whole corpus flowing through a
    # by-term window + a by-doc window. The df side stays an aggregation
    # over all docs (one distinct-terms explode, map-side combined); the
    # pruned tf side is broadcast — bounded by the query's doc slice, so
    # the vocabulary-sized df frame streams and is never broadcast or
    # window-sorted. df per term is COUNT of distinct docs containing it,
    # identical to the old whole-partition window count over tf.
    # r16 (guide §2.5 input parallelism): the full-corpus distinct-terms
    # tokenize — the query's one remaining corpus-sized pass — ran on the
    # scan's 1-2 partitions; conditional fan-out spreads it (fanout.py).
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.fanout import (
        fan_out_scan,
    )

    toks_all = fan_out_scan(d, "doc_id").select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    dfreq = toks_all.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    pr = d.where(F.col("doc_id") < 50).select(
        "doc_id", tokens(F.col("text")).alias("__toks")
    )
    tf = (
        pr.select("doc_id", F.explode("__toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        dfreq.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .orderBy("doc_id", "rk")
        .select("doc_id", "term", "tfidf", "rk")
    )


@register(
    "dedup_embedding_cosine",
    oracle="""
        WITH pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                         / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                            * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 150 AND b.vec_id < 150)
        SELECT id_a, id_b, cosine
        FROM pairs WHERE cosine >= 0.3
        ORDER BY id_a, id_b
    """,
    tags=("B10",),
    doc="Embedding-cosine near-duplicate pairs (cos ≥ 0.3) — brute-force "
    "ground truth on a bounded slice; the LSH bucketing in operators/"
    "similarity.py is the 100 TB path for the same predicate.",
)
def dedup_embedding_cosine(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import dot, with_norm

    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 150)
    a = with_norm(emb).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), F.col("__norm").alias("na")
    )
    b = with_norm(emb).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), F.col("__norm").alias("nb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.3)
        .orderBy("id_a", "id_b")
    )


@register(
    "multimodal_features",
    oracle="""
        SELECT doc_id AS media_id,
               sha256(text) AS payload_sha256,
               octet_length(encode(text)) AS payload_bytes
        FROM documents
        ORDER BY media_id
    """,
    tags=("B10",),
    doc="Multimodal plumbing, oracle-checked: documents' text bytes stand in "
    "for an opaque binary payload; the mapInPandas Arrow path (operators/"
    "multimodal.py) computes digests/sizes that must match the oracle "
    "byte-for-byte. The real codec step is the documented container stub.",
)
def multimodal_features(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        extract_features,
    )

    d = t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None)
        .cast(
            "struct<width:int,height:int,sample_rate:int,n_frames:int,mime:string>"
        )
        .alias("meta"),
    )
    return (
        extract_features(media)
        .select("media_id", "payload_sha256", "payload_bytes")
        .orderBy("media_id")
    )


@register(
    "similarity_ivf_ann",
    oracle=None,  # ◐ approximate; recall vs brute force asserted in tests/
    tags=("B10",),
    doc="IVF approximate NN: deterministic centroid sample, max-cosine list "
    "assignment, n_probe-list search — the partition-pruning scale path "
    "(operators/similarity.py ivf_cosine_topk).",
)
def similarity_ivf_ann(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        ivf_cosine_topk,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return ivf_cosine_topk(emb, queries, k=10, n_probe=6, refine_iters=1).orderBy("query_id", "rank")


@register(
    "dedup_clusters_resolve",
    # connected components IS SQL-expressible as a recursive transitive
    # closure — the oracle replicates min-label propagation's fixpoint
    # (cluster_id = min doc id reachable over symmetrized pair edges)
    oracle=f"""
        WITH RECURSIVE toks AS (
            SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS ws
            FROM documents WHERE doc_id < 200),
        sh AS (
            SELECT doc_id,
                   list_distinct(CASE WHEN len(ws) >= 3
                        THEN list_transform(generate_series(1, len(ws) - 2),
                                            i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
                        ELSE [concat_ws(' ', ws)] END) AS shingles
            FROM toks),
        inv AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s FROM sh),
        pairs_raw AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b,
                   COUNT(*) AS shared
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4),
        pairs AS (
            SELECT id_a, id_b FROM pairs_raw
            WHERE CAST(shared AS DOUBLE) / (n_a + n_b - shared) >= 0.2),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs),
        reach AS (
            SELECT src AS node, src AS root FROM edges
            UNION
            SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node AS node_id, MIN(root) AS cluster_id
        FROM reach GROUP BY node
        ORDER BY node_id
    """,
    tags=("B10",),
    doc="Near-dup cluster resolution: n-gram Jaccard pairs → connected "
    "components (iterative min-label propagation) → one canonical doc per "
    "cluster. Oracle: recursive-CTE transitive closure computing the same "
    "min-reachable-id fixpoint (union-find also property-verified in tests/).",
)
def dedup_clusters_resolve(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(d, threshold=0.2)
    return dedup_clusters(pairs).orderBy("node_id")


@register(
    "text_quality_filter",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, text, n_chars, string_split({_DUCK_NORM}, ' ') AS ws FROM documents),
        feats AS (
            SELECT doc_id,
                   n_chars,
                   len(ws) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                       / GREATEST(length(text), 1) AS punct_ratio,
                   CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                       / GREATEST(len(ws), 1) AS mean_word_len
            FROM toks)
        SELECT doc_id,
               (n_chars BETWEEN 100 AND 2000
                AND n_tokens >= 20
                AND punct_ratio < 0.1
                AND mean_word_len BETWEEN 2.0 AND 12.0) AS keep
        FROM feats
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Composite quality filter: the standard keep/drop gate for LLM "
    "corpora built from the quality_features columns.",
)
def text_quality_filter(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    q = quality_features(d)
    keep = (
        F.col("n_chars").between(100, 2000)
        & (F.col("n_tokens") >= 20)
        & (F.col("punct_ratio") < 0.1)
        & F.col("mean_word_len").between(2.0, 12.0)
    )
    return q.select("doc_id", keep.alias("keep")).orderBy("doc_id")


@register(
    "llm_corpus_prep",
    oracle="""
        WITH deduped AS (
            SELECT doc_id, text, source,
                   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents),
        filtered AS (
            SELECT doc_id, source,
                   len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                       AS n_tokens
            FROM deduped
            WHERE rn = 1
              AND length(text) BETWEEN 50 AND 20000
              AND CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                  / GREATEST(length(text), 1) <= 0.25),
        packed AS (
            SELECT doc_id, source, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
            FROM filtered)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM packed
        WHERE cum_tokens <= 20000
        GROUP BY source
        ORDER BY source
    """,
    tags=("B10",),
    doc="End-to-end LLM corpus prep, the [EXT] flagship composition: exact "
    "dedup (md5 min-id survivor) -> quality gate (length window + "
    "punctuation-ratio cap) -> BPE-ish token count -> per-source token-"
    "budget packing (cumulative window, 20k tokens/source) -> shard "
    "manifest stats. One scan, three exchanges (dedup key, source window, "
    "final ordered agg); "
    "every stage is the scalable operator from operators/ — the same plan "
    "shape packs 100 TB into training shards.",
)
def llm_corpus_prep(spark, sf_dir):
    from pyspark.sql import Window as W

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import exact_dedup
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        bpe_ish_token_count,
    )

    d = t(spark, sf_dir, "documents")
    deduped = exact_dedup(d)
    punct_ratio = (
        F.size(F.regexp_extract_all("text", F.lit(r"([^a-zA-Z0-9\s])"), 1)).cast("double")
        / F.greatest(F.length("text"), F.lit(1))
    )
    filtered = (
        deduped.where(F.length("text").between(50, 20000))
        .where(punct_ratio <= 0.25)
        .select("doc_id", "source", bpe_ish_token_count(F.col("text")).alias("n_tokens"))
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    packed = filtered.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return (
        packed.where(F.col("cum_tokens") <= 20000)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source")
    )


@register(
    "llm_train_val_split",
    oracle="""
        WITH hashed AS (
            SELECT source,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split-seed-42'), 1, 4))
                        AS INTEGER) % 100 AS bucket
            FROM documents),
        labeled AS (
            SELECT source,
                   CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM hashed)
        SELECT source, split, COUNT(*) AS n
        FROM labeled
        GROUP BY source, split
        ORDER BY source, split
    """,
    tags=("B10",),
    doc="Deterministic train/val/test split (80/10/10) by hashing the doc "
    "id with a fixed seed salt — md5 on both engines, so the assignment "
    "is content-stable across runs, engines, and repartitioning (the "
    "property random() can never give). Same trick = stratified sampling "
    "at any rate. Pure projection + one groupBy: trivially 100 TB-safe.",
)
def llm_train_val_split(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split-seed-42"))), 1, 4), 16, 10).cast("long"),
        F.lit(100),
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n"))
        .orderBy("source", "split")
    )


@register(
    "llm_sequence_pack",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source,
                   len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                       AS n_tokens
            FROM documents),
        packed AS (
            SELECT doc_id, source, n_tokens,
                   CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) / 2048)
                        AS BIGINT) AS seq_bin
            FROM toks)
        SELECT source, seq_bin,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
        FROM packed
        GROUP BY source, seq_bin
        ORDER BY source, seq_bin
    """,
    tags=("B10",),
    doc="Sequence packing (next-fit): assign docs to fixed-budget training "
    "sequences (2048 BPE-ish tokens) via a cumulative window — bin = "
    "floor(tokens-before-me / budget) per source. One shuffle (the "
    "per-source window); the greedy first-fit variant needs per-shard "
    "applyInPandas, but next-fit stays fully in codegen and is the "
    "standard scale trade (≤1 doc per bin spills its tail).",
)
def llm_sequence_pack(spark, sf_dir):
    from pyspark.sql import Window as W

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        bpe_ish_token_count,
    )

    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", bpe_ish_token_count(F.col("text")).alias("n_tokens"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    packed = toks.withColumn(
        "seq_bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048).cast("long"),
    )
    return (
        packed.groupBy("source", "seq_bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").cast("long").alias("bin_tokens"))
        .orderBy("source", "seq_bin")
    )


@register(
    "text_repetition_score",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS ws FROM documents),
        sh AS (
            SELECT doc_id,
                   CASE WHEN len(ws) >= 3
                        THEN list_transform(generate_series(1, len(ws) - 2),
                                            i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
                        ELSE [concat_ws(' ', ws)] END AS shingles
            FROM toks)
        SELECT doc_id,
               len(shingles) AS n_shingles,
               len(list_distinct(shingles)) AS n_distinct,
               ROUND(1.0 - CAST(len(list_distinct(shingles)) AS DOUBLE)
                     / GREATEST(len(shingles), 1), 6) AS rep_ratio
        FROM sh
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Within-document repetition score: fraction of duplicate word "
    "3-grams per document — the standard corpus-quality signal for "
    "filtering boilerplate/template text (high rep_ratio = repeated "
    "blocks). Pure narrow projection per doc, no shuffle at all: "
    "trivially 100 TB-safe.",
)
def text_repetition_score(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import tokens

    d = t(spark, sf_dir, "documents")
    # NOTE: shingles here keep duplicates (no array_distinct) — that IS the
    # signal — so build from tokens directly rather than shingles_of
    toks = d.withColumn("__toks", tokens(F.col("text")))
    n = F.size("__toks")
    idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))
    sh = F.when(
        n >= 3,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, 3))),
    ).otherwise(F.array(F.concat_ws(" ", F.col("__toks"))))
    shingled = toks.withColumn("__sh", sh)
    return shingled.select(
        "doc_id",
        F.size("__sh").alias("n_shingles"),
        F.size(F.array_distinct("__sh")).alias("n_distinct"),
        F.round(
            1.0 - F.size(F.array_distinct("__sh")).cast("double")
            / F.greatest(F.size("__sh"), F.lit(1)),
            6,
        ).alias("rep_ratio"),
    ).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle="""
        WITH media AS (
            SELECT event_id AS media_id, (event_id % 50) + 1 AS n_frames
            FROM events WHERE event_id <= 2000)
        SELECT media_id, unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx,
               n_frames
        FROM media
        ORDER BY media_id, frame_idx
    """,
    tags=("B10",),
    doc="Video frame-sampling plumbing (operators.multimodal.sample_frames): "
    "one output row per every-10th frame, driven by typed metadata — the "
    "explode(sequence(...)) pattern that fans a 100 TB video corpus out to "
    "frame rows without any codec in the plan (decode happens in the "
    "downstream mapInPandas stage).",
)
def multimodal_frame_sample(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    e = t(spark, sf_dir, "events").where(F.col("event_id") <= 2000)
    media = e.select(
        F.col("event_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            (F.pmod("event_id", F.lit(50)) + 1).cast("int").alias("n_frames"),
            F.lit("video/mp4").alias("mime"),
        ).alias("meta"),
    )
    return (
        sample_frames(media, every_n=10)
        .select("media_id", "frame_idx", F.col("meta.n_frames").cast("long").alias("n_frames"))
        .orderBy("media_id", "frame_idx")
    )


@register(
    "llm_decontaminate",
    oracle="""
        WITH eval_set AS (
            -- an eval benchmark assembled (partly) from corpus text: every
            -- 7th document's content under a new eval id
            SELECT doc_id + 100000 AS eval_id, md5(text) AS h
            FROM documents WHERE doc_id % 7 = 0),
        train AS (SELECT DISTINCT md5(text) AS h FROM documents)
        SELECT e.eval_id AS contaminated_eval_doc
        FROM eval_set e
        WHERE e.h IN (SELECT h FROM train)
        ORDER BY contaminated_eval_doc
    """,
    tags=("B10",),
    doc="Decontamination: eval-set documents whose exact content hash also "
    "appears in the training corpus must be flagged (and dropped) before "
    "evaluation — the standard train/test-leakage guard. The eval set is "
    "deterministically synthesized from corpus text so the overlap is "
    "non-trivial at every SF. Hash semi-join on 16-byte digests, never on "
    "document bodies; the near-dup variant swaps the md5 key for MinHash "
    "band signatures (same join shape).",
)
def llm_decontaminate(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    eval_set = d.where(F.pmod("doc_id", F.lit(7)) == 0).select(
        (F.col("doc_id") + 100000).alias("eval_id"), F.md5("text").alias("h")
    )
    train = d.select(F.md5("text").alias("h")).distinct()
    return (
        eval_set.join(train, "h", "left_semi")
        .select(F.col("eval_id").alias("contaminated_eval_doc"))
        .orderBy("contaminated_eval_doc")
    )


@register(
    "text_quality_model_score",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, text, string_split({_DUCK_NORM}, ' ') AS ws FROM documents),
        feats AS (
            SELECT doc_id,
                   CASE WHEN len(ws) = 1 AND ws[1] = '' THEN 0 ELSE len(ws) END AS n_tokens,
                   ROUND(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE)
                         / GREATEST(length(text), 1), 6) AS punct_ratio,
                   ROUND(CAST(len(list_intersect(list_distinct(ws),
                         ['the','a','and','of','to','in','is','it','that','for'])) AS DOUBLE)
                         / GREATEST(len(list_distinct(ws)), 1), 6) AS stopword_ratio,
                   ROUND(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
                         / GREATEST(CASE WHEN len(ws) = 1 AND ws[1] = '' THEN 0
                                         ELSE len(ws) END, 1), 6) AS mean_word_len
            FROM toks),
        scored AS (
            SELECT doc_id,
                   ROUND(1.0 / (1.0 + exp(-(-0.8 + stopword_ratio * 3.0
                         + punct_ratio * -4.0 + mean_word_len * 0.08
                         + CAST(n_tokens AS DOUBLE) * 0.0004))), 6) AS quality_score
            FROM feats)
        SELECT doc_id, quality_score, (quality_score >= 0.5) AS quality_keep
        FROM scored
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Model-based quality scoring (operators.text.quality_model_score): "
    "sigmoid of a fixed linear model over the cheap quality features — the "
    "fasttext/logreg classifier shape with in-code weights so the oracle "
    "replicates the exact arithmetic. Narrow projection, no shuffle.",
)
def text_quality_model_score(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        quality_model_score,
    )

    d = t(spark, sf_dir, "documents")
    return quality_model_score(d).select(
        "doc_id", "quality_score", "quality_keep"
    ).orderBy("doc_id")
