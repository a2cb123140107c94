"""B10 [EXT] wave 3 (round 4): span-level substring dedup, embedding
quantization, and corpus-frequency analytics for LLM training-data
pipelines.

Span-level dedup is the Lee et al. 2022 technique (arXiv:2107.06499):
remove every n-token span that occurs more than once in the corpus —
duplicated substrings drive memorization even when whole-document dedup
(exact / MinHash) passes. Implemented in `operators.dedup.
remove_duplicate_spans`; the oracle replays the identical span semantics
in DuckDB over the span STRINGS (the Spark side shuffles 64-bit xxhash64
span keys instead — results agree modulo hash collisions, which at 2^-64
per pair is the standard engineering trade at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import REGISTRY, register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
    remove_duplicate_spans,
)

_DUCK_NORM = r"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g'))"

_SPAN_N = 8


@register(
    "dedup_span_removal",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS tk FROM documents),
        spans AS (
            SELECT doc_id, CAST(i AS INT) AS pos,
                   array_to_string(tk[i+1:i+{_SPAN_N}], ' ') AS sp
            FROM toks, LATERAL (SELECT unnest(range(0, len(tk) - {_SPAN_N} + 1)) AS i)
            WHERE len(tk) >= {_SPAN_N}),
        dup AS (SELECT sp FROM spans GROUP BY sp HAVING COUNT(*) >= 2),
        cov AS (
            SELECT doc_id, pos AS s, pos + {_SPAN_N} - 1 AS e
            FROM spans WHERE sp IN (SELECT sp FROM dup)),
        brk AS (
            SELECT doc_id, s, e,
                   CASE WHEN s > COALESCE(MAX(e) OVER (
                            PARTITION BY doc_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS b
            FROM cov),
        grp AS (
            SELECT doc_id, s, e,
                   SUM(b) OVER (PARTITION BY doc_id ORDER BY s, e) AS g
            FROM brk),
        merged AS (
            SELECT doc_id, MIN(s) AS ms, MAX(e) AS me
            FROM grp GROUP BY doc_id, g),
        removed AS (
            SELECT doc_id, SUM(me - ms + 1) AS n_removed FROM merged GROUP BY doc_id),
        tokpos AS (
            SELECT doc_id, unnest(tk) AS tok,
                   unnest(range(0, len(tk))) AS p
            FROM toks),
        clean AS (
            SELECT tp.doc_id,
                   COALESCE(string_agg(tok, ' ' ORDER BY p), '') AS clean_text
            FROM tokpos tp
            WHERE NOT EXISTS (
                SELECT 1 FROM merged m
                WHERE m.doc_id = tp.doc_id AND tp.p BETWEEN m.ms AND m.me)
            GROUP BY tp.doc_id)
        SELECT t.doc_id,
               len(t.tk) AS n_tokens,
               CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
               COALESCE(c.clean_text, '') AS clean_text
        FROM toks t
        LEFT JOIN removed r ON r.doc_id = t.doc_id
        LEFT JOIN clean c ON c.doc_id = t.doc_id
        ORDER BY t.doc_id
    """,
    tags=("B10",),
    doc=f"Span-level substring dedup (Lee et al.): drop every {_SPAN_N}-token "
    "span occurring >=2x corpus-wide, merge overlapping hits per doc "
    "(islands window), reconstruct the surviving text in order. Spark "
    "shuffles 8-byte span hashes; the oracle replays the same semantics "
    "on span strings.",
)
def dedup_span_removal(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return remove_duplicate_spans(d, "text", "doc_id", n=_SPAN_N, min_count=2).orderBy(
        "doc_id"
    )


@register(
    "embedding_int8_quantize",
    oracle="""
        WITH m AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
            FROM embeddings),
        q AS (
            SELECT vec_id, embedding, maxabs, maxabs / 127.0 AS scale,
                   CASE WHEN maxabs = 0
                        THEN list_transform(embedding, x -> 0)
                        ELSE list_transform(embedding,
                             x -> CAST(floor(CAST(x AS DOUBLE) / (maxabs / 127.0) + 0.5) AS INT))
                   END AS qcodes
            FROM m),
        e AS (
            SELECT vec_id, qcodes, scale,
                   list_transform(list_zip(embedding, qcodes),
                       s -> CAST(s[1] AS DOUBLE)
                            - CAST(s[2] AS DOUBLE) * scale) AS err
            FROM q)
        SELECT vec_id, md5(array_to_string(qcodes, ',')) AS qcodes_md5,
               ROUND(scale, 9) AS qscale,
               ROUND(list_sum(list_transform(err, x -> x * x)) / len(err), 9) AS mse,
               ROUND(list_max(list_transform(err, x -> abs(x))), 9) AS max_err
        FROM e
        ORDER BY vec_id
    """,
    tags=("B10",),
    doc="Symmetric per-vector int8 quantization of the embedding column "
    "(scale = max|v|/127, explicit half-up rounding) + reconstruction "
    "error stats — the 4x shuffle/cache compression step before ANN "
    "index builds. Codes verified element-for-element via an md5 over the "
    "canonical joined code string (a bare list column crashes the "
    "driver's sort-based canonicalizer).",
)
def embedding_int8_quantize(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        dequantize_int8,
        quantize_int8,
    )

    emb = t(spark, sf_dir, "embeddings")
    q = quantize_int8(emb)
    orig = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    err = F.zip_with(
        orig, dequantize_int8(F.col("qcodes"), F.col("qscale")), lambda a, b: a - b
    )
    qe = q.withColumn("__err", err)
    return qe.select(
        "vec_id",
        F.md5(
            F.array_join(F.transform("qcodes", lambda x: x.cast("string")), ",")
        ).alias("qcodes_md5"),
        F.round("qscale", 9).alias("qscale"),
        F.round(
            F.aggregate("__err", F.lit(0.0), lambda acc, x: acc + x * x)
            / F.size("__err"),
            9,
        ).alias("mse"),
        F.round(F.array_max(F.transform("__err", F.abs)), 9).alias("max_err"),
    ).orderBy("vec_id")


@register(
    "text_frequent_bigrams",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS tk FROM documents),
        grams AS (
            SELECT array_to_string(tk[i+1:i+2], ' ') AS gram
            FROM toks, LATERAL (SELECT unnest(range(0, len(tk) - 1)) AS i)
            WHERE len(tk) >= 2),
        tot AS (SELECT COUNT(*) AS total FROM grams)
        SELECT gram, COUNT(*) AS freq,
               ROUND(COUNT(*) / CAST(total AS DOUBLE), 6) AS ratio
        FROM grams, tot
        GROUP BY gram, total
        HAVING COUNT(*) >= total * 0.0012
        ORDER BY freq DESC, gram
    """,
    tags=("B10",),
    doc="Exact corpus heavy-hitter bigrams (freq >= 0.12% of all bigram "
    "occurrences) via the two-phase candidate-prune plan: per-Arrow-batch "
    "local counts emit candidates (bounded memory, no false negatives), "
    "then a broadcast semi-join + exact count verifies — the long-tail "
    "vocabulary never crosses the shuffle. Final counts are exact, so "
    "the probabilistic phase is invisible to the oracle.",
)
def text_frequent_bigrams(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        frequent_ngrams,
    )

    d = t(spark, sf_dir, "documents")
    return frequent_ngrams(d, "text", n=2, min_ratio=0.0012).orderBy(
        F.col("freq").desc(), "gram"
    )


@register(
    "text_bigram_lm_score",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS tk FROM documents),
        doc_bg AS (
            SELECT doc_id, tk[i+1] AS w1, tk[i+2] AS w2
            FROM toks, LATERAL (SELECT unnest(range(0, len(tk) - 1)) AS i)
            WHERE len(tk) >= 2),
        big AS (SELECT w1, w2, COUNT(*) AS cb FROM doc_bg GROUP BY 1, 2),
        uni AS (
            SELECT w, COUNT(*) AS cu
            FROM (SELECT unnest(tk) AS w FROM toks) GROUP BY 1),
        v AS (SELECT COUNT(*) AS vocab FROM uni),
        scored AS (
            SELECT d.doc_id,
                   -ln((COALESCE(b.cb, 0) + 1.0)
                       / (COALESCE(u.cu, 0) + 1.0 * vocab)) AS nl
            FROM doc_bg d
            LEFT JOIN big b ON b.w1 = d.w1 AND b.w2 = d.w2
            LEFT JOIN uni u ON u.w = d.w1
            CROSS JOIN v),
        per_doc AS (
            SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(nl), 6) AS nll
            FROM scored GROUP BY doc_id)
        SELECT t.doc_id,
               COALESCE(p.n_bigrams, 0) AS n_bigrams,
               p.nll
        FROM (SELECT DISTINCT doc_id FROM documents) t
        LEFT JOIN per_doc p ON p.doc_id = t.doc_id
        ORDER BY t.doc_id
    """,
    tags=("B10",),
    doc="CCNet-style statistical quality score: per-document average "
    "negative log-likelihood under an add-1-smoothed bigram LM trained on "
    "the corpus itself. All counts + gram-keyed joins, no Python; "
    "boilerplate scores low, out-of-distribution text scores high.",
)
def text_bigram_lm_score(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        bigram_lm_score,
    )

    d = t(spark, sf_dir, "documents")
    return bigram_lm_score(d, "text", "doc_id", k=1.0).orderBy("doc_id")


@register(
    "dataset_manifest",
    oracle="""
        WITH h AS (
            SELECT source,
                   CAST('0x' || substr(md5(concat_ws(chr(31),
                        coalesce(CAST(doc_id AS VARCHAR), chr(0)),
                        coalesce(text, chr(0)),
                        coalesce(lang, chr(0)))), 1, 15) AS BIGINT) AS hh,
                   length(concat_ws(chr(31),
                        coalesce(CAST(doc_id AS VARCHAR), chr(0)),
                        coalesce(text, chr(0)),
                        coalesce(lang, chr(0)))) AS len
            FROM documents)
        SELECT COALESCE(source, '__TOTAL__') AS source,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(hh AS HUGEINT)) % 2305843009213693951 AS BIGINT)
                   AS content_fingerprint,
               CAST(SUM(len) AS BIGINT) AS content_chars
        FROM h
        GROUP BY ROLLUP(source)
        ORDER BY source
    """,
    tags=("B10",),
    doc="Dataset versioning manifest: order-independent modular row-hash "
    "sum per source + whole-corpus rollup — stable under repartitioning "
    "and file layout, moves on any content change, localizes drift to the "
    "slice that changed. Hash-for-hash oracle (md5-portable row hash).",
)
def dataset_manifest(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.manifest import (
        dataset_fingerprint,
    )

    d = t(spark, sf_dir, "documents")
    return dataset_fingerprint(d, ["source"], ["doc_id", "text", "lang"]).orderBy(
        "source"
    )


@register(
    "llm_mixture_plan",
    oracle=f"""
        WITH counts AS (
            SELECT source,
                   CASE WHEN {_DUCK_NORM} = '' THEN 0
                        ELSE len(string_split({_DUCK_NORM}, ' ')) END AS n_tokens
            FROM documents),
        per_src AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS available_tokens
            FROM counts GROUP BY source),
        tot AS (SELECT SUM(available_tokens) AS n FROM per_src),
        withp AS (
            SELECT *, available_tokens / CAST(n AS DOUBLE) AS p
            FROM per_src, tot),
        z AS (SELECT SUM(pow(p, 0.5)) AS z FROM withp),
        planned AS (
            SELECT source, n_docs, available_tokens,
                   pow(p, 0.5) / z AS weight,
                   CAST(floor(pow(p, 0.5) / z * 100000) AS BIGINT) AS target_tokens,
                   CAST(floor(available_tokens * 4.0) AS BIGINT) AS cap
            FROM withp, z)
        SELECT source, n_docs, available_tokens,
               ROUND(weight, 6) AS weight,
               target_tokens,
               ROUND(target_tokens / CAST(available_tokens AS DOUBLE), 6) AS epochs,
               LEAST(target_tokens, cap) AS planned_tokens,
               target_tokens - LEAST(target_tokens, cap) AS shortfall_tokens
        FROM planned
        ORDER BY source
    """,
    tags=("B10",),
    doc="Temperature-flattened (alpha=0.5, XLM-R rule) token-budget plan "
    "across sources with data-constrained epoch caps (<=4 passes, "
    "Muennighoff et al.): weights, per-source token targets, epochs, and "
    "unmet-budget shortfall. Two tiny shuffles at any corpus size.",
)
def llm_mixture_plan(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sampling import (
        temperature_mixture_plan,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        token_count,
    )

    d = t(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    return temperature_mixture_plan(
        d, "n_tokens", "source", total_budget=100_000, alpha=0.5, max_epochs=4.0
    ).orderBy("source")


_MANIFEST_HASH = """
    CAST('0x' || substr(md5(concat_ws(chr(31),
         coalesce(CAST(doc_id AS VARCHAR), chr(0)),
         coalesce(text, chr(0)),
         coalesce(lang, chr(0)))), 1, 15) AS BIGINT)
"""


@register(
    "dataset_manifest_diff",
    oracle=f"""
        WITH new_docs AS (
            SELECT doc_id, text, lang, source FROM documents
            WHERE source <> (SELECT MIN(source) FROM documents)
              AND doc_id % 97 <> 0
            UNION ALL
            SELECT i + 1000000 AS doc_id,
                   'new doc ' || CAST(i AS VARCHAR) AS text,
                   'en' AS lang, 'zz_new' AS source
            FROM range(0, 5) t(i)),
        old_m AS (
            SELECT COALESCE(source, '__TOTAL__') AS source, COUNT(*) AS n_rows,
                   CAST(SUM(CAST({_MANIFEST_HASH} AS HUGEINT))
                        % 2305843009213693951 AS BIGINT) AS fp
            FROM documents GROUP BY ROLLUP(source)),
        new_m AS (
            SELECT COALESCE(source, '__TOTAL__') AS source, COUNT(*) AS n_rows,
                   CAST(SUM(CAST({_MANIFEST_HASH} AS HUGEINT))
                        % 2305843009213693951 AS BIGINT) AS fp
            FROM new_docs GROUP BY ROLLUP(source))
        SELECT COALESCE(o.source, n.source) AS source,
               CASE WHEN o.fp IS NULL THEN 'added'
                    WHEN n.fp IS NULL THEN 'removed'
                    WHEN o.fp = n.fp THEN 'unchanged'
                    ELSE 'changed' END AS status,
               COALESCE(n.n_rows, 0) - COALESCE(o.n_rows, 0) AS row_delta,
               o.fp AS old_fp, n.fp AS new_fp
        FROM old_m o FULL OUTER JOIN new_m n ON o.source = n.source
        ORDER BY source
    """,
    tags=("B10",),
    doc="Dataset drift localization: full-outer diff of two slice "
    "manifests — added / removed / changed / unchanged per source with "
    "row deltas. The diff reads only manifest rows, so comparing two "
    "100 TB dataset versions costs one fingerprint pass each.",
)
def dataset_manifest_diff(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.manifest import (
        dataset_fingerprint,
        manifest_diff,
    )

    docs = t(spark, sf_dir, "documents")
    min_src = docs.agg(F.min("source").alias("__min_src"))
    kept = (
        docs.crossJoin(F.broadcast(min_src))
        .where((F.col("source") != F.col("__min_src")) & (F.col("doc_id") % 97 != 0))
        .select("doc_id", "text", "lang", "source")
    )
    added = spark.range(0, 5).select(
        (F.col("id") + 1000000).alias("doc_id"),
        F.concat(F.lit("new doc "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("zz_new").alias("source"),
    )
    new_docs = kept.unionByName(added)
    cols = ["doc_id", "text", "lang"]
    old_m = dataset_fingerprint(docs, ["source"], cols)
    new_m = dataset_fingerprint(new_docs, ["source"], cols)
    return manifest_diff(old_m, new_m, ["source"]).orderBy("source")


@register(
    "dedup_line_removal",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split({_DUCK_NORM}, ' ') AS tk FROM documents),
        lined AS (
            SELECT doc_id,
                   string_agg(array_to_string(tk[i+1:i+10], ' '), chr(10) ORDER BY i)
                       AS text
            FROM toks, LATERAL (SELECT unnest(range(0, len(tk), 10)) AS i)
            GROUP BY doc_id),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS lns FROM lined),
        lines AS (
            SELECT doc_id, CAST(p AS INT) AS p, lns[p+1] AS line
            FROM ls, LATERAL (SELECT unnest(range(0, len(lns))) AS p)),
        dup AS (
            SELECT trim(line) AS l FROM lines
            WHERE trim(line) <> ''
            GROUP BY 1 HAVING COUNT(*) >= 2),
        marked AS (
            SELECT doc_id, p, line,
                   trim(line) IN (SELECT l FROM dup) AS is_dup
            FROM lines)
        SELECT doc_id,
               COUNT(*) AS n_lines,
               CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
               COALESCE(string_agg(CASE WHEN NOT is_dup THEN line END, chr(10) ORDER BY p), '')
                   AS clean_text
        FROM marked
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="C4-style line-level dedup over synthesized line structure (the "
    "fixture corpus has no newlines, so both engines re-line the "
    "normalized text into 10-token chunks first): every line whose "
    "content repeats corpus-wide is dropped, survivors keep order.",
)
def dedup_line_removal(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        remove_duplicate_lines,
        tokens,
    )

    d = t(spark, sf_dir, "documents").withColumn("__toks", tokens(F.col("text")))
    chunks = F.transform(
        F.sequence(
            F.lit(0), F.greatest(F.size("__toks") - 1, F.lit(0)), F.lit(10)
        ),
        lambda i: F.concat_ws(" ", F.slice("__toks", i + 1, 10)),
    )
    lined = d.select("doc_id", F.concat_ws("\n", chunks).alias("text"))
    return remove_duplicate_lines(lined, "text", "doc_id").orderBy("doc_id")


@register(
    "embedding_pq_codes",
    oracle="""
        WITH sample AS (
            SELECT vec_id, embedding,
                   row_number() OVER (ORDER BY
                       CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                       vec_id) AS cid
            FROM embeddings
            ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                     vec_id
            LIMIT 16),
        cent AS (
            SELECT cid, CAST(j AS INT) AS sub_j,
                   list_transform(embedding[j*8+1 : j*8+8],
                                  x -> CAST(x AS DOUBLE)) AS cvec
            FROM sample, LATERAL (SELECT unnest(range(0, 8)) AS j)),
        subs AS (
            SELECT vec_id, CAST(j AS INT) AS sub_j,
                   list_transform(embedding[j*8+1 : j*8+8],
                                  x -> CAST(x AS DOUBLE)) AS sv
            FROM embeddings, LATERAL (SELECT unnest(range(0, 8)) AS j)),
        scored AS (
            SELECT vec_id, sub_j, cid,
                   list_sum(list_transform(list_zip(sv, cvec),
                            s -> (s[1] - s[2]) * (s[1] - s[2]))) AS l2
            FROM subs JOIN cent USING (sub_j)),
        best AS (
            SELECT vec_id, sub_j, cid,
                   row_number() OVER (PARTITION BY vec_id, sub_j
                                      ORDER BY l2, cid) AS rn
            FROM scored)
        SELECT vec_id,
               md5(array_to_string(list(cid ORDER BY sub_j), ',')) AS pq_md5,
               COUNT(*) AS n_subspaces
        FROM best WHERE rn = 1
        GROUP BY vec_id
        ORDER BY vec_id
    """,
    tags=("B10",),
    doc="Product-quantization codes (m=8 subspaces x 16 centroids = 32 "
    "bits/vector vs 2048): codebooks from a deterministic md5-ranked "
    "corpus sample, nearest-centroid argmin per subspace (L2, ties to "
    "lowest cid). Codes verified value-for-value vs DuckDB — PQ encode "
    "is usually unverifiable (k-means nondeterminism); the hash-ranked "
    "sample makes it exactly replayable.",
)
def embedding_pq_codes(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    emb = t(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=16, dim=64)
    enc = pq_encode(emb, books, m=8, dim=64)
    return enc.select(
        "vec_id",
        F.md5(
            F.array_join(F.transform("pq_codes", lambda x: x.cast("string")), ",")
        ).alias("pq_md5"),
        F.size("pq_codes").cast("long").alias("n_subspaces"),
    ).orderBy("vec_id")


def _ccnet_oracle() -> str:
    """Wrap the registered bigram-LM oracle (single source of truth for
    the scoring semantics) in the CCNet tercile-routing SQL."""
    scores = REGISTRY["text_bigram_lm_score"].oracle
    return f"""
        WITH scores AS ({scores}),
        scored AS (
            SELECT doc_id, n_bigrams, nll,
                   NTILE(3) OVER (ORDER BY nll, doc_id) AS tercile
            FROM scores WHERE nll IS NOT NULL),
        labeled AS (
            SELECT doc_id, nll,
                   CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                                ELSE 'tail' END AS bucket
            FROM scored
            UNION ALL
            SELECT doc_id, nll, 'unscored' FROM scores WHERE nll IS NULL)
        SELECT bucket, COUNT(*) AS n_docs,
               ROUND(CAST(SUM(CAST(COALESCE(nll, 0) AS DECIMAL(38,6))) AS DOUBLE), 6)
                   AS nll_mass,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM labeled
        GROUP BY bucket
        ORDER BY bucket
    """


@register(
    "text_ccnet_buckets",
    oracle=_ccnet_oracle(),
    tags=("B10",),
    doc="CCNet perplexity buckets: documents routed head/middle/tail by "
    "NLL terciles under the corpus bigram LM (the CCNet selection rule — "
    "head = most fluent, typically kept; tail = dropped or down-weighted)."
    " NTILE over the (small) per-doc score frame; docs too short to score "
    "route to 'unscored'. Shares the bigram-LM oracle, so any scoring "
    "drift also fails here.",
)
def text_ccnet_buckets(spark, sf_dir):
    from pyspark.sql import Window as W

    from aws_saas_factory_multi_tenant_data_pipeline_spark.functions import dsum

    scores = text_bigram_lm_score(spark, sf_dir)
    scored = scores.where(F.col("nll").isNotNull()).withColumn(
        "tercile", F.ntile(3).over(W.orderBy(F.col("nll").asc(), F.col("doc_id").asc()))
    )
    labeled = scored.select(
        "doc_id",
        "nll",
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    ).unionByName(
        scores.where(F.col("nll").isNull()).select(
            "doc_id", "nll", F.lit("unscored").alias("bucket")
        )
    )
    return (
        labeled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(dsum(F.coalesce(F.col("nll"), F.lit(0.0))), 6).alias("nll_mass"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("bucket")
    )


@register(
    "vocab_oov_rate",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest(string_split({_DUCK_NORM}, ' ')) AS tok
            FROM documents),
        freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        vocab AS (
            SELECT tok FROM (
                SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r
                FROM freq) WHERE r <= 50),
        marked AS (
            SELECT t.doc_id,
                   CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
            FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(oov) AS BIGINT) AS n_oov,
               ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
        FROM marked
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("B10",),
    doc="Vocabulary coverage audit: build the top-50 corpus vocabulary "
    "(freq desc, token tie-break) and measure each document's "
    "out-of-vocabulary token rate — the go/no-go statistic before "
    "committing to a tokenizer vocabulary size. One token pass + a "
    "broadcast vocab join.",
)
def vocab_oov_rate(spark, sf_dir):
    from pyspark.sql import Window as W

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import tokens

    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        freq.withColumn("r", F.row_number().over(W.orderBy(F.col("c").desc(), F.col("tok").asc())))
        .where(F.col("r") <= 50)
        .select("tok", F.lit(True).alias("__in_vocab"))
    )
    marked = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).cast("long").alias("n_oov"),
            F.round(F.sum(oov).cast("double") / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )
