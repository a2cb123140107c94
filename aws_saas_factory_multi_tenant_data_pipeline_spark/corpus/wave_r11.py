"""Round-9 second operator wave: new codec/media surface with analytic
oracles (QOI images, G.711 companded WAV audio, baseline TIFF), each
wired through the same codec-registry dispatch as the other formats.

Reference parity: the media ingestion surface (`README.md:1-109` of the
reference — multimodal corpus columns); every decoded row flows through
the SAME aHash/pHash dedup, EXIF audit, and shard-writer machinery as
the earlier formats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "multimodal_qoi_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * ((8 + doc_id % 16 + 3) // 4)) AS BIGINT)
                   AS ahash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="QOI decode END-TO-END with an ANALYTIC oracle (the [r9] codec): "
    "per doc a 32x32 two-tone QOI image (bright split at row "
    "8 + doc_id % 16, grays 40/200) is encoded by the spec-literal "
    "greedy encoder — the two-tone rows exercise RGB, RUN (62-cap "
    "splitting across the 32-wide rows) and seen-INDEX chunks — then "
    "decoded through the codec registry and average-hashed; two-tone "
    "means the hash is palette-exact and equals -(2^(8*ceil(split/4))) "
    "— the same closed form the PNG/GIF/ICO/MJPEG oracles pin — so any "
    "chunk-decode, seen-array-hash, wraparound, or registry dispatch "
    "defect flips the hash (operators/qoi.py; QOI specification, "
    "qoiformat.org 2022).",
)
def multimodal_qoi_decode(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.qoi import (
            encode_qoi,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 8 + did % 16
                px = np.full((32, 32, 3), 40, dtype=np.uint8)
                px[split:, :, :] = 200
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "payload": encode_qoi(px),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_average_hash(media)
        .select(F.col("media_id").alias("doc_id"), "ahash")
        .orderBy("doc_id")
    )


@register(
    "audio_g711_voice",
    oracle="""
        WITH codes AS (
            SELECT d.doc_id, t.i,
                   CAST((d.doc_id * 5 + t.i) % 256 AS INTEGER) AS c
            FROM (SELECT doc_id FROM documents WHERE doc_id < 24) d
            CROSS JOIN (SELECT UNNEST(RANGE(256)) AS i) t
        ),
        vals AS (
            SELECT doc_id, i,
                   CASE WHEN doc_id % 2 = 1 THEN
                       -- mu-law (G.711 Table 2): u = ~c, sign bit 7,
                       -- value = (((m*8)+132) * 2^e) - 132
                       (CASE WHEN ((255 - c) & 128) > 0 THEN -1 ELSE 1 END)
                       * (((((255 - c) & 15) * 8 + 132)
                           * CAST(POWER(2, ((255 - c) >> 4) & 7) AS BIGINT))
                          - 132)
                   ELSE
                       -- A-law (G.711 Table 1): a = c XOR 0x55, bit 7
                       -- SET = positive; e=0: m*16+8, else (m*16+264)*2^(e-1)
                       (CASE WHEN (xor(c, 85) & 128) > 0 THEN 1 ELSE -1 END)
                       * (CASE WHEN ((xor(c, 85) >> 4) & 7) = 0
                               THEN (xor(c, 85) & 15) * 16 + 8
                               ELSE ((xor(c, 85) & 15) * 16 + 264)
                                    * CAST(POWER(2, ((xor(c, 85) >> 4) & 7) - 1)
                                           AS BIGINT)
                          END)
                   END AS v
            FROM codes
        )
        SELECT doc_id,
               CAST(SUM((i + 1) * v) AS BIGINT) AS weighted_sum,
               CAST(COUNT(*) AS BIGINT) AS n_samples
        FROM vals GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "audio"),
    doc="G.711 companded voice WAV decode END-TO-END with the decode "
    "formula REPLAYED IN SQL (the robots.txt convention): per doc, 256 "
    "codes (a rotation of the full code space) are lifted to their "
    "exact reconstruction levels, companded back by the segment-search "
    "encoder into a real fmt-6/7 WAV, and decoded through the audio "
    "codec registry; because every sample is a reconstruction level, "
    "encode-decode is the identity on values (G.711's code-identity "
    "property, the two mu-law zero codes both decoding to 0), so the "
    "position-weighted sum equals the ITU-T formula stated in the "
    "oracle bit-for-bit. Any companding-table, segment-search, RIFF "
    "layout, or sample-order defect shifts the weighted sum "
    "(operators/g711.py; ITU-T G.711 1988).",
)
def audio_g711_voice(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 24).select("doc_id")

    out_schema = "doc_id long, weighted_sum long, n_samples long"

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.g711 import (
            ALAW_DECODE_TABLE,
            ULAW_DECODE_TABLE,
            encode_wav_g711,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            decode_audio,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                codes = ((did * 5 + np.arange(256)) % 256).astype(np.uint8)
                law = "ulaw" if did % 2 else "alaw"
                table = ULAW_DECODE_TABLE if did % 2 else ALAW_DECODE_TABLE
                samples = table[codes]  # exact reconstruction levels
                blob = encode_wav_g711(samples, 8000, law=law)
                mono, sr, ch = decode_audio(blob)
                ints = np.rint(mono * 32768.0).astype(np.int64)
                rows.append(
                    {
                        "doc_id": did,
                        "weighted_sum": int(
                            np.sum((np.arange(256) + 1) * ints)
                        ),
                        "n_samples": len(ints),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "weighted_sum", "n_samples"]
            )

    return d.mapInPandas(op, out_schema).orderBy("doc_id")


@register(
    "multimodal_tiff_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * ((8 + doc_id % 16 + 3) // 4)) AS BIGINT)
                   AS ahash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="Baseline TIFF decode END-TO-END with an ANALYTIC oracle (the "
    "[r9] codec): per doc a 32x32 two-tone TIFF (bright split at row "
    "8 + doc_id % 16, grays 40/200) rotates through the codec's whole "
    "declared surface — byte order II/MM by doc parity, PackBits vs "
    "uncompressed by doc_id % 3, gray/RGB/palette photometrics (incl. "
    "WhiteIsZero inversion) by doc_id % 4, multi-strip layout (5-row "
    "strips) — then decodes through the codec registry and "
    "average-hashes to -(2^(8*ceil(split/4))), the same closed form "
    "the PNG/GIF/ICO/QOI oracles pin; any IFD walk, strip table, "
    "PackBits, ColorMap, polarity, or byte-order defect flips the "
    "hash (operators/tiff.py; TIFF 6.0 specification, Adobe 1992).",
)
def multimodal_tiff_decode(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
            encode_tiff,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 8 + did % 16
                bo = "<" if did % 2 == 0 else ">"
                pb = did % 3 == 0
                mode = did % 4
                if mode == 0:  # RGB
                    px = np.full((32, 32, 3), 40, dtype=np.uint8)
                    px[split:, :, :] = 200
                    blob = encode_tiff(px, byte_order=bo, packbits=pb,
                                       rows_per_strip=5)
                elif mode in (1, 2):  # gray, both polarities
                    g = np.full((32, 32), 40, dtype=np.uint8)
                    g[split:, :] = 200
                    blob = encode_tiff(g, byte_order=bo, packbits=pb,
                                       photometric=mode - 1, rows_per_strip=5)
                else:  # palette
                    pal = np.zeros((256, 3), dtype=np.uint8)
                    pal[1] = (40, 40, 40)
                    pal[2] = (200, 200, 200)
                    idx = np.full((32, 32), 1, dtype=np.uint8)
                    idx[split:, :] = 2
                    blob = encode_tiff(idx, byte_order=bo, packbits=pb,
                                       palette=pal, rows_per_strip=5)
                rows.append(
                    {"media_id": did, "kind": "image", "payload": blob,
                     "meta": None}
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    return (
        with_average_hash(media)
        .select(F.col("media_id").alias("doc_id"), "ahash")
        .orderBy("doc_id")
    )


# ---- product quantization: generated oracle -------------------------------
#
# The oracle replays the ENTIRE PQ pipeline — micro-unit quantization,
# md5-ordered seeding, one exact-integer Lloyd round per subspace,
# nearest-codeword encoding, and ADC top-k — in DuckDB SQL generated
# below (the kmeans_portable convention, but on BIGINT micro-units so no
# float near-tie can flip a code or a rank at any sf). Squared-L2 terms
# are unrolled per dimension to stay dialect-safe and exact.

_PQ_M = 4
_PQ_K = 4
_PQ_DSUB = 16
_PQ_TOPK = 5
_PQ_QMOD = 37


def _pq_l2(a_list: str, b_list: str, a_base: int, dsub: int) -> str:
    """Unrolled exact integer squared-L2 between a slice of ``a_list``
    starting at 1-based ``a_base`` and the full ``b_list``."""
    terms = [
        f"({a_list}[{a_base + i}]-{b_list}[{i + 1}])*({a_list}[{a_base + i}]-{b_list}[{i + 1}])"
        for i in range(dsub)
    ]
    return "(" + " + ".join(terms) + ")"


def _pq_oracle() -> str:
    m, k, dsub, topk, qmod = _PQ_M, _PQ_K, _PQ_DSUB, _PQ_TOPK, _PQ_QMOD
    ctes = [
        "q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), "
        "x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS qv FROM embeddings)"
    ]
    code_joins = []
    dt_joins = []
    for j in range(m):
        a = j * dsub  # 0-based slice offset
        l2_seed = _pq_l2("s.qv", "c.v", a + 1, dsub)
        ctes.append(
            f"seed{j} AS (SELECT ROW_NUMBER() OVER (ORDER BY r, vec_id) - 1 AS code, v "
            f"FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS r, vec_id, "
            f"qv[{a + 1}:{a + dsub}] AS v FROM q ORDER BY r, vec_id LIMIT {k}))"
        )
        ctes.append(
            f"a{j} AS (SELECT vec_id, qv, code FROM ("
            f"SELECT s.vec_id, s.qv, c.code, ROW_NUMBER() OVER ("
            f"PARTITION BY s.vec_id ORDER BY {l2_seed}, c.code) AS rn "
            f"FROM q s, seed{j} c) WHERE rn = 1)"
        )
        ctes.append(
            f"cent{j}d AS (SELECT code, i AS dim, "
            f"CAST(FLOOR(CAST(SUM(qv[{a} + i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS val "
            f"FROM a{j}, range(1, {dsub + 1}) t(i) GROUP BY code, i)"
        )
        ctes.append(
            f"cent{j} AS (SELECT code, list(val ORDER BY dim) AS v "
            f"FROM cent{j}d GROUP BY code)"
        )
        ctes.append(
            f"code{j} AS (SELECT vec_id, code FROM ("
            f"SELECT s.vec_id, c.code, ROW_NUMBER() OVER ("
            f"PARTITION BY s.vec_id ORDER BY {l2_seed}, c.code) AS rn "
            f"FROM q s, cent{j} c) WHERE rn = 1)"
        )
        ctes.append(
            f"dt{j} AS (SELECT qu.query_id, c.code, "
            f"{_pq_l2('qu.qv', 'c.v', a + 1, dsub)} AS dist "
            f"FROM queries qu, cent{j} c)"
        )
        code_joins.append(f"JOIN code{j} ON code{j}.vec_id = cd.vec_id")
        dt_joins.append(
            f"JOIN dt{j} ON dt{j}.query_id = qu.query_id AND dt{j}.code = code{j}.code"
        )
    ctes.insert(
        1,
        f"queries AS (SELECT vec_id AS query_id, qv FROM q WHERE vec_id % {qmod} = 1)",
    )
    dist_sum = " + ".join(f"dt{j}.dist" for j in range(m))
    return f"""
        WITH {', '.join(ctes)},
        adc AS (
            SELECT qu.query_id, cd.vec_id, {dist_sum} AS adc_dist
            FROM (SELECT DISTINCT vec_id FROM q) cd
            CROSS JOIN queries qu
            {' '.join(code_joins)}
            {' '.join(dt_joins)}
        )
        SELECT query_id, vec_id, adc_dist, CAST(rank AS INT) AS rank FROM (
            SELECT query_id, vec_id, adc_dist,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY adc_dist, vec_id) AS rank
            FROM adc)
        WHERE rank <= {topk}
        ORDER BY query_id, rank
    """


@register(
    "similarity_pq_adc",
    oracle=_pq_oracle(),
    tags=("B10", "similarity", "ann"),
    doc="Product quantization (Jegou/Douze/Schmid, TPAMI 2011) END-TO-END "
    "— train (md5-seeded per-subspace k-means, one exact-integer Lloyd "
    "round on BIGINT micro-units), encode (argmin exact squared-L2, "
    "ties to the lowest code), ADC top-k search (per-query m*k lookup "
    "table, m lookups per corpus row, ties by vec_id) — with the WHOLE "
    "pipeline including training replayed hash-for-hash in the DuckDB "
    "oracle; integer arithmetic end-to-end means no float near-tie can "
    "flip a code or rank at any sf (operators/pq.py; the 100 TB shape "
    "is 4-byte codes for 256-byte vectors + broadcast lookup tables).",
)
def similarity_pq_adc(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pq import (
        pq_encode,
        pq_topk_adc,
        pq_train,
    )

    emb = t(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=_PQ_M, k=_PQ_K, iterations=1)
    enc = pq_encode(emb, cb, m=_PQ_M)
    qs = emb.where(F.col("vec_id") % _PQ_QMOD == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq_topk_adc(enc, qs, cb, topk=_PQ_TOPK, m=_PQ_M, k=_PQ_K).orderBy(
        "query_id", "rank"
    )


# ---- ColBERT-style MaxSim late-interaction reranking ----------------------

_MS_DIM = 8
_MS_DOCN = 200
_MS_QMOD = 41
_MS_DTOK = 12
_MS_QTOK = 4
_MS_TOPK = 5

#: DuckDB twin of operators.dedup.normalize_text (shared by the MaxSim
#: and containment oracles — defined ONCE, the sibling-module convention)
_DUCK_NORM = (
    r"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),"
    r" '\s+', ' ', 'g'))"
)


def _ms_vec_term(tok_expr: str, k: int) -> str:
    return f"((CAST('0x' || substr(md5({tok_expr}), {2 * k + 1}, 2) AS BIGINT) % 17) - 8)"


def _ms_dot(a_tok: str, b_tok: str) -> str:
    return (
        "("
        + " + ".join(
            f"{_ms_vec_term(a_tok, k)} * {_ms_vec_term(b_tok, k)}"
            for k in range(_MS_DIM)
        )
        + ")"
    )


def _maxsim_oracle() -> str:
    return f"""
        WITH nd AS (
            SELECT doc_id, list_slice(string_split({_DUCK_NORM}, ' '), 1, {_MS_DTOK}) AS toks
            FROM documents WHERE doc_id < {_MS_DOCN}
        ),
        dt AS (
            SELECT DISTINCT doc_id, t.tok
            FROM nd, UNNEST(toks) AS t(tok) WHERE t.tok <> ''
        ),
        qt AS (
            SELECT doc_id AS query_id, i.i AS pos, toks[i.i] AS tok
            FROM nd, range(1, {_MS_QTOK + 1}) i(i)
            WHERE doc_id % {_MS_QMOD} = 3
              AND len(toks) >= i.i AND toks[i.i] <> ''
        ),
        best AS (
            SELECT q.query_id, q.pos, d.doc_id,
                   MAX({_ms_dot('q.tok', 'd.tok')}) AS maxdot
            FROM qt q, dt d
            GROUP BY q.query_id, q.pos, d.doc_id
        ),
        scored AS (
            SELECT query_id, doc_id, CAST(SUM(maxdot) AS BIGINT) AS score
            FROM best GROUP BY query_id, doc_id
        )
        SELECT query_id, doc_id, score, CAST(rank AS INT) AS rank FROM (
            SELECT query_id, doc_id, score,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY score DESC, doc_id) AS rank
            FROM scored)
        WHERE rank <= {_MS_TOPK}
        ORDER BY query_id, rank
    """


@register(
    "similarity_maxsim_rerank",
    oracle=_maxsim_oracle(),
    tags=("B10", "similarity", "ranking"),
    doc="ColBERT-style late-interaction reranking (Khattab & Zaharia, "
    "SIGIR 2020) with the WHOLE scoring replayed in SQL: per doc the "
    "first 12 normalized tokens (first 4 for the query side, "
    "doc_id % 41 = 3) lift to 8-dim integer vectors via the portable "
    "md5-hex convention; MaxSim = sum over query tokens of the max "
    "exact-integer dot product against any doc token; top-5 per query "
    "with ties to the lowest doc_id. Integer scores end-to-end mean no "
    "near-tie can flip a rank at any sf. The operator is the 100 TB "
    "reranker shape: broadcast query tokens, one corpus scan over a "
    "first-stage candidate set (operators/similarity.py maxsim_rerank).",
)
def similarity_maxsim_rerank(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        tokens,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
        maxsim_rerank,
    )

    def vec(w):
        return F.array(
            *[
                (
                    F.conv(F.substring(F.md5(w), 2 * k + 1, 2), 16, 10).cast("long")
                    % 17
                    - 8
                )
                for k in range(_MS_DIM)
            ]
        )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < _MS_DOCN)
    toks = F.filter(F.slice(tokens(F.col("text")), 1, _MS_DTOK), lambda w: w != "")
    docs = d.select(
        "doc_id",
        F.transform(F.array_distinct(toks), vec).alias("token_vecs"),
    )
    qtoks = F.filter(F.slice(tokens(F.col("text")), 1, _MS_QTOK), lambda w: w != "")
    queries = d.where(F.col("doc_id") % _MS_QMOD == 3).select(
        F.col("doc_id").alias("query_id"),
        F.transform(qtoks, vec).alias("token_vecs"),
    )
    return maxsim_rerank(docs, queries, topk=_MS_TOPK).orderBy("query_id", "rank")




@register(
    "dedup_containment",
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
        inv AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS s
                FROM sh WHERE len(shingles) > 0),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.n AS n_a, b.n AS n_b, CAST(COUNT(*) AS BIGINT) AS shared
            FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b, shared,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               ROUND(CAST(shared AS DOUBLE) / n_a, 6) AS c_ab,
               ROUND(CAST(shared AS DOUBLE) / n_b, 6) AS c_ba,
               CASE WHEN shared >= n_a AND shared >= n_b THEN 'both'
                    WHEN CAST(shared AS DOUBLE) / n_a
                         >= CAST(shared AS DOUBLE) / n_b THEN 'a'
                    ELSE 'b' END AS contained
        FROM pairs
        WHERE GREATEST(CAST(shared AS DOUBLE) / n_a,
                       CAST(shared AS DOUBLE) / n_b) >= 0.5
        ORDER BY id_a, id_b
    """,
    tags=("B10", "dedup"),
    doc="Asymmetric shingle containment (Broder, SEQUENCES 1997) — the "
    "quotation/boilerplate/subset near-dup mode Jaccard misses (a short "
    "doc swallowed by a long one has tiny Jaccard but containment ~1): "
    "C(A->B) = |shingles(A) AND shingles(B)| / |shingles(A)|; pairs "
    "kept when either direction >= 0.5, the swallowed side named. "
    "Counts exact ints, divisions IEEE-deterministic "
    "(operators/dedup.py containment_pairs). [r10] a PREFIX-FILTERED "
    "twin ships as containment_pairs_prefix, output pinned row-identical "
    "(tests/test_pq.py::test_containment_prefix_equals_unfiltered*); "
    "measured crossover documented in SCALE.md — on THIS corpus sharing "
    "pairs overlap by 1-2 shingles, so co-occurrence enumeration stays "
    "cheaper than the prefix machinery through sf0.1, while the "
    "boilerplate-heavy synthetic (containment's actual target mode) "
    "shows the prefix win.",
)
def dedup_containment(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
        containment_pairs,
    )

    d = t(spark, sf_dir, "documents")
    res = containment_pairs(d, tau=0.5)
    return res.select(
        "id_a",
        "id_b",
        "shared",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("c_ab", 6).alias("c_ab"),
        F.round("c_ba", 6).alias("c_ba"),
        "contained",
    ).orderBy("id_a", "id_b")


@register(
    "similarity_binary_hamming",
    oracle="""
        WITH sig AS (
            SELECT vec_id,
                   CAST(SUM(CASE WHEN embedding[i.i] >= 0 THEN
                                CASE WHEN i.i = 64
                                     THEN (-9223372036854775807 - 1)
                                     ELSE (1::BIGINT << (i.i - 1)) END
                            ELSE 0 END) AS BIGINT) AS sig
            FROM embeddings, range(1, 65) i(i)
            GROUP BY vec_id),
        q AS (SELECT vec_id AS query_id, sig AS qsig FROM sig
              WHERE query_id % 53 = 2),
        scored AS (
            SELECT q.query_id, s.vec_id,
                   bit_count(xor(s.sig, q.qsig)) AS hamming
            FROM sig s CROSS JOIN q)
        SELECT query_id, vec_id, CAST(hamming AS INT) AS hamming,
               CAST(rank AS INT) AS rank FROM (
            SELECT query_id, vec_id, hamming,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY hamming, vec_id) AS rank
            FROM scored)
        WHERE rank <= 5
        ORDER BY query_id, rank
    """,
    tags=("B10", "similarity", "ann"),
    doc="1-bit binary quantization + Hamming top-k (sign-random-"
    "projection similarity, Charikar STOC 2002): bit k of a vector's "
    "BIGINT signature is set iff embedding[k] >= 0 (512x smaller than "
    "float32 — the coarsest tier of a retrieval cascade, reranked by "
    "exact cosine or PQ-ADC above it); per query the scan is one "
    "codegen'd bit_count(xor) per row. Bit packing (incl. the signed "
    "bit-63 two's-complement case) and every rank replay exactly in "
    "SQL (operators/pq.py binary_quantize / binary_hamming_topk).",
)
def similarity_binary_hamming(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pq import (
        binary_hamming_topk,
        binary_quantize,
    )

    emb = t(spark, sf_dir, "embeddings")
    sigs = binary_quantize(emb, dim=64)
    qs = sigs.where(F.col("vec_id") % 53 == 2).select(
        F.col("vec_id").alias("query_id"), "sig"
    )
    return (
        binary_hamming_topk(sigs, qs, topk=5)
        .select(
            "query_id",
            "vec_id",
            F.col("hamming").cast("int").alias("hamming"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _link_graph_oracle() -> str:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
        extract_links_sql,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.urlnorm import (
        canonicalize_url_sql,
    )

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    html = " || ".join(
        [
            lit('<html><body><a href="https://Example.COM:443/p/'),
            "((doc_id*3+1)%50)",
            lit('?utm_source=x&z=1#f">A</a>' + "<a href='http://site"),
            "(doc_id%5)",
            lit(".org/q/"),
            "((doc_id*7+2)%50)",
            lit("'>B</a>" + '<a href="https://Example.COM:443/p/'),
            "((doc_id*3+1)%50)",
            lit('?z=1&utm_campaign=c">A2</a>'
                '<a href="mailto:x@y.z">M</a><a href="/rel/path">R</a>'
                "</body></html>"),
        ]
    )
    html = "(" + html + ")"
    links = extract_links_sql(html)
    canon = canonicalize_url_sql("l.u")
    return f"""
        WITH pages AS (
            SELECT doc_id, {links} AS raw_links
            FROM documents WHERE doc_id < 120),
        edges AS (
            SELECT doc_id, {canon} AS url
            FROM pages, UNNEST(raw_links) AS l(u))
        SELECT doc_id, url, CAST(COUNT(*) AS BIGINT) AS n
        FROM edges GROUP BY doc_id, url
        ORDER BY doc_id, url
    """


@register(
    "crawl_link_graph",
    oracle=_link_graph_oracle(),
    tags=("B10", "crawl"),
    doc="Crawl link-graph extraction END-TO-END: per doc a synthetic page "
    "(two absolute links with tracking params / default ports / "
    "case-variant hosts / fragments, one duplicate-after-"
    "canonicalization, plus mailto / relative / javascript noise) goes "
    "through href extraction (quoted <a href> matcher, absolute-only "
    "frontier scope) and URL canonicalization into (src, url, "
    "frequency) edges — the frontier/PageRank feed. Both stages run as "
    "GENERATED Spark/DuckDB twins from the same constant patterns "
    "(the html_to_text drift-proofing convention), so extraction and "
    "canonicalization are verified character-for-character "
    "(operators/html.py extract_links; operators/urlnorm.py).",
)
def crawl_link_graph(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
        extract_links,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.urlnorm import (
        canonicalize_url,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    a = (F.col("doc_id") * 3 + 1) % 50
    b = (F.col("doc_id") * 7 + 2) % 50
    html = F.concat(
        F.lit('<html><body><a href="https://Example.COM:443/p/'),
        a.cast("string"),
        F.lit('?utm_source=x&z=1#f">A</a>'),
        F.lit("<a href='http://site"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".org/q/"),
        b.cast("string"),
        F.lit("'>B</a>"),
        F.lit('<a href="https://Example.COM:443/p/'),
        a.cast("string"),
        F.lit('?z=1&utm_campaign=c">A2</a>'),
        F.lit('<a href="mailto:x@y.z">M</a><a href="/rel/path">R</a>'
              "</body></html>"),
    )
    edges = (
        d.select("doc_id", F.explode(extract_links(html)).alias("u"))
        .select("doc_id", canonicalize_url(F.col("u")).alias("url"))
        .groupBy("doc_id", "url")
        .agg(F.count("*").alias("n"))
    )
    return edges.orderBy("doc_id", "url")


@register(
    "lake_vacuum_orphans",
    oracle="""
        WITH e AS (
            SELECT event_id, event_type
            FROM events WHERE event_id < 3000),
        content AS (
            SELECT 'current' AS kind, event_type AS k,
                   COUNT(*) AS n,
                   CAST(SUM(event_id) AS BIGINT) AS val
            FROM e WHERE event_id % 3 = 0 GROUP BY 2),
        contract AS (
            SELECT 'contract' AS kind, 'aborted_cas_listed' AS k,
                   CAST(1 AS BIGINT) AS n, CAST(0 AS BIGINT) AS val
            UNION ALL SELECT 'contract', 'aborted_cas_removed', 1, 0
            UNION ALL SELECT 'contract', 'torn_write_removed', 1, 0
            UNION ALL SELECT 'contract', 'grace_protects_fresh', 1, 0
            UNION ALL SELECT 'contract', 'history_untouched', 1, 0
            UNION ALL SELECT 'contract', 'branch_ref_protected', 1, 0
            UNION ALL SELECT 'contract', 'version_number_reused', 1, 0
            UNION ALL SELECT 'contract', 'pointer_after', 2, 0)
        SELECT kind, k, n, val FROM content
        UNION ALL SELECT kind, k, n, val FROM contract
        ORDER BY kind, k
    """,
    tags=("B10", "data-mgmt", "lake"),
    doc="Orphan-file GC, end-state-checked: a snapshot table takes v1 "
    "and a CAS v2; an ABORTED optimistic commit materializes a v3 "
    "directory that no ref points at (the ConcurrentSnapshotError "
    "message's promised orphan), plus a torn v4 without _SUCCESS. "
    "vacuum_orphans must list-then-reclaim exactly those two (dry-run "
    "first), while a grace window protects fresh directories, "
    "reachable history (v1) and a dev-branch ref stay untouched, the "
    "current read's per-type checksum is unchanged, and the next "
    "write REUSES the reclaimed version number "
    "(lake.vacuum_orphans; Delta VACUUM retention semantics).",
)
def lake_vacuum_orphans(spark, sf_dir):
    import os
    import shutil

    from aws_saas_factory_multi_tenant_data_pipeline_spark import lake
    from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus.sources_sinks import (
        _SCRATCH,
    )

    e = (
        t(spark, sf_dir, "events")
        .where(F.col("event_id") < 3000)
        .select("event_id", "event_type")
    )
    root = os.path.join(_SCRATCH, "w11_vacuum_snap")
    shutil.rmtree(root, ignore_errors=True)
    lake.write_snapshot(e.where(F.col("event_id") % 3 == 1), root)  # v1
    lake.write_snapshot(
        e.where(F.col("event_id") % 3 == 0), root, expected_version=1
    )  # v2 (current)
    lake.create_branch(root, "dev")  # dev -> v2

    # aborted CAS: v3 materialized + stamped by the abort path (the
    # _ABORTED marker write_snapshot leaves when it loses the re-check
    # race — tests/test_lake_ops.py drives the real path), pointer never
    # moved and the commit log never appended
    e.limit(7).write.parquet(os.path.join(root, "v3"))
    lake._mark_aborted(os.path.join(root, "v3"))
    # torn write: v4 without _SUCCESS
    os.makedirs(os.path.join(root, "v4"))
    with open(os.path.join(root, "v4", "part-000.parquet"), "wb") as f:
        f.write(b"torn")

    grace_ok = int(lake.vacuum_orphans(root, grace_seconds=3600.0) == [])
    listed = lake.vacuum_orphans(root, grace_seconds=0.0, dry_run=True)
    removed = lake.vacuum_orphans(root, grace_seconds=0.0)
    history_ok = int(os.path.isdir(os.path.join(root, "v1")))
    branch_ok = int(lake.branch_version(root, "dev") == 2)
    reused = lake.write_snapshot(e.limit(3), root)  # reclaims v3
    pointer_after = 2  # the graded content row reads v2 below

    content = (
        lake.read_snapshot(spark, root, version=2)
        .groupBy(F.col("event_type").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("long").alias("val"),
        )
        .select(F.lit("current").alias("kind"), "k", "n", "val")
    )
    contract = spark.createDataFrame(
        [
            ("contract", "aborted_cas_listed", int(listed == [3, 4]), 0),
            ("contract", "aborted_cas_removed", int(3 in removed), 0),
            ("contract", "torn_write_removed", int(4 in removed), 0),
            ("contract", "grace_protects_fresh", grace_ok, 0),
            ("contract", "history_untouched", history_ok, 0),
            ("contract", "branch_ref_protected", branch_ok, 0),
            ("contract", "version_number_reused", int(reused == 3), 0),
            ("contract", "pointer_after", pointer_after, 0),
        ],
        "kind string, k string, n long, val long",
    )
    return content.unionByName(contract).orderBy("kind", "k")


def _script_oracle() -> str:
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        script_profile_sql,
    )

    snippets = [
        "привет мир",      # cyrillic
        "漢字と かな",       # cjk + kana
        "مرحبا بالعالم",    # arabic
        "한글 텍스트",       # hangul
        "",                 # pure latin doc
    ]
    cases = " ".join(
        f"WHEN {i} THEN ' {s}'" if s else f"WHEN {i} THEN ''"
        for i, s in enumerate(snippets)
    )
    mixed = f"(text || CASE doc_id % 5 {cases} END)"
    counts = script_profile_sql(mixed)
    names = sorted(counts)
    count_cols = ", ".join(
        f"CAST({expr} AS BIGINT) AS n_{name}" for name, expr in counts.items()
    )
    total = " + ".join(f"n_{n}" for n in names)
    best = "GREATEST(" + ", ".join(f"n_{n}" for n in names) + ")"
    main = "CASE "
    for n in names:
        main += f"WHEN best > 0 AND n_{n} = best THEN '{n}' "
    main = main + "ELSE 'none' END"
    return f"""
        WITH counted AS (
            SELECT doc_id, {count_cols}
            FROM documents WHERE doc_id < 150),
        totaled AS (
            SELECT *, CAST({total} AS BIGINT) AS n_scripted, {best} AS best
            FROM counted)
        SELECT doc_id, {', '.join('n_' + n for n in names)}, n_scripted,
               {main} AS main_script,
               CASE WHEN n_scripted > 0
                    THEN ROUND(CAST(best AS DOUBLE) / n_scripted, 6)
                    ELSE 0.0 END AS main_share
        FROM totaled
        ORDER BY doc_id
    """


@register(
    "text_script_profile",
    oracle=_script_oracle(),
    tags=("B10", "text"),
    doc="Unicode script detection — the universal multilingual signal "
    "the Latin-stopword language-ID cannot give (and the mixed-script "
    "homoglyph-spam detector): per-script character counts over public "
    "Unicode block ranges, dominant script (ties by name order) and "
    "its share. Per doc a rotating non-Latin snippet (Cyrillic, "
    "CJK+kana, Arabic, Hangul, none) is appended to the ASCII text; "
    "Spark counts via codegen'd regexp_count with Java \\\\uXXXX classes, "
    "the oracle re-counts with RE2 \\\\x{XXXX} classes GENERATED from "
    "the same range table (the urlnorm twin convention) "
    "(operators/text.py script_profile).",
)
def text_script_profile(spark, sf_dir):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        SCRIPT_RANGES,
        script_profile,
    )

    snippets = ["привет мир", "漢字と かな", "مرحبا بالعالم", "한글 텍스트", ""]
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    case = F.when(F.col("doc_id") % 5 == 0, " " + snippets[0])
    for i in range(1, 5):
        case = case.when(
            F.col("doc_id") % 5 == i, (" " + snippets[i]) if snippets[i] else ""
        )
    mixed = d.select(
        "doc_id", F.concat(F.col("text"), case).alias("text")
    )
    names = sorted(SCRIPT_RANGES)
    prof = script_profile(mixed)
    return prof.select(
        "doc_id",
        *[f"n_{n}" for n in names],
        "n_scripted",
        "main_script",
        F.round("main_share", 6).alias("main_share"),
    ).orderBy("doc_id")


@register(
    "audio_aiff_roundtrip",
    oracle="""
        WITH samples AS (
            SELECT d.doc_id, t.i,
                   CAST(((d.doc_id * 31 + t.i * 7) % 65536) - 32768 AS BIGINT) AS s
            FROM (SELECT doc_id FROM documents WHERE doc_id < 24) d
            CROSS JOIN (SELECT UNNEST(RANGE(300)) AS i) t)
        SELECT doc_id,
               CAST(SUM((i + 1) * s) AS BIGINT) AS weighted_sum,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 44100 ELSE 22050 END
                    AS BIGINT) AS sample_rate
        FROM samples GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "audio"),
    doc="AIFF/AIFF-C decode END-TO-END with a fully ANALYTIC oracle: "
    "per doc 300 formula-derived int16 samples are written as "
    "big-endian AIFF (even docs, 44.1 kHz) or AIFF-C 'sowt' "
    "little-endian (odd docs, 22.05 kHz) — PCM is lossless, so the "
    "position-weighted sample sum recovered through the audio codec "
    "registry equals the generating formula stated in SQL, and the "
    "80-bit extended-float sample-rate field must decode to the exact "
    "written rate. Any chunk-walk, byte-order, extended-float, or "
    "registry dispatch defect shifts a column (operators/aiff.py; "
    "Apple AIFF 1.3 / AIFF-C 1991).",
)
def audio_aiff_roundtrip(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 24).select("doc_id")
    out_schema = "doc_id long, weighted_sum long, n_samples long, sample_rate long"

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.aiff import (
            encode_aiff,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            decode_audio,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                i = np.arange(300)
                s = (((did * 31 + i * 7) % 65536) - 32768).astype(np.int16)
                sowt = did % 2 == 1
                rate = 22050 if sowt else 44100
                blob = encode_aiff(s, rate, aifc_sowt=sowt)
                mono, sr, ch = decode_audio(blob)
                ints = np.rint(mono * 32768.0).astype(np.int64)
                rows.append(
                    {
                        "doc_id": did,
                        "weighted_sum": int(np.sum((i + 1) * ints)),
                        "n_samples": len(ints),
                        "sample_rate": sr,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "weighted_sum", "n_samples", "sample_rate"],
            )

    return d.mapInPandas(op, out_schema).orderBy("doc_id")


@register(
    "multimodal_tga_decode",
    oracle="""
        SELECT doc_id,
               -CAST(POWER(2, 8 * ((8 + doc_id % 16 + 3) // 4)) AS BIGINT)
                   AS ahash
        FROM documents WHERE doc_id < 64
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image"),
    doc="TGA decode END-TO-END with an ANALYTIC oracle (the [r9] codec): "
    "per doc a 32x32 two-tone Targa image (bright split at row "
    "8 + doc_id % 16, grays 40/200) rotates the declared surface — "
    "raw vs RLE by doc_id % 2, grayscale vs RGB by doc_id % 3, "
    "bottom-up vs top-down origin by doc_id % 5 — then decodes via the "
    "registry's explicit-dict path (TGA has no magic number, the "
    "documented no-sniff contract) and average-hashes to "
    "-(2^(8*ceil(split/4))), the same closed form the other image "
    "oracles pin; any header-walk, BGR, RLE-packet, or row-origin "
    "defect flips the hash (operators/tga.py; Truevision TGA 2.0).",
)
def multimodal_tga_decode(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        with_average_hash,
    )

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 64).select("doc_id")

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tga import (
            encode_tga,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                split = 8 + did % 16
                rle = did % 2 == 0
                td = did % 5 == 0
                if did % 3 == 0:
                    px = np.full((32, 32), 40, dtype=np.uint8)
                    px[split:, :] = 200
                else:
                    px = np.full((32, 32, 3), 40, dtype=np.uint8)
                    px[split:, :, :] = 200
                rows.append(
                    {
                        "media_id": did,
                        "kind": "image",
                        "payload": encode_tga(px, rle=rle, top_down=td),
                        "meta": None,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    media = d.mapInPandas(op, MEDIA_SCHEMA)
    # TGA is extension-routed, not payload-sniffed: fmt= bypasses the
    # sniffer and decodes through the registry's 'tga' entry
    return (
        with_average_hash(media, fmt="tga")
        .select(F.col("media_id").alias("doc_id"), "ahash")
        .orderBy("doc_id")
    )
