"""Custom operators the relational surface doesn't ship natively.

Each is a composition of built-in DataFrame ops where semantics allow
(SURVEY.md §2 B3 as-of/range joins, B10 dedup/similarity/text), dropping to
Pandas UDFs only where genuinely necessary (multimodal decode plumbing).
"""

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.joins import (
    asof_join,
    range_join,
    salted_join,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    minhash_near_duplicates,
    simhash,
    ngram_jaccard_pairs,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.similarity import (
    with_norm,
    cosine_topk,
    lsh_cosine_topk,
    ivf_cosine_topk,
)

__all__ = [
    "asof_join",
    "range_join",
    "salted_join",
    "ivf_cosine_topk",
    "exact_dedup",
    "minhash_signatures",
    "minhash_near_duplicates",
    "simhash",
    "ngram_jaccard_pairs",
    "with_norm",
    "cosine_topk",
    "lsh_cosine_topk",
]
