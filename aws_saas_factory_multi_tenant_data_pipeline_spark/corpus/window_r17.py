"""Round-14 graded-window curation (r13 verdict "Next round" #1): one
slot freed by MERGING (the r9-r13 convention):

  media_pack3 + media_pack4 → media_family_pack2 (both already emit
      the unified (kind, k, n, val) schema with disjoint kinds —
      gif/ico/phash/tone/env/rs_exact/rs_frac vs qoi/tif/g711/pq/
      maxsim/contain/h264 — so every component output row rides in
      the pack hash verbatim); the freed slot carries
      `text_zstd_decode` — the r14 zstd ingest row (RFC 8878 decode
      through BOTH production seams: HTTP content coding + .tar.zst
      archive route) gets a hard driver verdict.

The merged originals move to the tail, still oracle-green locally —
none of the thirteen r8/r9 media/similarity §2 rows downgrades from
driver ✅.

Packs reuse the already-oracle-green component queries verbatim: the
Spark side unions the component spark_fn outputs; the oracle wraps the
component oracle SQL as CTEs and unions them — a pack can only
diverge if a component does.
"""

from __future__ import annotations

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    REGISTRY,
    register,
)

# Component modules must be registered before we read their oracles.
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import (  # noqa: F401
    window_r10,
    window_r11,
)


def _oracle(name: str) -> str:
    o = REGISTRY[name].oracle
    assert o is not None, f"component {name} has no oracle"
    return o


def _fn(name: str):
    return REGISTRY[name].spark_fn


@register(
    "media_family_pack2",
    oracle=f"""
        WITH p3 AS ({_oracle("media_pack3")}),
        p4 AS ({_oracle("media_pack4")})
        SELECT kind, k, n, val FROM p3
        UNION ALL SELECT kind, k, n, val FROM p4
        ORDER BY kind, k
    """,
    tags=("B10", "multimodal", "similarity", "dedup", "pack"),
    doc="Media family pack 2 (r14 merge) — media_pack3 (GIF decode, "
    "ICO/BMP decode, image pHash DCT, audio spectral fingerprint, "
    "audio envelope hash incl. the FLAC-transcode branch, both audio "
    "resample oracles) and media_pack4 (QOI decode, baseline TIFF "
    "decode, G.711 voice WAVs, PQ ANN end-to-end, MaxSim reranking, "
    "containment dedup, H.264 intra keyframe chain) in one driver "
    "slot; kinds are disjoint so every output row of both components "
    "rides in the pack hash verbatim — none of the thirteen r8/r9 "
    "media/similarity §2 rows loses its driver verdict. The freed "
    "slot carries text_zstd_decode (the r14 zstd ingest row). "
    "Component spark_fns and oracles reused verbatim.",
)
def media_family_pack2(spark, sf_dir):
    p3 = _fn("media_pack3")(spark, sf_dir)
    p4 = _fn("media_pack4")(spark, sf_dir)
    return p3.unionByName(p4).orderBy("kind", "k")
