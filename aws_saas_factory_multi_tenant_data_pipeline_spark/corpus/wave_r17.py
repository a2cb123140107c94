"""Round-14 operator wave (r13 verdict "Next round" #1): the zstd
ingest gap closes — .jsonl.zst / .tar.zst is how modern LLM corpora
actually ship, and both the HTTP content-coding seam and the archive
route now decode it through the from-spec RFC 8878 decoder
(operators/zstd.py, pinned both directions against the system libzstd
in tests/test_zstd.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus import register
from aws_saas_factory_multi_tenant_data_pipeline_spark.corpus._util import t


@register(
    "text_zstd_decode",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'tar_zst' END
                 AS route,
               CASE WHEN doc_id % 4 = 0 THEN 'lz' ELSE 'store' END
                 AS mode,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               TRUE AS roundtrip_ok
        FROM documents WHERE doc_id < 150
        ORDER BY doc_id
    """,
    tags=("B10", "text", "crawl", "archives"),
    doc="Zstandard corpus ingest END-TO-END (the [r14] from-spec "
    "RFC 8878 decoder — FSE/Huffman literals, sequences with the "
    "repeat-offset ring, 4-stream layout, xxHash64 checksum — pinned "
    "byte-identical against REAL libzstd output at every level 1..22 "
    "x window log x checksum in tests/test_zstd.py, fixture frames "
    "accepted by the real library): per doc the text rides one of the "
    "two production seams by parity — an HTTP response block under "
    "Content-Encoding: zstd (RFC 8878 §7.2) through "
    "sources/warc.decode_http_body, or a .tar.zst archive through "
    "operators/archives.iter_archive_members — with the fixture "
    "encoder's store (raw/RLE blocks) or lz (compressed blocks: raw "
    "literals + RLE-table sequences) frame shape by doc_id%4; the "
    "byte-identity of each roundtrip rides in the hash "
    "(operators/zstd.py, operators/archives.py, sources/warc.py).",
)
def text_zstd_decode(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 150).select(
        "doc_id", "text"
    )

    def op(batches):
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
            build_tar,
            iter_archive_members,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
            zstd_compress_fixture,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.sources.warc import (
            decode_http_body,
        )

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = str(text).encode("utf-8")
                mode = "lz" if did % 4 == 0 else "store"
                if did % 2 == 0:
                    coded = zstd_compress_fixture(body, mode)
                    blk = (
                        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                        b"Content-Encoding: zstd\r\n\r\n" + coded
                    )
                    _status, decoded, _enc = decode_http_body(blk)
                    route = "http"
                else:
                    shard = zstd_compress_fixture(
                        build_tar([(f"doc-{did}.txt", body)]), mode
                    )
                    members = list(iter_archive_members(shard))
                    decoded = members[0][1] if len(members) == 1 else b""
                    route = "tar_zst"
                rows.append({
                    "doc_id": did,
                    "route": route,
                    "mode": mode,
                    "n_bytes": len(decoded),
                    "roundtrip_ok": decoded == body,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "route", "mode", "n_bytes",
                         "roundtrip_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, route string, mode string, n_bytes long,"
        " roundtrip_ok boolean",
    ).orderBy("doc_id")


@register(
    "text_xz_decode",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'xz' ELSE 'tar_xz' END
                 AS route,
               CAST(doc_id % 3 * 4 + 1 AS INT) AS preset,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               TRUE AS roundtrip_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "text", "crawl", "archives"),
    doc="XZ corpus ingest END-TO-END (the [r14] from-spec LZMA/LZMA2/"
    ".xz decoder — range coder, 12-state machine, lc/lp/pb contexts, "
    "rep ring, LZMA2 chunk resets, container CRC32/CRC64/SHA-256 "
    "checks — pinned against the system liblzma across presets "
    "0-9/EXTREME x all check types x XZ/ALONE/RAW in "
    "tests/test_xz.py): per doc the text is compressed by the REAL "
    "liblzma (stdlib lzma, preset rotating 1/5/9) and decoded by OUR "
    "decoder — directly as a .xz shard or through the .tar.xz archive "
    "route — with roundtrip byte-identity riding in the hash "
    "(operators/xz.py, operators/archives.py).",
)
def text_xz_decode(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )

    def op(batches):
        import lzma

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
            build_tar,
            iter_archive_members,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xz import (
            xz_decompress,
        )

        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                body = str(text).encode("utf-8")
                preset = did % 3 * 4 + 1  # 1 / 5 / 9
                if did % 2 == 0:
                    decoded = xz_decompress(lzma.compress(body, preset=preset))
                    route = "xz"
                else:
                    shard = lzma.compress(
                        build_tar([(f"doc-{did}.txt", body)]), preset=preset
                    )
                    members = list(iter_archive_members(shard))
                    decoded = members[0][1] if len(members) == 1 else b""
                    route = "tar_xz"
                rows.append({
                    "doc_id": did,
                    "route": route,
                    "preset": preset,
                    "n_bytes": len(decoded),
                    "roundtrip_ok": decoded == body,
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "route", "preset", "n_bytes",
                         "roundtrip_ok"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, route string, preset int, n_bytes long,"
        " roundtrip_ok boolean",
    ).orderBy("doc_id")


@register(
    "multimodal_xmp_family",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0 THEN 'jpeg'
                    WHEN doc_id % 4 = 1 THEN 'png'
                    WHEN doc_id % 4 = 2 THEN 'webp' ELSE 'heic' END
                 AS carrier,
               'Tool' || CAST(doc_id % 5 AS VARCHAR) AS creator_tool,
               CAST(doc_id % 2 = 1 AS BOOLEAN) AS has_gps,
               CAST(doc_id % 4 = 0 AS BOOLEAN) AS has_iptc,
               FALSE AS xmp_after_strip,
               TRUE AS pixels_intact
        FROM documents WHERE doc_id < 72
        ORDER BY doc_id
    """,
    tags=("B10", "multimodal", "image", "privacy"),
    doc="XMP + IPTC extraction and PII strip across ALL FOUR crawl "
    "image carriers in one graded rotation (the [r14] hygiene wave — "
    "EXIF was never the only GPS/owner carrier: XMP RDF packets ride "
    "in JPEG APP1, PNG iTXt (XML:com.adobe.xmp), WebP XMP chunks, and "
    "HEIC mime items, and IPTC-IIM bylines ride in JPEG APP13; the "
    "HEIC carrier is pinned against libheif's metadata API in "
    "tests/test_xmp.py): per doc an XMP packet (creator tool rotates, "
    "odd docs carry exif:GPSLatitude) is inserted by doc_id%4, JPEG "
    "docs also get an IPTC byline, the packet fields are extracted, "
    "the carrier strip runs, and the hash grades extraction, "
    "post-strip absence, and pixel byte-identity "
    "(operators/xmp.py, operators/heif.py, operators/exif.py).",
)
def multimodal_xmp_family(spark, sf_dir):
    import pandas as pd

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 72).select(
        "doc_id"
    )

    def op(batches):
        import numpy as np

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
            build_heif,
            decode_heif,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_enc import (
            encode_hevc_intra,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
            decode_png,
            encode_png,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.webp import (
            decode_webp,
            encode_webp_lossless,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xmp import (
            build_iptc_app13,
            build_xmp,
            extract_xmp_any,
            insert_jpeg_iptc,
            insert_jpeg_xmp,
            insert_png_xmp,
            insert_webp_xmp,
            parse_iptc,
            parse_xmp,
            strip_xmp_any,
        )

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                rng = np.random.RandomState(did)
                px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
                pkt = build_xmp(
                    f"Tool{did % 5}", "2024-01-02T03:04:05",
                    f"Person{did % 9}",
                    gps=("52,30.5N", "13,24.1E") if did % 2 == 1 else None,
                )
                mode = did % 4
                has_iptc = False
                if mode == 0:
                    img = insert_jpeg_xmp(encode_jpeg(px), pkt)
                    img = insert_jpeg_iptc(
                        img, build_iptc_app13({"byline": f"B{did}"})
                    )
                    has_iptc = parse_iptc(img)["has_iptc"]
                    dec = lambda p: decode_jpeg(p)[0]
                    carrier = "jpeg"
                elif mode == 1:
                    img = insert_png_xmp(encode_png(px), pkt)
                    dec = lambda p: decode_png(p)[0]
                    carrier = "png"
                elif mode == 2:
                    img = insert_webp_xmp(encode_webp_lossless(px), pkt)
                    dec = lambda p: decode_webp(p)[0]
                    carrier = "webp"
                else:
                    y = rng.randint(16, 235, (32, 32)).astype(np.uint8)
                    u = np.full((16, 16), 110, np.uint8)
                    v = np.full((16, 16), 140, np.uint8)
                    img = build_heif(
                        [encode_hevc_intra([(y, u, v)], qp=22)], xmp=pkt
                    )
                    dec = lambda p: decode_heif(p)[0]
                    carrier = "heic"
                info = parse_xmp(extract_xmp_any(img))
                p1 = dec(img)
                stripped = strip_xmp_any(img)
                p2 = dec(stripped)
                rows.append({
                    "doc_id": did,
                    "carrier": carrier,
                    "creator_tool": info["creator_tool"],
                    "has_gps": bool(info["has_gps"]),
                    "has_iptc": has_iptc,
                    "xmp_after_strip": extract_xmp_any(stripped)
                    is not None,
                    "pixels_intact": bool(np.array_equal(p1, p2)),
                })
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "carrier", "creator_tool", "has_gps",
                         "has_iptc", "xmp_after_strip", "pixels_intact"],
            )

    return d.mapInPandas(
        op,
        "doc_id long, carrier string, creator_tool string, has_gps"
        " boolean, has_iptc boolean, xmp_after_strip boolean,"
        " pixels_intact boolean",
    ).orderBy("doc_id")


@register(
    "ingest_jsonl_shards",
    oracle="""
        SELECT doc_id,
               CASE CAST(doc_id // 10 AS INT) % 5
                 WHEN 0 THEN 'zstd' WHEN 1 THEN 'xz' WHEN 2 THEN 'gzip'
                 WHEN 3 THEN 'bz2' ELSE 'lz4' END AS codec,
               CAST(doc_id // 10 AS INT) AS shard_id,
               CAST(strlen(text) AS BIGINT) AS n_chars,
               TRUE AS text_ok
        FROM documents WHERE doc_id < 120
        ORDER BY doc_id
    """,
    tags=("B10", "text", "crawl", "archives", "sources"),
    doc="Compressed .jsonl shard ingest END-TO-END — THE production "
    "shape modern LLM corpora ship in (.jsonl.zst / .jsonl.xz / "
    ".jsonl.gz / .jsonl.bz2 / .jsonl.lz4; The Pile, RedPajama, "
    "FineWeb): docs pack 10-per-shard into JSONL, each shard "
    "compresses with the codec its shard_id selects (the [r14] "
    "from-spec zstd + xz decoders, the r13 LZ4, stdlib gzip/bz2), "
    "operators/archives.explode_jsonl_shards sniffs the codec by "
    "magic and explodes lines back (bounded pandas chunks, torn-shard "
    "quarantine rows), and the recovered doc_id/text roundtrip rides "
    "in the hash (operators/archives.py, operators/zstd.py, "
    "operators/xz.py).",
)
def ingest_jsonl_shards(spark, sf_dir):
    import pandas as pd

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        explode_jsonl_shards,
    )

    d = (
        t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 120)
        .select("doc_id", "text",
                (F.col("doc_id") / 10).cast("int").alias("shard_id"))
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import json
        import lzma

        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lz4 import (
            lz4_compress,
        )
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
            zstd_compress_fixture,
        )

        sid = int(key[0])
        pdf = pdf.sort_values("doc_id")
        blob = b"".join(
            json.dumps({"doc_id": int(r.doc_id), "text": str(r.text)},
                       ensure_ascii=False).encode("utf-8") + b"\n"
            for r in pdf.itertuples()
        )
        codec = ["zstd", "xz", "gzip", "bz2", "lz4"][sid % 5]
        if codec == "zstd":
            payload = zstd_compress_fixture(blob, "lz")
        elif codec == "xz":
            payload = lzma.compress(blob, preset=6)
        elif codec == "gzip":
            import gzip

            payload = gzip.compress(blob, mtime=0)
        elif codec == "bz2":
            import bz2

            payload = bz2.compress(blob)
        else:
            payload = lz4_compress(blob)
        return pd.DataFrame([{"shard_id": sid, "payload": payload}])

    shards = d.groupBy("shard_id").applyInPandas(
        pack, "shard_id long, payload binary"
    )
    lines = explode_jsonl_shards(shards).where(
        F.col("parse_error").isNull()
    )
    parsed = lines.select(
        F.get_json_object("line", "$.doc_id").cast("long").alias("doc_id"),
        "codec",
        F.col("shard_id").cast("int").alias("shard_id"),
        F.length(F.get_json_object("line", "$.text")).cast("long").alias(
            "n_chars"
        ),
        F.get_json_object("line", "$.text").alias("rec_text"),
    )
    orig = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120).select(
        "doc_id", F.col("text").alias("orig_text"),
        F.length("text").cast("long").alias("orig_chars"),
    )
    return (
        parsed.join(orig, "doc_id")
        .select(
            "doc_id", "codec", "shard_id",
            F.col("orig_chars").alias("n_chars"),
            (F.col("rec_text") == F.col("orig_text")).alias("text_ok"),
        )
        .orderBy("doc_id")
    )
