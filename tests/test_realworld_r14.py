"""Round-14 real-world artifact pins: AVIF pixels through the named
native seam (libheif ground truth), the AV1 default-CDF tripwire, and
real-content zstd/xz shard decodes."""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)


def _libheif_avif():
    from heif_rig import COMPRESSION_AV1, decode_heic_rgb, encode_heic, heif_lib

    if heif_lib() is None:
        pytest.skip("no system libheif (visible host gap)")
    from hevc_rig import make_frame

    y, u, v = make_frame(96, 64, 14, "mixed")
    try:
        f = encode_heic(y, u, v, quality=75, compression=COMPRESSION_AV1)
    except RuntimeError as exc:
        pytest.skip(f"libheif AV1 encode unavailable: {exc}")
    return f, decode_heic_rgb


def test_avif_native_seam_decodes_through_registry():
    """The documented AVIF swap seam (register_image_decoder) carries
    real pixels end-to-end: a REAL libaom-encoded AVIF decodes through
    the codec registry once a native decoder is bound, feeds aHash,
    and the quarantine contract returns when unbound."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.av1 import (
        probe_avif,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        IMAGE_DECODERS,
        _ahash_pixels,
        decode_image,
        register_image_decoder,
        sniff_image_format,
    )

    f, decode_heic_rgb = _libheif_avif()
    assert sniff_image_format(f) == "avif"
    with pytest.raises(ValueError, match="AVIF"):
        decode_image(f)

    def native(payload):
        px = decode_heic_rgb(payload)
        return px, px.shape[1], px.shape[0]

    old = IMAGE_DECODERS.get("avif")
    register_image_decoder("avif", native)
    try:
        px, w, h = decode_image(f)
        r = probe_avif(f)
        assert (w, h) == (r["width"], r["height"]) == (96, 64)
        assert px.shape == (64, 96, 3) and px.dtype == np.uint8
        ah = _ahash_pixels(px, w, h)
        assert isinstance(ah, int)
        # ground truth: the seam's pixels ARE libheif's
        assert np.array_equal(px, decode_heic_rgb(f))
    finally:
        register_image_decoder("avif", old)
    with pytest.raises(ValueError, match="AVIF"):
        decode_image(f)


def test_av1_default_cdf_source_tripwire():
    """[r14] AV1 transform decode stays a NAMED gap: the default-CDF
    initialization data (thousands of u16 probability entries across
    dozens of syntax elements) has no honest source on this host — no
    AV1 spec document, no libaom/dav1d/gav1/rav1e/svt source, and all
    five binaries are stripped (transcription from memory would
    violate the never-wrong-bytes contract; the documented LZW-timing
    lesson). This tripwire FAILS loudly if a usable source ever
    appears so the from-spec decode gets written instead of the gap
    silently persisting."""
    sources = []
    # 1) headers/source trees
    for pat in ("/usr/include/dav1d*", "/usr/include/aom*",
                "/usr/src/*dav1d*", "/usr/src/*aom*",
                "/usr/share/doc/*/examples/*av1*"):
        sources += glob.glob(pat)
    # 2) unstripped decoder libraries (a symtab would let the tables be
    #    located and extraction-pinned like brotli_data.py)
    for lib in ("libdav1d.so.6", "libaom.so.3", "libgav1.so.1"):
        path = f"/usr/lib/x86_64-linux-gnu/{lib}"
        if os.path.exists(path):
            res = subprocess.run(["nm", path], capture_output=True,
                                 text=True)
            if res.returncode == 0 and res.stdout.strip():
                sources.append(f"{path} (unstripped symtab)")
    assert not sources, (
        f"AV1 default-CDF sources appeared on this host: {sources} — "
        "extract + sha-pin the tables (the brotli_data.py pattern) and "
        "write the from-spec AV1 intra decoder; then delete this tripwire"
    )


def test_real_parquet_bytes_through_zstd_and_xz():
    """Real content (an actual testdata parquet file) through the real
    encoders at aggressive settings, decoded by the from-spec
    decoders."""
    import lzma

    from zstd_rig import ref_compress, zstd_lib

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xz import (
        xz_decompress,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
        zstd_decompress,
    )

    path = "/root/testdata/sf0.01/lineitem.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not materialized")
    blob = open(path, "rb").read()
    assert xz_decompress(lzma.compress(blob, preset=9)) == blob
    if zstd_lib() is None:
        pytest.skip("no system libzstd (visible host gap)")
    assert zstd_decompress(ref_compress(blob, level=19, checksum=True)) == blob


def test_real_wikipedia_style_xz_shard():
    """The Wikipedia-dump shape: a multi-megabyte UTF-8 text stream at
    preset 9e (the setting wikimedia uses), multistream like their
    dumps, decoded byte-identical."""
    import lzma

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xz import (
        xz_decompress,
    )

    art = ("= Heading =\n\nSome '''wiki''' text with [[links]] and "
           "{{templates}} repeated across articles. " * 2000).encode()
    s1 = lzma.compress(art, preset=9 | lzma.PRESET_EXTREME)
    s2 = lzma.compress(art[::-1], preset=9 | lzma.PRESET_EXTREME)
    assert xz_decompress(s1 + s2) == art + art[::-1]


def test_jbig2_oracle_gap_tripwire():
    """[r14, r13 verdict #6 adjudicated] PDF JBIG2Decode stays a NAMED
    gap: no JBIG2-capable third-party artifact or oracle exists on
    this host — libjbig.so.0 is JBIG1 (T.82, a different arithmetic
    coder), there is no jbig2dec/openjpeg/mupdf/poppler/qpdf, and a
    self-written encoder+decoder pair would be a self-consistent
    roundtrip the LZW-timing lesson forbids treating as verification.
    This tripwire scans for JBIG2-capable libraries and bundled PDF
    corpora carrying JBIG2 streams: if either appears, it FAILS loudly
    so the T.88 generic-region + MQ-coder decode gets written against
    a real pin instead of the gap silently persisting."""
    hits = []
    for pat in ("/usr/lib/*/libjbig2*", "/usr/lib/*/libopenjp*",
                "/usr/lib/*/libmupdf*", "/usr/lib/*/libpoppler*",
                "/usr/bin/jbig2dec", "/usr/bin/mutool", "/usr/bin/qpdf"):
        hits += glob.glob(pat)
    for root in glob.glob("/root/.pyenv/versions/*/lib/python*/test/*"):
        if root.endswith(".pdf"):
            with open(root, "rb") as f:
                if b"JBIG2Decode" in f.read():
                    hits.append(root)
    assert not hits, (
        f"JBIG2 oracles appeared on this host: {hits} — write the "
        "ITU-T T.88 generic-region decode pinned against them and "
        "delete this tripwire"
    )
