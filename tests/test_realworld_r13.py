"""Round-13 real-file / real-library pins (the python.webp/libwebp
discipline): every r13 format change lands here with a third-party
artifact or ctypes-library ground truth, or a visible documented-gap
skip. r13 formats: CCITT Group 3 / Modified Huffman (libtiff), HEIC
(libheif; deep battery in tests/test_heif.py), HEVC Main10 (x265
10-bit API + libde265; deep battery in tests/test_hevc_decode.py),
AV1/AVIF OBU probe (libaom/libdav1d/libheif artifacts)."""

from __future__ import annotations

import ctypes
import glob
import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

rng = np.random.RandomState(13)

GROUP3OPT_2DENCODING = 1
GROUP3OPT_FILLBITS = 4


def _libtiff():
    hits = glob.glob("/usr/lib/*/libtiff.so*")
    if not hits:
        pytest.skip("no system libtiff (host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFReadRGBAImage.restype = ctypes.c_int
    lib.TIFFReadRGBAImage.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int,
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    return lib


def _libtiff_rgba(lib, path, w, h):
    tif = lib.TIFFOpen(path.encode(), b"r")
    assert tif
    raster = (ctypes.c_uint32 * (w * h))()
    assert lib.TIFFReadRGBAImage(tif, w, h, raster, 0) == 1
    lib.TIFFClose(ctypes.c_void_p(tif))
    v = np.ctypeslib.as_array(raster).reshape(h, w)
    return np.stack(
        [v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=-1
    ).astype(np.uint8)[::-1]


def _write_ccitt_tiff(lib, path, img, comp, photo=0, t4opts=None):
    h, w = img.shape
    packed = np.packbits(img, axis=1)
    tif = lib.TIFFOpen(path.encode(), b"w")
    assert tif
    fields = [(256, w), (257, h), (258, 1), (259, comp), (262, photo),
              (277, 1), (284, 1), (278, h)]
    if t4opts is not None:
        fields.append((292, t4opts))
    for tag, val in fields:
        lib.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag),
                         ctypes.c_int(val))
    for r in range(h):
        row = packed[r].copy()
        assert lib.TIFFWriteScanline(
            tif, row.ctypes.data_as(ctypes.c_void_p), r, 0
        ) == 1
    lib.TIFFClose(ctypes.c_void_p(tif))


@pytest.mark.parametrize("comp,t4opts,label", [
    (2, None, "modified-huffman"),
    (3, 0, "g3-1d"),
    (3, GROUP3OPT_2DENCODING, "g3-2d"),
    (3, GROUP3OPT_FILLBITS, "g3-1d-fill"),
    (3, GROUP3OPT_2DENCODING | GROUP3OPT_FILLBITS, "g3-2d-fill"),
])
def test_real_libtiff_g3_files_decode_pixel_exact(comp, t4opts, label):
    """[r13] Files written by the REAL libtiff G3/MH encoders (all
    five writer variants) decode through our T.4 core + TIFF routing
    to exactly libtiff's own RGBA decode."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.tiff import (
        decode_tiff,
    )

    lib = _libtiff()
    for (h, w), photo, dens in [
        ((40, 64), 0, 0.5), ((29, 100), 1, 0.9), ((8, 1728), 0, 0.04),
        ((64, 173), 0, 0.2), ((5, 2048), 0, 0.5),
    ]:
        img = (rng.rand(h, w) < dens).astype(np.uint8)
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            _write_ccitt_tiff(lib, f.name, img, comp, photo, t4opts)
            gt = _libtiff_rgba(lib, f.name, w, h)
            with open(f.name, "rb") as fh:
                px, ww, hh = decode_tiff(fh.read())
            assert (ww, hh) == (w, h)
            assert np.array_equal(px, gt), (label, h, w, photo)


def test_our_g3_encoder_decodes_identically_in_libtiff():
    """Opposite direction: our g3_encode streams wrapped in minimal
    TIFFs decode in the REAL libtiff to the encoded pixels."""
    import struct as _s

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ccitt import (
        g3_encode,
    )

    lib = _libtiff()

    def minimal_tiff(data, w, h, comp, t4opts=None):
        entries = [(256, 3, w), (257, 3, h), (258, 3, 1), (259, 3, comp),
                   (262, 3, 0), (273, 4, 0), (277, 3, 1), (278, 3, h),
                   (279, 4, len(data)), (284, 3, 1)]
        if t4opts is not None:
            entries.append((292, 4, t4opts))
        entries.sort()
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * len(entries) + 4
        out = bytearray(b"II*\x00" + _s.pack("<I", ifd_off))
        out += _s.pack("<H", len(entries))
        for tag, typ, val in entries:
            if tag == 273:
                val = data_off
            out += _s.pack("<HHI", tag, typ, 1)
            out += _s.pack("<I", val)
        out += _s.pack("<I", 0)
        out += data
        return bytes(out)

    for comp, kw, t4opts in [
        (2, dict(byte_align=True, eols=False), None),
        (3, dict(eols=True), 0),
        (3, dict(two_d_k=4, eols=True), GROUP3OPT_2DENCODING),
    ]:
        img = (rng.rand(23, 70) < 0.45).astype(np.uint8)
        blob = minimal_tiff(g3_encode(img, **kw), 70, 23, comp, t4opts)
        with tempfile.NamedTemporaryFile(suffix=".tif") as f:
            f.write(blob)
            f.flush()
            gt = _libtiff_rgba(lib, f.name, 70, 23)
        # photometric 0 (WhiteIsZero): ink (1) renders black
        want = np.repeat(((1 - img) * 255)[:, :, None], 3, axis=2)
        assert np.array_equal(gt, want), comp


def test_heic_real_library_pin_summary():
    """[r13] HEIC: libheif-encoded artifact decodes pixel-exact (the
    deep battery lives in tests/test_heif.py — this is the r13
    roll-call entry)."""
    from heif_rig import decode_heic_rgb, encode_heic, heif_lib
    from hevc_rig import make_frame

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
        decode_heif,
    )

    if heif_lib() is None:
        pytest.skip("no system libheif (visible host gap)")
    y, u, v = make_frame(64, 48, 11, "mixed")
    f = encode_heic(y, u, v, quality=85)
    ours, w, h = decode_heif(f)
    assert np.array_equal(ours, decode_heic_rgb(f))


def test_main10_real_library_pin_summary():
    """[r13] HEVC Main10: a real x265 10-bit stream decodes bit-exact
    vs libde265 (deep battery in tests/test_hevc_decode.py)."""
    from hevc_rig import de265_lib, x265_api

    if x265_api(10) is None or de265_lib() is None:
        pytest.skip("no 10-bit x265 API / libde265 (visible host gap)")
    from hevc_rig import decode_de265, encode_intra10, make_frame10

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.hevc_decode import (
        decode_hevc_intra,
    )

    # x265 needs at least one CTU (64x64 default) per picture
    st = encode_intra10([make_frame10(64, 64, 6)], qp=26)
    gt = decode_de265(st)[0]
    ours = decode_hevc_intra(st)[0]
    for c in range(3):
        assert np.array_equal(ours[c], gt[c])


def test_avif_real_artifacts_probe_pixel_facts():
    """[r13] AV1/AVIF probe: REAL AVIF files written by the system
    libheif's libaom plugin (fully third-party bitstreams) probe to
    the encoded geometry/profile/bit-depth facts — container (av1C)
    and bitstream (sequence header) cross-checked."""
    from heif_rig import COMPRESSION_AV1, encode_heic, heif_lib
    from hevc_rig import make_frame

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.av1 import (
        probe_av1_obus,
        probe_avif,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.heif import (
        _find_meta,
        _item_data,
    )

    if heif_lib() is None:
        pytest.skip("no system libheif (visible host gap)")
    for (w, h), q in [((96, 64), 70), ((33, 47), 90), ((128, 128), 40)]:
        y, u, v = make_frame(w, h, w + h, "mixed")
        try:
            f = encode_heic(y, u, v, quality=q,
                            compression=COMPRESSION_AV1)
        except RuntimeError as exc:  # no AV1 plugin in this libheif
            pytest.skip(f"libheif AV1 encode unavailable: {exc}")
        r = probe_avif(f)
        assert (r["width"], r["height"]) == (w, h), r
        assert r["bit_depth"] == 8 and not r["monochrome"]
        assert r["subsampling"] == "4:2:0"
        assert r["n_frames"] >= 1
        # OBU-level probe on the raw item payload agrees
        meta, _ = _find_meta(f)
        obus = probe_av1_obus(_item_data(f, meta, meta["primary"]))
        assert obus["profile"] == r["profile"]
        assert obus.get("width", w) >= w  # coded size may pad


def test_avif_decode_stays_named_quarantine():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.av1 import (
        build_avif,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
        sniff_image_format,
    )

    f = build_avif(64, 48)
    assert sniff_image_format(f) == "avif"
    with pytest.raises(ValueError, match="AV1"):
        decode_image(f)


def test_av1_probe_tear_fuzz_valueerror_only():
    import random

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.av1 import (
        build_avif,
        probe_avif,
    )

    f = bytearray(build_avif(96, 64, bit_depth=10))
    rnd = random.Random(17)
    for case in range(300):
        data = bytearray(f)
        op = rnd.randrange(3)
        if op == 0:
            data = data[:rnd.randrange(1, len(data))]
        elif op == 1:
            for _ in range(rnd.randrange(1, 6)):
                data[rnd.randrange(len(data))] = rnd.randrange(256)
        else:
            pos = rnd.randrange(len(data))
            data[pos:pos] = bytes(rnd.randrange(256)
                                  for _ in range(rnd.randrange(1, 9)))
        try:
            probe_avif(bytes(data))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"case {case}: non-ValueError tear "
                f"{type(exc).__name__}: {exc}"
            )


def test_ms_adpcm_third_party_artifact_gap_tripwire():
    """[r13 hygiene] MS-ADPCM still lacks a third-party artifact pin on
    this host (the IMA path is audioop-pinned; MS is analytic +
    spec-derived). This tripwire scans the interpreter's bundled audio
    test data for a format-2 (MS-ADPCM) WAV: if one ever appears, it
    FAILS loudly so the pin gets written instead of the gap silently
    persisting (the documented LZW-timing lesson)."""
    import struct

    hits = []
    for root in glob.glob("/root/.pyenv/versions/*/lib/python*/test/*data*"):
        for path in glob.glob(os.path.join(root, "*.wav")):
            with open(path, "rb") as f:
                blob = f.read(64)
            i = blob.find(b"fmt ")
            if i >= 0 and len(blob) >= i + 10:
                fmt_tag = struct.unpack_from("<H", blob, i + 8)[0]
                if fmt_tag == 2:
                    hits.append(path)
    assert not hits, (
        f"real MS-ADPCM artifacts appeared on this host: {hits} — "
        "write the third-party pin (decode vs the artifact's reference "
        "PCM) and delete this tripwire"
    )


def _liblz4():
    hits = glob.glob("/usr/lib/*/liblz4.so*")
    if not hits:
        pytest.skip("no system liblz4 (visible host gap)")
    lib = ctypes.CDLL(hits[0])
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_void_p,
    ]
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t,
                                            ctypes.c_void_p]
    lib.LZ4F_isError.restype = ctypes.c_uint
    lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
    lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    lib.LZ4F_createDecompressionContext.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint
    ]
    lib.LZ4F_decompress.restype = ctypes.c_size_t
    lib.LZ4F_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p,
    ]
    return lib


def _lz4_cases():
    import random

    rnd = random.Random(7)
    with open("/root/testdata/sf0.001/documents.parquet", "rb") as f:
        real = f.read()[:150000]
    return [
        b"", b"a", b"hello world " * 100,
        bytes(rnd.randrange(256) for _ in range(5000)),
        (b"abcde" * 4000)[:17000],
        bytes(rnd.choice(b"abcd") for _ in range(200000)),
        real,
    ]


def test_lz4_frames_pin_against_liblz4_both_directions():
    """[r13] LZ4: REAL liblz4 LZ4F frames decode byte-identical through
    our from-spec frame decoder (incl. its header checksum + content
    checksum verification — which transitively pins the from-spec
    xxHash32), and OUR encoder's frames decode byte-identical in the
    real liblz4 — both directions, the G4/HEVC discipline."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lz4 import (
        lz4_compress,
        lz4_decompress,
    )

    lib = _liblz4()

    def ref_compress(data):
        bound = lib.LZ4F_compressFrameBound(len(data), None)
        buf = ctypes.create_string_buffer(max(bound, 64))
        n = lib.LZ4F_compressFrame(buf, len(buf), data, len(data), None)
        assert not lib.LZ4F_isError(n)
        return buf.raw[:n]

    def ref_decompress(data):
        ctx = ctypes.c_void_p()
        assert lib.LZ4F_createDecompressionContext(
            ctypes.byref(ctx), 100
        ) == 0
        out = bytearray()
        off = 0
        buf = ctypes.create_string_buffer(1 << 20)
        while off < len(data):
            dst = ctypes.c_size_t(len(buf))
            src = ctypes.c_size_t(len(data) - off)
            r = lib.LZ4F_decompress(ctx, buf, ctypes.byref(dst),
                                    data[off:], ctypes.byref(src), None)
            assert not lib.LZ4F_isError(r), r
            out += buf.raw[:dst.value]
            off += src.value
            if r == 0:
                break
        return bytes(out)

    for idx, data in enumerate(_lz4_cases()):
        assert lz4_decompress(ref_compress(data)) == data, idx
        assert ref_decompress(lz4_compress(data)) == data, idx
        assert ref_decompress(
            lz4_compress(data, block_checksum=True)
        ) == data, idx


def test_lz4_tear_fuzz_and_checksum_contract():
    """300-case mutation/truncation fuzz: ValueError only; checksum
    flips are CAUGHT (a corrupted content byte can't decode silently
    when the frame carries checksums)."""
    import random

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lz4 import (
        lz4_compress,
        lz4_decompress,
    )

    base = lz4_compress(b"the quick brown fox " * 500)
    rnd = random.Random(23)
    for case in range(300):
        data = bytearray(base)
        op = rnd.randrange(3)
        if op == 0:
            data = data[:rnd.randrange(1, len(data))]
        elif op == 1:
            for _ in range(rnd.randrange(1, 4)):
                data[rnd.randrange(len(data))] ^= 1 << rnd.randrange(8)
        else:
            pos = rnd.randrange(len(data))
            data[pos:pos] = bytes(rnd.randrange(256)
                                  for _ in range(rnd.randrange(1, 9)))
        try:
            lz4_decompress(bytes(data))
        except ValueError:
            pass
        except Exception as exc:  # pragma: no cover
            raise AssertionError(
                f"case {case}: non-ValueError tear "
                f"{type(exc).__name__}: {exc}"
            )
    # a single flipped CONTENT byte must not decode silently
    plain = lz4_compress(bytes(range(256)) * 64)
    body = bytearray(plain)
    body[len(body) // 2] ^= 0x40
    with pytest.raises(ValueError):
        lz4_decompress(bytes(body))
