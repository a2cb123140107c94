"""PDF text extraction (operators/pdf.py): fixture roundtrips, REAL
host PDFs (pdfTeX 1.5: xref streams + object streams + ToUnicode
CMaps) pinned on content, string/tokenizer pins, declared boundaries,
300-case tear fuzz."""

from __future__ import annotations

import os
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
    PdfDocument,
    _Tok,
    build_pdf,
    extract_pdf_text,
    pdf_page_count,
)

_REAL = [
    ("/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf", 17,
     ["Shared MIME-info Database", "freedesktop"]),
    ("/usr/share/doc/libtasn1-doc/libtasn1.pdf", 36,
     ["Abstract Syntax Notation One", "ASN.1"]),
]


def test_fixture_roundtrip_multipage():
    blob = build_pdf(["hello world\nsecond line", "page two text"])
    assert extract_pdf_text(blob) == "hello world\nsecond line\x0cpage two text"
    assert pdf_page_count(blob) == 2


def test_fixture_uncompressed_and_escapes():
    text = "parens (nested (deep)) and back\\slash"
    blob = build_pdf([text], compress=False)
    assert extract_pdf_text(blob) == text


def test_tounicode_cmap_path():
    """Content bytes shifted by 3 with a bfchar CMap mapping them back:
    a decoder ignoring ToUnicode produces shifted garbage."""
    blob = build_pdf(["shifted content ok"], tounicode_shift=3)
    assert extract_pdf_text(blob) == "shifted content ok"
    assert b"ToUnicode" in blob and b"beginbfchar" in blob


def test_string_tokenizer_pins():
    t = _Tok(rb"(oct \101\102 nl\n paren \( done)")
    assert t.parse() == b"oct AB nl\n paren ( done"
    t = _Tok(b"<48 65 6C6C6F>")
    assert t.parse() == b"Hello"
    t = _Tok(rb"(line \
continued)")
    assert t.parse() == b"line continued"
    t = _Tok(b"<< /A#20B (x) /N 3 /R 4 0 R >>")
    d = t.parse()
    assert {k for k in d} == {"A B", "N", "R"}
    assert d["N"] == 3 and d["R"].num == 4


def test_tj_kerning_and_quote_operators():
    """Hand-built content stream: TJ kerning beyond the threshold emits
    a space; the ' operator starts a new line."""
    content = b"BT /F1 12 Tf [ (wo) -40 (rd) -300 (gap) ] TJ (next) ' ET"
    blob = build_pdf(["placeholder"])
    doc = PdfDocument(blob)
    page = doc.pages()[0]
    # swap the page's content stream for the crafted one
    cnum = page["Contents"].num
    doc.objects[cnum] = ({"Length": len(content)}, content)
    assert doc.page_text(page) == "word gap\nnext"


def test_real_host_pdfs_extract():
    for path, pages, needles in _REAL:
        if not os.path.exists(path):
            pytest.skip(f"no host {path}")
        blob = open(path, "rb").read()
        assert pdf_page_count(blob) == pages
        text = extract_pdf_text(blob)
        assert len(text) > 10_000
        for needle in needles:
            assert needle in text, (path, needle)


def test_declared_boundaries():
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_text(b"%!PS-Adobe nope")
    blob = build_pdf(["x"])
    # encrypted trailer
    enc = blob.replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(enc)
    # a non-Flate content filter is SKIPPED (empty text), never a crash
    doc = PdfDocument(blob)
    page = doc.pages()[0]
    cnum = page["Contents"].num
    val, stream = doc.objects[cnum]
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import _Name

    doc.objects[cnum] = ({"Length": 4, "Filter": _Name("DCTDecode")}, b"\xff\xd8!!")
    assert doc.page_text(page) == ""
    # a PDF with no page objects raises
    with pytest.raises(ValueError, match="no page"):
        extract_pdf_text(b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n%%EOF")


def test_tear_contract_fuzz():
    import numpy as np

    rng = np.random.default_rng(23)
    blob = bytearray(build_pdf(["some body text here", "and a second page"]))
    for trial in range(300):
        mutated = bytearray(blob)
        if trial % 2 == 0:
            mutated = mutated[: int(rng.integers(8, len(mutated)))]
        else:
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            extract_pdf_text(bytes(mutated))
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# embedded images (r11): /Subtype /Image XObjects -> sniffable payloads


def _two_tone(split: int):
    import numpy as np

    px = np.full((32, 32, 3), 40, dtype=np.uint8)
    px[split:, :, :] = 200
    return px


def test_pdf_images_extract_all_builder_filters():
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        extract_pdf_images,
    )

    rgb = _two_tone(16)
    gray = np.full((24, 16), 70, dtype=np.uint8)
    gray[:8] = 220
    blob = build_pdf(
        ["text with images", "page two"],
        images=[
            {"rgb": rgb, "filter": "flate"},
            {"rgb": rgb, "filter": "jpeg"},
            {"rgb": gray, "filter": "flate-pred"},
            {"rgb": rgb, "filter": "raw"},
        ],
    )
    # text extraction is untouched by the embedded XObjects
    assert extract_pdf_text(blob).startswith("text with images")
    imgs = extract_pdf_images(blob)
    assert [im["fmt"] for im in imgs] == ["ppm", "jpeg", "ppm", "ppm"]
    # lossless paths reproduce samples exactly
    for i in (0, 3):
        px, w, h = decode_image(imgs[i]["payload"])
        assert (w, h) == (32, 32) and np.array_equal(px, rgb)
    # the DCTDecode stream is a real JPEG payload for the from-spec decoder
    px, w, h = decode_image(imgs[1]["payload"])
    assert (w, h) == (32, 32)
    assert abs(int(px[:16].mean()) - 40) <= 3 and abs(int(px[16:].mean()) - 200) <= 3
    # gray + PNG Up-predictor path
    px, w, h = decode_image(imgs[2]["payload"])
    assert (w, h) == (16, 24)
    assert np.array_equal(px[..., 0], gray) and np.array_equal(px[..., 2], gray)


def test_pdf_images_out_of_scope_filters_are_visible_not_wrong():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        extract_pdf_images,
    )

    blob = build_pdf(["x"], images=[{"rgb": _two_tone(8), "filter": "flate"}])
    hacked = blob.replace(b"/Filter /FlateDecode", b"/Filter /JPXDecode  ")
    imgs = extract_pdf_images(hacked)
    assert len(imgs) == 1
    assert imgs[0]["fmt"].startswith("skipped:")
    assert imgs[0]["payload"] is None


def test_pdf_without_images_yields_empty_list():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        extract_pdf_images,
    )

    assert extract_pdf_images(build_pdf(["no images"])) == []


def test_real_host_pdfs_have_no_images_and_extract_cleanly():
    """The two real pdfTeX PDFs on this host embed no raster images
    (verified: zero /XObject occurrences) — extraction must return []
    rather than error, and a REAL image-bearing PDF fixture gap stays
    visible via this assertion (the r10 documented-gap convention)."""
    import os

    import pytest

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        extract_pdf_images,
    )

    found = False
    for path, _, _ in _REAL:
        if not os.path.exists(path):
            continue
        found = True
        assert extract_pdf_images(open(path, "rb").read()) == []
    if not found:
        pytest.skip("no real host PDFs available")


def test_pdf_indexed_palette_with_flate_compressed_palette_stream():
    """The palette object's own /Filter chain must be applied (r11
    advice): a FlateDecode palette stream reinterpreted raw produces
    silently wrong colors."""
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.pdf import (
        extract_pdf_images,
    )

    rgb = _two_tone(16)
    blob = build_pdf(["indexed"], images=[{"rgb": rgb, "filter": "indexed"}])
    imgs = extract_pdf_images(blob)
    assert [im["fmt"] for im in imgs] == ["ppm"]
    px, w, h = decode_image(imgs[0]["payload"])
    assert (w, h) == (32, 32) and np.array_equal(px, rgb)
