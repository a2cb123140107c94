"""RTF text extraction: spec-corner matrix + trap-laden fixture
roundtrips. No RTF reader or real .rtf artifact exists on this host
(the visible-gap tripwire lives in tests/test_realworld_r15.py); the
fixture writer therefore encodes every trap the spec allows — live
\\ucN fallbacks, codepage escapes, skipped destinations containing
\\par, \\bin blobs of brace/backslash bytes."""

from __future__ import annotations

import random

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.rtf import (
    build_rtf,
    rtf_to_text,
)


def test_fixture_roundtrip_with_all_traps():
    paras = ["Hello wörld — test", "second pära with €uro",
             "plain third", "fourth with skipped dest",
             "fünfte Zeile ümläuts", "mixed ASCII tail"]
    pay = build_rtf(paras, title="Tïtle & <x>")
    r = rtf_to_text(pay)
    assert r["text"] == "\n".join(paras)
    assert r["codepage"] == "cp1252"
    assert r["n_pars"] == len(paras)
    # the \bin blob bytes ({, }, \, 0xff) never leak into text
    assert "zz" not in r["text"] and "�" not in r["text"]


def test_unicode_escape_uc_skip_protocol():
    # \uc2: TWO fallback items after \uN are swallowed
    assert rtf_to_text(
        b"{\\rtf1\\uc2\\u233xy tail}")["text"] == "é tail"
    # a \'xx hex escape counts as ONE fallback item
    assert rtf_to_text(
        b"{\\rtf1\\uc2\\u233\\'e9y tail}")["text"] == "é tail"
    # a control word counts as ONE fallback item
    assert rtf_to_text(
        b"{\\rtf1\\uc1\\u233\\tab x}")["text"] == "éx"
    # \uc0: no fallback at all
    assert rtf_to_text(
        b"{\\rtf1\\uc0\\u8364 ok}")["text"] == "€ok"
    # negative N wraps by +65536
    assert rtf_to_text(
        b"{\\rtf1\\uc1\\u-3500?x}")["text"] == "x"
    # uc state is scoped to its group: inside \uc2 swallows 'xy',
    # after the pop \uc1 is live again and swallows only 'z'
    assert rtf_to_text(
        b"{\\rtf1\\uc1{\\uc2\\u65xy}\\u66z after}")["text"] == "AB after"


def test_codepage_hex_escapes():
    assert rtf_to_text(
        b"{\\rtf1\\ansicpg1251 \\'c0\\'c1}")["text"] == "АБ"
    assert rtf_to_text(
        b"{\\rtf1\\ansicpg1252 caf\\'e9}")["text"] == "café"
    with pytest.raises(ValueError):
        rtf_to_text(b"{\\rtf1\\ansicpg99999 x}")


def test_destinations_skip_entirely():
    # a \par inside a skipped destination emits NOTHING
    pay = (b"{\\rtf1{\\*\\nosuchdest ghost \\par \\'e9 ghost}"
           b"{\\fonttbl{\\f0 Arial;}}real}")
    assert rtf_to_text(pay)["text"] == "real"
    # field: instructions skip, result shows
    pay2 = (b"{\\rtf1 {\\field{\\*\\fldinst HYPERLINK \"u\"}"
            b"{\\fldrslt shown}} end}")
    assert rtf_to_text(pay2)["text"] == "shown end"
    # info (title etc.) never leaks
    pay3 = b"{\\rtf1{\\info{\\title secret}}visible}"
    assert rtf_to_text(pay3)["text"] == "visible"


def test_control_symbols_and_specials():
    r = rtf_to_text(b"{\\rtf1 a\\~b\\'e9c\\tab d\\line e\\emdash f}")
    assert r["text"] == "a béc\td\ne—f"
    assert rtf_to_text(b"{\\rtf1 br\\{ace\\}s \\\\slash}")[
        "text"] == "br{ace}s \\slash"
    # raw CR/LF in source are not content; escaped \<newline> is \par
    assert rtf_to_text(b"{\\rtf1 one\r\ntwo}")["text"] == "onetwo"


def test_bin_blob_skipped_raw():
    blob = b"\x7b\x7d\\'zz\xff\x00"
    pay = b"{\\rtf1 pre{\\*\\hold\\bin" + str(len(blob)).encode() \
        + b" " + blob + b"}post}"
    assert rtf_to_text(pay)["text"] == "prepost"


def test_magic_and_balance_tears():
    with pytest.raises(ValueError):
        rtf_to_text(b"not rtf at all")
    with pytest.raises(ValueError):
        rtf_to_text(b"{\\rtf1 unbalanced")
    with pytest.raises(ValueError):
        rtf_to_text(b"{\\rtf1 x}}")
    with pytest.raises(ValueError):
        rtf_to_text(b"{\\rtf1 dangling\\")
    with pytest.raises(ValueError):
        rtf_to_text(b"{\\rtf1 \\'q")


def test_tear_fuzz_valueerror_only():
    base = build_rtf(["p one ä", "p two €"], title="t")
    rng = random.Random(17)
    for case in range(300):
        mut = bytearray(base)
        if case % 3 == 0:
            mut = mut[: rng.randrange(0, len(mut))]
        elif case % 3 == 1:
            for _ in range(rng.randrange(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        else:
            pos = rng.randrange(len(mut))
            mut[pos:pos] = bytes([rng.choice(b"{}\\u'")])
        try:
            rtf_to_text(bytes(mut))
        except ValueError:
            pass
