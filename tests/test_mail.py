"""Mail / MIME ingest: every assertion is pinned against CPython's own
email machinery (email.parser / email.message generation, quopri,
mailbox.mbox) over the same bytes — the third-party ground truth for
this format lives in the interpreter itself."""

from __future__ import annotations

import mailbox
import os
import quopri
import random
import tempfile
from email import policy
from email.header import decode_header, make_header
from email.message import EmailMessage
from email.parser import BytesParser

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mail import (
    decode_qp,
    decode_rfc2047,
    parse_content_type,
    parse_headers,
    parse_message,
    split_mbox,
)


def _std(raw: bytes):
    return BytesParser(policy=policy.default).parsebytes(raw)


def _std_leaves(msg):
    return [p for p in msg.walk() if not p.is_multipart()]


def _assert_parity(raw: bytes):
    ours = parse_message(raw)
    std = _std(raw)
    leaves = _std_leaves(std)
    assert len(ours["parts"]) == len(leaves)
    for op, sp in zip(ours["parts"], leaves):
        assert op["content_type"] == sp.get_content_type()
        content = sp.get_content()
        if isinstance(content, str):
            assert op["text"] == content
        else:
            assert op["payload"] == content
        assert op["filename"] == sp.get_filename()
    assert ours["subject"] == (std["subject"] or "")
    return ours


def test_stdlib_generated_multipart_roundtrip():
    m = EmailMessage()
    m["Subject"] = "Héllo — größe test €"
    m["From"] = "Alice Wünder <a@example.com>"
    m["To"] = "b@example.com"
    m.set_content("plain body line 1\nnon-ascii: åäö\n")
    m.add_alternative("<html><p>html &amp; stuff</p>", subtype="html")
    m.add_attachment(b"\x00\x01bin" * 200, maintype="application",
                     subtype="octet-stream", filename="data.bin")
    ours = _assert_parity(m.as_bytes(policy=policy.SMTP))
    # text prefers the text/plain leaf
    assert ours["text"].startswith("plain body line 1")


def test_base64_and_qp_bodies_generated_by_stdlib():
    m = EmailMessage()
    m["Subject"] = "cte matrix"
    m.set_content("q" * 40 + " é " + "p" * 40, cte="quoted-printable")
    m.add_alternative("b" * 120 + " ü", subtype="plain",
                      cte="base64")
    _assert_parity(m.as_bytes(policy=policy.SMTP))


def test_nested_multipart_and_message_rfc822():
    inner = EmailMessage()
    inner["Subject"] = "inner"
    inner.set_content("the forwarded body")
    outer = EmailMessage()
    outer["Subject"] = "outer"
    outer.set_content("covering note")
    outer.add_attachment(inner)
    raw = outer.as_bytes(policy=policy.SMTP)
    ours = parse_message(raw)
    # our flat leaf walk includes the nested message's text/plain leaf
    texts = [p["text"].replace("\r\n", "\n") for p in ours["parts"]
             if p["content_type"] == "text/plain"]
    assert "covering note\n" in texts
    assert "the forwarded body\n" in texts


def test_html_only_message_falls_back_to_stripped_html():
    raw = (b"Subject: h\r\nContent-Type: text/html; charset=utf-8\r\n"
           b"\r\n<html><body><p>Only &lt;html&gt; here</p></body>")
    ours = parse_message(raw)
    assert ours["text"] == "Only <html> here"


def test_rfc2047_matrix_vs_stdlib():
    cases = [
        "=?utf-8?Q?a_b?= =?utf-8?Q?c?=",          # adjacency folds
        "=?utf-8?Q?a_b?= plain =?utf-8?Q?c?=",    # plain gap survives
        "=?iso-8859-1?B?5OT2?= tail",
        "prefix =?utf-8?B?4oKsIOKCrA==?=",
        "=?utf-8?q?lower=20case=20q?=",
        "no encoded words at all",
    ]
    for v in cases:
        assert decode_rfc2047(v) == str(make_header(decode_header(v))), v


def test_qp_decode_pinned_against_quopri():
    rng = random.Random(5)
    cases = [
        b"foo=20bar=\r\nbaz=E2=82=AC",
        b"soft=\nbreak lf-only",
        b"bad escape =XZ stays",
        b"trailing equals =",
        b"=41=42=43",
    ]
    for _ in range(50):
        cases.append(bytes(rng.choices(
            b"abc =\r\n0123456789ABCDEF", k=rng.randrange(0, 60))))
    for c in cases:
        assert decode_qp(c) == quopri.decodestring(c), c


def test_folded_headers_unfold():
    raw = (b"Subject: part one\r\n\tpart two\r\n"
           b"X-Long: a\r\n  b\r\n  c\r\n\r\nbody")
    headers, body = parse_headers(raw)
    d = dict(headers)
    # unfolding removes only the CRLF: the continuation WSP survives
    assert d["Subject"] == "part one\tpart two"
    assert d["X-Long"] == "a  b  c"
    assert body == b"body"
    std = _std(raw)
    assert d["Subject"] == std["subject"]


def test_content_type_params_quoted_strings():
    ct, params = parse_content_type(
        'multipart/Mixed; boundary="a b\\"c;d"; charset=utf-8')
    assert ct == "multipart/mixed"
    assert params["boundary"] == 'a b"c;d'
    assert params["charset"] == "utf-8"
    # empty / missing values tolerated
    assert parse_content_type("")[0] == "text/plain"


def test_multipart_preamble_epilogue_dropped():
    raw = (b"Subject: s\r\n"
           b"Content-Type: multipart/mixed; boundary=BB\r\n\r\n"
           b"this preamble is dropped\r\n"
           b"--BB\r\nContent-Type: text/plain\r\n\r\nfirst part\r\n"
           b"--BB\r\nContent-Type: text/plain\r\n\r\nsecond part\r\n"
           b"--BB--\r\nepilogue dropped too\r\n")
    ours = _assert_parity(raw)
    assert [p["text"] for p in ours["parts"]] == [
        "first part", "second part"]


def test_unknown_charset_is_byte_lossless():
    raw = (b"Subject: s\r\n"
           b"Content-Type: text/plain; charset=x-no-such\r\n\r\n"
           b"caf\xe9")
    ours = parse_message(raw)
    assert ours["parts"][0]["text"] == "café"  # latin-1 fallback


def test_mbox_split_and_unstuffing_vs_mailbox():
    fd, path = tempfile.mkstemp(suffix=".mbox")
    os.close(fd)
    os.unlink(path)
    try:
        mb = mailbox.mbox(path)
        bodies = [
            "simple body\n",
            "line\nFrom the depths unstuff me\nFrom-less ok\n",
            "last one\n",
        ]
        for i, b in enumerate(bodies):
            m = EmailMessage()
            m["Subject"] = f"msg {i}"
            m.set_content(b)
            mb.add(m)
        mb.flush()
        mb.close()
        data = open(path, "rb").read()
        msgs = split_mbox(data)
        assert len(msgs) == 3
        back = mailbox.mbox(path)
        for raw, (_, std) in zip(msgs, sorted(back.items())):
            ours = parse_message(raw)
            assert ours["subject"] == std["subject"]
            # default read matches mailbox: no unstuffing
            assert ours["parts"][0]["text"] == std.get_payload()
        back.close()
        # mboxrd semantics: writer-stuffed ">From " lines unstuff one
        # level, restoring the original second body
        rd = split_mbox(data, unstuff=True)
        body1 = parse_message(rd[1])["parts"][0]["text"]
        assert bodies[1] in body1.replace("\r\n", "\n")
    finally:
        if os.path.exists(path):
            os.unlink(path)


def test_mbox_without_postmark_raises():
    with pytest.raises(ValueError):
        split_mbox(b"Subject: not an mbox\r\n\r\nbody\r\n")


def test_tear_fuzz_valueerror_only():
    base = (b"Subject: =?utf-8?B?4oKs?=\r\n"
            b"Content-Type: multipart/mixed; boundary=XX\r\n\r\n"
            b"--XX\r\nContent-Type: text/plain; charset=utf-8\r\n"
            b"Content-Transfer-Encoding: base64\r\n\r\n"
            b"cGF5bG9hZA==\r\n--XX--\r\n")
    rng = random.Random(31)
    for case in range(200):
        mut = bytearray(base)
        if case % 2:
            mut = mut[: rng.randrange(0, len(mut))]
        else:
            for _ in range(rng.randrange(1, 8)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            parse_message(bytes(mut))
        except ValueError:
            pass
