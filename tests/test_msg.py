"""Outlook .msg extraction over the CFB walk. No host .msg artifact
or reader (the CFB tripwire in tests/test_realworld_r15.py globs .msg
too); fixtures are spec-literal [MS-OXMSG] property-stream layouts."""

from __future__ import annotations

import random

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.msg import (
    build_msg,
    parse_msg,
)


def test_full_shape_roundtrip():
    m = build_msg(
        "Bëtreff €", "body line\nzwei", sender="alice@ex.com",
        recipients=[("Bob B", "bob@ex.com"), ("Cärol", "c@ex.com")],
        attachments=[("file.bin", b"\x00\x01" * 40),
                     ("nötes.txt", b"inner text")],
    )
    r = parse_msg(m)
    assert r["subject"] == "Bëtreff €"
    assert r["body"] == "body line\nzwei"
    assert r["sender_addr"] == "alice@ex.com"
    assert r["to"] == "Bob B; Cärol"
    assert [x["smtp"] for x in r["recipients"]] == [
        "bob@ex.com", "c@ex.com"]
    assert [(a["filename"], a["data"]) for a in r["attachments"]] == [
        ("file.bin", b"\x00\x01" * 40), ("nötes.txt", b"inner text")]


def test_embedded_message_recursion():
    inner = {"subject": "inner subj", "body": "inner body",
             "recipients": [("Inner R", "i@ex.com")]}
    m = build_msg("outer", "outer body", attached_msg=inner)
    r = parse_msg(m)
    assert len(r["attached_messages"]) == 1
    n = r["attached_messages"][0]
    assert n["subject"] == "inner subj" and n["body"] == "inner body"
    assert n["recipients"][0]["smtp"] == "i@ex.com"


def test_8bit_001e_body_decodes_cp1252():
    m = build_msg("s", "böd¥ with € sign", eightbit_body=True)
    assert parse_msg(m)["body"] == "böd¥ with € sign"


def test_minimal_and_missing_subject():
    m = build_msg("just subject", "")
    r = parse_msg(m)
    assert r["subject"] == "just subject"
    assert r["recipients"] == [] and r["attachments"] == []
    # a CFB with no subject property is not a message
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
        build_cfb,
    )

    with pytest.raises(ValueError):
        parse_msg(build_cfb({"SomeStream": b"x" * 50}))


def test_tear_fuzz_valueerror_only():
    base = build_msg("subj ä", "body €",
                     recipients=[("R", "r@ex.com")],
                     attachments=[("a.bin", b"zz" * 30)])
    rng = random.Random(61)
    for case in range(200):
        mut = bytearray(base)
        if case % 2:
            mut = mut[: rng.randrange(0, len(mut))]
        else:
            for _ in range(rng.randrange(1, 8)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            parse_msg(bytes(mut))
        except ValueError:
            pass
