"""Legacy .xls (BIFF8) and .ppt (PPT97) extraction — the other two
thirds of the pre-2007 office slice riding the CFB walk. No host
artifact or reader exists (the CFB tripwire in
tests/test_realworld_r15.py covers .xls/.ppt too); the fixture
writers keep every documented trap live."""

from __future__ import annotations

import random
import struct

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.biff import (
    build_xls,
    parse_xls,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ppt97 import (
    build_ppt,
    parse_ppt,
)


SHEETS = [
    ("Sheet1", [["hello wörld", 42, "shared str"],
                [3.14, "ünïcode €", -7],
                ["rich text x", "extrst y", 2.5]]),
    ("Data2", [["shared str", 123456789, "hello wörld"],
               [-0.01, 0.25, "last"]]),
]


def _cells(rows):
    return [(r, c, float(v) if isinstance(v, (int, float)) else v)
            for r, row in enumerate(rows) for c, v in enumerate(row)]


def _got(sheet):
    return [(r, c, float(v) if isinstance(v, (int, float)) else v)
            for r, c, v in sheet["cells"]]


@pytest.mark.parametrize("split", [True, False])
def test_xls_roundtrip_with_and_without_continue_split(split):
    pay = build_xls(SHEETS, split_sst=split)
    r = parse_xls(pay)
    assert [s["name"] for s in r["sheets"]] == ["Sheet1", "Data2"]
    for sh, (_, rows) in zip(r["sheets"], SHEETS):
        assert _got(sh) == _cells(rows)
    assert r["n_sst"] == 6  # shared strings dedupe


def test_xls_continue_split_switches_encoding():
    # the split string ('shared str', slot 1) crosses the CONTINUE
    # boundary: 2 chars 8-bit, the rest restated as UTF-16 — verify
    # the CONTINUE record really exists in the bytes
    pay = build_xls(SHEETS, split_sst=True)
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
        parse_cfb,
    )

    wb = parse_cfb(pay)["streams"]["Workbook"]
    types = []
    i = 0
    while i + 4 <= len(wb):
        t, ln = struct.unpack_from("<HH", wb, i)
        types.append(t)
        i += 4 + ln
    assert 0x003C in types  # CONTINUE present
    assert parse_xls(pay)["n_sst"] == 6


def test_xls_rk_encodings():
    rows = [[1, -1, 100, -100], [0.25, -0.25, 2.5, 1234567.0],
            [2**28, -(2**28), 7, 0]]
    pay = build_xls([("N", rows)])
    got = parse_xls(pay)["sheets"][0]["cells"]
    want = _cells(rows)
    assert [(r, c, float(v)) for r, c, v in got] == want


def test_xls_isst_out_of_range_tears():
    pay = bytearray(build_xls([("S", [["only"]])], split_sst=False))
    # find the LABELSST record in the workbook bytes and stomp isst
    idx = bytes(pay).find(struct.pack("<HH", 0x00FD, 10))
    assert idx > 0
    struct.pack_into("<I", pay, idx + 4 + 6, 999)
    with pytest.raises(ValueError):
        parse_xls(bytes(pay))


def test_ppt_roundtrip_both_atom_kinds():
    slides = ["first slide plain", "zwëite Fölie €",
              "third\nwith line", "vierte"]
    r = parse_ppt(build_ppt(slides))
    assert r["texts"] == slides
    assert "decoy" not in r["text"]  # CStrings excluded


def test_office_front_door_xls_ppt_with_titles():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ooxml import (
        office_to_text,
        sniff_office_format,
    )

    x = build_xls([("S", [["a ünï", 5, "b"], ["c", "d", 7]])],
                  title="Xls Tïtle")
    assert sniff_office_format(x) == "xls"
    got = office_to_text(x)
    assert got["text"] == "a ünï\tb\nc\td"  # numbers are not text
    assert got["title"] == "Xls Tïtle" and got["n_blocks"] == 2
    p = build_ppt(["slïde one", "two"], title="Ppt T")
    assert sniff_office_format(p) == "ppt"
    got = office_to_text(p)
    assert got == {"format": "ppt", "text": "slïde one\ntwo",
                   "title": "Ppt T", "n_blocks": 2}


def test_tear_fuzz_valueerror_only():
    base_x = build_xls(SHEETS)
    base_p = build_ppt(["eins ä", "zwei €"])
    rng = random.Random(53)
    for case in range(300):
        base = base_x if case % 2 else base_p
        parse = parse_xls if case % 2 else parse_ppt
        mut = bytearray(base)
        if case % 3 == 0:
            mut = mut[: rng.randrange(0, len(mut))]
        else:
            for _ in range(rng.randrange(1, 8)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            parse(bytes(mut))
        except ValueError:
            pass
