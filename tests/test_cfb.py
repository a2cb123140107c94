"""CFB/OLE2 container + legacy .doc piece-table extraction. No CFB
reader or artifact exists on this host (tripwire in
tests/test_realworld_r15.py) — the fixture writer builds spec-literal
containers covering both sector sizes, mini/regular/DIFAT-chained
placement, storage nesting, and the fast-save piece-table traps."""

from __future__ import annotations

import random
import struct

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
    build_cfb,
    build_doc,
    parse_cfb,
    parse_doc,
)


STREAMS = {
    "small": b"abc" * 10,           # mini stream
    "big": b"X" * 9000,             # regular sectors
    "edge4095": b"e" * 4095,        # last mini-eligible size
    "edge4096": b"E" * 4096,        # first regular size
    "dir1/nested": b"n" * 100,
    "dir1/deep/leaf": b"L" * 5000,
    "empty": b"",
}


@pytest.mark.parametrize("version", [3, 4])
def test_container_roundtrip_both_versions(version):
    data = build_cfb(STREAMS, version=version)
    got = parse_cfb(data)
    assert got["version"] == version
    assert got["sector_size"] == (512 if version == 3 else 4096)
    assert got["streams"] == STREAMS


def test_difat_chained_fat():
    # >109 FAT sectors at v3 forces a chained DIFAT sector
    big = {"huge": bytes(bytearray(range(256)) * 32000)}
    data = build_cfb(big)
    n_difat = struct.unpack_from("<I", data, 72)[0]
    assert n_difat >= 1
    assert parse_cfb(data)["streams"] == big


def test_many_streams_multi_sector_directory():
    streams = {f"s{i:03d}": bytes([i]) * (10 + i) for i in range(80)}
    got = parse_cfb(build_cfb(streams))
    assert got["streams"] == streams


def test_orphaned_entries_invisible():
    # an entry present in the directory sector but not reachable via
    # the sibling tree must NOT appear (freed-entry semantics)
    data = bytearray(build_cfb({"keep": b"k" * 40, "drop": b"d" * 40}))
    # find the 'drop' directory entry and cut it out of the tree by
    # re-wiring: simplest valid surgery is renaming via the tree —
    # instead, parse, then verify the tree-walk contract directly:
    got = parse_cfb(bytes(data))
    assert set(got["streams"]) == {"keep", "drop"}
    # now orphan 'drop': find its 128-byte entry and zero its type
    nm = "drop".encode("utf-16-le")
    off = bytes(data).find(nm)
    assert off > 0
    entry_off = off  # entries start at the name field
    data[entry_off + 66] = 0  # unknown/unallocated
    with pytest.raises(ValueError):
        # the sibling tree now points at a dead entry: fail-visible
        parse_cfb(bytes(data))


def test_doc_fast_save_piece_table():
    paras = ["First paragraph with ünïcode €",
             "second plain ascii words here",
             "third – em dash ¶"]
    doc = build_doc(paras)
    r = parse_doc(doc)
    assert r["text"] == "\n".join(paras)
    assert r["n_pieces"] > 1
    assert r["table_stream"] == "1Table"
    # the trap is real: the first piece's bytes do NOT precede the
    # second piece's bytes in the file (reversed storage order)
    flat = build_doc(paras, fast_save=False)
    assert parse_doc(flat)["text"] == "\n".join(paras)
    assert parse_doc(flat)["n_pieces"] == 1


def test_doc_decoy_table_never_read():
    # the 0Table is 0xEE garbage; only fWhichTblStm=1 readers survive
    doc = build_doc(["only para"])
    got = parse_cfb(doc)
    assert got["streams"]["0Table"] == b"\xEE" * 128
    assert parse_doc(doc)["text"] == "only para"


def test_doc_mixed_8bit_16bit_pieces():
    # force both encodings: ascii pieces store 8-bit, the ünicode
    # piece stores UTF-16LE (fc bit 30 flips per piece)
    paras = ["plain " * 10, "ünïcödé " * 8, "tail " * 10]
    r = parse_doc(build_doc(paras))
    assert r["text"] == "\n".join(paras)


def test_cfb_tears():
    with pytest.raises(ValueError):
        parse_cfb(b"PK\x03\x04 not cfb" + b"\x00" * 600)
    data = bytearray(build_cfb({"s": b"x" * 600}))
    struct.pack_into("<H", data, 28, 0xFEFF)  # wrong byte order
    with pytest.raises(ValueError):
        parse_cfb(bytes(data))
    data2 = bytearray(build_cfb({"s": b"x" * 600}))
    struct.pack_into("<I", data2, 48, 9999)  # dir start out of range
    with pytest.raises(ValueError):
        parse_cfb(bytes(data2))


def test_tear_fuzz_valueerror_only():
    base = build_doc(["para one ä", "para two €", "para three"])
    rng = random.Random(41)
    for case in range(300):
        mut = bytearray(base)
        if case % 3 == 0:
            mut = mut[: rng.randrange(0, len(mut))]
        elif case % 3 == 1:
            for _ in range(rng.randrange(1, 8)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        else:
            off = rng.randrange(0, 512)
            struct.pack_into("<I", mut, off, rng.randrange(2**32))
        try:
            parse_doc(bytes(mut))
        except ValueError:
            pass


def test_summary_information_roundtrip():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
        build_summary_information,
        parse_summary_information,
    )

    b = build_summary_information("Tïtle €", "Authör", codepage=1252)
    got = parse_summary_information(b)
    assert got == {"title": "Tïtle €", "author": "Authör",
                   "codepage": 1252}
    b2 = build_summary_information("Привет", "кто", codepage=1251)
    assert parse_summary_information(b2)["title"] == "Привет"
    with pytest.raises(ValueError):
        parse_summary_information(b"\xff\xfe" + b"\x00" * 10)


def test_doc_title_through_property_set():
    doc = build_doc(["body para"], title="Söme title")
    assert parse_doc(doc)["title"] == "Söme title"


def test_office_front_door_dispatches_doc():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ooxml import (
        office_to_text,
        sniff_office_format,
    )

    doc = build_doc(["legacy pära", "twö"], title="T")
    assert sniff_office_format(doc) == "doc"
    got = office_to_text(doc)
    assert got == {"format": "doc", "text": "legacy pära\ntwö",
                   "title": "T", "n_blocks": 2}
    # a CFB that is NOT word (e.g. an .msi shape) sniffs None and the
    # front door quarantines it
    msi = build_cfb({"SomeStream": b"x" * 100})
    assert sniff_office_format(msi) is None
    with pytest.raises(ValueError):
        office_to_text(msi)
