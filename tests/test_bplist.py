"""bplist00 reader: artifacts are written by the host plistlib
(CPython's own binary-plist writer) and compared object-for-object
against plistlib.loads; markers plistlib never writes (sets, 16-byte
ints) are hand-built to their CFBinaryPList spec layout."""

from __future__ import annotations

import datetime
import plistlib
import random
import struct

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.bplist import (
    parse_bplist,
    sniff_bplist,
)


def _pin(obj):
    data = plistlib.dumps(obj, fmt=plistlib.FMT_BINARY)
    got = parse_bplist(data)
    assert got == plistlib.loads(data)
    assert got == obj
    return got


def test_scalar_matrix_vs_plistlib():
    _pin({"i0": 0, "i1": 1, "neg": -5, "byte": 255, "short": 65535,
          "word": 2**31, "big": 2**40, "huge": -2**62,
          "t": True, "f": False, "r": 3.25, "rn": -0.0,
          "s": "plain ascii", "u": "ünicode \U0001f600 παρά",
          "d": b"\x00\xffdata", "e": "", "eb": b""})


def test_collections_nested_and_uid():
    _pin({"arr": [1, [2, [3, [4]]], "x"],
          "dict": {"k": {"k2": [True, None]}},
          "uid": plistlib.UID(12),
          "uidbig": plistlib.UID(2**31)})


def test_dates_roundtrip():
    _pin({"epoch": datetime.datetime(2001, 1, 1),
          "past": datetime.datetime(1969, 7, 20, 20, 17, 40),
          "future": datetime.datetime(2262, 1, 1, 12, 0, 0)})


def test_extended_lengths():
    _pin({"longarr": list(range(300)),
          "longstr": "y" * 70000,
          "longdata": b"z" * 70000,
          "bigdict": {f"k{i}": i for i in range(40)}})


def _build(objs, off_fmt=">H", off_size=2, ref_size=1, top=0):
    out = b"bplist00"
    offsets = []
    for ob in objs:
        offsets.append(len(out))
        out += ob
    table_off = len(out)
    for o in offsets:
        out += struct.pack(off_fmt, o)
    out += struct.pack(">6xBBQQQ", off_size, ref_size, len(objs),
                       top, table_off)
    return out


def test_handbuilt_set_marker():
    # plistlib refuses to WRITE sets; CFBinaryPList defines 0xC
    blob = _build([b"\xc2\x01\x02", b"\x10\x05", b"\x10\x09"])
    assert parse_bplist(blob) == {5, 9}


def test_handbuilt_int128():
    big = 2**100 + 3
    blob = _build([b"\x14" + big.to_bytes(16, "big")])
    assert parse_bplist(blob) == big


def test_handbuilt_8byte_int_is_signed():
    raw = (-7) % 2**64
    blob = _build([b"\x13" + raw.to_bytes(8, "big")])
    assert parse_bplist(blob) == -7


def test_reference_cycle_raises_not_recurses():
    # array whose single element is ITSELF — plistlib.loads would
    # recurse; our reader raises the quarantine ValueError
    blob = _build([b"\xa1\x00"])
    with pytest.raises(ValueError):
        parse_bplist(blob)


def test_dag_sharing_is_fine():
    # the same object referenced twice (no cycle) must decode
    blob = _build([b"\xa2\x01\x01", b"\x10\x2a"])
    assert parse_bplist(blob) == [42, 42]


def test_sniff_and_magic():
    assert sniff_bplist(plistlib.dumps({}, fmt=plistlib.FMT_BINARY))
    assert not sniff_bplist(b"<?xml version")
    with pytest.raises(ValueError):
        parse_bplist(b"<?xml version='1.0'?><plist/>" + b"\x00" * 40)


def test_tear_fuzz_valueerror_only():
    base = plistlib.dumps(
        {"k": [1, "two", b"three", {"n": [True, 2.5]}],
         "s": "x" * 100}, fmt=plistlib.FMT_BINARY)
    rng = random.Random(23)
    for case in range(300):
        mut = bytearray(base)
        if case % 3 == 0:
            mut = mut[: rng.randrange(0, len(mut))]
        elif case % 3 == 1:
            for _ in range(rng.randrange(1, 6)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        else:
            # stomp the trailer specifically
            off = len(mut) - 32 + rng.randrange(32)
            mut[off] = rng.randrange(256)
        try:
            parse_bplist(bytes(mut))
        except ValueError:
            pass
