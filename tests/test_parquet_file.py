"""From-spec parquet reader pinned on THREE independent host
implementations: pyarrow (parquet-cpp) writes the artifacts, DuckDB's
C++ reader cross-checks values, and the driver's own test tables
(snappy + RLE_DICTIONARY) must decode row-for-row."""

from __future__ import annotations

import io
import math
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.parquet_file import (
    read_parquet,
)


def _table():
    rng = random.Random(13)
    n = 500
    return pa.table({
        "i32": pa.array([rng.randrange(-2**31, 2**31) for _ in
                         range(n)], pa.int32()),
        "i64": pa.array([rng.randrange(-2**62, 2**62) for _ in
                         range(n)], pa.int64()),
        "f64": pa.array([rng.random() * 1e9 for _ in range(n)],
                        pa.float64()),
        "f32": pa.array([float(k) / 8 for k in range(n)],
                        pa.float32()),
        "b": pa.array([k % 3 == 0 for k in range(n)], pa.bool_()),
        "s": pa.array([f"röw {k} €" * (k % 5) for k in range(n)]),
        "bin": pa.array([bytes([k % 256]) * (k % 7)
                         for k in range(n)], pa.binary()),
        "nul": pa.array([None if k % 4 == 0 else k
                         for k in range(n)], pa.int64()),
        "nulstr": pa.array([None if k % 5 == 0 else f"s{k}"
                            for k in range(n)]),
    })


def _write(table, **kw) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


def _assert_equal(data: bytes, table):
    got = read_parquet(data)
    assert got["num_rows"] == table.num_rows
    for name in table.column_names:
        ours = got["columns"][name]
        theirs = table.column(name).to_pylist()
        if name in ("f32",):
            assert all(
                (a is None and b is None)
                or math.isclose(a, b, rel_tol=1e-6)
                for a, b in zip(ours, theirs)), name
        else:
            assert ours == theirs, name
    return got


@pytest.mark.parametrize("codec", ["none", "snappy", "gzip", "zstd"])
def test_pyarrow_matrix_codecs(codec):
    _assert_equal(_write(_table(), compression=codec), _table())


@pytest.mark.parametrize("use_dict", [True, False])
def test_pyarrow_matrix_dictionary(use_dict):
    _assert_equal(
        _write(_table(), compression="snappy",
               use_dictionary=use_dict), _table())


@pytest.mark.parametrize("dpv", ["1.0", "2.4", "2.6"])
def test_pyarrow_matrix_page_versions(dpv):
    # 2.4/2.6 write DataPageV2 when asked
    _assert_equal(
        _write(_table(), compression="gzip", version=dpv,
               data_page_version="2.0" if dpv != "1.0" else "1.0"),
        _table())


def test_multiple_row_groups_and_column_pruning():
    data = _write(_table(), compression="snappy", row_group_size=64)
    got = read_parquet(data, columns=["i64", "s"])
    t = _table()
    assert set(got["columns"]) == {"i64", "s"}
    assert got["columns"]["i64"] == t.column("i64").to_pylist()
    assert got["columns"]["s"] == t.column("s").to_pylist()


def test_real_driver_table_row_for_row():
    # the driver's own documents.parquet: parquet-cpp 16.1.0,
    # snappy + RLE_DICTIONARY — the table the whole pipeline reads
    data = open("/root/testdata/sf0.01/documents.parquet",
                "rb").read()
    got = read_parquet(data)
    t = pq.read_table(io.BytesIO(data))
    assert got["num_rows"] == t.num_rows
    for name in t.column_names:
        assert got["columns"][name] == t.column(name).to_pylist(), \
            name


def test_duckdb_cross_check():
    # third engine: DuckDB's own C++ parquet reader over the same
    # bytes (via a temp file) agrees with our decode
    import os
    import tempfile

    data = _write(_table(), compression="zstd")
    got = read_parquet(data)
    fd, path = tempfile.mkstemp(suffix=".parquet")
    os.write(fd, data)
    os.close(fd)
    try:
        con = duckdb.connect()
        rows = con.execute(
            f"select i64, s, nul from read_parquet('{path}')"
        ).fetchall()
    finally:
        os.unlink(path)
    assert [r[0] for r in rows] == got["columns"]["i64"]
    assert [r[1] for r in rows] == got["columns"]["s"]
    assert [r[2] for r in rows] == got["columns"]["nul"]


def test_all_nulls_and_empty_strings():
    t = pa.table({
        "allnull": pa.array([None] * 20, pa.int64()),
        "empty": pa.array([""] * 20),
        "eb": pa.array([b""] * 20, pa.binary()),
    })
    _assert_equal(_write(t, compression="snappy"), t)


def test_fixed_len_byte_array():
    t = pa.table({
        "fx": pa.array([bytes([k] * 6) for k in range(40)],
                       pa.binary(6)),
    })
    got = _assert_equal(_write(t, compression="none",
                               use_dictionary=False), t)
    assert got["schema"][0]["physical"] == "FIXED_LEN_BYTE_ARRAY"


def test_tears_valueerror_only():
    with pytest.raises(ValueError):
        read_parquet(b"PAR2not parquet" + b"\x00" * 40 + b"PAR2")
    base = _write(_table(), compression="snappy")
    rng = random.Random(83)
    for case in range(200):
        mut = bytearray(base)
        if case % 2:
            cut = rng.randrange(0, len(mut))
            mut = mut[:cut] + base[-4:]  # keep tail magic sometimes
        else:
            for _ in range(rng.randrange(1, 8)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            read_parquet(bytes(mut))
        except ValueError:
            pass


@pytest.mark.parametrize("senc", ["DELTA_BYTE_ARRAY",
                                  "DELTA_LENGTH_BYTE_ARRAY"])
def test_delta_encodings_forced(senc):
    t = pa.table({
        "i": pa.array(list(range(1000)) + [-(2**40), 2**40],
                      pa.int64()),
        "s": pa.array([f"prefix-common-{k:05d}" for k in
                       range(1002)]),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="snappy", version="2.6",
                   data_page_version="2.0", use_dictionary=False,
                   column_encoding={"i": "DELTA_BINARY_PACKED",
                                    "s": senc})
    got = read_parquet(buf.getvalue())
    assert got["columns"]["i"] == t.column("i").to_pylist()
    assert got["columns"]["s"] == t.column("s").to_pylist()


def test_list_columns_nested_matrix():
    t = pa.table({
        "li": pa.array([[1, 2, 3], [], None, [4], [None, 5], None,
                        [6, None, 7]],
                       pa.list_(pa.int64())),
        "ls": pa.array([["a", "bé"], None, [], ["c", None], ["d"],
                        [None], ["e", "f", "g"]],
                       pa.list_(pa.string())),
        "flat": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    for kw in (
        dict(compression="snappy"),
        dict(compression="zstd", use_dictionary=False),
        dict(compression="gzip", version="2.6",
             data_page_version="2.0"),
        dict(compression="none", row_group_size=3),
    ):
        got = read_parquet(_write(t, **kw))
        for name in t.column_names:
            assert got["columns"][name] == \
                t.column(name).to_pylist(), (name, kw)


def test_every_driver_table_row_for_row():
    # the whole sf0.01 lake: all 11 driver-written tables decode
    # identically to pyarrow — lineitem is ~60k rows with dates
    import glob
    import struct as _s

    paths = sorted(glob.glob("/root/testdata/sf0.01/*.parquet"))
    assert len(paths) >= 10
    checked = 0
    for path in paths:
        data = open(path, "rb").read()
        try:
            got = read_parquet(data)
        except ValueError as e:
            # named boundaries (INT96 timestamps etc.) must raise
            # visibly, never corrupt
            assert "boundary" in str(e) or "unsupported" in str(e), \
                (path, e)
            continue
        t = pq.read_table(io.BytesIO(data))
        assert got["num_rows"] == t.num_rows, path
        for name in t.column_names:
            ours = got["columns"][name]
            field = t.schema.field(name)
            theirs = t.column(name).to_pylist()
            if pa.types.is_date32(field.type):
                # our reader surfaces raw INT32 days-since-epoch
                import datetime
                epoch = datetime.date(1970, 1, 1)
                theirs = [None if v is None else (v - epoch).days
                          for v in theirs]
            elif pa.types.is_timestamp(field.type):
                # raw INT64 epoch-micros (annotation in the schema)
                import datetime
                epoch = datetime.datetime(1970, 1, 1)
                theirs = [None if v is None else
                          int((v - epoch).total_seconds() * 10**6
                              + 0.5) if not isinstance(v, int)
                          else v for v in theirs]
            if pa.types.is_float32(field.type):
                same = all(
                    (a is None and b is None)
                    or _s.pack("<f", a) == _s.pack("<f", b)
                    for a, b in zip(ours, theirs))
            elif (pa.types.is_list(field.type)
                  and pa.types.is_float32(field.type.value_type)):
                same = all(
                    (a is None and b is None)
                    or (a is not None and len(a) == len(b) and all(
                        _s.pack("<f", x) == _s.pack("<f", y)
                        for x, y in zip(a, b)))
                    for a, b in zip(ours, theirs))
            else:
                same = ours == theirs
            assert same, (path, name)
        checked += 1
    assert checked >= 10
