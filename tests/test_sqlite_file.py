"""SQLite database-file reader: every artifact in this battery is
written by the HOST SQLite engine itself (stdlib sqlite3 -> SQLite
3.40.x via Connection.serialize) and our from-spec decode is compared
row-for-row against the engine's own SELECT output — the real-library
pin standing of the r14 libzstd/liblzma stream corpora."""

from __future__ import annotations

import random
import sqlite3
import struct

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sqlite_file import (
    parse_sqlite_header,
    resolve_rowid_alias,
    rowid_alias_column,
    sqlite_dump,
    sqlite_index_entries,
    sqlite_schema,
    sqlite_table_rows,
)


def _db(*pragmas):
    c = sqlite3.connect(":memory:")
    for p in pragmas:
        c.execute(p)
    return c


def _engine_rows(conn, sql):
    return [list(r) for r in conn.execute(sql)]


def test_header_facts_and_magic():
    c = _db()
    c.execute("create table t(a)")
    c.execute("pragma user_version=77")
    c.execute("pragma application_id=12345")
    c.commit()
    h = parse_sqlite_header(c.serialize())
    assert h["page_size"] == 4096 and h["encoding"] == "utf-8"
    assert h["user_version"] == 77 and h["application_id"] == 12345
    assert h["wal"] is False and h["n_pages"] >= 2
    with pytest.raises(ValueError):
        parse_sqlite_header(b"PostgreSQL ha" + b"\x00" * 600)


@pytest.mark.parametrize("ps", [512, 1024, 8192, 32768, 65536])
def test_all_page_sizes_roundtrip(ps):
    # page_size 65536 exercises the 1-means-65536 header encoding
    c = _db(f"pragma page_size={ps}")
    c.execute("create table t(i integer, s text)")
    for i in range(300):
        c.execute("insert into t values (?,?)", (i, f"row-{i}" * (i % 9)))
    c.commit()
    data = c.serialize()
    h = parse_sqlite_header(data)
    assert h["page_size"] == ps
    assert sqlite_dump(data)["t"] == _engine_rows(
        c, "select * from t order by rowid")


def test_every_serial_type_and_int_width():
    # ints chosen to force serial types 1,2,3,4,5,6 plus the 8/9
    # zero/one shortcuts; float; blob; text; NULL
    vals = [0, 1, -1, 127, -128, 255, 32767, -32768, 8388607,
            2**31 - 1, -2**31, 2**40, -2**40, 2**63 - 1, -2**63]
    c = _db()
    c.execute("create table t(v)")
    for v in vals:
        c.execute("insert into t values (?)", (v,))
    c.execute("insert into t values (3.14159)")
    c.execute("insert into t values (-0.0)")
    c.execute("insert into t values (1e308)")
    c.execute("insert into t values (x'deadbeef')")
    c.execute("insert into t values ('héllo €')")
    c.execute("insert into t values (NULL)")
    c.commit()
    data = c.serialize()
    assert sqlite_dump(data)["t"] == _engine_rows(
        c, "select * from t order by rowid")


def test_nan_real_stored_as_null():
    # documented engine behavior: NaN inserts become NULL
    c = _db()
    c.execute("create table t(x real)")
    c.execute("insert into t values (?)", (float("nan"),))
    c.commit()
    assert sqlite_dump(c.serialize())["t"] == [[None]]


def test_overflow_chains_multilevel_freelist_and_ipk():
    # page_size 512: multi-level table interior pages, long overflow
    # chains (payloads 50x the page), freelist from bulk deletes, and
    # the INTEGER PRIMARY KEY rowid-alias resolution
    c = _db("pragma page_size=512")
    c.execute("create table big(i integer primary key, p text, b blob)")
    rng = random.Random(11)
    for i in range(1500):
        c.execute("insert into big values (?,?,?)",
                  (i, chr(97 + i % 26) * rng.randrange(0, 4000),
                   bytes([i % 251]) * rng.randrange(0, 600)))
    c.execute("delete from big where i % 5 = 2")
    c.commit()
    data = c.serialize()
    assert parse_sqlite_header(data)["freelist_pages"] > 0
    assert sqlite_dump(data)["big"] == _engine_rows(
        c, "select * from big order by rowid")
    # the stored record really does hold NULL in the ipk column
    raw = sqlite_table_rows(data, "big")
    assert all(vals[0] is None for _, vals in raw)


def test_index_btree_inorder_includes_interior_payloads():
    # enough entries at page_size 512 to force interior index pages —
    # whose cells CARRY keys; a leaf-only walk would drop them
    c = _db("pragma page_size=512")
    c.execute("create table t(i integer primary key, s text)")
    for i in range(2000):
        c.execute("insert into t values (?,?)", (i, f"k{i % 997:04d}"))
    c.execute("create index idx on t(s)")
    c.commit()
    data = c.serialize()
    got = sqlite_index_entries(data, "idx")
    assert got == _engine_rows(
        c, "select s, rowid from t order by s, rowid")
    assert len(got) == 2000


def test_without_rowid_table_reads_in_key_order():
    c = _db("pragma page_size=512")
    c.execute("create table w(k text primary key, v integer, u blob)"
              " without rowid")
    for i in range(800):
        c.execute("insert into w values (?,?,?)",
                  (f"key-{(i * 37) % 800:04d}", i, b"z" * (i % 90)))
    c.commit()
    data = c.serialize()
    assert sqlite_dump(data)["w"] == _engine_rows(
        c, "select * from w order by k")


@pytest.mark.parametrize("enc", ["UTF-16le", "UTF-16be"])
def test_utf16_encodings(enc):
    c = _db(f"pragma encoding='{enc}'")
    c.execute("create table t(s text)")
    for i in range(60):
        c.execute("insert into t values (?)",
                  (f"row {i} € ß \U0001f600",))
    c.commit()
    data = c.serialize()
    assert parse_sqlite_header(data)["encoding"] == enc.lower().replace(
        "utf-16", "utf-16-")
    assert sqlite_dump(data)["t"] == _engine_rows(
        c, "select * from t order by rowid")


def test_alter_table_short_records_surface_raw():
    # rows written before ALTER TABLE ADD COLUMN keep short records —
    # the reader surfaces storage truth; the engine pads with defaults
    c = _db()
    c.execute("create table a(x)")
    c.execute("insert into a values (5)")
    c.execute("alter table a add column y default 9")
    c.execute("insert into a values (6, 7)")
    c.commit()
    raw = sqlite_table_rows(c.serialize(), "a")
    assert raw == [(1, [5]), (2, [6, 7])]


def test_rowid_alias_detection_conservative():
    assert rowid_alias_column(
        "CREATE TABLE t(id INTEGER PRIMARY KEY, v TEXT)") == 0
    assert rowid_alias_column(
        "CREATE TABLE t(a TEXT, id integer primary key)") == 1
    # table-level PK, DESC, and non-INTEGER types never alias
    assert rowid_alias_column(
        "CREATE TABLE t(a INTEGER, PRIMARY KEY(a, b))") is None
    assert rowid_alias_column(
        "CREATE TABLE t(id INTEGER PRIMARY KEY DESC)") is None
    assert rowid_alias_column(
        "CREATE TABLE t(id INT PRIMARY KEY)") is None
    # commas inside a CHECK(...) must not split the column list
    assert rowid_alias_column(
        "CREATE TABLE t(a TEXT CHECK(a IN ('x','y')), id INTEGER"
        " PRIMARY KEY)") == 1


def test_schema_rows_and_views_skipped():
    c = _db()
    c.execute("create table t(a)")
    c.execute("create view v as select a from t")
    c.execute("create index ti on t(a)")
    c.commit()
    data = c.serialize()
    kinds = {(r["type"], r["name"]) for r in sqlite_schema(data)}
    assert ("table", "t") in kinds and ("view", "v") in kinds
    assert ("index", "ti") in kinds
    assert set(sqlite_dump(data)) == {"t"}  # views have no storage


def test_many_tables_multi_level_sqlite_master():
    # enough schema rows that sqlite_master itself grows interior pages
    c = _db("pragma page_size=512")
    for i in range(120):
        c.execute(f"create table t{i:03d}(a integer, b text)")
        c.execute(f"insert into t{i:03d} values ({i}, 'x{i}')")
    c.commit()
    data = c.serialize()
    d = sqlite_dump(data)
    assert len(d) == 120
    for i in (0, 57, 119):
        assert d[f"t{i:03d}"] == [[i, f"x{i}"]]


def test_unknown_table_and_bad_rootpage():
    c = _db()
    c.execute("create table t(a)")
    c.commit()
    data = c.serialize()
    with pytest.raises(ValueError):
        sqlite_table_rows(data, "nope")
    with pytest.raises(ValueError):
        sqlite_index_entries(data, "t")


def test_tear_fuzz_valueerror_only():
    # 300 mutations: truncations, byte flips, header stomps — the
    # contract is ValueError or a successful parse, never any other
    # exception (the per-row quarantine contract)
    c = _db("pragma page_size=512")
    c.execute("create table t(i integer primary key, s text)")
    for i in range(400):
        c.execute("insert into t values (?,?)", (i, "pad" * (i % 40)))
    c.commit()
    data = bytearray(c.serialize())
    rng = random.Random(99)
    for case in range(300):
        mut = bytearray(data)
        if case % 3 == 0:
            mut = mut[: rng.randrange(0, len(mut))]
        elif case % 3 == 1:
            for _ in range(rng.randrange(1, 6)):
                mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        else:
            off = rng.randrange(0, 101)
            struct.pack_into(">I", mut, off, rng.randrange(2**32))
        try:
            sqlite_dump(bytes(mut))
        except ValueError:
            pass


def test_wal_flag_surfaces():
    import os
    import tempfile
    fd, path = tempfile.mkstemp(suffix=".db")
    os.close(fd)
    try:
        c = sqlite3.connect(path)
        c.execute("pragma journal_mode=WAL")
        c.execute("create table t(a)")
        c.execute("insert into t values (42)")
        c.commit()
        c.execute("pragma wal_checkpoint(TRUNCATE)")
        c.close()
        data = open(path, "rb").read()
        h = parse_sqlite_header(data)
        assert h["wal"] is True
        # fully checkpointed: the main file carries the committed image
        assert sqlite_dump(data)["t"] == [[42]]
    finally:
        os.unlink(path)
        for side in (path + "-wal", path + "-shm"):
            if os.path.exists(side):
                os.unlink(side)


def test_resolve_rowid_alias_passthrough():
    rows = [(7, [None, "a"]), (9, [5, "b"])]
    out = resolve_rowid_alias(
        "CREATE TABLE t(id INTEGER PRIMARY KEY, s TEXT)", rows)
    # stored NULL becomes the rowid; an explicit value passes through
    assert out == [[7, "a"], [5, "b"]]
    out2 = resolve_rowid_alias("CREATE TABLE t(a, b)", rows)
    assert out2 == [[None, "a"], [5, "b"]]
