"""Avro object-container reader/writer pinned against the CANONICAL
Java Avro implementation (avro-1.12.1 on Spark's classpath, driven
through py4j): Java writes files our reader must decode
value-for-value, and our writer's bytes must read back identically
through Java's DataFileReader."""

from __future__ import annotations

import json
import os
import random
import tempfile

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.avro_file import (
    build_avro,
    parse_avro,
    sniff_avro,
)

SCHEMA = {
    "type": "record", "name": "R", "namespace": "x.y",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "n", "type": "int"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "f", "type": "float"},
        {"name": "bo", "type": "boolean"},
        {"name": "b", "type": "bytes"},
        {"name": "u", "type": ["null", "double"]},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "e", "type": {"type": "enum", "name": "E",
                               "symbols": ["A", "B", "C"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "F4",
                                "size": 4}},
    ],
}


def _records(n=25):
    rng = random.Random(7)
    out = []
    for k in range(n):
        out.append({
            "i": rng.randrange(-2**62, 2**62),
            "n": rng.randrange(-2**31, 2**31),
            "s": f"röw {k} €" * (k % 4),
            "d": rng.random() * 1e6,
            "f": float(k) / 4,
            "bo": k % 2 == 0,
            "b": bytes([k % 256]) * (k % 9),
            "u": None if k % 3 == 0 else rng.random(),
            "arr": [rng.randrange(-1000, 1000)
                    for _ in range(k % 6)],
            "m": {f"k{j}": f"v{j}-{k}" for j in range(k % 4)},
            "e": "ABC"[k % 3],
            "fx": bytes([k % 256] * 4),
        })
    return out


def _j_write(spark, schema, records, codec, path):
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(
        json.dumps(schema))
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(sch)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory
                     .deflateCodec(6))
    dfw.create(sch, jvm.java.io.File(path))
    for rec in records:
        jr = jvm.org.apache.avro.generic.GenericData.Record(sch)
        for f in schema["fields"]:
            name, ftype = f["name"], f["type"]
            v = rec[name]
            jr.put(name, _j_value(jvm, sch.getField(name).schema(),
                                  ftype, v))
        dfw.append(jr)
    dfw.close()


def _j_value(jvm, jschema, ftype, v):
    if v is None:
        return None
    if isinstance(ftype, dict) and ftype.get("type") == "enum":
        return jvm.org.apache.avro.generic.GenericData.EnumSymbol(
            _union_branch(jschema, "ENUM"), v)
    if isinstance(ftype, dict) and ftype.get("type") == "fixed":
        return jvm.org.apache.avro.generic.GenericData.Fixed(
            _union_branch(jschema, "FIXED"), bytearray(v))
    if isinstance(v, bytes):
        return jvm.java.nio.ByteBuffer.wrap(bytearray(v))
    if isinstance(v, list):
        arr = jvm.java.util.ArrayList()
        for x in v:
            arr.add(x)
        return arr
    if isinstance(v, dict):
        m = jvm.java.util.HashMap()
        for k2, v2 in v.items():
            m.put(k2, v2)
        return m
    return v


def _union_branch(jschema, kind):
    if jschema.getType().getName() == "union":
        for b in jschema.getTypes():
            if b.getType().getName().upper() == kind:
                return b
    return jschema


def _j_read(spark, path):
    jvm = spark._jvm
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), reader)
    out = []
    while dfr.hasNext():
        out.append(json.loads(str(dfr.next())))
    dfr.close()
    return out


def _jsonable(rec):
    out = {}
    for k, v in rec.items():
        if isinstance(v, bytes):
            out[k] = v.decode("latin-1")
        elif isinstance(v, float):
            out[k] = v
        else:
            out[k] = v
    return out


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_java_written_file_decodes(spark, codec):
    records = _records()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "j.avro")
        _j_write(spark, SCHEMA, records, codec, path)
        data = open(path, "rb").read()
    assert sniff_avro(data)
    got = parse_avro(data)
    assert got["codec"] == codec
    assert len(got["records"]) == len(records)
    for g, w in zip(got["records"], records):
        for f in SCHEMA["fields"]:
            name = f["name"]
            if name == "f":  # float32: compare at 32-bit precision
                import struct as _s
                assert _s.pack("<f", g[name]) == _s.pack(
                    "<f", w[name])
            else:
                assert g[name] == w[name], name


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_our_file_reads_back_in_java(spark, codec):
    records = _records(12)
    data = build_avro(SCHEMA, records, codec=codec,
                      block_records=5)  # multi-block
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ours.avro")
        open(path, "wb").write(data)
        jrecs = _j_read(spark, path)
    assert len(jrecs) == len(records)
    for j, w in zip(jrecs, records):
        assert j["i"] == w["i"] and j["s"] == w["s"]
        assert j["e"] == w["e"] and j["arr"] == w["arr"]
        assert j["m"] == w["m"] and j["u"] == w["u"]
        assert j["b"] == w["b"].decode("latin-1")


def test_negative_count_blocked_arrays_decode():
    # the skip-enabling encoding: count=-2 then a byte-size long
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.avro_file import (
        _zigzag,
    )

    schema = {"type": "record", "name": "B", "fields": [
        {"name": "a", "type": {"type": "array", "items": "int"}}]}
    body = _zigzag(-2) + _zigzag(2) + _zigzag(7) + _zigzag(9) + \
        _zigzag(0)
    sync = b"\x11" * 16
    meta_schema = json.dumps(schema).encode()
    out = b"Obj\x01" + _zigzag(1)
    out += _zigzag(11) + b"avro.schema" + \
        _zigzag(len(meta_schema)) + meta_schema
    out += _zigzag(0) + sync
    out += _zigzag(1) + _zigzag(len(body)) + body + sync
    got = parse_avro(out)
    assert got["records"] == [{"a": [7, 9]}]


def test_recursive_named_type():
    schema = {"type": "record", "name": "Node", "fields": [
        {"name": "v", "type": "int"},
        {"name": "next", "type": ["null", "Node"]}]}
    rec = {"v": 1, "next": {"v": 2, "next": {"v": 3, "next": None}}}
    data = build_avro(schema, [rec])
    assert parse_avro(data)["records"] == [rec]


def test_sync_mismatch_and_codec_tears():
    data = bytearray(build_avro(SCHEMA, _records(3)))
    data[-1] ^= 0xFF  # corrupt the final sync marker
    with pytest.raises(ValueError):
        parse_avro(bytes(data))
    with pytest.raises(ValueError):
        build_avro(SCHEMA, [], codec="snappy")


def test_tear_fuzz_valueerror_only():
    base = build_avro(SCHEMA, _records(6), codec="deflate")
    rng = random.Random(71)
    for case in range(300):
        mut = bytearray(base)
        if case % 2:
            mut = mut[: rng.randrange(0, len(mut))]
        else:
            for _ in range(rng.randrange(1, 8)):
                mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            parse_avro(bytes(mut))
        except ValueError:
            pass
