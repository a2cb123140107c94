"""Avro object-container reader/writer — THE row-oriented data-lake
interchange format: Kafka archive dumps, Sqoop exports, and event
pipelines hand off .avro files, and a 100 TB lake migration ingests
them next to parquet.

Implemented from the PUBLIC Apache Avro 1.12 specification: the
object container format (``Obj\\x01`` magic, the file-metadata map
carrying ``avro.schema`` JSON and ``avro.codec``, the 16-byte sync
marker, then data blocks of <record count, byte size, payload, sync>
with the sync VERIFIED per block), the binary encoding (zigzag
base-128 varints for int/long — also used for all lengths, indexes
and block counts — little-endian IEEE float/double, length-prefixed
bytes/utf-8 strings, records as field concatenation, enums as index,
unions as index-then-value, fixed as raw bytes, and arrays/maps as
BLOCK SEQUENCES whose negative count means "abs(count) items preceded
by a byte-size long" — the skip-enabling encoding real writers emit
for large collections), and the deflate codec (RAW deflate, RFC 1951
— no zlib wrapper; via the stream-codec registry's deflate entry
semantics). Snappy/zstd codecs are NAMED boundaries (zstd decode
exists in operators/zstd.py; bind through the codec registry when a
corpus needs it). Named-type references (a record/enum/fixed re-used
by full name, including RECURSIVE records) resolve through a name
registry; schema aliases/resolution-against-reader-schema are named
boundaries.

Ground truth: the CANONICAL Java Avro implementation (avro-1.12.1
on Spark's own classpath) — tests drive it through py4j:
GenericDatumWriter/DataFileWriter write real files our reader must
decode value-for-value, and our writer's output must read back
identically through DataFileReader (tests/test_avro_file.py).

Reference parity: the reference lake's schema-on-read ingest
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44). Tear
contract: ValueError — and only ValueError."""

from __future__ import annotations

import json
import os
import struct
import zlib

MAGIC_AVRO = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


# --- binary decode ---------------------------------------------------------


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.i = 0

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            if self.i >= len(self.d):
                raise ValueError("avro: varint overruns")
            b = self.d[self.i]
            self.i += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def take(self, n: int) -> bytes:
        if n < 0 or self.i + n > len(self.d):
            raise ValueError("avro: body overruns")
        out = self.d[self.i : self.i + n]
        self.i += n
        return out

    def at_end(self) -> bool:
        return self.i >= len(self.d)


def _full_name(schema: dict, enclosing: str | None) -> str:
    name = schema["name"]
    if "." in name:
        return name
    ns = schema.get("namespace") or enclosing
    return f"{ns}.{name}" if ns else name


def _decode(rd: _Reader, schema, names: dict, enclosing=None):
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            t = schema
        else:
            ref = schema if "." in schema or schema in names else (
                f"{enclosing}.{schema}" if enclosing else schema)
            if ref not in names:
                raise ValueError("avro: unknown named type %r"
                                 % schema)
            return _decode(rd, names[ref], names, enclosing)
    elif isinstance(schema, list):  # union
        idx = rd.long()
        if not 0 <= idx < len(schema):
            raise ValueError("avro: union index out of range")
        return _decode(rd, schema[idx], names, enclosing)
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        b = rd.take(1)[0]
        if b > 1:
            raise ValueError("avro: bad boolean byte")
        return bool(b)
    if t in ("int", "long"):
        return rd.long()
    if t == "float":
        return struct.unpack("<f", rd.take(4))[0]
    if t == "double":
        return struct.unpack("<d", rd.take(8))[0]
    if t == "bytes":
        return rd.take(rd.long())
    if t == "string":
        raw = rd.take(rd.long())
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError("avro: invalid utf-8 string") from e
    if t == "record":
        fn = _full_name(schema, enclosing)
        names.setdefault(fn, schema)
        ns = fn.rsplit(".", 1)[0] if "." in fn else None
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(rd, f["type"], names, ns)
        return out
    if t == "enum":
        names.setdefault(_full_name(schema, enclosing), schema)
        idx = rd.long()
        syms = schema["symbols"]
        if not 0 <= idx < len(syms):
            raise ValueError("avro: enum index out of range")
        return syms[idx]
    if t == "fixed":
        names.setdefault(_full_name(schema, enclosing), schema)
        return rd.take(schema["size"])
    if t == "array":
        out = []
        while True:
            n = rd.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                rd.long()  # byte size: present for skipping
            for _ in range(n):
                out.append(_decode(rd, schema["items"], names,
                                   enclosing))
    if t == "map":
        out = {}
        while True:
            n = rd.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                rd.long()
            for _ in range(n):
                raw = rd.take(rd.long())
                k = raw.decode("utf-8")
                out[k] = _decode(rd, schema["values"], names,
                                 enclosing)
    if isinstance(t, (dict, list)):  # nested type object
        return _decode(rd, t, names, enclosing)
    raise ValueError("avro: unsupported schema type %r" % (t,))


def _register_names(schema, names: dict, enclosing=None):
    if isinstance(schema, list):
        for s in schema:
            _register_names(s, names, enclosing)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        fn = _full_name(schema, enclosing)
        names[fn] = schema
        ns = fn.rsplit(".", 1)[0] if "." in fn else enclosing
        if t == "record":
            for f in schema["fields"]:
                _register_names(f["type"], names, ns)
    elif t == "array":
        _register_names(schema.get("items"), names, enclosing)
    elif t == "map":
        _register_names(schema.get("values"), names, enclosing)
    elif isinstance(t, (dict, list)):
        _register_names(t, names, enclosing)


def parse_avro(data: bytes) -> dict:
    """Decode an Avro object container: {schema, codec, records}."""
    if data[:4] != MAGIC_AVRO:
        raise ValueError("avro: bad magic")
    try:
        rd = _Reader(data)
        rd.take(4)
        meta: dict[str, bytes] = {}
        while True:
            n = rd.long()
            if n == 0:
                break
            if n < 0:
                n = -n
                rd.long()
            for _ in range(n):
                k = rd.take(rd.long()).decode("utf-8")
                meta[k] = rd.take(rd.long())
        sync = rd.take(16)
        try:
            schema = json.loads(meta.get("avro.schema", b"null"))
        except json.JSONDecodeError as e:
            raise ValueError("avro: bad schema JSON") from e
        codec = meta.get("avro.codec", b"null").decode("ascii")
        names: dict = {}
        _register_names(schema, names)
        records = []
        while not rd.at_end():
            count = rd.long()
            size = rd.long()
            if count < 0 or size < 0:
                raise ValueError("avro: negative block header")
            payload = rd.take(size)
            if rd.take(16) != sync:
                raise ValueError("avro: sync marker mismatch")
            if codec == "null":
                body = payload
            elif codec == "deflate":
                try:
                    body = zlib.decompress(payload, -15)
                except zlib.error as e:
                    raise ValueError("avro: torn deflate block") \
                        from e
            else:
                raise ValueError("avro: unsupported codec %r"
                                 % codec)
            brd = _Reader(body)
            for _ in range(count):
                records.append(_decode(brd, schema, names))
            if not brd.at_end():
                raise ValueError("avro: trailing bytes in block")
        return {"schema": schema, "codec": codec, "records": records}
    except (IndexError, struct.error, KeyError, TypeError,
            AttributeError) as e:
        # a mutated avro.schema JSON can be arbitrarily malformed —
        # every shape failure normalizes to the quarantine ValueError
        raise ValueError("avro: torn container (%s)" % e) from e


# --- binary encode (fixture + sink path) -----------------------------------


def _zigzag(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    acc &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(value, schema, names: dict, enclosing=None) -> bytes:
    if isinstance(schema, str):
        if schema not in _PRIMITIVES:
            ref = schema if "." in schema or schema in names else (
                f"{enclosing}.{schema}" if enclosing else schema)
            return _encode(value, names[ref], names, enclosing)
        t = schema
    elif isinstance(schema, list):
        for idx, branch in enumerate(schema):
            if _matches(value, branch, names):
                return _zigzag(idx) + _encode(value, branch, names,
                                              enclosing)
        raise ValueError("avro: no union branch for %r" % (value,))
    else:
        t = schema["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return bytes([1 if value else 0])
    if t in ("int", "long"):
        return _zigzag(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "bytes":
        return _zigzag(len(value)) + bytes(value)
    if t == "string":
        raw = value.encode("utf-8")
        return _zigzag(len(raw)) + raw
    if t == "record":
        fn = _full_name(schema, enclosing)
        names.setdefault(fn, schema)
        ns = fn.rsplit(".", 1)[0] if "." in fn else None
        return b"".join(_encode(value[f["name"]], f["type"], names,
                                ns) for f in schema["fields"])
    if t == "enum":
        return _zigzag(schema["symbols"].index(value))
    if t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        return bytes(value)
    if t == "array":
        out = b""
        if value:
            out += _zigzag(len(value)) + b"".join(
                _encode(v, schema["items"], names, enclosing)
                for v in value)
        return out + _zigzag(0)
    if t == "map":
        out = b""
        if value:
            body = b""
            for k, v in value.items():
                raw = k.encode("utf-8")
                body += _zigzag(len(raw)) + raw + _encode(
                    v, schema["values"], names, enclosing)
            out += _zigzag(len(value)) + body
        return out + _zigzag(0)
    if isinstance(t, (dict, list)):
        return _encode(value, t, names, enclosing)
    raise ValueError("avro: unsupported schema type %r" % (t,))


def _matches(value, schema, names: dict) -> bool:
    t = schema if isinstance(schema, str) else (
        schema.get("type") if isinstance(schema, dict) else None)
    if t == "null":
        return value is None
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "record" or (isinstance(t, str)
                         and t not in _PRIMITIVES):
        return isinstance(value, dict) or value is not None
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return value is not None


def build_avro(schema: dict, records: list, codec: str = "null",
               sync: bytes = b"\x5a" * 16,
               block_records: int = 1000) -> bytes:
    """Write an Avro object container (null/deflate codecs) with a
    DETERMINISTIC sync marker (callers pass their own for variety —
    never random, per the repo's replayability rule)."""
    if codec not in ("null", "deflate"):
        raise ValueError("avro: unsupported write codec %r" % codec)
    if len(sync) != 16:
        raise ValueError("avro: sync must be 16 bytes")
    names: dict = {}
    _register_names(schema, names)
    schema_json = json.dumps(schema, separators=(",", ":"))
    meta = {"avro.schema": schema_json.encode(),
            "avro.codec": codec.encode()}
    out = bytearray(MAGIC_AVRO)
    out += _zigzag(len(meta))
    for k, v in meta.items():
        raw = k.encode()
        out += _zigzag(len(raw)) + raw + _zigzag(len(v)) + v
    out += _zigzag(0)
    out += sync
    for start in range(0, len(records), block_records):
        chunk = records[start : start + block_records]
        body = b"".join(_encode(r, schema, names) for r in chunk)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            body = co.compress(body) + co.flush()
        out += _zigzag(len(chunk)) + _zigzag(len(body)) + body + sync
    return bytes(out)


def sniff_avro(data: bytes) -> bool:
    return data[:4] == MAGIC_AVRO
