"""From-spec Parquet file reader — the lake's OWN storage format
decoded from first principles. An engine that writes and reads its
lake through opaque library calls cannot debug a torn file, audit a
vendor's writer, or ingest a foreign object store's parquet without
trusting it; this reader is the format-level ground truth the
pipeline can hold every writer to — including the driver-written
test tables themselves.

Implemented from the PUBLIC Apache Parquet specification
(parquet-format's parquet.thrift + the encodings/compression docs):

- **Thrift compact protocol** (the footer's wire format): field
  headers with 4-bit id deltas and the long-form zigzag-varint id
  escape, zigzag varints for i16/i32/i64, little-endian doubles,
  varint-length binaries, list headers with the size-15 escape,
  recursive structs — decoded generically into id-keyed dicts so
  unknown/new fields skip cleanly (forward compatibility exactly as
  thrift intends).
- **File layout**: ``PAR1`` magic both ends, the 8-byte footer
  (metadata length + magic), FileMetaData → schema tree (flat
  schemas supported; nested groups are a NAMED boundary), row
  groups → column chunks → page streams.
- **Pages**: DataPage v1 (rep/def levels length-prefixed inside the
  compressed region), DataPage v2 (levels OUTSIDE the compressed
  region, per header lengths), dictionary pages; page-level CRC
  ignored (checksummed by the codecs beneath).
- **Encodings**: PLAIN for every physical type (bit-packed
  booleans, LE ints/floats, u32-length byte arrays, fixed-len),
  PLAIN_DICTIONARY/RLE_DICTIONARY (dictionary page + bit-width-
  prefixed RLE/bit-packed hybrid indices), and the RLE/bit-packed
  HYBRID itself for definition levels (LSB-first bit packing in
  groups of 8, RLE runs with fixed-width values). DELTA_* encodings
  are named boundaries.
- **Codecs**: UNCOMPRESSED, SNAPPY (operators/snappy.py, pinned on
  the real library), GZIP (stdlib zlib), ZSTD (the from-spec RFC
  8878 decoder via the stream-codec registry's semantics). Brotli
  named; LZO/LZ4_RAW named.
- **Logical types**: UTF8/STRING byte arrays decode to str,
  DECIMAL/DATE/TIMESTAMP surface raw physical values (annotation
  returned in the schema so callers convert), INT96 is a named
  boundary (deprecated by the spec itself).

Ground truth: THREE independent host implementations — pyarrow
(parquet-cpp) writes artifacts across codecs/encodings/page
versions, DuckDB's reader cross-checks values, and the driver's own
sf* test tables (snappy + RLE_DICTIONARY, parquet-cpp 16.1.0) must
decode row-for-row equal to what Spark serves the pipeline
(tests/test_parquet_file.py; the corpus query reads the REAL
documents.parquet through this reader inside executors and the
driver's DuckDB oracle reads the same file with its own C++ reader
— a standing three-engine agreement gate).

Reference parity: the reference lake IS parquet-on-S3 schema-on-read
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44). Tear
contract: ValueError — and only ValueError."""

from __future__ import annotations

import struct
import zlib

MAGIC_PAR1 = b"PAR1"

# thrift compact type ids
_T_STOP = 0
_T_TRUE = 1
_T_FALSE = 2
_T_BYTE = 3
_T_I16 = 4
_T_I32 = 5
_T_I64 = 6
_T_DOUBLE = 7
_T_BINARY = 8
_T_LIST = 9
_T_SET = 10
_T_MAP = 11
_T_STRUCT = 12

_PHYS = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
         4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY",
         7: "FIXED_LEN_BYTE_ARRAY"}

_CODECS = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 4: "BROTLI",
           5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}


class _Thrift:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.i = pos

    def _byte(self) -> int:
        b = self.d[self.i]
        self.i += 1
        return b

    def uvarint(self) -> int:
        n = 0
        shift = 0
        while True:
            b = self._byte()
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                return n
            shift += 7
            if shift > 70:
                raise ValueError("parquet: thrift varint too long")

    def zigzag(self) -> int:
        n = self.uvarint()
        return (n >> 1) ^ -(n & 1)

    def value(self, ttype: int):
        if ttype == _T_TRUE:
            return True
        if ttype == _T_FALSE:
            return False
        if ttype == _T_BYTE:
            return self._byte()
        if ttype in (_T_I16, _T_I32, _T_I64):
            return self.zigzag()
        if ttype == _T_DOUBLE:
            v = struct.unpack_from("<d", self.d, self.i)[0]
            self.i += 8
            return v
        if ttype == _T_BINARY:
            n = self.uvarint()
            out = self.d[self.i : self.i + n]
            if len(out) != n:
                raise ValueError("parquet: thrift binary overruns")
            self.i += n
            return out
        if ttype in (_T_LIST, _T_SET):
            head = self._byte()
            size = head >> 4
            etype = head & 0x0F
            if size == 15:
                size = self.uvarint()
            return [self.value(etype) for _ in range(size)]
        if ttype == _T_MAP:
            size = self.uvarint()
            if size == 0:
                return {}
            kv = self._byte()
            kt, vt = kv >> 4, kv & 0x0F
            return {self.value(kt): self.value(vt)
                    for _ in range(size)}
        if ttype == _T_STRUCT:
            return self.struct()
        raise ValueError("parquet: unknown thrift type %d" % ttype)

    def struct(self) -> dict:
        out: dict[int, object] = {}
        fid = 0
        while True:
            head = self._byte()
            if head == _T_STOP:
                return out
            delta = head >> 4
            ttype = head & 0x0F
            if delta:
                fid += delta
            else:
                fid = self.zigzag()
            # booleans carry their value in the TYPE nibble
            out[fid] = self.value(ttype)


def _decompress(payload: bytes, codec: int, want: int) -> bytes:
    name = _CODECS.get(codec)
    if name == "UNCOMPRESSED":
        return payload
    if name == "SNAPPY":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.snappy import (
            snappy_decompress,
        )

        out = snappy_decompress(payload)
    elif name == "GZIP":
        try:
            out = zlib.decompress(payload, 31)
        except zlib.error as e:
            raise ValueError("parquet: torn gzip page") from e
    elif name == "ZSTD":
        from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.zstd import (
            zstd_decompress,
        )

        out = zstd_decompress(payload)
    else:
        raise ValueError("parquet: unsupported codec %s"
                         % (name or codec))
    if len(out) != want:
        raise ValueError("parquet: page size mismatch")
    return out


def _rle_bitpacked_hybrid(data: bytes, pos: int, end: int,
                          bit_width: int, count: int) -> list[int]:
    """The RLE/bit-packed hybrid (Encodings.md): LSB-first packing."""
    out: list[int] = []
    byte_w = (bit_width + 7) // 8
    rd = _Thrift(data, pos)
    while len(out) < count and rd.i < end:
        header = rd.uvarint()
        if header & 1:  # bit-packed: (header>>1) groups of 8
            n_groups = header >> 1
            n_bytes = n_groups * bit_width
            raw = data[rd.i : rd.i + n_bytes]
            if len(raw) != n_bytes:
                raise ValueError("parquet: bit-packed run overruns")
            rd.i += n_bytes
            acc = int.from_bytes(raw, "little")
            mask = (1 << bit_width) - 1
            for k in range(n_groups * 8):
                if len(out) >= count:
                    break
                out.append((acc >> (k * bit_width)) & mask)
        else:  # RLE run
            n = header >> 1
            raw = data[rd.i : rd.i + byte_w]
            if len(raw) != byte_w and bit_width:
                raise ValueError("parquet: RLE run overruns")
            rd.i += byte_w
            v = int.from_bytes(raw, "little") if byte_w else 0
            out.extend([v] * min(n, count - len(out)))
    if len(out) < count:
        raise ValueError("parquet: level run ends early")
    return out[:count]


def _plain_values(data: bytes, pos: int, count: int, ptype: str,
                  type_length: int) -> tuple[list, int]:
    out: list = []
    if ptype == "BOOLEAN":
        for k in range(count):
            out.append(bool((data[pos + k // 8] >> (k % 8)) & 1))
        return out, pos + (count + 7) // 8
    if ptype == "INT32":
        out = list(struct.unpack_from("<%di" % count, data, pos))
        return out, pos + 4 * count
    if ptype == "INT64":
        out = list(struct.unpack_from("<%dq" % count, data, pos))
        return out, pos + 8 * count
    if ptype == "FLOAT":
        out = list(struct.unpack_from("<%df" % count, data, pos))
        return out, pos + 4 * count
    if ptype == "DOUBLE":
        out = list(struct.unpack_from("<%dd" % count, data, pos))
        return out, pos + 8 * count
    if ptype == "BYTE_ARRAY":
        for _ in range(count):
            n = struct.unpack_from("<I", data, pos)[0]
            pos += 4
            v = data[pos : pos + n]
            if len(v) != n:
                raise ValueError("parquet: byte_array overruns")
            out.append(v)
            pos += n
        return out, pos
    if ptype == "FIXED_LEN_BYTE_ARRAY":
        for _ in range(count):
            out.append(data[pos : pos + type_length])
            pos += type_length
        return out, pos
    raise ValueError("parquet: unsupported physical type %s" % ptype)


def _read_column(data: bytes, col_meta: dict, type_length: int,
                 max_def: int, max_rep: int):
    """Read every page of a column chunk.

    max_rep == 0: returns the assembled flat value list (Nones
    injected from def levels). max_rep == 1: returns
    (values, defs, reps) raw — record assembly happens in the
    caller, because records may span page boundaries in v1 files."""
    ptype = _PHYS.get(col_meta[1])
    if ptype is None or ptype == "INT96":
        raise ValueError("parquet: unsupported type id %r"
                         % col_meta.get(1))
    codec = col_meta[4]
    num_values = col_meta[5]
    start = col_meta.get(11, col_meta[9])
    if 11 in col_meta:
        start = min(col_meta[11], col_meta[9])
    pos = start
    dictionary: list | None = None
    out: list = []
    all_defs: list[int] = []
    all_reps: list[int] = []
    entries = 0
    while entries < num_values:
        th = _Thrift(data, pos)
        ph = th.struct()
        page_type = ph[1]
        uncomp = ph[2]
        comp = ph[3]
        body = data[th.i : th.i + comp]
        if len(body) != comp:
            raise ValueError("parquet: page body overruns")
        pos = th.i + comp
        if page_type == 2:  # dictionary page
            dph = ph[7]
            raw = _decompress(body, codec, uncomp)
            dictionary, _ = _plain_values(raw, 0, dph[1], ptype,
                                          type_length)
            continue
        if page_type == 0:  # data page v1
            dph = ph[5]
            n = dph[1]
            enc = dph[2]
            raw = _decompress(body, codec, uncomp)
            p = 0
            reps = None
            if max_rep > 0:
                ln = struct.unpack_from("<I", raw, p)[0]
                p += 4
                bw = max(1, max_rep.bit_length())
                reps = _rle_bitpacked_hybrid(raw, p, p + ln, bw, n)
                p += ln
            defs = None
            if max_def > 0:
                ln = struct.unpack_from("<I", raw, p)[0]
                p += 4
                bw = max(1, (max_def).bit_length())
                defs = _rle_bitpacked_hybrid(raw, p, p + ln, bw, n)
                p += ln
            vals = _decode_values(raw, p, n, enc, ptype,
                                  type_length, dictionary,
                                  defs, max_def,
                                  flat=max_rep == 0)
        elif page_type == 3:  # data page v2
            dph = ph[8]
            n = dph[1]
            enc = dph[4]
            dl_len = dph[5]
            rl_len = dph[6]
            is_comp = dph.get(7, True)
            levels = body[: rl_len + dl_len]
            vals_raw = body[rl_len + dl_len :]
            if is_comp:
                vals_raw = _decompress(
                    vals_raw, codec, uncomp - rl_len - dl_len)
            reps = None
            if max_rep > 0 and rl_len:
                bw = max(1, max_rep.bit_length())
                reps = _rle_bitpacked_hybrid(levels, 0, rl_len,
                                             bw, n)
            elif max_rep > 0:
                reps = [0] * n
            defs = None
            if max_def > 0 and dl_len:
                bw = max(1, (max_def).bit_length())
                defs = _rle_bitpacked_hybrid(
                    levels, rl_len, rl_len + dl_len, bw, n)
            elif max_def > 0:
                defs = [max_def] * n
            vals = _decode_values(vals_raw, 0, n, enc, ptype,
                                  type_length, dictionary,
                                  defs, max_def,
                                  flat=max_rep == 0)
        else:
            raise ValueError("parquet: unknown page type %d"
                             % page_type)
        out.extend(vals)
        entries += n
        if max_rep > 0:
            all_defs.extend(defs if defs is not None else
                            [max_def] * n)
            all_reps.extend(reps)
    if max_rep == 0:
        return out[:num_values]
    return out, all_defs[:num_values], all_reps[:num_values]


def _decode_values(raw, p, n, enc, ptype, type_length, dictionary,
                   defs, max_def, flat=True) -> list:
    n_present = n if defs is None else sum(
        1 for d in defs if d == max_def)
    if enc == 0:  # PLAIN
        vals, _ = _plain_values(raw, p, n_present, ptype,
                                type_length)
    elif enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
        if dictionary is None:
            raise ValueError("parquet: dictionary page missing")
        bw = raw[p]
        p += 1
        idx = _rle_bitpacked_hybrid(raw, p, len(raw), bw,
                                    n_present) if bw else [0] * \
            n_present
        try:
            vals = [dictionary[i] for i in idx]
        except IndexError as e:
            raise ValueError("parquet: dict index out of range") \
                from e
    elif enc == 3 and ptype == "BOOLEAN":
        # RLE-encoded booleans (the v2-page shape): u32 length prefix
        # then the hybrid at bit width 1
        ln = struct.unpack_from("<I", raw, p)[0]
        p += 4
        vals = [bool(v) for v in _rle_bitpacked_hybrid(
            raw, p, p + ln, 1, n_present)]
    elif enc == 5 and ptype in ("INT32", "INT64"):
        vals = _delta_binary_packed(_Thrift(raw, p), n_present)
    elif enc in (6, 7) and ptype == "BYTE_ARRAY":
        vals = _delta_byte_array(_Thrift(raw, p), n_present,
                                 prefixed=enc == 7)
    else:
        raise ValueError("parquet: unsupported encoding %d" % enc)
    if defs is None or not flat:
        return vals
    out = []
    it = iter(vals)
    for d in defs:
        out.append(next(it) if d == max_def else None)
    return out


def _delta_binary_packed(rd: _Thrift, count: int) -> list[int]:
    """DELTA_BINARY_PACKED (Encodings.md §5): block/miniblock header,
    per-block zigzag min-delta + per-miniblock bit widths, LSB-first
    packed deltas."""
    block_size = rd.uvarint()
    n_mini = rd.uvarint()
    total = rd.uvarint()
    first = rd.zigzag()
    if n_mini == 0 or block_size % n_mini:
        raise ValueError("parquet: bad delta block header")
    per_mini = block_size // n_mini
    out = [first]
    while len(out) < total:
        min_delta = rd.zigzag()
        widths = [rd._byte() for _ in range(n_mini)]
        for w in widths:
            if len(out) >= total:
                # trailing miniblocks still occupy their bytes
                rd.i += w * per_mini // 8
                continue
            n_bytes = w * per_mini // 8
            raw = rd.d[rd.i : rd.i + n_bytes]
            if len(raw) != n_bytes:
                raise ValueError("parquet: delta miniblock overruns")
            rd.i += n_bytes
            acc = int.from_bytes(raw, "little")
            mask = (1 << w) - 1
            for k in range(per_mini):
                if len(out) >= total:
                    break
                d = (acc >> (k * w)) & mask if w else 0
                out.append(out[-1] + min_delta + d)
    if total < count:
        raise ValueError("parquet: delta run short")
    return out[:count]


def _delta_byte_array(rd: _Thrift, count: int,
                      prefixed: bool) -> list[bytes]:
    """DELTA_LENGTH_BYTE_ARRAY (lengths + concatenated bytes) and
    DELTA_BYTE_ARRAY (adds shared-prefix lengths)."""
    if count == 0:
        return []
    prefixes = _delta_binary_packed(rd, count) if prefixed else \
        [0] * count
    lengths = _delta_binary_packed(rd, count)
    out: list[bytes] = []
    prev = b""
    for pf, ln in zip(prefixes, lengths):
        if ln < 0 or pf < 0 or pf > len(prev):
            raise ValueError("parquet: bad delta string lengths")
        suffix = rd.d[rd.i : rd.i + ln]
        if len(suffix) != ln:
            raise ValueError("parquet: delta suffix overruns")
        rd.i += ln
        prev = prev[:pf] + suffix
        out.append(prev)
    return out


def read_parquet(data: bytes, columns: list[str] | None = None) -> dict:
    """Decode a parquet file: {schema, num_rows, columns} with
    columns mapping name → Python value list (None for nulls; UTF8
    byte arrays as str)."""
    if data[:4] != MAGIC_PAR1 or data[-4:] != MAGIC_PAR1:
        raise ValueError("parquet: bad magic")
    try:
        meta_len = struct.unpack_from("<I", data, len(data) - 8)[0]
        meta_start = len(data) - 8 - meta_len
        if meta_start < 4:
            raise ValueError("parquet: footer overruns file")
        fmd = _Thrift(data, meta_start).struct()
        schema_els = fmd[2]
        num_rows = fmd[3]
        row_groups = fmd[4]
        leaves = _schema_leaves(schema_els)
        by_path = {lf["path"]: lf for lf in leaves}
        tops = {}
        order: list[str] = []
        for lf in leaves:
            if lf["top"] in tops:
                raise ValueError(
                    "parquet: struct columns are a named boundary")
            tops[lf["top"]] = lf
            order.append(lf["top"])
        want = order if columns is None else [c for c in order
                                             if c in set(columns)]
        out: dict[str, list] = {c: [] for c in want}
        for rg in row_groups:
            for chunk in rg[1]:
                cm = chunk[3]
                path = b".".join(cm[3]).decode("utf-8")
                lf = by_path.get(path)
                if lf is None or lf["top"] not in out:
                    continue
                el = lf["el"]
                got = _read_column(data, cm, el.get(2, 0),
                                   lf["max_def"], lf["max_rep"])
                if lf["max_rep"] == 0:
                    out[lf["top"]].extend(got)
                else:
                    vals, defs, reps = got
                    out[lf["top"]].extend(_assemble_lists(
                        vals, defs, reps, lf))
        schema = []
        for c in want:
            lf = tops[c]
            el = lf["el"]
            conv = el.get(6)
            ptype = _PHYS.get(el[1], "?")
            if ptype == "BYTE_ARRAY" and conv == 0:  # UTF8
                if lf["max_rep"] == 0:
                    out[c] = [v.decode("utf-8")
                              if isinstance(v, bytes) else v
                              for v in out[c]]
                else:
                    out[c] = [
                        None if rec is None else
                        [v.decode("utf-8") if isinstance(v, bytes)
                         else v for v in rec]
                        for rec in out[c]]
            schema.append({"name": c, "physical": ptype,
                           "converted": conv,
                           "repeated": lf["max_rep"] > 0,
                           "optional": el.get(3, 0) == 1})
        for c in want:
            if len(out[c]) != num_rows:
                raise ValueError("parquet: column %s has %d of %d"
                                 % (c, len(out[c]), num_rows))
        return {"schema": schema, "num_rows": num_rows,
                "columns": out}
    except (IndexError, struct.error, KeyError, TypeError,
            UnicodeDecodeError) as e:
        raise ValueError("parquet: torn file (%s)" % e) from e


def _schema_leaves(schema_els: list[dict]) -> list[dict]:
    """Walk the flattened pre-order schema into leaf descriptors:
    dotted path, max def/rep levels, the def level contributed AT the
    repeated node (for list assembly), and the owning top field."""
    i = [1]
    leaves: list[dict] = []

    def walk(parent_path, max_def, max_rep, d_rep):
        if i[0] >= len(schema_els):
            raise ValueError("parquet: schema tree truncated")
        el = schema_els[i[0]]
        i[0] += 1
        rep = el.get(3, 0)  # 0 required / 1 optional / 2 repeated
        d = max_def + (1 if rep in (1, 2) else 0)
        r = max_rep + (1 if rep == 2 else 0)
        if rep == 2:
            if d_rep is not None:
                raise ValueError(
                    "parquet: multi-level repetition is a named"
                    " boundary")
            d_rep = d
        path = parent_path + [el[4].decode("utf-8")]
        nch = el.get(5, 0)
        if nch:
            for _ in range(nch):
                walk(path, d, r, d_rep)
        else:
            if r > 1:
                raise ValueError(
                    "parquet: nested lists are a named boundary")
            leaves.append({
                "path": ".".join(path), "top": path[0], "el": el,
                "max_def": d, "max_rep": r, "d_rep": d_rep,
            })

    root = schema_els[0]
    n_top = root.get(5, 0)
    for _ in range(n_top):
        walk([], 0, 0, None)
    if i[0] != len(schema_els):
        raise ValueError("parquet: schema tree size mismatch")
    return leaves


def _assemble_lists(vals: list, defs: list[int], reps: list[int],
                    lf: dict) -> list:
    """Dremel record assembly for the one-level LIST shape.

    def < d_rep-1 → null list; def == d_rep-1 → empty list;
    def >= d_rep → an element slot (null element unless def hits
    max_def); rep 0 starts a record, rep 1 appends."""
    d_rep = lf["d_rep"]
    d_elem = lf["max_def"]
    out: list = []
    cur: list | None = None
    it = iter(vals)
    for r, d in zip(reps, defs):
        if r == 0:
            if d < d_rep - 1:
                out.append(None)
                cur = None
                continue
            if d == d_rep - 1:
                out.append([])
                cur = None
                continue
            cur = []
            out.append(cur)
        elif cur is None:
            raise ValueError("parquet: rep level without open record")
        if d >= d_elem:
            try:
                cur.append(next(it))
            except StopIteration as e:
                raise ValueError("parquet: list values ran dry") \
                    from e
        elif d >= d_rep:
            cur.append(None)
    return out
