"""SQLite database-file reader — from-spec b-tree/record decode of the
single most common structured-dump format a crawl or data-escrow bucket
carries (browser profiles, mobile app exports, research datasets, and
"here is our data as an .sqlite file" hand-offs all ship this shape).

Implemented from the PUBLIC file-format specification
(sqlite.org/fileformat2.html): the 100-byte database header (page size
with the 1→65536 encoding, reserved-space-per-page, text encoding,
in-header database size with its change-counter validity rule), table
b-trees (interior 0x05 / leaf 0x0D) and index b-trees (interior 0x02 /
leaf 0x0A, payloads in INTERIOR cells included via in-order traversal —
index interior cells CARRY keys, unlike table interior cells), the
record format (header-length varint + serial-type varints; serial types
0..9 fixed, N>=12 even=blob / odd=text), 64-bit big-endian-7-bit
varints with the 9th-byte-is-8-bits rule, rowid two's-complement
interpretation, and the spilled-payload rule (X/M/K local-byte
computation differing between table and index pages) with overflow-page
chains. Freelist and pointer-map pages are never visited because
extraction walks b-trees from sqlite_master rootpages only.

Storage-level semantics are surfaced faithfully and tested as such:
an INTEGER PRIMARY KEY column stores NULL in the record (the rowid IS
the value — ``resolve_rowid_alias`` applies the documented aliasing
from the schema SQL), rows written before ALTER TABLE ADD COLUMN keep
their SHORT records (missing trailing columns), NaN REALs are stored
as NULL by the engine, and WITHOUT ROWID tables live entirely in an
index b-tree (key-order rows, no rowids). UTF-8/UTF-16LE/UTF-16BE text
encodings all decode. A version-2 (WAL) main file reads as the last
checkpointed image with ``wal=True`` surfaced in the header facts; an
unapplied ``-wal`` side file is out of scope by definition (this reader
sees one byte blob).

Ground truth: the host SQLite engine itself (stdlib ``sqlite3``,
SQLite 3.40.1) writes every test artifact via ``Connection.serialize``
— page sizes 512..65536, multi-level interiors, overflow chains,
freelist-heavy delete patterns, all three encodings — and our decode is
compared row-for-row against the engine's own SELECT output
(tests/test_sqlite_file.py), the same real-library pin standing as the
r14 libzstd/liblzma stream corpora.

Reference parity: the reference lake ingests tenant-uploaded objects
schema-on-read (src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:
32-44); this reader gives the pipeline typed rows from .sqlite uploads
instead of opaque binaries. Tear contract: ValueError — and only
ValueError — so the Spark exploder quarantines per-row.
"""

from __future__ import annotations

import re
import struct

MAGIC = b"SQLite format 3\x00"

_ENCODINGS = {1: "utf-8", 2: "utf-16-le", 3: "utf-16-be"}

# b-tree page types (fileformat2.html §1.6)
_INTERIOR_INDEX = 0x02
_INTERIOR_TABLE = 0x05
_LEAF_INDEX = 0x0A
_LEAF_TABLE = 0x0D


def _varint(buf: bytes, i: int) -> tuple[int, int]:
    """64-bit varint: 7 bits per byte big-endian, 9th byte carries 8."""
    try:
        r = 0
        for k in range(8):
            v = buf[i + k]
            r = (r << 7) | (v & 0x7F)
            if not v & 0x80:
                return r, i + k + 1
        return (r << 8) | buf[i + 8], i + 9
    except IndexError as e:
        raise ValueError("sqlite: varint overruns buffer") from e


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def parse_sqlite_header(data: bytes) -> dict:
    """Parse the 100-byte database header into a facts dict."""
    try:
        if data[:16] != MAGIC:
            raise ValueError("not a SQLite database (bad magic)")
        if len(data) < 512:
            raise ValueError("sqlite: shorter than one minimum page")
        page_size = struct.unpack_from(">H", data, 16)[0]
        if page_size == 1:
            page_size = 65536
        if page_size < 512 or page_size & (page_size - 1):
            raise ValueError("sqlite: invalid page size %d" % page_size)
        write_ver, read_ver, reserved = data[18], data[19], data[20]
        if read_ver not in (1, 2):
            raise ValueError("sqlite: unreadable format version %d" % read_ver)
        usable = page_size - reserved
        if usable < 480:
            raise ValueError("sqlite: usable page size too small")
        change_counter = struct.unpack_from(">I", data, 24)[0]
        size_pages = struct.unpack_from(">I", data, 28)[0]
        version_valid_for = struct.unpack_from(">I", data, 92)[0]
        # in-header size is authoritative only when the change counter
        # matches version-valid-for (§1.3.7); else derive from the file
        if size_pages == 0 or version_valid_for != change_counter:
            size_pages = len(data) // page_size
        enc_code = struct.unpack_from(">I", data, 56)[0]
        if enc_code not in _ENCODINGS:
            raise ValueError("sqlite: unknown text encoding %d" % enc_code)
        if len(data) < page_size * size_pages:
            raise ValueError("sqlite: file truncated vs header size")
        return {
            "page_size": page_size,
            "usable": usable,
            "reserved": reserved,
            "n_pages": size_pages,
            "encoding": _ENCODINGS[enc_code],
            "wal": read_ver == 2 or write_ver == 2,
            "freelist_pages": struct.unpack_from(">I", data, 36)[0],
            "schema_cookie": struct.unpack_from(">I", data, 40)[0],
            "user_version": struct.unpack_from(">i", data, 60)[0],
            "application_id": struct.unpack_from(">i", data, 68)[0],
        }
    except (IndexError, struct.error) as e:
        raise ValueError("sqlite: torn header (%s)" % e) from e


def _page(data: bytes, hdr: dict, pgno: int) -> bytes:
    ps = hdr["page_size"]
    if pgno < 1 or pgno > hdr["n_pages"]:
        raise ValueError("sqlite: page %d out of range" % pgno)
    pg = data[(pgno - 1) * ps : pgno * ps]
    if len(pg) < ps:
        raise ValueError("sqlite: truncated page %d" % pgno)
    return pg


def _overflow_chain(data: bytes, hdr: dict, first: int, need: int) -> bytes:
    """Follow an overflow-page chain: 4-byte next pointer + payload."""
    out = bytearray()
    pgno = first
    cap = hdr["usable"] - 4
    seen = set()
    while need > 0:
        if pgno == 0:
            raise ValueError("sqlite: overflow chain ends early")
        if pgno in seen:
            raise ValueError("sqlite: overflow chain cycle")
        seen.add(pgno)
        pg = _page(data, hdr, pgno)
        take = min(cap, need)
        out += pg[4 : 4 + take]
        need -= take
        pgno = struct.unpack_from(">I", pg, 0)[0]
    return bytes(out)


def _cell_payload(
    data: bytes, hdr: dict, page: bytes, off: int, payload_len: int,
    index_page: bool,
) -> bytes:
    """Assemble a cell payload, spilling to overflow pages per §1.6.

    The local-byte rule differs between table leaves (X = U-35) and
    index pages (X = ((U-12)*64/255)-23); M is shared.
    """
    u = hdr["usable"]
    x = ((u - 12) * 64 // 255) - 23 if index_page else u - 35
    if payload_len <= x:
        if off + payload_len > len(page):
            raise ValueError("sqlite: cell payload overruns page")
        return page[off : off + payload_len]
    m = ((u - 12) * 32 // 255) - 23
    k = m + ((payload_len - m) % (u - 4))
    local = k if k <= x else m
    if off + local + 4 > len(page):
        raise ValueError("sqlite: spilled cell overruns page")
    first_ovfl = struct.unpack_from(">I", page, off + local)[0]
    return page[off : off + local] + _overflow_chain(
        data, hdr, first_ovfl, payload_len - local
    )


def _decode_record(payload: bytes, encoding: str) -> list:
    """Decode a record (§2.1): header varints then typed values."""
    try:
        hlen, i = _varint(payload, 0)
        if hlen > len(payload):
            raise ValueError("sqlite: record header overruns payload")
        serials = []
        while i < hlen:
            s, i = _varint(payload, i)
            serials.append(s)
        vals: list = []
        off = hlen
        for s in serials:
            if s == 0:
                vals.append(None)
            elif 1 <= s <= 6:
                n = (1, 2, 3, 4, 6, 8)[s - 1]
                raw = payload[off : off + n]
                if len(raw) != n:
                    raise ValueError("sqlite: record int truncated")
                vals.append(int.from_bytes(raw, "big", signed=True))
                off += n
            elif s == 7:
                if off + 8 > len(payload):
                    raise ValueError("sqlite: record float truncated")
                vals.append(struct.unpack_from(">d", payload, off)[0])
                off += 8
            elif s == 8:
                vals.append(0)
            elif s == 9:
                vals.append(1)
            elif s >= 12:
                n = (s - 12) // 2
                raw = payload[off : off + n]
                if len(raw) != n:
                    raise ValueError("sqlite: record body truncated")
                if s & 1:
                    try:
                        vals.append(raw.decode(encoding))
                    except UnicodeDecodeError as e:
                        raise ValueError("sqlite: undecodable text") from e
                else:
                    vals.append(raw)
                off += n
            else:
                raise ValueError("sqlite: reserved serial type %d" % s)
        return vals
    except IndexError as e:
        raise ValueError("sqlite: torn record") from e


def _walk_table(data, hdr, pgno, out, depth=0, seen=None):
    """In-order walk of a table b-tree; appends (rowid, values)."""
    if seen is None:
        seen = set()
    if pgno in seen or depth > 64:
        raise ValueError("sqlite: b-tree cycle or absurd depth")
    seen.add(pgno)
    page = _page(data, hdr, pgno)
    base = 100 if pgno == 1 else 0
    ptype = page[base]
    ncells = struct.unpack_from(">H", page, base + 3)[0]
    if ptype == _INTERIOR_TABLE:
        ptr0 = base + 12
        for c in range(ncells):
            coff = struct.unpack_from(">H", page, ptr0 + 2 * c)[0]
            left = struct.unpack_from(">I", page, coff)[0]
            _walk_table(data, hdr, left, out, depth + 1, seen)
        right = struct.unpack_from(">I", page, base + 8)[0]
        _walk_table(data, hdr, right, out, depth + 1, seen)
    elif ptype == _LEAF_TABLE:
        ptr0 = base + 8
        for c in range(ncells):
            coff = struct.unpack_from(">H", page, ptr0 + 2 * c)[0]
            plen, i = _varint(page, coff)
            rowid, i = _varint(page, i)
            payload = _cell_payload(data, hdr, page, i, plen, False)
            out.append((_signed64(rowid), _decode_record(payload,
                                                         hdr["encoding"])))
    else:
        raise ValueError("sqlite: page %d is not a table b-tree page"
                         % pgno)


def _walk_index(data, hdr, pgno, out, depth=0, seen=None):
    """In-order walk of an index b-tree; appends decoded key records.

    Interior index cells carry payloads (unlike table interiors) and
    sit BETWEEN their left subtree and the next — in-order emission is
    what makes the result key-ordered.
    """
    if seen is None:
        seen = set()
    if pgno in seen or depth > 64:
        raise ValueError("sqlite: b-tree cycle or absurd depth")
    seen.add(pgno)
    page = _page(data, hdr, pgno)
    base = 100 if pgno == 1 else 0
    ptype = page[base]
    ncells = struct.unpack_from(">H", page, base + 3)[0]
    if ptype == _INTERIOR_INDEX:
        ptr0 = base + 12
        for c in range(ncells):
            coff = struct.unpack_from(">H", page, ptr0 + 2 * c)[0]
            left = struct.unpack_from(">I", page, coff)[0]
            _walk_index(data, hdr, left, out, depth + 1, seen)
            plen, i = _varint(page, coff + 4)
            payload = _cell_payload(data, hdr, page, i, plen, True)
            out.append(_decode_record(payload, hdr["encoding"]))
        right = struct.unpack_from(">I", page, base + 8)[0]
        _walk_index(data, hdr, right, out, depth + 1, seen)
    elif ptype == _LEAF_INDEX:
        ptr0 = base + 8
        for c in range(ncells):
            coff = struct.unpack_from(">H", page, ptr0 + 2 * c)[0]
            plen, i = _varint(page, coff)
            payload = _cell_payload(data, hdr, page, i, plen, True)
            out.append(_decode_record(payload, hdr["encoding"]))
    else:
        raise ValueError("sqlite: page %d is not an index b-tree page"
                         % pgno)


def sqlite_schema(data: bytes) -> list[dict]:
    """Rows of sqlite_master (rootpage 1): type/name/tbl_name/rootpage/sql."""
    hdr = parse_sqlite_header(data)
    raw: list = []
    _walk_table(data, hdr, 1, raw)
    out = []
    for rowid, vals in raw:
        if len(vals) != 5:
            raise ValueError("sqlite: malformed sqlite_master row")
        out.append({
            "type": vals[0], "name": vals[1], "tbl_name": vals[2],
            "rootpage": vals[3], "sql": vals[4],
        })
    return out


def _find_object(data: bytes, name: str, want_type: str) -> dict:
    for row in sqlite_schema(data):
        if row["name"] == name and row["type"] == want_type:
            return row
    raise ValueError("sqlite: no %s named %r" % (want_type, name))


def sqlite_table_rows(data: bytes, name: str) -> list[tuple]:
    """All rows of one table as (rowid, [values]) in rowid order.

    WITHOUT ROWID tables live in an index b-tree: rows come back in
    key order as (None, [values]). The record is the STORED record —
    INTEGER PRIMARY KEY aliasing (NULL-in-record) and short
    post-ALTER records surface as written; see resolve_rowid_alias.
    """
    hdr = parse_sqlite_header(data)
    obj = _find_object(data, name, "table")
    root = obj["rootpage"]
    if not isinstance(root, int) or root < 1:
        raise ValueError("sqlite: table %r has no storage" % name)
    page = _page(data, hdr, root)
    ptype = page[100 if root == 1 else 0]
    if ptype in (_INTERIOR_TABLE, _LEAF_TABLE):
        out: list = []
        _walk_table(data, hdr, root, out)
        return out
    if ptype in (_INTERIOR_INDEX, _LEAF_INDEX):  # WITHOUT ROWID
        keys: list = []
        _walk_index(data, hdr, root, keys)
        return [(None, vals) for vals in keys]
    raise ValueError("sqlite: rootpage of %r has type 0x%02x"
                     % (name, ptype))


def sqlite_index_entries(data: bytes, name: str) -> list[list]:
    """All entries of one index, in key order (key cols + rowid last)."""
    hdr = parse_sqlite_header(data)
    obj = _find_object(data, name, "index")
    out: list = []
    _walk_index(data, hdr, obj["rootpage"], out)
    return out


_IPK_RE = re.compile(
    r"^\s*[\"\[`]?(\w+)[\"\]`]?\s+INTEGER\s+PRIMARY\s+KEY\b(?!.*DESC)",
    re.IGNORECASE,
)


def rowid_alias_column(sql: str) -> int | None:
    """Index of the INTEGER PRIMARY KEY rowid-alias column, if any.

    Per the spec a column declared exactly INTEGER PRIMARY KEY (ASC)
    in a rowid table aliases the rowid and stores NULL in the record.
    Conservative CREATE TABLE parse: splits the top-level column list
    on commas outside parens/quotes; a table-level PRIMARY KEY(...)
    clause or DESC ordering never aliases.
    """
    m = re.search(r"\(", sql)
    if not m:
        return None
    body = sql[m.end():]
    depth, start, cols = 0, 0, []
    in_str: str | None = None
    for i, ch in enumerate(body):
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in "'\"`[":
            in_str = "]" if ch == "[" else ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                cols.append(body[start:i])
                break
            depth -= 1
        elif ch == "," and depth == 0:
            cols.append(body[start:i])
            start = i + 1
    for idx, col in enumerate(cols):
        if _IPK_RE.match(col):
            return idx
    return None


def resolve_rowid_alias(sql: str, rows: list[tuple]) -> list[list]:
    """Apply INTEGER-PRIMARY-KEY aliasing: the engine's SELECT view.

    Where the schema declares a rowid alias, the stored NULL in that
    column position is replaced by the rowid — exactly what SELECT
    returns. Rows pass through unchanged otherwise.
    """
    ipk = rowid_alias_column(sql or "")
    out = []
    for rowid, vals in rows:
        vals = list(vals)
        if ipk is not None and rowid is not None and ipk < len(vals):
            if vals[ipk] is None:
                vals[ipk] = rowid
        out.append(vals)
    return out


def sqlite_dump(data: bytes) -> dict:
    """Whole-file extraction: {table_name: [row values]} with the
    rowid-alias resolution applied — the engine-SELECT-equivalent view
    for every table (rowid and WITHOUT ROWID alike)."""
    out = {}
    for obj in sqlite_schema(data):
        if obj["type"] != "table" or obj["name"].startswith("sqlite_"):
            continue
        rows = sqlite_table_rows(data, obj["name"])
        out[obj["name"]] = resolve_rowid_alias(obj["sql"], rows)
    return out
