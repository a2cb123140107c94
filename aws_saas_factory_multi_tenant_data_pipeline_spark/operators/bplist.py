"""Binary property-list (bplist00) reader — the serialization format
of the entire Apple ecosystem: app bundles, iOS backups, Safari
bookmark/history exports, and .ipa archives a crawl or device dump
carries are full of ``bplist00`` blobs (often inside zip members,
which operators/archives.py already explodes).

Implemented from the PUBLIC format description (Apple's open-source
CFBinaryPList.c documents the layout, and the format is re-documented
in plistlib's own source): the 8-byte ``bplist00`` magic, the 32-byte
trailer (offset-int size, object-ref size, object count, top-object
index, offset-table start), the offset table of equal-width big-endian
ints, and the typed object marker bytes — null/bool/fill (0x0),
sized ints (0x1, 1/2/4/8/16 bytes, 8-byte is the SIGNED one per
CFBinaryPList), reals (0x2, float32/float64), CFDate (0x33, seconds
since 2001-01-01 as float64), data (0x4), ASCII string (0x5), UTF-16BE
string (0x6), UID (0x8, keyed-archiver references), arrays (0xA), sets
(0xC) and dicts (0xD, keyref-list then valref-list), each with the
0x0F extended-length escape (length itself a sized int object header).

Guards a from-spec reader owes that the stdlib's doesn't surface:
reference cycles raise (a malicious plist with a self-referential
array would recurse a naive reader to death), absurd nesting depth
raises, and every offset/ref is bounds-checked. Tear contract:
ValueError — and only ValueError — so the Spark exploder quarantines
per-row.

Ground truth: the host plistlib (CPython's writer) generates every
test artifact, our decode is compared object-for-object against
``plistlib.loads`` over the same bytes — and in the OTHER direction
hand-built byte sequences (including the 16-byte int and set markers
plistlib never writes) decode to their spec values
(tests/test_bplist.py).

Reference parity: the reference lake's schema-on-read ingest
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44) extended
by the north-star corpus mandate.
"""

from __future__ import annotations

import datetime
import struct

MAGIC = b"bplist0"

_EPOCH_2001 = datetime.datetime(2001, 1, 1)


def _uid(value: int):
    """CF keyed-archiver UIDs come back as plistlib.UID — the stdlib
    pin's own type, so parity comparisons are direct."""
    import plistlib

    return plistlib.UID(value)


def parse_bplist(data: bytes):
    """Decode a bplist00 blob to Python objects (plistlib-equivalent:
    dict/list/set/str/bytes/int/float/bool/None/datetime/UID)."""
    if data[: len(MAGIC)] != MAGIC:
        raise ValueError("bplist: bad magic")
    if len(data) < len(MAGIC) + 1 + 32:
        raise ValueError("bplist: shorter than trailer")
    try:
        (off_size, ref_size, n_objects, top, table_off) = struct.unpack(
            ">6xBBQQQ", data[-32:]
        )
        if off_size not in (1, 2, 4, 8) or ref_size not in (1, 2, 4, 8):
            raise ValueError("bplist: bad trailer int sizes")
        if n_objects == 0 or top >= n_objects:
            raise ValueError("bplist: bad object count / top index")
        end = table_off + n_objects * off_size
        if end > len(data) - 32:
            raise ValueError("bplist: offset table overruns trailer")
        offsets = [
            int.from_bytes(
                data[table_off + i * off_size : table_off
                     + (i + 1) * off_size], "big")
            for i in range(n_objects)
        ]
    except struct.error as e:
        raise ValueError("bplist: torn trailer") from e

    def read_ref(pos: int) -> tuple[int, int]:
        raw = data[pos : pos + ref_size]
        if len(raw) != ref_size:
            raise ValueError("bplist: ref overruns")
        return int.from_bytes(raw, "big"), pos + ref_size

    def read_sized_int(pos: int, nbytes: int, signed: bool) -> int:
        raw = data[pos : pos + nbytes]
        if len(raw) != nbytes:
            raise ValueError("bplist: int overruns")
        return int.from_bytes(raw, "big", signed=signed)

    def read_length(pos: int, low: int) -> tuple[int, int]:
        """Marker low nibble; 0x0F means a sized-int object follows."""
        if low != 0x0F:
            return low, pos
        m = data[pos]
        if m >> 4 != 0x1:
            raise ValueError("bplist: extended length is not an int")
        nbytes = 1 << (m & 0x0F)
        return read_sized_int(pos + 1, nbytes, False), pos + 1 + nbytes

    def obj(idx: int, active: frozenset, depth: int):
        if idx >= n_objects:
            raise ValueError("bplist: object ref out of range")
        if idx in active:
            raise ValueError("bplist: reference cycle")
        if depth > 64:
            raise ValueError("bplist: absurd nesting depth")
        pos = offsets[idx]
        if pos >= len(data) - 32:
            raise ValueError("bplist: object offset overruns")
        marker = data[pos]
        high, low = marker >> 4, marker & 0x0F
        pos += 1
        if high == 0x0:
            if low == 0x0:
                return None
            if low == 0x8:
                return False
            if low == 0x9:
                return True
            if low == 0xF:
                return None  # fill byte: tolerated as null
            raise ValueError("bplist: unknown simple marker %#x"
                             % marker)
        if high == 0x1:  # int, 2^low bytes; 8-byte is signed
            nbytes = 1 << low
            if nbytes > 16:
                raise ValueError("bplist: absurd int width")
            return read_sized_int(pos, nbytes, nbytes == 8)
        if high == 0x2:  # real
            if low == 2:
                return struct.unpack(">f", _take(pos, 4))[0]
            if low == 3:
                return struct.unpack(">d", _take(pos, 8))[0]
            raise ValueError("bplist: unknown real width")
        if high == 0x3:  # date
            if low != 3:
                raise ValueError("bplist: unknown date marker")
            secs = struct.unpack(">d", _take(pos, 8))[0]
            return _EPOCH_2001 + datetime.timedelta(seconds=secs)
        if high == 0x4:  # data
            n, pos = read_length(pos, low)
            return _take(pos, n)
        if high == 0x5:  # ascii string
            n, pos = read_length(pos, low)
            return _take(pos, n).decode("ascii", errors="strict")
        if high == 0x6:  # utf-16be string (n = CODE UNITS)
            n, pos = read_length(pos, low)
            return _take(pos, 2 * n).decode("utf-16-be")
        if high == 0x8:  # UID
            return _uid(read_sized_int(pos, low + 1, False))
        if high in (0xA, 0xC):  # array / set
            n, pos = read_length(pos, low)
            refs = []
            for _ in range(n):
                r, pos = read_ref(pos)
                refs.append(r)
            items = [obj(r, active | {idx}, depth + 1) for r in refs]
            if high == 0xC:
                try:
                    return set(items)
                except TypeError as e:
                    raise ValueError(
                        "bplist: unhashable set member") from e
            return items
        if high == 0xD:  # dict: all keyrefs then all valrefs
            n, pos = read_length(pos, low)
            krefs, vrefs = [], []
            for _ in range(n):
                r, pos = read_ref(pos)
                krefs.append(r)
            for _ in range(n):
                r, pos = read_ref(pos)
                vrefs.append(r)
            out = {}
            for kr, vr in zip(krefs, vrefs):
                k = obj(kr, active | {idx}, depth + 1)
                if not isinstance(k, (str, int, float, bytes)):
                    raise ValueError("bplist: unhashable dict key")
                out[k] = obj(vr, active | {idx}, depth + 1)
            return out
        raise ValueError("bplist: unknown marker %#x" % marker)

    def _take(pos: int, n: int) -> bytes:
        raw = data[pos : pos + n]
        if len(raw) != n:
            raise ValueError("bplist: object body overruns")
        return raw

    try:
        return obj(top, frozenset(), 0)
    except (UnicodeDecodeError, OverflowError) as e:
        raise ValueError("bplist: torn object (%s)" % e) from e


def sniff_bplist(data: bytes) -> bool:
    return data[: len(MAGIC)] == MAGIC
