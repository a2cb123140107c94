"""Raw Snappy block decompression — the default page codec of the
parquet world (parquet-cpp/parquet-mr both default to it) and the
block codec of Avro/Kafka/ORC deployments everywhere.

Implemented from the PUBLIC Snappy format description
(google/snappy's format_description.txt): a uvarint uncompressed-
length preamble, then tagged elements — 2-bit tag type: 00 literal
(6-bit length-minus-1, values 60-63 escaping to 1-4 little-endian
extra length bytes), 01 copy with 1-byte offset (3-bit length 4-11,
11-bit offset from the tag's high bits), 10 copy with 2-byte LE
offset (6-bit length 1-64), 11 copy with 4-byte LE offset. Copies
may OVERLAP their output (offset < length repeats bytes — the RLE
idiom), offset 0 is invalid, and the stream must produce exactly the
preamble's length. The companion encoder is a spec-valid greedy
matcher (hash of 4-byte groups, 2-byte-offset copies) used by
fixtures and sinks.

Ground truth: the REAL snappy library on this host via
``pyarrow.compress/decompress(codec='snappy')`` — our decoder is
pinned on real-snappy output across corpora and our encoder's output
round-trips through the real library byte-for-byte
(tests/test_snappy.py).

Reference parity: the reference lake's parquet surface
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44). Tear
contract: ValueError — and only ValueError."""

from __future__ import annotations


def snappy_decompress(data: bytes) -> bytes:
    try:
        # preamble: uvarint uncompressed length
        n = 0
        shift = 0
        i = 0
        while True:
            b = data[i]
            i += 1
            n |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 35:
                raise ValueError("snappy: preamble varint too long")
        if n > 1 << 32:
            raise ValueError("snappy: absurd uncompressed length")
        out = bytearray()
        dlen = len(data)
        while i < dlen:
            tag = data[i]
            i += 1
            ttype = tag & 3
            if ttype == 0:  # literal
                ln = tag >> 2
                if ln >= 60:
                    nb = ln - 59
                    ln = int.from_bytes(data[i : i + nb], "little")
                    if i + nb > dlen:
                        raise ValueError("snappy: torn literal len")
                    i += nb
                ln += 1
                if i + ln > dlen:
                    raise ValueError("snappy: literal overruns")
                out += data[i : i + ln]
                i += ln
                continue
            if ttype == 1:
                ln = ((tag >> 2) & 0x7) + 4
                off = ((tag >> 5) << 8) | data[i]
                i += 1
            elif ttype == 2:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[i : i + 2], "little")
                i += 2
            else:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[i : i + 4], "little")
                i += 4
            if off == 0 or off > len(out):
                raise ValueError("snappy: bad copy offset")
            # overlapping copies repeat produced bytes
            start = len(out) - off
            for k in range(ln):
                out.append(out[start + k])
        if len(out) != n:
            raise ValueError("snappy: length mismatch (%d != %d)"
                             % (len(out), n))
        return bytes(out)
    except IndexError as e:
        raise ValueError("snappy: torn stream") from e


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Spec-valid greedy encoder: 4-byte hash chains, 2-byte-offset
    copies (len 4..64, offset < 65536), literals elsewhere."""
    out = bytearray(_uvarint(len(data)))
    n = len(data)
    table: dict[int, int] = {}
    i = 0
    lit_start = 0

    def flush_literal(end: int):
        j = lit_start
        while j < end:
            ln = min(end - j, 1 << 16)
            if ln <= 60:
                out.append((ln - 1) << 2)
            else:
                nb = (ln - 1).bit_length() + 7 >> 3
                out.append((59 + nb) << 2)
                out.extend((ln - 1).to_bytes(nb, "little"))
            out.extend(data[j : j + ln])
            j += ln

    while i + 4 <= n:
        key = data[i : i + 4]
        h = hash(key)
        cand = table.get(h)
        table[h] = i
        if (cand is not None and i - cand < 65536
                and data[cand : cand + 4] == key):
            flush_literal(i)
            off = i - cand
            ln = 4
            while (i + ln < n and ln < 64
                   and data[cand + ln] == data[i + ln]):
                ln += 1
            out.append(((ln - 1) << 2) | 2)
            out += off.to_bytes(2, "little")
            i += ln
            lit_start = i
        else:
            i += 1
    flush_literal(n)
    return bytes(out)
