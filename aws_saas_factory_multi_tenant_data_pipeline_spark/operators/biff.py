"""Legacy .xls (BIFF8) cell extraction — the spreadsheet half of the
pre-2007 office slice: the CFB container (operators/cfb.py) carries a
``Workbook`` stream of BIFF records.

Implemented from the PUBLIC [MS-XLS] specification: the record stream
(2-byte type + 2-byte length + payload), the workbook-globals
substream (BOF 0x0809 with the BIFF8 version word, BOUNDSHEET 0x0085
entries whose lbPlyPos points at each sheet substream, the shared
string table SST 0x00FC of XLUnicodeRichExtendedString entries — cch,
the flags byte with fHighByte/fRichSt/fExtSt, optional rich-run count
and ExtRst length, then 8-bit-compressed or UTF-16LE characters, rich
runs and ExtRst bytes trailing AFTER the characters), and the trap
this format is famous for: **CONTINUE (0x003C) records split the SST
anywhere — including mid-string — and the continuation fragment
RESTATES its own flags byte, so one string's characters can switch
between 8-bit and 16-bit encodings across the boundary.** A reader
that assumes one encoding per string corrupts every string after the
first split. Sheet substreams: LABELSST 0x00FD cells referencing SST
slots, NUMBER 0x0203 IEEE doubles, RK 0x027E with the 30-bit
RkNumber encoding (div-100 flag, integer flag), BLANK/EOF.

The fixture writer builds workbooks with every trap live: an SST
split mid-string by CONTINUE with the encoding SWITCHED on the
boundary, rich-text and ExtRst strings whose trailing payloads must
be stepped over (split across CONTINUE too), sheets referencing
shared slots out of order, RK numbers in all four encodings. No host
.xls artifact or reader exists (tests/test_realworld_r15.py tripwire,
shared with the CFB row).

Reference parity: the reference lake's schema-on-read ingest
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44). Tear
contract: ValueError — and only ValueError."""

from __future__ import annotations

import struct

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
    build_cfb,
    parse_cfb,
)

_BOF = 0x0809
_EOF_REC = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E


def _records(stream: bytes, start: int = 0):
    i = start
    n = len(stream)
    while i + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", stream, i)
        body = stream[i + 4 : i + 4 + rlen]
        if len(body) != rlen:
            raise ValueError("biff: record overruns stream")
        yield rtype, body, i
        i += 4 + rlen
        if rtype == _EOF_REC and start != 0:
            return


class _SSTReader:
    """Reads XLUnicodeRichExtendedStrings across CONTINUE boundaries.

    Holds the SST body plus every CONTINUE body as fragments; a read
    that exhausts one fragment moves to the next, and CHARACTER reads
    that cross a boundary re-read the new fragment's flags byte."""

    def __init__(self, fragments: list[bytes]):
        self.frags = fragments
        self.fi = 0
        self.pos = 0

    def _remain(self) -> int:
        return len(self.frags[self.fi]) - self.pos

    def _advance(self):
        while self.fi < len(self.frags) and self._remain() == 0:
            self.fi += 1
            self.pos = 0
        if self.fi >= len(self.frags):
            raise ValueError("biff: SST exhausted mid-string")

    def take(self, n: int) -> bytes:
        """Raw bytes that may span fragments (runs/ExtRst/lengths)."""
        out = bytearray()
        while n > 0:
            self._advance()
            chunk = min(n, self._remain())
            f = self.frags[self.fi]
            out += f[self.pos : self.pos + chunk]
            self.pos += chunk
            n -= chunk
        return bytes(out)

    def chars(self, cch: int, high: bool) -> str:
        """cch CHARACTERS; at each fragment boundary the continuation
        restates its own flags byte (the encoding may switch)."""
        out = []
        while cch > 0:
            self._advance()
            if self.pos == 0 and out:
                # continuation fragment: fresh grbit
                high = bool(self.take(1)[0] & 0x01)
                self._advance()
            width = 2 if high else 1
            avail = self._remain() // width
            if avail == 0 and self._remain() > 0:
                raise ValueError("biff: torn UTF-16 pair at boundary")
            take_n = min(cch, avail)
            raw = self.take(take_n * width)
            out.append(raw.decode("utf-16-le" if high else "latin-1"))
            cch -= take_n
        return "".join(out)

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.take(2))[0]
        flags = self.take(1)[0]
        high = bool(flags & 0x01)
        ext = bool(flags & 0x04)
        rich = bool(flags & 0x08)
        c_run = struct.unpack("<H", self.take(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", self.take(4))[0] if ext else 0
        s = self.chars(cch, high)
        if c_run:
            self.take(4 * c_run)
        if cb_ext:
            self.take(cb_ext)
        return s


def _decode_rk(raw: int) -> float | int:
    div100 = raw & 0x01
    is_int = raw & 0x02
    if is_int:
        v: float | int = raw >> 2
        if v & 0x20000000:  # 30-bit signed
            v -= 0x40000000
    else:
        v = struct.unpack("<d", struct.pack(
            "<Q", (raw & 0xFFFFFFFC) << 32))[0]
    if div100:
        v = v / 100
        if isinstance(v, float) and v.is_integer() and is_int:
            v = int(v)
    return v


def parse_xls(data: bytes) -> dict:
    """Extract cells from a legacy .xls: {sheets: [{name, cells}],
    n_sst} where cells is [(row, col, value)] in record order."""
    cfb = parse_cfb(data)
    wb = cfb["streams"].get("Workbook") or cfb["streams"].get("Book")
    if wb is None:
        raise ValueError("biff: no Workbook stream")
    try:
        return _parse_workbook(wb)
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise ValueError("biff: torn workbook (%s)" % e) from e


def _parse_workbook(wb: bytes) -> dict:
    sst: list[str] = []
    sheets_meta: list[tuple[str, int]] = []
    first = next(_records(wb), None)
    if first is None or first[0] != _BOF:
        raise ValueError("biff: globals substream missing BOF")
    if struct.unpack_from("<H", first[1], 0)[0] != 0x0600:
        raise ValueError("biff: not BIFF8")
    it = _records(wb)
    pending_sst: list[bytes] | None = None
    n_total = 0
    for rtype, body, off in it:
        if rtype == _SST:
            pending_sst = [body[8:]]
            n_total = struct.unpack_from("<I", body, 4)[0]
        elif rtype == _CONTINUE and pending_sst is not None:
            pending_sst.append(body)
        elif pending_sst is not None:
            rd = _SSTReader(pending_sst)
            for _ in range(n_total):
                sst.append(rd.read_string())
            pending_sst = None
        if rtype == _BOUNDSHEET:
            pos = struct.unpack_from("<I", body, 0)[0]
            cch = body[6]
            flags = body[7]
            raw = body[8:]
            if flags & 0x01:
                name = raw[: 2 * cch].decode("utf-16-le")
            else:
                name = raw[:cch].decode("latin-1")
            sheets_meta.append((name, pos))
        if rtype == _EOF_REC:
            if pending_sst is not None:
                rd = _SSTReader(pending_sst)
                for _ in range(n_total):
                    sst.append(rd.read_string())
            break
    sheets = []
    for name, pos in sheets_meta:
        cells: list[tuple[int, int, object]] = []
        sub = _records(wb, pos)
        head = next(sub, None)
        if head is None or head[0] != _BOF:
            raise ValueError("biff: sheet %r missing BOF" % name)
        for rtype, body, off in sub:
            if rtype == _LABELSST:
                rw, col, _, isst = struct.unpack_from("<HHHI", body, 0)
                if isst >= len(sst):
                    raise ValueError("biff: isst out of range")
                cells.append((rw, col, sst[isst]))
            elif rtype == _NUMBER:
                rw, col, _ = struct.unpack_from("<HHH", body, 0)
                cells.append((rw, col,
                              struct.unpack_from("<d", body, 6)[0]))
            elif rtype == _RK:
                rw, col, _ = struct.unpack_from("<HHH", body, 0)
                raw = struct.unpack_from("<I", body, 6)[0]
                cells.append((rw, col, _decode_rk(raw)))
            elif rtype == _EOF_REC:
                break
        sheets.append({"name": name, "cells": cells})
    return {"sheets": sheets, "n_sst": len(sst)}


# --- fixture writer --------------------------------------------------------


def _rec(rtype: int, body: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(body)) + body


def _xl_string(s: str, force_high: bool | None = None,
               rich_runs: int = 0, ext_bytes: int = 0) -> bytes:
    high = any(ord(c) > 0xFF for c in s) if force_high is None \
        else force_high
    flags = (0x01 if high else 0) | (0x08 if rich_runs else 0) | (
        0x04 if ext_bytes else 0)
    out = struct.pack("<HB", len(s), flags)
    if rich_runs:
        out += struct.pack("<H", rich_runs)
    if ext_bytes:
        out += struct.pack("<I", ext_bytes)
    out += s.encode("utf-16-le" if high else "latin-1")
    out += b"\xAA" * (4 * rich_runs)  # rich runs: stepped over
    out += b"\xBB" * ext_bytes        # ExtRst: stepped over
    return out


def build_xls(sheets: list[tuple[str, list[list]]],
              split_sst: bool = True, title: str = "") -> bytes:
    """Trap-laden BIFF8 workbook: string cells go through a SHARED
    SST whose serialization is split by a CONTINUE record mid-string
    with the encoding SWITCHED at the boundary (when split_sst and a
    multi-char string exists); every 3rd string is rich-text and
    every 4th carries ExtRst (trailing payloads that must be stepped
    over); numbers alternate NUMBER/RK records."""
    strings: list[str] = []
    index: dict[str, int] = {}
    for _, rows in sheets:
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in index:
                    index[v] = len(strings)
                    strings.append(v)

    # SST payload: first string straight; the split lands inside the
    # SECOND string's characters when asked
    entries = []
    for k, s in enumerate(strings):
        entries.append(_xl_string(
            s,
            rich_runs=2 if k % 3 == 2 else 0,
            ext_bytes=6 if k % 4 == 3 else 0,
        ))
    total = struct.pack("<II", len(strings), len(strings))
    sst_records = b""
    if split_sst and len(strings) >= 2 and len(strings[1]) >= 4:
        # rebuild string 1 to split after 2 chars, switching to
        # forced-high encoding in the continuation
        s1 = strings[1]
        part_a = struct.pack("<HB", len(s1), 0x00) + \
            s1[:2].encode("latin-1", errors="replace")
        part_b = b"\x01" + s1[2:].encode("utf-16-le")
        first = total + entries[0] + part_a
        cont = part_b + b"".join(entries[2:])
        sst_records = _rec(_SST, first) + _rec(_CONTINUE, cont)
    else:
        sst_records = _rec(_SST, total + b"".join(entries))

    bof = _rec(_BOF, struct.pack("<HHHIIH", 0x0600, 0x0005, 0x2775,
                                 0, 0, 0x0600))
    # layout: globals (BOF, SST, BOUNDSHEETs, EOF) then sheets
    bound_stub = []
    for name, _ in sheets:
        raw = name.encode("latin-1")
        bound_stub.append(_rec(_BOUNDSHEET,
                               struct.pack("<IHBB", 0, 0, len(raw), 0)
                               + raw))
    globals_blob = bof + sst_records + b"".join(bound_stub) + \
        _rec(_EOF_REC, b"")

    sheet_blobs = []
    for name, rows in sheets:
        blob = bof
        num_toggle = 0
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if isinstance(v, str):
                    blob += _rec(_LABELSST, struct.pack(
                        "<HHHI", r, c, 0x0F, index[v]))
                elif isinstance(v, (int, float)):
                    num_toggle += 1
                    as_int = isinstance(v, int)
                    if num_toggle % 2 and as_int and \
                            -(2**29) <= v < 2**29:
                        rk = ((v & 0x3FFFFFFF) << 2) | 0x02
                        blob += _rec(_RK, struct.pack(
                            "<HHHI", r, c, 0x0F, rk))
                    else:
                        blob += _rec(_NUMBER, struct.pack(
                            "<HHHd", r, c, 0x0F, float(v)))
        blob += _rec(_EOF_REC, b"")
        sheet_blobs.append(blob)

    # patch BOUNDSHEET positions now that the layout is known
    positions = []
    pos = len(globals_blob)
    for blob in sheet_blobs:
        positions.append(pos)
        pos += len(blob)
    fixed = bof + sst_records
    for stub, p in zip(bound_stub, positions):
        body = bytearray(stub[4:])
        struct.pack_into("<I", body, 0, p)
        fixed += _rec(_BOUNDSHEET, bytes(body))
    fixed += _rec(_EOF_REC, b"")
    if len(fixed) != len(globals_blob):
        raise ValueError("biff build: globals size drifted")
    workbook = fixed + b"".join(sheet_blobs)
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
        build_summary_information,
    )

    return build_cfb({
        "Workbook": workbook,
        "\x05SummaryInformation": build_summary_information(title),
    })
