"""Compound File Binary (CFB / OLE2) container walk + legacy .doc
text extraction — the storage format of the entire pre-2007 Microsoft
world: .doc/.xls/.ppt, .msi installers, .msg Outlook messages, VBA
project storages. A crawl's legacy-office slice ships in this
container; today those bytes land as unknown binaries.

CFB implemented from the PUBLIC [MS-CFB] specification: the 512-byte
header (magic D0CF11E0A1B11AE1, major version 3/4 selecting 512/4096
sector size, the 0xFFFE little-endian byte-order mark, sector/mini
shifts, mini-stream cutoff 4096), the DIFAT (109 header entries plus
the chained DIFAT sectors whose LAST entry links the next DIFAT
sector), the FAT with its reserved sentinels (FREESECT/ENDOFCHAIN/
FATSECT/DIFSECT), the 128-byte directory entries (UTF-16LE names with
byte-length field, object types stream/storage/root, red-black sibling
tree walked as a tree — NOT a linear scan, so orphaned/freed entries
stay invisible exactly like real readers), and the mini stream:
streams under the cutoff live in 64-byte mini sectors chained through
the miniFAT, the mini stream itself being the root entry's regular
stream. Cycle guards on every chain (FAT, miniFAT, DIFAT, sibling
tree); torn chains raise.

Legacy .doc text implemented from the PUBLIC [MS-DOC] specification:
the FIB (wIdent 0xA5EC, the fWhichTblStm bit at 0x000A selecting the
``0Table``/``1Table`` stream), fcClx/lcbClx in FibRgFcLcb97 (bytes
0x01A2/0x01A6 of the WordDocument stream), the Clx walk (Prc
property-modifier blocks skipped, the Pcdt's PlcPcd extracted), and
the PIECE TABLE — the trap this format is famous for: a fast-saved
document's text lives in NON-CONTIGUOUS pieces in ARBITRARY file
order, each PCD's fc carrying the fCompressed bit 30 that switches
the piece between 8-bit cp1252-at-fc/2 and UTF-16LE-at-fc. A "read
bytes after the header" extractor returns shuffled mojibake; the
piece-table walk returns the document. Word's control characters map
per spec (0x0D paragraph mark → newline, 0x07 cell/row mark →
tab/newline, 0x0B line break → newline; field/object markers 0x13/
0x14/0x15/0x01/0x08 dropped).

No CFB artifact or reader exists on this host (no olefile/libgsf/
LibreOffice; verified by search) — the pin discipline follows the
OOXML/RTF precedent: the fixture writer builds spec-literal containers
(both sector sizes, mini + regular + DIFAT-chained streams, red-black
sibling ordering by the spec's length-then-uppercase-name rule,
fast-save piece shuffles) and the visible-gap tripwire in
tests/test_realworld_r15.py fails the moment a real artifact appears.

Reference parity: the reference lake's schema-on-read ingest
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44) extended
by the north-star text-pipeline mandate. Tear contract: ValueError —
and only ValueError — so the Spark exploder quarantines per-row.
"""

from __future__ import annotations

import struct

MAGIC_CFB = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_NOSTREAM = 0xFFFFFFFF

_MINI_CUTOFF = 4096
_MINI_SECTOR = 64


def parse_cfb(data: bytes) -> dict:
    """Parse a CFB container: {version, sector_size, streams} where
    streams maps 'path/like/names' → bytes (storages become path
    separators; the root's own stream — the mini stream — is
    internal and not listed)."""
    if data[:8] != MAGIC_CFB:
        raise ValueError("cfb: bad magic")
    try:
        return _parse(data)
    except (struct.error, IndexError, UnicodeDecodeError) as e:
        raise ValueError("cfb: torn container (%s)" % e) from e


def _parse(data: bytes) -> dict:
    (major, byte_order, sshift, mshift) = struct.unpack_from(
        "<HHHH", data, 26)
    if byte_order != 0xFFFE:
        raise ValueError("cfb: bad byte-order mark %#x" % byte_order)
    if major not in (3, 4) or sshift not in (9, 12) or mshift != 6:
        raise ValueError("cfb: unsupported version/shift")
    if (major == 3) != (sshift == 9):
        raise ValueError("cfb: version/sector-shift mismatch")
    ssize = 1 << sshift
    (n_fat, first_dir, _, cutoff, first_minifat, n_minifat,
     first_difat, n_difat) = struct.unpack_from("<44xI I I I I I I I",
                                                data, 0)
    if cutoff != _MINI_CUTOFF:
        raise ValueError("cfb: nonstandard mini cutoff %d" % cutoff)

    def sector(n: int) -> bytes:
        # sector n starts at (n+1)*ssize in BOTH versions — the v4
        # header sector is the 512-byte header padded to 4096
        off = (n + 1) * ssize
        raw = data[off : off + ssize]
        if len(raw) < ssize:
            raise ValueError("cfb: sector %d out of range" % n)
        return raw

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat: list[int] = list(struct.unpack_from("<109I", data, 76))
    seen = set()
    nxt = first_difat
    per = ssize // 4 - 1
    while nxt != _ENDOFCHAIN and nxt != _FREESECT:
        if nxt in seen or len(seen) > n_difat + 2:
            raise ValueError("cfb: DIFAT chain cycle")
        seen.add(nxt)
        raw = sector(nxt)
        entries = struct.unpack("<%dI" % (ssize // 4), raw)
        difat.extend(entries[:per])
        nxt = entries[-1]
    fat_sectors = [s for s in difat[:n_fat] if s != _FREESECT]
    if len(fat_sectors) != n_fat:
        raise ValueError("cfb: DIFAT shorter than FAT count")

    fat: list[int] = []
    for s in fat_sectors:
        fat.extend(struct.unpack("<%dI" % (ssize // 4), sector(s)))

    def chain(start: int, what: str) -> list[int]:
        out = []
        cur = start
        while cur != _ENDOFCHAIN:
            if cur >= len(fat) or cur in (
                    _FREESECT, _FATSECT, _DIFSECT):
                raise ValueError("cfb: %s chain torn at %#x"
                                 % (what, cur))
            out.append(cur)
            if len(out) > len(fat) + 1:
                raise ValueError("cfb: %s chain cycle" % what)
            cur = fat[cur]
        return out

    # directory
    dir_raw = b"".join(sector(s) for s in chain(first_dir, "dir"))
    entries = []
    for off in range(0, len(dir_raw), 128):
        e = dir_raw[off : off + 128]
        if len(e) < 128:
            break
        name_len = struct.unpack_from("<H", e, 64)[0]
        otype = e[66]
        if otype == 0 or name_len < 2 or name_len > 64:
            entries.append(None)
            continue
        name = e[: name_len - 2].decode("utf-16-le")
        left, right, child = struct.unpack_from("<III", e, 68)
        start, size = struct.unpack_from("<IQ", e, 116)
        if major == 3:
            size &= 0xFFFFFFFF  # v3 writers may leave garbage high bits
        entries.append({
            "name": name, "type": otype, "left": left,
            "right": right, "child": child, "start": start,
            "size": size,
        })
    if not entries or entries[0] is None or entries[0]["type"] != 5:
        raise ValueError("cfb: missing root entry")
    root = entries[0]

    # miniFAT + mini stream (the root's regular chain)
    minifat: list[int] = []
    if n_minifat and first_minifat != _ENDOFCHAIN:
        for s in chain(first_minifat, "miniFAT")[:n_minifat]:
            minifat.extend(struct.unpack("<%dI" % (ssize // 4),
                                         sector(s)))
    mini_raw = b""
    if root["start"] != _ENDOFCHAIN and root["size"]:
        mini_raw = b"".join(
            sector(s) for s in chain(root["start"], "ministream")
        )[: root["size"]]

    def read_stream(entry: dict) -> bytes:
        size = entry["size"]
        if size == 0:
            return b""
        if size < _MINI_CUTOFF:
            out = []
            cur = entry["start"]
            hops = 0
            while cur != _ENDOFCHAIN:
                if cur >= len(minifat) or cur == _FREESECT:
                    raise ValueError("cfb: mini chain torn")
                off = cur * _MINI_SECTOR
                if off + _MINI_SECTOR > len(mini_raw):
                    raise ValueError("cfb: mini sector out of range")
                out.append(mini_raw[off : off + _MINI_SECTOR])
                hops += 1
                if hops > len(minifat) + 1:
                    raise ValueError("cfb: mini chain cycle")
                cur = minifat[cur]
            return b"".join(out)[:size]
        return b"".join(
            sector(s) for s in chain(entry["start"], entry["name"])
        )[:size]

    # walk the red-black sibling tree from the root's child
    streams: dict[str, bytes] = {}

    def walk(idx: int, prefix: str, depth: int, active: frozenset):
        if idx == _NOSTREAM:
            return
        if idx in active or depth > 256:
            raise ValueError("cfb: directory tree cycle")
        if idx >= len(entries) or entries[idx] is None:
            raise ValueError("cfb: sibling ref to dead entry")
        e = entries[idx]
        nxt = active | {idx}
        walk(e["left"], prefix, depth + 1, nxt)
        if e["type"] == 2:
            streams[prefix + e["name"]] = read_stream(e)
        elif e["type"] == 1:
            walk(e["child"], prefix + e["name"] + "/", depth + 1, nxt)
        else:
            raise ValueError("cfb: unexpected entry type %d"
                             % e["type"])
        walk(e["right"], prefix, depth + 1, nxt)

    walk(root["child"], "", 0, frozenset())
    return {
        "version": major,
        "sector_size": ssize,
        "streams": streams,
    }


# --- legacy .doc text ------------------------------------------------------


_WORD_CTRL_DROP = {0x13, 0x14, 0x15, 0x01, 0x08, 0x28, 0x05}


def _map_word_text(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if o == 0x0D or o == 0x0B:
            out.append("\n")
        elif o == 0x07:
            out.append("\n")  # cell/row mark ends a table unit
        elif o == 0x1E:
            out.append("-")
        elif o == 0x1F:
            out.append("")  # soft hyphen
        elif o == 0xA0:
            out.append(" ")
        elif o in _WORD_CTRL_DROP or o < 0x20 and o != 0x09:
            continue
        else:
            out.append(ch)
    return "".join(out)


def parse_doc(data: bytes) -> dict:
    """Extract text from a legacy .doc (CFB + WordDocument/xTable).

    Returns {text, n_pieces, table_stream, title} — the title from
    the \x05SummaryInformation property set when present."""
    cfb = parse_cfb(data)
    streams = cfb["streams"]
    title = None
    si = streams.get("\x05SummaryInformation")
    if si:
        title = parse_summary_information(si)["title"]
    wd = streams.get("WordDocument")
    if wd is None:
        raise ValueError("doc: no WordDocument stream")
    if len(wd) < 0x01AA:
        raise ValueError("doc: WordDocument shorter than FIB")
    ident = struct.unpack_from("<H", wd, 0)[0]
    if ident != 0xA5EC:
        raise ValueError("doc: bad FIB wIdent %#x" % ident)
    flags = struct.unpack_from("<H", wd, 0x000A)[0]
    which = (flags >> 9) & 1  # fWhichTblStm
    tname = "1Table" if which else "0Table"
    table = streams.get(tname)
    if table is None:
        raise ValueError("doc: missing %s stream" % tname)
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, 0x01A2)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise ValueError("doc: Clx out of range")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # Clx: Prc blocks (clxt=1) then one Pcdt (clxt=2)
    i = 0
    while i < len(clx):
        clxt = clx[i]
        if clxt == 1:  # Prc: cbGrpprl (2 bytes) + payload
            if i + 3 > len(clx):
                raise ValueError("doc: torn Prc")
            cb = struct.unpack_from("<H", clx, i + 1)[0]
            i += 3 + cb
        elif clxt == 2:  # Pcdt
            if i + 5 > len(clx):
                raise ValueError("doc: torn Pcdt")
            lcb = struct.unpack_from("<I", clx, i + 1)[0]
            plc = clx[i + 5 : i + 5 + lcb]
            if len(plc) != lcb:
                raise ValueError("doc: PlcPcd overruns Clx")
            out = _read_pieces(wd, plc)
            out["title"] = title
            out["table_stream"] = tname
            return out
        else:
            raise ValueError("doc: unknown clxt %d" % clxt)
    raise ValueError("doc: Clx has no Pcdt")


def _read_pieces(wd: bytes, plc: bytes) -> dict:
    # PlcPcd: (n+1) CPs (4 bytes) + n PCDs (8 bytes): n from length
    if (len(plc) - 4) % 12:
        raise ValueError("doc: PlcPcd size not 12n+4")
    n = (len(plc) - 4) // 12
    if n <= 0:
        raise ValueError("doc: empty piece table")
    cps = struct.unpack_from("<%dI" % (n + 1), plc, 0)
    texts = []
    for k in range(n):
        ncp = cps[k + 1] - cps[k]
        if ncp < 0:
            raise ValueError("doc: CPs not monotone")
        pcd = plc[4 * (n + 1) + 8 * k : 4 * (n + 1) + 8 * k + 8]
        fc_raw = struct.unpack_from("<I", pcd, 2)[0]
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            start = fc // 2
            raw = wd[start : start + ncp]
            if len(raw) != ncp:
                raise ValueError("doc: 8-bit piece out of range")
            texts.append(raw.decode("cp1252", errors="replace"))
        else:
            raw = wd[fc : fc + 2 * ncp]
            if len(raw) != 2 * ncp:
                raise ValueError("doc: 16-bit piece out of range")
            texts.append(raw.decode("utf-16-le"))
    text = _map_word_text("".join(texts))
    # the document's final paragraph mark is structural
    return {"text": text.rstrip("\n"), "n_pieces": n}


# --- fixture writers -------------------------------------------------------


def _dir_name_key(name: str) -> tuple:
    """[MS-CFB] directory ordering: shorter names first, then
    case-insensitive (uppercase) comparison."""
    return (len(name), name.upper())


def _build_tree(names: list[str]) -> dict[str, tuple[int, int]]:
    """Balanced BST over spec-ordered names → {name: (left, right)}
    with indexes INTO the given list; returns also the root via the
    special key ''."""
    order = sorted(range(len(names)), key=lambda i: _dir_name_key(names[i]))
    links: dict[int, list[int]] = {i: [_NOSTREAM, _NOSTREAM] for i in range(len(names))}

    def build(lo: int, hi: int) -> int:
        if lo > hi:
            return _NOSTREAM
        mid = (lo + hi) // 2
        idx = order[mid]
        links[idx][0] = build(lo, mid - 1)
        links[idx][1] = build(mid + 1, hi)
        return idx

    root = build(0, len(order) - 1)
    out = {names[i]: (links[i][0], links[i][1]) for i in range(len(names))}
    out[""] = (root, _NOSTREAM)
    return out


def build_cfb(streams: dict[str, bytes], version: int = 3) -> bytes:
    """Spec-literal CFB writer for fixtures: v3 (512) or v4 (4096)
    sectors, mini-stream placement for streams under the 4096 cutoff,
    balanced red-black-shaped sibling trees in spec order, storages
    from '/'-separated names, DIFAT chaining when the FAT outgrows
    the 109 header slots."""
    ssize = 512 if version == 3 else 4096
    per = ssize // 4

    # --- directory entries (flat list; storages from path prefixes)
    # entry 0 = root; then one entry per storage / stream
    tree: dict[str, dict] = {}  # storage path -> {child names}
    flat: list[tuple[str, str, bytes | None]] = []  # (path, name, data|None)
    storages: list[str] = []
    for path in streams:
        parts = path.split("/")
        for d in range(1, len(parts)):
            sp = "/".join(parts[:d])
            if sp not in storages:
                storages.append(sp)
    for sp in storages:
        flat.append((sp, sp.split("/")[-1], None))
    for path, payload in streams.items():
        flat.append((path, path.split("/")[-1], payload))

    # mini vs regular payload pools
    mini_pool = bytearray()
    mini_chains: dict[str, int] = {}
    minifat: list[int] = []
    for path, _, payload in flat:
        if payload is not None and 0 < len(payload) < _MINI_CUTOFF:
            start = len(minifat)
            nsec = (len(payload) + _MINI_SECTOR - 1) // _MINI_SECTOR
            for k in range(nsec):
                minifat.append(start + k + 1 if k < nsec - 1
                               else _ENDOFCHAIN)
            mini_chains[path] = start
            mini_pool += payload
            pad = (-len(payload)) % _MINI_SECTOR
            mini_pool += b"\x00" * pad

    # --- regular sectors: big streams, mini stream, minifat, dir, fat
    sectors: list[bytes] = []

    def add_stream(payload: bytes) -> int:
        start = len(sectors)
        for off in range(0, len(payload), ssize):
            chunk = payload[off : off + ssize]
            sectors.append(chunk + b"\x00" * (ssize - len(chunk)))
        return start

    fat_links: dict[int, int] = {}

    def chain_of(start: int, nsec: int):
        for k in range(nsec):
            fat_links[start + k] = (start + k + 1 if k < nsec - 1
                                    else _ENDOFCHAIN)

    big_chains: dict[str, int] = {}
    for path, _, payload in flat:
        if payload is not None and len(payload) >= _MINI_CUTOFF:
            s = add_stream(payload)
            chain_of(s, (len(payload) + ssize - 1) // ssize)
            big_chains[path] = s

    mini_start = _ENDOFCHAIN
    if mini_pool:
        mini_start = add_stream(bytes(mini_pool))
        chain_of(mini_start,
                 (len(mini_pool) + ssize - 1) // ssize)

    minifat_start, n_minifat_sec = _ENDOFCHAIN, 0
    if minifat:
        raw = b"".join(struct.pack("<I", v) for v in minifat)
        minifat_start = add_stream(raw)
        n_minifat_sec = (len(raw) + ssize - 1) // ssize
        chain_of(minifat_start, n_minifat_sec)

    # --- directory sector(s)
    names = [name for _, name, _ in flat]
    # sibling trees are PER STORAGE: group children by parent
    children: dict[str, list[int]] = {"": []}
    for i, (path, name, _) in enumerate(flat):
        parent = "/".join(path.split("/")[:-1])
        children.setdefault(parent, []).append(i)

    entry_links = [[_NOSTREAM, _NOSTREAM, _NOSTREAM]
                   for _ in range(len(flat) + 1)]  # +1 root at dir idx 0

    def wire(parent: str) -> int:
        kids = children.get(parent, [])
        if not kids:
            return _NOSTREAM
        kid_names = [flat[i][1] for i in kids]
        links = _build_tree(kid_names)
        for i in kids:
            ln, rn = links[flat[i][1]]
            entry_links[i + 1][0] = kids[ln] + 1 if ln != _NOSTREAM else _NOSTREAM
            entry_links[i + 1][1] = kids[rn] + 1 if rn != _NOSTREAM else _NOSTREAM
        root_local = links[""][0]
        return kids[root_local] + 1

    root_child = wire("")
    for sp in storages:
        idx = next(i for i, (p, _, d) in enumerate(flat)
                   if p == sp and d is None)
        entry_links[idx + 1][2] = wire(sp)

    def dir_entry(name: str, otype: int, left: int, right: int,
                  child: int, start: int, size: int,
                  color: int = 1) -> bytes:
        nm = name.encode("utf-16-le")
        if len(nm) > 62:
            raise ValueError("cfb build: name too long")
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = otype
        e[67] = color
        struct.pack_into("<III", e, 68, left, right, child)
        struct.pack_into("<IQ", e, 116, start, size)
        return bytes(e)

    entries = [dir_entry("Root Entry", 5, _NOSTREAM, _NOSTREAM,
                         root_child, mini_start, len(mini_pool))]
    for i, (path, name, payload) in enumerate(flat):
        left, right, child = entry_links[i + 1]
        if payload is None:
            entries.append(dir_entry(name, 1, left, right, child,
                                     0, 0))
        elif len(payload) == 0:
            entries.append(dir_entry(name, 2, left, right, _NOSTREAM,
                                     _ENDOFCHAIN, 0))
        elif len(payload) < _MINI_CUTOFF:
            entries.append(dir_entry(name, 2, left, right, _NOSTREAM,
                                     mini_chains[path], len(payload)))
        else:
            entries.append(dir_entry(name, 2, left, right, _NOSTREAM,
                                     big_chains[path], len(payload)))
    dir_raw = b"".join(entries)
    first_dir = add_stream(dir_raw)
    chain_of(first_dir, (len(dir_raw) + ssize - 1) // ssize)

    # --- FAT (+DIFAT chaining if needed); iterate because FAT/DIFAT
    # sectors are themselves in the FAT
    n_data = len(sectors)
    n_fat = 0
    n_difat = 0
    while True:
        total = n_data + n_fat + n_difat
        need_fat = (total + per - 1) // per
        need_difat = 0 if need_fat <= 109 else (
            (need_fat - 109) + (per - 1) - 1) // (per - 1)
        if need_fat == n_fat and need_difat == n_difat:
            break
        n_fat, n_difat = need_fat, need_difat
    fat_start = n_data
    difat_start = n_data + n_fat
    fat = []
    for i in range(n_data + n_fat + n_difat):
        if i in fat_links:
            fat.append(fat_links[i])
        elif fat_start <= i < difat_start:
            fat.append(_FATSECT)
        elif i >= difat_start:
            fat.append(_DIFSECT)
        else:
            raise ValueError("cfb build: orphan sector %d" % i)
    fat += [_FREESECT] * (n_fat * per - len(fat))
    fat_sector_ids = list(range(fat_start, fat_start + n_fat))
    for k, sid in enumerate(fat_sector_ids):
        raw = b"".join(struct.pack("<I", v)
                       for v in fat[k * per : (k + 1) * per])
        sectors.append(raw)
    # DIFAT sectors carry FAT ids 109.. plus the next-DIFAT link
    difat_entries = fat_sector_ids[109:]
    for k in range(n_difat):
        part = difat_entries[k * (per - 1) : (k + 1) * (per - 1)]
        part += [_FREESECT] * ((per - 1) - len(part))
        nxt = difat_start + k + 1 if k < n_difat - 1 else _ENDOFCHAIN
        sectors.append(b"".join(struct.pack("<I", v)
                                for v in part + [nxt]))

    header = bytearray(512)
    header[:8] = MAGIC_CFB
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, version)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9 if version == 3 else 12)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, _MINI_CUTOFF)
    struct.pack_into("<I", header, 60,
                     minifat_start if minifat else _ENDOFCHAIN)
    struct.pack_into("<I", header, 64, n_minifat_sec)
    struct.pack_into("<I", header, 68,
                     difat_start if n_difat else _ENDOFCHAIN)
    struct.pack_into("<I", header, 72, n_difat)
    for k in range(109):
        struct.pack_into("<I", header, 76 + 4 * k,
                         fat_sector_ids[k] if k < len(fat_sector_ids)
                         else _FREESECT)
    out = bytes(header)
    if version == 4:
        out += b"\x00" * (4096 - 512)
    return out + b"".join(sectors)


def build_doc(paragraphs: list[str], title: str = "",
              fast_save: bool = True) -> bytes:
    """Legacy .doc fixture: FIB + piece-table text in the trap-laden
    fast-save shape — pieces alternate 8-bit cp1252 / 16-bit UTF-16LE
    and are stored in REVERSED file order, so a read-after-header
    extractor produces shuffled mojibake; a decoy 0Table full of
    0xEE bytes punishes readers that ignore fWhichTblStm."""
    text = "\r".join(paragraphs) + "\r"
    # split into pieces at word-ish boundaries, ~19 chars
    pieces: list[str] = []
    step = 19
    for i in range(0, len(text), step):
        pieces.append(text[i : i + step])
    if not fast_save and len(pieces) > 1:
        pieces = ["".join(pieces)]
    enc: list[tuple[bytes, bool]] = []
    for k, p in enumerate(pieces):
        as8 = k % 2 == 0 and all(
            c == "\r" or 0x20 <= ord(c) < 0x100 for c in p)
        if as8:
            enc.append((p.encode("cp1252"), True))
        else:
            enc.append((p.encode("utf-16-le"), False))

    fib_len = 0x0600
    wd = bytearray(fib_len)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)  # nFib: Word 97
    struct.pack_into("<H", wd, 0x000A, 1 << 9)  # fWhichTblStm=1
    # store pieces in REVERSED order after the FIB
    offsets: list[int] = [0] * len(enc)
    pos = fib_len
    order = list(reversed(range(len(enc)))) if fast_save else [0]
    body = bytearray()
    for k in order:
        offsets[k] = pos + len(body)
        body += enc[k][0]
    wd = bytes(wd) + bytes(body)

    # PlcPcd: CPs then PCDs
    cps = [0]
    for p in pieces:
        cps.append(cps[-1] + len(p))
    plc = b"".join(struct.pack("<I", c) for c in cps)
    for k, (raw, compressed) in enumerate(enc):
        fc = offsets[k]
        fcr = (fc * 2) | 0x40000000 if compressed else fc
        plc += b"\x00\x00" + struct.pack("<I", fcr) + b"\x00\x00"
    clx = b"\x01\x06\x00" + b"\xCC" * 6  # a Prc to skip first
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc
    table = b"\x00" * 64 + clx  # Clx not at offset 0: fcClx matters
    wd2 = bytearray(wd)
    struct.pack_into("<II", wd2, 0x01A2, 64, len(clx))
    return build_cfb({
        "WordDocument": bytes(wd2),
        "1Table": table,
        "0Table": b"\xEE" * 128,  # decoy: wrong-table readers tear
        "\x05SummaryInformation": build_summary_information(
            title, author="fixture"),
    })


# --- [MS-OLEPS] SummaryInformation (title/author metadata) -----------------


_VT_I2 = 2
_VT_I4 = 3
_VT_LPSTR = 30
_VT_LPWSTR = 31
_VT_FILETIME = 64

_PIDSI_TITLE = 0x02
_PIDSI_AUTHOR = 0x04
_PID_CODEPAGE = 0x01


def parse_summary_information(stream: bytes) -> dict:
    """Minimal [MS-OLEPS] property-set reader for the
    \\x05SummaryInformation stream: byte-order mark, the first
    section's (propID, offset) table, and the VT types the summary
    set actually carries (I2/I4/LPSTR-with-codepage/LPWSTR/FILETIME).
    Returns {title, author, codepage}."""
    try:
        border = struct.unpack_from("<H", stream, 0)[0]
        if border != 0xFFFE:
            raise ValueError("oleps: bad byte order")
        c_sections = struct.unpack_from("<I", stream, 24)[0]
        if c_sections < 1:
            raise ValueError("oleps: no sections")
        sec_off = struct.unpack_from("<I", stream, 28 + 16)[0]
        _, n_props = struct.unpack_from("<II", stream, sec_off)
        props: dict[int, int] = {}
        for k in range(n_props):
            pid, off = struct.unpack_from("<II",
                                          stream, sec_off + 8 + 8 * k)
            props[pid] = sec_off + off
        codepage = 1252

        def value(pid: int):
            off = props.get(pid)
            if off is None:
                return None
            vt = struct.unpack_from("<H", stream, off)[0]
            body = off + 4
            if vt == _VT_I2:
                return struct.unpack_from("<h", stream, body)[0]
            if vt == _VT_I4:
                return struct.unpack_from("<i", stream, body)[0]
            if vt == _VT_LPSTR:
                n = struct.unpack_from("<I", stream, body)[0]
                raw = stream[body + 4 : body + 4 + n]
                if len(raw) != n:
                    raise ValueError("oleps: LPSTR overruns")
                enc = "utf-8" if codepage == 65001 else \
                    "cp%d" % codepage
                try:
                    return raw.split(b"\x00", 1)[0].decode(
                        enc, errors="replace")
                except LookupError as e:
                    raise ValueError("oleps: unknown codepage %d"
                                     % codepage) from e
            if vt == _VT_LPWSTR:
                n = struct.unpack_from("<I", stream, body)[0]
                raw = stream[body + 4 : body + 4 + 2 * n]
                return raw.decode("utf-16-le").split("\x00", 1)[0]
            if vt == _VT_FILETIME:
                return struct.unpack_from("<Q", stream, body)[0]
            raise ValueError("oleps: unsupported VT %d" % vt)

        cp = value(_PID_CODEPAGE)
        if isinstance(cp, int) and cp != 0:
            # 65001 (utf-8) reads as a NEGATIVE VT_I2: mask to u16
            codepage = cp & 0xFFFF
        title = value(_PIDSI_TITLE)
        author = value(_PIDSI_AUTHOR)
        return {"title": title, "author": author, "codepage": codepage}
    except (struct.error, IndexError) as e:
        raise ValueError("oleps: torn property set (%s)" % e) from e


def build_summary_information(title: str, author: str = "",
                              codepage: int = 1252) -> bytes:
    """Spec-literal SummaryInformation writer (VT_LPSTR strings in
    the declared codepage, the codepage itself as VT_I2)."""
    fmtid = bytes.fromhex("e0859ff2f94f6810ab9108002b27b3d9")
    enc = "cp%d" % codepage

    def lpstr(s: str) -> bytes:
        raw = s.encode(enc) + b"\x00"
        return struct.pack("<HHI", _VT_LPSTR, 0, len(raw)) + raw + \
            b"\x00" * ((-len(raw)) % 4)

    props = [
        (_PID_CODEPAGE, struct.pack("<HHh2x", _VT_I2, 0, codepage)),
        (_PIDSI_TITLE, lpstr(title)),
        (_PIDSI_AUTHOR, lpstr(author)),
    ]
    head_len = 8 + 8 * len(props)
    bodies = []
    offs = []
    pos = head_len
    for _, body in props:
        offs.append(pos)
        bodies.append(body)
        pos += len(body)
    section = struct.pack("<II", pos, len(props))
    for (pid, _), off in zip(props, offs):
        section += struct.pack("<II", pid, off)
    section += b"".join(bodies)
    header = struct.pack("<HHI16sI", 0xFFFE, 0, 0x00020005,
                         b"\x00" * 16, 1)
    header += fmtid + struct.pack("<I", len(header) + 16 + 4)
    return header + section
