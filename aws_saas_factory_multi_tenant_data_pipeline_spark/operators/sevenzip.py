""".7z container walk (r14 verdict "Next round" #4) — the third big
archive/dump distribution shape after zip/tar (Wikipedia dumps, game
corpora, Windows-world datasets ship as .7z).

Implemented from the PUBLIC 7z format documentation (7-Zip's
DOC/7zFormat.txt, shipped with p7zip): the 32-byte signature header
(magic ``7z\\xBC\\xAF\\x27\\x1C`` + start-header CRC + next-header
offset/size/CRC), REAL_UINT64 variable-length numbers, the property-ID
tree (kHeader/kMainStreamsInfo/kPackInfo/kUnpackInfo/kSubStreamsInfo/
kFilesInfo), folders of coders chained by bind pairs, the
EncodedHeader indirection (the header itself LZMA-compressed — the
default for every real 7z writer), empty-stream/empty-file bit
vectors, UTF-16LE names, and per-substream CRC32 verification.

Coders in scope (the from-spec LZMA core already exists in
operators/xz.py): Copy (00), LZMA2 (21), LZMA (030101), Delta (03)
and BCJ x86 (03030103) pre-filters (reused from xz.py), plus the
stdlib-backed BZip2 (040202) and Deflate (040108) — the bz2/gzip
shard-codec precedent. Encrypted archives (AES-256, 06F10701) and
other coders raise a NAMED ValueError — fail-visible, never silent.

Ground truth: a REAL p7zip-written archive (libarchive's conda test
artifact) parses member-for-member, and every fixture shape is
cross-checked against the host ``libarchive.so`` 7z reader via ctypes
in tests/test_realworld_r15.py.

Reference parity: the reference lake ingests tenant-uploaded bundles
schema-on-read (src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:
32-44); the archive router (operators/archives.py) routes ``.7z``
here. Tear contract: ValueError — and only ValueError — so the Spark
exploder quarantines per-row.
"""

from __future__ import annotations

import struct
import zlib

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xz import (
    bcj_x86,
    delta_decode,
    lzma2_decompress,
    lzma_raw_decompress,
)

MAGIC_7Z = b"7z\xbc\xaf\x27\x1c"

# property IDs (7zFormat.txt)
_K_END = 0x00
_K_HEADER = 0x01
_K_MAIN_STREAMS = 0x04
_K_FILES_INFO = 0x05
_K_PACK_INFO = 0x06
_K_UNPACK_INFO = 0x07
_K_SUBSTREAMS = 0x08
_K_SIZE = 0x09
_K_CRC = 0x0A
_K_FOLDER = 0x0B
_K_UNPACK_SIZE = 0x0C
_K_NUM_UNPACK_STREAM = 0x0D
_K_EMPTY_STREAM = 0x0E
_K_EMPTY_FILE = 0x0F
_K_NAME = 0x11
_K_ENCODED_HEADER = 0x17

_CODEC_COPY = b"\x00"
_CODEC_DELTA = b"\x03"
_CODEC_LZMA2 = b"\x21"
_CODEC_LZMA = b"\x03\x01\x01"
_CODEC_BCJ_X86 = b"\x03\x03\x01\x03"
_CODEC_DEFLATE = b"\x04\x01\x08"
_CODEC_BZIP2 = b"\x04\x02\x02"
_CODEC_AES256 = b"\x06\xf1\x07\x01"

#: declared output bound per folder — the 42.zip convention
#: (archives.MAX_MEMBER_BYTES gates members; this gates the folder)
MAX_FOLDER_BYTES = 1 << 30


class _Rd:
    """Bounds-checked little reader over the header bytes."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("torn 7z header")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("torn 7z header")
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def number(self) -> int:
        """REAL_UINT64: the first byte's high bits say how many extra
        LE bytes follow (7zFormat.txt 'REAL_UINT64 means real UINT64
        encoded with the following scheme')."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if not (first & mask):
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n: int) -> list[bool]:
        bits = []
        b = 0
        mask = 0
        for _ in range(n):
            if mask == 0:
                b = self.byte()
                mask = 0x80
            bits.append(bool(b & mask))
            mask >>= 1
        return bits

    def bitvector_or_all(self, n: int) -> list[bool]:
        """AllAreDefined byte then either all-true or a bit vector."""
        return [True] * n if self.byte() else self.bitvector(n)


class _Folder:
    __slots__ = ("coders", "bind_pairs", "packed_indices",
                 "unpack_sizes", "crc")

    def __init__(self):
        self.coders: list[dict] = []
        self.bind_pairs: list[tuple[int, int]] = []  # (in_idx, out_idx)
        self.packed_indices: list[int] = []
        self.unpack_sizes: list[int] = []
        self.crc: int | None = None

    @property
    def n_out(self) -> int:
        return sum(c["nout"] for c in self.coders)

    def final_out(self) -> int:
        bound = {o for _, o in self.bind_pairs}
        for i in range(self.n_out):
            if i not in bound:
                return i
        raise ValueError("7z folder without an unbound output stream")

    def unpack_size(self) -> int:
        return self.unpack_sizes[self.final_out()]


def _read_folder(r: _Rd) -> _Folder:
    f = _Folder()
    n_coders = r.number()
    if not 0 < n_coders <= 64:
        raise ValueError(f"7z folder with {n_coders} coders out of range")
    total_in = 0
    for _ in range(n_coders):
        flags = r.byte()
        id_size = flags & 0x0F
        codec_id = r.bytes(id_size)
        nin = nout = 1
        if flags & 0x10:  # complex coder
            nin = r.number()
            nout = r.number()
        props = b""
        if flags & 0x20:
            props = r.bytes(r.number())
        if flags & 0x80:
            raise ValueError("7z alternative coder methods out of scope")
        f.coders.append(
            {"id": codec_id, "nin": nin, "nout": nout, "props": props}
        )
        total_in += nin
    n_bind = f_n_out = sum(c["nout"] for c in f.coders)
    n_bind -= 1
    for _ in range(n_bind):
        f.bind_pairs.append((r.number(), r.number()))
    n_packed = total_in - n_bind
    if n_packed == 1:
        bound_in = {i for i, _ in f.bind_pairs}
        f.packed_indices = [
            next(i for i in range(total_in) if i not in bound_in)
        ]
    else:
        f.packed_indices = [r.number() for _ in range(n_packed)]
    return f


def _decode_coder(codec_id: bytes, props: bytes, data: bytes,
                  out_size: int) -> bytes:
    if codec_id == _CODEC_COPY:
        out = data
    elif codec_id == _CODEC_LZMA2:
        out = lzma2_decompress(data, max_output=MAX_FOLDER_BYTES)
    elif codec_id == _CODEC_LZMA:
        out = lzma_raw_decompress(data, props, out_size,
                                  max_output=MAX_FOLDER_BYTES)
    elif codec_id == _CODEC_DELTA:
        if len(props) != 1:
            raise ValueError("7z delta coder without a distance prop")
        out = delta_decode(data, props[0] + 1)
    elif codec_id == _CODEC_BCJ_X86:
        out = bcj_x86(data, is_encoder=False)
    elif codec_id == _CODEC_DEFLATE:
        try:
            out = zlib.decompress(data, wbits=-15)
        except zlib.error as exc:
            raise ValueError(f"torn 7z deflate stream: {exc}") from exc
    elif codec_id == _CODEC_BZIP2:
        import bz2

        try:
            out = bz2.decompress(data)
        except (OSError, EOFError) as exc:
            raise ValueError(f"torn 7z bzip2 stream: {exc}") from exc
    elif codec_id == _CODEC_AES256:
        raise ValueError("7z AES-256 encrypted archive (out of scope)")
    else:
        raise ValueError(
            f"7z coder {codec_id.hex()} out of scope "
            "(Copy/LZMA/LZMA2/Delta/BCJ/Deflate/BZip2 supported)"
        )
    if len(out) != out_size:
        raise ValueError(
            f"7z coder {codec_id.hex()} produced {len(out)} bytes, "
            f"folder promised {out_size}"
        )
    return out


def _decode_folder(folder: _Folder, packed: list[bytes]) -> bytes:
    """Resolve the coder graph: outputs feed inputs through bind
    pairs, unbound inputs consume packed streams in packed_indices
    order. Real archives are one coder or a filter chain — the
    recursion handles both."""
    # global in/out index maps
    in_base, out_base = [], []
    ti = to = 0
    for c in folder.coders:
        in_base.append(ti)
        out_base.append(to)
        ti += c["nin"]
        to += c["nout"]
    bind_by_out = {o: i for i, o in folder.bind_pairs}
    bind_by_in = {i: o for i, o in folder.bind_pairs}
    packed_by_in = {
        idx: k for k, idx in enumerate(folder.packed_indices)
    }
    cache: dict[int, bytes] = {}

    def coder_of_out(out_idx: int) -> int:
        for ci in range(len(folder.coders) - 1, -1, -1):
            if out_base[ci] <= out_idx:
                return ci
        raise ValueError("7z bind pair output index out of range")

    def produce(out_idx: int, depth: int = 0) -> bytes:
        if depth > 64:
            raise ValueError("7z coder graph too deep")
        if out_idx in cache:
            return cache[out_idx]
        ci = coder_of_out(out_idx)
        c = folder.coders[ci]
        inputs = []
        for j in range(c["nin"]):
            gi = in_base[ci] + j
            if gi in bind_by_in:
                inputs.append(produce(bind_by_in[gi], depth + 1))
            elif gi in packed_by_in:
                k = packed_by_in[gi]
                if k >= len(packed):
                    raise ValueError("7z packed stream index out of range")
                inputs.append(packed[k])
            else:
                raise ValueError(f"7z coder input {gi} unbound")
        if len(inputs) != 1:
            raise ValueError(
                "7z multi-input coders (BCJ2) out of scope"
            )
        if out_idx >= len(folder.unpack_sizes):
            raise ValueError("7z unpack size missing for output stream")
        out = _decode_coder(
            c["id"], c["props"], inputs[0], folder.unpack_sizes[out_idx]
        )
        cache[out_idx] = out
        return out

    data = produce(folder.final_out())
    if folder.crc is not None and zlib.crc32(data) != folder.crc:
        raise ValueError("7z folder CRC mismatch")
    return data


def _read_streams_info(r: _Rd) -> dict:
    """PackInfo + UnpackInfo + SubStreamsInfo subtree."""
    info: dict = {
        "pack_pos": 0, "pack_sizes": [], "folders": [],
        "num_unpack": None, "sub_sizes": None, "sub_crcs": None,
    }
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_PACK_INFO:
            info["pack_pos"] = r.number()
            n = r.number()
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_SIZE:
                    info["pack_sizes"] = [r.number() for _ in range(n)]
                elif t2 == _K_CRC:
                    defined = r.bitvector_or_all(n)
                    for d in defined:
                        if d:
                            r.bytes(4)
                else:
                    raise ValueError(f"7z PackInfo property {t2} unknown")
        elif t == _K_UNPACK_INFO:
            if r.number() != _K_FOLDER:
                raise ValueError("7z UnpackInfo without kFolder")
            n_folders = r.number()
            if r.byte() != 0:
                raise ValueError("7z external folder data out of scope")
            folders = [_read_folder(r) for _ in range(n_folders)]
            if r.number() != _K_UNPACK_SIZE:
                raise ValueError("7z UnpackInfo without kCodersUnpackSize")
            for f in folders:
                f.unpack_sizes = [r.number() for _ in range(f.n_out)]
                if f.unpack_size() > MAX_FOLDER_BYTES:
                    raise ValueError("7z folder exceeds MAX_FOLDER_BYTES")
            while True:
                t2 = r.number()
                if t2 == _K_END:
                    break
                if t2 == _K_CRC:
                    defined = r.bitvector_or_all(n_folders)
                    for f, d in zip(folders, defined):
                        if d:
                            (f.crc,) = struct.unpack("<I", r.bytes(4))
                else:
                    raise ValueError(
                        f"7z UnpackInfo property {t2} unknown"
                    )
            info["folders"] = folders
        elif t == _K_SUBSTREAMS:
            folders = info["folders"]
            nums = [1] * len(folders)
            t2 = r.number()
            if t2 == _K_NUM_UNPACK_STREAM:
                nums = [r.number() for _ in folders]
                t2 = r.number()
            sizes: list[int] = []
            if t2 == _K_SIZE:
                for f, k in zip(folders, nums):
                    if k == 0:
                        continue
                    given = [r.number() for _ in range(k - 1)]
                    last = f.unpack_size() - sum(given)
                    if last < 0:
                        raise ValueError("7z substream sizes overflow")
                    sizes.extend(given + [last])
                t2 = r.number()
            else:
                for f, k in zip(folders, nums):
                    if k == 1:
                        sizes.append(f.unpack_size())
                    elif k != 0:
                        raise ValueError(
                            "7z substream sizes missing for split folder"
                        )
            crcs: list[int | None] = []
            if t2 == _K_CRC:
                # digests for substreams that don't inherit a folder CRC
                need = sum(
                    k for f, k in zip(folders, nums)
                    if not (k == 1 and f.crc is not None)
                )
                defined = r.bitvector_or_all(need)
                raw: list[int | None] = []
                for d in defined:
                    raw.append(
                        struct.unpack("<I", r.bytes(4))[0] if d else None
                    )
                it = iter(raw)
                for f, k in zip(folders, nums):
                    if k == 1 and f.crc is not None:
                        crcs.append(f.crc)
                    else:
                        crcs.extend(next(it) for _ in range(k))
                t2 = r.number()
            else:
                for f, k in zip(folders, nums):
                    if k == 1 and f.crc is not None:
                        crcs.append(f.crc)
                    else:
                        crcs.extend([None] * k)
            if t2 != _K_END:
                raise ValueError(f"7z SubStreamsInfo property {t2} unknown")
            info["num_unpack"] = nums
            info["sub_sizes"] = sizes
            info["sub_crcs"] = crcs
        else:
            raise ValueError(f"7z StreamsInfo property {t} unknown")
    if info["num_unpack"] is None:
        folders = info["folders"]
        info["num_unpack"] = [1] * len(folders)
        info["sub_sizes"] = [f.unpack_size() for f in folders]
        info["sub_crcs"] = [f.crc for f in folders]
    return info


def _unpack_streams(payload: bytes, base: int, info: dict) -> list[bytes]:
    """Decode every folder and split into substreams; CRC-verify each
    substream that carries a digest."""
    pos = base + info["pack_pos"]
    packs: list[bytes] = []
    for size in info["pack_sizes"]:
        if pos + size > len(payload):
            raise ValueError("torn 7z packed stream")
        packs.append(payload[pos : pos + size])
        pos += size
    out: list[bytes] = []
    pk = 0
    si = 0
    for f, k in zip(info["folders"], info["num_unpack"]):
        n_pack = len(f.packed_indices)
        data = _decode_folder(f, packs[pk : pk + n_pack])
        pk += n_pack
        off = 0
        for _ in range(k):
            size = info["sub_sizes"][si]
            sub = data[off : off + size]
            if len(sub) != size:
                raise ValueError("7z substream past the folder data")
            crc = info["sub_crcs"][si]
            if crc is not None and zlib.crc32(sub) != crc:
                raise ValueError("7z substream CRC mismatch")
            out.append(sub)
            off += size
            si += 1
        if off != len(data):
            raise ValueError("7z folder data not fully consumed")
    return out


def parse_7z(payload: bytes) -> list[tuple[str, bytes]]:
    """(member_name, member_bytes) in archive order — directories and
    anti-items skipped, empty files yielded as empty bytes.
    ValueError — and only ValueError — on torn/encrypted/out-of-scope
    input."""
    if payload[:6] != MAGIC_7Z:
        raise ValueError("not a 7z archive")
    if len(payload) < 32:
        raise ValueError("torn 7z signature header")
    start = payload[12:32]
    (start_crc,) = struct.unpack_from("<I", payload, 8)
    if zlib.crc32(start) != start_crc:
        raise ValueError("7z start header CRC mismatch")
    nh_off, nh_size, nh_crc = struct.unpack("<QQI", start)
    if nh_size == 0:
        return []  # empty archive: no next header at all
    hdr_start = 32 + nh_off
    if hdr_start + nh_size > len(payload):
        raise ValueError("torn 7z next header")
    header = payload[hdr_start : hdr_start + nh_size]
    if zlib.crc32(header) != nh_crc:
        raise ValueError("7z next header CRC mismatch")

    r = _Rd(header)
    t = r.number()
    if t == _K_ENCODED_HEADER:
        info = _read_streams_info(r)
        subs = _unpack_streams(payload, 32, info)
        if len(subs) != 1:
            raise ValueError("7z encoded header is not one stream")
        r = _Rd(subs[0])
        t = r.number()
    if t != _K_HEADER:
        raise ValueError(f"7z next header id {t} is not kHeader")

    streams: dict | None = None
    files: list[dict] = []
    n_files = 0
    while True:
        t = r.number()
        if t == _K_END:
            break
        if t == _K_MAIN_STREAMS:
            streams = _read_streams_info(r)
        elif t == _K_FILES_INFO:
            n_files = r.number()
            files = [
                {"name": None, "empty_stream": False, "empty_file": False}
                for _ in range(n_files)
            ]
            empty_streams: list[bool] = [False] * n_files
            while True:
                pt = r.number()
                if pt == _K_END:
                    break
                size = r.number()
                end = r.pos + size
                if pt == _K_EMPTY_STREAM:
                    empty_streams = r.bitvector(n_files)
                    for f, e in zip(files, empty_streams):
                        f["empty_stream"] = e
                elif pt == _K_EMPTY_FILE:
                    n_empty = sum(empty_streams)
                    bits = r.bitvector(n_empty)
                    it = iter(bits)
                    for f in files:
                        if f["empty_stream"]:
                            f["empty_file"] = next(it)
                elif pt == _K_NAME:
                    if r.byte() != 0:
                        raise ValueError("7z external names out of scope")
                    raw = r.bytes(end - r.pos)
                    names = raw.decode("utf-16-le").split("\x00")
                    if names and names[-1] == "":
                        names.pop()
                    if len(names) != n_files:
                        raise ValueError("7z name count disagrees")
                    for f, name in zip(files, names):
                        f["name"] = name
                else:
                    r.bytes(end - r.pos)  # mtime/attributes: skipped
                if r.pos != end:
                    r.pos = end
        else:
            raise ValueError(f"7z header property {t} unknown")

    subs = (
        _unpack_streams(payload, 32, streams) if streams is not None else []
    )
    out: list[tuple[str, bytes]] = []
    it = iter(subs)
    for f in files:
        name = f["name"]
        if name is None:
            raise ValueError("7z file without a name")
        if f["empty_stream"]:
            if f["empty_file"]:
                out.append((name, b""))
            # else: directory / anti-item — skipped
        else:
            try:
                out.append((name, next(it)))
            except StopIteration:
                raise ValueError("7z has more files than substreams") \
                    from None
    if next(it, None) is not None:
        raise ValueError("7z has more substreams than files")
    if not files and subs:
        # headerless files info never happens in real archives; be loud
        raise ValueError("7z streams without FilesInfo")
    return out


# --- fixture writer ---------------------------------------------------------------


def _num(v: int) -> bytes:
    """REAL_UINT64 writer: first byte carries n leading 1-bits (n =
    count of extra LE bytes) plus the high value bits that still fit."""
    if v < 0x80:
        return bytes([v])
    n = (v.bit_length() + 7) // 8
    for extra in (n, n + 1):
        if extra >= 8:
            return bytes([0xFF]) + v.to_bytes(8, "little")
        hi = v >> (8 * extra)
        if hi < (0x80 >> extra):
            first = (0xFF << (8 - extra)) & 0xFF
            return bytes([first | hi]) + (
                v & ((1 << (8 * extra)) - 1)
            ).to_bytes(extra, "little")
    raise AssertionError("unreachable")


def build_7z(members: list[tuple[str, bytes]],
             codec: str = "copy") -> bytes:
    """Deterministic fixture .7z: one folder, all non-empty members
    concatenated as substreams (per-substream CRC32s), empty members
    via the empty-stream/empty-file bit vectors, raw (non-encoded)
    header. ``codec``: 'copy', 'lzma2', 'lzma', 'delta+lzma2', or
    'bcj+lzma2' (chained folders exercising bind pairs)."""
    import lzma as _lzma

    nonempty = [(n, d) for n, d in members if d]
    empty = [(n, d) for n, d in members if not d]
    blob = b"".join(d for _, d in nonempty)

    coders: list[tuple[bytes, bytes, int]] = []  # (id, props, unpack)
    if codec == "copy":
        packed = blob
        coders = [(_CODEC_COPY, b"", len(blob))]
    elif codec == "lzma2":
        packed = _lzma.compress(
            blob, format=_lzma.FORMAT_RAW,
            filters=[{"id": _lzma.FILTER_LZMA2, "preset": 6}],
        )
        coders = [(_CODEC_LZMA2, bytes([26]), len(blob))]
    elif codec == "lzma":
        packed = _lzma.compress(
            blob, format=_lzma.FORMAT_RAW,
            filters=[{"id": _lzma.FILTER_LZMA1, "preset": 6}],
        )
        coders = [
            (_CODEC_LZMA, bytes([93]) + struct.pack("<I", 1 << 23),
             len(blob))
        ]
    elif codec in ("delta+lzma2", "bcj+lzma2"):
        if codec == "delta+lzma2":
            from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.xz import (
                delta_decode as _dd,
            )

            # encode = inverse of delta_decode: out[i] = in[i]-in[i-d]
            dist = 4
            enc = bytearray(blob)
            for i in range(len(blob) - 1, dist - 1, -1):
                enc[i] = (enc[i] - blob[i - dist]) & 0xFF
            filtered = bytes(enc)
            filt_coder = (_CODEC_DELTA, bytes([dist - 1]), len(blob))
        else:
            filtered = bcj_x86(blob, is_encoder=True)
            filt_coder = (_CODEC_BCJ_X86, b"", len(blob))
        packed = _lzma.compress(
            filtered, format=_lzma.FORMAT_RAW,
            filters=[{"id": _lzma.FILTER_LZMA2, "preset": 6}],
        )
        # the real-writer layout (7zFormat.txt example, what libarchive
        # expects): coder 0 = LZMA2, coder 1 = filter; bind pair wires
        # the filter's input (global in 1) to LZMA2's output (global
        # out 0); the packed stream feeds LZMA2 (global in 0)
        coders = [(_CODEC_LZMA2, bytes([26]), len(filtered)), filt_coder]
    else:
        raise ValueError(f"fixture codec {codec!r} out of range")

    # ---- header bytes ----
    h = bytearray()
    h += _num(_K_HEADER)
    if nonempty:
        h += _num(_K_MAIN_STREAMS)
        # PackInfo
        h += _num(_K_PACK_INFO) + _num(0) + _num(1)
        h += _num(_K_SIZE) + _num(len(packed)) + _num(_K_END)
        # UnpackInfo
        h += _num(_K_UNPACK_INFO) + _num(_K_FOLDER) + _num(1)
        h.append(0)  # not external
        h += _num(len(coders))
        for cid, props, _ in coders:
            flags = len(cid) | (0x20 if props else 0)
            h.append(flags)
            h += cid
            if props:
                h += _num(len(props)) + props
        if len(coders) == 2:
            # bind pair: filter input (global in 1) <- lzma2 output
            # (global out 0); the packed stream feeds global in 0
            h += _num(1) + _num(0)
        # kCodersUnpackSize: one per out stream in coder order
        h += _num(_K_UNPACK_SIZE)
        for _, _, usize in coders:
            h += _num(usize)
        h += _num(_K_END)
        # SubStreamsInfo
        h += _num(_K_SUBSTREAMS)
        h += _num(_K_NUM_UNPACK_STREAM) + _num(len(nonempty))
        if len(nonempty) > 1:
            h += _num(_K_SIZE)
            for _, d in nonempty[:-1]:
                h += _num(len(d))
        h += _num(_K_CRC)
        h.append(1)  # all defined
        for _, d in nonempty:
            h += struct.pack("<I", zlib.crc32(d))
        h += _num(_K_END)
        h += _num(_K_END)
    # FilesInfo
    n_files = len(members)
    h += _num(_K_FILES_INFO) + _num(n_files)
    order = nonempty + empty
    if empty:
        bits = bytearray()
        acc = 0
        k = 0
        for i, (_, d) in enumerate(order):
            acc = (acc << 1) | (0 if d else 1)
            k += 1
            if k == 8:
                bits.append(acc)
                acc = k = 0
        if k:
            bits.append(acc << (8 - k))
        h += _num(_K_EMPTY_STREAM) + _num(len(bits)) + bytes(bits)
        ebits = bytearray()
        acc = k = 0
        for _ in empty:
            acc = (acc << 1) | 1  # every empty stream is an empty FILE
            k += 1
            if k == 8:
                ebits.append(acc)
                acc = k = 0
        if k:
            ebits.append(acc << (8 - k))
        h += _num(_K_EMPTY_FILE) + _num(len(ebits)) + bytes(ebits)
    names = b"\x00" + b"".join(
        (n + "\x00").encode("utf-16-le") for n, _ in order
    )
    h += _num(_K_NAME) + _num(len(names)) + names
    h += _num(_K_END)
    h += _num(_K_END)

    header = bytes(h)
    body = packed if nonempty else b""
    start = struct.pack("<QQI", len(body), len(header),
                        zlib.crc32(header))
    return (
        MAGIC_7Z + b"\x00\x04" + struct.pack("<I", zlib.crc32(start))
        + start + body + header
    )
