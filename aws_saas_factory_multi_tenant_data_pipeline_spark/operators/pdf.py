"""Scoped from-spec PDF text extraction (ISO 32000-1 / PDF 1.x).

PDF is the largest high-quality document slice of any real crawl, and
text extraction is a staple of every LLM-data pipeline. Pure
stdlib(+zlib): this module extracts page text from the subset of PDF
that covers the vast majority of digitally-born documents —

- object discovery by LINEAR SCAN of ``N G obj … endobj`` (the robust
  path every production extractor falls back to; no dependence on a
  well-formed xref), plus PDF 1.5 OBJECT STREAMS (``/Type /ObjStm``,
  Flate-decoded, ``/N``+``/First`` header walk) so compressed-object
  documents (pdfTeX output) work;
- stream payloads via ``/Length`` (direct or indirect) with an
  endstream-marker fallback; filters FlateDecode (zlib), LZWDecode
  [r11] (the shared operators/lzw.py core, EarlyChange honored),
  ASCIIHexDecode, ASCII85Decode and RunLengthDecode [r11], incl.
  filter chains;
- a minimal object grammar: dicts, arrays, names (with ``#xx``
  escapes), numbers, literal strings (escapes, nested parens, octal),
  hex strings, booleans/null, and indirect references;
- the page tree (``/Type /Page`` objects, ``/Contents`` ref or array)
  and per-page ``/Resources /Font`` maps;
- content-stream text operators: ``BT/ET``, ``Tf`` (font switch),
  ``Tj``, ``'``, ``\"``, and ``TJ`` (kerning arrays — a negative
  adjustment beyond ``KERN_SPACE_THRESHOLD`` becomes a space, the
  standard word-gap heuristic), with ``Td/TD/T*`` starting new lines;
- byte→text decoding per font: ``/ToUnicode`` CMaps (``bfchar`` +
  ``bfrange``, incl. array destinations), 2-byte codes for
  ``/Type0`` composite fonts, Latin-1 passthrough otherwise (the
  honest fallback for unmapped simple fonts — pdfTeX's builtin-encoded
  Type1 text extracts approximately, never crashes).

Declared boundaries (named per-payload/per-stream errors or skips,
never a crash): encrypted documents (``/Encrypt``) raise; remaining
out-of-scope stream filters (DCTDecode as *content* — as IMAGES they
extract via extract_pdf_images — JBIG2/JPX/CCITT) are skipped;
Type0 fonts without a ToUnicode map fall back to per-byte Latin-1
(flagged in the page text only by absence, documented).

Real-file interop: the two pdfTeX PDFs shipped with this host's OS
packages (libtasn1 manual, shared-mime-info spec — PDF 1.5, xref
streams + object streams, Flate everywhere) extract through this exact
path in tests/test_pdf.py.
"""

from __future__ import annotations

import re
import zlib

#: TJ kerning threshold (thousandths of an em): gaps wider than this
#: are word breaks — the conventional extractor heuristic
KERN_SPACE_THRESHOLD = 180

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Tok:
    __slots__ = ("data", "i", "n")

    def __init__(self, data: bytes, i: int = 0):
        self.data = data
        self.i = i
        self.n = len(data)

    def _skip_ws(self) -> None:
        d, n = self.data, self.n
        while self.i < n:
            c = d[self.i]
            if c in _WS:
                self.i += 1
            elif c == 0x25:  # % comment
                j = d.find(b"\n", self.i)
                self.i = n if j < 0 else j + 1
            else:
                return

    def parse(self):
        """One PDF object at the cursor."""
        self._skip_ws()
        if self.i >= self.n:
            raise ValueError("torn PDF object")
        d = self.data
        c = d[self.i]
        if d.startswith(b"<<", self.i):
            return self._dict()
        if c == 0x3C:  # <hex>
            j = d.find(b">", self.i)
            if j < 0:
                raise ValueError("torn PDF hex string")
            h = re.sub(rb"\s", b"", d[self.i + 1 : j])
            if len(h) % 2:
                h += b"0"
            self.i = j + 1
            return bytes.fromhex(h.decode("ascii", "replace"))
        if c == 0x28:  # (literal)
            return self._string()
        if c == 0x2F:  # /Name
            return self._name()
        if c == 0x5B:  # [array]
            self.i += 1
            out = []
            while True:
                self._skip_ws()
                if self.i >= self.n:
                    raise ValueError("torn PDF array")
                if d[self.i] == 0x5D:
                    self.i += 1
                    return out
                out.append(self.parse())
        for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
            if d.startswith(kw, self.i):
                self.i += len(kw)
                return val
        m = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)").match(d, self.i)
        if m:
            # maybe an indirect reference: NUM GEN R
            save = self.i
            self.i = m.end()
            num_txt = m.group()
            self._skip_ws()
            m2 = re.compile(rb"(\d+)\s+R(?![A-Za-z0-9])").match(d, self.i)
            if m2 and b"." not in num_txt:
                self.i = m2.end()
                return _Ref(int(num_txt))
            self.i = m.end()
            del save
            return float(num_txt) if b"." in num_txt else int(num_txt)
        raise ValueError(f"unparseable PDF token at byte {self.i}")

    def _name(self):
        d = self.data
        j = self.i + 1
        while j < self.n and d[j] not in _WS and d[j] not in _DELIM:
            j += 1
        raw = d[self.i + 1 : j]
        self.i = j
        raw = re.sub(
            rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
        )
        return _Name(raw.decode("latin-1"))

    def _string(self) -> bytes:
        d = self.data
        i = self.i + 1
        out = bytearray()
        depth = 1
        esc = {
            0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
            0x66: b"\x0c", 0x28: b"(", 0x29: b")", 0x5C: b"\\",
        }
        while i < self.n:
            c = d[i]
            if c == 0x5C:  # backslash
                i += 1
                if i >= self.n:
                    break
                c2 = d[i]
                if c2 in esc:
                    out += esc[c2]
                    i += 1
                elif 0x30 <= c2 <= 0x37:  # octal, up to 3 digits
                    j = i
                    while j < min(i + 3, self.n) and 0x30 <= d[j] <= 0x37:
                        j += 1
                    out.append(int(d[i:j], 8) & 0xFF)
                    i = j
                elif c2 in (0x0A, 0x0D):  # line continuation
                    i += 1
                    if c2 == 0x0D and i < self.n and d[i] == 0x0A:
                        i += 1
                else:
                    out.append(c2)
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.i = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        raise ValueError("torn PDF literal string")

    def _dict(self):
        self.i += 2
        out = {}
        while True:
            self._skip_ws()
            if self.data.startswith(b">>", self.i):
                self.i += 2
                return out
            key = self.parse()
            if not isinstance(key, _Name):
                raise ValueError("PDF dict key is not a name")
            out[key.v] = self.parse()


class _Name:
    __slots__ = ("v",)

    def __init__(self, v: str):
        self.v = v

    def __repr__(self):
        return f"/{self.v}"

    def __eq__(self, other):
        return isinstance(other, _Name) and other.v == self.v

    def __hash__(self):
        return hash(("name", self.v))


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):
        return f"{self.num} 0 R"


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")


_WS_SET = b" \t\r\n\x0c\x00"


def _asciihex_decode(data: bytes) -> bytes:
    """ISO 32000-1 §7.4.2: hex pairs, whitespace ignored, '>' is EOD,
    an odd trailing digit implies a 0 nibble."""
    out = bytearray()
    hi = None
    for b in data:
        c = bytes([b])
        if c == b">":
            break
        if b in _WS_SET:
            continue
        v = int(c, 16)  # ValueError on junk, the tear contract
        if hi is None:
            hi = v
        else:
            out.append((hi << 4) | v)
            hi = None
    if hi is not None:
        out.append(hi << 4)
    return bytes(out)


def _ascii85_decode(data: bytes) -> bytes:
    """ISO 32000-1 §7.4.3: base-85 groups, 'z' = four zero bytes,
    '~>' is EOD, whitespace ignored, partial final group."""
    out = bytearray()
    group: list[int] = []
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b in _WS_SET:
            i += 1
            continue
        if b == 0x7E:  # '~' — must be '~>'
            break
        if b == 0x7A:  # 'z'
            if group:
                raise ValueError("ASCII85 'z' inside a group")
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        if not 0x21 <= b <= 0x75:
            raise ValueError(f"ASCII85 byte {b} out of range")
        group.append(b - 33)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ValueError("ASCII85 group overflows 32 bits")
            out += v.to_bytes(4, "big")
            group = []
        i += 1
    if group:
        if len(group) == 1:
            raise ValueError("ASCII85 dangling single character")
        k = len(group)
        v = 0
        for g in group + [84] * (5 - k):
            v = v * 85 + g
        out += v.to_bytes(4, "big")[: k - 1]
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """ISO 32000-1 §7.4.5: length byte n — n<128 copies n+1 literals,
    n>128 repeats the next byte 257-n times, 128 is EOD."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        i += 1
        if ln == 128:
            break
        if ln < 128:
            if i + ln + 1 > n:
                raise ValueError("torn RunLengthDecode literal run")
            out += data[i : i + ln + 1]
            i += ln + 1
        else:
            if i >= n:
                raise ValueError("torn RunLengthDecode repeat run")
            out += bytes([data[i]]) * (257 - ln)
            i += 1
    return bytes(out)


class PdfDocument:
    """Parsed object store + page walker."""

    def __init__(self, payload: bytes):
        if not payload.startswith(b"%PDF-"):
            raise ValueError("not a PDF payload")
        self.raw = payload
        self.objects: dict[int, tuple] = {}  # num -> (value, stream|None)
        self._scan(payload)
        self._expand_object_streams()
        trailer_encrypted = b"/Encrypt" in payload[-2048:]
        if trailer_encrypted or any(
            isinstance(v, dict) and "Encrypt" in v
            for v, _ in self.objects.values()
            if isinstance(v, dict) and v.get("Type", _Name("")) == _Name("XRef")
        ):
            raise ValueError("encrypted PDF outside the declared scope")

    # -- object discovery ---------------------------------------------------
    def _scan(self, data: bytes) -> None:
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            try:
                tok = _Tok(data, m.end())
                val = tok.parse()
                stream = None
                tok._skip_ws()
                if data.startswith(b"stream", tok.i):
                    j = tok.i + 6
                    if data.startswith(b"\r\n", j):
                        j += 2
                    elif data.startswith(b"\n", j) or data.startswith(b"\r", j):
                        j += 1
                    length = val.get("Length") if isinstance(val, dict) else None
                    if isinstance(length, _Ref):
                        length = None  # resolve later via marker scan
                    if isinstance(length, int) and data.startswith(
                        b"endstream", self._after_ws(data, j + length)
                    ):
                        stream = data[j : j + length]
                    else:
                        e = data.find(b"endstream", j)
                        if e < 0:
                            continue  # torn stream object: skip
                        stream = data[j:e].rstrip(b"\r\n")
                self.objects[num] = (val, stream)
            except ValueError:
                continue  # unparseable object: robust-scan convention

    @staticmethod
    def _after_ws(data: bytes, i: int) -> int:
        while i < len(data) and data[i] in _WS:
            i += 1
        return i

    def _expand_object_streams(self) -> None:
        for num in list(self.objects):
            val, stream = self.objects[num]
            if not (isinstance(val, dict) and val.get("Type") == _Name("ObjStm")):
                continue
            try:
                body = self._decoded_stream(val, stream)
                n = self.resolve(val.get("N", 0))
                first = self.resolve(val.get("First", 0))
                head = body[:first].split()
                for k in range(int(n)):
                    onum = int(head[2 * k])
                    ooff = int(head[2 * k + 1])
                    tok = _Tok(body, first + ooff)
                    self.objects.setdefault(onum, (tok.parse(), None))
            except (ValueError, IndexError, zlib.error):
                continue  # torn object stream: skip its contents

    # -- helpers -------------------------------------------------------------
    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref):
            v = self.objects.get(v.num, (None, None))[0]
            seen += 1
            if seen > 32:
                raise ValueError("PDF reference loop")
        return v

    def _decoded_stream(self, sdict: dict, stream: bytes | None) -> bytes:
        if stream is None:
            raise ValueError("PDF object has no stream")
        filt = self.resolve(sdict.get("Filter"))
        filters = (
            [] if filt is None else (filt if isinstance(filt, list) else [filt])
        )
        parms = self.resolve(sdict.get("DecodeParms"))
        parms_list = (
            [] if parms is None else (parms if isinstance(parms, list) else [parms])
        )
        data = stream
        for fi, f in enumerate(filters):
            f = self.resolve(f)
            fp = self.resolve(parms_list[fi]) if fi < len(parms_list) else None
            fp = fp or {}
            if f == _Name("FlateDecode"):
                data = zlib.decompress(data)
            elif f == _Name("LZWDecode"):
                # [r11] shared LZW core (operators/lzw.py) — pinned
                # against REAL libtiff streams (same dialect)
                from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.lzw import (
                    lzw_decode,
                )

                ec = int(self.resolve(fp.get("EarlyChange", 1)) or 0)
                data = lzw_decode(data, early_change=ec)
            elif f == _Name("ASCIIHexDecode"):
                data = _asciihex_decode(data)
            elif f == _Name("ASCII85Decode"):
                data = _ascii85_decode(data)
            elif f == _Name("RunLengthDecode"):
                data = _runlength_decode(data)
            else:
                raise ValueError(
                    f"PDF stream filter {f!r} outside the declared scope"
                )
        return data

    # -- pages + text ---------------------------------------------------------
    def pages(self) -> list[dict]:
        out = []
        for num in sorted(self.objects):
            val, _ = self.objects[num]
            if isinstance(val, dict) and val.get("Type") == _Name("Page"):
                out.append(val)
        return out

    def _font_maps(self, page: dict) -> dict[str, tuple[dict, bool]]:
        """font resource name -> (code->text map, is_two_byte)."""
        res = self.resolve(page.get("Resources")) or {}
        fonts = self.resolve(res.get("Font")) or {}
        out = {}
        for fname, fref in fonts.items():
            fd = self.resolve(fref)
            if not isinstance(fd, dict):
                continue
            two_byte = fd.get("Subtype") == _Name("Type0")
            cmap: dict[int, str] = {}
            tu = fd.get("ToUnicode")
            if tu is not None:
                try:
                    tnum = tu.num if isinstance(tu, _Ref) else None
                    tval, tstream = (
                        self.objects.get(tnum, (None, None))
                        if tnum is not None
                        else (None, None)
                    )
                    if isinstance(tval, dict):
                        cmap = _parse_tounicode(self._decoded_stream(tval, tstream))
                except (ValueError, zlib.error):
                    cmap = {}
            out[fname] = (cmap, two_byte)
        return out

    def page_text(self, page: dict) -> str:
        contents = self.resolve(page.get("Contents"))
        chunks = []
        refs = contents if isinstance(contents, list) else [page.get("Contents")]
        for r in refs:
            if not isinstance(r, _Ref):
                continue
            val, stream = self.objects.get(r.num, (None, None))
            if isinstance(val, dict) and stream is not None:
                try:
                    chunks.append(self._decoded_stream(val, stream))
                except (ValueError, zlib.error):
                    continue  # non-Flate content: skipped, declared scope
        return _extract_content_text(b"\n".join(chunks), self._font_maps(page))


def _parse_tounicode(body: bytes) -> dict[int, str]:
    out: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", body, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", m.group(1)):
            out[int(src, 16)] = _utf16be(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", body, re.S):
        seg = m.group(1)
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", seg
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            base = int(dst, 16)
            for c in range(lo_i, min(hi_i, lo_i + 0xFFFF) + 1):
                out[c] = chr(base + (c - lo_i))
        for lo, arr in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<[0-9A-Fa-f]+>\s*\[(.*?)\]", seg, re.S
        ):
            lo_i = int(lo, 16)
            for k, dst in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", arr)):
                out[lo_i + k] = _utf16be(dst)
    return out


def _utf16be(hexbytes: bytes) -> str:
    b = bytes.fromhex(hexbytes.decode("ascii"))
    if len(b) % 2:
        b = b"\x00" + b
    return b.decode("utf-16-be", "replace")


def _decode_text_bytes(raw: bytes, cmap: dict[int, str], two_byte: bool) -> str:
    if two_byte:
        if len(raw) % 2:
            raw = raw[:-1]
        codes = [int.from_bytes(raw[i : i + 2], "big") for i in range(0, len(raw), 2)]
    else:
        codes = list(raw)
    if cmap:
        return "".join(cmap.get(c, chr(c) if c < 256 else "�") for c in codes)
    return "".join(chr(c) if c < 256 else "�" for c in codes)


_CONTENT_TOKEN = re.compile(
    rb"\((?:[^()\\]|\\.|\([^)]*\))*\)"  # literal string (1 nesting level)
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[|\]"
    rb"|/[^\s()<>\[\]{}/%]*"
    rb"|[+-]?(?:\d+\.?\d*|\.\d+)"
    rb"|[A-Za-z'\"*]+"
)


def _extract_content_text(content: bytes, fonts: dict) -> str:
    """Walk a decoded content stream, emitting text in reading order."""
    out: list[str] = []
    stack: list = []
    cur_map: dict[int, str] = {}
    cur_two = False
    in_array: list | None = None

    def emit(raw: bytes) -> None:
        out.append(_decode_text_bytes(raw, cur_map, cur_two))

    def parse_str(tok: bytes) -> bytes:
        t = _Tok(tok)
        return t.parse()

    for m in _CONTENT_TOKEN.finditer(content):
        tok = m.group()
        if tok[0] in b"(<" and tok != b"<":
            val = parse_str(tok)
            if in_array is not None:
                in_array.append(val)
            else:
                stack.append(val)
        elif tok == b"[":
            in_array = []
        elif tok == b"]":
            stack.append(in_array)
            in_array = None
        elif tok[0] in b"/":
            name = tok[1:].decode("latin-1")
            if in_array is None:
                stack.append(_Name(name))
        elif tok[0] in b"+-.0123456789":
            num = float(tok)
            if in_array is not None:
                in_array.append(num)
            else:
                stack.append(num)
        else:
            op = tok
            if op == b"Tf" and len(stack) >= 2:
                fname = stack[-2]
                if isinstance(fname, _Name) and fname.v in fonts:
                    cur_map, cur_two = fonts[fname.v]
                else:
                    cur_map, cur_two = {}, False
            elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
                emit(stack[-1])
            elif op in (b"'", b'"'):
                if stack and isinstance(stack[-1], bytes):
                    out.append("\n")
                    emit(stack[-1])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for item in stack[-1]:
                    if isinstance(item, bytes):
                        emit(item)
                    elif isinstance(item, float) and item < -KERN_SPACE_THRESHOLD:
                        out.append(" ")
            elif op in (b"Td", b"TD", b"T*"):
                out.append("\n")
            elif op == b"ET":
                out.append("\n")
            stack.clear()
    text = "".join(out)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r" ?\n ?", "\n", text)
    return re.sub(r"\n{2,}", "\n", text).strip()


def extract_pdf_text(payload: bytes) -> str:
    """Extract text from every page, pages joined by form feeds."""
    doc = PdfDocument(payload)
    pages = doc.pages()
    if not pages:
        raise ValueError("PDF with no page objects")
    return "\x0c".join(doc.page_text(p) for p in pages)


def pdf_page_count(payload: bytes) -> int:
    return len(PdfDocument(payload).pages())


# ---------------------------------------------------------------------------
# fixture writer: a spec-literal classic-xref PDF with Flate content


def build_pdf(
    pages_text: list[str],
    compress: bool = True,
    tounicode_shift: int = 0,
    images: list | None = None,
) -> bytes:
    """Minimal valid PDF: one Helvetica-ish font per doc; each page one
    BT/ET block, lines as Td-advanced Tj strings. ``tounicode_shift``
    > 0 writes content bytes shifted by that amount plus a ToUnicode
    CMap mapping them back — exercising the CMap decode path.

    ``images``: optional list of dicts embedded as /Subtype /Image
    XObjects on page 1 (referenced by Do operators): ``rgb`` an HxWx3
    (or HxW gray) uint8 array; ``filter`` one of 'jpeg' (DCTDecode via
    the from-spec operators/jpeg.py encoder), 'flate', 'flate-pred'
    (FlateDecode with PNG Up-predictor rows) or 'raw'."""
    import numpy as np

    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    image_nums: list[int] = []
    for spec in images or []:
        rgb = np.asarray(spec["rgb"], dtype=np.uint8)
        gray = rgb.ndim == 2
        ih, iw = rgb.shape[:2]
        cs = b"/DeviceGray" if gray else b"/DeviceRGB"
        filt = spec.get("filter", "flate")
        if filt in ("g4", "g3", "g3_2d", "g3_aligned"):
            # bilevel CCITT fax XObject: rgb is [h, w] 0/1 ink mask.
            # g4 → K -1 (T.6); g3 → K 0 MH with EndOfLine; g3_aligned
            # → K 0 + EncodedByteAlign (no EOLs); g3_2d → K 4 mixed
            from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ccitt import (
                g3_encode,
                g4_encode,
            )

            ink = (np.asarray(spec["rgb"]) > 0).astype(np.uint8)
            gh, gw = ink.shape
            if filt == "g4":
                data = g4_encode(ink)
                parms = b"/K -1 "
            elif filt == "g3":
                data = g3_encode(ink, two_d_k=0, eols=True)
                parms = b"/K 0 /EndOfLine true "
            elif filt == "g3_aligned":
                data = g3_encode(ink, two_d_k=0, byte_align=True,
                                 eols=False)
                parms = b"/K 0 /EncodedByteAlign true "
            else:
                data = g3_encode(ink, two_d_k=4, eols=True)
                parms = b"/K 4 "
            image_nums.append(
                add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                    b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                    b"/Filter /CCITTFaxDecode /DecodeParms << %s"
                    b"/Columns %d /Rows %d >> /Length %d >>\n"
                    b"stream\n%s\nendstream"
                    % (gw, gh, parms, gw, gh, len(data), data)
                )
            )
            continue
        if filt == "indexed":
            # Indexed-over-RGB with the palette in its own
            # FlateDecode-compressed stream object (the common real-PDF
            # shape); image samples are 8-bit palette indices
            flat = rgb.reshape(-1, 3)
            pal_rgb, idx = np.unique(flat, axis=0, return_inverse=True)
            if len(pal_rgb) > 256:
                raise ValueError("indexed fixture needs <=256 colors")
            pal_data = zlib.compress(pal_rgb.astype(np.uint8).tobytes())
            pal_num = add(
                b"<< /Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
                % (len(pal_data), pal_data)
            )
            data = zlib.compress(idx.astype(np.uint8).tobytes())
            image_nums.append(
                add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                    b"/ColorSpace [/Indexed /DeviceRGB %d %d 0 R] "
                    b"/BitsPerComponent 8 /Filter /FlateDecode /Length %d >>\n"
                    b"stream\n%s\nendstream"
                    % (iw, ih, len(pal_rgb) - 1, pal_num, len(data), data)
                )
            )
            continue
        extra = b""
        if filt == "jpeg":
            from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
                encode_jpeg,
                encode_jpeg_gray,
            )

            data = encode_jpeg_gray(rgb) if gray else encode_jpeg(rgb)
            extra = b" /Filter /DCTDecode"
        elif filt in ("flate", "flate-pred", "raw"):
            raw = rgb.tobytes()
            if filt == "flate-pred":
                ncomp = 1 if gray else 3
                stride = iw * ncomp
                rows = bytearray()
                prev = bytes(stride)
                for r in range(ih):
                    row = raw[r * stride : (r + 1) * stride]
                    rows.append(2)  # PNG Up predictor
                    rows += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
                    prev = row
                data = zlib.compress(bytes(rows))
                extra = (
                    b" /Filter /FlateDecode /DecodeParms << /Predictor 12 "
                    b"/Colors %d /Columns %d >>" % (ncomp, iw)
                )
            elif filt == "flate":
                data = zlib.compress(raw)
                extra = b" /Filter /FlateDecode"
            else:
                data = raw
        else:
            raise ValueError(f"unknown fixture image filter {filt}")
        image_nums.append(
            add(
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace %s /BitsPerComponent 8%s /Length %d >>\n"
                b"stream\n%s\nendstream" % (iw, ih, cs, extra, len(data), data)
            )
        )

    font_extra = b""
    tou_num = None
    if tounicode_shift:
        cmap_pairs = b"\n".join(
            b"<%04X> <%04X>" % (c + tounicode_shift, c) for c in range(32, 127)
        )
        cmap = (
            b"/CIDInit /ProcSet findresource begin\n"
            b"1 begincodespacerange <00> <FF> endcodespacerange\n"
            b"95 beginbfchar\n" + cmap_pairs + b"\nendbfchar\nend"
        )
        tou_num = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap)
        )
        font_extra = b" /ToUnicode %d 0 R" % tou_num
    font_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>" % font_extra
    )
    page_nums = []
    content_nums = []
    for pi, text in enumerate(pages_text):
        lines = text.split("\n")
        parts = [b"BT /F1 12 Tf 72 720 Td"]
        for li, line in enumerate(lines):
            raw = line.encode("latin-1", "replace")
            if tounicode_shift:
                raw = bytes((b + tounicode_shift) & 0xFF for b in raw)
            esc = raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
            if li:
                parts.append(b"0 -14 Td")
            parts.append(b"(%s) Tj" % esc)
        parts.append(b"ET")
        if pi == 0:
            for ii in range(len(image_nums)):
                parts.append(
                    b"q 96 0 0 96 %d 96 cm /Im%d Do Q" % (72 + 110 * ii, ii)
                )
        body = b" ".join(parts)
        if compress:
            body = zlib.compress(body)
            content_nums.append(
                add(
                    b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                    % (len(body), body)
                )
            )
        else:
            content_nums.append(
                add(b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body))
            )
    pages_obj_num = len(objs) + len(pages_text) + 1
    for pi, cn in enumerate(content_nums):
        xres = b""
        if pi == 0 and image_nums:
            refs = b" ".join(
                b"/Im%d %d 0 R" % (ii, n) for ii, n in enumerate(image_nums)
            )
            xres = b" /XObject << %s >>" % refs
        page_nums.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 %d 0 R >>%s >> /Contents %d 0 R >>"
                % (pages_obj_num, font_num, xres, cn)
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    pages_num = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    )
    assert pages_num == pages_obj_num
    cat_num = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, cat_num, xref_off)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# embedded images (r10 verdict "Next round" #4): /Subtype /Image
# XObjects re-emitted as SNIFFABLE image payloads so PDF-borne images
# flow through the same multimodal registry (aHash/pHash dedup, EXIF,
# WebDataset sharding) as crawled images (ISO 32000-1 §8.9).


def _png_unpredict(data: bytes, colors: int, columns: int) -> bytes:
    """Inverse of the PNG row predictors PDF streams may apply
    (/DecodeParms /Predictor >= 10; ISO 32000-1 §7.4.4.4 delegates to
    the PNG spec). 8-bit components only (the scope the builder and
    real pdfTeX image streams use)."""
    stride = colors * columns
    if len(data) % (stride + 1):
        raise ValueError("PDF predictor data not a whole number of rows")
    rows = len(data) // (stride + 1)
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(rows):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(colors, stride):
                row[i] = (row[i] + row[i - colors]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = row[i - colors] if i >= colors else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - colors] if i >= colors else 0
                b = prev[i]
                c = prev[i - colors] if i >= colors else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG predictor row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _ppm_p6(w: int, h: int, rgb: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


def extract_pdf_images(payload: bytes) -> list[dict]:
    """Extract every /Subtype /Image XObject as a sniffable payload.

    Per image a dict: ``index`` (document order), ``width``,
    ``height``, ``fmt`` and ``payload``:

    - DCTDecode streams pass through VERBATIM with fmt='jpeg' — a
      DCTDecode stream IS a JFIF/JPEG payload, which the registry
      sniffer routes to the from-spec operators/jpeg.py decoder;
    - FlateDecode / unfiltered sample streams (8-bit DeviceRGB,
      DeviceGray, ICCBased N∈{1,3}, Indexed-over-RGB, incl. PNG
      predictors 10..15) re-wrap as binary PPM (P6) with fmt='ppm';
    - anything else (JPXDecode, CCITTFaxDecode, LZWDecode, JBIG2,
      unsupported bit depths/spaces) is returned VISIBLY with
      fmt='skipped:<reason>' and payload=None — never wrong pixels.
    """
    import numpy as np

    doc = PdfDocument(payload)
    out = []
    idx = 0
    for num in sorted(doc.objects):
        val, stream = doc.objects[num]
        if not (isinstance(val, dict) and val.get("Subtype") == _Name("Image")):
            continue
        if stream is None:
            continue
        w = doc.resolve(val.get("Width"))
        h = doc.resolve(val.get("Height"))
        rec = {"index": idx, "width": int(w or 0), "height": int(h or 0)}
        idx += 1
        try:
            filt = doc.resolve(val.get("Filter"))
            filters = [] if filt is None else (filt if isinstance(filt, list) else [filt])
            filters = [doc.resolve(f) for f in filters]
            if filters and filters[-1] == _Name("DCTDecode"):
                data = stream
                for f in filters[:-1]:
                    if f != _Name("FlateDecode"):
                        raise ValueError(f"filter {f!r} before DCTDecode")
                    data = zlib.decompress(data)
                rec["fmt"] = "jpeg"
                rec["payload"] = bytes(data)
                out.append(rec)
                continue
            if filters and filters[-1] == _Name("CCITTFaxDecode"):
                # [r12] Group 4 (T.6) + [r13] Group 3 (K = 0 Modified
                # Huffman, K > 0 mixed 1-D/2-D) and EncodedByteAlign —
                # the shared run-length core, real-libtiff pinned in
                # tests/test_ccitt.py; the r12 named skips are closed
                data = stream
                for f in filters[:-1]:
                    if f != _Name("FlateDecode"):
                        raise ValueError(f"filter {f!r} before CCITTFaxDecode")
                    data = zlib.decompress(data)
                parms = doc.resolve(val.get("DecodeParms")) or {}
                if isinstance(parms, list):
                    parms = doc.resolve(parms[-1]) or {}
                k = int(doc.resolve(parms.get("K", 0)) or 0)
                align = bool(doc.resolve(parms.get("EncodedByteAlign")))
                eol = bool(doc.resolve(parms.get("EndOfLine")))
                cols = int(doc.resolve(parms.get("Columns", 1728)) or 1728)
                black1 = bool(doc.resolve(parms.get("BlackIs1")))
                from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ccitt import (
                    g3_decode,
                    g4_decode,
                )

                if k < 0:
                    bits = g4_decode(bytes(data), cols, int(h),
                                     byte_align=align)
                elif k == 0:
                    # pure 1-D; EndOfLine says whether EOLs are coded.
                    # EncodedByteAlign starts each row on a byte edge.
                    bits = g3_decode(bytes(data), cols, int(h),
                                     two_d=False, byte_align=align,
                                     eols=eol)
                else:
                    # mixed 1-D/2-D: EOL + tag framing; with
                    # EncodedByteAlign the fill runs ahead of each EOL
                    # are absorbed by the EOL scanner
                    bits = g3_decode(bytes(data), cols, int(h),
                                     two_d=True, eols=True)
                # PDF default (BlackIs1 false): decoded 0 bits are
                # BLACK; our G4 core returns 1 = black
                gray = ((1 - bits) if not black1 else bits) * 255
                gray = gray.astype(np.uint8)[:, : int(w)]
                if gray.shape[1] < int(w):
                    raise ValueError("CCITT Columns narrower than /Width")
                # 1-bit CCITT images are DeviceGray by construction
                arr3 = np.repeat(gray[:, :, None], 3, axis=2)
                rec["fmt"] = "ppm"
                rec["payload"] = _ppm_p6(int(w), int(h), arr3.tobytes())
                out.append(rec)
                continue
            # every non-DCT filter chain routes through the shared
            # stream decoder (Flate/LZW/ASCIIHex/ASCII85/RunLength)
            data = doc._decoded_stream(val, stream)
            bpc = int(doc.resolve(val.get("BitsPerComponent", 8)) or 8)
            if bpc != 8:
                raise ValueError(f"BitsPerComponent {bpc} outside the declared scope")
            cs = doc.resolve(val.get("ColorSpace"))
            palette = None
            if isinstance(cs, list) and cs and doc.resolve(cs[0]) == _Name("Indexed"):
                base = doc.resolve(cs[1])
                lookup = doc.resolve(cs[3])
                if isinstance(lookup, _Ref):
                    lookup = doc.resolve(lookup)
                if isinstance(lookup, bytes):
                    pal_bytes = lookup
                else:
                    pal_dict, pal_stream = doc.objects.get(cs[3].num, (None, None)) if isinstance(cs[3], _Ref) else (None, None)
                    # the palette stream carries its own /Filter chain
                    # (FlateDecode palettes are common in real PDFs)
                    pal_bytes = doc._decoded_stream(pal_dict or {}, pal_stream) if pal_stream else None
                if pal_bytes is None or doc.resolve(base) not in (_Name("DeviceRGB"),):
                    raise ValueError("Indexed color space outside the declared scope")
                palette = np.frombuffer(pal_bytes, dtype=np.uint8)
                ncomp = 1
            elif isinstance(cs, list) and cs and doc.resolve(cs[0]) == _Name("ICCBased"):
                icc_ref = cs[1]
                icc_val = doc.objects.get(icc_ref.num, ({}, None))[0] if isinstance(icc_ref, _Ref) else {}
                ncomp = int(doc.resolve((icc_val or {}).get("N", 3)) or 3)
                if ncomp not in (1, 3):
                    raise ValueError(f"ICCBased N={ncomp} outside the declared scope")
            elif cs == _Name("DeviceRGB") or cs is None:
                ncomp = 3
            elif cs == _Name("DeviceGray"):
                ncomp = 1
            else:
                raise ValueError(f"color space {cs!r} outside the declared scope")
            parms = doc.resolve(val.get("DecodeParms")) or {}
            if isinstance(parms, list):
                parms = doc.resolve(parms[-1]) or {}
            pred = int(doc.resolve(parms.get("Predictor", 1)) or 1)
            if pred >= 10:
                data = _png_unpredict(
                    data,
                    int(doc.resolve(parms.get("Colors", ncomp)) or ncomp),
                    int(doc.resolve(parms.get("Columns", w)) or w),
                )
            elif pred != 1:
                raise ValueError(f"predictor {pred} outside the declared scope")
            need = w * h * ncomp
            if len(data) < need:
                raise ValueError("torn PDF image samples")
            arr = np.frombuffer(data[:need], dtype=np.uint8)
            if palette is not None:
                pal = palette.reshape(-1, 3)
                arr = pal[np.minimum(arr, len(pal) - 1)].reshape(h, w, 3)
            elif ncomp == 1:
                arr = np.repeat(arr.reshape(h, w, 1), 3, axis=2)
            else:
                arr = arr.reshape(h, w, 3)
            rec["fmt"] = "ppm"
            rec["payload"] = _ppm_p6(w, h, arr.tobytes())
            out.append(rec)
        except (ValueError, zlib.error) as exc:
            rec["fmt"] = f"skipped:{exc}"
            rec["payload"] = None
            out.append(rec)
    return out
