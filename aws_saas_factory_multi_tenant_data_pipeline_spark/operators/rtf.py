"""RTF text extraction — .rtf is the interchange format every word
processor of the 1990s–2000s web wrote, and real crawls still carry it
(mail attachments, legal/government document dumps).

Implemented from the PUBLIC Rich Text Format specification (the RTF
1.9.1 spec document): the tokenizer (control words ``\\word`` with an
optional signed numeric parameter and ONE optional trailing space that
belongs to the control word; control symbols ``\\x``; group braces
push/pop full interpreter state), ``\\'xx`` hex-escaped bytes decoded
through the ACTIVE codepage (``\\ansicpgN``, default cp1252),
``\\uN`` Unicode escapes with negative-N + 65536 wraparound and the
``\\ucN`` fallback-skip protocol (after ``\\uN`` the next uc
fallback items are consumed — a plain character, one ``\\'xx``, or a
whole control word each count as ONE item), ``\\binN`` raw-byte skip
(the bytes are NOT RTF and must not be tokenized), destination groups
(fonttbl/colortbl/stylesheet/info/pict/object/header/footer and every
``{\\*\\...}`` unknown destination) dropped with their entire
subtree — a ``\\par`` inside a skipped group emits nothing — and the
text-mapping control words (``\\par \\line \\sect \\page`` → newline,
``\\tab`` → tab, ``\\emdash \\endash \\bullet \\lquote \\rquote
\\ldblquote \\rdblquote \\~ \\_``).

No RTF reader or real .rtf artifact exists on this host (no
LibreOffice/antiword/unrtf; verified by search) — the pin discipline
therefore follows the OOXML precedent: trap-laden fixture writers
(build_rtf encodes non-ASCII BOTH ways — \\uN with live \\ucN
fallbacks AND codepage \\'xx — nests skipped destinations containing
\\par, and splits paragraphs across formatting groups) plus the
visible-gap tripwire in tests/test_realworld_r15.py that fails the
moment a real artifact or reference reader appears.

Reference parity: the reference lake's schema-on-read ingest
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44) extended
by the north-star text-pipeline mandate. Tear contract: ValueError —
and only ValueError — so the Spark exploder quarantines per-row.
"""

from __future__ import annotations

import re

_SYMBOL_MAP = {
    "par": "\n", "line": "\n", "sect": "\n", "page": "\n",
    "tab": "\t", "emdash": "\u2014", "endash": "\u2013",
    "bullet": "\u2022", "lquote": "\u2018", "rquote": "\u2019",
    "ldblquote": "\u201c", "rdblquote": "\u201d",
    "emspace": "\u2003", "enspace": "\u2002", "qmspace": "\u2005",
}

_SKIP_DESTINATIONS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "footnote", "annotation", "xe", "tc",
    "fldinst",  # field INSTRUCTIONS skip; \fldrslt (the display
    # text) passes through — {\field{\*\fldinst ...}{\fldrslt X}}
    "themedata", "colorschememapping", "datastore", "latentstyles",
    "listtable", "listoverridetable", "generator",
}

_CW_RE = re.compile(rb"([a-zA-Z]+)(-?[0-9]+)? ?")


def rtf_to_text(data: bytes) -> dict:
    """Extract plain text from RTF bytes.

    Returns {text, codepage, n_pars}. The interpreter keeps a full
    state stack: (skip-destination, uc skip count) per group; the
    codepage is global per spec (``\\ansicpg`` appears once in the
    header)."""
    if not data.startswith(b"{\\rtf"):
        raise ValueError("rtf: missing {\\rtf header")
    try:
        return _interpret(data)
    except (IndexError, UnicodeDecodeError, LookupError) as e:
        raise ValueError("rtf: torn document (%s)" % e) from e


def _interpret(data: bytes) -> dict:
    out: list[str] = []
    codepage = "cp1252"
    # state: [skipping, uc]
    stack: list[list] = []
    skipping = False
    uc = 1
    pending_skip = 0  # fallback items to swallow after \uN
    n_pars = 0
    i, n = 0, len(data)
    depth = 0
    while i < n:
        b = data[i]
        if b == 0x7B:  # {
            stack.append([skipping, uc])
            depth += 1
            i += 1
            if not skipping:
                # peek for a destination opener: {\dest or {\*\dest
                m = re.match(rb"\\(\*\\)?([a-zA-Z]+)", data[i:])
                if m:
                    word = m.group(2).decode("ascii")
                    if word == "fldrslt":
                        pass  # field RESULT is content
                    elif m.group(1) or word in _SKIP_DESTINATIONS:
                        skipping = True
            continue
        if b == 0x7D:  # }
            if not stack:
                raise ValueError("rtf: unbalanced closing brace")
            skipping, uc = stack.pop()
            depth -= 1
            i += 1
            continue
        if b == 0x5C:  # backslash
            i += 1
            if i >= n:
                raise ValueError("rtf: dangling backslash")
            c = data[i]
            if c == 0x27:  # \'xx hex byte
                two = data[i + 1 : i + 3]
                if len(two) != 2:
                    raise ValueError("rtf: torn hex escape")
                try:
                    byte = bytes([int(two, 16)])
                except ValueError as e:
                    raise ValueError("rtf: bad hex escape") from e
                i += 3
                if pending_skip:
                    pending_skip -= 1
                elif not skipping:
                    out.append(byte.decode(codepage, errors="replace"))
                continue
            if not (0x41 <= c <= 0x5A or 0x61 <= c <= 0x7A):
                # control symbol: one char
                i += 1
                if pending_skip:
                    pending_skip -= 1
                    continue
                if skipping:
                    continue
                ch = chr(c)
                if ch in "\\{}":
                    out.append(ch)
                elif ch == "~":
                    out.append("\u00a0")
                elif ch == "_":
                    out.append("\u2011")
                elif ch == "-":
                    pass  # optional hyphen: invisible
                elif ch == "*":
                    pass  # handled at group open; mid-group: ignore
                elif ch in "\r\n":
                    out.append("\n")  # escaped raw newline = \par
                    n_pars += 1
                continue
            m = _CW_RE.match(data, i)
            word = m.group(1).decode("ascii")
            param = int(m.group(2)) if m.group(2) else None
            i = m.end()
            if word == "bin":
                take = max(0, param or 0)
                i += take  # raw bytes: never tokenized
                if pending_skip:
                    pending_skip -= 1
                continue
            if pending_skip:
                pending_skip -= 1  # a control word is ONE fallback item
                continue
            if word == "u":
                if param is None:
                    continue
                cp = param + 65536 if param < 0 else param
                if not skipping:
                    if 0 <= cp <= 0x10FFFF:
                        out.append(chr(cp))
                pending_skip = uc
                continue
            if word == "uc":
                uc = max(0, param if param is not None else 1)
                continue
            if word == "ansicpg" and param:
                codepage = "cp%d" % param
                # validate eagerly so a bogus page tears loudly
                b"\x41".decode(codepage)
                continue
            if skipping:
                continue
            if word in _SYMBOL_MAP:
                out.append(_SYMBOL_MAP[word])
                if word in ("par", "sect", "page"):
                    n_pars += 1
                continue
            # any other control word: formatting, ignored
            continue
        # plain text byte
        i += 1
        if b in (0x0D, 0x0A, 0x00):
            continue  # raw CR/LF in source are NOT content
        if pending_skip:
            pending_skip -= 1
            continue
        if not skipping:
            out.append(bytes([b]).decode(codepage, errors="replace"))
    if stack:
        raise ValueError("rtf: unbalanced open brace")
    text = "".join(out)
    # the final \par closes the document body: trailing breaks trim
    return {"text": text.rstrip("\n"), "codepage": codepage,
            "n_pars": n_pars}


def _escape(ch: str, codepage: str) -> str:
    o = ord(ch)
    if ch in "\\{}":
        return "\\" + ch
    if o < 128:
        return ch
    # prefer the codepage byte when the char maps (with a \uN twin
    # emitted by build_rtf for every OTHER occurrence)
    try:
        enc = ch.encode(codepage)
        if len(enc) == 1:
            return "\\'%02x" % enc[0]
    except UnicodeEncodeError:
        pass
    u = o if o < 32768 else o - 65536
    return "\\u%d?" % u


def build_rtf(paragraphs: list[str], title: str = "",
              codepage: int = 1252) -> bytes:
    """Trap-laden RTF fixture writer.

    Non-ASCII characters alternate between codepage ``\\'xx`` escapes
    and ``\\uN`` with a LIVE ``\\uc1`` fallback ('?' must be
    swallowed); every third paragraph is wrapped in a formatting
    group; a ``{\\*\\generator}`` destination, a fonttbl, and an
    info group (carrying the title, which must NOT leak into text)
    sit between paragraphs; one ``\\bin`` blob embeds raw bytes that
    would tear a naive tokenizer."""
    cp = "cp%d" % codepage
    head = (
        "{\\rtf1\\ansi\\ansicpg%d\\deff0\\uc1"
        "{\\fonttbl{\\f0\\froman Times New Roman;}"
        "{\\f1\\fswiss Arial;}}"
        "{\\colortbl;\\red255\\green0\\blue0;}"
        "{\\stylesheet{\\s0 Normal;}}"
        "{\\*\\generator corpus fixture 1.0 \\par not text}"
        % codepage
    )
    if title:
        head += "{\\info{\\title %s}}" % "".join(
            _escape(c, cp) for c in title)
    body = []
    toggle = [0]

    def emit(ch: str) -> str:
        o = ord(ch)
        if o < 128 or ch in "\\{}":
            return _escape(ch, cp)
        toggle[0] ^= 1
        if toggle[0]:
            u = o if o < 32768 else o - 65536
            return "\\u%d?" % u  # '?' fallback must be swallowed
        return _escape(ch, cp)

    for k, para in enumerate(paragraphs):
        text = "".join(emit(c) for c in para)
        if k % 3 == 1:
            text = "{\\b\\f1 %s}" % text
        if k % 4 == 2:
            # a skipped destination with a \par inside: zero output
            text = "{\\*\\nosuchdest ghost \\par ghost}" + text
        body.append(text + "\\par\n")
    blob = b"\x7b\x7d\\'zz\xff"  # would tear the tokenizer if read
    tail = "{\\*\\blobholder\\bin%d " % len(blob)
    return (
        head.encode("ascii")
        + "".join(body).encode("ascii", errors="strict")
        + tail.encode("ascii") + blob + b"}"
        + b"}"
    )
