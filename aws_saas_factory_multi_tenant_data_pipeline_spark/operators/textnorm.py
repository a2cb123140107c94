"""Unicode normalization for web-scraped corpora (CCNet/C4-style cleanup).

Spark has no NFC/NFKC builtin; this is the deterministic subset that
matters for LLM training text: accent folding, typographic-punctuation
canonicalization, zero-width/control stripping, whitespace collapse —
expressed as translate + regexp chains that run at scan speed inside
whole-stage codegen, with a GENERATED DuckDB twin
(:func:`normalize_unicode_sql`) built from the same constant tables so
the two chains cannot drift; the ``text_normalize_unicode`` corpus query
oracle-checks the result character-for-character.

This module is ASCII-only on purpose: every non-ASCII character appears
as a ``\\uXXXX`` escape so the mapping is reviewable and immune to
editor/encoding mangling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Latin-1 accent folding + typographic punctuation canonicalization.
# One-to-one (translate semantics): a-z accents, A-Z accents, then
# curly double quotes x3, curly single quotes x3, en/em dash + hyphen.
_NORM_FROM = (
    "áàâäãåéèêë"
    "íìîïóòôöõ"
    "úùûüýÿçñ"
    "ÁÀÂÄÃÅÉÈÊË"
    "ÍÌÎÏÓÒÔÖÕ"
    "ÚÙÛÜÝÇÑ"
    "“”„‘’‚–—‐"
)
_NORM_TO = (
    "aaaaaaeeee"
    "iiiiooooo"
    "uuuuyycn"
    "AAAAAAEEEE"
    "IIIIOOOOO"
    "UUUUYCN"
    '"""' "'''" "---"
)
assert len(_NORM_FROM) == len(_NORM_TO), (len(_NORM_FROM), len(_NORM_TO))

_ELLIPSIS = "…"
_ZERO_WIDTH = "[​‌‍﻿]"
_UNI_SPACE = "[   -   　\\t]"
_CONTROL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def normalize_unicode(col: Column) -> Column:
    """Canonical ASCII-leaning form of web text: fold Latin-1 accents,
    straighten curly quotes/dashes, expand ellipsis, drop zero-width
    characters, map exotic spaces/tabs and control characters to plain
    spaces, collapse space runs (newlines survive — document structure is
    signal), trim. Pure codegen'd string expressions: scan speed, the
    right cost for a pass that touches every byte of a 100 TB corpus."""
    c = F.translate(col, _NORM_FROM, _NORM_TO)
    c = F.regexp_replace(c, _ELLIPSIS, "...")
    c = F.regexp_replace(c, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, _UNI_SPACE, " ")
    c = F.regexp_replace(c, _CONTROL, " ")
    c = F.regexp_replace(c, " {2,}", " ")
    return F.trim(c)


def normalize_unicode_sql(expr: str) -> str:
    """The DuckDB twin of :func:`normalize_unicode`, generated from the
    SAME constant tables (accents, quote/dash map, character classes) so
    the Spark chain and the oracle chain cannot drift apart."""
    f = _NORM_FROM.replace("'", "''")
    to = _NORM_TO.replace("'", "''")
    s = f"translate({expr}, '{f}', '{to}')"
    s = f"regexp_replace({s}, '{_ELLIPSIS}', '...', 'g')"
    s = f"regexp_replace({s}, '{_ZERO_WIDTH}', '', 'g')"
    s = f"regexp_replace({s}, '{_UNI_SPACE}', ' ', 'g')"
    s = f"regexp_replace({s}, '{_CONTROL}', ' ', 'g')"
    s = f"regexp_replace({s}, ' {{2,}}', ' ', 'g')"
    return f"trim({s})"
