"""HTML-to-text extraction (the WARC → text pipeline stage).

Web-crawl training data arrives as HTML inside WARC response bodies; the
first transformation every corpus pipeline runs is boilerplate-free text
extraction. This is the deterministic regexp-chain subset (a
trafilatura-lite): drop non-content subtrees (script/style/head/comments),
convert block-level boundaries to newlines, strip remaining tags, decode
the common entities, collapse whitespace. Like ``textnorm``, the chain is
pure codegen'd string expressions — scan speed, the right cost for a pass
that touches every crawled byte — and the DuckDB twin
(:func:`html_to_text_sql`) is GENERATED from the same constant tables so
the two chains cannot drift; ``text_html_extract`` oracle-checks the
output character-for-character.

Regex dialect note: every pattern here stays in the common subset of
Java regex (Spark) and RE2 (DuckDB) — lazy quantifiers, (?is) flags,
character classes; no backreferences, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: subtrees whose text is never content — removed wholesale
_DROP_BLOCKS = [
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?is)<head\b[^>]*>.*?</head>",
    r"(?s)<!--.*?-->",
]

#: tags whose boundary implies a line break in the extracted text
_BLOCK_BREAK = r"(?i)</?(p|div|br|h[1-6]|li|tr|table|section|article|blockquote)\b[^>]*>"

#: any remaining tag
_ANY_TAG = r"(?s)<[^>]*>"

#: entity decode map (the high-frequency set; ordered — amp LAST so
#: double-escaped text decodes one level only, the standard behavior)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def html_to_text(col: Column) -> Column:
    """Extract readable text from an HTML string column. Deterministic
    regexp chain; see module docstring for exactly what is handled."""
    c = col
    for pat in _DROP_BLOCKS:
        c = F.regexp_replace(c, pat, " ")
    c = F.regexp_replace(c, _BLOCK_BREAK, "\n")
    c = F.regexp_replace(c, _ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        # literal replace via regexp with the entity escaped (entities
        # contain no regex metacharacters except '&' and '#', both literal)
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n[ \n]*", "\n")
    return F.btrim(c, F.lit(" \n"))


def html_to_text_sql(expr: str) -> str:
    """The DuckDB twin, generated from the SAME constant tables."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    s = expr
    for pat in _DROP_BLOCKS:
        s = f"regexp_replace({s}, '{esc(pat)}', ' ', 'g')"
    s = f"regexp_replace({s}, '{esc(_BLOCK_BREAK)}', chr(10), 'g')"
    s = f"regexp_replace({s}, '{esc(_ANY_TAG)}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = "chr(10)" if rep == "\n" else f"'{esc(rep)}'"
        s = f"regexp_replace({s}, '{esc(ent)}', {rep_sql}, 'g')"
    s = f"regexp_replace({s}, '[ \\t]+', ' ', 'g')"
    s = f"regexp_replace({s}, ' ?\\n[ \\n]*', chr(10), 'g')"
    return f"trim({s}, ' ' || chr(10))"


#: href matcher: <a …href="…"> / <a …href='…'> — Java-regex ∩ RE2 subset
#: (lazy quantifier + capture group; no lookaround, no backreferences).
#: The \s before href anchors the ATTRIBUTE-NAME boundary: without it,
#: data-href/xhref lazy-load and tracking attributes — common in real
#: crawled HTML — would be extracted as frontier links.
_HREF_RE = r"""(?is)<a\b[^>]*?\shref\s*=\s*["']([^"'<>\s]+)["']"""

#: frontier scope: absolute web links only (crawl frontiers resolve
#: relative links against the page URL upstream; mailto/javascript/data
#: and fragment-only hrefs are never frontier candidates)
_ABS_LINK_RE = r"(?i)^https?://"


def extract_links(col: Column) -> Column:
    """All absolute http(s) hrefs of an HTML string column, in document
    order (duplicates preserved — frequency matters to frontier
    scoring). Same codegen'd-regex cost model as :func:`html_to_text`;
    feed through ``urlnorm.canonicalize_url`` for dedup-safe edges."""
    return F.filter(
        F.regexp_extract_all(col, F.lit(_HREF_RE), 1),
        lambda u: u.rlike(_ABS_LINK_RE),
    )


def extract_links_sql(expr: str) -> str:
    """The DuckDB twin, generated from the same patterns."""
    esc = _HREF_RE.replace("'", "''")
    return (
        f"list_filter(regexp_extract_all({expr}, '{esc}', 1), "
        f"u -> regexp_matches(u, '{_ABS_LINK_RE}'))"
    )
