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


# ---------------------------------------------------------------------------
# sitemap.xml frontier extraction (the third leg of the crawl-politeness
# trio: robots.txt gate -> sitemap seeds -> page link graph). Protocol:
# sitemaps.org 0.9 (public; also RFC-referenced by robots Sitemap: lines):
# a <urlset> of <url> entries (loc required, lastmod optional) or a
# <sitemapindex> of child <sitemap> entries. loc content is XML
# entity-escaped. Same generated Spark/DuckDB twin convention as
# extract_links — both engines run regexes generated from ONE set of
# pattern constants, so extraction is verified character-for-character.

#: entry blocks — Java-regex ∩ RE2 subset (inline flags, lazy quantifier)
_SITEMAP_URL_BLOCK_RE = r"(?is)<url\b[^>]*>(.*?)</url>"
_SITEMAP_CHILD_BLOCK_RE = r"(?is)<sitemap\b[^>]*>(.*?)</sitemap>"
#: fields within a block; a plain loc's content never contains '<',
#: and CDATA-wrapped locs (several common generators emit them) are
#: matched separately — CDATA content is LITERAL, so it skips the
#: entity unescape the plain form gets
_SITEMAP_LOC_RE = r"(?is)<loc\b[^>]*>\s*([^<]*?)\s*</loc>"
_SITEMAP_LOC_CDATA_RE = r"(?is)<loc\b[^>]*>\s*<!\[CDATA\[\s*(.*?)\s*\]\]>\s*</loc>"
_SITEMAP_LASTMOD_RE = r"(?is)<lastmod\b[^>]*>\s*([^<]*?)\s*</lastmod>"

#: the five predefined XML entities; &amp; decoded LAST so escaped
#: entity text (&amp;lt;) yields the literal entity, not a double decode
_XML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"))


def _xml_unescape(col: Column) -> Column:
    for ent, ch in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _xml_unescape_sql(expr: str) -> str:
    for ent, ch in _XML_ENTITIES:
        c = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{c}')"
    return expr


def extract_sitemap_entries(col: Column) -> Column:
    """array<struct<kind, loc, lastmod>> from a sitemap XML column:
    'url' entries from a <urlset> and 'sitemap' child entries from a
    <sitemapindex>, in document order per kind; loc XML-unescaped and
    whitespace-trimmed (CDATA-wrapped locs taken literally, per XML),
    lastmod '' when absent; entries without a loc are dropped (a
    loc-less entry seeds nothing)."""

    def entries(block_re: str, kind: str) -> Column:
        blocks = F.regexp_extract_all(col, F.lit(block_re), 1)

        def loc_of(b: Column) -> Column:
            cdata = F.regexp_extract(b, _SITEMAP_LOC_CDATA_RE, 1)
            plain = _xml_unescape(F.regexp_extract(b, _SITEMAP_LOC_RE, 1))
            return F.when(cdata != "", cdata).otherwise(plain)

        return F.transform(
            blocks,
            lambda b: F.struct(
                F.lit(kind).alias("kind"),
                loc_of(b).alias("loc"),
                F.regexp_extract(b, _SITEMAP_LASTMOD_RE, 1).alias("lastmod"),
            ),
        )

    both = F.concat(
        entries(_SITEMAP_URL_BLOCK_RE, "url"),
        entries(_SITEMAP_CHILD_BLOCK_RE, "sitemap"),
    )
    return F.filter(both, lambda e: e["loc"] != "")


def extract_sitemap_entries_sql(expr: str) -> str:
    """The DuckDB twin, generated from the same pattern constants;
    returns a list of struct(kind, loc, lastmod)."""

    def esc(p: str) -> str:
        return p.replace("'", "''")

    def entries(block_re: str, kind: str) -> str:
        cdata = f"regexp_extract(b, '{esc(_SITEMAP_LOC_CDATA_RE)}', 1)"
        plain = _xml_unescape_sql(f"regexp_extract(b, '{esc(_SITEMAP_LOC_RE)}', 1)")
        loc = f"(CASE WHEN {cdata} <> '' THEN {cdata} ELSE {plain} END)"
        lastmod = f"regexp_extract(b, '{esc(_SITEMAP_LASTMOD_RE)}', 1)"
        return (
            f"list_transform(regexp_extract_all({expr}, '{esc(block_re)}', 1), "
            f"b -> struct_pack(kind := '{kind}', loc := {loc}, "
            f"lastmod := {lastmod}))"
        )

    both = (
        f"list_concat({entries(_SITEMAP_URL_BLOCK_RE, 'url')}, "
        f"{entries(_SITEMAP_CHILD_BLOCK_RE, 'sitemap')})"
    )
    return f"list_filter({both}, e -> e.loc <> '')"
