"""URL canonicalization for crawl pipelines (SURVEY.md §2 B10).

URL-level dedup runs BEFORE content dedup in every web-corpus pipeline:
the same page hides behind case-variant hosts, fragments, default ports,
shuffled query parameters, and tracking params. Canonicalization is a
pure string pipeline — scan speed — and every step here stays in
built-in expressions with a GENERATED DuckDB twin (the textnorm/html
drift-proofing pattern), so the corpus query oracle-checks the mapping
character-for-character.

Canonical form (conservative, dedup-safe — no %-decoding, which can
change semantics):

1. strip the fragment (``#…`` is client-side only);
2. lowercase the scheme and authority (host names are case-insensitive;
   paths are NOT touched);
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``);
5. sort the remaining query parameters (order never changes the
   resource); an emptied query drops its ``?``;
6. empty path before a query/end becomes ``/``.

Dialect note: match patterns stay in the Java-regex ∩ RE2 subset;
replacement strings differ per engine (``$1`` vs ``\\1``), which is why
the twin is generated rather than shared.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking parameters stripped before sorting
_TRACKING_RE = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid)="

#: authority matcher: scheme://host[:port]
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"


def canonicalize_url(col: Column) -> Column:
    u = F.regexp_replace(col, r"#.*", "")  # 1. fragment
    auth = F.regexp_extract(u, _AUTH_RE, 0)
    u = F.concat(F.lower(auth), F.substring(u, F.length(auth) + 1, F.lit(1 << 30)))  # 2.
    u = F.regexp_replace(u, r"^(http://[^/:?#]+):80([/?#].*)?$", "$1$2")  # 3.
    u = F.regexp_replace(u, r"^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    base = F.regexp_replace(u, r"\?.*", "")
    query = F.regexp_extract(u, r"\?(.*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    sorted_q = F.array_join(F.array_sort(kept), "&")  # 4 + 5
    u = F.when(sorted_q != "", F.concat(base, F.lit("?"), sorted_q)).otherwise(base)
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.\-]*://[^/?#]+)$", "$1/")  # 6.
    return F.regexp_replace(u, r"^([a-z][a-z0-9+.\-]*://[^/?#]+)\?", "$1/?")


def canonicalize_url_sql(expr: str) -> str:
    """The DuckDB twin, generated from the same patterns (replacement
    syntax differs: ``\\1`` instead of ``$1``)."""
    s = f"regexp_replace({expr}, '#.*', '', 'g')"
    auth = f"regexp_extract({s}, '{_AUTH_RE}')"
    s = f"lower({auth}) || substr({s}, length({auth}) + 1)"
    s = f"regexp_replace({s}, '^(http://[^/:?#]+):80([/?#].*)?$', '\\1\\2')"
    s = f"regexp_replace({s}, '^(https://[^/:?#]+):443([/?#].*)?$', '\\1\\2')"
    base = f"regexp_replace({s}, '\\?.*', '', 'g')"
    query = f"regexp_extract({s}, '\\?(.*)', 1)"
    kept = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))"
    )
    sorted_q = f"array_to_string(list_sort({kept}), '&')"
    s = f"CASE WHEN {sorted_q} <> '' THEN {base} || '?' || {sorted_q} ELSE {base} END"
    s = f"regexp_replace({s}, '^([a-z][a-z0-9+.\\-]*://[^/?#]+)$', '\\1/')"
    return f"regexp_replace({s}, '^([a-z][a-z0-9+.\\-]*://[^/?#]+)\\?', '\\1/?')"
