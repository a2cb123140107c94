"""robots.txt compliance filtering (the crawl-policy gate).

A responsible crawl corpus keeps only URLs its user agent was allowed to
fetch; re-checking against the captured robots.txt snapshots is a
standard curation pass (and a takedown-audit tool). Policies are a
per-domain dimension table — tiny next to the page corpus — so the
filter is a broadcast equi-join on the registrable host plus an
Arrow-batched policy evaluation.

Rule semantics are RFC 9309 (the standardized Robots Exclusion
Protocol): group selection picks the most specific matching user-agent
token (``*`` as fallback, same-token groups merged), and rule matching
is LONGEST-MATCH-WINS over the path+query with ``*`` wildcards and ``$``
end anchors — at equal length, Allow wins. (The original 1994 REP and
stdlib ``urllib.robotparser`` use first-match-wins rule order instead;
this module implements the RFC.)

Scale shape: pages never shuffle — the policy side broadcasts; parsing
each distinct robots.txt happens once per executor batch via an LRU
keyed on the policy text, not per row. Pages whose domain has no
policy row default to allowed (the crawl convention: no robots.txt =
no restrictions).
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_host(col) -> "F.Column":
    """Lowercased host (authority minus port/userinfo) of a URL column —
    the policy join key."""
    return F.lower(
        F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    )


class RobotsPolicy:
    """One parsed robots.txt, evaluated per RFC 9309 §2.2 for a single
    user agent. Group selection happens at parse time (the agent is
    fixed per query), rule matching per call."""

    def __init__(self, txt: str, user_agent: str) -> None:
        ua = user_agent.lower()
        # parse into groups: [(agent_tokens, rules)] where a run of
        # User-agent lines opens a group and any rule line closes the run
        groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        agents: list[str] = []
        rules: list[tuple[bool, str]] = []
        in_agent_run = False
        for raw in txt.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key, val = key.strip().lower(), val.strip()
            if key == "user-agent":
                if not in_agent_run and agents:
                    groups.append((agents, rules))
                    agents, rules = [], []
                agents.append(val.lower())
                in_agent_run = True
            elif key in ("allow", "disallow"):
                in_agent_run = False
                if agents:  # rules before any User-agent line are ignored
                    # empty Disallow = "allow everything" = no rule (RFC 9309)
                    if val:
                        rules.append((key == "allow", val))
            else:
                in_agent_run = False  # crawl-delay/sitemap etc. close the run
        if agents:
            groups.append((agents, rules))
        # RFC 9309 §2.2.1: obey the group(s) with the most specific
        # matching agent token; '*' only when nothing specific matches.
        # Product-token match: the line value is a prefix of our agent.
        best_len = -1
        for gagents, _ in groups:
            for a in gagents:
                if a != "*" and ua.startswith(a) and len(a) > best_len:
                    best_len = len(a)
        self.rules: list[tuple[bool, str, re.Pattern]] = []
        for gagents, grules in groups:
            chosen = (
                any(a != "*" and ua.startswith(a) and len(a) == best_len for a in gagents)
                if best_len >= 0
                else "*" in gagents
            )
            if chosen:
                for allow, pat in grules:
                    self.rules.append((allow, pat, _compile_path_pattern(pat)))

    def allowed(self, url: str) -> bool:
        """RFC 9309 §2.2.2: of all matching rules, the one with the
        longest pattern (octet length) decides; Allow wins length ties;
        no matching rule → allowed."""
        try:
            parts = urlsplit(url)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
        except ValueError:
            path = "/"
        best: tuple[int, bool] | None = None
        for allow, pat, rx in self.rules:
            if rx.match(path):
                # RFC 9309 counts matched OCTETS: a trailing '$' anchor is
                # not an octet, so 'Disallow: /p$' must not outrank an
                # equally specific 'Allow: /p' — rank by pattern length
                # excluding the anchor; Allow still wins exact ties
                plen = len(pat) - 1 if pat.endswith("$") else len(pat)
                key = (plen, allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]


def _compile_path_pattern(pat: str) -> re.Pattern:
    """robots path pattern → anchored regex: '*' matches any run of
    octets, a trailing '$' anchors the end, everything else is literal."""
    anchored = pat.endswith("$")
    if anchored:
        pat = pat[:-1]
    rx = "".join(".*" if c == "*" else re.escape(c) for c in pat)
    return re.compile(rx + ("$" if anchored else ""))


def filter_by_robots(
    pages: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    txt_col: str = "robots_txt",
    user_agent: str = "mtdp-bot",
    keep_disallowed: bool = False,
) -> DataFrame:
    """Annotate (and by default filter) ``pages`` by robots.txt policy.

    ``robots`` is (host, robots_txt). Returns the page rows plus an
    ``allowed`` boolean; when ``keep_disallowed`` is False only allowed
    rows survive (the curation gate), otherwise all rows return with the
    flag (the audit form).
    """
    joined = pages.withColumn("__host", url_host(F.col(url_col))).join(
        F.broadcast(
            robots.select(
                F.lower(F.col(host_col)).alias("__host"),
                F.col(txt_col).alias("__robots"),
            )
        ),
        "__host",
        "left",
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, RobotsPolicy] = {}

        def allowed(url: str, txt: str | None) -> bool:
            if txt is None or not str(txt).strip():
                return True  # no policy → allowed (crawl convention)
            txt = str(txt)
            rp = cache.get(txt)
            if rp is None:
                rp = RobotsPolicy(txt, user_agent)
                if len(cache) > 1024:
                    cache.clear()
                cache[txt] = rp
            return rp.allowed(url)

        for pdf in batches:
            out = pdf.drop(columns=["__robots"])
            out["allowed"] = [
                allowed(u, t) for u, t in zip(pdf[url_col], pdf["__robots"])
            ]
            yield out

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in pages.schema.fields
    )
    result = joined.mapInPandas(op, f"{out_schema}, __host string, allowed boolean").drop(
        "__host"
    )
    return result if keep_disallowed else result.where(F.col("allowed")).drop("allowed")


# ---------------------------------------------------------------------------
# Sitemap discovery (RFC 9309 §2.3 "Other records"): "Sitemap:" lines
# are GROUP-INDEPENDENT — they apply regardless of user-agent sections —
# with a case-insensitive key and an absolute-URL value. This is the
# link from the robots gate to the sitemap frontier (operators/html.py
# extract_sitemap_entries): discover the sitemaps here, fetch, then
# seed. Same generated Spark/DuckDB twin convention as extract_links.

#: leading whitespace, case-insensitive key, colon, optional whitespace,
#: the URL token (\S stops before any \r of a CRLF file). Java ∩ RE2.
_SITEMAP_DIRECTIVE_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^\s]+)"


def extract_sitemap_directives(col) -> "F.Column":
    """All Sitemap: directive URLs of a robots.txt string column, in
    document order (duplicates preserved — mirrored directives are a
    real signal)."""
    return F.regexp_extract_all(col, F.lit(_SITEMAP_DIRECTIVE_RE), 1)


def extract_sitemap_directives_sql(expr: str) -> str:
    """The DuckDB twin, generated from the same pattern constant."""
    esc = _SITEMAP_DIRECTIVE_RE.replace("'", "''")
    return f"regexp_extract_all({expr}, '{esc}', 1)"
