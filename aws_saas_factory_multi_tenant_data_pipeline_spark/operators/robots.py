"""robots.txt compliance filtering (the crawl-policy gate).

A responsible crawl corpus keeps only URLs its user agent was allowed to
fetch; re-checking against the captured robots.txt snapshots is a
standard curation pass (and a takedown-audit tool). Policies are a
per-domain dimension table — tiny next to the page corpus — so the
filter is a broadcast equi-join on the registrable host plus an
Arrow-batched policy evaluation with stdlib ``urllib.robotparser``
(agent groups, wildcard-agent fallback, Allow/Disallow with the
original REP's FIRST-MATCH-WINS rule order — note this differs from
Google's longest-match variant in RFC 9309; policies written for the
original semantics put Allow exceptions before their Disallow).

Scale shape: pages never shuffle — the policy side broadcasts; parsing
each distinct robots.txt happens once per executor batch via an LRU
keyed on the policy text hash, not per row. Pages whose domain has no
policy row default to allowed (the crawl convention: no robots.txt =
no restrictions).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def url_host(col) -> "F.Column":
    """Lowercased host (authority minus port/userinfo) of a URL column —
    the policy join key."""
    return F.lower(
        F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]*)", 1)
    )


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
        from urllib.robotparser import RobotFileParser

        cache: dict[str, RobotFileParser] = {}

        def allowed(url: str, txt: str | None) -> bool:
            if txt is None or not str(txt).strip():
                return True  # no policy → allowed (crawl convention)
            txt = str(txt)
            rp = cache.get(txt)
            if rp is None:
                rp = RobotFileParser()
                rp.parse(txt.splitlines())
                if len(cache) > 1024:
                    cache.clear()
                cache[txt] = rp
            return rp.can_fetch(user_agent, url)

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
