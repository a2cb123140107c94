"""robots.txt compliance filter: spec semantics through the distributed path."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
    filter_by_robots,
    url_host,
)

# stdlib robotparser applies rules first-match-wins (original REP), so the
# Allow exception precedes its Disallow
POLICY_A = """
User-agent: mtdp-bot
Allow: /private/press/
Disallow: /private/

User-agent: *
Disallow: /
"""

POLICY_B = """
User-agent: *
Disallow: /tmp/
"""


def _pages(spark):
    rows = [
        (0, "http://a.test/public/x"),
        (1, "http://a.test/private/secret"),
        (2, "http://a.test/private/press/release"),  # Allow overrides
        (3, "http://B.test/tmp/scratch"),  # host case-insensitive
        (4, "http://b.test/ok"),
        (5, "http://nopolicy.test/anything"),  # no robots row → allowed
        (6, "https://user@a.test:8443/private/deep"),  # userinfo+port stripped
    ]
    return spark.createDataFrame(rows, "page_id int, url string")


def _robots(spark):
    return spark.createDataFrame(
        [("a.test", POLICY_A), ("b.test", POLICY_B)], "host string, robots_txt string"
    )


def test_url_host_extraction(spark):
    df = _pages(spark).select("page_id", url_host(F.col("url")).alias("h"))
    got = {r["page_id"]: r["h"] for r in df.collect()}
    assert got[0] == "a.test" and got[3] == "b.test" and got[6] == "a.test"


def test_robots_filter_semantics(spark):
    kept = {
        r["page_id"]
        for r in filter_by_robots(_pages(spark), _robots(spark)).collect()
    }
    # 0 public ok; 1 disallowed; 2 allowed by the preceding Allow rule;
    # 3 /tmp/ disallowed; 4 ok; 5 no policy → ok; 6 /private/ disallowed
    assert kept == {0, 2, 4, 5}


def test_robots_audit_form_keeps_all_rows(spark):
    out = filter_by_robots(
        _pages(spark), _robots(spark), keep_disallowed=True
    ).collect()
    flags = {r["page_id"]: r["allowed"] for r in out}
    assert len(flags) == 7
    assert flags[1] is False and flags[2] is True and flags[5] is True


def test_robots_other_agent_blocked_everywhere(spark):
    kept = {
        r["page_id"]
        for r in filter_by_robots(
            _pages(spark), _robots(spark), user_agent="random-crawler"
        ).collect()
    }
    # POLICY_A's wildcard group disallows / → all a.test pages drop
    assert kept == {4, 5}


# --- RFC 9309 semantics (longest-match, not first-match) --------------------


def test_rfc9309_longest_match_beats_rule_order():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    # Allow listed FIRST but SHORTER — under original-REP first-match this
    # would allow; RFC 9309 longest-match disallows
    p = RobotsPolicy(
        "User-agent: *\nAllow: /p/\nDisallow: /p/secret/\n", "anybot"
    )
    assert p.allowed("http://x.test/p/open") is True
    assert p.allowed("http://x.test/p/secret/file") is False
    # and the mirror case: longer Allow carved out of a shorter Disallow,
    # regardless of order
    q = RobotsPolicy(
        "User-agent: *\nDisallow: /private/\nAllow: /private/press/\n", "anybot"
    )
    assert q.allowed("http://x.test/private/press/r") is True
    assert q.allowed("http://x.test/private/x") is False


def test_rfc9309_allow_wins_length_tie():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    p = RobotsPolicy("User-agent: *\nDisallow: /page\nAllow: /!age\n", "anybot")
    # equal-length patterns: only Disallow matches /page → disallowed
    assert p.allowed("http://x.test/page") is False
    q = RobotsPolicy("User-agent: *\nDisallow: /page\nAllow: /page\n", "anybot")
    assert q.allowed("http://x.test/page") is True  # tie → Allow wins


def test_rfc9309_wildcards_and_anchor():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    p = RobotsPolicy(
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\n", "anybot"
    )
    assert p.allowed("http://x.test/doc.pdf") is False
    assert p.allowed("http://x.test/doc.pdf.html") is True  # $ anchors the end
    assert p.allowed("http://x.test/tmp123/x") is False
    assert p.allowed("http://x.test/tmp123/y") is True
    # query string participates in matching
    q = RobotsPolicy("User-agent: *\nDisallow: /s?q=\n", "anybot")
    assert q.allowed("http://x.test/s?q=term") is False
    assert q.allowed("http://x.test/s") is True


def test_rfc9309_most_specific_agent_group():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    txt = (
        "User-agent: mtdp\nDisallow: /a/\n\n"
        "User-agent: mtdp-bot\nDisallow: /b/\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    p = RobotsPolicy(txt, "mtdp-bot")  # longest matching token: 'mtdp-bot'
    assert p.allowed("http://x.test/a/q") is True  # the 'mtdp' group is NOT ours
    assert p.allowed("http://x.test/b/q") is False
    assert p.allowed("http://x.test/c") is True  # '*' group not merged in
    stranger = RobotsPolicy(txt, "otherbot")
    assert stranger.allowed("http://x.test/anything") is False  # falls to '*'


def test_rfc9309_empty_disallow_and_merged_groups():
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    # empty Disallow is "no rule" (allow all); two groups for the same
    # token merge their rules
    txt = (
        "User-agent: a-bot\nDisallow:\n\n"
        "User-agent: b-bot\nUser-agent: c-bot\nDisallow: /x/\n\n"
        "User-agent: b-bot\nDisallow: /y/\n"
    )
    assert RobotsPolicy(txt, "a-bot").allowed("http://h/x/1") is True
    b = RobotsPolicy(txt, "b-bot")
    assert b.allowed("http://h/x/1") is False and b.allowed("http://h/y/1") is False
    c = RobotsPolicy(txt, "c-bot")
    assert c.allowed("http://h/x/1") is False and c.allowed("http://h/y/1") is True


def test_rfc9309_anchor_not_counted_in_specificity():
    """The '$' anchor is not a matched octet: 'Allow: /p' and
    'Disallow: /p$' are equally specific for path /p, and Allow wins
    the tie (RFC 9309 §2.2.2)."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    p = RobotsPolicy("User-agent: *\nAllow: /p\nDisallow: /p$\n", "anybot")
    assert p.allowed("http://h/p") is True
    assert p.allowed("http://h/pq") is True  # anchored rule doesn't match
    # one REAL extra octet still outranks: /pq beats /p for path /pq
    q = RobotsPolicy("User-agent: *\nAllow: /p\nDisallow: /pq\n", "anybot")
    assert q.allowed("http://h/pq") is False


def test_rfc9309_matches_bruteforce_reference():
    """Property check: RobotsPolicy agrees with an independently-written
    brute-force longest-match evaluator over randomized policies."""
    import random
    import re as _re

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    def ref_allowed(rules, path):
        # brute force: evaluate every rule, longest pattern wins, allow
        # ties. RFC 9309 counts matched OCTETS — a trailing '$' anchor is
        # not an octet, so it is excluded from the length ('Allow: /p'
        # and 'Disallow: /p$' tie for path /p, and Allow wins the tie).
        best = None
        for allow, pat in rules:
            anchored = pat.endswith("$")
            body = pat[:-1] if anchored else pat
            rx = "".join(".*" if c == "*" else _re.escape(c) for c in body)
            rx += "$" if anchored else ""
            if _re.match(rx, path):
                key = (len(body), allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]

    rnd = random.Random(5)
    # '/a' vs '/a$', '/ab' vs '/ab$' exercise anchored-vs-unanchored ties
    segs = ["/a", "/b", "/a/b", "/ab", "/x*", "/a/b/c", "/*.pdf$", "/a$",
            "/ab$", "/a/b$"]
    for _ in range(200):
        rules = [
            (rnd.random() < 0.5, rnd.choice(segs))
            for _ in range(rnd.randrange(1, 6))
        ]
        txt = "User-agent: *\n" + "\n".join(
            ("Allow: " if a else "Disallow: ") + p for a, p in rules
        )
        p = RobotsPolicy(txt, "anybot")
        for path in ("/a", "/a/b", "/a/b/c", "/ab", "/x9", "/doc.pdf", "/q"):
            got = p.allowed(f"http://h{path}")
            want = ref_allowed(rules, path)
            assert got == want, (rules, path, got, want)


def test_robots_policy_never_raises_on_garbage():
    """Crawl-captured robots.txt is hostile: binary junk, truncated
    lines, pathological patterns. The policy parser and matcher must
    never raise — a garbage policy yields decisions, not task failures
    (the gate's per-row quarantine contract is for ARCHIVE payloads;
    policies always parse best-effort per RFC 9309 2.2.3)."""
    import random

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    rng = random.Random(13)
    corpus = [
        "",
        "\x00\x01\x02",
        "User-agent",           # no colon
        "User-agent: *\nDisallow",  # rule without colon
        ":::",
        "Disallow: /a\nUser-agent: *",  # rules before any UA line
        "User-agent: *\nDisallow: " + "*" * 500,  # pathological wildcards
        "User-agent: *\nDisallow: /a$\x7f\nAllow: $$$$\n",
        "User-agent: *\r\nDisallow: /a\r\n",  # CRLF
    ]
    for _ in range(300):
        n = rng.randint(0, 12)
        lines = []
        for _k in range(n):
            key = rng.choice(
                ["User-agent", "Disallow", "Allow", "Crawl-delay", "Sitemap",
                 "".join(chr(rng.randint(1, 127)) for _ in range(rng.randint(0, 6)))]
            )
            val = "".join(chr(rng.randint(1, 127)) for _ in range(rng.randint(0, 12)))
            sep = rng.choice([": ", ":", " : ", ""])
            lines.append(f"{key}{sep}{val}")
        corpus.append("\n".join(lines))
    for txt in corpus:
        rp = RobotsPolicy(txt, "mtdp-bot")
        for url in ("https://h/x", "not a url", "", "https://h/?q=1#f"):
            assert isinstance(rp.allowed(url), bool)


def test_sitemap_directive_extraction_and_twin(spark):
    """RFC 9309 §2.3 Sitemap lines: case-insensitive key, leading
    whitespace, no-space colon, CRLF files; 'notsitemap:' and commented
    lines never match; document order with duplicates preserved —
    Spark and the generated DuckDB twin char-for-char."""
    import duckdb
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        extract_sitemap_directives,
        extract_sitemap_directives_sql,
    )

    samples = [
        "User-agent: *\nSitemap: https://a.io/s.xml\nDisallow: /x\n",
        "  SITEMAP:\thttps://b.io/s.xml\r\nsitemap:https://b.io/s2.xml\r\n",
        "notsitemap: https://evil.example/x\n#sitemap: https://no.example/y\n",
        "sitemap: https://dup.io/s.xml\nsitemap: https://dup.io/s.xml\n",
        "no directives at all",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, txt string"
    )
    got = {
        r["id"]: r["ls"]
        for r in df.select(
            "id", extract_sitemap_directives(F.col("txt")).alias("ls")
        ).collect()
    }
    assert got[0] == ["https://a.io/s.xml"]
    assert got[1] == ["https://b.io/s.xml", "https://b.io/s2.xml"]
    assert got[2] == []
    assert got[3] == ["https://dup.io/s.xml", "https://dup.io/s.xml"]
    assert got[4] == []
    con = duckdb.connect()
    for i, s in enumerate(samples):
        (duck,) = con.execute(
            "SELECT " + extract_sitemap_directives_sql("?"), [s]
        ).fetchone()
        assert got[i] == duck, (i, got[i], duck)
