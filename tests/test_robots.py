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
