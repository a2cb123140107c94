"""URL canonicalization: semantics + Spark↔DuckDB twin equality."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.urlnorm import (
    canonicalize_url,
    canonicalize_url_sql,
)

CASES = [
    "HTTP://Example.COM/Path?b=2&a=1#frag",
    "http://example.com:80/x",
    "https://example.com:443",
    "http://example.com?a=1",
    "http://x.test/p?utm_source=a&b=2&fbclid=zz",
    "http://x.test/p?utm_source=only",
    "http://x.test/p?",
    "https://User.Host.test:8443/A/B?z=1&y=2&y=1",
    "http://plain.test/already/canonical",
]

WANT = [
    "http://example.com/Path?a=1&b=2",  # case, sort, fragment
    "http://example.com/x",  # default port
    "https://example.com/",  # default port + root slash
    "http://example.com/?a=1",  # empty path before query
    "http://x.test/p?b=2",  # tracking params dropped
    "http://x.test/p",  # all-tracking query drops the '?'
    "http://x.test/p",  # empty query drops the '?'
    "https://user.host.test:8443/A/B?y=1&y=2&z=1",  # non-default port kept, path case kept
    "http://plain.test/already/canonical",  # fixpoint
]


def test_canonicalize_semantics(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(CASES)], "i int, u string")
    got = [
        r["c"]
        for r in df.select("i", canonicalize_url(F.col("u")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    assert got == WANT
    # idempotent: canonical(canonical(u)) == canonical(u)
    df2 = spark.createDataFrame([(i, w) for i, w in enumerate(WANT)], "i int, u string")
    again = [
        r["c"]
        for r in df2.select("i", canonicalize_url(F.col("u")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    assert again == WANT


def test_twin_matches_duckdb(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(CASES)], "i int, u string")
    got = [
        r["c"]
        for r in df.select("i", canonicalize_url(F.col("u")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i INT, u VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(CASES)))
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {canonicalize_url_sql('u')} FROM c ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_fuzz_grammar_twin_equality_and_idempotence(spark):
    """200 grammar-generated messy URLs: Spark and DuckDB must agree
    character-for-character, and canonicalization must be idempotent."""
    import random

    rnd = random.Random(20260814)
    schemes = ["http", "HTTP", "https", "HtTpS"]
    hosts = ["Example.COM", "sub.Host.test", "X-Y.example", "LOCALHOST"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/p%20q/r", "/trailing/"]
    params = ["a=1", "B=2", "utm_source=x", "z", "y=", "fbclid=f", "gclid=g", "q=a+b"]
    frags = ["", "#", "#frag", "#a=1&b=2"]

    urls = []
    for _ in range(200):
        qp = "&".join(rnd.sample(params, rnd.randint(0, 5)))
        urls.append(
            rnd.choice(schemes)
            + "://"
            + rnd.choice(hosts)
            + rnd.choice(ports)
            + rnd.choice(paths)
            + (("?" + qp) if qp or rnd.random() < 0.2 else "")
            + rnd.choice(frags)
        )
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i int, u string")
    once = df.select("i", canonicalize_url(F.col("u")).alias("c"))
    got = [r["c"] for r in once.orderBy("i").collect()]
    # idempotence
    df2 = spark.createDataFrame([(i, c) for i, c in enumerate(got)], "i int, u string")
    again = [
        r["c"]
        for r in df2.select("i", canonicalize_url(F.col("u")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    assert again == got
    # twin equality
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i INT, u VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(urls)))
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {canonicalize_url_sql('u')} FROM c ORDER BY i"
        ).fetchall()
    ]
    assert got == want
