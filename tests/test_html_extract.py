"""HTML-to-text extraction: unit semantics + Spark↔DuckDB twin equality."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
    html_to_text,
    html_to_text_sql,
)

CASES = [
    # script/style/head dropped wholesale, including markup inside them
    '<head><title>T</title></head><body><script>if (a<b) {"<p>x"}</script>Hello</body>',
    # block tags become newlines; inline tags become spaces
    "<div>para one</div><p>para <b>two</b></p><h2>heading</h2>tail",
    # entities decode once, &amp; last
    "a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp; b &amp;amp; c",
    # comments and attributes
    '<!-- hidden -->visible <a href="http://x?a=1&amp;b=2">link</a> end',
    # whitespace collapse across newlines
    "<p>  spaced   out </p>\n\n<p>next</p>",
    # plain text passes through
    "no markup at all",
]


def test_html_to_text_semantics(spark):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(CASES)], "i int, h string")
    got = {r["i"]: r["t"] for r in df.select("i", html_to_text(F.col("h")).alias("t")).collect()}
    assert got[0] == "Hello"
    assert got[1] == "para one\npara two\nheading\ntail"
    assert got[2] == "a <tag> \"q\" 's' b &amp; c"
    assert got[3] == "visible link end"
    assert got[4] == "spaced out\nnext"
    assert got[5] == "no markup at all"


def test_twin_matches_duckdb_char_for_char(spark):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(CASES)], "i int, h string")
    got = [
        r["t"]
        for r in df.select("i", html_to_text(F.col("h")).alias("t"))
        .orderBy("i")
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i INT, h VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(CASES)))
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {html_to_text_sql('h')} FROM c ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_extract_links_scope_and_order(spark):
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
        extract_links,
    )

    html = (
        '<a href="https://A.com/x">1</a>'
        "<a rel=nofollow href='http://b.org/p?q=1'>2</a>"
        '<A HREF="HTTPS://C.NET/Y">case</A>'
        '<a href="https://A.com/x">dup</a>'
        '<a href="mailto:x@y.z">m</a>'
        '<a href="/rel">r</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="#frag">f</a>'
        "<a name=anchor>no-href</a>"
    )
    df = spark.createDataFrame([(1, html)], "id long, html string")
    (row,) = df.select(extract_links(F.col("html")).alias("ls")).collect()
    # document order, duplicates preserved, absolute-only, case kept
    assert row["ls"] == [
        "https://A.com/x",
        "http://b.org/p?q=1",
        "HTTPS://C.NET/Y",
        "https://A.com/x",
    ]


def test_extract_links_duckdb_twin_identical(spark):
    import duckdb
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
        extract_links,
        extract_links_sql,
    )

    samples = [
        '<a href = "https://x.io/a b">spaced-eq-but-space-in-url</a>',
        "<a\nhref='https://multi.line/y'>nl</a>",
        '<a data-x="href=\'https://fake\'" href="https://real.com/">tricky</a>',
        "no links at all",
        '<a href="https://t.co/q?b=2&a=1#z">q</a>',
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "id long, html string")
    got_spark = {
        r["id"]: r["ls"]
        for r in df.select("id", extract_links(F.col("html")).alias("ls")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        (got_duck,) = con.execute("SELECT " + extract_links_sql("?"), [s]).fetchone()
        assert got_spark[i] == got_duck, (i, got_spark[i], got_duck)


def test_script_profile_counts_and_dominant(spark):
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        script_profile,
    )

    rows = [
        (1, "Hello world"),
        (2, "привет мир hello"),          # cyrillic 9 > latin 5
        (3, "漢字漢字 かな"),              # cjk 4 > kana 2
        (4, "1234 !!!"),                  # nothing scripted
        (5, "αβγ abc"),                   # greek 3 == latin 3 -> tie: greek
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in script_profile(df).collect()}
    assert got[1]["main_script"] == "latin" and got[1]["n_latin"] == 10
    assert got[2]["main_script"] == "cyrillic" and got[2]["n_cyrillic"] == 9
    assert got[3]["main_script"] == "cjk" and got[3]["n_kana"] == 2
    assert got[4]["main_script"] == "none" and got[4]["main_share"] == 0.0
    # tie at 3:3 breaks by script-name order: greek < latin
    assert got[5]["main_script"] == "greek"
    assert got[2]["main_share"] == 9 / 14


def test_script_profile_duckdb_twin_identical(spark):
    import duckdb
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.text import (
        script_profile,
        script_profile_sql,
    )

    samples = [
        "mixed مرحبا שלום देवनागरी 한글조합 ไทยแลนด์",
        "Ёлки-palki ΣΠΑΡΤΗ 東京タワー",
        "",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, text string"
    )
    got = {r["id"]: r for r in script_profile(df).collect()}
    con = duckdb.connect()
    for i, s in enumerate(samples):
        for name, expr in script_profile_sql("?").items():
            (duck_n,) = con.execute("SELECT " + expr, [s]).fetchone()
            assert got[i][f"n_{name}"] == duck_n, (i, name)


def test_extract_links_attribute_name_boundary(spark):
    """data-href / xhref must NOT be extracted — only a real href
    attribute (whitespace-delimited name) is a frontier link."""
    import duckdb
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
        extract_links,
        extract_links_sql,
    )

    html = (
        '<a data-href="https://evil.example/track">lazy</a>'
        '<a xhref="https://evil.example/x">typo</a>'
        '<a data-href="https://evil.example/t2" href="https://real.com/">ok</a>'
    )
    df = spark.createDataFrame([(1, html)], "id long, html string")
    (row,) = df.select(extract_links(F.col("html")).alias("ls")).collect()
    assert row["ls"] == ["https://real.com/"]
    con = duckdb.connect()
    (duck,) = con.execute("SELECT " + extract_links_sql("?"), [html]).fetchone()
    assert duck == ["https://real.com/"]


def test_extract_sitemap_entries_semantics(spark):
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
        extract_sitemap_entries,
    )

    xml = (
        "<urlset>"
        '<url><loc> https://a.io/p?x=1&amp;y=2 </loc>'
        "<lastmod>2024-05-06</lastmod></url>"
        "<url><loc>https://b.io/&lt;odd&gt;</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # loc-less: dropped
        "<url><loc>https://c.io/&amp;lt;keep&amp;gt;</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    (row,) = df.select(
        extract_sitemap_entries(F.col("xml")).alias("es")
    ).collect()
    es = [(e["kind"], e["loc"], e["lastmod"]) for e in row["es"]]
    assert es == [
        ("url", "https://a.io/p?x=1&y=2", "2024-05-06"),  # trimmed + unescaped
        ("url", "https://b.io/<odd>", ""),                 # lt/gt entities
        ("url", "https://c.io/&lt;keep&gt;", ""),          # &amp;lt; -> literal &lt;
    ]
    # sitemapindex kind
    idx = (
        "<sitemapindex><sitemap><loc>https://a.io/s1.xml</loc>"
        "<lastmod>2024-03-01</lastmod></sitemap>"
        "<sitemap><loc>https://a.io/s2.xml</loc></sitemap></sitemapindex>"
    )
    (row,) = spark.createDataFrame([(idx,)], "xml string").select(
        extract_sitemap_entries(F.col("xml")).alias("es")
    ).collect()
    assert [(e["kind"], e["loc"]) for e in row["es"]] == [
        ("sitemap", "https://a.io/s1.xml"),
        ("sitemap", "https://a.io/s2.xml"),
    ]


def test_extract_sitemap_duckdb_twin_identical(spark):
    import duckdb
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
        extract_sitemap_entries,
        extract_sitemap_entries_sql,
    )

    samples = [
        "<urlset><url><loc>https://a.io/?a=1&amp;b=2</loc>"
        "<lastmod>2024-05-06</lastmod></url></urlset>",
        "<URLSET><URL><LOC>https://case.io/X</LOC></URL></URLSET>",  # case-insensitive tags
        "<urlset><url><lastmod>2020-01-01</lastmod></url></urlset>",  # dropped
        "<sitemapindex><sitemap><loc>\nhttps://x.io/s.xml\n</loc></sitemap></sitemapindex>",
        "not xml at all",
        "<urlset><url><loc>https://q.io/&amp;amp;</loc></url></urlset>",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, xml string"
    )
    got_spark = {
        r["id"]: [(e["kind"], e["loc"], e["lastmod"]) for e in r["es"]]
        for r in df.select(
            "id", extract_sitemap_entries(F.col("xml")).alias("es")
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        # the twin references the input expression twice (url + sitemap
        # blocks) — bind it twice
        (got_duck,) = con.execute(
            "SELECT " + extract_sitemap_entries_sql("?"), [s, s]
        ).fetchone()
        duck = [(e["kind"], e["loc"], e["lastmod"]) for e in got_duck]
        assert got_spark[i] == duck, (i, got_spark[i], duck)


def test_extract_sitemap_cdata_locs(spark):
    """CDATA-wrapped locs (several common generators emit them) are
    taken LITERALLY — no entity unescape — and must not be dropped
    (r10 review finding)."""
    import duckdb
    from pyspark.sql import functions as F

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.html import (
        extract_sitemap_entries,
        extract_sitemap_entries_sql,
    )

    xml = (
        "<urlset>"
        "<url><loc><![CDATA[https://a.io/p?x=1&amp;y=2]]></loc></url>"
        "<url><loc> <![CDATA[ https://b.io/q ]]> </loc>"
        "<lastmod>2024-07-08</lastmod></url>"
        "</urlset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    (row,) = df.select(extract_sitemap_entries(F.col("xml")).alias("es")).collect()
    es = [(e["kind"], e["loc"], e["lastmod"]) for e in row["es"]]
    assert es == [
        ("url", "https://a.io/p?x=1&amp;y=2", ""),  # literal: NOT unescaped
        ("url", "https://b.io/q", "2024-07-08"),
    ]
    con = duckdb.connect()
    (duck,) = con.execute(
        "SELECT " + extract_sitemap_entries_sql("?"), [xml, xml]
    ).fetchone()
    assert [(e["kind"], e["loc"], e["lastmod"]) for e in duck] == es
