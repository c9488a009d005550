"""robots.txt ingestion: JVM-side parser vs pure-Python twin, and the
parsed rules driving an actual crawl's politeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from spider_core_spark import CrawlConfig, CrawlEngine, Spider, schemas
from spider_core_spark.sources import robots as rb
from spider_core_spark.sources import sitegen

BODIES = {
    "a.test": (
        "# global rules\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/pub/   # carve-out\n"
        "Disallow: /tmp/   # scratch\n"
        "Crawl-delay: 2\n"
        "max-per-epoch: 3\n"
    ),
    "b.test": (
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "User-agent: *\n"
        "Disallow:\n"        # empty = allow all
        "Crawl-delay: 0.5\n"
    ),
    "c.test": "User-agent: googlebot\nDisallow: /\n",  # no * group
    "d.test": "",  # empty body
}


def _pages_df(spark):
    rows = [
        (f"https://{h}/robots.txt", None, None, body, "en", 200)
        for h, body in BODIES.items()
    ] + [("https://a.test/page", None, None, "not robots", "en", 200)]
    return spark.createDataFrame(rows, schemas.PAGES)


def test_parse_robots_matches_python_twin(spark):
    got = {
        r["host"]: (
            list(r["disallow"]),
            list(r["allow"]),
            r["crawl_delay_ms"],
            r["max_per_epoch"],
        )
        for r in rb.parse_robots(_pages_df(spark)).collect()
    }
    exp = {
        d["host"]: (
            d["disallow"],
            d["allow"],
            d["crawl_delay_ms"],
            d["max_per_epoch"],
        )
        for d in rb.parse_robots_py(BODIES)
    }
    # hosts with no *-group directives produce no Spark rows; the python
    # twin emits empty-rule rows — align on the union with empty defaults
    for h in exp:
        g = got.get(h, ([], [], None, None))
        assert g == exp[h], (h, g, exp[h])
    # spot checks
    assert exp["a.test"] == (
        ["/private/", "/tmp/"], ["/private/pub/"], 2000, 3
    )
    assert exp["b.test"] == ([], [], 500, None)
    assert exp["c.test"] == ([], [], None, None)  # only the googlebot group


def test_parsed_robots_drive_crawl_politeness(spark, tmp_path):
    """End-to-end: rules parsed from robots.txt bodies in the corpus feed
    select_wave — disallowed paths never fetched, budget enforced."""
    sitegen.write_fixture(spark, str(tmp_path / "site"), n_pages=150, n_sites=2)
    pages = spark.read.parquet(str(tmp_path / "site" / "pages.parquet"))
    body = "User-agent: *\nDisallow: /p/1\nmax-per-epoch: 4\n"
    robots_rows = spark.createDataFrame(
        [
            (f"https://site{s}.test/robots.txt", None, None, body, "en", 200)
            for s in range(2)
        ],
        schemas.PAGES,
    )
    rules = rb.parse_robots(robots_rows)
    seeds = [
        r["url"]
        for r in spark.read.parquet(str(tmp_path / "site" / "seeds.parquet"))
        .orderBy("seq")
        .collect()
    ]
    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=str(tmp_path / "run"), max_epochs=3),
    ).run(pages, robots=rules)
    order = res.order()
    # Disallow: /p/1 blocks /p/1 and /p/1x... prefixes
    assert order.filter(F.col("url").rlike(r"/p/1(\d|$)")).count() == 0
    per = order.groupBy("epoch", "host").count().collect()
    assert per and all(r["count"] <= 4 for r in per)


def test_allow_longest_match_engine_vs_simulator(spark, tmp_path):
    """Allow: carve-outs with longest-match precedence: /private is
    blocked but /private/pub/* crawls; an allow that TIES a disallow
    wins; engine and simulator agree row-for-row."""
    from spider_core_spark import CrawlConfig, CrawlEngine, Spider
    from spider_core_spark.oracle.simulator import SimConfig, simulate

    urls = [
        "https://s.test/",                 # seed page, links to all below
        "https://s.test/private/a",        # blocked (disallow only)
        "https://s.test/private/pub/ok",   # allowed (longer allow match)
        "https://s.test/private/pub",      # allowed (exact allow prefix)
        "https://s.test/tie",              # allow == disallow length: allow
        "https://s.test/open",             # no rule at all
    ]
    links = urls[1:]
    html = "<html>" + "".join(
        f'<a href="{u}">x</a>' for u in links
    ) + "</html>"
    rows = [
        (urls[0], None, html.encode(), "root page", "en", 200),
    ] + [
        (u, None, b"<html></html>", "leaf", "en", 200) for u in links
    ]
    pages_py = {
        r[0]: {"status": r[5], "html": r[2], "lang": r[4]} for r in rows
    }
    pages = spark.createDataFrame(rows, schemas.PAGES)
    rules = {
        "disallow": ["/private/", "/tie"],
        "allow": ["/private/pub", "/tie"],
        "max_per_epoch": None,
        "crawl_delay_ms": None,
    }
    robots_df = spark.createDataFrame(
        [("s.test", rules["disallow"], rules["allow"], None, None)],
        schemas.ROBOTS,
    )
    sim = simulate(
        pages_py, [urls[0]], {"s.test": rules}, SimConfig(max_epochs=4)
    )
    res = CrawlEngine(
        spark,
        Spider(start_urls=[urls[0]]),
        CrawlConfig(workdir=str(tmp_path / "run"), max_epochs=4),
    ).run(pages, robots=robots_df)
    got = {r["url"] for r in res.order().select("url").collect()}
    want = {u for o in sim.orders.values() for u in o}
    assert got == want
    assert "https://s.test/private/a" not in got
    assert {
        "https://s.test/private/pub/ok",
        "https://s.test/private/pub",
        "https://s.test/tie",
        "https://s.test/open",
    } <= got


def test_sitemap_urls_two_url_host_deterministic(spark):
    # r5 ADVICE #2: a host whose robots.txt was fetched under BOTH http
    # and https must yield ONE deterministic directive sequence (the
    # min-url body), not an interleaving of tied line_no values
    body_http = "Sitemap: https://s.test/sm-http-1.xml\nSitemap: https://s.test/sm-http-2.xml\n"
    body_https = "Sitemap: https://s.test/sm-https-1.xml\n"
    rows = [
        ("https://s.test/robots.txt", None, None, body_https, "en", 200),
        ("http://s.test/robots.txt", None, None, body_http, "en", 200),
    ]
    pages = spark.createDataFrame(rows, schemas.PAGES)
    got = sorted(
        (r["sm_seq"], r["sitemap_url"])
        for r in rb.sitemap_urls(pages).collect()
    )
    # min(url): 'http://...' < 'https://...' -> the http body wins whole
    assert got == [
        (0, "https://s.test/sm-http-1.xml"),
        (1, "https://s.test/sm-http-2.xml"),
    ]
