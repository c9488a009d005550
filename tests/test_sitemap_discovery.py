"""Sitemap discovery feeding a real engine run: blobs → parsed entries →
Spider(start_requests=...) → the fetch wave is exactly the sitemap set."""

from pyspark.sql import functions as F

from spider_core_spark import CrawlConfig, CrawlEngine, Spider
from spider_core_spark.plans import discovery
from spider_core_spark.sources import sitegen


def test_parse_sitemaps_order(spark):
    blobs = spark.createDataFrame(
        [
            ("a.test", "<urlset><url><loc>http://a.test/1</loc></url>"
             "<url><loc>http://a.test/2</loc></url></urlset>"),
            ("b.test", "<urlset><url><loc>http://b.test/x</loc></url></urlset>"),
        ],
        "host string, xml string",
    )
    rows = sorted(
        tuple(r) for r in discovery.parse_sitemaps(blobs).collect()
    )
    assert rows == [
        ("a.test", 0, "http://a.test/1"),
        ("a.test", 1, "http://a.test/2"),
        ("b.test", 0, "http://b.test/x"),
    ]
    reqs = discovery.sitemap_start_requests(blobs)
    assert [r["priority"] for r in reqs] == [0, 1, 2]
    assert all(r["meta"] == {"discovered": "sitemap"} for r in reqs)
    assert discovery.sitemap_start_requests(blobs, limit=2) == reqs[:2]


def test_sitemap_seeded_crawl_fetches_exact_set(spark, tmp_path):
    fixture = str(tmp_path / "site")
    sitegen.write_fixture(spark, fixture, n_pages=120, n_sites=3)
    pages = spark.read.parquet(f"{fixture}/pages.parquet")
    # sitemap advertises a deterministic subset of real page URLs,
    # grouped per host as the protocol delivers them
    subset = pages.filter(F.col("url").rlike("/p/[0-3]$")).select("url")
    blobs = (
        subset.select(
            F.regexp_extract("url", r"https?://([^/]+)", 1).alias("host"),
            F.concat(
                F.lit("<url><loc>"), F.col("url"), F.lit("</loc></url>")
            ).alias("entry"),
        )
        .groupBy("host")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.concat_ws("", F.array_sort(F.collect_list("entry"))),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
    reqs = discovery.sitemap_start_requests(blobs)
    want = {r["url"] for r in subset.collect()}
    assert {r["url"] for r in reqs} == want and want
    res = CrawlEngine(
        spark,
        Spider(start_requests=reqs),
        CrawlConfig(
            workdir=str(tmp_path / "run"),
            use_robots=False,
            max_epochs=1,
            max_depth=0,  # discovery wave only — no link expansion
        ),
    ).run(pages, None)
    fetched = {r["url"] for r in res.items().select("url").collect()}
    assert fetched == want


def test_sitemaps_from_robots_chain(spark):
    """robots Sitemap: directives → fetched-blob resolution → ordered
    entries; twin parity on the directive extraction, the unfetched
    sitemap drops, the bare-keyword line (no colon) is ignored."""
    from spider_core_spark.sources import robots as rb

    bodies = {
        "a.test": (
            "User-agent: *\nDisallow: /private\n"
            "Sitemap: http://a.test/sm1.xml\n"
            "sitemap\n"  # bare keyword, no colon: must NOT parse
            "sitemap: http://a.test/sm2.xml # mirror\n"
            "Sitemap: http://a.test/ghost.xml"  # advertised, unfetched
        ),
        "b.test": "User-agent: *\nSITEMAP: http://b.test/sm.xml",
        "c.test": "User-agent: *\nDisallow: /x",  # no sitemaps at all
    }
    pages = spark.createDataFrame(
        [(f"http://{h}/robots.txt", body) for h, body in bodies.items()]
        + [
            (
                "http://a.test/sm1.xml",
                "<urlset><url><loc>http://a.test/1</loc></url>"
                "<url><loc>http://a.test/2</loc></url></urlset>",
            ),
            (
                "http://a.test/sm2.xml",
                "<urlset><url><loc>http://a.test/3</loc></url></urlset>",
            ),
            (
                "http://b.test/sm.xml",
                "<urlset><url><loc>http://b.test/1</loc></url></urlset>",
            ),
        ],
        "url string, text string",
    )

    got_su = sorted(
        tuple(r) for r in rb.sitemap_urls(pages).collect()
    )
    want_su = sorted(
        (d["host"], d["sm_seq"], d["sitemap_url"])
        for d in rb.sitemap_urls_py(bodies)
    )
    assert got_su == want_su
    assert ("a.test", 1, "http://a.test/sm2.xml") in got_su  # comment stripped
    assert not any(u == "sitemap" for _, _, u in got_su)  # colon guard

    rows = sorted(
        tuple(r) for r in discovery.sitemaps_from_robots(pages).collect()
    )
    assert rows == [
        ("a.test", 0, 0, "http://a.test/1"),
        ("a.test", 0, 1, "http://a.test/2"),
        ("a.test", 1, 0, "http://a.test/3"),
        ("b.test", 0, 0, "http://b.test/1"),
    ]  # ghost.xml (unfetched) and c.test (no directives) contribute nothing

    reqs = discovery.robots_sitemap_start_requests(pages)
    assert [r["url"] for r in reqs] == [u for _, _, _, u in rows]
    assert [r["priority"] for r in reqs] == [0, 1, 2, 3]
    assert all(r["meta"] == {"discovered": "robots-sitemap"} for r in reqs)
