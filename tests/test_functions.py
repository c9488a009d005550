"""Parity of the three-way shared primitives: Spark expr ≡ pure Python ≡
DuckDB SQL (hashing, URL functions), and extractor determinism."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spider_core_spark.functions import hashing
from spider_core_spark.functions import url as urlfn
from spider_core_spark.functions.textextract import extract, resolve_link

URLS = [
    "https://site0.test/p/1",
    "https://site1.test/p/2#frag",
    "https://Site2.TEST/private/3?q=1#x",
    "http://a.b.c/x/y/z",
    "notaurl",
]


def test_h64_three_way(spark):
    strs = ["a", "hello", "site0.test", "x:y"]
    py = [hashing.h64_py(s) for s in strs]
    sdf = spark.createDataFrame([(s,) for s in strs], "s string")
    sp = [r[0] for r in sdf.select(hashing.h64_col(F.col("s"))).collect()]
    dd = [
        duckdb.sql(f"select {hashing.h64_duckdb('?::VARCHAR')}", params=[s]).fetchone()[0]
        for s in strs
    ]
    assert py == sp == dd

    # seeded variant
    py2 = [hashing.h64_py(s, seed=7) for s in strs]
    sp2 = [r[0] for r in sdf.select(hashing.h64_col(F.col("s"), seed=7)).collect()]
    assert py2 == sp2


def test_url_functions_spark_python_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = df.select(
        urlfn.normalize_url_col(F.col("url")).alias("norm"),
        urlfn.host_col(F.col("url")).alias("host"),
        urlfn.path_col(F.col("url")).alias("path"),
        urlfn.fingerprint_col(urlfn.normalize_url_col(F.col("url"))).alias("fp"),
    ).collect()
    for u, r in zip(URLS, rows):
        assert r["norm"] == urlfn.normalize_url_py(u)
        assert r["host"] == urlfn.host_py(u)
        assert r["path"] == urlfn.path_py(u)
        assert r["fp"] == urlfn.fingerprint_py(urlfn.normalize_url_py(u))


def test_extract_deterministic_and_structured():
    html = (
        b"<html><head><title>T One</title><script>var x=1;</script></head>"
        b"<body><h1>Head</h1><p>para one</p><p>two  words</p>"
        b'<ul><li><a href="/x">x</a></li><li><a href="https://e.test/y#f">y</a>'
        b"</li></ul></body></html>"
    )
    t1 = extract(html)
    t2 = extract(html)
    assert t1 == t2
    title, text, links = t1
    assert title == "T One"
    assert "var x=1" not in text
    assert text.splitlines()[0] == "T One"
    assert links == ["/x", "https://e.test/y#f"]


def test_resolve_link():
    assert resolve_link("https://a.test/p/1", "/q") == "https://a.test/q"
    assert resolve_link("https://a.test/p/1", "https://b.test/z") == "https://b.test/z"
    assert resolve_link("https://a.test/p/1", "mailto:x@y") is None
    assert resolve_link("https://a.test/p/1", "rel/path") is None


def test_canonicalize_url_three_way_parity(spark):
    """canonicalize_url_col ≡ canonicalize_url_py on tricky shapes."""
    from pyspark.sql import functions as F

    from spider_core_spark.functions.url import (
        canonicalize_url_col,
        canonicalize_url_py,
    )

    urls = [
        "HTTP://WWW.Example.COM:80/a/b#frag",
        "https://Example.com:443/",
        "https://example.com:8443/x?q=1#y",
        "http://example.com/path/",
        "http://example.com/",
        "http://example.com",
        "http://example.com:8080/",
        "ftp://Mixed.Case/z",
        "no scheme at all",
        "http://example.com:80",  # port strip, no path
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["canon"]
        for r in df.select(
            "url", canonicalize_url_col(F.col("url")).alias("canon")
        ).collect()
    }
    for u in urls:
        assert got[u] == canonicalize_url_py(u), (u, got[u], canonicalize_url_py(u))
    # spot expectations
    assert got["HTTP://WWW.Example.COM:80/a/b#frag"] == "http://www.example.com/a/b"
    assert got["https://Example.com:443/"] == "https://example.com"
    assert got["http://example.com:8080/"] == "http://example.com:8080"
    assert got["no scheme at all"] == "no scheme at all"


def test_engine_sim_parity_with_canonicalization(spark, tmp_path):
    """canonicalize_urls=True flows through engine and simulator alike
    (sitegen links are already canonical, so outputs must be unchanged
    AND still identical between the implementations)."""
    from spider_core_spark import CrawlConfig, CrawlEngine, Spider, schemas
    from spider_core_spark.oracle.simulator import SimConfig, simulate
    from spider_core_spark.sources import sitegen

    rows = sitegen.gen_pages_rows(range(100), 100, 3, 7)
    pages = {r["url"]: {"status": r["status"], "html": r["html"], "lang": r["lang"]} for r in rows}
    seeds = [s["url"] for s in sitegen.gen_seeds(3)]
    sim = simulate(
        pages, seeds, None,
        SimConfig(max_epochs=6, use_robots=False, canonicalize_urls=True),
    )
    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path / "canon"), max_epochs=6,
            use_robots=False, canonicalize_urls=True,
        ),
    ).run(spark.createDataFrame(rows, schemas.PAGES))
    assert {r["fingerprint"] for r in res.seen().collect()} == sim.seen
