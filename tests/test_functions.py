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
