"""HttpFetcher (X4, reference Downloader trait src/lib.rs:51 with the
reqwest default src/builder.rs:104-117): the mapInPandas transport loop —
per-partition client construction, timeout/error → miss mapping, byte
counting, request-column passthrough — tested against an injected fake
transport (no network in this sandbox; a real transport drops in via the
same factory)."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api.spider import Spider
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen
from spider_core_spark.sources.fetcher import HttpFetcher

N_PAGES, N_SITES, SEED = 150, 4, 13


def _make_factory(pages: dict):
    """Dict-backed fake transport; the factory itself is what ships to the
    executors (cloudpickle), the 'client' is built once per partition."""

    def factory():
        calls = {"n": 0}  # per-partition client state

        def transport(url: str, timeout_s: float):
            calls["n"] += 1
            if url.endswith("/timeout"):
                raise TimeoutError(f"timed out after {timeout_s}s")
            page = pages.get(url)
            if page is None:
                return None  # connection error → miss
            return {
                "status": page["status"],
                "html": page["html"],
                "text": page.get("text"),
                "lang": page.get("lang"),
                "warc_ts": None,
            }

        return transport

    return factory


def test_http_fetcher_unit(spark):
    pages = {
        "https://a.test/ok": {"status": 200, "html": b"<html>hi</html>",
                              "lang": "en"},
        "https://a.test/err": {"status": 500, "html": b"oops", "lang": "en"},
    }
    wave = spark.createDataFrame(
        [
            ("https://a.test/ok", 0, 7),
            ("https://a.test/err", 1, 8),
            ("https://a.test/gone", 2, 9),     # transport returns None
            ("https://a.test/timeout", 3, 10),  # transport raises
        ],
        "url string, depth int, seq long",
    )
    responses, misses = HttpFetcher(_make_factory(pages), timeout_s=0.5).fetch(
        wave
    )
    assert misses is None
    rows = {r["url"]: r for r in responses.collect()}
    # completed exchanges only — 500 IS a response, timeout/None are misses
    assert set(rows) == {"https://a.test/ok", "https://a.test/err"}
    ok = rows["https://a.test/ok"]
    assert ok["status"] == 200
    assert bytes(ok["html"]) == b"<html>hi</html>"
    assert ok["fetch_bytes"] == len(b"<html>hi</html>")
    assert ok["cached"] is False
    # request columns ride through (back-pointer, no second join)
    assert ok["depth"] == 0 and ok["seq"] == 7
    assert rows["https://a.test/err"]["status"] == 500


@pytest.fixture(scope="module")
def site(spark):
    rows = sitegen.gen_pages_rows(range(N_PAGES), N_PAGES, N_SITES, SEED)
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    pages = {
        r["url"]: {
            "status": r["status"],
            "html": r["html"],
            "text": r["text"],
            "lang": r["lang"],
        }
        for r in rows
    }
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    return pages_df, pages, seeds


def test_engine_end_to_end_with_http_fetcher(spark, site, tmp_path):
    """The engine runs unchanged on the live-transport fetcher: same items,
    seen set and counter ledger as the JoinFetcher run on the same site."""
    pages_df, pages, seeds = site
    cfg_kw = dict(
        max_epochs=6, use_robots=False, use_bloom=False, max_retries=0
    )

    join_res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=str(tmp_path / "join"), **cfg_kw),
    ).run(pages_df, robots=None)

    http_res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=str(tmp_path / "http"), **cfg_kw),
        fetcher=HttpFetcher(_make_factory(pages), timeout_s=1.0),
    ).run(pages_df, robots=None)

    j_items = {(r["url"], r["text"]) for r in join_res.items().collect()}
    h_items = {(r["url"], r["text"]) for r in http_res.items().collect()}
    assert h_items == j_items and h_items
    j_seen = {r["fingerprint"] for r in join_res.seen().collect()}
    h_seen = {r["fingerprint"] for r in http_res.seen().collect()}
    assert h_seen == j_seen
    for key in (
        "requests_sent",
        "requests_succeeded",
        "requests_failed",
        "responses_received",
        "bytes_downloaded",
        "items_processed",
    ):
        assert http_res.totals[key] == join_res.totals[key], key
