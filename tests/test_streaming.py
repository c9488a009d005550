"""Structured Streaming variant: same final seen set + items as the
epoch-BSP engine on the same site (order is batch-dependent by design —
SURVEY.md §2.I / §3.2)."""

import pytest

from spider_core_spark import schemas
from spider_core_spark.api.spider import Spider
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen
from spider_core_spark.streaming.stream_engine import StreamingCrawlEngine

N_PAGES, N_SITES, SEED = 80, 3, 5


def test_streaming_matches_bsp_final_state(spark, tmp_path_factory):
    rows = sitegen.gen_pages_rows(range(N_PAGES), N_PAGES, N_SITES, SEED)
    pages = spark.createDataFrame(rows, schemas.PAGES)
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]

    bsp = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path_factory.mktemp("bsp")),
            max_epochs=20,
            use_robots=False,
            default_host_budget=10**9,
        ),
    ).run(pages)

    stream = StreamingCrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path_factory.mktemp("stream")),
            use_robots=False,
            default_host_budget=10**9,
        ),
    ).run(pages, idle_timeout_s=15.0)

    bsp_seen = {r["fingerprint"] for r in bsp.seen().collect()}
    st_seen = {r["fingerprint"] for r in stream["seen"].collect()}
    assert st_seen == bsp_seen

    bsp_items = {(r["url"], r["text"]) for r in bsp.items().collect()}
    st_items = {(r["url"], r["text"]) for r in stream["items"].collect()}
    assert st_items == bsp_items
