"""Spider.start_requests parity (reference src/spider.rs:112-121:
start_requests() emits full Requests — per-seed priority/depth/meta —
separately from start_urls): seed priorities must reorder the first wave
exactly as the simulator predicts, meta must be visible to the request
middleware chain, and delayed seeds must wait for their epoch."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api import middleware as mw
from spider_core_spark.api.spider import Spider
from spider_core_spark.oracle.simulator import SimConfig, simulate
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen

N_PAGES, N_SITES, SEED = 120, 4, 11


@pytest.fixture(scope="module")
def site(spark):
    rows = sitegen.gen_pages_rows(range(N_PAGES), N_PAGES, N_SITES, SEED)
    pages = {
        r["url"]: {"status": r["status"], "html": r["html"], "lang": r["lang"]}
        for r in rows
    }
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    return pages, pages_df, seeds


def _orders(res):
    got = {}
    for r in res.order().collect():
        got.setdefault(int(r["epoch"]), []).append((r["wave_rank"], r["url"]))
    return {e: [u for _, u in sorted(v)] for e, v in got.items()}


def test_seed_priorities_reorder_first_wave(spark, site, tmp_path):
    """Per-seed priorities invert the seed order in the FIRST wave; the
    simulator (dict-seed form) predicts every epoch's order exactly."""
    pages, pages_df, seeds = site
    # reversed priorities: last listed seed fetches first
    reqs = [
        {"url": u, "priority": len(seeds) - 1 - i}
        for i, u in enumerate(seeds)
    ]
    cfg_kw = dict(max_epochs=6, max_wave_size=2)  # forces multi-epoch seeds
    sim = simulate(pages, reqs, None, SimConfig(use_robots=False, **cfg_kw))
    res = CrawlEngine(
        spark,
        Spider(start_requests=reqs),
        CrawlConfig(
            workdir=str(tmp_path / "pr"), use_robots=False, **cfg_kw
        ),
    ).run(pages_df, None)
    got = _orders(res)
    assert set(got) == set(sim.orders)
    for e in sorted(sim.orders):
        assert got[e] == sim.orders[e], f"epoch {e} order mismatch"
    # the first wave is the two LOWEST-priority-value seeds = the two
    # LAST-listed ones (priority trumps seq)
    assert got[0] == [seeds[-1], seeds[-2]]


def test_seed_not_before_epoch_delays_seed(spark, site, tmp_path):
    pages, pages_df, seeds = site
    reqs = [{"url": seeds[0]}, {"url": seeds[1], "not_before_epoch": 2}]
    cfg_kw = dict(max_epochs=4, max_wave_size=1)
    sim = simulate(pages, reqs, None, SimConfig(use_robots=False, **cfg_kw))
    res = CrawlEngine(
        spark,
        Spider(start_requests=reqs),
        CrawlConfig(workdir=str(tmp_path / "nb"), use_robots=False, **cfg_kw),
    ).run(pages_df, None)
    got = _orders(res)
    assert set(got) == set(sim.orders)
    for e in sorted(sim.orders):
        assert got[e] == sim.orders[e]
    # the delayed seed appears first at epoch >= 2
    first_epoch = min(e for e, urls in got.items() if seeds[1] in urls)
    assert first_epoch >= 2


class DropByMeta(mw.Middleware):
    """Request middleware reading seed meta — the reference's 'requests
    carry meta the middleware can read'."""

    name = "drop_by_meta"

    def request_action(self, df):
        return (
            F.when(F.col("meta")["skip"] == "1", F.lit(mw.DROP)).otherwise(
                F.lit(mw.CONTINUE)
            ),
            F.lit(0),
        )


def test_meta_visible_to_request_middleware(spark, site, tmp_path):
    pages, pages_df, seeds = site
    reqs = [
        {"url": seeds[0], "meta": {"skip": "1"}},
        {"url": seeds[1]},
    ]
    res = CrawlEngine(
        spark,
        Spider(start_requests=reqs),
        CrawlConfig(
            workdir=str(tmp_path / "meta"),
            use_robots=False,
            max_epochs=2,
            max_retries=0,
        ),
        middlewares=[DropByMeta()],
    ).run(pages_df, None)
    # the order log records the pre-middleware wave (dispatch order);
    # the DROP shows up as: no item, not marked seen, counted dropped
    item_urls = {r["url"] for r in res.items().select("url").collect()}
    assert seeds[0] not in item_urls, "meta-dropped seed produced an item"
    assert seeds[1] in item_urls
    assert res.totals["requests_dropped"] >= 1


def test_start_urls_unchanged_when_no_start_requests(spark, site, tmp_path):
    """start_requests=None keeps the plain start_urls path byte-identical
    (all-zero priority/depth/meta)."""
    pages, pages_df, seeds = site
    cfg_kw = dict(max_epochs=3, max_wave_size=10)
    res_a = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=str(tmp_path / "a"), use_robots=False, **cfg_kw),
    ).run(pages_df, None)
    res_b = CrawlEngine(
        spark,
        Spider(start_requests=[{"url": u} for u in seeds]),
        CrawlConfig(workdir=str(tmp_path / "b"), use_robots=False, **cfg_kw),
    ).run(pages_df, None)
    assert _orders(res_a) == _orders(res_b)
