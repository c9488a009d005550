"""A8 adaptive per-host budget feedback parity: engine ≡ simulator with the
AdaptiveSemaphore-analog rule active (halve on >10% errors, double on <1%,
reference src/concurrency.rs:87-134)."""

import pytest

from spider_core_spark import schemas
from spider_core_spark.api.spider import Spider
from spider_core_spark.oracle.simulator import SimConfig, simulate
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen

N_PAGES, N_SITES, SEED = 150, 4, 23


def test_adaptive_budget_parity(spark, tmp_path_factory):
    rows = sitegen.gen_pages_rows(range(N_PAGES), N_PAGES, N_SITES, SEED)
    pages = {
        r["url"]: {"status": r["status"], "html": r["html"], "lang": r["lang"]}
        for r in rows
    }
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    kw = dict(
        max_epochs=25,
        use_robots=False,
        default_host_budget=10**6,
        adaptive_budget=True,
        adaptive_start_budget=4,  # tight: forces budget evolution
    )
    sim = simulate(pages, seeds, None, SimConfig(**kw))

    eng = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path_factory.mktemp("adaptive")), n_shards=4, **kw
        ),
    )
    res = eng.run(spark.createDataFrame(rows, schemas.PAGES))

    got = {}
    for r in res.order().collect():
        got.setdefault(int(r["epoch"]), []).append((r["wave_rank"], r["url"]))
    got = {e: [u for _, u in sorted(v)] for e, v in got.items()}
    assert got == sim.orders, "adaptive-budget crawl order diverged"
    assert {r["fingerprint"] for r in res.seen().collect()} == sim.seen
    for k in ("requests_sent", "requests_succeeded", "requests_failed"):
        assert res.totals[k] == sim.totals[k], k
