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


def test_adaptive_time_term_parity(spark, tmp_path_factory):
    """Response-time term (reference src/concurrency.rs:112-122): with a
    live-transport fetcher emitting per-URL transport_ms, a slow host's
    budget decays (−1 above target) while fast hosts grow (+1 below
    target/2) — engine ≡ simulator on injected deterministic times."""
    import os

    from spider_core_spark.sources.fetcher import HttpFetcher

    rows = sitegen.gen_pages_rows(range(N_PAGES), N_PAGES, N_SITES, SEED)
    slow_host = "site0.test"

    def t_ms(url: str) -> float:
        return 500.0 if f"//{slow_host}/" in url else 50.0

    pages_sim = {
        r["url"]: {
            "status": r["status"],
            "html": r["html"],
            "lang": r["lang"],
            "fetch_ms": t_ms(r["url"]),
        }
        for r in rows
    }
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    kw = dict(
        max_epochs=20,
        use_robots=False,
        default_host_budget=10**6,
        adaptive_budget=True,
        adaptive_start_budget=4,
        adaptive_time_target_ms=200,
    )
    sim = simulate(pages_sim, seeds, None, SimConfig(**kw))

    pages_http = {
        u: {**p, "transport_ms": p["fetch_ms"], "text": None}
        for u, p in pages_sim.items()
    }

    def factory():
        def transport(url, timeout_s):
            p = pages_http.get(url)
            if p is None:
                return None
            return {
                "status": p["status"],
                "html": p["html"],
                "lang": p["lang"],
                "text": p["text"],
                "transport_ms": p["transport_ms"],
            }

        return transport

    wd = str(tmp_path_factory.mktemp("adaptive_time"))
    eng = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=wd, n_shards=4, **kw),
        fetcher=HttpFetcher(factory),
    )
    res = eng.run(spark.createDataFrame(rows, schemas.PAGES))

    got = {}
    for r in res.order().collect():
        got.setdefault(int(r["epoch"]), []).append((r["wave_rank"], r["url"]))
    got = {e: [u for _, u in sorted(v)] for e, v in got.items()}
    assert got == sim.orders, "time-term crawl order diverged"
    assert {r["fingerprint"] for r in res.seen().collect()} == sim.seen
    for k in ("requests_sent", "requests_succeeded", "requests_failed"):
        assert res.totals[k] == sim.totals[k], k

    # the final budgets table shows the throttle applied to the slow host
    last = max(
        int(d.split("=")[1]) for d in os.listdir(f"{wd}/budgets")
        if d.startswith("epoch=")
    )
    budgets = {
        r["host"]: (r["budget"], r["ema_ms"])
        for r in spark.read.parquet(f"{wd}/budgets/epoch={last}").collect()
    }
    assert budgets[slow_host][1] == 500.0  # constant-series EMA is exact
    fast = [h for h in budgets if h != slow_host]
    assert fast
    assert all(budgets[slow_host][0] < budgets[h][0] for h in fast)
    # simulator's final budget map matches the engine's table exactly
    assert {h: b for h, (b, _) in budgets.items()} == sim.budgets
