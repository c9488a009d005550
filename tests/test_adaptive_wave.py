"""Global adaptive wave sizing parity (reference AdaptiveSemaphore's ONE
global permit count, src/concurrency.rs:87-134 + request_handler.rs:52-66):
next epoch's effective max_wave_size follows the cross-host average error
rate / response-time EMA between [1, 2×permits0] permit bounds, in the
reference's rule order (time first, then error −2/+1). Engine ≡ simulator;
the per-host A8 budgets are a separate, unchanged mechanism."""

import pytest

from spider_core_spark import schemas
from spider_core_spark.api.spider import Spider
from spider_core_spark.oracle.simulator import SimConfig, simulate
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen
from spider_core_spark.sources.fetcher import HttpFetcher

N_PAGES, N_SITES, SEED = 300, 4, 31


def _rows(status_fn):
    rows = sitegen.gen_pages_rows(
        range(N_PAGES), N_PAGES, N_SITES, SEED, density=4
    )
    out = []
    for r in rows:
        r = dict(r)
        r["status"] = status_fn(r["url"])
        out.append(r)
    return out


def _orders(res):
    got = {}
    for r in res.order().collect():
        got.setdefault(int(r["epoch"]), []).append((r["wave_rank"], r["url"]))
    return {e: [u for _, u in sorted(v)] for e, v in got.items()}


def test_wave_shrinks_on_high_error_rate(spark, tmp_path):
    """Cross-host error rate > 10% → permits −2 per epoch (reference
    error rule), shrinking the effective wave; engine ≡ simulator."""
    # every 4th page errors: per-host error rate ≈ 25% ≫ 10%
    rows = _rows(lambda u: 500 if int(u.rsplit("/", 1)[1]) % 4 == 1 else 200)
    pages = {
        r["url"]: {"status": r["status"], "html": r["html"], "lang": r["lang"]}
        for r in rows
    }
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    kw = dict(
        max_epochs=12,
        use_robots=False,
        max_wave_size=8,
        adaptive_wave=True,
        adaptive_wave_permits=4,
        max_retries=0,
    )
    sim = simulate(pages, seeds, None, SimConfig(**kw))
    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=str(tmp_path / "shrink"), n_shards=4, **kw),
    ).run(spark.createDataFrame(rows, schemas.PAGES))
    got = _orders(res)
    assert got == sim.orders, "adaptive-wave crawl order diverged"
    assert {r["fingerprint"] for r in res.seen().collect()} == sim.seen
    # the wave really shrank: permits 4→2→1 ⇒ effective cap 8→4→2; the
    # same crawl WITHOUT adaptive_wave fills 8-row waves
    kw_off = dict(kw, adaptive_wave=False)
    sim_off = simulate(pages, seeds, None, SimConfig(**kw_off))
    sizes = [len(sim.orders[e]) for e in sorted(sim.orders)]
    sizes_off = [len(sim_off.orders[e]) for e in sorted(sim_off.orders)]
    assert max(sizes_off) == 8, sizes_off
    assert any(s == 2 for s in sizes), f"wave never hit the shrunk cap: {sizes}"
    assert max(sizes) <= 4, f"wave never throttled below base: {sizes}"


def test_wave_grows_on_fast_clean_epochs(spark, tmp_path):
    """Error rate < 1% AND response time < target/2 → +1 twice per epoch
    up to 2×permits0 (the recovery path); engine ≡ simulator with the
    transport_ms-emitting fetcher."""
    rows = _rows(lambda u: 200)
    pages_sim = {
        r["url"]: {
            "status": 200,
            "html": r["html"],
            "lang": r["lang"],
            "fetch_ms": 100.0,
        }
        for r in rows
    }
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    kw = dict(
        max_epochs=12,
        use_robots=False,
        max_wave_size=8,
        adaptive_wave=True,
        adaptive_wave_permits=4,
        adaptive_time_target_ms=800,
        max_retries=0,
    )
    sim = simulate(pages_sim, seeds, None, SimConfig(**kw))

    pages_http = {r["url"]: r for r in rows}

    def factory():
        def transport(url, timeout_s):
            p = pages_http.get(url)
            if p is None:
                return None
            return {
                "status": 200,
                "html": p["html"],
                "lang": p["lang"],
                "text": None,
                "transport_ms": 100.0,
            }

        return transport

    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=str(tmp_path / "grow"), n_shards=4, **kw),
        fetcher=HttpFetcher(factory),
    ).run(spark.createDataFrame(rows, schemas.PAGES))
    got = _orders(res)
    assert got == sim.orders, "adaptive-wave growth order diverged"
    assert {r["fingerprint"] for r in res.seen().collect()} == sim.seen
    # permits 4→6→8 ⇒ effective cap 8→12→16; the frontier peaks at 14
    # pending, so the measured proof is waves BEYOND the base cap of 8
    sizes = [len(sim.orders[e]) for e in sorted(sim.orders)]
    assert max(sizes) > 8, f"wave never exceeded the base cap: {sizes}"


def test_a8_budgets_unchanged_by_adaptive_wave(spark, tmp_path):
    """adaptive_wave composes with adaptive_budget: the per-host A8 map is
    identical with and without the global wave mechanism."""
    rows = _rows(lambda u: 500 if int(u.rsplit("/", 1)[1]) % 4 == 1 else 200)
    pages = {
        r["url"]: {"status": r["status"], "html": r["html"], "lang": r["lang"]}
        for r in rows
    }
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    base = dict(
        max_epochs=10,
        use_robots=False,
        adaptive_budget=True,
        adaptive_start_budget=4,
        max_retries=0,
    )
    sim_plain = simulate(pages, seeds, None, SimConfig(**base))
    sim_wave = simulate(
        pages, seeds, None,
        SimConfig(adaptive_wave=True, adaptive_wave_permits=4,
                  max_wave_size=30_000, **base),
    )
    # wave cap never binds (30k ≫ frontier), so the A8 evolution and the
    # whole crawl are identical — the mechanisms are independent
    assert sim_plain.budgets == sim_wave.budgets
    assert sim_plain.orders == sim_wave.orders

    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path / "compose"), n_shards=4,
            adaptive_wave=True, adaptive_wave_permits=4,
            max_wave_size=30_000, **base,
        ),
    ).run(spark.createDataFrame(rows, schemas.PAGES))
    assert _orders(res) == sim_wave.orders
