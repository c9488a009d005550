"""Redirect following (beyond-reference: no 3xx handling anywhere in
/root/reference/src): engine ≡ simulator on a redirect-enabled fixture.

Semantics under test: a 3xx response with a location is neither success
nor failure — no item, target re-enters at the SAME depth with inherited
priority through normal dedup, the source is marked seen (the cycle
breaker), counters carry requests_redirected. A pages table without a
location column (every pre-existing fixture) is entirely unaffected.
"""

from __future__ import annotations

import pytest

from spider_core_spark import schemas
from spider_core_spark.api.spider import Spider
from spider_core_spark.oracle.simulator import SimConfig, simulate
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen

N_PAGES, N_SITES, SEED = 200, 5, 42
REDIR_FRAC = 0.15


@pytest.fixture(scope="module")
def redir_site():
    rows = sitegen.gen_pages_rows(
        range(N_PAGES), N_PAGES, N_SITES, SEED, redirect_frac=REDIR_FRAC
    )
    pages = {
        r["url"]: {
            "status": r["status"],
            "html": r["html"],
            "lang": r["lang"],
            "location": r.get("location"),
        }
        for r in rows
    }
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    robots = {
        r["host"]: {"disallow": r["disallow"], "allow": r["allow"],
                    "max_per_epoch": r["max_per_epoch"]}
        for r in sitegen.gen_robots(N_SITES, SEED)
    }
    n_redirects = sum(1 for r in rows if r.get("location"))
    assert n_redirects >= 10, "fixture must actually contain redirects"
    return rows, pages, seeds, robots


CFG_KW = dict(max_epochs=30, max_wave_size=50, default_host_budget=25)


def _run_engine(spark, rows, seeds, tmp, **extra):
    pages_df = spark.createDataFrame(rows, schemas.PAGES_REDIR)
    robots_df = spark.createDataFrame(
        sitegen.gen_robots(N_SITES, SEED), schemas.ROBOTS
    )
    cfg = CrawlConfig(workdir=str(tmp), use_bloom=True, n_shards=4,
                      **CFG_KW, **extra)
    return CrawlEngine(spark, Spider(start_urls=seeds), cfg).run(
        pages_df, robots_df
    )


@pytest.fixture(scope="module")
def engine_and_sim(spark, redir_site, tmp_path_factory):
    rows, pages, seeds, robots = redir_site
    sim = simulate(pages, seeds, robots, SimConfig(**CFG_KW))
    res = _run_engine(spark, rows, seeds, tmp_path_factory.mktemp("redir"))
    return sim, res


def test_redirects_happen_and_counters_match(engine_and_sim):
    sim, res = engine_and_sim
    assert sim.totals["requests_redirected"] > 0
    assert (
        res.totals["requests_redirected"] == sim.totals["requests_redirected"]
    )
    for k in ("requests_sent", "requests_succeeded", "requests_failed",
              "requests_enqueued", "urls_deduped"):
        assert res.totals[k] == sim.totals[k], k


def test_crawl_order_parity_with_redirects(engine_and_sim):
    sim, res = engine_and_sim
    got = {}
    for r in res.order().collect():
        got.setdefault(int(r["epoch"]), []).append((r["wave_rank"], r["url"]))
    got = {e: [u for _, u in sorted(v)] for e, v in got.items()}
    assert set(got) == set(sim.orders)
    for e in sorted(sim.orders):
        assert got[e] == sim.orders[e], f"epoch {e} order mismatch"


def test_seen_parity_and_sources_marked(engine_and_sim, redir_site):
    sim, res = engine_and_sim
    got = {r["fingerprint"] for r in res.seen().collect()}
    assert got == sim.seen


def test_redirect_sources_emit_no_items(engine_and_sim, redir_site):
    sim, res = engine_and_sim
    rows = redir_site[0]
    redirect_urls = {r["url"] for r in rows if r.get("location")}
    item_urls = {r["url"] for r in res.items().collect()}
    assert not (item_urls & redirect_urls)
    assert item_urls == {it["url"] for it in sim.items}


def test_follow_redirects_off_parity(spark, redir_site, tmp_path_factory):
    """Disabled: 3xx rows fall back to plain parsed successes (status 301
    <= success_max_status=399) — in BOTH engines."""
    rows, pages, seeds, robots = redir_site
    sim = simulate(
        pages, seeds, robots, SimConfig(follow_redirects=False, **CFG_KW)
    )
    res = _run_engine(
        spark, rows, seeds, tmp_path_factory.mktemp("noredir"),
        follow_redirects=False,
    )
    assert sim.totals["requests_redirected"] == 0
    assert res.totals["requests_redirected"] == 0
    assert res.totals["requests_succeeded"] == sim.totals["requests_succeeded"]
    assert {r["fingerprint"] for r in res.seen().collect()} == sim.seen


def test_streaming_redirects_match_bsp(spark, redir_site, tmp_path_factory):
    """Streaming variant: same redirect semantics — final seen set and
    items match the BSP engine on the redirect-enabled fixture (order is
    batch-dependent by design)."""
    from spider_core_spark.streaming.stream_engine import StreamingCrawlEngine

    rows, pages, seeds, robots = redir_site
    pages_df = spark.createDataFrame(rows, schemas.PAGES_REDIR)
    bsp = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path_factory.mktemp("redir_bsp")),
            max_epochs=40,
            use_robots=False,
            default_host_budget=10**9,
        ),
    ).run(pages_df)
    out = StreamingCrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path_factory.mktemp("redir_stream")),
            use_robots=False,
            default_host_budget=10**9,
        ),
    ).run(pages_df, idle_timeout_s=15.0)
    assert bsp.totals["requests_redirected"] > 0
    bsp_seen = {r["fingerprint"] for r in bsp.seen().collect()}
    st_seen = {r["fingerprint"] for r in out["seen"].collect()}
    assert st_seen == bsp_seen
    bsp_items = {(r["url"], r["text"]) for r in bsp.items().collect()}
    st_items = {(r["url"], r["text"]) for r in out["items"].collect()}
    assert st_items == bsp_items
    redirect_urls = {r["url"] for r in rows if r.get("location")}
    assert not ({u for u, _ in st_items} & redirect_urls)


def test_no_location_column_unchanged(spark, tmp_path_factory):
    """A redirect-free pages table (the 6-column PAGES schema) crawls
    identically whether follow_redirects is on or off — the flag is a
    no-op without the column."""
    rows = sitegen.gen_pages_rows(range(80), 80, 3, SEED)
    assert all("location" not in r for r in rows)
    seeds = [s["url"] for s in sitegen.gen_seeds(3)]
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    robots_df = spark.createDataFrame(
        sitegen.gen_robots(3, SEED), schemas.ROBOTS
    )
    outs = []
    for flag in (True, False):
        cfg = CrawlConfig(
            workdir=str(tmp_path_factory.mktemp(f"plain{flag}")),
            max_epochs=12, n_shards=4, follow_redirects=flag,
        )
        res = CrawlEngine(spark, Spider(start_urls=seeds), cfg).run(
            pages_df, robots_df
        )
        outs.append(res)
    a, b = outs
    assert a.totals == b.totals
    assert a.totals["requests_redirected"] == 0
    assert (
        {r["fingerprint"] for r in a.seen().collect()}
        == {r["fingerprint"] for r in b.seen().collect()}
    )
