"""End-to-end crawl parity: Spark engine ≡ pure-Python simulator on the
synthetic site — per-epoch crawl order, final seen set, extracted text
bytes, items, and counter invariants (SURVEY.md §5.2 items 1, 2, 7)."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api.spider import Spider
from spider_core_spark.oracle.simulator import SimConfig, simulate
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen

N_PAGES, N_SITES, SEED = 200, 5, 42


@pytest.fixture(scope="module")
def tiny_site():
    rows = sitegen.gen_pages_rows(range(N_PAGES), N_PAGES, N_SITES, SEED)
    pages = {
        r["url"]: {"status": r["status"], "html": r["html"], "lang": r["lang"]}
        for r in rows
    }
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    robots = {
        r["host"]: {"disallow": r["disallow"], "allow": r["allow"],
                    "max_per_epoch": r["max_per_epoch"]}
        for r in sitegen.gen_robots(N_SITES, SEED)
    }
    return rows, pages, seeds, robots


@pytest.fixture(scope="module")
def engine_and_sim(spark, tiny_site, tmp_path_factory):
    rows, pages, seeds, robots = tiny_site
    cfg_kw = dict(
        max_epochs=30,
        max_wave_size=50,  # exercise the backpressure deferral path
        default_host_budget=25,  # exercise politeness deferral
        max_retries=1,
        retry_statuses=(500,),
        retry_delay_epochs=1,
    )
    sim = simulate(pages, seeds, robots, SimConfig(**cfg_kw))

    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    robots_df = spark.createDataFrame(
        sitegen.gen_robots(N_SITES, SEED), schemas.ROBOTS
    )
    wd = str(tmp_path_factory.mktemp("crawl"))
    eng = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=wd, use_bloom=True, n_shards=4, **cfg_kw),
    )
    res = eng.run(pages_df, robots_df)
    return sim, res


def test_crawl_order_parity(engine_and_sim):
    sim, res = engine_and_sim
    order = res.order()
    got = {}
    for r in order.collect():
        got.setdefault(int(r["epoch"]), []).append((r["wave_rank"], r["url"]))
    got = {e: [u for _, u in sorted(v)] for e, v in got.items()}
    assert set(got) == set(sim.orders)
    for e in sorted(sim.orders):
        assert got[e] == sim.orders[e], f"epoch {e} order mismatch"


def test_seen_set_parity(engine_and_sim):
    sim, res = engine_and_sim
    got = {r["fingerprint"] for r in res.seen().collect()}
    assert got == sim.seen


def test_items_and_text_bytes_parity(engine_and_sim):
    sim, res = engine_and_sim
    got = {
        r["url"]: (r["title"], r["text"], r["lang"], r["n_links"], r["epoch"])
        for r in res.items().collect()
    }
    want = {
        i["url"]: (i["title"], i["text"], i["lang"], i["n_links"], i["epoch"])
        for i in sim.items
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u] == want[u], f"item mismatch for {u}"
        # byte-identical extracted text (BASELINE.json input_hint)
        assert got[u][1].encode("utf-8") == want[u][1].encode("utf-8")


def test_counter_parity_and_invariants(engine_and_sim):
    sim, res = engine_and_sim
    t, s = res.totals, sim.totals
    for k in (
        "requests_sent",
        "requests_succeeded",
        "requests_failed",
        "requests_retried",
        "requests_dropped",
        "responses_received",
        "bytes_downloaded",
        "requests_enqueued",
        "urls_deduped",
    ):
        assert t[k] == s[k], f"{k}: engine {t[k]} != sim {s[k]}"
    # stats invariants (SURVEY.md §5.2.7)
    assert t["requests_sent"] >= t["requests_succeeded"]
    assert t["responses_received"] <= t["requests_sent"]
    assert t["requests_enqueued"] >= t["requests_sent"]


def test_epoch_metrics_match_sim(engine_and_sim):
    sim, res = engine_and_sim
    m = {
        int(r["epoch"]): r
        for r in res.metrics().filter(F.col("partition_id").isNull()).collect()
    }
    for e, sm in sim.metrics.items():
        assert e in m
        for k in (
            "requests_succeeded",
            "requests_failed",
            "requests_retried",
            "requests_enqueued",
            "bytes_downloaded",
        ):
            assert m[e][k] == sm[k], f"epoch {e} {k}: {m[e][k]} != {sm[k]}"


def test_sitegen_partition_invariance(spark):
    a = sitegen.gen_pages_df(spark, 60, 3, 7).orderBy("url").collect()
    b_rows = sitegen.gen_pages_rows(range(60), 60, 3, 7)
    b = sorted(b_rows, key=lambda r: r["url"])
    assert [r["url"] for r in a] == [r["url"] for r in b]
    assert [bytes(r["html"]) for r in a] == [r["html"] for r in b]
    assert [r["text"] for r in a] == [r["text"] for r in b]


def test_crawl_delay_and_quota_parity(spark, tiny_site, tmp_path_factory):
    """Round-2 knobs mirrored by the simulator: Crawl-delay-derived
    budgets + per-host byte quotas produce the same per-epoch order and
    final seen set in both implementations."""
    rows, pages, seeds, _ = tiny_site
    robots_rows = sitegen.gen_robots(N_SITES, SEED)
    robots = {
        r["host"]: {
            "disallow": r["disallow"],
            "allow": r["allow"],
            "max_per_epoch": r["max_per_epoch"],
            "crawl_delay_ms": r["crawl_delay_ms"],
        }
        for r in robots_rows
    }
    kw = dict(
        max_epochs=12,
        max_wave_size=60,
        default_host_budget=25,
        epoch_time_budget_ms=2000,  # ÷ (100..500 ms delays) → budgets 4..20
        host_bytes_quota=30_000,
    )
    sim = simulate(pages, seeds, robots, SimConfig(**kw))

    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    robots_df = spark.createDataFrame(robots_rows, schemas.ROBOTS)
    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path_factory.mktemp("delay_quota")),
            use_bloom=True,
            n_shards=4,
            **kw,
        ),
    ).run(pages_df, robots_df)

    got = {}
    for r in res.order().collect():
        got.setdefault(int(r["epoch"]), []).append((r["wave_rank"], r["url"]))
    got = {e: [u for _, u in sorted(v)] for e, v in got.items()}
    assert set(got) == set(sim.orders)
    for e in sorted(sim.orders):
        assert got[e] == sim.orders[e], f"epoch {e} order mismatch"
    assert {r["fingerprint"] for r in res.seen().collect()} == sim.seen


def test_priority_and_pending_cap_parity(spark, tiny_site, tmp_path_factory):
    """Priority-frontier hook + P3 reference drop mode: depth-based
    priorities reorder the waves and the pending cap drops overflow in
    (priority, seq) order — identically in engine and simulator."""
    rows, pages, seeds, robots = tiny_site
    kw = dict(max_epochs=15, max_wave_size=40, default_host_budget=25)
    sim = simulate(
        pages,
        seeds,
        robots,
        SimConfig(
            pending_cap=120,
            priority_fn=lambda url, host, depth: depth % 3,
            **kw,
        ),
    )
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    robots_df = spark.createDataFrame(
        sitegen.gen_robots(N_SITES, SEED), schemas.ROBOTS
    )
    res = CrawlEngine(
        spark,
        Spider(
            start_urls=seeds,
            priority_expr="cast(pmod(depth, 3) as int)",
        ),
        CrawlConfig(
            workdir=str(tmp_path_factory.mktemp("prio_cap")),
            pending_cap=120,
            use_bloom=True,
            n_shards=4,
            **kw,
        ),
    ).run(pages_df, robots_df)

    got = {}
    for r in res.order().collect():
        got.setdefault(int(r["epoch"]), []).append((r["wave_rank"], r["url"]))
    got = {e: [u for _, u in sorted(v)] for e, v in got.items()}
    assert set(got) == set(sim.orders)
    for e in sorted(sim.orders):
        assert got[e] == sim.orders[e], f"epoch {e} order mismatch"
    assert {r["fingerprint"] for r in res.seen().collect()} == sim.seen
    assert res.totals["requests_dropped"] == sim.totals["requests_dropped"]
    assert res.totals["requests_dropped"] > 0  # the cap actually bit
