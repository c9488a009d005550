"""Scale guards: quota manager (reference concurrency.rs:220-236 parity),
Bloom sizing loud-failure, fetch-join broadcast fallback, seq packing
bounds, salvage producer fault-injection (F4), compaction idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spider_core_spark import CrawlConfig, CrawlEngine, Spider
from spider_core_spark.operators import dedup as dedup_ops
from spider_core_spark.operators import frontier as frontier_ops
from spider_core_spark.operators import quota
from spider_core_spark.plans.checkpoint import CheckpointStore
from spider_core_spark.sources import sitegen
from spider_core_spark.sources.fetcher import JoinFetcher


# ---- ResourceQuotaManager: port of the reference unit test
# (src/concurrency.rs:220-236) plus the insert-replaces rule
def test_resource_quota_manager_reference_semantics():
    m = quota.ResourceQuotaManager(100)
    assert m.available_resources() == 100
    assert m.allocate_resources("component1", 30) == 30
    assert m.available_resources() == 70
    with pytest.raises(quota.QuotaExceeded):
        m.allocate_resources("component2", 80)
    m.release_resources("component1")
    assert m.available_resources() == 100
    assert m.get_allocation("component1") is None


def test_bloom_bits_for_sizing():
    # 1M keys @ 1% with k=5 needs ~9.9M bits → rounds up to 2^24
    bits = dedup_ops.bloom_bits_for(1_000_000, 0.01, 5)
    assert bits == 1 << 24
    with pytest.raises(ValueError):
        dedup_ops.bloom_bits_for(1000, 1.5, 5)


def test_engine_fails_loudly_on_bloom_over_budget(spark):
    cfg = CrawlConfig(
        workdir="/tmp/_bloom_budget_test",
        bloom_target_fpr=0.001,
        bloom_expected_seen=10_000_000_000,  # the 10^10 design point
        bloom_broadcast_budget_mb=512,
    )
    eng = CrawlEngine(spark, Spider(start_urls=["https://a.test/"]), cfg)
    with pytest.raises(ValueError, match="broadcast budget"):
        eng.run(spark.createDataFrame([], "url string, warc_ts timestamp, "
                                          "html binary, text string, lang string"))


def test_engine_rejects_wave_beyond_seq_capacity(spark):
    cfg = CrawlConfig(
        workdir="/tmp/_wave_cap_test",
        max_wave_size=frontier_ops.MAX_PARENT_RANK + 1,
    )
    eng = CrawlEngine(spark, Spider(start_urls=["https://a.test/"]), cfg)
    with pytest.raises(ValueError, match="parent-rank capacity"):
        eng.run(spark.createDataFrame([], "url string, warc_ts timestamp, "
                                          "html binary, text string, lang string"))


def test_fetch_join_shuffle_fallback_same_rows(spark, tmp_path):
    sitegen.write_fixture(spark, str(tmp_path / "site"), n_pages=200, n_sites=3)
    pages = spark.read.parquet(str(tmp_path / "site" / "pages.parquet"))
    wave = pages.select("url").limit(50).withColumn("wave_rank", F.lit(0))
    fetcher = JoinFetcher(pages)

    resp_b, miss_b = fetcher.fetch(wave, broadcast_wave=True, persist=False)
    # emulate a wave past every broadcast budget: with auto-broadcast off,
    # the no-hint fallback MUST plan a shuffle join (at real scale the
    # size statistics make this decision; the point is that no explicit
    # broadcast hint forces a giant wave onto the executors)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        resp_s, miss_s = fetcher.fetch(wave, broadcast_wave=False, persist=False)
        assert sorted(r["url"] for r in resp_b.collect()) == sorted(
            r["url"] for r in resp_s.collect()
        )
        assert miss_b.count() == miss_s.count() == 0
        assert (
            "BroadcastHashJoin"
            in resp_b._jdf.queryExecution().sparkPlan().toString()
        )
        plan_s = resp_s._jdf.queryExecution().sparkPlan().toString()
        assert "SortMergeJoin" in plan_s or "ShuffledHashJoin" in plan_s
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_compact_seen_idempotent_after_crash(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "wd"))
    seen = spark.createDataFrame(
        [("fp1", 0, 0), ("fp2", 1, 1)],
        "fingerprint string, epoch_marked int, shard int",
    )
    store.write_seen_delta(seen.filter("epoch_marked = 0"), 0)
    store.write_seen_delta(seen.filter("epoch_marked = 1"), 1)
    store.compact_seen(1)
    # crash-after-compact replay: must be a no-op, not ENOTEMPTY
    store.compact_seen(1)
    assert store.read_seen(1).count() == 2


def _crawl_state(res):
    items = sorted(
        (r["url"], r["epoch"]) for r in res.items().collect()
    )
    seen = sorted(r["fingerprint"] for r in res.seen().collect())
    order = sorted(
        (r["epoch"], r["wave_rank"], r["url"]) for r in res.order().collect()
    )
    return items, seen, order


def test_salvage_producer_crash_resume_identical(spark, tmp_path, monkeypatch):
    """F4 fault injection: fail the epoch-1 frontier commit once; the
    salvaged rows must merge on resume and the final crawl state must be
    byte-identical to an uninterrupted run."""
    sitegen.write_fixture(spark, str(tmp_path / "site"), n_pages=300, n_sites=4)
    pages = spark.read.parquet(str(tmp_path / "site" / "pages.parquet"))
    seeds = [
        r["url"]
        for r in spark.read.parquet(str(tmp_path / "site" / "seeds.parquet"))
        .orderBy("seq")
        .collect()
    ]

    def mk(workdir):
        return CrawlEngine(
            spark,
            Spider(start_urls=seeds),
            CrawlConfig(workdir=workdir, max_epochs=5),
        )

    baseline = mk(str(tmp_path / "run_ok")).run(pages)

    orig = CheckpointStore.write_frontier
    state = {"failed": False}

    def failing(self, frontier, epoch):
        if epoch == 1 and not state["failed"]:
            state["failed"] = True
            raise RuntimeError("injected commit failure")
        return orig(self, frontier, epoch)

    monkeypatch.setattr(CheckpointStore, "write_frontier", failing)
    with pytest.raises(RuntimeError, match="injected"):
        mk(str(tmp_path / "run_crash")).run(pages)
    assert state["failed"]
    # salvage rows were produced by the failed commit
    salv = CheckpointStore(spark, str(tmp_path / "run_crash")).read_salvage_after(0)
    assert salv is not None and salv.count() > 0
    assert {r["state"] for r in salv.select("state").distinct().collect()} == {
        "salvaged"
    }

    resumed = mk(str(tmp_path / "run_crash")).run(pages, resume=True)
    assert _crawl_state(resumed) == _crawl_state(baseline)


def test_crawl_delay_caps_host_budget(spark, tmp_path):
    """Opt-in Crawl-delay enforcement (RateLimitMiddleware analog):
    epoch_time_budget_ms / crawl_delay_ms fetches per host per epoch."""
    from spider_core_spark import schemas

    sitegen.write_fixture(spark, str(tmp_path / "site"), n_pages=200, n_sites=2)
    pages = spark.read.parquet(str(tmp_path / "site" / "pages.parquet"))
    seeds = [
        r["url"]
        for r in spark.read.parquet(str(tmp_path / "site" / "seeds.parquet"))
        .orderBy("seq")
        .collect()
    ]
    robots = spark.createDataFrame(
        [("site0.test", [], [], 2000, None), ("site1.test", [], [], 500, None)],
        schemas.ROBOTS,
    )
    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path / "run"),
            max_epochs=3,
            epoch_time_budget_ms=6000,  # → 3/epoch @2000ms, 12/epoch @500ms
        ),
    ).run(pages, robots=robots)
    per = res.order().groupBy("epoch", "host").count().collect()
    caps = {"site0.test": 3, "site1.test": 12}
    assert per and all(r["count"] <= caps[r["host"]] for r in per)
    # and without the budget the same crawl fetches more per epoch
    res2 = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=str(tmp_path / "run2"), max_epochs=3),
    ).run(pages, robots=robots)
    m1 = max(r["count"] for r in per)
    m2 = max(
        r["count"] for r in res2.order().groupBy("epoch", "host").count().collect()
    )
    assert m2 > m1


def test_invalid_seed_raises_spider_error(spark, tmp_path):
    from spider_core_spark.errors import SpiderError

    eng = CrawlEngine(
        spark,
        Spider(start_urls=["https://ok.test/", "not a url at all"]),
        CrawlConfig(workdir=str(tmp_path / "run_bad")),
    )
    pages = spark.createDataFrame([], "url string, warc_ts timestamp, "
                                      "html binary, text string, lang string")
    with pytest.raises(SpiderError, match="not a url at all"):
        eng.run(pages)


def test_shutdown_skip_discoveries(spark, tmp_path):
    """P6 (response_parser.rs:303-310): with the flag on, the final epoch
    parses its wave but enqueues no discovered requests — the leftover
    frontier shrinks instead of growing."""
    sitegen.write_fixture(spark, str(tmp_path / "site"), n_pages=200, n_sites=3)
    pages = spark.read.parquet(str(tmp_path / "site" / "pages.parquet"))
    seeds = [
        r["url"]
        for r in spark.read.parquet(str(tmp_path / "site" / "seeds.parquet"))
        .orderBy("seq")
        .collect()
    ]

    def run(workdir, skip):
        return CrawlEngine(
            spark,
            Spider(start_urls=seeds),
            CrawlConfig(
                workdir=workdir, max_epochs=2, shutdown_skip_discoveries=skip
            ),
        ).run(pages)

    kept = run(str(tmp_path / "keep"), False)
    skipped = run(str(tmp_path / "skip"), True)
    # same fetch activity...
    assert skipped.totals["requests_sent"] == kept.totals["requests_sent"]
    # ...but epoch-1 discoveries were not enqueued
    assert (
        skipped.totals["requests_enqueued"] < kept.totals["requests_enqueued"]
    )
    f_kept = spark.read.parquet(
        CheckpointStore(spark, str(tmp_path / "keep")).frontier_dir(1)
    ).count()
    f_skip = spark.read.parquet(
        CheckpointStore(spark, str(tmp_path / "skip")).frontier_dir(1)
    ).count()
    assert f_skip < f_kept


def test_host_bytes_quota_stops_scheduling(spark, tmp_path):
    sitegen.write_fixture(spark, str(tmp_path / "site"), n_pages=300, n_sites=3)
    pages = spark.read.parquet(str(tmp_path / "site" / "pages.parquet"))
    seeds = [
        r["url"]
        for r in spark.read.parquet(str(tmp_path / "site" / "seeds.parquet"))
        .orderBy("seq")
        .collect()
    ]
    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path / "run_q"),
            max_epochs=4,
            host_bytes_quota=1,  # any fetched byte exhausts the host
        ),
    ).run(pages)
    # every host fetches in at most one epoch after its first bytes land
    fetched = res.order()
    per_host = (
        fetched.groupBy("host")
        .agg(F.countDistinct("epoch").alias("n_epochs"))
        .collect()
    )
    assert per_host and all(r["n_epochs"] <= 2 for r in per_host)
    no_quota = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=str(tmp_path / "run_nq"), max_epochs=4),
    ).run(pages)
    assert (
        res.totals["requests_sent"] < no_quota.totals["requests_sent"]
    )
