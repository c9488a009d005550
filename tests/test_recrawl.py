"""Continuous-crawl layer (plans/recrawl.py): fetch-history accumulation
across runs, the integer revisit policy over it, and the tie-in that
feeds due URLs back into a REAL engine run as prioritized
start_requests."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api.spider import Spider
from spider_core_spark.plans import recrawl
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.demo_queries import RECRAWL_MAX_S, RECRAWL_MIN_S
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen

N_PAGES, N_SITES, SEED = 120, 4, 11
DAY = 86_400


@pytest.fixture(scope="module")
def first_run(spark, tmp_path_factory):
    rows = sitegen.gen_pages_rows(range(N_PAGES), N_PAGES, N_SITES, SEED)
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=str(tmp_path_factory.mktemp("rc_run1")),
            use_robots=False,
            max_epochs=3,
        ),
    ).run(pages_df, None)
    return pages_df, seeds, res


def test_schedule_from_multi_run_history(spark, first_run, tmp_path):
    """Three observation rounds: pages whose text mutates every round
    get the short interval; never-changing pages get span // 1; all
    intervals clamp to [MIN, MAX] and next_fetch advances from the last
    observation."""
    _, _, res = first_run
    hist_dir = str(tmp_path / "hist")
    items1 = res.items()
    t0 = 1_700_000_000
    recrawl.append_fetch_history(items1, t0, hist_dir)

    urls = sorted(r["url"] for r in items1.select("url").collect())
    churn = set(urls[: len(urls) // 3])  # first third changes every run
    for i, run_epoch in enumerate((t0 + DAY, t0 + 2 * DAY), start=1):
        mutated = items1.withColumn(
            "text",
            F.when(
                F.col("url").isin(list(churn)),
                F.concat(F.col("text"), F.lit(f" rev{i}")),
            ).otherwise(F.col("text")),
        )
        recrawl.append_fetch_history(mutated, run_epoch, hist_dir)

    history = spark.read.schema(recrawl.HISTORY_SCHEMA).parquet(hist_dir)
    sched = {r["url"]: r for r in recrawl.recrawl_schedule(history).collect()}
    assert set(sched) == set(urls)
    for u in urls:
        r = sched[u]
        assert r["n_obs"] == 3
        assert RECRAWL_MIN_S <= r["next_interval_s"] <= RECRAWL_MAX_S
        assert r["next_fetch_epoch"] == t0 + 2 * DAY + r["next_interval_s"]
        if u in churn:
            # changed at both later observations: 2*DAY // 3
            assert r["n_changes"] == 2
            assert r["next_interval_s"] == (2 * DAY) // 3
        else:
            assert r["n_changes"] == 0
            assert r["next_interval_s"] == 2 * DAY  # span // 1, < MAX


def test_single_observation_gets_max_interval(spark):
    history = spark.createDataFrame(
        [("https://a.test/1", 1000, 42)], recrawl.HISTORY_SCHEMA
    )
    r = recrawl.recrawl_schedule(history).collect()[0]
    assert r["next_interval_s"] == RECRAWL_MAX_S
    assert r["next_fetch_epoch"] == 1000 + RECRAWL_MAX_S


def test_due_requests_reseed_real_run(spark, first_run, tmp_path):
    """due_start_requests → Spider(start_requests=...) → a real second
    run: only due URLs are refetched, stalest first in the first wave."""
    pages_df, _, res = first_run
    hist_dir = str(tmp_path / "hist2")
    t0 = 1_700_000_000
    items1 = res.items()
    recrawl.append_fetch_history(items1, t0, hist_dir)
    # second observation a day later: nothing changed -> interval 1 day
    recrawl.append_fetch_history(items1, t0 + DAY, hist_dir)
    history = spark.read.schema(recrawl.HISTORY_SCHEMA).parquet(hist_dir)
    sched = recrawl.recrawl_schedule(history)

    # just before due time: nothing to do
    assert recrawl.due_start_requests(sched, t0 + 2 * DAY - 1) == []

    n_urls = items1.select("url").distinct().count()
    assert recrawl.due_start_requests(sched, t0 + 2 * DAY, limit=2) and len(
        recrawl.due_start_requests(sched, t0 + 2 * DAY, limit=2)
    ) == 2  # limit bounds the driver-side collect
    reqs = recrawl.due_start_requests(sched, t0 + 2 * DAY)
    assert len(reqs) == n_urls >= 3
    assert [r["priority"] for r in reqs] == list(range(n_urls))
    assert all(r["meta"] == {"recrawl": "1"} for r in reqs)
    # deterministic staleness order: equal next_fetch -> url tiebreak
    assert [r["url"] for r in reqs] == sorted(r["url"] for r in reqs)

    res2 = CrawlEngine(
        spark,
        Spider(start_requests=reqs),
        CrawlConfig(
            workdir=str(tmp_path / "rc_run2"),
            use_robots=False,
            max_epochs=1,
            max_depth=0,  # refetch wave only — no link expansion
        ),
    ).run(pages_df, None)
    fetched = {r["url"] for r in res2.items().select("url").collect()}
    assert fetched == {r["url"] for r in reqs}
