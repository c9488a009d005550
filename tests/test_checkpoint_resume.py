"""Checkpoint/resume (SURVEY.md §5.2.5): kill after epoch k, resume, final
items/seen/order identical to an uninterrupted run; salvaged-row merge
(U2)."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api.pipeline import Pipeline
from spider_core_spark.api.spider import Spider
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen

N_PAGES, N_SITES, SEED = 120, 4, 11


@pytest.fixture(scope="module")
def site(spark):
    rows = sitegen.gen_pages_rows(range(N_PAGES), N_PAGES, N_SITES, SEED)
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    seeds = [s["url"] for s in sitegen.gen_seeds(N_SITES)]
    return pages_df, seeds


def _run(spark, site, wd, max_epochs, resume=False):
    pages_df, seeds = site
    cfg = CrawlConfig(
        workdir=wd, max_epochs=max_epochs, max_wave_size=40,
        default_host_budget=10**9, use_robots=False, n_shards=4,
    )
    eng = CrawlEngine(spark, Spider(start_urls=seeds), cfg)
    return eng.run(pages_df, resume=resume)


def _snapshot(res):
    items = {(r["url"], r["text"], r["epoch"]) for r in res.items().collect()}
    seen = {r["fingerprint"] for r in res.seen().collect()}
    order = sorted(
        (r["epoch"], r["wave_rank"], r["url"]) for r in res.order().collect()
    )
    return items, seen, order


def test_kill_resume_identical(spark, site, tmp_path_factory):
    wd_full = str(tmp_path_factory.mktemp("full"))
    wd_kill = str(tmp_path_factory.mktemp("kill"))
    full = _run(spark, site, wd_full, max_epochs=12)
    _run(spark, site, wd_kill, max_epochs=3)  # "killed" after epoch 2
    resumed = _run(spark, site, wd_kill, max_epochs=12, resume=True)
    assert _snapshot(full) == _snapshot(resumed)
    # totals carried across the resume
    assert full.totals == resumed.totals


def test_salvaged_rows_are_selected(spark, site, tmp_path_factory):
    """U2: rows with state='salvaged' re-enter wave selection like pending
    (reference merges salvage queue at checkpoint, checkpoint.rs:118-123)."""
    from spider_core_spark.operators.frontier import select_wave

    pages_df, _ = site
    rows = [
        ("https://x.test/a", "f1", "x.test", 1, 0, 0, 1, 0, 0, "salvaged", 0, None),
        ("https://x.test/b", "f2", "x.test", 1, 0, 0, 2, 0, 0, "pending", 0, None),
        ("https://x.test/c", "f3", "x.test", 1, 0, 0, 3, 0, 0, "fetched", 0, None),
    ]
    frontier = spark.createDataFrame(rows, schemas.FRONTIER)
    sel = select_wave(frontier, None, epoch=0, cfg=CrawlConfig(use_robots=False))
    urls = {r["url"] for r in sel.wave.collect()}
    assert urls == {"https://x.test/a", "https://x.test/b"}


def test_seen_compaction_preserves_state(spark, site, tmp_path_factory):
    """compact_seen_every merges delta dirs; final seen/items/order are
    unchanged and resume still works across a compaction boundary."""
    wd_plain = str(tmp_path_factory.mktemp("plain"))
    wd_comp = str(tmp_path_factory.mktemp("comp"))
    pages_df, seeds = site

    def run(wd, max_epochs, resume=False, compact=0):
        cfg = CrawlConfig(
            workdir=wd, max_epochs=max_epochs, max_wave_size=40,
            default_host_budget=10**9, use_robots=False, n_shards=4,
            compact_seen_every=compact,
        )
        return CrawlEngine(spark, Spider(start_urls=seeds), cfg).run(
            pages_df, resume=resume
        )

    full = run(wd_plain, 12)
    run(wd_comp, 5, compact=2)  # kill after a compaction happened
    resumed = run(wd_comp, 12, resume=True, compact=2)
    assert _snapshot(full) == _snapshot(resumed)
    import os
    assert os.path.exists(os.path.join(wd_comp, "seen_compact"))


def test_cookie_store_roundtrips_manifest(spark, site, tmp_path_factory):
    """Cookie-store checkpoint slot (reference src/checkpoint.rs:88-91):
    an opaque blob set on the engine survives kill/resume."""
    from spider_core_spark import CrawlConfig, CrawlEngine, Spider

    pages, seeds = site
    wd = str(tmp_path_factory.mktemp("cookie"))
    eng = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=wd, max_epochs=1),
        cookie_store={"session": "abc123", "domain": "site0.test"},
    )
    eng.run(pages)
    eng2 = CrawlEngine(
        spark, Spider(start_urls=seeds), CrawlConfig(workdir=wd, max_epochs=2)
    )
    eng2.run(pages, resume=True)
    assert eng2.cookie_store == {"session": "abc123", "domain": "site0.test"}


def test_periodic_checkpoint_every_and_final(spark, site, tmp_path_factory):
    """checkpoint_every=k commits the manifest every k-th epoch plus a
    final one; a resume from the periodic cadence replays the uncommitted
    epochs to the identical final state."""
    import json as _json
    import os

    pages_df, seeds = site

    def run(wd, max_epochs, every, resume=False):
        cfg = CrawlConfig(
            workdir=wd, max_epochs=max_epochs, max_wave_size=40,
            default_host_budget=10**9, use_robots=False, n_shards=4,
            checkpoint_every=every,
        )
        return CrawlEngine(spark, Spider(start_urls=seeds), cfg).run(
            pages_df, resume=resume
        )

    wd = str(tmp_path_factory.mktemp("periodic"))
    res = run(wd, max_epochs=5, every=3)
    with open(os.path.join(wd, "manifest.json")) as f:
        manifest = _json.load(f)
    # final checkpoint covers the last epoch even off-cadence
    assert manifest["last_epoch"] == res.epochs_run - 1

    base = run(str(tmp_path_factory.mktemp("base")), max_epochs=8, every=1)
    resumed = run(wd, max_epochs=8, every=3, resume=True)
    assert _snapshot(resumed) == _snapshot(base)


def test_graceful_stop_commits_and_resumes(spark, site, tmp_path_factory):
    """request_stop() (the Ctrl-C path): the in-flight epoch commits, the
    run ends early, and a resume completes to the uninterrupted state."""
    pages_df, seeds = site
    wd = str(tmp_path_factory.mktemp("graceful"))
    cfg = CrawlConfig(
        workdir=wd, max_epochs=8, max_wave_size=40,
        default_host_budget=10**9, use_robots=False, n_shards=4,
    )

    class StopAfterEpoch1(Pipeline):
        name = "stopper"

        def __init__(self, eng_ref):
            self.eng_ref = eng_ref

        def process(self, items, epoch):
            if epoch >= 1:
                self.eng_ref["eng"].request_stop()
            return items

    ref = {}
    eng = CrawlEngine(
        spark, Spider(start_urls=seeds), cfg,
        pipelines=[StopAfterEpoch1(ref)],
    )
    ref["eng"] = eng
    res = eng.run(pages_df)
    assert res.epochs_run == 2  # stopped after committing epoch 1

    base = _run(spark, site, str(tmp_path_factory.mktemp("gbase")), 8)
    resumed = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(
            workdir=wd, max_epochs=8, max_wave_size=40,
            default_host_budget=10**9, use_robots=False, n_shards=4,
        ),
    ).run(pages_df, resume=True)
    assert _snapshot(resumed) == _snapshot(base)
