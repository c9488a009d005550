"""In-place continuous recrawl: tombstone eviction + reseed_on_resume.

The fresh-workdir continuous mode (test_recrawl.py) rebuilds per-run
state; this mode keeps ONE long-lived workdir: evict_for_recrawl writes
an Iceberg-style equality-delete tombstone over the due fingerprints,
and a resume=True run with reseed_on_resume=True refetches exactly the
evicted set while every other URL stays deduped (plans/recrawl.py §4).
"""

from __future__ import annotations

import pytest

from spider_core_spark import schemas
from spider_core_spark.api.spider import Spider
from spider_core_spark.plans import recrawl
from spider_core_spark.plans.checkpoint import CheckpointStore
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.plans.engine import CrawlEngine
from spider_core_spark.sources import sitegen


@pytest.fixture(scope="module")
def site(spark):
    rows = sitegen.gen_pages_rows(range(150), 150, 4, 7)
    pages = spark.createDataFrame(rows, schemas.PAGES)
    robots = spark.createDataFrame(sitegen.gen_robots(4, 7), schemas.ROBOTS)
    seeds = [s["url"] for s in sitegen.gen_seeds(4)]
    return pages, robots, seeds


def _crawl(spark, site, workdir, **cfg_kw):
    pages, robots, seeds = site
    cfg = CrawlConfig(workdir=str(workdir), max_epochs=20, n_shards=4, **cfg_kw)
    return CrawlEngine(spark, Spider(start_urls=seeds), cfg).run(pages, robots)


def _run_inplace_recrawl(spark, site, workdir, **tier_kw):
    """Crawl → evict 5 fetched URLs → resume with reseed. Returns
    (due URLs, last epoch of run 1, refetch order rows, final result)."""
    pages, robots, seeds = site
    res1 = _crawl(spark, site, workdir, **tier_kw)
    store = CheckpointStore(spark, str(workdir))
    last1 = store.read_manifest()["last_epoch"]
    # due candidates come from items(): successfully fetched URLs (only
    # successes are marked seen — reference request_handler.rs:352-362)
    fetched = sorted(
        r["url"]
        for r in res1.items().select("url").distinct().collect()
        if r["url"] not in seeds
    )
    due_urls = fetched[:5]

    # capture BEFORE eviction: res1.seen() is lazy (reads through the
    # store), so a post-eviction collect would see tombstones applied too
    seen_before = {r["fingerprint"] for r in res1.seen().collect()}
    n_evicted = recrawl.evict_for_recrawl(spark, str(workdir), due_urls)
    assert n_evicted == 5
    # tombstones applied merge-on-read: the evicted fps are gone from seen
    seen_after = {
        r["fingerprint"] for r in store.read_seen(last1).collect()
    }
    assert len(seen_before - seen_after) == 5
    assert seen_after < seen_before

    due = [
        {"url": u, "priority": i, "meta": {"recrawl": "1"}}
        for i, u in enumerate(due_urls)
    ]
    cfg2 = CrawlConfig(
        workdir=str(workdir),
        max_epochs=40,
        n_shards=4,
        reseed_on_resume=True,
        **tier_kw,
    )
    res2 = CrawlEngine(
        spark, Spider(start_requests=due), cfg2
    ).run(pages, robots, resume=True)
    refetched = (
        res2.order()
        .filter(f"epoch > {last1}")
        .select("epoch", "url")
        .collect()
    )
    return due_urls, last1, refetched, res2


def test_inplace_recrawl_refetches_exactly_the_evicted_set(
    spark, site, tmp_path
):
    due_urls, last1, refetched, res2 = _run_inplace_recrawl(
        spark, site, tmp_path / "run"
    )
    # every due URL is refetched exactly once; anything else re-entering
    # must be a never-seen URL (a run-1 FETCH FAILURE rediscovered on a
    # refetched page — failures are never seen-marked, so re-attempting
    # them is the dedup contract, not a leak). No seen URL re-enters.
    counts: dict[str, int] = {}
    for r in refetched:
        counts[r["url"]] = counts.get(r["url"], 0) + 1
    for u in due_urls:
        assert counts.get(u) == 1, f"due url {u} refetched {counts.get(u)}x"
    run1_ok = {
        r["url"] for r in res2.items().filter(f"epoch <= {last1}").collect()
    }
    extras = set(counts) - set(due_urls)
    assert not (extras & run1_ok), "a seen (non-evicted) URL was refetched"
    # the re-adds survive the tombstone (epoch_marked > evict epoch), so
    # the final seen set equals run 1's: same membership, no duplicates
    store = CheckpointStore(spark, str(tmp_path / "run"))
    last2 = store.read_manifest()["last_epoch"]
    assert last2 > last1
    rows = res2.seen().groupBy("fingerprint").count().collect()
    assert all(r["count"] == 1 for r in rows)

    # compaction folds the tombstones in: identical membership after
    store.compact_seen(last2)
    compacted = {r["fingerprint"] for r in store.read_seen(last2).collect()}
    assert compacted == {r["fingerprint"] for r in rows}


def test_inplace_recrawl_cuckoo_tier_parity(spark, site, tmp_path):
    """Same flow under the deletable cuckoo seen tier: the resume rebuilds
    the filter from the post-eviction seen set, so evicted URLs are not
    short-circuited — refetch set identical to the bloom run."""
    due_b, _, ref_b, _ = _run_inplace_recrawl(
        spark, site, tmp_path / "bloom", bloom_min_seen=0
    )
    due_c, _, ref_c, _ = _run_inplace_recrawl(
        spark,
        site,
        tmp_path / "cuckoo",
        seen_filter="cuckoo",
        cuckoo_buckets=256,
        bloom_min_seen=0,
    )
    assert due_b == due_c
    assert sorted(r["url"] for r in ref_b) == sorted(r["url"] for r in ref_c)


def test_plain_resume_does_not_reseed(spark, site, tmp_path):
    """Safety default: without reseed_on_resume, a resume after eviction
    refetches nothing (seeds are not re-injected)."""
    pages, robots, seeds = site
    wd = tmp_path / "noreseed"
    res1 = _crawl(spark, site, wd)
    store = CheckpointStore(spark, str(wd))
    last1 = store.read_manifest()["last_epoch"]
    victim = [
        r["url"]
        for r in res1.order().select("url").distinct().limit(3).collect()
    ]
    recrawl.evict_for_recrawl(spark, str(wd), victim)
    cfg = CrawlConfig(workdir=str(wd), max_epochs=40, n_shards=4)
    res2 = CrawlEngine(
        spark, Spider(start_urls=seeds), cfg
    ).run(pages, robots, resume=True)
    assert res2.order().filter(f"epoch > {last1}").count() == 0


def test_eviction_requires_committed_run(spark, tmp_path):
    with pytest.raises(ValueError, match="manifest"):
        recrawl.evict_for_recrawl(
            spark, str(tmp_path / "empty"), ["http://a.test/"]
        )


def test_eviction_same_epoch_merges(spark, site, tmp_path):
    """Two evictions between the same runs accumulate (tmp+swap merge),
    they don't clobber."""
    wd = tmp_path / "merge"
    res1 = _crawl(spark, site, wd)
    store = CheckpointStore(spark, str(wd))
    last1 = store.read_manifest()["last_epoch"]
    urls = sorted(
        r["url"] for r in res1.items().select("url").distinct().collect()
    )
    before = res1.seen().count()  # BEFORE eviction — seen() is lazy
    recrawl.evict_for_recrawl(spark, str(wd), urls[:2])
    n = recrawl.evict_for_recrawl(spark, str(wd), urls[2:4])
    assert n == 4
    assert store.read_seen(last1).count() == before - 4
