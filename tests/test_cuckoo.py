"""Cuckoo-filter seen-tier: the numpy filter (operators/cuckoo.py) against
the relational placement-independence semantics certified by the
u5_cuckoo_membership oracle — plus deletion, eviction-order invariance,
and the loud overflow refusal."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from spider_core_spark.operators.cuckoo import (
    MAX_KICKS,
    SLOTS,
    _delete_one,
    _insert_one,
    buckets_for,
    build_cuckoo_shards,
    cuckoo_alt_py,
    cuckoo_bucket_py,
    cuckoo_prefilter,
    cuckoo_probe_py,
    cuckoo_tag_py,
)

N_BUCKETS = 256
N_SHARDS = 4


def _fp(i: int) -> str:
    return hashlib.sha256(f"http://h{i % 37}.test/p{i}".encode()).hexdigest()


def _alive_groups(fps_in: list[str], fps_del: list[str]) -> set:
    """The relational truth: multiset inserts − deletes per canonical
    (min-bucket, tag) group (demo_queries.u5 docstring)."""
    from collections import Counter

    def key(fp):
        t = cuckoo_tag_py(fp)
        b1 = cuckoo_bucket_py(fp, N_BUCKETS)
        return (min(b1, cuckoo_alt_py(b1, t, N_BUCKETS)), t)

    c = Counter(key(fp) for fp in fps_in)
    c.subtract(key(fp) for fp in fps_del)
    return {k for k, v in c.items() if v > 0}


def test_probe_matches_relational_semantics(spark):
    fps_in = [_fp(i) for i in range(600)]
    fps_del = [_fp(i) for i in range(0, 600, 5)]
    probes = [_fp(i) for i in range(900)]  # 300 never-inserted

    seen = spark.createDataFrame([(f,) for f in fps_in], "fingerprint string")
    dels = spark.createDataFrame([(f,) for f in fps_del], "fingerprint string")
    filters = build_cuckoo_shards(seen, N_SHARDS, N_BUCKETS, deletes=dels)

    alive = _alive_groups(fps_in, fps_del)
    cand = spark.createDataFrame([(f,) for f in probes], "fingerprint string")
    got = {
        r["fingerprint"]: r["cuckoo_maybe_seen"]
        for r in cuckoo_prefilter(cand, filters, N_SHARDS, N_BUCKETS).collect()
    }
    for fp in probes:
        t = cuckoo_tag_py(fp)
        b1 = cuckoo_bucket_py(fp, N_BUCKETS)
        want = (min(b1, cuckoo_alt_py(b1, t, N_BUCKETS)), t) in alive
        assert got[fp] == want, fp
    # the fixture exercises all three classes
    kept = [_fp(i) for i in range(600) if i % 5]
    assert all(got[f] for f in kept), "false negative on an alive key"
    deleted_only = [f for f in fps_del if not got[f]]
    assert deleted_only, "every deleted key still hits — deletion inert?"


def test_placement_independence():
    """Same key set inserted in two different orders (different eviction
    histories) → identical probe outcomes for every query."""
    fps = [_fp(i) for i in range(700)]
    tables = []
    for order in (fps, list(reversed(fps))):
        t = np.zeros((N_BUCKETS, SLOTS), dtype=np.uint16)
        for fp in order:
            _insert_one(
                t, cuckoo_bucket_py(fp, N_BUCKETS), cuckoo_tag_py(fp), N_BUCKETS
            )
        tables.append(t)
    for i in range(1000):
        fp = _fp(i)
        got = [
            cuckoo_probe_py(
                t.tobytes(),
                N_BUCKETS,
                cuckoo_bucket_py(fp, N_BUCKETS),
                cuckoo_tag_py(fp),
            )
            for t in tables
        ]
        assert got[0] == got[1], fp


def test_delete_removes_one_copy():
    """Two keys sharing a (pair, tag) group: one delete leaves the other
    visible (multiset semantics — the oracle's inserts − deletes)."""
    t = np.zeros((N_BUCKETS, SLOTS), dtype=np.uint16)
    _insert_one(t, 7, 1234, N_BUCKETS)
    _insert_one(t, 7, 1234, N_BUCKETS)
    assert _delete_one(t, 7, 1234, N_BUCKETS)
    assert cuckoo_probe_py(t.tobytes(), N_BUCKETS, 7, 1234)
    assert _delete_one(t, 7, 1234, N_BUCKETS)
    assert not cuckoo_probe_py(t.tobytes(), N_BUCKETS, 7, 1234)
    assert not _delete_one(t, 7, 1234, N_BUCKETS)  # absent → no-op False


def test_overflow_refuses_loudly():
    """Past ~0.95 load the kick chain exhausts and the build REFUSES
    (engine convention: resize, never degrade silently)."""
    nb = 8  # 32 slots
    t = np.zeros((nb, SLOTS), dtype=np.uint16)
    with pytest.raises(RuntimeError, match="overflow"):
        for i in range(40):
            fp = _fp(i)
            _insert_one(t, cuckoo_bucket_py(fp, nb), cuckoo_tag_py(fp), nb)
    assert MAX_KICKS == 500


def test_buckets_for_sizing():
    nb = buckets_for(10_000, n_shards=4, load=0.9)
    assert nb & (nb - 1) == 0
    assert nb * SLOTS * 0.9 >= 10_000 / 4
    # the 10^10 design point from the module docstring: per-shard tables
    # stay broadcast-feasible at 1024 shards
    nb10 = buckets_for(10_000_000_000, n_shards=1024, load=0.9)
    assert nb10 * SLOTS * 2 < 64 * 1024 * 1024  # < 64 MB per shard


def test_mixture_sample_big_path_and_budgets(spark):
    """text_mixture_sample: forced big path (grouped prefix sum) equals
    the registered small path row-for-row; kept mass per language never
    exceeds its permille budget but fills it to within one max-doc."""
    from spider_core_spark.textops import dedup as td
    from spider_core_spark.textops.analysis import mixture_sample

    SF = "/root/testdata/sf0.001"
    small = mixture_sample(spark, SF).collect()
    big = mixture_sample(spark, SF, small_threshold=0).collect()
    td.release_staged_caches()
    assert sorted(map(tuple, small)) == sorted(map(tuple, big))
    assert small, "sampler kept nothing — budgets vacuous"
    per_lang: dict[str, list] = {}
    for r in small:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in per_lang.items():
        budget = rows[0]["budget_tokens"]
        mass = sum(r["tokens"] for r in rows)
        assert mass <= budget, lang
        assert max(r["cum_tokens"] for r in rows) == mass, lang


def test_engine_cuckoo_tier_parity(spark, tmp_path):
    """CrawlConfig(seen_filter='cuckoo'): the crawl's items, seen set, and
    fetch order are IDENTICAL to the Bloom-tier run — either approximate
    tier is a prefilter and the exact anti-join decides. Multi-epoch, so
    the distributed per-epoch merge (merge_cuckoo_shards) is exercised."""
    from spider_core_spark import schemas
    from spider_core_spark.api.spider import Spider
    from spider_core_spark.plans.config import CrawlConfig
    from spider_core_spark.plans.engine import CrawlEngine
    from spider_core_spark.sources import sitegen

    rows = sitegen.gen_pages_rows(range(150), 150, 4, 7)
    pages_df = spark.createDataFrame(rows, schemas.PAGES)
    robots_df = spark.createDataFrame(sitegen.gen_robots(4, 7), schemas.ROBOTS)
    seeds = [s["url"] for s in sitegen.gen_seeds(4)]

    results = {}
    for kind in ("bloom", "cuckoo"):
        cfg = CrawlConfig(
            workdir=str(tmp_path / kind),
            max_epochs=12,
            n_shards=4,
            seen_filter=kind,
            cuckoo_buckets=256,
            bloom_min_seen=0,  # force the probe stage from epoch 1
        )
        res = CrawlEngine(spark, Spider(start_urls=seeds), cfg).run(
            pages_df, robots_df
        )
        results[kind] = (
            dict(res.totals),
            sorted(r["fingerprint"] for r in res.seen().collect()),
            [
                (r["epoch"], r["wave_rank"], r["url"])
                for r in res.order().orderBy("epoch", "wave_rank").collect()
            ],
        )
    assert results["bloom"][0] == results["cuckoo"][0], "totals differ"
    assert results["bloom"][1] == results["cuckoo"][1], "seen set differs"
    assert results["bloom"][2] == results["cuckoo"][2], "fetch order differs"


def test_engine_cuckoo_budget_refusal(spark, tmp_path):
    from spider_core_spark.api.spider import Spider
    from spider_core_spark.plans.config import CrawlConfig
    from spider_core_spark.plans.engine import CrawlEngine

    cfg = CrawlConfig(
        workdir=str(tmp_path / "x"),
        seen_filter="cuckoo",
        n_shards=1024,
        cuckoo_buckets=1 << 20,
        bloom_broadcast_budget_mb=512,
    )
    with pytest.raises(ValueError, match="Cuckoo shards"):
        CrawlEngine(spark, Spider(start_urls=["http://a.test/"]), cfg).run(
            spark.createDataFrame([], "url string"), None
        )
