"""Priority-frontier ordering + wave selection semantics (SURVEY.md F1-F3)
and the ServeFromCache (ReturnResponse analog) counter path."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api import middleware as mw
from spider_core_spark.operators.frontier import select_wave
from spider_core_spark.plans.config import CrawlConfig


def _row(url, host, prio, seq, nb=0, state="pending"):
    return (
        url, f"fp_{url}", host, hash(host) % 1000, 1, prio, seq, 0, nb,
        state, 0, None,
    )


@pytest.fixture()
def frontier(spark):
    rows = [
        _row("https://a.test/1", "a.test", 1, 10),
        _row("https://a.test/2", "a.test", 0, 20),  # higher priority (0 < 1)
        _row("https://b.test/1", "b.test", 0, 5),
        _row("https://b.test/2", "b.test", 0, 6),
        _row("https://b.test/3", "b.test", 0, 7),
        _row("https://c.test/1", "c.test", 2, 1),
        _row("https://d.test/1", "d.test", 0, 99, nb=5),  # retry-delayed
    ]
    return spark.createDataFrame(rows, schemas.FRONTIER)


def test_priority_then_seq_order(spark, frontier):
    sel = select_wave(frontier, None, epoch=0, cfg=CrawlConfig(use_robots=False))
    got = [r["url"] for r in sel.wave.orderBy("wave_rank").collect()]
    assert got == [
        "https://b.test/1",  # prio 0, seq 5
        "https://b.test/2",
        "https://b.test/3",
        "https://a.test/2",  # prio 0, seq 20
        "https://a.test/1",  # prio 1
        "https://c.test/1",  # prio 2
    ]


def test_retry_delay_gates_eligibility(spark, frontier):
    cfg = CrawlConfig(use_robots=False)
    sel0 = select_wave(frontier, None, epoch=0, cfg=cfg)
    assert "https://d.test/1" not in {r["url"] for r in sel0.wave.collect()}
    assert "https://d.test/1" in {r["url"] for r in sel0.leftover.collect()}
    sel5 = select_wave(frontier, None, epoch=5, cfg=cfg)
    assert "https://d.test/1" in {r["url"] for r in sel5.wave.collect()}


def test_budget_defers_in_priority_order(spark, frontier):
    cfg = CrawlConfig(use_robots=False, default_host_budget=2)
    sel = select_wave(frontier, None, epoch=0, cfg=cfg)
    wave_urls = {r["url"] for r in sel.wave.collect()}
    assert "https://b.test/3" not in wave_urls  # third b.test row deferred
    assert {"https://b.test/1", "https://b.test/2"} <= wave_urls
    assert "https://b.test/3" in {r["url"] for r in sel.leftover.collect()}


def test_wave_cap_defers(spark, frontier):
    cfg = CrawlConfig(use_robots=False, max_wave_size=3)
    sel = select_wave(frontier, None, epoch=0, cfg=cfg)
    assert sel.n_wave == 3
    got = [r["url"] for r in sel.wave.orderBy("wave_rank").collect()]
    assert got == ["https://b.test/1", "https://b.test/2", "https://b.test/3"]


def test_serve_from_cache_counts(spark):
    df = spark.createDataFrame(
        [("https://a.test/1", 200), ("https://a.test/2", 200)],
        "url string, status int",
    ).withColumn("retry_count", F.lit(0))
    out = mw.run_response_chain(df, [mw.ServeFromCache("url like '%/1'")])
    acts = {r["url"]: r[mw.ACTION] for r in out.collect()}
    assert acts["https://a.test/1"] == mw.SERVE
    assert acts["https://a.test/2"] == mw.CONTINUE


def test_recrawl_schedule_semantics(spark):
    """F5 revisit policy: interval clamped to [MIN, MAX], equals
    span // (changes + 1) inside the clamp, and next fetch time is
    last observation + interval."""
    from spider_core_spark.plans import demo_queries as dq

    rows = dq.f5_recrawl_schedule(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_changes"] < r["n_fetches"]
        raw = r["span_s"] // (r["n_changes"] + 1)
        expect = max(dq.RECRAWL_MIN_S, min(dq.RECRAWL_MAX_S, raw))
        assert r["next_interval_s"] == expect
        assert dq.RECRAWL_MIN_S <= r["next_interval_s"] <= dq.RECRAWL_MAX_S
        assert r["next_fetch_epoch"] > r["span_s"]  # epoch-scale, not span
    # pages that change more often are rescheduled sooner (policy is
    # monotone in the change rate, up to the clamp)
    by_rate = sorted(
        (r for r in rows if r["next_interval_s"] not in
         (dq.RECRAWL_MIN_S, dq.RECRAWL_MAX_S)),
        key=lambda r: r["span_s"] / (r["n_changes"] + 1),
    )
    ints = [r["next_interval_s"] for r in by_rate]
    assert ints == sorted(ints)


def test_pagerank_priority_matches_pure_python(spark):
    """F6 integer PageRank: bit-exact vs an independent pure-Python
    replica on the same synthetic edge derivation, plus structural
    invariants (rank floor = teleport base, fetch_order a permutation)."""
    from spider_core_spark.functions.hashing import h64_py
    from spider_core_spark.plans import demo_queries as dq

    sf = "/root/testdata/sf0.001"
    out = {r["page_id"]: r for r in dq.f6_pagerank_priority(spark, sf).collect()}

    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", "user_id"
    ).collect()
    n = max(r["user_id"] for r in ev) + 1
    edges = []
    for r in ev:
        dst = h64_py(str(r["event_id"]), seed=dq.PR_SEED) % n
        if dst != r["user_id"]:
            edges.append((r["user_id"], dst))
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = (dq.PR_SCALE * (dq.PR_DAMP_DEN - dq.PR_DAMP_NUM)) // dq.PR_DAMP_DEN
    rank = {p: dq.PR_SCALE for p in range(n)}
    for _ in range(dq.PR_ITERS):
        csum = {}
        for s, d in edges:
            csum[d] = csum.get(d, 0) + rank[s] // deg[s]
        rank = {
            p: base + (dq.PR_DAMP_NUM * csum.get(p, 0)) // dq.PR_DAMP_DEN
            for p in range(n)
        }

    assert len(out) == n
    for p in range(n):
        assert out[p]["rank"] == rank[p], p
        assert out[p]["rank"] >= base
    has_in = {d for _, d in edges}
    for p in range(n):
        assert (out[p]["rank"] == base) == (p not in has_in)
    assert sorted(r["fetch_order"] for r in out.values()) == list(
        range(1, n + 1)
    )
