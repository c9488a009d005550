"""SNK3 stats report: byte formatting (S5), EMA recursion (A6), rates (A5)
and the end-of-crawl markdown/json exports, verified against a real tiny
crawl plus the pure-Python simulator's totals."""

from __future__ import annotations

import json

from spider_core_spark import CrawlConfig, CrawlEngine, Spider
from spider_core_spark.plans import report as rpt
from spider_core_spark.sources import sitegen


def test_format_bytes_reference_breakpoints():
    # src/stats.rs:174-188
    assert rpt.format_bytes(512) == "512 B"
    assert rpt.format_bytes(2048) == "2.00 KB"
    assert rpt.format_bytes(3 * 1024 * 1024) == "3.00 MB"
    assert rpt.format_bytes(5 * 1024**3 + 1024**3 // 2) == "5.50 GB"


def test_format_time_ms_breakpoints():
    # src/stats.rs:234-244: ms below 1 s, else seconds with 2 decimals
    assert rpt.format_time_ms(None) == "N/A"
    assert rpt.format_time_ms(999.4) == "999 ms"
    assert rpt.format_time_ms(1500.0) == "1.50 s"


def test_ema_recursion_exact():
    # src/stats.rs:80-89: rate = α·current + (1-α)·rate, rate starts at 0
    xs = [10.0, 20.0, 30.0]
    got = rpt.ema_series(xs, alpha=0.2)
    exp = []
    r = 0.0
    for x in xs:
        r = 0.2 * x + 0.8 * r
        exp.append(r)
    assert got == exp


def test_report_from_real_crawl(spark, tmp_path):
    sitegen.write_fixture(spark, str(tmp_path / "site"), n_pages=120, n_sites=3)
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
        CrawlConfig(workdir=str(tmp_path / "run"), max_epochs=4),
    ).run(pages)

    snap = res.snapshot()
    # counters flow through verbatim
    for k, v in res.totals.items():
        assert snap[k] == v, k
    # A2: status histogram sums to responses received
    assert sum(snap["response_status_counts"].values()) == snap[
        "responses_received"
    ]
    # A3/A4: real measured timings populated with sane ordering
    for prefix in ("request", "parsing"):
        avg = snap[f"average_{prefix.replace('parsing', 'parsing')}_time_ms"]
        lo = snap[f"fastest_{prefix}_time_ms"]
        hi = snap[f"slowest_{prefix}_time_ms"]
        assert avg is not None and lo is not None and hi is not None
        assert lo <= avg <= hi
    assert snap["request_time_count"] == snap["responses_received"]
    # A5/A6: rates present
    assert snap["responses_per_second"] > 0
    assert snap["recent_responses_per_second"] > 0

    # exports render and carry the same numbers
    md = res.report_markdown()
    assert "# Crawl Statistics Report" in md
    assert f"| Received   | {snap['responses_received']} |" in md
    assert "| From Cache |" in md
    js = json.loads(res.report_json())
    assert js["responses_received"] == snap["responses_received"]
    disp = res.report_display()
    assert "Crawl Statistics" in disp and "status   :" in disp


def test_a6_ema_query_matches_python_recursion(spark):
    """The closed-form integer a6_ema must equal the literal float
    recursion to ~1e-9 (the closed form IS the recursion, exactly)."""
    from spider_core_spark.plans import demo_queries as dq

    sf = "/root/testdata/sf0.001"
    rows = dq.a6_ema(spark, sf).orderBy("t").collect()
    e = (
        spark.read.parquet(f"{sf}/events.parquet")
        .filter(f"ts < timestamp '{dq.EMA_DAYS_CUTOFF}'")
        .selectExpr(
            "date_trunc('day', ts) as day",
            "cast(round(value * 100) as long) as cents",
        )
        .groupBy("day")
        .agg({"cents": "sum"})
        .orderBy("day")
        .collect()
    )
    ema = None
    for t, r in enumerate(e):
        x = r["sum(cents)"] / 100.0
        ema = x if ema is None else 0.2 * x + 0.8 * ema
        assert abs(rows[t]["ema_value"] - ema) < 1e-6 * max(abs(ema), 1.0)
