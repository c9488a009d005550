#!/usr/bin/env python
"""Per-round benchmark. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline queries = the operator suite over $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus a full BFS crawl over a cached synthetic site
(crawl_urls_per_sec reported alongside). The two-parallelism scaling run
(BASELINE.md gate) lives in BENCH/run_scaling.py and writes
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CRAWL_PAGES = int(os.environ.get("SPIDER_BENCH_CRAWL_PAGES", "120000"))
CACHE = os.environ.get("SPIDER_BENCH_CACHE", "/tmp/spider_bench_cache")


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spider-core-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.locality.wait", "0")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.maxPlanStringLength", "5000")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def run_queries(spark) -> dict[str, float]:
    """Headline operator suite at SF_DIR (noop sink forces full compute)."""
    from spider_core_spark.plans import demo_queries as dq
    from spider_core_spark.textops import analysis as ta
    from spider_core_spark.textops import dedup as td
    from spider_core_spark.textops import similarity as ts

    suite = {
        "j1_fetch_join": dq.j1_fetch_join,
        "j2_anti_dedup": dq.j2_anti_dedup,
        "f1_wave_order": dq.f1_wave_order,
        "f2_politeness_topk": dq.f2_politeness_topk,
        "a3_timing_stats": dq.a3_timing_stats,
        "a6_sliding_rate": dq.a6_sliding_rate,
        "a8_perhost_feedback": dq.a8_perhost_feedback,
        "dedup_exact": td.exact_dedup,
        "dedup_minhash_bands": td.minhash_bands,
        "dedup_minhash_pairs": td.minhash_pairs,
        "dedup_simhash": td.simhash,
        "dedup_simhash_pairs": td.simhash_pairs,
        "dedup_ngram_jaccard": td.ngram_jaccard_pairs,
        "dedup_embedding_cosine": td.embedding_neardup,
        "dedup_embedding_ivf": td.embedding_ivf_neardup,
        "ann_bruteforce_topk": ts.ann_bruteforce_topk,
        "ann_lsh_topk": ts.ann_lsh_topk,
        "text_langid": ta.lang_id,
        "text_quality": ta.quality_score,
        "text_tokens": ta.token_counts,
        "text_fingerprint": ta.doc_fingerprint,
        "text_vocab_topk": ta.vocab_topk,
    }
    out = {}
    for name, fn in suite.items():
        out[name] = timed(
            lambda: fn(spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    return out


def ensure_crawl_fixture(spark) -> str:
    from spider_core_spark.sources import sitegen

    site = f"{CACHE}/site_{CRAWL_PAGES}"
    if not os.path.exists(f"{site}/pages.parquet/_SUCCESS"):
        sitegen.write_fixture(spark, site, n_pages=CRAWL_PAGES, n_sites=60)
    return site


def run_crawl(spark) -> tuple[float, float, int]:
    """Full BFS crawl (ordering + politeness + dedup live) over the cached
    site; returns (wall_s, urls_per_sec, fetched)."""
    from spider_core_spark import CrawlConfig, CrawlEngine, Spider

    site = ensure_crawl_fixture(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # tiny iterative jobs
    pages = spark.read.parquet(f"{site}/pages.parquet")
    seeds = [f"https://site{s}.test/p/{i}" for s in range(58) for i in range(50)]
    cfg = CrawlConfig(
        workdir=f"{CACHE}/crawl_run",
        max_epochs=5,
        max_wave_size=2_000_000,
        default_host_budget=10**9,
        use_robots=False,
        use_bloom=True,
        detailed_metrics=False,
        skew_salt=max(CPUS, 8),
    )
    eng = CrawlEngine(spark, Spider(start_urls=seeds), cfg)
    t0 = time.monotonic()
    res = eng.run(pages, robots=None)
    wall = time.monotonic() - t0
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    fetched = res.totals["requests_sent"]
    return round(wall, 3), round(fetched / wall, 1), fetched


def main():
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    queries = run_queries(spark)
    crawl_wall, urls_per_sec, fetched = run_crawl(spark)
    queries["crawl_bfs"] = crawl_wall
    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_wall",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "crawl_urls_per_sec": urls_per_sec,
                "crawl_fetched": fetched,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
