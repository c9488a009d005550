#!/usr/bin/env python
"""One scaling trial: steady-state frontier wave at a given parallelism.

Usage: python BENCH/scaling_worker.py <cpus> <n_pages> <density> [mode]

The job (identical input at every parallelism level): a frontier of
n_pages URLs preloaded as a table (the steady-state of a 10^10-URL crawl
— mid-crawl every epoch IS a big ready wave), one full epoch of
fetch join → parse UDF → item extraction → link discovery → 3-tier dedup
→ frontier/seen/order commit. Prints one JSON line with wall seconds and
URLs fetched+deduped/sec.

mode=bfs instead runs the multi-epoch BFS crawl (ordering semantics) for
the secondary table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("SPIDER_BENCH_CACHE", "/dev/shm/spider_bench_cache")


def main():
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])
    density = int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "steady"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-{mode}-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "40g")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.local.dir", "/dev/shm/spark_local")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.locality.wait", "0")
        .config("spark.sql.autoBroadcastJoinThreshold", str(128 * 1024 * 1024))
        .config("spark.sql.maxPlanStringLength", "5000")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spider_core_spark import CrawlConfig, CrawlEngine, Spider
    from spider_core_spark.operators import rank as rk
    from spider_core_spark.sources import sitegen

    # force the distributed two-phase rank (the single-window path is a
    # serial sort that penalizes exactly the wide level we are measuring)
    rk.SMALL_THRESHOLD = 100_000

    site = f"{CACHE}/site_{n_pages}_d{density}"
    if not os.path.exists(f"{site}/pages.parquet/_SUCCESS"):
        sitegen.write_fixture(
            spark, site, n_pages=n_pages, n_sites=60, density=density
        )
    pages = spark.read.parquet(f"{site}/pages.parquet")

    cfg = CrawlConfig(
        workdir=f"{CACHE}/scaling_run_{mode}_{cpus}",
        max_wave_size=100_000_000,
        default_host_budget=10**9,
        use_robots=False,
        use_bloom=True,
        detailed_metrics=False,
        skew_salt=0,
        seeds_pre_deduped=(mode == "steady"),
        extra={"profile": 1},
    )
    if mode == "steady":
        # the whole pages url-set as the ready frontier, one epoch;
        # seq = url hash: deterministic, unique, partitioning-independent
        cfg.max_epochs = 1
        seeds_df = pages.select(
            "url",
            F.conv(F.substring(F.sha2(F.col("url"), 256), 1, 15), 16, 10)
            .cast("long")
            .alias("seq"),
        )
        spider = Spider(start_urls=[], item_text=False)
        eng = CrawlEngine(spark, spider, cfg)
        t0 = time.monotonic()
        res = eng.run(pages, robots=None, seeds_df=seeds_df)
        wall = time.monotonic() - t0
    else:
        cfg.max_epochs = 5
        seeds = [f"https://site{s}.test/p/{i}" for s in range(58) for i in range(50)]
        eng = CrawlEngine(spark, Spider(start_urls=seeds), cfg)
        t0 = time.monotonic()
        res = eng.run(pages, robots=None)
        wall = time.monotonic() - t0

    fetched = res.totals["requests_sent"]
    print(
        json.dumps(
            {
                "mode": mode,
                "cpus": cpus,
                "n_pages": n_pages,
                "density": density,
                "epochs": res.epochs_run,
                "fetched": fetched,
                "wall_s": round(wall, 2),
                "urls_per_sec": round(fetched / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
