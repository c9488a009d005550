#!/usr/bin/env python
"""spark-submit entrypoint for the crawl engine.

    spark-submit --py-files spider_core_spark.zip main.py \
        --pages /data/pages.parquet --seeds /data/seeds.parquet \
        --robots /data/robots.parquet --workdir /data/crawl_run \
        --max-epochs 50 --max-wave 1000000 [--resume] [--streaming]

Build the zip with:  python -m zipfile -c spider_core_spark.zip spider_core_spark
(or `scripts/package.sh`). On a cluster the same command runs unchanged —
state lives in tables, so executors never share driver memory.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description="spider_core_spark crawl runner")
    ap.add_argument("--pages", required=True, help="pages table (parquet/iceberg)")
    ap.add_argument("--seeds", help="seed table (url, seq) — or --seed-urls")
    ap.add_argument("--seed-urls", nargs="*", default=[], help="inline seed urls")
    ap.add_argument("--robots", help="robots rules table")
    ap.add_argument(
        "--robots-from-pages",
        action="store_true",
        help="build the rules table by parsing /robots.txt bodies out of "
        "the pages corpus (sources/robots.py)",
    )
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--max-epochs", type=int, default=100)
    ap.add_argument("--max-wave", type=int, default=30_000)
    ap.add_argument("--host-budget", type=int, default=1_000_000)
    ap.add_argument("--max-retries", type=int, default=0)
    ap.add_argument("--no-bloom", action="store_true")
    ap.add_argument("--no-detail", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--streaming", action="store_true")
    ap.add_argument(
        "--adaptive-budget", action="store_true",
        help="per-host A8 feedback budgets (AdaptiveSemaphore per-host analog)",
    )
    ap.add_argument(
        "--adaptive-wave", action="store_true",
        help="global adaptive wave sizing (the reference's single permit count)",
    )
    ap.add_argument(
        "--time-target-ms", type=int, default=None,
        help="response-time target for the adaptive time terms "
             "(needs a transport_ms-emitting fetcher)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from spider_core_spark import CrawlConfig, CrawlEngine, Spider
    from spider_core_spark.streaming.stream_engine import StreamingCrawlEngine

    spark = SparkSession.builder.appName("spider-core-spark-crawl").getOrCreate()

    pages = spark.read.parquet(args.pages)
    if args.robots_from_pages:
        from spider_core_spark.sources.robots import parse_robots

        robots = parse_robots(pages)
    else:
        robots = spark.read.parquet(args.robots) if args.robots else None
    seeds_df = spark.read.parquet(args.seeds) if args.seeds else None

    cfg = CrawlConfig(
        workdir=args.workdir,
        max_epochs=args.max_epochs,
        max_wave_size=args.max_wave,
        default_host_budget=args.host_budget,
        max_retries=args.max_retries,
        use_robots=robots is not None,
        use_bloom=not args.no_bloom,
        detailed_metrics=not args.no_detail,
        seeds_pre_deduped=seeds_df is not None,
        adaptive_budget=args.adaptive_budget,
        adaptive_wave=args.adaptive_wave,
        adaptive_time_target_ms=args.time_target_ms,
    )
    spider = Spider(start_urls=list(args.seed_urls))

    if args.streaming:
        out = StreamingCrawlEngine(spark, spider, cfg).run(pages, robots=robots)
        print(json.dumps({"mode": "streaming", "seen": out["seen"].count()}))
    else:
        import signal

        eng = CrawlEngine(spark, spider, cfg)

        def _graceful(_sig, _frm):
            # reference Ctrl-C path (src/crawler/core.rs:260-263): finish
            # the in-flight epoch, commit, write the final checkpoint
            print("SIGINT: finishing current epoch then stopping", flush=True)
            eng.request_stop()

        signal.signal(signal.SIGINT, _graceful)
        res = eng.run(
            pages, robots=robots, resume=args.resume, seeds_df=seeds_df
        )
        # SNK3: print the stats report at crawl end (reference
        # src/crawler/core.rs:364-366) and persist both export formats
        print(res.report_display())
        with open(f"{args.workdir}/report.json", "w") as f:
            f.write(res.report_json())
        with open(f"{args.workdir}/report.md", "w") as f:
            f.write(res.report_markdown())
        print(
            json.dumps(
                {
                    "mode": "bsp",
                    "epochs": res.epochs_run,
                    "wall_s": round(res.wall_s, 2),
                    "totals": res.totals,
                }
            )
        )


if __name__ == "__main__":
    main()
