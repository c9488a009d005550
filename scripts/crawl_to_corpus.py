"""End-to-end crawl → corpus pipeline: the full story the engine exists
for — crawl web pages, land extracted text as the canonical documents
table, then run the curation chain and the stats report over it.

    crawl (CrawlEngine over the pages/robots tables)
      → items (url, text, lang, …)
      → documents.parquet (doc_id, text, lang, source, n_chars)
      → scripts/corpus_prep.py   (dedup → quality → mix → packing)
      → scripts/corpus_report.py (stats / quantiles / HLL / leakage)

Usage (self-contained on the deterministic synthetic site):

    python scripts/crawl_to_corpus.py --workdir /tmp/e2e \
        [--pages 800] [--sites 6] [--max-epochs 8] [--shuffle-partitions 8]

Or point --pages-dir/--robots-dir/--seeds-dir at real tables. The items
→ documents mapping is the deployment seam: doc_id = h64(url) (the
deterministic 60-bit fingerprint primitive — stable across reruns and
engines), source = url host, n_chars = length(text). Prints one JSON
line: crawl totals + prep summary + report path.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--pages", type=int, default=800)
    ap.add_argument("--sites", type=int, default=6)
    ap.add_argument("--max-epochs", type=int, default=8)
    ap.add_argument("--shuffle-partitions", type=int, default=8)
    ap.add_argument("--pages-dir", default=None, help="existing pages/robots/seeds fixture dir")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("crawl-to-corpus")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.maxPlanStringLength", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spider_core_spark import CrawlConfig, CrawlEngine, Spider
    from spider_core_spark.functions.hashing import h64_col
    from spider_core_spark.functions.url import host_col
    from spider_core_spark.sources import sitegen

    t0 = time.monotonic()
    wd = args.workdir.rstrip("/")
    fixture = args.pages_dir or f"{wd}/site"
    if args.pages_dir is None:
        sitegen.write_fixture(
            spark, fixture, n_pages=args.pages, n_sites=args.sites
        )
    pages = spark.read.parquet(f"{fixture}/pages.parquet")
    robots = spark.read.parquet(f"{fixture}/robots.parquet")
    seeds = [
        r["url"]
        for r in spark.read.parquet(f"{fixture}/seeds.parquet")
        .orderBy("seq")
        .collect()
    ]
    res = CrawlEngine(
        spark,
        Spider(start_urls=seeds),
        CrawlConfig(workdir=f"{wd}/crawl", max_epochs=args.max_epochs),
    ).run(pages, robots)

    docs_dir = f"{wd}/corpus"
    items = res.items()
    (
        items.select(
            h64_col(F.col("url")).alias("doc_id"),
            "text",
            "lang",
            host_col(F.col("url")).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(f"{docs_dir}/documents.parquet")
    )
    spark.stop()  # the child drivers build their own sessions

    env = dict(os.environ, PYTHONPATH=os.path.dirname(HERE))
    prep = subprocess.run(
        [sys.executable, os.path.join(HERE, "corpus_prep.py"),
         "--docs", docs_dir, "--out", f"{wd}/prep",
         "--shuffle-partitions", str(args.shuffle_partitions)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    if prep.returncode != 0:
        sys.stderr.write(prep.stdout[-2000:] + prep.stderr[-2000:])
        raise SystemExit("corpus_prep failed")
    report = subprocess.run(
        [sys.executable, os.path.join(HERE, "corpus_report.py"),
         "--docs", docs_dir, "--out", f"{wd}/report.json",
         "--shuffle-partitions", str(args.shuffle_partitions)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    if report.returncode != 0:
        sys.stderr.write(report.stdout[-2000:] + report.stderr[-2000:])
        raise SystemExit("corpus_report failed")

    with open(f"{wd}/prep/summary.json") as f:
        summary = json.load(f)
    print(json.dumps({
        "crawl_totals": res.totals,
        "documents": f"{docs_dir}/documents.parquet",
        "prep_summary": summary,
        "report": f"{wd}/report.json",
        "wall_s": round(time.monotonic() - t0, 3),
    }))


if __name__ == "__main__":
    main()
