"""Standalone corpus-report driver: the read-only stats sibling of
corpus_prep.py — one pass of the sketch/statistics family over a
documents directory, printed as one JSON report (and optionally written
to a file). The corpus-side analog of the crawl engine's stats sink.

Usage (ships with the same --py-files artifact as main.py):

    spark-submit --py-files spider_core_spark.zip scripts/corpus_report.py \
        --docs /root/testdata/sf0.01 [--out report.json] \
        [--shuffle-partitions 8]

Sections (every number comes from an oracle-certified operator):

    corpus_stats       per-language docs/chars/tokens
    length_quantiles   per-language exact p25/p50/p75/p95 token counts
    vocab_cardinality  HLL-estimated distinct whitespace tokens (the u3
                       sketch applied to the token stream; exact distinct
                       would shuffle the full vocabulary)
    split_leakage      near-dup pairs crossing the train/val/test split
    gate_pass_rates    fraction of docs passing the Gopher hard gates
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="dir containing documents.parquet")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = SparkSession.builder.appName("corpus-report")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from spider_core_spark.plans.demo_queries import hll_estimate
    from spider_core_spark.streaming.metrics_stream import (
        hll_pad_registers,
        hll_register_stream,
    )
    from spider_core_spark.textops import analysis as ta
    from spider_core_spark.textops import dedup as td

    t0 = time.monotonic()
    sf_dir = args.docs.rstrip("/")
    report: dict = {"docs": sf_dir}

    report["corpus_stats"] = [
        r.asDict() for r in ta.corpus_stats(spark, sf_dir).orderBy("lang").collect()
    ]
    report["length_quantiles"] = [
        r.asDict()
        for r in ta.length_quantiles(spark, sf_dir).orderBy("lang", "pct").collect()
    ]

    # distinct-token cardinality via the HLL sketch (u3 layout) over the
    # exploded token stream — one combinable agg, no vocabulary shuffle
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("url"))
    )
    full = hll_pad_registers(hll_register_stream(toks).collect())
    report["vocab_cardinality_est"] = round(hll_estimate(full), 1)

    report["split_leakage"] = [
        r.asDict()
        for r in ta.split_leakage(spark, sf_dir)
        .orderBy("split_lo", "split_hi")
        .collect()
    ]
    td.release_staged_caches()

    gates = ta.gopher_rules(spark, sf_dir)
    flag_cols = [c for c in gates.columns if c.endswith("_ok") or c == "keep"]
    n = gates.count()
    rates = gates.agg(
        *[F.sum(F.col(c).cast("long")).alias(c) for c in flag_cols]
    ).collect()[0]
    report["gate_pass_rates"] = {
        c: round(rates[c] / n, 4) for c in flag_cols
    } | {"n_docs": n}

    report["wall_s"] = round(time.monotonic() - t0, 3)
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
