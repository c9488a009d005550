#!/usr/bin/env python
"""Two-parallelism scaling for the TRAINING-DATA ops (the crawl gate's
sibling): the MinHash signature+banding pass and repetition scoring over
a 16x-replicated documents corpus (~80k docs), taskset-pinned local[8]
vs local[32], interleaved trials. These are the pure-JVM passes that
dominate a 100 TB dedup job; unlike python-UDF stages they keep scaling
past 16 threads (see memory: py-UDF stages anti-scale there).

Usage:
  python BENCH/textops_scaling.py            # main: trials + summary
  python BENCH/textops_scaling.py worker N   # one trial at local[N]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
CACHE = os.environ.get("SPIDER_BENCH_CACHE", "/dev/shm/spider_bench_cache")
CORPUS = os.path.join(CACHE, "textops48x")
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 48


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"textops-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", "64")  # sized for the DATA,
        # identical at both levels — a real cluster sizes partitions for
        # the shuffle volume, not the executor count; partitions=cpus
        # made the 8-core level spill on the 240M-row token shuffle
        .config("spark.driver.memory", f"{6 * cpus}g")  # memory scales
        # WITH cores (an N-executor vs 4N-executor cluster has 4N the
        # aggregate memory; a fixed local heap would quarter per-task
        # memory at the wide level and spill the 100M-group hash agg
        # there only — a local-mode artifact, not a plan property)
        .config("spark.local.dir", "/dev/shm/spark_local")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.locality.wait", "0")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def ensure_corpus(spark) -> int:
    from pyspark.sql import functions as F

    out = os.path.join(CORPUS, "documents.parquet")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return spark.read.parquet(out).count()
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = None
    for i in range(REPLICAS):
        r = d.select(
            (F.col("doc_id") + i * 1_000_000).alias("doc_id"),
            F.concat(F.lit(f"dup{i} "), F.col("text")).alias("text"),
            "lang",
            "n_chars",
        )
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(32).write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).count()


def worker(cpus: int) -> None:
    from spider_core_spark.textops import analysis as ta
    from spider_core_spark.textops import dedup as td

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    n = ensure_corpus(spark)
    # warm up codegen/JIT/scan planning with a tiny pass of the SAME ops
    # (a real long-running job is steady-state; the first-job JIT cost is
    # a per-session constant, not part of the per-doc work being scaled)
    warm_dir = os.path.join(CORPUS, "warm")
    if not os.path.exists(os.path.join(warm_dir, "documents.parquet", "_SUCCESS")):
        spark.read.parquet(os.path.join(CORPUS, "documents.parquet")).limit(
            200
        ).write.mode("overwrite").parquet(
            os.path.join(warm_dir, "documents.parquet")
        )
    td.minhash_bands_long(spark, warm_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    ta.repetition_scores(spark, warm_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.monotonic()
    # signature + banding (the 100 TB dedup job's dominant pass)
    td.minhash_bands_long(spark, CORPUS).write.format("noop").mode(
        "overwrite"
    ).save()
    # repetition quality gate (explode + combinable groupBy pair)
    ta.repetition_scores(spark, CORPUS).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": n,
                "wall_s": round(wall, 2),
                "docs_per_sec": round(n / wall, 1),
            }
        )
    )
    spark.stop()


def run_trial(cpus: int) -> dict:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
         os.path.abspath(__file__), "worker", str(cpus)],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])


def main() -> None:
    lo, hi, trials = 2, 8, 2
    run_trial(hi)  # warm: fixture + JIT
    results = {lo: [], hi: []}
    for t in range(trials):
        for cpus in (lo, hi):  # interleaved — shared-ambient pairs
            r = run_trial(cpus)
            results[cpus].append(r)
            print(f"trial {t} local[{cpus}]: {r['wall_s']}s "
                  f"{r['docs_per_sec']} docs/s", flush=True)
    med = {c: statistics.median(x["docs_per_sec"] for x in results[c])
           for c in (lo, hi)}
    pair_effs = [
        (h["docs_per_sec"] / l["docs_per_sec"]) / (hi / lo)
        for l, h in zip(results[lo], results[hi])
    ]
    eff = statistics.median(pair_effs)
    print(json.dumps({
        "docs": results[hi][0]["docs"],
        "median_docs_per_sec": med,
        "pair_efficiencies": [round(e, 3) for e in pair_effs],
        "efficiency_lo_to_hi": round(eff, 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    else:
        main()
