#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1.4): per-query
noop-sink isolation timings + optional explain("formatted") capture.

Does NOT replace bench.py (frozen for driver measurement). Usage:

  python bench_extra.py                      # all queries, 1 rep each
  python bench_extra.py q1 q2 ...            # just these queries
  SPIDER_EXTRA_REPS=3 python bench_extra.py ann_ivfpq_topk
  SPIDER_EXTRA_EXPLAIN=plans/r06 python bench_extra.py q1   # write plans

Prints one JSON line per query as it finishes (so partial runs are
usable) and a final summary JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPIDER_EXTRA_REPS", "1"))
EXPLAIN_DIR = os.environ.get("SPIDER_EXTRA_EXPLAIN", "")
SUFFIX = os.environ.get("SPIDER_EXTRA_SUFFIX", "before")


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("spider-core-spark-bench-extra")
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


def main():
    import __spark_entry__ as em
    from spider_core_spark.textops import dedup as td

    wanted = [a for a in sys.argv[1:] if not a.startswith("-")]
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    names = wanted or sorted(qs)
    out = {}
    for name in names:
        fn = qs[name]
        if EXPLAIN_DIR:
            import contextlib
            import io

            os.makedirs(EXPLAIN_DIR, exist_ok=True)
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{EXPLAIN_DIR}/{name}_{SUFFIX}.txt", "w") as f:
                f.write(buf.getvalue())
            td.release_staged_caches()
        times = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            td.release_staged_caches()
        out[name] = min(times)
        print(json.dumps({"query": name, "times": times}), flush=True)
    print(json.dumps({"metric": "extra", "sf": SF_DIR, "queries": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
