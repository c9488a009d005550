"""Standalone corpus-prep driver: run the full curation chain over a
documents parquet directory and write the kept set + packing manifest.

Usage (ships with the same --py-files artifact as main.py):

    spark-submit --py-files spider_core_spark.zip scripts/corpus_prep.py \
        --docs /root/testdata/sf0.01 --out /tmp/corpus_out \
        [--chunk-tokens 2048] [--skip-neardup]

Expects {docs}/documents.parquet with columns
(doc_id, text, lang, source, n_chars) — the shape produced by a crawl's
items stage after text extraction. Outputs:

    {out}/kept.parquet      clean+mixed doc ids with lang/tokens/chunk span
    {out}/summary.json      per-language docs/tokens/chunks (the training
                            launch budget table) + stage counters
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local-python convenience: resolve the package from the repo checkout
# (spark-submit users get it from --py-files instead); executors receive
# it via the zip artifact, driver-side imports via this path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="dir containing documents.parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--chunk-tokens", type=int, default=2048)
    ap.add_argument(
        "--skip-neardup",
        action="store_true",
        help="exact dedup + quality only (skip MinHash clustering)",
    )
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = SparkSession.builder.appName("corpus-prep")
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from spider_core_spark.operators.prefix import with_group_prefix_sum
    from spider_core_spark.textops import analysis as ta
    from spider_core_spark.textops import dedup as td

    t0 = time.monotonic()
    sf_dir = args.docs.rstrip("/")
    n_input = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    if args.skip_neardup:
        clean = ta.corpus_keepers(spark, sf_dir).select("doc_id")
    else:
        clean = ta.corpus_keepers_neardup(spark, sf_dir).select("doc_id")

    # mix thresholds + downsample + per-doc chunk spans: the same chain as
    # the oracled text_corpus_prep, kept per-doc here so the output table
    # carries each kept doc's packed-stream position
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .join(clean, "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
    )
    full = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = (
        full.groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("mass"))
        .collect()
    )
    total, nsrc = sum(r["mass"] for r in rows), len(rows)
    tdf = spark.createDataFrame(
        [
            (r["source"], min(ta._MIX_MOD, (total * ta._MIX_MOD) // (nsrc * r["mass"])))
            for r in rows
        ],
        "source string, thresh long",
    )
    bucket = F.pmod(
        F.expr(td._h64_spark("cast(doc_id as string)", ta._MIX_SEED)),
        F.lit(ta._MIX_MOD),
    )
    kept = (
        docs.join(F.broadcast(tdf), "source")
        .filter(bucket < F.col("thresh"))
        .select("doc_id", "lang", "n_tokens")
    )

    packed, release = with_group_prefix_sum(
        kept, ["lang"], ["doc_id"], "n_tokens", "start_tok"
    )
    ck = args.chunk_tokens
    packed = (
        packed.withColumn("_last", F.col("start_tok") + F.col("n_tokens") - 1)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "start_tok",
            F.expr(f"start_tok div {ck}").cast("long").alias("start_chunk"),
            F.expr(f"_last div {ck}").cast("long").alias("end_chunk"),
        )
    )
    os.makedirs(args.out, exist_ok=True)
    packed.write.mode("overwrite").parquet(f"{args.out}/kept.parquet")
    release()

    out = spark.read.parquet(f"{args.out}/kept.parquet")
    per_lang = {
        r["lang"]: {
            "n_docs": r["n_docs"],
            "total_tokens": r["total_tokens"],
            "n_chunks": (r["total_tokens"] + ck - 1) // ck,
        }
        for r in out.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .collect()
    }
    n_kept = sum(v["n_docs"] for v in per_lang.values())
    summary = {
        "input_docs": n_input,
        "kept_docs": n_kept,
        "kept_fraction": round(n_kept / max(n_input, 1), 6),
        "chunk_tokens": ck,
        "per_lang": per_lang,
        "neardup": not args.skip_neardup,
        "wall_s": round(time.monotonic() - t0, 3),
    }
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    td.release_staged_caches()
    spark.stop()


if __name__ == "__main__":
    main()
