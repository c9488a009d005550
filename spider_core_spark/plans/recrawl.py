"""Continuous crawling: revisit scheduling across runs.

The reference crawls each URL exactly once per process (dedup-forever
seen set, src/scheduler.rs:280-313). A production web crawl is
CONTINUOUS: every page is revisited on a cadence derived from how often
it has been observed to change (Cho & Garcia-Molina 2003). This module
adds that layer ON TOP of the engine's run model, as three composable
pieces:

1. ``append_fetch_history(result, run_epoch, history_dir)`` — after a
   run, append one observation per fetched URL: (url, run_epoch,
   content_fp). The fingerprint is h64 over the extracted text — the
   same primitive every dedup operator shares, so "page changed" ≡
   "extracted text bytes changed" exactly like the parity contract.
   The history is an append-only parquet directory partitioned by
   run_epoch — one slim write per run, no rewrite of old runs.

2. ``recrawl_schedule(history)`` — per URL: change count from a lag
   window over run order (fp differs from previous observation),
   interval = observed span // (changes + 1) clamped to
   [RECRAWL_MIN_S, RECRAWL_MAX_S] — the SAME integer-only policy the
   f5 gate query verifies against DuckDB (plans/demo_queries.py:F5) —
   and next_fetch_epoch = last observation + interval.

3. ``due_start_requests(schedule, now_epoch, limit)`` — schedule rows
   whose next_fetch_epoch has passed, as ``Spider.start_requests``
   dicts: stalest first (priority = overdue rank), so the next run's
   first wave refetches what has been waiting longest. The returned
   list feeds an ordinary ``Spider(start_requests=...)`` run with a
   FRESH workdir — in continuous mode the seen set is per-run (dedup
   within a revisit wave), while cross-run memory lives in the history
   table.

4. ``evict_for_recrawl(spark, workdir, urls, ...)`` — the IN-PLACE
   alternative to the fresh-workdir mode: tombstone the due URLs out of
   the long-lived run's seen set (CheckpointStore.write_seen_eviction —
   an O(|due|) Iceberg-style equality-delete delta, never a rewrite of
   the 10^10-row table), then resume THE SAME workdir with
   ``CrawlConfig(reseed_on_resume=True)`` and
   ``Spider(start_requests=due)``: exactly the evicted set re-enters
   the frontier and is refetched, every other URL stays deduped, and
   links discovered on the refetched pages are crawled if new. This is
   where the deletable cuckoo seen tier (CrawlConfig(
   seen_filter="cuckoo"), operators/cuckoo.py) earns its keep: the
   resume rebuilds the approximate tier from the post-eviction seen
   set, so an evicted URL is never wrongly short-circuited.

Scale: history is url-keyed and append-only (10^10 rows partition by
run_epoch; the schedule window partitions by url — the natural key);
``due_start_requests`` collects only the LIMITED, ranked due set (a
wave-sized list, same contract as seeds), never the schedule itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_core_spark.functions.hashing import h64_col
from spider_core_spark.plans.demo_queries import RECRAWL_MAX_S, RECRAWL_MIN_S

HISTORY_SCHEMA = "url string, run_epoch long, content_fp long"


def append_fetch_history(
    items: DataFrame, run_epoch: int, history_dir: str
) -> None:
    """One observation per fetched URL for this run (append-only)."""
    (
        items.select(
            "url",
            F.lit(int(run_epoch)).cast("long").alias("run_epoch"),
            h64_col(F.coalesce(F.col("text"), F.lit(""))).alias("content_fp"),
        )
        .dropDuplicates(["url"])
        .write.mode("append")
        .partitionBy("run_epoch")
        .parquet(history_dir)
    )


def recrawl_schedule(history: DataFrame) -> DataFrame:
    """Per-URL revisit schedule from the observation history (>= 1 run).

    Integer-only: change counting, span division, clamping and the next
    epoch are all int64 — the policy is deterministic and matches the
    f5 oracle arithmetic. URLs seen once get the max interval (no
    change signal yet)."""
    w = Window.partitionBy("url").orderBy("run_epoch")
    marked = history.withColumn(
        "changed",
        (F.col("content_fp") != F.lag("content_fp").over(w)).cast("int"),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(F.coalesce(F.col("changed"), F.lit(0)))
        .cast("long")
        .alias("n_changes"),
        (F.max("run_epoch") - F.min("run_epoch")).cast("long").alias("span_s"),
        F.max("run_epoch").cast("long").alias("last_epoch"),
    )
    interval = F.greatest(
        F.lit(RECRAWL_MIN_S),
        F.least(
            F.lit(RECRAWL_MAX_S),
            F.when(F.col("n_obs") > 1, F.expr("span_s div (n_changes + 1)"))
            .otherwise(F.lit(RECRAWL_MAX_S)),
        ),
    ).cast("long")
    return agg.select(
        "url",
        "n_obs",
        "n_changes",
        "span_s",
        interval.alias("next_interval_s"),
        (F.col("last_epoch") + interval).cast("long").alias("next_fetch_epoch"),
    )


def due_start_requests(
    schedule: DataFrame, now_epoch: int, limit: int = 100_000
) -> list[dict]:
    """Due rows as Spider.start_requests dicts, stalest first.

    priority = rank by (next_fetch_epoch, url) — lower fetches sooner,
    matching the frontier's ordering contract. The driver-side collect
    is bounded by ``limit`` (a wave-sized seed list, the same size
    class the engine already collects for seeds)."""
    due = (
        schedule.filter(F.col("next_fetch_epoch") <= int(now_epoch))
        .orderBy(F.asc("next_fetch_epoch"), F.asc("url"))
        .limit(int(limit))
        .collect()
    )
    return [
        {"url": r["url"], "priority": i, "meta": {"recrawl": "1"}}
        for i, r in enumerate(due)
    ]


def evict_for_recrawl(
    spark,
    workdir: str,
    urls: list[str] | DataFrame,
    canonicalize: bool = False,
) -> int:
    """Tombstone `urls` out of `workdir`'s seen set so a subsequent
    ``run(..., resume=True)`` with ``reseed_on_resume=True`` refetches
    exactly them (module docstring §4).

    Fingerprints are derived through the engine's own seed path
    (frontier_ops.seed_frontier_select — fragment strip, optional
    canonicalize, h-fingerprint), so eviction keys match enqueue keys
    byte-for-byte; pass the same `canonicalize` the crawl config uses.
    The tombstone is written at the manifest's last committed epoch:
    every row marked so far is killed, any later refetch re-add
    (epoch_marked > last_epoch) survives. Raises if the workdir has no
    committed run to evict from."""
    from spider_core_spark.operators import frontier as frontier_ops
    from spider_core_spark.plans.checkpoint import CheckpointStore

    store = CheckpointStore(spark, workdir)
    manifest = store.read_manifest()
    if manifest is None:
        raise ValueError(
            f"no committed crawl manifest under {workdir!r} — "
            "evict_for_recrawl only applies to a finished/checkpointed run"
        )
    if isinstance(urls, DataFrame):
        raw = urls.select(
            "url", F.monotonically_increasing_id().alias("seq")
        )
    else:
        raw = spark.createDataFrame(
            [(u, i) for i, u in enumerate(urls)], "url string, seq long"
        )
    fps = frontier_ops.seed_frontier_select(
        raw, canonicalize=canonicalize
    ).select("fingerprint")
    store.write_seen_eviction(fps, manifest["last_epoch"])
    return (
        spark.read.schema("fingerprint string, evict_epoch int")
        .parquet(store.seen_evict_dir(manifest["last_epoch"]))
        .count()
    )
