"""Structured Streaming variant of the crawl loop (SURVEY.md §2.I).

The reference is a continuous asynchronous stream — records flow through
bounded channels as they arrive (src/crawler/core.rs:169-210). The
epoch-BSP engine (plans/engine.py) replays it at epoch granularity with
exact ordering parity; this variant replays the CONTINUOUS shape instead:

- the frontier is a file-based stream source (`readStream` over the
  frontier directory);
- every micro-batch is a wave: robots filter → fetch join → parse UDF →
  items append → mark seen → dedup discovered links → write them BACK
  into the stream source directory (the scheduler feedback loop,
  src/crawler/response_parser.rs:312);
- `foreachBatch` is the reference's parser/pipeline worker pool;
- termination = no new frontier files and no batch in flight (idle
  detection, src/crawler/core.rs:264-277);
- the streaming checkpointLocation gives at-least-once batch recovery —
  combined with the idempotent enqueue-dedup (candidates are deduped
  against `seen` before being written into the source) the final seen
  set and items match the BSP engine; the crawl ORDER is batch-dependent,
  which mirrors the reference's true async nondeterminism (SURVEY.md
  §3.2).

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
from spider_core_spark.api.spider import Spider
from spider_core_spark.functions import url as urlfn
from spider_core_spark.operators import dedup as dedup_ops
from spider_core_spark.operators import parse as parse_ops
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.sources.fetcher import JoinFetcher

_FCOLS = [f.name for f in schemas.FRONTIER.fields]


class StreamingCrawlEngine:
    def __init__(self, spark: SparkSession, spider: Spider, config: CrawlConfig):
        self.spark = spark
        self.spider = spider
        self.cfg = config

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

    def _read_seen(self) -> DataFrame:
        if os.path.exists(self._seen_dir) and os.listdir(self._seen_dir):
            return self.spark.read.schema(schemas.SEEN).parquet(
                self._seen_dir + "/*"
            )
        return self.spark.createDataFrame([], schemas.SEEN)

    def _emit_frontier(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(self._in_dir, f"gen_{uuid.uuid4().hex}")
        )

    # ----------------------------------------------------------- batches
    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        spark, cfg = self.spark, self.cfg
        if batch.isEmpty():
            return
        self._active = time.monotonic()

        wave = batch
        fetcher = JoinFetcher(self._pages)
        responses, _ = fetcher.fetch(wave, persist=False)
        parse_udf = parse_ops.make_parse_udf(self.spider.parse_frame)
        rs = (
            responses.withColumn("parsed", parse_udf(F.col("url"), F.col("html")))
            .drop("html", "warc_ts", "text")
            .persist()
        )
        ok = rs.filter(F.col("status") <= cfg.success_max_status)

        # items
        items = self.spider.build_items(
            ok.withColumn("wave_rank", F.lit(0)), epoch=batch_id
        )
        items.write.mode("append").parquet(self._items_dir)

        # mark seen
        new_seen = ok.select(
            "fingerprint",
            F.lit(batch_id).cast("int").alias("epoch_marked"),
            dedup_ops.shard_col(F.col("fingerprint"), cfg.n_shards).alias("shard"),
        )
        new_seen.write.mode("overwrite").parquet(
            os.path.join(self._seen_dir, f"b_{batch_id}_{uuid.uuid4().hex}")
        )

        # discovered links → enqueue-dedup → feed back into the stream
        seen = self._read_seen()
        cands = parse_ops.link_candidates(
            ok.withColumn("wave_rank", F.monotonically_increasing_id()),
            epoch=batch_id,
        )
        if cfg.max_depth is not None:
            cands = cands.filter(F.col("depth") <= cfg.max_depth)
        fresh = cands.join(seen.select("fingerprint"), "fingerprint", "left_anti")
        fresh = fresh.dropDuplicates(["fingerprint"])
        n_new = fresh.count()
        if n_new > 0:
            self._emit_frontier(fresh.select(*_FCOLS))
            self._active = time.monotonic()
        rs.unpersist()

    # --------------------------------------------------------------- run
    def run(self, pages: DataFrame, idle_timeout_s: float = 20.0) -> dict:
        spark, cfg = self.spark, self.cfg
        os.makedirs(self._in_dir, exist_ok=True)
        self._pages = pages
        self._active = time.monotonic()

        # seed injection (same normalization as the BSP engine)
        rows = [(u, i) for i, u in enumerate(self.spider.start_urls)]
        seeds = urlfn.with_url_columns(
            spark.createDataFrame(rows, "url string, seq long")
        ).select(
            "url", "fingerprint", "host", "host_hash",
            F.lit(0).cast("int").alias("depth"),
            F.lit(0).cast("int").alias("priority"),
            F.col("seq"),
            F.lit(0).cast("int").alias("retry_count"),
            F.lit(0).cast("int").alias("not_before_epoch"),
            F.lit("pending").alias("state"),
            F.lit(0).cast("int").alias("epoch_added"),
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
                if time.monotonic() - self._active > idle_timeout_s:
                    break
                if query.exception() is not None:
                    raise query.exception()
        finally:
            query.stop()

        seen = self._read_seen()
        items = (
            spark.read.schema(schemas.ITEMS).parquet(self._items_dir)
            if os.path.exists(self._items_dir)
            else spark.createDataFrame([], schemas.ITEMS)
        )
        return {"seen": seen, "items": items}
