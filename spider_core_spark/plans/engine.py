"""CrawlEngine — the epoch-synchronous crawl loop.

The reference orchestrator wires scheduler → downloader → parser →
item-processor through bounded async channels inside one process
(src/crawler/core.rs:111-368). That topology cannot shard; this engine
replays the same dataflow as a BSP loop over DataFrames, one epoch = one
frontier wave:

  read frontier → select wave (order/robots/politeness/backpressure,
  operators/frontier.py) → request middleware chain → fetch join
  (sources/fetcher.py) → response middleware chain → parse UDF
  (operators/parse.py) → items through pipelines → mark seen →
  dedup discovered links (operators/dedup.py) → append frontier →
  commit epoch snapshot → repeat until the frontier drains
  (idle-detection analog, src/crawler/core.rs:264-277).

Every stage is a DataFrame transform: Catalyst prunes the pages scan to
the wave's columns, AQE sizes the shuffles, the wave side of the fetch
join broadcasts, and hot-host skew is salted away before the parse UDF.
Driver-side state is O(1): counters and the manifest — frontier and seen
live in tables (10^10-frontier requirement).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api import middleware as mw
from spider_core_spark.api.pipeline import Pipeline, run_pipelines
from spider_core_spark.api.spider import Spider
from spider_core_spark.functions import url as urlfn
from spider_core_spark.operators import dedup as dedup_ops
from spider_core_spark.operators import frontier as frontier_ops
from spider_core_spark.operators import parse as parse_ops
from spider_core_spark.plans.checkpoint import CheckpointStore
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.sources.fetcher import JoinFetcher, salt_repartition

_FCOLS = [f.name for f in schemas.FRONTIER.fields]


@dataclass
class CrawlResult:
    workdir: str
    epochs_run: int
    totals: dict
    wall_s: float
    store: CheckpointStore = None

    def items(self) -> DataFrame | None:
        return self.store.read_all("items", schemas.ITEMS)

    def metrics(self) -> DataFrame | None:
        return self.store.read_all("metrics", schemas.METRICS)

    def order(self) -> DataFrame | None:
        return self.store.read_all("order")

    def seen(self) -> DataFrame:
        return self.store.read_seen(self.epochs_run + 10)


@dataclass
class CrawlEngine:
    spark: SparkSession
    spider: Spider
    config: CrawlConfig = field(default_factory=CrawlConfig)
    middlewares: list = field(default_factory=list)
    pipelines: list[Pipeline] = field(default_factory=list)

    def __post_init__(self):
        cfg = self.config
        if cfg.max_retries > 0:
            # engine-level retry config = an implicit RetryOnStatus
            # middleware (the reference ships retry in spider-middleware,
            # doc example src/builder.rs:25-33)
            self.middlewares = list(self.middlewares) + [
                mw.RetryOnStatus(
                    cfg.retry_statuses, cfg.max_retries, cfg.retry_delay_epochs
                )
            ]

    # ------------------------------------------------------------ seeding
    def _seed_frontier(self) -> DataFrame:
        """F0 seed injection (src/crawler/core.rs:378-405): list order →
        seq, fragment stripped before enqueue (:391), intra-batch dedup."""
        rows = [(u, i) for i, u in enumerate(self.spider.start_urls)]
        seeds = self.spark.createDataFrame(rows, "url string, seq long")
        df = urlfn.with_url_columns(seeds).select(
            "url",
            "fingerprint",
            "host",
            "host_hash",
            F.lit(0).cast("int").alias("depth"),
            F.lit(0).cast("int").alias("priority"),
            F.col("seq"),
            F.lit(0).cast("int").alias("retry_count"),
            F.lit(0).cast("int").alias("not_before_epoch"),
            F.lit("pending").alias("state"),
            F.lit(0).cast("int").alias("epoch_added"),
        )
        w = Window.partitionBy("fingerprint").orderBy("seq")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .drop("_rn")
        )

    def _retry_rows(self, tagged: DataFrame, epoch: int) -> DataFrame:
        """Retry action → frontier rows: retry_count+1, eligible again at
        epoch+1+delay; original seq kept (deterministic re-queue position,
        mirrored by the simulator)."""
        return tagged.filter(F.col(mw.ACTION) == mw.RETRY).select(
            "url",
            "fingerprint",
            "host",
            "host_hash",
            "depth",
            "priority",
            "seq",
            (F.col("retry_count") + 1).cast("int").alias("retry_count"),
            (F.lit(epoch + 1) + F.col(mw.RETRY_DELAY)).cast("int").alias(
                "not_before_epoch"
            ),
            F.lit("pending").alias("state"),
            F.lit(epoch + 1).cast("int").alias("epoch_added"),
        )

    # ------------------------------------------------------------ main loop
    def run(
        self,
        pages: DataFrame,
        robots: DataFrame | None = None,
        resume: bool = False,
    ) -> CrawlResult:
        spark, cfg = self.spark, self.config
        store = CheckpointStore(spark, cfg.workdir)
        fetcher = JoinFetcher(pages)
        par = max(spark.sparkContext.defaultParallelism, 2)
        t_run0 = time.monotonic()

        totals = {
            "requests_enqueued": 0,
            "requests_sent": 0,
            "requests_succeeded": 0,
            "requests_failed": 0,
            "requests_retried": 0,
            "requests_dropped": 0,
            "responses_received": 0,
            "responses_from_cache": 0,
            "bytes_downloaded": 0,
            "items_scraped": 0,
            "items_processed": 0,
            "items_dropped": 0,
            "urls_deduped": 0,
        }

        manifest = store.read_manifest() if resume else None
        if manifest is not None:
            epoch0 = manifest["last_epoch"] + 1
            frontier = spark.read.schema(schemas.FRONTIER).parquet(
                store.frontier_dir(manifest["last_epoch"])
            )
            totals.update(manifest.get("totals", {}))
            for p in self.pipelines:
                st = manifest.get("pipeline_states", {}).get(p.name)
                if st is not None:
                    p.restore_state(st)
        else:
            store.reset()
            epoch0 = 0
            frontier = store.write_frontier(self._seed_frontier(), -1)
            totals["requests_enqueued"] += frontier.count()

        epoch = epoch0
        last_epoch_done = epoch0 - 1
        while epoch < cfg.max_epochs:
            t0 = time.monotonic()
            seen = store.read_seen(epoch - 1)
            blooms = (
                dedup_ops.build_bloom_shards(
                    seen, cfg.n_shards, cfg.bloom_bits, cfg.bloom_hashes
                )
                if cfg.use_bloom
                else None
            )

            sel = frontier_ops.select_wave(frontier, seen, robots, epoch, cfg, blooms)
            wave = sel.wave.persist()
            n_wave = wave.count()
            totals["urls_deduped"] += sel.seen_skipped + sel.dup_collapsed
            totals["requests_dropped"] += sel.robots_dropped

            if n_wave == 0:
                leftover = sel.leftover.persist()
                if leftover.count() == 0:
                    break  # idle: frontier drained (core.rs:264-277 analog)
                nb = leftover.agg(F.min("not_before_epoch")).collect()[0][0]
                if nb is None or nb <= epoch:
                    break  # nothing can ever become eligible (maxed depth)
                frontier = leftover
                epoch = nb  # jump over empty retry-delay epochs
                continue

            # ---- request middleware chain (forward order)
            rq = mw.run_request_chain(wave, self.middlewares).persist()
            req_counts = rq.groupBy(mw.ACTION).count().collect()
            rqc = {r[mw.ACTION]: r["count"] for r in req_counts}
            req_retries = self._retry_rows(rq, epoch)
            to_fetch = rq.filter(F.col(mw.ACTION) == mw.CONTINUE).drop(
                mw.ACTION, mw.RETRY_DELAY
            )

            # ---- fetch join (wave broadcast against the pages table)
            responses, misses = fetcher.fetch(to_fetch)

            # ---- response middleware chain (REVERSED order)
            rs = mw.run_response_chain(responses, self.middlewares).persist()
            resp_retries = self._retry_rows(rs, epoch)
            cont = rs.filter(F.col(mw.ACTION).isin(mw.CONTINUE, mw.SERVE))
            ok = cont.filter(F.col("status") <= cfg.success_max_status)
            bad = cont.filter(F.col("status") > cfg.success_max_status)

            # one aggregation pass for the fetch-stage counters (A1/A2)
            st = rs.agg(
                F.count("*").alias("received"),
                F.coalesce(F.sum("fetch_bytes"), F.lit(0)).alias("bytes"),
                F.coalesce(
                    F.sum(F.when(F.col("cached"), 1).otherwise(0)), F.lit(0)
                ).alias("cached"),
                F.coalesce(
                    F.sum(F.when(F.col(mw.ACTION) == mw.DROP, 1).otherwise(0)),
                    F.lit(0),
                ).alias("resp_dropped"),
                F.coalesce(
                    F.sum(F.when(F.col(mw.ACTION) == mw.RETRY, 1).otherwise(0)),
                    F.lit(0),
                ).alias("resp_retried"),
            ).collect()[0]
            n_miss = misses.count()
            n_ok = ok.count()

            # ---- parse (salted against hot-host skew, then Arrow UDF)
            t_parse0 = time.monotonic()
            ok_salted = salt_repartition(ok, par, cfg.skew_salt)
            parsed = parse_ops.apply_parse(
                ok_salted, self.spider.parse_frame
            ).persist()
            items = self.spider.build_items(parsed, epoch)
            items_out, items_dropped = run_pipelines(items, self.pipelines, epoch)
            n_items = items_out.count()
            store.append_epoch(items_out, "items", epoch)
            parse_ms = (time.monotonic() - t_parse0) * 1000

            # ---- mark visited AFTER success (request_handler.rs:352-362)
            new_seen = ok.select(
                "fingerprint",
                F.lit(epoch).cast("int").alias("epoch_marked"),
                dedup_ops.shard_col(F.col("fingerprint"), cfg.n_shards).alias(
                    "shard"
                ),
            )
            store.write_seen_delta(new_seen, epoch)
            new_seen_disk = spark.read.schema(schemas.SEEN).parquet(
                store.seen_dir(epoch)
            )

            # ---- discovered links → candidates → dedup → enqueue
            cands = parse_ops.link_candidates(parsed, epoch)
            # two-tier dedup: (bloom + exact) vs old seen, then exact vs the
            # epoch's fresh marks (small side broadcast — blooms are stale
            # for this epoch's own fetches)
            cands = dedup_ops.dedup_against_seen(
                cands,
                seen,
                use_bloom=cfg.use_bloom,
                blooms=blooms,
                n_shards=cfg.n_shards,
                n_bits=cfg.bloom_bits,
                n_hashes=cfg.bloom_hashes,
            ).join(
                F.broadcast(new_seen_disk.select("fingerprint")),
                "fingerprint",
                "left_anti",
            )
            # intra-batch dedup: keep first by (priority, seq) — the
            # reference enqueues the first emission, later ones hit the
            # seen/pending checks
            wdup = Window.partitionBy("fingerprint").orderBy("priority", "seq")
            cands = (
                cands.withColumn("_rn", F.row_number().over(wdup))
                .filter("_rn = 1")
                .drop("_rn")
            )

            frontier_next = (
                sel.leftover.select(*_FCOLS)
                .unionByName(cands.select(*_FCOLS))
                .unionByName(req_retries.select(*_FCOLS))
                .unionByName(resp_retries.select(*_FCOLS))
            )
            # commit: frontier snapshot every epoch — it is both the resume
            # point and the lineage break (iterative plans otherwise grow)
            n_leftover = sel.leftover.count()
            frontier = store.write_frontier(frontier_next, epoch)
            n_frontier = frontier.count()  # cheap: parquet count
            n_enq = n_frontier - n_leftover  # newly enqueued this epoch

            # ---- order log (golden crawl-order parity artifact)
            store.append_epoch(
                wave.select(
                    "url",
                    "wave_rank",
                    "host",
                    "depth",
                    F.lit(epoch).cast("int").alias("epoch"),
                ),
                "order",
                epoch,
            )

            # ---- metrics (A1-A8): per-partition fetch lineage + epoch row
            wall_ms = int((time.monotonic() - t0) * 1000)
            n_retried = int(rqc.get(mw.RETRY, 0)) + int(st["resp_retried"])
            n_dropped = int(rqc.get(mw.DROP, 0)) + int(st["resp_dropped"])
            # failed = fetch misses + bad-status responses that the
            # middleware chain neither retried nor dropped
            n_bad = (
                int(st["received"]) - n_ok - int(st["resp_dropped"]) - int(st["resp_retried"])
            )
            totals["requests_sent"] += int(rqc.get(mw.CONTINUE, 0))
            totals["requests_succeeded"] += n_ok
            totals["requests_failed"] += n_miss + n_bad
            totals["requests_retried"] += n_retried
            totals["requests_dropped"] += n_dropped
            totals["responses_received"] += int(st["received"])
            totals["responses_from_cache"] += int(st["cached"])
            totals["bytes_downloaded"] += int(st["bytes"])
            totals["items_scraped"] += n_ok  # once per parse output (§3.3)
            totals["items_processed"] += n_items
            totals["items_dropped"] += items_dropped
            totals["requests_enqueued"] += n_enq

            per_part = (
                rs.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(
                    F.count("*").alias("responses_received"),
                    F.coalesce(F.sum("fetch_bytes"), F.lit(0)).alias(
                        "bytes_downloaded"
                    ),
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("status") <= cfg.success_max_status, 1
                            ).otherwise(0)
                        ),
                        F.lit(0),
                    ).alias("requests_succeeded"),
                )
                .withColumn("epoch", F.lit(epoch).cast("int"))
            )
            epoch_row = spark.createDataFrame(
                [
                    {
                        "epoch": epoch,
                        "partition_id": None,
                        "requests_enqueued": n_enq,
                        "requests_sent": int(rqc.get(mw.CONTINUE, 0)),
                        "requests_succeeded": n_ok,
                        "requests_failed": n_miss + n_bad,
                        "requests_retried": n_retried,
                        "requests_dropped": n_dropped + sel.robots_dropped,
                        "responses_received": int(st["received"]),
                        "responses_from_cache": int(st["cached"]),
                        "bytes_downloaded": int(st["bytes"]),
                        "items_scraped": n_ok,
                        "items_processed": n_items,
                        "items_dropped": items_dropped,
                        "fetch_ms_avg": None,
                        "parse_ms_avg": parse_ms / max(n_ok, 1),
                        "wall_ms": wall_ms,
                    }
                ],
                schemas.METRICS,
            )
            metrics_df = epoch_row.unionByName(
                per_part, allowMissingColumns=True
            ).select([F.col(f.name).cast(f.dataType) for f in schemas.METRICS.fields])
            store.append_epoch(metrics_df, "metrics", epoch)

            # manifest commit = the epoch becomes the resume point
            store.write_manifest(
                    {
                        "last_epoch": epoch,
                        "totals": totals,
                        "pipeline_states": {
                            p.name: p.get_state()
                            for p in self.pipelines
                            if p.get_state() is not None
                        },
                        "config": {"max_epochs": cfg.max_epochs},
                    }
                )
            last_epoch_done = epoch
            for df in (wave, rq, responses, rs, parsed):
                df.unpersist()
            epoch += 1

        for p in self.pipelines:
            p.close()
        wall = time.monotonic() - t_run0
        res = CrawlResult(
            workdir=cfg.workdir,
            epochs_run=last_epoch_done + 1,
            totals=totals,
            wall_s=wall,
            store=store,
        )
        return res
