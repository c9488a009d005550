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
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field, replace as dc_replace

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from spider_core_spark import schemas
from spider_core_spark.api import middleware as mw
from spider_core_spark.api.pipeline import Pipeline, run_pipelines
from spider_core_spark.api.spider import Spider
from spider_core_spark.errors import SpiderError
from spider_core_spark.functions import url as urlfn
from spider_core_spark.operators import cuckoo as cuckoo_ops
from spider_core_spark.operators import dedup as dedup_ops
from spider_core_spark.operators import frontier as frontier_ops
from spider_core_spark.operators import parse as parse_ops
from spider_core_spark.operators import quota as quota_ops
from spider_core_spark.operators import rank as rk
from spider_core_spark.plans.checkpoint import CheckpointStore
from spider_core_spark.plans.config import CrawlConfig
from spider_core_spark.sources.fetcher import JoinFetcher, salt_repartition

_FCOLS = [f.name for f in schemas.FRONTIER.fields]
# adaptive-budget table: budget + the per-host response-time EMA feeding
# the AdaptiveSemaphore time term (ema_ms null = no time signal yet;
# round-2 checkpoints lack the column and read as null — compatible)
_BUDGET_SCHEMA = "host string, budget int, ema_ms double"


@dataclass
class CrawlResult:
    workdir: str
    epochs_run: int
    totals: dict
    wall_s: float
    store: CheckpointStore = None
    pipeline_stats: dict = field(default_factory=dict)

    def items(self) -> DataFrame | None:
        return self.store.read_all("items", schemas.ITEMS)

    def metrics(self) -> DataFrame | None:
        return self.store.read_all("metrics", schemas.METRICS)

    def status_counts(self) -> DataFrame | None:
        return self.store.read_all("status", schemas.STATUS_COUNTS)

    def order(self) -> DataFrame | None:
        return self.store.read_all("order")

    def seen(self) -> DataFrame:
        return self.store.read_seen(self.epochs_run + 10)

    # ---- SNK3 stats report (reference src/stats.rs:470-585, printed at
    # crawl end src/crawler/core.rs:364-366)
    def snapshot(self) -> dict:
        from spider_core_spark.plans import report as rpt

        status: dict[int, int] = {}
        sdf = self.status_counts()
        if sdf is not None:
            for r in sdf.groupBy("status").agg(F.sum("n").alias("n")).collect():
                if r["status"] is not None:
                    status[int(r["status"])] = int(r["n"])

        timing: dict = {}
        epoch_rates: dict[str, list[float]] = {}
        mdf = self.metrics()
        if mdf is not None:
            rows = (
                mdf.filter(F.col("partition_id").isNull())
                .orderBy("epoch")
                .collect()
            )
            if rows:
                n_resp = sum(r["responses_received"] or 0 for r in rows)

                def _t(prefix: str) -> dict:
                    mins = [r[f"{prefix}_ms_min"] for r in rows
                            if r[f"{prefix}_ms_min"] is not None]
                    maxs = [r[f"{prefix}_ms_max"] for r in rows
                            if r[f"{prefix}_ms_max"] is not None]
                    wsum = sum(
                        (r[f"{prefix}_ms_avg"] or 0.0)
                        * (r["responses_received"] or 0)
                        for r in rows
                    )
                    return {
                        "avg": wsum / n_resp if n_resp else None,
                        "min": min(mins) if mins else None,
                        "max": max(maxs) if maxs else None,
                        "count": n_resp,
                    }

                timing = {"fetch": _t("fetch"), "parse": _t("parse")}
                for key in ("requests_sent", "responses_received",
                            "items_scraped"):
                    epoch_rates[key] = [
                        (r[key] or 0) / max((r["wall_ms"] or 0) / 1000.0, 1e-9)
                        for r in rows
                    ]
        return rpt.build_snapshot(
            self.totals,
            self.wall_s,
            status_counts=status,
            timing=timing,
            epoch_rates=epoch_rates,
            pipeline_stats=self.pipeline_stats,
        )

    def report_json(self) -> str:
        from spider_core_spark.plans import report as rpt

        return rpt.to_json(self.snapshot())

    def report_markdown(self) -> str:
        from spider_core_spark.plans import report as rpt

        return rpt.to_markdown(self.snapshot())

    def report_display(self) -> str:
        from spider_core_spark.plans import report as rpt

        return rpt.to_display(self.snapshot())


@dataclass
class CrawlEngine:
    spark: SparkSession
    spider: Spider
    config: CrawlConfig = field(default_factory=CrawlConfig)
    middlewares: list = field(default_factory=list)
    pipelines: list[Pipeline] = field(default_factory=list)
    # opaque per-run fetcher state checkpointed in the manifest (the
    # reference's feature-gated cookie_store, src/checkpoint.rs:88-91)
    cookie_store: dict | None = None
    # pluggable Downloader (reference trait, src/lib.rs:51): None = the
    # default JoinFetcher over the pages table; pass
    # HttpFetcher(transport_factory=...) for a live transport — any object
    # with .fetch(wave, broadcast_wave=, persist=) -> (responses, misses)
    fetcher: object | None = None

    def request_stop(self) -> None:
        """Graceful shutdown (reference Ctrl-C path,
        src/crawler/core.rs:260-263): finish the current epoch, commit it,
        write the final checkpoint, stop. Safe to call from a signal
        handler or another thread."""
        self._stop_requested = True

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
    def _seed_frontier(self, seeds_df: DataFrame | None = None) -> DataFrame:
        """F0 seed injection (src/crawler/core.rs:378-405): list order →
        seq, fragment stripped before enqueue (:391), intra-batch dedup.
        Accepts a (url, seq) DataFrame for large seed lists — at a 10^10
        frontier the seed list is itself a table, never a driver list.
        Spider.start_requests (src/spider.rs:112-121) supplies full seed
        Requests with per-seed priority/depth/not_before_epoch/meta; all
        paths normalize through the same with_url_columns
        (frontier_ops.seed_frontier_select, shared with the streaming
        engine)."""
        if seeds_df is not None:
            seeds = seeds_df
        else:
            seeds = frontier_ops.raw_seed_frame(self.spark, self.spider)
        df = frontier_ops.seed_frontier_select(
            seeds, canonicalize=self.config.canonicalize_urls
        )
        if self.config.validate_seeds:
            # S1 (src/spider.rs:118-120): a seed that yields no parseable
            # host is an error, not a silent drop
            bad = df.filter(F.col("host") == "unknown")
            bad_rows = bad.select("url").limit(5).collect()
            if bad_rows:
                raise SpiderError(
                    "unparseable seed URL(s): "
                    + ", ".join(r["url"] for r in bad_rows)
                )
        if self.config.seeds_pre_deduped:
            return df
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
            # meta survives retry re-queues (request-chain retries read it
            # off the wave; response-chain retries off the carried columns)
            (
                F.col("meta")
                if "meta" in tagged.columns
                else F.lit(None).cast("map<string,string>")
            ).alias("meta"),
        )

    # ------------------------------------------------------------ main loop
    def run(
        self,
        pages: DataFrame,
        robots: DataFrame | None = None,
        resume: bool = False,
        seeds_df: DataFrame | None = None,
    ) -> CrawlResult:
        spark, cfg = self.spark, self.config
        # adaptive_wave can double the effective wave (permits up to
        # 2×permits0) — validate against the DOUBLED cap
        wave_ceiling = cfg.max_wave_size * (2 if cfg.adaptive_wave else 1)
        if wave_ceiling > frontier_ops.MAX_PARENT_RANK:
            raise ValueError(
                f"max wave size {wave_ceiling} exceeds the seq "
                f"packing's parent-rank capacity {frontier_ops.MAX_PARENT_RANK}"
                " (operators/frontier.py seq layout)"
            )
        # Bloom sizing: derive bits from target FPR at expected cardinality
        # when configured; ALWAYS check the broadcast budget — a silently
        # undersized Bloom degrades to all-maybe, an oversized one OOMs the
        # executors, and both should fail loudly at startup instead
        bloom_bits = cfg.bloom_bits
        cuckoo_nb = 0
        if cfg.use_bloom and cfg.seen_filter == "cuckoo":
            # deletable cuckoo tier (operators/cuckoo.py): size buckets per
            # shard at 0.8 load headroom (the filter REFUSES past ~0.95)
            if cfg.cuckoo_buckets is not None:
                cuckoo_nb = cfg.cuckoo_buckets
            elif cfg.bloom_expected_seen:
                cuckoo_nb = cuckoo_ops.buckets_for(
                    cfg.bloom_expected_seen, cfg.n_shards, load=0.8
                )
            else:
                cuckoo_nb = 1 << 16
            if cuckoo_nb & (cuckoo_nb - 1):
                raise ValueError(
                    f"cuckoo_buckets must be a power of 2, got {cuckoo_nb}"
                )
            total_mb = cfg.n_shards * cuckoo_nb * cuckoo_ops.SLOTS * 2 / 1e6
            if total_mb > cfg.bloom_broadcast_budget_mb:
                raise ValueError(
                    f"Cuckoo shards need {total_mb:.0f} MB "
                    f"({cfg.n_shards} shards x {cuckoo_nb} buckets x "
                    f"{cuckoo_ops.SLOTS} slots) — over the "
                    f"{cfg.bloom_broadcast_budget_mb} MB broadcast budget. "
                    "Raise bloom_broadcast_budget_mb, lower cuckoo_buckets, "
                    "or set use_bloom=False (the exact anti-join tier alone "
                    "is still correct)."
                )
        elif cfg.use_bloom:
            if cfg.bloom_target_fpr is not None and cfg.bloom_expected_seen:
                bloom_bits = dedup_ops.bloom_bits_for(
                    -(-cfg.bloom_expected_seen // cfg.n_shards),
                    cfg.bloom_target_fpr,
                    cfg.bloom_hashes,
                )
            total_mb = cfg.n_shards * bloom_bits / 8 / 1e6
            if total_mb > cfg.bloom_broadcast_budget_mb:
                raise ValueError(
                    f"Bloom shards need {total_mb:.0f} MB "
                    f"({cfg.n_shards} shards x {bloom_bits} bits) — over the "
                    f"{cfg.bloom_broadcast_budget_mb} MB broadcast budget. "
                    "Raise bloom_broadcast_budget_mb, relax bloom_target_fpr, "
                    "or set use_bloom=False (the exact anti-join tier alone "
                    "is still correct; see BASELINE.md sizing table)."
                )
        store = CheckpointStore(spark, cfg.workdir)
        fetcher = self.fetcher or JoinFetcher(
            pages, cfg.extra.get("response_persist", "MEMORY_AND_DISK")
        )
        # Request-side SERVE rows must NEVER reach a live transport (the
        # ServeFromCacheRequest contract: "requests matching the predicate
        # are not sent", reference request_handler.rs:224-251). With the
        # default JoinFetcher the fetch join IS the cache lookup, so SERVE
        # rows may ride it; with a custom fetcher (e.g. HttpFetcher) they
        # are split out pre-fetch and resolved against the pages/cache
        # table by this dedicated JoinFetcher instead.
        serve_fetcher = (
            JoinFetcher(pages, "MEMORY_AND_DISK")
            if self.fetcher is not None
            else None
        )
        par = max(spark.sparkContext.defaultParallelism, 2)
        t_run0 = time.monotonic()
        profile = bool(cfg.extra.get("profile"))
        stage_s: dict[str, float] = {}

        class _T:
            def __init__(self, name):
                self.name = name

            def __enter__(self):
                self.t = time.monotonic()

            def __exit__(self, *a):
                stage_s[self.name] = stage_s.get(self.name, 0.0) + (
                    time.monotonic() - self.t
                )

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
            "requests_redirected": 0,
        }

        pipeline_totals: dict[str, dict] = {}
        manifest = store.read_manifest() if resume else None
        if manifest is not None:
            epoch0 = manifest["last_epoch"] + 1
            frontier = spark.read.schema(schemas.FRONTIER).parquet(
                store.frontier_dir(manifest["last_epoch"])
            )
            # merge salvaged rows from a crashed post-manifest epoch
            # (pending = queue ∪ salvaged, src/scheduler.rs:102); keeper on
            # fingerprint collision = lowest (seq, state) — 'pending' wins
            # ties so a snapshot row beats its salvaged twin
            salv = store.read_salvage_after(manifest["last_epoch"])
            if salv is not None:
                wsalv = Window.partitionBy("fingerprint").orderBy("seq", "state")
                frontier = (
                    frontier.unionByName(salv)
                    .withColumn("_rn", F.row_number().over(wsalv))
                    .filter("_rn = 1")
                    .drop("_rn")
                )
            totals.update(manifest.get("totals", {}))
            pipeline_totals.update(manifest.get("pipeline_totals", {}))
            # cookie-store slot (reference checkpoint field,
            # src/checkpoint.rs:88-91, feature-gated there): an opaque
            # JSON blob a fetcher may stash per run; round-trips resume
            self.cookie_store = manifest.get("cookie_store", self.cookie_store)
            for p in self.pipelines:
                st = manifest.get("pipeline_states", {}).get(p.name)
                if st is not None:
                    p.restore_state(st)
        else:
            store.reset()
            epoch0 = 0
            frontier = store.write_frontier(self._seed_frontier(seeds_df), -1)
            if cfg.detailed_metrics:
                totals["requests_enqueued"] += frontier.count()

        # seen-set size tracker: lets epoch 0 (and resumes) skip the seen
        # joins; the Bloom shards below are maintained INCREMENTALLY (OR-in
        # each epoch's new fingerprints) instead of rebuilt from the full
        # seen table — the distributed analog of the reference's batched
        # write-behind Bloom updates (src/scheduler.rs:529-551)
        # `blooms` holds the approximate seen tier's shard state: Bloom
        # bitsets or cuckoo tag tables, per cfg.seen_filter
        if manifest is not None:
            seen0 = store.read_seen(epoch0 - 1)
            n_seen = seen0.count()
            if not cfg.use_bloom:
                blooms = None
            elif cfg.seen_filter == "cuckoo":
                blooms = cuckoo_ops.build_cuckoo_shards(
                    seen0, cfg.n_shards, cuckoo_nb
                )
            else:
                blooms = dedup_ops.build_bloom_shards(
                    seen0, cfg.n_shards, bloom_bits, cfg.bloom_hashes
                )
        else:
            n_seen = 0
            blooms = {} if cfg.use_bloom else None

        if manifest is not None and cfg.reseed_on_resume:
            # in-place recrawl (plans/recrawl.py): re-inject seeds /
            # start_requests into the restored frontier. Anti-join against
            # the (tombstone-filtered) seen set and the pending frontier,
            # so exactly the never-seen-or-EVICTED subset re-enters;
            # epoch_added rewritten to this resume's first epoch for
            # honest lineage. With seen_filter="cuckoo" the approximate
            # tier above was rebuilt from the post-eviction seen set, so
            # the evicted fingerprints are genuinely absent from the
            # filter too (the deletable-tier property Bloom lacks —
            # Bloom's rebuild-from-seen achieves the same here, at full-
            # scan cost; see operators/cuckoo.py module docstring).
            reseed = (
                self._seed_frontier(seeds_df)
                .withColumn("epoch_added", F.lit(epoch0).cast("int"))
                .join(seen0.select("fingerprint"), "fingerprint", "left_anti")
                .join(
                    frontier.select("fingerprint"), "fingerprint", "left_anti"
                )
            )
            frontier = frontier.unionByName(reseed)
            if cfg.detailed_metrics:
                totals["requests_enqueued"] += reseed.count()

        detail = cfg.detailed_metrics

        # adaptive per-host budgets (A8 feedback): (host, budget) table,
        # persisted per epoch, resumable. None until the first epoch writes.
        def _budgets_dir(e: int) -> str:
            return f"{cfg.workdir}/budgets/epoch={e}"

        budgets = None
        if cfg.adaptive_budget:
            import os as _os

            for e in range(epoch0 - 1, -1, -1):
                if _os.path.exists(_budgets_dir(e)):
                    budgets = spark.read.schema(_BUDGET_SCHEMA).parquet(
                        _budgets_dir(e)
                    )
                    break
        # per-host byte quotas (ResourceQuotaManager analog,
        # src/concurrency.rs:142-236): cumulative usage table, resumable
        def _usage_dir(e: int) -> str:
            return f"{cfg.workdir}/usage/epoch={e}"

        usage = None
        if cfg.host_bytes_quota is not None:
            import os as _os

            for e in range(epoch0 - 1, -1, -1):
                if _os.path.exists(_usage_dir(e)):
                    usage = spark.read.schema("host string, bytes long").parquet(
                        _usage_dir(e)
                    )
                    break

        def _effective_budgets():
            """adaptive budgets ∩ quota zeros, merged by least()."""
            parts = []
            if budgets is not None:
                parts.append(budgets)
            if usage is not None and cfg.host_bytes_quota is not None:
                parts.append(
                    quota_ops.over_quota_hosts(usage, cfg.host_bytes_quota)
                )
            if not parts:
                return None
            merged = parts[0]
            for p_ in parts[1:]:
                merged = merged.unionByName(p_)
            return merged.groupBy("host").agg(F.min("budget").alias("budget"))

        # one worker per concurrent commit artifact (frontier, seen, order,
        # status, metrics, budgets, usage) — a smaller pool serializes the
        # tail commits and shows up directly in epoch wall time
        pool = ThreadPoolExecutor(max_workers=8)
        epoch = epoch0
        last_epoch_done = epoch0 - 1
        jump_cached = None  # leftover cache from an empty-wave epoch jump
        last_manifest: dict | None = None  # pending (uncommitted) manifest
        # global adaptive wave sizing state (reference AdaptiveSemaphore's
        # single permit count + its cross-endpoint EMA; ephemeral like the
        # reference — checkpoints do not capture semaphore state)
        wave_permits = cfg.adaptive_wave_permits
        wave_ema_ms: float | None = None
        while epoch < cfg.max_epochs:
            t0 = time.monotonic()
            with _T("seen_read"):
                seen = store.read_seen(epoch - 1)

            with _T("select_wave"):
                sel_cfg = cfg
                if cfg.adaptive_wave:
                    # effective cap scales with the global permit count
                    eff_wave = max(
                        1,
                        cfg.max_wave_size
                        * wave_permits
                        // cfg.adaptive_wave_permits,
                    )
                    sel_cfg = dc_replace(cfg, max_wave_size=eff_wave)
                sel = frontier_ops.select_wave(
                    frontier, robots, epoch, sel_cfg, detail,
                    _effective_budgets(),
                )
            wave = sel.wave
            n_wave = sel.n_wave
            totals["requests_dropped"] += sel.robots_dropped

            if n_wave == 0:
                leftover = sel.leftover.persist()
                n_left = leftover.count()  # materializes before cache drop
                if sel.cached is not None:
                    sel.cached.unpersist()
                if n_left == 0:
                    leftover.unpersist()
                    break  # idle: frontier drained (core.rs:264-277 analog)
                nb = leftover.agg(F.min("not_before_epoch")).collect()[0][0]
                if nb is None or nb <= epoch:
                    leftover.unpersist()
                    break  # nothing can ever become eligible (maxed depth)
                frontier = leftover
                if jump_cached is not None and jump_cached is not leftover:
                    # consecutive jumps: previous jump's cache is released
                    # once the new leftover is materialized (count above)
                    jump_cached.unpersist()
                jump_cached = leftover  # released after the next commit
                epoch = nb  # jump over empty retry-delay epochs
                continue

            # ---- request middleware chain (forward order); skipped
            # entirely when no middlewares are registered.
            # Request-side SERVE rows are the reference's ReturnResponse
            # (src/crawler/request_handler.rs:224-251): the request is NOT
            # sent (no requests_sent, no bytes_downloaded) but a cached
            # response enters the response chain, counted
            # responses_from_cache + requests_succeeded. Here "the cache"
            # is the same pages table the fetch join resolves against, so
            # SERVE rows ride the join too — tagged so the counters split.
            t_build0 = time.monotonic()
            if self.middlewares:
                rq = mw.run_request_chain(wave, self.middlewares).persist()
                rqc = {
                    r[mw.ACTION]: r["count"]
                    for r in rq.groupBy(mw.ACTION).count().collect()
                }
                req_retries = self._retry_rows(rq, epoch)
                to_fetch = (
                    rq.filter(F.col(mw.ACTION).isin(mw.CONTINUE, mw.SERVE))
                    .withColumn("_req_served", F.col(mw.ACTION) == mw.SERVE)
                    .drop(mw.ACTION, mw.RETRY_DELAY)
                )
            else:
                rq = None
                rqc = {mw.CONTINUE: n_wave}
                req_retries = None
                to_fetch = wave.withColumn("_req_served", F.lit(False))
            n_sent = int(rqc.get(mw.CONTINUE, 0))
            # dispatched = network sends + cache serves; both produce
            # responses, so the miss arithmetic below uses this sum
            n_dispatched = n_sent + int(rqc.get(mw.SERVE, 0))

            # ---- fetch join (wave broadcast against the pages table);
            # misses are counted arithmetically (sent - received), no job
            # slim the broadcast side: fingerprint/host/host_hash are pure
            # functions of url — recompute them JVM-side after the join
            # instead of shipping them in the broadcast (a 300k-row wave
            # drops from ~90 MB to ~35 MB; the broadcast build is serial
            # driver time that the wide level pays proportionally more for)
            slim = to_fetch.select(
                "url", "depth", "priority", "seq", "retry_count",
                "not_before_epoch", "epoch_added", "wave_rank", "_req_served",
                "meta",  # mostly-NULL map (seed rows only) — negligible
                # broadcast weight; keeps meta visible to the response
                # chain and retry re-queues
            )
            if serve_fetcher is not None and int(rqc.get(mw.SERVE, 0)) > 0:
                # custom fetcher + request-side SERVE: served rows resolve
                # from the cache table (never sent to the transport); live
                # rows go to the custom fetcher; union preserves the
                # downstream contract (transport_ms stays NULL for cache
                # serves — a cache hit has no transport exchange)
                live_resp, _misses = fetcher.fetch(
                    slim.filter(~F.col("_req_served")),
                    broadcast_wave=n_wave <= cfg.broadcast_wave_max,
                    persist=False,
                )
                served_resp, _ = serve_fetcher.fetch(
                    slim.filter(F.col("_req_served")),
                    broadcast_wave=True,
                    persist=False,
                )
                responses = live_resp.unionByName(
                    served_resp, allowMissingColumns=True
                )
            else:
                responses, _misses = fetcher.fetch(
                    slim,
                    broadcast_wave=n_wave <= cfg.broadcast_wave_max,
                    persist=False,
                )
            responses = responses.withColumn(
                "fingerprint", urlfn.fingerprint_col(F.col("url"))
            ).withColumn("host", urlfn.host_col(F.col("url"))).withColumn(
                "host_hash", urlfn.host_hash_col(urlfn.host_col(F.col("url")))
            )
            # request-chain SERVE = cache-served: cached response, no bytes
            # on the wire (reference skips add_bytes_downloaded for early
            # returns; zeroing fetch_bytes also keeps cache hits out of the
            # per-host byte quotas)
            responses = (
                responses.withColumn(
                    "cached", F.col("cached") | F.col("_req_served")
                )
                .withColumn(
                    "fetch_bytes",
                    F.when(F.col("_req_served"), F.lit(0))
                    .otherwise(F.col("fetch_bytes"))
                    .cast("long"),
                )
                .drop("_req_served")
            )

            # ---- response middleware chain (REVERSED order)
            if self.middlewares:
                rs0 = mw.run_response_chain(responses, self.middlewares)
            else:
                rs0 = responses.withColumn(mw.ACTION, F.lit(mw.CONTINUE)).withColumn(
                    mw.RETRY_DELAY, F.lit(0)
                )

            # ---- parse fused into the single materialization pass: the
            # Arrow UDF runs while the pages scan streams by, and the ONE
            # cached DataFrame per epoch is SLIM — html is dropped before
            # persist. (A cache that kept html would force every downstream
            # stage — counters, items, candidates, seen marks — to re-read
            # the multi-GB body column: cache reads don't column-prune.)
            # No salt shuffle either: the broadcast fetch join leaves rows
            # in pages-scan partitioning, which is uniform regardless of
            # host skew. cfg.skew_salt remains for spiders that force a
            # repartition (HttpFetcher-style per-host fetch stages).
            t_parse0 = time.monotonic()
            parse_udf = parse_ops.make_parse_udf(self.spider.parse_frame)
            rs = rs0.withColumn(
                "parsed", parse_udf(F.col("url"), F.col("html"))
            ).drop("html", "warc_ts", "text")
            # SERVE-tagged rows are cache-served responses (ReturnResponse
            # analog) — counted responses_from_cache via the fused agg
            if self.middlewares:
                rs = rs.withColumn(
                    "cached", F.col("cached") | (F.col(mw.ACTION) == mw.SERVE)
                )
            # redirect split (cfg.follow_redirects): a 3xx WITH a location
            # is neither success nor failure — its target re-enters the
            # frontier below. Without a location column the flag is a
            # constant false and every plan is unchanged.
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
            # ALL fetch-stage counters (A1/A2) + timing stats (A3/A4) ride
            # the items-write action as an Observation — no dedicated
            # aggregation job per epoch (the observe node fills when the
            # cache first materializes)
            obs = Observation()
            rs = rs.observe(
                obs,
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
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(mw.ACTION).isin(mw.CONTINUE, mw.SERVE)
                            & (F.col("status") <= cfg.success_max_status)
                            & ~F.col("_is_redir"),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("ok"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(mw.ACTION).isin(mw.CONTINUE, mw.SERVE)
                            & F.col("_is_redir"),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("redirects"),
                # A3/A4 real per-URL timing (measured inside the parse UDF;
                # reference src/stats.rs:378-463)
                F.avg("parsed.fetch_ms").alias("fetch_ms_avg"),
                F.min("parsed.fetch_ms").alias("fetch_ms_min"),
                F.max("parsed.fetch_ms").alias("fetch_ms_max"),
                F.avg("parsed.parse_ms").alias("parse_ms_avg"),
                F.min("parsed.parse_ms").alias("parse_ms_min"),
                F.max("parsed.parse_ms").alias("parse_ms_max"),
            ).persist()
            resp_retries = self._retry_rows(rs, epoch) if self.middlewares else None
            cont = rs.filter(F.col(mw.ACTION).isin(mw.CONTINUE, mw.SERVE))
            ok = cont.filter(
                (F.col("status") <= cfg.success_max_status)
                & ~F.col("_is_redir")
            )
            redir = cont.filter(F.col("_is_redir")) if follow_redirects else None
            stage_s["plan_build"] = stage_s.get("plan_build", 0.0) + (
                time.monotonic() - t_build0
            )

            items = self.spider.build_items(ok, epoch)
            if self.pipelines:
                items_out, items_dropped, pstats = run_pipelines(
                    items, self.pipelines, epoch, per_pipeline=detail
                )
                n_items = items_out.count()
                # A7: per-pipeline (total_time, count) accumulation
                # (reference item_processor.rs:32,80-124)
                for pst in pstats:
                    agg = pipeline_totals.setdefault(
                        pst["pipeline"], {"total_ms": 0.0, "items": 0}
                    )
                    agg["total_ms"] += pst["ms"]
                    agg["items"] += pst["n_in"]
            else:
                items_out, items_dropped, n_items = items, 0, None
            with _T("parse_items_write"):
                # first action over rs: materializes the slim cache AND
                # fills the Observation
                store.append_epoch(items_out, "items", epoch)
            if self.pipelines:
                # the last pipeline cache served its write; release it (the
                # epoch's other caches — wave/rq/rs — unpersist at loop end)
                items_out.unpersist()
            parse_ms = (time.monotonic() - t_parse0) * 1000
            with _T("fetch_agg"):
                st = obs.get
            n_miss = n_dispatched - int(st["received"])
            n_ok = int(st["ok"])
            if n_items is None:
                n_items = n_ok
            t_build1 = time.monotonic()

            # ---- mark visited AFTER success (request_handler.rs:352-362);
            # redirect SOURCES are marked too — the fetch happened, and the
            # seen mark is what breaks redirect cycles (a→b→a dies at the
            # enqueue-time dedup of a's second appearance)
            seen_src = (
                ok.select("fingerprint").unionByName(
                    redir.select("fingerprint")
                )
                if redir is not None
                else ok.select("fingerprint")
            )
            new_seen = seen_src.select(
                "fingerprint",
                F.lit(epoch).cast("int").alias("epoch_marked"),
                dedup_ops.shard_col(F.col("fingerprint"), cfg.n_shards).alias(
                    "shard"
                ),
            )

            # ---- discovered links → candidates → enqueue-time dedup against
            # (seen ∪ this epoch's marks ∪ pending frontier ∪ same batch) —
            # see the dedup INVARIANT note in operators/frontier.py. The
            # Bloom shards prefilter the old-seen tier; this epoch's fresh
            # marks and the pending set are exact joins.
            shutdown_epoch = (
                cfg.shutdown_skip_discoveries and epoch == cfg.max_epochs - 1
            )
            if shutdown_epoch:
                # P6 shutdown skip (response_parser.rs:303-310): discovered
                # requests are not enqueued during the shutdown epoch
                cands = spark.createDataFrame([], schemas.FRONTIER)
            else:
                cands = parse_ops.link_candidates(
                    ok,
                    epoch,
                    self.spider.priority_expr,
                    canonicalize=cfg.canonicalize_urls,
                )
                if redir is not None:
                    # redirect targets join the SAME candidate stream —
                    # identical dedup/ordering machinery downstream; the
                    # P6 shutdown skip above applies to them too (a
                    # redirect target is a discovered request)
                    cands = cands.unionByName(
                        parse_ops.redirect_candidates(
                            redir, epoch, canonicalize=cfg.canonicalize_urls
                        )
                    )
            if cfg.max_depth is not None:
                cands = cands.filter(F.col("depth") <= cfg.max_depth)
            retries = [r for r in (req_retries, resp_retries) if r is not None]
            n_cands_raw = cands.count() if detail else 0
            cands = dedup_ops.dedup_against_seen(
                cands,
                seen,
                use_bloom=cfg.use_bloom,
                # below bloom_min_seen the probe stage costs more than the
                # (near-empty) exact anti-join it would prefilter
                blooms=blooms if n_seen >= cfg.bloom_min_seen else None,
                n_shards=cfg.n_shards,
                n_bits=bloom_bits,
                n_hashes=cfg.bloom_hashes,
                filter_kind=cfg.seen_filter,
                cuckoo_buckets=cuckoo_nb,
            ).join(
                F.broadcast(new_seen.select("fingerprint")),
                "fingerprint",
                "left_anti",
            )
            pending_fps = sel.leftover.select("fingerprint")
            for r in retries:
                pending_fps = pending_fps.unionByName(r.select("fingerprint"))
            cands = cands.join(pending_fps, "fingerprint", "left_anti")
            # same-batch dedup: keep first emission by (priority, seq)
            wdup = Window.partitionBy("fingerprint").orderBy("priority", "seq")
            cands = (
                cands.withColumn("_rn", F.row_number().over(wdup))
                .filter("_rn = 1")
                .drop("_rn")
            )

            if cfg.pending_cap is not None:
                # P3 reference drop mode (src/scheduler.rs:144,399-408):
                # enqueues beyond the pending cap are DROPPED with an
                # error, not deferred. Capacity left = cap − (deferred
                # pending + retries); candidates are admitted in
                # (priority, seq) order, the reference's enqueue order.
                n_pending = sel.leftover.count() + sum(
                    r.count() for r in retries
                )
                room = max(cfg.pending_cap - n_pending, 0)
                ranked_c, n_c = rk.with_global_rank(
                    cands, ["priority", "seq"], "_cap_rank"
                )
                cands = ranked_c.filter(F.col("_cap_rank") < room).drop(
                    "_cap_rank"
                )
                n_cap_dropped = max(n_c - room, 0)
                totals["requests_dropped"] += n_cap_dropped
            else:
                n_cap_dropped = 0

            frontier_next = sel.leftover.select(*_FCOLS).unionByName(
                cands.select(*_FCOLS)
            )
            for r in retries:
                frontier_next = frontier_next.unionByName(r.select(*_FCOLS))

            stage_s["cand_build"] = stage_s.get("cand_build", 0.0) + (
                time.monotonic() - t_build1
            )
            # ---- commit phase: the frontier snapshot, seen delta, order log
            # and metrics are independent outputs — submit them as
            # CONCURRENT Spark jobs (threaded driver) so their latencies
            # overlap instead of adding up
            def _commit_frontier():
                # frontier snapshot every epoch — both the resume point and
                # the lineage break (iterative plans otherwise grow).
                # F4 salvage producer (reference src/scheduler.rs:75,423,
                # src/checkpoint.rs:118-123): if the snapshot commit fails,
                # best-effort write the would-be frontier as
                # state='salvaged' rows; resume merges them back so the
                # epoch's discovered candidates survive the crash
                try:
                    return store.write_frontier(frontier_next, epoch)
                except Exception:
                    try:
                        store.write_salvage(frontier_next, epoch)
                    except Exception:
                        pass
                    raise

            def _commit_seen():
                store.write_seen_delta(new_seen, epoch)
                if cfg.use_bloom:
                    if cfg.seen_filter == "cuckoo":
                        # cuckoo placement is stateful (no OR-merge): insert
                        # the epoch's new fingerprints into the prior shard
                        # tables distributed; returns the MERGED tables
                        # (reads `blooms` before the main thread reassigns —
                        # reassignment happens only after f_seen.result())
                        return cuckoo_ops.merge_cuckoo_shards(
                            blooms or {},
                            new_seen.select("fingerprint"),
                            cfg.n_shards,
                            cuckoo_nb,
                        )
                    # incremental Bloom: OR the epoch's new fingerprints into
                    # the cached shard bitsets (no full-seen rescan)
                    return dedup_ops.build_bloom_shards(
                        new_seen, cfg.n_shards, bloom_bits, cfg.bloom_hashes
                    )
                return None

            def _commit_order():
                # the single-partition ranked cache would write serially;
                # spread the artifact across tasks (readers re-sort anyway)
                store.append_epoch(
                    wave.select(
                        "url",
                        "wave_rank",
                        "host",
                        "depth",
                        F.lit(epoch).cast("int").alias("epoch"),
                    ).repartition(min(par, 32)),
                    "order",
                    epoch,
                )

            # ---- metrics (A1-A8): per-partition fetch lineage + epoch row
            wall_ms = int((time.monotonic() - t0) * 1000)
            n_retried = int(rqc.get(mw.RETRY, 0)) + int(st["resp_retried"])
            n_dropped = int(rqc.get(mw.DROP, 0)) + int(st["resp_dropped"])
            # failed = fetch misses + bad-status responses that the
            # middleware chain neither retried nor dropped
            n_redirected = int(st["redirects"])
            n_bad = (
                int(st["received"]) - n_ok - int(st["resp_dropped"])
                - int(st["resp_retried"]) - n_redirected
            )
            totals["requests_sent"] += int(rqc.get(mw.CONTINUE, 0))
            totals["requests_redirected"] += n_redirected
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

            def _f(v):
                return float(v) if v is not None else None

            def _commit_status() -> None:
                # A2 engine-side: per-epoch HTTP status histogram feeding
                # the report's Status Codes section (src/stats.rs:349-351)
                store.append_epoch(
                    rs.groupBy(F.col("status").cast("int").alias("status"))
                    .agg(F.count("*").alias("n"))
                    .withColumn("epoch", F.lit(epoch).cast("int")),
                    "status",
                    epoch,
                )

            def _commit_metrics(n_enq_val: int) -> None:
                epoch_row = spark.createDataFrame(
                    [
                        {
                            "epoch": epoch,
                            "partition_id": None,
                            "requests_enqueued": n_enq_val,
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
                            "fetch_ms_avg": _f(st["fetch_ms_avg"]),
                            "fetch_ms_min": _f(st["fetch_ms_min"]),
                            "fetch_ms_max": _f(st["fetch_ms_max"]),
                            "parse_ms_avg": _f(st["parse_ms_avg"]),
                            "parse_ms_min": _f(st["parse_ms_min"]),
                            "parse_ms_max": _f(st["parse_ms_max"]),
                            "wall_ms": wall_ms,
                        }
                    ],
                    schemas.METRICS,
                )
                if detail:
                    # per-partition fetch lineage rows (north_star: "per-
                    # partition lineage + metrics")
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
                                        F.col("status") <= cfg.success_max_status,
                                        1,
                                    ).otherwise(0)
                                ),
                                F.lit(0),
                            ).alias("requests_succeeded"),
                        )
                        .withColumn("epoch", F.lit(epoch).cast("int"))
                    )
                    metrics_df = epoch_row.unionByName(
                        per_part, allowMissingColumns=True
                    ).select(
                        [
                            F.col(f.name).cast(f.dataType)
                            for f in schemas.METRICS.fields
                        ]
                    )
                else:
                    metrics_df = epoch_row
                store.append_epoch(metrics_df, "metrics", epoch)

            def _commit_budgets():
                """A8 adaptive feedback (AdaptiveSemaphore analog, reference
                src/concurrency.rs:87-134): per-host error rates halve/double
                the budget (>10% / <1%, status-based and deterministic so the
                simulator mirrors it), then — when the fetcher emits per-URL
                ``transport_ms`` (HttpFetcher) and a target is configured —
                the reference's response-time term applies on a 0.7/0.3 EMA:
                budget −1 above the target, +1 below target/2
                (src/concurrency.rs:112-122; EMA coefficients :59-61, here
                per-epoch-average instead of per-sample).

                DELIBERATE DIVERGENCE from concurrency.rs rule order: the
                reference applies the time term FIRST, then the error rule,
                and subtracts 2 (not halves) on >10% errors; this engine
                applies halve/double THEN the ±1 time term. Engine ≡
                simulator (oracle/simulator.py mirrors this exact order), so
                parity tests pin the behavior; final budgets can differ
                from the reference where both rules fire in one window —
                multiplicative error response recovers a per-HOST budget
                faster at epoch granularity than the reference's per-5s −2
                step, which is tuned for a single global permit count."""
                has_time = (
                    cfg.adaptive_time_target_ms is not None
                    and "transport_ms" in rs.columns
                )
                sent_h = to_fetch.groupBy("host").agg(F.count("*").alias("n_sent"))
                time_aggs = (
                    [F.avg("transport_ms").alias("t_avg")] if has_time else []
                )
                resp_h = rs.groupBy("host").agg(
                    F.count("*").alias("n_resp"),
                    F.coalesce(
                        F.sum(
                            F.when(
                                F.col("status") > cfg.success_max_status, 1
                            ).otherwise(0)
                        ),
                        F.lit(0),
                    ).alias("n_err"),
                    *time_aggs,
                )
                stats_h = sent_h.join(resp_h, "host", "left").select(
                    "host",
                    "n_sent",
                    (
                        (F.col("n_sent") - F.coalesce(F.col("n_resp"), F.lit(0)))
                        + F.coalesce(F.col("n_err"), F.lit(0))
                    ).alias("errors"),
                    *([F.col("t_avg")] if has_time else []),
                )
                prev = (
                    budgets
                    if budgets is not None
                    else spark.createDataFrame([], _BUDGET_SCHEMA)
                )
                cur = F.coalesce(F.col("budget"), F.lit(cfg.adaptive_start_budget))
                rate = F.col("errors") / F.col("n_sent")
                by_error = (
                    F.when(
                        rate > cfg.adaptive_error_hi,
                        F.greatest(F.floor(cur / 2), F.lit(1)),
                    )
                    .when(
                        rate < cfg.adaptive_error_lo,
                        F.least(cur * 2, F.lit(cfg.default_host_budget)),
                    )
                    .otherwise(cur)
                )
                if has_time:
                    ema = F.when(
                        F.col("t_avg").isNull(), F.col("ema_ms")
                    ).otherwise(
                        F.coalesce(
                            0.7 * F.col("ema_ms") + 0.3 * F.col("t_avg"),
                            F.col("t_avg"),
                        )
                    )
                    tgt = float(cfg.adaptive_time_target_ms)
                    budget_col = (
                        F.when(ema > tgt, F.greatest(by_error - 1, F.lit(1)))
                        .when(
                            ema < tgt / 2,
                            F.least(
                                by_error + 1, F.lit(cfg.default_host_budget)
                            ),
                        )
                        .otherwise(by_error)
                    )
                    ema_col = ema
                else:
                    budget_col = by_error
                    ema_col = F.col("ema_ms")
                updated = stats_h.join(prev, "host", "left").select(
                    "host",
                    budget_col.cast("int").alias("budget"),
                    ema_col.cast("double").alias("ema_ms"),
                )
                untouched = prev.join(stats_h.select("host"), "host", "left_anti")
                out = untouched.unionByName(updated)
                out.write.mode("overwrite").parquet(_budgets_dir(epoch))
                return spark.read.schema(_BUDGET_SCHEMA).parquet(
                    _budgets_dir(epoch)
                )

            def _commit_usage():
                ep = rs.groupBy("host").agg(
                    F.coalesce(F.sum("fetch_bytes"), F.lit(0)).alias("bytes")
                )
                nxt = quota_ops.accumulate_usage(usage, ep)
                nxt.write.mode("overwrite").parquet(_usage_dir(epoch))
                return spark.read.schema("host string, bytes long").parquet(
                    _usage_dir(epoch)
                )

            # ---- commit phase: frontier snapshot, seen delta + Bloom
            # delta, order log, adaptive budgets and (non-detail) metrics
            # are independent outputs — run them as CONCURRENT Spark jobs
            # so their latencies overlap instead of adding up
            with _T("commit_parallel"):
                f_frontier = pool.submit(_commit_frontier)
                f_seen = pool.submit(_commit_seen)
                f_order = pool.submit(_commit_order)
                f_status = pool.submit(_commit_status)
                f_budgets = (
                    pool.submit(_commit_budgets) if cfg.adaptive_budget else None
                )
                f_usage = (
                    pool.submit(_commit_usage)
                    if cfg.host_bytes_quota is not None
                    else None
                )
                f_metrics = None if detail else pool.submit(_commit_metrics, 0)
                frontier = f_frontier.result()
                if jump_cached is not None:
                    jump_cached.unpersist()
                    jump_cached = None
                delta = f_seen.result()
                f_order.result()
                f_status.result()
                if f_budgets is not None:
                    budgets = f_budgets.result()
                if f_usage is not None:
                    usage = f_usage.result()
                if f_metrics is not None:
                    f_metrics.result()
            if cfg.use_bloom and delta is not None:
                blooms = (
                    delta  # _commit_seen already merged the cuckoo tables
                    if cfg.seen_filter == "cuckoo"
                    else dedup_ops.merge_bloom_shards(blooms or {}, delta)
                )
            n_seen += n_ok

            # ---- global adaptive wave sizing (reference adjust_permits,
            # src/concurrency.rs:87-134): ONE permit count driven by the
            # cross-host averages, reference rule order — time term first
            # (−1 above target / +1 below target/2 on the 0.7/0.3 EMA of
            # the cross-host mean), then error term (−2 above 10% / +1
            # below 1%). Epoch = the reference's 5 s adjustment window;
            # per-host A8 budgets are computed independently and unchanged.
            if cfg.adaptive_wave:
                with _T("adaptive_wave"):
                    has_t = (
                        cfg.adaptive_time_target_ms is not None
                        and "transport_ms" in rs.columns
                    )
                    aw_sent = to_fetch.groupBy("host").agg(
                        F.count("*").alias("n_sent")
                    )
                    t_aggs = (
                        [F.avg("transport_ms").alias("t_avg")] if has_t else []
                    )
                    aw_resp = rs.groupBy("host").agg(
                        F.count("*").alias("n_resp"),
                        F.coalesce(
                            F.sum(
                                F.when(
                                    F.col("status") > cfg.success_max_status,
                                    1,
                                ).otherwise(0)
                            ),
                            F.lit(0),
                        ).alias("n_err"),
                        *t_aggs,
                    )
                    aw = aw_sent.join(aw_resp, "host", "left").select(
                        (
                            (
                                F.col("n_sent")
                                - F.coalesce(F.col("n_resp"), F.lit(0))
                                + F.coalesce(F.col("n_err"), F.lit(0))
                            )
                            / F.col("n_sent")
                        ).alias("er"),
                        *([F.col("t_avg")] if has_t else []),
                    )
                    aw_row = aw.agg(
                        F.avg("er").alias("er"),
                        *([F.avg("t_avg").alias("tm")] if has_t else []),
                    ).collect()[0]
                    pmax = 2 * cfg.adaptive_wave_permits
                    if aw_row["er"] is not None:  # endpoint_count > 0 guard
                        if has_t and aw_row["tm"] is not None:
                            wave_ema_ms = (
                                float(aw_row["tm"])
                                if wave_ema_ms is None
                                else 0.7 * wave_ema_ms + 0.3 * float(aw_row["tm"])
                            )
                        if (
                            cfg.adaptive_time_target_ms is not None
                            and wave_ema_ms is not None
                        ):
                            tgt = float(cfg.adaptive_time_target_ms)
                            if wave_ema_ms > tgt:
                                wave_permits = max(wave_permits - 1, 1)
                            elif wave_ema_ms < tgt / 2:
                                wave_permits = min(wave_permits + 1, pmax)
                        aw_er = float(aw_row["er"])
                        if aw_er > cfg.adaptive_error_hi:
                            wave_permits = max(wave_permits - 2, 1)
                        elif aw_er < cfg.adaptive_error_lo:
                            wave_permits = min(wave_permits + 1, pmax)
            if (
                cfg.compact_seen_every
                and (epoch + 1) % cfg.compact_seen_every == 0
            ):
                store.compact_seen(epoch)

            n_leftover = sel.leftover.count() if detail else 0
            n_frontier = frontier.count() if detail else 0  # parquet count
            n_enq = n_frontier - n_leftover  # newly enqueued this epoch
            totals["requests_enqueued"] += n_enq
            if detail:
                # candidates killed by the enqueue-time dedup tiers
                totals["urls_deduped"] += n_cands_raw - (n_enq - n_retried)
                with _T("metrics_write"):
                    _commit_metrics(n_enq)

            def _manifest_dict() -> dict:
                return {
                    "last_epoch": epoch,
                    "totals": dict(totals),
                    "cookie_store": self.cookie_store,
                    "pipeline_totals": pipeline_totals,
                    "pipeline_states": {
                        p.name: p.get_state()
                        for p in self.pipelines
                        if p.get_state() is not None
                    },
                    "config": {"max_epochs": cfg.max_epochs},
                }

            # manifest commit = the epoch becomes the resume point. The
            # reference checkpoints on a periodic timer plus a final
            # snapshot (src/crawler/core.rs:212-258, :332-357);
            # checkpoint_every=k commits every k-th epoch (a skipped epoch
            # is deterministically re-run on resume — the kill/resume
            # parity tests prove replay identity) and the loop exit always
            # commits. Salvage dirs are only cleared up to a COMMITTED
            # manifest epoch (an uncommitted epoch's salvage must survive
            # for the resume merge).
            last_manifest = _manifest_dict()
            if cfg.checkpoint_every <= 1 or (epoch + 1) % cfg.checkpoint_every == 0:
                store.write_manifest(last_manifest)
                store.clear_salvage_upto(epoch)
                last_manifest = None
            last_epoch_done = epoch
            # release the epoch's caches: the ranked wave (sel.cached — the
            # plan `wave` itself derives from; unpersisting `wave` would be
            # a no-op on a derived filter), the request chain, the slim
            # response cache
            for df in (sel.cached, rq, rs):
                if df is not None:
                    df.unpersist()
            if profile:
                print(f"[epoch {epoch}] wave={n_wave} "
                      + " ".join(f"{k}={v:.2f}s" for k, v in stage_s.items()),
                      flush=True)
                stage_s.clear()
            epoch += 1
            if getattr(self, "_stop_requested", False):
                break  # graceful stop: epoch committed, exit the loop

        # any break path (drained frontier, dead-epoch jump past
        # max_epochs, graceful stop) may exit with an un-released jump
        # cache — the commit-block release only runs on full epochs
        if jump_cached is not None:
            jump_cached.unpersist()

        # final checkpoint (reference src/crawler/core.rs:332-357): if the
        # periodic cadence skipped the last epoch, commit it now
        if last_epoch_done >= epoch0 and last_manifest is not None:
            store.write_manifest(last_manifest)
            store.clear_salvage_upto(last_epoch_done)

        pool.shutdown(wait=True)
        for p in self.pipelines:
            p.close()
        wall = time.monotonic() - t_run0
        res = CrawlResult(
            workdir=cfg.workdir,
            epochs_run=last_epoch_done + 1,
            totals=totals,
            wall_s=wall,
            store=store,
            pipeline_stats=pipeline_totals,
        )
        return res
