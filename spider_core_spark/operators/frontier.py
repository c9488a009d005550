"""Frontier wave selection: ordering, robots, politeness, backpressure.

Reproduces the reference scheduler's observable dispatch semantics
(src/scheduler.rs:215-269 run loop; FIFO SegQueue order :233-257; pending
cap :399-408) at epoch granularity:

- total order = (priority, seq) where seq is the discovery index assigned
  at enqueue time (seeds: list position, src/crawler/core.rs:378-405;
  discovered links: (epoch, parent wave rank, link position) flattened to
  one long) — the distributed analog of single-threaded enqueue order;
- robots disallow prefixes drop requests permanently (middleware-drop
  analog, src/crawler/request_handler.rs:215-222 → requests_dropped);
- per-host politeness budget via a host-partitioned row_number window —
  over-budget rows are DEFERRED to later epochs, not dropped;
- global wave cap (the 30k backpressure analog) defers, never drops.

Dedup INVARIANT (why there is no seen-join here): the engine dedups
candidates at ENQUEUE time against (seen ∪ pending ∪ same-batch), so the
frontier never holds two rows for one fingerprint and never holds a row
already completed. The reference checks at enqueue time too
(should_enqueue_request, src/scheduler.rs:392-431) but only against
*completed* URLs — it can enqueue a URL twice while the first copy is in
flight, then fetch it twice. Our pending-set check drops the later copy
instead; the surviving row is the lowest-seq copy in both models, so the
fetch set and order are identical while each deferred row is checked once
instead of once per epoch it stays pending (at a 10^10 frontier the
re-probing would dominate).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_core_spark.functions.url import path_col
from spider_core_spark.operators.rank import with_global_rank
from spider_core_spark.plans.config import CrawlConfig

# seq layout: seq = (epoch+1) * 2^40 + parent_wave_rank * 2^12 + link_pos
# (seeds use epoch -1 → base 0, seq = list position). 2^40 epochs-space
# leaves 8M epochs; link_pos < 4096 ≥ the reference graph's out-degree cap.
# Flat long keeps the frontier sortable by one column.
# GUARDS (fields must not bleed into their neighbors or the total order
# silently breaks): link_candidates slices out-links to MAX_LINKS_PER_PAGE,
# and the engine validates max_wave_size ≤ MAX_PARENT_RANK at startup.
SEQ_EPOCH_BASE = 1 << 40
SEQ_PARENT_BASE = 1 << 12
MAX_LINKS_PER_PAGE = SEQ_PARENT_BASE  # 4096
MAX_PARENT_RANK = SEQ_EPOCH_BASE // SEQ_PARENT_BASE  # 2^28


def seed_seq(position: int) -> int:
    return position


def raw_seed_frame(spark, spider):
    """Seed rows from Spider.start_requests (full Requests with per-seed
    priority/depth/not_before_epoch/meta, reference src/spider.rs:112-121)
    or plain start_urls — shared by the BSP and streaming engines."""
    if getattr(spider, "start_requests", None) is not None:
        rows = [
            (
                r["url"],
                i,
                int(r.get("priority", 0)),
                int(r.get("depth", 0)),
                int(r.get("not_before_epoch", 0)),
                r.get("meta"),
            )
            for i, r in enumerate(spider.start_requests)
        ]
        return spark.createDataFrame(
            rows,
            "url string, seq long, priority int, depth int, "
            "not_before_epoch int, meta map<string,string>",
        )
    rows = [(u, i) for i, u in enumerate(spider.start_urls)]
    return spark.createDataFrame(rows, "url string, seq long")


def seed_frontier_select(seeds: DataFrame, canonicalize: bool = False) -> DataFrame:
    """Normalize a raw seed frame into FRONTIER-schema rows (F0 path:
    fragment strip / canonicalize, fingerprint, host columns; optional
    per-seed columns default to 0/NULL)."""
    from spider_core_spark.functions import url as urlfn

    def _opt(name: str, default):
        return F.col(name) if name in seeds.columns else default

    return urlfn.with_url_columns(seeds, canonicalize=canonicalize).select(
        "url",
        "fingerprint",
        "host",
        "host_hash",
        _opt("depth", F.lit(0)).cast("int").alias("depth"),
        _opt("priority", F.lit(0)).cast("int").alias("priority"),
        F.col("seq").cast("long"),
        F.lit(0).cast("int").alias("retry_count"),
        _opt("not_before_epoch", F.lit(0)).cast("int").alias(
            "not_before_epoch"
        ),
        F.lit("pending").alias("state"),
        F.lit(0).cast("int").alias("epoch_added"),
        _opt("meta", F.lit(None)).cast("map<string,string>").alias("meta"),
    )


def child_seq_col(epoch: int, parent_rank, link_pos):
    return (
        F.lit((epoch + 1) * SEQ_EPOCH_BASE).cast("long")
        + (parent_rank.cast("long") * F.lit(SEQ_PARENT_BASE))
        + link_pos.cast("long")
    )


@dataclass
class WaveSelection:
    wave: DataFrame  # selected rows + wave_rank (the epoch's fetch order)
    leftover: DataFrame  # rows staying in the frontier (FRONTIER schema)
    n_wave: int
    robots_dropped: int
    # the persisted ranked DataFrame both wave and leftover derive from.
    # Callers MUST unpersist this once the epoch's outputs are
    # materialized — unpersisting the derived `wave` is a silent no-op
    # (its filter plan never matches the cached plan), which leaked one
    # cache per epoch until round 3.
    cached: DataFrame | None = None


def select_wave(
    frontier: DataFrame,
    robots: DataFrame | None,
    epoch: int,
    cfg: CrawlConfig,
    detail: bool = True,
    budgets: DataFrame | None = None,
) -> WaveSelection:
    """``detail=False`` (steady-state/bench mode) skips the count jobs that
    exist only for counters; wave and leftover are identical either way.
    ``budgets``: optional adaptive per-host budgets (host, budget) from the
    previous epoch's error-rate feedback (A8); the effective budget is the
    LEAST of robots max_per_epoch, adaptive budget, and the default."""
    fcols = frontier.columns
    elig_cond = (F.col("not_before_epoch") <= F.lit(epoch)) & F.col("state").isin(
        "pending", "salvaged"
    )
    eligible = frontier.filter(elig_cond)
    not_yet = frontier.filter(~elig_cond)

    # --- robots drop (permanent)
    j = None
    robots_dropped = 0
    if cfg.use_robots and robots is not None:
        has_allow = "allow" in robots.columns
        rb_cols = ["host", "disallow", "max_per_epoch", "crawl_delay_ms"]
        if has_allow:
            rb_cols.insert(2, "allow")
        rb = F.broadcast(robots.select(*rb_cols))
        j = eligible.join(rb, "host", "left").withColumn(
            "_path", path_col(F.col("url"))
        )

        # longest-match precedence (Google's documented robots rule): the
        # most specific matching prefix wins; a tie goes to allow. With no
        # allow rules the longest matching allow is 0, so "longest
        # disallow > 0" degenerates to the old exists() semantics — with
        # one DOCUMENTED exception: an empty-string disallow prefix
        # (impossible from parse_robots, which skips '', but expressible
        # in a hand-built frame) was block-all under exists(startswith(''))
        # and is a no-op here, because a zero-length match can never
        # exceed the allow length. Empty prefixes carry no crawlable
        # meaning in the robots grammar; hand-built frames should filter
        # them out rather than rely on either reading (r5 ADVICE #3).
        def _longest_match(col: F.Column) -> F.Column:
            return F.coalesce(
                F.aggregate(
                    F.filter(col, lambda p: F.col("_path").startswith(p)),
                    F.lit(0),
                    lambda acc, p: F.greatest(acc, F.length(p)),
                ),
                F.lit(0),
            )

        allow_len = (
            _longest_match(F.col("allow")) if has_allow else F.lit(0)
        )
        blocked_pred = _longest_match(F.col("disallow")) > allow_len
        j = j.withColumn("_robots_block", blocked_pred)
        if detail:
            j = j.persist()
            robots_dropped = j.filter("_robots_block").count()
        allowed = j.filter(~F.col("_robots_block"))
    else:
        allowed = eligible.withColumn(
            "max_per_epoch", F.lit(None).cast("int")
        ).withColumn("crawl_delay_ms", F.lit(None).cast("int"))

    # --- per-host politeness budget (host-partitioned window: distributed).
    # With no robots table, no adaptive budgets and an effectively-infinite
    # default the window is an identity — skip it (same rule in the
    # simulator).
    unlimited = (
        (robots is None or not cfg.use_robots)
        and budgets is None
        and cfg.default_host_budget >= 10**9
    )
    if unlimited:
        within = allowed.select(*fcols)
        over_budget = None
    else:
        if budgets is not None:
            allowed = allowed.join(
                F.broadcast(
                    budgets.select("host", F.col("budget").alias("_adaptive"))
                ),
                "host",
                "left",
            )
        else:
            allowed = allowed.withColumn("_adaptive", F.lit(None).cast("int"))
        budget = F.least(
            F.coalesce(F.col("max_per_epoch"), F.lit(cfg.default_host_budget)),
            F.coalesce(
                F.col("_adaptive"),
                F.lit(
                    cfg.adaptive_start_budget
                    if cfg.adaptive_budget
                    else cfg.default_host_budget
                ),
            ),
        )
        if cfg.epoch_time_budget_ms is not None:
            # Crawl-delay enforcement (the reference's RateLimitMiddleware
            # analog, doc example src/builder.rs:25-33): with one epoch
            # budgeted at epoch_time_budget_ms of per-host wall time, a
            # host asking for crawl_delay_ms between hits gets at most
            # floor(budget/delay) fetches per epoch (min 1). Opt-in — the
            # BSP epoch has no inherent wall-clock, so the budget is the
            # operator's stated epoch duration.
            delay_budget = F.when(
                F.col("crawl_delay_ms").isNotNull() & (F.col("crawl_delay_ms") > 0),
                F.greatest(
                    F.floor(
                        F.lit(cfg.epoch_time_budget_ms) / F.col("crawl_delay_ms")
                    ),
                    F.lit(1),
                ),
            )
            budget = F.least(budget, F.coalesce(delay_budget, budget))
        whost = Window.partitionBy("host").orderBy("priority", "seq")
        polite = allowed.withColumn("_hrn", F.row_number().over(whost)).withColumn(
            "_over_budget", F.col("_hrn") > budget
        )
        within = polite.filter(~F.col("_over_budget")).select(*fcols)
        over_budget = polite.filter(F.col("_over_budget")).select(*fcols)

    # --- global order + wave cap (adaptive two-phase rank: never a
    # single-partition sort of a big frontier)
    ranked, n_ranked = with_global_rank(within, ["priority", "seq"], "wave_rank")
    wave = ranked.filter(F.col("wave_rank") < cfg.max_wave_size)
    over_cap = ranked.filter(F.col("wave_rank") >= cfg.max_wave_size).select(*fcols)
    n_wave = min(n_ranked, cfg.max_wave_size)

    leftover = not_yet.select(*fcols).unionByName(over_cap)
    if over_budget is not None:
        leftover = leftover.unionByName(over_budget)
    if j is not None and detail:
        j.unpersist()
    return WaveSelection(
        wave=wave,
        leftover=leftover,
        n_wave=n_wave,
        robots_dropped=robots_dropped,
        cached=ranked,
    )
