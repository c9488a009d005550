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
- global wave cap (the 30k backpressure analog) defers, never drops;
- rows whose fingerprint is already in `seen` are consumed silently: the
  reference can enqueue a URL twice while the first copy is in flight
  (visited-marking happens only after success,
  src/crawler/request_handler.rs:352-362) but would fetch it again — we
  skip the re-fetch, a documented divergence that strictly reduces work.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spider_core_spark.functions.url import path_col
from spider_core_spark.operators import dedup as dedup_ops
from spider_core_spark.operators.rank import with_global_rank
from spider_core_spark.plans.config import CrawlConfig

# seq layout: seq = (epoch+1) * 2^40 + parent_wave_rank * 2^12 + link_pos
# (seeds use epoch -1 → base 0, seq = list position). 2^40 epochs-space
# leaves 8M epochs × 1T ranks; link_pos < 4096 ≥ the reference graph's
# out-degree cap. Flat long keeps the frontier sortable by one column.
SEQ_EPOCH_BASE = 1 << 40
SEQ_PARENT_BASE = 1 << 12


def seed_seq(position: int) -> int:
    return position


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
    robots_dropped: int
    seen_skipped: int
    dup_collapsed: int
    deferred: int


def select_wave(
    frontier: DataFrame,
    seen: DataFrame,
    robots: DataFrame | None,
    epoch: int,
    cfg: CrawlConfig,
    blooms: dict[int, bytes] | None = None,
) -> WaveSelection:
    fcols = frontier.columns
    elig_cond = (F.col("not_before_epoch") <= F.lit(epoch)) & F.col("state").isin(
        "pending", "salvaged"
    )
    if cfg.max_depth is not None:
        elig_cond = elig_cond & (F.col("depth") <= cfg.max_depth)
    eligible = frontier.filter(elig_cond)
    not_yet = frontier.filter(~elig_cond)

    # --- robots drop (permanent)
    if cfg.use_robots and robots is not None:
        rb = F.broadcast(robots.select("host", "disallow", "max_per_epoch"))
        j = eligible.join(rb, "host", "left").withColumn(
            "_path", path_col(F.col("url"))
        )
        blocked_pred = F.when(
            F.col("disallow").isNotNull(),
            F.exists("disallow", lambda d: F.col("_path").startswith(d)),
        ).otherwise(F.lit(False))
        j = j.withColumn("_robots_block", blocked_pred).persist()
        robots_dropped = j.filter("_robots_block").count()
        allowed = j.filter(~F.col("_robots_block"))
    else:
        allowed = eligible.withColumn("max_per_epoch", F.lit(None).cast("int"))
        j = None
        robots_dropped = 0

    # --- skip rows already completed (seen) — bloom-prefiltered anti-join
    live = dedup_ops.dedup_against_seen(
        allowed.select(*fcols, "max_per_epoch"),
        seen,
        use_bloom=cfg.use_bloom,
        blooms=blooms,
        n_shards=cfg.n_shards,
        n_bits=cfg.bloom_bits,
        n_hashes=cfg.bloom_hashes,
    ).persist()
    n_live = live.count()
    n_allowed = allowed.count()
    seen_skipped = n_allowed - n_live

    # --- collapse duplicate fingerprints inside the wave: keep first by
    # (priority, seq); the reference fetches each completed URL once
    wdup = Window.partitionBy("fingerprint").orderBy("priority", "seq")
    deduped = (
        live.withColumn("_rn", F.row_number().over(wdup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    dup_collapsed = n_live  # adjusted below after count

    # --- per-host politeness budget (host-partitioned window: distributed)
    budget = F.coalesce(F.col("max_per_epoch"), F.lit(cfg.default_host_budget))
    whost = Window.partitionBy("host").orderBy("priority", "seq")
    polite = (
        deduped.withColumn("_hrn", F.row_number().over(whost))
        .withColumn("_over_budget", F.col("_hrn") > budget)
        .persist()
    )
    within = polite.filter(~F.col("_over_budget"))
    over_budget = polite.filter(F.col("_over_budget")).select(*fcols)
    dup_collapsed = n_live - polite.count()

    # --- global order + wave cap (two-phase rank: no single-partition sort)
    ranked = with_global_rank(within.select(*fcols), ["priority", "seq"], "wave_rank")
    wave = ranked.filter(F.col("wave_rank") < cfg.max_wave_size)
    over_cap = ranked.filter(F.col("wave_rank") >= cfg.max_wave_size).select(*fcols)

    leftover = not_yet.select(*fcols).unionByName(over_budget).unionByName(over_cap)
    deferred = 0  # reported by engine via counts; avoid extra jobs here
    if j is not None:
        j.unpersist()
    return WaveSelection(
        wave=wave,
        leftover=leftover,
        robots_dropped=robots_dropped,
        seen_skipped=seen_skipped,
        dup_collapsed=dup_collapsed,
        deferred=deferred,
    )
