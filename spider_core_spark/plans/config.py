"""Crawl configuration (the analog of the reference's CrawlerBuilder,
src/builder.rs:192-307, defaults at :80-88; dedup sizing defaults at
src/scheduler.rs:108-144)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    # epoch loop
    max_epochs: int = 100
    # wave-size cap — the BSP analog of the reference's 30,000 pending
    # backpressure limit (src/scheduler.rs:144,399-408). Rows beyond the cap
    # are DEFERRED to the next epoch, not dropped (documented improvement).
    max_wave_size: int = 30_000
    # P3 reference drop mode: pending cap beyond which NEW discoveries are
    # dropped with an error instead of deferred (src/scheduler.rs:144,
    # 399-408 drops at 30,000 pending). None (default) keeps the deferral
    # semantics — the documented improvement over the reference.
    pending_cap: int | None = None
    # politeness: per-host per-epoch budget when robots has no max_per_epoch
    default_host_budget: int = 1_000_000
    # opt-in Crawl-delay enforcement: treat one epoch as this much per-host
    # wall time, so a robots crawl_delay_ms of D caps the host at
    # floor(epoch_time_budget_ms / D) fetches per epoch (min 1). None =
    # delays ignored (the round-1 behavior the simulator mirrors).
    epoch_time_budget_ms: int | None = None
    use_robots: bool = True
    max_depth: int | None = None

    # retry (the RetryOnStatus middleware's knobs; reference retry action at
    # src/crawler/request_handler.rs:199-214)
    retry_statuses: tuple[int, ...] = (500,)
    max_retries: int = 0
    retry_delay_epochs: int = 1

    # seen-set sharding + Bloom tier (reference: 5M bits / 5 hashes,
    # src/scheduler.rs:137)
    n_shards: int = 8
    bloom_bits: int = 1 << 20  # per shard
    bloom_hashes: int = 5
    use_bloom: bool = True
    # scale-aware Bloom sizing: when both are set, bloom_bits is DERIVED
    # from the target false-positive rate at the expected seen-set
    # cardinality (operators/dedup.bloom_bits_for) instead of the static
    # default — at 10^10 fingerprints the static default silently degrades
    # to all-maybe. The run fails LOUDLY if the derived shards exceed the
    # broadcast budget (BASELINE.md documents the sizing table).
    bloom_target_fpr: float | None = None
    bloom_expected_seen: int | None = None
    bloom_broadcast_budget_mb: int = 512
    # below this seen-set size the exact anti-join is cheaper than a Bloom
    # probe pass (the probe is a whole extra Python stage); the Bloom tier
    # pays off once `seen` is large enough that most candidates would
    # otherwise shuffle into the join
    bloom_min_seen: int = 1
    # which approximate seen tier fronts the exact anti-join (active only
    # when use_bloom=True): "bloom" (default — OR-mergeable bitsets) or
    # "cuckoo" (operators/cuckoo.py — deletable, no false negatives even
    # after recrawl eviction; per-epoch deltas INSERT into the prior shard
    # tables distributed instead of OR-merging). Either way the tier is a
    # prefilter: dedup correctness always comes from the exact anti-join.
    seen_filter: str = "bloom"
    # cuckoo sizing: buckets per shard (power of 2). None derives it from
    # bloom_expected_seen via operators/cuckoo.buckets_for at 0.8 load
    # (headroom: the filter REFUSES past ~0.95), falling back to 1 << 16
    # (~235k keys/shard at 0.9). Same loud broadcast-budget check as the
    # Bloom tier.
    cuckoo_buckets: int | None = None
    # in-place continuous recrawl (plans/recrawl.py): on resume=True, also
    # inject the spider's seeds / start_requests into the restored
    # frontier, anti-joined against BOTH the seen set and the pending
    # frontier — so only never-seen (or tombstone-EVICTED, see
    # CheckpointStore.write_seen_eviction) URLs re-enter. Off by default:
    # a plain resume must not re-enqueue anything.
    reseed_on_resume: bool = False
    # redirect following (beyond-reference: /root/reference/src has no 3xx
    # handling — request_handler.rs treats every response as final). A
    # CONTINUE/SERVE response with 300 <= status <= 399 AND a non-null
    # `location` column is not parsed and emits no item; its (absolute)
    # location re-enters the frontier at the SAME depth with the request's
    # priority, through the normal enqueue-time dedup. The source URL is
    # marked seen, so redirect cycles break via the dedup tier (no hop
    # counter needed in the frontier schema); chains advance one hop per
    # epoch, like any discovery. No-op when the pages table has no
    # `location` column (3xx without location stays a parsed "success"
    # under success_max_status=399, the pre-redirect behavior).
    follow_redirects: bool = True

    # checkpointing (reference periodic checkpoint task,
    # src/crawler/core.rs:212-258): snapshot every k epochs; final always
    checkpoint_every: int = 1
    # compact the append-only seen deltas into one snapshot every k epochs
    # (0 = never); keeps read_seen O(k) directories on long crawls
    compact_seen_every: int = 0
    workdir: str = "/tmp/spider_core_spark_run"

    # skew: salt partitions on hot hosts before UDF-heavy stages
    skew_salt: int = 8

    # fetch join: broadcast the wave only up to this row count; bigger
    # waves fall back to a shuffle join (a 10^7-row wave is no longer
    # "small next to pages" for an executor heap)
    broadcast_wave_max: int = 1_000_000

    # optional per-host cumulative byte quota (ResourceQuotaManager analog,
    # reference src/concurrency.rs:142-236): hosts whose downloaded bytes
    # exceed the quota stop being scheduled (budget 0 in select_wave)
    host_bytes_quota: int | None = None

    # detailed per-epoch counters + per-partition lineage rows. Costs a few
    # extra count jobs per epoch; turn off for steady-state throughput runs
    # (the wave/fetch/parse/dedup path is identical either way)
    detailed_metrics: bool = True

    # caller guarantees the seed list has unique fingerprints → skip the
    # injection-time dedup window (big table-sourced seed lists)
    seeds_pre_deduped: bool = False

    # adaptive per-host politeness feedback — the AdaptiveSemaphore analog
    # (reference src/concurrency.rs:87-134: halve permits when error rate
    # >10%, grow when <1%). Deterministic rule on per-host error rates, so
    # the simulator can mirror it exactly; budgets persist across epochs
    # and resume from checkpoint.
    adaptive_budget: bool = False
    adaptive_error_hi: float = 0.10
    adaptive_error_lo: float = 0.01
    adaptive_start_budget: int = 100
    # response-time term of the AdaptiveSemaphore rule (reference
    # src/concurrency.rs:112-122: permits −1 above the target, +1 below
    # target/2, on a 0.7/0.3 EMA of response times). Applies when the
    # fetcher emits a per-URL ``transport_ms`` column (HttpFetcher does;
    # the join fetcher has no per-URL wall time). None = error-rate-only
    # (the round-2 behavior).
    adaptive_time_target_ms: int | None = None

    # GLOBAL adaptive wave sizing — the reference's single global permit
    # count (AdaptiveSemaphore: initial=base, max=2×base, min=1, adjusted
    # per 5 s window from the CROSS-host average response time and error
    # rate; src/concurrency.rs:87-134, spawn src/crawler/
    # request_handler.rs:52-66). Here one adjustment per epoch, in the
    # reference's exact rule order: time term first (−1 above target, +1
    # below target/2, on the 0.7/0.3 EMA of the cross-host mean
    # transport_ms), then the error term (−2 above adaptive_error_hi, +1
    # below adaptive_error_lo). Effective wave cap =
    # max_wave_size × permits / adaptive_wave_permits, permits ∈
    # [1, 2×adaptive_wave_permits]. Deterministic → simulator-mirrored.
    # The time term needs a fetcher emitting transport_ms plus
    # adaptive_time_target_ms; the error term is always live.
    adaptive_wave: bool = False
    adaptive_wave_permits: int = 8

    # statuses considered fetch success (mark-as-visited happens only after
    # success, src/crawler/request_handler.rs:352-362)
    success_max_status: int = 399

    # full URL canonicalization beyond the reference's fragment strip
    # (lowercase scheme/host, default-port strip, bare root-slash strip) —
    # opt-in because it changes fingerprints vs the reference semantics;
    # exactly mirrored by the simulator (functions/url.canonicalize_url_py)
    canonicalize_urls: bool = False

    # S1: reject unparseable seed URLs with SpiderError at injection time
    # (reference Url::parse err → SpiderError, src/spider.rs:118-120);
    # discovered links are still filtered silently (resolve_link)
    validate_seeds: bool = True

    # P6: during the shutdown epoch (the last one before max_epochs) skip
    # enqueueing newly discovered requests (reference shutdown skip,
    # src/crawler/response_parser.rs:303-310). Off by default because a
    # resumed run with a higher max_epochs would otherwise lose them.
    shutdown_skip_discoveries: bool = False

    extra: dict = field(default_factory=dict)
