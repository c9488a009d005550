"""Pure-Python single-threaded crawl simulator — the parity oracle.

The reference ships almost no tests (two unit tests in
src/concurrency.rs:201-237), so its *implicit* spec — FIFO dispatch order
(src/scheduler.rs:233-257), enqueue-time dedup against completed URLs only
(src/scheduler.rs:392-431 + mark-after-success
src/crawler/request_handler.rs:352-362), emission-order link enqueueing
(src/crawler/response_parser.rs:295-328), retry/drop middleware actions
(request_handler.rs:191-237,304-349) — is encoded here as an executable
model at epoch granularity (see SURVEY.md §3.2 for why the reference's
in-flight races force the epoch-BSP formulation).

Every rule here is the SAME rule the Spark engine implements, written
sequentially. pytest asserts the engine's per-epoch crawl order, final
seen set, items and counters equal this model's on the synthetic site.

Uses the same url/fingerprint/extract functions as the engine's UDFs, so
text parity is byte-identical by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from spider_core_spark.functions.textextract import extract, resolve_link
from spider_core_spark.functions.url import (
    canonicalize_url_py,
    fingerprint_py,
    host_py,
    normalize_url_py,
    path_py,
)

SEQ_EPOCH_BASE = 1 << 40
SEQ_PARENT_BASE = 1 << 12


@dataclass
class SimConfig:
    max_epochs: int = 100
    max_wave_size: int = 30_000
    default_host_budget: int = 1_000_000
    use_robots: bool = True
    max_depth: int | None = None
    retry_statuses: tuple[int, ...] = (500,)
    max_retries: int = 0
    retry_delay_epochs: int = 1
    success_max_status: int = 399
    # mirror of CrawlConfig.follow_redirects: a 3xx page with a
    # "location" key is neither success nor failure; its target re-enters
    # the candidate stream at the SAME depth with the request's priority,
    # and the source is marked seen (cycle break)
    follow_redirects: bool = True
    drop_url_pattern: str | None = None  # DropUrlPattern analog
    # A8 adaptive per-host budget feedback (same rule as the engine)
    adaptive_budget: bool = False
    adaptive_error_hi: float = 0.10
    adaptive_error_lo: float = 0.01
    adaptive_start_budget: int = 100
    # response-time term (engine: CrawlConfig.adaptive_time_target_ms +
    # a fetcher emitting transport_ms; here: pages[url]["fetch_ms"]):
    # per-host 0.7/0.3 EMA of the epoch's average response time, budget
    # −1 above target / +1 below target/2 AFTER the error rule
    adaptive_time_target_ms: int | None = None
    # GLOBAL adaptive wave sizing (engine: CrawlConfig.adaptive_wave —
    # reference adjust_permits, src/concurrency.rs:87-134): one permit
    # count, reference rule order (time term first on the 0.7/0.3 EMA of
    # the cross-host mean, then error term −2/+1), effective wave cap =
    # max_wave_size × permits / adaptive_wave_permits, permits ∈
    # [1, 2×adaptive_wave_permits]
    adaptive_wave: bool = False
    adaptive_wave_permits: int = 8
    # Crawl-delay enforcement + per-host byte quota (same rules as the
    # engine: plans/config.py epoch_time_budget_ms / host_bytes_quota)
    epoch_time_budget_ms: int | None = None
    host_bytes_quota: int | None = None
    # priority frontier hook (Spider.priority_expr analog):
    # (url, host, depth) -> int, lower = sooner; None = FIFO
    priority_fn: object = None
    # P3 reference drop mode (CrawlConfig.pending_cap)
    pending_cap: int | None = None
    # full URL canonicalization (CrawlConfig.canonicalize_urls)
    canonicalize_urls: bool = False


@dataclass
class SimResult:
    orders: dict[int, list[str]]  # epoch → fetched urls in wave order
    seen: set[str]  # final fingerprints
    items: list[dict]
    metrics: dict[int, dict]
    totals: dict
    budgets: dict = field(default_factory=dict)  # final A8 per-host budgets


@dataclass
class _Req:
    url: str
    fingerprint: str
    host: str
    depth: int
    priority: int
    seq: int
    retry_count: int = 0
    not_before: int = 0


def simulate(
    pages: dict[str, dict],
    seeds: list[str],
    robots: dict[str, dict] | None = None,
    cfg: SimConfig | None = None,
) -> SimResult:
    """pages: url → {status:int, html:bytes, lang:str}; robots: host →
    {disallow:[prefix], allow:[prefix], max_per_epoch:int} — blocking is
    longest-match precedence between disallow and allow, ties to allow."""
    import re

    cfg = cfg or SimConfig()
    robots = robots or {}
    drop_re = re.compile(cfg.drop_url_pattern) if cfg.drop_url_pattern else None

    # --- seed injection: list order, fragment stripped, intra-batch dedup.
    # A seed may be a plain URL string or a start_requests dict
    # {"url", "priority", "depth", "not_before_epoch"} (reference
    # src/spider.rs:112-121 — Spider.start_requests parity)
    frontier: list[_Req] = []
    seeded = set()
    _norm = canonicalize_url_py if cfg.canonicalize_urls else normalize_url_py
    for i, u in enumerate(seeds):
        if isinstance(u, dict):
            nu = _norm(u["url"])
            prio = int(u.get("priority", 0))
            depth = int(u.get("depth", 0))
            nb = int(u.get("not_before_epoch", 0))
        else:
            nu = _norm(u)
            prio, depth, nb = 0, 0, 0
        fp = fingerprint_py(nu)
        if fp in seeded:
            continue
        seeded.add(fp)
        frontier.append(_Req(nu, fp, host_py(nu), depth, prio, i, 0, nb))

    seen: set[str] = set()
    orders: dict[int, list[str]] = {}
    items: list[dict] = []
    metrics: dict[int, dict] = {}
    totals = {
        "requests_enqueued": len(frontier),
        "requests_sent": 0,
        "requests_succeeded": 0,
        "requests_failed": 0,
        "requests_retried": 0,
        "requests_dropped": 0,
        "responses_received": 0,
        "bytes_downloaded": 0,
        "items_processed": 0,
        "urls_deduped": 0,
        "requests_redirected": 0,
    }

    adaptive: dict[str, int] = {}
    ema_ms: dict[str, float] = {}  # per-host response-time EMA (time term)
    wave_permits = cfg.adaptive_wave_permits  # global permit count
    wave_ema: float | None = None  # EMA of the cross-host mean time
    usage_bytes: dict[str, int] = {}  # cumulative, applied from next epoch
    epoch = 0
    while epoch < cfg.max_epochs and frontier:
        eligible, not_yet = [], []
        for r in frontier:
            ok_depth = cfg.max_depth is None or r.depth <= cfg.max_depth
            if r.not_before <= epoch and ok_depth:
                eligible.append(r)
            else:
                # depth-exceeded rows stay but are never selected —
                # identical to the engine's eligibility filter
                not_yet.append(r)

        # robots drop (permanent)
        robots_dropped = 0
        if cfg.use_robots and robots:
            kept = []
            for r in eligible:
                rules = robots.get(r.host)
                if rules:
                    # longest-match precedence, ties to allow (mirrors
                    # operators/frontier.py)
                    path = path_py(r.url)
                    dis = max(
                        (
                            len(p)
                            for p in rules.get("disallow", [])
                            if path.startswith(p)
                        ),
                        default=0,
                    )
                    alw = max(
                        (
                            len(p)
                            for p in rules.get("allow", [])
                            if path.startswith(p)
                        ),
                        default=0,
                    )
                    if dis > alw:
                        robots_dropped += 1
                        continue
                kept.append(r)
            eligible = kept

        # frontier invariant (see operators/frontier.py): enqueue-time dedup
        # guarantees unique, never-completed fingerprints — no wave-time
        # seen-skip or duplicate-collapse exists in either implementation
        deduped = sorted(eligible, key=lambda r: (r.priority, r.seq))

        # politeness per-host budget (over-budget rows DEFER); effective
        # budget = least(robots max_per_epoch, adaptive budget, default)
        taken_per_host: dict[str, int] = {}
        polite, over_budget = [], []
        for r in deduped:
            rules = robots.get(r.host, {}) if (cfg.use_robots and robots) else {}
            budget = rules.get("max_per_epoch") or cfg.default_host_budget
            if cfg.adaptive_budget:
                budget = min(
                    budget,
                    adaptive.get(r.host, cfg.adaptive_start_budget),
                    cfg.default_host_budget,
                )
            if cfg.epoch_time_budget_ms is not None:
                delay = rules.get("crawl_delay_ms")
                if delay:
                    budget = min(
                        budget, max(cfg.epoch_time_budget_ms // delay, 1)
                    )
            if (
                cfg.host_bytes_quota is not None
                and usage_bytes.get(r.host, 0) >= cfg.host_bytes_quota
            ):
                budget = 0
            c = taken_per_host.get(r.host, 0)
            if c < budget:
                taken_per_host[r.host] = c + 1
                polite.append(r)
            else:
                over_budget.append(r)

        # global wave cap (DEFER beyond the effective cap; adaptive_wave
        # scales it with the global permit count)
        eff_wave = cfg.max_wave_size
        if cfg.adaptive_wave:
            eff_wave = max(
                1,
                cfg.max_wave_size * wave_permits // cfg.adaptive_wave_permits,
            )
        wave = polite[:eff_wave]
        over_cap = polite[eff_wave:]
        leftover = not_yet + over_budget + over_cap

        if not wave:
            if not leftover:
                break
            nb = min(r.not_before for r in leftover)
            if nb <= epoch:
                break  # nothing will ever become eligible
            frontier = leftover
            epoch = nb
            continue

        # request middleware chain (DropUrlPattern analog)
        sent, req_dropped = [], 0
        for r in wave:
            if drop_re is not None and drop_re.search(r.url):
                req_dropped += 1
            else:
                sent.append(r)

        orders[epoch] = [r.url for r in wave]
        n_ok = n_miss = n_bad = n_retried = resp_dropped = 0
        n_redirected = 0
        bytes_dl = 0
        retries: list[_Req] = []
        parsed_rows = []  # (wave_rank, req, title, text, links, lang)
        redirect_rows = []  # (wave_rank, req, location)

        sent_h: dict[str, int] = {}
        err_h: dict[str, int] = {}
        times_h: dict[str, list[float]] = {}
        sent_ids = {id(r) for r in sent}
        for rank, r in enumerate(wave):
            if id(r) not in sent_ids:
                continue
            sent_h[r.host] = sent_h.get(r.host, 0) + 1
            page = pages.get(r.url)
            if page is None:
                n_miss += 1
                err_h[r.host] = err_h.get(r.host, 0) + 1
                continue
            if page.get("fetch_ms") is not None:
                times_h.setdefault(r.host, []).append(float(page["fetch_ms"]))
            if page.get("status", 200) > cfg.success_max_status:
                err_h[r.host] = err_h.get(r.host, 0) + 1
            status = page.get("status", 200)
            bytes_dl += len(page.get("html") or b"")
            usage_bytes[r.host] = usage_bytes.get(r.host, 0) + len(
                page.get("html") or b""
            )
            # response middleware: RetryOnStatus analog
            if status in cfg.retry_statuses and cfg.max_retries > 0:
                if r.retry_count < cfg.max_retries:
                    retries.append(
                        _Req(
                            r.url,
                            r.fingerprint,
                            r.host,
                            r.depth,
                            r.priority,
                            r.seq,
                            r.retry_count + 1,
                            epoch + 1 + cfg.retry_delay_epochs,
                        )
                    )
                    n_retried += 1
                else:
                    resp_dropped += 1
                continue
            if (
                cfg.follow_redirects
                and 300 <= status <= 399
                and page.get("location")
            ):
                n_redirected += 1
                redirect_rows.append((rank, r, page["location"]))
                continue
            if status > cfg.success_max_status:
                n_bad += 1
                continue
            n_ok += 1
            title, text, hrefs = extract(page["html"])
            links = [x for x in (resolve_link(r.url, h) for h in hrefs) if x]
            parsed_rows.append((rank, r, title, text, links, page.get("lang")))

        # mark visited AFTER success — redirect SOURCES included (the seen
        # mark is the redirect-cycle breaker; engine does the same)
        for rank, r, *_ in parsed_rows:
            seen.add(r.fingerprint)
        for rank, r, _loc in redirect_rows:
            seen.add(r.fingerprint)

        # items (emission order)
        for rank, r, title, text, links, lang in parsed_rows:
            items.append(
                {
                    "url": r.url,
                    "title": title,
                    "text": text,
                    "lang": lang,
                    "n_links": len(links),
                    "epoch": epoch,
                }
            )

        # discovered links → candidates (emission order = (wave_rank, pos))
        cands: list[_Req] = []
        for rank, r, title, text, links, lang in parsed_rows:
            for pos, raw in enumerate(links):
                nu = _norm(raw)
                if cfg.max_depth is not None and r.depth + 1 > cfg.max_depth:
                    continue
                fp = fingerprint_py(nu)
                h = host_py(nu)
                prio = (
                    int(cfg.priority_fn(nu, h, r.depth + 1))
                    if cfg.priority_fn is not None
                    else 0
                )
                cands.append(
                    _Req(
                        nu,
                        fp,
                        h,
                        r.depth + 1,
                        prio,
                        (epoch + 1) * SEQ_EPOCH_BASE
                        + rank * SEQ_PARENT_BASE
                        + pos,
                    )
                )

        # redirect targets join the same candidate stream: SAME depth,
        # inherited priority, seq pos=0 (a redirect row is never parsed,
        # so pos 0 cannot collide with one of its own link positions)
        for rank, r, loc in redirect_rows:
            nu = _norm(loc)
            cands.append(
                _Req(
                    nu,
                    fingerprint_py(nu),
                    host_py(nu),
                    r.depth,
                    r.priority,
                    (epoch + 1) * SEQ_EPOCH_BASE + rank * SEQ_PARENT_BASE,
                )
            )

        # enqueue-time dedup vs (seen incl. this epoch's marks ∪ pending
        # frontier ∪ retries ∪ same batch), keep first emission
        pending_fps = {r.fingerprint for r in leftover}
        pending_fps.update(r.fingerprint for r in retries)
        fresh: dict[str, _Req] = {}
        for c in sorted(cands, key=lambda r: (r.priority, r.seq)):
            if c.fingerprint in seen or c.fingerprint in pending_fps:
                continue
            fresh.setdefault(c.fingerprint, c)
        fresh_rows = sorted(fresh.values(), key=lambda r: (r.priority, r.seq))
        cap_dropped = 0
        if cfg.pending_cap is not None:
            room = max(cfg.pending_cap - len(leftover) - len(retries), 0)
            cap_dropped = max(len(fresh_rows) - room, 0)
            fresh_rows = fresh_rows[:room]
        new_rows = fresh_rows + retries
        urls_deduped = len(cands) - len(fresh)

        # A8 adaptive feedback (same thresholds as the engine): error rule
        # (halve/double) first, then the response-time term on the EMA
        if cfg.adaptive_budget:
            for h, n_sent_h in sent_h.items():
                cur = adaptive.get(h, cfg.adaptive_start_budget)
                rate = err_h.get(h, 0) / n_sent_h
                if rate > cfg.adaptive_error_hi:
                    nxt = max(cur // 2, 1)
                elif rate < cfg.adaptive_error_lo:
                    nxt = min(cur * 2, cfg.default_host_budget)
                else:
                    nxt = cur
                if cfg.adaptive_time_target_ms is not None:
                    ts_ = times_h.get(h)
                    if ts_:
                        t_avg = sum(ts_) / len(ts_)
                        prev_ema = ema_ms.get(h)
                        ema_ms[h] = (
                            t_avg
                            if prev_ema is None
                            else 0.7 * prev_ema + 0.3 * t_avg
                        )
                    cur_ema = ema_ms.get(h)
                    tgt = float(cfg.adaptive_time_target_ms)
                    if cur_ema is not None:
                        if cur_ema > tgt:
                            nxt = max(nxt - 1, 1)
                        elif cur_ema < tgt / 2:
                            nxt = min(nxt + 1, cfg.default_host_budget)
                adaptive[h] = nxt

        # GLOBAL adaptive wave sizing (engine parity — reference
        # adjust_permits rule order: time term FIRST, then error −2/+1)
        if cfg.adaptive_wave and sent_h:
            pmax = 2 * cfg.adaptive_wave_permits
            if cfg.adaptive_time_target_ms is not None:
                tms = [sum(v) / len(v) for v in times_h.values()]
                if tms:
                    m = sum(tms) / len(tms)
                    wave_ema = (
                        m if wave_ema is None else 0.7 * wave_ema + 0.3 * m
                    )
                if wave_ema is not None:
                    tgt = float(cfg.adaptive_time_target_ms)
                    if wave_ema > tgt:
                        wave_permits = max(wave_permits - 1, 1)
                    elif wave_ema < tgt / 2:
                        wave_permits = min(wave_permits + 1, pmax)
            ers = [err_h.get(h, 0) / n for h, n in sent_h.items()]
            er = sum(ers) / len(ers)
            if er > cfg.adaptive_error_hi:
                wave_permits = max(wave_permits - 2, 1)
            elif er < cfg.adaptive_error_lo:
                wave_permits = min(wave_permits + 1, pmax)

        frontier = leftover + new_rows
        metrics[epoch] = {
            "wave": len(wave),
            "requests_sent": len(sent),
            "requests_succeeded": n_ok,
            "requests_failed": n_miss + n_bad,
            "requests_retried": n_retried,
            "requests_dropped": req_dropped + resp_dropped + robots_dropped,
            "requests_enqueued": len(new_rows),
            "bytes_downloaded": bytes_dl,
            "urls_deduped": urls_deduped,
            "requests_redirected": n_redirected,
        }
        totals["requests_redirected"] += n_redirected
        totals["requests_sent"] += len(sent)
        totals["requests_succeeded"] += n_ok
        totals["requests_failed"] += n_miss + n_bad
        totals["requests_retried"] += n_retried
        totals["requests_dropped"] += (
            req_dropped + resp_dropped + robots_dropped + cap_dropped
        )
        totals["requests_enqueued"] += len(new_rows)
        totals["responses_received"] += len(sent) - n_miss
        totals["bytes_downloaded"] += bytes_dl
        totals["items_processed"] += len(parsed_rows)
        totals["urls_deduped"] += urls_deduped
        epoch += 1

    return SimResult(
        orders=orders, seen=seen, items=items, metrics=metrics,
        totals=totals, budgets=dict(adaptive),
    )
