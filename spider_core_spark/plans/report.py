"""Stats report sink (SNK3) — JSON + Markdown + plain-text export of the
crawl's StatCollector analog, rendered from the metrics/status tables at
crawl end.

Mirrors the reference field-for-field:
- snapshot fields                 src/stats.rs:98-127 (StatsSnapshot)
- byte formatting (KB/MB/GB)      src/stats.rs:174-188 (S5)
- overall rates (count/elapsed)   src/stats.rs:147-172 (A5)
- recent-rate EMA, α=0.2          src/stats.rs:54-95 (A6): rate_t =
  α·current + (1-α)·rate_{t-1}, updated once per ≥1 s interval — here one
  update per epoch over the per-epoch rate series (the epoch IS the
  interval), computed as the exact recursion in driver pandas (O(epochs))
- markdown layout                 src/stats.rs:481-585 (we emit well-formed
  table rows; the reference's ``From Cache`` row is missing its leading
  pipe — a bug, not a format choice, so not copied)
- plain-text Display              src/stats.rs:598-658
- printed at crawl end            src/crawler/core.rs:364-366
"""

from __future__ import annotations

import json

_KB = 1024
_MB = 1024 * _KB
_GB = 1024 * _MB

EMA_ALPHA = 0.2


def format_bytes(n: int) -> str:
    """S5 byte-size formatting (src/stats.rs:174-188)."""
    if n >= _GB:
        return f"{n / _GB:.2f} GB"
    if n >= _MB:
        return f"{n / _MB:.2f} MB"
    if n >= _KB:
        return f"{n / _KB:.2f} KB"
    return f"{n} B"


def format_time_ms(ms: float | None) -> str:
    """Duration formatting (src/stats.rs:234-244): ms below 1 s, else
    seconds with 2 decimals."""
    if ms is None:
        return "N/A"
    if ms < 1000:
        return f"{int(ms)} ms"
    return f"{ms / 1000.0:.2f} s"


def ema_series(values: list[float], alpha: float = EMA_ALPHA) -> list[float]:
    """Exact EMA recursion (src/stats.rs:80-89). The reference initializes
    rate = 0.0 and folds each interval's current rate in — first update
    yields α·x_0, matching `*rate = alpha*current + (1-alpha)*0`."""
    out: list[float] = []
    rate = 0.0
    for x in values:
        rate = alpha * x + (1.0 - alpha) * rate
        out.append(rate)
    return out


def build_snapshot(
    totals: dict,
    elapsed_s: float,
    status_counts: dict[int, int] | None = None,
    timing: dict | None = None,
    epoch_rates: dict[str, list[float]] | None = None,
    pipeline_stats: dict[str, dict] | None = None,
) -> dict:
    """Assemble the StatsSnapshot analog (src/stats.rs:98-127) as a plain
    dict — the single source of truth for every export format below.

    ``timing``: {fetch: {avg,min,max,count}, parse: {...}} from the metrics
    table. ``epoch_rates``: per-epoch req/resp/item rates for the EMA tier.
    ``pipeline_stats``: per-pipeline {total_ms, items} (A7,
    item_processor.rs:32)."""
    status_counts = status_counts or {}
    timing = timing or {}
    epoch_rates = epoch_rates or {}
    elapsed = max(elapsed_s, 1e-9)

    def _rate(key: str) -> float:
        return totals.get(key, 0) / elapsed

    def _recent(key: str) -> float:
        series = epoch_rates.get(key) or []
        return ema_series(series)[-1] if series else 0.0

    return {
        **{k: int(v) for k, v in totals.items()},
        "response_status_counts": {
            str(k): int(v) for k, v in sorted(status_counts.items())
        },
        "elapsed_seconds": elapsed_s,
        "requests_per_second": _rate("requests_sent"),
        "responses_per_second": _rate("responses_received"),
        "items_per_second": _rate("items_scraped"),
        "recent_requests_per_second": _recent("requests_sent"),
        "recent_responses_per_second": _recent("responses_received"),
        "recent_items_per_second": _recent("items_scraped"),
        "average_request_time_ms": (timing.get("fetch") or {}).get("avg"),
        "fastest_request_time_ms": (timing.get("fetch") or {}).get("min"),
        "slowest_request_time_ms": (timing.get("fetch") or {}).get("max"),
        "request_time_count": (timing.get("fetch") or {}).get("count", 0),
        "average_parsing_time_ms": (timing.get("parse") or {}).get("avg"),
        "fastest_parsing_time_ms": (timing.get("parse") or {}).get("min"),
        "slowest_parsing_time_ms": (timing.get("parse") or {}).get("max"),
        "parsing_time_count": (timing.get("parse") or {}).get("count", 0),
        "pipeline_stats": pipeline_stats or {},
    }


def to_json(snapshot: dict, pretty: bool = True) -> str:
    """src/stats.rs:471-478 (to_json_string / _pretty)."""
    return json.dumps(snapshot, indent=2 if pretty else None, default=float)


def to_markdown(s: dict) -> str:
    """src/stats.rs:481-585 to_markdown_string, field-for-field."""
    status_lines = "\n".join(
        f"- **{code}**: {n}" for code, n in s["response_status_counts"].items()
    ) or "N/A"
    ft = format_time_ms
    return f"""# Crawl Statistics Report

- **Duration**: {s['elapsed_seconds']:.2f} s
- **Current Rate** (EMA): {s['recent_requests_per_second']:.2f} req/s, \
{s['recent_responses_per_second']:.2f} resp/s, {s['recent_items_per_second']:.2f} item/s
- **Overall Rate** (total): {s['requests_per_second']:.2f} req/s, \
{s['responses_per_second']:.2f} resp/s, {s['items_per_second']:.2f} item/s

## Requests
| Metric     | Count |
|------------|-------|
| Enqueued   | {s['requests_enqueued']} |
| Sent       | {s['requests_sent']} |
| Succeeded  | {s['requests_succeeded']} |
| Failed     | {s['requests_failed']} |
| Retried    | {s['requests_retried']} |
| Dropped    | {s['requests_dropped']} |

## Responses
| Metric     | Count |
|------------|-------|
| Received   | {s['responses_received']} |
| From Cache | {s['responses_from_cache']} |
| Downloaded | {format_bytes(s['bytes_downloaded'])} |

## Items
| Metric     | Count |
|------------|-------|
| Scraped    | {s['items_scraped']} |
| Processed  | {s['items_processed']} |
| Dropped    | {s['items_dropped']} |

## Request Times
| Metric           | Value |
|------------------|-------|
| Average Time     | {ft(s['average_request_time_ms'])} |
| Fastest Request  | {ft(s['fastest_request_time_ms'])} |
| Slowest Request  | {ft(s['slowest_request_time_ms'])} |
| Total Recorded   | {s['request_time_count']} |

## Parsing Times
| Metric           | Value |
|------------------|-------|
| Average Time     | {ft(s['average_parsing_time_ms'])} |
| Fastest Parse    | {ft(s['fastest_parsing_time_ms'])} |
| Slowest Parse    | {ft(s['slowest_parsing_time_ms'])} |
| Total Recorded   | {s['parsing_time_count']} |

## Status Codes
{status_lines}
"""


def to_display(s: dict) -> str:
    """Plain-text Display analog (src/stats.rs:598-658)."""
    ft = format_time_ms
    status = (
        ", ".join(f"{c}: {n}" for c, n in s["response_status_counts"].items())
        or "none"
    )
    lines = [
        "",
        "Crawl Statistics",
        "----------------",
        f"  duration : {s['elapsed_seconds']:.2f} s",
        "  speed    : req/s: {:.2f}, resp/s: {:.2f}, item/s: {:.2f}".format(
            s["recent_requests_per_second"],
            s["recent_responses_per_second"],
            s["recent_items_per_second"],
        ),
        "  requests : enqueued: {}, sent: {}, ok: {}, fail: {}, retry: {}, drop: {}".format(
            s["requests_enqueued"], s["requests_sent"], s["requests_succeeded"],
            s["requests_failed"], s["requests_retried"], s["requests_dropped"],
        ),
        "  response : received: {}, from_cache: {}, downloaded: {}".format(
            s["responses_received"], s["responses_from_cache"],
            format_bytes(s["bytes_downloaded"]),
        ),
        "  items    : scraped: {}, processed: {}, dropped: {}".format(
            s["items_scraped"], s["items_processed"], s["items_dropped"],
        ),
        "  req time : avg: {}, fastest: {}, slowest: {}, total: {}".format(
            ft(s["average_request_time_ms"]), ft(s["fastest_request_time_ms"]),
            ft(s["slowest_request_time_ms"]), s["request_time_count"],
        ),
        "  parsing  : avg: {}, fastest: {}, slowest: {}, total: {}".format(
            ft(s["average_parsing_time_ms"]), ft(s["fastest_parsing_time_ms"]),
            ft(s["slowest_parsing_time_ms"]), s["parsing_time_count"],
        ),
        f"  status   : {status}",
        "",
    ]
    return "\n".join(lines)
