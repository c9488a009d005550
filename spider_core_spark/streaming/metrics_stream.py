"""Streaming crawl telemetry — the reference's live stats loop
(src/stats.rs:54-95, printed per tick by src/crawler/core.rs) re-expressed
on the two Structured Streaming surfaces the batch engine doesn't touch:

- ``windowed_host_metrics`` — per-host tumbling EVENT-TIME windows with a
  watermark: fetch observations arrive late and out of order (a crawl's
  responses always do), rows later than the watermark are dropped, and a
  window finalizes (append mode) only once the watermark passes its end —
  the distributed answer to "requests/sec per host over the last minute"
  that a driver-side counter can't give at 1000 executors.

- ``host_ema_state`` — a CUSTOM stateful operator via
  ``applyInPandasWithState``: per-host EMA of response time carried in
  managed state across micro-batches (and across restarts via the
  checkpoint), the streaming twin of the engine's A8 per-host feedback
  term. The EMA recursion mirrors ``plans/report.ema_series`` (α = 0.2,
  src/stats.rs:80-89) but in EXACT INTEGER arithmetic —
  ema' = (2·x + 8·ema) div 10 on milliseconds — so state is
  deterministic and replay-stable (no float accumulation drift between a
  run and its checkpoint-recovered twin).

Both operate on the observation schema the engine's metrics sink writes
(host, ts, bytes, status, transport_ms), so a deployment can point them
at the live metrics directory and get a dashboard stream for free.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OBS_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("ts", TimestampType()),
        StructField("bytes", LongType()),
        StructField("status", IntegerType()),
        StructField("transport_ms", LongType()),
    ]
)

# exact-integer EMA, α = 0.2 (= 2/10): mirrors plans/report.ema_series
# which seeds the recursion from 0 (reference initializes *rate = 0.0 and
# folds alpha*x + (1-alpha)*rate, src/stats.rs:80-89)
EMA_NUM, EMA_DEN = 2, 10

_EMA_OUT = StructType(
    [
        StructField("host", StringType()),
        StructField("n_obs", LongType()),
        StructField("ema_ms", LongType()),
        StructField("last_ms", LongType()),
    ]
)
_EMA_STATE = StructType(
    [StructField("ema_ms", LongType()), StructField("n_obs", LongType())]
)


def windowed_host_metrics(
    obs: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-host tumbling-window fetch metrics over event time.

    Append-mode-safe: with the watermark, a window's row is emitted
    exactly once, after the watermark passes window.end — late rows
    within the watermark still count, later ones are dropped by Spark's
    state eviction (bounded state: #hosts x #open-windows, the property
    that keeps this runnable forever on a 1000-executor cluster).
    """
    return (
        obs.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "host")
        .agg(
            F.count("*").cast("long").alias("n_fetches"),
            F.sum("bytes").cast("long").alias("total_bytes"),
            F.sum((F.col("status") >= 400).cast("int"))
            .cast("long")
            .alias("n_errors"),
            F.max("transport_ms").cast("long").alias("max_ms"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_fetches",
            "total_bytes",
            "n_errors",
            "max_ms",
        )
    )


def _ema_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this batch's observations (in ts order — deterministic) into
    the managed per-host state."""
    if state.exists:
        ema, n = state.get
    else:
        ema, n = 0, 0
    last = None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "transport_ms"], kind="mergesort")
        for x in pdf["transport_ms"]:
            x = int(x)
            ema = (EMA_NUM * x + (EMA_DEN - EMA_NUM) * ema) // EMA_DEN
            n += 1
            last = x
    state.update((ema, n))
    if last is None:  # timeout tick or empty group: emit nothing
        return
    yield pd.DataFrame(
        [
            {
                "host": key[0],
                "n_obs": n,
                "ema_ms": ema,
                "last_ms": last,
            }
        ]
    )


def host_ema_state(obs: DataFrame) -> DataFrame:
    """Per-host response-time EMA as a custom stateful streaming
    operator (applyInPandasWithState): one output row per host per
    micro-batch carrying the cumulative integer EMA. State is tiny (two
    int64 per host), partitioned by host — the same shuffle key every
    other per-host operator uses, so a crawl topology co-locates them.
    """
    return obs.groupBy("host").applyInPandasWithState(
        _ema_fn,
        outputStructType=_EMA_OUT,
        stateStructType=_EMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hll_register_stream(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Streaming HyperLogLog: live distinct-URL cardinality over an
    unbounded URL stream (the streaming twin of
    ``plans/demo_queries.u3_hll_registers`` — identical hash layout, so
    batch and streaming sketches are interchangeable and merge by max).

    State is BOUNDED AT 256 ROWS no matter how many URLs flow through —
    a streaming ``count(DISTINCT url)`` would grow state with every new
    URL (and a watermark would silently undercount; distinct URLs never
    expire). max() is monotone, so complete/update output needs no
    watermark and checkpoint recovery resumes the sketch exactly.

    OUTPUT CONTRACT: only OBSERVED buckets are emitted (a streaming agg
    cannot union in a static 0..HLL_M-1 spine the way the batch
    ``u3_hll_registers`` left-joins one). ``hll_estimate`` takes
    ``m = len(registers)``, so NEVER feed it the collected rows
    directly — zero-pad to the full HLL_M spine first via
    ``hll_pad_registers`` (what ``scripts/corpus_report.py`` does).

    Works unchanged on a BATCH DataFrame (same plan, one combinable
    aggregation) — used by the parity test.
    """
    from spider_core_spark.functions.hashing import h64_col
    from spider_core_spark.plans.demo_queries import _HLL_WBITS, HLL_M

    rho_max = _HLL_WBITS + 1
    return (
        urls.select(h64_col(F.col(url_col)).alias("_h"))
        .select(
            (F.col("_h") % HLL_M).cast("long").alias("bucket"),
            F.expr(f"_h div {HLL_M}").alias("_w"),
        )
        .select(
            "bucket",
            F.expr(
                f"CASE WHEN _w = 0 THEN {rho_max} "
                f"ELSE {rho_max} - length(ltrim('0', bin(_w))) END"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("register"))
    )


def hll_pad_registers(rows) -> list[int]:
    """Zero-pad collected ``hll_register_stream`` rows to the full
    ``HLL_M`` spine — the form ``plans.demo_queries.hll_estimate``
    expects (its ``m`` is ``len(registers)``; feeding only observed
    buckets would shrink m and skew the estimate — round-4 ADVICE).
    Accepts Row objects or (bucket, register) tuples."""
    from spider_core_spark.plans.demo_queries import HLL_M

    full = [0] * HLL_M
    for r in rows:
        bucket, register = (
            (r["bucket"], r["register"]) if hasattr(r, "asDict") else (r[0], r[1])
        )
        full[int(bucket)] = int(register)
    return full
