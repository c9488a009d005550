"""Middleware chain — vectorized rebuild of the reference Middleware trait
(src/crawler/middleware_manager.rs:25-64).

Reference semantics preserved:
- request chain runs in registration order, response chain REVERSED
  (middleware_manager.rs:52-53);
- each middleware maps a record to an action: Continue / Drop /
  Retry(delay) / ReturnResponse (serve from cache) — dispatch at
  src/crawler/request_handler.rs:191-237 (requests) and :304-349
  (responses);
- the first non-Continue action short-circuits the rest of the chain.

Vectorized shape: instead of per-record dispatch, each middleware tags an
``_action`` column on the rows still marked 'continue'; rows tagged
otherwise are frozen (short-circuit). One narrow column per chain — no
shuffle, whole-stage codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACTION = "_action"
RETRY_DELAY = "_retry_delay"

CONTINUE = "continue"
DROP = "drop"
RETRY = "retry"
SERVE = "serve"  # ReturnResponse analog: short-circuit with cached response


class Middleware:
    """Override request_action / response_action to return a Column pair
    (action, retry_delay) evaluated only on still-continuing rows."""

    name = "middleware"

    def request_action(self, df: DataFrame) -> tuple[Column, Column]:
        return F.lit(CONTINUE), F.lit(0)

    def response_action(self, df: DataFrame) -> tuple[Column, Column]:
        return F.lit(CONTINUE), F.lit(0)


def _apply(df: DataFrame, action_col: Column, delay_col: Column) -> DataFrame:
    keep = F.col(ACTION) == CONTINUE
    return df.withColumn(
        RETRY_DELAY,
        F.when(keep, delay_col).otherwise(F.col(RETRY_DELAY)),
    ).withColumn(ACTION, F.when(keep, action_col).otherwise(F.col(ACTION)))


def run_request_chain(df: DataFrame, middlewares: list[Middleware]) -> DataFrame:
    out = df.withColumn(ACTION, F.lit(CONTINUE)).withColumn(RETRY_DELAY, F.lit(0))
    for mw in middlewares:  # registration order (forward)
        a, d = mw.request_action(out)
        out = _apply(out, a, d)
    return out


def run_response_chain(df: DataFrame, middlewares: list[Middleware]) -> DataFrame:
    out = df.withColumn(ACTION, F.lit(CONTINUE)).withColumn(RETRY_DELAY, F.lit(0))
    for mw in reversed(middlewares):  # reference reverses the response chain
        a, d = mw.response_action(out)
        out = _apply(out, a, d)
    return out


# ------------------------------------------------------------- built-ins
class DropUrlPattern(Middleware):
    """Request-side drop by URL regex (counted requests_dropped,
    reference request_handler.rs:215-222)."""

    name = "drop_url_pattern"

    def __init__(self, pattern: str):
        self.pattern = pattern

    def request_action(self, df):
        return (
            F.when(F.col("url").rlike(self.pattern), F.lit(DROP)).otherwise(
                F.lit(CONTINUE)
            ),
            F.lit(0),
        )


class RetryOnStatus(Middleware):
    """Response-side retry for retryable statuses with an epoch delay
    (reference Retry action, request_handler.rs:309-324). Rows exceeding
    max_retries fall through to Drop."""

    name = "retry_on_status"

    def __init__(self, statuses: tuple[int, ...] = (500,), max_retries: int = 1,
                 delay_epochs: int = 1):
        self.statuses = statuses
        self.max_retries = max_retries
        self.delay_epochs = delay_epochs

    def response_action(self, df):
        retryable = F.col("status").isin(list(self.statuses))
        return (
            F.when(
                retryable & (F.col("retry_count") < self.max_retries), F.lit(RETRY)
            )
            .when(retryable, F.lit(DROP))
            .otherwise(F.lit(CONTINUE)),
            F.lit(self.delay_epochs),
        )


class ServeFromCacheRequest(Middleware):
    """Request-side ReturnResponse analog (reference
    src/crawler/request_handler.rs:224-251): requests matching the
    predicate are never sent — they are served from cache instead. The
    engine routes SERVE-tagged requests around the network send (not
    counted requests_sent, fetch_bytes zeroed) but still resolves their
    content from the pages table ("the cache") and hands them to the
    response chain with cached=true, counted responses_from_cache +
    requests_succeeded. Predicate may reference request columns only
    (url, host, depth, retry_count, ...)."""

    name = "serve_from_cache_request"

    def __init__(self, predicate: str):
        self.predicate = predicate

    def request_action(self, df):
        return (
            F.when(F.expr(self.predicate), F.lit(SERVE)).otherwise(
                F.lit(CONTINUE)
            ),
            F.lit(0),
        )


class ServeFromCache(Middleware):
    """Response-side ReturnResponse analog (reference
    request_handler.rs:243-251): rows matching the predicate short-circuit
    the rest of the chain and are counted responses_from_cache (the engine
    sets `cached` for SERVE-tagged rows)."""

    name = "serve_from_cache"

    def __init__(self, predicate: str):
        self.predicate = predicate

    def response_action(self, df):
        return (
            F.when(F.expr(self.predicate), F.lit(SERVE)).otherwise(
                F.lit(CONTINUE)
            ),
            F.lit(0),
        )


class MaxBodySize(Middleware):
    """Response-side drop for oversized bodies."""

    name = "max_body_size"

    def __init__(self, max_bytes: int):
        self.max_bytes = max_bytes

    def response_action(self, df):
        return (
            F.when(F.col("fetch_bytes") > self.max_bytes, F.lit(DROP)).otherwise(
                F.lit(CONTINUE)
            ),
            F.lit(0),
        )
