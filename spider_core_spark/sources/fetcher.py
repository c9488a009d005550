"""Fetch stage (reference Downloader trait, src/lib.rs:51,
src/builder.rs:104-117; invoked at src/crawler/request_handler.rs:253-296).

In this engine "the web" is a Common-Crawl-style pages table, so fetch is
an equi-join of the wave against it (SURVEY.md J1): inner semantics give
responses, LEFT semantics additionally keep misses as fetch failures
(status NULL → requests_failed). The originating request's columns ride
along through the join, so the reference's response→request back-pointer
(request_from_response, src/crawler/request_handler.rs:299,353) needs no
second join.

Scale notes:
- the wave is politeness/backpressure-capped and tiny next to the pages
  table → broadcast the WAVE side (we mark it explicitly rather than
  trusting the 10 MB autoBroadcast default);
- the join keys the pages scan by url: with an Iceberg table
  bucketed/sorted by url this becomes a storage-partitioned join with no
  pages-side shuffle; on raw parquet AQE handles it;
- hot-host skew is defused before UDF-heavy downstream stages by salted
  repartitioning on (host_hash, salt) — `salt_repartition`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_core_spark.functions.hashing import h64_col


class JoinFetcher:
    """Resolve a wave of requests against a pages table.

    ``storage_level``: cache level for the responses (they are read twice —
    counters agg, then parse). "DISK_ONLY" keeps multi-GB html waves off
    the heap for big steady-state waves; default keeps memory speed."""

    def __init__(self, pages: DataFrame, storage_level: str = "MEMORY_AND_DISK"):
        # normalize: keep only the response columns fetch produces.
        # `location` (3xx redirect target, absolute URL) is optional — a
        # pages table without it disables redirect handling entirely.
        cols = ["url", "warc_ts", "html", "text", "lang"]
        if "location" in pages.columns:
            cols.append("location")
        status = (
            F.col("status")
            if "status" in pages.columns
            else F.lit(200).cast("int")
        )
        self.pages = pages.select(*cols, status.alias("status"))
        self.storage_level = storage_level

    def fetch(
        self, wave: DataFrame, broadcast_wave: bool = True, persist: bool = True
    ) -> tuple[DataFrame, DataFrame]:
        """Returns (responses, misses).

        A naive ``wave LEFT JOIN pages`` cannot broadcast the wave (Spark
        only broadcasts the right side of a left-outer), so it would
        shuffle the pages table — fatal at Common-Crawl scale. Instead:
        inner join with the wave broadcast (pages side streams with zero
        shuffle; AQE's runtime bloom filter prunes the scan), then misses
        = wave anti-join the hit urls (both sides wave-sized).

        ``broadcast_wave=False`` is the scale fallback for waves past the
        executor broadcast budget (engine gates on
        CrawlConfig.broadcast_wave_max): a shuffle join on url — with the
        pages table bucketed/sorted by url (Iceberg) this is a
        storage-partitioned join with no pages-side shuffle; on raw
        parquet AQE plans it. The miss anti-join drops its broadcast hint
        too (hit set is wave-sized, no longer small).

        Responses carry the originating request's columns, so the
        reference's response→request back-pointer (request_from_response,
        src/crawler/request_handler.rs:299,353) needs no second join. Adds
        `cached` (a CacheServe middleware may pre-serve rows, reference
        request_handler.rs:243-251) and `fetch_bytes`.
        """
        w = F.broadcast(wave) if broadcast_wave else wave
        resp_cols = [c for c in self.pages.columns if c != "url"]
        responses = (
            w.join(self.pages, "url", "inner")
            .withColumn("cached", F.lit(False))
            .withColumn(
                "fetch_bytes", F.coalesce(F.length("html"), F.lit(0)).cast("long")
            )
        )
        if persist:
            from pyspark import StorageLevel

            responses = responses.persist(getattr(StorageLevel, self.storage_level))
        hit_urls = responses.select("url")
        misses = wave.join(
            F.broadcast(hit_urls) if broadcast_wave else hit_urls,
            "url",
            "left_anti",
        )
        for c in resp_cols:
            misses = misses.withColumn(c, F.lit(None).cast(dict(self.pages.dtypes)[c]))
        misses = misses.withColumn("cached", F.lit(False)).withColumn(
            "fetch_bytes", F.lit(0).cast("long")
        )
        return responses, misses


class HttpFetcher:
    """Live-web fetcher: per-partition transport loop inside mapInPandas —
    the Spark rebuild of the reference's pluggable Downloader
    (src/lib.rs:51) whose default is a reqwest client per worker
    (src/builder.rs:104-117).

    ``transport_factory``: zero-arg picklable callable returning a
    ``transport(url: str, timeout_s: float) -> dict | None``. The factory
    runs ONCE per partition inside the UDF (the per-partition client: a
    real implementation returns e.g. a pooled urllib3/requests session;
    tests inject a dict-backed fake). The transport returns
    ``{"status": int, "html": bytes|None, "text": str|None,
    "lang": str|None, "warc_ts": datetime|None}`` for a completed exchange
    (any status — 500s are responses, not errors), or ``None`` / raises
    for a transport-level failure (timeout, DNS, connection reset).

    Failure mapping matches JoinFetcher's miss model: failed rows are
    EXCLUDED from the responses frame, so the engine's arithmetic
    (failed = dispatched − received; A8 per-host errors =
    sent − responded) is identical across both fetchers — no status-null
    rows to special-case downstream.

    Scale notes: the wave arrives politeness-capped; callers wanting
    per-host connection reuse should `salt_repartition` (or
    repartition(host_hash)) first so one partition ≈ few hosts. Arrow
    batches bound per-task memory; bytes are counted off the wire
    (len(html)) exactly like the reference's add_bytes_downloaded.
    """

    def __init__(self, transport_factory, timeout_s: float = 10.0):
        self.transport_factory = transport_factory
        self.timeout_s = timeout_s

    def fetch(
        self, wave: DataFrame, broadcast_wave: bool = True, persist: bool = False
    ) -> tuple[DataFrame, None]:
        """Returns (responses, None) — same contract as JoinFetcher.fetch
        minus the misses frame (misses are whatever the transport failed;
        the engine never consumes the misses frame, it counts
        arithmetically). Input columns ride through unchanged (the
        response→request back-pointer, request_handler.rs:299,353)."""
        from pyspark.sql import types as T

        out_schema = T.StructType(
            list(wave.schema.fields)
            + [
                T.StructField("warc_ts", T.TimestampType(), True),
                T.StructField("html", T.BinaryType(), True),
                T.StructField("text", T.StringType(), True),
                T.StructField("lang", T.StringType(), True),
                T.StructField("status", T.IntegerType(), True),
                T.StructField("cached", T.BooleanType(), False),
                T.StructField("fetch_bytes", T.LongType(), False),
                # per-URL wall time of the transport exchange (the
                # reference's record_request_time); feeds the A8 adaptive
                # time term. A transport may override with an explicit
                # "transport_ms" (deterministic replay/testing).
                T.StructField("transport_ms", T.DoubleType(), True),
            ]
        )
        factory = self.transport_factory
        timeout_s = self.timeout_s
        in_cols = wave.columns

        def _fetch_partition(batches):
            import time as _time

            import pandas as pd

            transport = factory()  # one client per partition
            for pdf in batches:
                keep_idx, resp_rows = [], []
                for i, u in enumerate(pdf["url"]):
                    t0 = _time.perf_counter()
                    try:
                        r = transport(u, timeout_s)
                    except Exception:
                        r = None  # timeout / connection error → miss
                    if r is None:
                        continue
                    measured_ms = (_time.perf_counter() - t0) * 1000.0
                    html = r.get("html")
                    resp_rows.append(
                        {
                            "warc_ts": r.get("warc_ts"),
                            "html": html,
                            "text": r.get("text"),
                            "lang": r.get("lang"),
                            "status": r.get("status"),
                            "cached": bool(r.get("cached", False)),
                            "fetch_bytes": len(html) if html is not None else 0,
                            "transport_ms": float(
                                r.get("transport_ms", measured_ms)
                            ),
                        }
                    )
                    keep_idx.append(i)
                kept = pdf.iloc[keep_idx].reset_index(drop=True)
                resp = pd.DataFrame(
                    resp_rows,
                    columns=[
                        "warc_ts", "html", "text", "lang", "status",
                        "cached", "fetch_bytes", "transport_ms",
                    ],
                )
                out = pd.concat([kept[in_cols], resp], axis=1)
                if out.empty:
                    # keep dtypes stable for Arrow on empty batches
                    out = out.astype(
                        {"status": "Int32", "fetch_bytes": "int64",
                         "cached": "bool"},
                        errors="ignore",
                    )
                yield out

        responses = wave.mapInPandas(_fetch_partition, schema=out_schema)
        if persist:
            from pyspark import StorageLevel

            responses = responses.persist(StorageLevel.MEMORY_AND_DISK)
        return responses, None


def salt_repartition(df: DataFrame, n_partitions: int, salt: int) -> DataFrame:
    """Spread hot hosts across `salt` partitions: repartition on
    (host_hash, pmod(h64(url), salt)). One hot host receiving ~30% of the
    wave otherwise serializes ~30% of UDF work onto one task."""
    return df.repartition(
        n_partitions, F.col("host_hash"), F.pmod(h64_col(F.col("url")), F.lit(salt))
    )
