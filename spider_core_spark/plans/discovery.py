"""Sitemap-driven URL discovery (sitemaps.org protocol, public) feeding
the engine's seed path — the push channel next to link extraction and
the recrawl loop (plans/recrawl.py):

1. ``parse_sitemaps(blobs)`` — extract every ``<loc>`` from per-host
   sitemap XML blobs into ordered (host, seq, url) rows. Same expression
   the driver-gated ``s9_sitemap_parse`` query certifies bit-for-bit
   against DuckDB. Narrow per-blob regexp — partition-parallel across
   hosts, no shuffle.
2. ``sitemap_start_requests(blobs)`` — the parsed entries as
   ``Spider.start_requests`` dicts (priority = global (host, seq) rank,
   meta marks the discovery channel), bounded by ``limit`` like
   ``recrawl.due_start_requests`` — a wave-sized driver collect, the
   same size class the engine already collects for seeds.

The reference discovers URLs only by parsing fetched pages
(src/crawler/response_parser.rs); sitemap ingestion is the
engine-added discovery surface a production crawl runs alongside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SITEMAP_LOC_PATTERN = "<loc>([^<]+)</loc>"


def parse_sitemaps(
    blobs: DataFrame, xml_col: str = "xml", host_col: str = "host"
) -> DataFrame:
    """(host, seq, url) rows per sitemap entry, in document order."""
    return blobs.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.expr(
                f"regexp_extract_all({xml_col}, '{SITEMAP_LOC_PATTERN}', 1)"
            )
        ).alias("seq", "url"),
    ).select("host", F.col("seq").cast("long").alias("seq"), "url")


def sitemap_start_requests(
    blobs: DataFrame,
    xml_col: str = "xml",
    host_col: str = "host",
    limit: int = 100_000,
) -> list[dict]:
    """Parsed sitemap entries as Spider.start_requests dicts.

    priority = rank by (host, seq) — document order within a host,
    hosts interleaved deterministically; lower fetches sooner, matching
    the frontier's ordering contract."""
    rows = (
        parse_sitemaps(blobs, xml_col=xml_col, host_col=host_col)
        .orderBy(F.asc("host"), F.asc("seq"))
        .limit(int(limit))
        .collect()
    )
    return [
        {"url": r["url"], "priority": i, "meta": {"discovered": "sitemap"}}
        for i, r in enumerate(rows)
    ]
