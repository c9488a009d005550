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
    blobs: DataFrame,
    xml_col: str = "xml",
    host_col: str = "host",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(host, *extra_cols, seq, url) rows per sitemap entry, in document
    order. ``extra_cols`` pass through untouched (e.g. the robots
    directive rank when the blob came from a ``Sitemap:`` line)."""
    return blobs.select(
        F.col(host_col).alias("host"),
        *[F.col(c) for c in extra_cols],
        F.posexplode(
            F.expr(
                f"regexp_extract_all({xml_col}, '{SITEMAP_LOC_PATTERN}', 1)"
            )
        ).alias("seq", "url"),
    ).select(
        "host",
        *extra_cols,
        F.col("seq").cast("long").alias("seq"),
        "url",
    )


def sitemaps_from_robots(
    pages: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The full push-discovery chain a production crawl runs: robots.txt
    ``Sitemap:`` directives resolved against the corpus itself — the
    advertised sitemap URL's own fetched page supplies the XML blob —
    then every ``<loc>`` parses into ordered frontier rows.

    Output (host, sm_seq, seq, url): ``sm_seq`` = the directive's rank
    within its robots.txt, ``seq`` = document order within that sitemap.
    The blob join is INNER on purpose: an advertised-but-unfetched
    sitemap contributes nothing, exactly like a link to an unfetched
    page (fetch it next epoch and it will).

    Scale: directive extraction is a narrow pass over the robots rows
    only; the blob resolution is one equi-join on the sitemap url —
    sitemap pages are a vanishing fraction of a CC-style corpus, so the
    directive side broadcasts; parsing stays partition-parallel per
    blob with no further shuffle."""
    from spider_core_spark.sources.robots import sitemap_urls

    su = sitemap_urls(pages, text_col=text_col)
    blobs = pages.select(
        F.col("url").alias("sitemap_url"),
        F.col(text_col).alias("_sm_xml"),
    )
    return parse_sitemaps(
        su.join(blobs, "sitemap_url"),
        xml_col="_sm_xml",
        extra_cols=("sm_seq",),
    )


def robots_sitemap_start_requests(
    pages: DataFrame, text_col: str = "text", limit: int = 100_000
) -> list[dict]:
    """``sitemaps_from_robots`` entries as Spider.start_requests dicts —
    priority = global (host, sm_seq, seq) rank, meta marks the channel.
    Bounded driver collect, same size class as the engine's seed list."""
    rows = (
        sitemaps_from_robots(pages, text_col=text_col)
        .orderBy(F.asc("host"), F.asc("sm_seq"), F.asc("seq"))
        .limit(int(limit))
        .collect()
    )
    return [
        {
            "url": r["url"],
            "priority": i,
            "meta": {"discovered": "robots-sitemap"},
        }
        for i, r in enumerate(rows)
    ]


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
