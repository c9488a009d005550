"""Parse stage: vectorized text/link extraction + link candidate expansion.

The reference hands each Response to `Spider::parse` on a pool of parser
workers (src/crawler/response_parser.rs:104-132, user parse invoked at
:110), then splits the ParseOutput into items and new requests
(:267-369, enqueue order = emission order :295-328). Here parse is one
Arrow-batched pandas UDF over (url, html) producing a struct
(title, text, links); links explode positionally so the discovery order
(parent wave rank, link position) survives into the frontier `seq`.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from spider_core_spark import schemas
from spider_core_spark.functions import url as urlfn
from spider_core_spark.functions.textextract import extract, resolve_link
from spider_core_spark.operators import frontier as frontier_mod
from spider_core_spark.operators.frontier import child_seq_col


def default_parse_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """(url, html) batch → (title, text, links) batch; links resolved to
    absolute form. Pure function of its inputs — shared with the simulator
    so extracted text is byte-identical by construction."""
    titles, texts, links_out = [], [], []
    for base_url, html in zip(pdf["url"], pdf["html"]):
        if html is None:
            titles.append(None)
            texts.append(None)
            links_out.append([])
            continue
        title, text, hrefs = extract(html)
        resolved = []
        for h in hrefs:
            r = resolve_link(base_url, h)
            if r is not None:
                resolved.append(r)
        titles.append(title)
        texts.append(text)
        links_out.append(resolved)
    return pd.DataFrame({"title": titles, "text": texts, "links": links_out})


def make_parse_udf(parse_frame=default_parse_frame, schema: StructType | None = None):
    """Parse UDF with real A3/A4 timing (reference src/stats.rs:378-463
    tracks per-URL fetch/parse durations). In the join-fetch world a per-URL
    fetch wall doesn't exist, so the measured analogs are:

    - ``fetch_ms``: time the upstream pipeline (pages scan + broadcast
      join + Arrow transfer) took to FEED each batch — the gap between
      finishing the previous batch and receiving the next one inside the
      iterator (first batch: since the task's iterator was opened);
    - ``parse_ms``: UDF compute time for the batch;

    both divided evenly across the batch's rows. Real measurements riding
    the existing fused pass — the iterator UDF form exists exactly so the
    feed gap is observable (a scalar pandas UDF sees only its own batch;
    PySpark forks a fresh worker per task, so cross-batch module state
    doesn't survive)."""
    schema = schema or schemas.PARSED

    @F.pandas_udf(schema)
    def parse_udf(
        batches: Iterator[tuple[pd.Series, pd.Series]],
    ) -> Iterator[pd.DataFrame]:
        import time

        t_prev = time.perf_counter()
        for url, html in batches:
            t_in = time.perf_counter()
            out = parse_frame(pd.DataFrame({"url": url, "html": html}))
            t_out = time.perf_counter()
            n = max(len(out), 1)
            out["fetch_ms"] = (t_in - t_prev) * 1000.0 / n
            out["parse_ms"] = (t_out - t_in) * 1000.0 / n
            t_prev = t_out
            yield out

    return parse_udf


def apply_parse(fetched_ok: DataFrame, parse_frame=default_parse_frame) -> DataFrame:
    """Attach parsed struct columns to successfully fetched rows."""
    udf = make_parse_udf(parse_frame)
    return fetched_ok.withColumn("parsed", udf(F.col("url"), F.col("html")))


def link_candidates(
    parsed: DataFrame,
    epoch: int,
    priority_expr: str | None = None,
    canonicalize: bool = False,
) -> DataFrame:
    """Explode out-links into FRONTIER-schema candidate rows.

    seq = f(epoch, parent wave_rank, link position) keeps the reference's
    emission order (response_parser.rs:295-328) as a sortable column.

    ``priority_expr``: optional SQL expression over (url, host, depth)
    assigning each discovered request a priority (lower = sooner) — the
    priority-frontier hook; the wave order is (priority, seq), so the
    default 0 reproduces the reference's pure FIFO.
    """
    # slice to the seq packing's link_pos capacity: a >4096-out-link page
    # would otherwise bleed link_pos into the parent_rank field and corrupt
    # the total order (links beyond the cap are dropped — the analog of the
    # reference's bounded enqueue, and far above its graphs' out-degree)
    ex = parsed.select(
        F.col("wave_rank").alias("_parent_rank"),
        (F.col("depth") + 1).alias("depth"),
        F.posexplode(
            F.slice(F.col("parsed.links"), 1, frontier_mod.MAX_LINKS_PER_PAGE)
        ).alias("_pos", "_raw_url"),
    )
    norm = (
        urlfn.canonicalize_url_col(F.col("_raw_url"))
        if canonicalize
        else urlfn.normalize_url_col(F.col("_raw_url"))
    )
    ex = ex.select(
        norm.alias("url"),
        urlfn.host_col(norm).alias("host"),
        "depth",
        "_parent_rank",
        "_pos",
    )
    prio = (
        F.expr(priority_expr).cast("int")
        if priority_expr
        else F.lit(0).cast("int")
    )
    return ex.select(
        "url",
        urlfn.fingerprint_col(F.col("url")).alias("fingerprint"),
        "host",
        urlfn.host_hash_col(F.col("host")).alias("host_hash"),
        F.col("depth").cast("int"),
        prio.alias("priority"),
        child_seq_col(epoch, F.col("_parent_rank"), F.col("_pos")).alias("seq"),
        F.lit(0).cast("int").alias("retry_count"),
        F.lit(0).cast("int").alias("not_before_epoch"),
        F.lit("pending").alias("state"),
        F.lit(epoch + 1).cast("int").alias("epoch_added"),
        # discovered links carry no user meta (only Spider.start_requests
        # seeds do, reference src/spider.rs:112-121)
        F.lit(None).cast("map<string,string>").alias("meta"),
    )


def redirect_candidates(
    redirected: DataFrame, epoch: int, canonicalize: bool = False
) -> DataFrame:
    """3xx responses → FRONTIER-schema candidates for their `location`.

    Beyond-reference semantics (the reference has no 3xx handling): the
    redirect target re-enters at the request's OWN depth (a redirect is
    the same logical page, not a link hop) and inherits its priority; seq
    packs as (epoch, parent wave_rank, pos=0) — a redirect response is
    never also parsed, so pos 0 cannot collide with a link position from
    the same rank. Locations are absolute URLs by contract (the fixture
    and the Location header in practice); they go through the same
    normalize/canonicalize + fingerprint path as discovered links, so
    enqueue-time dedup — including the seen mark on the redirect SOURCE —
    breaks redirect cycles without any hop counter in the frontier."""
    norm = (
        urlfn.canonicalize_url_col(F.col("location"))
        if canonicalize
        else urlfn.normalize_url_col(F.col("location"))
    )
    ex = redirected.select(
        norm.alias("url"),
        F.col("depth").cast("int").alias("depth"),
        F.col("priority").cast("int").alias("priority"),
        F.col("wave_rank").alias("_parent_rank"),
    )
    return ex.select(
        "url",
        urlfn.fingerprint_col(F.col("url")).alias("fingerprint"),
        urlfn.host_col(F.col("url")).alias("host"),
        urlfn.host_hash_col(urlfn.host_col(F.col("url"))).alias("host_hash"),
        "depth",
        "priority",
        child_seq_col(epoch, F.col("_parent_rank"), F.lit(0)).alias("seq"),
        F.lit(0).cast("int").alias("retry_count"),
        F.lit(0).cast("int").alias("not_before_epoch"),
        F.lit("pending").alias("state"),
        F.lit(epoch + 1).cast("int").alias("epoch_added"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
