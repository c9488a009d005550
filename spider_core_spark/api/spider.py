"""Spider — the user extension point (reference `Spider` trait,
src/spider.rs:101-130: start_urls(), async parse(&self, Response, &State)).

parse is `&self` in the reference (stateless, note at src/spider.rs:125-127)
— here it is a pure pandas batch function, which is the same contract made
explicit: no per-row Python, no shared mutable state, safe to run on any
executor at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spider_core_spark.operators.parse import default_parse_frame


@dataclass
class Spider:
    name: str = "spider"
    start_urls: list[str] = field(default_factory=list)
    # (pd.DataFrame[url, html]) -> pd.DataFrame[title, text, links]
    parse_frame: Callable[[pd.DataFrame], pd.DataFrame] = staticmethod(
        default_parse_frame
    )
    # False → items carry no text column (cuts the items sink's bytes ~10×
    # when the downstream pipeline only needs metadata)
    item_text: bool = True
    # optional SQL expression over (url, host, depth) assigning discovered
    # requests a priority (lower = fetched sooner; seeds stay 0) — the
    # priority-frontier hook. None = pure FIFO like the reference.
    priority_expr: str | None = None
    # start_requests (reference src/spider.rs:112-121: start_requests()
    # overridable separately from start_urls(), emitting full Requests):
    # a list of dicts, each {"url": str, "priority": int = 0,
    # "depth": int = 0, "not_before_epoch": int = 0,
    # "meta": dict[str, str] | None = None}. Takes precedence over
    # start_urls; list order = seq (FIFO tiebreak), and every row goes
    # through the same normalize/fingerprint path as plain URL seeds.
    # meta rides the frontier row and is visible to middlewares.
    start_requests: list[dict] | None = None

    def build_items(self, parsed: DataFrame, epoch: int) -> DataFrame:
        """Parsed rows → items DataFrame (ITEMS schema). Override for custom
        item shapes (the reference's #[scraped_item] structs,
        src/lib.rs:13-17)."""
        text = (
            F.col("parsed.text") if self.item_text else F.lit(None).cast("string")
        )
        return parsed.select(
            F.col("url"),
            F.col("parsed.title").alias("title"),
            text.alias("text"),
            F.col("lang"),
            F.size("parsed.links").cast("int").alias("n_links"),
            F.lit(epoch).cast("int").alias("epoch"),
            F.spark_partition_id().alias("partition_id"),
        )
