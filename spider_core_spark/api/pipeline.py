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
import os
import time
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
    """Drop items whose key was already emitted in ANY earlier epoch.

    Cross-epoch state = a keys table under ``state_dir`` (per-epoch parquet
    deltas, anti-joined each epoch and appended after) — distributed, never
    driver memory. Without a ``state_dir`` only within-epoch duplicates are
    dropped (stateless mode). ``seen_count`` is checkpointed so a resumed
    run reports consistent totals (reference get_state/restore_state,
    src/checkpoint.rs:111-115)."""

    name = "dedupe_items"

    def __init__(self, key: str = "url", state_dir: str | None = None):
        self.key = key
        self.state_dir = state_dir
        self.seen_count = 0

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.state_dir, f"epoch={epoch}")

    def _prior_dirs(self, epoch: int) -> list[str]:
        if self.state_dir is None or not os.path.exists(self.state_dir):
            return []
        out = []
        for d in os.listdir(self.state_dir):
            if d.startswith("epoch=") and int(d.split("=")[1]) < epoch:
                out.append(os.path.join(self.state_dir, d))
        return sorted(out)

    def process(self, items, epoch):
        out = items.dropDuplicates([self.key])
        prior = self._prior_dirs(epoch)
        if prior:
            spark = items.sparkSession
            seen_keys = spark.read.schema(f"{self.key} string").parquet(*prior)
            out = out.join(seen_keys, self.key, "left_anti")
        if self.state_dir is not None:
            out = out.persist()
            new_keys = out.select(F.col(self.key).cast("string"))
            new_keys.write.mode("overwrite").parquet(self._epoch_dir(epoch))
            self.seen_count += out.count()
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
    items: DataFrame,
    pipelines: list[Pipeline],
    epoch: int,
    per_pipeline: bool = False,
) -> tuple[DataFrame, int, list[dict]]:
    """Apply pipelines in order; returns (survivors, items_dropped, stats).

    ``per_pipeline=True`` = the A7 mode (reference item_processor.rs:32,
    80-124 tracks (total_time, count) per pipeline name): each pipeline's
    output is counted separately, so stats carries one
    {pipeline, ms, n_in, n_out} row per pipeline at the cost of one count
    job each. Default mode keeps the single lumped count (cheap path)."""
    if not pipelines:
        return items, 0, []
    # cache discipline: each persisted intermediate is released as soon as
    # the NEXT stage has materialized from it — only the final output stays
    # cached for the caller (who unpersists it after the items write). A
    # long crawl otherwise accumulates one stale cache per pipeline per
    # epoch until LRU eviction.
    items = items.persist()
    n_in = items.count()
    out = items
    stats: list[dict] = []
    if per_pipeline:
        prev_n = n_in
        for p in pipelines:
            t0 = time.perf_counter()
            nxt = p.process(out, epoch).persist()
            n_out = nxt.count()
            stats.append(
                {
                    "pipeline": p.name,
                    "ms": (time.perf_counter() - t0) * 1000.0,
                    "n_in": prev_n,
                    "n_out": n_out,
                }
            )
            prev_n = n_out
            if nxt is not out:
                out.unpersist()
            out = nxt
        dropped = n_in - prev_n
        return out, dropped, stats
    for p in pipelines:
        out = p.process(out, epoch)
    out = out.persist()
    dropped = n_in - out.count()
    if out is not items:
        items.unpersist()
    return out, dropped, stats


def agg_null_safe(col: str):
    return F.coalesce(F.sum(col), F.lit(0))
