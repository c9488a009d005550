"""Streaming corpus ingestion — the training-data side of the §2.I
streaming variant (beyond-reference: spider-core has no corpus module;
this is the Structured-Streaming shape of textops.analysis.corpus_keepers).

Documents arrive as parquet drops in an input directory (the shape a
continuous crawl→corpus pipeline produces: scripts/crawl_to_corpus.py
appends a documents dir per run). Every micro-batch:

1. **exact dedup, cross-batch**: content fingerprint = sha256(text);
   within-batch keep-first is min(doc_id) per fingerprint, then an
   anti-join against the PERSISTED fingerprint set — the stream analog of
   ``exact_dedup``'s min-doc_id keeper rule, and the same
   persisted-seen-table pattern the streaming crawl engine uses (no
   driver state, no unbounded state store: the fingerprint set is a
   parquet table, compacted periodically exactly like stream_seen).
   A duplicate of a LOW-QUALITY doc is still a duplicate: every fresh
   fingerprint is marked seen, kept or not.
2. **quality gate**: ``textops.analysis.quality_score_frame`` — the
   identical expressions (and threshold) as the batch pipeline, so
   stream output provably equals the batch run on the same rows.
3. **append**: kept docs land in one overwritten directory per batch id
   (idempotent under at-least-once replay, like the crawl engine's items
   sink), plus a 1-row metrics parquet per batch.

Scale: every step is a bounded-batch join against sharded parquet state —
the fingerprint table is append-only and compacts every
``compact_seen_every`` batches; at 10^10 docs it shards exactly like the
crawl seen set (SCALE.md), and the quality gate is pure JVM expression.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_core_spark.sources.corpus_io import DOC_COLS, DOCUMENTS_SCHEMA
from spider_core_spark.textops.analysis import (
    QUALITY_KEEP_MIN,
    quality_score_frame,
)

_FP_SCHEMA = "content_fp string, batch_id int"
_METRICS_SCHEMA = (
    "batch_id int, n_in long, n_dup long, n_lowq long, n_kept long, "
    "n_tokens_kept long"
)


class CorpusIngestStream:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        quality_min: float = QUALITY_KEEP_MIN,
        compact_seen_every: int = 8,
        max_files_per_trigger: int = 16,
    ):
        self.spark = spark
        self.workdir = workdir
        self.quality_min = quality_min
        self.compact_seen_every = compact_seen_every
        self.max_files_per_trigger = max_files_per_trigger

    # ------------------------------------------------------------ dirs
    @property
    def _fp_dir(self):
        return os.path.join(self.workdir, "ingest_fp")

    @property
    def _kept_dir(self):
        return os.path.join(self.workdir, "ingest_kept")

    @property
    def _metrics_dir(self):
        return os.path.join(self.workdir, "ingest_metrics")

    def _read_fps(self) -> DataFrame:
        if os.path.exists(self._fp_dir) and os.listdir(self._fp_dir):
            return self.spark.read.schema(_FP_SCHEMA).parquet(
                self._fp_dir + "/*"
            )
        return self.spark.createDataFrame([], _FP_SCHEMA)

    def _compact_fps(self, batch_id: int) -> None:
        import shutil

        olds = sorted(os.listdir(self._fp_dir))
        if len(olds) < 2:
            return
        tmp = os.path.join(self._fp_dir, f"compact_{batch_id}_tmp")
        self._read_fps().groupBy("content_fp").agg(
            F.min("batch_id").alias("batch_id")
        ).write.mode("overwrite").parquet(tmp)
        for d in olds:
            shutil.rmtree(os.path.join(self._fp_dir, d), ignore_errors=True)
        os.rename(tmp, os.path.join(self._fp_dir, f"compact_{batch_id}"))

    # ----------------------------------------------------------- batch
    def _process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        bid = int(batch_id)
        if (
            self.compact_seen_every
            and bid > 0
            and bid % self.compact_seen_every == 0
        ):
            self._compact_fps(bid)

        b = batch.withColumn("content_fp", F.sha2("text", 256)).persist()
        n_in = b.count()

        # within-batch keep-first (min doc_id per fingerprint — the
        # exact_dedup keeper rule), then cross-batch anti-join
        first = b.groupBy("content_fp").agg(F.min("doc_id").alias("doc_id"))
        # anti-join against fingerprints from OTHER batches only: rows
        # tagged with this batch id are leftovers of a crashed attempt of
        # THIS batch (at-least-once replay) — counting them would turn a
        # replay into a silent full drop of the batch
        fresh = (
            b.join(first, ["content_fp", "doc_id"])
            .join(
                self._read_fps()
                .filter(F.col("batch_id") != bid)
                .select("content_fp"),
                "content_fp",
                "left_anti",
            )
            .persist()
        )
        n_fresh = fresh.count()

        scored = fresh.join(
            quality_score_frame(fresh).select("doc_id", "quality_score"),
            "doc_id",
        )
        kept = scored.filter(F.col("quality_score") >= self.quality_min)

        # idempotent per-batch sinks (replay rewrites, never re-appends)
        kept_path = os.path.join(self._kept_dir, f"b_{bid}")
        kept.select(
            *DOC_COLS, "content_fp", "quality_score"
        ).write.mode("overwrite").parquet(kept_path)
        # metrics from the MATERIALIZED sink (no recompute of the kept plan)
        n_kept, n_tok = (
            self.spark.read.parquet(kept_path)
            .agg(
                F.count("*"),
                F.coalesce(
                    F.sum(F.size(F.split("text", " "))), F.lit(0)
                ).cast("long"),
            )
            .collect()
        )[0]

        # every fresh fingerprint becomes seen — kept or quality-dropped
        fresh.select(
            "content_fp", F.lit(bid).cast("int").alias("batch_id")
        ).write.mode("overwrite").parquet(
            os.path.join(self._fp_dir, f"b_{bid}")
        )
        self.spark.createDataFrame(
            [(bid, n_in, n_in - n_fresh, n_fresh - n_kept, n_kept,
              int(n_tok))],
            _METRICS_SCHEMA,
        ).write.mode("overwrite").parquet(
            os.path.join(self._metrics_dir, f"b_{bid}")
        )
        fresh.unpersist()
        b.unpersist()
        self._progress = time.monotonic()

    # --------------------------------------------------------------- run
    def run(self, docs_dir: str) -> dict:
        """Drain everything currently in ``docs_dir`` (availableNow) and
        return readers over the cumulative state. Re-running on the same
        workdir picks up only NEW files (the stream checkpoint carries
        the file ledger) — continuous ingestion across process restarts."""
        spark = self.spark
        self._progress = time.monotonic()
        stream = (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(docs_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option(
                "checkpointLocation",
                os.path.join(self.workdir, "ingest_ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            "kept": self.kept(),
            "fingerprints": self._read_fps(),
            "metrics": self.metrics(),
        }

    def kept(self) -> DataFrame:
        if os.path.exists(self._kept_dir) and os.listdir(self._kept_dir):
            return self.spark.read.schema(
                DOCUMENTS_SCHEMA + ", content_fp string, quality_score double"
            ).parquet(self._kept_dir + "/*")
        return self.spark.createDataFrame(
            [], DOCUMENTS_SCHEMA + ", content_fp string, quality_score double"
        )

    def metrics(self) -> DataFrame:
        if os.path.exists(self._metrics_dir) and os.listdir(self._metrics_dir):
            return self.spark.read.schema(_METRICS_SCHEMA).parquet(
                self._metrics_dir + "/*"
            )
        return self.spark.createDataFrame([], _METRICS_SCHEMA)
