"""Checkpoint / resume (reference src/checkpoint.rs:99-152 — msgpack
snapshot with write-to-tmp + atomic rename at :137-148; periodic timer task
src/crawler/core.rs:212-258; restore src/builder.rs:309-344).

Spark rebuild: state lives in tables, not a process snapshot —
- frontier  → full compacted snapshot per checkpointed epoch (pending rows
              only; the analog of request_queue + salvaged_requests in the
              reference checkpoint, src/checkpoint.rs:71-79);
- seen      → append-only per-epoch partitions (never rewritten: at 10^10
              fingerprints a rewrite-per-epoch would dominate the crawl);
- items / metrics / order → append-only per-epoch partitions;
- manifest.json (atomic tmp+os.replace, same trick as the reference)
  records last committed epoch, totals and pipeline states
  (src/checkpoint.rs:87 pipelines map analog).

Resume = read manifest → load frontier snapshot + all seen partitions ≤
epoch. A killed run restarts at the first uncommitted epoch without
re-fetching anything committed — on Iceberg these per-epoch commits are
real table snapshots; on raw parquet the directory layout plays that role.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_core_spark import schemas


class CheckpointStore:
    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        self.manifest_path = os.path.join(workdir, "manifest.json")

    # ------------------------------------------------------------ layout
    def frontier_dir(self, epoch: int) -> str:
        return os.path.join(self.workdir, "snap", f"epoch_{epoch}", "frontier")

    def seen_dir(self, epoch: int) -> str:
        return os.path.join(self.workdir, "seen", f"epoch={epoch}")

    def seen_compact_dir(self, epoch: int) -> str:
        return os.path.join(self.workdir, "seen_compact", f"epoch={epoch}")

    def seen_evict_dir(self, epoch: int) -> str:
        return os.path.join(self.workdir, "seen_evict", f"epoch={epoch}")

    def epoch_dir(self, kind: str, epoch: int) -> str:
        return os.path.join(self.workdir, kind, f"epoch={epoch}")

    # ------------------------------------------------------------ manifest
    def write_manifest(self, manifest: dict[str, Any]) -> None:
        os.makedirs(self.workdir, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        os.replace(tmp, self.manifest_path)  # atomic, like checkpoint.rs:137-148

    def read_manifest(self) -> dict[str, Any] | None:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            return json.load(f)

    # ------------------------------------------------------------ state io
    def reset(self) -> None:
        if os.path.exists(self.workdir):
            shutil.rmtree(self.workdir)
        os.makedirs(self.workdir, exist_ok=True)

    def write_frontier(self, frontier: DataFrame, epoch: int) -> DataFrame:
        path = self.frontier_dir(epoch)
        frontier.write.mode("overwrite").parquet(path)
        return self.spark.read.schema(schemas.FRONTIER).parquet(path)

    def write_seen_delta(self, new_seen: DataFrame, epoch: int) -> None:
        new_seen.write.mode("overwrite").parquet(self.seen_dir(epoch))

    def write_seen_eviction(self, fps: DataFrame, epoch: int) -> None:
        """Tombstone delta (the Iceberg equality-delete analog, with
        `epoch` playing the sequence number): rows of `fps` (one
        `fingerprint` column) are evicted from every seen row whose
        epoch_marked <= `epoch`. A fingerprint RE-ADDED by a later epoch's
        delta (epoch_marked > epoch) survives — so recrawl eviction and
        the subsequent refetch compose without rewriting history, exactly
        like Iceberg merge-on-read deletes. Used by plans/recrawl.py's
        in-place continuous mode; the 10^10 win is that eviction is an
        O(|due|) delta write, never a rewrite of the 10^10-row seen table
        (that fold happens lazily at the next compact_seen). A second
        eviction at the same epoch MERGES with the first (tmp write +
        atomic swap — never a read-and-overwrite of the same dir)."""
        final = self.seen_evict_dir(epoch)
        df = fps.select("fingerprint").withColumn(
            "evict_epoch", F.lit(int(epoch)).cast("int")
        )
        if os.path.exists(final):
            df = df.unionByName(
                self.spark.read.schema(
                    "fingerprint string, evict_epoch int"
                ).parquet(final)
            )
        tmp = final + ".tmp"
        df.distinct().write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)

    def read_seen(self, up_to_epoch: int) -> DataFrame:
        """Latest compacted snapshot ≤ up_to_epoch plus the per-epoch deltas
        after it — keeps the read O(epochs since compaction) instead of
        O(all epochs) (a 10^3-epoch crawl would otherwise union 10^3
        directories every epoch). Eviction tombstones written at epochs
        >= the compact base are merge-on-read applied: a hash anti-join
        on fingerprint with the sequence condition epoch_marked <=
        evict_epoch (tombstones below the base were folded in by the
        compaction that created it; re-applying one would be a no-op
        anyway because every surviving row has epoch_marked >
        evict_epoch)."""
        base = -1
        for e in range(up_to_epoch, -1, -1):
            if os.path.exists(self.seen_compact_dir(e)):
                base = e
                break
        dirs = [self.seen_compact_dir(base)] if base >= 0 else []
        dirs += [
            self.seen_dir(e)
            for e in range(base + 1, up_to_epoch + 1)
            if os.path.exists(self.seen_dir(e))
        ]
        if not dirs:
            return self.spark.createDataFrame([], schemas.SEEN)
        seen = self.spark.read.schema(schemas.SEEN).parquet(*dirs)
        evict_dirs = [
            self.seen_evict_dir(e)
            for e in range(max(base, 0), up_to_epoch + 1)
            if os.path.exists(self.seen_evict_dir(e))
        ]
        if evict_dirs:
            ev = self.spark.read.schema(
                "fingerprint string, evict_epoch int"
            ).parquet(*evict_dirs)
            seen = seen.join(
                ev,
                (seen["fingerprint"] == ev["fingerprint"])
                & (seen["epoch_marked"] <= ev["evict_epoch"]),
                "left_anti",
            )
        return seen

    def compact_seen(self, up_to_epoch: int) -> None:
        """Merge snapshot+deltas into one snapshot dir (the Iceberg-compact
        analog). Old deltas are left in place — resume never needs them
        again but removing history is a caller decision.

        Idempotent across crash+resume: if a prior run already compacted
        this epoch (crashed after the rename but before the manifest
        commit), the re-run is a no-op — os.replace onto a non-empty
        directory would raise ENOTEMPTY otherwise."""
        final = self.seen_compact_dir(up_to_epoch)
        if os.path.exists(final):
            return
        df = self.read_seen(up_to_epoch)
        tmp = final + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        os.replace(tmp, final)

    # --------------------------------------------------------- salvage (F4)
    # reference: requests that fail to enqueue go to a salvage queue
    # (src/scheduler.rs:75,423) merged back as pending at checkpoint restore
    # (src/checkpoint.rs:118-123). Here: a failed frontier-snapshot commit
    # best-effort writes the would-be frontier as state='salvaged' rows;
    # resume unions them with the last good snapshot.
    def salvage_dir(self, epoch: int) -> str:
        return os.path.join(self.workdir, "salvage", f"epoch={epoch}")

    def write_salvage(self, frontier_next: DataFrame, epoch: int) -> None:
        from pyspark.sql import functions as F

        (
            frontier_next.withColumn("state", F.lit("salvaged"))
            # gate each row to the epoch it became pending in — on resume
            # the merged rows must not be fetchable EARLIER than they would
            # have been in the uninterrupted run (order parity)
            .withColumn(
                "not_before_epoch",
                F.greatest("not_before_epoch", "epoch_added").cast("int"),
            )
            .write.mode("overwrite")
            .parquet(self.salvage_dir(epoch))
        )

    def read_salvage_after(self, last_epoch: int) -> DataFrame | None:
        base = os.path.join(self.workdir, "salvage")
        if not os.path.exists(base):
            return None
        dirs = [
            os.path.join(base, d)
            for d in sorted(os.listdir(base))
            if d.startswith("epoch=") and int(d.split("=")[1]) > last_epoch
        ]
        if not dirs:
            return None
        return self.spark.read.schema(schemas.FRONTIER).parquet(*dirs)

    def clear_salvage_upto(self, epoch: int) -> None:
        base = os.path.join(self.workdir, "salvage")
        if not os.path.exists(base):
            return
        for d in os.listdir(base):
            if d.startswith("epoch=") and int(d.split("=")[1]) <= epoch:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    def append_epoch(self, df: DataFrame, kind: str, epoch: int) -> None:
        df.write.mode("overwrite").parquet(self.epoch_dir(kind, epoch))

    def read_all(self, kind: str, schema=None) -> DataFrame | None:
        base = os.path.join(self.workdir, kind)
        if not os.path.exists(base):
            return None
        sub = [os.path.join(base, d) for d in sorted(os.listdir(base))]
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*sub) if sub else None
