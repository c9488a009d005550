"""Distributed grouped prefix (cumulative) sum, two-phase.

Generalizes the two-phase rank of ``operators/rank.py`` from row_number to
SUM. A naive ``F.sum(v).over(Window.partitionBy(group).orderBy(order))``
funnels each whole group through ONE task — fatal when a group is
corpus-sized (e.g. the cumulative token offset of the 'en' slice of a
100-TB corpus: one language ≈ half the corpus). Two-phase instead:

1. range-repartition on (group_cols + order_cols) so every partition holds
   a contiguous slice of the global (group, order) sort — a group larger
   than one partition spans several *consecutive* partitions;
2. aggregate per-(partition, group) sums — a tiny collect of at most
   P + G rows (each partition contributes one row per group it touches,
   and the range sort means all but the boundary groups touch one
   partition);
3. exclusive-prefix those sums per group on the driver, broadcast the
   offsets back, and add an intra-partition running sum keyed by
   (partition_id, group) — every window partition is bounded by the Spark
   partition size, never by the group size.

Used by ``textops/packing.py`` (sequence packing needs the exclusive
cumulative token count per document); reusable for any running-total
semantics (cumulative bytes per host, watermark offsets, …).

Big-path materialization contract: the driver-collected offsets are keyed
by ``spark_partition_id()`` of ONE materialization of the range
repartition, whose boundary sampling is plan-dependent — a recompute could
re-bucket rows under ``_PID`` values that no longer match the offsets,
which would be SILENT corruption. The intermediate is therefore an EAGER
``localCheckpoint``: partitions are frozen as stored blocks and the
lineage is truncated, so a recompute with different boundaries is
structurally impossible. If the blocks are dropped before the caller's
terminal action (premature release), the action fails LOUDLY with a
missing-checkpoint-block error instead of returning wrong spans.
``release()`` must still run after the terminal action to free the
blocks — callers register it with the textops staged-cache registry
(``textops.dedup.stage_handle``) so ``release_staged_caches()`` drains it.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PID = "__psum_pid"
# same rationale as rank.SMALL_THRESHOLD: below this, one window sort per
# group is cheaper than the extra shuffle + offsets join; the two-phase
# path exists for the 10^9-row corpus case
SMALL_THRESHOLD = 1_000_000


class ReleaseHandle:
    """Idempotent release token for a staged big-path intermediate.

    Callable (the documented ``release()`` contract) AND quacks like a
    cached frame (``unpersist``) so callers can hand it to the textops
    staged-cache registry (``textops.dedup.stage_handle``) for draining
    after their terminal action."""

    def __init__(self, fn: Callable[[], None]) -> None:
        self._fn = fn
        self._done = False

    def __call__(self) -> None:
        if self._done:
            return
        self._done = True
        try:
            self._fn()
        except Exception:
            pass

    def unpersist(self, blocking: bool = False) -> None:
        self()


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _jrdd_handles(spark, new_ids: set[int]) -> list:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return [jmap.get(k) for k in jmap.keySet().toArray() if int(k) in new_ids]


def with_group_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    val_col: str,
    out_col: str,
    small_threshold: int = SMALL_THRESHOLD,
) -> tuple[DataFrame, Callable[[], None]]:
    """Add ``out_col`` = EXCLUSIVE prefix sum of ``val_col`` over rows
    ordered by ``order_cols`` within each ``group_cols`` group (first row
    of a group gets 0). ``group_cols + order_cols`` must be a unique key
    for deterministic results.

    Returns ``(out_df, release)``. On the big path the output is backed by
    an EAGER localCheckpoint of the range-partitioned intermediate (the
    range partitioning samples its input, so the offsets job and the final
    window MUST see the identical materialization — see module docstring);
    call ``release()`` (idempotent, also exposed as ``.unpersist()``)
    AFTER the terminal action to drop the checkpoint blocks. Releasing
    early fails the later action loudly; it can never silently corrupt.
    On the small path ``release`` is a no-op — nothing is persisted.
    """
    spark = df.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 2)
    keys = group_cols + order_cols

    df = df.persist()
    total = df.count()
    if total <= small_threshold:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = df.withColumn(
            out_col, F.coalesce(F.sum(val_col).over(w), F.lit(0)).cast("long")
        )
        df.unpersist(blocking=False)
        return out, ReleaseHandle(lambda: None)

    ranged = df.repartitionByRange(n, *keys).withColumn(
        _PID, F.spark_partition_id()
    )
    ids_before = _persistent_ids(spark)
    # eager: materialize NOW and truncate lineage — the _PID values become
    # stored data, never recomputable under different range boundaries
    ranged = ranged.localCheckpoint(eager=True)
    ckpt_handles = _jrdd_handles(spark, _persistent_ids(spark) - ids_before)
    part_sums = (
        ranged.groupBy(_PID, *group_cols)
        .agg(F.sum(val_col).cast("long").alias("__psum"))
        .collect()
    )
    # exclusive prefix per group, scanning partitions in range order
    offsets: list[tuple] = []
    acc: dict[tuple, int] = {}
    for row in sorted(
        part_sums, key=lambda r: (tuple(str(r[g]) for g in group_cols), r[_PID])
    ):
        gkey = tuple(row[g] for g in group_cols)
        offsets.append((row[_PID], *gkey, acc.get(gkey, 0)))
        acc[gkey] = acc.get(gkey, 0) + row["__psum"]

    gfields = [ranged.schema[g] for g in group_cols]
    off_schema = T.StructType(
        [T.StructField(_PID, T.IntegerType())]
        + gfields
        + [T.StructField("__psum_off", T.LongType())]
    )
    off_df = spark.createDataFrame(offsets or [(0, *([None] * len(group_cols)), 0)], off_schema)

    w = (
        Window.partitionBy(_PID, *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        ranged.join(F.broadcast(off_df), [_PID] + group_cols, "left")
        .withColumn(
            out_col,
            (
                F.coalesce(F.col("__psum_off"), F.lit(0))
                + F.coalesce(F.sum(val_col).over(w), F.lit(0))
            ).cast("long"),
        )
        .select(*df.columns, out_col)  # restore the input column order
    )
    df.unpersist(blocking=False)

    def _drop() -> None:
        for h in ckpt_handles:
            h.unpersist()

    return out, ReleaseHandle(_drop)
