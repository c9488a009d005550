"""Distributed dense global rank (two-phase), replacing the reference's
single-threaded enqueue counter (the SegQueue pop order,
src/scheduler.rs:233-257) with a deterministic total order that never
funnels through one partition.

A naive ``row_number().over(Window.orderBy(...))`` collapses the whole
DataFrame into a single partition — fine for a politeness-capped wave
(≤ max_wave_size rows) but fatal for a 10^10-row frontier. This helper does
the classic two-phase ranking instead: range-repartition on the order
columns, count rows per partition (tiny collect), then add the partition
offset to an intra-partition row_number (distributed window keyed by
partition id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
# below this row count, a single-partition window sort is cheaper than the
# two-phase rank's extra shuffle + offsets join (a 1M-row sort of narrow
# frontier rows is a few hundred ms; the two-phase path exists for the
# 10^9-row frontier case)
SMALL_THRESHOLD = 1_000_000


def with_global_rank(
    df: DataFrame, order_cols: list[str], out_col: str
) -> tuple[DataFrame, int]:
    """Dense 0-based rank by ``order_cols`` (must be a total order / unique
    key for deterministic results). Returns (df + ``out_col``, total rows) —
    the total falls out of the counting phase for free, saving callers a
    count job. The input partitioning is replaced by a range partitioning
    on the order columns.
    """
    spark = df.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 2)

    # adaptive small path: below the threshold a single count + one
    # single-partition window beats the two-phase machinery (4 jobs → 2);
    # the count is needed either way for the returned total. The ranked
    # output is persisted LAZILY — the caller's first action materializes
    # it (one wave materialization per epoch, not two; the input cache is
    # released up front and its narrow lineage recomputes once into the
    # output cache).
    df = df.persist()
    total = df.count()
    if total <= SMALL_THRESHOLD:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        out = df.withColumn(out_col, (F.row_number().over(w) - 1).cast("long"))
        out = out.persist()
        df.unpersist(blocking=False)
        return out, total

    ranged = df.repartitionByRange(n, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    # persist so the sampled range boundaries are identical between the
    # count job and the ranking job (repartitionByRange samples its input)
    ranged = ranged.persist()
    counts = {r[_PID]: r["cnt"] for r in ranged.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark_offsets = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        f"{_PID} int, __rank_off long",
    )
    w = Window.partitionBy(_PID).orderBy(*[F.col(c) for c in order_cols])
    out = (
        ranged.join(F.broadcast(spark_offsets), _PID, "left")
        .withColumn(
            out_col,
            (F.coalesce(F.col("__rank_off"), F.lit(0)) + F.row_number().over(w) - 1).cast("long"),
        )
        .drop(_PID, "__rank_off")
    )
    # materialize before unpersisting `ranged`: the ranking must see the
    # same sampled range boundaries as the count job above
    out = out.persist()
    out.count()
    ranged.unpersist()
    df.unpersist()
    return out, acc


def with_global_tie_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str,
    total: int | None = None,
    defer: bool = False,
):
    """TIE-PRESERVING 1-based global rank (SQL ``rank()`` semantics: equal
    ``order_cols`` keys get the SAME rank, the next distinct key skips by
    the tie count). Built for iterated order-refinement passes — the
    suffix-array prefix-doubling rounds (``textops/suffixes.py``) need
    "equal so far ⇒ equal rank" at every round, which ``with_global_rank``'s
    row_number would destroy.

    Same two-phase shape as ``with_global_rank``: range-repartition keeps
    equal keys in one partition (RangePartitioner buckets by key value), so
    global rank() = partition ROW-count offset + intra-partition rank() —
    rank() counts rows strictly before the first row of the tie group, and
    all of a group's rows live in one partition. Unlike ``with_global_rank``
    the big-path intermediate is an EAGER ``localCheckpoint`` (the
    ``operators/prefix.py`` contract): the driver-collected offsets are
    keyed by ``spark_partition_id()`` of one materialization, and a frozen
    checkpoint makes a recompute under re-sampled range boundaries
    structurally impossible — a premature release fails loudly, never
    silently corrupts.

    Returns ``(out, total, release)``. ``release()`` (idempotent) drops the
    call's staged blocks — call it AFTER your terminal action. With the
    default ``defer=False`` the output is materialized and persisted before
    returning; with ``defer=True`` the output is LAZY on top of the frozen
    intermediate, for callers that immediately materialize it themselves
    (e.g. into their own checkpoint) — one materialization instead of two
    in a tight refinement loop. Pass ``total`` (the exact row count) to
    skip the counting job when the caller already knows it.
    """
    from spider_core_spark.operators.prefix import (
        ReleaseHandle,
        _jrdd_handles,
        _persistent_ids,
    )

    spark = df.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 2)

    df = df.persist()
    if total is None:
        total = df.count()
    if total <= SMALL_THRESHOLD:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        out = df.withColumn(out_col, F.rank().over(w).cast("long"))
        if not defer:
            out = out.persist()
            out.count()
        df.unpersist(blocking=False)
        return out, total, ReleaseHandle(out.unpersist if not defer else lambda: None)

    ranged = df.repartitionByRange(n, *order_cols).withColumn(
        _PID, F.spark_partition_id()
    )
    ids0 = _persistent_ids(spark)
    ranged = ranged.localCheckpoint(eager=True)
    ckpt_handles = _jrdd_handles(spark, _persistent_ids(spark) - ids0)
    counts = {
        r[_PID]: r["cnt"]
        for r in ranged.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark_offsets = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        f"{_PID} int, __rank_off long",
    )
    w = Window.partitionBy(_PID).orderBy(*[F.col(c) for c in order_cols])
    out = (
        ranged.join(F.broadcast(spark_offsets), _PID, "left")
        .withColumn(
            out_col,
            (
                F.coalesce(F.col("__rank_off"), F.lit(0)) + F.rank().over(w)
            ).cast("long"),
        )
        .drop(_PID, "__rank_off")
    )
    df.unpersist(blocking=False)
    if defer:
        return out, acc, ReleaseHandle(
            lambda: [h.unpersist() for h in ckpt_handles]
        )
    out = out.persist()
    out.count()
    for h in ckpt_handles:
        h.unpersist()
    return out, acc, ReleaseHandle(out.unpersist)
