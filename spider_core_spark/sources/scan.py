"""Scale-adaptive scan fan-out (optimization guide §2.5 input skew, §6).

A parquet input far smaller than one scan split (``spark.sql.files.
maxPartitionBytes``, default 128 MB) arrives as a SINGLE scan partition,
so every CPU-bound narrow stage downstream — sha2 shingle passes, char
explodes, regex scrubs, per-row array math — serializes on one core of
the whole cluster until the first shuffle. ``read_parquet_spread`` fans
such a scan out to ``defaultParallelism`` with one tiny round-robin
shuffle (bounded by SPREAD_MAX_BYTES, so the shuffle it introduces is
always trivially small).

This is deliberately NOT a constant tuned for local mode: the condition
is derived from the input's on-disk size, so at production scale (where
the scan splits naturally into hundreds of tasks) the helper is a
structural no-op and no repartition of the corpus ever happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# fan out only inputs this small: a round-robin shuffle of ≤64 MB is
# sub-second everywhere, while the serialized-compute penalty it removes
# is unbounded; anything larger already yields ≥1 split per 128 MB and
# grows its own parallelism with size.
SPREAD_MAX_BYTES = 64 * 1024 * 1024


def _input_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def read_parquet_spread(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)``, fanned out to defaultParallelism
    when (and only when) the input is too small to split on its own."""
    df = spark.read.parquet(path)
    par = max(spark.sparkContext.defaultParallelism, 1)
    if par > 1:
        try:
            small = 0 <= _input_bytes(path) <= SPREAD_MAX_BYTES
        except OSError:
            small = False
        if small:
            return df.repartition(par)
    return df
