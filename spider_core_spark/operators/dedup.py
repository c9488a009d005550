"""URL-seen dedup: sharded Bloom prefilter + exact anti-join.

Distributed rebuild of the reference's 3-tier seen-set
(Bloom 5M bits/5 hashes + write-behind buffer + LRU cache,
src/scheduler.rs:68-137, check at :498-513, predicate at :553-557):

- exact tier   → the `seen` parquet/Iceberg table, sharded by
                 pmod(h64(fingerprint), n_shards) — disk-backed, so a
                 10^10-URL frontier never touches driver memory (the
                 reference's LRU cap exists only because its exact set
                 lives in RAM);
- Bloom tier   → one bitset per shard, rebuilt per epoch from new
                 fingerprints (the reference's ≥100-item batched
                 write-behind flush, src/scheduler.rs:529-551, becomes the
                 epoch-granular merge), broadcast to executors;
- the dedup decision is bloom-prefilter (definite-negatives skip the
  shuffle entirely) → exact ``left_anti`` join for the maybes. The Bloom
  tier is pure pre-filtering: correctness comes from the anti-join alone.

All Bloom math is vectorized: the k probe positions are computed JVM-side
from the sha256 fingerprint's hex words (no extra hashing), and the Python
side only does numpy bitset indexing over Arrow batches.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spider_core_spark.functions.hashing import h64_col


def shard_col(fingerprint: Column, n_shards: int) -> Column:
    return F.pmod(h64_col(fingerprint), F.lit(n_shards)).cast("int")


def bloom_bits_for(expected_n: int, target_fpr: float, n_hashes: int) -> int:
    """Bits per filter for `expected_n` keys at `target_fpr` with k hashes:
    p ≈ (1 − e^(−k·n/m))^k  ⇒  m = −k·n / ln(1 − p^(1/k)).

    Sizing table for the 10^10-frontier design point (k=5, per SHARD after
    dividing expected_n by n_shards — documented in BASELINE.md): a 10^10
    seen set at 1% FPR needs ~1.5 GB of shards total, which exceeds a
    per-executor broadcast comfort zone → either raise n_shards and accept
    ~12 GB at 0.1%, lean on a coarser FPR (the Bloom tier is a prefilter,
    never correctness), or disable the tier and let the runtime bloom join
    handle it. The engine fails loudly instead of degrading silently."""
    import math

    if not (0.0 < target_fpr < 1.0):
        raise ValueError(f"target_fpr must be in (0,1), got {target_fpr}")
    n = max(expected_n, 1)
    m = -n_hashes * n / math.log(1.0 - target_fpr ** (1.0 / n_hashes))
    return 1 << max(int(m - 1).bit_length(), 10)  # round up to a power of 2


def bloom_positions_col(fingerprint: Column, n_bits: int, n_hashes: int) -> Column:
    """k probe positions derived from the fingerprint's own sha256 hex:
    position_i = int(hex[8i : 8i+8], 16) % n_bits. 64 hex chars give 8
    independent 32-bit words — plenty for k ≤ 8 (reference uses 5,
    src/scheduler.rs:137). Computed entirely JVM-side.
    """
    assert n_hashes <= 8
    return F.array(
        *[
            F.pmod(
                F.conv(F.substring(fingerprint, 1 + 8 * i, 8), 16, 10).cast("long"),
                F.lit(n_bits),
            ).cast("int")
            for i in range(n_hashes)
        ]
    )


def build_bloom_shards(
    seen: DataFrame, n_shards: int, n_bits: int, n_hashes: int
) -> dict[int, bytes]:
    """One bitset per shard from the seen table; returns {shard: bytes}.
    Built distributed (groupBy shard → applyInPandas), collected small:
    n_shards × n_bits/8 bytes total.
    """
    n_bytes = (n_bits + 7) // 8

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        pos = np.concatenate(pdf["pos"].to_numpy()) if len(pdf) else np.array([], dtype=np.int64)
        pos = pos.astype(np.int64)
        np.bitwise_or.at(bits, pos // 8, np.left_shift(np.uint8(1), (pos % 8).astype(np.uint8)))
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "bits": [bits.tobytes()]})

    tagged = seen.select(
        shard_col(F.col("fingerprint"), n_shards).alias("shard"),
        bloom_positions_col(F.col("fingerprint"), n_bits, n_hashes).alias("pos"),
    )
    rows = (
        tagged.groupBy("shard")
        .applyInPandas(build, schema="shard int, bits binary")
        .collect()
    )
    return {r["shard"]: bytes(r["bits"]) for r in rows}


def merge_bloom_shards(
    base: dict[int, bytes], delta: dict[int, bytes]
) -> dict[int, bytes]:
    """OR two shard dicts — incremental Bloom maintenance (the epoch-scale
    analog of the reference's batched write-behind flush,
    src/scheduler.rs:529-551)."""
    out = dict(base)
    for s, bits in delta.items():
        if s in out:
            a = np.frombuffer(out[s], dtype=np.uint8)
            b = np.frombuffer(bits, dtype=np.uint8)
            out[s] = np.bitwise_or(a, b).tobytes()
        else:
            out[s] = bits
    return out


def bloom_prefilter(
    candidates: DataFrame,
    blooms: dict[int, bytes],
    n_shards: int,
    n_bits: int,
    n_hashes: int,
) -> DataFrame:
    """Adds boolean ``maybe_seen``: False ⇒ definitely not in seen (skip the
    exact join); True ⇒ must be checked exactly. Arrow-batched numpy probe.
    """
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(blooms)

    @F.pandas_udf("boolean")
    def probe(shard: pd.Series, pos: pd.Series) -> pd.Series:
        shards = shard.to_numpy()
        if len(shards) == 0:
            return pd.Series([], dtype=bool)
        posm = np.stack([np.asarray(p, dtype=np.int64) for p in pos])
        out = np.zeros(len(shards), dtype=bool)
        for s in np.unique(shards):
            bits = bc.value.get(int(s))
            mask = shards == s
            if bits is None:
                continue  # empty shard: nothing seen
            arr = np.frombuffer(bits, dtype=np.uint8)
            p = posm[mask]
            hit = (arr[p // 8] >> (p % 8).astype(np.uint8)) & 1
            out[mask] = hit.all(axis=1)
        return pd.Series(out)

    return candidates.withColumn(
        "maybe_seen",
        probe(
            shard_col(F.col("fingerprint"), n_shards),
            bloom_positions_col(F.col("fingerprint"), n_bits, n_hashes),
        ),
    )


def dedup_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    *,
    use_bloom: bool,
    blooms: dict[int, bytes] | None,
    n_shards: int,
    n_bits: int,
    n_hashes: int,
    filter_kind: str = "bloom",
    cuckoo_buckets: int = 0,
) -> DataFrame:
    """Enqueue-time dedup (reference should_enqueue_request,
    src/scheduler.rs:392-431): keep only candidates whose fingerprint is
    not in `seen`. With an approximate tier (`filter_kind` = "bloom" or
    "cuckoo" — operators/cuckoo.py's deletable filter), only `maybe_seen`
    rows pay the anti-join shuffle; definite-negatives are unioned back
    join-free. Either tier is a PREFILTER: correctness comes from the
    exact anti-join alone.
    """
    if use_bloom and blooms is not None:
        if filter_kind == "cuckoo":
            from spider_core_spark.operators.cuckoo import cuckoo_prefilter

            tagged = cuckoo_prefilter(
                candidates, blooms, n_shards, cuckoo_buckets
            ).withColumnRenamed("cuckoo_maybe_seen", "maybe_seen")
        else:
            tagged = bloom_prefilter(
                candidates, blooms, n_shards, n_bits, n_hashes
            )
        fresh = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
        survivors = maybe.join(
            seen.select("fingerprint"), "fingerprint", "left_anti"
        )
        return fresh.unionByName(survivors)
    return candidates.join(seen.select("fingerprint"), "fingerprint", "left_anti")
