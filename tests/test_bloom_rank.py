"""Bloom shard tier (SURVEY.md U1/P2) and distributed global rank."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark.functions.hashing import sha256_hex_py
from spider_core_spark.operators import dedup as d
from spider_core_spark.operators import rank as rk

N_SHARDS, N_BITS, N_HASHES = 4, 1 << 14, 5


@pytest.fixture(scope="module")
def seen(spark):
    rows = [(sha256_hex_py(str(i)),) for i in range(500)]
    return spark.createDataFrame(rows, "fingerprint string").withColumn(
        "epoch_marked", F.lit(0)
    )


def test_bloom_no_false_negatives(spark, seen):
    blooms = d.build_bloom_shards(seen, N_SHARDS, N_BITS, N_HASHES)
    probed = d.bloom_prefilter(seen, blooms, N_SHARDS, N_BITS, N_HASHES)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_filters_most_negatives(spark, seen):
    blooms = d.build_bloom_shards(seen, N_SHARDS, N_BITS, N_HASHES)
    fresh = spark.createDataFrame(
        [(sha256_hex_py("new:" + str(i)),) for i in range(2000)],
        "fingerprint string",
    )
    probed = d.bloom_prefilter(fresh, blooms, N_SHARDS, N_BITS, N_HASHES)
    fp_rate = probed.filter(F.col("maybe_seen")).count() / 2000
    assert fp_rate < 0.05, f"false positive rate too high: {fp_rate}"


def test_dedup_bloom_equals_exact(spark, seen):
    blooms = d.build_bloom_shards(seen, N_SHARDS, N_BITS, N_HASHES)
    cands = spark.createDataFrame(
        [(sha256_hex_py(str(i)),) for i in range(250, 750)],
        "fingerprint string",
    )
    with_bloom = d.dedup_against_seen(
        cands, seen, use_bloom=True, blooms=blooms,
        n_shards=N_SHARDS, n_bits=N_BITS, n_hashes=N_HASHES,
    )
    exact = d.dedup_against_seen(
        cands, seen, use_bloom=False, blooms=None,
        n_shards=N_SHARDS, n_bits=N_BITS, n_hashes=N_HASHES,
    )
    a = {r["fingerprint"] for r in with_bloom.collect()}
    b = {r["fingerprint"] for r in exact.collect()}
    assert a == b and len(a) == 250


def test_merge_bloom_shards(spark, seen):
    half1 = seen.limit(250)
    half2 = seen.subtract(half1)
    b1 = d.build_bloom_shards(half1, N_SHARDS, N_BITS, N_HASHES)
    b2 = d.build_bloom_shards(half2, N_SHARDS, N_BITS, N_HASHES)
    merged = d.merge_bloom_shards(b1, b2)
    probed = d.bloom_prefilter(seen, merged, N_SHARDS, N_BITS, N_HASHES)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


@pytest.mark.parametrize("force_big", [False, True])
def test_global_rank_dense_and_ordered(spark, force_big, monkeypatch):
    if force_big:
        monkeypatch.setattr(rk, "SMALL_THRESHOLD", 10)
    df = spark.createDataFrame(
        [(i % 3, 1000 - i) for i in range(300)], "priority int, seq int"
    )
    ranked, total = rk.with_global_rank(df, ["priority", "seq"], "r")
    assert total == 300
    rows = sorted(
        ((r["priority"], r["seq"], r["r"]) for r in ranked.collect()),
        key=lambda x: (x[0], x[1]),
    )
    assert [x[2] for x in rows] == list(range(300))
