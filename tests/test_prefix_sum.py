"""Two-phase grouped prefix sum: big path ≡ window path, and the packing
operator built on it.

The registered text_pack_sequences query takes the small (plain-window)
path at sf scale; these tests force small_threshold=0 so the
range-partitioned two-phase machinery — the 100-TB path — is what runs,
and assert bit-equality with the window result plus the packing
invariants a training pipeline relies on.
"""

import pytest
from pyspark.sql import functions as F

from spider_core_spark.operators.prefix import with_group_prefix_sum
from spider_core_spark.textops import packing as tp

SF_DIR = "/root/testdata/sf0.001"


def _cached_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_two_phase_equals_window(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", F.length("text").cast("long").alias("v")
    )
    small, rel_s = with_group_prefix_sum(
        d, ["lang"], ["doc_id"], "v", "ps"
    )
    big, rel_b = with_group_prefix_sum(
        d, ["lang"], ["doc_id"], "v", "ps", small_threshold=0
    )
    srows = sorted(small.collect(), key=lambda r: (r["lang"], r["doc_id"]))
    brows = sorted(big.collect(), key=lambda r: (r["lang"], r["doc_id"]))
    rel_s()
    rel_b()
    assert srows == brows
    # first row of each group has offset 0; offsets strictly increase
    seen_groups = set()
    prev = {}
    for r in brows:
        if r["lang"] not in seen_groups:
            assert r["ps"] == 0
            seen_groups.add(r["lang"])
        else:
            assert r["ps"] == prev[r["lang"]][0] + prev[r["lang"]][1]
        prev[r["lang"]] = (r["ps"], r["v"])


def test_two_phase_releases_cache(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", F.lit(1).cast("long").alias("v")
    )
    before = _cached_rdd_count(spark)
    big, release = with_group_prefix_sum(
        d, ["lang"], ["doc_id"], "v", "ps", small_threshold=0
    )
    big.count()
    release()
    # lazy unpersist: poke the cache manager with another tiny action
    spark.range(1).count()
    after = _cached_rdd_count(spark)
    assert after <= before


def test_pack_sequences_big_path_matches_registered(spark):
    from spider_core_spark.textops import dedup as td

    reg = tp.pack_sequences(spark, SF_DIR)
    big = tp.pack_sequences(spark, SF_DIR, small_threshold=0)
    assert sorted(map(tuple, reg.collect())) == sorted(map(tuple, big.collect()))
    td.release_staged_caches()


def test_big_path_intermediate_alive_until_caller_releases(spark):
    """Round-4 verdict #1 regression: the checkpointed ranged intermediate
    must still be materialized when the CALLER runs the terminal action —
    pack_sequences/shard_assignments must not release before returning."""
    from spider_core_spark.sources import corpus_io as cio
    from spider_core_spark.textops import dedup as td

    td.release_staged_caches()
    spark.range(1).count()
    before = _cached_rdd_count(spark)

    big = tp.pack_sequences(spark, SF_DIR, small_threshold=0)
    # the intermediate is alive at action time (old code: already gone)
    assert _cached_rdd_count(spark) > before
    got = sorted(map(tuple, big.collect()))
    want = sorted(map(tuple, tp.pack_sequences(spark, SF_DIR).collect()))
    assert got == want

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sharded = cio.shard_assignments(docs, shard_tokens=64, small_threshold=0)
    assert _cached_rdd_count(spark) > before
    got_s = sorted(map(tuple, sharded.collect()))
    want_s = sorted(
        map(tuple, cio.shard_assignments(docs, shard_tokens=64).collect())
    )
    assert got_s == want_s

    # draining the registry AFTER the actions returns to baseline
    td.release_staged_caches()
    spark.range(1).count()
    assert _cached_rdd_count(spark) <= before


def test_premature_release_fails_loud_never_wrong(spark):
    """If someone DOES drop the staged handle before the action, the
    localCheckpoint contract turns the old silent corruption into either
    a loud failure or a still-correct result — never a wrong answer."""
    from spider_core_spark.textops import dedup as td

    want = sorted(map(tuple, tp.pack_sequences(spark, SF_DIR).collect()))
    td.release_staged_caches()
    big = tp.pack_sequences(spark, SF_DIR, small_threshold=0)
    td.release_staged_caches()  # simulate the old premature release
    try:
        got = sorted(map(tuple, big.collect()))
    except Exception:
        return  # loud failure is within contract
    assert got == want  # if it computed at all, it must be RIGHT


def test_pack_sequences_invariants(spark):
    rows = tp.pack_sequences(spark, SF_DIR, chunk_tokens=64).collect()
    rows.sort(key=lambda r: (r["lang"], r["doc_id"]))
    # stream is contiguous per lang: start_tok resumes where prev doc ended
    cursor = {}
    for r in rows:
        assert r["start_tok"] == cursor.get(r["lang"], 0)
        cursor[r["lang"]] = r["start_tok"] + r["n_tokens"]
        assert r["start_chunk"] == r["start_tok"] // 64
        last = r["start_tok"] + r["n_tokens"] - 1
        assert r["end_chunk"] == last // 64
        assert r["n_chunks"] == r["end_chunk"] - r["start_chunk"] + 1
        assert r["n_chunks"] >= 1
