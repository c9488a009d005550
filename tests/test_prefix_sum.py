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
    reg = tp.pack_sequences(spark, SF_DIR)
    big = tp.pack_sequences(spark, SF_DIR, small_threshold=0)
    assert sorted(map(tuple, reg.collect())) == sorted(map(tuple, big.collect()))


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
