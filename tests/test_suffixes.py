"""Suffix-array operator (textops/suffixes.py): prefix-doubling ranks vs
a Python brute-force suffix sort, big-path (two-phase tie rank + prefix
sum forced past their small thresholds) bit-equality with the small
path, tie-preserving rank semantics, and the refusal guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spider_core_spark.operators import prefix as prefix_mod
from spider_core_spark.operators import rank as rank_mod
from spider_core_spark.operators.rank import with_global_tie_rank
from spider_core_spark.textops import suffixes as sx
from spider_core_spark.textops.dedup import release_staged_caches

DOCS = [
    (1, "the cat sat on the mat", "en"),
    (2, "the cat sat on the hat", "en"),
    (3, "banana banana banana", "en"),
    (4, "completely different content here", "en"),
    (5, "the cat sat on the mat", "en"),  # exact dup of doc 1
    (6, "", "en"),  # empty doc: just the sentinel
]


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sadocs")
    spark.createDataFrame(DOCS, "doc_id long, text string, lang string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(str(d), "documents.parquet"))
    return str(d)


def _brute_ranks() -> dict[int, int]:
    """gpos -> 1-based rank of the suffix of the CONCATENATED
    sentinel-terminated corpus starting at gpos (doc_id order)."""
    corpus = "".join(t + sx.SA_SENTINEL for _, t, _ in sorted(DOCS))
    suf = sorted(range(len(corpus)), key=lambda i: corpus[i:])
    return {gpos: r + 1 for r, gpos in enumerate(suf)}


def test_suffix_ranks_match_bruteforce(spark, sf_dir):
    chars, _ = sx._sa_chars(spark, sf_dir, doc_prefix=None)
    ranks, total = sx.suffix_ranks(chars)
    got = {r["gpos"]: r["rnk"] for r in ranks.collect()}
    release_staged_caches()
    want = _brute_ranks()
    assert total == len(want)
    assert got == want


def test_bounded_suffix_rank_matches_bruteforce(spark, sf_dir):
    # the registered queries' one-shot (s, nr) rank (r6 optimization) must
    # reproduce the character-level doubling permutation EXACTLY — incl.
    # the cross-document tie-breaks (docs 1 and 5 are byte-identical, so
    # their suffixes order by the FOLLOWING documents' content)
    out = {
        r["gpos"]: r["sa_rank"]
        for r in sx.suffix_array(spark, sf_dir).collect()
    }
    release_staged_caches()
    want = _brute_ranks()
    assert out == want  # SA_TOPK=4000 >> fixture size: the full array


def test_suffix_maxdup_finds_exact_dup(spark, sf_dir, monkeypatch):
    # docs 1 and 5 are byte-identical (22 chars); doc 2 shares their
    # 19-char prefix "the cat sat on the ". SA order of the three loc-0
    # suffixes is doc2 < doc5 < doc1 (hat < mat; then doc5's post-sentinel
    # continuation is the empty doc 6's sentinel, which sorts below doc1's
    # 't'), so the ADJACENT pairs are (2,5) and (1,5) — (1,2) is not
    # adjacent, the standard SA-adjacency reporting shape.
    monkeypatch.setattr(sx, "SA_MINLEN", 19)
    out = sx.suffix_maxdup(spark, sf_dir)
    rows = {(r["doc_lo"], r["doc_hi"]): r["max_dup_len"] for r in out.collect()}
    release_staged_caches()
    assert rows[(1, 5)] == 22  # the full identical text
    assert rows[(2, 5)] == 19
    assert (1, 2) not in rows
    assert (3, 4) not in rows and (1, 4) not in rows


def test_big_path_equals_small_path(spark, sf_dir, monkeypatch):
    ranks_s, _ = sx.suffix_ranks(sx._sa_chars(spark, sf_dir)[0])
    small = {r["gpos"]: r["rnk"] for r in ranks_s.collect()}
    release_staged_caches()
    monkeypatch.setattr(rank_mod, "SMALL_THRESHOLD", 0)
    monkeypatch.setattr(prefix_mod, "SMALL_THRESHOLD", 0)
    ranks_b, _ = sx.suffix_ranks(sx._sa_chars(spark, sf_dir)[0])
    big = {r["gpos"]: r["rnk"] for r in ranks_b.collect()}
    release_staged_caches()
    assert big == small


def test_tie_rank_semantics(spark, monkeypatch):
    df = spark.createDataFrame(
        [("b", 1), ("a", 2), ("a", 3), ("c", 4), ("a", 5)], "k string, id int"
    )
    for thresh in (1_000_000, 0):
        for defer in (False, True):
            monkeypatch.setattr(rank_mod, "SMALL_THRESHOLD", thresh)
            out, total, release = with_global_tie_rank(df, ["k"], "rnk", defer=defer)
            got = sorted((r["id"], r["rnk"]) for r in out.collect())
            release()
            assert total == 5
            # rank(): ties share a rank, next key skips by tie count
            assert got == [(1, 4), (2, 1), (3, 1), (4, 5), (5, 1)]


def test_refusal_past_max_chars(spark, sf_dir):
    chars, _ = sx._sa_chars(spark, sf_dir)
    with pytest.raises(ValueError, match="per-shard"):
        sx.suffix_ranks(chars, max_chars=10)
    release_staged_caches()
