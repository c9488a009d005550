"""Scale-safety of the n-gram Jaccard and IVF operators (VERDICT r2
next-round #1/#4): banded candidate generation with a documented recall
bound, the exact variant's enforced block-size cap, and √N-scaled IVF
centroid counts."""

import pytest

from spider_core_spark.textops import dedup as td
from spider_core_spark.textops import similarity as ts

SF = "/root/testdata/sf0.001"


def test_banded_subset_of_exact_with_high_recall(spark):
    """The banded operator may only LOSE pairs vs the exact one (false
    positives are impossible — every candidate is verified with the exact
    Jaccard), and at P(miss | J≥0.3) ≤ 0.7^16 ≈ 0.33% the measured recall
    on the test corpus must clear 99%."""
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in td.ngram_jaccard_pairs_exact(spark, SF).collect()
    }
    banded = {
        (r["a"], r["b"]): r["jaccard"]
        for r in td.ngram_jaccard_pairs(spark, SF).collect()
    }
    assert exact, "fixture produced no near-dup pairs — test is vacuous"
    assert set(banded) <= set(exact)
    for pair, j in banded.items():
        assert j == exact[pair]  # identical exact verification
    recall = len(banded) / len(exact)
    assert recall >= 0.99, f"recall {recall:.3f} below documented bound"


def test_exact_variant_block_cap_fails_loudly(spark):
    with pytest.raises(ValueError, match="block_cap"):
        td.ngram_jaccard_pairs_exact(spark, SF, block_cap=1).collect()


def test_ivf_k_for_scaling():
    assert td.ivf_k_for(0) == td.IVF_K
    assert td.ivf_k_for(10_000) == 100
    assert td.ivf_k_for(10**10) == 10**5  # the documented 10^10 sizing


def test_embedding_ivf_auto_k(spark):
    rows = td.embedding_ivf_neardup(spark, SF, k=None).collect()
    assert all(r["cos"] >= td.COSINE_THRESHOLD for r in rows)
    assert all(r["a"] < r["b"] for r in rows)


def test_ann_ivf_parameterized(spark):
    rows = ts.ann_ivf_topk(spark, SF, k=4, nprobe=1).collect()
    assert rows
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= ts.TOP_K


def test_embedding_neardup_block_cap_fails_loudly(spark):
    with pytest.raises(ValueError, match="block_cap"):
        td.embedding_neardup(spark, SF, block_cap=1).collect()
