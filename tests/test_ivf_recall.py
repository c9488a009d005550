"""IVF near-dup recall contract (VERDICT r3 #4): cross-cell pairs are the
only miss mode, nprobe is the recall lever, and false positives are
impossible (every candidate is verified with the exact cosine). Measured
on the sf0.001 fixture against a brute-force all-pairs ground truth:
nprobe=1 ≈ 0.29, nprobe=2 (default) ≈ 0.73, nprobe=3 ≈ 0.95."""

import duckdb
import numpy as np
import pytest

from spider_core_spark.textops import dedup as td

SF = "/root/testdata/sf0.001"
TH = td.COSINE_REGISTERED  # 0.35 — non-vacuous on this fixture


@pytest.fixture(scope="module")
def truth():
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM parquet_scan('{SF}/embeddings.parquet')"
    ).fetchall()
    ids = sorted(r[0] for r in rows)
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    m = np.stack([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
    cos = m @ m.T
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if round(cos[i, j], 3) >= TH:
                out.add((ids[i], ids[j]))
    return out


def _pairs(spark, nprobe):
    df = td.embedding_ivf_neardup(spark, SF, nprobe=nprobe, threshold=TH)
    return {(r["a"], r["b"]) for r in df.collect()}


def test_recall_monotone_in_nprobe_and_no_false_positives(spark, truth):
    p1 = _pairs(spark, 1)
    p2 = _pairs(spark, 2)
    assert not (p1 - truth), "nprobe=1 emitted a false positive"
    assert not (p2 - truth), "nprobe=2 emitted a false positive"
    r1 = len(p1 & truth) / len(truth)
    r2 = len(p2 & truth) / len(truth)
    assert r2 >= r1, f"multi-probe lowered recall: {r2} < {r1}"
    # default nprobe=2: measured 0.733 on this fixture; floor with margin
    assert r2 >= 0.6, f"default-nprobe recall {r2:.3f} below contract floor"


def test_higher_nprobe_approaches_exact(spark, truth):
    p3 = _pairs(spark, 3)
    assert not (p3 - truth)
    r3 = len(p3 & truth) / len(truth)
    assert r3 >= 0.9, f"nprobe=3 recall {r3:.3f} (measured 0.95)"
