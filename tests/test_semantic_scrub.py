"""Invariant tests for the round-4 fourth-session operators:
integer-Lloyd k-means / SemDeDup (textops/semantic.py) and the
duplicated-span scrub (textops/analysis.py). Oracle equivalence runs in
test_entry_queries; here a THIRD independent implementation (NumPy) must
agree with Spark bit-for-bit on the k-means path, and a hand-built
corpus pins the scrub's exact removal semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spider_core_spark.textops import semantic as sm

SF_DIR = "/root/testdata/sf0.001"


def _numpy_kmeans(qv: np.ndarray, k: int, iters: int):
    """Mirror of kmeans_assign in NumPy int64: same seeding (first k),
    same argmin tie-break (lowest cid — np.argmin picks the first
    minimum), same exact floor-mean update, same empty-cluster drop."""
    cents = [(cid, qv[cid].copy()) for cid in range(k)]

    def assign(cents):
        carr = np.stack([c for _, c in cents])  # C x dim
        d = ((qv[:, None, :] - carr[None, :, :]) ** 2).sum(axis=-1)
        idx = d.argmin(axis=1)
        cids = np.array([cid for cid, _ in cents], dtype=np.int64)
        return cids[idx], d[np.arange(len(qv)), idx]

    for _ in range(iters):
        cids, _ = assign(cents)
        nxt = []
        for cid in sorted(set(cids.tolist())):
            members = qv[cids == cid]
            # exact integer floor-mean, same as (s - pmod(s, c)) div c
            nxt.append(
                (cid, np.floor_divide(members.sum(axis=0), len(members)))
            )
        cents = nxt
    return assign(cents)


@pytest.fixture(scope="module")
def spark_kmeans(spark):
    return {
        r["vec_id"]: (r["cid"], r["qdist"])
        for r in sm.kmeans_assign(spark, SF_DIR).collect()
    }


def test_kmeans_three_way_parity(spark, spark_kmeans):
    qv = np.array(
        [
            r["qv"]
            for r in sm._qemb(spark, SF_DIR).orderBy("vec_id").collect()
        ],
        dtype=np.int64,
    )
    cids, qd = _numpy_kmeans(qv, sm.KM_K, sm.KM_ITERS)
    assert len(spark_kmeans) == len(qv)
    for vid in range(len(qv)):
        assert spark_kmeans[vid] == (int(cids[vid]), int(qd[vid])), vid


def test_kmeans_deterministic(spark, spark_kmeans):
    again = {
        r["vec_id"]: (r["cid"], r["qdist"])
        for r in sm.kmeans_assign(spark, SF_DIR).collect()
    }
    assert again == spark_kmeans


def test_semantic_neardup_matches_numpy(spark, spark_kmeans):
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    by_cell: dict[int, list[int]] = {}
    for vid, (cid, _) in spark_kmeans.items():
        by_cell.setdefault(cid, []).append(vid)
    expect: dict[int, tuple[int, float]] = {}
    for vids in by_cell.values():
        for b in vids:
            for a in vids:
                if a >= b:
                    continue
                va, vb = emb[a], emb[b]
                cos = float(
                    va @ vb / (np.sqrt(va @ va) * np.sqrt(vb @ vb))
                )
                if round(cos, 3) >= sm.SEM_THRESHOLD - 1e-9:
                    prev = expect.get(b)
                    expect[b] = (
                        min(prev[0], a) if prev else a,
                        max(prev[1], round(cos, 3)) if prev else round(cos, 3),
                    )
    got = {
        r["vec_id"]: (r["kept_by"], r["max_cos"])
        for r in sm.semantic_neardup(spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for vid, (kb, mc) in got.items():
        assert kb == expect[vid][0]
        assert abs(mc - expect[vid][1]) <= 1e-3
        assert kb < vid


# ---------------------------------------------------------------- scrub
def _scrub_corpus(spark, tmp_path):
    rows = [
        (0, "a b c d e f"),            # original — fully kept
        (1, "x y a b c d q"),          # cross-doc copy of "a b c d"
        (2, "zz ww qq rr ss tt"),      # unique — fully kept
        (3, "m n o p m n o p"),        # within-doc repeat of "m n o p"
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "scrub")
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_dupspan_scrub_golden(spark, tmp_path):
    from spider_core_spark.textops import analysis as ta
    from spider_core_spark.textops.dedup import release_staged_caches

    path = _scrub_corpus(spark, tmp_path)
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in ta.dupspan_scrub(spark, path).collect()
    }
    release_staged_caches()
    # doc 0 holds every FIRST occurrence — untouched
    assert out[0] == ("a b c d e f", 6, 0)
    # doc 1: trigrams "a b c" and "b c d" are repeats of doc 0 — their
    # cover {a b c d} is excised, the unique frame "x y … q" survives
    assert out[1] == ("x y q", 7, 4)
    assert out[2] == ("zz ww qq rr ss tt", 6, 0)
    # doc 3: the second "m n o p" is a within-doc repeat — self-dedup
    assert out[3] == ("m n o p", 8, 4)


def test_dupspan_scrub_subsequence_and_nonvacuous(spark):
    from spider_core_spark.textops import analysis as ta
    from spider_core_spark.textops.dedup import release_staged_caches

    out = ta.dupspan_scrub(spark, SF_DIR)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    joined = out.join(d, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.split("clean_text", " ").alias("ct"),
        F.split("text", " ").alias("ot"),
    )
    rows = joined.collect()
    release_staged_caches()
    assert len(rows) == 500
    assert any(r["n_removed"] > 0 for r in rows)  # fixture non-vacuous
    for r in rows:
        kept = [t for t in r["ct"] if t != ""]
        orig = list(r["ot"])
        assert r["n_removed"] == r["n_tokens"] - len(kept)
        # kept tokens are a subsequence of the original token stream
        it = iter(orig)
        assert all(t in it for t in kept), r["doc_id"]
