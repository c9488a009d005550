"""Invariant tests for the round-4 sketch/selection operators:

- U3 HyperLogLog: register layout (pure-Python twin), shard-merge
  property (max-merge of split sketches == whole-corpus sketch — the
  property that lets 10^10-URL shards union without a distinct shuffle),
  and estimator accuracy vs the true distinct count.
- DSIR sample: determinism across runs, K respected, and the selection
  actually tilts toward the target distribution (selected docs' mean
  importance weight above the corpus mean).
- F7 quality priority: the all-integer priority formula holds row-by-row
  and the returned wave is the global descending-priority prefix.
"""

import math

import duckdb
import pytest

from spider_core_spark.functions.hashing import h64_py
from spider_core_spark.plans.demo_queries import (
    F7_TOPK,
    HLL_M,
    _HLL_WBITS,
    f7_quality_priority,
    hll_estimate,
    u3_hll_registers,
)
from spider_core_spark.textops.analysis import DSIR_K, dsir_sample

SF = "/root/testdata/sf0.001"


def _py_registers(urls):
    regs = [0] * HLL_M
    for u in urls:
        h = h64_py(u)
        bucket = h % HLL_M
        w = h // HLL_M
        rho = (_HLL_WBITS + 1) if w == 0 else (_HLL_WBITS + 1) - w.bit_length()
        regs[bucket] = max(regs[bucket], rho)
    return regs


def _fixture_urls():
    rows = duckdb.sql(
        "SELECT 'http://h' || (l_suppkey % 100) || '.test/o' || l_orderkey "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchall()
    return [r[0] for r in rows]


def test_hll_registers_match_python_twin(spark):
    got = {
        r["bucket"]: r["register"]
        for r in u3_hll_registers(spark, SF).collect()
    }
    want = _py_registers(_fixture_urls())
    assert got == {i: w for i, w in enumerate(want)}


def test_hll_shard_merge_is_max():
    # Sketches built per-shard then merged with element-wise max must
    # equal the whole-corpus sketch (how 10^10-URL shard sketches union).
    urls = _fixture_urls()
    whole = _py_registers(urls)
    a = _py_registers(urls[::2])
    b = _py_registers(urls[1::2])
    assert [max(x, y) for x, y in zip(a, b)] == whole


def test_hll_estimate_accuracy():
    urls = _fixture_urls()
    est = hll_estimate(_py_registers(urls))
    true = len(set(urls))
    # m=256 gives ~6.5% standard error; 3 sigma bound
    assert abs(est - true) / true < 0.2


def test_hll_estimate_small_range_linear_counting():
    est = hll_estimate(_py_registers([f"u{i}" for i in range(10)]))
    assert abs(est - 10) <= 2


def test_dsir_deterministic_and_k(spark):
    a = [tuple(r) for r in dsir_sample(spark, SF).collect()]
    b = [tuple(r) for r in dsir_sample(spark, SF).collect()]
    assert a == b
    assert len(a) == DSIR_K or len(a) == duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    ks = [r[3] for r in a]
    assert ks == sorted(ks, reverse=True) or len(set(ks)) < len(ks)


def test_dsir_tilts_toward_target(spark):
    rows = dsir_sample(spark, SF, k=50).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert n_docs > 50  # selection is a strict subset
    # importance resampling must prefer high-weight (target-like) docs:
    # every selected key = logw + gumbel; check the selected docs' mean
    # logw clears the full-corpus mean logw.
    full = dsir_sample(spark, SF, k=n_docs).collect()
    mean_all = sum(r["logw_milli"] for r in full) / len(full)
    mean_sel = sum(r["logw_milli"] for r in rows) / len(rows)
    assert mean_sel > mean_all


def test_length_quantiles_match_sorted_definition(spark):
    # type-1 quantile vs a direct python computation on sorted lengths
    from spider_core_spark.textops.analysis import length_quantiles

    got = {
        (r["lang"], r["pct"]): (r["n_docs"], r["q_tokens"])
        for r in length_quantiles(spark, SF).collect()
    }
    rows = duckdb.sql(
        "SELECT lang, len(string_split(text, ' ')) FROM "
        f"read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    by_lang = {}
    for lang, n in rows:
        by_lang.setdefault(lang, []).append(n)
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        for pct in (25, 50, 75, 95):
            # smallest v with cum count >= ceil(pct*n/100)
            idx = -(-pct * n // 100)  # ceil
            assert got[(lang, pct)] == (n, vals[idx - 1]), (lang, pct)


def test_trap_detect_formula(spark):
    from spider_core_spark.plans.demo_queries import (
        TRAP_DEPTH_MILLI,
        TRAP_LOOPY_MILLI,
        f8_trap_detect,
    )

    rows = f8_trap_detect(spark, SF).collect()
    assert rows
    n_trap = sum(r["is_trap"] for r in rows)
    assert 0 < n_trap < len(rows)  # non-vacuous both ways
    for r in rows:
        assert r["is_trap"] == (
            r["loopy_milli"] >= TRAP_LOOPY_MILLI
            or r["depth_milli"] >= TRAP_DEPTH_MILLI
        )
        assert 0 <= r["loopy_milli"] <= 1000
        assert r["n_urls"] > 0


def test_g1_degree_histogram_conserves_nodes(spark):
    from spider_core_spark.plans.demo_queries import (
        PR_SEED,
        g1_degree_histogram,
    )
    from spider_core_spark.functions.hashing import h64_py

    rows = g1_degree_histogram(spark, SF).collect()
    got = {
        d: sum(r["n_nodes"] for r in rows if r["direction"] == d)
        for d in ("out", "in")
    }
    ev = duckdb.sql(
        f"SELECT event_id, user_id FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    n = max(u for _, u in ev) + 1
    edges = [
        (u, h64_py(str(e), PR_SEED) % n)
        for e, u in ev
        if u != h64_py(str(e), PR_SEED) % n
    ]
    assert got["out"] == len({s for s, _ in edges})
    assert got["in"] == len({d for _, d in edges})


def test_j5_anchor_ranks_contiguous(spark):
    from spider_core_spark.plans.demo_queries import ANCHOR_TOPK, j5_anchor_agg

    rows = j5_anchor_agg(spark, SF).collect()
    by_target = {}
    for r in rows:
        by_target.setdefault(r["target"], []).append((r["rank"], r["cnt"]))
    assert by_target
    for tgt, rs in by_target.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, len(rs) + 1)), tgt
        assert len(rs) <= ANCHOR_TOPK
        cnts = [c for _, c in rs]
        assert cnts == sorted(cnts, reverse=True), tgt


def test_bpe_merges_match_python_twin(spark, tmp_path):
    from spider_core_spark.textops.analysis import bpe_merges

    texts = [
        "the then there that other mother",
        "in inner thin string ring bring",
        "the other string in the ring",
    ]
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = sorted(
        tuple(r) for r in bpe_merges(spark, str(tmp_path), n_merges=3).collect()
    )

    # pure-python twin of the same TOKEN-AWARE greedy merge loop: the
    # canonical fold over the symbol list (Sennrich's merge), so the
    # Spark/DuckDB widened-separator replace is checked against an
    # implementation that structurally CANNOT match across symbol
    # boundaries (round-4 ADVICE: after 't h'->'th', pair 'h e' must not
    # rewrite ['th','e'])
    def fold_merge(toks: list[str], a: str, b: str) -> list[str]:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    seqs = [" ".join(w) for t in texts for w in t.split(" ")]
    want = []
    for it in range(1, 4):
        counts: dict[str, int] = {}
        for s in seqs:
            toks = s.split(" ")
            for a, b in zip(toks, toks[1:]):
                counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + 1
        pair = min(counts, key=lambda p: (-counts[p], p))
        want.append((it, pair, counts[pair]))
        a, b = pair.split(" ")
        seqs = [" ".join(fold_merge(s.split(" "), a, b)) for s in seqs]
    assert got == sorted(want)


def test_bpe_merge_is_token_aware_and_greedy():
    """The widened-separator replace (shared by the Spark and DuckDB
    engines) must equal the canonical list-fold merge on the tricky
    shapes: cross-boundary candidates and overlapping chains."""

    def padded_apply(s: str, pair: str) -> str:
        pat = " " + pair.replace(" ", "  ") + " "
        rep = " " + pair.replace(" ", "") + " "
        padded = " " + s.replace(" ", "  ") + " "
        return padded.replace(pat, rep).replace("  ", " ").strip()

    def fold_merge(toks: list[str], a: str, b: str) -> list[str]:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    cases = [
        ("th e", "h e"),      # ADVICE case: must stay ['th','e']
        ("A B A B", "A B"),   # chain -> ['AB','AB']
        ("A B A B A B", "A B"),
        ("B B B", "B B"),     # self-pair greedy -> ['BB','B']
        ("A A A A", "A A"),
        ("t h e t h", "t h"),
        ("th e re", "h e"),
        ("x", "a b"),         # no-op on a single symbol
    ]
    for s, pair in cases:
        a, b = pair.split(" ")
        assert padded_apply(s, pair) == " ".join(fold_merge(s.split(" "), a, b)), (
            s,
            pair,
        )


def test_pq_recall_vs_exact_quantized_l2(spark):
    """PQ approximation contract: recall@10 against the EXACT quantized-
    L2 top-10 (apples-to-apples — PQ approximates that metric). Measured
    0.2/0.5/0.4 per query at the registered M=8, K=16, iters=1 config on
    the unstructured synthetic embeddings (32 bits vs 512 bytes = 128x
    compression); floor set at mean >= 0.2. K/M/iters are the quality
    dial on real, clustered data."""
    from spider_core_spark.textops.similarity import N_QUERIES, ann_pq_topk

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    qv = {v: [round(x * 1_000_000) for x in e] for v, e in rows}

    def l2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    exact = {
        nq: {
            v
            for _, v in sorted(
                (l2(qv[nq], qv[v]), v) for v in qv if v != nq
            )[:10]
        }
        for nq in range(N_QUERIES)
    }
    got = {}
    for r in ann_pq_topk(spark, SF).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact[nq] & got.get(nq, set())) / 10 for nq in range(N_QUERIES)
    ]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_u4_bloom_no_false_negatives(spark):
    from spider_core_spark.plans.demo_queries import u4_bloom_membership

    rows = u4_bloom_membership(spark, SF).collect()
    seen = [r for r in rows if r["actually_seen"]]
    unseen = [r for r in rows if not r["actually_seen"]]
    assert seen and unseen
    # the Bloom contract: a seen key ALWAYS hits
    assert all(r["bloom_hit"] for r in seen)
    for r in rows:
        assert r["false_positive"] == (r["bloom_hit"] and not r["actually_seen"])
    # fpr in the sized-for ballpark (~4% at 53% fill), never catastrophic
    fpr = sum(r["false_positive"] for r in unseen) / len(unseen)
    assert fpr < 0.2


def test_a9_percentiles_monotone(spark):
    from spider_core_spark.plans.demo_queries import (
        A9_PCTS,
        a9_latency_percentiles,
    )

    rows = a9_latency_percentiles(spark, SF).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], {})[r["pct"]] = (r["q_ms"], r["n_obs"])
    assert by_host
    for host, d in by_host.items():
        assert sorted(d) == sorted(A9_PCTS), host
        qs = [d[p][0] for p in sorted(A9_PCTS)]
        assert qs == sorted(qs), host  # tail percentiles never decrease
        assert len({d[p][1] for p in d}) == 1, host  # one n_obs per host


def test_fixed_n_sample_invariants(spark):
    from spider_core_spark.textops.analysis import corpus_sample_fixed_n

    n = 25
    rows = corpus_sample_fixed_n(spark, SF, n=n).collect()
    big = corpus_sample_fixed_n(spark, SF, n=n, small_threshold=0).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, big))
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["sample_rank"])
    for lang, ranks in per_lang.items():
        assert len(ranks) <= n
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang


def test_split_leakage_conserves_pairs(spark):
    from spider_core_spark.textops import dedup as td
    from spider_core_spark.textops.analysis import split_leakage

    rows = split_leakage(spark, SF).collect()
    n_pairs_total = td.minhash_pairs(spark, SF).count()
    td.release_staged_caches()
    assert sum(r["n_pairs"] for r in rows) == n_pairs_total
    for r in rows:
        assert r["leaked"] == (r["split_lo"] != r["split_hi"])
        assert r["split_lo"] <= r["split_hi"]  # normalized cell


def test_f7_formula_and_ordering(spark):
    rows = f7_quality_priority(spark, SF).collect()
    assert len(rows) == F7_TOPK
    for r in rows:
        assert r["eff_pri"] == (6 - r["base_pri"]) * 1_000_000 + r["host_q_milli"]
        assert 1 <= r["base_pri"] <= 5
    pris = [r["eff_pri"] for r in rows]
    assert pris == sorted(pris, reverse=True)
    # feedback is live: at least two distinct host-quality values among
    # selected hosts (the boost actually differentiates hosts)
    assert len({r["host_q_milli"] for r in rows}) > 1


def test_tfidf_oracle_escapes_apostrophe_terms(spark):
    """r4 ADVICE: a caller-supplied term containing a single quote must
    not break (or inject into) the DuckDB oracle string."""
    from spider_core_spark.textops.analysis import tfidf_search, tfidf_search_sql

    terms = ["it's", "spark"]
    sql = tfidf_search_sql(terms=terms)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    drows = sorted(tuple(map(str, r)) for r in con.execute(sql).fetchall())
    srows = sorted(
        tuple(map(str, r)) for r in tfidf_search(spark, SF, terms=terms).collect()
    )
    assert srows == drows


def test_hll_pad_registers_gives_full_spine(spark):
    """r4 ADVICE: collected streaming registers must be zero-padded to
    HLL_M before hll_estimate (whose m = len(registers))."""
    from spider_core_spark.plans.demo_queries import HLL_M, hll_estimate
    from spider_core_spark.streaming.metrics_stream import (
        hll_pad_registers,
        hll_register_stream,
    )

    urls = spark.createDataFrame(
        [(f"https://site{i % 7}.test/p/{i}",) for i in range(500)], "url string"
    )
    observed = hll_register_stream(urls).collect()
    full = hll_pad_registers(observed)
    assert len(full) == HLL_M
    est_full = hll_estimate(full)
    assert 500 * 0.7 <= est_full <= 500 * 1.3
    # feeding the raw observed rows would use the wrong m — the helper is
    # load-bearing, not cosmetic (only if some bucket went unobserved)
    assert {int(r["bucket"]) for r in observed} <= set(range(HLL_M))


def test_ivfpq_candidates_sublinear_and_from_probed_cells(spark):
    """IVFADC contract: every returned neighbor lies in one of the query's
    nprobe probed coarse cells, and the scored candidate count is
    ~nprobe/KC of the corpus — the sub-linear property that makes the
    composition the billion-scale recipe (ann_pq_topk is exhaustive)."""
    from pyspark.sql import functions as F

    from spider_core_spark.textops import similarity as ts
    from spider_core_spark.textops.semantic import _QV_SPARK, _best_centroid

    e = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("qv", F.expr(_QV_SPARK))
    )
    coarse = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]])
        for r in e.filter(F.col("vec_id") < ts.IVFPQ_KC).orderBy("vec_id").collect()
    ]
    cells = {
        int(r["vec_id"]): int(r["cid"])
        for r in e.withColumn("cid", _best_centroid(coarse)["cid"])
        .select("vec_id", "cid")
        .collect()
    }
    sizes: dict[int, int] = {}
    for cid in cells.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    n = len(cells)

    probed: dict[int, set[int]] = {}
    cand = 0
    for r in e.filter(F.col("vec_id") < ts.N_QUERIES).collect():
        qv = [int(x) for x in r["qv"]]
        by_d = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, qc)), cid)
            for cid, qc in coarse
        )
        probed[int(r["vec_id"])] = {cid for _, cid in by_d[: ts.IVFPQ_NPROBE]}
        cand += sum(sizes.get(cid, 0) for _, cid in by_d[: ts.IVFPQ_NPROBE])

    rows = ts.ann_ivfpq_topk(spark, SF).collect()
    assert rows
    for r in rows:
        assert cells[r["neighbor_id"]] in probed[r["query_id"]], tuple(r)
    # sub-linear: candidates ≈ nprobe/KC of Q·N (generous 60% ceiling
    # tolerates skewed seed cells on the tiny fixture)
    assert cand < 0.6 * ts.N_QUERIES * n


def test_bpe_encode_matches_python_twin(spark, tmp_path):
    """Applying the learned merges must reproduce the fold-merge token
    counts per document (the n_bpe_tokens a packing plan budgets with)."""
    from spider_core_spark.textops.analysis import bpe_encode, bpe_merges

    texts = [
        "the then there that other mother",
        "in inner thin string ring bring",
        "the other string in the ring",
    ]
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    merges = [
        r["pair"]
        for r in bpe_merges(spark, str(tmp_path), n_merges=3)
        .orderBy("iter")
        .collect()
    ]

    def fold_merge(toks, a, b):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    want = {}
    for did, t in enumerate(texts):
        n_words, n_tok = 0, 0
        for w in t.split(" "):
            if not w:
                continue
            toks = list(w)
            for pair in merges:
                a, b = pair.split(" ")
                toks = fold_merge(toks, a, b)
            n_words += 1
            n_tok += len(toks)
        want[did] = (n_words, n_tok)

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(spark, str(tmp_path), n_merges=3).collect()
    }
    assert got == want
    # merges actually compress: fewer tokens than characters
    total_chars = sum(len(w) for t in texts for w in t.split(" "))
    assert sum(v[1] for v in got.values()) < total_chars


def test_bpe_encode_udf_matches_expression_path(spark, tmp_path):
    """The production Arrow-batched dict-loop tokenizer (bpe_encode_udf)
    must produce the IDENTICAL frame as the declarative expression
    stack (bpe_encode) — same learned table, same sequential-pass
    greedy fold, transport swapped. Fixture includes repeated words
    (memo path), empty-split artifacts, and a word where a merge's
    symbols are present but never adjacent (set-membership skip that
    must still be a no-op, not a wrong merge)."""
    from spider_core_spark.textops.analysis import bpe_encode, bpe_encode_udf

    texts = [
        "the then there that other mother",
        "in inner thin string ring bring",
        "the the the  double  space",
        "he t eh th",  # 't','h' present / not adjacent cases
    ]
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    expr = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(spark, str(tmp_path), n_merges=3).collect()
    }
    udf = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_udf(spark, str(tmp_path), n_merges=3).collect()
    }
    assert udf == expr and len(udf) == len(texts)
