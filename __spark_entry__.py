"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data ops (dedup / similarity / analysis);
the driver compares each Spark result against the DuckDB oracle at
sf=0.01 (row count + schema + order-insensitive value hash).

Every registered query has a full DuckDB oracle (including the
multimodal mapInPandas stages, whose checked outputs are exact
ints/strings regenerable from range()). The crawl loop itself — bloom
shards, checkpoint/resume, salvage, politeness, quotas — is verified by
the pytest suite against the pure-Python simulator
(tests/test_engine_parity.py etc.).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_core_spark.plans import demo_queries as dq
from spider_core_spark.textops import analysis as ta
from spider_core_spark.textops import dedup as td
from spider_core_spark.textops import multimodal as tm
from spider_core_spark.textops import packing as tp
from spider_core_spark.textops import semantic as sm
from spider_core_spark.sources import warc_io as wio
from spider_core_spark.textops import similarity as ts
from spider_core_spark.textops import suffixes as sx


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: politeness-capped ordered crawl wave (F1+F2+J1 composed)
    over sf0.001 — per-host top-3 ordered wave with joined 'page' payload."""
    sf = "/root/testdata/sf0.001"
    wave = dq.f2_politeness_topk(spark, sf)
    o = spark.read.parquet(f"{sf}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    return (
        wave.join(o.select("o_orderkey", "o_totalprice"), "o_orderkey")
        .join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"), "c_name")),
            "o_custkey",
        )
        .select(
            "o_custkey", "host_rank", "o_orderkey", "o_totalprice", "c_name"
        )
    )


# Driver-gate rotation (r5 verdict "Next round" #1): the driver checks
# the first ~50 dict entries per round. Round 6's front is exactly the
# complement of CORRECTNESS_r05's 50 checked ids: text_corpus_stats
# FIRST (the only id whose last driver row is the r3 hash FAIL — the
# BIGINT-cast fix has passed the local replica since r5 but was never
# driver-certified), then every id whose latest green row is r4
# (stalest-first = their registry order). CORRECTNESS_r06 ∪ r05 then
# covers the whole registry, keeping every id inside a trailing-two-
# round green window. (The local pytest replica,
# tests/test_entry_queries.py, always runs all entries regardless.)
_GATE_FRONT = [
    "text_corpus_stats",
    "f0_seed_injection",
    "f1_wave_order",
    "f2_politeness_topk",
    "f3_retry_gate",
    "f5_recrawl_schedule",
    "f6_pagerank_priority",
    "g1_degree_histogram",
    "j1_fetch_join",
    "j1_left_misses",
    "j2_anti_dedup",
    "j5_anchor_agg",
    "u1_union_distinct",
    "u2_queue_salvage",
    "p2_first_seen",
    "p4_request_drop",
    "p5_response_drop",
    "s2_host_extract",
    "s5_byte_format",
    "s8_url_canonicalize",
    "s9_sitemap_parse",
    "p7_blocklist_filter",
    "u3_hll_registers",
    "u4_bloom_membership",
    "f7_quality_priority",
    "f8_trap_detect",
    "a1_counters",
    "a2_status_histogram",
    "a3_timing_stats",
    "a4_parse_timing",
    "a6_sliding_rate",
    "a6_ema",
    "a7_pipeline_timing",
    "a8_perhost_feedback",
    "a9_latency_percentiles",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_ngram_exact",
    "dedup_embedding_cosine",
    "dedup_embedding_ivf",
    "dedup_neardup_clusters",
    "dedup_minhash_incremental",
    "emb_kmeans",
    "dedup_semantic",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    # --- past the ~50 cap: the r5-checked ids, in their r5 gate order,
    # so queries() and oracle_sql() stay identically ordered end to end
    "s10_robots_sitemaps",
    "text_bpe_encode_udf",
    "text_suffix_array",
    "text_suffix_maxdup",
    "src_warc_roundtrip",
    "j6_redirect_resolve",
    "j7_mirror_detect",
    "u5_cuckoo_membership",
    "text_mixture_sample",
    "ann_ivfpq_topk",
    "ann_int8_topk",
    "ann_pq_topk",
    "mm_patchify",
    "text_corpus_keepers_neardup",
    "text_decontaminate",
    "text_boilerplate",
    "text_pii_scrub",
    "text_normalize",
    "text_source_mix",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_corpus_prep",
    "text_pack_sequences",
    "text_gopher_rules",
    "text_dup_spans",
    "text_dupspan_scrub",
    "text_keywords_topk",
    "text_quality_classifier",
    "text_cms_heavyhitters",
    "text_corpus_prep_v2",
    "text_split_assign",
    "text_dsir_sample",
    "text_length_quantiles",
    "text_tfidf_search",
    "text_split_leakage",
    "text_sample_fixed_n",
    "text_bpe_merges",
    "text_bpe_encode",
    "s7_robots_parse",
    "ann_ivf_topk",
    "mm_features",
    "mm_frame_sample",
    "text_langid",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "text_vocab_topk",
    "text_corpus_keepers",
    "text_corpus_sample",
    "text_repetition",
]


def _gate_rotated(d: dict) -> dict:
    front = {k: d[k] for k in _GATE_FRONT if k in d}
    return {**front, **{k: v for k, v in d.items() if k not in front}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        # crawl operators (SURVEY.md §2) on TPC-H-ish tables
        "f0_seed_injection": dq.f0_seed_injection,
        "f1_wave_order": dq.f1_wave_order,
        "f2_politeness_topk": dq.f2_politeness_topk,
        "f3_retry_gate": dq.f3_retry_gate,
        "f5_recrawl_schedule": dq.f5_recrawl_schedule,
        "f6_pagerank_priority": dq.f6_pagerank_priority,
        "g1_degree_histogram": dq.g1_degree_histogram,
        "j1_fetch_join": dq.j1_fetch_join,
        "j1_left_misses": dq.j1_left_misses,
        "j2_anti_dedup": dq.j2_anti_dedup,
        "j5_anchor_agg": dq.j5_anchor_agg,
        # redirect-chain resolution (pointer doubling, log-rounds) and
        # content-mirror canonical-URL election — beyond-reference crawl
        # realism (the reference has no 3xx handling)
        "j6_redirect_resolve": dq.j6_redirect_resolve,
        "j7_mirror_detect": dq.j7_mirror_detect,
        "u1_union_distinct": dq.u1_union_distinct,
        "u2_queue_salvage": dq.u2_queue_salvage,
        "p2_first_seen": dq.p2_first_seen,
        "p4_request_drop": dq.p4_request_drop,
        "p5_response_drop": dq.p5_response_drop,
        "s2_host_extract": dq.s2_host_extract,
        "s5_byte_format": dq.s5_byte_format,
        "s7_robots_parse": dq.s7_robots_parse,
        "s8_url_canonicalize": dq.s8_url_canonicalize,
        "s9_sitemap_parse": dq.s9_sitemap_parse,
        # full push-discovery chain: robots Sitemap: directives →
        # fetched-blob resolution join → ordered frontier seeds
        "s10_robots_sitemaps": dq.s10_robots_sitemaps,
        "p7_blocklist_filter": dq.p7_blocklist_filter,
        "u3_hll_registers": dq.u3_hll_registers,
        "u4_bloom_membership": dq.u4_bloom_membership,
        # deletable cuckoo seen-tier (recrawl eviction), relationally
        # certified via placement independence — see operators/cuckoo.py
        "u5_cuckoo_membership": dq.u5_cuckoo_membership,
        "f7_quality_priority": dq.f7_quality_priority,
        "f8_trap_detect": dq.f8_trap_detect,
        "a1_counters": dq.a1_counters,
        "a2_status_histogram": dq.a2_status_histogram,
        "a3_timing_stats": dq.a3_timing_stats,
        "a4_parse_timing": dq.a4_parse_timing,
        "a6_sliding_rate": dq.a6_sliding_rate,
        "a6_ema": dq.a6_ema,
        "a7_pipeline_timing": dq.a7_pipeline_timing,
        "a8_perhost_feedback": dq.a8_perhost_feedback,
        "a9_latency_percentiles": dq.a9_latency_percentiles,
        # training-data ops: dedup suite
        "dedup_exact": td.exact_dedup,
        "dedup_minhash_bands": td.minhash_bands,
        "dedup_minhash_pairs": td.minhash_pairs,
        "dedup_simhash": td.simhash,
        "dedup_simhash_pairs": td.simhash_pairs,
        "dedup_ngram_jaccard": td.ngram_jaccard_pairs,
        "dedup_ngram_exact": td.ngram_jaccard_pairs_exact,
        # registered at COSINE_REGISTERED (0.35): the 0.9 default yields 0
        # expected rows on this fixture — a vacuous hash match (r3 #2)
        "dedup_embedding_cosine": lambda spark, sf: td.embedding_neardup(
            spark, sf, threshold=td.COSINE_REGISTERED
        ),
        # k=None → K ≈ √N on BOTH sides (oracle uses a scalar subquery),
        # so the one registered query is correctly sized at sf0.01
        # (K=22) and sf0.1 (K=70) alike — the fixed-K=8 form made cells
        # N/8-sized and the pair pass quadratic at bench scale
        "dedup_embedding_ivf": lambda spark, sf: td.embedding_ivf_neardup(
            spark, sf, k=None, threshold=td.COSINE_REGISTERED
        ),
        "dedup_neardup_clusters": td.neardup_clusters,
        "dedup_minhash_incremental": td.minhash_incremental,
        # embedding-space curation: integer-Lloyd k-means (bit-stable
        # across engines — exact int64 arithmetic end-to-end) and the
        # SemDeDup within-cluster pruning pass on the learned cells
        "emb_kmeans": sm.kmeans_assign,
        "dedup_semantic": sm.semantic_neardup,
        # similarity search
        "ann_bruteforce_topk": ts.ann_bruteforce_topk,
        "ann_lsh_topk": ts.ann_lsh_topk,
        # k=None → K ≈ √N on both sides (oracle scalar subquery): correct
        # cell sizing at every scale factor, like dedup_embedding_ivf
        "ann_ivf_topk": lambda spark, sf: ts.ann_ivf_topk(spark, sf, k=None),
        # text analysis
        "text_langid": ta.lang_id,
        "text_quality": ta.quality_score,
        "text_tokens": ta.token_counts,
        "text_fingerprint": ta.doc_fingerprint,
        "text_vocab_topk": ta.vocab_topk,
        "text_corpus_keepers": ta.corpus_keepers,
        "text_corpus_keepers_neardup": ta.corpus_keepers_neardup,
        "text_corpus_sample": ta.corpus_sample_stratified,
        "text_repetition": ta.repetition_scores,
        "text_corpus_stats": ta.corpus_stats,
        "text_decontaminate": ta.decontaminate,
        "text_boilerplate": ta.boilerplate_fraction,
        "text_pii_scrub": ta.pii_scrub,
        "text_normalize": ta.normalize_text,
        "text_source_mix": ta.source_mix,
        "text_unigram_logprob": ta.unigram_logprob,
        "text_bigram_logprob": ta.bigram_logprob,
        "text_corpus_prep": ta.corpus_prep,
        "text_pack_sequences": tp.pack_sequences,
        "text_gopher_rules": ta.gopher_rules,
        "text_dup_spans": ta.dup_spans,
        "text_dupspan_scrub": ta.dupspan_scrub,
        "text_keywords_topk": ta.keywords_topk,
        "text_quality_classifier": ta.quality_classifier,
        "text_cms_heavyhitters": ta.cms_heavyhitters,
        "text_corpus_prep_v2": ta.corpus_prep_v2,
        "text_split_assign": ta.split_assign,
        "text_dsir_sample": ta.dsir_sample,
        "text_length_quantiles": ta.length_quantiles,
        "text_tfidf_search": ta.tfidf_search,
        "text_split_leakage": ta.split_leakage,
        "text_sample_fixed_n": ta.corpus_sample_fixed_n,
        # token-budget mixture rebalancing (per-language permille weights)
        # on the grouped prefix-sum machinery
        "text_mixture_sample": ta.mixture_sample,
        "text_bpe_merges": ta.bpe_merges,
        # apply the learned merges: per-doc token counts under the
        # trained subword vocabulary (one narrow pass + combinable agg)
        "text_bpe_encode": ta.bpe_encode,
        # production transport for the same application: Arrow-batched
        # mapInPandas dict-loop tokenizer over the same learned table
        "text_bpe_encode_udf": ta.bpe_encode_udf,
        "ann_int8_topk": ts.ann_int8_topk,
        "ann_pq_topk": ts.ann_pq_topk,
        # IVFADC composition (coarse cells + residual-PQ ADC over only
        # the probed cells) — the sub-linear billion-scale ANN recipe
        "ann_ivfpq_topk": ts.ann_ivfpq_topk,
        # multimodal plumbing: mapInPandas stages over a deterministic
        # synthetic media table; checked outputs are exact ints/strings so
        # the DuckDB oracle (range()-generated, no external data) matches
        "mm_features": lambda spark, sf: tm.features_checked(
            tm.synth_media_df(spark)
        ),
        "mm_frame_sample": lambda spark, sf: tm.sample_frames(
            tm.synth_media_df(spark)
        ),
        "mm_patchify": lambda spark, sf: tm.patchify(tm.synth_media_df(spark)),
        # WARC source/sink certification: documents -> .warc.gz shards ->
        # parse-back; oracle recomputes every column from documents, so
        # equality proves the encode/decode roundtrip lossless
        "src_warc_roundtrip": wio.warc_roundtrip_query,
        # distributed generalized suffix array (prefix doubling) + exact
        # duplicated-substring detection from adjacent-entry LCPs — the
        # exact counterpart of text_dup_spans' hashed approximation
        "text_suffix_array": sx.suffix_array,
        "text_suffix_maxdup": sx.suffix_maxdup,
    }
    return _gate_rotated(q)


def oracle_sql() -> dict[str, str]:
    return _gate_rotated({
        "f0_seed_injection": dq.F0_SQL,
        "f1_wave_order": dq.F1_SQL,
        "f2_politeness_topk": dq.F2_SQL,
        "f3_retry_gate": dq.F3_SQL,
        "f5_recrawl_schedule": dq.F5_SQL,
        "f6_pagerank_priority": dq.F6_SQL,
        "g1_degree_histogram": dq.G1_SQL,
        "j1_fetch_join": dq.J1_SQL,
        "j1_left_misses": dq.J1_LEFT_SQL,
        "j2_anti_dedup": dq.J2_SQL,
        "j5_anchor_agg": dq.J5_SQL,
        "j6_redirect_resolve": dq.J6_SQL,
        "j7_mirror_detect": dq.J7_SQL,
        "u1_union_distinct": dq.U1_SQL,
        "u2_queue_salvage": dq.U2_SQL,
        "p2_first_seen": dq.P2_SQL,
        "p4_request_drop": dq.P4_SQL,
        "p5_response_drop": dq.P5_SQL,
        "s2_host_extract": dq.S2_SQL,
        "s5_byte_format": dq.S5_SQL,
        "s7_robots_parse": dq.S7_SQL,
        "s8_url_canonicalize": dq.S8_SQL,
        "s9_sitemap_parse": dq.S9_SQL,
        "s10_robots_sitemaps": dq.S10_SQL,
        "p7_blocklist_filter": dq.P7_SQL,
        "u3_hll_registers": dq.U3_SQL,
        "u4_bloom_membership": dq.U4_SQL,
        "u5_cuckoo_membership": dq.U5_SQL,
        "src_warc_roundtrip": wio.WARC_RT_SQL,
        "text_suffix_array": sx.suffix_array_sql(),
        "text_suffix_maxdup": sx.suffix_maxdup_sql(),
        "f7_quality_priority": dq.F7_SQL,
        "f8_trap_detect": dq.F8_SQL,
        "a1_counters": dq.A1_SQL,
        "a2_status_histogram": dq.A2_SQL,
        "a3_timing_stats": dq.A3_SQL,
        "a4_parse_timing": dq.A4_SQL,
        "a6_sliding_rate": dq.A6_SQL,
        "a6_ema": dq.A6_EMA_SQL,
        "a7_pipeline_timing": dq.A7_SQL,
        "a8_perhost_feedback": dq.A8_SQL,
        "a9_latency_percentiles": dq.A9_SQL,
        "dedup_exact": td.EXACT_DEDUP_SQL,
        "dedup_minhash_bands": td.minhash_bands_sql(),
        "dedup_minhash_pairs": td.minhash_pairs_sql(),
        "dedup_simhash": td.simhash_sql(),
        "dedup_simhash_pairs": td.simhash_pairs_sql(),
        "dedup_ngram_jaccard": td.ngram_jaccard_sql(),
        "dedup_ngram_exact": td.ngram_jaccard_exact_sql(),
        "dedup_embedding_cosine": td.embedding_neardup_sql(
            threshold=td.COSINE_REGISTERED
        ),
        "dedup_embedding_ivf": td.embedding_ivf_sql(
            k=None, threshold=td.COSINE_REGISTERED
        ),
        "dedup_neardup_clusters": td.neardup_clusters_sql(),
        "dedup_minhash_incremental": td.minhash_incremental_sql(),
        "emb_kmeans": sm.kmeans_sql(),
        "dedup_semantic": sm.semantic_neardup_sql(),
        "ann_bruteforce_topk": ts.ANN_BRUTEFORCE_SQL,
        "ann_lsh_topk": ts.ann_lsh_sql(),
        "ann_ivf_topk": ts.ann_ivf_sql(k=None),
        "text_langid": ta.lang_id_sql(),
        "text_quality": ta.quality_score_sql(),
        "text_tokens": ta.TOKEN_COUNTS_SQL,
        "text_fingerprint": ta.DOC_FINGERPRINT_SQL,
        "text_vocab_topk": ta.vocab_topk_sql(),
        "text_corpus_keepers": ta.corpus_keepers_sql(),
        "text_corpus_keepers_neardup": ta.corpus_keepers_neardup_sql(),
        "text_corpus_sample": ta.corpus_sample_sql(),
        "text_repetition": ta.repetition_scores_sql(),
        "text_corpus_stats": ta.CORPUS_STATS_SQL,
        "text_decontaminate": ta.decontaminate_sql(),
        "text_boilerplate": ta.boilerplate_fraction_sql(),
        "text_pii_scrub": ta.pii_scrub_sql(),
        "text_normalize": ta.normalize_text_sql(),
        "text_source_mix": ta.source_mix_sql(),
        "text_unigram_logprob": ta.unigram_logprob_sql(),
        "text_bigram_logprob": ta.bigram_logprob_sql(),
        "text_corpus_prep": ta.corpus_prep_sql(),
        "text_pack_sequences": tp.pack_sequences_sql(),
        "text_gopher_rules": ta.gopher_rules_sql(),
        "text_dup_spans": ta.dup_spans_sql(),
        "text_dupspan_scrub": ta.dupspan_scrub_sql(),
        "text_keywords_topk": ta.keywords_topk_sql(),
        "text_quality_classifier": ta.quality_classifier_sql(),
        "text_cms_heavyhitters": ta.cms_heavyhitters_sql(),
        "text_corpus_prep_v2": ta.corpus_prep_v2_sql(),
        "text_split_assign": ta.split_assign_sql(),
        "text_dsir_sample": ta.dsir_sample_sql(),
        "text_length_quantiles": ta.length_quantiles_sql(),
        "text_tfidf_search": ta.tfidf_search_sql(),
        "text_split_leakage": ta.split_leakage_sql(),
        "text_sample_fixed_n": ta.corpus_sample_fixed_n_sql(),
        "text_mixture_sample": ta.mixture_sample_sql(),
        "text_bpe_merges": ta.bpe_merges_sql(),
        "text_bpe_encode": ta.bpe_encode_sql(),
        # same oracle on purpose: certifies the UDF transport produces
        # the identical frame the declarative expression stack does
        "text_bpe_encode_udf": ta.bpe_encode_sql(),
        "ann_int8_topk": ts.ANN_INT8_SQL,
        "ann_pq_topk": ts.ann_pq_sql(),
        "ann_ivfpq_topk": ts.ann_ivfpq_sql(),
        "mm_features": tm.features_sql(),
        "mm_frame_sample": tm.frames_sql(),
        "mm_patchify": tm.patchify_sql(),
    })
