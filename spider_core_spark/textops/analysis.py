"""Text analysis for training-data pipelines: language-ID (stopword
n-gram heuristic), quality scoring, token counting (whitespace + BPE-ish
regex), and document fingerprinting.

Every operator stays JVM-side (builtin functions only — whole-stage
codegen, no Python in the hot path) and has an exactly matching DuckDB
oracle. All are per-row/narrow: at 100 TB they pipeline inside the scan
with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "small"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
}
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spider_core_spark.sources.scan import read_parquet_spread

    return read_parquet_spread(spark, f"{sf_dir}/documents.parquet")


def _stop_hits_spark(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"size(filter(split(lower(text), ' '), t -> array_contains(array({lst}), t)))"
    )


def _stop_hits_duck(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '), "
        f"t -> list_contains([{lst}], t)))"
    )


# ---------------------------------------------------------------- lang id
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax of per-language stopword hit counts, deterministic tiebreak
    en > de > fr. (The point is identical computation in both engines,
    not ground-truth accuracy.)"""
    d = _docs(spark, sf_dir)
    s = {lang: F.expr(_stop_hits_spark(lang)) for lang in STOPWORDS}
    pred = (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]), F.lit("en"))
        .when(s["de"] >= s["fr"], F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return d.select(
        "doc_id",
        s["en"].alias("hits_en"),
        s["de"].alias("hits_de"),
        s["fr"].alias("hits_fr"),
        pred.alias("lang_pred"),
    )


def lang_id_sql() -> str:
    en, de, fr = (_stop_hits_duck(x) for x in ("en", "de", "fr"))
    return f"""
SELECT doc_id,
       {en} AS hits_en, {de} AS hits_de, {fr} AS hits_fr,
       CASE WHEN {en} >= {de} AND {en} >= {fr} THEN 'en'
            WHEN {de} >= {fr} THEN 'de' ELSE 'fr' END AS lang_pred
FROM documents
"""


# ---------------------------------------------------------------- quality
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/diversity ratios + a composite score."""
    return quality_score_frame(_docs(spark, sf_dir))


def quality_score_frame(d: DataFrame) -> DataFrame:
    """Frame form of quality_score — reused verbatim by the streaming
    corpus-ingest path so stream and batch apply the identical bar."""
    toks = F.split(F.lower(F.col("text")), " ")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    stop = F.expr(_stop_hits_spark("en"))
    mean_len = F.round(
        (F.length("text") - (n_tok - 1)) / n_tok, 4
    )  # chars minus separators over tokens
    stop_ratio = F.round(stop / n_tok, 4)
    uniq_ratio = F.round(n_uniq / n_tok, 4)
    score = F.round(
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.2
        + uniq_ratio * 0.4,
        4,
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        uniq_ratio.alias("unique_ratio"),
        score.alias("quality_score"),
    )


def quality_score_sql() -> str:
    stop = _stop_hits_duck("en")
    return f"""
WITH t AS (
  SELECT doc_id, text,
         len(string_split(lower(text), ' ')) AS n_tok,
         len(list_distinct(string_split(lower(text), ' '))) AS n_uniq,
         {stop} AS stop
  FROM documents
)
SELECT doc_id,
       n_tok AS n_tokens,
       round((length(text) - (n_tok - 1))::DOUBLE / n_tok, 4) AS mean_token_len,
       round(stop::DOUBLE / n_tok, 4) AS stopword_ratio,
       round(n_uniq::DOUBLE / n_tok, 4) AS unique_ratio,
       round(least(n_tok / 100.0, 1.0) * 0.4 + round(stop::DOUBLE / n_tok, 4) * 0.2
             + round(n_uniq::DOUBLE / n_tok, 4) * 0.4, 4) AS quality_score
FROM t
"""


# ------------------------------------------------------------ token counts
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex piece count per doc."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{BPE_RE}', 0)")).alias(
            "bpe_pieces"
        ),
    )


TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '{BPE_RE}')) AS bpe_pieces
FROM documents
"""


# -------------------------------------------------------------- fingerprint
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint of normalized text (lower, collapse whitespace,
    trim) — the doc-level analog of the crawl URL fingerprint."""
    d = _docs(spark, sf_dir)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "\\s+", " "))
    return d.select("doc_id", F.sha2(norm, 256).alias("doc_fp"))


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS doc_fp
FROM documents
"""


# ------------------------------------------------------------ vocab top-k
VOCAB_TOPK = 10


def vocab_topk(spark: SparkSession, sf_dir: str, k: int = VOCAB_TOPK) -> DataFrame:
    """Per-language top-k vocabulary by document-token frequency — the
    tokenizer-training / corpus-inspection primitive. explode → one
    map-side-combinable groupBy on (lang, token) → per-lang top-k window;
    at 100 TB the heavy stage is the combinable count, and the window
    only ranks the (tiny) distinct-vocab aggregate. Deterministic
    tiebreak: (count desc, token asc)."""
    d = _docs(spark, sf_dir)
    tok = d.select(
        "lang", F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    counts = tok.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "token")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("lang", "rank", "token", "n")
    )


def vocab_topk_sql(k: int = VOCAB_TOPK) -> str:
    return f"""
WITH counts AS (
  SELECT lang, token, count(*) AS n
  FROM (SELECT lang, unnest(string_split(lower(text), ' ')) AS token
        FROM documents)
  GROUP BY 1, 2
)
SELECT lang, rank, token, n FROM (
  SELECT lang, token, n,
         (row_number() OVER (PARTITION BY lang ORDER BY n DESC, token))::INT
           AS rank
  FROM counts
) WHERE rank <= {k}
"""


# ---------------------------------------------------- corpus-clean pipeline
QUALITY_KEEP_MIN = 0.35


def corpus_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data cleaning pipeline in one query: exact
    dedup keepers (min doc_id per content hash) ∩ quality ≥ threshold —
    the shape of a real corpus-prep job (dedup → filter → select)."""
    from spider_core_spark.textops.dedup import exact_dedup

    d = _docs(spark, sf_dir)
    keepers = exact_dedup(spark, sf_dir).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    q = quality_score(spark, sf_dir).select("doc_id", "quality_score")
    return (
        d.join(keepers, "doc_id")
        .join(q, "doc_id")
        .filter(F.col("quality_score") >= QUALITY_KEEP_MIN)
        .select("doc_id", "lang", "n_chars", "quality_score")
    )


def corpus_keepers_sql() -> str:
    return f"""
WITH k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
q AS (SELECT doc_id, quality_score FROM ({quality_score_sql()}))
SELECT d.doc_id, d.lang, d.n_chars, q.quality_score
FROM documents d JOIN k USING (doc_id) JOIN q ON q.doc_id = d.doc_id
WHERE q.quality_score >= {QUALITY_KEEP_MIN}
"""


# ------------------------------------- corpus-clean incl. NEAR-dup clusters
def corpus_keepers_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-prep composition (VERDICT r3 next #5): exact-dup
    keepers ∩ near-dup-cluster keepers ∩ quality ≥ threshold. A doc
    survives iff it is (a) the min-doc_id copy of its exact content hash,
    (b) NOT a non-keeper member of a MinHash near-dup cluster (docs in no
    candidate pair are trivially keepers), and (c) above the quality bar.
    The near-dup side reuses neardup_clusters (min-label propagation over
    the banded candidate graph); the anti-join against the non-keeper set
    is wave-sized, not corpus-sized — at 100 TB the candidate graph holds
    only docs that share a band, a tiny fraction of the corpus."""
    from spider_core_spark.textops.dedup import exact_dedup, neardup_clusters

    d = _docs(spark, sf_dir)
    keepers = exact_dedup(spark, sf_dir).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    q = quality_score(spark, sf_dir).select("doc_id", "quality_score")
    non_keep = (
        neardup_clusters(spark, sf_dir)
        .filter(~F.col("is_keeper"))
        .select("doc_id")
    )
    return (
        d.join(keepers, "doc_id")
        .join(q, "doc_id")
        .join(non_keep, "doc_id", "left_anti")
        .filter(F.col("quality_score") >= QUALITY_KEEP_MIN)
        .select("doc_id", "lang", "n_chars", "quality_score")
    )


def corpus_keepers_neardup_sql() -> str:
    from spider_core_spark.textops.dedup import minhash_pairs_sql

    return f"""
WITH RECURSIVE pairs AS MATERIALIZED ({minhash_pairs_sql()}),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst FROM pairs
),
reach(v, lbl) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.v = e.dst
),
nonkeep AS (
  SELECT v AS doc_id FROM reach GROUP BY v HAVING v <> min(lbl)
),
k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
q AS (SELECT doc_id, quality_score FROM ({quality_score_sql()}))
SELECT d.doc_id, d.lang, d.n_chars, q.quality_score
FROM documents d JOIN k USING (doc_id) JOIN q ON q.doc_id = d.doc_id
WHERE q.quality_score >= {QUALITY_KEEP_MIN}
  AND d.doc_id NOT IN (SELECT doc_id FROM nonkeep)
"""


# ------------------------------------------------- full corpus-prep summary
def corpus_prep(spark: SparkSession, sf_dir: str, chunk_tokens: int = 2048) -> DataFrame:
    """The whole curation chain as ONE declarative plan, ending in the
    table a training launch actually reads — per-language packed-stream
    totals: docs kept, total whitespace tokens, and training sequences
    (ceil(total/chunk)) after

        exact-dup keepers ∩ near-dup-cluster keepers ∩ quality bar
        (corpus_keepers_neardup)  →  source-mix downsample (same integer
        thresholds + h64 seed as source_mix, computed from the FULL
        corpus so the two operators share one threshold table)  →
        per-lang chunk arithmetic (concat-and-chunk, as pack_sequences).

    Everything stays in one DAG: the near-dup side is candidate-graph-
    sized, the mix threshold pass is a 2-column corpus agg collected as
    n_sources scalars, and the final summary is a combinable groupBy —
    no stage rescans the corpus more than the composition requires."""
    from spider_core_spark.textops.dedup import _h64_spark

    d = _docs(spark, sf_dir)
    clean = corpus_keepers_neardup(spark, sf_dir).select("doc_id")
    docs = (
        d.join(clean, "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
    )
    # mix thresholds from the full corpus (shared with source_mix)
    rows = (
        d.groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("mass"))
        .collect()
    )
    total = sum(r["mass"] for r in rows)
    nsrc = len(rows)
    tdf = spark.createDataFrame(
        [
            (r["source"], min(_MIX_MOD, (total * _MIX_MOD) // (nsrc * r["mass"])))
            for r in rows
        ],
        "source string, thresh long",
    )
    bucket = F.pmod(
        F.expr(_h64_spark("cast(doc_id as string)", _MIX_SEED)),
        F.lit(_MIX_MOD),
    )
    kept = docs.join(F.broadcast(tdf), "source").filter(bucket < F.col("thresh"))
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr(
            f"(sum(n_tokens) + {chunk_tokens - 1}) div {chunk_tokens}"
        ).cast("long").alias("n_chunks"),
    )


def corpus_prep_sql(chunk_tokens: int = 2048) -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb("cast(doc_id as varchar)", seed=_MIX_SEED)
    return f"""
WITH clean AS (
  SELECT doc_id FROM ({corpus_keepers_neardup_sql()}) ck
), mix AS (
  SELECT source,
         least({_MIX_MOD},
               (SUM(sum_mass) OVER () * {_MIX_MOD})
                 // ((COUNT(*) OVER ()) * sum_mass))::BIGINT AS thresh
  FROM (SELECT source, sum(n_chars)::BIGINT AS sum_mass
        FROM documents GROUP BY source)
), kept AS (
  SELECT d.doc_id, d.lang,
         len(string_split(d.text, ' '))::BIGINT AS n_tokens
  FROM documents d
  JOIN clean USING (doc_id)
  JOIN mix ON mix.source = d.source
  WHERE {h} % {_MIX_MOD} < mix.thresh
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       ((sum(n_tokens) + {chunk_tokens - 1}) // {chunk_tokens})::BIGINT
           AS n_chunks
FROM kept GROUP BY lang
"""


# --------------------------------------------------- stratified sampling
# Per-language corpus mixing rates (a training-data pipeline's "data
# mixture"): fraction of docs kept per lang, decided by a DETERMINISTIC
# hash threshold — no RNG, so the sample is reproducible across runs,
# engines and partitionings (the property a 100 TB sampling job needs:
# re-running a failed stage must pick the SAME rows).
SAMPLE_RATES: dict[str, float] = {"en": 0.5, "de": 0.25, "fr": 0.25}
SAMPLE_DEFAULT_RATE = 0.1
_SAMPLE_MOD = 10_000


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: keep doc iff
    h64(doc_id, seed=77) mod 10000 < rate(lang)·10000. The hash is the
    shared sha-derived h64 primitive (seed-77 '77:' prefix in both
    engines), so the DuckDB oracle selects the bit-identical row set. One narrow scan, no shuffle, fully
    partition-parallel — sampling 100 TB costs one pruned pass."""
    from spider_core_spark.textops.dedup import _h64_spark

    d = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    rate = F.lit(SAMPLE_DEFAULT_RATE)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    bucket = F.pmod(
        F.expr(_h64_spark("cast(doc_id as string)", 77)), F.lit(_SAMPLE_MOD)
    )
    return (
        d.withColumn("_rate", rate)
        .filter(bucket < (F.col("_rate") * _SAMPLE_MOD).cast("long"))
        .select("doc_id", "lang", "n_chars")
    )


def corpus_sample_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb("cast(doc_id as varchar)", seed=77)
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {r}"
        for lang, r in sorted(SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         CASE {cases} ELSE {SAMPLE_DEFAULT_RATE} END AS _rate,
         {h} % {_SAMPLE_MOD} AS _bucket
  FROM documents
)
WHERE _bucket < CAST(_rate * {_SAMPLE_MOD} AS BIGINT)
"""


# ------------------------------------------------------ repetition scoring
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals — the standard "repetitive junk" quality
    gate for training corpora (boilerplate, keyword stuffing, generation
    loops): top_tok_ratio = most frequent token's share of all tokens;
    uniq_trigram_ratio = distinct 3-gram share. Both from ONE explode +
    map-side-combinable groupBy pair — no per-row quadratic scan, shuffle
    keyed by (doc_id, token) which is near-unique (no skew)."""
    from spider_core_spark.textops.dedup import _shingles_spark

    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr("split(text, ' ')").alias("_toks")
    )
    tok_stats = (
        d.select("doc_id", F.explode("_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.max("count").alias("_top"),
            F.sum("count").alias("n_tokens"),
        )
    )
    # stage the shingle array once — two references in one Project would
    # evaluate the transform twice per row (CollapseProject only protects
    # aliases staged in a LOWER Project)
    tri = d.select(
        "doc_id", F.expr(_shingles_spark("_toks")).alias("_sh")
    ).select(
        "doc_id",
        F.size(F.array_distinct("_sh")).alias("_uniq"),
        F.size("_sh").alias("_tot"),
    )
    return (
        tok_stats.join(tri, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long"),
            F.round(F.col("_top") / F.col("n_tokens"), 4).alias("top_tok_ratio"),
            F.round(F.col("_uniq") / F.col("_tot"), 4).alias("uniq_trigram_ratio"),
        )
    )


def repetition_scores_sql() -> str:
    from spider_core_spark.textops.dedup import _shingles_duck

    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
ts AS (
  SELECT doc_id, max(c) AS _top, sum(c) AS n_tokens
  FROM (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
  GROUP BY doc_id
),
tri AS (
  SELECT doc_id, len(list_distinct(_sh)) AS _uniq, len(_sh) AS _tot
  FROM (SELECT doc_id, {_shingles_duck()} AS _sh FROM documents)
)
SELECT ts.doc_id, n_tokens::BIGINT AS n_tokens,
       round(_top::DOUBLE / n_tokens, 4) AS top_tok_ratio,
       round(_uniq::DOUBLE / _tot, 4) AS uniq_trigram_ratio
FROM ts JOIN tri ON tri.doc_id = ts.doc_id
"""


# ------------------------------------------------------- decontamination
# Benchmark decontamination — the standard "did training data leak the
# eval set" gate: a corpus doc is contaminated iff it shares ≥1 complete
# n-token shingle with any benchmark document. Here the "benchmark" is
# the first DECON_BENCH_DOCS docs of the corpus (a deterministic stand-in
# for an external eval suite; a real run would read it from its own
# table). At 100 TB the benchmark shingle set is tiny (eval suites are
# MBs) → broadcast hash join against one pruned corpus scan; the corpus
# side never shuffles.
DECON_BENCH_DOCS = 20
DECON_NGRAM = 5
_DECON_SEED = 55


def _decon_shingles_spark() -> str:
    from spider_core_spark.textops.dedup import _h64_spark

    n = DECON_NGRAM
    sh = (
        f"transform(sequence(0, greatest(size(_toks) - {n}, 0)), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n})))"
    )
    return f"array_distinct(transform({sh}, x -> {_h64_spark('x', _DECON_SEED)}))"


def _decon_shingles_duck() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    n = DECON_NGRAM
    t = "string_split(text, ' ')"
    sh = (
        f"[array_to_string({t}[i:i+{n - 1}], ' ') "
        f"for i in range(1, greatest(len({t}) - {n - 1}, 1) + 1)]"
    )
    h = h64_duckdb("x", seed=_DECON_SEED)
    return f"list_distinct(list_transform({sh}, x -> {h}))"


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc contamination report vs the benchmark set: count of
    distinct benchmark-overlapping 5-gram shingles + the contaminated
    flag. One staged-shingle scan per side; benchmark side broadcasts."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr("split(text, ' ')").alias("_toks")
    ).select("doc_id", F.expr(_decon_shingles_spark()).alias("_sh"))
    bench = (
        d.filter(F.col("doc_id") < DECON_BENCH_DOCS)
        .select(F.explode("_sh").alias("h"))
        .distinct()
    )
    corpus = d.filter(F.col("doc_id") >= DECON_BENCH_DOCS)
    hits = (
        corpus.select("doc_id", F.explode("_sh").alias("h"))
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    # outer side needs only doc_id — don't recompute the shingle arrays
    ids = _docs(spark, sf_dir).select("doc_id").filter(
        F.col("doc_id") >= DECON_BENCH_DOCS
    )
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n"), F.lit(0)).cast("int").alias("n_hits"),
        (F.coalesce(F.col("n"), F.lit(0)) > 0).alias("contaminated"),
    )


def decontaminate_sql() -> str:
    return f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, {_decon_shingles_duck()} AS _sh FROM documents
),
bench AS (
  SELECT DISTINCT unnest(_sh) AS h FROM sh WHERE doc_id < {DECON_BENCH_DOCS}
),
hits AS (
  SELECT doc_id, count(*) AS n
  FROM (SELECT doc_id, unnest(_sh) AS h FROM sh
        WHERE doc_id >= {DECON_BENCH_DOCS}) c
  JOIN bench USING (h) GROUP BY doc_id
)
SELECT s.doc_id, coalesce(n, 0)::INT AS n_hits, coalesce(n, 0) > 0 AS contaminated
FROM sh s LEFT JOIN hits ON hits.doc_id = s.doc_id
WHERE s.doc_id >= {DECON_BENCH_DOCS}
"""


# -------------------------------------------------- boilerplate fraction
# Corpus-frequent shingle fraction — the "duplicated n-gram" quality
# signal (boilerplate headers/footers, templated spans): the share of a
# doc's 3-gram shingle OCCURRENCES whose shingle appears in ≥ K distinct
# documents corpus-wide. Two combinable aggregations on the shingle-hash
# key (high-cardinality — no skew): distinct-doc counts per shingle, then
# a join back and a per-doc ratio. No all-pairs anything.
BOILER_MIN_DOCS = 5


def boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spider_core_spark.textops.dedup import _h64_spark, _shingles_spark

    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr("split(text, ' ')").alias("_toks")
    ).select(
        "doc_id",
        F.expr(
            f"transform({_shingles_spark('_toks')}, x -> {_h64_spark('x', 21)})"
        ).alias("_sh"),
    )
    occ = d.select("doc_id", F.explode("_sh").alias("h"))
    freq = (
        occ.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("ndocs"))
    )
    per_doc = (
        occ.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("ndocs") >= BOILER_MIN_DOCS, 1).otherwise(0)
            ).alias("n_boiler"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_shingles").cast("long"),
        F.col("n_boiler").cast("long"),
        F.round(F.col("n_boiler") / F.col("n_shingles"), 4).alias(
            "boiler_frac"
        ),
    )


def boilerplate_fraction_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb
    from spider_core_spark.textops.dedup import _shingles_duck

    h = h64_duckdb("x", seed=21)
    return f"""
WITH occ AS MATERIALIZED (
  SELECT doc_id, unnest(list_transform({_shingles_duck()}, x -> {h})) AS h
  FROM documents
),
freq AS (
  SELECT h, count(*) AS ndocs FROM (SELECT DISTINCT doc_id, h FROM occ)
  GROUP BY h
)
SELECT doc_id,
       count(*)::BIGINT AS n_shingles,
       sum(CASE WHEN ndocs >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)::BIGINT
         AS n_boiler,
       round(sum(CASE WHEN ndocs >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 4) AS boiler_frac
FROM occ JOIN freq USING (h)
GROUP BY doc_id
"""


# --------------------------------------------------------------- PII scrub
# PII redaction — the standard pre-training privacy pass (emails/phone
# numbers → placeholder tokens). The synthetic corpus has no organic PII,
# so the QUERY deterministically appends a contact line derived from
# doc_id in BOTH engines before scrubbing (the s2_host_extract pattern:
# the injection is part of the oracle too, so the operator's match/replace
# path is exercised non-vacuously). Per-row regexp work: narrow, no
# shuffle, pipeline-parallel at any corpus size.
PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{4}"


def _pii_aug_spark():
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact emails/phones; returns counts + sha256 of the
    scrubbed text (narrow output, full-content verification)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    aug = _pii_aug_spark()
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    # patterns passed as Columns (F.lit) so they bypass SQL string-literal
    # escaping entirely — the Java regex sees exactly the Python string,
    # matching what DuckDB's RE2 sees in the oracle
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(aug, F.lit(PII_EMAIL_RE), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(aug, F.lit(PII_PHONE_RE), F.lit(0))
        ).alias("n_phones"),
        F.sha2(scrubbed, 256).alias("scrubbed_sha"),
    )


def pii_scrub_sql() -> str:
    aug = (
        "text || ' contact user' || doc_id || '@mail.example.com or +1-555-' "
        "|| lpad((doc_id % 10000)::VARCHAR, 4, '0')"
    )
    return f"""
SELECT doc_id,
       len(regexp_extract_all({aug}, '{PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all({aug}, '{PII_PHONE_RE}')) AS n_phones,
       sha256(regexp_replace(regexp_replace({aug}, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                             '{PII_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_sha
FROM documents
"""


# ------------------------------------------------------ text normalization
# Whitespace canonicalization: the first pass of every webtext pipeline
# (HTML extractors emit runs of spaces/tabs/newlines; downstream dedup and
# token counting want one canonical form). Pure JVM regexp — narrow,
# whole-stage-codegen, zero shuffles at any corpus size. The fixture text
# is already single-spaced, so (like pii_scrub) the operator injects a
# deterministic mess — leading tab, doubled interior spaces, trailing CRLF
# — in BOTH engines, making the collapse path non-vacuous under the
# driver's oracle gate. The character class is spelled with explicit
# \t \n \r \f \x0b escapes (interpreted identically by Java regex and
# DuckDB's RE2) rather than \s, whose class differs between engines.
NORM_WS_RE = "[ \\t\\n\\r\\f\\x0b]+"


def _norm_aug_spark():
    return F.concat(
        F.lit("\t "),
        F.col("text"),
        F.lit("  end"),
        F.lit("\r\n"),
    )


def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse whitespace runs to single spaces and trim; returns the
    normalized length + sha256 (narrow output, full-content verification,
    same shape as pii_scrub)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    norm = F.trim(F.regexp_replace(_norm_aug_spark(), NORM_WS_RE, " "))
    return d.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_chars_norm"),
        F.sha2(norm, 256).alias("norm_sha"),
    )


def normalize_text_sql() -> str:
    aug = "chr(9) || ' ' || text || '  end' || chr(13) || chr(10)"
    return f"""
SELECT doc_id,
       len(trim(regexp_replace({aug}, '{NORM_WS_RE}', ' ', 'g')))::BIGINT
           AS n_chars_norm,
       sha256(trim(regexp_replace({aug}, '{NORM_WS_RE}', ' ', 'g')))
           AS norm_sha
FROM documents
"""


# ------------------------------------------------------ source-mix rebalance
# Domain/source reweighting: the curation step that turns "whatever the
# crawler got" into a target data mixture. Here the target is uniform per
# source; each over-represented source gets a keep-weight
# w = min(1, target/actual) and a DETERMINISTIC hash-threshold downsample
# (same re-runnable property as corpus_sample_stratified — a retried stage
# keeps the same rows). "Actual" is measured in CHARACTER MASS, not doc
# count — a token-budget view of the mixture (and, on the uniform-doc-count
# fixture, the property that keeps the downsample branch non-vacuous:
# per-source char totals differ, so over-weight sources get thresh < 1).
# Weights are computed in integer arithmetic
# (thresh = (total_mass·MOD) div (n_sources·mass)) so Spark and DuckDB
# agree bit-for-bit with no float division in the decision path. Shape at
# 100 TB: one combinable groupBy for the masses (rows = n_sources, tiny),
# a broadcast join of the thresholds, one more combinable groupBy — no
# wide shuffle ever carries the corpus.
_MIX_MOD = 1_000_000
_MIX_SEED = 91


def source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc counts, uniform-target keep-weight, and the kept-row
    count after deterministic hash-threshold downsampling."""
    from spider_core_spark.textops.dedup import _h64_spark

    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    # pass 1: per-source masses — n_sources rows, collected to the driver
    # (rank.py's offsets pattern) so the threshold table is a literal and
    # the corpus is scanned exactly twice (the minimum: global totals must
    # exist before the filter pass; caching the corpus instead would be
    # worse at scale)
    rows = (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("mass"),
        )
        .collect()
    )
    total = sum(r["mass"] for r in rows)
    nsrc = len(rows)
    tdf = spark.createDataFrame(
        [
            (
                r["source"],
                int(r["n_docs"]),
                int(r["mass"]),
                min(_MIX_MOD, (total * _MIX_MOD) // (nsrc * r["mass"])),
            )
            for r in rows
        ],
        "source string, n_docs long, mass long, thresh long",
    )
    # pass 2: deterministic downsample against the broadcast thresholds
    bucket = F.pmod(
        F.expr(_h64_spark("cast(doc_id as string)", _MIX_SEED)),
        F.lit(_MIX_MOD),
    )
    kept = (
        d.join(F.broadcast(tdf.select("source", "thresh")), "source")
        .filter(bucket < F.col("thresh"))
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        tdf.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "mass",
            F.round(F.col("thresh") / _MIX_MOD, 6).alias("weight"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def source_mix_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb("cast(doc_id as varchar)", seed=_MIX_SEED)
    return f"""
WITH c AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS mass
  FROM documents GROUP BY source
), t AS (
  SELECT source, n_docs, mass,
         least({_MIX_MOD},
               (SUM(mass) OVER () * {_MIX_MOD})
                 // ((COUNT(*) OVER ()) * mass))::BIGINT AS thresh
  FROM c
), k AS (
  SELECT d.source, count(*)::BIGINT AS n_kept
  FROM documents d JOIN t USING (source)
  WHERE {h} % {_MIX_MOD} < t.thresh
  GROUP BY d.source
)
SELECT t.source, t.n_docs, t.mass,
       round(t.thresh / {_MIX_MOD}.0, 6) AS weight,
       COALESCE(k.n_kept, 0)::BIGINT AS n_kept
FROM t LEFT JOIN k USING (source)
"""


# ------------------------------------------------- unigram LM quality score
# CCNet-style LM quality gate, with the corpus's own unigram distribution
# standing in for the external KenLM model (no model artifacts in this
# sandbox, and the plumbing is identical): per-language token counts →
# top-K vocabulary → add-one-smoothed log-probability, doc score = mean
# token logprob. Low (very negative) scores = token distributions unlike
# the corpus — the junk the ppl filter drops. K is the broadcastability
# knob: at any corpus size the scorer ships top-K rows per language
# (50k-ish in production), so the exploded token stream is never shuffled
# for the lookup — only the two combinable groupBys shuffle (Zipf-skewed
# token key is defused by map-side partial aggregation; doc_id is
# near-unique). Registered K=20 < the fixture's 31-token closed vocab so
# the OOV smoothing floor is exercised non-vacuously.
UNIGRAM_TOPK = 20


def unigram_logprob(
    spark: SparkSession, sf_dir: str, k: int = UNIGRAM_TOPK
) -> DataFrame:
    """Per-doc mean unigram log-probability under the per-language
    corpus distribution (add-one smoothing, top-k vocab, OOV floor)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    counts = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    vocab = (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("lang", "tok", "c")
    )
    stats = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_tok"),
        F.least(F.count("*"), F.lit(k)).cast("long").alias("v"),
    )
    return (
        toks.join(F.broadcast(vocab), ["lang", "tok"], "left")
        .join(F.broadcast(stats), "lang")
        .withColumn(
            "lp",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1)
                / (F.col("n_tok") + F.col("v") + 1)
            ),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_toks"),
            F.round(F.avg("lp"), 6).alias("logprob"),
        )
    )


def unigram_logprob_sql(k: int = UNIGRAM_TOPK) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
), counts AS (
  SELECT lang, tok, count(*)::BIGINT AS c FROM toks GROUP BY lang, tok
), vocab AS (
  SELECT lang, tok, c FROM (
    SELECT lang, tok, c,
           row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok ASC) AS r
    FROM counts
  ) WHERE r <= {k}
), stats AS (
  SELECT lang, sum(c)::BIGINT AS n_tok, least(count(*), {k})::BIGINT AS v
  FROM counts GROUP BY lang
)
SELECT t.doc_id, t.lang, count(*)::BIGINT AS n_toks,
       round(avg(ln((COALESCE(vo.c, 0) + 1) / (s.n_tok + s.v + 1))), 6)
           AS logprob
FROM toks t
LEFT JOIN vocab vo USING (lang, tok)
JOIN stats s USING (lang)
GROUP BY t.doc_id, t.lang
"""


# ----------------------------------------------------------- corpus stats
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus report (the mixing table a data-curation run
    reads before choosing SAMPLE_RATES): doc count, total/average chars,
    total whitespace tokens. One map-side-combinable groupBy over a
    3-column pruned scan."""
    d = _docs(spark, sf_dir)
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias(
            "total_ws_tokens"
        ),
    )


CORPUS_STATS_SQL = """
SELECT lang,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       round(avg(n_chars), 2) AS avg_chars,
       sum(len(string_split(text, ' ')))::BIGINT AS total_ws_tokens
FROM documents GROUP BY lang
"""


# ---------------------------------------------- Gopher-style hard filters
# Hard per-document quality gates in the style of the published Gopher
# rules (Rae et al. 2021, "Scaling Language Models: ... Gopher",
# Table A1 — public): word-count bounds, mean-word-length bounds, a
# minimum number of distinct stopwords, and a minimum fraction of
# alphabetic words. Unlike quality_score (a soft composite) these are
# boolean gates a curation pipeline ANDs together; the reference crawler
# has no quality layer at all (items are raw extracted text,
# src/pipeline.rs), so this is engine-added curation surface.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO = 3.0
GOPHER_MWL_HI = 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_ALPHA_FRAC = 0.8


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher hard gates + the final AND. All per-row JVM
    expressions over one pruned scan — narrow, zero shuffles, pipelines
    inside the scan at 100 TB. Rule thresholds are the published ones;
    at this fixture the word-count and stopword gates both actually
    discriminate (~57%/~62% pass), so keep is non-vacuous."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    mwl = (F.length("text") - (n - 1)) / n
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(
        F.array_intersect(F.array_distinct(F.split(F.lower(F.col("text")), " ")), stop_arr)
    )
    alpha = F.size(F.expr("filter(split(text, ' '), t -> t rlike '[a-zA-Z]')")) / n
    wc_ok = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    mwl_ok = (mwl >= GOPHER_MWL_LO) & (mwl <= GOPHER_MWL_HI)
    stop_ok = n_stop >= GOPHER_MIN_STOPWORDS
    alpha_ok = alpha >= GOPHER_MIN_ALPHA_FRAC
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(mwl, 4).alias("mean_word_len"),
        n_stop.cast("long").alias("n_stopwords"),
        F.round(alpha, 4).alias("alpha_frac"),
        wc_ok.alias("wc_ok"),
        mwl_ok.alias("mwl_ok"),
        stop_ok.alias("stop_ok"),
        alpha_ok.alias("alpha_ok"),
        (wc_ok & mwl_ok & stop_ok & alpha_ok).alias("keep"),
    )


def gopher_rules_sql() -> str:
    stops = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH t AS (
  SELECT doc_id, text,
         len(string_split(text, ' ')) AS n,
         len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                            [{stops}])) AS n_stop,
         len(list_filter(string_split(text, ' '),
                         t -> regexp_matches(t, '[a-zA-Z]'))) AS n_alpha
  FROM documents
), m AS (
  SELECT doc_id, n, n_stop,
         (length(text) - (n - 1))::DOUBLE / n AS mwl,
         n_alpha::DOUBLE / n AS alpha
  FROM t
)
SELECT doc_id,
       n::BIGINT AS n_words,
       round(mwl, 4) AS mean_word_len,
       n_stop::BIGINT AS n_stopwords,
       round(alpha, 4) AS alpha_frac,
       (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}) AS wc_ok,
       (mwl >= {GOPHER_MWL_LO} AND mwl <= {GOPHER_MWL_HI}) AS mwl_ok,
       (n_stop >= {GOPHER_MIN_STOPWORDS}) AS stop_ok,
       (alpha >= {GOPHER_MIN_ALPHA_FRAC}) AS alpha_ok,
       (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
        AND mwl >= {GOPHER_MWL_LO} AND mwl <= {GOPHER_MWL_HI}
        AND n_stop >= {GOPHER_MIN_STOPWORDS}
        AND alpha >= {GOPHER_MIN_ALPHA_FRAC}) AS keep
FROM m
"""


# --------------------------------------------- duplicated-span detection
# Exact-substring dedup at SPAN granularity, after Lee et al. 2022
# ("Deduplicating Training Data Makes Language Models Better") — the
# Spark analog of the suffix-array duplicated-substring pass. A trigram
# POSITION is duplicated iff its 3-gram occurs in >= 2 DISTINCT docs;
# the operator reports, per doc, the longest CONSECUTIVE run of
# duplicated positions (max_dup_run — the span a span-cutting dedup
# pass would excise) plus the duplicated-position count. Distinct from
# boilerplate_fraction (a corpus-frequency SHARE at >= 5 docs) and from
# repetition_scores (WITHIN-doc repetition): this is position-aware and
# yields the actual cut-list signal.
DUPSPAN_SEED = 91
DUPSPAN_MIN_DOCS = 2


def dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span stats: n_ngrams, dup_ngrams, max_dup_run.

    Scale (100 TB): shingles are hashed to 60-bit ints BEFORE any
    shuffle (slim keys; the oracle applies the identical hash, so a
    collision — expected N^2/2^61 — is mirrored, never a parity break).
    The sha-explode is STAGED once (persist via the dedup cache registry
    — release with textops.dedup.release_staged_caches()): it feeds both
    the per-hash doc-frequency agg and the join back, and recomputing
    two digests per shingle x2 is the dominant cost. Run detection is a
    SINGLE linear chain — conditional cumulative sum over one per-doc
    window (grp = pos - running dup count), then gaps-and-islands via
    groupBy(doc, grp) where all non-dup positions of a doc share the
    NULL group — no self-join of the marked frame. Integer-only logic,
    so cross-engine bit-stability is free."""
    from spider_core_spark.textops.dedup import (
        _docs_tokens,
        _h64_spark,
        _shingles_spark,
        _stage,
    )

    d = _docs_tokens(spark, sf_dir)
    occ = _stage(
        d.select(
            "doc_id",
            F.posexplode(F.expr(_shingles_spark("_toks"))).alias("pos", "sh"),
        ).select(
            "doc_id", "pos", F.expr(_h64_spark("sh", DUPSPAN_SEED)).alias("shash")
        )
    )
    nd = (
        occ.select("doc_id", "shash")
        .distinct()
        .groupBy("shash")
        .agg(F.count("*").alias("nd"))
    )
    marked = occ.join(nd, "shash").select(
        "doc_id", "pos", (F.col("nd") >= DUPSPAN_MIN_DOCS).alias("isdup")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = marked.withColumn(
        "grp",
        F.when(
            F.col("isdup"),
            F.col("pos") - F.sum(F.col("isdup").cast("int")).over(w),
        ),
    )
    runs = grouped.groupBy("doc_id", "grp").agg(F.count("*").alias("cnt"))
    return (
        runs.groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_ngrams"),
            F.sum(F.when(F.col("grp").isNotNull(), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("dup_ngrams"),
            F.max(
                F.when(F.col("grp").isNotNull(), F.col("cnt")).otherwise(0)
            )
            .cast("long")
            .alias("max_dup_run"),
        )
    )


def dup_spans_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb
    from spider_core_spark.textops.dedup import _shingles_duck

    h = h64_duckdb("sh", seed=DUPSPAN_SEED)
    return f"""
WITH occ AS MATERIALIZED (
  SELECT doc_id, pos, {h} AS shash
  FROM (SELECT doc_id,
               generate_subscripts({_shingles_duck()}, 1) - 1 AS pos,
               unnest({_shingles_duck()}) AS sh
        FROM documents)
), nd AS (
  SELECT shash, count(*) AS nd
  FROM (SELECT DISTINCT doc_id, shash FROM occ) GROUP BY 1
), marked AS (
  SELECT occ.doc_id, occ.pos, (nd.nd >= {DUPSPAN_MIN_DOCS}) AS isdup
  FROM occ JOIN nd USING (shash)
), grouped AS (
  SELECT doc_id,
         CASE WHEN isdup THEN pos - sum(CASE WHEN isdup THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING)
         END AS grp
  FROM marked
), runs AS (
  SELECT doc_id, grp, count(*) AS cnt FROM grouped GROUP BY 1, 2
)
SELECT doc_id,
       sum(cnt)::BIGINT AS n_ngrams,
       sum(CASE WHEN grp IS NOT NULL THEN cnt ELSE 0 END)::BIGINT
         AS dup_ngrams,
       max(CASE WHEN grp IS NOT NULL THEN cnt ELSE 0 END)::BIGINT
         AS max_dup_run
FROM runs GROUP BY 1
"""


# --------------------------------------------- duplicated-span SCRUB
# The removal half of Lee et al. 2022: dup_spans above only REPORTS the
# duplicated runs; this operator actually rewrites the corpus. Contract:
# a shingle occurrence is removable iff its 3-gram hash occurs >= 2
# times corpus-wide (within- OR cross-doc) AND the occurrence is not the
# globally FIRST one (first = min (doc_id, pos) — the kept original, so
# exactly one copy of every duplicated substring survives, like the
# suffix-array pass keeps one occurrence). A token is dropped iff any
# removable shingle covers its position; the cleaned text is the kept
# tokens re-joined in order. All logic is integer/string — bit-stable.
DUPSCRUB_MIN_OCCS = 2


def dupspan_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rewrite removing non-first duplicated spans.

    Plan shape (100 TB): the shingle explode is hashed to 60-bit ints
    pre-shuffle and STAGED once (dedup cache registry); the first-vs-rest
    split is one window over shash (high-cardinality key — skew tracks
    true duplicate mass, same argument as the banded ngram join); cover
    positions explode at most SHINGLE rows per removable occurrence; the
    rewrite is an anti-join on (doc_id, tpos) plus one per-doc groupBy
    whose collect_list is doc-sized (the same bound every per-doc
    operator here lives with). No driver-side loops, no UDFs."""
    from pyspark.sql import Window

    from spider_core_spark.textops.dedup import (
        SHINGLE,
        _docs_tokens,
        _h64_spark,
        _shingles_spark,
        _stage,
    )

    d = _stage(
        _docs_tokens(spark, sf_dir).withColumn("n_tokens", F.size("_toks"))
    )
    occ = d.select(
        "doc_id",
        "n_tokens",
        F.posexplode(F.expr(_shingles_spark("_toks"))).alias("pos", "sh"),
    ).select(
        "doc_id",
        "n_tokens",
        "pos",
        F.expr(_h64_spark("sh", DUPSPAN_SEED)).alias("shash"),
    )
    wrank = Window.partitionBy("shash").orderBy("doc_id", "pos")
    removable = (
        occ.withColumn("rn", F.row_number().over(wrank))
        .withColumn("tot", F.count("*").over(Window.partitionBy("shash")))
        .filter((F.col("tot") >= DUPSCRUB_MIN_OCCS) & (F.col("rn") > 1))
    )
    removed = removable.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.col("pos"),
                F.least(F.col("pos") + (SHINGLE - 1), F.col("n_tokens") - 1),
            )
        ).alias("tpos"),
    ).distinct()
    toks = d.select(
        "doc_id", "n_tokens", F.posexplode("_toks").alias("tpos", "tok")
    )
    kept = (
        toks.join(removed, ["doc_id", "tpos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
    )
    return (
        d.select("doc_id", "n_tokens")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def dupspan_scrub_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb
    from spider_core_spark.textops.dedup import SHINGLE, TOKENS_DUCK, _shingles_duck

    h = h64_duckdb("sh", seed=DUPSPAN_SEED)
    return f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, {TOKENS_DUCK} AS toks, len({TOKENS_DUCK}) AS n_tokens,
         {_shingles_duck()} AS shs
  FROM documents
), occ AS MATERIALIZED (
  SELECT doc_id, n_tokens, pos, {h} AS shash
  FROM (SELECT doc_id, n_tokens,
               generate_subscripts(shs, 1) - 1 AS pos, unnest(shs) AS sh
        FROM d)
), removable AS (
  SELECT doc_id, n_tokens, pos FROM (
    SELECT doc_id, n_tokens, pos,
           row_number() OVER (PARTITION BY shash ORDER BY doc_id, pos) AS rn,
           count(*) OVER (PARTITION BY shash) AS tot
    FROM occ
  ) WHERE tot >= {DUPSCRUB_MIN_OCCS} AND rn > 1
), removed AS (
  SELECT DISTINCT doc_id, tpos FROM (
    SELECT doc_id, unnest(range(pos, least(pos + {SHINGLE - 1},
                                           n_tokens - 1) + 1)) AS tpos
    FROM removable)
), toks AS (
  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS tpos, unnest(toks) AS tok
  FROM d
), kept AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
         count(*) AS n_kept
  FROM toks ANTI JOIN removed USING (doc_id, tpos)
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(kept.clean_text, '') AS clean_text,
       d.n_tokens::BIGINT AS n_tokens,
       (d.n_tokens - coalesce(kept.n_kept, 0))::BIGINT AS n_removed
FROM d LEFT JOIN kept USING (doc_id)
"""


# ------------------------------------------------- per-doc top keywords
# tf-idf-family keyword extraction with the idf log DROPPED: lift =
# tf-rate / corpus-df-rate = c*N / (n_tok*df). Log-free on purpose —
# every score is then ONE correctly-rounded IEEE division of exact
# int64 products, bit-stable across Spark and DuckDB (libm ln differs
# in the last ulp between engines, which a value-hash gate cannot
# tolerate). Ordering ties broken by token, so top-k is deterministic.
KEYWORDS_TOPK = 3


def keywords_topk(spark: SparkSession, sf_dir: str, k: int = KEYWORDS_TOPK) -> DataFrame:
    """Per-doc top-k salient keywords by relative-frequency lift.

    Plan: one explode + a map-side-combinable doc-term count, STAGED
    once (persist via the dedup cache registry — it feeds both the
    document-frequency agg and the scoring join; release with
    textops.dedup.release_staged_caches()). Per-doc token totals ride a
    window-sum over the SAME doc_id partitioning the rank window needs
    (no extra join); document frequency is a token-keyed combinable agg
    joined back (AQE broadcasts it when the vocab is small). The window
    input is |distinct terms per doc| rows, never raw tokens."""
    from spider_core_spark.textops.dedup import _stage

    d = _docs(spark, sf_dir)
    n_docs = d.count()  # driver scalar: one pruned count job
    occ = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    tf = _stage(occ.groupBy("doc_id", "token").agg(F.count("*").alias("c")))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    w_doc = Window.partitionBy("doc_id")
    lift = (F.col("c") * F.lit(n_docs)) / (F.col("n_tok") * F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("_lift").desc(), F.col("token").asc()
    )
    return (
        tf.withColumn("n_tok", F.sum("c").over(w_doc))
        .join(dfreq, "token")
        .withColumn("_lift", lift)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "token",
            F.round("_lift", 4).alias("lift"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def keywords_topk_sql(k: int = KEYWORDS_TOPK) -> str:
    return f"""
WITH occ AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS c FROM occ GROUP BY 1, 2
), nt AS (
  SELECT doc_id, sum(c) AS n_tok FROM tf GROUP BY 1
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token,
         (tf.c * n.n_docs)::DOUBLE / (nt.n_tok * dfreq.df) AS _lift
  FROM tf
  CROSS JOIN n
  JOIN nt USING (doc_id)
  JOIN dfreq USING (token)
)
SELECT doc_id, token, round(_lift, 4) AS lift, rank::BIGINT AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY _lift DESC, token) AS rank
      FROM scored)
WHERE rank <= {k}
"""


# ------------------------------------- hashed linear quality classifier
# The model-scoring stage of a modern curation pipeline (DCLM /
# FineWeb-Edu style): a linear classifier over hashing-trick token
# features scores every document, and the pipeline keeps docs above a
# margin. In production the per-bucket weights come from a trained
# fastText/logistic model shipped as a broadcast array; here the weights
# are a deterministic hash-derived stand-in (w(b) = h64('w:'||b) mod
# 2001 - 1000, an integer in [-1000, 1000]) with IDENTICAL plumbing —
# the point is the Spark shape, which is exactly what a real model uses:
# bucket = h64(token) % D and the weight lookup are per-row JVM
# expressions FUSED INTO THE SCAN (with a real model, a broadcast
# array-indexing expression — never a join, never a Python UDF), so the
# only shuffle is the map-side-combinable per-doc sum. Integer weights
# make the score an exact int64 sum — bit-stable across engines with no
# FP summation-order hazard, the same trick source_mix uses.
CLASSIFIER_BUCKETS = 1024
CLASSIFIER_HASH_SEED = 31
CLASSIFIER_WEIGHT_SEED = 37
CLASSIFIER_MARGIN = 0  # keep iff score_sum >= margin * n_toks


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc linear classifier score over hashed token features.

    Columns: doc_id, n_toks, score_sum (exact int64 dot product),
    score_mean_x1000 (integer-scaled mean, `div` so no FP), keep.

    Scale (100 TB): one explode + one combinable groupBy(doc_id); the
    (doc_id, token)->bucket->weight path never leaves whole-stage
    codegen and doc_id is a near-unique shuffle key, so skew tracks
    document length only. No joins, no staged caches, no driver state.
    """
    from spider_core_spark.textops.dedup import _h64_spark

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    bucket = f"({_h64_spark('tok', CLASSIFIER_HASH_SEED)} % {CLASSIFIER_BUCKETS})"
    weight = (
        f"({_h64_spark(f'cast({bucket} as string)', CLASSIFIER_WEIGHT_SEED)}"
        f" % 2001 - 1000)"
    )
    scored = toks.select("doc_id", F.expr(weight).cast("long").alias("w"))
    agg = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_toks"),
        F.sum("w").cast("long").alias("score_sum"),
    )
    return agg.select(
        "doc_id",
        "n_toks",
        "score_sum",
        F.expr("(score_sum * 1000) div n_toks").cast("long").alias(
            "score_mean_x1000"
        ),
        (F.col("score_sum") >= CLASSIFIER_MARGIN * F.col("n_toks")).alias(
            "keep"
        ),
    )


def quality_classifier_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    bucket = f"({h64_duckdb('tok', seed=CLASSIFIER_HASH_SEED)} % {CLASSIFIER_BUCKETS})"
    weight = (
        f"({h64_duckdb(f'cast({bucket} as varchar)', seed=CLASSIFIER_WEIGHT_SEED)}"
        f" % 2001 - 1000)"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), scored AS (
  SELECT doc_id, {weight}::BIGINT AS w FROM toks
), agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_toks, sum(w)::BIGINT AS score_sum
  FROM scored GROUP BY 1
)
SELECT doc_id, n_toks, score_sum,
       ((score_sum * 1000) // n_toks)::BIGINT AS score_mean_x1000,
       (score_sum >= {CLASSIFIER_MARGIN} * n_toks) AS keep
FROM agg
"""


# ------------------------------------------- count-min sketch heavy hitters
# Sketch-based frequency estimation (Cormode & Muthukrishnan 2005 — the
# count-min sketch): a DEPTH x WIDTH grid of counters where token t
# increments cell (d, h_d(t) % WIDTH) per occurrence; est(t) = min_d of
# its cells, always >= the true count. THE fixed-memory answer to
# "which URLs/tokens are hot" on a 100-TB stream where the exact vocab
# doesn't fit anywhere: the sketch agg has DEPTH*WIDTH distinct keys, so
# map-side partial aggregation collapses every partition's contribution
# to <= 1024 rows before the shuffle (vs a full-vocab-cardinality
# shuffle for the exact count), and the finished 1024-row sketch
# BROADCASTS to wherever estimates are needed. Integer counters end to
# end — bit-stable with zero effort.
#
# The registered query reports the exact top-K tokens with their true
# and estimated counts side by side, so the oracle certifies BOTH the
# sketch contents and the one-sided error (est >= true; the
# over-estimate is the collision mass the 4x256 grid absorbs at this
# vocab size).
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_SEEDS = [101, 103, 107, 109]
CMS_TOPK = 10


def cms_heavyhitters(spark: SparkSession, sf_dir: str, k: int = CMS_TOPK) -> DataFrame:
    """Exact top-k tokens with count-min-sketch estimates.

    Plan: one explode feeds (a) the exact vocab count (combinable, the
    comparison target) and (b) the sketch agg — DEPTH rows per token via
    one inline array explode, groupBy (d, bucket) with <= DEPTH*WIDTH
    groups. Estimates join the k candidate rows against the broadcast
    sketch per depth and take the min. At scale only (b) and the
    candidate join survive; (a) exists to certify the sketch here."""
    from spider_core_spark.textops.dedup import _h64_spark

    d = _docs(spark, sf_dir)
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        (
                            F.expr(_h64_spark("tok", CMS_SEEDS[i]))
                            % CMS_WIDTH
                        ).cast("int").alias("b"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("cell")
    ).select("cell.d", "cell.b")
    sketch = cells.groupBy("d", "b").agg(F.count("*").cast("long").alias("c"))

    counts = toks.groupBy("tok").agg(F.count("*").cast("long").alias("true_c"))
    w = Window.orderBy(F.desc("true_c"), F.asc("tok"))
    top = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )  # window input is the aggregated vocab (vocab_topk pattern)
    probes = top.select(
        "tok",
        "true_c",
        "rank",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        (
                            F.expr(_h64_spark("tok", CMS_SEEDS[i]))
                            % CMS_WIDTH
                        ).cast("int").alias("b"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("tok", "true_c", "rank", "cell.d", "cell.b")
    return (
        probes.join(F.broadcast(sketch), ["d", "b"])
        .groupBy("tok", "true_c", "rank")
        .agg(F.min("c").cast("long").alias("est_c"))
        .select(
            "tok",
            "true_c",
            "est_c",
            (F.col("est_c") - F.col("true_c")).cast("long").alias("overcount"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def cms_heavyhitters_sql(k: int = CMS_TOPK) -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    cell_rows = " UNION ALL ".join(
        f"SELECT tok, {i} AS d, ({h64_duckdb('tok', seed=CMS_SEEDS[i])} % {CMS_WIDTH})::INT AS b FROM toks"
        for i in range(CMS_DEPTH)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), cells AS (
  {cell_rows}
), sketch AS (
  SELECT d, b, count(*)::BIGINT AS c FROM cells GROUP BY 1, 2
), counts AS (
  SELECT tok, count(*)::BIGINT AS true_c FROM toks GROUP BY 1
), top AS (
  SELECT tok, true_c, rank FROM (
    SELECT tok, true_c,
           row_number() OVER (ORDER BY true_c DESC, tok ASC) AS rank
    FROM counts
  ) WHERE rank <= {k}
), probes AS (
  SELECT t.tok, t.true_c, t.rank, c.d, c.b
  FROM top t JOIN (SELECT DISTINCT tok, d, b FROM cells) c USING (tok)
)
SELECT p.tok, p.true_c, min(s.c)::BIGINT AS est_c,
       (min(s.c) - p.true_c)::BIGINT AS overcount,
       p.rank::BIGINT AS rank
FROM probes p JOIN sketch s USING (d, b)
GROUP BY p.tok, p.true_c, p.rank
"""


# ------------------------------------------ deterministic train/val/test split
# The last stage of corpus prep: assign every kept document to
# train/val/test by hash threshold — no RNG, so a re-run of a failed
# 100-TB stage (or a later incremental snapshot) assigns the SAME split
# to the same doc_id, and the split is stratified implicitly (the hash
# is uniform within every stratum). Per-row JVM expression + one
# combinable groupBy for the report; zero joins.
SPLIT_SEED = 83
SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # test = remainder


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, split) doc and whitespace-token totals under the
    deterministic hash split."""
    from spider_core_spark.textops.dedup import _h64_spark

    d = _docs(spark, sf_dir)
    pct = F.expr(_h64_spark("cast(doc_id as string)", SPLIT_SEED)) % 100
    split = (
        F.when(pct < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(pct < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(
            "lang",
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
        )
    )


def split_assign_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb("cast(doc_id as varchar)", seed=SPLIT_SEED)
    return f"""
WITH a AS (
  SELECT lang,
         CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
         len(string_split(text, ' '))::BIGINT AS n_tok
  FROM documents
)
SELECT lang, split, count(*)::BIGINT AS n_docs,
       sum(n_tok)::BIGINT AS total_tokens
FROM a GROUP BY 1, 2
"""


# -------------------------------- corpus-prep v2: every gate in one plan
# The round-4 end-to-end curation chain, with ALL the quality machinery
# composed into one declarative DAG:
#
#   exact-dup keepers ∩ near-dup-cluster keepers ∩ soft quality bar
#   (corpus_keepers_neardup)  ∩  Gopher hard gates (gopher_rules.keep)
#   ∩  model score (quality_classifier.keep)
#   →  source-mix downsample (same integer thresholds as source_mix)
#   →  deterministic train/val/test assignment (same hash as
#      split_assign)
#   →  per-(lang, split) packed-stream totals.
#
# This is the table a training launch reads: how many docs/tokens/
# sequences each (language, split) contributes after every filter. Each
# gate is its own operator with its own oracle above; the composition
# re-uses them unchanged, and the oracle SQL composes the SAME
# subqueries — so a mismatch pinpoints the stage that diverged.
#
# Scale: the gates are doc_id-keyed semi-joins (AQE broadcasts the
# small surviving sides as filters tighten); no stage rescans the
# corpus beyond what the composition requires.
def corpus_prep_v2(
    spark: SparkSession, sf_dir: str, chunk_tokens: int = 2048
) -> DataFrame:
    from spider_core_spark.textops.dedup import _h64_spark

    d = _docs(spark, sf_dir)
    clean = corpus_keepers_neardup(spark, sf_dir).select("doc_id")
    gop = gopher_rules(spark, sf_dir).filter("keep").select("doc_id")
    clf = quality_classifier(spark, sf_dir).filter("keep").select("doc_id")
    docs = (
        d.join(clean, "doc_id")
        .join(gop, "doc_id")
        .join(clf, "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
    )
    rows = (
        d.groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("mass"))
        .collect()
    )
    total = sum(r["mass"] for r in rows)
    nsrc = len(rows)
    tdf = spark.createDataFrame(
        [
            (r["source"], min(_MIX_MOD, (total * _MIX_MOD) // (nsrc * r["mass"])))
            for r in rows
        ],
        "source string, thresh long",
    )
    bucket = F.pmod(
        F.expr(_h64_spark("cast(doc_id as string)", _MIX_SEED)),
        F.lit(_MIX_MOD),
    )
    pct = F.expr(_h64_spark("cast(doc_id as string)", SPLIT_SEED)) % 100
    split = (
        F.when(pct < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(pct < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    kept = docs.join(F.broadcast(tdf), "source").filter(bucket < F.col("thresh"))
    return kept.withColumn("split", split).groupBy("lang", "split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.expr(
            f"(sum(n_tokens) + {chunk_tokens - 1}) div {chunk_tokens}"
        ).cast("long").alias("n_chunks"),
    )


def corpus_prep_v2_sql(chunk_tokens: int = 2048) -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb("cast(doc_id as varchar)", seed=_MIX_SEED)
    hs = h64_duckdb("cast(doc_id as varchar)", seed=SPLIT_SEED)
    return f"""
WITH clean AS (
  SELECT doc_id FROM ({corpus_keepers_neardup_sql()}) ck
), gop AS (
  SELECT doc_id FROM ({gopher_rules_sql()}) g WHERE g.keep
), clf AS (
  SELECT doc_id FROM ({quality_classifier_sql()}) c WHERE c.keep
), mix AS (
  SELECT source,
         least({_MIX_MOD},
               (SUM(sum_mass) OVER () * {_MIX_MOD})
                 // ((COUNT(*) OVER ()) * sum_mass))::BIGINT AS thresh
  FROM (SELECT source, sum(n_chars)::BIGINT AS sum_mass
        FROM documents GROUP BY source)
), kept AS (
  SELECT d.doc_id, d.lang,
         CASE WHEN {hs} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN {hs} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
         len(string_split(d.text, ' '))::BIGINT AS n_tokens
  FROM documents d
  JOIN clean USING (doc_id)
  JOIN gop USING (doc_id)
  JOIN clf USING (doc_id)
  JOIN mix ON mix.source = d.source
  WHERE {h} % {_MIX_MOD} < mix.thresh
)
SELECT lang, split, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       ((sum(n_tokens) + {chunk_tokens - 1}) // {chunk_tokens})::BIGINT
           AS n_chunks
FROM kept GROUP BY 1, 2
"""


# ------------------------------------------------ bigram LM quality score
# The sequence-aware tier of the CCNet-style LM gate: add-one-smoothed
# CONDITIONAL log-probability ln((c(prev,cur)+1) / (c(prev)+V+1)) under
# the corpus's own per-language bigram distribution, with out-of-vocab
# tokens mapped to '<unk>' BEFORE counting (so the model and the scorer
# see the same event space). Catches word-salad documents whose unigram
# mix looks fine but whose transitions are noise — the unigram gate's
# known blind spot.
#
# Scale: bigrams come from ONE lag window per doc (partition key doc_id,
# the narrowest possible), counts are two combinable groupBys; the
# scoring joins are equi-joins on (lang, prev[, cur]) — at a production
# 50k vocab the bigram table is observed-bigrams-sized (<< V^2) and AQE
# picks broadcast vs shuffle per stats. ln() is double libm either way;
# both engines round to 6 decimals before the hash (the unigram
# operator's convention).
BIGRAM_VOCAB_K = 20


def bigram_logprob(
    spark: SparkSession, sf_dir: str, k: int = BIGRAM_VOCAB_K
) -> DataFrame:
    """Per-doc mean bigram conditional log-probability (positions 2..n)."""
    d = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    toks = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    )
    ucounts = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    wv = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    vocab = (
        ucounts.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") <= k)
        .select("lang", "tok")
    )
    mapped = (
        toks.join(
            F.broadcast(vocab.withColumn("_inv", F.lit(1))), ["lang", "tok"], "left"
        )
        .select(
            "doc_id",
            "lang",
            "pos",
            F.when(F.col("_inv").isNotNull(), F.col("tok"))
            .otherwise(F.lit("<unk>"))
            .alias("tok"),
        )
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    bi = mapped.withColumn("prev", F.lag("tok").over(wl)).filter(
        F.col("prev").isNotNull()
    )
    bcounts = bi.groupBy("lang", "prev", "tok").agg(
        F.count("*").cast("long").alias("cb")
    )
    # context counts: occurrences AS A CONTEXT (i.e., with a successor) —
    # per doc that is every mapped position except the last
    ccounts = bi.groupBy("lang", "prev").agg(
        F.count("*").cast("long").alias("cc")
    )
    vsize = mapped.groupBy("lang").agg(
        (F.count_distinct("tok")).cast("long").alias("v")
    )
    return (
        bi.join(bcounts, ["lang", "prev", "tok"])
        .join(ccounts, ["lang", "prev"])
        .join(F.broadcast(vsize), "lang")
        .withColumn(
            "lp", F.log((F.col("cb") + 1) / (F.col("cc") + F.col("v") + 1))
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("logprob"),
        )
    )


def bigram_logprob_sql(k: int = BIGRAM_VOCAB_K) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
), ucounts AS (
  SELECT lang, tok, count(*) AS c FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT lang, tok FROM (
    SELECT lang, tok,
           row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok ASC) AS r
    FROM ucounts
  ) WHERE r <= {k}
), mapped AS (
  SELECT t.doc_id, t.lang, t.pos,
         CASE WHEN v.tok IS NOT NULL THEN t.tok ELSE '<unk>' END AS tok
  FROM toks t LEFT JOIN vocab v ON v.lang = t.lang AND v.tok = t.tok
), bi AS (
  SELECT doc_id, lang, tok,
         lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM mapped
  QUALIFY prev IS NOT NULL
), bcounts AS (
  SELECT lang, prev, tok, count(*)::BIGINT AS cb FROM bi GROUP BY 1, 2, 3
), ccounts AS (
  SELECT lang, prev, count(*)::BIGINT AS cc FROM bi GROUP BY 1, 2
), vsize AS (
  SELECT lang, count(DISTINCT tok)::BIGINT AS v FROM mapped GROUP BY 1
)
SELECT b.doc_id, b.lang, count(*)::BIGINT AS n_bigrams,
       round(avg(ln((bc.cb + 1) / (cc.cc + vs.v + 1))), 6) AS logprob
FROM bi b
JOIN bcounts bc ON bc.lang = b.lang AND bc.prev = b.prev AND bc.tok = b.tok
JOIN ccounts cc ON cc.lang = b.lang AND cc.prev = b.prev
JOIN vsize vs ON vs.lang = b.lang
GROUP BY b.doc_id, b.lang
"""


# ------------------------------------------- DSIR importance resampling
# Data Selection with Importance Resampling (Xie et al. 2023, public):
# select pretraining docs whose hashed-n-gram feature distribution looks
# like a TARGET domain, by Gumbel-top-k sampling with importance weights
# w(x) = p_target(x)/p_raw(x) under a bag-of-hashed-features model. Here
# the target distribution is estimated from the corpus's own 'en' slice
# (a deterministic stand-in for an external target corpus — a real run
# would point the target CTE at its own table).
#
# Determinism contract (the corpus_sample_stratified property — a rerun
# of a failed 100 TB stage must select the SAME docs):
# - feature = h64(token, seed 131) % 512; counts are exact integers;
# - per-feature log-ratio score is ONE float op on integer-derived
#   doubles, rounded to integer millinats (score table: 512 rows);
# - per-doc log-weight = integer SUM of token scores (no FP summation-
#   order hazard — the f6 all-integer pattern);
# - Gumbel noise is hash-derived, not RNG: u = (h64(doc_id, 97) % 1e6
#   + 0.5)/1e6, g = -ln(-ln(u)), rounded to millinats;
# - selection = top-K by (logw + gumbel) with doc_id tiebreak.
#
# Scale (100 TB): TWO corpus scans total (the source_mix protocol).
# Scan 1: token explode + ONE conditional groupBy(feature) computes raw
# AND target counts together (map-side combinable, 512 keys on the
# wire); the 512-row result is collected and the log-ratio score table
# is built on the driver (math.log == DuckDB ln == same libm,
# half-away-from-zero rounding) and re-enters scan 2 as a broadcast
# literal. Scan 2: per-doc integer sum keyed on doc_id (no skew); top-K
# is a TakeOrdered, never a single-partition window.
DSIR_FEATS = 512
DSIR_FEAT_SEED = 131
DSIR_GUMBEL_SEED = 97
DSIR_K = 200


def _round_half_away(x: float) -> int:
    """Half-away-from-zero rounding — matches Spark round() and DuckDB
    round() on DOUBLE (Python's built-in round is banker's and would
    diverge on exact .5 boundaries)."""
    import math

    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def dsir_sample(spark: SparkSession, sf_dir: str, k: int = DSIR_K) -> DataFrame:
    import math

    from spider_core_spark.textops.dedup import _h64_spark

    feats = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        (
            F.expr(_h64_spark("tok", DSIR_FEAT_SEED)) % DSIR_FEATS
        ).cast("long").alias("f"),
    )
    # scan 1: raw + target counts in ONE conditional aggregation
    counts = (
        feats.groupBy("f")
        .agg(
            F.count("*").cast("long").alias("c_raw"),
            F.sum((F.col("lang") == "en").cast("long")).cast("long").alias(
                "c_tgt"
            ),
        )
        .collect()  # <= DSIR_FEATS rows — the source_mix driver protocol
    )
    r_tot = sum(r["c_raw"] for r in counts)
    t_tot = sum(r["c_tgt"] for r in counts)
    score = spark.createDataFrame(
        [
            (
                r["f"],
                _round_half_away(
                    1000.0
                    * math.log(
                        ((r["c_tgt"] + 1) / (t_tot + DSIR_FEATS))
                        / ((r["c_raw"] + 1) / (r_tot + DSIR_FEATS))
                    ),
                ),
            )
            for r in counts
        ],
        "f long, s_milli long",
    )
    # scan 2: per-doc integer weight sum against the broadcast score table
    logw = (
        feats.join(F.broadcast(score), "f")
        .groupBy("doc_id", "lang")
        .agg(F.sum("s_milli").cast("long").alias("logw_milli"))
    )
    u = (
        F.expr(_h64_spark("cast(doc_id as string)", DSIR_GUMBEL_SEED))
        % 1_000_000
    ).cast("double")
    gumbel = F.round(
        F.lit(-1000.0) * F.log(-F.log((u + 0.5) / 1_000_000.0)), 0
    ).cast("long")
    return (
        logw.withColumn(
            "key_milli", (F.col("logw_milli") + gumbel).cast("long")
        )
        .orderBy(F.desc("key_milli"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "lang", "logw_milli", "key_milli")
    )


def dsir_sample_sql(k: int = DSIR_K) -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    hf = h64_duckdb("tok", seed=DSIR_FEAT_SEED)
    hg = h64_duckdb("cast(doc_id as varchar)", seed=DSIR_GUMBEL_SEED)
    return f"""
WITH feats AS (
  SELECT doc_id, lang, ({hf}) % {DSIR_FEATS} AS f
  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        FROM documents)
), raw AS (
  SELECT f, count(*)::BIGINT AS c_raw FROM feats GROUP BY 1
), tgt AS (
  SELECT f, count(*)::BIGINT AS c_tgt FROM feats WHERE lang = 'en' GROUP BY 1
), tot AS (
  SELECT (SELECT sum(c_raw) FROM raw)::BIGINT AS r_tot,
         (SELECT sum(c_tgt) FROM tgt)::BIGINT AS t_tot
), score AS (
  SELECT r.f,
         round(1000.0 * ln(
           ((coalesce(t.c_tgt, 0) + 1) / (tot.t_tot + {DSIR_FEATS}))
           / ((r.c_raw + 1) / (tot.r_tot + {DSIR_FEATS}))
         ), 0)::BIGINT AS s_milli
  FROM raw r LEFT JOIN tgt t USING (f), tot
), logw AS (
  SELECT doc_id, lang, sum(s_milli)::BIGINT AS logw_milli
  FROM feats JOIN score USING (f)
  GROUP BY 1, 2
)
SELECT doc_id, lang, logw_milli,
       (logw_milli + round(-1000.0 * ln(-ln(
          ((({hg}) % 1000000) + 0.5) / 1000000.0)), 0)::BIGINT)::BIGINT
         AS key_milli
FROM logw
ORDER BY key_milli DESC, doc_id ASC
LIMIT {k}
"""


# ------------------------------------------------- BPE merge training
# The canonical LLM tokenizer-training step (Sennrich et al. 2016,
# "Neural machine translation of rare words with subword units"):
# repeatedly merge the corpus's most frequent adjacent symbol pair.
# Words start as space-joined character sequences; each round counts
# adjacent pairs (one explode + map-side-combinable groupBy), picks the
# argmax pair (count desc, pair asc tiebreak — ONE driver scalar), and
# applies the merge TOKEN-AWARE (see _bpe_apply_*): separators widen to
# two spaces and the replace pattern carries its boundary spaces, so a
# pair can only match whole-symbol adjacencies — never across symbol
# boundaries once multi-char symbols exist (after 't h'→'th', pair
# 'h e' must NOT rewrite ['th','e']; the round-4 raw-substring replace
# did — round-4 ADVICE). The widened-separator replace is exactly
# Sennrich's greedy non-overlapping left-to-right merge: each match
# consumes only its own separators, so adjacent merge sites stay
# independent (['A','B','A','B'] → ['AB','AB']). The oracle recomputes
# the SAME rounds with scalar subqueries, so the learned merge table
# itself is oracle-certified — not just replayed.
#
# Scale: each round is one corpus pass over a frame that is eagerly
# localCheckpoint-ed every round (the neardup_clusters pattern) — the
# previous rounds' replaces are stored data, not lineage, so training is
# LINEAR in n_merges (round 4 re-derived the stack each round: O(n²)
# corpus scans) and plan depth stays O(1). Per round: one explode +
# combinable count (shuffle = |pair vocabulary| rows after partial agg),
# one O(1) driver argmax, one narrow map + checkpoint materialization.
# Production contract: a real 30k-merge vocab still means 30k sequential
# corpus passes — train on a bounded deterministic sample via the
# corpus_sample_* operators above, exactly like production tokenizers.
BPE_MERGES = 5


def _bpe_chars_spark(col: str) -> str:
    return (
        f"array_join(transform(sequence(1, length({col})), "
        f"i -> substring({col}, i, 1)), ' ')"
    )


def _bpe_pairs(seq_col) -> F.Column:
    arr = F.split(seq_col, " ")
    n = F.size(arr)
    return F.zip_with(
        F.slice(arr, 1, n - 1),
        F.slice(arr, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )


def _bpe_apply_spark(seq_col: F.Column, pair: str) -> F.Column:
    """Token-aware greedy merge of ``pair`` ("A B" → "AB"): widen every
    separator to two spaces, replace the boundary-delimited occurrence
    (literal non-regex replace — DuckDB parity), re-collapse. Only
    whole-symbol adjacencies can match, and each match consumes its own
    separators, so this is Sennrich's non-overlapping left-to-right
    merge exactly (see the section comment above)."""
    pat = " " + pair.replace(" ", "  ") + " "
    rep = " " + pair.replace(" ", "") + " "
    padded = F.concat(
        F.lit(" "), F.replace(seq_col, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    return F.trim(
        F.replace(
            F.replace(padded, F.lit(pat), F.lit(rep)), F.lit("  "), F.lit(" ")
        )
    )


def bpe_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    from spider_core_spark.operators.prefix import (
        _jrdd_handles,
        _persistent_ids,
    )

    # train on the DISTINCT-WORD frequency table (the classical Sennrich
    # formulation): identical pair counts — every occurrence of a pair in
    # a word instance = (pairs in the distinct word) × (word count) — and
    # the same argmax/tiebreak, but each round's explode + merge pass
    # touches |vocab| rows instead of |corpus words| (Zipf: orders of
    # magnitude fewer), and the per-round checkpoint shrinks to match
    words = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("w")
    )
    seq = words.groupBy("w").agg(F.count("*").alias("cnt")).select(
        F.expr(_bpe_chars_spark("w")).alias("seq"), "cnt"
    )
    merges: list[tuple[int, str, int]] = []
    prev_ckpt: list = []  # previous round's checkpoint RDD handles
    for it in range(1, n_merges + 1):
        top = (
            seq.select(
                F.explode(_bpe_pairs(F.col("seq"))).alias("pair"), "cnt"
            )
            .groupBy("pair")
            .agg(F.sum("cnt").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()[0]
        )
        merges.append((it, top["pair"], int(top["c"])))
        if it == n_merges:
            break  # the post-final-merge sequence is never read
        nxt = seq.select(
            _bpe_apply_spark(F.col("seq"), top["pair"]).alias("seq"), "cnt"
        )
        # eager checkpoint: round it's replaces become stored data, so
        # round it+1 runs ONE corpus pass, not it stacked ones (linear)
        ids_before = _persistent_ids(spark)
        seq = nxt.localCheckpoint(eager=True)
        new_ids = _persistent_ids(spark) - ids_before
        for h in prev_ckpt:
            h.unpersist()
        prev_ckpt = _jrdd_handles(spark, new_ids)
    for h in prev_ckpt:
        h.unpersist()
    return spark.createDataFrame(
        merges, "iter long, pair string, cnt long"
    )


def _bpe_train_ctes(n_merges: int) -> tuple[list[str], list[str]]:
    """Shared oracle CTE chain (w0, s0, p{i}, b{i}, s{i}): the b{i}
    scalar-subquery tables ARE the learned merge table; returns
    (cte_parts, per-iteration merge-row selects)."""
    chars = (
        "array_to_string([w[i:i] for i in range(1, len(w) + 1)], ' ')"
    )
    parts = [
        "w0 AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents)",
        f"s0 AS (SELECT {chars} AS seq FROM w0)",
    ]
    selects = []
    for it in range(1, n_merges + 1):
        p = it - 1
        parts.append(
            f"""p{it} AS (
  SELECT pair, count(*)::BIGINT AS c FROM (
    SELECT unnest([arr[i] || ' ' || arr[i + 1]
                   for i in range(1, len(arr))]) AS pair
    FROM (SELECT string_split(seq, ' ') AS arr FROM s{p})
  ) GROUP BY 1
)"""
        )
        parts.append(
            f"b{it} AS (SELECT pair, c FROM p{it} "
            f"ORDER BY c DESC, pair ASC LIMIT 1)"
        )
        # token-aware merge, identical to _bpe_apply_spark: widen
        # separators, replace the boundary-delimited pattern, re-collapse
        pat = f"(' ' || replace((SELECT pair FROM b{it}), ' ', '  ') || ' ')"
        rep = f"(' ' || replace((SELECT pair FROM b{it}), ' ', '') || ' ')"
        parts.append(
            f"s{it} AS (SELECT trim(replace(replace("
            f"' ' || replace(seq, ' ', '  ') || ' ', {pat}, {rep}), "
            f"'  ', ' ')) AS seq FROM s{p})"
        )
        selects.append(f"SELECT {it} AS iter, pair, c AS cnt FROM b{it}")
    return parts, selects


def bpe_merges_sql(n_merges: int = BPE_MERGES) -> str:
    parts, selects = _bpe_train_ctes(n_merges)
    joined = ",\n".join(parts)
    return f"WITH {joined}\n" + " UNION ALL ".join(selects)


# --------------------------------------------------- BPE application
# The other half of tokenizer training: APPLY the learned merge table to
# the corpus and report the per-document token count under the learned
# vocabulary — the number a data-mixture/packing plan actually budgets
# with (whitespace counts over-estimate by the subword factor). Training
# (bpe_merges) is the sequential part; application is embarrassingly
# parallel: ONE narrow corpus pass with the n_merges token-aware
# replaces stacked as expressions — no iteration, no shuffle until the
# final combinable groupBy(doc_id).
#
# Scale contract: stacked replace expressions are the DECLARATIVE,
# oracle-certifiable form and are practical to a few hundred merges; a
# production 30k-merge vocabulary applies the same learned table inside
# an Arrow-batched pandas UDF (plain dict-loop tokenizer) — semantics
# certified here, transport swapped. Empty words (split artifacts of
# repeated spaces) are excluded identically in both engines.


def bpe_encode(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    merges = [
        r["pair"]
        for r in bpe_merges(spark, sf_dir, n_merges=n_merges)
        .orderBy("iter")
        .collect()
    ]
    words = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    # tokenize each DISTINCT word once (Zipf: the stacked replaces and
    # the char-join expression run |vocab| times, not once per word
    # instance), then attach the per-word symbol count back with a
    # broadcast join — n_sym is a pure function of the word, so per-doc
    # sums are identical to the per-instance evaluation
    seq = F.expr(_bpe_chars_spark("w"))
    for pair in merges:  # stacked narrow expressions, one pass
        seq = _bpe_apply_spark(seq, pair)
    vocab = (
        words.select("w")
        .distinct()
        .select("w", F.size(F.split(seq, " ")).alias("n_sym"))
    )
    return (
        words.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_sym").cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_encode_sql(n_merges: int = BPE_MERGES) -> str:
    """Reuses the training CTE chain (b1..bN scalar subqueries are the
    SAME learned merge table the Spark side collected), then applies the
    identical token-aware stacked replaces per (doc_id, word)."""
    parts, _ = _bpe_train_ctes(n_merges)
    chars = "array_to_string([w[i:i] for i in range(1, len(w) + 1)], ' ')"
    parts = parts + [
        (
            "dw0 AS (SELECT doc_id, w FROM (SELECT doc_id, "
            "unnest(string_split(text, ' ')) AS w FROM documents) "
            "WHERE w <> '')"
        ),
        f"ds0 AS (SELECT doc_id, {chars} AS seq FROM dw0)",
    ]
    for it in range(1, n_merges + 1):
        pat = f"(' ' || replace((SELECT pair FROM b{it}), ' ', '  ') || ' ')"
        rep = f"(' ' || replace((SELECT pair FROM b{it}), ' ', '') || ' ')"
        parts.append(
            f"ds{it} AS (SELECT doc_id, trim(replace(replace("
            f"' ' || replace(seq, ' ', '  ') || ' ', {pat}, {rep}), "
            f"'  ', ' ')) AS seq FROM ds{it - 1})"
        )
    joined = ",\n".join(parts)
    return f"""
WITH {joined}
SELECT doc_id, count(*)::BIGINT AS n_words,
       sum(len(string_split(seq, ' ')))::BIGINT AS n_bpe_tokens
FROM ds{n_merges}
GROUP BY doc_id
"""


def bpe_encode_udf(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """The PRODUCTION transport for BPE application (the swap the
    ``bpe_encode`` scale contract promises): the same learned merge
    table applied inside an Arrow-batched ``mapInPandas`` dict-loop
    tokenizer instead of ``n_merges`` stacked replace expressions.

    Output frame and semantics are bit-identical to ``bpe_encode`` —
    per word, the merges fold sequentially IN TRAINING ORDER, each pass
    the canonical greedy non-overlapping left-to-right merge (the
    list-fold twin tests/test_sketch_dsir.py pins). Registered under
    the driver gate with the SAME DuckDB oracle as ``bpe_encode``, so
    the UDF transport itself is oracle-certified.

    Why this scales where the expression stack does not: a stacked
    plan grows O(n_merges) deep (catalyst analysis cost, codegen
    limits ~ a few hundred merges); here the merge table is a plain
    broadcast list (30k merges ≈ a few hundred KB pickled) and the
    per-word cost is pruned two ways —
      * a per-task memo keyed by the distinct word (created in
        _tokenize per mapInPandas task, so amortization is per task's
        batches, and its memory is re-paid per task — r5 ADVICE #4;
        Zipf: most corpus mass is a small vocabulary, so most words
        tokenize from the dict, zero fold work);
      * per un-memoized word, a merge pass runs only while both of
        its symbols are present in the word's current symbol set
        (set-membership skip), so a 30k-entry table costs ~the number
        of merges that actually fire, not 30k scans.
    One narrow corpus pass, Arrow-batched; the only shuffle is the
    final map-side-combinable groupBy(doc_id) — the bpe_encode plan.
    """
    import pandas as pd

    merges = [
        tuple(r["pair"].split(" "))
        for r in bpe_merges(spark, sf_dir, n_merges=n_merges)
        .orderBy("iter")
        .collect()
    ]

    def _tokenize(batches):
        memo: dict[str, int] = {}

        def n_sym(word: str) -> int:
            got = memo.get(word)
            if got is not None:
                return got
            toks = list(word)
            present = set(toks)
            for a, b in merges:
                if a not in present or b not in present:
                    continue
                out, i, n = [], 0, len(toks)
                while i < n:
                    if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                if len(out) != n:
                    toks = out
                    present = set(toks)
            memo[word] = len(toks)
            return len(toks)

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_words = n_tokens = 0
                # NULL text arrives as None: treat as empty, matching the
                # declarative bpe_encode (split(NULL) drops the row's
                # words) instead of raising in the worker (r5 ADVICE #1)
                for w in (text or "").split(" "):
                    if w:
                        n_words += 1
                        n_tokens += n_sym(w)
                rows.append((doc_id, n_words, n_tokens))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_words", "n_bpe_tokens"]
            )

    return _docs(spark, sf_dir).select("doc_id", "text").mapInPandas(
        _tokenize,
        schema="doc_id long, n_words long, n_bpe_tokens long",
    )


# ------------------------------------------- fixed-N stratified sampling
# The rate-based sibling (corpus_sample_stratified) keeps a FRACTION per
# language; mixture builders usually specify an exact COUNT ("40k docs
# of French"). Deterministic fixed-N: order each language by
# (h64(doc_id, seed 89), doc_id) — a content-independent shuffle that
# every engine and every re-run reproduces — and keep the first N.
#
# Scale: per-language rank is the grouped-prefix machinery
# (operators/prefix.py) with val=1 — an exclusive prefix COUNT. The
# naive row_number() window funnels each whole language through one
# task (one language ≈ half a web corpus); two-phase range-partitioned
# rank never does. Small path (≤1M rows) is the plain window the oracle
# mirrors; big path is bit-equal (test_prefix_sum protocol).
SAMPLE_FIXED_SEED = 89
SAMPLE_FIXED_N = 60


def corpus_sample_fixed_n(
    spark: SparkSession,
    sf_dir: str,
    n: int = SAMPLE_FIXED_N,
    small_threshold: int | None = None,
) -> DataFrame:
    from spider_core_spark.operators.prefix import with_group_prefix_sum
    from spider_core_spark.textops.dedup import _h64_spark

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.expr(_h64_spark("cast(doc_id as string)", SAMPLE_FIXED_SEED)).alias(
            "_hk"
        ),
        F.lit(1).cast("long").alias("_one"),
    )
    kwargs = {}
    if small_threshold is not None:
        kwargs["small_threshold"] = small_threshold
    out, release = with_group_prefix_sum(
        d, ["lang"], ["_hk", "doc_id"], "_one", "_rk", **kwargs
    )
    result = (
        out.filter(F.col("_rk") < n)
        .select(
            "doc_id", "lang", (F.col("_rk") + 1).cast("long").alias("sample_rank")
        )
    )
    # defer release to AFTER the caller's terminal action (the staged-
    # cache contract; premature release was the round-4 verdict hazard)
    from spider_core_spark.textops.dedup import stage_handle

    stage_handle(release)
    return result


def corpus_sample_fixed_n_sql(n: int = SAMPLE_FIXED_N) -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    h = h64_duckdb("cast(doc_id as varchar)", seed=SAMPLE_FIXED_SEED)
    return f"""
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang ORDER BY {h}, doc_id
         )::BIGINT AS sample_rank
  FROM documents
)
WHERE sample_rank <= {n}
"""


# ------------------------------------------------ split leakage check
# Eval hygiene: a hash split assigns docs to train/val/test
# INDEPENDENTLY of content, so near-duplicate pairs can straddle the
# boundary — the classic "test set leaked into training" failure (the
# reason Lee et al. 2022 dedup before splitting). This op counts MinHash
# candidate near-dup pairs per (split, split) cell; any off-diagonal
# mass is leakage the pipeline must resolve (drop one side, or split by
# cluster instead of by doc).
#
# Scale: reuses the persisted band table (one signature pass) and the
# one (band_idx, band_hash) equi-join from minhash_pairs; the split
# label is a per-row hash expression attached during the pair join
# (docs side pruned to doc_id only); output is a ≤9-row aggregate.


def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spider_core_spark.textops import dedup as td
    from spider_core_spark.textops.dedup import _h64_spark

    pairs = td.minhash_pairs(spark, sf_dir)
    pct = F.expr(_h64_spark("cast(doc_id as string)", SPLIT_SEED)) % 100
    split = (
        F.when(pct < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(pct < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    sp = _docs(spark, sf_dir).select("doc_id", split.alias("split"))
    sa = sp.select(F.col("doc_id").alias("a"), F.col("split").alias("_sa"))
    sb = sp.select(F.col("doc_id").alias("b"), F.col("split").alias("_sb"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            F.least("_sa", "_sb").alias("split_lo"),
            F.greatest("_sa", "_sb").alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .withColumn("leaked", F.col("split_lo") != F.col("split_hi"))
    )


def split_leakage_sql() -> str:
    from spider_core_spark.functions.hashing import h64_duckdb
    from spider_core_spark.textops import dedup as td

    h = h64_duckdb("cast(doc_id as varchar)", seed=SPLIT_SEED)
    return f"""
WITH pairs AS ({td.minhash_pairs_sql()}),
sp AS (
  SELECT doc_id,
         CASE WHEN ({h}) % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN ({h}) % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       count(*)::BIGINT AS n_pairs,
       (least(sa.split, sb.split) <> greatest(sa.split, sb.split)) AS leaked
FROM pairs
JOIN sp sa ON sa.doc_id = pairs.a
JOIN sp sb ON sb.doc_id = pairs.b
GROUP BY 1, 2
"""


# ------------------------------------------------- lexical tf-idf search
# Boolean OR retrieval with tf·idf ranking over the corpus — the lexical
# sibling of the ANN suite (a corpus pipeline needs term lookup for
# auditing/decontamination spot checks as much as vector search). Robertson
# -Sparck Jones idf in integer millinats: idf_milli = round(1000·ln((N −
# df + 0.5)/(df + 0.5) + 1)) (the BM25 idf, floor 0 by construction);
# doc score = Σ_matched_terms tf · idf_milli — an EXACT integer, so the
# ranking has no FP hazard (k1/b length normalization is a documented
# extension; it would put one correctly-rounded division per (doc, term)
# pair on top).
#
# Scale: the term filter is pushed INTO the token explode (only query
# terms survive the scan stage — the exploded frame is |terms|-bounded,
# not corpus-sized); tf agg and df agg are map-side combinable; the
# |terms|-row idf table and the 1-row N singleton join broadcast; top-k
# is a TakeOrdered.
SEARCH_TERMS = ["spark", "query", "window"]
SEARCH_TOPK = 50


def tfidf_search(
    spark: SparkSession,
    sf_dir: str,
    terms: list[str] | None = None,
    k: int = SEARCH_TOPK,
) -> DataFrame:
    terms = SEARCH_TERMS if terms is None else terms
    term_arr = F.array(*[F.lit(t) for t in terms])
    tf = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.array_contains(term_arr, F.col("tok")))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    n = _docs(spark, sf_dir).agg(F.count("*").cast("long").alias("n_docs"))
    idf = (
        tf.groupBy("tok")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(n))
        .select(
            "tok",
            F.round(
                F.lit(1000.0)
                * F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                ),
                0,
            ).cast("long").alias("idf_milli"),
        )
    )
    return (
        tf.join(F.broadcast(idf), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum(F.col("tf") * F.col("idf_milli")).cast("long").alias(
                "score_milli"
            ),
        )
        .orderBy(F.desc("score_milli"), F.asc("doc_id"))
        .limit(k)
    )


def tfidf_search_sql(
    terms: list[str] | None = None, k: int = SEARCH_TOPK
) -> str:
    terms = SEARCH_TERMS if terms is None else terms
    # escape single quotes — a term like "it's" must not break (or invite
    # injection into) the oracle string (round-4 ADVICE)
    lst = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH tf AS (
  SELECT doc_id, tok, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE tok IN ({lst})
  GROUP BY 1, 2
), n AS (
  SELECT count(*)::BIGINT AS n_docs FROM documents
), idf AS (
  SELECT tok,
         round(1000.0 * ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 0)::BIGINT
           AS idf_milli
  FROM (SELECT tok, count(*)::BIGINT AS df FROM tf GROUP BY 1), n
)
SELECT doc_id, count(*)::BIGINT AS n_terms,
       sum(tf * idf_milli)::BIGINT AS score_milli
FROM tf JOIN idf USING (tok)
GROUP BY doc_id
ORDER BY score_milli DESC, doc_id ASC
LIMIT {k}
"""


# --------------------------------------------- exact length quantiles
# Per-language EXACT token-count quantiles (type-1 / inverse empirical
# CDF: q_p = smallest value whose cumulative count reaches ceil(p·N/100))
# — the distribution report a corpus pipeline runs before choosing
# truncation/packing lengths. Completes the sketch family next to CMS
# (heavy hitters) and HLL (cardinality), but EXACT: integer thresholds,
# no percentile_approx (whose t-digest would never bit-match DuckDB).
#
# Scale shape: the only pass over the corpus is groupBy(lang, n_tokens)
# — map-side combinable, and its output is bounded by |langs| × |distinct
# doc lengths| (≤ a few 10^5 rows at ANY corpus size — doc lengths are
# bounded), so the cumulative window + quantile pick run on a frame
# ~10^5 rows regardless of input scale (the vocab_topk pattern: windows
# only over tiny aggregates, never over the corpus).
QUANTILE_PCTS = [25, 50, 75, 95]


def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select(
        "lang", F.size(F.split("text", " ")).cast("long").alias("v")
    )
    hist = d.groupBy("lang", "v").agg(F.count("*").cast("long").alias("c"))
    w = Window.partitionBy("lang").orderBy("v")
    cum = hist.select(
        "lang",
        "v",
        F.sum("c").over(w).cast("long").alias("cum"),
        F.sum("c").over(
            Window.partitionBy("lang").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("n_docs"),
    )
    pcts = spark.createDataFrame(
        [(p,) for p in QUANTILE_PCTS], "pct long"
    )
    return (
        cum.crossJoin(F.broadcast(pcts))
        .filter(F.col("cum") * 100 >= F.col("pct") * F.col("n_docs"))
        .groupBy("lang", "pct")
        .agg(
            F.min("v").cast("long").alias("q_tokens"),
            F.max("n_docs").cast("long").alias("n_docs"),
        )
        .select("lang", "pct", "n_docs", "q_tokens")
    )


def length_quantiles_sql() -> str:
    pcts = ", ".join(f"({p})" for p in QUANTILE_PCTS)
    return f"""
WITH d AS (
  SELECT lang, len(string_split(text, ' '))::BIGINT AS v FROM documents
), hist AS (
  SELECT lang, v, count(*)::BIGINT AS c FROM d GROUP BY 1, 2
), cum AS (
  SELECT lang, v,
         sum(c) OVER (PARTITION BY lang ORDER BY v)::BIGINT AS cum,
         sum(c) OVER (PARTITION BY lang)::BIGINT AS n_docs
  FROM hist
), pcts(pct) AS (VALUES {pcts})
SELECT lang, pct::BIGINT AS pct, max(n_docs)::BIGINT AS n_docs,
       min(v)::BIGINT AS q_tokens
FROM cum CROSS JOIN pcts
WHERE cum * 100 >= pct * n_docs
GROUP BY 1, 2
"""


# ------------------------------------------------ token-budget mixture sampler
# Training-mixture rebalancing: given target per-language sampling weights
# (the Pile / DoReMi-style domain-mix knob, public protocol), keep a
# deterministic hash-ordered subset of each language whose token mass
# fills floor(weight_permille · lang_total_tokens / 1000) — i.e. "take
# the first docs in hash order until the language's token budget is
# full" (strict take-while: the straddling doc is dropped, so the kept
# mass never overshoots).
#
# Scale: pass 1 is one combinable groupBy(lang) token-mass aggregate
# (|langs| rows, collected — the source_mix driver-table pattern); pass 2
# attaches the budget via a broadcast literal and rides the grouped
# prefix-sum operator, so per-language cumulative token counts use the
# two-phase range-partition machinery, never a whole-language window.
# Integer-exact end-to-end (token counts and budgets are int64; the
# permille weights avoid FP), so Spark ≡ DuckDB bit-for-bit.
MIXTURE_SEED = 101
MIXTURE_PERMILLE = {"en": 250, "zh": 500, "es": 750, "de": 400, "fr": 600}
MIXTURE_DEFAULT_PERMILLE = 0  # unlisted languages are excluded


def mixture_sample(
    spark: SparkSession,
    sf_dir: str,
    permille: dict[str, int] | None = None,
    small_threshold: int | None = None,
) -> DataFrame:
    from spider_core_spark.operators.prefix import with_group_prefix_sum
    from spider_core_spark.textops.dedup import _h64_spark, stage_handle

    pm = MIXTURE_PERMILLE if permille is None else permille
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("tokens"),
        F.expr(_h64_spark("cast(doc_id as string)", MIXTURE_SEED)).alias("_hk"),
    )
    # pass 1: per-language token mass → |langs|-row driver table of
    # integer budgets (floor division keeps both engines bit-identical)
    rows = (
        d.groupBy("lang").agg(F.sum("tokens").cast("long").alias("_m")).collect()
    )
    budgets = [
        (
            r["lang"],
            int(r["_m"]) * pm.get(r["lang"], MIXTURE_DEFAULT_PERMILLE) // 1000,
        )
        for r in rows
    ]
    bdf = spark.createDataFrame(budgets, "lang string, budget_tokens long")
    kwargs = {}
    if small_threshold is not None:
        kwargs["small_threshold"] = small_threshold
    out, release = with_group_prefix_sum(
        d, ["lang"], ["_hk", "doc_id"], "tokens", "_ps", **kwargs
    )
    result = (
        out.join(F.broadcast(bdf), "lang")
        .withColumn("cum_tokens", (F.col("_ps") + F.col("tokens")).cast("long"))
        .filter(F.col("cum_tokens") <= F.col("budget_tokens"))
        .select("doc_id", "lang", "tokens", "cum_tokens", "budget_tokens")
    )
    # staged-cache contract: release after the caller's terminal action
    stage_handle(release)
    return result


def mixture_sample_sql(permille: dict[str, int] | None = None) -> str:
    from spider_core_spark.functions.hashing import h64_duckdb

    pm = MIXTURE_PERMILLE if permille is None else permille
    h = h64_duckdb("cast(doc_id as varchar)", seed=MIXTURE_SEED)
    case = (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(pm.items()))
        + f" ELSE {MIXTURE_DEFAULT_PERMILLE} END"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, lang,
         len(string_split(text, ' '))::BIGINT AS tokens,
         {h} AS hk
  FROM documents
), budget AS (
  SELECT lang, (sum(tokens) * ({case})) // 1000 AS budget_tokens
  FROM tok GROUP BY lang
)
SELECT doc_id, lang, tokens, cum_tokens, budget_tokens FROM (
  SELECT t.doc_id, t.lang, t.tokens,
         sum(t.tokens) OVER (
           PARTITION BY t.lang ORDER BY t.hk, t.doc_id
           ROWS UNBOUNDED PRECEDING
         )::BIGINT AS cum_tokens,
         b.budget_tokens::BIGINT AS budget_tokens
  FROM tok t JOIN budget b USING (lang)
)
WHERE cum_tokens <= budget_tokens
"""
