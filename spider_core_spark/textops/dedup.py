"""Document deduplication suite for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Each operator is (a) a Spark DataFrame builder over the `documents` /
`embeddings` tables and (b) a DuckDB SQL generator computing the SAME
values — both derive every hash from the shared h64 primitive
(functions/hashing.py), so the driver's value-hash comparison holds
bit-for-bit.

Scale design notes (100 TB):
- exact: one groupBy on sha256(text) — map-side partial agg, no skew
  (hash keys uniform);
- minhash: signatures are per-row (narrow, no shuffle); LSH banding
  turns near-dup detection into an equi-join per band — candidate pairs
  only ever meet inside a band bucket, never all-pairs;
- simhash: per-row token explode + one groupBy(doc) — the 32 bit-sums are
  map-side combinable;
- ngram-jaccard: pairs restricted to (lang, length-bucket) blocking keys —
  the classic blocking trick keeping the join from going quadratic;
- embedding near-dup: label-blocked pair join (stand-in for an IVF
  partitioning at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spider_core_spark.functions.hashing import h64_duckdb

H = 15  # hex chars (shared with hashing.h64_*)

# ---------------------------------------------------------------- helpers
TOKENS_SPARK = "split(text, ' ')"
TOKENS_DUCK = "string_split(text, ' ')"


def _h64_spark(expr: str, seed: int) -> str:
    return (
        f"cast(conv(substring(sha2(concat('{seed}:', {expr}), 256), 1, {H}), 16, 10) as long)"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------- exact
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash; keeper = min doc_id."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.sha2(F.col("text"), 256).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


EXACT_DEDUP_SQL = """
SELECT sha256(text) AS content_hash,
       min(doc_id)  AS keeper_doc_id,
       count(*)     AS n_copies
FROM documents GROUP BY 1
"""

# ---------------------------------------------------------------- minhash
# K=8 minhash functions from TWO sha256 calls per shingle: each digest's 64
# hex chars yield four independent 60-bit words (15 hex chars each). The
# naive one-sha-per-hash scheme costs 8 digests per shingle — at 100 TB the
# signature pass is sha-bound, so this is a 4× cut with identical LSH
# properties (disjoint substrings of a cryptographic digest are independent).
K_HASHES = 8
N_BANDS = 4  # rows per band r = K_HASHES / N_BANDS = 2
SHINGLE = 3
_SHAS_PER_SHINGLE = 2  # ceil(K_HASHES / 4 words per digest)


def _shingles_spark(tokens: str = TOKENS_SPARK) -> str:
    # NOTE: pass a staged tokens COLUMN (not the split() expression) in hot
    # paths — an expression inside the lambda is re-evaluated per element,
    # i.e. the text would be re-tokenized once per shingle (~300× per row)
    return (
        f"transform(sequence(0, greatest(size({tokens}) - {SHINGLE}, 0)), "
        f"i -> concat_ws(' ', slice({tokens}, i + 1, {SHINGLE})))"
    )


def _docs_tokens(spark: SparkSession, sf_dir: str, *extra: str) -> DataFrame:
    """documents with tokens staged as a column (evaluated once per row;
    the multi-reference non-cheap alias survives CollapseProject)."""
    return _docs(spark, sf_dir).select(
        "doc_id", *extra, F.expr(TOKENS_SPARK).alias("_toks")
    )


def _shingles_duck() -> str:
    t = TOKENS_DUCK
    return (
        f"[array_to_string({t}[i:i+{SHINGLE - 1}], ' ') "
        f"for i in range(1, greatest(len({t}) - {SHINGLE - 1}, 1) + 1)]"
    )


def _shas_spark(tokens: str = "_toks") -> str:
    """Per-shingle concat of the 2 seeded digests (128 hex chars) — computed
    ONCE per shingle; the 8 signature mins below are substring slices of it."""
    shas = " , ".join(
        f"sha2(concat('{s}:', x), 256)" for s in range(_SHAS_PER_SHINGLE)
    )
    return f"transform({_shingles_spark(tokens)}, x -> concat({shas}))"


def _shas_duck() -> str:
    shas = " || ".join(f"sha256('{s}:' || x)" for s in range(_SHAS_PER_SHINGLE))
    return f"list_transform({_shingles_duck()}, x -> {shas})"


def minhash_sig_exprs_spark(shas_col: str) -> list[str]:
    return [
        f"array_min(transform({shas_col}, s -> "
        f"cast(conv(substring(s, {1 + 15 * i}, {H}), 16, 10) as long)))"
        for i in range(K_HASHES)
    ]


def minhash_sig_exprs_duck(shas_col: str) -> list[str]:
    return [
        f"list_min(list_transform({shas_col}, s -> "
        f"('0x' || substring(s, {1 + 15 * i}, {H}))::BIGINT))"
        for i in range(K_HASHES)
    ]


def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc LSH band hashes: band_j = h64(concat of r signature mins).
    Flat int64 columns so the oracle comparison is exact. The expensive
    sha pass lives in the `_shas` projection, evaluated once per row —
    Catalyst keeps the two Projects separate (CollapseProject refuses to
    duplicate non-cheap aliases used more than once)."""
    d = _docs_tokens(spark, sf_dir).select(
        "doc_id", F.expr(_shas_spark("_toks")).alias("_shas")
    )
    sigs = minhash_sig_exprs_spark("_shas")
    r = K_HASHES // N_BANDS
    cols = [F.col("doc_id")]
    for b in range(N_BANDS):
        parts = sigs[b * r: (b + 1) * r]
        concat = " , '|', ".join(f"cast({p} as string)" for p in parts)
        band_expr = _h64_spark(f"concat({concat})", 100 + b)
        cols.append(F.expr(band_expr).alias(f"band{b}"))
    return d.select(*cols)


def minhash_bands_sql() -> str:
    sigs = minhash_sig_exprs_duck("_shas")
    r = K_HASHES // N_BANDS
    sel = ["doc_id"]
    for b in range(N_BANDS):
        parts = sigs[b * r: (b + 1) * r]
        concat = " , '|', ".join(f"cast({p} as varchar)" for p in parts)
        sel.append(f"{h64_duckdb(f'concat({concat})', seed=100 + b)} AS band{b}")
    return (
        "SELECT " + ", ".join(sel)
        + f" FROM (SELECT doc_id, {_shas_duck()} AS _shas FROM documents)"
    )


def minhash_bands_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_idx, band_hash) long form: signatures computed ONCE,
    persisted, self-joined once on (band_idx, band_hash) — the scale shape
    for candidate generation (one equi-join, band_idx+hash as the shuffle
    key, never an all-pairs product)."""
    wide = minhash_bands(spark, sf_dir)
    arr = F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])
    return wide.select(
        "doc_id", F.posexplode(arr).alias("band_idx", "band_hash")
    )


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket. One
    self-join of the persisted long form (signature pass paid once), not
    one join per band."""
    long = minhash_bands_long(spark, sf_dir).persist()
    l = long.select(F.col("doc_id").alias("a"), "band_idx", "band_hash")
    r_ = long.select(F.col("doc_id").alias("b"), "band_idx", "band_hash")
    return (
        l.join(r_, ["band_idx", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_pairs_sql() -> str:
    base = minhash_bands_sql()
    long_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS band_hash FROM bands"
        for b in range(N_BANDS)
    )
    return f"""
WITH bands AS ({base}),
long AS ({long_union})
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM long l JOIN long r USING (band_idx, band_hash)
WHERE l.doc_id < r.doc_id
"""


# ---------------------------------------------------------------- simhash
SIMHASH_BITS = 32


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over whitespace tokens (frequency-weighted)."""
    d = _docs(spark, sf_dir)
    ex = d.select(
        "doc_id", F.explode(F.expr(TOKENS_SPARK)).alias("tok")
    ).withColumn("h", F.expr(_h64_spark("tok", 9)))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    g = ex.groupBy("doc_id").agg(*aggs)
    sim = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = bit if sim is None else sim + bit
    return g.select("doc_id", sim.alias("simhash"))


def simhash_sql() -> str:
    h = h64_duckdb("tok", seed=9)
    sums = ", ".join(
        f"sum(case when (h >> {b}) & 1 = 1 then 1 else -1 end) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(case when s{b} >= 0 then {1 << b}::BIGINT else 0 end)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH ex AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
), g AS (SELECT doc_id, {sums} FROM ex GROUP BY doc_id)
SELECT doc_id, {bits} AS simhash FROM g
"""


# ---- SimHash Hamming-neighbor pairing ---------------------------------
SIMHASH_HAMMING_MAX = 3
_SIMHASH_BANDS = 4  # 32 bits → 4 byte-bands; pigeonhole: distance ≤ 3
# touches at most 3 bands, so any such pair shares ≥ 1 untouched band


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ 3: candidates = docs
    sharing any of the 4 byte-bands of their 32-bit simhash (pigeonhole
    guarantees completeness), verified by exact popcount of the XOR.
    Bucketed equi-join — (band_idx, band_byte) is the shuffle key at
    scale, never an all-pairs product."""
    sh = simhash(spark, sf_dir)
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255))
            for b in range(_SIMHASH_BANDS)
        ]
    )
    long = sh.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band_idx", "bb")
    ).persist()
    l = long.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("sa"),
        "band_idx", "bb",
    )
    r_ = long.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("sb"),
        "band_idx", "bb",
    )
    return (
        l.join(r_, ["band_idx", "bb"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sa", "sb")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select("a", "b", "hamming")
    )


def simhash_pairs_sql() -> str:
    base = simhash_sql()
    long_union = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_idx, "
        f"(simhash >> {8 * b}) & 255 AS bb FROM sh"
        for b in range(_SIMHASH_BANDS)
    )
    return f"""
WITH sh AS ({base}),
long AS ({long_union}),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
         l.simhash AS sa, r.simhash AS sb
  FROM long l JOIN long r USING (band_idx, bb)
  WHERE l.doc_id < r.doc_id
)
SELECT a, b, bit_count(xor(sa, sb))::INT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {SIMHASH_HAMMING_MAX}
"""


# ------------------------------------------------------------- ngram jaccard
JACCARD_THRESHOLD = 0.3
LEN_BUCKET = 100


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise Jaccard over 3-word shingle sets: candidates share
    (lang, n_chars bucket); |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.

    Scale design (output-preserving — every guard is implied by J ≥ 0.3,
    so the result set is EXACTLY the unguarded one):
    - shingles are HASHED to int64 (h64, both engines) before the pair
      join — set intersection compares 8-byte words, not strings, and the
      shuffled pair rows carry long arrays instead of string arrays;
    - length-ratio prefilter: J ≤ min(|A|,|B|)/max(|A|,|B|), so pairs with
      10·min < 3·max can't reach 0.3 — exact integer test on precomputed
      set sizes BEFORE the intersect;
    - the hashed-shingle pass is persisted (paid once, not per join side)
      and the intersect is a staged column (evaluated once, not re-derived
      by the threshold filter);
    - the bucket key uses explicit floor division (identical in both
      engines). The blocking join stays (lang, len-bucket) keyed."""
    d = _docs_tokens(spark, sf_dir, "lang", "n_chars").select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / LEN_BUCKET).cast("int").alias("lb"),
        F.array_distinct(
            F.expr(
                f"transform({_shingles_spark('_toks')}, "
                f"x -> {_h64_spark('x', 7)})"
            )
        ).alias("sh"),
    ).withColumn("nsh", F.size("sh")).persist()
    # salt the block key (output-preserving): with ~30 (lang, lb) blocks
    # the intersect work lands on ~30 key-groups regardless of executor
    # count — salting the left side by pmod(doc_id, S) and replicating the
    # right side S× spreads each block across S tasks (each pair still
    # meets exactly once, in the left row's salt slot)
    S = 8
    l = d.select(
        F.col("doc_id").alias("a"), "lang", "lb",
        F.col("sh").alias("sha"), F.col("nsh").alias("na"),
        F.pmod("doc_id", F.lit(S)).cast("int").alias("_salt"),
    )
    r = d.select(
        F.col("doc_id").alias("b"), "lang", "lb",
        F.col("sh").alias("shb"), F.col("nsh").alias("nb"),
        F.explode(F.array(*[F.lit(i) for i in range(S)])).alias("_salt"),
    )
    # J >= 0.3 ⇒ min/max >= 0.3 ⇔ 10·min >= 3·max (exact integer test)
    ratio_ok = F.least("na", "nb") * 10 >= F.greatest("na", "nb") * 3
    return (
        l.join(r, ["lang", "lb", "_salt"])
        .filter((F.col("a") < F.col("b")) & ratio_ok)
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a", "b", "jaccard")
    )


def ngram_jaccard_sql() -> str:
    hsh = h64_duckdb("x", seed=7)
    return f"""
WITH d AS (
  SELECT doc_id, lang, (n_chars // {LEN_BUCKET})::INT AS lb,
         list_distinct(list_transform({_shingles_duck()}, x -> {hsh})) AS sh
  FROM documents
), s AS (SELECT *, len(sh) AS nsh FROM d)
SELECT a, b, jaccard FROM (
  SELECT l.doc_id AS a, r.doc_id AS b,
         round(len(list_intersect(l.sh, r.sh))::DOUBLE /
               (l.nsh + r.nsh - len(list_intersect(l.sh, r.sh))), 4) AS jaccard
  FROM s l JOIN s r
    ON l.lang = r.lang AND l.lb = r.lb AND l.doc_id < r.doc_id
   AND least(l.nsh, r.nsh) * 10 >= greatest(l.nsh, r.nsh) * 3
)
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# ------------------------------------------------- embedding cosine near-dup
COSINE_THRESHOLD = 0.9
IVF_K = 8  # centroids for the IVF-cell variant


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embedding pairs within the same label block (the
    blocking key stands in for an IVF cell at scale); cosine ≥ threshold.
    All math in double, summed left-to-right via F.aggregate."""
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    )
    l = e.select(F.col("vec_id").alias("a"), "label", F.col("v").alias("va"))
    r = e.select(F.col("vec_id").alias("b"), "label", F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    cos = F.round(dot / (na * nb), 3)
    return (
        l.join(r, "label")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= COSINE_THRESHOLD)
        .select("a", "b", "cos")
    )


EMBEDDING_NEARDUP_SQL = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT l.vec_id AS a, r.vec_id AS b,
       round(list_sum([l.v[i] * r.v[i] for i in range(1, len(l.v) + 1)]) /
             (sqrt(list_sum([x * x for x in l.v])) *
              sqrt(list_sum([x * x for x in r.v]))), 3) AS cos
FROM e l JOIN e r ON l.label = r.label AND l.vec_id < r.vec_id
WHERE round(list_sum([l.v[i] * r.v[i] for i in range(1, len(l.v) + 1)]) /
            (sqrt(list_sum([x * x for x in l.v])) *
             sqrt(list_sum([x * x for x in r.v]))), 3) >= {COSINE_THRESHOLD}
"""


def embedding_ivf_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned near-dup — the 100-TB shape the label-blocked
    variant stands in for: IVF_K deterministic seed centroids (the first
    K vectors), every vector assigned to its nearest centroid by cosine
    (rounded to 6 dp so both engines argmin identically; ties broken by
    centroid id), near-dup pairs computed ONLY within a cell. The cell id
    is the shuffle key at scale; the centroid table broadcasts."""
    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    cents = e.filter(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("vc")
    )

    def _cos(a: str, b: str):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
        nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
        return dot / (na * nb)

    assign = e.crossJoin(F.broadcast(cents)).withColumn(
        "cos_c", F.round(_cos("v", "vc"), 6)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), "cid")
    cells = (
        assign.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("vec_id", "v", "cid")
    )
    l = cells.select(F.col("vec_id").alias("a"), "cid", F.col("v").alias("va"))
    r = cells.select(F.col("vec_id").alias("b"), "cid", F.col("v").alias("vb"))
    return (
        l.join(r, "cid")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", F.round(_cos("va", "vb"), 3))
        .filter(F.col("cos") >= COSINE_THRESHOLD)
        .select("a", "b", "cos")
    )


_DUCK_COS = (
    "list_sum([{l}[i] * {r}[i] for i in range(1, len({l}) + 1)]) / "
    "(sqrt(list_sum([x * x for x in {l}])) * "
    "sqrt(list_sum([x * x for x in {r}])))"
)

EMBEDDING_IVF_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS vc FROM e WHERE vec_id < {IVF_K}),
a AS (
  SELECT e.vec_id, e.v, c.cid,
         round({_DUCK_COS.format(l='e.v', r='c.vc')}, 6) AS cos_c
  FROM e CROSS JOIN c
),
cells AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cos_c DESC, cid) AS rn
    FROM a
  ) WHERE rn = 1
)
SELECT a, b, cos FROM (
  SELECT l.vec_id AS a, r.vec_id AS b,
         round({_DUCK_COS.format(l='l.v', r='r.v')}, 3) AS cos
  FROM cells l JOIN cells r ON l.cid = r.cid AND l.vec_id < r.vec_id
)
WHERE cos >= {COSINE_THRESHOLD}
"""
