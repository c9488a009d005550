"""Distributed generalized suffix array + EXACT duplicated-substring
detection, by prefix doubling (Manber-Myers) — the exact counterpart of
the hashed-shingle approximation in ``textops/analysis.dup_spans``.

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") deduplicate exact substrings via a suffix array over the
concatenated corpus; their tooling is a single-node C++ builder. This is
the Spark-first restatement: the corpus never exists as one string —
it is a (gpos, char) table, and the suffix ORDER is refined over
``ceil(log2(maxlen))`` doubling rounds, each one equi-join (rank of
``gpos+2^k``) plus one tie-preserving two-phase global rank
(``operators/rank.with_global_tie_rank``). Round k orders suffixes by
their first 2^k characters; the loop EARLY-EXITS the moment all ranks
are distinct (i.e. after ~log2(longest repeat), not log2(corpus)).
Every round is localCheckpoint'ed (eager) so lineage stays flat — the
``neardup_clusters`` iterative pattern.

Scale contract (100 TB): each doubling round is a shuffle join + a
range-partitioned sort over |corpus| character rows — at 10^14 chars
that is ~40 global sorts, which is real but NOT the deployment shape.
Production runs this PER SHARD (a 10-100 GB corpus partition group
builds its own suffix array in parallel with every other shard, exactly
how Lee et al. shard their builder), with the cross-shard tail handled
by the hashed ``dup_spans`` pass; the registered demo therefore bounds
per-doc input to ``SA_DOC_PREFIX`` chars and REFUSES loudly past
``SA_MAX_CHARS`` total, like the exact-dedup operators it certifies.

Cross-engine exactness: the DuckDB oracle unrolls the identical
doubling recursion (rank() windows + self-joins) to a fixed
``SA_ORACLE_ROUNDS`` depth — extra rounds after ranks go distinct are
rank-preserving no-ops, so the early-exited Spark result matches the
fixed-depth oracle bit-for-bit. Both engines compare single characters
under binary UTF-8 collation and the sentinel chr(1) sorts below all
text characters.

Reference parity: the reference crawler (spider-core) has no
suffix-array pass; this operator extends the training-data dedup suite
(SURVEY.md "beyond the reference" section) alongside dup_spans
(same goal, hashed approximation) and the minhash family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_core_spark.operators.prefix import with_group_prefix_sum
from spider_core_spark.operators.rank import with_global_tie_rank
from spider_core_spark.textops.dedup import stage_handle

# Registered contract: the demo suffix array covers the first
# SA_DOC_PREFIX characters of every document (bounds doubling depth at
# any scale factor: longest possible repeat < SA_DOC_PREFIX); the
# operator itself takes the full text when doc_prefix=None.
SA_DOC_PREFIX = 256
SA_SENTINEL = "\x01"  # document separator; sorts below every text char
# refusal guard — one shard's worth of characters; beyond this, build
# per-shard arrays in parallel (module docstring scale contract)
SA_MAX_CHARS = 16_000_000
SA_TOPK = 4000  # registered suffix_array output bound (full SA is built)
SA_MINLEN = 25  # registered maxdup threshold (chars)
SA_LCP_CAP = 256  # reported dup_len cap == SA_DOC_PREFIX
# fixed oracle unroll depth: 2^21 > any sf's truncated corpus length
SA_ORACLE_ROUNDS = 21


def _sa_docs(
    spark: SparkSession, sf_dir: str, doc_prefix: int | None = SA_DOC_PREFIX
) -> DataFrame:
    """(doc_id, dt, t): truncated text and its sentinel-terminated form."""
    from spider_core_spark.sources.scan import read_parquet_spread

    docs = read_parquet_spread(spark, os.path.join(sf_dir, "documents.parquet"))
    dt = F.coalesce(F.col("text"), F.lit(""))
    if doc_prefix is not None:
        dt = F.substring(dt, 1, doc_prefix)
    return docs.select("doc_id", dt.alias("dt")).withColumn(
        "t", F.concat(F.col("dt"), F.lit(SA_SENTINEL))
    )


def _sa_offsets(docs_t: DataFrame) -> DataFrame:
    """(doc_id, t, off): global char offset of each doc under doc_id
    order, via the two-phase grouped prefix sum (never a corpus window)."""
    with_len = docs_t.select(
        "doc_id", "t", F.lit(0).alias("_g"), F.length("t").alias("_len")
    )
    offs, release = with_group_prefix_sum(
        with_len, ["_g"], ["doc_id"], "_len", "off"
    )
    stage_handle(release)
    return offs


def _sa_chars(
    spark: SparkSession, sf_dir: str, doc_prefix: int | None = SA_DOC_PREFIX
) -> tuple[DataFrame, DataFrame]:
    """(chars, docs_trunc): chars = one row per character of the
    sentinel-terminated corpus — (gpos, doc_id, loc, c) with gpos the
    global offset under doc_id order; docs_trunc = (doc_id, dt) the
    truncated text WITHOUT the sentinel (for LCP extraction). Offsets
    ride the two-phase grouped prefix sum, never a whole-corpus window.
    """
    docs_t = _sa_docs(spark, sf_dir, doc_prefix)
    offs = _sa_offsets(docs_t)
    chars = offs.select(
        "doc_id",
        "off",
        F.posexplode(F.split(F.col("t"), "")).alias("loc", "c"),
    ).select(
        (F.col("off") + F.col("loc")).cast("long").alias("gpos"),
        "doc_id",
        F.col("loc").cast("long").alias("loc"),
        "c",
    )
    return chars, docs_t.select("doc_id", "dt")


def suffix_ranks(
    chars: DataFrame, max_chars: int = SA_MAX_CHARS
) -> tuple[DataFrame, int]:
    """Prefix-doubling ranks: returns ((gpos, rnk), total) where rnk is
    the 1-based suffix-array rank (a permutation — all suffixes of a
    sentinel-terminated corpus are distinct). Each round's frame is an
    eager localCheckpoint registered with the textops staged-cache
    registry; callers drain with release_staged_caches() after their
    terminal action."""
    from spider_core_spark.operators.prefix import (  # checkpoint hygiene
        ReleaseHandle,
        _jrdd_handles,
        _persistent_ids,
    )

    spark = chars.sparkSession

    def _ckpt(df: DataFrame) -> DataFrame:
        ids0 = _persistent_ids(spark)
        out = df.localCheckpoint(eager=True)
        handles = _jrdd_handles(spark, _persistent_ids(spark) - ids0)
        stage_handle(ReleaseHandle(lambda: [h.unpersist() for h in handles]))
        return out

    ranked, total, rel = with_global_tie_rank(
        chars.select("gpos", "c"), ["c"], "rnk", defer=True
    )
    if total > max_chars:
        rel()
        raise ValueError(
            f"suffix_ranks: corpus is {total} chars > max_chars="
            f"{max_chars}; a single global suffix array past one shard's "
            f"worth of characters is the wrong deployment shape — build "
            f"per-shard arrays in parallel (module docstring) or raise "
            f"max_chars explicitly"
        )
    cur = _ckpt(ranked.select("gpos", "rnk"))
    rel()

    k = 1
    while k <= total:
        n_distinct = cur.agg(
            F.countDistinct("rnk").alias("d")
        ).first()["d"]
        if n_distinct >= total:
            break
        shifted = cur.select(
            (F.col("gpos") - k).alias("gpos"), F.col("rnk").alias("rnk2")
        )
        joined = cur.join(shifted, "gpos", "left").fillna({"rnk2": 0})
        # total is constant across rounds and _ckpt materializes the
        # output immediately — defer skips the rank's own count +
        # persist jobs (~2 of the ~5 jobs in a round)
        ranked, _, rel = with_global_tie_rank(
            joined, ["rnk", "rnk2"], "nrnk", total=total, defer=True
        )
        cur = _ckpt(ranked.select("gpos", F.col("nrnk").alias("rnk")))
        rel()
        k *= 2
    return cur, total


def _doc_chain_next_rank(docs_t: DataFrame) -> DataFrame:
    """(doc_id, nr): rank of the NEXT document's start suffix among all
    document-start suffixes of the concatenated corpus (0 for the last
    document) — the cross-document tie-break for bounded in-document
    suffixes (see suffix_array).

    Computed by prefix doubling over the DOCUMENT sequence, treating each
    sentinel-terminated doc string as one meta-character: the strings are
    prefix-free (the sentinel appears only at the end), so plain string
    order on ``t`` is the correct meta-character order, and the standard
    doubling recursion over doc indices (missing continuation ranks 0 —
    a chain that ends is a proper prefix of any equal-prefix continuation)
    yields the chain order. Every round touches n_docs rows, not corpus
    chars, so this costs ~nothing next to the one character-level rank."""
    from spider_core_spark.operators.prefix import (
        ReleaseHandle,
        _jrdd_handles,
        _persistent_ids,
    )
    from spider_core_spark.operators.rank import with_global_rank

    spark = docs_t.sparkSession

    def _ckpt(df: DataFrame) -> DataFrame:
        # eager localCheckpoint per round (the suffix_ranks pattern): a
        # doubling loop whose rounds reference the previous round TWICE
        # (self-join on i + 2^k) grows the LOGICAL plan 2^rounds without a
        # lineage break — ~16 rounds on a dup-heavy corpus stalls the
        # driver in plan analysis before a single task runs (guide §7.3)
        ids0 = _persistent_ids(spark)
        out = df.localCheckpoint(eager=True)
        handles = _jrdd_handles(spark, _persistent_ids(spark) - ids0)
        stage_handle(ReleaseHandle(lambda: [h.unpersist() for h in handles]))
        return out

    base = docs_t.select("doc_id", "t")
    idx, n_docs = with_global_rank(base, ["doc_id"], "i")
    stage_handle(ReleaseHandle(idx.unpersist))
    ranked, _, rel = with_global_tie_rank(
        idx.select("i", "t"), ["t"], "rnk", total=n_docs, defer=True
    )
    cur = _ckpt(ranked.select("i", "rnk"))
    rel()
    k = 1
    while k <= n_docs:
        nd = cur.agg(F.countDistinct("rnk").alias("d")).first()["d"]
        if nd >= n_docs:
            break
        shifted = cur.select(
            (F.col("i") - k).alias("i"), F.col("rnk").alias("rnk2")
        )
        joined = cur.join(shifted, "i", "left").fillna({"rnk2": 0})
        nxt, _, rel = with_global_tie_rank(
            joined, ["rnk", "rnk2"], "nrnk", total=n_docs, defer=True
        )
        cur = _ckpt(nxt.select("i", F.col("nrnk").alias("rnk")))
        rel()
        k *= 2
    nxt_rank = cur.select((F.col("i") - 1).alias("i"), F.col("rnk").alias("nr"))
    return (
        idx.select("doc_id", "i")
        .join(nxt_rank, "i", "left")
        .fillna({"nr": 0})
        .select("doc_id", "nr")
    )


def _sa_suffixes(
    spark: SparkSession,
    sf_dir: str,
    doc_prefix: int | None = SA_DOC_PREFIX,
    max_chars: int = SA_MAX_CHARS,
) -> tuple[DataFrame, int]:
    """(sufs, total): one row per suffix of the sentinel-terminated
    corpus — (gpos, doc_id, loc, s, nr) with ``s`` the IN-DOCUMENT suffix
    including its trailing sentinel and ``nr`` the next document's chain
    rank. Refuses past ``max_chars`` exactly like suffix_ranks."""
    docs_t = _sa_docs(spark, sf_dir, doc_prefix)
    total = int(
        docs_t.agg(F.sum(F.length("t")).alias("n")).first()["n"] or 0
    )
    if total > max_chars:
        raise ValueError(
            f"suffix_ranks: corpus is {total} chars > max_chars="
            f"{max_chars}; a single global suffix array past one shard's "
            f"worth of characters is the wrong deployment shape — build "
            f"per-shard arrays in parallel (module docstring) or raise "
            f"max_chars explicitly"
        )
    nr = _doc_chain_next_rank(docs_t)
    offs = _sa_offsets(docs_t)
    sufs = (
        offs.select(
            "doc_id",
            "off",
            "t",
            F.explode(F.expr("sequence(0, length(t) - 1)")).alias("loc"),
        )
        .select(
            (F.col("off") + F.col("loc")).cast("long").alias("gpos"),
            "doc_id",
            F.col("loc").cast("long").alias("loc"),
            F.expr("substring(t, loc + 1)").alias("s"),
        )
        .join(F.broadcast(nr), "doc_id")
    )
    return sufs, total


def _sa_ranked(
    spark: SparkSession, sf_dir: str, defer: bool
) -> DataFrame:
    """Suffix-array ranks over the bounded-suffix frame: ONE global
    tie-rank by (s, nr) instead of ~log2(longest repeat) prefix-doubling
    rounds (each a corpus-wide join + global rank).

    Why this is the same permutation the doubling recursion (and the
    DuckDB oracle's unrolled form) produces: every in-document suffix
    reaches its own sentinel within doc_prefix+1 chars, and the
    sentinel-terminated strings are prefix-free, so comparing two corpus
    suffixes first compares their bounded ``s`` strings; if those are
    EQUAL the comparison continues exactly at the start of each one's
    next document — i.e. by the chain rank ``nr``. Distinct suffixes
    always differ in (s, nr): equal s with d1 ≠ d2 forces different
    next-chains (chains from different start docs have different total
    lengths, so they differ as strings), and within one document two
    locs give different-length prefix-free s. Hence rank(s, nr) is a
    1..total permutation equal to the character-level doubling result."""
    from spider_core_spark.operators.prefix import ReleaseHandle

    sufs, total = _sa_suffixes(spark, sf_dir)
    ranked, _, rel = with_global_tie_rank(
        sufs, ["s", "nr"], "rnk", total=total, defer=defer
    )
    stage_handle(ReleaseHandle(rel))
    return ranked


def suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered: the first SA_TOPK entries of the generalized suffix
    array over documents (per-doc SA_DOC_PREFIX-char prefixes, sentinel
    separated) — (sa_rank, gpos, doc_id, loc). The FULL array is built;
    only the returned slice is bounded. Ranks come from the one-shot
    bounded-suffix order (_sa_ranked); the prefix-doubling builder
    (suffix_ranks) remains the general-corpus path and the parity
    reference (tests/test_suffixes.py pins both against brute force)."""
    ranked = _sa_ranked(spark, sf_dir, defer=True)
    return ranked.filter(F.col("rnk") <= SA_TOPK).select(
        F.col("rnk").cast("long").alias("sa_rank"),
        "gpos",
        "doc_id",
        "loc",
    )


def _lcp_col(s_a, s_b):
    """Exact common-prefix length of two (already CAP-bounded) strings,
    pure Catalyst: zip_with the char arrays to a boolean equality array
    (null padding coalesces to False), array_position finds the first
    mismatch; 0 = no mismatch = the shorter string is a prefix."""
    eq = F.zip_with(
        F.split(s_a, ""),
        F.split(s_b, ""),
        lambda x, y: F.coalesce(x == y, F.lit(False)),
    )
    first_bad = F.array_position(eq, F.lit(False))
    return F.when(
        first_bad == 0, F.least(F.length(s_a), F.length(s_b))
    ).otherwise(first_bad - 1)


def suffix_maxdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered: exact duplicated substrings ≥ SA_MINLEN chars between
    (and within) documents, from adjacent suffix-array entries — any
    repeated substring of length L makes some SA-adjacent pair share an
    L-char prefix, so adjacent-pair LCP finds them ALL. Output is per
    unordered doc pair: (doc_lo, doc_hi, max_dup_len, n_positions);
    dup_len is capped at SA_LCP_CAP (== the registered doc prefix) and
    truncates at document boundaries because LCP is computed on the
    sentinel-free truncated texts."""
    from spider_core_spark.textops.dedup import _stage

    # the ranked frame already carries each suffix's bounded text ``s``
    # (sentinel-terminated); stripping the sentinel yields exactly
    # substring(dt, loc + 1, SA_LCP_CAP) — the two joins back to the
    # documents table that the doubling-era shape needed are gone.
    # defer=True + a NARROW staged persist: the self-join below reads the
    # ranked frame twice, but only (rnk, doc_id, stripped s) — caching
    # the projection instead of the full frame (guide §2.3 project before
    # the exchange) keeps gpos/loc/nr out of both the cache and the
    # rnk shuffle
    ranked = _sa_ranked(spark, sf_dir, defer=True)
    strip = F.expr("substring(s, 1, length(s) - 1)")
    sa = _stage(ranked.select("rnk", "doc_id", strip.alias("sd")))
    a = sa.select(
        "rnk",
        F.col("doc_id").alias("doc_a"),
        F.col("sd").alias("s_a"),
    )
    b = sa.select(
        (F.col("rnk") - 1).alias("rnk"),
        F.col("doc_id").alias("doc_b"),
        F.col("sd").alias("s_b"),
    )
    # exact prefilter before the expensive char-array LCP: dup_len ≥
    # SA_MINLEN ⟺ s_a is ≥ SA_MINLEN chars AND the two SA_MINLEN-char
    # prefixes are equal (a plain string comparison), so the zip_with
    # LCP below runs only on pairs that WILL be reported — a tiny
    # fraction of the |corpus| adjacent pairs — instead of all of them
    same_prefix = (F.length("s_a") >= SA_MINLEN) & (
        F.substring("s_a", 1, SA_MINLEN) == F.substring("s_b", 1, SA_MINLEN)
    )
    pairs = (
        a.join(b, "rnk")
        .filter(same_prefix)
        .select("doc_a", "doc_b", "s_a", "s_b")
    )
    scored = pairs.select(
        "doc_a", "doc_b", _lcp_col(F.col("s_a"), F.col("s_b")).alias("dup_len")
    ).filter(F.col("dup_len") >= SA_MINLEN)
    return scored.groupBy(
        F.least("doc_a", "doc_b").alias("doc_lo"),
        F.greatest("doc_a", "doc_b").alias("doc_hi"),
    ).agg(
        F.max("dup_len").cast("long").alias("max_dup_len"),
        F.count("*").cast("long").alias("n_positions"),
    )


# ------------------------------------------------------------ oracle SQL


def _sa_cte(rounds: int = SA_ORACLE_ROUNDS) -> str:
    """The doubling recursion, unrolled: r0 ranks by the first char,
    r{j+1} ranks by (rank of first 2^j chars, rank of the next 2^j).
    Extra rounds past all-distinct are rank-preserving no-ops, matching
    Spark's early exit."""
    parts = [
        f"""docs AS MATERIALIZED (
  SELECT doc_id,
         substr(coalesce(text, ''), 1, {SA_DOC_PREFIX}) || chr(1) AS t
  FROM documents
), offs AS (
  SELECT doc_id, t,
         coalesce(sum(length(t)) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS off
  FROM docs
), chars AS MATERIALIZED (
  SELECT (off + i)::BIGINT AS gpos, doc_id, i::BIGINT AS loc,
         substr(t, (i + 1)::INT, 1) AS c
  FROM (SELECT doc_id, t, off, unnest(range(length(t))) AS i FROM offs)
), r0 AS MATERIALIZED (
  SELECT gpos, rank() OVER (ORDER BY c) AS rnk FROM chars
)"""
    ]
    # MATERIALIZED is load-bearing: each round references the previous
    # one twice (self-join on gpos+2^j); inlined CTEs would re-derive the
    # whole prefix chain per reference (measured 5.5 s/round vs 0.1 s).
    for j in range(rounds):
        parts.append(
            f""", r{j + 1} AS MATERIALIZED (
  SELECT a.gpos, rank() OVER (ORDER BY a.rnk, coalesce(b.rnk, 0)) AS rnk
  FROM r{j} a LEFT JOIN r{j} b ON b.gpos = a.gpos + {2 ** j})"""
        )
    return "WITH " + "".join(parts)


def suffix_array_sql(rounds: int = SA_ORACLE_ROUNDS) -> str:
    return f"""{_sa_cte(rounds)}
SELECT r.rnk::BIGINT AS sa_rank, c.gpos, c.doc_id, c.loc
FROM r{rounds} r JOIN chars c USING (gpos)
WHERE r.rnk <= {SA_TOPK}
"""


def suffix_maxdup_sql(rounds: int = SA_ORACLE_ROUNDS) -> str:
    return f"""{_sa_cte(rounds)}
, sa AS MATERIALIZED (
  SELECT r.rnk, c.doc_id, c.loc
  FROM r{rounds} r JOIN chars c USING (gpos)
), txt AS (
  SELECT doc_id, substr(coalesce(text, ''), 1, {SA_DOC_PREFIX}) AS dt
  FROM documents
), pairs AS (
  SELECT substr(ta.dt, (a.loc + 1)::INT, {SA_LCP_CAP}) AS s_a,
         substr(tb.dt, (b.loc + 1)::INT, {SA_LCP_CAP}) AS s_b,
         a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sa a JOIN sa b ON b.rnk = a.rnk + 1
       JOIN txt ta ON ta.doc_id = a.doc_id
       JOIN txt tb ON tb.doc_id = b.doc_id
), scored AS (
  SELECT doc_a, doc_b,
         coalesce((SELECT min(i) - 1 FROM generate_series(1, {SA_LCP_CAP}) g(i)
                   WHERE substr(s_a, i::INT, 1) <> substr(s_b, i::INT, 1)),
                  least(length(s_a), length(s_b))) AS dup_len
  FROM pairs
)
SELECT least(doc_a, doc_b) AS doc_lo, greatest(doc_a, doc_b) AS doc_hi,
       max(dup_len)::BIGINT AS max_dup_len, count(*)::BIGINT AS n_positions
FROM scored
WHERE dup_len >= {SA_MINLEN}
GROUP BY 1, 2
"""
