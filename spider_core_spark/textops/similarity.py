"""Similarity search over an embedding column (array<float>):

- brute-force cosine top-k — the exact baseline; a broadcast of the (few)
  query vectors against a full scan of the corpus, linear not quadratic;
- LSH-bucketed ANN — random-hyperplane signatures turn the scan into an
  equi-join on bucket id; at 100 TB the bucket id becomes the partition
  key so each query only touches its cell (IVF-style scale path).

All floating-point math is cast to double and rounded before any ordering
or threshold decision, so the Spark plan and the DuckDB oracle make
identical decisions.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TOP_K = 10
N_QUERIES = 3  # vec_id < 3 act as the query set
N_PLANES = 6
DIM = 64

# deterministic random hyperplanes, inlined identically into the Spark plan
# and the oracle SQL (4-decimal literals so both engines parse the same
# doubles)
_rng = random.Random(20240816)
PLANES: list[list[float]] = [
    [round(_rng.gauss(0, 1), 4) for _ in range(DIM)] for _ in range(N_PLANES)
]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spider_core_spark.sources.scan import read_parquet_spread

    return read_parquet_spread(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


def _cos(va, vb):
    dot = F.aggregate(F.zip_with(va, vb, lambda x, y: x * y), F.lit(0.0),
                      lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(va, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(vb, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.round(dot / (na * nb), 6)


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors for the query vectors: crossJoin(broadcast
    queries) — O(Q·N), one corpus scan, no shuffle of the corpus."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _cos(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


ANN_BRUTEFORCE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_sum([q.qv[i] * e.v[i] for i in range(1, len(e.v) + 1)]) /
               (sqrt(list_sum([x * x for x in q.qv])) *
                sqrt(list_sum([x * x for x in e.v]))), 6) AS cos
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id AS neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


def _bucket_spark(vcol) -> F.Column:
    bit_terms = None
    for j, plane in enumerate(PLANES):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vcol, arr, lambda a, b: a * b), F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bit_terms = bit if bit_terms is None else bit_terms + bit
    return bit_terms.cast("int")


def _bucket_duck(vexpr: str) -> str:
    terms = []
    for j, plane in enumerate(PLANES):
        lits = "[" + ", ".join(f"{x}::DOUBLE" for x in plane) + "]"
        dot = f"list_sum([({vexpr})[i] * ({lits})[i] for i in range(1, {DIM} + 1)])"
        terms.append(f"(case when {dot} >= 0 then {1 << j} else 0 end)")
    return "(" + " + ".join(terms) + ")::INT"


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: candidates share the query's bucket;
    top-k by cosine within the bucket. Approximate by construction —
    the oracle implements the identical approximation."""
    e = _emb(spark, sf_dir).withColumn("bucket", _bucket_spark(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _cos(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


def ann_lsh_sql() -> str:
    b = _bucket_duck("v")
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {b} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_sum([q.qv[i] * e.v[i] for i in range(1, len(e.v) + 1)]) /
               (sqrt(list_sum([x * x for x in q.qv])) *
                sqrt(list_sum([x * x for x in e.v]))), 6) AS cos
  FROM e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id AS neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


# ------------------------------------------------------------------- IVF
IVF_K_ANN = 8  # default seed-centroid count — matches the sf0.01 oracle
NPROBE = 2     # default cells probed per query


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int | None = IVF_K_ANN,
    nprobe: int = NPROBE,
) -> DataFrame:
    """IVF ANN: corpus vectors assigned to their nearest of k seed
    centroids (6-dp rounded cosine, centroid-id tiebreak); each query
    probes its nprobe nearest cells and ranks candidates by exact cosine.
    At 100 TB the cell id partitions the corpus — a query touches only
    nprobe/k of the data; the centroid table broadcasts.

    ``k=None`` auto-sizes K ≈ √N (textops.dedup.ivf_k_for): cell size
    N/K ≈ √N keeps per-query scanned vectors at nprobe·√N instead of
    nprobe·N/8; the defaults exist for the fixed sf0.01 oracle."""
    from spider_core_spark.textops.dedup import ivf_k_for

    e = _emb(spark, sf_dir)
    if k is None:
        k = ivf_k_for(e.count())
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    from spider_core_spark.textops.dedup import _stage

    scored_cells = e.crossJoin(F.broadcast(cents)).withColumn(
        "cc", _cos(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cc"), "cid")
    # staged (caller releases): referenced twice below (cells + probes) —
    # without the persist the N×K cosine cross product runs twice
    ranked = _stage(scored_cells.withColumn("crank", F.row_number().over(w)))
    cells = ranked.filter(F.col("crank") == 1).select("vec_id", "v", "cid")
    probes = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crank") <= nprobe)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cid")
    scored = (
        cells.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _cos(F.col("qv"), F.col("v")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos", "rank")
    )


def ann_ivf_sql(k: int | None = IVF_K_ANN, nprobe: int = NPROBE) -> str:
    """Oracle for ann_ivf_topk at the same (k, nprobe). ``k=None``
    mirrors the Spark auto-√N sizing with a scalar subquery, so one
    registered query is correctly sized at every scale factor."""
    if k is None:
        k = (
            f"(SELECT greatest({IVF_K_ANN}, floor(sqrt(count(*)))::BIGINT) "
            f"FROM embeddings)"
        )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {k}),
sc AS (
  SELECT e.vec_id, e.v, c.cid,
         round(list_sum([e.v[i] * c.cv[i] for i in range(1, len(e.v) + 1)]) /
               (sqrt(list_sum([x * x for x in e.v])) *
                sqrt(list_sum([x * x for x in c.cv]))), 6) AS cc
  FROM e CROSS JOIN c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cc DESC, cid) AS crank
  FROM sc
),
cells AS (SELECT vec_id, v, cid FROM ranked WHERE crank = 1),
probes AS (
  SELECT vec_id AS query_id, v AS qv, cid
  FROM ranked WHERE vec_id < {N_QUERIES} AND crank <= {nprobe}
),
scored AS (
  SELECT p.query_id, cells.vec_id,
         round(list_sum([p.qv[i] * cells.v[i]
                         for i in range(1, len(cells.v) + 1)]) /
               (sqrt(list_sum([x * x for x in p.qv])) *
                sqrt(list_sum([x * x for x in cells.v]))), 6) AS cos
  FROM cells JOIN probes p USING (cid)
  WHERE cells.vec_id <> p.query_id
)
SELECT query_id, vec_id AS neighbor_id, cos,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, vec_id ASC) AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


ANN_IVF_SQL = ann_ivf_sql()  # default-(k, nprobe) oracle (sf0.01 gate)


# ------------------------------------------------ int8-quantized ANN top-k
# Scalar quantization for similarity search at 100 TB: embeddings are
# stored/scanned as int8 codes (4x smaller than float32 — the scan is
# memory-bandwidth-bound, so that is ~4x throughput) with one
# per-vector scale (symmetric max-abs quantization, the faiss
# ScalarQuantizer QT_8bit recipe); candidate scoring is an EXACT INT64
# dot product of the codes (deterministic — no FP accumulation order
# hazard), and only the final cosine normalization touches doubles
# (correctly-rounded IEEE division/sqrt of exact integers, identical in
# both engines). The registered query reports the quantized cosine AND
# the exact float cosine side by side, so the oracle certifies the
# quantization error observed at this fixture, not just the ranking.
INT8_SCALE = 127


def _quantize(vcol):
    s = F.array_max(F.transform(vcol, lambda x: F.abs(x)))
    q = F.transform(
        vcol, lambda x: F.round(F.lit(float(INT8_SCALE)) * x / s).cast("long")
    )
    return F.when(s == 0.0, F.transform(vcol, lambda x: F.lit(0).cast("long"))).otherwise(q)


def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by int8-quantized cosine (exact-int dot product), with the
    float cosine alongside. Same broadcast-queries/one-scan shape as the
    brute-force baseline; at scale the corpus scan reads the int8 code
    column instead of float32 (4x less IO) and the code dot product is
    integer SIMD on the JVM."""
    e = _emb(spark, sf_dir).withColumn("q8", _quantize(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("q8").alias("qq8"),
    )
    dot = F.aggregate(
        F.zip_with("qq8", "q8", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "qcos",
            F.round(
                dot
                / (F.sqrt(nq(F.col("qq8"))) * F.sqrt(nq(F.col("q8")))),
                6,
            ),
        )
        .withColumn("cos", _cos(F.col("qv"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "qcos",
            "cos",
            F.col("rank").cast("long").alias("rank"),
        )
    )


ANN_INT8_SQL = f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (
  SELECT vec_id, v,
         CASE WHEN list_max([abs(x) for x in v]) = 0
              THEN [0::BIGINT for x in v]
              ELSE [round({INT8_SCALE} * x / list_max([abs(y) for y in v]))::BIGINT
                    for x in v]
         END AS q8
  FROM e0
),
q AS (SELECT vec_id AS query_id, v AS qv, q8 AS qq8 FROM e
      WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_sum([q.qq8[i] * e.q8[i] for i in range(1, len(e.q8) + 1)]) /
               (sqrt(list_sum([x * x for x in q.qq8])) *
                sqrt(list_sum([x * x for x in e.q8]))), 6) AS qcos,
         round(list_sum([q.qv[i] * e.v[i] for i in range(1, len(e.v) + 1)]) /
               (sqrt(list_sum([x * x for x in q.qv])) *
                sqrt(list_sum([x * x for x in e.v]))), 6) AS cos
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id AS neighbor_id, qcos, cos,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY qcos DESC, vec_id ASC)::BIGINT AS rank
FROM scored
QUALIFY rank <= {TOP_K}
"""


# ------------------------------------------------- product quantization
# Faiss-style PQ (Jégou, Douze & Schmid 2011, "Product quantization for
# nearest neighbor search"): split each vector into M subvectors, train
# a K-codeword codebook per subspace (the integer-Lloyd machinery from
# textops/semantic.py, reused verbatim on the sliced frames), encode
# every vector as M small codes (M·log2(K) bits — 12 bits/vector here vs
# 512 bytes of doubles), and answer queries by ADC: per query, a tiny
# (M × K) lookup table of exact integer subspace distances, so scoring a
# candidate is M integer adds instead of a dim-wide dot product.
#
# All arithmetic after the one quantization step is exact int64 (the
# semantic.py contract), so the unrolled DuckDB oracle matches
# bit-for-bit — including the training iterations.
#
# Scale (10^10 vectors): training shuffles O(K·dim) rows per iteration
# (map-side-combinable update, broadcast-literal assign); ENCODE is M
# narrow zero-shuffle map passes unioned in long form (no self-joins);
# scoring joins the broadcast (NQ·M·K)-row LUT against the code stream
# and reduces with one combinable groupBy(query_id, vec_id). The code
# table is the artifact a deployment persists: 12 bits/vector instead of
# the raw embeddings.
PQ_M = 8          # subspaces
PQ_SUB = 8        # dims per subspace (M × SUB = 64)
PQ_K = 16         # codewords per subspace
PQ_ITERS = 1      # Lloyd rounds per codebook (oracle unrolls the same)


def _pq_cdf(spark: SparkSession, cents: dict[int, list[tuple[int, list[int]]]]) -> DataFrame:
    """All M subspace codebooks as one tiny (M·K)-row DataFrame."""
    rows = [
        (int(m), int(cid), [int(x) for x in qc])
        for m in sorted(cents)
        for cid, qc in cents[m]
    ]
    return spark.createDataFrame(rows, "m long, pq_cid long, qc array<bigint>")


def _pq_encode(
    sub: DataFrame,
    cents: dict[int, list[tuple[int, list[int]]]],
    keys: list[str],
    keep_sv: bool = False,
) -> DataFrame:
    """Per-(vec, subspace) argmin code: broadcast-join the (M·K)-row
    codebook table on ``m`` and reduce with a combinable
    min(struct(qdist, pq_cid)) — identical exact integer squared-L2 and
    cid tiebreak as the former nested-literal argmin (struct ordering is
    lexicographic), but the plan carries a constant-size expression, so
    driver analysis/codegen no longer scales with M·K·dim (the literal
    form spent more time compiling than executing)."""
    spark = sub.sparkSession
    qd = F.aggregate(
        F.zip_with("sv", "qc", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    aggs = [
        F.min(F.struct(qd.alias("qdist"), F.col("pq_cid").alias("pq_cid"))).alias(
            "best"
        )
    ]
    if keep_sv:
        # sv is functionally dependent on the group key — first() is
        # deterministic in value
        aggs.append(F.first("sv").alias("sv"))
    out = (
        sub.join(F.broadcast(_pq_cdf(spark, cents)), "m")
        .groupBy(*keys, "m")
        .agg(*aggs)
    )
    cols = [*keys, "m", F.col("best.pq_cid").alias("code")]
    if keep_sv:
        cols.append(F.col("sv"))
    return out.select(*cols)


def _pq_subspaces(frame: DataFrame, vec_col: str, carry: list[str]) -> DataFrame:
    """Long form: one row per (vec_id, subspace) with ``sv`` = the
    subvector — every training/encode pass handles ALL M subspaces in
    one job. ``carry`` columns ride along (e.g. the coarse cell id)."""
    return frame.select(
        *carry,
        F.posexplode(
            F.array(
                *[
                    F.slice(vec_col, m * PQ_SUB + 1, PQ_SUB)
                    for m in range(PQ_M)
                ]
            )
        ).alias("m", "sv"),
    ).select(*carry, F.col("m").cast("long").alias("m"), "sv")


def _pq_train(sub: DataFrame) -> dict[int, list[tuple[int, list[int]]]]:
    """Train the M per-subspace codebooks over a (vec_id, m, sv) frame:
    deterministic seeds (vec_id < PQ_K) + PQ_ITERS exact integer-Lloyd
    rounds (one combinable shuffle + one O(M·K·dim) collect per round —
    the semantic.py contract, so the unrolled oracle matches bit-for-bit)."""
    seed_rows = (
        sub.filter(F.col("vec_id") < PQ_K)
        .orderBy("m", "vec_id")
        .collect()
    )
    cents: dict[int, list[tuple[int, list[int]]]] = {}
    for r in seed_rows:
        cents.setdefault(int(r["m"]), []).append(
            (int(r["vec_id"]), [int(x) for x in r["sv"]])
        )
    for _ in range(PQ_ITERS):
        assigned = _pq_encode(sub, cents, ["vec_id"], keep_sv=True).select(
            "m", F.col("code").alias("cid"), "sv"
        )
        upd = (  # ONE combinable shuffle + ONE collect for all subspaces
            assigned.select("m", "cid", F.posexplode("sv").alias("idx", "q"))
            .groupBy("m", "cid", "idx")
            .agg(F.sum("q").alias("s"), F.count("*").alias("c"))
            .withColumn("mv", F.expr("(s - pmod(s, c)) div c"))
            .groupBy("m", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "mv"))),
                    lambda st: st["mv"],
                ).alias("qc")
            )
            .collect()
        )
        cents = {}
        for r in upd:
            cents.setdefault(int(r["m"]), []).append(
                (int(r["cid"]), [int(x) for x in r["qc"]])
            )
        for m in cents:
            cents[m].sort()
    return cents


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXHAUSTIVE ADC: every query scores ALL N codes — the compression
    win (12 bits/vector) is real but the scan is still linear in N. The
    sub-linear deployment recipe is ``ann_ivfpq_topk`` below (IVF coarse
    cells prune the candidate set to ~nprobe/KC of the corpus, then the
    same ADC machinery scores only the probed cells' codes)."""
    from spider_core_spark.textops.dedup import _stage
    from spider_core_spark.textops.semantic import _QV_SPARK

    # staged caches (caller releases): training makes 2+ driver collects
    # and the final scoring action another pass — persisting the tiny
    # quantized frame and its subspace long form stops every one of them
    # re-deriving the scan + quantize + posexplode lineage (guide §5)
    e = _stage(
        _emb(spark, sf_dir)
        .select("vec_id", "v")
        .withColumn("qv", F.expr(_QV_SPARK))
        .select("vec_id", "qv")
    )
    sub = _stage(_pq_subspaces(e, "qv", ["vec_id"]))
    cents = _pq_train(sub)
    codes = _pq_encode(sub, cents, ["vec_id"])
    q_rows = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]])
        for r in e.filter(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id")
        .collect()
    ]
    lut_rows = []
    for qid, qv in q_rows:
        for m in range(PQ_M):
            qsub = qv[m * PQ_SUB : (m + 1) * PQ_SUB]
            for cid, qc in cents[m]:
                d = sum((a - b) * (a - b) for a, b in zip(qsub, qc))
                lut_rows.append((qid, m, int(cid), int(d)))
    lut = spark.createDataFrame(
        lut_rows, "query_id long, m long, code long, d long"
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("long").alias("qdist"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("qdist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qdist", "rank")
    )


def ann_pq_sql() -> str:
    from spider_core_spark.textops.semantic import _QV_DUCK

    qd_sub = (
        "CAST(list_sum([(q.qv[i] - c.qc[i]) * (q.qv[i] - c.qc[i]) "
        f"for i in range(1, {PQ_SUB} + 1)]) AS BIGINT)"
    )
    parts = [f"qq AS (SELECT vec_id, {_QV_DUCK} AS qv FROM embeddings)"]
    code_union = []
    lut_union = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        parts.append(
            f"qm{m} AS (SELECT vec_id, qv[{lo}:{hi}] AS qv FROM qq)"
        )
        parts.append(
            f"c0_{m} AS (SELECT vec_id AS cid, qv AS qc FROM qm{m} "
            f"WHERE vec_id < {PQ_K})"
        )
        prev = f"c0_{m}"
        for i in range(PQ_ITERS):
            parts.append(
                f"""a{i}_{m} AS (
  SELECT vec_id, qv, cid FROM (
    SELECT q.vec_id, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {qd_sub}, c.cid) AS rn
    FROM qm{m} q CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
            )
            parts.append(
                f"""c{i + 1}_{m} AS (
  SELECT cid, list(mv ORDER BY idx) AS qc FROM (
    SELECT cid, idx, (s - ((s % c + c) % c)) // c AS mv
    FROM (SELECT cid, idx, CAST(sum(qe) AS BIGINT) AS s, count(*) AS c
          FROM (SELECT cid, generate_subscripts(qv, 1) AS idx,
                       unnest(qv) AS qe FROM a{i}_{m})
          GROUP BY cid, idx)
  ) GROUP BY cid
)"""
            )
            prev = f"c{i + 1}_{m}"
        parts.append(
            f"""code{m} AS (
  SELECT vec_id, {m} AS m, cid AS code FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {qd_sub}, c.cid) AS rn
    FROM qm{m} q CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
        )
        code_union.append(f"SELECT * FROM code{m}")
        lut_union.append(
            f"SELECT q.vec_id AS query_id, {m} AS m, c.cid AS code, "
            f"{qd_sub} AS d FROM qm{m} q CROSS JOIN {prev} c "
            f"WHERE q.vec_id < {N_QUERIES}"
        )
    parts.append("codes AS (" + " UNION ALL ".join(code_union) + ")")
    parts.append("lut AS (" + " UNION ALL ".join(lut_union) + ")")
    joined = ",\n".join(parts)
    return f"""
WITH {joined},
scored AS (
  SELECT l.query_id, cd.vec_id, CAST(sum(l.d) AS BIGINT) AS qdist
  FROM codes cd JOIN lut l USING (m, code)
  GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, qdist,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY qdist ASC, vec_id ASC)::BIGINT AS rank
FROM scored
WHERE vec_id <> query_id
QUALIFY rank <= {TOP_K}
"""


# ------------------------------------------- IVF + PQ composition (IVFADC)
# The billion-scale ANN deployment recipe (Jégou, Douze & Schmid 2011,
# §IV "IVFADC"): a coarse quantizer prunes the corpus to the query's
# nprobe nearest cells, and PQ codes trained on the RESIDUAL (vector −
# its coarse centroid) score only those cells' candidates via the ADC
# lookup table. Composes the two oracled halves that already exist —
# the IVF cell shape of ann_ivf_topk and the _pq_train/_pq_encode ADC
# machinery of ann_pq_topk — so a query touches ~nprobe/KC of the code
# stream instead of all N (ann_pq_topk's exhaustive contract).
#
# All arithmetic after the one quantization step is exact int64
# (coarse assign = integer squared-L2 argmin with cid tiebreak, residual
# = integer subtraction, codebooks = integer-Lloyd, ADC = integer adds),
# so the unrolled DuckDB oracle matches bit-for-bit.
#
# Scale (10^10 vectors): coarse assignment is a narrow broadcast-literal
# map (zero shuffle); residual PQ training shuffles O(M·K·dim) rows per
# round; the probe LUT is NQ·nprobe·M·K driver rows (broadcast); scoring
# joins the LUT against only the probed cells' codes — partition the
# code table by cid and the probe join prunes partitions.
IVFPQ_KC = 8      # coarse cells (fixed oracle size; cells ≈ N/KC)
IVFPQ_NPROBE = 2  # coarse cells probed per query


def ann_ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    kc: int = IVFPQ_KC,
    nprobe: int = IVFPQ_NPROBE,
) -> DataFrame:
    from spider_core_spark.textops.dedup import _stage
    from spider_core_spark.textops.semantic import _QV_SPARK, _cents_df, _qdist_col

    # staged caches (caller releases) — same rationale as ann_pq_topk:
    # coarse-seed collect, PQ training collects, query collect and the
    # final ADC action all reuse one materialization each of the
    # quantized frame and the residual subspace long form
    e = _stage(
        _emb(spark, sf_dir)
        .select("vec_id", "v")
        .withColumn("qv", F.expr(_QV_SPARK))
        .select("vec_id", "qv")
    )
    # coarse codebook: deterministic seed centroids (the IVF operators'
    # contract), tiny driver state KC×dim
    coarse = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]])
        for r in e.filter(F.col("vec_id") < kc).orderBy("vec_id").collect()
    ]
    # coarse assign + integer residual via a broadcast cross join + one
    # combinable min(struct(qdist, cid, qc)) — same exact-int argmin and
    # cid tiebreak as the former broadcast-literal map ((qdist, cid) is
    # unique, so the carried qc never participates in the ordering), with
    # a constant-size expression tree (see _pq_encode rationale)
    asg = (
        e.crossJoin(F.broadcast(_cents_df(spark, coarse)))
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    _qdist_col().alias("qdist"),
                    F.col("cid").alias("cid"),
                    F.col("qc").alias("qc"),
                )
            ).alias("best"),
            F.first("qv").alias("qv"),
        )
        .select(
            "vec_id",
            "qv",
            F.col("best.cid").alias("cid"),
            F.zip_with("qv", F.col("best.qc"), lambda a, b: a - b).alias("rv"),
        )
    )
    sub = _stage(_pq_subspaces(asg, "rv", ["vec_id", "cid"]))
    cents = _pq_train(sub.select("vec_id", "m", "sv"))
    codes = _pq_encode(sub, cents, ["vec_id", "cid"]).select(
        "vec_id", "cid", "m", "code"
    )

    # driver-side probes + residual ADC LUT (exact int; NQ·nprobe·M·K rows)
    coarse_by_cid = dict(coarse)
    q_rows = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]])
        for r in e.filter(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id")
        .collect()
    ]
    lut_rows = []
    for qid, qv in q_rows:
        by_dist = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qv, qc)), cid)
            for cid, qc in coarse
        )
        for _, cid in by_dist[:nprobe]:
            qres = [a - b for a, b in zip(qv, coarse_by_cid[cid])]
            for m in range(PQ_M):
                qsub = qres[m * PQ_SUB : (m + 1) * PQ_SUB]
                for code, qc in cents[m]:
                    d = sum((a - b) * (a - b) for a, b in zip(qsub, qc))
                    lut_rows.append((qid, cid, m, int(code), int(d)))
    lut = spark.createDataFrame(
        lut_rows, "query_id long, cid long, m long, code long, d long"
    )
    # the LUT join prunes to the probed cells — candidates ∝ nprobe/KC
    scored = (
        codes.join(F.broadcast(lut), ["cid", "m", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("long").alias("qdist"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("qdist"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qdist", "rank")
    )


def ann_ivfpq_sql(kc: int = IVFPQ_KC, nprobe: int = IVFPQ_NPROBE) -> str:
    from spider_core_spark.textops.semantic import _QV_DUCK

    qd_full = (
        "CAST(list_sum([(q.qv[i] - c.cqv[i]) * (q.qv[i] - c.cqv[i]) "
        "for i in range(1, len(q.qv) + 1)]) AS BIGINT)"
    )
    qd_sub = (
        "CAST(list_sum([(q.qv[i] - c.qc[i]) * (q.qv[i] - c.qc[i]) "
        f"for i in range(1, {PQ_SUB} + 1)]) AS BIGINT)"
    )
    parts = [
        f"qq AS (SELECT vec_id, {_QV_DUCK} AS qv FROM embeddings)",
        f"cc AS (SELECT vec_id AS ccid, qv AS cqv FROM qq WHERE vec_id < {kc})",
        f"""asg AS (
  SELECT vec_id, cid, rv FROM (
    SELECT q.vec_id, c.ccid AS cid,
           [q.qv[i] - c.cqv[i] for i in range(1, len(q.qv) + 1)] AS rv,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {qd_full}, c.ccid) AS rn
    FROM qq q CROSS JOIN cc c
  ) WHERE rn = 1
)""",
        f"""probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.ccid AS cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {qd_full}, c.ccid) AS rn
    FROM qq q CROSS JOIN cc c WHERE q.vec_id < {N_QUERIES}
  ) WHERE rn <= {nprobe}
)""",
        """qres AS (
  SELECT p.query_id, p.cid,
         [q.qv[i] - c.cqv[i] for i in range(1, len(q.qv) + 1)] AS rq
  FROM probes p
  JOIN qq q ON q.vec_id = p.query_id
  JOIN cc c ON c.ccid = p.cid
)""",
    ]
    code_union = []
    lut_union = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB + 1, (m + 1) * PQ_SUB
        parts.append(
            f"rm{m} AS (SELECT vec_id, cid, rv[{lo}:{hi}] AS qv FROM asg)"
        )
        parts.append(
            f"pc0_{m} AS (SELECT vec_id AS cid, qv AS qc FROM rm{m} "
            f"WHERE vec_id < {PQ_K})"
        )
        prev = f"pc0_{m}"
        for i in range(PQ_ITERS):
            parts.append(
                f"""pa{i}_{m} AS (
  SELECT vec_id, qv, cid FROM (
    SELECT q.vec_id, q.qv, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {qd_sub}, c.cid) AS rn
    FROM rm{m} q CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
            )
            parts.append(
                f"""pc{i + 1}_{m} AS (
  SELECT cid, list(mv ORDER BY idx) AS qc FROM (
    SELECT cid, idx, (s - ((s % c + c) % c)) // c AS mv
    FROM (SELECT cid, idx, CAST(sum(qe) AS BIGINT) AS s, count(*) AS c
          FROM (SELECT cid, generate_subscripts(qv, 1) AS idx,
                       unnest(qv) AS qe FROM pa{i}_{m})
          GROUP BY cid, idx)
  ) GROUP BY cid
)"""
            )
            prev = f"pc{i + 1}_{m}"
        parts.append(
            f"""code{m} AS (
  SELECT vec_id, cell, {m} AS m, cid AS code FROM (
    SELECT q.vec_id, q.cid AS cell, c.cid,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {qd_sub}, c.cid) AS rn
    FROM rm{m} q CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
        )
        code_union.append(f"SELECT * FROM code{m}")
        lut_union.append(
            f"SELECT q.query_id, q.cid AS cell, {m} AS m, c.cid AS code, "
            f"{qd_sub} AS d FROM "
            f"(SELECT query_id, cid, rq[{lo}:{hi}] AS qv FROM qres) q "
            f"CROSS JOIN {prev} c"
        )
    parts.append("codes AS (" + " UNION ALL ".join(code_union) + ")")
    parts.append("lut AS (" + " UNION ALL ".join(lut_union) + ")")
    joined = ",\n".join(parts)
    return f"""
WITH {joined},
scored AS (
  SELECT l.query_id, cd.vec_id, CAST(sum(l.d) AS BIGINT) AS qdist
  FROM codes cd JOIN lut l USING (cell, m, code)
  GROUP BY 1, 2
)
SELECT query_id, vec_id AS neighbor_id, qdist,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY qdist ASC, vec_id ASC)::BIGINT AS rank
FROM scored
WHERE vec_id <> query_id
QUALIFY rank <= {TOP_K}
"""
