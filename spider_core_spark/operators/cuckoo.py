"""Cuckoo-filter URL-seen tier: deletable sharded membership filter.

The reference's seen-set (src/scheduler.rs:68-137) pairs a Bloom tier
with an exact store; a Bloom filter cannot DELETE, so evicting URLs from
the seen set (recrawl scheduling — plans/recrawl.py revisits a URL once
its interval elapses) forces either a full Bloom rebuild per epoch or a
growing "tombstone" side table. A cuckoo filter (Fan, Andersen,
Kaminsky, Mitzenmacher, "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014 — public literature) supports constant-time deletion and
beats Bloom on space below ~3% FPR, so it is the right seen-tier for a
crawler that re-visits: mark a URL due-for-recrawl by deleting its tag,
and the prefilter stops short-circuiting it.

Partial-key cuckoo hashing, all parameters integer-exact across Spark /
Python / DuckDB (the repo's three-engine parity rule):

- tag(fp)  = 16-bit nonzero: (int(fp_hex[0:4], 16) % 0xFFFF) + 1
             (0 is the empty-slot sentinel);
- i1(fp)   = int(fp_hex[8:16], 16) % n_buckets   (n_buckets = 2^k);
- i2       = i1 XOR ((tag * TAG_MIX) % n_buckets)  — Fan et al.'s
             alt-bucket rule; XOR keeps i2 in range because n_buckets
             is a power of two.

Placement independence (what makes the filter RELATIONALLY certifiable,
the same trick as the Bloom tier's u4_bloom_membership): for keys x, y
with tag(x) == tag(y) == t the XOR offset d = (t·TAG_MIX) % n_buckets
is identical, so their bucket pairs {i1, i1^d} are either the SAME pair
or disjoint. A probe of x scans exactly its own pair for t; an entry
for y — resident in either of its two buckets, wherever eviction pushed
it — is visible iff pair(y) == pair(x). Membership therefore equals
"∃ alive entry with (min(i1, i2), tag) == mine", independent of
insertion order and eviction history; deletion removes ONE copy, so
with multiset counting alive = inserts − deletes. That canonical-pair
semantics is a groupBy + equi-join (plans/demo_queries.u5_cuckoo_
membership and its DuckDB oracle); this module is the numpy-backed
filter the engine actually probes with, certified against that
relational form in tests/test_cuckoo.py.

Scale: one filter per shard (shard = pmod(h64(fp), n_shards), the Bloom
tier's sharding), built distributed via groupBy(shard).applyInPandas —
per-shard state is n_buckets × SLOTS uint16, bounded and executor-local.
At 16-bit tags / 4 slots / 95% load the filter costs ~2.2 bytes per key
(FPR ≈ 2·4·0.95/2^16 ≈ 0.012%): a 10^10-URL seen set is ~22 GB across
shards — broadcast-infeasible as one blob, fine as 1024 × ~21 MB shards
co-partitioned with the candidate stream (the same budget arithmetic as
dedup.bloom_bits_for; build refuses loudly on overflow instead of
degrading). Like the Bloom tier, the cuckoo tier is a PREFILTER:
correctness always comes from the exact anti-join behind it — but
unlike Bloom it has no false negatives *and* stays correct under
deletion, so a recrawl-evicted URL is never wrongly short-circuited.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TAG_MOD = 0xFFFF  # tags in [1, 65535]; 0 = empty slot
TAG_MIX = 0x5BD1  # odd mixing constant for the alt-bucket offset
SLOTS = 4  # slots per bucket (Fan et al.'s (2,4) configuration)
MAX_KICKS = 500


# --- the three-engine arithmetic ------------------------------------------


def cuckoo_tag_col(fp: Column) -> Column:
    """16-bit nonzero tag from the fingerprint's first 4 hex chars."""
    return (
        F.pmod(
            F.conv(F.substring(fp, 1, 4), 16, 10).cast("long"), F.lit(TAG_MOD)
        )
        + 1
    ).cast("long")


def cuckoo_bucket_col(fp: Column, n_buckets: int) -> Column:
    """Primary bucket from hex chars 9-16 (disjoint from the tag chars)."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
    return F.pmod(
        F.conv(F.substring(fp, 9, 8), 16, 10).cast("long"), F.lit(n_buckets)
    ).cast("long")


def cuckoo_alt_col(i1: Column, tag: Column, n_buckets: int) -> Column:
    """Alt bucket i2 = i1 XOR ((tag · TAG_MIX) % n_buckets)."""
    return i1.bitwiseXOR(F.pmod(tag * F.lit(TAG_MIX), F.lit(n_buckets))).cast(
        "long"
    )


def cuckoo_tag_py(fp_hex: str) -> int:
    return (int(fp_hex[0:4], 16) % TAG_MOD) + 1


def cuckoo_bucket_py(fp_hex: str, n_buckets: int) -> int:
    return int(fp_hex[8:16], 16) % n_buckets


def cuckoo_alt_py(i1: int, tag: int, n_buckets: int) -> int:
    return i1 ^ ((tag * TAG_MIX) % n_buckets)


def cuckoo_tag_duckdb(fp: str) -> str:
    return f"((('0x' || substring({fp}, 1, 4))::BIGINT % {TAG_MOD}) + 1)"


def cuckoo_bucket_duckdb(fp: str, n_buckets: int) -> str:
    return f"(('0x' || substring({fp}, 9, 8))::BIGINT % {n_buckets})"


def cuckoo_alt_duckdb(i1: str, tag: str, n_buckets: int) -> str:
    return f"xor({i1}, ({tag} * {TAG_MIX}) % {n_buckets})"


# --- the numpy filter (per-shard, bounded) ---------------------------------


def _insert_one(table: np.ndarray, i1: int, tag: int, n_buckets: int) -> None:
    """Insert with deterministic-eviction cuckoo kicks (the victim slot
    cycles k % SLOTS so rebuilds are reproducible). Raises on overflow —
    the engine's loud-refusal convention: resize n_buckets, never degrade
    silently."""
    i2 = cuckoo_alt_py(i1, tag, n_buckets)
    for b in (i1, i2):
        empty = np.nonzero(table[b] == 0)[0]
        if len(empty):
            table[b, empty[0]] = tag
            return
    b, t = i1, tag
    for k in range(MAX_KICKS):
        s = k % SLOTS
        t, table[b, s] = int(table[b, s]), t
        b = cuckoo_alt_py(b, t, n_buckets)
        empty = np.nonzero(table[b] == 0)[0]
        if len(empty):
            table[b, empty[0]] = t
            return
    raise RuntimeError(
        f"cuckoo filter overflow after {MAX_KICKS} kicks at "
        f"n_buckets={n_buckets}: raise n_buckets (load factor past ~0.95)"
    )


def _delete_one(table: np.ndarray, i1: int, tag: int, n_buckets: int) -> bool:
    """Remove ONE copy of tag from either bucket of its pair."""
    for b in (i1, cuckoo_alt_py(i1, tag, n_buckets)):
        hit = np.nonzero(table[b] == tag)[0]
        if len(hit):
            table[b, hit[0]] = 0
            return True
    return False


def buckets_for(expected_n: int, n_shards: int, load: float = 0.9) -> int:
    """Power-of-two bucket count per shard for `expected_n` total keys."""
    per_shard = max(expected_n // max(n_shards, 1), 1)
    need = int(per_shard / (SLOTS * load)) + 1
    return 1 << max(need - 1, 1).bit_length()


def build_cuckoo_shards(
    seen: DataFrame,
    n_shards: int,
    n_buckets: int,
    deletes: DataFrame | None = None,
) -> dict[int, bytes]:
    """One uint16 table per shard from the `seen` fingerprints; optional
    `deletes` (same single-column fingerprint shape, applied AFTER all of
    the shard's inserts) models recrawl eviction. Built distributed
    (groupBy(shard).applyInPandas — per-shard state bounded at
    n_buckets × SLOTS × 2 bytes), collected small like the Bloom shards.
    """
    from spider_core_spark.operators.dedup import shard_col

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        ins = pdf[pdf["op"] == 1].sort_values("rid")
        dels = pdf[pdf["op"] == -1].sort_values("rid")
        for i1, tag in zip(ins["i1"].to_numpy(), ins["tag"].to_numpy()):
            _insert_one(table, int(i1), int(tag), n_buckets)
        for i1, tag in zip(dels["i1"].to_numpy(), dels["tag"].to_numpy()):
            _delete_one(table, int(i1), int(tag), n_buckets)
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "tags": [table.tobytes()]}
        )

    def tagged(df: DataFrame, op: int) -> DataFrame:
        fp = F.col(df.columns[0])
        return df.select(
            shard_col(fp, n_shards).cast("long").alias("shard"),
            cuckoo_bucket_col(fp, n_buckets).alias("i1"),
            cuckoo_tag_col(fp).alias("tag"),
            F.lit(op).cast("int").alias("op"),
            F.monotonically_increasing_id().alias("rid"),
        )

    frame = tagged(seen, 1)
    if deletes is not None:
        frame = frame.unionByName(tagged(deletes, -1))
    rows = (
        frame.groupBy("shard")
        .applyInPandas(build, schema="shard long, tags binary")
        .collect()
    )
    return {int(r["shard"]): bytes(r["tags"]) for r in rows}


def cuckoo_probe_py(
    table_bytes: bytes, n_buckets: int, i1: int, tag: int
) -> bool:
    table = np.frombuffer(table_bytes, dtype=np.uint16).reshape(
        n_buckets, SLOTS
    )
    i2 = cuckoo_alt_py(i1, tag, n_buckets)
    return bool((table[i1] == tag).any() or (table[i2] == tag).any())


def cuckoo_prefilter(
    candidates: DataFrame,
    filters: dict[int, bytes],
    n_shards: int,
    n_buckets: int,
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Adds `cuckoo_maybe_seen`: True iff the candidate's tag is resident
    in either bucket of its pair (same vectorized numpy-over-Arrow shape
    as dedup.bloom_prefilter; False is definitive — no false negatives,
    even after deletions)."""
    from spider_core_spark.operators.dedup import shard_col

    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(filters)

    def probe(shard: pd.Series, i1: pd.Series, tag: pd.Series) -> pd.Series:
        tables = bc.value
        out = np.zeros(len(shard), dtype=bool)
        sh = shard.to_numpy()
        b1 = i1.to_numpy().astype(np.int64)
        tg = tag.to_numpy().astype(np.uint16)
        b2 = b1 ^ ((tg.astype(np.int64) * TAG_MIX) % n_buckets)
        for s in np.unique(sh):
            t = tables.get(int(s))
            if t is None:
                continue
            table = np.frombuffer(t, dtype=np.uint16).reshape(
                n_buckets, SLOTS
            )
            m = sh == s
            out[m] = (table[b1[m]] == tg[m, None]).any(axis=1) | (
                table[b2[m]] == tg[m, None]
            ).any(axis=1)
        return pd.Series(out)

    probe_udf = F.pandas_udf(probe, "boolean")
    fp = F.col(fp_col)
    return candidates.withColumn(
        "cuckoo_maybe_seen",
        probe_udf(
            shard_col(fp, n_shards).cast("long"),
            cuckoo_bucket_col(fp, n_buckets),
            cuckoo_tag_col(fp),
        ),
    )


def merge_cuckoo_shards(
    base: dict[int, bytes],
    delta: DataFrame,
    n_shards: int,
    n_buckets: int,
) -> dict[int, bytes]:
    """Insert an epoch's new fingerprints into the existing shard tables —
    the cuckoo analog of dedup.merge_bloom_shards (Bloom shards OR
    together; cuckoo placement is stateful, so the delta is INSERTED into
    the prior table instead). Distributed: groupBy(shard).applyInPandas,
    prior tables re-enter via broadcast; shards with no delta rows keep
    their table unchanged. Overflow refuses loudly (resize n_buckets —
    the sizing knob is CrawlConfig.cuckoo_buckets / bloom_expected_seen).
    """
    from spider_core_spark.operators.dedup import shard_col

    spark = delta.sparkSession
    bc = spark.sparkContext.broadcast(base)

    def upd(pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(pdf["shard"].iloc[0])
        prior = bc.value.get(s)
        table = (
            np.frombuffer(prior, dtype=np.uint16)
            .reshape(n_buckets, SLOTS)
            .copy()
            if prior is not None
            else np.zeros((n_buckets, SLOTS), dtype=np.uint16)
        )
        pdf = pdf.sort_values("rid")
        for i1, tag in zip(pdf["i1"].to_numpy(), pdf["tag"].to_numpy()):
            _insert_one(table, int(i1), int(tag), n_buckets)
        return pd.DataFrame({"shard": [s], "tags": [table.tobytes()]})

    fp = F.col(delta.columns[0])
    tagged = delta.select(
        shard_col(fp, n_shards).cast("long").alias("shard"),
        cuckoo_bucket_col(fp, n_buckets).alias("i1"),
        cuckoo_tag_col(fp).alias("tag"),
        F.monotonically_increasing_id().alias("rid"),
    )
    rows = (
        tagged.groupBy("shard")
        .applyInPandas(upd, schema="shard long, tags binary")
        .collect()
    )
    out = dict(base)
    out.update({int(r["shard"]): bytes(r["tags"]) for r in rows})
    return out
