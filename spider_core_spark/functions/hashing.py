"""Shared 60-bit hash primitive, defined three ways that agree bit-for-bit:

- ``h64_col``     — Spark Column expression (JVM-side, whole-stage codegen)
- ``h64_py``      — pure Python (used by the crawl simulator / oracles)
- ``h64_duckdb``  — SQL fragment for the DuckDB correctness oracle

The reference fingerprints URLs with SHA-2 + hex (inferred from its direct
deps sha2/hex, reference Cargo.lock:1744-1752; call site
src/scheduler.rs:553-557). We reuse the same digest as the base for every
derived hash (host_hash, minhash seeds, simhash bits, LSH buckets) so that
Spark, Python and DuckDB can all reproduce identical values — something
xxhash64/murmur cannot give us across the three engines.

60 bits (15 hex chars) keeps the value inside a signed int64 in all three.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits < 2^63


def sha256_hex_py(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def h64_py(s: str, seed: int | None = None) -> int:
    """Pure-Python twin of h64_col."""
    key = s if seed is None else f"{seed}:{s}"
    return int(sha256_hex_py(key)[:HEX_CHARS], 16)


def h64_col(col: Column, seed: int | None = None) -> Column:
    """Spark expression: int64 of the first 15 hex chars of sha256."""
    key = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.sha2(key, 256), 1, HEX_CHARS), 16, 10).cast("long")


def h64_duckdb(expr: str, seed: int | None = None) -> str:
    """DuckDB SQL fragment computing the same int64."""
    key = expr if seed is None else f"'{seed}:' || ({expr})"
    return f"('0x' || substring(sha256({key}), 1, {HEX_CHARS}))::BIGINT"
