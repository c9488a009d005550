"""URL normalization / host extraction / fingerprinting.

Each function exists as a Spark Column expression (JVM-side — these sit on
the hot dedup path and must never drop into Python) and a pure-Python twin
used by the crawl simulator, so engine and oracle agree by construction.

Reference semantics:
- fragment strip on every request before enqueue
  (reference src/crawler/core.rs:391 `req.url.set_fragment(None)`)
- fingerprint = SHA-256 hex of the normalized URL
  (reference src/scheduler.rs:553-557; sha2+hex deps Cargo.lock:1744-1752)
- host extraction with "unknown" default
  (reference src/crawler/request_handler.rs:129 `url.host_str()`)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from spider_core_spark.functions.hashing import h64_col, h64_py, sha256_hex_py

_HOST_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)")
_HOST_RE_SQL = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


# ---------------------------------------------------------------- Spark side
def normalize_url_col(url: Column) -> Column:
    """Strip the fragment (everything from the first '#')."""
    return F.substring_index(url, "#", 1)


def fingerprint_col(url_normalized: Column) -> Column:
    return F.sha2(url_normalized, 256)


def host_col(url: Column) -> Column:
    h = F.lower(F.regexp_extract(url, _HOST_RE_SQL, 1))
    return F.when(h == "", F.lit("unknown")).otherwise(h)


def host_hash_col(host: Column) -> Column:
    return h64_col(host)


def path_col(url: Column) -> Column:
    """Path component including leading '/', '' if none (query stripped)."""
    no_scheme = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    return F.substring_index(F.substring_index(no_scheme, "#", 1), "?", 1)


def with_url_columns(df, url_col_name: str = "url"):
    """Attach normalized url, fingerprint, host, host_hash columns."""
    u = F.col(url_col_name)
    norm = normalize_url_col(u)
    return (
        df.withColumn(url_col_name, norm)
        .withColumn("fingerprint", fingerprint_col(norm))
        .withColumn("host", host_col(norm))
        .withColumn("host_hash", host_hash_col(host_col(norm)))
    )


# --------------------------------------------------------------- Python twin
def normalize_url_py(url: str) -> str:
    return url.split("#", 1)[0]


def fingerprint_py(url_normalized: str) -> str:
    return sha256_hex_py(url_normalized)


def host_py(url: str) -> str:
    m = _HOST_RE.match(url)
    return m.group(1).lower() if m and m.group(1) else "unknown"


def host_hash_py(host: str) -> int:
    return h64_py(host)


def path_py(url: str) -> str:
    no_frag = url.split("#", 1)[0]
    m = _HOST_RE.match(no_frag)
    rest = no_frag[m.end():] if m else no_frag
    return rest.split("?", 1)[0]
