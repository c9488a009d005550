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


_SPLIT_RE_SQL = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$"


def canonicalize_url_col(url: Column) -> Column:
    """Full canonicalization (opt-in via CrawlConfig.canonicalize_urls):
    fragment strip + lowercase scheme and host + strip default ports
    (http:80 / https:443) + strip a bare trailing root slash. Exactly
    mirrored by canonicalize_url_py, so fingerprints agree by
    construction. URLs without a scheme://authority shape pass through
    fragment-strip only (they fail seed validation / link resolution
    anyway)."""
    u = normalize_url_col(url)
    scheme = F.lower(F.regexp_extract(u, _SPLIT_RE_SQL, 1))
    auth = F.lower(F.regexp_extract(u, _SPLIT_RE_SQL, 2))
    rest = F.regexp_extract(u, _SPLIT_RE_SQL, 3)
    auth = (
        F.when(
            ((scheme == "http") & auth.endswith(":80"))
            | ((scheme == "https") & auth.endswith(":443")),
            F.substring_index(auth, ":", 1),
        )
        .otherwise(auth)
    )
    rest = F.when(rest == "/", F.lit("")).otherwise(rest)
    canon = F.concat(scheme, F.lit("://"), auth, rest)
    return F.when(scheme == "", u).otherwise(canon)


def canonicalize_url_py(url: str) -> str:
    """Pure-Python twin of canonicalize_url_col."""
    u = normalize_url_py(url)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$", u)
    if not m:
        return u
    scheme = m.group(1).lower()
    auth = m.group(2).lower()
    rest = m.group(3)
    if (scheme == "http" and auth.endswith(":80")) or (
        scheme == "https" and auth.endswith(":443")
    ):
        auth = auth.split(":", 1)[0]
    if rest == "/":
        rest = ""
    return f"{scheme}://{auth}{rest}"


def with_url_columns(df, url_col_name: str = "url", canonicalize: bool = False):
    """Attach normalized url, fingerprint, host, host_hash columns."""
    u = F.col(url_col_name)
    norm = canonicalize_url_col(u) if canonicalize else normalize_url_col(u)
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
