"""WARC source/sink: the Common-Crawl-style archive format for the pages
table (ISO 28500 / WARC 1.0; record layout per the public spec and the
Common Crawl WARC/WET conventions — no reference-repo analog, spider-core
has no archive I/O).

Layout written per page row (two records, the CC WARC+WET pairing in one
stream):

* a ``response`` record — HTTP/1.1 status line + ``Location`` header when
  present, payload = the raw ``html`` bytes; carries ``WARC-Target-URI``,
  ``WARC-Date`` (the ``warc_ts`` column) and, when ``lang`` is set, the
  real CC header ``WARC-Identified-Content-Language``.
* a ``conversion`` record — the extracted ``text`` (CC ships these as WET
  files; here they ride the same stream and re-join on target URI).

Every record is its OWN gzip member, and members are concatenated per
shard file — exactly the Common Crawl trick that makes a ``.warc.gz``
splittable: any byte offset found in a member index is a valid read
start. This module reads whole shard files (``binaryFile`` source), so
shard size is the read-parallelism unit: size ``n_shards`` so each file
lands near the typical ~1 GiB CC shard. At 100 TB the same files serve
an offset-indexed reader; nothing in the format written here would
change.

Distribution contract: the writer is a ``mapInPandas`` sink — each task
serializes its partition to one shard file and emits a 1-row manifest
(no driver state, no collect); shard membership is deterministic
(``pmod(xxhash64(url), n_shards)``, sorted by url within a shard), so a
re-run produces byte-identical files. The reader is a ``binaryFile``
scan + Arrow-batched parse (one task per shard file).
"""

from __future__ import annotations

import gzip
import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_core_spark import schemas

_CRLF = "\r\n"
_MANIFEST_SCHEMA = "shard int, path string, n_pages long, n_bytes long"
# WARC-Date format (spec: ISO 8601 UTC, second precision)
_TS_FMT = "%Y-%m-%dT%H:%M:%SZ"

_STATUS_REASON = {
    200: "OK",
    301: "Moved Permanently",
    302: "Found",
    404: "Not Found",
    500: "Internal Server Error",
}


def _warc_record(kind: str, url: str, ts, headers: list[str], payload: bytes,
                 rec_id: str) -> bytes:
    """One WARC record, gzipped as its own member (mtime pinned to 0 so
    re-runs are byte-identical)."""
    head = (
        f"WARC/1.0{_CRLF}"
        f"WARC-Type: {kind}{_CRLF}"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>{_CRLF}"
        f"WARC-Date: {ts.strftime(_TS_FMT)}{_CRLF}"
        f"WARC-Target-URI: {url}{_CRLF}"
        + "".join(h + _CRLF for h in headers)
        + f"Content-Length: {len(payload)}{_CRLF}{_CRLF}"
    ).encode("utf-8")
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(head + payload + _CRLF.encode() * 2)
    return buf.getvalue()


def _http_payload(status: int, location, html: bytes) -> bytes:
    reason = _STATUS_REASON.get(status, "Unknown")
    lines = [f"HTTP/1.1 {status} {reason}"]
    if location is not None:
        lines.append(f"Location: {location}")
    lines.append("Content-Type: text/html; charset=utf-8")
    head = (_CRLF.join(lines) + _CRLF * 2).encode("utf-8")
    return head + (html or b"")


def write_warc_shards(
    pages: DataFrame, outdir: str, n_shards: int = 8
) -> DataFrame:
    """Serialize a PAGES/PAGES_REDIR-shaped frame to ``shard-*.warc.gz``
    under ``outdir``. Returns the (materialized) shard manifest. The
    manifest collect is bounded at n_shards rows — the files themselves
    are written executor-side."""
    os.makedirs(outdir, exist_ok=True)
    has_loc = "location" in pages.columns
    d = pages.select(
        "url", "warc_ts", "html", "text", "lang",
        F.col("status").cast("int").alias("status"),
        (F.col("location") if has_loc else F.lit(None).cast("string")).alias(
            "location"
        ),
        F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int").alias("_shard"),
    ).repartition(n_shards, "_shard").sortWithinPartitions("_shard", "url")

    def _isnull(v) -> bool:
        return v is None or (isinstance(v, float) and pd.isna(v))

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        chunks: dict[int, list[bytes]] = {}
        counts: dict[int, int] = {}
        for b in batches:
            # NOTE: plain column zip, not itertuples — pandas renames
            # underscore-prefixed fields (_shard) positionally there
            for url, ts, html, text, lang, status, location, sh in zip(
                b["url"], b["warc_ts"], b["html"], b["text"], b["lang"],
                b["status"], b["location"], b["_shard"],
            ):
                # deterministic record ids: sha1 of (kind, url)
                rid_resp = hashlib.sha1(b"resp:" + url.encode()).hexdigest()
                rid_conv = hashlib.sha1(b"conv:" + url.encode()).hexdigest()
                lang_h = (
                    []
                    if _isnull(lang)
                    else [f"WARC-Identified-Content-Language: {lang}"]
                )
                loc = None if _isnull(location) else location
                rec = _warc_record(
                    "response", url, ts, lang_h,
                    _http_payload(int(status), loc, bytes(html or b"")),
                    rid_resp,
                )
                conv = _warc_record(
                    "conversion", url, ts,
                    ["Content-Type: text/plain"],
                    ("" if _isnull(text) else str(text)).encode("utf-8"),
                    rid_conv,
                )
                sh = int(sh)
                chunks.setdefault(sh, []).append(rec + conv)
                counts[sh] = counts.get(sh, 0) + 1
        rows = []
        for sh, parts in chunks.items():
            blob = b"".join(parts)
            path = os.path.join(outdir, f"shard-{sh:05d}.warc.gz")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)  # atomic: a re-run overwrites, never appends
            rows.append((sh, path, counts[sh], len(blob)))
        yield pd.DataFrame(
            rows, columns=["shard", "path", "n_pages", "n_bytes"]
        )

    manifest = d.mapInPandas(_write, schema=_MANIFEST_SCHEMA)
    # the manifest action IS the write's terminal action (bounded rows)
    rows = manifest.collect()
    return pages.sparkSession.createDataFrame(rows, _MANIFEST_SCHEMA)


def warc_roundtrip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate certification of the WARC encode→decode path against
    deterministic content: documents rows become pages (html = the utf-8
    bytes of text; every 7th doc a 301 with a synthetic Location), go
    through write_warc_shards → read_warc, and come back as checkable
    scalars. The DuckDB oracle recomputes every output column straight
    from the documents table — equality proves the roundtrip lossless
    (headers, status line, Location, language tag, and both payloads)."""
    import tempfile
    import uuid

    from spider_core_spark.sources.scan import read_parquet_spread

    docs = read_parquet_spread(spark, os.path.join(sf_dir, "documents.parquet"))
    is_redir = F.pmod(F.col("doc_id"), F.lit(7)) == 0
    did = F.col("doc_id").cast("string")
    pages = docs.select(
        F.concat(F.lit("https://doc"), did, F.lit(".test/")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        "text",
        "lang",
        F.when(is_redir, 301).otherwise(200).cast("int").alias("status"),
        F.when(
            is_redir, F.concat(F.lit("https://mirror"), did, F.lit(".test/"))
        ).alias("location"),
    )
    outdir = os.path.join(
        tempfile.gettempdir(), f"warc_gate_{uuid.uuid4().hex}"
    )
    write_warc_shards(pages, outdir, n_shards=8)
    back = read_warc(spark, outdir)
    return back.select(
        F.regexp_extract("url", r"doc(\d+)\.test", 1).cast("long").alias(
            "doc_id"
        ),
        "status",
        "location",
        "lang",
        F.sha2(F.col("html"), 256).alias("html_sha"),
        F.sha2(F.col("text"), 256).alias("text_sha"),
        F.length("html").cast("long").alias("n_html_bytes"),
    )


WARC_RT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN 301 ELSE 200 END AS status,
       CASE WHEN doc_id % 7 = 0
            THEN 'https://mirror' || doc_id || '.test/' END AS location,
       lang,
       sha256(text) AS html_sha,
       sha256(text) AS text_sha,
       strlen(text) AS n_html_bytes
FROM documents
"""


def _parse_member(head: bytes, payload: bytes) -> dict | None:
    """Parse one WARC record (headers already split from payload)."""
    lines = head.decode("utf-8").split(_CRLF)
    hdr = {}
    for ln in lines[1:]:
        if ": " in ln:
            k, v = ln.split(": ", 1)
            hdr[k] = v
    return {"_warc": hdr, "_payload": payload}


def _iter_records(blob: bytes):
    """Yield records from a multi-member gzip WARC blob. One
    zlib.decompressobj per member; `unused_data` marks the member
    boundary — the same walk an offset-indexed CC reader does, minus the
    index seek."""
    import zlib

    off = 0
    mv = memoryview(blob)  # zero-copy member slicing
    while off < len(blob):
        d = zlib.decompressobj(wbits=31)
        data = d.decompress(mv[off:])
        member_len = len(blob) - off - len(d.unused_data)
        if member_len <= 0:  # trailing garbage / truncated member
            raise ValueError(f"corrupt gzip member at offset {off}")
        off += member_len
        sep = data.find((_CRLF * 2).encode())
        head = data[:sep]
        rest = data[sep + 4:]
        rec = _parse_member(head, rest)
        if rec is None:
            continue
        clen = int(rec["_warc"].get("Content-Length", len(rest)))
        rec["_payload"] = rest[:clen]
        yield rec


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``*.warc.gz`` shards back into the PAGES_REDIR shape.

    response records supply url/warc_ts/html/status/location/lang;
    conversion records supply text — the two are re-joined on target URI
    inside the per-file parse (records for a URI are adjacent within one
    member stream by this module's layout; a stream interleaved by an
    external producer would need the groupBy fallback, which this keeps
    to one shard's rows either way)."""
    import datetime as _dt

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc.gz")
    ).select("content")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict[str, dict] = {}
            for blob in b["content"]:
                for rec in _iter_records(bytes(blob)):
                    h = rec["_warc"]
                    url = h["WARC-Target-URI"]
                    ts = _dt.datetime.strptime(h["WARC-Date"], _TS_FMT)
                    slot = rows.setdefault(url, {
                        "url": url, "warc_ts": ts, "html": None,
                        "text": None, "lang": None, "status": None,
                        "location": None,
                    })
                    if h["WARC-Type"] == "response":
                        http = rec["_payload"]
                        sep = http.find((_CRLF * 2).encode())
                        head = http[:sep].decode("utf-8").split(_CRLF)
                        slot["html"] = http[sep + 4:]
                        slot["status"] = int(head[0].split(" ")[1])
                        for ln in head[1:]:
                            if ln.startswith("Location: "):
                                slot["location"] = ln[len("Location: "):]
                        slot["lang"] = h.get(
                            "WARC-Identified-Content-Language", slot["lang"]
                        )
                    else:  # conversion
                        slot["text"] = rec["_payload"].decode("utf-8")
            yield pd.DataFrame(
                list(rows.values()),
                columns=["url", "warc_ts", "html", "text", "lang",
                         "status", "location"],
            )

    return files.mapInPandas(_parse, schema=schemas.PAGES_REDIR)
