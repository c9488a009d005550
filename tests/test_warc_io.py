"""WARC source/sink roundtrip (Common-Crawl-style .warc.gz shards;
no reference analog — spider-core has no archive I/O)."""

from __future__ import annotations

import datetime as dt
import gzip
import os

from spider_core_spark import schemas
from spider_core_spark.sources import sitegen, warc_io


def _roundtrip(spark, rows, schema, tmp, n_shards=4):
    pages = spark.createDataFrame(rows, schema)
    manifest = warc_io.write_warc_shards(pages, str(tmp), n_shards=n_shards)
    back = warc_io.read_warc(spark, str(tmp))
    return manifest, back


def _key(r):
    return (
        r["url"], r["warc_ts"], bytes(r["html"] or b""), r["text"],
        r["lang"], r["status"], r["location"],
    )


def test_warc_roundtrip_sitegen(spark, tmp_path):
    rows = sitegen.gen_pages_rows(
        range(120), 120, 4, 42, redirect_frac=0.2
    )
    manifest, back = _roundtrip(
        spark, rows, schemas.PAGES_REDIR, tmp_path / "warc"
    )
    m = {r["shard"]: r for r in manifest.collect()}
    assert sum(r["n_pages"] for r in m.values()) == 120
    got = sorted(_key(r) for r in back.collect())
    want = sorted(
        (r["url"], r["warc_ts"], bytes(r["html"]), r["text"], r["lang"],
         r["status"], r.get("location"))
        for r in rows
    )
    assert got == want


def test_warc_roundtrip_plain_schema_and_unicode(spark, tmp_path):
    """6-column PAGES input (no location) and non-ASCII multi-line text
    survive byte-exactly; nulls stay null."""
    rows = [
        {
            "url": "https://u.test/a",
            "warc_ts": dt.datetime(2024, 3, 1, 12, 0, 5),
            "html": "<html>café — ∑</html>".encode(),
            "text": "café line1\nline2 — ∑\r\nline3",
            "lang": "fr",
            "status": 200,
        },
        {
            "url": "https://u.test/b",
            "warc_ts": dt.datetime(2024, 3, 2),
            "html": b"",
            "text": None,
            "lang": None,
            "status": 404,
        },
    ]
    _, back = _roundtrip(spark, rows, schemas.PAGES, tmp_path / "warc6",
                         n_shards=2)
    got = {r["url"]: r for r in back.collect()}
    a, b = got["https://u.test/a"], got["https://u.test/b"]
    assert bytes(a["html"]) == rows[0]["html"]
    assert a["text"] == rows[0]["text"]
    assert (a["lang"], a["status"], a["location"]) == ("fr", 200, None)
    # None text is not distinguishable from "" in a WET conversion record
    # (the record is always written); empty-string is the documented
    # normalization
    assert b["text"] == ""
    assert (b["lang"], b["status"]) == (None, 404)
    assert bytes(b["html"]) == b""


def test_warc_rerun_is_byte_identical(spark, tmp_path):
    rows = sitegen.gen_pages_rows(range(60), 60, 3, 7, redirect_frac=0.1)
    pages = spark.createDataFrame(rows, schemas.PAGES_REDIR)
    d1, d2 = tmp_path / "w1", tmp_path / "w2"
    warc_io.write_warc_shards(pages, str(d1), n_shards=3)
    warc_io.write_warc_shards(pages, str(d2), n_shards=3)
    f1 = sorted(os.listdir(d1))
    assert f1 == sorted(os.listdir(d2))
    for f in f1:
        b1 = (d1 / f).read_bytes()
        assert b1 == (d2 / f).read_bytes()
        # and every shard is a valid plain-gzip stream end to end
        # (concatenated members — the CC splittability property)
        gzip.decompress(b1)


def test_warc_spec_shape(spark, tmp_path):
    """Record envelope matches the WARC/1.0 layout: version line, typed
    records, Content-Length exact, one gzip member per record."""
    rows = sitegen.gen_pages_rows(range(10), 10, 2, 9)
    pages = spark.createDataFrame(rows, schemas.PAGES)
    warc_io.write_warc_shards(pages, str(tmp_path / "w"), n_shards=1)
    blob = (tmp_path / "w" / "shard-00000.warc.gz").read_bytes()
    recs = list(warc_io._iter_records(blob))
    assert len(recs) == 20  # response + conversion per page
    kinds = {r["_warc"]["WARC-Type"] for r in recs}
    assert kinds == {"response", "conversion"}
    for r in recs:
        assert int(r["_warc"]["Content-Length"]) == len(r["_payload"])
        assert r["_warc"]["WARC-Record-ID"].startswith("<urn:uuid:")
