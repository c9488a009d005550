"""Streaming corpus ingestion: cross-batch exact dedup + the batch
quality bar, provably equal to the batch pipeline on the same rows, and
resumable (a second run() ingests only new files)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spider_core_spark.streaming.corpus_stream import CorpusIngestStream
from spider_core_spark.textops.analysis import (
    QUALITY_KEEP_MIN,
    quality_score_frame,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "chases the fox around the old barn while birds watch from above "
    "and the farmer leans on the wooden fence thinking about rain"
)
LOWQ = "spam spam spam spam spam"


def _mk_docs(ids_texts):
    return [
        {
            "doc_id": i,
            "text": t,
            "lang": "en",
            "source": "web",
            "n_chars": len(t),
        }
        for i, t in ids_texts
    ]


@pytest.fixture()
def chunks():
    # chunk 1: two distinct good docs + an in-chunk duplicate pair
    c1 = _mk_docs([
        (1, GOOD), (2, GOOD + " extra tail words here"), (3, GOOD),
        (4, LOWQ),
    ])
    # chunk 2: cross-chunk duplicates of doc 1 and of the LOW-QUALITY doc
    # (still a dup — must not be re-admitted), plus a new good doc
    c2 = _mk_docs([
        (10, GOOD), (11, LOWQ), (12, GOOD + " a different closing line"),
    ])
    # chunk 3 (late arrival): one new doc, one dup of chunk 2's new doc
    c3 = _mk_docs([(20, GOOD + " final unique variant"), (21, GOOD + " a different closing line")])
    return c1, c2, c3


def _write_chunk(spark, rows, indir, name):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{indir}/{name}")


def test_ingest_matches_batch_and_resumes(spark, tmp_path, chunks):
    c1, c2, c3 = chunks
    indir = str(tmp_path / "in")
    ing = CorpusIngestStream(spark, str(tmp_path / "wd"))

    _write_chunk(spark, c1, indir, "chunk1")
    _write_chunk(spark, c2, indir, "chunk2")
    out = ing.run(indir + "/*")

    kept = {r["doc_id"] for r in out["kept"].collect()}
    # batch equivalent over c1+c2 with arrival-order keep-first:
    # dups {3 (in-chunk), 10, 11 (cross-chunk)} gone; 4, 11 low-quality
    assert kept == {1, 2, 12}

    # second run: only chunk3's files are new (checkpoint file ledger)
    _write_chunk(spark, c3, indir, "chunk3")
    ing2 = CorpusIngestStream(spark, str(tmp_path / "wd"))
    out2 = ing2.run(indir + "/*")
    kept2 = {r["doc_id"] for r in out2["kept"].collect()}
    assert kept2 == {1, 2, 12, 20}  # 21 is a dup of 12's content

    # quality bar is the BATCH bar, verbatim
    all_rows = spark.createDataFrame(
        c1 + c2 + c3,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    q = {
        r["doc_id"]: r["quality_score"]
        for r in quality_score_frame(all_rows).collect()
    }
    for r in out2["kept"].collect():
        assert r["quality_score"] == q[r["doc_id"]]
        assert r["quality_score"] >= QUALITY_KEEP_MIN

    # metrics ledger adds up: n_in == all rows, kept+dup+lowq == n_in
    m = out2["metrics"].agg(
        F.sum("n_in"), F.sum("n_dup"), F.sum("n_lowq"), F.sum("n_kept")
    ).collect()[0]
    assert m[0] == len(c1) + len(c2) + len(c3)
    assert m[1] + m[2] + m[3] == m[0]
    # fingerprints cover every distinct content, kept or not
    n_fp = out2["fingerprints"].count()
    distinct_texts = len({r["text"] for r in c1 + c2 + c3})
    assert n_fp == distinct_texts


def test_ingest_replay_is_idempotent(spark, tmp_path, chunks):
    """Re-running with a FRESH checkpoint over the same input directory
    rewrites per-batch sinks rather than re-appending: kept membership is
    identical after a full replay into the same workdir."""
    c1, c2, _ = chunks
    indir = str(tmp_path / "in")
    _write_chunk(spark, c1, indir, "chunk1")
    _write_chunk(spark, c2, indir, "chunk2")
    wd = str(tmp_path / "wd")
    out = CorpusIngestStream(spark, wd).run(indir + "/*")
    kept1 = sorted(r["doc_id"] for r in out["kept"].collect())

    # wipe ONLY the checkpoint (simulates a lost ledger → full replay)
    import shutil

    shutil.rmtree(f"{wd}/ingest_ckpt")
    out2 = CorpusIngestStream(spark, wd).run(indir + "/*")
    kept2 = sorted(r["doc_id"] for r in out2["kept"].collect())
    assert kept2 == kept1
    # and no metric double-counts n_in beyond the replayed totals
    tot = out2["metrics"].agg(F.sum("n_in")).collect()[0][0]
    assert tot == len(c1) + len(c2)
