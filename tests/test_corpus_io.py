"""Corpus source/sink tests: format roundtrips (schema-pinned readers,
no inference), token-balanced shard writer invariants, and big-path /
small-path bit-equality for the shard assignment."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark.sources import corpus_io

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return corpus_io.read_documents(spark, f"{SF}/documents.parquet")


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("doc_id").collect()]


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_format_roundtrip(spark, tmp_path, fmt):
    d = _docs(spark)
    path = str(tmp_path / f"corpus_{fmt}")
    corpus_io.write_documents(d, path, fmt=fmt)
    back = corpus_io.read_documents(spark, path, fmt=fmt)
    assert _sorted_rows(back) == _sorted_rows(d)


def test_reader_rejects_missing_columns(spark, tmp_path):
    p = str(tmp_path / "bad")
    _docs(spark).drop("n_chars").write.parquet(p)
    with pytest.raises(ValueError, match="n_chars"):
        corpus_io.read_documents(spark, p)


def test_shard_assignment_invariants(spark):
    d = _docs(spark)
    shard_tokens = 2000
    rows = (
        corpus_io.shard_assignments(d, shard_tokens)
        .withColumn("n_tok", F.size(F.split("text", " ")).cast("long"))
        .orderBy("lang", "doc_id")
        .collect()
    )
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang) > 1
    for lang, rs in by_lang.items():
        shards = [r["shard"] for r in rs]
        # contiguous in stream order: shard ids monotone, starting at 0
        assert shards[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(shards, shards[1:]))
        max_doc = max(r["n_tok"] for r in rs)
        mass = {}
        for r in rs:
            mass[r["shard"]] = mass.get(r["shard"], 0) + r["n_tok"]
        last = max(mass)
        # a shard covers token interval [s*T, (s+1)*T); a doc is counted
        # in the shard its FIRST token lands in, so mass is within
        # max_doc of T on both sides for every shard but the last
        for s, m in mass.items():
            assert m < shard_tokens + max_doc, (lang, s)
            if s != last:
                assert m > shard_tokens - max_doc, (lang, s)


def test_shard_big_path_matches_small_path(spark):
    d = _docs(spark)
    small = corpus_io.shard_assignments(d, 2000)
    big = corpus_io.shard_assignments(d, 2000, small_threshold=0)
    assert _sorted_rows(small) == _sorted_rows(big)


def test_write_corpus_shards_json(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "shards_json")
    corpus_io.write_corpus_shards(d, path, shard_tokens=2000, fmt="json")
    back = spark.read.json(path)
    assert back.count() == d.count()
    assert "shard" in back.columns


def test_write_corpus_shards_partitions(spark, tmp_path):
    d = _docs(spark)
    path = str(tmp_path / "shards")
    corpus_io.write_corpus_shards(d, path, shard_tokens=2000)
    back = spark.read.parquet(path)
    # partition columns recovered; full content preserved
    assert set(back.columns) == set(corpus_io.DOC_COLS) | {"shard"}
    assert _sorted_rows(back.select(*corpus_io.DOC_COLS)) == _sorted_rows(d)
    # rerun is byte-identical shard membership
    a = _sorted_rows(back.select("doc_id", "lang", "shard"))
    corpus_io.write_corpus_shards(d, path, shard_tokens=2000)
    b = _sorted_rows(spark.read.parquet(path).select("doc_id", "lang", "shard"))
    assert a == b


def test_csv_roundtrip_with_embedded_newlines(spark, tmp_path):
    """r4 ADVICE: write_documents quotes newline-bearing text correctly;
    the reader must parse it back intact (multiLine), not misalign or
    null it in PERMISSIVE mode."""
    rows = [
        (1, "line one\nline two", "en", "s0", 17),
        (2, "plain", "en", "s0", 5),
        (3, "a\n\nb, with, commas\nand \"quotes\"", "de", "s1", 31),
    ]
    d = spark.createDataFrame(rows, corpus_io.DOCUMENTS_SCHEMA)
    path = str(tmp_path / "nl_csv")
    corpus_io.write_documents(d, path, fmt="csv")
    back = corpus_io.read_documents(spark, path, fmt="csv")
    assert _sorted_rows(back) == _sorted_rows(d)
    # no silent nulls anywhere
    assert back.filter(F.col("text").isNull()).count() == 0
