"""Corpus sources and sinks: schema-pinned readers for the document table
in the formats a web-corpus actually arrives in (parquet / jsonl / csv),
and the token-balanced shard WRITER a 100 TB corpus-prep job ends with.

Readers pin the canonical schema explicitly — schema inference is banned
(at scale it is a second full read of the data for json/csv, and a
nondeterministic one: inferred types can flip between snapshots).

The shard writer is the sink half of ``textops/packing.py``: documents
are laid out in the deterministic (lang, doc_id) stream order and cut
into shards of ~``shard_tokens`` whitespace tokens via the two-phase
grouped prefix sum (``operators/prefix.py`` — no per-language
single-task window at scale). Output is partitioned by (lang, shard):
each shard directory holds a contiguous, reproducible slice of the
stream, so a re-run of a failed write produces byte-identical shard
membership (the corpus_sample_stratified rerun property, applied to the
write path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spider_core_spark.operators.prefix import with_group_prefix_sum
from spider_core_spark.textops.dedup import (
    release_staged_from,
    stage_handle,
    staged_mark,
)

DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

SHARD_TOKENS = 4096


def read_documents(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a document table in any supported format, normalized to the
    canonical column order. Unknown extra columns are dropped; missing
    columns fail loudly (a schema drift a 100 TB job must not paper
    over)."""
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "json":
        df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    elif fmt == "csv":
        # multiLine: write_documents quotes embedded newlines correctly;
        # without it the read side would split quoted records at the
        # newline and silently misalign/null real web text (round-4
        # ADVICE). Costs splittability — a multiLine csv file is one
        # read task per FILE, not per block — which is the honest price
        # of csv for newline-bearing text; parquet/jsonl are the scale
        # formats.
        df = (
            spark.read.schema(DOCUMENTS_SCHEMA)
            .option("header", "true")
            .option("escape", '"')
            .option("multiLine", "true")
            .csv(path)
        )
    else:
        raise ValueError(f"unsupported corpus format: {fmt!r}")
    missing = [c for c in DOC_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"corpus at {path} missing columns: {missing}")
    return df.select(*DOC_COLS)


def write_documents(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """Plain sink in any supported format (csv quotes/escapes free text)."""
    w = df.select(*[c for c in DOC_COLS if c in df.columns]).write.mode(mode)
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "csv":
        w.option("header", "true").option("escape", '"').csv(path)
    else:
        raise ValueError(f"unsupported corpus format: {fmt!r}")


def shard_assignments(
    df: DataFrame,
    shard_tokens: int = SHARD_TOKENS,
    small_threshold: int | None = None,
) -> DataFrame:
    """Deterministic (lang, shard) assignment: shard = exclusive
    cumulative token count div shard_tokens in (lang, doc_id) stream
    order. Every shard except a language's last holds >= shard_tokens
    and < shard_tokens + max_doc_tokens whitespace tokens."""
    d = df.select(
        *DOC_COLS,
        F.size(F.split("text", " ")).cast("long").alias("_n_tokens"),
    )
    kwargs = {}
    if small_threshold is not None:
        kwargs["small_threshold"] = small_threshold
    out, release = with_group_prefix_sum(
        d, ["lang"], ["doc_id"], "_n_tokens", "_start_tok", **kwargs
    )
    result = out.select(
        *DOC_COLS,
        F.expr(f"_start_tok div {shard_tokens}").cast("long").alias("shard"),
    )
    # big path: the checkpointed ranged intermediate must outlive the
    # caller's terminal action (the write) — register the release handle
    # for draining via release_staged_caches() AFTER the action, never
    # before it (the round-4 verdict hazard; see operators/prefix.py).
    stage_handle(release)
    return result


def write_corpus_shards(
    df: DataFrame,
    path: str,
    shard_tokens: int = SHARD_TOKENS,
    fmt: str = "parquet",
    small_threshold: int | None = None,
) -> None:
    """Token-balanced partitioned corpus sink: one directory per
    (lang, shard), contiguous in the deterministic stream order. At
    scale, pair with spark.sql.files.maxRecordsPerFile if individual
    shard directories must split further."""
    mark = staged_mark()
    sharded = shard_assignments(df, shard_tokens, small_threshold=small_threshold)
    w = sharded.write.mode("overwrite").partitionBy("lang", "shard")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "json":
        w.json(path)
    else:
        raise ValueError(f"unsupported shard format: {fmt!r}")
    # the write IS the terminal action — drain this call's staged handles
    release_staged_from(mark)
