"""Middleware chain semantics (SURVEY.md X2, reference
src/crawler/middleware_manager.rs:25-64) and pipeline semantics (X3,
src/crawler/item_processor.rs:64-133)."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark.api import middleware as mw
from spider_core_spark.api.pipeline import (
    DedupeItemsPipeline,
    FieldFilterPipeline,
    run_pipelines,
)


@pytest.fixture()
def reqs(spark):
    return spark.createDataFrame(
        [
            ("https://a.test/x", 0, 200),
            ("https://a.test/private/1", 0, 200),
            ("https://b.test/y", 0, 500),
            ("https://b.test/z", 2, 500),
        ],
        "url string, retry_count int, status int",
    ).withColumn("fetch_bytes", F.lit(10).cast("long"))


def _actions(df):
    return {r["url"]: r[mw.ACTION] for r in df.collect()}


def test_drop_url_pattern_forward_chain(spark, reqs):
    out = mw.run_request_chain(reqs, [mw.DropUrlPattern("/private/")])
    acts = _actions(out)
    assert acts["https://a.test/private/1"] == mw.DROP
    assert acts["https://a.test/x"] == mw.CONTINUE


def test_retry_on_status_and_exhaustion(spark, reqs):
    out = mw.run_response_chain(
        reqs, [mw.RetryOnStatus(statuses=(500,), max_retries=1, delay_epochs=2)]
    )
    acts = _actions(out)
    assert acts["https://b.test/y"] == mw.RETRY  # retry_count 0 < 1
    assert acts["https://b.test/z"] == mw.DROP  # retry_count 2 ≥ max
    assert acts["https://a.test/x"] == mw.CONTINUE
    delays = {r["url"]: r[mw.RETRY_DELAY] for r in out.collect()}
    assert delays["https://b.test/y"] == 2


def test_short_circuit_first_action_wins(spark, reqs):
    # first middleware drops /private/, second would drop everything at
    # a.test — but the chain must not re-tag already-dropped rows, and the
    # second still applies to rows that continued
    class DropHostA(mw.Middleware):
        def request_action(self, df):
            return (
                F.when(F.col("url").contains("a.test"), F.lit(mw.DROP)).otherwise(
                    F.lit(mw.CONTINUE)
                ),
                F.lit(0),
            )

    out = mw.run_request_chain(reqs, [mw.DropUrlPattern("/private/"), DropHostA()])
    acts = _actions(out)
    assert acts["https://a.test/private/1"] == mw.DROP  # from first
    assert acts["https://a.test/x"] == mw.DROP  # from second
    assert acts["https://b.test/y"] == mw.CONTINUE


def test_response_chain_is_reversed(spark, reqs):
    """Reference reverses the response chain (middleware_manager.rs:52-53):
    with [tag_A, tag_B], responses must see B first."""

    class Tag(mw.Middleware):
        def __init__(self, label):
            self.label = label

        def response_action(self, df):
            # DROP with the label as delay marker; first non-continue wins
            return F.lit(mw.DROP), F.lit(self.label)

    out = mw.run_response_chain(reqs, [Tag(1), Tag(2)])
    # reversed order → Tag(2) runs first and wins on every row
    assert {r[mw.RETRY_DELAY] for r in out.collect()} == {2}


def test_pipelines_drop_and_order(spark):
    items = spark.createDataFrame(
        [("u1", 5), ("u2", 50), ("u2", 50), ("u3", 500)], "url string, n int"
    )
    out, dropped, pstats = run_pipelines(
        items,
        [FieldFilterPipeline("n >= 50"), DedupeItemsPipeline(key="url")],
        epoch=0,
        per_pipeline=True,
    )
    rows = {r["url"] for r in out.collect()}
    assert rows == {"u2", "u3"}
    assert dropped == 2  # one filtered + one deduped
    # A7: per-pipeline (time, count) rows in order
    assert [p["pipeline"] for p in pstats] == ["field_filter", "dedupe_items"]
    assert pstats[0]["n_in"] == 4 and pstats[0]["n_out"] == 3
    assert pstats[1]["n_in"] == 3 and pstats[1]["n_out"] == 2
    assert all(p["ms"] > 0 for p in pstats)

    # order matters: dedupe-then-filter keeps a different set
    out2, _, _ = run_pipelines(
        items,
        [DedupeItemsPipeline(key="url"), FieldFilterPipeline("n >= 50")],
        epoch=0,
    )
    assert {r["url"] for r in out2.collect()} == {"u2", "u3"}


def test_dedupe_items_cross_epoch(spark, tmp_path):
    state = str(tmp_path / "dedupe_state")
    p = DedupeItemsPipeline(key="url", state_dir=state)
    e0 = spark.createDataFrame([("u1", 1), ("u2", 2)], "url string, n int")
    out0 = p.process(e0, epoch=0)
    assert {r["url"] for r in out0.collect()} == {"u1", "u2"}
    # epoch 1 re-emits u2 → dropped by the cross-epoch state
    e1 = spark.createDataFrame([("u2", 9), ("u3", 3)], "url string, n int")
    out1 = p.process(e1, epoch=1)
    assert {r["url"] for r in out1.collect()} == {"u3"}
    assert p.seen_count == 3


def test_pipeline_state_roundtrip():
    p = DedupeItemsPipeline()
    p.seen_count = 7
    st = p.get_state()
    q = DedupeItemsPipeline()
    q.restore_state(st)
    assert q.seen_count == 7


def test_quality_filter_pipeline(spark):
    from spider_core_spark.api.pipeline import QualityFilterPipeline

    items = spark.createDataFrame(
        [
            ("u1", "the quick brown fox jumps over the lazy dog again and more"),
            ("u2", "a a a a a a a a"),  # zero diversity, tiny
            ("u3", None),
        ],
        "url string, text string",
    )
    out = QualityFilterPipeline(min_score=0.3).process(items, epoch=0)
    assert {r["url"] for r in out.collect()} == {"u1"}
