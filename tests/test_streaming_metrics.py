"""Streaming telemetry surfaces: event-time windows + watermark
(late-data handling) and applyInPandasWithState (custom stateful op with
checkpoint-recovered state). Each scenario drives a real file-source
stream in several availableNow runs over the SAME checkpoint, so
watermark advancement and state recovery are exercised for real, not
mocked."""

import os
import uuid

import pandas as pd
import pytest

from spider_core_spark.streaming import metrics_stream as ms


def _write_obs(spark, d, rows):
    df = spark.createDataFrame(
        [(h, pd.Timestamp(ts).to_pydatetime(), b, st, m)
         for h, ts, b, st, m in rows],
        ms.OBS_SCHEMA,
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, f"gen_{uuid.uuid4().hex}")
    )


def _run_windowed(spark, src, ck, out):
    q = (
        ms.windowed_host_metrics(
            spark.readStream.schema(ms.OBS_SCHEMA).parquet(src + "/*")
        )
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()


def _read_out(spark, out):
    files = [
        f for f in os.listdir(out) if f.endswith(".parquet")
    ] if os.path.exists(out) else []
    if not files:
        return []
    return spark.read.parquet(out).collect()


def test_windowed_metrics_watermark_late_data(spark, tmp_path):
    src, ck, out = str(tmp_path / "src"), str(tmp_path / "ck"), str(tmp_path / "out")
    os.makedirs(src)

    # run 1: two hostA rows inside [10:00, 10:01) — watermark far behind,
    # nothing finalizes
    _write_obs(spark, src, [
        ("a.test", "2024-01-01 10:00:10", 100, 200, 100),
        ("a.test", "2024-01-01 10:00:20", 100, 200, 200),
    ])
    _run_windowed(spark, src, ck, out)

    # run 2: a LATE hostA row for the same window (within watermark: the
    # current watermark is 09:58:20) + a row advancing event time to
    # 10:03:30, pushing the watermark to 10:01:30 > the window end
    _write_obs(spark, src, [
        ("a.test", "2024-01-01 10:00:40", 100, 500, 300),
        ("b.test", "2024-01-01 10:03:30", 50, 200, 50),
    ])
    _run_windowed(spark, src, ck, out)

    # run 3: a TOO-LATE hostA row (watermark 10:01:30 already past the
    # window) that must be dropped, + a row closing b's 10:03 window
    _write_obs(spark, src, [
        ("a.test", "2024-01-01 10:00:50", 999, 200, 999),
        ("b.test", "2024-01-01 10:06:00", 50, 404, 60),
    ])
    _run_windowed(spark, src, ck, out)
    # one more empty-ish run so the final no-data batch flushes anything
    # emitted by the run-3 watermark advance
    _write_obs(spark, src, [
        ("b.test", "2024-01-01 10:09:00", 10, 200, 10),
    ])
    _run_windowed(spark, src, ck, out)

    rows = {(str(r["window_start"]), r["host"]): r for r in _read_out(spark, out)}
    key_a = ("2024-01-01 10:00:00", "a.test")
    assert key_a in rows, sorted(rows)
    ra = rows[key_a]
    # the late-but-within-watermark row counted; the too-late row did not
    assert ra["n_fetches"] == 3
    assert ra["total_bytes"] == 300
    assert ra["n_errors"] == 1  # status 500
    assert ra["max_ms"] == 300  # 999 was dropped
    key_b = ("2024-01-01 10:03:00", "b.test")
    assert key_b in rows, sorted(rows)
    assert rows[key_b]["n_fetches"] == 1
    # a window, once finalized, is never re-emitted (append contract)
    assert len([k for k in rows if k[1] == "a.test"]) == 1


def _run_ema(spark, src, ck, name):
    got = []

    def sink(batch, _bid):
        got.extend(batch.collect())

    q = (
        ms.host_ema_state(
            spark.readStream.schema(ms.OBS_SCHEMA).parquet(src + "/*")
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return {r["host"]: r for r in got}


def _py_ema(ms_list):
    ema = 0
    for x in ms_list:
        ema = (ms.EMA_NUM * x + (ms.EMA_DEN - ms.EMA_NUM) * ema) // ms.EMA_DEN
    return ema


def test_host_ema_state_recovers_across_restart(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)

    _write_obs(spark, src, [
        ("a.test", "2024-01-01 10:00:01", 1, 200, 100),
        ("a.test", "2024-01-01 10:00:02", 1, 200, 200),
        ("b.test", "2024-01-01 10:00:03", 1, 200, 50),
    ])
    out1 = _run_ema(spark, src, ck, f"ema_{uuid.uuid4().hex[:8]}")
    assert out1["a.test"]["n_obs"] == 2
    assert out1["a.test"]["ema_ms"] == _py_ema([100, 200])
    assert out1["a.test"]["last_ms"] == 200
    assert out1["b.test"]["ema_ms"] == _py_ema([50])

    # NEW query over the SAME checkpoint: managed state must be
    # recovered, so hostA's EMA continues from (100, 200), not from 0
    _write_obs(spark, src, [
        ("a.test", "2024-01-01 10:00:04", 1, 200, 300),
    ])
    out2 = _run_ema(spark, src, ck, f"ema_{uuid.uuid4().hex[:8]}")
    assert out2["a.test"]["n_obs"] == 3
    assert out2["a.test"]["ema_ms"] == _py_ema([100, 200, 300])
    assert out2["a.test"]["last_ms"] == 300
    # hostB had no new rows this batch: update mode emits nothing for it
    assert "b.test" not in out2


def test_windowed_metrics_column_contract(spark):
    """The expression tree compiles on a batch frame too (Catalyst shares
    the plan) with the documented output schema."""
    batch = spark.createDataFrame([], ms.OBS_SCHEMA)
    cols = ms.windowed_host_metrics(batch).columns
    assert cols == [
        "window_start", "window_end", "host",
        "n_fetches", "total_bytes", "n_errors", "max_ms",
    ]


# ---------------------------------------------------------- streaming HLL
URL_SCHEMA = "url string"


def _write_urls(spark, d, urls):
    spark.createDataFrame([(u,) for u in urls], URL_SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, f"gen_{uuid.uuid4().hex}"))


def _run_hll(spark, src, ck, name):
    q = (
        ms.hll_register_stream(
            spark.readStream.schema(URL_SCHEMA).parquet(src + "/*")
        )
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()
    return {
        r["bucket"]: r["register"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_hll_stream_matches_batch_and_recovers(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)
    batch_of = lambda urls: {
        r["bucket"]: r["register"]
        for r in ms.hll_register_stream(
            spark.createDataFrame([(u,) for u in urls], URL_SCHEMA)
        ).collect()
    }

    urls1 = [f"http://h{i % 7}.test/p{i}" for i in range(300)]
    _write_urls(spark, src, urls1)
    got1 = _run_hll(spark, src, ck, "hll_t1")
    assert got1 == batch_of(urls1)

    # second availableNow run on the SAME checkpoint: state (the sketch)
    # recovers and absorbs only the new file; result == batch over the
    # union — and registers never decrease (max is monotone)
    urls2 = [f"http://h{i % 7}.test/q{i}" for i in range(200)]
    _write_urls(spark, src, urls2)
    got2 = _run_hll(spark, src, ck, "hll_t2")
    assert got2 == batch_of(urls1 + urls2)
    for b, r in got1.items():
        assert got2.get(b, 0) >= r
