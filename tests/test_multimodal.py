"""Multimodal binary-column plumbing: schema, batching, determinism, and
the clearly-marked decoder stub."""

import pytest
from pyspark.sql import functions as F

from spider_core_spark.textops import multimodal as mm


def test_features_deterministic_across_partitionings(spark):
    media = mm.synth_media_df(spark, 48)
    a = {
        r["media_id"]: tuple(r["feature"])
        for r in mm.extract_features(media.repartition(1)).collect()
    }
    b = {
        r["media_id"]: tuple(r["feature"])
        for r in mm.extract_features(media.repartition(7)).collect()
    }
    assert a == b and len(a) == 48
    assert all(len(v) == mm.FEATURE_DIM for v in a.values())


def test_frame_sampling_counts(spark):
    media = mm.synth_media_df(spark, 30)
    frames = mm.sample_frames(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("kind = 'video'").collect()
    }
    assert {r["media_id"] for r in got} == set(durations)
    for r in got:
        assert r["count"] == max(durations[r["media_id"]] // 1000, 1)


def test_real_decoder_is_stubbed(spark):
    media = mm.synth_media_df(spark, 4)
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, deterministic=False).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)
