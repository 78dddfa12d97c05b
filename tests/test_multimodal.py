"""Multimodal binary-column plumbing (schema, UDF shape, determinism;
decode stubbed — see operators/multimodal.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from energy_aware_entity_resolution_spark.operators.multimodal import (
    decode_and_featurize,
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_fake_featurize_deterministic_unit_vectors(spark):
    media = synthetic_media(spark, 30).cache()
    f1 = {r["media_id"]: r["features"] for r in decode_and_featurize(media).collect()}
    f2 = {r["media_id"]: r["features"] for r in decode_and_featurize(media).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    assert math.isclose(sum(x * x for x in f1[0]), 1.0, abs_tol=1e-6)


def test_real_mode_is_explicitly_stubbed(spark):
    media = synthetic_media(spark, 3)
    with pytest.raises(Exception) as ei:
        decode_and_featurize(media, mode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_resize_rewrites_meta_only(spark):
    media = synthetic_media(spark, 9)
    out = resize_images(media, 32, 32)
    rows = out.select("meta.width", "meta.height", "payload").collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    orig = media.select("payload").collect()
    assert [r["payload"] for r in rows] == [r["payload"] for r in orig]


def test_sample_frames_explodes_videos_only(spark):
    media = synthetic_media(spark, 30)
    frames = sample_frames(media, every_n=10)
    kinds = media.select("media_id", "kind").collect()
    video_ids = {r["media_id"] for r in kinds if r["kind"] == "video"}
    got = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    assert {r["media_id"] for r in got} == video_ids
    for r in frames.collect():
        assert r["frame_idx"] % 10 == 0
