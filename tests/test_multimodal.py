"""Multimodal plumbing: schema, batch shape, determinism, stub seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from character_identification_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    frame_sample_plan,
    synthetic_media,
)


def test_feature_extraction_shape_and_determinism(spark):
    media = synthetic_media(spark, n=12)
    out = extract_media_features(media, decoder="fake")
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
        assert r["n_bytes"] > 0 and len(r["digest"]) == 32
    again = {r["media_id"]: r["features"] for r in extract_media_features(
        media.repartition(5), decoder="fake").collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_pil_decoder_stub_raises(spark):
    media = synthetic_media(spark, n=3).filter(F.col("kind") == "image")
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(Exception) as ei:
        extract_media_features(media, decoder="pil").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=6)
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    vids = {r["media_id"] for r in media.filter("kind = 'video'").collect()}
    assert {r["media_id"] for r in rows} == vids
