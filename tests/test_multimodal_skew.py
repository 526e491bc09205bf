"""Multimodal plumbing (fake decode mode) + skew helper semantics."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from textcleaning_spark.multimodal.media import (
    FEATURE_DIM,
    extract_features,
    generate_media,
    resize_images,
    sample_frames,
)
from textcleaning_spark.operators.skew import (
    length_bucket,
    repartition_by_length,
    salted_group_count,
    salted_join_small_right,
)
from textcleaning_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


def test_media_features_deterministic(spark):
    media = generate_media(spark, 30, seed=9)
    f1 = {r["media_id"]: list(r["features"]) for r in extract_features(media).collect()}
    f2 = {r["media_id"]: list(r["features"]) for r in extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == FEATURE_DIM for v in f1.values())
    assert len(f1) == 30


def test_media_real_mode_stubbed(spark):
    media = generate_media(spark, 3, seed=9)
    with pytest.raises(NotImplementedError):
        extract_features(media, mode="real")


def test_frame_sampling_expands_rows(spark):
    media = generate_media(spark, 30, seed=9)
    frames = sample_frames(media, every_ms=1000)
    n_videos = media.filter("kind = 'video'").count()
    assert frames.count() >= n_videos  # ≥1 frame per video
    assert frames.select("media_id").distinct().count() == n_videos


def test_resize_rewrites_image_meta(spark):
    media = generate_media(spark, 30, seed=9)
    resized = resize_images(media, 128, 128)
    imgs = resized.filter("kind = 'image'").select("width", "height").distinct().collect()
    assert [(r["width"], r["height"]) for r in imgs] == [(128, 128)]


def test_length_bucket_monotone(spark):
    df = spark.createDataFrame(
        [(0,), (999,), (1000,), (99_999,), (100_000,), (5_000_000,)], ["n"]
    )
    got = [r[0] for r in df.select(length_bucket("n")).collect()]
    assert got == [0, 0, 1, 2, 3, 4]


def test_repartition_by_length_preserves_rows(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = repartition_by_length(docs, "n_chars", 8)
    assert out.count() == docs.count()
    assert out.rdd.getNumPartitions() == 8


def test_salted_group_count_matches_plain(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    plain = {
        (r["lang"],): r["cnt"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        (r["lang"],): r["cnt"] for r in salted_group_count(docs, ["lang"]).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    dims = spark.createDataFrame(
        [("en", "latin"), ("de", "latin"), ("fr", "latin"), ("es", "latin"), ("zh", "cjk")],
        ["lang", "script"],
    )
    plain = docs.join(dims, "lang").count()
    salted = salted_join_small_right(docs, dims, "lang").count()
    assert salted == plain
