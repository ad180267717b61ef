"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
deterministic stub decode, frame sampling, per-modality profile."""

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.multimodal import (
    ASSET_SCHEMA,
    FEATURE_SCHEMA,
    extract_features,
    frame_sample,
    gen_assets,
    profile_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return gen_assets(spark, 300)


def test_asset_schema_and_determinism(spark, assets):
    # generated expressions carry tighter nullability; names+types must match
    assert [(f.name, f.dataType.simpleString()) for f in assets.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in ASSET_SCHEMA.fields
    ]
    a = assets.orderBy("asset_id").limit(3).collect()
    b = gen_assets(spark, 300).orderBy("asset_id").limit(3).collect()
    assert [r.data for r in a] == [r.data for r in b]  # seeded → identical bytes
    sizes = {r.modality: len(r.data) for r in assets.limit(50).collect()}
    assert sizes["image"] == 64 * 16 and sizes["video"] == 1024 * 16


def test_extract_features_batch_shape(spark, assets):
    feats = extract_features(assets)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 300
    r = rows[0]
    assert r.n_bytes > 0 and 0 <= r.byte_mean <= 255
    assert r.decoded is False  # stub decode clearly marked


def test_frame_sample(spark, assets):
    frames = frame_sample(assets, every_n=10, frame_bytes=16)
    rows = frames.collect()
    assert all(len(r.frame_data) == 16 for r in rows)
    per_asset = frames.groupBy("asset_id").count().collect()
    # n_frames in [1,30], sampled every 10 → 1-3 frames per video
    assert all(1 <= r["count"] <= 3 for r in per_asset)


def test_profile_assets(spark, assets):
    prof = {r.modality: r for r in profile_assets(assets).collect()}
    assert set(prof) == {"image", "audio", "video"}
    assert prof["video"].min_bytes == prof["video"].max_bytes == 1024 * 16
    assert prof["image"].asset_count == 100
