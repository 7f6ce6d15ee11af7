"""Multimodal plumbing: schema, actor-pool feature extraction,
deterministic fake decode, real-decode stub behavior."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data

from clonehunter_ray.pipelines.multimodal import (
    MEDIA_SCHEMA,
    DecodeError,
    MediaFeatureStage,
    extract_media_features,
    synthesize_media_table,
)


def test_media_table_deterministic_and_typed():
    t1 = synthesize_media_table(32, seed=9)
    t2 = synthesize_media_table(32, seed=9)
    assert t1.schema.equals(MEDIA_SCHEMA)
    assert t1.equals(t2)
    kinds = set(t1["kind"].to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_feature_stage_deterministic_unit():
    stage = MediaFeatureStage(dim=8)
    t = synthesize_media_table(6, seed=1)
    out1 = stage(t)
    out2 = stage(t)
    assert out1.equals(out2)
    feats = out1["feature"].to_pylist()
    assert all(len(f) == 8 for f in feats)
    for f in feats:
        assert abs(np.linalg.norm(f) - 1.0) < 1e-9


def test_real_decode_path_raises():
    stage = MediaFeatureStage(deterministic_fake=False)
    with pytest.raises(DecodeError):
        stage._decode(b"\x89PNG...", "image")


def test_extract_media_features_e2e(ray_session):
    media = ray.data.from_arrow(synthesize_media_table(48, seed=4))
    feats = extract_media_features(media, dim=16, concurrency=2, batch_size=8)
    df = feats.to_pandas()
    assert len(df) == 48
    assert set(df.columns) == {"media_id", "kind", "feature"}
    assert sorted(df.media_id) == list(range(48))
