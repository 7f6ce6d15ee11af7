"""Multimodal operators: real BMP/WAV/y4m codecs (stdlib+numpy),
magic-byte sniffing, container stats, exact payload dedup, frame
sampling, image resize, and the actor-pool feature stage."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data

from clonehunter_ray.pipelines.multimodal import (
    MEDIA_SCHEMA,
    DecodeError,
    MediaFeatureStage,
    byte_entropy,
    decode_bmp,
    decode_wav,
    decode_y4m,
    dedup_media_exact,
    encode_bmp,
    encode_wav,
    encode_y4m,
    extract_media_features,
    media_container_stats,
    resize_images,
    resize_nearest,
    sample_video_frames,
    sniff_mime,
    synthesize_media_table,
)


# ---------------------------------------------------------------- codecs


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (5, 7), (16, 16), (11, 33)]:
        pixels = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        decoded = decode_bmp(encode_bmp(pixels))
        assert decoded.shape == (h, w, 3)
        assert np.array_equal(decoded, pixels)


def test_wav_roundtrip_exact():
    rng = np.random.RandomState(4)
    samples = (rng.randn(1234) * 10000).astype(np.int16)
    decoded, rate = decode_wav(encode_wav(samples, rate=8000))
    assert rate == 8000
    assert decoded.shape == (1234, 1)
    assert np.array_equal(decoded[:, 0], samples)


def test_y4m_roundtrip_exact():
    rng = np.random.RandomState(5)
    frames = rng.randint(0, 256, (6, 12, 20)).astype(np.uint8)
    decoded, fps = decode_y4m(encode_y4m(frames, fps=30))
    assert fps == 30
    assert np.array_equal(decoded, frames)


def test_sniff_mime_known_magics():
    assert sniff_mime(b"BM" + b"\x00" * 20) == "image/bmp"
    assert sniff_mime(b"\x89PNG\r\n\x1a\nrest") == "image/png"
    assert sniff_mime(b"\xff\xd8\xff\xe0JFIF") == "image/jpeg"
    assert sniff_mime(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "audio/wav"
    assert sniff_mime(b"YUV4MPEG2 W2 H2") == "video/x-yuv4mpeg"
    assert sniff_mime(b"\x00\x00\x00\x18ftypmp42") == "video/mp4"
    assert sniff_mime(b"garbage") == "application/octet-stream"


def test_decode_rejects_compressed_formats():
    with pytest.raises(DecodeError):
        decode_bmp(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(DecodeError):
        decode_wav(b"OggS" + b"\x00" * 64)
    with pytest.raises(DecodeError):
        decode_y4m(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64)


def test_resize_nearest_shapes_and_identity():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (10, 14, 3)).astype(np.uint8)
    assert np.array_equal(resize_nearest(img, 10, 14), img)
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    # every output pixel is an actual input pixel
    assert set(small.ravel()) <= set(img.ravel())


def test_byte_entropy_bounds():
    assert byte_entropy(b"") == 0.0
    assert byte_entropy(b"\x00" * 1000) == 0.0
    assert byte_entropy(bytes(range(256)) * 8) == pytest.approx(8.0)


# ------------------------------------------------------------ synthesis


def test_media_table_deterministic_typed_real_payloads():
    t1 = synthesize_media_table(32, seed=9)
    t2 = synthesize_media_table(32, seed=9)
    assert t1.schema.equals(MEDIA_SCHEMA)
    assert t1.equals(t2)
    assert set(t1["kind"].to_pylist()) == {"image", "audio", "video"}
    # payloads are REAL containers: sniffed mime matches the kind
    for kind, payload in zip(t1["kind"].to_pylist(), t1["payload"].to_pylist()):
        expected = {
            "image": "image/bmp",
            "audio": "audio/wav",
            "video": "video/x-yuv4mpeg",
        }[kind]
        assert sniff_mime(payload) == expected


def test_media_table_has_planted_exact_dups():
    t = synthesize_media_table(48, seed=7)
    payloads = t["payload"].to_pylist()
    kinds = t["kind"].to_pylist()
    assert len(set(payloads)) < len(payloads)
    # EVERY media kind must have dedup positives (the 24-stride seed
    # reuse stays within one kind; a cross-kind reuse is never a dup)
    for kind in ("image", "audio", "video"):
        kp = [p for p, k in zip(payloads, kinds) if k == kind]
        assert len(set(kp)) < len(kp), f"no planted dup for {kind}"


# -------------------------------------------------------- feature stage


def test_feature_stage_deterministic_and_content_sensitive():
    stage = MediaFeatureStage(dim=16)
    t = synthesize_media_table(9, seed=1)
    out1, out2 = stage(t), stage(t)
    assert out1.equals(out2)
    feats = out1["feature"].to_pylist()
    assert all(len(f) == 16 for f in feats)
    for f in feats:
        assert abs(np.linalg.norm(f) - 1.0) < 1e-9
    assert all(out1["decode_ok"].to_pylist())
    # distinct contents give distinct features (content-derived, not a
    # hash of metadata)
    assert len({tuple(f) for f in feats}) > 1


def test_feature_stage_image_thumbnail_semantics():
    import pyarrow as pa_

    # constant-color image -> constant thumbnail block in the feature
    pixels = np.full((20, 20, 3), 128, np.uint8)
    batch = pa_.table(
        {
            "media_id": pa_.array([0], pa_.int64()),
            "kind": pa_.array(["image"]),
            "payload": pa_.array([encode_bmp(pixels)], pa_.binary()),
        }
    )
    out = MediaFeatureStage(dim=22)(batch)
    feat = np.array(out["feature"].to_pylist()[0])
    # first 16 dims are the 4x4 luma thumbnail: all equal for a flat image
    assert np.allclose(feat[:16], feat[0])


def test_feature_stage_undecodable_modes():
    import pyarrow as pa_

    batch = pa_.table(
        {
            "media_id": pa_.array([0], pa_.int64()),
            "kind": pa_.array(["image"]),
            "payload": pa_.array([b"\x89PNG\r\n\x1a\n" + b"\x00" * 32], pa_.binary()),
        }
    )
    with pytest.raises(DecodeError):
        MediaFeatureStage(dim=8)(batch)
    out = MediaFeatureStage(dim=8, on_undecodable="null")(batch)
    assert out["decode_ok"].to_pylist() == [False]
    assert out["feature"].to_pylist() == [[0.0] * 8]


# ------------------------------------------------------------- datasets


def test_extract_media_features_e2e(ray_session):
    media = ray.data.from_arrow(synthesize_media_table(48, seed=4))
    feats = extract_media_features(media, dim=16, concurrency=2, batch_size=8)
    df = feats.to_pandas()
    assert len(df) == 48
    assert set(df.columns) == {"media_id", "kind", "feature", "decode_ok"}
    assert sorted(df.media_id) == list(range(48))
    assert df.decode_ok.all()


def test_container_stats_and_exact_dedup(ray_session):
    t = synthesize_media_table(48, seed=7)
    media = ray.data.from_arrow(t)
    stats = media_container_stats(media).to_pandas()
    assert len(stats) == 48
    assert (stats.entropy > 0).all()
    assert set(stats.sniffed_mime) == {
        "image/bmp", "audio/wav", "video/x-yuv4mpeg"
    }
    deduped = dedup_media_exact(media).to_pandas()
    n_unique_payloads = len(set(t["payload"].to_pylist()))
    assert len(deduped) == n_unique_payloads
    assert deduped.n_copies.sum() == 48
    assert (deduped.n_copies > 1).any()
    # keep-min: every kept id is the smallest in its group
    dup_shas = set(stats.payload_sha256[stats.payload_sha256.duplicated()])
    for sha in dup_shas:
        group_ids = stats.media_id[stats.payload_sha256 == sha]
        kept = deduped.media_id[deduped.payload_sha256 == sha].iloc[0]
        assert kept == group_ids.min()


def test_sample_video_frames_and_resize_images(ray_session):
    t = synthesize_media_table(24, seed=11)
    media = ray.data.from_arrow(t)
    frames = sample_video_frames(media, k=3).to_pandas()
    n_videos = sum(1 for k in t["kind"].to_pylist() if k == "video")
    assert frames.media_id.nunique() == n_videos
    assert (frames.groupby("media_id").size() <= 3).all()
    # sampled frames are themselves decodable BMPs
    first = decode_bmp(frames.frame_bmp.iloc[0])
    assert first.shape == (16, 16, 3)

    resized = resize_images(media, out_h=8, out_w=8).to_pandas()
    n_images = sum(1 for k in t["kind"].to_pylist() if k == "image")
    assert len(resized) == n_images
    for p in resized.payload:
        assert decode_bmp(p).shape == (8, 8, 3)


def test_null_mode_survives_truncated_payloads():
    """on_undecodable='null' must survive MALFORMED (not just
    unsupported-codec) payloads: truncated BMP/WAV/y4m raise
    codec-internal struct/ValueError which must normalize to
    DecodeError, zero-vector + decode_ok=false — one bad payload must
    not kill the job."""
    import pyarrow as pa

    stage = MediaFeatureStage(dim=8, on_undecodable="null")
    bad = pa.table(
        {
            "media_id": pa.array([0, 1, 2], pa.int64()),
            "kind": pa.array(["image", "video", "audio"], pa.string()),
            "payload": pa.array(
                [b"BM" + b"\x00" * 8, b"YUV4MPEG2 W16 H16", b"RIFF\x00\x00"],
                pa.binary(),
            ),
        }
    )
    out = stage(bad)
    assert out["decode_ok"].to_pylist() == [False, False, False]
    assert all(f == [0.0] * 8 for f in out["feature"].to_pylist())

    import pytest

    from clonehunter_ray.pipelines.multimodal import DecodeError

    strict = MediaFeatureStage(dim=8, on_undecodable="raise")
    with pytest.raises(DecodeError):
        strict(bad)
