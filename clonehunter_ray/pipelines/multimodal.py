"""Multimodal column plumbing (training-data extras).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
environment — see ``DecodeError``), but the Ray-side plumbing is real
and tested: schemas, actor-pool signatures, small batch sizes for wide
binary rows, and deterministic fake feature extraction so the
pipeline's shape can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DecodeError(NotImplementedError):
    """Raised by the real decode path: media codecs are not available
    in this environment. Use deterministic_fake=True for plumbing
    tests; swap in PIL/torchaudio/decord decoders in production."""


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded pseudo-bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.randint(0, 512)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(
            {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
        )
        rows["width"].append(int(rng.randint(16, 512)) if kind != "audio" else 0)
        rows["height"].append(int(rng.randint(16, 512)) if kind != "audio" else 0)
        rows["duration_ms"].append(int(rng.randint(100, 60000)) if kind != "image" else 0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


class MediaFeatureStage:
    """Actor-pool feature extractor over binary media payloads.

    Real mode raises DecodeError (no codecs here); deterministic-fake
    mode derives a D-dim feature from sha256(payload) so tests can
    verify the schema/batching/actor plumbing end-to-end. In
    production, ``__init__`` loads the codec/model once per actor and
    ``_decode`` becomes a real decode + embed.
    """

    def __init__(self, dim: int = 16, deterministic_fake: bool = True) -> None:
        self.dim = dim
        self.fake = deterministic_fake

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise DecodeError(
                "media codecs unavailable in this environment; "
                "run with deterministic_fake=True or plug a real decoder"
            )
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer(
            (digest * ((self.dim * 4) // len(digest) + 1))[: self.dim * 4],
            dtype=np.uint32,
        ).astype(np.float64)
        v = raw / np.float64(2**32)
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, k).tolist()
            for p, k in zip(
                batch["payload"].to_pylist(), batch["kind"].to_pylist()
            )
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )


def extract_media_features(
    media_ds: "ray.data.Dataset",
    dim: int = 16,
    concurrency: int = 2,
    batch_size: int = 16,  # small: wide binary rows
):
    return media_ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"dim": dim, "deterministic_fake": True},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
    )
