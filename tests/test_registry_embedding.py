"""Registry extension surface + stub-embedder parity kernels."""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pytest

from clonehunter_ray import registry
from clonehunter_ray.functions.embedding import (
    STUB_DIM,
    brute_topk,
    stub_embed,
    stub_embed_batch,
)


def test_default_engines_registered():
    assert "semantic" in registry.available_engines()
    assert "sonarqube" in registry.available_engines()
    assert registry.get_signature_stage("minhash") is not None


def test_register_and_get_custom_engine():
    calls = []

    def fake_engine(files_ds, config=None):
        calls.append(files_ds)
        return "result"

    registry.register_engine("fake", fake_engine)
    assert registry.get_engine("fake")("ds") == "result"
    assert calls == ["ds"]
    with pytest.raises(KeyError):
        registry.get_engine("nope")


def test_sonarqube_engine_reads_report(ray_session, tmp_path):
    rep = tmp_path / "sonar.json"
    rep.write_text(
        json.dumps(
            {
                "duplications": [
                    {
                        "a": {"path": "x.py", "name": "f", "start": 1, "end": 5},
                        "b": {"path": "y.py", "name": "g", "start": 1, "end": 5},
                        "duplicated_lines": 5,
                    }
                ]
            }
        )
    )
    ds = registry.get_engine("sonarqube")(None, report_path=str(rep))
    assert ds.count() == 1


def test_stub_embedding_recipe():
    # first 16 bytes of sha256 / 255, L2-normalized (reference
    # stub_embedder.py:19-27 recipe, re-derived from spec)
    text = "def f():\n    return 1"
    v = stub_embed(text)
    assert v.shape == (STUB_DIM,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    raw = np.frombuffer(
        hashlib.sha256(text.encode()).digest()[:16], dtype=np.uint8
    ).astype(np.float64) / 255.0
    np.testing.assert_allclose(v, raw / np.linalg.norm(raw))
    # deterministic
    np.testing.assert_array_equal(v, stub_embed(text))


def test_brute_topk_stable_descending():
    mat = np.array(
        [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.7, 0.7]], dtype=np.float64
    )
    idx, scores = brute_topk(mat, np.array([1.0, 0.0]), k=3)
    # ties (rows 0 and 2, both cos=1) keep first-seen order: stable
    assert idx.tolist() == [0, 2, 3]
    assert scores[0] == scores[1] == 1.0
    assert brute_topk(np.empty((0, 2)), np.array([1.0, 0.0]), 5)[0].size == 0


def test_stub_batch_shapes():
    out = stub_embed_batch(["a", "b", "c"])
    assert out.shape == (3, STUB_DIM)
    assert stub_embed_batch([]).shape == (0, STUB_DIM)
