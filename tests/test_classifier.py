"""Classifier-based quality filtering (pipelines/classifier.py):
distributed full-batch logistic regression over hashed bag-of-words.

Pins: (1) the hashing featurizer against a naive Python reference,
(2) distributed training against a single-process numpy reference
running the identical algorithm, (3) end-to-end separability (AUC),
(4) determinism and monotone loss, (5) empty/degenerate inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from clonehunter_ray.functions import hashing as H
from clonehunter_ray.pipelines import classifier as C


def _synthetic(n=400, seed=7):
    rng = np.random.default_rng(seed)
    shared = [f"tok{i}" for i in range(100)]
    pos_v = [f"good{i}" for i in range(50)]
    neg_v = [f"bad{i}" for i in range(50)]
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        toks = list(rng.choice(shared, 20)) + list(
            rng.choice(pos_v if pos else neg_v, 10)
        )
        rows.append(
            {"doc_id": i, "text": " ".join(toks), "label": int(pos)}
        )
    return pa.Table.from_pylist(rows)


def _auc(y: np.ndarray, p: np.ndarray) -> float:
    order = np.argsort(p)
    ranks = np.empty(len(p))
    ranks[order] = np.arange(len(p))
    npos = int((y == 1).sum())
    return float(
        (ranks[y == 1].sum() - npos * (npos - 1) / 2)
        / (npos * (y == 0).sum())
    )


def test_hashed_features_match_naive_reference():
    dim = 256
    texts = ["a b a c", "x", "", "b b b"]
    row, feat, val = C.hashed_features_flat(texts, dim, bigrams=True, norm="tf")
    got = {}
    for r, f, v in zip(row, feat, val):
        got[(int(r), int(f))] = got.get((int(r), int(f)), 0.0) + v
    want = {}
    for r, text in enumerate(texts):
        toks = text.split()
        if not toks:
            continue
        hs = [H.hash_token_u64(t) for t in toks]
        items = [h % dim for h in hs]
        for a, b in zip(hs, hs[1:]):
            mixed = H._mix64(
                np.array([(np.uint64(a) * C._BIGRAM_MIX) ^ np.uint64(b)],
                         dtype=np.uint64)
            )[0]
            items.append(int(mixed) % dim)
        for f in items:
            want[(r, int(f))] = want.get((r, int(f)), 0.0) + 1.0 / len(toks)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_l2_norm_rows_unit_length():
    row, feat, val = C.hashed_features_flat(
        ["a b c d", "a a a"], 4096, bigrams=False, norm="l2"
    )
    for r in (0, 1):
        sq = float((val[row == r] ** 2).sum())
        assert abs(sq - 1.0) < 1e-12


def _local_train(t: pa.Table, dim, epochs, lr, l2=1e-6):
    """Single-process reference: identical algorithm, one big batch."""
    row, feat, val = C.hashed_features_flat(t["text"], dim, True, "l2")
    y = t["label"].to_numpy().astype(np.float64)
    n = len(y)
    w = np.zeros(dim)
    b = 0.0
    losses = []
    prev = None
    step = lr
    epoch = 0
    while epoch < epochs:
        s = np.bincount(row, weights=val * w[feat], minlength=n) + b
        p = 1.0 / (1.0 + np.exp(-s))
        g = p - y
        eps = 1e-12
        loss = float(
            -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
        )
        if losses and loss > losses[-1] and prev is not None and step > lr / 64:
            w, b = prev
            step /= 2.0
            epoch += 1
            continue
        losses.append(loss)
        prev = (w.copy(), b)
        grad = np.bincount(feat, weights=val * g[row], minlength=dim)
        w = w - step * (grad / n + l2 * w)
        b = b - step * (g.sum() / n)
        epoch += 1
    return w, b, losses


def test_distributed_matches_local_reference(ray_session):
    t = _synthetic(200)
    dim, epochs, lr = 2**12, 8, 4.0
    model = C.train_quality_classifier(
        ray.data.from_arrow(t).repartition(4), dim=dim, epochs=epochs, lr=lr
    )
    w, b, losses = _local_train(t, dim, epochs, lr)
    assert np.allclose(model.weights, w, rtol=1e-8, atol=1e-10)
    assert abs(model.bias - b) < 1e-10
    assert np.allclose(model.losses, losses, rtol=1e-8)


def test_train_score_e2e_separable(ray_session):
    t = _synthetic(400)
    ds = ray.data.from_arrow(t).repartition(4)
    model = C.train_quality_classifier(ds, dim=2**14, epochs=25)
    # loss decreased substantially and monotonically (backtracking)
    assert model.losses[-1] < model.losses[0] - 0.2
    assert all(b <= a + 1e-12 for a, b in zip(model.losses, model.losses[1:]))
    scored = C.score_with_classifier(
        ray.data.from_arrow(t), model
    ).to_pandas()
    assert _auc(scored["label"].values, scored["quality_prob"].values) >= 0.99
    # predict_proba (driver-side) agrees with the actor-pool scorer
    local_p = model.predict_proba(t["text"])
    dist_p = scored.sort_values("doc_id")["quality_prob"].values
    assert np.allclose(local_p, dist_p, rtol=1e-10)


def test_training_is_deterministic(ray_session):
    t = _synthetic(120, seed=3)
    ds = ray.data.from_arrow(t).repartition(3)
    m1 = C.train_quality_classifier(ds, dim=2**12, epochs=5, lr=2.0)
    m2 = C.train_quality_classifier(ds, dim=2**12, epochs=5, lr=2.0)
    assert np.allclose(m1.weights, m2.weights, rtol=1e-12, atol=1e-14)
    assert np.allclose(m1.losses, m2.losses, rtol=1e-12)


def test_empty_and_degenerate_texts(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["", "a", "word word word"], pa.string()),
            "label": pa.array([0, 1, 0], pa.int64()),
        }
    )
    model = C.train_quality_classifier(
        ray.data.from_arrow(t), dim=512, epochs=2, lr=1.0
    )
    scored = C.score_with_classifier(ray.data.from_arrow(t), model).to_pandas()
    assert len(scored) == 3
    assert scored["quality_prob"].between(0, 1).all()
    # empty-text row gets the bias-only probability, not NaN
    assert np.isfinite(scored["quality_prob"]).all()
