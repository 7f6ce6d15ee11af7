"""ANN variants (LSH-bucketed and IVF) against the brute-force oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from clonehunter_ray.pipelines.similarity import ivf_knn_cosine, lsh_knn_cosine


def _clustered_embeddings(n=300, dim=16, n_clusters=6, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 4
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + rng.normal(size=dim) * 0.3
        rows.append({"vec_id": i, "embedding": v.tolist()})
    return rows


def _brute_topk_ids(rows, query_ids, k):
    mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in query_ids:
        sims = mat @ mat[q]
        order = sorted(range(len(rows)), key=lambda i: (-sims[i], i))[:k]
        out[q] = order
    return out


def test_ivf_knn_recall_on_clustered_data(ray_session):
    rows = _clustered_embeddings()
    ds = ray.data.from_items(rows)
    qids = [0, 1, 2]
    got = ivf_knn_cosine(ds, qids, k=10, n_cells=8, nprobe=3).to_pandas()
    brute = _brute_topk_ids(rows, qids, 10)
    for q in qids:
        mine = set(got[got.query_id == q].vec_id)
        truth = set(brute[q])
        recall = len(mine & truth) / len(truth)
        assert recall >= 0.8, f"query {q} recall {recall}"
    # ranks are 1..k and unique per query
    for q in qids:
        ranks = sorted(got[got.query_id == q]["rank"])
        assert ranks == list(range(1, len(ranks) + 1))


def test_lsh_knn_returns_ranked_neighbors(ray_session):
    rows = _clustered_embeddings()
    ds = ray.data.from_items(rows)
    got = lsh_knn_cosine(ds, [0, 5], k=5).to_pandas()
    for q in (0, 5):
        sub = got[got.query_id == q]
        assert len(sub) >= 1
        # the query itself is its own nearest neighbor
        assert sub[sub["rank"] == 1].vec_id.iloc[0] == q
