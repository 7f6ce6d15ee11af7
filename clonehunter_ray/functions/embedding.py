"""Deterministic stub embeddings + brute cosine top-k — the embedder
parity mode.

The engine's production path is hash signatures (stages/signatures.py);
this module keeps the reference's *deterministic test embedder*
semantics available so cosine-retrieval behavior can be compared
one-to-one:

* ``stub_embed`` reproduces the reference StubEmbedder recipe
  (embedding/stub_embedder.py:9-27): first 16 bytes of sha256(text),
  each byte / 255.0, L2-normalized.
* ``brute_topk`` reproduces BruteIndex retrieval
  (index/brute_index.py:12-45): full cosine matvec with precomputed
  norms and a stable descending argsort.

Both are plain numpy kernels usable inside ``map_batches``.
"""

from __future__ import annotations

import hashlib

import numpy as np

STUB_DIM = 16


def stub_embed(text: str) -> np.ndarray:
    """Reference stub embedding (stub_embedder.py:19-27)."""
    digest = hashlib.sha256(text.encode("utf-8")).digest()[:STUB_DIM]
    v = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def stub_embed_batch(texts: list[str]) -> np.ndarray:
    if not texts:
        return np.empty((0, STUB_DIM), dtype=np.float64)
    return np.stack([stub_embed(t) for t in texts])


def brute_topk(
    matrix: np.ndarray, query: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Stable cosine top-k over a (N, D) matrix (reference
    brute_index.py:36-45: cosine scores, stable descending argsort,
    take k). Returns (indices, scores)."""
    if matrix.size == 0:
        return np.empty(0, dtype=np.intp), np.empty(0)
    norms = np.linalg.norm(matrix, axis=1)
    norms[norms == 0] = 1.0
    qn = np.linalg.norm(query)
    q = query / qn if qn else query
    scores = (matrix @ q) / norms
    # stable sort on negated scores = stable descending order
    order = np.argsort(-scores, kind="stable")[:k]
    return order, scores[order]
