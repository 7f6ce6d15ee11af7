"""Content-defined chunking: kernel contract (vectorized == reference),
shift-resistance, and the pipeline against an offline oracle."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from clonehunter_ray.functions import cdc
from clonehunter_ray.pipelines.dedup import cdc_chunk_dedup_documents


def _rand_texts(n=40, seed=5):
    rng = np.random.RandomState(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    out = []
    for _ in range(n):
        ln = rng.randint(0, 60)
        out.append(" ".join(rng.choice(words, size=ln).tolist()))
    return out


def test_vectorized_matches_reference_boundaries():
    texts = _rand_texts() + ["", "x", "y" * 500, "z" * (cdc._MAX_LEN * 3)]
    for t in texts:
        raw = t.encode("utf-8")
        want = cdc.cdc_boundaries(raw)
        d, ci, hx, ln = cdc.cdc_chunks_batch([t])
        if not t:
            assert want == [] and len(hx) == 0
            continue
        got_ends = np.cumsum(ln).tolist()
        assert got_ends == want, f"boundary drift on {t[:40]!r}"
        # chunk hashes are sha256 of the exact byte ranges
        start = 0
        for k, e in enumerate(want):
            assert hx[k] == hashlib.sha256(raw[start:e]).hexdigest()
            start = e


def test_chunk_lengths_respect_min_max():
    for t in _rand_texts(seed=9):
        if not t:
            continue
        _, _, _, ln = cdc.cdc_chunks_batch([t])
        # every chunk but the trailing remainder honors [min, max]
        assert (ln <= cdc._MAX_LEN).all()
        if len(ln) > 1:
            assert (ln[:-1] >= cdc._MIN_LEN).all()


def test_shift_resistance_on_prefix_insert():
    """The CDC property: prepending bytes re-aligns after at most a
    couple of chunks — most chunk hashes survive. A fixed-window
    chunker would lose every chunk."""
    rng = np.random.RandomState(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    base = " ".join(rng.choice(words, size=300).tolist())  # ~1.8 KB, no repeats
    shifted = "INSERTED PREFIX >> " + base
    _, _, h_a, _ = cdc.cdc_chunks_batch([base])
    _, _, h_b, _ = cdc.cdc_chunks_batch([shifted])
    ua, ub = set(h_a), set(h_b)
    shared = len(ua & ub)
    # only the chunk containing the insertion point may differ
    assert shared / len(ua) >= 0.8, (shared, len(ua), len(ub))


def test_pipeline_matches_offline_oracle(ray_session):
    texts = _rand_texts(30, seed=3)
    # plant cross-document duplication: shared tails under different
    # prefixes (the case CDC exists for)
    rng = np.random.RandomState(99)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    tail = " ".join(rng.choice(words, size=120).tolist())  # ~700 B shared
    texts += [f"doc{i} unique prefix :: {tail}" for i in range(5)]
    rows = [
        {"doc_id": i, "text": t} for i, t in enumerate(texts)
    ]
    ds = ray.data.from_items(rows)
    got = (
        cdc_chunk_dedup_documents(ds, min_docs=2)
        .to_pandas()
        .sort_values("chunk_hash")
        .reset_index(drop=True)
    )
    # offline oracle: chunk every doc locally, aggregate in pandas
    d, _, hx, ln = cdc.cdc_chunks_batch(texts)
    df = pd.DataFrame({"chunk_hash": hx, "chunk_len": ln, "doc": d})
    want = (
        df.groupby(["chunk_hash", "chunk_len"])
        .agg(n_docs=("doc", "nunique"), n_occ=("doc", "size"))
        .reset_index()
    )
    want = (
        want[want["n_docs"] >= 2]
        .sort_values("chunk_hash")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[["chunk_hash", "chunk_len", "n_docs", "n_occ"]],
        want[["chunk_hash", "chunk_len", "n_docs", "n_occ"]],
        check_dtype=False,
    )
    # the planted shared tail must actually be detected
    assert (got["n_docs"] >= 5).any()


def test_null_and_empty_texts_yield_no_chunks(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array([None, "", "hello world " * 40], pa.string()),
            }
        )
    )
    got = cdc_chunk_dedup_documents(ds, min_docs=1).to_pandas()
    # only doc 2 contributes chunks; every chunk has n_docs == 1
    assert (got["n_docs"] == 1).all()
    assert got["n_occ"].sum() > 0


def test_window_hashes_respect_window_param():
    # regression: _window_hashes once applied the DEFAULT window's
    # coefficient vector to any requested window size
    rng = np.random.RandomState(11)
    data = rng.randint(0, 256, size=300).astype(np.uint8)
    for window in (8, 16, 24):
        got = cdc._window_hashes(data, window=window)
        assert len(got) == len(data) - window + 1
        base = int(cdc._BASE)
        mask = 0xFFFFFFFFFFFFFFFF
        for i in (0, 5, len(got) - 1):
            run = data[i : i + window]
            ref = 0
            for b in run:
                ref = (ref * base + int(b)) & mask
            assert int(got[i]) == ref, (window, i)


def test_simhash_hot_bucket_cap(ray_session):
    """A modal fingerprint mass (here: identical texts, one simhash
    value shared by all) must emit the hamming-verified hub-spoke star
    — O(n) pairs from the min doc_id — instead of O(n^2) pairs."""
    import pyarrow as pa
    import ray.data

    from clonehunter_ray.pipelines.dedup import simhash_dup_pairs

    n = 40
    docs = pa.table(
        {
            "doc_id": list(range(n)),
            "text": ["the same boilerplate text repeated here"] * n,
        }
    )
    pairs = simhash_dup_pairs(
        ray.data.from_arrow(docs), max_bucket_pairs=50
    ).to_pandas()
    # star: exactly n-1 pairs, every pair anchored at the min doc_id
    assert len(pairs) == n - 1
    assert (pairs["a_id"] == 0).all()
    assert set(pairs["b_id"]) == set(range(1, n))
    assert (pairs["hamming"] == 0).all()

    # below the cap the same corpus emits all pairs
    full = simhash_dup_pairs(
        ray.data.from_arrow(docs), max_bucket_pairs=10_000
    ).to_pandas()
    assert len(full) == n * (n - 1) // 2
