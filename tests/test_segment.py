"""segment_dedup (C4-style keep-first exact dedup at fixed-token
segments) vs an offline all-pairs oracle."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data


def _oracle(docs: list[tuple[int, str]], n: int) -> dict:
    """Keep-first-occurrence semantics, exact strings, ordered by
    (doc_id, seg_idx) — the DuckDB window-function definition."""
    seen = set()
    res = {}
    for did, text in sorted(docs):
        toks = text.split(" ")
        segs = [
            " ".join(toks[i * n : (i + 1) * n])
            for i in range((len(toks) + n - 1) // n)
        ]
        kept, nd = [], 0
        for s in segs:
            if s in seen:
                nd += 1
            else:
                seen.add(s)
                kept.append(s)
        res[did] = (len(segs), nd, " ".join(kept))
    return res


def _run(docs, seg_tokens, num_partitions=4):
    from clonehunter_ray.pipelines.segment import segment_dedup

    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs], pa.string()),
        }
    )
    out = segment_dedup(
        ray.data.from_arrow(t),
        seg_tokens=seg_tokens,
        num_partitions=num_partitions,
    ).to_pandas()
    return {
        r.doc_id: (r.n_segments, r.n_dup_segments, r.dedup_text)
        for r in out.itertuples()
    }


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _synth(n_docs: int, seed: int) -> list[tuple[int, str]]:
    """Word-soup docs with planted duplicated segments and tails."""
    import random

    rng = random.Random(seed)
    shared = [
        " ".join(rng.choice(WORDS) for _ in range(10)) for _ in range(6)
    ]
    docs = []
    for i in range(n_docs):
        parts = []
        for _ in range(rng.randint(1, 5)):
            if rng.random() < 0.4:
                parts.append(rng.choice(shared))
            else:
                parts.append(
                    " ".join(rng.choice(WORDS) for _ in range(10))
                )
        tail = " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 9)))
        text = " ".join(parts) + ((" " + tail) if tail else "")
        docs.append((i, text))
    return docs


@pytest.mark.parametrize("seed", [1, 7])
def test_segment_dedup_matches_oracle(ray_session, seed):
    docs = _synth(60, seed)
    assert _run(docs, 10) == _oracle(docs, 10)


def test_segment_dedup_partition_invariance(ray_session):
    docs = _synth(40, 3)
    a = _run(docs, 10, num_partitions=2)
    b = _run(docs, 10, num_partitions=16)
    assert a == b == _oracle(docs, 10)


def test_segment_dedup_other_width(ray_session):
    docs = _synth(30, 5)
    assert _run(docs, 4) == _oracle(docs, 4)


def test_segment_dedup_edge_docs(ray_session):
    docs = [
        (0, ""),  # splits to [''] — one empty-string segment
        (1, ""),  # duplicate of doc 0's empty segment
        (2, "single"),
        (3, "single"),  # short-tail duplicate
        (4, "single extra"),  # NOT a duplicate (different segment)
        (5, "a b c d e f g h i j a b c d e f g h i j"),  # self-dup segs
    ]
    assert _run(docs, 10) == _oracle(docs, 10)


def test_segment_dedup_negative_doc_id_rejected(ray_session):
    from clonehunter_ray.pipelines.segment import _explode_segments

    t = pa.table(
        {
            "doc_id": pa.array([-1], pa.int64()),
            "text": pa.array(["a b"], pa.string()),
        }
    )
    with pytest.raises(ValueError):
        _explode_segments(t, 10)


# -- fuzzy (MinHash) segment-level near-dedup --------------------------------


def _para(prefix: str, n: int = 30) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_segment_near_dup_detects_edited_paragraph(ray_session):
    import ray.data

    from clonehunter_ray.pipelines.segment import segment_near_dup_pairs

    shared = _para("w")
    edited = shared.replace("w7", "zzz")  # one real token edit
    rows = [
        {"doc_id": 0, "text": _para("a") + " " + shared},
        {"doc_id": 1, "text": _para("b") + " " + edited + " " + _para("c")},
        {"doc_id": 2, "text": _para("d") + " " + _para("e")},
    ]
    # a 1-token edit in a 30-token segment flips 5 of 26 5-shingles:
    # shingle jaccard ~0.68, so detect at threshold 0.6
    got = segment_near_dup_pairs(
        ray.data.from_items(rows), seg_tokens=30, threshold=0.6
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.doc_a, r.seg_a, r.doc_b, r.seg_b) == (0, 1, 1, 1)
    assert 0.6 <= r.jaccard < 1.0  # the edit is visible in the score


def test_segment_near_dup_matches_offline_allpairs_oracle(ray_session):
    """Every reported pair (and its jaccard) must agree with a
    single-process all-pairs check over the same segment shingles."""
    import itertools

    import numpy as np
    import ray.data

    from clonehunter_ray.config import SignatureConfig
    from clonehunter_ray.functions import hashing as H
    from clonehunter_ray.pipelines.segment import (
        _explode_segment_texts,
        segment_near_dup_pairs,
    )

    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(40)]
    base = [" ".join(rng.choice(vocab, 30)) for _ in range(4)]
    rows = []
    for d in range(8):
        parts = []
        for s in range(3):
            if (d + s) % 3 == 0:
                parts.append(base[(d + s) % 4])  # repeated paragraph
            else:
                parts.append(" ".join(rng.choice(vocab, 30)))
        rows.append({"doc_id": d, "text": " ".join(parts)})
    t = pa.Table.from_pylist(rows)
    cfg = SignatureConfig(shingle_k=5, num_bands=32, band_rows=4)

    got = segment_near_dup_pairs(
        ray.data.from_arrow(t), seg_tokens=30, threshold=0.8, config=cfg
    ).to_pandas()
    got_keys = {
        (r.doc_a, r.seg_a, r.doc_b, r.seg_b): r.jaccard
        for r in got.itertuples()
    }

    seg = _explode_segment_texts(t, 30, 5).to_pylist()
    shingles = {}
    for r in seg:
        th = H.tokenize_hash_texts([r["text"]])[0]
        shingles[r["doc_id"]] = np.unique(H.shingle_hashes(th, 5))
    want = {}
    for a, b in itertools.combinations(sorted(shingles), 2):
        if (a >> 20) == (b >> 20):
            continue  # cross-doc only
        inter = len(np.intersect1d(shingles[a], shingles[b]))
        union = len(shingles[a]) + len(shingles[b]) - inter
        j = inter / union if union else 0.0
        if j >= 0.8:
            key = (a >> 20, a & 0xFFFFF, b >> 20, b & 0xFFFFF)
            want[key] = j
    # identical-paragraph duplicates collide on every band: recall is
    # exact here, and no false positives survive the exact verify
    assert set(got_keys) == set(want), (got_keys, want)
    for k in want:
        assert abs(got_keys[k] - want[k]) < 1e-12


def test_segment_near_dup_empty_and_dup_free(ray_session):
    import ray.data

    from clonehunter_ray.pipelines.segment import segment_near_dup_pairs

    rows = [
        {"doc_id": 0, "text": _para("a")},
        {"doc_id": 1, "text": _para("b")},
    ]
    got = segment_near_dup_pairs(
        ray.data.from_items(rows), seg_tokens=30
    ).to_pandas()
    assert len(got) == 0
