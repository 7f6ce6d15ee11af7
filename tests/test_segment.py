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
