"""BPE tokenizer training/encoding pinned against independent
reference implementations (different algorithms, same spec):

- reference trainer: Counter-based pair counting with explicit
  re-tokenization per round (vs the engine's zip-scan loop);
- reference encoder: ONE leftmost occurrence of the best-rank pair per
  step with full re-evaluation (vs the engine's all-occurrences pass)
  — provably equivalent because a merge can only create pairs of
  strictly higher rank, so divergence would mean a real bug.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clonehunter_ray.pipelines import bpe  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


# ---- independent references -------------------------------------------


def ref_learn(word_counts: dict[str, int], n_merges: int, min_pair: int = 2):
    toks = {w: list(w) + [bpe.END_OF_WORD] for w in word_counts}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in toks.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best_pair = None
        best_cnt = -1
        for p, c in sorted(pairs.items()):
            if c > best_cnt:
                best_pair, best_cnt = p, c
        if best_cnt < min_pair:
            break
        l, r = best_pair
        merges.append((rank, l, r, l + r, best_cnt))
        for w, syms in toks.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            toks[w] = out
    return merges


def ref_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [bpe.END_OF_WORD]
    while True:
        best_i, best_rank = None, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_i, best_rank = i, rk
        if best_i is None:
            return syms
        # merge only the LEFTMOST occurrence of the best-rank pair,
        # then re-evaluate from scratch
        for i in range(len(syms) - 1):
            if ranks.get((syms[i], syms[i + 1])) == best_rank:
                syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
                break


def _docs_table() -> pa.Table:
    path = f"{SF_DIR}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    return pq.read_table(path, columns=["doc_id", "text"])


def _local_word_counts(t: pa.Table) -> dict[str, int]:
    import re

    c: Counter = Counter()
    for txt in t["text"].to_pylist():
        c.update(re.findall(r"[a-z0-9_]+", (txt or "").lower()))
    return dict(c)


# ---- trainer -----------------------------------------------------------


def test_learn_merges_classic_example():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = bpe.learn_merges_local(list(wc), list(wc.values()), 5)
    want = ref_learn(wc, 5)
    assert got == want
    # Sennrich's worked example: ('e','s') with count 9 merges first
    assert got[0][1:] == ("e", "s", "es", 9)
    assert got[1][1:] == ("es", "t", "est", 9)


def test_learn_merges_tie_breaks_lexicographic():
    # two pairs with identical counts: the lexicographically smaller
    # pair must win deterministically
    wc = {"ab": 3, "cd": 3}
    got = bpe.learn_merges_local(list(wc), list(wc.values()), 1)
    assert (got[0][1], got[0][2]) == ("a", "b")


def test_train_distributed_matches_local_reference(ray_session):
    import ray.data

    t = _docs_table()
    got = bpe.bpe_train_merges(ray.data.from_arrow(t), n_merges=30)
    wc = _local_word_counts(t)
    want = ref_learn(wc, 30)
    rows = list(
        zip(
            got["rank"].to_pylist(),
            got["left"].to_pylist(),
            got["right"].to_pylist(),
            got["merged"].to_pylist(),
            got["pair_count"].to_pylist(),
        )
    )
    assert rows == want


def test_train_deterministic(ray_session):
    import ray.data

    t = _docs_table()
    a = bpe.bpe_train_merges(ray.data.from_arrow(t), n_merges=20)
    b = bpe.bpe_train_merges(ray.data.from_arrow(t), n_merges=20)
    assert a.equals(b)


# ---- encoder -----------------------------------------------------------


def test_encode_word_matches_reference():
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "lowest": 1}
    merges = ref_learn(wc, 8)
    ranks = {(l, r): k for k, l, r, _m, _c in merges}
    for w in list(wc) + ["new", "wide", "stew", "l", ""]:
        assert bpe.encode_word(w, ranks) == ref_encode(w, ranks), w


def test_encode_documents_matches_reference(ray_session):
    import re

    import ray.data

    t = _docs_table()
    merges = bpe.bpe_train_merges(ray.data.from_arrow(t), n_merges=30)
    ranks = {
        (l, r): k
        for k, l, r in zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
        )
    }
    got = (
        bpe.bpe_encode_documents(ray.data.from_arrow(t), merges=merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in got.sample(n=60, random_state=7).iterrows():
        txt = t["text"][int(row.doc_id)].as_py() or ""
        words = re.findall(r"[a-z0-9_]+", txt.lower())
        want = sum(len(ref_encode(w, ranks)) for w in words)
        assert row.n_words == len(words)
        assert row.n_bpe_tokens == want, row.doc_id
    # encoding must compress: fewer BPE tokens than chars+eow, more
    # than (or equal to) one token per word
    assert (got.n_bpe_tokens >= got.n_words).all()


def test_encode_edge_cases(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([None, "", "!!! ???", "the the the"], pa.string()),
        }
    )
    merges = pa.table(
        {
            "rank": pa.array([0], pa.int64()),
            "left": pa.array(["t"], pa.string()),
            "right": pa.array(["h"], pa.string()),
            "merged": pa.array(["th"], pa.string()),
            "pair_count": pa.array([3], pa.int64()),
        }
    )
    got = (
        bpe.bpe_encode_documents(ray.data.from_arrow(t), merges=merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.n_words) == [0, 0, 0, 3]
    # "the" -> ["th", "e", "</w>"] = 3 tokens each
    assert list(got.n_bpe_tokens) == [0, 0, 0, 9]
    assert list(got.bpe_per_word) == [0.0, 0.0, 0.0, 3.0]


def test_fertility_by_lang_matches_reference(ray_session):
    import re

    import ray.data

    path = f"{SF_DIR}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    t = pq.read_table(path, columns=["doc_id", "lang", "text"])
    merges = bpe.bpe_train_merges(ray.data.from_arrow(t), n_merges=30)
    got = (
        bpe.bpe_fertility_by_lang(ray.data.from_arrow(t), merges=merges)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    ranks = {
        (l, r): k
        for k, l, r in zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
        )
    }
    # independent per-lang aggregation with the reference encoder
    agg: dict[str, list[int]] = {}
    for lang, txt in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        words = re.findall(r"[a-z0-9_]+", (txt or "").lower())
        nb = sum(len(ref_encode(w, ranks)) for w in words)
        cur = agg.setdefault(str(lang), [0, 0, 0])
        cur[0] += 1
        cur[1] += len(words)
        cur[2] += nb
    assert sorted(got.lang) == sorted(agg)
    for _, row in got.iterrows():
        nd, nw, nb = agg[row.lang]
        assert row.n_docs == nd and row.n_words == nw
        assert row.n_bpe_tokens == nb
        assert row.fertility == nb / max(nw, 1)
    # a trained BPE must compress: fertility strictly below the
    # untrained chars+eow baseline and >= 1 token per word
    assert (got.fertility >= 1.0).all()
