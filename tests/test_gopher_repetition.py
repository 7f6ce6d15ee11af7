"""Gopher repetition filter pinned against a per-doc pure-Python
reference implementing the exact documented accounting (dict/set
loops vs the engine's lexsort/interval-union vectorization)."""

from __future__ import annotations

import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clonehunter_ray.pipelines.queries import (  # noqa: E402
    GOPHER_REPETITION_RULES,
    gopher_repetition_batch,
)

SF_DIR = "/root/testdata/sf0.001"


def ref_signals(text: str | None) -> dict[str, float]:
    text = text or ""
    toks = re.findall(r"[a-z0-9_]+", text.lower())
    tot = sum(len(t) for t in toks)
    out: dict[str, float] = {}
    for sep, name in (("\n", "line"), ("\n\n", "para")):
        parts = text.split(sep)
        seen: set[str] = set()
        dup_cnt = 0
        dup_chr = 0
        for p in parts:
            if p in seen:
                dup_cnt += 1
                dup_chr += len(p)
            else:
                seen.add(p)
        out[f"dup_{name}_frac"] = dup_cnt / len(parts)
        out[f"dup_{name}_char_frac"] = dup_chr / max(len(text), 1)
    for n in (2, 3, 4):
        grams: dict[tuple, int] = {}
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            grams[g] = grams.get(g, 0) + 1
        if grams:
            cmax = max(grams.values())
            w = max(
                sum(len(t) for t in g)
                for g, c in grams.items()
                if c == cmax
            )
            out[f"top_{n}gram_char_frac"] = (cmax * w) / max(tot, 1)
        else:
            out[f"top_{n}gram_char_frac"] = 0.0
    for n in range(5, 11):
        pos: dict[tuple, list[int]] = {}
        for i in range(len(toks) - n + 1):
            pos.setdefault(tuple(toks[i : i + n]), []).append(i)
        cov: set[int] = set()
        for g, ps in pos.items():
            if len(ps) >= 2:
                for p in ps:
                    cov.update(range(p, p + n))
        out[f"dup_{n}gram_char_frac"] = (
            sum(len(toks[i]) for i in cov) / max(tot, 1)
        )
    return out


def ref_keep(text: str | None) -> bool:
    s = ref_signals(text)
    return all(s[k] <= v for k, v in GOPHER_REPETITION_RULES.items())


ADVERSARIAL = [
    None,
    "",
    "single",
    "unique tokens only here nothing repeats at all ever once",
    # duplicate lines (4 of 6 lines identical)
    "\n".join(["same line of text"] * 4 + ["other one", "another"]),
    # duplicate paragraphs
    "\n\n".join(["para one is here"] * 3 + ["different paragraph"]),
    # top-2gram heavy
    "x y " * 30 + "tail tokens here",
    # repeated 10-gram block (coverage rule)
    "a b c d e f g h i j " * 5,
    # overlapping dup 5-grams (coverage must count chars once)
    "p q r s t p q r s t p q r s t",
    # long tokens skew char weights vs counts
    "longtoken other longtoken other longtoken stop "
    "xx yy xx yy xx yy xx yy",
    # count/weight tie-break: two bigrams with equal max count,
    # different char weights
    "aa bb aa bb ccc ddd ccc ddd unique1 unique2",
    # newline + tokens mixture
    "first line here\nsecond line\nfirst line here\n\nfirst line here",
]


def _batch(texts) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_signals_match_reference_adversarial():
    # disable filtering (bounds = inf) so every doc's signals emit
    rules = {k: float("inf") for k in GOPHER_REPETITION_RULES}
    got = gopher_repetition_batch(_batch(ADVERSARIAL), rules).to_pandas()
    assert len(got) == len(ADVERSARIAL)
    for i, text in enumerate(ADVERSARIAL):
        want = ref_signals(text)
        row = got[got.doc_id == i].iloc[0]
        for k, v in want.items():
            assert row[k] == v, (i, k, row[k], v)


def test_signals_match_reference_corpus():
    path = f"{SF_DIR}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    t = pq.read_table(path, columns=["doc_id", "text"])
    rules = {k: float("inf") for k in GOPHER_REPETITION_RULES}
    got = (
        gopher_repetition_batch(t, rules)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    texts = t["text"].to_pylist()
    for i in range(0, len(texts), 7):  # every 7th doc: 72 spot checks
        want = ref_signals(texts[i])
        row = got.iloc[i]
        for k, v in want.items():
            assert row[k] == v, (i, k)


def test_filter_semantics_match_reference():
    got = gopher_repetition_batch(_batch(ADVERSARIAL)).to_pandas()
    kept = set(got.doc_id)
    for i, text in enumerate(ADVERSARIAL):
        assert (i in kept) == ref_keep(text), (i, ref_signals(text))
    # the heavy repeaters must actually be dropped
    assert 4 not in kept  # duplicate lines
    assert 6 not in kept  # top-2gram
    assert 7 not in kept  # repeated 10-gram


def test_filter_e2e_dataset(ray_session):
    import __ray_entry__ as E

    path = f"{SF_DIR}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    ds = E.queries()["gopher_repetition_filter_documents"](SF_DIR)
    got = ds.to_pandas()
    t = pq.read_table(path, columns=["doc_id", "text"])
    local = gopher_repetition_batch(t).to_pandas()
    assert sorted(got.doc_id) == sorted(local.doc_id)
    assert len(got) > 0
