"""Unit tests for the hashing kernels (tokenize/shingle/minhash/simhash)."""

import hashlib

import numpy as np
import pytest

from clonehunter_ray.functions import hashing as H


def test_sha256_matches_reference_recipe():
    # reference io/fingerprints.py:6-7 — utf-8 encode, hexdigest
    assert H.sha256_hex("abc") == hashlib.sha256(b"abc").hexdigest()
    assert H.sha256_hex("héllo") == hashlib.sha256("héllo".encode()).hexdigest()


def test_tokenize_matches_reference_alphabet():
    # reference similarity/lexical.py:18-19
    assert H.tokenize("Foo_bar baz-42 Qux!") == ["foo_bar", "baz", "42", "qux"]
    assert H.tokenize("") == []


def test_token_hashing_is_deterministic_and_batch_consistent():
    lists = [["a", "b", "a"], ["b", "c"], []]
    out1 = H.hash_tokens_batch(lists)
    out2 = H.hash_tokens_batch(lists)
    for a, b in zip(out1, out2):
        assert (a == b).all()
    # same token -> same hash across rows
    assert out1[0][1] == out1[1][0]
    # matches the scalar function
    assert out1[0][0] == H.hash_token_u64("a")
    assert len(out1[2]) == 0


def test_shingles_distinct_sorted_and_short_row_fallback():
    th = H.hash_tokens_batch([["a", "b", "c", "d"], ["a", "b"]])
    sh = H.shingle_hashes(th[0], 3)
    assert len(sh) == 2  # abc, bcd
    assert (np.sort(sh) == sh).all()
    short = H.shingle_hashes(th[1], 3)
    assert len(short) == 1  # fallback single shingle


def test_minhash_estimates_jaccard():
    rng = np.random.RandomState(7)
    A = np.unique(rng.randint(0, 2**63, 2000).astype(np.uint64))
    B = np.unique(
        np.concatenate([A[:1200], rng.randint(0, 2**63, 800).astype(np.uint64)])
    )
    true_j = H.jaccard_sorted(A, B)
    mh = H.MinHasher(256, 123)
    sa, sb = mh.signatures_batch([A, B])
    est = float((sa == sb).mean())
    assert abs(est - true_j) < 0.08
    # batch API == row API
    assert (mh.signature(A) == sa).all()


def test_minhash_identical_sets_identical_signatures():
    mh = H.MinHasher(128, 1)
    x = np.unique(np.arange(100, dtype=np.uint64) * np.uint64(7919))
    s1, s2 = mh.signatures_batch([x, x.copy()])
    assert (s1 == s2).all()


def test_band_hashes_differ_across_band_index():
    mh = H.MinHasher(128, 1)
    sig = mh.signature(np.arange(1, 50, dtype=np.uint64))
    bh = H.band_hashes(sig, 32, 4)
    assert len(set(bh.tolist())) == 32  # band idx mixed in
    batch = H.band_hashes_batch(sig[None, :], 32, 4)
    assert (batch[0] == bh).all()


def test_simhash_similar_sets_small_hamming():
    rng = np.random.RandomState(3)
    A = np.unique(rng.randint(0, 2**63, 500).astype(np.uint64))
    B = np.unique(
        np.concatenate([A[:480], rng.randint(0, 2**63, 20).astype(np.uint64)])
    )
    C = np.unique(rng.randint(0, 2**63, 500).astype(np.uint64))
    sim = H.simhash_batch([A, B, C])
    d_ab = H.hamming_distance_u64(sim[0:1], sim[1:2])[0]
    d_ac = H.hamming_distance_u64(sim[0:1], sim[2:3])[0]
    assert d_ab < d_ac
    assert d_ab <= 10


def test_jaccard_sorted_edges():
    e = np.empty(0, dtype=np.uint64)
    x = np.array([1, 2, 3], dtype=np.uint64)
    assert H.jaccard_sorted(e, x) == 0.0
    assert H.jaccard_sorted(x, x) == 1.0
    y = np.array([2, 3, 4], dtype=np.uint64)
    assert H.jaccard_sorted(x, y) == pytest.approx(0.5)


def test_tokenize_hash_texts_matches_python_path():
    """The Arrow-kernel tokenizer (utf8_lower -> regex split ->
    dictionary_encode) must emit exactly the ordered hashes of the
    Python reference path (tokenize -> hash_tokens_batch)."""
    import pyarrow as pa

    texts = [
        "def foo(bar): return bar + 1",
        "",
        "   ",
        "ABC_def 123\nghi\tjkl!!",
        "café naïve ÜBER_mix",
        "unicode: 日本語 token_1 token_1 token_2",
        "__dunder__ CamelCase snake_case 0xdeadbeef",
    ]
    ref = [H.hash_tokens_batch([H.tokenize(t)])[0] for t in texts]
    for got in (
        H.tokenize_hash_texts(texts),
        H.tokenize_hash_texts(pa.array(texts, pa.string())),
        H.tokenize_hash_texts(pa.chunked_array([texts[:3], texts[3:]])),
    ):
        assert len(got) == len(ref)
        for a, b in zip(ref, got):
            assert b.dtype == np.uint64
            assert np.array_equal(a, b)
    assert H.tokenize_hash_texts([]) == []
    # nulls hash like empty strings
    withnull = pa.array(["a b", None, "c"], pa.string())
    out = H.tokenize_hash_texts(withnull)
    assert len(out[1]) == 0 and len(out[0]) == 2 and len(out[2]) == 1


def test_jaccard_batch_matches_scalar_path():
    """jaccard_batch (vectorized lexsort kernel) must equal
    jaccard_sorted pair-by-pair, including empty sides, identical
    sides, chunked columns, and sliced columns."""
    import pyarrow as pa

    rng = np.random.RandomState(7)
    rows_a, rows_b = [], []
    for _ in range(200):
        na, nb = rng.randint(0, 40), rng.randint(0, 40)
        pool = rng.randint(0, 50, size=80).astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        )
        a = np.unique(rng.choice(pool, size=na)) if na else np.empty(0, np.uint64)
        b = np.unique(rng.choice(pool, size=nb)) if nb else np.empty(0, np.uint64)
        rows_a.append(a)
        rows_b.append(b)
    rows_a[3] = rows_b[3].copy()  # identical sides
    ref = np.array(
        [H.jaccard_sorted(a, b) for a, b in zip(rows_a, rows_b)]
    )
    col_a = pa.array([a.tobytes() for a in rows_a], pa.binary())
    col_b = pa.array([b.tobytes() for b in rows_b], pa.binary())
    got = H.jaccard_batch(col_a, col_b)
    assert np.allclose(got, ref, rtol=0, atol=0)
    # chunked + sliced columns exercise the offset-aligned buffer path
    ch_a = pa.chunked_array([col_a.slice(0, 50), col_a.slice(50)])
    got2 = H.jaccard_batch(ch_a, col_b)
    assert np.array_equal(got2, got)
    got3 = H.jaccard_batch(col_a.slice(10, 100), col_b.slice(10, 100))
    assert np.array_equal(got3, got[10:110])
    assert len(H.jaccard_batch(col_a.slice(0, 0), col_b.slice(0, 0))) == 0


def test_binary_column_u64_large_binary_offsets():
    """large_binary columns carry int64 offsets — reading them as int32
    interleaves each offset's words and produces negative row lengths."""
    import numpy as np
    import pyarrow as pa

    from clonehunter_ray.functions.hashing import binary_column_u64, jaccard_batch

    blobs = [
        np.array([1, 5, 9], dtype=np.uint64).tobytes(),
        np.array([5, 9], dtype=np.uint64).tobytes(),
    ]
    for typ in (pa.binary(), pa.large_binary()):
        vals, lens = binary_column_u64(pa.array(blobs, typ))
        assert lens.tolist() == [3, 2]
        assert vals.tolist() == [1, 5, 9, 5, 9]
        sims = jaccard_batch(pa.array(blobs, typ), pa.array(blobs[::-1], typ))
        assert np.allclose(sims, [2 / 3, 2 / 3])


def test_flat_tokens_matches_reference_tokenizer():
    """flat_tokens (Arrow kernel chain) must agree with the reference
    TOKEN_RE.findall path on content and row attribution, including
    null rows, empty rows, and pure-separator rows."""
    import pyarrow as pa

    texts = [
        "The fast KEY order",
        "",
        None,
        "...!!  \t ",
        "a_b 9x  __ trailing_",
        "UPPER lower 0_9",
    ]
    flat, parent = H.flat_tokens(pa.array(texts, pa.string()))
    got = list(zip(parent.tolist(), flat.to_pylist()))
    want = []
    for i, t in enumerate(texts):
        for tok in H.tokenize(t or ""):
            want.append((i, tok))
    assert got == want
    # plain-list input path
    flat2, parent2 = H.flat_tokens(texts)
    assert flat2.to_pylist() == flat.to_pylist()
    assert parent2.tolist() == parent.tolist()
    # empty input
    flat3, parent3 = H.flat_tokens(pa.array([], pa.string()))
    assert len(flat3) == 0 and len(parent3) == 0


def test_run_ranks_matches_pandas_cumcount():
    """run_ranks on sorted keys == pandas groupby().cumcount()."""
    import pandas as pd

    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 57, 1000):
        keys = np.sort(rng.integers(0, max(n // 3, 1), size=n))
        got = H.run_ranks(keys)
        want = pd.Series(keys).groupby(keys).cumcount().to_numpy()
        assert got.dtype == np.int64
        assert np.array_equal(got, want)
    # string keys (cap_docs_per_source sorts object arrays)
    s = np.array(["a", "a", "b", "c", "c", "c"], dtype=object)
    assert H.run_ranks(s).tolist() == [0, 1, 0, 0, 1, 2]
