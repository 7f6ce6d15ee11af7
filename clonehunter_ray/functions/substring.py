"""Suffix-array longest-common-substring kernel.

The north-star evidence channel for "harder" (Type-3) clones that
share long verbatim token runs but whose overall shingle Jaccard falls
below the composite threshold — e.g. a function copied into a much
larger one. The reference has no analogue (its embedding cosine blurs
this case); here it is an additive rescue gate in pair verification
(stages/verify.py).

Implementation: the two snippets' token-hash sequences are concatenated
with distinct separators, a suffix array is built by prefix-doubling
(O(n log n), numpy ``lexsort`` per round), the LCP array by Kasai's
algorithm, and the longest common substring is the maximum LCP between
lexicographically-adjacent suffixes that start in *different* source
strings. A quadratic DP (``lcs_token_len_dp``) serves as the test
oracle.

All inputs are uint64 token-hash arrays (functions/hashing.py), so the
kernel never touches strings.
"""

from __future__ import annotations

import numpy as np


def suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence by prefix doubling.

    Returns the permutation ``sa`` such that ``seq[sa[i]:]`` is the
    i-th smallest suffix.
    """
    n = len(seq)
    if n == 0:
        return np.empty(0, dtype=np.intp)
    # initial ranks: dense-rank the symbols
    _, rank = np.unique(seq, return_inverse=True)
    rank = rank.astype(np.int64)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        # sort by (rank[i], rank[i+k]) with -1 past the end
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        # recompute dense ranks over the sorted (rank, second) pairs
        r_sorted = rank[order]
        s_sorted = second[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        if n > 1:
            diff = (r_sorted[1:] != r_sorted[:-1]) | (s_sorted[1:] != s_sorted[:-1])
            changed[1:] = np.cumsum(diff)
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = changed
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all ranks distinct
            return order.astype(np.intp)
        k *= 2
        if k >= n:
            return np.lexsort((idx, rank)).astype(np.intp)


def lcp_array(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai's algorithm: ``lcp[i]`` = longest common prefix of the
    suffixes at ``sa[i-1]`` and ``sa[i]`` (``lcp[0] = 0``)."""
    n = len(seq)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r == 0:
            h = 0
            continue
        j = sa[r - 1]
        while i + h < n and j + h < n and seq[i + h] == seq[j + h]:
            h += 1
        lcp[r] = h
        if h:
            h -= 1
    return lcp


# separators outside the blake2b-8 token-hash range cannot appear in
# real data only by convention; we remap input into [0, 2^63) first so
# the two separator sentinels are genuinely unique symbols.
_SEP_A = np.int64(-2)
_SEP_B = np.int64(-1)


def lcs_token_len(a: np.ndarray, b: np.ndarray) -> int:
    """Length (in tokens) of the longest common substring of two
    uint64 token-hash sequences, via suffix array + LCP."""
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        return 0
    # dense-rank both sequences into small ints, reserving 0/1 for seps
    both = np.concatenate([a.astype(np.uint64), b.astype(np.uint64)])
    _, inv = np.unique(both, return_inverse=True)
    sym = inv.astype(np.int64) + 2
    seq = np.concatenate(
        [sym[:na], np.array([0], dtype=np.int64), sym[na:], np.array([1], dtype=np.int64)]
    )
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    # suffix origin: True where the suffix starts inside `a`'s span
    from_a = sa < na
    # ignore suffixes starting at the separators
    valid = (sa != na) & (sa != len(seq) - 1)
    best = 0
    prev_valid = False
    prev_from_a = False
    for i in range(len(seq)):
        if not valid[i]:
            prev_valid = False
            continue
        if prev_valid and from_a[i] != prev_from_a and lcp[i] > best:
            best = int(lcp[i])
        prev_valid = True
        prev_from_a = from_a[i]
    return best


def lcs_token_len_dp(a: np.ndarray, b: np.ndarray) -> int:
    """Quadratic-DP oracle for ``lcs_token_len`` (row-vectorized)."""
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        return 0
    if na > nb:
        a, b = b, a
    prev = np.zeros(len(b), dtype=np.int64)
    best = 0
    for x in a:
        match = b == x
        cur = np.zeros_like(prev)
        if match[0]:
            cur[0] = 1
        cur[1:] = np.where(match[1:], prev[:-1] + 1, 0)
        m = int(cur.max())
        if m > best:
            best = m
        prev = cur
    return best


def matching_statistics(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Matching statistics of ``b`` against ``a``: ``ms[p]`` = length
    of the longest prefix of ``b[p:]`` that occurs as a substring
    anywhere in ``a`` (0 when ``b[p]`` never occurs in ``a``).

    The per-pair verification kernel of corpus-level exact-substring
    (passage) dedup: positions with ``ms >= min_len`` start duplicated
    passages, and the union of ``[p, p + ms[p])`` over those positions
    is exactly the duplicated region. Classic suffix-array reduction:
    for the concatenated sequence, a b-suffix's best match into ``a``
    is the max of its range-min LCP to the nearest a-suffix above and
    below in suffix-array order (separators are unique symbols, so no
    common prefix can span them). O((|a|+|b|) log) build + one linear
    two-direction sweep.
    """
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        return np.zeros(nb, dtype=np.int64)
    both = np.concatenate([a.astype(np.uint64), b.astype(np.uint64)])
    _, inv = np.unique(both, return_inverse=True)
    sym = inv.astype(np.int64) + 2
    seq = np.concatenate(
        [
            sym[:na],
            np.array([0], dtype=np.int64),
            sym[na:],
            np.array([1], dtype=np.int64),
        ]
    )
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    n = len(seq)
    from_a = sa < na
    from_b = (sa > na) & (sa < n - 1)
    big = np.int64(1 << 62)
    # forward sweep: min LCP since the nearest a-suffix above
    up = np.zeros(n, dtype=np.int64)
    carry = -1  # -1 = no a-suffix seen yet
    for r in range(n):
        if r > 0 and carry >= 0:
            carry = min(carry, lcp[r])
        if from_b[r] and carry > 0:
            up[r] = carry
        if from_a[r]:
            carry = big
    # backward sweep: min LCP down to the nearest a-suffix below
    down = np.zeros(n, dtype=np.int64)
    carry = -1
    for r in range(n - 1, -1, -1):
        if from_b[r] and carry > 0:
            down[r] = carry
        if from_a[r]:
            carry = big
        if carry >= 0:
            carry = min(carry, lcp[r])
    ms = np.zeros(nb, dtype=np.int64)
    best = np.maximum(up, down)
    ms[sa[from_b] - (na + 1)] = best[from_b]
    return ms


def merge_intervals(
    starts: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Union of half-open intervals ``[start, end)`` -> disjoint merged
    intervals sorted by start (touching intervals merge). Vectorized
    sweep: sort by start, running-max of ends, split where a start
    exceeds the running max so far."""
    if len(starts) == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    order = np.argsort(starts, kind="stable")
    s = np.asarray(starts, dtype=np.int64)[order]
    e = np.asarray(ends, dtype=np.int64)[order]
    emax = np.maximum.accumulate(e)
    new_run = np.concatenate(([True], s[1:] > emax[:-1]))
    run_id = np.cumsum(new_run) - 1
    out_s = s[new_run]
    n_runs = run_id[-1] + 1
    out_e = np.zeros(n_runs, dtype=np.int64)
    np.maximum.at(out_e, run_id, e)
    return out_s, out_e


def matching_statistics_dp(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Quadratic-DP oracle for ``matching_statistics`` (test use):
    ``L[i, p] = a[i] == b[p] ? L[i+1, p+1] + 1 : 0``; ``ms[p]`` =
    ``max_i L[i, p]`` — row-vectorized over ``a``."""
    na, nb = len(a), len(b)
    ms = np.zeros(nb, dtype=np.int64)
    if na == 0 or nb == 0:
        return ms
    prev = np.zeros(nb, dtype=np.int64)  # L[i+1, :]
    for i in range(na - 1, -1, -1):
        cur = np.zeros(nb, dtype=np.int64)
        match = b == a[i]
        cur[:-1] = np.where(match[:-1], prev[1:] + 1, 0)
        if match[-1]:
            cur[-1] = 1
        np.maximum(ms, cur, out=ms)
        prev = cur
    return ms


def lcs_ratio(a: np.ndarray, b: np.ndarray) -> float:
    """LCS length normalized by the shorter sequence — 1.0 when one
    snippet's token stream is wholly contained in the other."""
    denom = min(len(a), len(b))
    if denom == 0:
        return 0.0
    return lcs_token_len(a, b) / denom
