"""Suffix-array LCS kernel + verify-stage rescue channel tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from clonehunter_ray.config import SubstringConfig, Thresholds
from clonehunter_ray.functions import hashing as H
from clonehunter_ray.functions.substring import (
    lcp_array,
    lcs_ratio,
    lcs_token_len,
    lcs_token_len_dp,
    suffix_array,
)
from clonehunter_ray.stages.verify import verify_pairs_batch


def test_suffix_array_banana():
    # "banana" as ints: b=1 a=0 n=2
    seq = np.array([1, 0, 2, 0, 2, 0], dtype=np.int64)
    sa = suffix_array(seq)
    suffixes = [tuple(seq[i:]) for i in sa]
    assert suffixes == sorted(tuple(seq[i:]) for i in range(len(seq)))


def test_lcp_array_matches_naive():
    seq = np.array([1, 0, 2, 0, 2, 0], dtype=np.int64)
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)

    def common_prefix(i, j):
        n = 0
        while i + n < len(seq) and j + n < len(seq) and seq[i + n] == seq[j + n]:
            n += 1
        return n

    for r in range(1, len(seq)):
        assert lcp[r] == common_prefix(sa[r - 1], sa[r])


def test_lcs_simple_overlap():
    a = np.array([1, 2, 3, 4, 5], dtype=np.uint64)
    b = np.array([9, 3, 4, 5, 8], dtype=np.uint64)
    assert lcs_token_len(a, b) == 3
    assert lcs_token_len_dp(a, b) == 3


def test_lcs_disjoint_and_empty():
    a = np.array([1, 2, 3], dtype=np.uint64)
    b = np.array([4, 5, 6], dtype=np.uint64)
    assert lcs_token_len(a, b) == 0
    assert lcs_token_len(a, np.empty(0, dtype=np.uint64)) == 0
    assert lcs_ratio(np.empty(0, dtype=np.uint64), b) == 0.0


def test_lcs_containment_ratio_one():
    inner = np.array([7, 8, 9, 10], dtype=np.uint64)
    outer = np.concatenate(
        [np.array([1, 2], dtype=np.uint64), inner, np.array([3], dtype=np.uint64)]
    )
    assert lcs_ratio(inner, outer) == 1.0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 7), min_size=0, max_size=40),
    st.lists(st.integers(0, 7), min_size=0, max_size=40),
)
def test_lcs_suffix_array_matches_dp(xs, ys):
    a = np.array(xs, dtype=np.uint64)
    b = np.array(ys, dtype=np.uint64)
    assert lcs_token_len(a, b) == lcs_token_len_dp(a, b)


# -- verify-stage rescue ----------------------------------------------------


def _pair_batch(text_a: str, text_b: str, with_seq: bool) -> pa.Table:
    rows = {}
    for side, text in (("a", text_a), ("b", text_b)):
        toks = H.tokenize(text)
        th = H.hash_tokens_batch([toks])[0]
        sh = H.shingle_hashes(th, 3)
        ts = H.token_set_hashes(th)
        rows[f"{side}_id"] = [f"{side}1"]
        rows[f"{side}_kind"] = ["FUNC"]
        rows[f"{side}_unit_id"] = [f"u_{side}"]
        rows[f"{side}_path"] = [f"{side}.py"]
        rows[f"{side}_qualified_name"] = [side]
        rows[f"{side}_unit_start"] = [1]
        rows[f"{side}_unit_end"] = [20]
        rows[f"{side}_start_line"] = [1]
        rows[f"{side}_end_line"] = [20]
        rows[f"{side}_shingles"] = [sh.tobytes()]
        rows[f"{side}_tokens"] = [ts.tobytes()]
        if with_seq:
            rows[f"{side}_token_seq"] = [th.tobytes()]
    rows["capped"] = [False]
    return pa.table(rows)


def test_substring_rescue_keeps_embedded_clone():
    # b embeds a verbatim inside much more other code: composite fails
    # the 0.92 FUNC gate, but the LCS covers all of a.
    core = " ".join(f"tok{i}" for i in range(30))
    filler = " ".join(f"other{i}" for i in range(200))
    th = Thresholds(lexical_min_ratio=0.0)
    off = SubstringConfig(enabled=False)
    on = SubstringConfig(enabled=True, floor=0.01, min_ratio=0.9)

    batch = _pair_batch(core, core + " " + filler, with_seq=True)
    dropped = verify_pairs_batch(batch, th, off)
    assert dropped.num_rows == 0
    kept = verify_pairs_batch(batch, th, on)
    assert kept.num_rows == 1
    assert kept["substr_ratio"][0].as_py() >= 0.9
    assert "substr=" in kept["evidence"][0].as_py()


def test_substring_rescue_respects_floor_and_ratio():
    th = Thresholds(lexical_min_ratio=0.0)
    core = " ".join(f"tok{i}" for i in range(30))
    filler = " ".join(f"other{i}" for i in range(200))
    batch = _pair_batch(core, core + " " + filler, with_seq=True)
    # jaccard of the pair is small; a floor above it disables rescue
    high_floor = SubstringConfig(enabled=True, floor=0.9, min_ratio=0.5)
    assert verify_pairs_batch(batch, th, high_floor).num_rows == 0
    # unrelated texts: rescue on but LCS tiny
    unrelated = _pair_batch(core, filler, with_seq=True)
    on = SubstringConfig(enabled=True, floor=0.0, min_ratio=0.5)
    assert verify_pairs_batch(unrelated, th, on).num_rows == 0


def test_substring_disabled_without_token_seq_column():
    th = Thresholds(lexical_min_ratio=0.0)
    core = " ".join(f"tok{i}" for i in range(30))
    filler = " ".join(f"other{i}" for i in range(200))
    batch = _pair_batch(core, core + " " + filler, with_seq=False)
    on = SubstringConfig(enabled=True, floor=0.0, min_ratio=0.5)
    # no token_seq columns carried -> rescue silently off, pair dropped
    assert verify_pairs_batch(batch, th, on).num_rows == 0
