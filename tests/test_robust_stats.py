"""Pin the weighted quantile_cont helper (median/MAD semantics) against
DuckDB's median()/mad() over expanded columns — the contract
``length_outlier_filter_documents``'s oracle depends on. The full
pipeline itself is driver-compared by test_oracle_overflow."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from clonehunter_ray.pipelines.queries import _weighted_quantile_cont


CASES = [
    # (values, counts) histograms covering odd/even totals, repeated
    # values, .5 medians, and a single-value degenerate column
    ([5], [3]),
    ([1, 2, 3], [1, 1, 1]),
    ([1, 2, 3, 4], [1, 1, 1, 1]),
    ([10, 20], [5, 5]),
    ([10, 20, 30], [2, 7, 1]),
    ([100, 250, 311, 312, 900], [40, 13, 1, 1, 3]),
    ([0, 1], [999, 1]),
]


def _duckdb_median_mad(vals, cnts):
    expanded = np.repeat(vals, cnts).tolist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(v),) for v in expanded])
    return con.execute("SELECT median(x), mad(x) FROM t").fetchone()


@pytest.mark.parametrize("vals,cnts", CASES)
def test_weighted_quantile_matches_duckdb_median_mad(vals, cnts):
    v = np.asarray(vals, dtype=np.float64)
    c = np.asarray(cnts, dtype=np.int64)
    med = _weighted_quantile_cont(v, c, 0.5)
    dev = np.abs(v - med)
    uv, inv = np.unique(dev, return_inverse=True)
    uc = np.bincount(inv, weights=c).astype(np.int64)
    mad = _weighted_quantile_cont(uv, uc, 0.5)
    want_med, want_mad = _duckdb_median_mad(vals, cnts)
    assert med == pytest.approx(float(want_med), abs=0)
    assert mad == pytest.approx(float(want_mad), abs=0)


def test_weighted_quantile_unsorted_input():
    # helper must not assume pre-sorted values (groupby output order
    # is not guaranteed)
    v = np.array([30.0, 10.0, 20.0])
    c = np.array([1, 1, 1])
    assert _weighted_quantile_cont(v, c, 0.5) == 20.0
