"""Unit tests for verification filters and finding rollup (reference
rollup semantics: similarity/rollup.py)."""

import numpy as np
import pyarrow as pa

from clonehunter_ray.config import Thresholds
from clonehunter_ray.stages.rollup import (
    FINDINGS_SCHEMA,
    _covered_lines,
    rollup_group,
)
from clonehunter_ray.stages.verify import verify_pairs_batch


def _enc(vals):
    return np.asarray(sorted(set(vals)), dtype=np.uint64).tobytes()


def _pair_row(**kw):
    base = {
        "a_id": "sa", "b_id": "sb", "capped": False,
        "a_kind": "FUNC", "b_kind": "FUNC",
        "a_unit_id": "f1.py:a:1:10", "b_unit_id": "f2.py:b:1:10",
        "a_path": "f1.py", "b_path": "f2.py",
        "a_qualified_name": "a", "b_qualified_name": "b",
        "a_unit_start": 1, "a_unit_end": 10,
        "b_unit_start": 1, "b_unit_end": 10,
        "a_start_line": 1, "a_end_line": 10,
        "b_start_line": 1, "b_end_line": 10,
        "a_shingles": _enc(range(100)), "b_shingles": _enc(range(100)),
        "a_tokens": _enc(range(50)), "b_tokens": _enc(range(50)),
    }
    base.update(kw)
    return base


def _verify(rows, thresholds=None):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    batch = pa.Table.from_pydict(cols)
    return verify_pairs_batch(batch, thresholds or Thresholds())


def test_identical_sets_pass_func_threshold():
    out = _verify([_pair_row()])
    assert out.num_rows == 1
    assert out["composite"][0].as_py() == 1.0
    assert out["jaccard"][0].as_py() == 1.0


def test_below_threshold_pair_dropped():
    # jaccard 60/140 ~ 0.43, lexical 1.0 -> composite ~0.6 < 0.92
    out = _verify(
        [_pair_row(b_shingles=_enc(range(40, 140)))]
    )
    assert out.num_rows == 0


def test_lexical_min_ratio_gate():
    # shingles identical but token sets disjoint -> lexical 0 < 0.5
    out = _verify([_pair_row(b_tokens=_enc(range(100, 150)))])
    assert out.num_rows == 0


def test_self_pair_overlapping_spans_dropped_disjoint_kept():
    # reference rollup.py:95-103: self-clones allowed only when the
    # matched ranges are disjoint
    same_unit = dict(
        a_unit_id="f1.py:a:1:40", b_unit_id="f1.py:a:1:40",
        b_path="f1.py", a_unit_end=40, b_unit_end=40,
    )
    overlap = _pair_row(
        **same_unit, a_start_line=1, a_end_line=12,
        b_start_line=10, b_end_line=21,
    )
    assert _verify([overlap]).num_rows == 0
    disjoint = _pair_row(
        **same_unit, a_start_line=1, a_end_line=12,
        b_start_line=20, b_end_line=31,
    )
    assert _verify([disjoint]).num_rows == 1


def test_same_file_containment_dropped():
    # reference rollup.py:105-112: distinct functions overlapping in
    # the same file = structural containment
    row = _pair_row(
        a_unit_id="f1.py:outer:1:30", b_unit_id="f1.py:outer.inner:5:15",
        b_path="f1.py",
        a_unit_start=1, a_unit_end=30, b_unit_start=5, b_unit_end=15,
    )
    assert _verify([row]).num_rows == 0
    # same file but disjoint functions -> kept
    row2 = _pair_row(
        a_unit_id="f1.py:a:1:10", b_unit_id="f1.py:b:20:30",
        b_path="f1.py",
        a_unit_start=1, a_unit_end=10, b_unit_start=20, b_unit_end=30,
        b_start_line=20, b_end_line=30,
    )
    assert _verify([row2]).num_rows == 1


def test_canonical_side_ordering():
    # sides arrive reversed; verify must canonicalize by (unit, span)
    row = _pair_row(
        a_unit_id="z.py:z:1:10", b_unit_id="a.py:a:1:10",
        a_path="z.py", b_path="a.py",
        a_qualified_name="z", b_qualified_name="a",
    )
    out = _verify([row])
    assert out["unit_a"][0].as_py() == "a.py:a:1:10"
    assert out["pair_key"][0].as_py() == "a.py:a:1:10||z.py:z:1:10"


def _verified_row(**kw):
    base = {
        "pair_key": "u1||u2", "a_id": "sa", "b_id": "sb",
        "unit_a": "u1", "unit_b": "u2",
        "kind_a": "FUNC", "kind_b": "FUNC",
        "path_a": "f1.py", "path_b": "f2.py",
        "qual_a": "a", "qual_b": "b",
        "ua_start": 1, "ua_end": 30, "ub_start": 1, "ub_end": 30,
        "a_start": 1, "a_end": 10, "b_start": 1, "b_end": 10,
        "jaccard": 1.0, "lexical": 1.0, "composite": 1.0,
        "evidence": "e",
    }
    base.update(kw)
    return base


def _rollup(rows, thresholds=None):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return rollup_group(
        pa.Table.from_pydict(cols), thresholds or Thresholds()
    )


def test_rollup_func_threshold_reason():
    out = _rollup([_verified_row()])
    assert out.num_rows == 1
    assert out["reasons"][0].as_py() == ["func_threshold"]
    assert out["score"][0].as_py() == 1.0


def test_rollup_no_reason_no_finding():
    # FUNC match below func threshold, zero window hits,
    # min_window_hits=1 not reached
    out = _rollup([_verified_row(composite=0.91)])
    assert out.num_rows == 0


def test_rollup_min_window_hits():
    t = Thresholds(min_window_hits=2)
    one = [_verified_row(kind_a="WIN", kind_b="WIN", composite=0.95)]
    assert _rollup(one, t).num_rows == 0
    two = [
        _verified_row(kind_a="WIN", kind_b="WIN", composite=0.95),
        _verified_row(
            kind_a="WIN", kind_b="WIN", composite=0.95,
            a_start=11, a_end=20, b_start=11, b_end=20,
        ),
    ]
    out = _rollup(two, t)
    assert out["reasons"][0].as_py() == ["min_window_hits"]


def test_rollup_span_pair_dedup_keeps_max_then_kind_rank():
    rows = [
        _verified_row(kind_a="WIN", kind_b="WIN", composite=0.93),
        _verified_row(kind_a="FUNC", kind_b="FUNC", composite=0.93),  # tie
        _verified_row(kind_a="WIN", kind_b="WIN", composite=0.99),
    ]
    out = _rollup(rows)
    assert out["n_evidence"][0].as_py() == 1  # all same span pair
    assert out["score"][0].as_py() == 0.99


def test_duplicated_lines_interval_merge():
    # reference rollup.py:136-154: merged-interval coverage, min of sides
    assert _covered_lines([(1, 5), (4, 8)]) == 8
    assert _covered_lines([(1, 5), (6, 8)]) == 8  # adjacent merges
    assert _covered_lines([(1, 5), (8, 9)]) == 7
    rows = [
        _verified_row(a_start=1, a_end=10, b_start=1, b_end=10),
        _verified_row(a_start=20, a_end=25, b_start=5, b_end=10),
    ]
    out = _rollup(rows)
    # side a covers 10+6=16, side b covers 10 -> min 10
    assert out["duplicated_lines"][0].as_py() == 10


def test_rollup_empty_schema_stable():
    out = _rollup([_verified_row(composite=0.5, jaccard=0.5)])
    assert out.schema.equals(FINDINGS_SCHEMA)
