"""Partitioned rollup equals per-group rollup."""

from __future__ import annotations

import pyarrow as pa

from clonehunter_ray.config import Thresholds
from clonehunter_ray.stages.rollup import (
    FINDINGS_SCHEMA,
    add_rollup_partition,
    rollup_group,
    rollup_partition,
)
from clonehunter_ray.stages.verify import PAIRS_SCHEMA


def _pair_row(pair_key, unit_a, unit_b, kind, comp, a_span=(1, 10), b_span=(1, 10)):
    return {
        "pair_key": pair_key,
        "a_id": "a",
        "b_id": "b",
        "unit_a": unit_a,
        "unit_b": unit_b,
        "kind_a": kind,
        "kind_b": kind,
        "path_a": "p1",
        "path_b": "p2",
        "qual_a": "f",
        "qual_b": "g",
        "ua_start": 1,
        "ua_end": 20,
        "ub_start": 1,
        "ub_end": 20,
        "a_start": a_span[0],
        "a_end": a_span[1],
        "b_start": b_span[0],
        "b_end": b_span[1],
        "jaccard": comp,
        "lexical": comp,
        "composite": comp,
        "substr_ratio": 0.0,
        "evidence": "e",
    }


def test_rollup_partition_matches_per_group():
    rows = []
    for g in range(17):
        key = f"u{g}||v{g}"
        rows.append(_pair_row(key, f"u{g}", f"v{g}", "FUNC", 0.95))
        rows.append(
            _pair_row(key, f"u{g}", f"v{g}", "WIN", 0.91, (11, 20), (11, 20))
        )
    # one group below every gate: produces no finding
    rows.append(_pair_row("x||y", "x", "y", "FUNC", 0.5))
    table = pa.Table.from_pylist(rows, schema=PAIRS_SCHEMA)
    th = Thresholds()

    # expected: per-group rollup
    expected = []
    for key in sorted({r["pair_key"] for r in rows}):
        mask = pa.array([k == key for k in table["pair_key"].to_pylist()])
        out = rollup_group(table.filter(mask), th)
        expected.extend(out.to_pylist())
    expected.sort(key=lambda r: r["pair_key"])

    # actual: partitioned path over several partitions
    parted = add_rollup_partition(table, 4)
    got = []
    for p in range(4):
        mask = pa.array([v == p for v in parted["part"].to_pylist()])
        sub = parted.filter(mask)
        if sub.num_rows:
            got.extend(rollup_partition(sub, th).to_pylist())
    got.sort(key=lambda r: r["pair_key"])

    assert len(got) == len(expected) == 17
    for a, b in zip(got, expected):
        assert a == b


def test_rollup_partition_empty():
    empty = pa.Table.from_pydict(
        {n: [] for n in PAIRS_SCHEMA.names}, schema=PAIRS_SCHEMA
    )
    out = rollup_partition(empty, Thresholds())
    assert out.schema.equals(FINDINGS_SCHEMA)
    assert out.num_rows == 0
