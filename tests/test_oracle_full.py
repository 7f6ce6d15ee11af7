"""CI pin for EVERY oracle-backed query, not just the driver's 50-query
window (round-4 verdict, 'Next round' #3): run the same comparison the
driver runs — row count + sorted-schema + order-insensitive values vs
the DuckDB oracle SQL — over ALL ``__ray_entry__.queries()`` entries at
sf0.001, inside the shared session Ray fixture.

A regression in any oracle query (including the ~26 that rotate outside
the driver's window each round) turns this test red.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


def test_all_oracle_queries_green(ray_session):
    if not os.path.exists(f"{SF_DIR}/documents.parquet"):
        pytest.skip("testdata not present")
    from tools.check_oracle import run_checks

    failures = run_checks(SF_DIR, verbose=False)
    assert not failures, "oracle regressions: " + "; ".join(
        f"{name}: {reason}" for name, reason in failures
    )
