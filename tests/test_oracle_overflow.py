"""Pin the oracle-SQL queries that fall OUTSIDE the driver's 50-entry
correctness window.

The per-round driver compares only the first 50 ``queries()`` entries
against ``oracle_sql()``; the engine ships more oracle-backed queries
than that. This test computes the overflow set dynamically (so it stays
correct as the ordering evolves) and runs the exact driver comparison —
sorted columns, order-insensitive rows, value equality — against DuckDB
at sf0.001, keeping every oracle claim machine-verified even when the
driver window can't reach it.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
DRIVER_WINDOW = 50
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _entry():
    import __ray_entry__ as E

    return E


def _overflow_keys():
    E = _entry()
    first = list(E.queries().keys())[:DRIVER_WINDOW]
    return [k for k in E.oracle_sql() if k not in first]


def _to_pandas(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_driver_window_is_all_oracle():
    """Every slot the driver checks should carry an oracle-backed query —
    a rows-only entry inside the window wastes a correctness check."""
    E = _entry()
    first = list(E.queries().keys())[:DRIVER_WINDOW]
    oracle = set(E.oracle_sql())
    non_oracle = [k for k in first if k not in oracle]
    assert not non_oracle, f"rows-only queries inside driver window: {non_oracle}"


@pytest.mark.parametrize("name", _overflow_keys())
def test_overflow_oracle_query(name, ray_session, con):
    E = _entry()
    got = _normalize(_to_pandas(E.queries()[name](SF_DIR)))
    want = _normalize(con.execute(E.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    kind_diff = [c for c in got.columns if got[c].dtype.kind != want[c].dtype.kind]
    assert not kind_diff, f"dtype kind mismatch: {kind_diff}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )
