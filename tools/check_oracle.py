"""Simulate the driver's DuckDB-oracle comparison for every query in
__ray_entry__ (row count + schema names + order-insensitive value
comparison). Usage: python tools/check_oracle.py [sf_dir].

Also importable: ``run_checks(sf_dir)`` runs every comparison inside an
existing Ray session and returns the failure list, so the pytest suite
can pin ALL oracle queries (not just the driver's 50-query window) at
sf0.001 — see tests/test_oracle_full.py.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
            )
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def run_checks(
    sf_dir: str,
    only: list[str] | None = None,
    verbose: bool = True,
) -> list[tuple[str, str]]:
    """Run every ``queries()`` entry (optionally a subset) against its
    ``oracle_sql()`` twin over the parquet tables in ``sf_dir``.

    Requires an already-initialised Ray session (does NOT own one).
    Returns ``[(query_name, reason), ...]`` — empty means all green.
    """
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = E.queries()
    oracles = E.oracle_sql()
    failures: list[tuple[str, str]] = []

    def log(msg: str) -> None:
        if verbose:
            print(msg)

    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"query raised: {exc!r}"))
            log(f"FAIL  {name}: query raised {exc!r}")
            continue
        if name not in oracles:
            log(f"ROWS  {name}: {len(got)} rows (rows-only check)")
            continue
        want = normalize(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(want.columns):
            failures.append((name, f"schema {list(got.columns)} != {list(want.columns)}"))
            log(f"FAIL  {name}: schema {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            log(f"FAIL  {name}: rows {len(got)} vs {len(want)}")
            continue
        # the driver's value-hash is dtype-sensitive (int64 vs float64
        # serialize differently), so flag kind mismatches that
        # assert_frame_equal(check_dtype=False) would let through
        kind_diff = [
            c for c in got.columns if got[c].dtype.kind != want[c].dtype.kind
        ]
        if kind_diff:
            failures.append((name, f"dtype kinds differ: {kind_diff}"))
            log(
                f"FAIL  {name}: dtype kind mismatch on {kind_diff} "
                f"({[ (got[c].dtype, want[c].dtype) for c in kind_diff ]})"
            )
            continue
        try:
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
            )
            log(f"OK    {name}: {len(got)} rows")
        except AssertionError as exc:
            failures.append((name, "values differ"))
            log(f"FAIL  {name}: values differ\n{str(exc)[:500]}")
    return failures


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from clonehunter_ray.util import silence_empty_schema_warnings

    silence_empty_schema_warnings()

    failures = run_checks(sf_dir)
    ray.shutdown()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
