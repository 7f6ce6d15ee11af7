"""Format-flexible corpus ingest (sources.read_corpus): the same
corpus stored as Parquet, JSONL, and CSV must produce identical
Datasets and — via the deterministic scan — identical findings."""

from __future__ import annotations

import csv
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clonehunter_ray import sources
from clonehunter_ray.corpus import generate_corpus


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_formats")
    files, _truth = generate_corpus(60, 7)
    pq.write_table(files, str(d / "files.parquet"))
    rows = files.to_pylist()
    with open(d / "files.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    with open(d / "files.csv", "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=files.column_names)
        w.writeheader()
        w.writerows(rows)
    return d, files


def _collect(ds) -> pa.Table:
    t = pa.concat_tables(
        b for b in ds.iter_batches(batch_format="pyarrow")
    ).combine_chunks()
    order = pa.compute.sort_indices(t, sort_keys=[("path", "ascending")])
    return t.take(order).select(list(sources.CORPUS_COLUMNS))


def test_all_formats_identical(ray_session, corpus_files):
    d, files = corpus_files
    ref = _collect(sources.read_corpus(str(d / "files.parquet")))
    assert ref.num_rows == files.num_rows
    for name in ("files.jsonl", "files.csv"):
        got = _collect(sources.read_corpus(str(d / name)))
        assert got.schema == ref.schema, name
        assert got.equals(ref), name


def test_ndjson_extension_reads(ray_session, corpus_files, tmp_path):
    """ray.data.read_json's default file_extensions excludes .ndjson;
    read_corpus must accept the spelling anyway (ADVICE r3)."""
    import shutil

    d, files = corpus_files
    nd = tmp_path / "files.ndjson"
    shutil.copy(str(d / "files.jsonl"), nd)
    got = _collect(sources.read_corpus(str(nd)))
    assert got.equals(_collect(sources.read_corpus(str(d / "files.jsonl"))))


def test_missing_column_raises(ray_session, tmp_path):
    with open(tmp_path / "bad.jsonl", "w") as fh:
        fh.write(json.dumps({"repo": "r", "path": "p"}) + "\n")
    ds = sources.read_corpus(str(tmp_path / "bad.jsonl"))
    with pytest.raises(Exception, match="missing corpus columns"):
        ds.materialize()


def test_unknown_format_raises(ray_session, tmp_path):
    with pytest.raises(ValueError, match="unknown format"):
        sources.read_corpus("x.parquet", fmt="orc")


def test_scan_findings_identical_across_formats(ray_session, corpus_files):
    from clonehunter_ray.config import EngineConfig
    from clonehunter_ray.pipelines.scan import scan

    d, _files = corpus_files
    results = {}
    for name in ("files.parquet", "files.jsonl"):
        res = scan(sources.read_corpus(str(d / name)), EngineConfig())
        df = (
            res.findings.to_pandas()
            .sort_values("pair_key")
            .reset_index(drop=True)
        )
        results[name] = df
    assert len(results["files.parquet"]) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(
        results["files.parquet"], results["files.jsonl"]
    )


def test_csv_multiline_content_above_one_block(ray_session, tmp_path):
    """Arrow's CSV reader splits files into ~1MB blocks; without
    newlines_in_values=True a quoted newline spanning a block boundary
    fails the parse. A >5MB corpus with multi-line content must read."""
    n = 1500
    body = "def f(x):\n    y = x + 1\n    return y\n" * 60  # ~2.2KB
    t = pa.table(
        {
            "repo": pa.array([f"r{i%7}" for i in range(n)], pa.string()),
            "path": pa.array([f"p/{i}.py" for i in range(n)], pa.string()),
            "commit": pa.array(["c" * 8] * n, pa.string()),
            "lang": pa.array(["python"] * n, pa.string()),
            "content": pa.array([body] * n, pa.string()),
        }
    )
    p = tmp_path / "big.csv"
    import pyarrow.csv as pacsv

    pacsv.write_csv(t, str(p))
    assert p.stat().st_size > 2 * 1024 * 1024
    got = _collect(sources.read_corpus(str(p)))
    assert got.num_rows == n
    assert got["content"][0].as_py() == body


def test_csv_type_inference_hazards_pinned(ray_session, tmp_path):
    """CSV columns are pinned to string at parse time: an all-digit
    commit hash keeps its leading zero (int64 inference would drop
    it) and literal 'null'/'NaN'/empty strings stay strings, matching
    the parquet/jsonl round-trip exactly."""
    t = pa.table(
        {
            "repo": pa.array(["r", "null"], pa.string()),
            "path": pa.array(["a.py", "b.py"], pa.string()),
            "commit": pa.array(["0123456", "NaN"], pa.string()),
            "lang": pa.array(["", "python"], pa.string()),
            "content": pa.array(["x = 1", "y = 2"], pa.string()),
        }
    )
    import pyarrow.csv as pacsv

    pacsv.write_csv(t, str(tmp_path / "h.csv"))
    got = _collect(sources.read_corpus(str(tmp_path / "h.csv")))
    want = t.select(list(sources.CORPUS_COLUMNS))
    order = pa.compute.sort_indices(want, sort_keys=[("path", "ascending")])
    assert got.equals(want.take(order))


def test_parquet_path_normalizes_large_string(ray_session, tmp_path):
    """The parquet branch runs the same normalization as jsonl/csv:
    large_string columns (e.g. polars-written) come out plain string
    and a missing corpus column raises the documented error."""
    t = pa.table(
        {
            "repo": pa.array(["r"], pa.large_string()),
            "path": pa.array(["a.py"], pa.large_string()),
            "commit": pa.array(["c"], pa.large_string()),
            "lang": pa.array(["python"], pa.large_string()),
            "content": pa.array(["x = 1"], pa.large_string()),
        }
    )
    pq.write_table(t, str(tmp_path / "ls.parquet"))
    got = _collect(sources.read_corpus(str(tmp_path / "ls.parquet")))
    assert [f.type for f in got.schema] == [pa.string()] * 5
