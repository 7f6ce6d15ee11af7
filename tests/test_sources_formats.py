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
