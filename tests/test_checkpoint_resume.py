"""Checkpoint + mid-pipeline resume semantics (north_rule: per-stage
partitioned Parquet with lineage; a rerun after losing downstream
stages must reuse the completed upstream checkpoint)."""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import ray.data

from clonehunter_ray.config import EngineConfig
from clonehunter_ray.corpus import generate_corpus
from clonehunter_ray.pipelines.scan import scan
from clonehunter_ray.state import checkpoint as ckpt


def _scan(files: pa.Table, root: str):
    cfg = EngineConfig()
    return scan(ray.data.from_arrow(files), cfg, checkpoint_dir=root), cfg


def test_scan_writes_stage_checkpoints_with_lineage(ray_session, tmp_path):
    files, _ = generate_corpus(60, 7)
    root = str(tmp_path / "ck")
    res, cfg = _scan(files, root)
    n = res.findings.count()
    assert n > 0
    for stage in ("signatures", "pairs", "findings"):
        d = os.path.join(root, stage)
        assert os.path.exists(os.path.join(d, "_SUCCESS")), stage
        lineage = json.load(open(os.path.join(d, "_lineage.json")))
        assert lineage["stage"] == stage
        assert lineage["config_fp"] == cfg.fingerprint()
        assert lineage["rows"] >= 0
        assert any(f.endswith(".parquet") for f in os.listdir(d))


def test_resume_skips_completed_upstream(ray_session, tmp_path):
    files, _ = generate_corpus(60, 7)
    root = str(tmp_path / "ck")
    res1, cfg = _scan(files, root)
    first = res1.findings.to_pandas().sort_values("pair_key").reset_index(drop=True)

    sig_lineage = os.path.join(root, "signatures", "_lineage.json")
    mtime_before = os.path.getmtime(sig_lineage)

    # simulate a mid-pipeline crash: downstream stages lost
    shutil.rmtree(os.path.join(root, "pairs"))
    shutil.rmtree(os.path.join(root, "findings"))

    res2, _ = _scan(files, root)
    second = res2.findings.to_pandas().sort_values("pair_key").reset_index(drop=True)

    # signatures were NOT recomputed (lineage file untouched) ...
    assert os.path.getmtime(sig_lineage) == mtime_before
    # ... and the resumed run reproduces the findings exactly
    assert list(first["pair_key"]) == list(second["pair_key"])
    assert list(first["score"]) == list(second["score"])


def test_config_change_invalidates_checkpoint(ray_session, tmp_path):
    files, _ = generate_corpus(60, 7)
    root = str(tmp_path / "ck")
    _scan(files, root)
    fp1 = json.load(open(os.path.join(root, "signatures", "_lineage.json")))[
        "config_fp"
    ]
    from clonehunter_ray.config import Thresholds

    cfg2 = EngineConfig(thresholds=Thresholds(func=0.5))
    scan(ray.data.from_arrow(files), cfg2, checkpoint_dir=root)
    fp2 = json.load(open(os.path.join(root, "signatures", "_lineage.json")))[
        "config_fp"
    ]
    assert fp1 != fp2  # stale checkpoint replaced, not reused


def test_resume_missing_anti_join(ray_session):
    inp = ray.data.from_items([{"k": i, "v": i * 2} for i in range(10)])
    done = ray.data.from_items([{"k": i} for i in range(0, 10, 2)])
    missing = ckpt.resume_missing(inp, done, "k")
    ks = sorted(r["k"] for r in missing.iter_rows())
    assert ks == [1, 3, 5, 7, 9]
