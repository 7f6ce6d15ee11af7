"""Sources, reporters, config loader, and CLI entry points."""

from __future__ import annotations

import json
import os
import subprocess

import pyarrow as pa
import pytest

from clonehunter_ray import reporting, sources
from clonehunter_ray.config_loader import ConfigError, find_config_root, load_config

FINDING = {
    "pair_key": "a.py:f:1:5||b.py:g:1:5",
    "unit_a": "a.py:f:1:5",
    "unit_b": "b.py:g:1:5",
    "path_a": "a.py",
    "path_b": "b.py",
    "qual_a": "f",
    "qual_b": "g",
    "score": 0.97,
    "duplicated_lines": 5,
    "reasons": ["func_threshold"],
    "n_evidence": 2,
    "best_evidence": "FUNC->FUNC|jac=0.97",
    "cluster_id": 1,
}


def test_files_from_directory_walk_dedupe_lang(tmp_path):
    (tmp_path / "pkg").mkdir()
    (tmp_path / "pkg" / "a.py").write_text("def f():\n    return 1\n")
    (tmp_path / "b.txt").write_text("hello\n")
    (tmp_path / "__pycache__").mkdir()
    (tmp_path / "__pycache__" / "junk.py").write_text("nope")
    t = sources.files_from_directory(
        [str(tmp_path)], include_globs=("**/*.py", "**/*.txt")
    )
    paths = sorted(t["path"].to_pylist())
    assert paths == ["b.txt", os.path.join("pkg", "a.py")]
    langs = dict(zip(t["path"].to_pylist(), t["lang"].to_pylist()))
    assert langs[os.path.join("pkg", "a.py")] == "python"
    assert langs["b.txt"] == "text"
    # overlapping roots dedupe by resolved path (reference fs.py:54-63)
    t2 = sources.files_from_directory(
        [str(tmp_path), str(tmp_path / "pkg")],
        include_globs=("**/*.py", "**/*.txt"),
    )
    assert t2.num_rows == t.num_rows


def test_json_report_roundtrip(tmp_path):
    out = tmp_path / "r.json"
    reporting.write_json_report(
        [FINDING],
        str(out),
        stats={"finding_count": 1},
        unit_code={"a.py:f:1:5": "def f():\n    pass", "b.py:g:1:5": "def g():\n    pass"},
    )
    data = json.loads(out.read_text())
    assert data["schema_version"] == 2
    assert data["stats"]["finding_count"] == 1
    f = data["findings"][0]
    assert f["function_a"]["identity"] == "a.py:f:1:5"
    assert f["score"] == 0.97
    assert "unified_diff" in f["compare"]


def test_sarif_report_structure(tmp_path):
    out = tmp_path / "r.sarif"
    reporting.write_sarif_report([FINDING], str(out))
    data = json.loads(out.read_text())
    assert data["version"] == "2.1.0"
    res = data["runs"][0]["results"][0]
    assert res["ruleId"] == "near-duplicate-code"
    region = res["locations"][0]["physicalLocation"]["region"]
    assert (region["startLine"], region["endLine"]) == (1, 5)


def test_html_report_contains_rows(tmp_path):
    out = tmp_path / "r.html"
    reporting.write_html_report([FINDING], str(out))
    doc = out.read_text()
    assert "<table" in doc and "a.py" in doc and "0.970" in doc


def test_sonarqube_import(tmp_path):
    rep = tmp_path / "sonar.json"
    rep.write_text(
        json.dumps(
            {
                "duplications": [
                    {
                        "a": {"path": "x.py", "name": "f", "start": 1, "end": 9},
                        "b": {"path": "y.py", "name": "g", "start": 2, "end": 10},
                        "duplicated_lines": 8,
                    }
                ]
            }
        )
    )
    t = sources.read_sonarqube_report(str(rep))
    assert t.num_rows == 1
    assert t["score"][0].as_py() == 1.0
    assert t["reasons"][0].as_py() == ["imported"]
    assert t["unit_a"][0].as_py() < t["unit_b"][0].as_py()


def test_config_loader_layers_and_validation(tmp_path):
    (tmp_path / "pyproject.toml").write_text(
        """
[tool.clonehunter_ray]
include_langs = ["python"]
[tool.clonehunter_ray.window]
window_lines = 20
[tool.clonehunter_ray.substring]
enabled = true
"""
    )
    assert find_config_root(str(tmp_path / "sub" / "x.py")) is None or True
    cfg = load_config(str(tmp_path))
    assert cfg.window.window_lines == 20
    assert cfg.substring.enabled is True
    assert cfg.include_langs == ("python",)
    # CLI override wins
    cfg2 = load_config(str(tmp_path), {"window.window_lines": 8})
    assert cfg2.window.window_lines == 8
    with pytest.raises(ConfigError):
        load_config(str(tmp_path), {"window.bogus_key": 1})
    (tmp_path / "pyproject.toml").write_text(
        "[tool.clonehunter_ray.signature]\nnum_bands = 31\n"
    )
    with pytest.raises(ConfigError):
        load_config(str(tmp_path))  # 31 * 4 != 128


def test_changed_files_git(tmp_path):
    subprocess.run(["git", "init", "-q"], cwd=tmp_path, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit", "-q",
         "--allow-empty", "-m", "init"],
        cwd=tmp_path,
        check=True,
    )
    (tmp_path / "new.py").write_text("x = 1\n")
    changed = sources.changed_files("HEAD", cwd=str(tmp_path))
    assert changed == ["new.py"]


def test_cli_scan_directory(ray_session, tmp_path):
    proj = tmp_path / "proj"
    proj.mkdir()
    body = "\n".join(f"    v{i} = alpha_{i} + beta_{i}" for i in range(10))
    (proj / "a.py").write_text(f"def f(x):\n{body}\n    return v9\n")
    (proj / "b.py").write_text(f"def g(x):\n{body}\n    return v9\n")
    out = tmp_path / "rep.json"

    from clonehunter_ray.cli import main

    rc = main(["scan", str(proj), "--out", str(out), "--format", "json"])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["stats"]["file_count"] == 2
    assert data["stats"]["finding_count"] >= 1
    pair = data["findings"][0]
    assert {pair["function_a"]["qualified_name"],
            pair["function_b"]["qualified_name"]} == {"f", "g"}


def test_write_report_parquet_accepts_dataframe(tmp_path):
    """ADVICE r2: the CLI hands write_report a pandas DataFrame for
    every format; the parquet branch must not assume a Ray Dataset."""
    import pandas as pd
    import pyarrow.parquet as pq

    df = pd.DataFrame([FINDING])
    out = tmp_path / "f.parquet"
    reporting.write_report(df, str(out), "parquet")
    got = pq.read_table(str(out))
    assert got.num_rows == 1
    assert got["pair_key"][0].as_py() == FINDING["pair_key"]


def test_cli_scan_format_parquet(ray_session, tmp_path):
    proj = tmp_path / "proj"
    proj.mkdir()
    body = "\n".join(f"    v{i} = alpha_{i} + beta_{i}" for i in range(10))
    (proj / "a.py").write_text(f"def f(x):\n{body}\n    return v9\n")
    (proj / "b.py").write_text(f"def g(x):\n{body}\n    return v9\n")
    out = tmp_path / "rep.parquet"

    from clonehunter_ray.cli import main

    rc = main(["scan", str(proj), "--out", str(out), "--format", "parquet"])
    assert rc == 0
    import pyarrow.parquet as pq

    assert pq.read_table(str(out)).num_rows >= 1


def _git(cwd, *args):
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", *args],
        cwd=cwd, check=True, capture_output=True,
    )


def test_cli_diff_multi_root(ray_session, tmp_path):
    """ADVICE r2: multi-root diff must prefix the change set with the
    same root label files_from_directory puts on finding paths."""
    body = "\n".join(f"    v{i} = alpha_{i} + beta_{i}" for i in range(10))
    p1 = tmp_path / "left"
    p2 = tmp_path / "right"
    p1.mkdir()
    p2.mkdir()
    (p1 / "a.py").write_text(f"def f(x):\n{body}\n    return v9\n")
    _git(p1, "init", "-q")
    _git(p1, "add", "-A")
    _git(p1, "commit", "-qm", "base")  # left: fully committed, unchanged
    _git(p2, "init", "-q")
    _git(p2, "commit", "-qm", "base", "--allow-empty")
    (p2 / "b.py").write_text(f"def g(x):\n{body}\n    return v9\n")  # untracked

    from clonehunter_ray.cli import main

    out = tmp_path / "rep.json"
    rc = main(["diff", str(p1), str(p2), "--out", str(out), "--format", "json"])
    assert rc == 0
    data = json.loads(out.read_text())
    assert data["stats"]["finding_count"] >= 1
    f = data["findings"][0]
    paths = {f["function_a"]["path"], f["function_b"]["path"]}
    assert "right/b.py" in paths  # changed-file scoping kept the pair


def test_cli_export_training_shards(ray_session, tmp_path):
    """`export` subcommand: documents parquet in -> sharded partition
    dirs + JSON manifest out, per-source rates applied."""
    import json as _json

    from clonehunter_ray.cli import main

    out_dir = tmp_path / "shards"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(
            [
                "export",
                "--documents-parquet",
                "/root/testdata/sf0.001/documents.parquet",
                "--out-dir",
                str(out_dir),
                "--shards-per-source",
                "2",
                "--rates",
                '{"src0": 0.5}',
            ]
        )
    assert rc == 0
    report = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["sources"] == 20
    # src0 sampled at 0.5, everything else kept (default rate 1.0)
    assert 0 < report["manifest"]["src0"] < 25
    assert report["manifest"]["src1"] == 25
    parts = [p.name for p in out_dir.iterdir() if p.name.startswith("export_part=")]
    assert len(parts) > 20  # sources actually fanned out to shards


def test_cli_progress_flag_parses():
    """--progress (reference core/pipeline.py:97-116 tqdm analogue):
    opt-in, defaults to off so JSON stdout stays clean."""
    from clonehunter_ray.cli import _build_parser

    p = _build_parser()
    on = p.parse_args(["scan", "x", "--progress"])
    off = p.parse_args(["scan", "x"])
    assert on.progress is True
    # unset parses as None (tri-state: the config-override dict treats
    # None as "no CLI override, use the config file value"); runtime
    # behavior stays off (bool(None) is False at cli.py:251)
    assert off.progress is None
    assert not off.progress


def test_cli_ray_address_flag_parses():
    """--ray-address (job-submission contract: `ray job submit --
    python -m clonehunter_ray.cli scan ... --ray-address auto` attaches
    the driver to the hosting cluster; default stays local)."""
    from clonehunter_ray.cli import _build_parser

    p = _build_parser()
    assert p.parse_args(["scan", "x"]).ray_address is None
    assert (
        p.parse_args(["scan", "x", "--ray-address", "auto"]).ray_address
        == "auto"
    )
    assert (
        p.parse_args(
            [
                "export", "--documents-parquet", "d.parquet",
                "--out-dir", "o", "--ray-address", "ray://h:1",
            ]
        ).ray_address
        == "ray://h:1"
    )
