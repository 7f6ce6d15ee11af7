"""EXP call-graph expansion stage (reference snippets/expansion.py
semantics: helper code embedded after the caller, depth/max_chars caps,
per-repo-local resolution)."""

from __future__ import annotations

import pyarrow as pa

from clonehunter_ray.config import EngineConfig, ExpansionConfig
from clonehunter_ray.stages.expansion import expand_repo_group

FILES_COLS = ("repo", "path", "commit", "lang", "content")


def _files(rows: list[tuple[str, str]]) -> pa.Table:
    return pa.table(
        {
            "repo": ["r"] * len(rows),
            "path": [p for p, _ in rows],
            "commit": ["c"] * len(rows),
            "lang": ["python"] * len(rows),
            "content": [c for _, c in rows],
        }
    )


def test_same_module_call_expanded():
    src = (
        "def helper(x):\n"
        "    return x * 2\n"
        "\n"
        "def main(y):\n"
        "    return helper(y) + 1\n"
    )
    out = expand_repo_group(_files([("m.py", src)]))
    rows = out.to_pylist()
    assert len(rows) == 1  # only main() resolves a helper
    r = rows[0]
    assert r["kind"] == "EXP"
    assert r["qualified_name"] == "main"
    assert "def helper" in r["text"] and "def main" in r["text"]


def test_cross_module_from_import():
    helpers = "def util(x):\n    return x + 1\n"
    main = (
        "from helpers import util\n"
        "\n"
        "def run(v):\n"
        "    return util(v)\n"
    )
    out = expand_repo_group(_files([("helpers.py", helpers), ("main.py", main)]))
    rows = {r["qualified_name"]: r for r in out.to_pylist()}
    assert "run" in rows
    assert "def util" in rows["run"]["text"]


def test_module_attr_and_self_method():
    helpers = "def f(x):\n    return x\n"
    main = (
        "import helpers\n"
        "\n"
        "class C:\n"
        "    def m(self):\n"
        "        return self.n()\n"
        "    def n(self):\n"
        "        return helpers.f(1)\n"
    )
    out = expand_repo_group(
        _files([("helpers.py", helpers), ("main.py", main)]),
        ExpansionConfig(enabled=True, depth=2),
    )
    rows = {r["qualified_name"]: r for r in out.to_pylist()}
    # C.m -> self.n() -> helpers.f at depth 2
    assert "C.m" in rows
    assert "def n" in rows["C.m"]["text"]
    assert "def f" in rows["C.m"]["text"]
    # depth 1 stops at C.n
    out1 = expand_repo_group(
        _files([("helpers.py", helpers), ("main.py", main)]),
        ExpansionConfig(enabled=True, depth=1),
    )
    rows1 = {r["qualified_name"]: r for r in out1.to_pylist()}
    assert "def f" not in rows1["C.m"]["text"]
    assert "def f" in rows1["C.n"]["text"]


def test_instance_var_and_ctor_call():
    src = (
        "class K:\n"
        "    def go(self):\n"
        "        return 7\n"
        "\n"
        "def a():\n"
        "    k = K()\n"
        "    return k.go()\n"
        "\n"
        "def b():\n"
        "    return K().go()\n"
    )
    out = expand_repo_group(_files([("m.py", src)]))
    rows = {r["qualified_name"]: r for r in out.to_pylist()}
    assert "def go" in rows["a"]["text"]
    assert "def go" in rows["b"]["text"]


def test_max_chars_truncation():
    big_helper = "def h():\n" + "".join(
        f"    x{i} = {i}\n" for i in range(500)
    ) + "    return x1\n"
    src = "def top():\n    return h()\n"
    out = expand_repo_group(
        _files([("m.py", src + "\n" + big_helper)]),
        ExpansionConfig(enabled=True, max_chars=200),
    )
    rows = {r["qualified_name"]: r for r in out.to_pylist()}
    assert len(rows["top"]["text"]) <= 200


def test_unresolvable_and_syntax_error_files():
    src = "def lonely():\n    return external_call()\n"
    bad = "def broken(:\n"
    out = expand_repo_group(_files([("a.py", src), ("b.py", bad)]))
    assert out.num_rows == 0  # nothing resolvable, bad file swallowed


def test_scan_pipeline_with_expansion(ray_session):
    import ray.data

    from clonehunter_ray.pipelines.scan import scan

    helper = "def shared_helper(x):\n" + "".join(
        f"    x = x + {i}\n" for i in range(8)
    ) + "    return x\n"
    caller_a = "from h import shared_helper\n\ndef one(v):\n    return shared_helper(v)\n"
    caller_b = "from h import shared_helper\n\ndef two(v):\n    return shared_helper(v)\n"
    files = _files([("h.py", helper), ("a.py", caller_a), ("b.py", caller_b)])
    # the callers' EXP texts differ only in the function name, which
    # costs a few shingles of a small text: composite lands ~0.88, so
    # gate EXP at 0.8 — this test verifies the EXP plumbing end-to-end,
    # not threshold calibration
    from clonehunter_ray.config import Thresholds

    cfg = EngineConfig(
        expansion=ExpansionConfig(enabled=True),
        thresholds=Thresholds(exp=0.8),
    )
    res = scan(ray.data.from_arrow(files), cfg)
    kinds = set(res.snippets.to_pandas()["kind"]) if res.snippets.count() else set()
    sig_kinds = set(res.signatures.to_pandas()["kind"])
    assert "EXP" in sig_kinds
    f = res.findings.to_pandas()
    # the two callers are near-identical after expansion
    pairs = {(r.unit_a.split(":")[0], r.unit_b.split(":")[0]) for r in f.itertuples()}
    assert any({a, b} == {"a.py", "b.py"} for a, b in pairs)


def test_factory_return_inference_local():
    """obj = make_thing(); obj.m() — resolved via the factory's return
    class (reference snippets/expansion.py:484-501)."""
    src = (
        "class Thing:\n"
        "    def work(self):\n"
        "        return 42\n"
        "\n"
        "def make_thing():\n"
        "    return Thing()\n"
        "\n"
        "def use():\n"
        "    obj = make_thing()\n"
        "    return obj.work()\n"
    )
    out = expand_repo_group(_files([("m.py", src)]))
    by_qual = {r["qualified_name"]: r for r in out.to_pylist()}
    assert "use" in by_qual
    assert "def work" in by_qual["use"]["text"]


def test_factory_return_inference_direct_chain():
    """make_thing().m() without a variable binding."""
    src = (
        "class Gadget:\n"
        "    def spin(self):\n"
        "        return 1\n"
        "\n"
        "def build():\n"
        "    return Gadget()\n"
        "\n"
        "def go():\n"
        "    return build().spin()\n"
    )
    out = expand_repo_group(_files([("m.py", src)]))
    by_qual = {r["qualified_name"]: r for r in out.to_pylist()}
    assert "go" in by_qual
    assert "def spin" in by_qual["go"]["text"]


def test_factory_return_inference_cross_module():
    """Imported factory returning a class from ITS module."""
    widgets = (
        "class Widget:\n"
        "    def render(self):\n"
        "        return 'w'\n"
        "\n"
        "def new_widget():\n"
        "    return Widget()\n"
    )
    main = (
        "from widgets import new_widget\n"
        "\n"
        "def page():\n"
        "    w = new_widget()\n"
        "    return w.render()\n"
    )
    out = expand_repo_group(_files([("widgets.py", widgets), ("main.py", main)]))
    by_qual = {
        (r["path"], r["qualified_name"]): r for r in out.to_pylist()
    }
    assert ("main.py", "page") in by_qual
    assert "def render" in by_qual[("main.py", "page")]["text"]


def test_scan_code_expansion_row_content_pin(ray_session):
    """Oracle-style pin: the expansion scan's finding rows are
    deterministic across runs (same pair set), not just the same count."""
    import sys

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    def pairs(res):
        df = res.to_pandas()
        return sorted(zip(df["unit_a"], df["unit_b"], df["score"].round(6)))

    first = pairs(E._scan_code_expansion("/root/testdata/sf0.001"))
    second = pairs(E._scan_code_expansion("/root/testdata/sf0.001"))
    assert first and first == second
