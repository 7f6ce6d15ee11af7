"""Unit tests for extraction and snippet generation (reference-parity
semantics, no Ray needed — they run on plain Arrow tables)."""

import pyarrow as pa
import pytest

from clonehunter_ray.config import WindowConfig
from clonehunter_ray.stages.extract import (
    extract_python_units,
    extract_text_unit,
    extract_units_batch,
)
from clonehunter_ray.stages.snippets import (
    generate_snippets_batch,
    normalize_source,
    strip_docstrings,
)

PY_SRC = '''"""module doc"""


def top(a):
    return a + 1


class Box:
    def method(self):
        return 2

    class Inner:
        def deep(self):
            return 3


async def coro():
    pass
'''


def _files_batch(rows):
    return pa.Table.from_pydict(
        {
            "repo": [r.get("repo", "r") for r in rows],
            "path": [r["path"] for r in rows],
            "commit": [r.get("commit", "c" * 40) for r in rows],
            "lang": [r.get("lang") for r in rows],
            "content": [r["content"] for r in rows],
        }
    )


def test_python_qualified_names_and_spans():
    units = extract_python_units("m.py", PY_SRC)
    names = [u["qualified_name"] for u in units]
    # nested names via class/function stack (reference python_ast.py:24-67)
    assert names == ["top", "Box.method", "Box.Inner.deep", "coro"]
    top = units[0]
    assert top["start_line"] == 4 and top["end_line"] == 5
    assert top["code"] == "def top(a):\n    return a + 1"


def test_python_syntax_error_yields_zero_units():
    assert extract_python_units("bad.py", "def broken(:\n  pass") == []


def test_text_unit_whole_file_and_blank_dropped():
    assert extract_text_unit("a.txt", "  \n \n") == []
    u = extract_text_unit("dir/a.txt", "x\ny\nz\n")
    assert u[0]["qualified_name"] == "a.txt"
    assert u[0]["start_line"] == 1 and u[0]["end_line"] == 3


def test_extract_units_batch_flatmap_and_lang_fallback():
    batch = _files_batch(
        [
            {"path": "a.py", "content": PY_SRC, "lang": None},
            {"path": "b.js", "content": "var x = 1;\n", "lang": None},
        ]
    )
    units = extract_units_batch(batch)
    langs = set(units["lang"].to_pylist())
    assert langs == {"python", "text"}
    assert units.num_rows == 5  # 4 python functions + 1 text unit
    # unit identity format (reference core/types.py:27-29)
    assert units["unit_id"][0].as_py() == "a.py:top:4:5"


def test_strip_docstrings_semantics():
    src = 'def f():\n    """doc"""\n    return 1\n'
    out = strip_docstrings(src)
    assert '"""doc"""' not in out
    assert "pass" in out  # docstring replaced by pass, not removed
    assert "return 1" in out
    # unparseable text passes through verbatim
    frag = "    if x:\n        y += 1"
    assert normalize_source(frag) == frag
    # module docstring also stripped
    mod = '"""m"""\nx = 1\n'
    out2 = strip_docstrings(mod)
    assert '"""m"""' not in out2


def test_docstring_variants_normalize_equal():
    a = 'def f(x):\n    """one"""\n    return x * 2\n'
    b = 'def f(x):\n    "completely different"\n    return x * 2\n'
    assert normalize_source(a) == normalize_source(b)


def _units_for(src, path="m.py", lang="python"):
    return extract_units_batch(_files_batch([{"path": path, "content": src, "lang": lang}]))


def test_func_snippets_python_only():
    units = _units_for(PY_SRC)
    snips = generate_snippets_batch(units, WindowConfig(12, 6, 1))
    kinds = snips["kind"].to_pylist()
    assert kinds.count("FUNC") == 4
    t_units = _units_for("line1\nline2\nline3\nline4\nline5\n", "a.txt", "text")
    t_snips = generate_snippets_batch(t_units, WindowConfig(12, 6, 1))
    assert "FUNC" not in t_snips["kind"].to_pylist()  # text: windows only


def test_window_generation_stride_and_min_nonempty():
    code = "\n".join(f"l{i} = {i}" for i in range(1, 21))  # 20 lines
    units = _units_for("def f():\n    pass\n", "x.txt", "text")
    # build a fake unit directly for precise control
    unit = pa.Table.from_pydict(
        {
            "unit_id": ["u"],
            "repo": ["r"],
            "path": ["x.txt"],
            "commit": ["c"],
            "lang": ["text"],
            "qualified_name": ["x.txt"],
            "start_line": [1],
            "end_line": [20],
            "code": [code],
            "code_hash": ["h"],
        }
    )
    snips = generate_snippets_batch(unit, WindowConfig(12, 6, 4))
    spans = [
        (s, e)
        for s, e in zip(
            snips["start_line"].to_pylist(), snips["end_line"].to_pylist()
        )
    ]
    # windows at idx 0,6,12 -> [1,12],[7,18],[13,20]; [19,20] dropped (<4 nonempty)
    assert spans == [(1, 12), (7, 18), (13, 20)]


def test_window_params_validated():
    unit = pa.Table.from_pydict(
        {
            "unit_id": ["u"], "repo": ["r"], "path": ["p"], "commit": ["c"],
            "lang": ["text"], "qualified_name": ["q"], "start_line": [1],
            "end_line": [1], "code": ["x"], "code_hash": ["h"],
        }
    )
    with pytest.raises(ValueError):
        generate_snippets_batch(unit, WindowConfig(0, 6, 4))
    with pytest.raises(ValueError):
        generate_snippets_batch(unit, WindowConfig(12, 0, 4))


def test_window_line_numbers_offset_by_function_start():
    code = "\n".join(f"x{i} = {i}" for i in range(1, 15))
    unit = pa.Table.from_pydict(
        {
            "unit_id": ["u"], "repo": ["r"], "path": ["p"], "commit": ["c"],
            "lang": ["text"], "qualified_name": ["q"], "start_line": [100],
            "end_line": [113], "code": [code], "code_hash": ["h"],
        }
    )
    snips = generate_snippets_batch(unit, WindowConfig(12, 6, 4))
    # snippet lines are file-absolute (reference generators.py:26-27)
    assert snips["start_line"][0].as_py() == 100
    assert snips["end_line"][0].as_py() == 111
