"""Snippet generation: units -> snippets (FUNC + WIN), with docstring
normalization.

Reference semantics reproduced:
* ``normalize_source`` / ``strip_docstrings``: AST round-trip replacing
  leading string-constant statements of Module / FunctionDef /
  AsyncFunctionDef bodies with ``pass``, then ``ast.unparse`` (which
  also normalizes formatting/quotes); unparseable text returned
  verbatim (reference snippets/normalization.py:6-37).
* FUNC snippet per unit with hash recipe
  ``FUNC:{path}:{start}:{end}:{code_hash}``
  (reference snippets/generators.py:34-50).
* WIN sliding windows of ``window_lines`` step ``stride_lines`` over
  the unit's code lines, kept when >= ``min_nonempty`` non-blank lines;
  hash recipe includes kind/path/function-span/code-hash/window-span/
  normalized text (reference snippets/generators.py:17-31,53-74).
* FUNC snippets are generated for python units only; WIN windows for
  every unit (reference core/pipeline.py:143-165).

Engine shape: stateless flat-map, ``map_batches(generate_snippets_batch,
batch_format="pyarrow")`` — 1 unit row -> 1 FUNC row + K WIN rows.
"""

from __future__ import annotations

import ast

import pyarrow as pa

from clonehunter_ray.config import WindowConfig
from clonehunter_ray.functions.hashing import sha256_hex

SNIPPETS_SCHEMA = pa.schema(
    [
        ("snippet_id", pa.string()),
        ("kind", pa.string()),  # FUNC | WIN | EXP
        ("unit_id", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("qualified_name", pa.string()),
        ("unit_start", pa.int32()),
        ("unit_end", pa.int32()),
        ("start_line", pa.int32()),
        ("end_line", pa.int32()),
        ("text", pa.string()),
    ]
)


def strip_docstrings(source: str) -> str:
    """Docstring-strip + format normalization via AST round-trip
    (reference snippets/normalization.py:6-31 semantics)."""
    try:
        tree = ast.parse(source)
    except (SyntaxError, ValueError):
        return source

    def strip_body(node: ast.AST) -> None:
        body = getattr(node, "body", None)
        if body:
            first = body[0]
            if (
                isinstance(first, ast.Expr)
                and isinstance(first.value, ast.Constant)
                and isinstance(first.value.value, str)
            ):
                body[0] = ast.Pass()

    strip_body(tree)
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            strip_body(node)
    ast.fix_missing_locations(tree)
    return ast.unparse(tree)


def normalize_source(source: str) -> str:
    return strip_docstrings(source)


def generate_snippets_batch(batch: pa.Table, window: WindowConfig) -> pa.Table:
    """units batch -> snippets batch (FUNC for python + WIN for all)."""
    window.validate()
    cols: dict[str, list] = {name: [] for name in SNIPPETS_SCHEMA.names}

    def emit(kind, sid, row, start, end, text):
        cols["snippet_id"].append(sid)
        cols["kind"].append(kind)
        cols["unit_id"].append(row["unit_id"])
        cols["repo"].append(row["repo"])
        cols["path"].append(row["path"])
        cols["qualified_name"].append(row["qualified_name"])
        cols["unit_start"].append(row["start_line"])
        cols["unit_end"].append(row["end_line"])
        cols["start_line"].append(start)
        cols["end_line"].append(end)
        cols["text"].append(text)

    for row in batch.to_pylist():
        code = row["code"]
        fn_start, fn_end = row["start_line"], row["end_line"]
        path, code_hash = row["path"], row["code_hash"]
        if row["lang"] == "python":
            # FUNC snippet (reference generators.py:34-50)
            sid = sha256_hex(f"FUNC:{path}:{fn_start}:{fn_end}:{code_hash}")
            emit("FUNC", sid, row, fn_start, fn_end, normalize_source(code))
        # WIN windows (reference generators.py:53-74)
        lines = code.splitlines()
        if not lines:
            continue
        idx = 0
        while idx < len(lines):
            start = idx + 1
            end = min(idx + window.window_lines, len(lines))
            window_lines = lines[start - 1 : end]
            nonempty = sum(1 for line in window_lines if line.strip())
            if nonempty >= window.min_nonempty:
                snippet_text = "\n".join(window_lines)
                normalized = normalize_source(snippet_text)
                sid = sha256_hex(
                    f"WIN:{path}:{fn_start}:{fn_end}:{code_hash}:{start}:{end}:{normalized}"
                )
                emit(
                    "WIN",
                    sid,
                    row,
                    fn_start + start - 1,
                    fn_start + end - 1,
                    normalized,
                )
            idx += window.stride_lines
    return pa.Table.from_pydict(cols, schema=SNIPPETS_SCHEMA)
