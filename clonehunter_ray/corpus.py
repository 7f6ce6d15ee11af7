"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the engine's input table ``files(repo, path, commit, lang,
content)`` (BASELINE.json input_hint shape) plus ground-truth side
tables ``truth_pairs(unit_a, unit_b, family, expected)`` for dup-pair
recall accounting. Content is assembled from a bank of template
functions instantiated into clone families with controlled mutations
(in the spirit of the reference fixtures ``fixtures/tiny_repo`` /
``fixtures/demo_monorepo``):

* ``exact``       — identical function code in different files (Type-1)
* ``rename``      — function name renamed, body identical (light Type-2;
                    stays above the FUNC composite threshold)
* ``docstring``   — docstring changed (equal after docstring-strip
                    normalization, reference snippets/normalization.py:6-37)
* ``partial``     — an 18-line block copied at the same stride-aligned
                    offset into two otherwise-different functions
                    (caught by WIN windows, reference generators.py:53-74)
* ``crossext``    — identical text under .js and .ts (whole-file units)
* ``renameheavy`` — all identifiers renamed (expected **False**:
                    below-threshold near-miss negative)
* skew material   — a 10-line boilerplate header in ~10% of text files:
                    hot shingles -> giant LSH buckets, but every window
                    containing it also contains distinct lines so no
                    finding clears the thresholds.

Fully deterministic for a given (n_files, seed); no external data.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

FAMILY_KINDS = ["exact", "rename", "docstring", "partial", "crossext", "renameheavy"]

# 30-ish-line template so the rename family's single-token mutation
# keeps composite similarity above the FUNC threshold (0.92).
_LONG_TEMPLATE = '''def {fn}(items, factor):
    """{doc}"""
    total = 0
    count = 0
    limit = {m1}
    for value in items:
        if value is None:
            continue
        if value % {m2} == 0:
            total += value * factor
            count += 1
        elif value % {m3} == 0:
            total -= value
        else:
            total += value // {m4}
        if count > limit:
            break
    scale = factor + {m5}
    if total < 0:
        total = -total
    remainder = total % scale
    if remainder > scale // 2:
        total += scale - remainder
    else:
        total -= remainder
    result = total + count * {m6}
    if result < 0:
        result = 0
    return result'''

_SHORT_TEMPLATE = '''def {fn}(data):
    """{doc}"""
    out = []
    for key in sorted(data):
        val = data[key]
        if isinstance(val, str):
            out.append(key + "=" + val)
        else:
            out.append(key + ":" + str(val * {m1}))
    return out'''

_PARTIAL_BLOCK = """    acc = []
    mark = {m1}
    for item in seq:
        node = item * mark
        if node % 3 == 0:
            acc.append(node - {m2})
        elif node % 5 == 0:
            acc.append(node + {m3})
        else:
            acc.append(node)
        if len(acc) > {m4}:
            mark += 1
            if mark > {m5}:
                mark = 1
        last = node
        total = sum(acc)
        if total > {m6}:
            acc = acc[-4:]"""  # 18 lines, indented as a function body

_SKEW_HEADER = """Copyright (c) Example Project Contributors
Licensed under the Example License Version 2 point 0
you may not use this file except in compliance with the License
You may obtain a copy of the License at example dot org slash licenses
Unless required by applicable law or agreed to in writing software
distributed under the License is distributed on an AS IS BASIS
WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND either express or implied
See the License for the specific language governing permissions
and limitations under the License
End of standard boilerplate header block"""  # 10 lines


def _commit_for(repo: str) -> str:
    return hashlib.sha256(repo.encode()).hexdigest()[:40]


def _unique_fn(rng: random.Random, tag: str) -> str:
    return f"fn_{tag}_{rng.randrange(10**9):09d}"


def _instantiate(template: str, rng: random.Random, fn: str, doc: str) -> str:
    subs = {f"m{i}": rng.randrange(2, 97) for i in range(1, 8)}
    return template.format(fn=fn, doc=doc, **subs)


def _rename_all(code: str, rng: random.Random, tag: str) -> str:
    """Heavy rename: remap every user identifier consistently."""
    mapping = {}
    for name in [
        "items", "factor", "total", "count", "limit", "value", "scale",
        "remainder", "result", "data", "out", "key", "val", "seq", "acc",
        "mark", "item", "node", "last",
    ]:
        mapping[name] = f"{name[0]}{tag}{rng.randrange(1000):03d}"
    import re

    def sub(m):
        return mapping.get(m.group(0), m.group(0))

    return re.sub(r"\b[a-z_][a-z0-9_]*\b",
                  lambda m: mapping.get(m.group(0), m.group(0)), code)


class _PyFile:
    """Accumulates function blocks and tracks line spans."""

    def __init__(self, repo: str, path: str) -> None:
        self.repo = repo
        self.path = path
        self.lines: list[str] = ['"""module"""', ""]

    def add_function(self, code: str) -> tuple[str, int, int]:
        start = len(self.lines) + 1
        fn_lines = code.split("\n")
        self.lines.extend(fn_lines)
        end = len(self.lines)
        self.lines.append("")
        name = fn_lines[0].split("(")[0].replace("def ", "").strip()
        return name, start, end

    def content(self) -> str:
        return "\n".join(self.lines) + "\n"


def _uid(path: str, qualname: str, start: int, end: int) -> str:
    return f"{path}:{qualname}:{start}:{end}"


def generate_corpus(
    n_files: int = 200, seed: int = 42
) -> tuple[pa.Table, pa.Table]:
    """Returns (files_table, truth_pairs_table)."""
    rng = random.Random(seed)
    n_repos = max(1, n_files // 20)
    n_py = int(n_files * 0.7)
    n_text = n_files - n_py

    py_files: list[_PyFile] = []
    for i in range(n_py):
        repo = f"repo_{i % n_repos:03d}"
        path = f"src/pkg{i % 7}/mod_{i:05d}.py"
        py_files.append(_PyFile(repo, path))

    truth: list[tuple[str, str, str, bool]] = []

    # ---- clone families over python files -------------------------------
    n_families = max(1, n_py // 10)
    family_kinds = ["exact", "rename", "docstring", "partial", "renameheavy"]
    file_cursor = 0

    def next_files(k: int) -> list[_PyFile]:
        nonlocal file_cursor
        chosen = []
        for _ in range(k):
            chosen.append(py_files[file_cursor % len(py_files)])
            file_cursor += 1
        return chosen

    for fam_idx in range(n_families):
        kind = family_kinds[fam_idx % len(family_kinds)]
        tag = f"f{fam_idx:04d}"
        members: list[tuple[str, str, int, int]] = []  # (path, name, start, end)
        if kind == "exact":
            fn = _unique_fn(rng, tag)
            code = _instantiate(_LONG_TEMPLATE, rng, fn, f"compute {tag}")
            for f in next_files(rng.randint(2, 3)):
                name, s, e = f.add_function(code)
                members.append((f.path, name, s, e))
        elif kind == "rename":
            base_rng_state = rng.getstate()
            doc = f"process {tag}"
            # same body, different function name per member
            subs_rng = random.Random(rng.randrange(2**31))
            body_code = _instantiate(_LONG_TEMPLATE, subs_rng, "PLACEHOLDER", doc)
            for j, f in enumerate(next_files(2)):
                fn = f"fn_{tag}_v{j}"
                name, s, e = f.add_function(body_code.replace("PLACEHOLDER", fn))
                members.append((f.path, name, s, e))
        elif kind == "docstring":
            fn = _unique_fn(rng, tag)
            subs_rng = random.Random(rng.randrange(2**31))
            for j, f in enumerate(next_files(2)):
                subs_rng2 = random.Random(subs_rng.getstate()[1][0])
                code = _instantiate(
                    _LONG_TEMPLATE,
                    random.Random(fam_idx * 7 + 1),
                    fn,
                    f"different docstring variant {j} {tag}",
                )
                name, s, e = f.add_function(code)
                members.append((f.path, name, s, e))
        elif kind == "partial":
            block = _PARTIAL_BLOCK.format(
                **{f"m{i}": rng.randrange(2, 97) for i in range(1, 7)}
            )
            for j, f in enumerate(next_files(2)):
                fn = _unique_fn(rng, f"{tag}p{j}")
                # 6 prefix lines (incl. def) then the block, then suffix —
                # the block starts at function line 7 in BOTH members so a
                # stride-aligned window (starts 1,7,13,...) falls fully
                # inside it at the same block offset.
                uniq = rng.randrange(10**6)
                prefix = (
                    f"def {fn}(seq):\n"
                    f"    base_{j} = {uniq}\n"
                    f"    top_{j} = base_{j} * {rng.randrange(2, 9)}\n"
                    f"    seq = [s + {rng.randrange(1, 9)} for s in seq]\n"
                    f"    flag_{j} = len(seq) > {rng.randrange(2, 50)}\n"
                    f"    pad_{j} = {rng.randrange(100)}\n"
                )
                suffix = (
                    f"    tail_{j} = sum(acc) + pad_{j}\n"
                    f"    if flag_{j}:\n"
                    f"        tail_{j} += top_{j}\n"
                    f"    return tail_{j}"
                )
                code = prefix + block + "\n" + suffix
                name, s, e = f.add_function(code)
                members.append((f.path, name, s, e))
        elif kind == "renameheavy":
            fn = _unique_fn(rng, tag)
            subs_rng = random.Random(rng.randrange(2**31))
            code = _instantiate(_LONG_TEMPLATE, subs_rng, fn, f"heavy {tag}")
            f0, f1 = next_files(2)
            name0, s0, e0 = f0.add_function(code)
            renamed = _rename_all(code, rng, tag).replace(fn, _unique_fn(rng, tag + "r"))
            name1, s1, e1 = f1.add_function(renamed)
            members = []
            truth.append(
                (
                    _uid(f0.path, name0, s0, e0),
                    _uid(f1.path, name1, s1, e1),
                    "renameheavy",
                    False,
                )
            )
        expected = kind != "renameheavy"
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pa_, na, sa, ea = members[i]
                pb_, nb, sb, eb = members[j]
                truth.append(
                    (_uid(pa_, na, sa, ea), _uid(pb_, nb, sb, eb), kind, expected)
                )

    # ---- unique filler functions ---------------------------------------
    for i, f in enumerate(py_files):
        n_fill = rng.randint(1, 3)
        for _ in range(n_fill):
            tmpl = _LONG_TEMPLATE if rng.random() < 0.3 else _SHORT_TEMPLATE
            fn = _unique_fn(rng, f"u{i:05d}")
            f.add_function(_instantiate(tmpl, rng, fn, f"unique helper {fn}"))

    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for f in py_files:
        rows["repo"].append(f.repo)
        rows["path"].append(f.path)
        rows["commit"].append(_commit_for(f.repo))
        rows["lang"].append("python")
        rows["content"].append(f.content())

    # ---- text files: crossext families + skew headers ------------------
    exts = [".js", ".ts", ".go", ".rs", ".txt"]
    n_crossext = max(1, n_text // 10)
    ti = 0
    for c in range(n_crossext):
        if ti + 2 > n_text:
            break
        repo = f"repo_{rng.randrange(n_repos):03d}"
        body_lines = [
            f"function handler_{c}_{k}(req, res) begin "
            f"value_{rng.randrange(1000)} plus {rng.randrange(1000)} end"
            for k in range(14)
        ]
        content = "\n".join(body_lines) + "\n"
        nl = len(content.splitlines())
        pj = f"web/widget_{c:04d}.js"
        pt = f"web/widget_{c:04d}.ts"
        for path in (pj, pt):
            rows["repo"].append(repo)
            rows["path"].append(path)
            rows["commit"].append(_commit_for(repo))
            rows["lang"].append("text")
            rows["content"].append(content)
        base_j = pj.rsplit("/", 1)[1]
        base_t = pt.rsplit("/", 1)[1]
        truth.append(
            (_uid(pj, base_j, 1, nl), _uid(pt, base_t, 1, nl), "crossext", True)
        )
        ti += 2

    while ti < n_text:
        repo = f"repo_{rng.randrange(n_repos):03d}"
        ext = exts[ti % len(exts)]
        path = f"misc/file_{ti:05d}{ext}"
        body = [
            f"line {k} of file {ti} token_{rng.randrange(10**6)} "
            f"data_{rng.randrange(10**6)}"
            for k in range(rng.randint(8, 25))
        ]
        if rng.random() < 0.10:  # skew material
            body = _SKEW_HEADER.split("\n") + body[:4]
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(_commit_for(repo))
        rows["lang"].append("text")
        rows["content"].append("\n".join(body) + "\n")
        ti += 1

    files_table = pa.Table.from_pydict(
        rows,
        schema=pa.schema(
            [
                ("repo", pa.string()),
                ("path", pa.string()),
                ("commit", pa.string()),
                ("lang", pa.string()),
                ("content", pa.string()),
            ]
        ),
    )
    truth_table = pa.Table.from_pydict(
        {
            "unit_a": [min(a, b) for a, b, _, _ in truth],
            "unit_b": [max(a, b) for a, b, _, _ in truth],
            "family": [f for _, _, f, _ in truth],
            "expected": [e for _, _, _, e in truth],
        },
        schema=pa.schema(
            [
                ("unit_a", pa.string()),
                ("unit_b", pa.string()),
                ("family", pa.string()),
                ("expected", pa.bool_()),
            ]
        ),
    )
    return files_table, truth_table


def write_corpus(out_dir: str, n_files: int = 200, seed: int = 42) -> tuple[str, str]:
    """Write files.parquet + truth_pairs.parquet under out_dir."""
    import os

    import pyarrow.parquet as pq

    files_table, truth_table = generate_corpus(n_files, seed)
    os.makedirs(out_dir, exist_ok=True)
    fp = os.path.join(out_dir, "files.parquet")
    tp = os.path.join(out_dir, "truth_pairs.parquet")
    pq.write_table(files_table, fp, row_group_size=4096)
    pq.write_table(truth_table, tp)
    return fp, tp
