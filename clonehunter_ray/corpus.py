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
# keeps composite similarity above the FUNC threshold (0.92). Every
# local identifier is a placeholder suffixed per family/filler so that
# distinct instantiations share no window-level text (prevents
# unintended cross-family clones).
_LONG_TEMPLATE = '''def {fn}(items{u}, factor{u}):
    """{doc}"""
    total{u} = 0
    count{u} = 0
    limit{u} = {m1}
    for value{u} in items{u}:
        if value{u} is None:
            continue
        if value{u} % {m2} == 0:
            total{u} += value{u} * factor{u}
            count{u} += 1
        elif value{u} % {m3} == 0:
            total{u} -= value{u}
        else:
            total{u} += value{u} // {m4}
        if count{u} > limit{u}:
            break
    scale{u} = factor{u} + {m5}
    if total{u} < 0:
        total{u} = -total{u}
    remainder{u} = total{u} % scale{u}
    if remainder{u} > scale{u} // 2:
        total{u} += scale{u} - remainder{u}
    else:
        total{u} -= remainder{u}
    result{u} = total{u} + count{u} * {m6}
    if result{u} < 0:
        result{u} = 0
    return result{u}'''

_SHORT_TEMPLATE = '''def {fn}(data{u}):
    """{doc}"""
    out{u} = []
    for key{u} in sorted(data{u}):
        val{u} = data{u}[key{u}]
        if isinstance(val{u}, str):
            out{u}.append(key{u} + "={m2}" + val{u})
        else:
            out{u}.append(key{u} + ":{m3}" + str(val{u} * {m1}))
    return out{u}'''

_PARTIAL_BLOCK = """    acc{u} = []
    mark{u} = {m1}
    for item{u} in seq{u}:
        node{u} = item{u} * mark{u}
        if node{u} % 3 == 0:
            acc{u}.append(node{u} - {m2})
        elif node{u} % 5 == 0:
            acc{u}.append(node{u} + {m3})
        else:
            acc{u}.append(node{u})
        if len(acc{u}) > {m4}:
            mark{u} += 1
            if mark{u} > {m5}:
                mark{u} = 1
        last{u} = node{u}
        bsum{u} = sum(acc{u})
        if bsum{u} > {m6}:
            acc{u} = acc{u}[-4:]"""  # 18 lines, indented as a function body

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


def _instantiate(
    template: str, rng: random.Random, fn: str, doc: str, u: str
) -> str:
    """Instantiate a template with per-instance identifier suffix ``u``
    and per-instance numeric constants."""
    subs = {f"m{i}": rng.randrange(2, 97) for i in range(1, 8)}
    return template.format(fn=fn, doc=doc, u=u, **subs)


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
        u = f"_{tag}"
        if kind == "exact":
            fn = _unique_fn(rng, tag)
            code = _instantiate(_LONG_TEMPLATE, rng, fn, f"compute {tag}", u)
            for f in next_files(rng.randint(2, 3)):
                name, s, e = f.add_function(code)
                members.append((f.path, name, s, e))
        elif kind == "rename":
            doc = f"process {tag}"
            # same body, different function name per member
            body_code = _instantiate(_LONG_TEMPLATE, rng, "PLACEHOLDER", doc, u)
            for j, f in enumerate(next_files(2)):
                fn = f"fn_{tag}_v{j}"
                name, s, e = f.add_function(body_code.replace("PLACEHOLDER", fn))
                members.append((f.path, name, s, e))
        elif kind == "docstring":
            fn = _unique_fn(rng, tag)
            subs_seed = rng.randrange(2**31)
            for j, f in enumerate(next_files(2)):
                code = _instantiate(
                    _LONG_TEMPLATE,
                    random.Random(subs_seed),  # same constants both members
                    fn,
                    f"different docstring variant {j} {tag}",
                    u,
                )
                name, s, e = f.add_function(code)
                members.append((f.path, name, s, e))
        elif kind == "partial":
            block = _PARTIAL_BLOCK.format(
                u=u, **{f"m{i}": rng.randrange(2, 97) for i in range(1, 7)}
            )
            for j, f in enumerate(next_files(2)):
                fn = _unique_fn(rng, f"{tag}p{j}")
                # 6 prefix lines (incl. def) then the block, then suffix —
                # the block starts at function line 7 in BOTH members so a
                # stride-aligned window (starts 1,7,13,...) falls fully
                # inside it at the same block offset.
                uniq = rng.randrange(10**6)
                prefix = (
                    f"def {fn}(seq{u}):\n"
                    f"    base_{tag}_{j} = {uniq}\n"
                    f"    top_{tag}_{j} = base_{tag}_{j} * {rng.randrange(2, 9)}\n"
                    f"    seq{u} = [s_{j} + {rng.randrange(1, 9)} for s_{j} in seq{u}]\n"
                    f"    flag_{tag}_{j} = len(seq{u}) > {rng.randrange(2, 50)}\n"
                    f"    pad_{tag}_{j} = {rng.randrange(100)}\n"
                )
                suffix = (
                    f"    tail_{tag}_{j} = sum(acc{u}) + pad_{tag}_{j}\n"
                    f"    if flag_{tag}_{j}:\n"
                    f"        tail_{tag}_{j} += top_{tag}_{j}\n"
                    f"    return tail_{tag}_{j}"
                )
                code = prefix + block + "\n" + suffix
                name, s, e = f.add_function(code)
                members.append((f.path, name, s, e))
        elif kind == "renameheavy":
            # same template + constants, all identifiers suffixed
            # differently => consistent heavy rename, below threshold
            fn = _unique_fn(rng, tag)
            subs_seed = rng.randrange(2**31)
            code = _instantiate(
                _LONG_TEMPLATE, random.Random(subs_seed), fn, f"heavy {tag}", u
            )
            renamed = _instantiate(
                _LONG_TEMPLATE,
                random.Random(subs_seed),
                _unique_fn(rng, tag + "r"),
                f"heavy {tag}",
                f"_{tag}x",
            )
            f0, f1 = next_files(2)
            name0, s0, e0 = f0.add_function(code)
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
        for k in range(n_fill):
            tmpl = _LONG_TEMPLATE if rng.random() < 0.3 else _SHORT_TEMPLATE
            fn = _unique_fn(rng, f"u{i:05d}")
            f.add_function(
                _instantiate(tmpl, rng, fn, f"unique helper {fn}", f"_u{i:05d}{k}")
            )

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
