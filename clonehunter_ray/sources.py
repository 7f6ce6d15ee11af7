"""Input adapters: the corpus IS a Parquet table (BASELINE.json
input_hint), but the reference's convenience sources are reproduced for
API parity:

* ``files_from_directory`` — recursive walk with include/exclude globs,
  early directory pruning, resolved-path dedupe, utf-8-with-replace
  read, language detection (reference io/fs.py:11-105). Driver-side by
  design: local directories are a small-scan convenience; the scale
  input is ``read_files_parquet``.
* ``changed_files`` — ``git diff --name-only BASE`` + untracked files,
  order-preserving dedupe (reference io/git.py:12-42).
* ``read_sonarqube_report`` — import adapter fabricating findings rows
  from an external JSON report (reference engines/sonarqube_engine.py:21-67).
"""

from __future__ import annotations

import fnmatch
import os
import subprocess

import pyarrow as pa

# reference io/fs.py:11-14 — .py gets AST treatment, all else is text
_PY_SUFFIXES = (".py",)

DEFAULT_INCLUDE = ("**/*.py",)
DEFAULT_EXCLUDE = (
    "**/.git/**",
    "**/__pycache__/**",
    "**/.venv/**",
    "**/venv/**",
    "**/node_modules/**",
)

# repotype include-glob presets (reference cli/commands/scan.py:15-74:
# 13 language presets; "monorepo" = the union of all of them)
REPOTYPE_GLOBS: dict[str, tuple[str, ...]] = {
    "python": ("**/*.py",),
    "javascript": ("**/*.js", "**/*.jsx", "**/*.mjs"),
    "typescript": ("**/*.ts", "**/*.tsx"),
    "java": ("**/*.java",),
    "go": ("**/*.go",),
    "rust": ("**/*.rs",),
    "c": ("**/*.c", "**/*.h"),
    "cpp": ("**/*.cc", "**/*.cpp", "**/*.cxx", "**/*.hpp", "**/*.hh"),
    "csharp": ("**/*.cs",),
    "ruby": ("**/*.rb",),
    "php": ("**/*.php",),
    "swift": ("**/*.swift",),
    "kotlin": ("**/*.kt", "**/*.kts"),
}
REPOTYPE_GLOBS["monorepo"] = tuple(
    dict.fromkeys(g for globs in REPOTYPE_GLOBS.values() for g in globs)
)


def resolve_repotype_globs(repotypes: list[str]) -> tuple[str, ...]:
    """Union of the presets, order-preserving dedupe (reference
    scan.py:205-226)."""
    out: dict[str, None] = {}
    for rt in repotypes:
        if rt not in REPOTYPE_GLOBS:
            raise ValueError(
                f"unknown repotype {rt!r}; available: {sorted(REPOTYPE_GLOBS)}"
            )
        for g in REPOTYPE_GLOBS[rt]:
            out[g] = None
    return tuple(out)


def merge_globs(
    config_globs: tuple[str, ...],
    repotype_globs: tuple[str, ...],
    cli_globs: tuple[str, ...],
) -> tuple[str, ...]:
    """Layered merge config -> repotype -> CLI with CLI-wins conflict
    removal and order-preserving dedupe (reference scan.py:188-202:
    explicit CLI globs replace the earlier layers entirely when given)."""
    if cli_globs:
        return tuple(dict.fromkeys(cli_globs))
    return tuple(dict.fromkeys((*config_globs, *repotype_globs)))

FILES_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)


def detect_language(path: str) -> str:
    """Reference _detect_language (io/fs.py:11-14)."""
    return "python" if path.endswith(_PY_SUFFIXES) else "text"


def root_labels(paths: list[str]) -> list[str]:
    """The unique label each scan root's file paths are prefixed with
    in multi-root scans (basename, '#n'-suffixed on collision). Shared
    by files_from_directory and the diff command's change-set rebase so
    the two always agree."""
    counts: dict[str, int] = {}
    out: list[str] = []
    for p in paths:
        base = os.path.basename(os.path.abspath(p)) or "root"
        n = counts.get(base, 0)
        counts[base] = n + 1
        out.append(base if n == 0 else f"{base}#{n}")
    return out


def _matches(rel_path: str, globs: tuple[str, ...]) -> bool:
    """Glob match against the relative path; a pattern without '/' also
    matches the basename (reference io/fs.py:17-40 semantics)."""
    base = os.path.basename(rel_path)
    for g in globs:
        if fnmatch.fnmatch(rel_path, g) or (
            "/" not in g and fnmatch.fnmatch(base, g)
        ):
            return True
        # '**/x' should also match a top-level 'x'
        if g.startswith("**/") and fnmatch.fnmatch(rel_path, g[3:]):
            return True
    return False


def files_from_directory(
    paths: list[str],
    include_globs: tuple[str, ...] = DEFAULT_INCLUDE,
    exclude_globs: tuple[str, ...] = DEFAULT_EXCLUDE,
    repo: str = "local",
    commit: str = "",
) -> pa.Table:
    """Walk ``paths`` into a files table (reference collect_files,
    io/fs.py:93-105): dedupe by resolved path, prune excluded dirs
    early, read utf-8 with replacement, tag language."""
    seen: set[str] = set()
    rows: dict[str, list] = {c: [] for c in FILES_SCHEMA.names}
    # unit identity is path-based (stages/extract.py:43), so scanning
    # multiple roots that contain same-named relative paths (two
    # checkouts each with src/a.py) must disambiguate: prefix each
    # root's rel paths with a unique root label and use it as repo.
    multi_root = len(paths) > 1
    labels = root_labels(paths)

    for root_path, label in zip(paths, labels):
        root_label = label if multi_root else repo
        root_path = os.path.abspath(root_path)
        if os.path.isfile(root_path):
            candidates = [(os.path.dirname(root_path), root_path)]
        else:
            candidates = []
            for dirpath, dirnames, filenames in os.walk(root_path):
                rel_dir = os.path.relpath(dirpath, root_path)
                # early dir pruning (reference fs.py:66-90)
                dirnames[:] = [
                    d
                    for d in dirnames
                    if not _matches(
                        os.path.normpath(os.path.join(rel_dir, d)) + "/",
                        exclude_globs,
                    )
                    and not _matches(d + "/", exclude_globs)
                    and d not in (".git", "__pycache__", ".venv", "venv")
                ]
                for f in sorted(filenames):
                    candidates.append((root_path, os.path.join(dirpath, f)))
        for base, fp in candidates:
            resolved = os.path.realpath(fp)
            if resolved in seen:
                continue
            seen.add(resolved)
            rel = os.path.relpath(fp, base)
            if exclude_globs and _matches(rel, exclude_globs):
                continue
            if include_globs and not _matches(rel, include_globs):
                continue
            try:
                with open(fp, "rb") as fh:
                    content = fh.read().decode("utf-8", errors="replace")
            except OSError:
                continue
            rows["repo"].append(root_label)
            rows["path"].append(
                f"{root_label}/{rel}" if multi_root else rel
            )
            rows["commit"].append(commit)
            rows["lang"].append(detect_language(rel))
            rows["content"].append(content)
    return pa.Table.from_pydict(rows, schema=FILES_SCHEMA)


def git_toplevel(cwd: str | None = None) -> str | None:
    """Repo root for ``cwd`` (git paths are repo-root-relative; callers
    need this to rebase them onto the scan root). None outside a repo."""
    try:
        res = subprocess.run(
            ["git", "rev-parse", "--show-toplevel"],
            cwd=cwd, capture_output=True, text=True, check=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    top = res.stdout.strip()
    return top or None


def changed_files(base: str = "HEAD", cwd: str | None = None) -> list[str]:
    """Tracked diff vs ``base`` plus untracked files, order-preserving
    dedupe (reference io/git.py:12-42). Empty list on git failure."""
    out: list[str] = []
    seen: set[str] = set()
    for args in (
        ["git", "diff", "--name-only", base],
        ["git", "ls-files", "--others", "--exclude-standard"],
    ):
        try:
            res = subprocess.run(
                args, cwd=cwd, capture_output=True, text=True, check=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return []
        for line in res.stdout.splitlines():
            line = line.strip()
            if line and line not in seen:
                seen.add(line)
                out.append(line)
    return out


def read_sonarqube_report(path: str) -> pa.Table:
    """Fabricate findings rows (score=1.0) from a SonarQube-style JSON
    duplication report (reference engines/sonarqube_engine.py:21-67:
    external findings imported with fixed score)."""
    import json

    with open(path) as fh:
        data = json.load(fh)
    items = data.get("duplications", data if isinstance(data, list) else [])
    cols: dict[str, list] = {
        "pair_key": [],
        "unit_a": [],
        "unit_b": [],
        "path_a": [],
        "path_b": [],
        "qual_a": [],
        "qual_b": [],
        "score": [],
        "duplicated_lines": [],
        "reasons": [],
        "n_evidence": [],
        "best_evidence": [],
    }
    for item in items:
        a = item.get("a", {})
        b = item.get("b", {})
        ua = f"{a.get('path', '?')}:{a.get('name', '?')}:{a.get('start', 0)}:{a.get('end', 0)}"
        ub = f"{b.get('path', '?')}:{b.get('name', '?')}:{b.get('start', 0)}:{b.get('end', 0)}"
        if ub < ua:
            ua, ub, a, b = ub, ua, b, a
        cols["pair_key"].append(f"{ua}||{ub}")
        cols["unit_a"].append(ua)
        cols["unit_b"].append(ub)
        cols["path_a"].append(a.get("path", "?"))
        cols["path_b"].append(b.get("path", "?"))
        cols["qual_a"].append(a.get("name", "?"))
        cols["qual_b"].append(b.get("name", "?"))
        cols["score"].append(1.0)
        cols["duplicated_lines"].append(
            int(item.get("duplicated_lines", 0))
        )
        cols["reasons"].append(["imported"])
        cols["n_evidence"].append(1)
        cols["best_evidence"].append("sonarqube-import")
    from clonehunter_ray.stages.rollup import FINDINGS_SCHEMA

    return pa.Table.from_pydict(cols, schema=FINDINGS_SCHEMA)


# canonical corpus schema (BASELINE.json input_hint)
CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def read_corpus(path: str, fmt: str | None = None, columns=None):
    """Format-flexible corpus ingest -> ``ray.data.Dataset`` with the
    canonical (repo, path, commit, lang, content) schema.

    Real crawl/export corpora arrive as Parquet, JSONL, or CSV;
    ``fmt`` is auto-detected from the file extension when not given
    (a directory defaults to parquet, the scale format). All formats
    normalize to the same column order and string types so every
    downstream stage sees one schema regardless of source:

    * ``parquet`` — ``util.read_parquet_clean`` (column-pruned,
      metadata-free schema so Ray's schema dedup can hash it)
    * ``jsonl``/``json`` — ``ray.data.read_json`` (newline-delimited)
    * ``csv`` — ``ray.data.read_csv`` with ``newlines_in_values=True``
      (source-code content spans quoted newlines; Arrow's default
      block splitter would otherwise break mid-row on any file above
      one block) and every corpus column pinned to string at PARSE
      time (type inference would read an all-digit commit hash as
      int64 — dropping leading zeros on the cast back — and
      'null'/'NaN'/'' values as NULL)

    Raises ValueError if a required corpus column is missing.
    """
    import ray.data

    from clonehunter_ray.util import read_parquet_clean

    want = list(columns or CORPUS_COLUMNS)
    if fmt is None:
        low = path.lower()
        if low.endswith((".jsonl", ".json", ".ndjson")):
            fmt = "jsonl"
        elif low.endswith(".csv"):
            fmt = "csv"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        ds = read_parquet_clean(path, columns=want)
    elif fmt in ("jsonl", "json", "ndjson"):
        # ray.data.read_json's default file_extensions excludes
        # .ndjson, so a directly-named .ndjson file would raise
        # "No input files found" — accept all three spellings
        ds = ray.data.read_json(
            path, file_extensions=["json", "jsonl", "ndjson"]
        )
    elif fmt == "csv":
        from pyarrow import csv as pacsv

        ds = ray.data.read_csv(
            path,
            parse_options=pacsv.ParseOptions(newlines_in_values=True),
            convert_options=pacsv.ConvertOptions(
                column_types={c: pa.string() for c in want},
                strings_can_be_null=False,
            ),
        )
    else:
        raise ValueError(f"read_corpus: unknown format {fmt!r}")

    def _normalize(t: pa.Table) -> pa.Table:
        missing = [c for c in want if c not in t.column_names]
        if missing:
            raise ValueError(
                f"read_corpus({fmt}): missing corpus columns {missing}; "
                f"have {t.column_names}"
            )
        cols = {}
        for c in want:
            col = t[c]
            # CSV/JSON readers may infer large_string or null for empty
            # shards; pin every corpus column to plain string
            if col.type != pa.string():
                col = col.cast(pa.string())
            cols[c] = col
        return pa.table(cols)

    return ds.map_batches(_normalize, batch_format="pyarrow")
