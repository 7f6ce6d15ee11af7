"""EXP snippet generation: call-graph expansion of python functions.

Reference semantics (snippets/expansion.py:21-143 driver, _resolve_call
198-248, _collect_imports 285-324, _local_class_map 361-404,
_infer_return_class 484-501 — ~557 LoC, the reference's largest single
operator): for every function, resolve the helpers it calls and embed
their code after the function's own, up to ``depth`` levels and
``max_chars`` characters, producing an EXP snippet whose similarity
catches clones that differ only by helper inlining.

Resolved call shapes:

* ``f()``               — module-level function in the same file, or a
                           ``from mod import f [as alias]`` target
* ``self.m()``          — method of the enclosing class
* ``obj.m()``           — ``obj`` a local/module variable bound to a
                           known class (``obj = Cls(...)``)
* ``Cls().m()``         — direct construct-and-call
* ``mod.f()``           — via ``import mod [as alias]``

Engine shape: expansion is **per-repo local** (SURVEY.md §2.4), so it
runs as ``files.groupby("repo").map_groups(expand_repo_group)`` — the
symbol table never crosses repos and no global shuffle is needed. Off
by default (reference config.py:16) and outside the benchmark config.
"""

from __future__ import annotations

import ast
import posixpath

import pyarrow as pa

from clonehunter_ray.config import ExpansionConfig
from clonehunter_ray.functions.hashing import sha256_hex
from clonehunter_ray.stages.snippets import SNIPPETS_SCHEMA, normalize_source


def _module_name(path: str) -> str:
    p = path[:-3] if path.endswith(".py") else path
    p = p.replace("\\", "/")
    if p.endswith("/__init__"):
        p = p[: -len("/__init__")]
    return p.strip("/").replace("/", ".")


class _FileSymbols:
    """Per-file symbol tables (reference _collect_imports /
    _local_class_map analogues)."""

    def __init__(self, path: str, source: str) -> None:
        self.path = path
        self.module = _module_name(path)
        self.functions: dict[str, dict] = {}  # qualified -> unit dict
        self.classes: dict[str, dict[str, str]] = {}  # cls -> method -> qualified
        self.import_modules: dict[str, str] = {}  # alias -> module
        self.import_names: dict[str, tuple[str, str]] = {}  # alias -> (module, name)
        self.var_classes: dict[str, str] = {}  # module-level var -> class name
        try:
            tree = ast.parse(source, filename=path)
        except (SyntaxError, ValueError):
            self.tree = None
            return
        self.tree = tree
        lines = source.splitlines()
        self._walk(tree, lines, [])
        self._collect_imports(tree)
        self._collect_var_classes(tree.body, self.var_classes)

    def _walk(self, node: ast.AST, lines: list[str], stack: list[str]) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                qualified = ".".join([*stack, child.name])
                start = child.lineno
                end = getattr(child, "end_lineno", start)
                self.functions[qualified] = {
                    "qualified_name": qualified,
                    "start_line": start,
                    "end_line": end,
                    "code": "\n".join(lines[start - 1 : end]),
                    "node": child,
                }
                if stack:  # method of the innermost class on the stack
                    cls = stack[-1]
                    self.classes.setdefault(cls, {})[child.name] = qualified
                stack.append(child.name)
                self._walk(child, lines, stack)
                stack.pop()
            elif isinstance(child, ast.ClassDef):
                self.classes.setdefault(child.name, {})
                stack.append(child.name)
                self._walk(child, lines, stack)
                stack.pop()
            else:
                self._walk(child, lines, stack)

    def _collect_imports(self, tree: ast.Module) -> None:
        pkg_parts = self.module.split(".")[:-1]
        for node in tree.body:
            if isinstance(node, ast.Import):
                for alias in node.names:
                    self.import_modules[alias.asname or alias.name.split(".")[0]] = (
                        alias.name
                    )
            elif isinstance(node, ast.ImportFrom):
                if node.level:  # relative import
                    base = pkg_parts[: len(pkg_parts) - (node.level - 1)]
                    mod = ".".join([*base, node.module] if node.module else base)
                else:
                    mod = node.module or ""
                for alias in node.names:
                    self.import_names[alias.asname or alias.name] = (
                        mod,
                        alias.name,
                    )

    @staticmethod
    def _collect_var_classes(body: list, out: dict[str, str]) -> None:
        """``v = Cls(...)`` bindings (reference _local_class_map)."""
        for stmt in body:
            if (
                isinstance(stmt, ast.Assign)
                and len(stmt.targets) == 1
                and isinstance(stmt.targets[0], ast.Name)
                and isinstance(stmt.value, ast.Call)
                and isinstance(stmt.value.func, ast.Name)
            ):
                out[stmt.targets[0].id] = stmt.value.func.id


class RepoSymbolTable:
    """Symbol tables for every python file of one repo."""

    def __init__(self, paths: list[str], sources: list[str]) -> None:
        self.files: dict[str, _FileSymbols] = {}
        self.by_module: dict[str, _FileSymbols] = {}
        for path, src in zip(paths, sources):
            fs = _FileSymbols(path, src)
            if fs.tree is None:
                continue
            self.files[path] = fs
            self.by_module[fs.module] = fs

    def _module_func(self, module: str, name: str) -> tuple[_FileSymbols, dict] | None:
        fs = self.by_module.get(module)
        if fs is None:
            # tolerate partial module paths (e.g. bare top-level names)
            for m, cand in self.by_module.items():
                if m == module or m.endswith("." + module):
                    fs = cand
                    break
        if fs is None:
            return None
        unit = fs.functions.get(name)
        return (fs, unit) if unit else None

    @staticmethod
    def _infer_return_class(func_node: ast.AST) -> str | None:
        """Factory-return inference (reference _infer_return_class,
        snippets/expansion.py:484-501): a function whose ``return`` is
        ``Cls(...)`` (or a bare ``Cls``) yields that class name."""
        for node in ast.walk(func_node):
            if isinstance(node, ast.Return) and node.value is not None:
                v = node.value
                if isinstance(v, ast.Call) and isinstance(v.func, ast.Name):
                    return v.func.id
                if isinstance(v, ast.Name):
                    return v.id
        return None

    def _factory_method(
        self, fs: _FileSymbols, fname: str, attr: str
    ) -> tuple[_FileSymbols, dict] | None:
        """``obj = make_thing(); obj.m()`` / ``make_thing().m()`` —
        resolve the factory, infer its return class, look the method up
        in the factory's own module (or what it imports)."""
        target: tuple[_FileSymbols, dict] | None = None
        if fname in fs.functions:
            target = (fs, fs.functions[fname])
        elif fname in fs.import_names:
            mod, orig = fs.import_names[fname]
            target = self._module_func(mod, orig)
        if target is None:
            return None
        target_fs, func = target
        rcls = self._infer_return_class(func["node"])
        if not rcls:
            return None
        q = target_fs.classes.get(rcls, {}).get(attr)
        if q:
            return target_fs, target_fs.functions[q]
        if rcls in target_fs.import_names:
            mod, orig = target_fs.import_names[rcls]
            t2 = self.by_module.get(mod)
            if t2:
                q2 = t2.classes.get(orig, {}).get(attr)
                if q2:
                    return t2, t2.functions[q2]
        return None

    def resolve_call(
        self, call: ast.Call, fs: _FileSymbols, enclosing: str
    ) -> tuple[_FileSymbols, dict] | None:
        """One Call node -> (file_symbols, function unit) or None
        (reference _resolve_call:198-248)."""
        func = call.func
        if isinstance(func, ast.Name):
            name = func.id
            if name in fs.functions:  # same-module top-level fn
                return fs, fs.functions[name]
            if name in fs.import_names:
                mod, orig = fs.import_names[name]
                return self._module_func(mod, orig)
            return None
        if isinstance(func, ast.Attribute):
            attr = func.attr
            value = func.value
            if isinstance(value, ast.Name):
                base = value.id
                if base == "self" and "." in enclosing:
                    cls = enclosing.rsplit(".", 2)[-2]
                    q = fs.classes.get(cls, {}).get(attr)
                    if q:
                        return fs, fs.functions[q]
                    return None
                if base in fs.var_classes:  # obj = Cls(); obj.m()
                    bound = fs.var_classes[base]
                    q = fs.classes.get(bound, {}).get(attr)
                    if q:
                        return fs, fs.functions[q]
                    # imported class instance
                    if bound in fs.import_names:
                        mod, cname = fs.import_names[bound]
                        target = self.by_module.get(mod)
                        if target:
                            q2 = target.classes.get(cname, {}).get(attr)
                            if q2:
                                return target, target.functions[q2]
                    # obj = make_thing(); obj.m() — factory return
                    return self._factory_method(fs, bound, attr)
                if base in fs.import_modules:  # mod.f()
                    return self._module_func(fs.import_modules[base], attr)
                if base in fs.classes:  # Cls.m() (static-ish)
                    q = fs.classes[base].get(attr)
                    if q:
                        return fs, fs.functions[q]
                return None
            if isinstance(value, ast.Call) and isinstance(value.func, ast.Name):
                # Cls().m() — local or imported class
                cname = value.func.id
                if cname in fs.classes:
                    q = fs.classes[cname].get(attr)
                    if q:
                        return fs, fs.functions[q]
                if cname in fs.import_names:
                    mod, orig = fs.import_names[cname]
                    target = self.by_module.get(mod)
                    if target:
                        q = target.classes.get(orig, {}).get(attr)
                        if q:
                            return target, target.functions[q]
                # make_thing().m() — factory return chain
                return self._factory_method(fs, cname, attr)
        return None


def expand_repo_group(
    group: pa.Table, expansion: ExpansionConfig | None = None
) -> pa.Table:
    """One repo's files -> EXP snippet rows (snippets schema).

    BFS over resolved helper calls up to ``depth``; helper code is
    appended (normalized) after the root function's code and truncated
    at ``max_chars`` (reference expansion.py:21-143). Functions whose
    calls resolve to nothing emit no EXP row (FUNC already covers them).
    """
    expansion = expansion or ExpansionConfig(enabled=True)
    cols: dict[str, list] = {name: [] for name in SNIPPETS_SCHEMA.names}
    if group.num_rows == 0:
        return pa.Table.from_pydict(cols, schema=SNIPPETS_SCHEMA)

    langs = group["lang"].to_pylist()
    paths = group["path"].to_pylist()
    contents = group["content"].to_pylist()
    repo = group["repo"][0].as_py()
    py = [
        (p, c)
        for p, c, l in zip(paths, contents, langs)
        if l == "python" and c is not None
    ]
    if not py:
        return pa.Table.from_pydict(cols, schema=SNIPPETS_SCHEMA)
    table = RepoSymbolTable([p for p, _ in py], [c for _, c in py])

    for path, fs in table.files.items():
        for qualified, unit in fs.functions.items():
            # collect function-local var -> class bindings for resolution
            local_vars = dict(fs.var_classes)
            _FileSymbols._collect_var_classes(
                list(ast.walk(unit["node"])), local_vars
            )
            saved = fs.var_classes
            fs.var_classes = local_vars

            seen: set[tuple[str, str]] = {(path, qualified)}
            helpers: list[tuple[_FileSymbols, dict]] = []
            frontier = [(fs, unit)]
            for _ in range(max(1, expansion.depth)):
                nxt: list[tuple[_FileSymbols, dict]] = []
                for src_fs, src_unit in frontier:
                    for node in ast.walk(src_unit["node"]):
                        if not isinstance(node, ast.Call):
                            continue
                        hit = table.resolve_call(node, src_fs, src_unit["qualified_name"])
                        if hit is None:
                            continue
                        key = (hit[0].path, hit[1]["qualified_name"])
                        if key in seen:
                            continue
                        seen.add(key)
                        helpers.append(hit)
                        nxt.append(hit)
                frontier = nxt
                if not frontier:
                    break
            fs.var_classes = saved
            if not helpers:
                continue

            parts = [normalize_source(unit["code"])]
            for h_fs, h_unit in helpers:
                parts.append(normalize_source(h_unit["code"]))
            text = "\n".join(parts)
            if len(text) > expansion.max_chars:
                text = text[: expansion.max_chars]
            start, end = unit["start_line"], unit["end_line"]
            code_hash = sha256_hex(unit["code"])
            helper_ids = ",".join(
                f"{h_fs.path}:{h_unit['qualified_name']}" for h_fs, h_unit in helpers
            )
            sid = sha256_hex(
                f"EXP:{path}:{start}:{end}:{code_hash}:{helper_ids}"
            )
            cols["snippet_id"].append(sid)
            cols["kind"].append("EXP")
            cols["unit_id"].append(f"{path}:{qualified}:{start}:{end}")
            cols["repo"].append(repo)
            cols["path"].append(path)
            cols["qualified_name"].append(qualified)
            cols["unit_start"].append(start)
            cols["unit_end"].append(end)
            cols["start_line"].append(start)
            cols["end_line"].append(end)
            cols["text"].append(text)
    return pa.Table.from_pydict(cols, schema=SNIPPETS_SCHEMA)


def generate_exp_snippets(
    files_ds, expansion: ExpansionConfig | None = None
):
    """files Dataset -> EXP snippets Dataset via per-repo map_groups."""
    return files_ds.groupby("repo").map_groups(
        lambda g: expand_repo_group(g, expansion), batch_format="pyarrow"
    )
