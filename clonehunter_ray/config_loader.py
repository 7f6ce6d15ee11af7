"""Layered config loading: pyproject.toml -> CLI overrides.

Reproduces the reference's config surface (core/config_loader.py:19-31
load-and-merge, 168-212 strict validation; root resolution
cli/commands/scan.py:240-271 walks up to the nearest pyproject.toml)
over this engine's dataclasses. Section: ``[tool.clonehunter_ray]``
with nested tables per config group::

    [tool.clonehunter_ray]
    include_langs = ["python"]
    [tool.clonehunter_ray.window]
    window_lines = 12
    [tool.clonehunter_ray.thresholds]
    func = 0.92
    [tool.clonehunter_ray.signature]
    num_perm = 128
    [tool.clonehunter_ray.substring]
    enabled = true

Overrides are dotted keys (``{"window.window_lines": 20}``), CLI wins.
Unknown keys and type mismatches raise ``ConfigError`` (the reference
validates strictly, config_loader.py:168-212).
"""

from __future__ import annotations

import dataclasses
import os
import tomllib
from typing import Any

from clonehunter_ray.config import (
    ClusterConfig,
    EngineConfig,
    ExecConfig,
    ExpansionConfig,
    SignatureConfig,
    SubstringConfig,
    Thresholds,
    WindowConfig,
)

_GROUPS = {
    "window": WindowConfig,
    "thresholds": Thresholds,
    "signature": SignatureConfig,
    "expansion": ExpansionConfig,
    "substring": SubstringConfig,
    "cluster": ClusterConfig,
    "exec": ExecConfig,
}


class ConfigError(ValueError):
    pass


def find_config_root(start: str) -> str | None:
    """Walk up from ``start`` to the nearest dir with pyproject.toml
    (reference scan.py:240-271)."""
    cur = os.path.abspath(start)
    if os.path.isfile(cur):
        cur = os.path.dirname(cur)
    while True:
        if os.path.exists(os.path.join(cur, "pyproject.toml")):
            return cur
        parent = os.path.dirname(cur)
        if parent == cur:
            return None
        cur = parent


def _coerce(name: str, value: Any, target_type: Any) -> Any:
    if target_type is float and isinstance(value, (int, float)):
        return float(value)
    if target_type is int:
        if isinstance(value, bool) or not isinstance(value, int):
            raise ConfigError(f"{name}: expected int, got {value!r}")
        return value
    if target_type is bool:
        if not isinstance(value, bool):
            raise ConfigError(f"{name}: expected bool, got {value!r}")
        return value
    if target_type is str or target_type == "str | None":
        if value is not None and not isinstance(value, str):
            raise ConfigError(f"{name}: expected str, got {value!r}")
        return value
    if isinstance(value, list):
        return tuple(value)
    return value


def _build_group(cls, section: dict, where: str):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in section.items():
        if key not in fields:
            raise ConfigError(f"unknown key {where}.{key}")
        ftype = fields[key].type
        base = {"int": int, "float": float, "bool": bool, "str": str}.get(
            str(ftype).replace("builtins.", ""), None
        )
        kwargs[key] = _coerce(f"{where}.{key}", value, base)
    return cls(**kwargs)


_ENV_PREFIX = "CLONEHUNTER_RAY_"


def env_overrides(environ: dict[str, str] | None = None) -> dict[str, Any]:
    """Environment-variable override layer (reference
    cli/commands/overrides.py:6-42, the ``CLONEHUNTER_EMBEDDER=stub``
    escape hatch): ``CLONEHUNTER_RAY_<GROUP>__<KEY>=value`` maps to the
    dotted config key ``group.key``; values parse as bool/int/float
    with string fallback. Precedence: pyproject < env < CLI."""
    env = os.environ if environ is None else environ
    out: dict[str, Any] = {}
    for name, raw in env.items():
        if not name.startswith(_ENV_PREFIX):
            continue
        dotted = name[len(_ENV_PREFIX):].lower().replace("__", ".")
        low = raw.strip().lower()
        value: Any
        if low in ("true", "yes", "on"):
            value = True
        elif low in ("false", "no", "off"):
            value = False
        else:
            try:
                value = int(raw)
            except ValueError:
                try:
                    value = float(raw)
                except ValueError:
                    value = raw
        out[dotted] = value
    return out


def load_config(
    root: str | None = None,
    overrides: dict[str, Any] | None = None,
    environ: dict[str, str] | None = None,
) -> EngineConfig:
    """pyproject [tool.clonehunter_ray] merged with env-var overrides
    then dotted-key overrides (CLI wins); strict unknown-key
    validation."""
    data: dict[str, Any] = {}
    if root:
        pp = os.path.join(root, "pyproject.toml")
        if os.path.exists(pp):
            with open(pp, "rb") as fh:
                raw = tomllib.load(fh)
            data = raw.get("tool", {}).get("clonehunter_ray", {}) or {}

    # fold dotted overrides into the nested dict: env first, CLI wins
    merged = {**env_overrides(environ), **(overrides or {})}
    for dotted, value in merged.items():
        if value is None:
            continue
        parts = dotted.split(".")
        node = data
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ConfigError(f"override {dotted} conflicts with scalar")
        node[parts[-1]] = value

    group_kwargs: dict[str, Any] = {}
    top_level: dict[str, Any] = {}
    for key, value in data.items():
        if key in _GROUPS:
            if not isinstance(value, dict):
                raise ConfigError(f"{key} must be a table")
            group_kwargs[key] = _build_group(_GROUPS[key], value, key)
        elif key == "include_langs":
            if not isinstance(value, (list, tuple)) or not all(
                isinstance(v, str) for v in value
            ):
                raise ConfigError("include_langs must be a list of strings")
            top_level["include_langs"] = tuple(value)
        else:
            raise ConfigError(f"unknown key {key}")

    cfg = EngineConfig(**group_kwargs, **top_level)
    try:
        cfg.validate()
    except ValueError as exc:
        raise ConfigError(str(exc)) from exc
    return cfg
