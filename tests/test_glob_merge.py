"""Repotype preset + glob merge semantics (reference
cli/commands/scan.py:15-74, 188-226)."""

from __future__ import annotations

import pytest

from clonehunter_ray.sources import (
    REPOTYPE_GLOBS,
    merge_globs,
    resolve_repotype_globs,
)


def test_presets_cover_13_languages_plus_monorepo():
    langs = set(REPOTYPE_GLOBS) - {"monorepo"}
    assert len(langs) == 13
    mono = REPOTYPE_GLOBS["monorepo"]
    for lang in langs:
        for g in REPOTYPE_GLOBS[lang]:
            assert g in mono
    # order-preserving dedupe: no duplicates
    assert len(mono) == len(set(mono))


def test_resolve_union_order_preserving():
    globs = resolve_repotype_globs(["python", "typescript", "python"])
    assert globs == ("**/*.py", "**/*.ts", "**/*.tsx")
    with pytest.raises(ValueError):
        resolve_repotype_globs(["cobol"])


def test_merge_cli_wins():
    cfg = ("**/*.py",)
    rt = ("**/*.ts",)
    assert merge_globs(cfg, rt, ()) == ("**/*.py", "**/*.ts")
    # explicit CLI globs replace everything
    assert merge_globs(cfg, rt, ("**/*.go",)) == ("**/*.go",)
    # dedupe keeps first occurrence
    assert merge_globs(("a", "b"), ("b", "c"), ()) == ("a", "b", "c")
