"""Engine / stage registry — the user-extension surface.

Reference parity: ``register_engine`` / ``get_engine``
(model/registry.py:19-27) populated at import time
(engines/__init__.py:5-6), with abstract per-stage interfaces
(model/interfaces.py:15-52). Here an "engine" is a callable
``(files_ds, config, **kwargs) -> ScanResult-like``; stage registries
let configs select alternative signature / candidate / verify
implementations by name so the reference's config vocabulary
(``engine = "semantic"``) keeps working.
"""

from __future__ import annotations

from typing import Any, Callable

_ENGINES: dict[str, Callable[..., Any]] = {}
_SIGNATURE_STAGES: dict[str, Any] = {}


def register_engine(name: str, factory: Callable[..., Any]) -> None:
    _ENGINES[name] = factory


def get_engine(name: str) -> Callable[..., Any]:
    try:
        return _ENGINES[name]
    except KeyError:
        raise KeyError(
            f"unknown engine {name!r}; available: {sorted(_ENGINES)}"
        ) from None


def available_engines() -> list[str]:
    return sorted(_ENGINES)


def register_signature_stage(name: str, cls: Any) -> None:
    _SIGNATURE_STAGES[name] = cls


def get_signature_stage(name: str) -> Any:
    try:
        return _SIGNATURE_STAGES[name]
    except KeyError:
        raise KeyError(
            f"unknown signature stage {name!r}; available: "
            f"{sorted(_SIGNATURE_STAGES)}"
        ) from None


def _register_defaults() -> None:
    from clonehunter_ray.pipelines.scan import scan
    from clonehunter_ray.stages.signatures import SignatureStage

    register_engine("semantic", scan)
    register_signature_stage("minhash", SignatureStage)

    def _sonarqube(files_ds, config=None, report_path=None, **_kw):
        import ray.data

        from clonehunter_ray.sources import read_sonarqube_report

        if report_path is None:
            import os

            report_path = os.environ.get("CLONEHUNTER_SONAR_REPORT", "")
        return ray.data.from_arrow(read_sonarqube_report(report_path))

    register_engine("sonarqube", _sonarqube)


_register_defaults()
