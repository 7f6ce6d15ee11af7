"""Shared run-metrics actor.

Stage UDFs run on workers; their counters (capped LSH buckets, dropped
pair estimates, cache hits) need one mutable home the driver can read
after execution. A zero-CPU actor is the Ray-idiomatic shared mutable
state for this (the reference's in-process ``ScanStats``,
core/pipeline.py:124-247, does not survive distribution).

The HANDLE is passed into UDF closures — resolving a named actor from
inside Ray Data workers proved both slow (a GCS get-or-create round
trip per partition call) and unreliable (counters landing on a
different incarnation). Partition UDFs report ONCE per partition with
a synchronous ``ray.get`` so every increment is visible before the
stage's output dataset finishes.
"""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self) -> None:
        self._counters: dict[str, float] = defaultdict(float)

    def add(self, updates: dict[str, float]) -> None:
        for key, value in updates.items():
            self._counters[key] += value

    def get(self) -> dict[str, float]:
        return dict(self._counters)

    def reset(self) -> None:
        self._counters.clear()


def new_metrics_actor():
    """One metrics actor per run; pass the handle into UDF closures."""
    return MetricsActor.remote()


def report_metrics(actor, updates: dict[str, float]) -> None:
    """Worker-side: add counters (sync, so counts are complete when the
    stage's last task finishes). No-op without an actor handle.

    Swallows actor-death errors: Ray may re-execute a partition task
    after the run ends (lineage reconstruction of a block consumed
    later), and a dead metrics actor must degrade to lost counters, not
    a failed task."""
    if actor is None or not updates:
        return
    try:
        ray.get(actor.add.remote(updates))
    except Exception:  # noqa: BLE001 - RayActorError et al.
        pass


def read_metrics(actor) -> dict[str, float]:
    try:
        return ray.get(actor.get.remote())
    except Exception:  # noqa: BLE001 - actor already gone
        return {}


def drop_metrics(actor) -> None:
    """Explicit teardown (tests). Pipelines should instead let the
    handle's lifetime govern the actor's: Ray reclaims it when the last
    handle (e.g. on a ScanResult) goes out of scope, so post-run task
    re-execution still finds it alive."""
    try:
        ray.kill(actor)
    except Exception:  # noqa: BLE001 - already gone
        pass
