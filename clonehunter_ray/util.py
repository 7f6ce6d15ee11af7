"""Small execution helpers shared across pipelines."""

from __future__ import annotations


def safe_join_partitions(requested: int) -> int:
    """Cap hash-join partition count to the cluster's CPU budget.

    Ray Data's hash-shuffle join spins up ``num_partitions`` aggregator
    actors; requesting more aggregators than the cluster has CPUs
    deadlocks the streaming executor on small clusters (observed with
    64 partitions on an 8-CPU local node). On a real multi-node cluster
    the CPU count scales with nodes, so this cap loosens exactly when
    more partitions actually help.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 - not initialised yet
        cpus = 8
    return max(2, min(requested, max(2, cpus // 2)))


def auto_actor_count(reserve: int = 2, cap: int | None = None) -> int:
    """Size an actor pool to the cluster: CPUs minus ``reserve`` slots
    left for feeder/read tasks (min 2). A fixed small constant (the
    easy default) caps the whole fused stage at that parallelism no
    matter how many cores the cluster has."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 - not initialised yet
        cpus = 8
    n = max(2, cpus - reserve)
    return min(n, cap) if cap else n
