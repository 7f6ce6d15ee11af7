"""Connected-component clustering of findings.

Two paths (SURVEY.md §4 "connected components"):

* **driver union-find** (default): the findings edge list is orders of
  magnitude smaller than the corpus (pairs that cleared verification),
  so collecting (unit_a, unit_b) to the driver and running union-find
  is the pragmatic exact path — guarded by ``driver_max_edges``.
  Cluster ids are dense ranks of each component's minimum unit_id
  (order-free canonical form replacing the reference's first-seen
  numbering, similarity/clustering.py:29-42).
* **distributed hash-min label propagation** (scale path): iterate
  "label(v) = min(label(v), min label of neighbors)" via joins +
  groupby-min until fixpoint. O(diameter) rounds, each one shuffle.
  Used automatically above the guard, or on request.

``filter_min_cluster_size`` reproduces the reference's
``filter_clusters`` (clustering.py:46-55): keep findings whose cluster
has >= min_size *findings* (not members).
"""

from __future__ import annotations

import ray
import ray.data

from clonehunter_ray.config import ClusterConfig
from clonehunter_ray.state.unionfind import cluster_labels


def collect_edges(findings_ds: "ray.data.Dataset") -> list[tuple[str, str]]:
    edges: list[tuple[str, str]] = []
    for batch in findings_ds.select_columns(["unit_a", "unit_b"]).iter_batches(
        batch_format="pyarrow"
    ):
        edges.extend(
            zip(batch["unit_a"].to_pylist(), batch["unit_b"].to_pylist())
        )
    return edges


def add_cluster_ids(
    findings_ds: "ray.data.Dataset", config: ClusterConfig
) -> tuple["ray.data.Dataset", dict[str, int]]:
    """Label findings with cluster_id; returns (dataset, unit->cluster).

    Driver union-find path; the edge list is checked against
    ``driver_max_edges`` (beyond it, callers should use
    ``hashmin_labels`` — see pipelines.scan.scan for the dispatch).
    """
    edges = collect_edges(findings_ds)
    if len(edges) > config.driver_max_edges:
        raise ValueError(
            f"{len(edges)} edges exceed driver_max_edges="
            f"{config.driver_max_edges}; use hashmin_labels"
        )
    labels = cluster_labels(edges)
    labels_ref = ray.put(labels)

    def _add(batch):
        import pyarrow as pa

        lab = ray.get(labels_ref)
        ids = [lab.get(u, -1) for u in batch["unit_a"].to_pylist()]
        return batch.append_column("cluster_id", pa.array(ids, pa.int64()))

    return findings_ds.map_batches(_add, batch_format="pyarrow"), labels


def filter_min_cluster_size(
    findings_ds: "ray.data.Dataset", min_size: int
) -> "ray.data.Dataset":
    """Reference filter_clusters (clustering.py:46-55): count findings
    per cluster_id, keep clusters with >= min_size findings."""
    if min_size <= 1:
        return findings_ds
    counts_ds = findings_ds.groupby("cluster_id").count()
    keep = {
        r["cluster_id"]
        for r in counts_ds.iter_rows()
        if r["count()"] >= min_size
    }
    keep_ref = ray.put(keep)

    def _filter(batch):
        import pyarrow as pa

        k = ray.get(keep_ref)
        mask = [c in k for c in batch["cluster_id"].to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    return findings_ds.map_batches(_filter, batch_format="pyarrow")


# -- distributed label propagation (scale path) -----------------------------


def hashmin_labels(
    edges_ds: "ray.data.Dataset",
    max_iters: int = 30,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Connected components via iterative min-label propagation.

    Input: dataset with columns (unit_a, unit_b) of any orderable type
    (string unit ids, int64 doc ids). Output: dataset (unit_id, label)
    of the same type where label is the minimum unit_id of the
    component. Each round: send each node's current label across every
    edge, take the min of received + own labels. Converges in
    O(component diameter) rounds; every round is one groupby shuffle
    over ~2|E| rows.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from clonehunter_ray.util import safe_join_partitions

    num_partitions = safe_join_partitions(num_partitions)

    def _init(batch: pa.Table) -> pa.Table:
        lo = pc.min_element_wise(batch["unit_a"], batch["unit_b"])
        return pa.concat_tables(
            [
                pa.table({"unit_id": batch["unit_a"], "label": lo}),
                pa.table({"unit_id": batch["unit_b"], "label": lo}),
            ]
        ).combine_chunks()

    labels = (
        edges_ds.map_batches(_init, batch_format="pyarrow")
        .groupby("unit_id")
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["unit_id", "label"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def _symmetrize(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"src": batch["unit_a"], "dst": batch["unit_b"]}),
                pa.table({"src": batch["unit_b"], "dst": batch["unit_a"]}),
            ]
        ).combine_chunks()

    sym_edges = edges_ds.map_batches(
        _symmetrize, batch_format="pyarrow"
    ).materialize()

    for _ in range(max_iters):
        # join labels onto each directed edge's source, send to dest
        lab_src = labels.map_batches(
            lambda t: t.rename_columns(["src", "src_label"]),
            batch_format="pyarrow",
        )
        msgs = sym_edges.join(
            lab_src, "inner", num_partitions, on=("src",)
        )

        def _emit(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "unit_id": batch["dst"],
                    "label": batch["src_label"],
                }
            )

        candidates = msgs.map_batches(_emit, batch_format="pyarrow").union(
            labels
        )
        new_labels = (
            candidates.groupby("unit_id")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["unit_id", "label"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # converged when no label changed (tiny join to compare)
        changed = (
            new_labels.join(
                labels.map_batches(
                    lambda t: t.rename_columns(["unit_id", "old_label"]),
                    batch_format="pyarrow",
                ),
                "inner",
                num_partitions,
                on=("unit_id",),
            )
            .map_batches(
                lambda t: t.filter(pc.not_equal(t["label"], t["old_label"])),
                batch_format="pyarrow",
            )
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
