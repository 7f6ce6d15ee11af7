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
    import pyarrow as pa
    import pyarrow.compute as pc

    counts_ds = findings_ds.groupby("cluster_id").count()
    keep = [
        r["cluster_id"]
        for r in counts_ds.iter_rows()
        if r["count()"] >= min_size
    ]
    keep_ref = ray.put(pa.array(keep, pa.int64()))

    def _filter(batch):
        mask = pc.fill_null(
            pc.is_in(batch["cluster_id"], value_set=ray.get(keep_ref)), False
        )
        return batch.filter(mask)

    return findings_ds.map_batches(_filter, batch_format="pyarrow")


def attach_cluster_ids_join(
    findings_ds: "ray.data.Dataset",
    labels_ds: "ray.data.Dataset",
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Scale-path cluster-id attach: partitioned left-outer join of
    ``findings.unit_a`` against hash-min labels (no driver-side label
    dict — the labelled-node set grows with the corpus).

    ``cluster_id`` is a stable 63-bit hash of the component label (the
    component's min unit_id), NOT a dense rank: dense renumbering
    needs a global sort of the distinct labels, and the id's only
    contract downstream (rollup grouping, min-size filter, reports) is
    "same component <=> same id"."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from clonehunter_ray.functions.hashing import hash_token_u64
    from clonehunter_ray.util import safe_join_partitions

    # pyarrow's hash join rejects list<...> payload columns; pack any
    # list<string> column (reasons) into a \x1f-delimited string for the
    # shuffle and unpack after. Reason tags never contain \x1f or are
    # empty strings, so the round-trip is lossless.
    SEP = "\x1f"

    def _pack_lists(batch: pa.Table) -> pa.Table:
        for i, field in enumerate(batch.schema):
            if pa.types.is_list(field.type) or pa.types.is_large_list(
                field.type
            ):
                packed = pc.binary_join(
                    batch.column(i).combine_chunks(), SEP
                )
                batch = batch.set_column(
                    i, f"__packed__{field.name}", packed
                )
        return batch

    from clonehunter_ray.util import safe_join

    joined = safe_join(
        findings_ds.map_batches(_pack_lists, batch_format="pyarrow"),
        labels_ds,
        "left_outer",
        num_partitions,
        on=("unit_a",),
        right_on=("unit_id",),
    )

    def _finish(batch: pa.Table) -> pa.Table:
        ids = [
            (hash_token_u64(l) & 0x7FFFFFFFFFFFFFFF) if l is not None else -1
            for l in batch["label"].to_pylist()
        ]
        drop = [c for c in ("label", "unit_id") if c in batch.column_names]
        batch = batch.drop_columns(drop).append_column(
            "cluster_id", pa.array(ids, pa.int64())
        )
        for i, field in enumerate(batch.schema):
            if field.name.startswith("__packed__"):
                unpacked = pc.split_pattern(
                    batch.column(i), pattern=SEP
                )
                empties = pc.equal(batch.column(i), "")
                unpacked = pc.if_else(
                    empties,
                    pa.scalar([], pa.list_(pa.string())),
                    unpacked.cast(pa.list_(pa.string())),
                )
                batch = batch.set_column(
                    i, field.name[len("__packed__"):], unpacked
                )
        return batch

    return joined.map_batches(_finish, batch_format="pyarrow")


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

    # Convergence witness. Min-label propagation is pointwise
    # NON-INCREASING (new label = min of old + received), so for
    # integer labels the total label sum is a complete change
    # detector: sum unchanged <=> no label changed. That replaces the
    # per-round compare JOIN (a third shuffle) with a local per-batch
    # reduction. Per-batch sums stay exact in int64 for any realistic
    # id domain (ids < 2^40 x 2^23-row batches < 2^63); the driver
    # total is a Python int, so no overflow across batches. String
    # labels (the scan path's unit ids) keep the join-based check.
    _sch = labels.schema()  # ray.data Schema: .names / .types (Arrow)
    if _sch is None:
        # empty edge set -> no labeled nodes; already converged
        return labels
    int_labels = pa.types.is_integer(
        dict(zip(_sch.names, _sch.types))["label"]
    )

    def _label_sum(ds) -> int:
        parts = ds.map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [int(pc.sum(t["label"]).as_py() or 0)], pa.int64()
                    )
                }
            ),
            batch_format="pyarrow",
        ).take_all()
        return sum(int(r["s"]) for r in parts)

    prev_sum = _label_sum(labels) if int_labels else None

    for _ in range(max_iters):
        # join labels onto each directed edge's source, send to dest
        lab_src = labels.map_batches(
            lambda t: t.rename_columns(["src", "src_label"]),
            batch_format="pyarrow",
        )
        from clonehunter_ray.util import safe_join

        msgs = safe_join(
            sym_edges, lab_src, "inner", num_partitions, on=("src",)
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
        if int_labels:
            # sum witness (see above): exact, no extra shuffle
            new_sum = _label_sum(new_labels)
            labels = new_labels
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
        else:
            # converged when no label changed (tiny join to compare)
            from clonehunter_ray.util import safe_join

            changed = (
                safe_join(
                    new_labels,
                    labels.map_batches(
                        lambda t: t.rename_columns(["unit_id", "old_label"]),
                        batch_format="pyarrow",
                    ),
                    "inner",
                    num_partitions,
                    on=("unit_id",),
                )
                .map_batches(
                    lambda t: t.filter(
                        pc.not_equal(t["label"], t["old_label"])
                    ),
                    batch_format="pyarrow",
                )
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
    return labels
