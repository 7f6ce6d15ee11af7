"""Distributed hash-min label propagation (the clustering scale path)
against driver-side union-find, including the scan branch that
activates it."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from clonehunter_ray.config import ClusterConfig, EngineConfig
from clonehunter_ray.corpus import generate_corpus
from clonehunter_ray.pipelines.scan import scan
from clonehunter_ray.stages.clustering import hashmin_labels
from clonehunter_ray.state.unionfind import cluster_labels


def _edges_ds(edges):
    return ray.data.from_arrow(
        pa.table(
            {
                "unit_a": pa.array([a for a, _ in edges], pa.string()),
                "unit_b": pa.array([b for _, b in edges], pa.string()),
            }
        )
    )


def test_hashmin_matches_unionfind_components(ray_session):
    # two chains + a triangle + an isolated pair; chain needs >1 round
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
        ("p", "q"), ("q", "r"), ("r", "p"),
        ("x", "y"),
    ]
    labels = {
        r["unit_id"]: r["label"]
        for r in hashmin_labels(_edges_ds(edges), num_partitions=4).iter_rows()
    }
    uf = cluster_labels(edges)
    # same partitioning of nodes into components
    nodes = sorted(labels)
    assert nodes == sorted(uf)
    for u in nodes:
        for v in nodes:
            assert (labels[u] == labels[v]) == (uf[u] == uf[v]), (u, v)
    # hash-min labels are the min unit_id of the component
    assert labels["e"] == "a" and labels["r"] == "p" and labels["y"] == "x"


def test_scan_distributed_clustering_branch(ray_session):
    files, truth = generate_corpus(120, 11)
    base = EngineConfig()
    forced = EngineConfig(cluster=ClusterConfig(driver_max_edges=0))

    r_driver = scan(ray.data.from_arrow(files), base)
    f_driver = r_driver.findings.to_pandas()
    r_dist = scan(ray.data.from_arrow(files), forced)
    f_dist = r_dist.findings.to_pandas()

    assert sorted(f_dist.pair_key) == sorted(f_driver.pair_key)
    # cluster ids may be numbered differently but must induce the same
    # partition of unit pairs
    def comp_map(df):
        comp = {}
        for _, row in df.iterrows():
            comp.setdefault(row.cluster_id, set()).update(
                (row.unit_a, row.unit_b)
            )
        return sorted(frozenset(v) for v in comp.values())

    assert comp_map(f_dist) == comp_map(f_driver)
