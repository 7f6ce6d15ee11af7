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
        # sort by a TOTAL order (frozenset < is subset comparison, a
        # partial order — sorted() over it is encounter-order dependent)
        return sorted((tuple(sorted(v)) for v in comp.values()))

    assert comp_map(f_dist) == comp_map(f_driver)


def test_hashmin_int64_edges(ray_session):
    """hashmin_labels is type-generic: int64 doc-id edges label each
    component with its minimum doc_id."""
    edges = pa.table(
        {
            "unit_a": pa.array([5, 4, 3, 10, 20], pa.int64()),
            "unit_b": pa.array([4, 3, 2, 11, 21], pa.int64()),
        }
    )
    labels = {
        r["unit_id"]: r["label"]
        for r in hashmin_labels(
            ray.data.from_arrow(edges), num_partitions=4
        ).iter_rows()
    }
    assert labels == {5: 2, 4: 2, 3: 2, 2: 2, 10: 10, 11: 10, 20: 20, 21: 20}


def test_minhash_keep_distributed_matches_driver(ray_session):
    """minhash_dedup_keep above driver_max_edges switches to hash-min +
    join labeling; keep flags and the cluster PARTITION must match the
    driver union-find path exactly."""
    import pandas as pd

    from clonehunter_ray.pipelines.dedup import minhash_dedup_keep

    texts = []
    base = " ".join(f"tok{i} word{i} filler{i}" for i in range(60))
    for d in range(30):
        if d % 3 == 2:
            texts.append(base + f" tail{d // 3}")  # near-dup of the pair below
        elif d % 3 == 1:
            texts.append(base + f" tail{d // 3} extra")
        else:
            texts.append(f"unique document {d} " + " ".join(
                f"only{d}_{i}" for i in range(50)
            ))
    docs = pa.table(
        {"doc_id": pa.array(range(30), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )

    drv = minhash_dedup_keep(
        ray.data.from_arrow(docs), threshold=0.7
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    dist = minhash_dedup_keep(
        ray.data.from_arrow(docs), threshold=0.7, driver_max_edges=0
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    assert len(drv) == len(dist) == 30
    assert drv["keep"].tolist() == dist["keep"].tolist()
    assert (drv["cluster_id"] != -1).sum() > 0  # clusters actually formed
    # same partition of docs into clusters (ids may be numbered differently)
    def parts(df):
        g = df[df.cluster_id != -1].groupby("cluster_id")["doc_id"]
        return sorted(tuple(sorted(v)) for _, v in g)
    assert parts(drv) == parts(dist)
    # distributed path: cluster_id is the min member, which is kept
    in_cl = dist[dist.cluster_id != -1]
    assert (in_cl.groupby("cluster_id")["doc_id"].min()
            == in_cl.groupby("cluster_id")["doc_id"].apply(lambda s: s[ (s == s.min())].iloc[0])).all()
    assert ((dist["doc_id"] == dist["cluster_id"]) == (dist["keep"] & (dist["cluster_id"] != -1))).all()


def test_minhash_keep_best_quality_representative(ray_session):
    """minhash_dedup_keep_best keeps the HIGHEST-quality doc per
    near-dup cluster (ties -> min doc_id), exactly one keeper per
    cluster, unclustered docs always kept — on both the driver
    union-find and the distributed hash-min label paths."""
    from clonehunter_ray.pipelines.dedup import minhash_dedup_keep_best

    texts = []
    base = " ".join(f"tok{i} word{i} filler{i}" for i in range(60))
    for d in range(30):
        if d % 3 == 2:
            # near-dup of the d % 3 == 1 doc but with MORE distinct
            # content -> higher quality, must win over the lower id
            texts.append(base + f" tail{d // 3} bonus{d} extra{d} rich{d}")
        elif d % 3 == 1:
            texts.append(base + f" tail{d // 3} extra")
        else:
            texts.append(f"unique document {d} " + " ".join(
                f"only{d}_{i}" for i in range(50)
            ))
    docs = pa.table(
        {"doc_id": pa.array(range(30), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )

    for max_edges in (2_000_000, 0):  # driver path, distributed path
        out = (
            minhash_dedup_keep_best(
                ray.data.from_arrow(docs), threshold=0.7,
                driver_max_edges=max_edges, num_partitions=4,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == 30
        clustered = out[out.cluster_id != -1]
        assert len(clustered) > 0
        # exactly one keeper per cluster, and it is the quality argmax
        for _, g in clustered.groupby("cluster_id"):
            keepers = g[g.keep]
            assert len(keepers) == 1
            best = g.sort_values(
                ["quality", "doc_id"], ascending=[False, True]
            ).iloc[0]
            assert keepers.iloc[0]["doc_id"] == best["doc_id"]
        # unclustered docs always keep
        assert out[out.cluster_id == -1]["keep"].all()
        # the richer near-dup (higher id, higher quality) beats its pair
        pair_clusters = clustered.groupby("cluster_id").filter(
            lambda g: set(g.doc_id % 3) == {1, 2}
        )
        if len(pair_clusters):
            kept = pair_clusters[pair_clusters.keep]
            assert (kept.doc_id % 3 == 2).all()


def test_duplicate_clusters_documents_vs_recursive_cte(ray_session):
    """End-to-end oracle parity for the distributed clustering core:
    hashmin_labels over the exact token-Jaccard edge set must produce
    the identical (doc_id, cluster_id) labeling as a DuckDB
    recursive-CTE transitive closure (singletons label themselves)."""
    import duckdb

    import __ray_entry__ as entry
    from clonehunter_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    mine = (
        Q.duplicate_clusters_documents(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = (
        con.sql(entry.oracle_sql()["duplicate_clusters_documents"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(mine) == len(want) > 0
    assert (mine["doc_id"].values == want["doc_id"].values).all()
    assert (mine["cluster_id"].values == want["cluster_id"].values).all()
    # labels are canonical: every cluster_id is the min member id
    g = mine.groupby("cluster_id")["doc_id"].min()
    assert (g.index.values == g.values).all()
