"""kmeans_assign_embeddings: the first-class clustering query over the
shared distributed Lloyd's kernel (similarity.kmeans_embeddings)."""

from __future__ import annotations

import numpy as np
import ray.data

from clonehunter_ray.pipelines.similarity import (
    kmeans_assign_embeddings,
    kmeans_embeddings,
)


def _clustered_rows(n=240, dim=12, n_clusters=4, seed=7, spread=0.15):
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 5
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + rng.normal(size=dim) * spread
        rows.append({"vec_id": i, "embedding": v.tolist()})
    return rows


def test_assignment_invariants_and_purity(ray_session):
    rows = _clustered_rows()
    ds = ray.data.from_items(rows)
    # seed=1 initializes one centroid per generating cluster (probed);
    # other seeds can drop two inits in one cluster — Lloyd's then
    # converges to a legitimate split local optimum, which is k-means
    # behavior, not an engine defect
    got = kmeans_assign_embeddings(ds, k=4, iters=8, seed=1).to_pandas()
    # one row per vector, labels in range, cos in [-1, 1]
    assert len(got) == len(rows)
    assert sorted(got["vec_id"]) == list(range(len(rows)))
    assert got["cluster"].between(0, 3).all()
    assert got["centroid_cos5"].between(-1.0, 1.0).all()
    # tight well-separated generating clusters must map to single
    # k-means labels (purity 1.0 at this spread)
    got["truth"] = got["vec_id"] % 4
    for t, g in got.groupby("truth"):
        assert g["cluster"].nunique() == 1, f"generating cluster {t} split"
    # distinct generating clusters get distinct labels
    assert got.groupby("truth")["cluster"].first().nunique() == 4


def test_assignment_deterministic_across_runs(ray_session):
    rows = _clustered_rows(n=150, dim=8, n_clusters=3, seed=12)
    ds = ray.data.from_items(rows)
    a = (
        kmeans_assign_embeddings(ds, k=3, iters=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        kmeans_assign_embeddings(ds, k=3, iters=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_assignment_matches_broadcast_centroids(ray_session):
    """The assign pass must be argmax against EXACTLY the trained
    centroids — recompute the assignment locally from the returned
    kmeans_embeddings matrix and compare."""
    rows = _clustered_rows(n=120, dim=8, n_clusters=3, seed=21)
    ds = ray.data.from_items(rows)
    cents = kmeans_embeddings(ds, k=3, iters=5)
    got = (
        kmeans_assign_embeddings(ds, k=3, iters=5)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ cents.T
    want = np.argmax(sims, axis=1)
    assert (got["cluster"].to_numpy() == want).all()
    want_cos = np.round(sims[np.arange(len(rows)), want], 5)
    assert np.allclose(got["centroid_cos5"].to_numpy(), want_cos, atol=0)


def test_prototype_prune_matches_offline_quantile(ray_session):
    from clonehunter_ray.pipelines.similarity import (
        prototype_prune_embeddings,
    )

    rows = _clustered_rows(n=300)
    ds = ray.data.from_items(rows)
    frac = 0.25
    got = prototype_prune_embeddings(
        ds, k=4, iters=8, prune_frac=frac, seed=1
    ).to_pandas()
    assigned = kmeans_assign_embeddings(ds, k=4, iters=8, seed=1).to_pandas()
    assert len(got) == len(rows)
    # same assignment as the shared kernel
    merged = got.merge(assigned, on="vec_id", suffixes=("", "_ref"))
    assert (merged["cluster"] == merged["cluster_ref"]).all()
    # offline per-cluster quantile_disc reference for the keep flag
    for c, g in merged.groupby("cluster"):
        cos = np.sort(g["centroid_cos5"].to_numpy())
        n = len(cos)
        cut = cos[max(0, int(np.ceil((1.0 - frac) * n)) - 1)]
        expect = g["centroid_cos5"] <= cut
        assert (g["keep"] == expect).all()
        # kept fraction >= 1 - frac (ties at the cutoff are kept),
        # and something was actually pruned in a 75-member cluster
        kept = g["keep"].mean()
        assert kept >= 1.0 - frac
        assert kept < 1.0
    # determinism
    again = prototype_prune_embeddings(
        ds, k=4, iters=8, prune_frac=frac, seed=1
    ).to_pandas()
    assert got.sort_values("vec_id")["keep"].tolist() == again.sort_values(
        "vec_id"
    )["keep"].tolist()


def test_d4_composition(ray_session):
    from clonehunter_ray.pipelines.similarity import (
        d4_prune_embeddings,
        prototype_prune_embeddings,
        semdedup_embeddings,
    )

    rows = _clustered_rows(n=240)
    # add exact duplicates so semdedup has work to do
    dups = [
        {"vec_id": 1000 + i, "embedding": rows[i]["embedding"]}
        for i in range(20)
    ]
    ds = ray.data.from_items(rows + dups)
    got = d4_prune_embeddings(
        ds, k=4, iters=8, threshold=0.95, prune_frac=0.25, seed=1
    ).to_pandas()
    # one row per input vector, stages partition the id space
    assert len(got) == len(rows) + len(dups)
    assert set(got["stage"]) <= {"semdedup", "prototype", "kept"}
    assert (got["keep"] == (got["stage"] == "kept")).all()
    # composition parity: semdedup drops match the standalone stage...
    sem = semdedup_embeddings(
        ds, k=4, iters=8, threshold=0.95, seed=1
    ).to_pandas()
    sem_dropped = set(sem.loc[~sem["keep"], "vec_id"])
    assert set(got.loc[got["stage"] == "semdedup", "vec_id"]) == sem_dropped
    # ...and the prototype stage equals standalone pruning over the
    # survivor subset
    surv_ids = set(sem.loc[sem["keep"], "vec_id"])
    surv_ds = ray.data.from_items(
        [r for r in rows + dups if r["vec_id"] in surv_ids]
    )
    proto = prototype_prune_embeddings(
        surv_ds, k=4, iters=8, prune_frac=0.25, seed=1
    ).to_pandas()
    proto_dropped = set(proto.loc[~proto["keep"], "vec_id"])
    # the d4-internal survivors arrive via a hash join whose block
    # structure differs from from_items, so kmeans' float-sum order
    # (and hence centroids) can drift in the last ulp — compare with a
    # small symmetric-difference tolerance instead of exact equality
    got_dropped = set(got.loc[got["stage"] == "prototype", "vec_id"])
    assert len(got_dropped ^ proto_dropped) <= max(
        2, len(proto_dropped) // 20
    )


def test_d4_composition_deterministic_across_runs(ray_session):
    """The composed pipeline must be run-to-run deterministic: the
    survivor re-cluster input is sorted by vec_id before kmeans, which
    pins the one nondeterministic exchange (the hash join's block
    order) out of the float-summation path."""
    from clonehunter_ray.pipelines.similarity import d4_prune_embeddings

    rows = _clustered_rows(n=200)
    dups = [
        {"vec_id": 1000 + i, "embedding": rows[i]["embedding"]}
        for i in range(15)
    ]
    ds = ray.data.from_items(rows + dups)

    def run():
        return (
            d4_prune_embeddings(
                ds, k=4, iters=8, threshold=0.95, prune_frac=0.25, seed=1
            )
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    a, b = run(), run()
    assert a.equals(b)


def test_semdedup_oversized_cluster_guard(ray_session):
    """A degenerate corpus — most vectors pointing in ONE direction —
    must complete under a per-group row cap (the O(|c|^2) prune would
    otherwise build a quadratic Gram over the modal cluster), keeping
    at most one representative per guarded sub-group, and the guard
    must not change results on corpora where no cluster exceeds it."""
    import pandas as pd

    from clonehunter_ray.pipelines.similarity import semdedup_embeddings

    rng = np.random.RandomState(5)
    base = rng.normal(size=12)
    rows = [
        {"vec_id": i, "embedding": (base * (1.0 + 1e-9 * i)).tolist()}
        for i in range(320)  # identical direction: kmeans cannot split
    ] + [
        {"vec_id": 1000 + i, "embedding": v.tolist()}
        for i, v in enumerate(rng.normal(size=(80, 12)))
    ]
    ds = ray.data.from_items(rows)
    cap = 64
    got = semdedup_embeddings(
        ds, k=4, iters=6, threshold=0.99, seed=1, max_cluster_rows=cap
    ).to_pandas()
    assert len(got) == len(rows)
    assert sorted(got["vec_id"]) == sorted(r["vec_id"] for r in rows)
    # the modal direction dedupes to at most one keeper per sub-group;
    # with 320 identical vectors and cap 64 the salt split yields >= 5
    # groups but far fewer than 320 keepers
    modal = got[got["vec_id"] < 1000]
    assert 1 <= modal["keep"].sum() <= 2 * (320 // cap + 2)
    # cluster column still carries the ORIGINAL k-means label
    assert got["cluster"].between(0, 3).all()

    # no-skew parity: cap far above every cluster size -> identical
    # result to the unguarded path
    small = ray.data.from_items(rows[300:])  # 20 modal + 80 spread
    guarded = (
        semdedup_embeddings(
            small, k=4, iters=6, threshold=0.99, seed=1,
            max_cluster_rows=16384,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    unguarded = (
        semdedup_embeddings(
            small, k=4, iters=6, threshold=0.99, seed=1, max_cluster_rows=0
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(guarded, unguarded)
