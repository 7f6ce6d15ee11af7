"""ANN variants (LSH-bucketed and IVF) against the brute-force oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from clonehunter_ray.pipelines.similarity import ivf_knn_cosine, lsh_knn_cosine


def _clustered_embeddings(n=300, dim=16, n_clusters=6, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 4
    rows = []
    for i in range(n):
        c = i % n_clusters
        v = centers[c] + rng.normal(size=dim) * 0.3
        rows.append({"vec_id": i, "embedding": v.tolist()})
    return rows


def _brute_topk_ids(rows, query_ids, k):
    mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in query_ids:
        sims = mat @ mat[q]
        order = sorted(range(len(rows)), key=lambda i: (-sims[i], i))[:k]
        out[q] = order
    return out


def test_ivf_knn_recall_on_clustered_data(ray_session):
    rows = _clustered_embeddings()
    ds = ray.data.from_items(rows)
    qids = [0, 1, 2]
    got = ivf_knn_cosine(ds, qids, k=10, n_cells=8, nprobe=3).to_pandas()
    brute = _brute_topk_ids(rows, qids, 10)
    for q in qids:
        mine = set(got[got.query_id == q].vec_id)
        truth = set(brute[q])
        recall = len(mine & truth) / len(truth)
        assert recall >= 0.8, f"query {q} recall {recall}"
    # ranks are 1..k and unique per query
    for q in qids:
        ranks = sorted(got[got.query_id == q]["rank"])
        assert ranks == list(range(1, len(ranks) + 1))


def test_lsh_knn_returns_ranked_neighbors(ray_session):
    rows = _clustered_embeddings()
    ds = ray.data.from_items(rows)
    got = lsh_knn_cosine(ds, [0, 5], k=5).to_pandas()
    for q in (0, 5):
        sub = got[got.query_id == q]
        assert len(sub) >= 1
        # the query itself is its own nearest neighbor
        assert sub[sub["rank"] == 1].vec_id.iloc[0] == q


def test_exact_cosine_pairs_match_numpy_and_duckdb(ray_session):
    """embedding_cosine_pairs_exact is the oracle-checkable brute-force
    baseline: block-row Gram against a plasma-broadcast corpus matrix.
    Pin it against (a) a local numpy all-pairs reference and (b) the
    DuckDB list_cosine_similarity SQL the driver harness runs."""
    import duckdb

    from clonehunter_ray.pipelines.similarity import embedding_cosine_pairs_exact

    rows = _clustered_embeddings(n=120, dim=8, n_clusters=4, seed=11)
    ds = ray.data.from_items(rows)
    got = (
        embedding_cosine_pairs_exact(ds, threshold=0.6)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )

    mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = matn @ matn.T
    ai, bj = np.nonzero((sims >= 0.6) & (np.arange(len(rows))[:, None] < np.arange(len(rows))[None, :]))
    assert list(zip(got["a_id"], got["b_id"])) == list(zip(ai.tolist(), bj.tolist()))
    assert np.allclose(got["cos5"], np.round(sims[ai, bj], 5))

    con = duckdb.connect()
    con.register(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
                "embedding": pa.array([r["embedding"] for r in rows], pa.list_(pa.float64())),
            }
        ),
    )
    odf = con.execute(
        """SELECT a.vec_id AS a_id, b.vec_id AS b_id
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.6
           ORDER BY a_id, b_id"""
    ).fetchdf()
    assert list(zip(got["a_id"], got["b_id"])) == list(zip(odf["a_id"], odf["b_id"]))


def test_lsh_near_dup_recall_vs_exact_pairs(ray_session):
    """The LSH scale path's recall is pinned against the exact baseline
    ON IDENTICAL INPUTS: every LSH pair must be a true pair (precision
    1.0 — verification is exact cosine), and recall must clear 0.9 on
    clustered data with hamming<=1 multi-probe."""
    from clonehunter_ray.pipelines.similarity import (
        embedding_cosine_pairs_exact,
        embedding_near_dup_pairs,
    )

    rows = _clustered_embeddings(n=150, dim=12, n_clusters=5, seed=7)
    ds = ray.data.from_items(rows)
    exact = embedding_cosine_pairs_exact(ds, threshold=0.8, ids_only=True).to_pandas()
    lsh = embedding_near_dup_pairs(ds, threshold=0.8, n_bits=4).to_pandas()
    truth = set(zip(exact["a_id"], exact["b_id"]))
    got = set(zip(lsh["a_id"], lsh["b_id"]))
    assert truth, "test data must produce true pairs"
    assert got <= truth  # exact verification => no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_ensemble_dup_pairs_vs_oracle(ray_session):
    """Multi-signal dedup (cosine AND token Jaccard) must equal the
    DuckDB join of the two single-signal oracles, and be a strict
    subset of the cosine-only candidate set."""
    import duckdb

    import __ray_entry__ as entry
    from clonehunter_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    mine = (
        Q.ensemble_dup_pairs(sf)
        .to_pandas()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = (
        con.sql(entry.oracle_sql()["ensemble_dup_pairs"])
        .df()
        .sort_values(["a_id", "b_id"])
        .reset_index(drop=True)
    )
    assert len(mine) == len(want) > 0
    assert (mine[["a_id", "b_id"]].values == want[["a_id", "b_id"]].values).all()
    assert (abs(mine["jac6"].values - want["jac6"].values) < 1e-9).all()
    cos_only = con.sql(
        "SELECT count(*) FROM embeddings a JOIN embeddings b"
        " ON a.vec_id < b.vec_id"
        " WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
    ).fetchone()[0]
    assert len(mine) < cos_only  # the lexical gate actually prunes


# ---------------------------------------------------------------------------
# SemDeDup (distributed k-means + per-cluster greedy prune)
# ---------------------------------------------------------------------------


def _semdedup_offline(rows, k, iters, threshold, seed):
    """Single-threaded reference of the SemDeDup algorithm: same hash
    init, same spherical Lloyd's updates, same farthest-first greedy
    prune — global numpy sums instead of per-block partials."""
    import hashlib

    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms < 1e-12] = 1.0
    matn = mat / norms

    ranks = np.array(
        [hashlib.sha256(f"{seed}:{i}".encode()).hexdigest() for i in ids]
    )
    top = np.lexsort((ids, ranks))[: min(k, len(ids))]
    centroids = matn[top].copy()
    for _ in range(iters):
        assign = np.argmax(matn @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = matn[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    centroids[c] = v / n
    sims = matn @ centroids.T
    cluster = np.argmax(sims, axis=1)
    ccos = np.round(sims[np.arange(len(ids)), cluster], 5)

    keep = np.zeros(len(ids), dtype=bool)
    for c in np.unique(cluster):
        member = np.flatnonzero(cluster == c)
        order = member[np.lexsort((ids[member], ccos[member]))]
        kept = []
        for i in order:
            if not kept or (matn[kept] @ matn[i]).max() < threshold:
                keep[i] = True
                kept.append(i)
    return {
        int(i): (int(c), float(cc), bool(kp))
        for i, c, cc, kp in zip(ids, cluster, ccos, keep)
    }


def test_semdedup_matches_offline_oracle(ray_session):
    from clonehunter_ray.pipelines.similarity import semdedup_embeddings

    rows = _clustered_embeddings(n=240, dim=12, n_clusters=5, seed=11)
    ds = ray.data.from_items(rows).repartition(7)
    got = (
        semdedup_embeddings(ds, k=5, iters=6, threshold=0.9, seed=31)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = _semdedup_offline(rows, k=5, iters=6, threshold=0.9, seed=31)
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        c, cc, kp = want[int(r["vec_id"])]
        assert int(r["cluster"]) == c, r["vec_id"]
        assert abs(float(r["centroid_cos5"]) - cc) < 1e-9, r["vec_id"]
        assert bool(r["keep"]) == kp, r["vec_id"]
    # duplicates exist on clustered data with a 0.9 threshold, and
    # every cluster keeps at least one representative
    assert (~got["keep"]).sum() > 0
    assert got.groupby("cluster")["keep"].any().all()


def test_semdedup_kept_set_is_mutually_dissimilar(ray_session):
    from clonehunter_ray.pipelines.similarity import semdedup_embeddings

    rows = _clustered_embeddings(n=150, dim=10, n_clusters=4, seed=7)
    ds = ray.data.from_items(rows).repartition(5)
    got = semdedup_embeddings(ds, k=4, iters=4, threshold=0.95, seed=31)
    df = got.to_pandas()
    mat = np.stack(
        [rows[int(i)]["embedding"] for i in df["vec_id"]]
    ).astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for c, g in df.groupby("cluster"):
        kept_rows = np.flatnonzero(g["keep"].to_numpy())
        if len(kept_rows) < 2:
            continue
        sub = mat[g.index.to_numpy()[kept_rows]]
        gram = sub @ sub.T
        np.fill_diagonal(gram, 0.0)
        # no two kept members of a cluster are semantic duplicates
        assert gram.max() < 0.95 + 1e-9


# -- IVF-PQ ------------------------------------------------------------------


def test_pq_encode_codes_are_bytes_and_deterministic(ray_session):
    import ray

    from clonehunter_ray.pipelines.similarity import (
        _pq_encode_mat,
        _train_pq_codebooks,
        pq_encode,
    )

    rows = _clustered_embeddings(n=120, dim=16)
    ds = ray.data.from_items(rows)
    mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    books = _train_pq_codebooks(matn, m_sub=4, n_codes=8, seed=5)
    enc = (
        pq_encode(ds, ray.put(books))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(enc) == 120
    codes = np.stack(enc["codes"].to_numpy())
    assert codes.shape == (120, 4)  # m_sub BYTES per vector
    assert codes.dtype == np.uint8 or codes.max() < 8
    # distributed encode == local encode (same codebooks)
    local = _pq_encode_mat(matn, books)
    assert (codes == local).all()
    # per-subspace code is the true nearest centroid (spot check row 0)
    sub = 4
    for m in range(4):
        d2 = ((matn[0, m * sub:(m + 1) * sub] - books[m]) ** 2).sum(axis=1)
        assert codes[0, m] == d2.argmin()


def test_pq_adc_score_matches_lut_math():
    from clonehunter_ray.pipelines.similarity import (
        _pq_encode_mat,
        _train_pq_codebooks,
    )

    rng = np.random.RandomState(0)
    mat = rng.normal(size=(50, 8))
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    books = _train_pq_codebooks(matn, m_sub=2, n_codes=4, seed=1)
    codes = _pq_encode_mat(matn, books)
    q = matn[0]
    # ADC estimate = sum_m q_m . c_{m, code_m}; must equal the cosine
    # against the RECONSTRUCTED vector
    recon = np.concatenate([books[m][codes[7, m]] for m in range(2)])
    lut_score = sum(
        float(q[m * 4:(m + 1) * 4] @ books[m][codes[7, m]]) for m in range(2)
    )
    assert abs(lut_score - float(q @ recon)) < 1e-12


def test_pq_knn_recall_on_clustered_data(ray_session):
    from clonehunter_ray.pipelines.similarity import pq_knn_cosine

    rows = _clustered_embeddings(n=300, dim=16)
    ds = ray.data.from_items(rows)
    qids = [0, 1, 2, 3, 4]
    truth = _brute_topk_ids(rows, qids, 10)
    got = pq_knn_cosine(
        ds, qids, k=10, n_cells=8, nprobe=4, m_sub=4, n_codes=16
    ).to_pandas()
    recalls = []
    for q in qids:
        mine = set(got[got.query_id == q]["vec_id"])
        recalls.append(len(mine & set(truth[q])) / 10)
    assert np.mean(recalls) >= 0.9, recalls
    # ranks are 1..k and the rank-1 hit is the query itself
    for q in qids:
        g = got[got.query_id == q].sort_values("rank")
        assert list(g["rank"]) == list(range(1, 11))
        assert g.iloc[0]["vec_id"] == q


def test_pq_exhaustive_probe_with_exact_rerank_is_lossless(ray_session):
    """With every cell probed and rerank >= corpus, the exact rerank
    makes IVF-PQ equal to brute force — quantization only shapes the
    CANDIDATE set, never the final scores."""
    from clonehunter_ray.pipelines.similarity import pq_knn_cosine

    rows = _clustered_embeddings(n=150, dim=16)
    ds = ray.data.from_items(rows)
    qids = [0, 7, 11]
    truth = _brute_topk_ids(rows, qids, 5)
    got = pq_knn_cosine(
        ds, qids, k=5, n_cells=4, nprobe=4, m_sub=4, n_codes=16, rerank=150
    ).to_pandas()
    for q in qids:
        mine = list(got[got.query_id == q].sort_values("rank")["vec_id"])
        assert mine == truth[q], q
