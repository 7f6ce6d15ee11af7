"""Document-level deduplication pipelines (training-data extras).

Five strategies over a generic ``documents(doc_id, text, ...)`` table,
all streaming Ray Data pipelines:

* exact:       sha256 groupby keep-first (queries.exact_dedup_documents)
* MinHash+LSH: shingle -> minhash -> band groupby -> verified pairs ->
               union-find clusters -> representative per cluster
* SimHash:     64-bit simhash, banded into 16-bit chunks, hamming<=K
               verification within buckets
* n-gram Jaccard: queries.ngram_jaccard_pairs (SQL-checkable)
* embedding cosine near-dup: similarity.embedding_near_dup_pairs
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from clonehunter_ray.config import SignatureConfig
from clonehunter_ray.functions import hashing as H
from clonehunter_ray.state.unionfind import cluster_labels


class DocSignatureStage:
    """Actor-pool stage: text -> shingle set + minhash bands + simhash."""

    def __init__(self, config: SignatureConfig | None = None) -> None:
        self.config = config or SignatureConfig(shingle_k=5)
        self.hasher = H.MinHasher(self.config.num_perm, self.config.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tok_lists = [H.tokenize(t or "") for t in texts]
        th = H.hash_tokens_batch(tok_lists)
        shingles = [H.shingle_hashes(x, self.config.shingle_k) for x in th]
        sigs = self.hasher.signatures_batch(shingles)
        bands = H.band_hashes_batch(
            sigs, self.config.num_bands, self.config.band_rows
        )
        sim = H.simhash_batch(shingles)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "shingles": pa.array([s.tobytes() for s in shingles], pa.binary()),
                "band_keys": pa.array(bands.tolist(), pa.list_(pa.uint64())),
                "simhash": pa.array(sim.tolist(), pa.uint64()),
            }
        )


def _explode_doc_bands(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "band_key": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.int64()),
                "shingles": pa.array([], pa.binary()),
            }
        )
    flat = batch["band_keys"].combine_chunks().flatten()
    nb = len(flat) // n
    ids = np.repeat(np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64), nb)
    sh = np.repeat(np.asarray(batch["shingles"].to_pylist(), dtype=object), nb)
    return pa.table(
        {
            "band_key": flat,
            "doc_id": pa.array(ids),
            "shingles": pa.array(sh, pa.binary()),
        }
    )


def minhash_dedup_pairs(
    docs_ds: "ray.data.Dataset",
    threshold: float = 0.8,
    config: SignatureConfig | None = None,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Verified near-duplicate pairs (jaccard >= threshold) via
    MinHash-LSH. Carries the (small, doc-level) shingle blobs through
    the band shuffle so verification happens inside the bucket group —
    one shuffle total for candidate generation + verification.
    """
    config = config or SignatureConfig(shingle_k=5)
    sig = docs_ds.map_batches(
        DocSignatureStage,
        fn_constructor_kwargs={"config": config},
        concurrency=concurrency,
        batch_format="pyarrow",
    )
    bands = sig.map_batches(_explode_doc_bands, batch_format="pyarrow")

    def emit_verified(group: pa.Table) -> pa.Table:
        rows = sorted(
            set(zip(group["doc_id"].to_pylist(), group["shingles"].to_pylist()))
        )
        a, b, j = [], [], []
        for x in range(len(rows)):
            sx = np.frombuffer(rows[x][1], dtype=np.uint64)
            for y in range(x + 1, len(rows)):
                sy = np.frombuffer(rows[y][1], dtype=np.uint64)
                jac = H.jaccard_sorted(sx, sy)
                if jac >= threshold:
                    a.append(rows[x][0])
                    b.append(rows[y][0])
                    j.append(jac)
        return pa.table(
            {
                "a_id": pa.array(a, pa.int64()),
                "b_id": pa.array(b, pa.int64()),
                "jaccard": pa.array(j, pa.float64()),
            }
        )

    pairs = bands.groupby("band_key").map_groups(
        emit_verified, batch_format="pyarrow"
    )
    return pairs.groupby(["a_id", "b_id"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )


def minhash_dedup_keep(
    docs_ds: "ray.data.Dataset",
    threshold: float = 0.8,
    config: SignatureConfig | None = None,
) -> "ray.data.Dataset":
    """Full near-dedup: returns (doc_id, cluster_id, keep) where keep
    marks the representative (min doc_id) of each near-dup cluster.
    Union-find over the verified pair list (driver-side; the pair list
    is tiny relative to the corpus)."""
    pairs = minhash_dedup_pairs(docs_ds, threshold, config)
    edges = [
        (str(r["a_id"]), str(r["b_id"]))
        for r in pairs.select_columns(["a_id", "b_id"]).iter_rows()
    ]
    labels = {int(k): v for k, v in cluster_labels(edges).items()} if edges else {}
    labels_ref = ray.put(labels)

    def annotate(batch: pa.Table) -> pa.Table:
        lab = ray.get(labels_ref)
        ids = batch["doc_id"].to_pylist()
        cl = [lab.get(d, -1) for d in ids]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "cluster_id": pa.array(cl, pa.int64()),
            }
        )

    annotated = docs_ds.select_columns(["doc_id"]).map_batches(
        annotate, batch_format="pyarrow"
    )
    # keep = min doc_id within cluster (or everything unclustered)
    min_per_cluster: dict[int, int] = {}
    for d, c in labels.items():
        if c not in min_per_cluster or d < min_per_cluster[c]:
            min_per_cluster[c] = d
    mins_ref = ray.put(min_per_cluster)

    def mark_keep(batch: pa.Table) -> pa.Table:
        mins = ray.get(mins_ref)
        keep = [
            c == -1 or mins.get(c) == d
            for d, c in zip(
                batch["doc_id"].to_pylist(), batch["cluster_id"].to_pylist()
            )
        ]
        return batch.append_column("keep", pa.array(keep, pa.bool_()))

    return annotated.map_batches(mark_keep, batch_format="pyarrow")


def simhash_dup_pairs(
    docs_ds: "ray.data.Dataset",
    max_hamming: int = 3,
    config: SignatureConfig | None = None,
) -> "ray.data.Dataset":
    """Near-identical pairs by SimHash: band the 64-bit fingerprint
    into 4 x 16-bit chunks (pigeonhole: hamming<=3 pairs share at
    least one exact chunk), groupby chunk, verify hamming in-bucket."""
    config = config or SignatureConfig(shingle_k=5)
    sig = docs_ds.map_batches(
        DocSignatureStage,
        fn_constructor_kwargs={"config": config},
        concurrency=2,
        batch_format="pyarrow",
    ).select_columns(["doc_id", "simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        sh = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        keys, out_ids, out_sh = [], [], []
        for chunk in range(4):
            part = (sh >> np.uint64(16 * chunk)) & np.uint64(0xFFFF)
            keys.append(part.astype(np.uint64) | (np.uint64(chunk) << np.uint64(32)))
            out_ids.append(ids)
            out_sh.append(sh)
        return pa.table(
            {
                "chunk_key": pa.array(np.concatenate(keys), pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "simhash": pa.array(np.concatenate(out_sh), pa.uint64()),
            }
        )

    bands = sig.map_batches(explode, batch_format="pyarrow")

    def emit(group: pa.Table) -> pa.Table:
        rows = sorted(set(zip(group["doc_id"].to_pylist(), group["simhash"].to_pylist())))
        a, b, d = [], [], []
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                ham = int(
                    H.hamming_distance_u64(
                        np.asarray([rows[x][1]], dtype=np.uint64),
                        np.asarray([rows[y][1]], dtype=np.uint64),
                    )[0]
                )
                if ham <= max_hamming:
                    a.append(rows[x][0])
                    b.append(rows[y][0])
                    d.append(ham)
        return pa.table(
            {
                "a_id": pa.array(a, pa.int64()),
                "b_id": pa.array(b, pa.int64()),
                "hamming": pa.array(d, pa.int32()),
            }
        )

    pairs = bands.groupby("chunk_key").map_groups(emit, batch_format="pyarrow")
    return pairs.groupby(["a_id", "b_id"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
