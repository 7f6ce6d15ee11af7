"""Distributed MUTABLE LSH index for incremental / streaming dedup.

The batch pipelines (pipelines/dedup.py) re-band the whole corpus every
run. An ingest pipeline at 100 TB instead APPENDS: each new batch of
documents must be checked against everything already indexed without
touching existing postings. A shared mutable index is the one semantics
the Dataset API can't express, so this module drops to raw Ray actors
(the documented last-resort case): N index shards, each owning

* band postings:  ``band_key -> int64 doc_id array`` for
  ``band_key % N == shard``
* doc payloads:   ``doc_id -> sorted-unique shingle blob`` for
  ``doc_id % N == shard``

Routing is pure hash, so an add or query touches every shard at most
ONCE per batch (one RPC carrying numpy arrays — never a per-row call),
and corpus payloads never leave their owner: candidate verification
runs on the shard owning the corpus doc, with only the new batch's
blobs travelling. Partitioning assumption: shard count is fixed for
the index lifetime (re-sharding = rebuild), the standard trade-off for
hash-routed mutable state.

Reference parity note: this generalizes the reference's incremental
embedding cache (embedding/cache.py) from "skip re-embedding" to
"query the live index", which its multiprocessing engine cannot do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from clonehunter_ray.config import SignatureConfig
from clonehunter_ray.functions import hashing as H


@ray.remote(num_cpus=0)
class _LshIndexShard:
    """One hash shard: band postings + payload blobs + local verify.

    num_cpus=0: the shards are a long-lived state service that must
    coexist with the signature actor pool and Ray Data's read/sort
    tasks inside the same CPU budget — N shards each holding a full
    logical CPU deadlocks a small session (4 shards = the whole 4-CPU
    test cluster) before the ingest pipeline can start. Their verify
    bursts are short and vectorized; mild oversubscription beats a
    resource deadlock."""

    def __init__(self) -> None:
        self._postings: dict[int, list[np.ndarray]] = {}
        self._blobs: dict[int, bytes] = {}

    def add(
        self,
        band_keys: np.ndarray,
        band_doc_ids: np.ndarray,
        doc_ids: np.ndarray,
        blobs: list[bytes],
    ) -> int:
        if band_keys.size:
            order = np.argsort(band_keys, kind="stable")
            ks = band_keys[order]
            ids = band_doc_ids[order]
            starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
            ends = np.append(starts[1:], ks.size)
            for s, e in zip(starts, ends):
                self._postings.setdefault(int(ks[s]), []).append(
                    ids[s:e].copy()
                )
        for d, b in zip(doc_ids.tolist(), blobs):
            self._blobs[int(d)] = b
        return len(blobs)

    def query_bands(
        self, band_keys: np.ndarray, new_idx: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """(band_key, local new-row idx) -> candidate (new_idx,
        corpus_doc_id) pairs from this shard's postings."""
        out_new: list[np.ndarray] = []
        out_corpus: list[np.ndarray] = []
        for k, i in zip(band_keys.tolist(), new_idx.tolist()):
            posts = self._postings.get(int(k))
            if posts:
                if len(posts) > 1:
                    arr = np.concatenate(posts)
                    self._postings[int(k)] = [arr]  # compact in place
                else:
                    arr = posts[0]
                out_corpus.append(arr)
                out_new.append(np.full(arr.size, i, dtype=np.int64))
        if not out_new:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(out_new), np.concatenate(out_corpus)

    def verify(
        self, corpus_ids: np.ndarray, new_blobs: list[bytes]
    ) -> np.ndarray:
        """Exact Jaccard of each (owned corpus doc, new blob) pair —
        vectorized, payloads never leave the shard."""
        a = pa.array(
            [self._blobs[int(c)] for c in corpus_ids.tolist()], pa.binary()
        )
        b = pa.array(new_blobs, pa.binary())
        return H.jaccard_batch(a, b)

    def stats(self) -> dict:
        return {"band_keys": len(self._postings), "docs": len(self._blobs)}

    def snapshot(self, epoch_dir: str, shard_idx: int) -> dict:
        """Persist this shard's full state as two parquet files inside
        ``epoch_dir`` (worker-side write — the driver never sees the
        payloads). Postings are compacted first; the flattened
        (band_key, doc_id) layout plus the (doc_id, blob) table is the
        complete mutable state, so restore is a pure rebuild."""
        import os

        import pyarrow.parquet as pq

        os.makedirs(epoch_dir, exist_ok=True)
        keys, ids = [], []
        for k, posts in self._postings.items():
            arr = np.concatenate(posts) if len(posts) > 1 else posts[0]
            self._postings[k] = [arr]
            keys.append(np.full(arr.size, k, dtype=np.uint64))
            ids.append(arr.astype(np.int64))
        postings = pa.table(
            {
                "band_key": pa.array(
                    np.concatenate(keys) if keys else np.empty(0, np.uint64),
                    pa.uint64(),
                ),
                "doc_id": pa.array(
                    np.concatenate(ids) if ids else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )
        blob_ids = np.fromiter(
            self._blobs.keys(), dtype=np.int64, count=len(self._blobs)
        )
        blobs = pa.table(
            {
                "doc_id": pa.array(blob_ids, pa.int64()),
                "blob": pa.array(
                    [self._blobs[int(d)] for d in blob_ids], pa.binary()
                ),
            }
        )
        pq.write_table(
            postings, os.path.join(epoch_dir, f"shard_{shard_idx}_postings.parquet")
        )
        pq.write_table(
            blobs, os.path.join(epoch_dir, f"shard_{shard_idx}_blobs.parquet")
        )
        return {"postings": postings.num_rows, "docs": blobs.num_rows}

    def restore(self, epoch_dir: str, shard_idx: int) -> dict:
        """Rebuild shard state from a ``snapshot`` epoch (replaces any
        current state)."""
        import os

        import pyarrow.parquet as pq

        postings = pq.read_table(
            os.path.join(epoch_dir, f"shard_{shard_idx}_postings.parquet")
        )
        blobs = pq.read_table(
            os.path.join(epoch_dir, f"shard_{shard_idx}_blobs.parquet")
        )
        self._postings = {}
        keys = postings["band_key"].to_numpy(zero_copy_only=False)
        ids = postings["doc_id"].to_numpy(zero_copy_only=False)
        if keys.size:
            order = np.argsort(keys, kind="stable")
            ks, ds = keys[order], ids[order]
            starts = np.flatnonzero(
                np.concatenate([[True], ks[1:] != ks[:-1]])
            )
            ends = np.append(starts[1:], ks.size)
            for s, e in zip(starts, ends):
                self._postings[int(ks[s])] = [ds[s:e].copy()]
        self._blobs = dict(
            zip(
                blobs["doc_id"].to_numpy(zero_copy_only=False).tolist(),
                blobs["blob"].to_pylist(),
            )
        )
        return self.stats()


OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("dup_of", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def dedupe_candidate_pairs(
    qb_results: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate per-shard ``query_bands`` results and drop duplicate
    (new_idx, corpus_doc) pairs (the same pair surfaces from many
    bands/shards)."""
    new_idx = np.concatenate([c[0] for c in qb_results])
    corpus = np.concatenate([c[1] for c in qb_results])
    if new_idx.size == 0:
        return new_idx, corpus
    order = np.lexsort((corpus, new_idx))
    new_idx, corpus = new_idx[order], corpus[order]
    keep = np.concatenate(
        [[True], (new_idx[1:] != new_idx[:-1]) | (corpus[1:] != corpus[:-1])]
    )
    return new_idx[keep], corpus[keep]


def verify_on_owners(
    shards,
    n_shards: int,
    new_idx: np.ndarray,
    corpus: np.ndarray,
    ids: np.ndarray,
    blobs: list[bytes],
    threshold: float,
) -> pa.Table:
    """Exact-Jaccard verification of candidate (new, corpus) pairs on
    the shard OWNING each corpus doc (payloads never move); returns
    flagged (doc_id, dup_of, jaccard) rows. Blocks on the verify round
    trip — call from a worker task to keep the driver free."""
    if new_idx.size == 0:
        return OUT_SCHEMA.empty_table()
    owner = corpus % n_shards
    refs, slots = [], []
    for s in range(n_shards):
        sel = np.flatnonzero(owner == s)
        if sel.size == 0:
            continue
        refs.append(
            shards[s].verify.remote(
                corpus[sel], [blobs[i] for i in new_idx[sel]]
            )
        )
        slots.append(sel)
    jac = np.zeros(new_idx.size, dtype=np.float64)
    for sel, res in zip(slots, ray.get(refs)):
        jac[sel] = res
    hit = jac >= threshold
    return pa.table(
        {
            "doc_id": pa.array(ids[new_idx[hit]], pa.int64()),
            "dup_of": pa.array(corpus[hit], pa.int64()),
            "jaccard": pa.array(jac[hit], pa.float64()),
        },
        schema=OUT_SCHEMA,
    )


def keep_earliest(t: pa.Table) -> pa.Table:
    """One row per doc_id: the EARLIEST (min) dup_of — the
    deterministic representative. Vectorized lexsort + run-first."""
    if t.num_rows == 0:
        return OUT_SCHEMA.empty_table()
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    dup = t["dup_of"].to_numpy(zero_copy_only=False)
    jac = t["jaccard"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dup, ids))
    first = np.concatenate([[True], ids[order][1:] != ids[order][:-1]])
    sel = order[first]
    return pa.table(
        {
            "doc_id": pa.array(ids[sel], pa.int64()),
            "dup_of": pa.array(dup[sel], pa.int64()),
            "jaccard": pa.array(jac[sel], pa.float64()),
        },
        schema=OUT_SCHEMA,
    )


class ShardedLshIndex:
    """Driver-side handle over N ``_LshIndexShard`` actors."""

    def __init__(
        self, n_shards: int = 4, config: SignatureConfig | None = None
    ) -> None:
        self.config = config or SignatureConfig(
            shingle_k=5, num_bands=32, band_rows=4
        )
        self.hasher = H.MinHasher(self.config.num_perm, self.config.seed)
        self.n = n_shards
        self.shards = [_LshIndexShard.remote() for _ in range(n_shards)]

    # -- signature plumbing --------------------------------------------------

    def _signatures(self, batch: pa.Table):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        th = H.tokenize_hash_texts(batch["text"])
        shingles = [H.shingle_hashes(x, self.config.shingle_k) for x in th]
        sigs = self.hasher.signatures_batch(shingles)
        bands = H.band_hashes_batch(
            sigs, self.config.num_bands, self.config.band_rows
        )
        return ids, shingles, bands

    # -- mutations / queries -------------------------------------------------

    def submit_add(self, ids: np.ndarray, blobs: list[bytes], bands: np.ndarray):
        """Route one chunk's signatures to the shards WITHOUT blocking:
        returns the per-shard add ObjectRefs (actor tasks execute in
        submission order, so a caller that submits query-then-add per
        chunk keeps append-only semantics with no driver barrier)."""
        flat_keys = bands.ravel()
        flat_ids = np.repeat(ids, bands.shape[1])
        band_shard = (flat_keys % np.uint64(self.n)).astype(np.int64)
        doc_shard = ids % self.n
        refs = []
        for s in range(self.n):
            bm = band_shard == s
            dm = np.flatnonzero(doc_shard == s)
            refs.append(
                self.shards[s].add.remote(
                    flat_keys[bm],
                    flat_ids[bm],
                    ids[dm],
                    [blobs[i] for i in dm],
                )
            )
        return refs

    def submit_query_bands(self, ids: np.ndarray, bands: np.ndarray):
        """Route one chunk's band keys to the shards WITHOUT blocking:
        returns per-shard ``query_bands`` ObjectRefs resolving to
        (local new-row idx, corpus doc_id) candidate arrays."""
        flat_keys = bands.ravel()
        flat_idx = np.repeat(
            np.arange(len(ids), dtype=np.int64), bands.shape[1]
        )
        band_shard = (flat_keys % np.uint64(self.n)).astype(np.int64)
        return [
            self.shards[s].query_bands.remote(
                flat_keys[band_shard == s], flat_idx[band_shard == s]
            )
            for s in range(self.n)
        ]

    def add(self, batch: pa.Table) -> None:
        ids, shingles, bands = self._signatures(batch)
        ray.get(
            self.submit_add(ids, [s.tobytes() for s in shingles], bands)
        )

    def query(self, batch: pa.Table, threshold: float = 0.8) -> pa.Table:
        """Verified near-dup pairs of ``batch`` against the CURRENT
        index: (doc_id, dup_of, jaccard), one row per indexed doc whose
        exact shingle Jaccard with the new doc reaches ``threshold``."""
        ids, shingles, bands = self._signatures(batch)
        cand = ray.get(self.submit_query_bands(ids, bands))
        new_idx, corpus = dedupe_candidate_pairs(cand)
        return verify_on_owners(
            self.shards,
            self.n,
            new_idx,
            corpus,
            ids,
            [s.tobytes() for s in shingles],
            threshold,
        )

    def query_then_add(self, batch: pa.Table, threshold: float = 0.8) -> pa.Table:
        """Streaming-ingest step: flag near-dups of EARLIER docs, then
        index this batch (docs within one batch never match each other
        — batch boundaries define 'earlier')."""
        res = self.query(batch, threshold)
        self.add(batch)
        return res

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    # -- checkpoint / resume -------------------------------------------------

    def _manifest_payload(self) -> dict:
        c = self.config
        return {
            "n_shards": self.n,
            "shingle_k": c.shingle_k,
            "num_bands": c.num_bands,
            "band_rows": c.band_rows,
            "num_perm": c.num_perm,
            "seed": c.seed,
        }

    def snapshot(
        self,
        checkpoint_dir: str,
        seq: int,
        max_doc_id: int,
        flagged: pa.Table | None = None,
    ) -> str:
        """Write a complete epoch snapshot: every shard persists its own
        state in parallel (partitioned parquet, one pair of files per
        shard), the flagged-rows DELTA since the previous epoch lands
        beside them, then the driver commits the epoch by writing
        MANIFEST.json LAST — manifest presence marks the epoch
        complete, so a crash mid-snapshot leaves only ignorable
        partial files."""
        import json
        import os

        import pyarrow.parquet as pq

        epoch_dir = os.path.join(checkpoint_dir, f"epoch_{seq:08d}")
        refs = [
            s.snapshot.remote(epoch_dir, i)
            for i, s in enumerate(self.shards)
        ]
        if flagged is not None:
            os.makedirs(epoch_dir, exist_ok=True)
            pq.write_table(
                flagged, os.path.join(epoch_dir, "flagged.parquet")
            )
        ray.get(refs)
        manifest = dict(
            self._manifest_payload(), seq=seq, max_doc_id=int(max_doc_id)
        )
        tmp = os.path.join(epoch_dir, "MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(epoch_dir, "MANIFEST.json"))
        return epoch_dir

    @staticmethod
    def list_epochs(checkpoint_dir: str) -> list[dict]:
        """Complete (manifest-committed) epochs, ascending by seq."""
        import glob
        import json
        import os

        out = []
        for mf in sorted(
            glob.glob(os.path.join(checkpoint_dir, "epoch_*", "MANIFEST.json"))
        ):
            with open(mf) as fh:
                m = json.load(fh)
            m["epoch_dir"] = os.path.dirname(mf)
            out.append(m)
        return sorted(out, key=lambda m: m["seq"])

    def restore_latest(self, checkpoint_dir: str) -> dict | None:
        """Restore shard state from the newest complete epoch under
        ``checkpoint_dir`` (no-op returning None when there is none).
        Raises if the checkpoint was written with a different shard
        count or signature config — hash routing and band keys would
        silently mismatch otherwise."""
        epochs = self.list_epochs(checkpoint_dir)
        if not epochs:
            return None
        m = epochs[-1]
        want = self._manifest_payload()
        got = {k: m[k] for k in want}
        if got != want:
            raise ValueError(
                f"lsh checkpoint config mismatch: snapshot {got} != index {want}"
            )
        ray.get(
            [
                s.restore.remote(m["epoch_dir"], i)
                for i, s in enumerate(self.shards)
            ]
        )
        return m

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
