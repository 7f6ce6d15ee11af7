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


@ray.remote
class _LshIndexShard:
    """One hash shard: band postings + payload blobs + local verify."""

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

    def add(self, batch: pa.Table) -> None:
        ids, shingles, bands = self._signatures(batch)
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
                    [shingles[i].tobytes() for i in dm],
                )
            )
        ray.get(refs)

    def query(self, batch: pa.Table, threshold: float = 0.8) -> pa.Table:
        """Verified near-dup pairs of ``batch`` against the CURRENT
        index: (doc_id, dup_of, jaccard), one row per indexed doc whose
        exact shingle Jaccard with the new doc reaches ``threshold``."""
        out_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("dup_of", pa.int64()),
                ("jaccard", pa.float64()),
            ]
        )
        ids, shingles, bands = self._signatures(batch)
        flat_keys = bands.ravel()
        flat_idx = np.repeat(np.arange(len(ids), dtype=np.int64), bands.shape[1])
        band_shard = (flat_keys % np.uint64(self.n)).astype(np.int64)
        cand = ray.get(
            [
                self.shards[s].query_bands.remote(
                    flat_keys[band_shard == s], flat_idx[band_shard == s]
                )
                for s in range(self.n)
            ]
        )
        new_idx = np.concatenate([c[0] for c in cand])
        corpus = np.concatenate([c[1] for c in cand])
        if new_idx.size == 0:
            return out_schema.empty_table()
        # dedupe candidate pairs (same pair from many bands/shards)
        order = np.lexsort((corpus, new_idx))
        new_idx, corpus = new_idx[order], corpus[order]
        keep = np.concatenate(
            [[True], (new_idx[1:] != new_idx[:-1]) | (corpus[1:] != corpus[:-1])]
        )
        new_idx, corpus = new_idx[keep], corpus[keep]
        # verify on the OWNER shard of each corpus doc
        owner = corpus % self.n
        refs, slots = [], []
        for s in range(self.n):
            sel = np.flatnonzero(owner == s)
            if sel.size == 0:
                continue
            refs.append(
                self.shards[s].verify.remote(
                    corpus[sel],
                    [shingles[i].tobytes() for i in new_idx[sel]],
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
            schema=out_schema,
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

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
