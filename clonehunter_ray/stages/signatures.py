"""Signature stage: snippets -> MinHash/SimHash signatures.

This replaces the reference's transformer embedding stage (reference
embedding/codebert_embedder.py:37-129 — 92% of its cold wall time) with
stateless-in-data, stateful-in-setup hash signatures, per the
BASELINE.json north_star.

Engine shape: a **callable class** run as an actor pool —
``ds.map_batches(SignatureStage, fn_constructor_kwargs=...,
concurrency=N, batch_size=B, batch_format="pyarrow")``. The MinHash
permutation tables and compiled token regex are built once per actor in
``__init__`` (the analogue of loading the model once per worker); each
``__call__`` vectorizes over the whole Arrow batch.

Output columns (FIXTURES.md §3 `signatures`, plus carried snippet meta
so downstream stages never re-join against raw text):

* ``shingles  list<uint64>`` — sorted distinct k-token shingle hashes
  (the exact-Jaccard verification basis)
* ``tokens    list<uint64>`` — sorted distinct token hashes (the
  lexical-similarity basis, reference similarity/lexical.py:6-19)
* ``minhash   list<uint64>[num_perm]``
* ``band_keys list<uint64>[num_bands]`` — LSH band hashes (band index
  mixed in)
* ``simhash   uint64``, ``n_shingles/n_tokens int32``
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clonehunter_ray.config import SignatureConfig
from clonehunter_ray.functions import hashing as H

SIGNATURE_META_COLS = [
    "snippet_id",
    "kind",
    "unit_id",
    "repo",
    "path",
    "qualified_name",
    "unit_start",
    "unit_end",
    "start_line",
    "end_line",
]


class SignatureStage:
    """Stateful per-actor signature computer (one MinHasher per actor)."""

    def __init__(
        self,
        config: SignatureConfig | None = None,
        emit_token_seq: bool = False,
    ) -> None:
        self.config = config or SignatureConfig()
        self.config.validate()
        self.hasher = H.MinHasher(self.config.num_perm, self.config.seed)
        # ordered (non-deduped) token hashes power the suffix-array
        # substring rescue (stages/verify.py); only emitted when that
        # channel is on so the extra bytes never ride the shuffle
        # otherwise.
        self.emit_token_seq = emit_token_seq

    def __call__(self, batch: pa.Table) -> pa.Table:
        token_hashes = H.tokenize_hash_texts(batch["text"])
        shingle_lists = [
            H.shingle_hashes(th, self.config.shingle_k) for th in token_hashes
        ]
        token_sets = [H.token_set_hashes(th) for th in token_hashes]
        sigs = self.hasher.signatures_batch(shingle_lists)
        bands = H.band_hashes_batch(
            sigs, self.config.num_bands, self.config.band_rows
        )
        simhashes = H.simhash_batch(shingle_lists)

        cols: dict[str, pa.Array] = {}
        for name in SIGNATURE_META_COLS:
            if name in batch.column_names:
                cols[name] = batch[name]
        # binary-encoded sorted uint64 sets (little-endian) — list types
        # can't ride through Acero hash joins as payload, and the blob
        # form is also the compact wire format for the verify shuffle
        cols["shingles"] = pa.array(
            [s.tobytes() for s in shingle_lists], pa.binary()
        )
        cols["tokens"] = pa.array(
            [t.tobytes() for t in token_sets], pa.binary()
        )
        if self.emit_token_seq:
            cols["token_seq"] = pa.array(
                [th.tobytes() for th in token_hashes], pa.binary()
            )
        cols["minhash"] = pa.array(sigs.tolist(), pa.list_(pa.uint64()))
        cols["band_keys"] = pa.array(bands.tolist(), pa.list_(pa.uint64()))
        cols["simhash"] = pa.array(simhashes.tolist(), pa.uint64())
        cols["n_shingles"] = pa.array(
            [len(s) for s in shingle_lists], pa.int32()
        )
        cols["n_tokens"] = pa.array([len(t) for t in token_sets], pa.int32())
        return pa.table(cols)
