"""Candidate generation: the LSH band shuffle.

This dissolves the reference's O(N^2/P)-per-worker k-NN self-join
(reference similarity/candidates.py:117-164, where every worker rebuilt
the FULL vector index) into the one wide dependency of the pipeline:

    signatures --explode--> bands(band_key, snippet_id)
               --groupby(band_key)--> map_groups(emit_pairs)

Two snippets become a candidate pair iff they share at least one LSH
band hash; with band_rows=4, num_bands=32 the detection probability at
Jaccard j is 1-(1-j^4)^32 (>=0.9998 at j=0.7), which is what makes the
pipeline "exact-recall" at the verification thresholds.

Skew handling (north_rule): a bucket whose pair count would exceed
``max_bucket_pairs_full`` emits a star (every member paired with the
min snippet_id) instead of all O(n^2) pairs — connectivity within a
genuine clone family is preserved for clustering, and the ``capped``
flag on emitted pairs keeps recall accounting honest. Hot buckets come
from boilerplate shingles (license headers etc.), the analogue of
stop-shingle handling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BANDS_SCHEMA = pa.schema(
    [
        ("band_key", pa.uint64()),
        ("snippet_id", pa.string()),
    ]
)


def explode_bands(batch: pa.Table) -> pa.Table:
    """signatures batch -> (band_key, snippet_id) rows, one per band.

    Zero-copy-ish: flattens the fixed-width ``band_keys`` list column
    and repeats ids with numpy.
    """
    n = batch.num_rows
    if n == 0:
        return pa.Table.from_pydict(
            {"band_key": [], "snippet_id": []}, schema=BANDS_SCHEMA
        )
    band_col = batch["band_keys"].combine_chunks()
    flat = band_col.flatten()
    num_bands = len(flat) // n
    ids = batch["snippet_id"].to_pylist()
    rep_ids = pa.array(np.repeat(np.asarray(ids, dtype=object), num_bands))
    return pa.Table.from_arrays([flat, rep_ids], schema=BANDS_SCHEMA)


def emit_pairs_group(
    group: pa.Table, max_bucket_pairs_full: int = 256
) -> pa.Table:
    """One LSH bucket -> canonical candidate pairs (a_id < b_id)."""
    ids = sorted(set(group["snippet_id"].to_pylist()))
    n = len(ids)
    out_a: list[str] = []
    out_b: list[str] = []
    capped = False
    if n >= 2:
        if n * (n - 1) // 2 <= max_bucket_pairs_full:
            for i in range(n):
                for j in range(i + 1, n):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        else:
            capped = True
            hub = ids[0]
            for other in ids[1:]:
                out_a.append(hub)
                out_b.append(other)
    return pa.Table.from_pydict(
        {
            "a_id": pa.array(out_a, pa.string()),
            "b_id": pa.array(out_b, pa.string()),
            "capped": pa.array([capped] * len(out_a), pa.bool_()),
        }
    )


def dedupe_pairs_group(group: pa.Table) -> pa.Table:
    """Collapse one (a_id, b_id) group (pairs found in several bands)
    to a single row; keep capped=True if any occurrence was capped."""
    import pyarrow.compute as pc

    first = group.slice(0, 1)
    if group.num_rows > 1:
        any_capped = pc.any(group["capped"]).as_py()
        first = first.set_column(
            first.schema.get_field_index("capped"),
            "capped",
            pa.array([bool(any_capped)], pa.bool_()),
        )
    return first
