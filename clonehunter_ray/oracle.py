"""Single-process exact-similarity oracle for conformance testing.

The reference's golden-output contract (benchmark/run_benchmark.py:602-751)
compares detection counts and sorted finding-pair sets exactly. Our
analogue: an exact all-pairs computation of the same composite
similarity the distributed pipeline verifies, built from an inverted
shingle index (any pair with non-zero Jaccard is enumerated — no
LSH, no sampling). The pipeline's verified pairs must equal the
oracle's pair set; dup-pair recall >= 0.99 (BASELINE.json) is then
checked against truth_pairs on top.

Only feasible at test scale (O(sum of bucket^2) pairs); the pipeline is
the scale path, this is the ground truth.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from clonehunter_ray.config import EngineConfig
from clonehunter_ray.functions import hashing as H
from clonehunter_ray.stages.extract import extract_units_batch
from clonehunter_ray.stages.snippets import generate_snippets_batch


def exact_verified_pairs(
    files_table: pa.Table, config: EngineConfig | None = None
) -> set[tuple[str, str]]:
    """All unordered unit pairs with at least one snippet match that
    clears the verify gates (composite/lexical/structural), computed
    exactly — the candidate-generation oracle."""
    config = config or EngineConfig()
    units = extract_units_batch(files_table)
    snippets = generate_snippets_batch(units, config.window)

    texts = snippets["text"].to_pylist()
    kinds = snippets["kind"].to_pylist()
    unit_ids = snippets["unit_id"].to_pylist()
    paths = snippets["path"].to_pylist()
    u_starts = snippets["unit_start"].to_pylist()
    u_ends = snippets["unit_end"].to_pylist()
    s_starts = snippets["start_line"].to_pylist()
    s_ends = snippets["end_line"].to_pylist()

    token_lists = [H.tokenize(t) for t in texts]
    token_hashes = H.hash_tokens_batch(token_lists)
    shingles = [
        H.shingle_hashes(th, config.signature.shingle_k) for th in token_hashes
    ]
    tokens = [H.token_set_hashes(th) for th in token_hashes]

    # inverted index: shingle -> snippet idxs; accumulate intersections
    index: dict[int, list[int]] = defaultdict(list)
    for i, sh in enumerate(shingles):
        for s in sh.tolist():
            index[s].append(i)
    inter: dict[tuple[int, int], int] = defaultdict(int)
    for bucket in index.values():
        if len(bucket) < 2:
            continue
        for x in range(len(bucket)):
            for y in range(x + 1, len(bucket)):
                inter[(bucket[x], bucket[y])] += 1

    th = config.thresholds
    out: set[tuple[str, str]] = set()
    for (i, j), c in inter.items():
        la, lb = len(shingles[i]), len(shingles[j])
        union = la + lb - c
        jac = c / union if union else 0.0
        lex = H.jaccard_sorted(tokens[i], tokens[j])
        if th.lexical_min_ratio > 0 and lex < th.lexical_min_ratio:
            continue
        composite = (1 - th.lexical_weight) * jac + th.lexical_weight * lex
        gate = min(th.for_kind(kinds[i]), th.for_kind(kinds[j]))
        if composite < gate:
            continue
        # structural filters (reference rollup.py:86-120)
        if unit_ids[i] == unit_ids[j]:
            if not (
                s_ends[i] < s_starts[j] or s_ends[j] < s_starts[i]
            ):
                continue
        elif paths[i] == paths[j] and not (
            u_ends[i] < u_starts[j] or u_ends[j] < u_starts[i]
        ):
            continue
        pair = tuple(sorted((unit_ids[i], unit_ids[j])))
        out.add(pair)  # type: ignore[arg-type]
    return out
