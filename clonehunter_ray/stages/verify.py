"""Pair verification: exact Jaccard + lexical similarity + structural
filters + threshold gating.

Consumes candidate pairs joined with both sides' signature payloads
(columns prefixed ``a_`` / ``b_``). Semantics reproduce the reference:

* lexical similarity = Jaccard over distinct lowercase ``[A-Za-z0-9_]+``
  tokens (reference similarity/lexical.py:6-19) — computed here over
  the pre-hashed token sets.
* composite = ``(1-lexical_weight)*sim + lexical_weight*lexical``
  (reference similarity/candidates.py:146-148) with ``sim`` = exact
  shingle Jaccard instead of embedding cosine.
* lexical_min_ratio gate (reference candidates.py:149-150 and
  rollup.py:123-133).
* per-kind threshold: the reference tests each direction of the k-NN
  retrieval against the *neighbor's* kind threshold
  (candidates.py:167-172); an undirected pair therefore passes if it
  clears the smaller of the two kind thresholds.
* overlap filters (reference rollup.py:86-120): self-pairs of one
  function kept only when the matched snippet ranges are disjoint;
  pairs of distinct functions in the same file dropped when the
  function spans overlap (structural containment).

Stateless ``map_batches`` stage; per-row work is numpy set
intersection over the carried shingle/token arrays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from clonehunter_ray.config import SubstringConfig, Thresholds
from clonehunter_ray.functions.hashing import jaccard_sorted
from clonehunter_ray.functions.substring import lcs_ratio

PAIRS_SCHEMA = pa.schema(
    [
        ("pair_key", pa.string()),
        ("a_id", pa.string()),
        ("b_id", pa.string()),
        ("unit_a", pa.string()),
        ("unit_b", pa.string()),
        ("kind_a", pa.string()),
        ("kind_b", pa.string()),
        ("path_a", pa.string()),
        ("path_b", pa.string()),
        ("qual_a", pa.string()),
        ("qual_b", pa.string()),
        ("ua_start", pa.int32()),
        ("ua_end", pa.int32()),
        ("ub_start", pa.int32()),
        ("ub_end", pa.int32()),
        ("a_start", pa.int32()),
        ("a_end", pa.int32()),
        ("b_start", pa.int32()),
        ("b_end", pa.int32()),
        ("jaccard", pa.float64()),
        ("lexical", pa.float64()),
        ("composite", pa.float64()),
        ("substr_ratio", pa.float64()),
        ("evidence", pa.string()),
    ]
)


def _overlap_len(a_start: int, a_end: int, b_start: int, b_end: int) -> int:
    """Reference rollup.py:115-120."""
    start = max(a_start, b_start)
    end = min(a_end, b_end)
    return 0 if start > end else end - start + 1


def verify_pairs_batch(
    batch: pa.Table,
    thresholds: Thresholds,
    substring: SubstringConfig | None = None,
) -> pa.Table:
    """Joined candidate batch -> verified pair rows (canonical sides).

    When ``substring`` is enabled, pairs failing the composite gate but
    with shingle Jaccard >= ``substring.floor`` get a suffix-array LCS
    rescue over the carried ``token_seq`` columns
    (functions/substring.py).
    """
    cols = {name: [] for name in PAIRS_SCHEMA.names}
    n = batch.num_rows
    if n == 0:
        return pa.Table.from_pydict(cols, schema=PAIRS_SCHEMA)
    substr_on = (
        substring is not None
        and substring.enabled
        and "a_token_seq" in batch.column_names
    )

    # one C-level to_pylist per column — per-scalar .as_py() costs tens
    # of microseconds and this stage sees millions of candidate rows
    col = {c: batch[c].to_pylist() for c in batch.column_names}

    def val(name, i, _col=col):
        return _col[name][i]

    a_shingles = col["a_shingles"]
    b_shingles = col["b_shingles"]
    a_tokens = col["a_tokens"]
    b_tokens = col["b_tokens"]

    for i, (unit_a, unit_b, a_s, a_e, b_s, b_e, path_a, path_b,
            ua_s, ua_e, ub_s, ub_e) in enumerate(
        zip(
            col["a_unit_id"], col["b_unit_id"],
            col["a_start_line"], col["a_end_line"],
            col["b_start_line"], col["b_end_line"],
            col["a_path"], col["b_path"],
            col["a_unit_start"], col["a_unit_end"],
            col["b_unit_start"], col["b_unit_end"],
        )
    ):
        # structural filters (reference rollup.py:86-120)
        if unit_a == unit_b:
            if _overlap_len(a_s, a_e, b_s, b_e):
                continue
        elif path_a == path_b and _overlap_len(ua_s, ua_e, ub_s, ub_e):
            continue

        blob_a, blob_b = a_shingles[i], b_shingles[i]
        kind_a, kind_b = col["a_kind"][i], col["b_kind"][i]
        gate = min(thresholds.for_kind(kind_a), thresholds.for_kind(kind_b))
        # size-ratio pre-gate: |A∩B| <= min(|A|,|B|), |A∪B| >= max, so
        # jaccard <= min/max — pairs whose UPPER BOUNDS can't clear any
        # gate are dropped without decoding the arrays (candidate
        # volume is millions of rows; survivors are thousands)
        sz_a, sz_b = len(blob_a) >> 3, len(blob_b) >> 3
        jac_ub = (min(sz_a, sz_b) / max(sz_a, sz_b)) if sz_a and sz_b else 0.0
        tsz_a, tsz_b = len(a_tokens[i]) >> 3, len(b_tokens[i]) >> 3
        lex_ub = (min(tsz_a, tsz_b) / max(tsz_a, tsz_b)) if tsz_a and tsz_b else 0.0
        if thresholds.lexical_min_ratio > 0 and lex_ub < thresholds.lexical_min_ratio:
            continue
        comp_ub = (1.0 - thresholds.lexical_weight) * jac_ub + (
            thresholds.lexical_weight * lex_ub
        )
        if comp_ub < gate and not (substr_on and jac_ub >= substring.floor):
            continue

        if blob_a == blob_b:  # exact-duplicate fast path (huge families)
            jac = 1.0
        else:
            sa = np.frombuffer(blob_a, dtype=np.uint64)
            sb = np.frombuffer(blob_b, dtype=np.uint64)
            jac = jaccard_sorted(sa, sb)
        tb_a, tb_b = a_tokens[i], b_tokens[i]
        if tb_a == tb_b:
            lex = 1.0
        else:
            ta = np.frombuffer(tb_a, dtype=np.uint64)
            tb = np.frombuffer(tb_b, dtype=np.uint64)
            lex = jaccard_sorted(ta, tb)
        if thresholds.lexical_min_ratio > 0 and lex < thresholds.lexical_min_ratio:
            continue
        composite = (1.0 - thresholds.lexical_weight) * jac + (
            thresholds.lexical_weight * lex
        )
        substr = 0.0
        if composite < gate:
            if not (substr_on and jac >= substring.floor):
                continue
            seq_a = np.frombuffer(val("a_token_seq", i), dtype=np.uint64)
            seq_b = np.frombuffer(val("b_token_seq", i), dtype=np.uint64)
            substr = lcs_ratio(seq_a, seq_b)
            if substr < substring.min_ratio:
                continue

        # canonical side order by (unit_id, start, end) — replaces the
        # reference's list-order dependence (rollup.py:45-62) with an
        # order-free canonical form for distributed determinism.
        a_key = (unit_a, a_s, a_e)
        b_key = (unit_b, b_s, b_e)
        if a_key > b_key:
            unit_a, unit_b = unit_b, unit_a
            a_s, b_s = b_s, a_s
            a_e, b_e = b_e, a_e
            path_a, path_b = path_b, path_a
            ua_s, ub_s = ub_s, ua_s
            ua_e, ub_e = ub_e, ua_e
            kind_a, kind_b = kind_b, kind_a
            ida, idb = val("b_id", i), val("a_id", i)
            qa, qb = val("b_qualified_name", i), val("a_qualified_name", i)
        else:
            ida, idb = val("a_id", i), val("b_id", i)
            qa, qb = val("a_qualified_name", i), val("b_qualified_name", i)

        pair_key = (
            f"{unit_a}||{unit_b}" if unit_a <= unit_b else f"{unit_b}||{unit_a}"
        )
        cols["pair_key"].append(pair_key)
        cols["a_id"].append(ida)
        cols["b_id"].append(idb)
        cols["unit_a"].append(unit_a)
        cols["unit_b"].append(unit_b)
        cols["kind_a"].append(kind_a)
        cols["kind_b"].append(kind_b)
        cols["path_a"].append(path_a)
        cols["path_b"].append(path_b)
        cols["qual_a"].append(qa)
        cols["qual_b"].append(qb)
        cols["ua_start"].append(ua_s)
        cols["ua_end"].append(ua_e)
        cols["ub_start"].append(ub_s)
        cols["ub_end"].append(ub_e)
        cols["a_start"].append(a_s)
        cols["a_end"].append(a_e)
        cols["b_start"].append(b_s)
        cols["b_end"].append(b_e)
        cols["jaccard"].append(jac)
        cols["lexical"].append(lex)
        cols["composite"].append(composite)
        cols["substr_ratio"].append(substr)
        tag = f"|substr={substr:.3f}" if substr else ""
        cols["evidence"].append(
            f"{kind_a}->{kind_b}|jac={jac:.3f}|lex={lex:.3f}|comp={composite:.3f}{tag}"
        )
    return pa.Table.from_pydict(cols, schema=PAIRS_SCHEMA)
