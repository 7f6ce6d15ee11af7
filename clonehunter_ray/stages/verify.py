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
from clonehunter_ray.functions.hashing import jaccard_batch
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


def _kind_gates(batch: pa.Table, col: str, thresholds: Thresholds) -> np.ndarray:
    k = np.asarray(batch[col].to_pylist(), dtype=object)
    return np.where(
        k == "FUNC",
        thresholds.func,
        np.where(k == "WIN", thresholds.win, thresholds.exp),
    ).astype(np.float64)


def verify_pairs_batch(
    batch: pa.Table,
    thresholds: Thresholds,
    substring: SubstringConfig | None = None,
) -> pa.Table:
    """Joined candidate batch -> verified pair rows (canonical sides).

    Three phases, sized to the candidate funnel (measured at 60k files:
    110k candidates -> 23k accepted): (1) structural filters + size
    upper-bound gates fully vectorized on numeric/length columns, (2)
    exact Jaccard/lexical per surviving row (binary-search set
    intersection — the only inherently per-pair work), (3) output
    assembly via ``take`` + vectorized side canonicalization. When
    ``substring`` is enabled, pairs failing the composite gate but with
    shingle Jaccard >= ``substring.floor`` get a suffix-array LCS
    rescue over the carried ``token_seq`` columns
    (functions/substring.py).
    """
    import pyarrow.compute as pc

    n = batch.num_rows
    if n == 0:
        return PAIRS_SCHEMA.empty_table()
    substr_on = (
        substring is not None
        and substring.enabled
        and "a_token_seq" in batch.column_names
    )

    # ---- phase 1: vectorized structural + upper-bound gates ----------
    num = lambda c: batch[c].to_numpy(zero_copy_only=False)  # noqa: E731
    a_s, a_e = num("a_start_line"), num("a_end_line")
    b_s, b_e = num("b_start_line"), num("b_end_line")
    ua_s, ua_e = num("a_unit_start"), num("a_unit_end")
    ub_s, ub_e = num("b_unit_start"), num("b_unit_end")
    unit_eq = pc.equal(batch["a_unit_id"], batch["b_unit_id"]).to_numpy(
        zero_copy_only=False
    )
    path_eq = pc.equal(batch["a_path"], batch["b_path"]).to_numpy(
        zero_copy_only=False
    )
    ov_snip = np.maximum(a_s, b_s) <= np.minimum(a_e, b_e)
    ov_unit = np.maximum(ua_s, ub_s) <= np.minimum(ua_e, ub_e)
    # structural filters (reference rollup.py:86-120): self-pairs with
    # overlapping snippet spans; same-file distinct units overlapping
    keep = ~(unit_eq & ov_snip) & ~(~unit_eq & path_eq & ov_unit)

    # size-ratio upper bounds: jaccard <= min(|A|,|B|)/max(|A|,|B|)
    sz_a = pc.binary_length(batch["a_shingles"]).to_numpy(
        zero_copy_only=False
    ).astype(np.float64) / 8.0
    sz_b = pc.binary_length(batch["b_shingles"]).to_numpy(
        zero_copy_only=False
    ).astype(np.float64) / 8.0
    tsz_a = pc.binary_length(batch["a_tokens"]).to_numpy(
        zero_copy_only=False
    ).astype(np.float64) / 8.0
    tsz_b = pc.binary_length(batch["b_tokens"]).to_numpy(
        zero_copy_only=False
    ).astype(np.float64) / 8.0
    with np.errstate(divide="ignore", invalid="ignore"):
        jac_ub = np.where(
            (sz_a > 0) & (sz_b > 0),
            np.minimum(sz_a, sz_b) / np.maximum(sz_a, sz_b),
            0.0,
        )
        lex_ub = np.where(
            (tsz_a > 0) & (tsz_b > 0),
            np.minimum(tsz_a, tsz_b) / np.maximum(tsz_a, tsz_b),
            0.0,
        )
    gate = np.minimum(
        _kind_gates(batch, "a_kind", thresholds),
        _kind_gates(batch, "b_kind", thresholds),
    )
    if thresholds.lexical_min_ratio > 0:
        keep &= lex_ub >= thresholds.lexical_min_ratio
    comp_ub = (1.0 - thresholds.lexical_weight) * jac_ub + (
        thresholds.lexical_weight * lex_ub
    )
    pass_ub = comp_ub >= gate
    if substr_on:
        pass_ub |= jac_ub >= substring.floor
    keep &= pass_ub

    sub = batch.take(pa.array(np.flatnonzero(keep), pa.int64()))
    m = sub.num_rows
    if m == 0:
        return PAIRS_SCHEMA.empty_table()

    # ---- phase 2: exact set similarity on survivors ------------------
    # byte-equal sides are jaccard 1.0 for free; the rest go through ONE
    # vectorized lexsort kernel (hashing.jaccard_batch) instead of a
    # per-pair frombuffer+intersect loop
    sh_eq = pc.equal(sub["a_shingles"], sub["b_shingles"]).to_numpy(
        zero_copy_only=False
    )
    tk_eq = pc.equal(sub["a_tokens"], sub["b_tokens"]).to_numpy(
        zero_copy_only=False
    )
    jac = np.ones(m, dtype=np.float64)
    lex = np.ones(m, dtype=np.float64)
    sh_neq = np.flatnonzero(~sh_eq)
    if len(sh_neq):
        sel = pa.array(sh_neq, pa.int64())
        jac[sh_neq] = jaccard_batch(
            sub["a_shingles"].take(sel), sub["b_shingles"].take(sel)
        )
    tk_neq = np.flatnonzero(~tk_eq)
    if len(tk_neq):
        sel = pa.array(tk_neq, pa.int64())
        lex[tk_neq] = jaccard_batch(
            sub["a_tokens"].take(sel), sub["b_tokens"].take(sel)
        )
    composite = (1.0 - thresholds.lexical_weight) * jac + (
        thresholds.lexical_weight * lex
    )
    gate2 = gate[keep]
    ok = composite >= gate2
    if thresholds.lexical_min_ratio > 0:
        lex_ok = lex >= thresholds.lexical_min_ratio
    else:
        lex_ok = np.ones(m, dtype=bool)
    substr = np.zeros(m, dtype=np.float64)
    if substr_on:
        # materialize token-seq blobs ONLY for the rows that actually
        # need the LCS rescue (typically ~1% of gate survivors) — the
        # token_seq columns are the heaviest payload in the batch
        need = np.flatnonzero(~ok & lex_ok & (jac >= substring.floor))
        if len(need):
            sel = pa.array(need, pa.int64())
            seq_a = sub["a_token_seq"].take(sel).to_pylist()
            seq_b = sub["b_token_seq"].take(sel).to_pylist()
            for k, i in enumerate(need):
                r = lcs_ratio(
                    np.frombuffer(seq_a[k], dtype=np.uint64),
                    np.frombuffer(seq_b[k], dtype=np.uint64),
                )
                if r >= substring.min_ratio:
                    substr[i] = r
                    ok[i] = True
    ok &= lex_ok

    sub2 = sub.take(pa.array(np.flatnonzero(ok), pa.int64()))
    if sub2.num_rows == 0:
        return PAIRS_SCHEMA.empty_table()
    jac2, lex2 = jac[ok], lex[ok]
    comp2, substr2 = composite[ok], substr[ok]

    # ---- phase 3: canonical side order + output assembly -------------
    # canonical side order by (unit_id, start, end) — replaces the
    # reference's list-order dependence (rollup.py:45-62) with an
    # order-free canonical form for distributed determinism.
    ua = np.asarray(sub2["a_unit_id"].to_pylist(), dtype=object)
    ub = np.asarray(sub2["b_unit_id"].to_pylist(), dtype=object)
    s_a, e_a = (
        sub2["a_start_line"].to_numpy(zero_copy_only=False),
        sub2["a_end_line"].to_numpy(zero_copy_only=False),
    )
    s_b, e_b = (
        sub2["b_start_line"].to_numpy(zero_copy_only=False),
        sub2["b_end_line"].to_numpy(zero_copy_only=False),
    )
    swap = (ua > ub) | ((ua == ub) & ((s_a > s_b) | ((s_a == s_b) & (e_a > e_b))))
    swap_arr = pa.array(swap, pa.bool_())

    def pick(a_col: str, b_col: str):
        return (
            pc.if_else(swap_arr, sub2[b_col], sub2[a_col]),
            pc.if_else(swap_arr, sub2[a_col], sub2[b_col]),
        )

    unit_a_c, unit_b_c = pick("a_unit_id", "b_unit_id")
    id_a_c, id_b_c = pick("a_id", "b_id")
    kind_a_c, kind_b_c = pick("a_kind", "b_kind")
    path_a_c, path_b_c = pick("a_path", "b_path")
    qual_a_c, qual_b_c = pick("a_qualified_name", "b_qualified_name")
    uas_c, ubs_c = pick("a_unit_start", "b_unit_start")
    uae_c, ube_c = pick("a_unit_end", "b_unit_end")
    as_c, bs_c = pick("a_start_line", "b_start_line")
    ae_c, be_c = pick("a_end_line", "b_end_line")

    pair_key = pc.binary_join_element_wise(
        pc.cast(unit_a_c, pa.string()), pc.cast(unit_b_c, pa.string()), "||"
    )
    ka = kind_a_c.to_pylist()
    kb = kind_b_c.to_pylist()
    evidence = [
        (
            f"{ka[i]}->{kb[i]}|jac={jac2[i]:.3f}|lex={lex2[i]:.3f}"
            f"|comp={comp2[i]:.3f}"
            + (f"|substr={substr2[i]:.3f}" if substr2[i] else "")
        )
        for i in range(sub2.num_rows)
    ]
    return pa.Table.from_arrays(
        [
            pair_key,
            id_a_c,
            id_b_c,
            unit_a_c,
            unit_b_c,
            kind_a_c,
            kind_b_c,
            path_a_c,
            path_b_c,
            qual_a_c,
            qual_b_c,
            pc.cast(uas_c, pa.int32()),
            pc.cast(uae_c, pa.int32()),
            pc.cast(ubs_c, pa.int32()),
            pc.cast(ube_c, pa.int32()),
            pc.cast(as_c, pa.int32()),
            pc.cast(ae_c, pa.int32()),
            pc.cast(bs_c, pa.int32()),
            pc.cast(be_c, pa.int32()),
            pa.array(jac2, pa.float64()),
            pa.array(lex2, pa.float64()),
            pa.array(comp2, pa.float64()),
            pa.array(substr2, pa.float64()),
            pa.array(evidence, pa.string()),
        ],
        schema=PAIRS_SCHEMA,
    )
