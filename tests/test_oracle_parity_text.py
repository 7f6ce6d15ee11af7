"""Driver-free oracle parity pins for the text-analysis kernels: the
exact DuckDB SQL shipped in ``__ray_entry__.oracle_sql()`` against the
module-level batch kernels (no Ray session needed — the kernels are
plain Arrow-in/Arrow-out functions)."""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entry  # noqa: E402

from clonehunter_ray.pipelines.text_analysis import (  # noqa: E402
    LanguageIdStage,
    quality_scores_batch,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs_table() -> pa.Table:
    path = f"{SF_DIR}/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    return pq.read_table(path)


def _oracle(table: pa.Table, key: str):
    con = duckdb.connect()
    con.register("documents", table)
    return (
        con.execute(entry.oracle_sql()[key])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_quality_scores_bit_exact_vs_oracle():
    t = _docs_table()
    mine = quality_scores_batch(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    oracle = _oracle(t, "doc_quality_scores")
    assert sorted(mine.columns) == sorted(oracle.columns)
    for c in ["n_tokens", "mean_token_len", "stopword_ratio", "distinct_ratio"]:
        # bit-exact: both sides compute exact-int-valued doubles over
        # exact counts, no rounding anywhere
        assert (mine[c].values == oracle[c].values).all(), c


def test_language_id_exact_vs_oracle():
    t = _docs_table()
    mine = LanguageIdStage()(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    oracle = _oracle(t, "language_id_documents")
    assert (mine.pred_lang.values == oracle.pred_lang.values).all()


def test_language_id_edge_cases_vs_oracle():
    texts = [
        None,
        "",
        "   \n\t  ",
        "the quick brown fox and the lazy dog in the yard",
        "der hund und die katze sind nicht im haus",
        "le chat est sur la table et pas dans le jardin",
        "el perro y el gato no están en la casa",
        "一二三四五六七八九十" * 5,
        "zzz qqq xxx www 12345 _under_score_",
        "the " * 2500,  # slicing boundary: >4000 chars of tokens
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    mine = LanguageIdStage()(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    oracle = _oracle(t, "language_id_documents")
    assert list(mine.pred_lang) == list(oracle.pred_lang)
    # spot semantics, not just parity
    assert mine.pred_lang[0] == "unknown"
    assert mine.pred_lang[3] == "en"
    assert mine.pred_lang[4] == "de"
    assert mine.pred_lang[7] == "zh"
    assert mine.pred_lang[8] == "unknown"


def _gopher_frames(t: pa.Table):
    from clonehunter_ray.pipelines.queries import gopher_quality_batch

    mine = (
        gopher_quality_batch(t)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    oracle = _oracle(t, "gopher_quality_filter_documents")
    return mine, oracle


def test_gopher_filter_bit_exact_vs_oracle():
    t = _docs_table()
    mine, oracle = _gopher_frames(t)
    assert sorted(mine.columns) == sorted(oracle.columns)
    assert len(mine) == len(oracle) > 0
    for c in mine.columns:
        # bit-exact: integer counts and exact-int-ratio IEEE doubles
        assert (mine[c].values == oracle[c].values).all(), c


def test_gopher_filter_rule_boundaries_vs_oracle():
    """Every Gopher rule at its exact threshold, plus the degenerate
    inputs: each boundary doc passes on BOTH sides, each just-over doc
    drops on both — pinning the keep logic, not just the signals."""
    line_ok = "- the and data info word"  # bullet line, 5 words, 2 stops
    texts = [
        None,                                  # 0: dropped (no words)
        "",                                    # 1: dropped
        "the and " * 25,                       # 2: n=50, mean=3.0 — both boundaries pass
        "the and " * 24 + "the",               # 3: n=49 — word-count drop
        "\n".join([line_ok] * 9 + ["the and data info word"]),  # 4: bullet 9/10 = 0.9 pass
        "\n".join([line_ok] * 10),             # 5: bullet 10/10 — drop
        "\n".join(
            ["the and data info word..."] * 3
            + ["the and data info word"] * 7
        ),                                     # 6: ellipsis 3/10 = 0.3 pass
        "\n".join(
            ["the and data info word..."] * 4
            + ["the and data info word"] * 6
        ),                                     # 7: ellipsis 4/10 — drop
        "# " * 5 + "the and " * 25,            # 8: symbol 5/50 = 0.1 pass
        "# " * 6 + "the and " * 25,            # 9: symbol 6/50 = 0.12 — drop
        ".... " + "the and " * 25,             # 10: overlapping dots count once
        ("123 456 " * 25) + "the and",         # 11: alpha 2/52 — drop
        "1234 5678 " * 5 + "the and " * 20,    # 12: alpha 40/50 = 0.8 pass
        "für the and " * 25,                   # 13: non-ASCII splits; parity only
        "the " * 50,                           # 14: 1 distinct stopword — drop
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    mine, oracle = _gopher_frames(t)
    assert list(mine.doc_id) == list(oracle.doc_id)
    kept = set(mine.doc_id)
    assert {2, 4, 6, 8, 10, 12}.issubset(kept)
    assert kept.isdisjoint({0, 1, 3, 5, 7, 9, 11, 14})
    for c in mine.columns:
        assert (mine[c].values == oracle[c].values).all(), c
