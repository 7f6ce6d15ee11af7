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
