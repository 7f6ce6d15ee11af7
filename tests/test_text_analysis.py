"""Text-analysis pipeline semantics: the vectorized Arrow kernels must
match a plain-Python reference implementation token for token."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from clonehunter_ray.functions import hashing as H
from clonehunter_ray.pipelines import text_analysis as T

TEXTS = [
    "The quick brown fox jumps over the lazy dog, and the dog sleeps.",
    "",
    None,
    "der der der und und nicht",  # heavy repetition, German stopwords
    "x" * 5,
    "a b c d e f g h a b c",
    "123 456_789 __dunder__ MiXeD CaSe!!",
    "   punctuation---only ... ;;; !!!",
    "für straße",  # non-ASCII letters split by the token alphabet
    "word " * 200,
]


def _ref_quality(texts):
    stops = frozenset().union(*T._STOPWORDS.values())
    rows = []
    for t in texts:
        toks = H.tokenize(t or "")
        n = len(toks)
        rows.append(
            {
                "n_tokens": n,
                "mean_token_len": round(sum(map(len, toks)) / n, 4) if n else 0.0,
                "stopword_ratio": round(
                    sum(tk in stops for tk in toks) / n, 4
                ) if n else 0.0,
                "distinct_ratio": round(len(set(toks)) / n, 4) if n else 0.0,
            }
        )
    return rows


def test_quality_scores_match_python_reference(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
            }
        )
    )
    got = T.quality_scores(docs).to_pandas().sort_values("doc_id")
    want = _ref_quality(TEXTS)
    assert len(got) == len(want)
    for i, row in enumerate(want):
        g = got.iloc[i]
        assert int(g["n_tokens"]) == row["n_tokens"], i
        assert g["mean_token_len"] == pytest.approx(row["mean_token_len"], abs=1e-4)
        assert g["stopword_ratio"] == pytest.approx(row["stopword_ratio"], abs=1e-4)
        assert g["distinct_ratio"] == pytest.approx(row["distinct_ratio"], abs=1e-4)


def test_language_id_basics(ray_session):
    texts = [
        "the cat is on the mat and it is warm for this time of year",
        "der hund ist nicht mit der katze und das ist ein problem",
        "le chat est sur la table et il est pour le moment dans la maison",
        "一只猫在垫子上睡觉，外面下着雨。它看起来很满足。",
        "zzz qqq xxx",
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = T.language_id(docs).to_pandas().sort_values("doc_id")
    assert list(got["pred_lang"]) == ["en", "de", "fr", "zh", "unknown"]


def test_fingerprint_deterministic(ray_session):
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    ["alpha beta gamma delta epsilon zeta eta theta " * 4,
                     "alpha beta gamma delta epsilon zeta eta theta " * 4],
                    pa.string(),
                ),
            }
        )
    )
    out = T.fingerprint_documents(docs).to_pandas().sort_values("doc_id")
    f0, f1 = out["fingerprint"].iloc[0], out["fingerprint"].iloc[1]
    assert list(f0) == list(f1)  # identical text -> identical sketch
    assert len(f0) > 0


def test_redact_pii_batch_matches_duckdb():
    """PII scrub kernel vs the exact DuckDB regexp_replace chain from
    __ray_entry__.oracle_sql — on strings that actually contain
    emails / URLs / phone numbers (the sf corpus carries none)."""
    import duckdb
    import pyarrow as pa

    from clonehunter_ray.pipelines.queries import redact_pii_batch

    texts = [
        "contact john.doe+spam@example.co.uk or https://ex.com/a?b=1#c",
        "call +1 (555) 123-4567 or 555 867 5309",
        "no pii here", "",
        "mixed: http://a.b/c x@y.io 12345678901",
        "edge: a@b.c (too-short tld kept) and 12-34 (short digits kept)",
    ]
    mine = redact_pii_batch(pa.array(texts)).to_pylist()
    con = duckdb.connect()
    for t, m in zip(texts, mine):
        db = con.execute(
            """
            SELECT regexp_replace(regexp_replace(regexp_replace(?,
              'https?://[^\\s]+', '<URL>', 'g'),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
              '<EMAIL>', 'g'),
              '\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '<PHONE>', 'g')
            """,
            [t],
        ).fetchone()[0]
        assert m == db
    assert mine[0] == "contact <EMAIL> or <URL>"
    assert mine[1] == "call <PHONE> or <PHONE>"


def test_compression_ratio_signal(ray_session):
    import pyarrow as pa
    import ray.data

    from clonehunter_ray.pipelines.text_analysis import compression_ratio

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "spam spam spam spam spam spam spam spam spam spam",
                    "the quick brown fox jumps over a lazy dog near banks",
                    "",
                ],
                pa.string(),
            ),
        }
    )
    out = (
        compression_ratio(ray.data.from_arrow(tbl))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # repetitive text compresses well below varied prose
    assert out.loc[0, "compression_ratio"] < out.loc[1, "compression_ratio"]
    assert out.loc[0, "n_compressed_bytes"] < out.loc[0, "n_raw_bytes"]
    # empty text: defined ratio 1.0, zero raw bytes
    assert out.loc[2, "n_raw_bytes"] == 0
    assert out.loc[2, "compression_ratio"] == 1.0


def test_compression_ratio_deterministic(ray_session):
    import ray.data

    from clonehunter_ray.pipelines.text_analysis import compression_ratio
    from clonehunter_ray.util import read_parquet_clean

    sf = "/root/testdata/sf0.001"
    ds = read_parquet_clean(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    a = compression_ratio(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ds2 = read_parquet_clean(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    b = compression_ratio(ds2).to_pandas().sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
