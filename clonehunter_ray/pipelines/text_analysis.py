"""Text-analysis pipelines for training-data curation (extras):
language ID, quality scoring, token counting, document fingerprinting.

All are stateless-in-data ``map_batches`` stages; the language-ID stage
is a callable class (actor pool) because it compiles its stopword
tables once per actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from clonehunter_ray.functions import hashing as H

# tiny per-language stopword profiles (n-gram-free heuristic: score by
# stopword hit-rate; zh detected by CJK codepoint ratio)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it",
           "with", "as", "was", "on", "are", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "mit", "von", "auf", "für", "im", "sich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "des", "du",
           "que", "pour", "dans", "qui", "sur", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "del",
           "que", "para", "en", "por", "con", "no"},
}


class LanguageIdStage:
    """Heuristic language ID: stopword hit-rates + CJK ratio."""

    def __init__(self) -> None:
        self.profiles = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def _predict(self, text: str) -> str:
        if not text:
            return "unknown"
        n_cjk = sum(1 for c in text[:2000] if "一" <= c <= "鿿")
        if n_cjk > len(text[:2000]) * 0.05:
            return "zh"
        toks = H.tokenize(text[:4000])
        if not toks:
            return "unknown"
        best, best_score = "unknown", 0.0
        for lang, stops in self.profiles.items():
            score = sum(t in stops for t in toks) / len(toks)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0.01 else "unknown"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._predict(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds, pa.string()),
            }
        )


def language_id(docs_ds: "ray.data.Dataset", concurrency: int = 2):
    return docs_ds.map_batches(
        LanguageIdStage, concurrency=concurrency, batch_format="pyarrow"
    )


def quality_scores_batch(batch: pa.Table) -> pa.Table:
    """Per-batch quality-score kernel: mean token length, stopword
    ratio, repetition (distinct/total token ratio).

    Fully vectorized for the 100 TB text path: tokenization is the
    Arrow C++ chain lower -> split on the token alphabet's complement
    -> flatten (equals ``TOKEN_RE.findall`` after dropping boundary
    empties), per-document reductions are ``np.bincount`` over
    ``list_parent_indices``, stopword membership is one ``pc.is_in``
    over the flat token column, and the distinct count is one
    ``np.unique`` over (doc, dictionary-code) composite keys — no
    Python loop over rows or tokens."""
    import pyarrow.compute as pc

    from clonehunter_ray.functions.hashing import flat_tokens

    stops = pa.array(sorted(frozenset().union(*_STOPWORDS.values())))
    n_docs = batch.num_rows
    flat, parent = flat_tokens(batch["text"])

    n_tokens = np.bincount(parent, minlength=n_docs)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    sum_lens = np.bincount(parent, weights=tok_lens, minlength=n_docs)
    stop_hits = np.bincount(
        parent,
        weights=pc.is_in(flat, value_set=stops).to_numpy(
            zero_copy_only=False
        ),
        minlength=n_docs,
    )
    # distinct tokens per doc: dictionary-encode once, then count
    # unique (doc, code) composite keys per doc
    codes = pc.dictionary_encode(flat).indices.to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    vocab = int(codes.max()) + 1 if len(codes) else 1
    distinct_keys = np.unique(parent.astype(np.int64) * vocab + codes)
    n_distinct = np.bincount(distinct_keys // vocab, minlength=n_docs)

    # unrounded: every ratio is an exact-integer-valued double over
    # an exact count, so a SQL oracle computing the same quotients
    # matches bit-for-bit (rounding would have to match the SQL
    # engine's tie-breaking instead)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_len = np.where(n_tokens > 0, sum_lens / n_tokens, 0.0)
        stop_ratio = np.where(n_tokens > 0, stop_hits / n_tokens, 0.0)
        distinct_ratio = np.where(
            n_tokens > 0, n_distinct / n_tokens, 0.0
        )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens.astype(np.int64), pa.int64()),
            "mean_token_len": pa.array(mean_len, pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            "distinct_ratio": pa.array(distinct_ratio, pa.float64()),
        }
    )


def quality_scores(docs_ds: "ray.data.Dataset"):
    return docs_ds.map_batches(quality_scores_batch, batch_format="pyarrow")



def fingerprint_documents(docs_ds: "ray.data.Dataset", window: int = 8):
    """Winnowing-style rolling-hash fingerprint: min shingle hash per
    sliding window of shingle hashes -> compact document sketch
    (doc_id, fingerprint:list<uint64>)."""

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        sketches = []
        for th in H.tokenize_hash_texts(batch["text"]):
            sh = H.shingle_hashes_seq(th, 4)
            if len(sh) == 0:
                sketches.append([])
                continue
            if len(sh) <= window:
                sketches.append([int(sh.min())])
                continue
            mins = np.lib.stride_tricks.sliding_window_view(sh, window).min(axis=1)
            sketches.append(sorted(set(int(x) for x in mins)))
        return pa.table(
            {"doc_id": ids, "fingerprint": pa.array(sketches, pa.list_(pa.uint64()))}
        )

    return docs_ds.map_batches(fp, batch_format="pyarrow")


def compression_ratio(ds, level: int = 6):
    """Per-document zlib compression ratio — the classic
    "compressibility" quality signal: templated/repetitive text
    compresses far below prose, random noise compresses above it
    (ratio ~1). Stateless map_batches; the per-row work is zlib's C
    deflate, the only Python is the row loop handing buffers over —
    same pattern as the sha256 hashing kernels. Output: doc_id,
    n_raw_bytes, n_compressed_bytes, compression_ratio (unrounded
    exact division)."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch["text"], "").to_pylist()
        raw = np.array([len(t.encode("utf-8")) for t in texts], dtype=np.int64)
        comp = np.array(
            [len(zlib.compress(t.encode("utf-8"), level)) for t in texts],
            dtype=np.int64,
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 1.0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_raw_bytes": pa.array(raw, pa.int64()),
                "n_compressed_bytes": pa.array(comp, pa.int64()),
                "compression_ratio": pa.array(ratio, pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
