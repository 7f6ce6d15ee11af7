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


def quality_scores(docs_ds: "ray.data.Dataset"):
    """Heuristic quality scores: mean token length, stopword ratio,
    alpha ratio, repetition (distinct/total token ratio)."""
    stops = frozenset().union(*_STOPWORDS.values())

    def score(batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": batch["doc_id"],
            "n_tokens": [],
            "mean_token_len": [],
            "stopword_ratio": [],
            "distinct_ratio": [],
        }
        for t in batch["text"].to_pylist():
            toks = H.tokenize(t or "")
            n = len(toks)
            out["n_tokens"].append(n)
            out["mean_token_len"].append(
                round(sum(map(len, toks)) / n, 4) if n else 0.0
            )
            out["stopword_ratio"].append(
                round(sum(tk in stops for tk in toks) / n, 4) if n else 0.0
            )
            out["distinct_ratio"].append(
                round(len(set(toks)) / n, 4) if n else 0.0
            )
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "n_tokens": pa.array(out["n_tokens"], pa.int64()),
                "mean_token_len": pa.array(out["mean_token_len"], pa.float64()),
                "stopword_ratio": pa.array(out["stopword_ratio"], pa.float64()),
                "distinct_ratio": pa.array(out["distinct_ratio"], pa.float64()),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")


def fingerprint_documents(docs_ds: "ray.data.Dataset", window: int = 8):
    """Winnowing-style rolling-hash fingerprint: min shingle hash per
    sliding window of shingle hashes -> compact document sketch
    (doc_id, fingerprint:list<uint64>)."""

    def fp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        sketches = []
        for t in batch["text"].to_pylist():
            th = H.hash_tokens_batch([H.tokenize(t or "")])[0]
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
