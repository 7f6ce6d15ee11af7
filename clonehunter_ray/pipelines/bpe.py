"""Byte-pair-encoding tokenizer training and application (Sennrich,
Haddow & Birch 2016) over a document corpus.

Scale shape — the part that matters at 100 TB:

- **Training runs on the word-frequency dictionary, not the corpus.**
  One distributed pre-aggregated pass builds ``(word, count)`` (local
  ``dictionary_encode`` + ``bincount`` partials, then a groupby-sum
  over the DISTINCT-WORD table — the shuffle moves vocabulary rows,
  not corpus tokens), a word-table-sized sort caps it to ``max_words``
  by frequency, and the merge loop runs on that bounded table
  driver-side: ``O(max_words * n_merges)``, independent of corpus
  bytes. This is how production tokenizer trainers work (HuggingFace
  tokenizers / sentencepiece learn from counted words, typically on a
  sample — compose with ``hash_sample`` for that).
- **Encoding is the corpus-scale stage**: an actor pool with the merge
  ranks shipped once per actor (``__init__``), plus a per-actor
  distinct-word memo cache — each batch dictionary-encodes its words,
  so every distinct word is BPE-encoded once per actor, not once per
  occurrence. The cache is size-capped so actor heap stays bounded on
  adversarial vocabularies.

Determinism: pair ties break on the lexicographically smaller pair;
merges within a pass apply left-to-right non-overlapping. No RNG, no
floats — reruns are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from clonehunter_ray.functions import hashing as H

END_OF_WORD = "</w>"


def _apply_merge(syms: tuple, left: str, right: str, new: str) -> tuple:
    """Merge adjacent (left, right) left-to-right, non-overlapping."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(new)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_merges_local(
    words: list[str],
    counts,
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, str, int]]:
    """The classic Sennrich merge loop over a counted word list.
    Driver-side by design: the input is the bounded ``max_words``
    table, never the corpus. Returns (rank, left, right, merged,
    pair_count) rows."""
    seqs = [tuple(w) + (END_OF_WORD,) for w in words]
    cnts = [int(c) for c in counts]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(seqs, cnts):
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        (left, right), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_pair_count:
            break
        new = left + right
        merges.append((rank, left, right, new, cnt))
        seqs = [
            _apply_merge(s, left, right, new)
            if left in s  # cheap containment pre-gate
            else s
            for s in seqs
        ]
    return merges


def word_counts(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed (word, count) over the shared token alphabet:
    per-batch dictionary_encode + bincount partials (corpus tokens
    never leave the task), then ONE groupby-sum over distinct-word
    rows."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, _ = H.flat_tokens(batch["text"], with_parent=False)
        if len(flat) == 0:
            return pa.table(
                {
                    "word": pa.array([], pa.string()),
                    "count": pa.array([], pa.int64()),
                }
            )
        d = pc.dictionary_encode(flat)
        idx = d.indices.to_numpy(zero_copy_only=False)
        n = np.bincount(idx, minlength=len(d.dictionary)).astype(np.int64)
        return pa.table(
            {"word": d.dictionary, "count": pa.array(n, pa.int64())}
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("count")
    )


def bpe_train_merges(
    docs_ds: "ray.data.Dataset",
    n_merges: int = 50,
    max_words: int = 30_000,
    min_pair_count: int = 2,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges from the corpus. The sort that
    caps the dictionary runs over the distinct-word table (vocabulary-
    sized); only the top ``max_words`` rows reach the driver."""
    wc = (
        word_counts(docs_ds)
        .sort(["sum(count)", "word"], descending=[True, False])
        .limit(max_words)
    )
    parts = [t for t in ray.get(wc.to_arrow_refs()) if t.num_rows]
    if parts:
        tbl = pa.concat_tables(parts)
        words = tbl["word"].to_pylist()
        counts = tbl["sum(count)"].to_numpy(zero_copy_only=False)
    else:
        words, counts = [], []
    merges = learn_merges_local(words, counts, n_merges, min_pair_count)
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "merged": pa.array([m[3] for m in merges], pa.string()),
            "pair_count": pa.array([m[4] for m in merges], pa.int64()),
        }
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word: repeatedly merge the LOWEST-rank
    adjacent pair present (all its occurrences, left-to-right), the
    standard greedy BPE segmenter."""
    syms: list[str] = list(word) + [END_OF_WORD]
    while len(syms) > 1:
        best_rank = None
        for a, b in zip(syms, syms[1:]):
            rk = ranks.get((a, b))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank = rk
                best = (a, b)
        if best_rank is None:
            break
        left, right = best
        syms = list(_apply_merge(tuple(syms), left, right, left + right))
    return syms


class BpeEncodeStage:
    """Actor-pool encode stage: merge ranks built once per actor, a
    capped distinct-word memo so each word is segmented once per actor
    regardless of occurrence count."""

    CACHE_CAP = 1 << 20

    def __init__(self, merges_ref) -> None:
        rows = (
            ray.get(merges_ref)
            if isinstance(merges_ref, ray.ObjectRef)
            else merges_ref
        )
        self.ranks = {(left, right): rank for rank, left, right in rows}
        self.cache: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        v = self.cache.get(word)
        if v is None:
            v = len(encode_word(word, self.ranks))
            if len(self.cache) < self.CACHE_CAP:
                self.cache[word] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n_rows = batch.num_rows
        flat, parent = H.flat_tokens(batch["text"])
        if len(flat):
            d = pc.dictionary_encode(flat)
            vocab = d.dictionary.to_pylist()
            lens = np.fromiter(
                (self._n_tokens(w) for w in vocab),
                dtype=np.int64,
                count=len(vocab),
            )
            idx = d.indices.to_numpy(zero_copy_only=False)
            n_words = np.bincount(parent, minlength=n_rows).astype(np.int64)
            n_bpe = np.bincount(
                parent, weights=lens[idx], minlength=n_rows
            ).astype(np.int64)
        else:
            n_words = np.zeros(n_rows, dtype=np.int64)
            n_bpe = np.zeros(n_rows, dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(n_words > 0, n_bpe / np.maximum(n_words, 1), 0.0)
        out = pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
                "bpe_per_word": pa.array(ratio, pa.float64()),
            }
        )
        # grouping keys ride along when the input carries them (the
        # fertility audit groups by lang without a join)
        for key in ("lang", "source"):
            if key in batch.column_names:
                out = out.append_column(key, batch[key])
        return out


def bpe_encode_documents(
    docs_ds: "ray.data.Dataset",
    merges: pa.Table | None = None,
    n_merges: int = 50,
    max_words: int = 30_000,
    concurrency: int | tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """Train (unless ``merges`` is given) then encode the corpus,
    emitting per-document BPE token counts — the number a sequence-
    packing or token-budget stage actually needs. The merge table
    ships to the actor pool once via the object store. Default pool:
    autoscaling (1, cluster CPUs - reserve) — encoding is the
    corpus-scale stage, but a small run shouldn't pay 30 actor
    startups."""
    if concurrency is None:
        from clonehunter_ray.util import auto_actor_count

        concurrency = (1, auto_actor_count())
    if merges is None:
        merges = bpe_train_merges(
            docs_ds, n_merges=n_merges, max_words=max_words
        )
    rows = list(
        zip(
            merges["rank"].to_pylist(),
            merges["left"].to_pylist(),
            merges["right"].to_pylist(),
        )
    )
    ref = ray.put(rows)
    return docs_ds.map_batches(
        BpeEncodeStage,
        fn_constructor_kwargs={"merges_ref": ref},
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def bpe_fertility_by_lang(
    docs_ds: "ray.data.Dataset",
    merges: pa.Table | None = None,
    n_merges: int = 50,
    max_words: int = 30_000,
) -> "ray.data.Dataset":
    """Tokenizer-fairness audit: per-language FERTILITY (BPE tokens
    per word, micro-averaged over the language's corpus) of a trained
    BPE — the standard cross-lingual tokenizer metric. Languages whose
    fertility sits far above the corpus mean are under-served by the
    learned vocabulary; this is the signal a UniMax-style budget or a
    vocabulary-size decision consumes.

    Shape: the encode actor pool streams once (lang rides along, no
    join); the aggregate is a language-count-sized groupby-sum.
    Fertility is an exact-integer-ratio double.
    """
    import pyarrow.compute as pc

    enc = bpe_encode_documents(
        docs_ds, merges=merges, n_merges=n_merges, max_words=max_words
    )

    def finish(t: pa.Table) -> pa.Table:
        nw = t["sum(n_words)"].to_numpy(zero_copy_only=False)
        nb = t["sum(n_bpe_tokens)"].to_numpy(zero_copy_only=False)
        nd = t["count()"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": t["lang"],
                "n_docs": pa.array(nd.astype(np.int64), pa.int64()),
                "n_words": pa.array(nw.astype(np.int64), pa.int64()),
                "n_bpe_tokens": pa.array(nb.astype(np.int64), pa.int64()),
                "fertility": pa.array(
                    nb / np.maximum(nw, 1), pa.float64()
                ),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        enc.groupby("lang")
        .aggregate(
            Count(),
            Sum("n_words"),
            Sum("n_bpe_tokens"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )
