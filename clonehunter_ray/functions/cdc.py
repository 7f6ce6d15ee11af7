"""Content-defined chunking (CDC) kernels.

Rabin-style rolling-hash chunking: a chunk boundary is declared after
any byte whose trailing ``window``-byte polynomial hash matches the
``mask`` bit pattern, subject to min/max chunk lengths. Because the
boundary decision depends only on LOCAL bytes, inserting or deleting a
prefix shifts at most one chunk — every later chunk re-aligns and
hashes identically. That shift-resistance is what fixed token windows
(``segment_dedup``) fundamentally cannot give and is the standard
storage/dedup-literature answer (LBFS/FastCDC lineage) for detecting
shared content across near-identical web documents at 100 TB.

Two implementations share one boundary contract:
- ``cdc_boundaries``: byte-at-a-time pure-Python reference (tests).
- ``cdc_chunks_batch``: vectorized — one uint64 sliding-window matmul
  per document computes every window hash, then a sparse walk over the
  ~1/(mask+1) candidate positions enforces min/max. The Python loop is
  over CANDIDATES (and docs), never bytes.

Defaults are sized for the ~300-char synthetic docs (avg chunk ~64 B);
production web pages would use window 48 / avg 2-8 KiB — the knobs,
not the code shape, change with scale.
"""

from __future__ import annotations

import hashlib

import numpy as np

_WINDOW = 16
_MASK = 0x3F  # boundary when (hash & _MASK) == _MASK: avg chunk 64 B
_MIN_LEN = 24
_MAX_LEN = 160
# odd multiplier -> full-period polynomial base in Z/2^64
_BASE = np.uint64(0x9E3779B97F4A7C15)


def _window_powers(window: int = _WINDOW) -> np.ndarray:
    # Python-int arithmetic masked to 64 bits: same wraparound as
    # uint64 multiply without numpy's scalar-overflow RuntimeWarning
    p = [1] * window
    for i in range(window - 2, -1, -1):
        p[i] = (p[i + 1] * int(_BASE)) & 0xFFFFFFFFFFFFFFFF
    return np.asarray(p, dtype=np.uint64)


_POWERS = _window_powers()


def _window_hashes(data: np.ndarray, window: int = _WINDOW) -> np.ndarray:
    """uint64 polynomial hash of every ``window``-byte run; position i
    holds the hash of data[i - window + 1 : i + 1] (trailing window)."""
    if len(data) < window:
        return np.zeros(0, dtype=np.uint64)
    powers = _POWERS if window == _WINDOW else _window_powers(window)
    win = np.lib.stride_tricks.sliding_window_view(
        data.astype(np.uint64), window
    )
    return (win * powers).sum(axis=1, dtype=np.uint64)


def cdc_boundaries(
    data: bytes,
    window: int = _WINDOW,
    mask: int = _MASK,
    min_len: int = _MIN_LEN,
    max_len: int = _MAX_LEN,
) -> list[int]:
    """Reference byte-at-a-time chunker: returns chunk END offsets
    (exclusive), always ending with len(data) for non-empty input."""
    n = len(data)
    if n == 0:
        return []
    powers = _window_powers(window)
    out = []
    start = 0
    i = 0
    while i < n:
        length = i - start + 1
        cut = False
        if length >= max_len:
            cut = True
        elif length >= min_len and i >= window - 1 and i - (window - 1) >= start:
            h = 0
            for j in range(window):
                h = (h + data[i - window + 1 + j] * int(powers[j])) & 0xFFFFFFFFFFFFFFFF
            if h & mask == mask:
                cut = True
        if cut:
            out.append(i + 1)
            start = i + 1
        i += 1
    if not out or out[-1] != n:
        out.append(n)
    return out


def _doc_boundaries(
    data: np.ndarray,
    hashes: np.ndarray,
    window: int,
    mask: int,
    min_len: int,
    max_len: int,
) -> list[int]:
    """Sparse candidate walk sharing cdc_boundaries' contract: a
    candidate position cuts iff the chunk is >= min_len AND the full
    window lies inside the current chunk; max_len forces a cut."""
    n = len(data)
    # positions i (0-based byte index) where the trailing window matches
    cand = (
        np.nonzero((hashes & np.uint64(mask)) == np.uint64(mask))[0]
        + window
        - 1
    )
    out: list[int] = []
    start = 0
    ci = 0
    nc = len(cand)
    while True:
        # next content-defined candidate valid for this chunk
        lo = start + max(min_len, window) - 1
        while ci < nc and cand[ci] < lo:
            ci += 1
        forced = start + max_len - 1  # cut AT this index if no candidate
        if ci < nc and cand[ci] <= forced:
            cut = int(cand[ci])
            ci += 1
        else:
            cut = forced
        if cut >= n - 1:
            out.append(n)
            return out
        out.append(cut + 1)
        start = cut + 1


def cdc_chunks_batch(
    texts,
    window: int = _WINDOW,
    mask: int = _MASK,
    min_len: int = _MIN_LEN,
    max_len: int = _MAX_LEN,
):
    """Chunk every text; returns parallel arrays (doc_ordinal,
    chunk_idx, sha256-hex, chunk_len). None/empty texts yield no
    chunks (matching the reference on empty input)."""
    doc_ord: list[int] = []
    chunk_idx: list[int] = []
    digests: list[str] = []
    lengths: list[int] = []
    for d, t in enumerate(texts):
        if not t:
            continue
        raw = t.encode("utf-8") if isinstance(t, str) else bytes(t)
        data = np.frombuffer(raw, dtype=np.uint8)
        hashes = _window_hashes(data, window)
        ends = _doc_boundaries(data, hashes, window, mask, min_len, max_len)
        start = 0
        for k, e in enumerate(ends):
            doc_ord.append(d)
            chunk_idx.append(k)
            digests.append(hashlib.sha256(raw[start:e]).hexdigest())
            lengths.append(e - start)
            start = e
    return (
        np.asarray(doc_ord, dtype=np.int64),
        np.asarray(chunk_idx, dtype=np.int64),
        digests,
        np.asarray(lengths, dtype=np.int64),
    )
