"""Mergeable sketches: HyperLogLog cardinality + Bloom membership.

At 100 TB an exact COUNT(DISTINCT) (queries.py:
distinct_users_per_event_type) still ships one row per distinct value
through a shuffle; a HyperLogLog register array is a CONSTANT 2^p
bytes per group regardless of cardinality, merges with an elementwise
max, and answers within ~1.04/sqrt(2^p) relative error. This module
is the numpy kernel; the Ray shape (per-batch partial registers ->
tiny groupby merge) lives in pipelines/queries.py.

Flajolet et al. 2007 (HyperLogLog) with the standard linear-counting
small-range correction; hashing is a vectorized splitmix64 over
uint64 keys (Steele et al. 2014), no Python per-row work anywhere.
"""

from __future__ import annotations

import numpy as np

# splitmix64 constants
_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array — a
    full-avalanche 64-bit hash (every input bit affects every output
    bit), so sequential ids spread uniformly across registers."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _C1
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def hll_partial(keys: np.ndarray, p: int = 12) -> np.ndarray:
    """One batch's HLL register array (uint8[2^p]) from uint64 keys."""
    if p < 12:
        # the float64-log2 rho trick below is exact only for suffixes
        # of <= 52 bits (= 64 - p with p >= 12)
        raise ValueError("hll_partial requires p >= 12")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(keys) == 0:
        return regs
    h = splitmix64(np.asarray(keys, dtype=np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # remaining (64-p)-bit suffix; rho = leading-zero count + 1.
    # The suffix has <= 52 bits after the shift *only* when p >= 12,
    # which keeps floor(log2(w)) exact in float64 (52-bit mantissa).
    w = (h << np.uint64(p)) >> np.uint64(p)
    nbits = 64 - p
    # log2(0) guarded: w == 0 means all suffix bits zero -> rho = nbits+1
    safe = np.maximum(w, np.uint64(1)).astype(np.float64)
    rho = (nbits - np.floor(np.log2(safe))).astype(np.uint8)
    rho = np.where(w == 0, np.uint8(nbits + 1), rho)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(reg_blobs) -> np.ndarray:
    """Merge register blobs (iterable of bytes / uint8 arrays) by
    elementwise max — the defining property that makes the sketch
    safe to pre-aggregate per batch and combine across any partitioning."""
    stacked = np.stack(
        [np.frombuffer(b, dtype=np.uint8) for b in reg_blobs]
    )
    return stacked.max(axis=0)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate with the linear-counting small-range
    correction (the regime the test corpora live in)."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)
    return float(est)


# -- Bloom filter -----------------------------------------------------------
#
# Mergeable membership sketch for semi-/anti-join pre-filtering: the
# build side ships ONE fixed-size bitmap per batch (OR-merge, order-
# and partitioning-independent) instead of one row per distinct key.
# A Bloom "no" is definite; a "yes" is a maybe with false-positive
# rate ~(1 - e^{-k n / m})^k, so an EXACT anti-join keeps the
# bloom-negative rows directly and routes only the maybes through the
# exact (shuffle) verification — the classic bloom-join (Bratbergsengen
# 1984) shape. k hash functions are derived from one splitmix64 pass
# by double hashing (Kirsch & Mitzenmacher 2006): h_i = h1 + i*h2.

_BLOOM_K = 7  # optimal k for m/n = 10 bits/key; fpr ~= 0.8%


def _bloom_positions(keys: np.ndarray, n_bits: int) -> np.ndarray:
    """(len(keys), k) int64 bit positions for each key."""
    h1 = splitmix64(np.asarray(keys, dtype=np.uint64))
    h2 = splitmix64(h1 ^ _C1) | np.uint64(1)  # odd => full-period stride
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i[None, :] * h2[:, None]
    return (pos % np.uint64(n_bits)).astype(np.int64)


def bloom_partial(keys: np.ndarray, n_bits: int) -> np.ndarray:
    """One batch's Bloom bitmap (uint8[n_bits/8]) from uint64 keys."""
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    bits = np.zeros(n_bits, dtype=np.uint8)
    if len(keys):
        pos = _bloom_positions(keys, n_bits)
        bits[pos.ravel()] = 1
    return np.packbits(bits)


def bloom_merge(blobs) -> np.ndarray:
    """OR-merge packed bitmaps (iterable of bytes / uint8 arrays)."""
    out = np.frombuffer(bytes(blobs[0]), dtype=np.uint8).copy()
    for b in blobs[1:]:
        out |= np.frombuffer(bytes(b), dtype=np.uint8)
    return out


def bloom_contains(packed: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership test -> bool[len(keys)] (True = maybe)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.unpackbits(packed)
    pos = _bloom_positions(keys, len(bits))
    return bits[pos].all(axis=1)


# -- quantile sketch (KLL-style deterministic compactor) --------------------
#
# Mergeable rank/quantile sketch: each batch reduces to a few KB of
# level buffers (level i holds items of weight 2^i), merge is
# concatenate + re-compact, and quantile queries walk the weighted
# sorted union. The compactor is the deterministic variant of
# Karnin-Lang-Liberty 2016: when a level overflows its capacity it is
# sorted and every other item promoted (offset alternating per level
# between compactions), which halves the buffer and doubles the
# weight. Rank error grows ~1/k per level; k=256 gives ~1% on the
# corpus sizes here. The exact histogram-combiner quantiles
# (queries.doc_length_quantiles) stay exact but ship one row per
# DISTINCT value — this sketch is the constant-size alternative for
# continuous/high-cardinality columns at 100 TB.


class QuantileSketch:
    __slots__ = ("k", "levels", "parity")

    def __init__(self, k: int = 256):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.parity: list[int] = [0]

    # -- internals ---------------------------------------------------------

    def _capacity(self, lvl: int) -> int:
        # higher levels may shrink (KLL uses c^h); a flat cap keeps the
        # deterministic variant simple and the sketch still ~k*log(n/k)
        return self.k

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if len(buf) <= self._capacity(i):
                i += 1
                continue
            buf = np.sort(buf, kind="stable")
            off = self.parity[i]
            self.parity[i] ^= 1
            promoted = buf[off::2]
            self.levels[i] = np.empty(0, dtype=np.float64)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
                self.parity.append(0)
            self.levels[i + 1] = np.concatenate(
                (self.levels[i + 1], promoted)
            )
            i += 1

    # -- public API ----------------------------------------------------------

    def update(self, values: np.ndarray) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        # feed in capacity-sized slices so level 0 never balloons
        for start in range(0, len(vals), self.k):
            self.levels[0] = np.concatenate(
                (self.levels[0], vals[start : start + self.k])
            )
            self._compact()

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.parity.append(0)
        for i, buf in enumerate(other.levels):
            if len(buf):
                self.levels[i] = np.concatenate((self.levels[i], buf))
        self._compact()
        return self

    @property
    def weight(self) -> int:
        return sum(len(b) << i for i, b in enumerate(self.levels))

    def quantiles(self, qs) -> np.ndarray:
        """quantile_disc semantics: smallest item whose (estimated)
        cumulative weight reaches ceil(q * N)."""
        vals = np.concatenate(self.levels)
        if len(vals) == 0:
            return np.full(len(list(qs)), np.nan)
        wts = np.concatenate(
            [
                np.full(len(b), 1 << i, dtype=np.int64)
                for i, b in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals, kind="stable")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = cum[-1]
        out = []
        for q in qs:
            target = max(1, int(np.ceil(q * total)))
            out.append(vals[np.searchsorted(cum, target, side="left")])
        return np.asarray(out, dtype=np.float64)

    # -- serialization (one bytes blob per batch) ----------------------------

    def serialize(self) -> bytes:
        import struct

        head = struct.pack(
            "<II", self.k, len(self.levels)
        ) + b"".join(
            struct.pack("<II", len(b), p)
            for b, p in zip(self.levels, self.parity)
        )
        return head + np.concatenate(self.levels).astype("<f8").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "QuantileSketch":
        import struct

        k, nlev = struct.unpack_from("<II", blob, 0)
        sk = cls(k)
        sk.levels, sk.parity = [], []
        off = 8
        lens = []
        for _ in range(nlev):
            ln, p = struct.unpack_from("<II", blob, off)
            lens.append(ln)
            sk.parity.append(p)
            off += 8
        data = np.frombuffer(blob, dtype="<f8", offset=off)
        pos = 0
        for ln in lens:
            sk.levels.append(data[pos : pos + ln].astype(np.float64))
            pos += ln
        return sk
