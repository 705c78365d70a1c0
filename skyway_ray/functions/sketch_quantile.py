"""Mergeable deterministic quantile sketch (Munro–Paterson / MRL
multilevel-buffer family; the deterministic cousin of KLL).

State: one sorted buffer per level; an item in level ``l`` represents
``2^l`` original rows.  When a level exceeds its capacity ``k`` it is
COMPACTED: the sorted buffer keeps every other element (the starting
offset alternates deterministically per level via a compaction
counter — no RNG, so distributed runs are reproducible for a fixed
merge order) and the survivors are promoted one level up, cascading.

Error: each compaction at level ``l`` perturbs any rank by at most
``2^l``; with ``≈ n/(k·2^l)`` compactions per level the total rank
error is ``≤ n·(L+2)/k`` where ``L = ⌈log2(max(2, n/k))⌉`` — the
bound asserted in tests/test_sketch_quantile.py across distributions,
shardings, and merge orders.  (KLL's random coin gets ``O(1/ε)``
space; this deterministic variant trades a log factor for exact
reproducibility, the right trade for a data-pipeline gate.)

Mergeable: ``merge`` concatenates per-level buffers then re-compacts —
associative up to the stated bound, so block sketches combine through
any tree shape (Ray Data usage: one sketch per input block via
map_batches, then a bounded streaming reduce of the tiny sketch rows,
exactly like stages/hll.py).

Serialization: (levels int32 array, values float64 array) flattened
pairs — Arrow-friendly list columns, no pickling.
"""

from __future__ import annotations

import numpy as np

DEFAULT_K = 512


class QuantileSketch:
    __slots__ = ("k", "levels", "_parity")

    def __init__(self, k: int = DEFAULT_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = []  # level l -> sorted float64
        self._parity: list[int] = []

    # -- construction ---------------------------------------------------

    def update(self, values: np.ndarray) -> "QuantileSketch":
        """Absorb a batch (vectorized: sort once, then level-0 insert +
        cascade).  Values are float64; NaNs must be filtered upstream."""
        v = np.asarray(values, np.float64)
        if v.size == 0:
            return self
        self._insert(0, np.sort(v))
        return self

    def _ensure(self, lv: int) -> None:
        while len(self.levels) <= lv:
            self.levels.append(np.empty(0, np.float64))
            self._parity.append(0)

    def _insert(self, lv: int, sorted_vals: np.ndarray) -> None:
        self._ensure(lv)
        merged = np.empty(self.levels[lv].size + sorted_vals.size,
                          np.float64)
        # linear two-way merge via searchsorted indexing
        idx = np.searchsorted(self.levels[lv], sorted_vals, side="right")
        mask = np.zeros(merged.size, bool)
        mask[idx + np.arange(sorted_vals.size)] = True
        merged[mask] = sorted_vals
        merged[~mask] = self.levels[lv]
        self.levels[lv] = merged
        self._compact_from(lv)

    def _compact_from(self, lv: int) -> None:
        while lv < len(self.levels) and self.levels[lv].size > self.k:
            buf = self.levels[lv]
            off = self._parity[lv] & 1
            self._parity[lv] += 1
            # weight conservation: compact an EVEN-sized body (every
            # other element promoted carries doubled weight); an odd
            # buffer holds its max back at the current level
            if buf.size % 2 == 1:
                self.levels[lv] = buf[-1:]
                body = buf[:-1]
            else:
                self.levels[lv] = np.empty(0, np.float64)
                body = buf
            keep = body[off::2]
            self._ensure(lv + 1)
            nxt = np.sort(np.concatenate([self.levels[lv + 1], keep]))
            self.levels[lv + 1] = nxt
            lv += 1

    # -- merge / query ----------------------------------------------------

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for lv, buf in enumerate(other.levels):
            if buf.size:
                self._insert(lv, buf)
        return self

    def n(self) -> int:
        return int(sum(b.size << lv for lv, b in enumerate(self.levels)))

    def quantile(self, q) -> np.ndarray:
        """Weighted-rank quantile(s): value whose cumulative weight
        first reaches ``q·n`` (lower interpolation)."""
        vals = np.concatenate([b for b in self.levels if b.size]) \
            if any(b.size for b in self.levels) else np.empty(0)
        if vals.size == 0:
            return np.full(np.shape(q), np.nan)
        wts = np.concatenate([
            np.full(b.size, 1 << lv, np.int64)
            for lv, b in enumerate(self.levels) if b.size])
        order = np.argsort(vals, kind="mergesort")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        tgt = np.ceil(np.atleast_1d(np.asarray(q, np.float64))
                      * cum[-1]).astype(np.int64).clip(1, cum[-1])
        return vals[np.searchsorted(cum, tgt, side="left")]

    # -- serialization ------------------------------------------------

    def dump(self) -> tuple[np.ndarray, np.ndarray]:
        lvs = np.concatenate([
            np.full(b.size, lv, np.int32)
            for lv, b in enumerate(self.levels)]) \
            if self.levels else np.empty(0, np.int32)
        vs = np.concatenate(self.levels) if self.levels \
            else np.empty(0, np.float64)
        return lvs, vs

    @classmethod
    def load(cls, lvs: np.ndarray, vs: np.ndarray,
             k: int = DEFAULT_K) -> "QuantileSketch":
        s = cls(k)
        lvs = np.asarray(lvs, np.int32)
        vs = np.asarray(vs, np.float64)
        for lv in np.unique(lvs):
            s._ensure(int(lv))
            s.levels[int(lv)] = np.sort(vs[lvs == lv])
        s._compact_from(0)
        for lv in range(len(s.levels)):
            s._compact_from(lv)
        return s

    def error_bound(self) -> int:
        """Deterministic worst-case rank-error bound for the current
        n (see module docstring)."""
        n = self.n()
        if n <= self.k:
            return 0
        lvl = int(np.ceil(np.log2(max(2, n / self.k))))
        return int(np.ceil(n * (lvl + 2) / self.k))
