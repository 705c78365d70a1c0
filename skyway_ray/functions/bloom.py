"""Simple vectorized Bloom filter (numpy bitset, k universal hashes).

The broadcast-semi-join scale degree for key sets too large to ship as
a sorted array (ray_guide "Semi / anti join: broadcast the key set (or
a Bloom filter of it)"): m-bit filter ~ 10 bits/key gives ~1% false
positives; the semi join then only over-keeps (never drops) — callers
needing exactness follow with an exact check on the survivors.
"""

from __future__ import annotations

import numpy as np

_P = (1 << 61) - 1


class BloomFilter:
    def __init__(self, n_keys: int, bits_per_key: int = 10, n_hashes: int = 7,
                 seed: int = 42):
        self.m = max(64, int(n_keys * bits_per_key))
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _P, n_hashes, dtype=np.uint64)
        self.b = rng.integers(0, _P, n_hashes, dtype=np.uint64)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        from .mersenne import universal_hash

        x = keys.astype(np.uint64)[:, None]
        return universal_hash(x, self.a, self.b) % np.uint64(self.m)  # (n, k)

    def add(self, keys) -> None:
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, keys) -> np.ndarray:
        keys = np.asarray(keys)
        pos = self._positions(keys)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)
