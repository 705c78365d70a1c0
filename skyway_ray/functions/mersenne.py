"""Vectorized modular arithmetic over the Mersenne prime p = 2^61-1.

Pure numpy — no Python-object bigints.  Used by the universal hash
families in :mod:`near_dup` (MinHash) and :mod:`bloom`.  Two tricks:

* 2^61 ≡ 1 (mod p), so any 64-bit value folds with shift-adds, and a
  122-bit product splits into 30/31-bit limbs whose partial products
  all stay below 2^63.
* this numpy build's uint64 multiply is ~30x slower than int64 (no
  SIMD path), so limb products are computed in int64 — every limb
  product is provably < 2^63 — and only the masks/shifts/adds run in
  uint64.
"""

from __future__ import annotations

import numpy as np

M61 = np.uint64((1 << 61) - 1)
_S61 = np.uint64(61)
_MASK30 = np.uint64((1 << 30) - 1)
_MASK31 = np.uint64((1 << 31) - 1)
_S1 = np.uint64(1)
_S30 = np.uint64(30)
_S31 = np.uint64(31)


def mod61(v: np.ndarray) -> np.ndarray:
    """Canonical v mod (2^61-1) for any uint64 input (vectorized)."""
    v = np.asarray(v, dtype=np.uint64)
    v = (v & M61) + (v >> _S61)
    v = (v & M61) + (v >> _S61)
    return np.where(v >= M61, v - M61, v)


def _fold(v: np.ndarray) -> np.ndarray:
    """Loose reduction: result ≤ 2^61 (may equal p or p+1 — a
    deterministic representative, cheap because it skips the
    conditional subtract; canonicalize with :func:`mod61` at the end).
    """
    v = (v & M61) + (v >> _S61)
    return (v & M61) + (v >> _S61)


def _imul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Product of two arrays whose values each fit 31 bits — run in
    int64 (fast path in this numpy build), reinterpret as uint64."""
    p = a.astype(np.int64) * b.astype(np.int64)
    return p.view(np.uint64)


def mulmod61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61-1), elementwise with broadcasting.

    Splits both operands into 30/31-bit limbs: a*x = (a1*x1)<<62 +
    (a1*x0 + a0*x1)<<31 + a0*x0, then reduces termwise with
    2^61 ≡ 1 (so <<62 ≡ <<1 and <<31 re-splits once more).
    """
    a = _fold(np.asarray(a, dtype=np.uint64))
    x = _fold(np.asarray(x, dtype=np.uint64))
    a1, a0 = a >> _S31, a & _MASK31
    x1, x0 = x >> _S31, x & _MASK31
    t1 = _fold(_imul(a1, x1) << _S1)            # (a1*x1)<<62 ≡ <<1
    mid = _fold(_imul(a1, x0) + _imul(a0, x1))
    m1, m0 = mid >> _S30, mid & _MASK30         # mid<<31 ≡ m1 + m0<<31
    t2 = _fold(m1 + (m0 << _S31))
    t3 = _fold(_imul(a0, x0))
    return mod61(t1 + t2 + t3)


def universal_hash(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """h_i(x) = (a_i*x + b_i) mod (2^61-1) on a broadcast grid.

    ``x`` shape (n, 1) against ``a``/``b`` shape (k,) yields (n, k).
    """
    return mod61(mulmod61(a, x) + np.asarray(b, dtype=np.uint64))


def split31(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pre-split full-range a < 2^61 into int64 limbs (a1 = a>>31 <
    2^30, a0 = a & mask31 < 2^31) for :func:`minhash_grid`."""
    a = np.asarray(a, dtype=np.uint64)
    return ((a >> _S31).astype(np.int64), (a & _MASK31).astype(np.int64))


def minhash_grid(x32: np.ndarray, a1: np.ndarray, a0: np.ndarray,
                 b: np.ndarray) -> np.ndarray:
    """h_i(x) = (a_i*x + b_i) mod (2^61-1) for x < 2^32, with a_i
    pre-split by :func:`split31` — the MinHash hot kernel: exactly two
    int64 grid multiplies (this numpy's uint64 mul is ~30x slower) and
    a loose (non-canonical, but deterministic-per-input) reduction,
    which preserves min-hash semantics.

    ``x32`` shape (n, 1) int64 against (k,) params yields (n, k).
    """
    b = np.asarray(b, dtype=np.uint64)
    t = _fold((a1 * x32).view(np.uint64))               # (a>>31)*x ≤ 2^61
    # t<<31 ≡ (t>>30) + ((t & mask30) << 31)  (mod p)
    hi = (t >> _S30) + ((t & _MASK30) << _S31)
    lo = (a0 * x32).view(np.uint64)                     # < 2^63
    return _fold(hi + lo + b)                           # sum < 2^64
