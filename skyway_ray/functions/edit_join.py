"""Edit-distance similarity self-join (threshold 1) — the FastSS /
symmetric-delete scheme: two strings are within edit distance 1 iff
their deletion neighborhoods D(s) = {s} ∪ {s minus one char} intersect
(substitution → same char deleted on both sides; insert/delete → the
longer side's deletion hits the shorter string itself; equality → the
identity variants match).

Everything is vectorized over uint8 character matrices — variant
strings are NEVER materialized.  Each string's L+1 neighborhood hashes
come from one prefix-sum of a positional polynomial hash: with odd
multiplier P (invertible mod 2^64),

    h(s)            = Σ s[k]·P^k
    h(s minus k=j)  = pre[j] + (h(s) − pre[j+1]) · P⁻¹

so the per-batch cost is O(rows × max_len) numpy work.  Candidate
pairs fall out of sorted equal-hash runs (grouped triangular-arange
expansion), are deduped by a pair-key hash exchange, and verified with
an exact vectorized edit-distance-≤1 kernel (prefix+suffix match for
length-±1 pairs, mismatch count for equal-length pairs) — hash
collisions can only ever ADD candidates, never drop or merge pairs.

Scale shape: three coarse hash exchanges (variant hash → pair key),
each through stages/scan.py hash_bucket_scan; rows carry only
(hash, id, string), and run sizes are bounded by the neighborhood
structure (a variant is shared only by single-edit relatives), so no
bucket group degenerates.  Prior art: Bocek et al.'s FastSS technique
(public); no reference-engine analogue (the Rust reference has no
similarity joins)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier, invertible mod 2^64
_PINV = np.uint64(pow(0x100000001B3, -1, 2 ** 64))
_LEN_SALT = np.uint64(0x9E3779B97F4A7C15)


def _char_matrix(names: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N × Lmax uint8 matrix, lengths) for an array of ASCII strings.
    Padding bytes are 0 (no ASCII string contains NUL)."""
    b = np.array([s.encode() for s in names], dtype=object)
    lens = np.fromiter((len(x) for x in b), dtype=np.int64, count=len(b))
    lmax = int(lens.max()) if len(lens) else 1
    fixed = np.array([x.ljust(lmax, b"\0") for x in b], dtype=f"S{lmax}")
    mat = fixed.view(np.uint8).reshape(len(b), lmax)
    return mat, lens


def del1_hashes(names: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, variant_hash) for every string's deletion-1
    neighborhood, identity variant included.  Hashes are salted by the
    VARIANT length so only same-length variants can collide — which
    preserves completeness (every single-edit relationship compares
    equal-length variants)."""
    if not len(names):
        return (np.zeros(0, np.int64), np.zeros(0, np.uint64))
    mat, lens = _char_matrix(names)
    n, lmax = mat.shape
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        pw = np.cumprod(np.full(lmax + 1, _P, np.uint64)) * _PINV
    terms = mat.astype(np.uint64) * pw[:lmax]
    pre = np.zeros((n, lmax + 1), np.uint64)
    np.cumsum(terms, axis=1, out=pre[:, 1:])
    total = pre[np.arange(n), lens]

    # deletion variants: rows repeated len times, j = position deleted
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    j = (np.arange(int(lens.sum()), dtype=np.int64)
         - np.repeat(np.cumsum(lens) - lens, lens))
    h_del = (pre[row, j]
             + (total[row] - pre[row, j + 1]) * _PINV
             + (lens[row] - 1).astype(np.uint64) * _LEN_SALT)
    h_id = total + lens.astype(np.uint64) * _LEN_SALT
    return (np.concatenate([np.arange(n, dtype=np.int64), row]),
            np.concatenate([h_id, h_del]))


def ed_le1_mask(a_names: np.ndarray, b_names: np.ndarray) -> np.ndarray:
    """Exact vectorized edit-distance ≤ 1 over parallel string arrays."""
    if not len(a_names):
        return np.zeros(0, dtype=bool)
    am, al = _char_matrix(a_names)
    bm, bl = _char_matrix(b_names)
    lmax = max(am.shape[1], bm.shape[1])
    if am.shape[1] < lmax:
        am = np.pad(am, ((0, 0), (0, lmax - am.shape[1])))
    if bm.shape[1] < lmax:
        bm = np.pad(bm, ((0, 0), (0, lmax - bm.shape[1])))
    out = np.zeros(len(a_names), dtype=bool)
    dl = al - bl

    # equal length: ≤ 1 mismatching position
    eq_len = dl == 0
    if eq_len.any():
        diffs = (am[eq_len] != bm[eq_len]).sum(axis=1)
        out[eq_len] = diffs <= 1

    # |len diff| = 1: common_prefix + common_suffix >= shorter length
    for sign in (1, -1):
        sel = dl == sign
        if not sel.any():
            continue
        x, y = (am[sel], bm[sel]) if sign == 1 else (bm[sel], am[sel])
        ly = np.minimum(al, bl)[sel]
        neq = x != y
        neq[np.arange(x.shape[1]) >= ly[:, None]] = True  # stop at len(y)
        p = np.where(neq.any(axis=1), neq.argmax(axis=1), ly)
        # right-aligned compare: suffix of x (len ly+1) vs suffix of y
        cols = np.arange(x.shape[1])
        xr = np.take_along_axis(
            x, np.maximum((ly + 1)[:, None] - 1 - cols, 0), axis=1)
        yr = np.take_along_axis(
            y, np.maximum(ly[:, None] - 1 - cols, 0), axis=1)
        neq_r = xr != yr
        neq_r[cols >= ly[:, None]] = True
        s = np.where(neq_r.any(axis=1), neq_r.argmax(axis=1), ly)
        out[sel] = (p + s) >= ly
    return out


def edit_similarity_join(ds, id_col: str, str_col: str,
                         n_rows: int | None = None,
                         rows_per_bucket: int | None = None):
    """All (a, b) id pairs (a < b) whose strings are within edit
    distance 1.  Returns a Dataset with columns (a_id, b_id)."""
    from ..stages.scan import hash_bucket_scan

    def variants(b: pa.Table) -> pa.Table:
        names = b[str_col].to_numpy(zero_copy_only=False).astype("U")
        ids = b[id_col].to_numpy(zero_copy_only=False)
        row, h = del1_hashes(names)
        return pa.table({
            "_vh": pa.array(h.view(np.int64), pa.int64()),
            "_id": pa.array(ids[row], pa.int64()),
            "_s": pa.array(names[row])})

    empty = pa.table({"a_id": pa.array([], pa.int64()),
                      "b_id": pa.array([], pa.int64()),
                      "_sa": pa.array([], pa.string()),
                      "_sb": pa.array([], pa.string())})

    def cand_pairs(t: pa.Table) -> pa.Table:
        vh = t["_vh"].to_numpy(zero_copy_only=False)
        ids = t["_id"].to_numpy(zero_copy_only=False)
        s = t["_s"].to_numpy(zero_copy_only=False).astype("U")
        order = np.lexsort((ids, vh))
        vh, ids, s = vh[order], ids[order], s[order]
        keep = np.ones(len(vh), dtype=bool)  # distinct (vh, id)
        keep[1:] = (vh[1:] != vh[:-1]) | (ids[1:] != ids[:-1])
        vh, ids, s = vh[keep], ids[keep], s[keep]
        new = np.ones(len(vh), dtype=bool)
        new[1:] = vh[1:] != vh[:-1]
        sizes = np.diff(np.append(np.flatnonzero(new), len(vh)))
        loc = np.arange(len(vh), dtype=np.int64) - np.repeat(
            np.cumsum(sizes) - sizes, sizes)
        rep = np.repeat(sizes, sizes) - 1 - loc
        a_idx = np.repeat(np.arange(len(vh), dtype=np.int64), rep)
        ar = np.arange(int(rep.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(rep) - rep, rep)
        b_idx = a_idx + ar + 1
        if not len(a_idx):
            return empty
        return pa.table({"a_id": pa.array(ids[a_idx], pa.int64()),
                         "b_id": pa.array(ids[b_idx], pa.int64()),
                         "_sa": pa.array(s[a_idx]),
                         "_sb": pa.array(s[b_idx])})

    def verify(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        sa = t["_sa"].to_numpy(zero_copy_only=False).astype("U")
        sb = t["_sb"].to_numpy(zero_copy_only=False).astype("U")
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        swap = a > b
        sa2 = np.where(swap, sb, sa)
        sb2 = np.where(swap, sa, sb)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        sa2, sb2 = sa2[order], sb2[order]
        keep = np.ones(len(lo), dtype=bool)
        keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        lo, hi, sa2, sb2 = lo[keep], hi[keep], sa2[keep], sb2[keep]
        ok = ed_le1_mask(sa2, sb2) & (lo != hi)
        return pa.table({"a_id": pa.array(lo[ok], pa.int64()),
                         "b_id": pa.array(hi[ok], pa.int64())})

    var = ds.map_batches(variants, batch_format="pyarrow")
    # ~L+1 variants per row — scale the bucket budget accordingly
    n_var = None if n_rows is None else n_rows * 20
    cands = hash_bucket_scan(var, ["_vh"], cand_pairs, n_rows=n_var,
                             rows_per_bucket=rows_per_bucket)
    return hash_bucket_scan(cands, ["a_id", "b_id"], verify,
                            n_rows=n_var, rows_per_bucket=rows_per_bucket)
