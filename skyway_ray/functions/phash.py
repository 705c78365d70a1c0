"""Perceptual image hashing (aHash / dHash) + Hamming-banded
near-duplicate detection over an image corpus.

Pure-numpy deterministic kernels (no image library needed beyond the
repo's own PNG/fake-lossy codecs): grayscale via the integer ITU-R
601-ish weights, nearest-neighbor downsample (matching
stages/multimodal.py ImageResize), threshold/gradient bit packing.

Near-dup shape: hashes are computed ONCE in an actor-pool pass
(bytes never enter a shuffle), then the tiny (id, hash64) table runs
through the same distributed :func:`near_dup.lsh_dedup_pipeline` as
MinHash/embedding dedup — banding a 64-bit hash into ``bands``
equal-width bit slices guarantees (pigeonhole) that any pair within
Hamming distance < ``bands`` shares at least one exact band value, so
band buckets + exact Hamming verification catch every such pair that
lands bucket-adjacent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → (h, w) float64 luma (0.299/0.587/0.114)."""
    f = img.astype(np.float64)
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


def _sample_grid(g: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = g.shape
    ys = (np.arange(oh) * h // oh).clip(0, h - 1)
    xs = (np.arange(ow) * w // ow).clip(0, w - 1)
    return g[np.ix_(ys, xs)]


def _pack_bits(bits: np.ndarray) -> np.int64:
    """Row-major 64 bools → int64 (bit i = flat[i])."""
    flat = bits.reshape(-1).astype(np.uint64)
    return int(
        (flat << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
        .astype(np.uint64).view(np.int64))


def ahash64(img: np.ndarray) -> np.int64:
    """Average hash: 8x8 grayscale, bit = pixel > mean."""
    g = _sample_grid(to_gray(img), 8, 8)
    return _pack_bits(g > g.mean())


def dhash64(img: np.ndarray) -> np.int64:
    """Difference hash: 8x9 grayscale, bit = horizontal gradient sign.
    More robust than aHash to global brightness shifts."""
    g = _sample_grid(to_gray(img), 8, 9)
    return _pack_bits(g[:, 1:] > g[:, :-1])


def _sample_gray_batch(imgs: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(n, h, w, 3) uint8 → (n, oh, ow) float64 luma on the sample
    grid.  Sampling commutes with the elementwise luma transform, so
    results are bit-identical to ``_sample_grid(to_gray(img), …)``
    per image; the grid sample lands contiguous either way (fancy
    indexing copies), so downstream reductions see the same layout."""
    n, h, w, _ = imgs.shape
    ys = (np.arange(oh) * h // oh).clip(0, h - 1)
    xs = (np.arange(ow) * w // ow).clip(0, w - 1)
    sub = imgs[:, ys][:, :, xs].astype(np.float64)
    return sub[..., 0] * 0.299 + sub[..., 1] * 0.587 + sub[..., 2] * 0.114


def _pack_bits_batch(bits: np.ndarray) -> np.ndarray:
    """(n, 64) bools → (n,) int64, bit i = bits[:, i] (row-major, same
    convention as :func:`_pack_bits`)."""
    w = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    return (bits.reshape(len(bits), 64).astype(np.uint64) * w).sum(
        axis=1, dtype=np.uint64).view(np.int64)


def ahash64_batch(imgs: np.ndarray) -> np.ndarray:
    """Vectorized :func:`ahash64` over a same-shape (n, h, w, 3) stack
    — bit-identical per image (tested), ~10× less per-call numpy
    overhead on small images."""
    g = _sample_gray_batch(imgs, 8, 8).reshape(len(imgs), 64)
    return _pack_bits_batch(g > g.mean(axis=1, keepdims=True))


def dhash64_batch(imgs: np.ndarray) -> np.ndarray:
    """Vectorized :func:`dhash64` over a same-shape (n, h, w, 3) stack."""
    g = _sample_gray_batch(imgs, 8, 9)
    return _pack_bits_batch(g[:, :, 1:] > g[:, :, :-1])


def phash_near_dup(ds, id_col: str = "image_id", hash_col: str = "dhash64",
                   max_dist: int = 3, bands: int = 4,
                   num_partitions: int = 8):
    """Distributed perceptual-hash near-dedup over a precomputed
    (id, hash64) Dataset: survivors keep each duplicate cluster's
    min-id representative.

    ``bands`` 16-bit slices of the hash are the LSH bands (with the
    default ``bands=4 > max_dist=3``, any pair within ``max_dist``
    shares a band — banding loses no candidate buckets); exact
    verification is Hamming ≤ ``max_dist`` on the full 64 bits.  Runs
    on :func:`near_dup.lsh_dedup_pipeline` — same sorted-bucket chain
    edges, Bloom-prefiltered sketch pass, distributed connected
    components as the text/embedding dedups.

    Exact-duplicate contraction: a 64-bit perceptual hash space is
    TINY next to any real corpus (the bench fixture has ~8k distinct
    dhash values across 500k images), so banding the raw rows floods
    the 16-bit buckets — ~2M candidate edges, ~4 star edges per image
    re-emitted in every band.  A combiner-tree winners pass (min id
    per distinct hash — per-block partials bounded by block-distinct
    hashes, no corpus-sized exchange) broadcasts the (hash → rep) map;
    one streaming pass emits the (rep, member) contraction edges, and
    the LSH banding + chain verify run over the distinct hashes only;
    the CC input is the contraction stars plus the few verified
    cross-hash edges.  The banding stays bounded by the distinct-hash
    count, the broadcast by the same."""
    import ray
    import ray.data

    from ..stages.agg_tree import tree_aggregate
    from .near_dup import hamming64, lsh_dedup_pipeline

    # winners pass: min id per distinct hash via the Arrow combiner
    # tree — per-block partials are bounded by the block's DISTINCT
    # hashes, so nothing resembling the corpus ever crosses a shuffle
    # (the whole contraction exists because perceptual-hash spaces
    # collapse: ~8k distinct dhash values across the 500k-image bench
    # corpus).  This replaced a full (id, hash) groupby exchange that
    # cost more than the decode itself at bench scale; for a corpus
    # whose distinct-hash count rivals its rows the tree degrades to
    # shipping those distincts — still ids+hashes only, and such a
    # corpus has no contraction to exploit in the first place.
    winners_tab = ray.get(
        tree_aggregate(ds.select_columns([hash_col, id_col]),
                       [hash_col], [(id_col, "min")])
        .to_arrow_refs()[0])
    h_np = winners_tab[hash_col].to_numpy(zero_copy_only=False)
    order = np.argsort(h_np, kind="mergesort")
    winners_ref = ray.put(
        (h_np[order],
         winners_tab[id_col].to_numpy(zero_copy_only=False)[order]))

    def star_fn(b: pa.Table) -> pa.Table:
        hs, reps = ray.get(winners_ref)
        h = b[hash_col].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rep = reps[np.searchsorted(hs, h)]
        keep = rep != ids
        return pa.table({"doc_a": pa.array(rep[keep], pa.int64()),
                         "doc_b": pa.array(ids[keep], pa.int64())})

    star_edges = ds.map_batches(star_fn, batch_format="pyarrow")
    distinct = ray.data.from_arrow(pa.table({
        id_col: winners_tab[id_col], hash_col: winners_tab[hash_col]}))

    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def band_fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        band_id = np.repeat(np.arange(bands, dtype=np.int64), n)
        band_hash = np.concatenate([
            ((h >> np.uint64(b * width)) & mask).view(np.int64)
            for b in range(bands)]) if n else np.empty(0, np.int64)
        return pa.table({
            "band_id": pa.array(band_id, pa.int64()),
            "band_hash": pa.array(band_hash, pa.int64()),
            # full hash as secondary sort key: identical hashes sort
            # contiguous in a bucket -> exact dups always chain-adjacent
            "set_hash": pa.array(np.tile(h.view(np.int64), bands), pa.int64()),
            "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
        })

    def sketch_fn(batch: pa.Table, keep: np.ndarray) -> list:
        h = batch[hash_col].to_numpy(zero_copy_only=False)
        return [h[i].tobytes() for i in np.flatnonzero(keep)]

    def pair_ok(a: bytes, b: bytes) -> bool:
        return int(hamming64(np.frombuffer(a, np.int64),
                             np.frombuffer(b, np.int64))[0]) <= max_dist

    def verify_vals(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # the 8-byte hash IS the sketch and rides the band rows as
        # set_hash, so verification is one vectorized popcount inline
        # in the chain scan (no sketch passes / verify joins at all)
        return hamming64(a, b) <= max_dist

    return lsh_dedup_pipeline(distinct, id_col=id_col, band_fn=band_fn,
                              sketch_fn=sketch_fn, pair_ok=pair_ok,
                              num_partitions=num_partitions,
                              verify_vals=verify_vals,
                              extra_edges=star_edges, remove_from=ds)
