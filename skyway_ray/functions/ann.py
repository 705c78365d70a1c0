"""Approximate-nearest-neighbor / similarity search over an embedding
column (``list<float>``).

* :func:`cosine_topk_batch` — the brute-force baseline: one numpy
  matmul per batch against a broadcast query matrix, emitting per-batch
  partial top-k (k rows per query per batch); merge with a tiny
  ``groupby(query_id).map_groups`` or driver-side merge.  Exact.
* :class:`LshIndex` — the scale path: random-hyperplane (SimHash-style)
  bucketing; candidates share ≥1 band bucket, then exact cosine rerank.
  Sub-linear probes at the cost of recall < 1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def embeddings_to_matrix(col) -> np.ndarray:
    """list<float> Arrow column → (n, d) float32 matrix (zero-copy
    flatten + reshape; assumes fixed dimension)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def quantize_cos(sims: np.ndarray) -> np.ndarray:
    """Similarity → micro-unit int64 (floor(cos*1e6+0.5)) — the SAME
    quantization as the tile_polygons microdegree convention, applied
    BEFORE ranking so the rank order is a pure-integer comparison:
    two candidates within ~1 ulp at the k boundary would otherwise
    order differently between numpy's and an oracle's sum order."""
    return np.floor(sims * 1e6 + 0.5).astype(np.int64)


def cosine_topk_batch(batch_vecs: np.ndarray, batch_ids: np.ndarray,
                      query_matrix: np.ndarray, query_ids: np.ndarray,
                      k: int) -> pa.Table:
    """Per-batch partial top-k: (query_id, neighbor_id, cos, rank is
    assigned after the global merge).  ``query_matrix`` must be
    L2-normalized; batch vectors are normalized here.  Ranking is by
    (quantized cos desc, id asc) — full lexsort, because an
    argpartition on raw floats could drop the id-ordered winner among
    boundary ties."""
    bv = _normalize(batch_vecs.astype(np.float64))
    sims = query_matrix @ bv.T                      # (q, nb)
    q = quantize_cos(sims)
    nq, nb = sims.shape
    kk = min(k, nb)
    rows = {"query_id": [], "neighbor_id": [], "cos": []}
    for qi in range(nq):
        sel = np.lexsort((batch_ids, -q[qi]))[:kk]
        rows["query_id"].extend([query_ids[qi]] * kk)
        rows["neighbor_id"].extend(batch_ids[sel].tolist())
        rows["cos"].extend(sims[qi, sel].tolist())
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
        "cos": pa.array(rows["cos"], pa.float64()),
    })


class BruteForceTopK:
    """Actor-pool stage for the exact baseline. Broadcast the
    (normalized) query matrix once; each batch contributes partial
    top-k rows; finish with ``groupby("query_id").map_groups`` keeping
    the global top-k per query."""

    def __init__(self, queries_ref=None, query_matrix=None, query_ids=None,
                 k: int = 10, vec_col: str = "embedding", id_col: str = "vec_id"):
        if queries_ref is not None:
            import ray
            query_matrix, query_ids = ray.get(queries_ref)
        self.qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
        self.qids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = embeddings_to_matrix(batch[self.vec_col])
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return cosine_topk_batch(vecs, ids, self.qm, self.qids, self.k)


def merge_topk(partials, k: int):
    """Global merge of partial top-k rows → (query_id, neighbor_id,
    rank).  ``partials``: Dataset with (query_id, neighbor_id, cos).

    The input is bounded by k × queries × blocks rows (each block
    already kept only its local top-k), so this is the legitimate
    final-top-k driver collect: one vectorized segment pass replaces a
    sort-based ``groupby(query_id).map_groups`` whose fixed all-to-all
    overhead dwarfed the data."""
    import pandas as pd
    import ray.data

    df = partials.to_pandas()
    if not len(df):
        return ray.data.from_pandas(pd.DataFrame({
            "query_id": pd.Series([], dtype=np.int64),
            "neighbor_id": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64)}))
    qz = quantize_cos(df["cos"].to_numpy())
    order = np.lexsort((df["neighbor_id"].to_numpy(), -qz,
                        df["query_id"].to_numpy()))
    qs = df["query_id"].to_numpy()[order]
    new = np.ones(len(qs), dtype=bool)
    new[1:] = qs[1:] != qs[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, len(qs)))
    loc = np.arange(len(qs), dtype=np.int64) - np.repeat(starts, sizes)
    keep = loc < k
    return ray.data.from_pandas(pd.DataFrame({
        "query_id": qs[keep].astype(np.int64),
        "neighbor_id": df["neighbor_id"].to_numpy()[order][keep]
        .astype(np.int64),
        "rank": (loc[keep] + 1).astype(np.int64)}))


class IvfIndex:
    """IVF (inverted-file) ANN: k-means coarse quantizer over unit
    vectors, candidates from the ``n_probe`` nearest centroid lists,
    exact cosine rerank.  Deterministic (seeded init, fixed Lloyd
    iterations).  The scale path: centroids train on a driver sample,
    broadcast to assignment/probe stages; lists build via
    ``groupby(centroid_id)``."""

    def __init__(self, dim: int, n_centroids: int = 64, n_iter: int = 5,
                 seed: int = 42):
        self.dim = dim
        self.n_centroids = n_centroids
        self.n_iter = n_iter
        self.seed = seed
        self.centroids = None
        self.lists: dict[int, np.ndarray] = {}
        self.vecs = None
        self.ids = None

    def build(self, vecs: np.ndarray, ids: np.ndarray) -> None:
        self.vecs = _normalize(np.asarray(vecs, dtype=np.float64))
        self.ids = np.asarray(ids)
        cent = _kmeans_unit(self.vecs, self.n_centroids, self.n_iter,
                            self.seed)
        self.centroids = cent
        assign = np.argmax(self.vecs @ cent.T, axis=1)
        self.lists = {c: np.flatnonzero(assign == c)
                      for c in range(len(cent))}

    def query(self, q: np.ndarray, k: int, n_probe: int = 4):
        q = np.asarray(q, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        order = np.argsort(-(self.centroids @ q))[:n_probe]
        cand = np.concatenate([self.lists.get(int(c), np.empty(0, np.int64))
                               for c in order]).astype(np.int64)
        if not len(cand):
            return np.empty(0, dtype=self.ids.dtype), np.empty(0)
        sims = self.vecs[cand] @ q
        top = np.lexsort((self.ids[cand], -sims))[:k]
        return self.ids[cand[top]], sims[top]


def _kmeans_unit(vecs: np.ndarray, k: int, n_iter: int = 5,
                 seed: int = 42) -> np.ndarray:
    """Seeded spherical k-means (fixed Lloyd iterations) over unit
    vectors; returns (k, d) unit centroids."""
    n = len(vecs)
    k = min(k, n)
    rng = np.random.default_rng(seed)
    cent = vecs[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(vecs @ cent.T, axis=1)
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cent[c] = m / norm
    return cent


def auto_n_centroids(n: int) -> int:
    """Default IVF list count: ~sqrt(n) keeps the EXPECTED inverted
    list at ~sqrt(n) rows (floor 64), so a list fits one worker at any
    corpus size — 10^12 vectors → 10^6 lists of ~10^6 rows."""
    return max(64, int(np.ceil(np.sqrt(max(int(n), 1)))))


def hash_sample(ds, id_col: str, limit: int, n: int | None = None,
                seed: int = 42):
    """Layout-independent bounded training sample: keep rows whose
    id-hash falls under ``limit/n`` of the hash space — the selected
    SET depends only on row content, never on block layout (unlike
    ``random_sample``, whose per-block RNG makes sampled codebooks —
    and thus ANN results — partition-dependent).  Expected ~``limit``
    rows; all of them are collected (bounded)."""
    import polars as pl

    if n is None:
        n = ds.count()
    if n <= limit:
        return ds.to_pandas()
    thresh = np.uint64(int(min(1.0, limit / n) * float(2**64 - 1)))

    def pick(batch: pa.Table) -> pa.Table:
        h = (pl.from_arrow(batch[id_col].combine_chunks()
                           if isinstance(batch[id_col], pa.ChunkedArray)
                           else batch[id_col])
             .hash(seed).to_numpy().astype(np.uint64))
        return batch.filter(pa.array(h <= thresh))

    return ds.map_batches(pick, batch_format="pyarrow").to_pandas()


_IVF_CACHE: dict = {}


def _ivf_cached(ref):
    key = str(ref)
    val = _IVF_CACHE.get(key)
    if val is None:
        import ray

        val = ray.get(ref)
        _IVF_CACHE.clear()
        _IVF_CACHE[key] = val
    return val


def ivf_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray,
             k: int = 10, n_centroids: int | None = None, n_probe: int = 4,
             n_iter: int = 5, seed: int = 42, sample_limit: int = 8192,
             vec_col: str = "embedding", id_col: str = "vec_id",
             list_slab: int = 4096):
    """Distributed IVF ANN over an embedding Dataset.

    Scale shape: centroids train on a bounded driver sample
    (``random_sample`` → ``limit`` — never the full table), broadcast
    once via ``ray.put``; an assignment ``map_batches`` tags each
    vector with its centroid list; ``groupby(centroid_id)`` CO-LOCATES
    each inverted list, and the per-list ``map_groups`` reranks exactly
    the queries whose ``n_probe`` nearest centroids include that list.
    Partial top-k rows merge with the same tiny
    :func:`merge_topk` as the brute-force baseline.  Recall < 1 by
    construction (queries only see ``n_probe`` lists); exactness is the
    brute-force path's job.

    Two list-size guards so one inverted list never overwhelms a
    worker: ``n_centroids`` defaults to ``max(64, ceil(sqrt(n)))`` (n
    from the Dataset's cheap metadata count), keeping the EXPECTED list
    near sqrt(n) rows; and the per-list rerank walks the list in
    ``list_slab``-row slabs (each slab emits its own partial top-k —
    :func:`merge_topk` already merges across slabs), so peak memory is
    one slab's (slab, dim) matrix, not ``np.stack`` of the whole
    list."""
    import pandas as pd
    import ray

    n_rows = ds.count()
    if n_centroids is None:
        n_centroids = auto_n_centroids(n_rows)
    # bounded, layout-independent sample for the coarse quantizer
    sample = hash_sample(ds, id_col, sample_limit, n=n_rows, seed=seed)
    svecs = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    cent = _kmeans_unit(svecs, n_centroids, n_iter, seed)
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    # (nq, n_probe) probe lists — queries are the small broadcast side
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :min(n_probe, len(cent))]
    ref = ray.put((cent, qm, qids, probe))

    def assign(batch: pa.Table) -> pa.Table:
        cent_b, _, _, _ = _ivf_cached(ref)
        vecs = embeddings_to_matrix(batch[vec_col])
        a = np.argmax(_normalize(vecs.astype(np.float64)) @ cent_b.T, axis=1)
        return batch.append_column("centroid_id",
                                   pa.array(a.astype(np.int64), pa.int64()))

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    def probe_list(g: pd.DataFrame) -> pa.Table:
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        _, qm_b, qids_b, probe_b = _ivf_cached(ref)
        c = int(g["centroid_id"].iloc[0])
        qsel = np.flatnonzero((probe_b == c).any(axis=1))
        if not len(qsel) or not len(g):
            return empty
        parts = []
        for lo in range(0, len(g), list_slab):
            sl = g.iloc[lo:lo + list_slab]
            vecs = np.stack(sl[vec_col].to_numpy()).astype(np.float64)
            ids = sl[id_col].to_numpy()
            parts.append(cosine_topk_batch(vecs, ids, qm_b[qsel],
                                           qids_b[qsel], k))
        return pa.concat_tables(parts)

    partials = (assigned.groupby("centroid_id")
                .map_groups(probe_list, batch_format="pandas"))
    return merge_topk(partials, k)


class LshIndex:
    """Random-hyperplane LSH over unit vectors: ``bands`` bands of
    ``bits`` bits each.  Two vectors are candidates if any band bucket
    matches; rerank candidates with exact cosine.  Deterministic
    (seeded hyperplanes)."""

    def __init__(self, dim: int, bands: int = 8, bits: int = 8, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((bands * bits, dim))
        self.bands = bands
        self.bits = bits
        self.buckets: list[dict[int, list[int]]] = [dict() for _ in range(bands)]
        self.vecs = None
        self.ids = None

    def _codes(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0                    # (n, bands*bits)
        weights = (1 << np.arange(self.bits, dtype=np.int64))
        return np.stack([
            bits[:, b * self.bits:(b + 1) * self.bits] @ weights
            for b in range(self.bands)
        ], axis=1)                                        # (n, bands)

    def build(self, vecs: np.ndarray, ids: np.ndarray) -> None:
        self.vecs = _normalize(np.asarray(vecs, dtype=np.float64))
        self.ids = np.asarray(ids)
        codes = self._codes(self.vecs)
        for i in range(len(ids)):
            for b in range(self.bands):
                self.buckets[b].setdefault(int(codes[i, b]), []).append(i)

    def query(self, q: np.ndarray, k: int):
        q = np.asarray(q, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        code = self._codes(q[None, :])[0]
        cand = set()
        for b in range(self.bands):
            cand.update(self.buckets[b].get(int(code[b]), ()))
        if not cand:
            return np.empty(0, dtype=self.ids.dtype), np.empty(0)
        cand = np.fromiter(cand, dtype=np.int64)
        sims = self.vecs[cand] @ q
        order = np.lexsort((self.ids[cand], -sims))[:k]
        return self.ids[cand[order]], sims[order]


def _kmeans_l2(x: np.ndarray, k: int, n_iter: int = 8,
               seed: int = 42) -> np.ndarray:
    """Seeded Euclidean k-means (fixed Lloyd iterations) — the PQ
    sub-quantizer trainer (subvectors are NOT unit vectors, so
    spherical k-means does not apply)."""
    n = len(x)
    k = min(k, n)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_train(vecs: np.ndarray, m: int = 8, n_codes: int = 16,
             n_iter: int = 8, seed: int = 42) -> np.ndarray:
    """Train product-quantization codebooks on NORMALIZED vectors:
    split the d dims into ``m`` contiguous subspaces, k-means each.
    Returns (m, n_codes, d//m) codebooks.  ADC then approximates the
    inner product: cos(q, x) ≈ Σ_s  q_s · codebook_s[code_s(x)]."""
    n, d = vecs.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    books = np.empty((m, n_codes, dsub))
    for s in range(m):
        sub = vecs[:, s * dsub:(s + 1) * dsub]
        cb = _kmeans_l2(sub, n_codes, n_iter, seed + s)
        if len(cb) < n_codes:  # tiny corpus: pad with repeats
            cb = cb[np.arange(n_codes) % len(cb)]
        books[s] = cb
    return books


def pq_encode(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) normalized vectors → (n, m) uint8 codes (nearest
    sub-centroid per subspace) — a 32× compression at d=64/float32."""
    n = len(vecs)
    m, n_codes, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for s in range(m):
        sub = vecs[:, s * dsub:(s + 1) * dsub]
        # argmin ||x - c||² = argmax (x·c - ||c||²/2), one matmul
        scores = sub @ books[s].T - 0.5 * (books[s] ** 2).sum(axis=1)
        codes[:, s] = np.argmax(scores, axis=1)
    return codes


def pq_adc_scores(codes: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """(n, m) codes × (nq, m, n_codes) query lookup tables →
    (nq, n) approximate similarities (m table gathers, no per-row
    work)."""
    nq = lut.shape[0]
    out = np.zeros((nq, len(codes)))
    for s in range(codes.shape[1]):
        out += lut[:, s, codes[:, s]]
    return out


def pq_topk(ds, query_matrix: np.ndarray, query_ids: np.ndarray,
            k: int = 10, m: int = 8, n_codes: int = 16, rerank: int = 5,
            n_iter: int = 8, seed: int = 42, sample_limit: int = 8192,
            vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed PQ (product-quantization) ANN with exact rerank.

    Scale shape: codebooks train on a bounded, seeded driver sample
    and broadcast once (tiny: m × n_codes × d/m floats); an encode
    ``map_batches`` maps the corpus to (id, m-byte code) rows — the
    table the scan reads is ~32× smaller than the raw vectors, the
    point of PQ at 10^12-vector scale; the ADC scan emits per-batch
    partial top-(rerank·k) per query (bounded rows); the merged
    candidate id set (≤ nq·rerank·k) is broadcast back and ONLY those
    vectors are fetched for the exact rerank — never the corpus.
    Returns (query_id, neighbor_id, ann_rank) like ivf_topk.
    Approximate by construction; recall asserted in tests."""
    import ray

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    sample = hash_sample(ds, id_col, sample_limit, seed=seed)
    svecs = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    books = pq_train(svecs, m, n_codes, n_iter, seed)
    dsub = books.shape[2]
    # (nq, m, n_codes) ADC lookup tables: q_s · codebook_s^T
    lut = np.einsum("qsd,scd->qsc",
                    qm.reshape(len(qm), m, dsub), books)
    ref = ray.put((books, lut, qm, qids))

    pool = rerank * k

    def encode(batch: pa.Table) -> pa.Table:
        books_b, _, _, _ = _ivf_cached(ref)
        vecs = _normalize(embeddings_to_matrix(batch[vec_col])
                          .astype(np.float64))
        codes = pq_encode(vecs, books_b)
        # zero-copy fixed-size-binary column straight from the (n, m)
        # uint8 code matrix — no per-row Python
        code_arr = pa.Array.from_buffers(
            pa.binary(books_b.shape[0]), len(codes),
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
        return pa.table({id_col: batch[id_col], "code": code_arr})

    codes_ds = ds.map_batches(encode, batch_format="pyarrow")

    def adc_scan(batch: pa.Table) -> pa.Table:
        books_b, lut_b, _, qids_b = _ivf_cached(ref)
        mm = books_b.shape[0]
        fsb = batch["code"].combine_chunks()
        raw = np.frombuffer(fsb.buffers()[1], dtype=np.uint8)
        raw = raw[fsb.offset * mm:(fsb.offset + len(fsb)) * mm
                  ].reshape(-1, mm)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        scores = pq_adc_scores(raw, lut_b)
        take = min(pool, scores.shape[1])
        top = np.argpartition(-scores, take - 1, axis=1)[:, :take]
        qcol = np.repeat(qids_b, take)
        return pa.table({
            "query_id": pa.array(qcol, pa.int64()),
            "neighbor_id": pa.array(ids[top].ravel(), pa.int64()),
            "score": pa.array(np.take_along_axis(scores, top, axis=1)
                              .ravel(), pa.float64()),
        })

    partials = codes_ds.map_batches(adc_scan,
                                    batch_format="pyarrow").to_pandas()
    # driver-side bounded merge: top-pool per query over batch partials
    cand: dict[int, np.ndarray] = {}
    for qid, g in partials.groupby("query_id"):
        order = np.lexsort((g["neighbor_id"].to_numpy(),
                            -g["score"].to_numpy()))[:pool]
        cand[int(qid)] = g["neighbor_id"].to_numpy()[order]
    all_ids = np.unique(np.concatenate(list(cand.values()))) \
        if cand else np.empty(0, np.int64)
    idref = ray.put(np.sort(all_ids))

    def fetch(batch: pa.Table) -> pa.Table:
        import ray as _ray

        want = _ray.get(idref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(want, ids)
        pos = np.clip(pos, 0, max(len(want) - 1, 0))
        hit = (want[pos] == ids) if len(want) else np.zeros(len(ids), bool)
        return batch.filter(pa.array(hit))

    fetched = ds.map_batches(fetch, batch_format="pyarrow").to_pandas()
    fvecs = _normalize(np.stack(fetched[vec_col].to_numpy())
                       .astype(np.float64))
    fids = fetched[id_col].to_numpy()
    order = np.argsort(fids)
    fvecs, fids = fvecs[order], fids[order]

    rows_q, rows_n, rows_r = [], [], []
    for qi, qid in enumerate(qids):
        ids_q = cand.get(int(qid), np.empty(0, np.int64))
        sel = np.searchsorted(fids, ids_q)
        sims = fvecs[sel] @ qm[qi]
        top = np.lexsort((ids_q, -quantize_cos(sims)))[:k]
        rows_q.append(np.full(len(top), qid, dtype=np.int64))
        rows_n.append(ids_q[top])
        rows_r.append(np.arange(1, len(top) + 1))
    import pandas as pd

    return pd.DataFrame({
        "query_id": np.concatenate(rows_q) if rows_q else [],
        "neighbor_id": np.concatenate(rows_n) if rows_n else [],
        "ann_rank": np.concatenate(rows_r) if rows_r else [],
    })
