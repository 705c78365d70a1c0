"""Exact kNN lookup via per-cell sorted Hilbert-key candidate arrays.

Index layout (BASELINE.json north_star: "kNN lookups via per-cell
sorted Hilbert-key arrays"): reference points are bucketed by grid cell
at ``res``; within each cell the candidate arrays are sorted by Hilbert
key, so a probe scans spatially-coherent contiguous memory.

Probe algorithm (exact, not approximate): expand Chebyshev rings of
cells around the probe's cell; after exhausting rings ≤ r, any unseen
point lies in a cell at Chebyshev distance ≥ r+1 and therefore at least
``r * cell_lat_extent`` degrees away — stop once the kth-best distance
is within that bound.  Distance metric: squared Euclidean in degrees
(SQL-oracle-mirrorable); ties broken by reference id.

The index is built once per actor from a broadcast table (small side);
for a large reference side, shard the index by coarse cell and route
probes with a ``groupby(cell)`` — documented scale path, not needed at
fixture scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.cells import cell_id, cell_ring, cell_size_deg
from ..geo.hilbert import hilbert_key


class CellKnnIndex:
    def __init__(self, lat: np.ndarray, lon: np.ndarray, ids: np.ndarray,
                 res: int = 7):
        self.res = res
        self.cell_h, _ = cell_size_deg(res)
        cells = cell_id(lat, lon, res)
        hk = hilbert_key(lat, lon)
        order = np.lexsort((hk, cells))
        self.lat = np.asarray(lat, dtype=np.float64)[order]
        self.lon = np.asarray(lon, dtype=np.float64)[order]
        self.ids = np.asarray(ids)[order]
        sorted_cells = cells[order]
        uniq, starts = np.unique(sorted_cells, return_index=True)
        ends = np.append(starts[1:], len(sorted_cells))
        self.cell_slices = {int(c): (int(s), int(e))
                            for c, s, e in zip(uniq, starts, ends)}
        # parallel arrays for vectorized (searchsorted) segment lookup
        self._uniq_cells = uniq
        self._starts = starts.astype(np.int64)
        self._ends = ends.astype(np.int64)
        self.n = len(self.ids)

    def _candidates_in_cells(self, cells: np.ndarray):
        segs = [self.cell_slices[int(c)] for c in cells if int(c) in self.cell_slices]
        if not segs:
            return np.empty(0, dtype=np.int64)
        return np.concatenate([np.arange(s, e) for s, e in segs])

    def query_one(self, qlat: float, qlon: float, k: int):
        """Returns (ids, dist2) of the exact k nearest, ordered by
        (dist2, id)."""
        center = int(cell_id(np.array([qlat]), np.array([qlon]), self.res)[0])
        best_idx = np.empty(0, dtype=np.int64)
        best_d2 = np.empty(0, dtype=np.float64)
        r = 0
        while True:
            ring = cell_ring(center, r) if r > 0 else np.asarray([center])
            cand = self._candidates_in_cells(ring)
            if len(cand):
                d2 = (self.lat[cand] - qlat) ** 2 + (self.lon[cand] - qlon) ** 2
                best_idx = np.concatenate([best_idx, cand])
                best_d2 = np.concatenate([best_d2, d2])
                if len(best_idx) > k:
                    keep = np.lexsort((self.ids[best_idx], best_d2))[:k]
                    best_idx, best_d2 = best_idx[keep], best_d2[keep]
            # stopping bound: unseen points are >= r * cell_h degrees away
            if len(best_idx) >= k and len(best_idx) > 0:
                kth = best_d2.max()
                if (r * self.cell_h) ** 2 >= kth:
                    break
            r += 1
            if (r - 1) * self.cell_h > 360.0:  # scanned the whole grid
                break
        order = np.lexsort((self.ids[best_idx], best_d2))[:k]
        best_idx, best_d2 = best_idx[order], best_d2[order]
        return self.ids[best_idx], best_d2

    def _bulk_disk1(self, qlat: np.ndarray, qlon: np.ndarray, k: int):
        """Vectorized phase: candidates from each probe's 3×3 cell disk,
        top-k per probe in one flattened pass. Returns (neigh_idx,
        d2, counts, resolved) — ``resolved[i]`` is True when the
        disk-1 answer is provably the exact kNN (kth distance within
        the ring-1 safety bound)."""
        from ..geo.cells import cell_xy, CELL_RES_BITS, _XY_BITS

        nq = len(qlat)
        if self.res < 2:
            # 3x3 disk would wrap onto itself (duplicate candidates);
            # force the per-probe fallback
            return (np.empty(0, np.int64), np.empty(0),
                    np.zeros(nq, np.int64), np.zeros(nq, dtype=bool))
        ix, iy = cell_xy(qlat, qlon, self.res)
        ncell = np.int64(1) << self.res
        # 3x3 neighborhood, lon wraps / lat clamps (out-of-range rows
        # dropped by the searchsorted miss below for clamped overflow)
        dx, dy = np.meshgrid([-1, 0, 1], [-1, 0, 1])
        nx = (ix[:, None] + dx.ravel()[None, :]) % ncell          # (nq, 9)
        ny = iy[:, None] + dy.ravel()[None, :]
        valid = (ny >= 0) & (ny < ncell)
        cells9 = ((np.int64(self.res) << CELL_RES_BITS)
                  | (nx << _XY_BITS) | np.where(valid, ny, 0))
        # segment lookup via searchsorted on the unique-cell array
        flat_cells = cells9.ravel()
        pos = np.searchsorted(self._uniq_cells, flat_cells)
        pos = np.clip(pos, 0, len(self._uniq_cells) - 1)
        found = (self._uniq_cells[pos] == flat_cells) & valid.ravel() \
            if len(self._uniq_cells) else np.zeros(nq * 9, dtype=bool)
        seg_start = np.where(found, self._starts[pos], 0)
        seg_len = np.where(found, self._ends[pos] - self._starts[pos], 0)
        # flatten candidate point indices per (probe, cell)
        total = int(seg_len.sum())
        if total == 0:
            return (np.empty(0, np.int64), np.empty(0), np.zeros(nq, np.int64),
                    np.zeros(nq, dtype=bool))
        reps = np.repeat(np.arange(nq * 9), seg_len)
        offs_base = np.repeat(seg_start, seg_len)
        within = np.arange(total) - np.repeat(
            np.cumsum(seg_len) - seg_len, seg_len)
        cand_point = offs_base + within
        cand_probe = reps // 9
        d2 = ((self.lat[cand_point] - qlat[cand_probe]) ** 2
              + (self.lon[cand_point] - qlon[cand_probe]) ** 2)
        order = np.lexsort((self.ids[cand_point], d2, cand_probe))
        cand_probe = cand_probe[order]
        cand_point = cand_point[order]
        d2 = d2[order]
        counts = np.bincount(cand_probe, minlength=nq)
        grp_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rank = np.arange(total) - np.repeat(grp_start, counts)
        keep = rank < k
        # exactness bound: unseen points sit at Chebyshev >= 2 cells,
        # i.e. >= 1 * cell_h degrees away
        kth_pos = grp_start + np.minimum(counts, k) - 1
        kth_d2 = np.where(counts > 0, d2[np.clip(kth_pos, 0, total - 1)],
                          np.inf)
        resolved = (counts >= k) & (kth_d2 <= self.cell_h ** 2)
        return cand_point[keep], d2[keep], np.minimum(counts, k), resolved

    def query_batch(self, qlat, qlon, k: int, qids=None) -> pa.Table:
        """kNN for a probe batch → long-form (probe_id, neighbor_id,
        dist2, rank). Bulk vectorized disk-1 phase resolves most
        probes; the rest fall back to exact per-probe ring expansion
        (identical results either way)."""
        qlat = np.asarray(qlat, dtype=np.float64)
        qlon = np.asarray(qlon, dtype=np.float64)
        nq = len(qlat)
        if qids is None:
            qids = np.arange(nq)
        qids = np.asarray(qids)
        bulk_pts, bulk_d2, bulk_counts, resolved = self._bulk_disk1(
            qlat, qlon, k)
        # bulk path: one np.repeat/boolean-mask emit for every resolved
        # probe (rows are already grouped by probe, sorted by (d2, id))
        probe_of_row = np.repeat(np.arange(nq), bulk_counts)
        row_rank = (np.arange(len(bulk_pts))
                    - np.repeat(np.concatenate([[0], np.cumsum(bulk_counts)])
                                [:-1], bulk_counts))
        mask = resolved[probe_of_row] if len(bulk_pts) else \
            np.zeros(0, dtype=bool)
        out_p = [qids[probe_of_row[mask]]]
        out_n = [self.ids[bulk_pts[mask]]]
        out_d = [bulk_d2[mask]]
        out_r = [row_rank[mask] + 1]
        # per-probe fallback only for the (rare) unresolved probes
        for i in np.flatnonzero(~resolved):
            ids, d2 = self.query_one(float(qlat[i]), float(qlon[i]), k)
            m = len(ids)
            out_p.append(np.repeat(qids[i], m))
            out_n.append(ids)
            out_d.append(d2)
            out_r.append(np.arange(1, m + 1))
        return pa.table({
            "probe_id": pa.array(np.concatenate(out_p)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "dist2": pa.array(np.concatenate(out_d), pa.float64()),
            "rank": pa.array(np.concatenate(out_r), pa.int64()),
        })


def build_sharded_knn(ref_ds, coarse_res: int = 4, id_col: str = "image_id",
                      lat_col: str = "lat", lon_col: str = "lon"):
    """Scale path: partition the reference side by COARSE grid cell into
    object-store shards — no single-node broadcast of the whole table,
    and no driver funnel: every worker publishes ITS OWN cell shards.

    The reference Dataset is sorted by (coarse cell, Hilbert key) — a
    range shuffle — then a ``map_batches`` pass over the sorted blocks
    ``ray.put``s one shard per cell-run *on the worker that holds the
    block* and emits only tiny ``(cell, ref)`` directory rows (Ray
    tracks ObjectRefs nested in blocks/args, so the refs stay live).
    A cell straddling a block boundary simply yields MULTIPLE partial
    shards — the directory maps ``cell -> [refs]`` and probes
    concatenate partials, so no boundary stitching pass or cross-worker
    data movement is needed; each partial stays Hilbert-sorted.  Only
    the directory rows (one per cell-run, bounded by #cells + #blocks)
    ever reach the driver.  Probe workers fetch the shards their ring
    expansion touches (plasma handles locality/eviction) and cache them
    per process.  Shard objects are owned by the (long-lived) Ray Data
    worker processes that put them; a production cluster with worker
    churn would pin them via a detached owner or persist to storage.

    Returns (directory_ref, coarse_res)."""
    import pandas as pd
    import ray

    from ..geo.cells import cell_id as _cell_id

    def add_cell(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        hk = hilbert_key(lat, lon)
        return (batch.append_column(
            "_cell", pa.array(_cell_id(lat, lon, coarse_res), pa.int64()))
            .append_column("_hk", pa.array(hk, pa.int64())))

    ds = ref_ds.map_batches(add_cell, batch_format="pyarrow").sort(
        ["_cell", "_hk"])

    def publish(block: pa.Table) -> pd.DataFrame:
        cells = block["_cell"].to_numpy(zero_copy_only=False)
        if not len(cells):
            return pd.DataFrame({"cell": pd.Series([], dtype=np.int64),
                                 "ref": pd.Series([], dtype=object)})
        bounds = np.flatnonzero(np.diff(cells)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cells)]])
        refs, out_cells = [], []
        for s, e in zip(starts, ends):
            chunk = block.slice(s, e - s)
            refs.append(ray.put({
                "lat": chunk[lat_col].to_numpy(zero_copy_only=False),
                "lon": chunk[lon_col].to_numpy(zero_copy_only=False),
                "ids": np.asarray(chunk[id_col].to_pylist()),
            }))
            out_cells.append(int(cells[s]))
        return pd.DataFrame({"cell": np.asarray(out_cells, dtype=np.int64),
                             "ref": refs})

    # batch_size=None → one publish call per sorted block (fewest
    # partial shards); the directory table is tiny (ids + refs only)
    dir_rows = ds.map_batches(publish, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    directory: dict[int, list] = {}
    for c, r in zip(dir_rows["cell"], dir_rows["ref"]):
        directory.setdefault(int(c), []).append(r)
    return ray.put(directory), coarse_res


class ShardedKnnStage:
    """Probe stage against a sharded reference (see build_sharded_knn):
    fetches + caches the coarse-cell shards its probes' ring expansions
    touch; exact kNN with the same Chebyshev-ring distance bound as
    :class:`CellKnnIndex`."""

    def __init__(self, directory_ref, coarse_res: int, k: int = 5,
                 id_col: str = "image_id", lat_col: str = "lat",
                 lon_col: str = "lon"):
        import ray

        self.directory = ray.get(directory_ref)
        self.res = coarse_res
        self.cell_h, _ = cell_size_deg(coarse_res)
        self.k = k
        self.id_col = id_col
        self.lat_col = lat_col
        self.lon_col = lon_col
        self._cache: dict[int, dict] = {}

    def _shard(self, cell: int):
        s = self._cache.get(cell)
        if s is None and cell in self.directory:
            import ray

            # a cell may have several partial shards (one per sorted
            # block it straddled at build time) — concatenate once,
            # cache the merged arrays per process
            parts = ray.get(list(self.directory[cell]))
            s = parts[0] if len(parts) == 1 else {
                k: np.concatenate([p[k] for p in parts])
                for k in ("lat", "lon", "ids")}
            self._cache[cell] = s
        return s

    def _query_one(self, qlat: float, qlon: float):
        center = int(cell_id(np.array([qlat]), np.array([qlon]), self.res)[0])
        r = 0
        cand_lat = np.empty(0)
        cand_lon = np.empty(0)
        cand_ids = np.empty(0, dtype=object)
        best_d2 = np.empty(0)
        while True:
            ring = cell_ring(center, r) if r > 0 else np.asarray([center])
            parts = [self._shard(int(c)) for c in ring]
            parts = [p for p in parts if p is not None]
            if parts:
                cand_lat = np.concatenate([cand_lat] + [p["lat"] for p in parts])
                cand_lon = np.concatenate([cand_lon] + [p["lon"] for p in parts])
                cand_ids = np.concatenate([cand_ids] + [p["ids"] for p in parts])
                d2 = (cand_lat - qlat) ** 2 + (cand_lon - qlon) ** 2
                order = np.lexsort((cand_ids, d2))[:self.k]
                cand_lat, cand_lon = cand_lat[order], cand_lon[order]
                cand_ids, best_d2 = cand_ids[order], d2[order]
            if len(cand_ids) >= self.k and len(best_d2):
                if (r * self.cell_h) ** 2 >= best_d2.max():
                    break
            r += 1
            if (r - 1) * self.cell_h > 360.0:
                break
        return cand_ids, best_d2

    def _disk1_cands(self, center: int):
        """Concatenated candidate arrays of the 3×3 coarse-cell disk
        around ``center`` (shards themselves are process-cached)."""
        ring = np.concatenate([[center], cell_ring(center, 1)])
        parts = [self._shard(int(c)) for c in ring]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return {"lat": np.concatenate([p["lat"] for p in parts]),
                "lon": np.concatenate([p["lon"] for p in parts]),
                "ids": np.concatenate([p["ids"] for p in parts])}

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Probes grouped by coarse center cell; each group's disk-1
        candidates are scored as one chunked distance matrix with a
        vectorized top-k (argpartition + within-k lexsort).  A probe
        falls back to exact per-probe ring expansion only when the
        disk-1 kth distance exceeds the Chebyshev ring-1 bound."""
        qlat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        qlon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        qids = np.asarray(batch[self.id_col].to_pylist())
        k = self.k
        out_p, out_n, out_d, out_r = [], [], [], []

        def fallback(i: int):
            ids, d2 = self._query_one(float(qlat[i]), float(qlon[i]))
            m = len(ids)
            out_p.append(np.repeat(qids[i], m))
            out_n.append(ids)
            out_d.append(d2)
            out_r.append(np.arange(1, m + 1))

        centers = cell_id(qlat, qlon, self.res)
        uniq, inv = np.unique(centers, return_inverse=True)
        for ci, c in enumerate(uniq):
            sel = np.flatnonzero(inv == ci)
            cand = self._disk1_cands(int(c))
            if cand is None or len(cand["lat"]) < k:
                for i in sel:
                    fallback(i)
                continue
            for lo in range(0, len(sel), 512):  # bound the (probes, cand)
                idx = sel[lo:lo + 512]          # distance matrix
                d2 = ((cand["lat"][None, :] - qlat[idx][:, None]) ** 2
                      + (cand["lon"][None, :] - qlon[idx][:, None]) ** 2)
                part = np.argpartition(d2, k - 1, axis=1)[:, :k]
                pd2 = np.take_along_axis(d2, part, axis=1)
                pid = cand["ids"][part]
                row = np.repeat(np.arange(len(idx)), k)
                order = np.lexsort((pid.ravel(), pd2.ravel(), row))
                pd2 = pd2.ravel()[order].reshape(len(idx), k)
                pid = pid.ravel()[order].reshape(len(idx), k)
                kth = pd2[:, -1]
                # a tie AT the kth distance makes argpartition's pick
                # ambiguous (exact semantics break ties by id) — route
                # those probes through the exact fallback
                n_le = (d2 <= kth[:, None]).sum(axis=1)
                ok = (kth <= self.cell_h ** 2) & (n_le == k)  # ring-1 bound
                n_ok = int(ok.sum())
                if n_ok:
                    out_p.append(np.repeat(qids[idx[ok]], k))
                    out_n.append(pid[ok].ravel())
                    out_d.append(pd2[ok].ravel())
                    out_r.append(np.tile(np.arange(1, k + 1), n_ok))
                for i in idx[~ok]:
                    fallback(i)
        cat = (lambda parts, dt=None: np.concatenate(parts)
               if parts else np.empty(0, dtype=dt or np.float64))
        return pa.table({
            "probe_id": pa.array(cat(out_p, np.int64)),
            "neighbor_id": pa.array(cat(out_n, np.int64)),
            "dist2": pa.array(cat(out_d), pa.float64()),
            "rank": pa.array(cat(out_r, np.int64), pa.int64()),
        })


class KnnStage:
    """Actor-pool stage: broadcast reference index, probe per batch.

    ``ds.map_batches(KnnStage, fn_constructor_kwargs=dict(ref_table_ref=ref,
    k=5), batch_format="pyarrow", concurrency=N)``.
    """

    def __init__(self, ref_table_ref=None, ref_table: pa.Table | None = None,
                 k: int = 5, res: int = 7, id_col: str = "image_id",
                 lat_col: str = "lat", lon_col: str = "lon"):
        if ref_table_ref is not None:
            import ray
            ref_table = ray.get(ref_table_ref)
        if ref_table is None:
            raise ValueError("need ref_table_ref or ref_table")
        self.index = CellKnnIndex(
            ref_table[lat_col].to_numpy(zero_copy_only=False),
            ref_table[lon_col].to_numpy(zero_copy_only=False),
            np.asarray(ref_table[id_col].to_pylist()),
            res=res,
        )
        self.k = k
        self.id_col = id_col
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.index.query_batch(
            batch[self.lat_col].to_numpy(zero_copy_only=False),
            batch[self.lon_col].to_numpy(zero_copy_only=False),
            self.k,
            qids=np.asarray(batch[self.id_col].to_pylist()),
        )
