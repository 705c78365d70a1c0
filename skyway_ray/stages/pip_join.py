"""Broadcast point-in-polygon spatial join (the engine's central join).

The boundary table is the small side: the driver ``ray.put``s it once
and every ``PIPJoiner`` actor builds its :class:`BoundaryIndex`
(STR-packed R-tree over ring bboxes + packed ring coordinate arrays)
ONCE in ``__init__`` — the Ray Data actor-pool analogue of the
reference's compiled-filter-per-thread state
(``/root/reference/src/main.rs:150-171``).  No shuffle: each batch is
joined where it already lives.

Join modes mirror the reference's selection semantics generalized to
containment (SURVEY.md §2.5):

* ``inner`` — one output row per (image, containing region); multi-
  match duplicates the image row (overlapping regions).
* ``left``  — like inner but images in no region survive with a null
  ``region_id``.
* ``semi``  — images in ≥1 region, once (HAS-analogue).
* ``anti``  — images in no region (DROP-analogue).

Usage::

    ref = ray.put(boundaries_table)           # once, on the driver
    ds = ds.map_batches(PIPJoiner, fn_constructor_kwargs=dict(
             boundaries_ref=ref, mode="inner"),
             batch_format="pyarrow", concurrency=8)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.pip import points_in_ring, ring_bbox
from ..geo.strtree import STRtree


class BoundaryIndex:
    """STRtree over ring bboxes + exact ray-cast verification.

    For small region counts (≤ ``_FLAT_SCAN_MAX``) the bbox candidate
    pass is a single dense points×regions numpy comparison — measured
    ~40× faster than the tree walk at 50 regions; the STRtree takes
    over when the polygon set is large enough for pruning to win."""

    _FLAT_SCAN_MAX = 64

    def __init__(self, boundaries: pa.Table):
        self.region_ids = np.asarray(boundaries["region_id"].to_pylist(), dtype=object)
        self.rings = []
        bboxes = np.empty((boundaries.num_rows, 4), dtype=np.float64)
        lons = boundaries["ring_lon"].to_pylist()
        lats = boundaries["ring_lat"].to_pylist()
        for j in range(boundaries.num_rows):
            rx = np.asarray(lons[j], dtype=np.float64)
            ry = np.asarray(lats[j], dtype=np.float64)
            self.rings.append((rx, ry))
            bboxes[j] = ring_bbox(rx, ry)
        self.bboxes = bboxes
        self.tree = STRtree(bboxes)

    def _candidates_flat(self, lon: np.ndarray, lat: np.ndarray):
        b = self.bboxes
        hit = ((lon[:, None] >= b[None, :, 0]) & (lon[:, None] <= b[None, :, 2])
               & (lat[:, None] >= b[None, :, 1]) & (lat[:, None] <= b[None, :, 3]))
        return np.nonzero(hit)

    def match(self, lon: np.ndarray, lat: np.ndarray):
        """Exact containment pairs, sorted by (point_idx, region_idx)."""
        if len(self.region_ids) <= self._FLAT_SCAN_MAX:
            cand_p, cand_r = self._candidates_flat(lon, lat)
        else:
            cand_p, cand_r = self.tree.query_points(lon, lat)
        if len(cand_p) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        order = np.argsort(cand_r, kind="stable")
        cand_p, cand_r = cand_p[order], cand_r[order]
        hit = np.zeros(len(cand_p), dtype=bool)
        # one vectorized ray-cast per distinct candidate region
        bounds = np.flatnonzero(np.diff(cand_r)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(cand_r)]])
        for s, e in zip(starts, ends):
            rj = cand_r[s]
            rx, ry = self.rings[rj]
            pts = cand_p[s:e]
            hit[s:e] = points_in_ring(lon[pts], lat[pts], rx, ry)
        p, r = cand_p[hit], cand_r[hit]
        order = np.lexsort((r, p))
        return p[order], r[order]


def _apply_pip(index: BoundaryIndex, batch: pa.Table, mode: str,
               lat_col: str, lon_col: str, region_col: str) -> pa.Table:
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    p, r = index.match(lon, lat)
    if mode == "inner":
        out = batch.take(pa.array(p, pa.int64()))
        return out.append_column(
            region_col, pa.array(index.region_ids[r], pa.string()))
    if mode == "left":
        matched = np.zeros(len(lat), dtype=bool)
        matched[p] = True
        unmatched = np.flatnonzero(~matched)
        idx = np.concatenate([p, unmatched])
        regions = np.concatenate([
            index.region_ids[r],
            np.full(len(unmatched), None, dtype=object),
        ])
        order = np.argsort(idx, kind="stable")
        out = batch.take(pa.array(idx[order], pa.int64()))
        return out.append_column(
            region_col, pa.array(regions[order], pa.string()))
    matched = np.zeros(len(lat), dtype=bool)
    matched[p] = True
    if mode == "anti":
        matched = ~matched
    return batch.take(pa.array(np.flatnonzero(matched), pa.int64()))


# per-worker-process cache: stateless PIP tasks rebuild the (tiny)
# index at most once per worker instead of paying an actor-pool spawn
_PROCESS_INDEX_CACHE: dict = {}


def make_pip_join_fn(boundaries_ref, mode: str = "inner",
                     lat_col: str = "lat", lon_col: str = "lon",
                     region_col: str = "region_id"):
    """Stateless-task variant of the PIP join for SMALL boundary sets:
    the index builds once per worker process (module-level cache keyed
    by the object ref) — same amortization as an actor pool without
    the pool's spawn latency, and the stage stays elastic/fusable.
    Prefer :class:`PIPJoiner` (actor pool) when index build is
    expensive (many polygons) or memory should be bounded to N actors.
    """
    if mode not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"bad join mode {mode!r}")

    def pip_join(batch: pa.Table) -> pa.Table:
        key = str(boundaries_ref)
        index = _PROCESS_INDEX_CACHE.get(key)
        if index is None:
            import ray

            index = BoundaryIndex(ray.get(boundaries_ref))
            _PROCESS_INDEX_CACHE.clear()   # at most one cached index
            _PROCESS_INDEX_CACHE[key] = index
        return _apply_pip(index, batch, mode, lat_col, lon_col, region_col)

    return pip_join


class PIPJoiner:
    """Actor-pool stage: point-in-polygon join against broadcast
    boundaries. Exactly one of ``boundaries_ref`` (a ``ray.put`` ref)
    / ``boundaries_path`` (parquet path) / ``boundaries_table`` must
    be given."""

    def __init__(self, boundaries_ref=None, boundaries_path: str | None = None,
                 boundaries_table: pa.Table | None = None, mode: str = "inner",
                 lat_col: str = "lat", lon_col: str = "lon",
                 region_col: str = "region_id"):
        if mode not in ("inner", "left", "semi", "anti"):
            raise ValueError(f"bad join mode {mode!r}")
        if boundaries_ref is not None:
            import ray
            table = ray.get(boundaries_ref)
        elif boundaries_path is not None:
            import pyarrow.parquet as pq
            table = pq.read_table(boundaries_path)
        elif boundaries_table is not None:
            table = boundaries_table
        else:
            raise ValueError("need boundaries_ref, boundaries_path or boundaries_table")
        self.index = BoundaryIndex(table)
        self.mode = mode
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.region_col = region_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _apply_pip(self.index, batch, self.mode, self.lat_col,
                          self.lon_col, self.region_col)
