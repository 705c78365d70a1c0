"""STR-packed R-tree (Sort-Tile-Recursive bulk load) over bounding boxes.

Built once per actor from the broadcast boundary table (see
``stages/pip_join.py``); queried with whole point batches at a time.
Pure numpy — leaves and internal nodes are packed arrays, traversal is
breadth-first with vectorized containment tests per node, so a query for
N points costs O(nodes touched) numpy passes, not N Python loops.

STR packing (Leutenegger et al., "STR: A Simple and Efficient Algorithm
for R-Tree Packing", ICDE 1997): sort rects by x-center, slice into
ceil(sqrt(n/cap)) vertical strips, sort each strip by y-center, pack
runs of ``cap`` into leaves; repeat on the leaf MBRs until one root.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Static R-tree over ``boxes`` = float64 array (n, 4) as
    (xmin, ymin, xmax, ymax). ``query_points`` returns candidate
    (point_index, box_index) pairs."""

    def __init__(self, boxes: np.ndarray, node_capacity: int = 10):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.cap = node_capacity
        self.boxes = boxes
        # levels[0] = leaf-entry boxes (the input, in packed order);
        # each level above is the MBRs of groups of `cap` below it.
        if self.n == 0:
            self._order = np.empty(0, dtype=np.int64)
            self._levels = []
            return
        order = self._str_order(boxes)
        self._order = order          # packed position -> original index
        levels = [boxes[order]]
        while len(levels[-1]) > 1:
            levels.append(self._pack_up(levels[-1]))
        self._levels = levels        # [0]=entries ... [-1]=root (len 1)

    def _str_order(self, boxes: np.ndarray) -> np.ndarray:
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n = len(boxes)
        n_leaves = int(np.ceil(n / self.cap))
        n_strips = int(np.ceil(np.sqrt(n_leaves)))
        strip_size = int(np.ceil(n / n_strips))
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        pos = 0
        for s in range(0, n, strip_size):
            strip = by_x[s:s + strip_size]
            strip = strip[np.argsort(cy[strip], kind="stable")]
            order[pos:pos + len(strip)] = strip
            pos += len(strip)
        return order

    def _pack_up(self, child_boxes: np.ndarray) -> np.ndarray:
        n = len(child_boxes)
        n_nodes = int(np.ceil(n / self.cap))
        out = np.empty((n_nodes, 4), dtype=np.float64)
        for i in range(n_nodes):
            grp = child_boxes[i * self.cap:(i + 1) * self.cap]
            out[i, 0] = grp[:, 0].min()
            out[i, 1] = grp[:, 1].min()
            out[i, 2] = grp[:, 2].max()
            out[i, 3] = grp[:, 3].max()
        return out

    def query_points(self, x, y) -> tuple[np.ndarray, np.ndarray]:
        """Candidate pairs for points: returns (point_idx, box_idx) where
        point (x, y) falls inside box_idx's bbox (inclusive edges)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if self.n == 0 or len(x) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z
        # frontier: (point_idx, node_idx) pairs per level, top-down
        pts = np.arange(len(x), dtype=np.int64)
        root = self._levels[-1]
        inside = (
            (x >= root[0, 0]) & (x <= root[0, 2])
            & (y >= root[0, 1]) & (y <= root[0, 3])
        )
        p_idx = pts[inside]
        n_idx = np.zeros(len(p_idx), dtype=np.int64)
        for lvl in range(len(self._levels) - 2, -1, -1):
            if len(p_idx) == 0:
                break
            boxes = self._levels[lvl]
            n_children = len(boxes)
            # expand each (point, node) to the node's children
            child0 = n_idx * self.cap
            counts = np.minimum(self.cap, n_children - child0)
            ends = np.cumsum(counts)
            starts = ends - counts
            total = int(ends[-1])
            reps = np.repeat(np.arange(len(p_idx)), counts)
            offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
            cand_nodes = child0[reps] + offs
            cand_pts = p_idx[reps]
            b = boxes[cand_nodes]
            px, py = x[cand_pts], y[cand_pts]
            hit = (px >= b[:, 0]) & (px <= b[:, 2]) & (py >= b[:, 1]) & (py <= b[:, 3])
            p_idx, n_idx = cand_pts[hit], cand_nodes[hit]
        return p_idx, self._order[n_idx]
