"""Douglas–Peucker trajectory simplification — breadth-first and
vectorized across every active segment in a bucket at once.

Semantics: classic DP over each user's (t, event_id)-ordered polyline
on MICRODEGREE integer coordinates.  The point kept at each split is
the one with the max |cross-product| distance to the segment chord
(ties break to the FIRST point in order — deterministic); a segment
splits when the exact test ``cross² > eps² · len²`` holds (Python
big-int — cross can reach 2^59 so its square needs 128 bits; the test
count is bounded by the OUTPUT size, not the input: each segment is
threshold-checked exactly once in its life).  Degenerate chords
(coincident endpoints, len² = 0) fall back to max point-to-endpoint
squared distance vs eps² — all int64.

Scale shape: the engine never recurses per user.  Each round gathers
the interior points of ALL active segments (disjoint index intervals,
so a round touches ≤ n points), computes every cross product in one
numpy pass, and finds each segment's argmax with
``maximum.reduceat`` + a first-index ``minimum.reduceat`` tie-break.
Rounds = max split depth (log-ish on real tracks); memory O(n).

The reference has no simplification operator — this extends the
geospatial surface (SURVEY.md §2.5 tiling/geo family) with the
standard track-thinning step of any 100 TB GPS-trace pipeline.
"""

from __future__ import annotations

import numpy as np

__all__ = ["dp_keep_mask", "dp_reference"]


def dp_keep_mask(x: np.ndarray, y: np.ndarray, first: np.ndarray,
                 eps: int) -> np.ndarray:
    """Boolean keep-mask for DP simplification with tolerance ``eps``
    (microdegrees) over concatenated per-user polylines.

    ``x``/``y``: int64 microdegree coords sorted by (user, order);
    ``first``: True at each user's first row."""
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    n = len(x)
    keep = np.zeros(n, bool)
    if n == 0:
        return keep
    starts = np.flatnonzero(first)
    ends = np.r_[starts[1:], n] - 1
    keep[starts] = True
    keep[ends] = True
    eps2 = int(eps) * int(eps)

    live = ends - starts > 1
    seg_s, seg_e = starts[live], ends[live]
    while len(seg_s):
        lens = seg_e - seg_s - 1
        pstart = np.cumsum(np.r_[0, lens[:-1]])
        total = int(lens.sum())
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(pstart, lens) + np.repeat(seg_s + 1, lens))
        sid = np.repeat(np.arange(len(seg_s), dtype=np.int64), lens)
        cdx = x[seg_e] - x[seg_s]
        cdy = y[seg_e] - y[seg_s]
        lensq = cdx * cdx + cdy * cdy  # |Δ| < 2^29 → fits int64
        zero = lensq == 0
        # per-point metric: |cross| to the chord, or squared distance
        # to the (coincident) endpoints for degenerate chords
        px = x[idx] - x[seg_s][sid]
        py = y[idx] - y[seg_s][sid]
        cross = cdx[sid] * py - cdy[sid] * px
        metric = np.where(zero[sid], px * px + py * py, np.abs(cross))
        segmax = np.maximum.reduceat(metric, pstart)
        ismax = metric == segmax[sid]
        argmax = np.minimum.reduceat(np.where(ismax, idx, n), pstart)
        # exact split test (cross² needs 128 bits → Python ints; one
        # test per segment-lifetime, so cost scales with the output)
        split = np.fromiter(
            ((int(segmax[i]) > eps2) if zero[i]
             else (int(segmax[i]) ** 2 > eps2 * int(lensq[i]))
             for i in range(len(seg_s))), dtype=bool, count=len(seg_s))
        mids = argmax[split]
        keep[mids] = True
        ls, le, lm = seg_s[split], seg_e[split], mids
        seg_s = np.r_[ls, lm]
        seg_e = np.r_[lm, le]
        live = seg_e - seg_s > 1
        seg_s, seg_e = seg_s[live], seg_e[live]
    return keep


def dp_reference(xs: list[int], ys: list[int], eps: int) -> list[bool]:
    """Recursive textbook DP over ONE polyline — the test oracle
    (exact Python-int arithmetic, same first-point tie-break)."""
    n = len(xs)
    keep = [False] * n
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    eps2 = eps * eps

    def rec(s: int, e: int) -> None:
        if e - s <= 1:
            return
        cdx, cdy = xs[e] - xs[s], ys[e] - ys[s]
        lensq = cdx * cdx + cdy * cdy
        best, bi = -1, -1
        for i in range(s + 1, e):
            px, py = xs[i] - xs[s], ys[i] - ys[s]
            m = (px * px + py * py) if lensq == 0 \
                else abs(cdx * py - cdy * px)
            if m > best:
                best, bi = m, i
        if (best > eps2) if lensq == 0 else (best * best > eps2 * lensq):
            keep[bi] = True
            rec(s, bi)
            rec(bi, e)

    rec(0, n - 1)
    return keep
