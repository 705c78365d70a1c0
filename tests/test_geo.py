import numpy as np
import pytest

from skyway_ray.geo.cells import (
    cell_id, cell_parent, cell_res, cell_decode, cell_disk, cell_ring,
    cell_center, cell_sql,
)
from skyway_ray.geo.hilbert import hilbert_d, hilbert_d_slow, hilbert_key
from skyway_ray.geo.s2 import s2_cell_id, s2_face, s2_parent_pos
from skyway_ray.geo.tiles import tile_xy, tile_sql
from skyway_ray.geo.strtree import STRtree
from skyway_ray.geo.pip import points_in_ring, point_in_ring_slow

RNG = np.random.default_rng(42)
LATS = RNG.uniform(-89.9, 89.9, 5000)
LONS = RNG.uniform(-179.9, 179.9, 5000)


class TestCells:
    def test_res_roundtrip(self):
        for r in (7, 9, 12):
            c = cell_id(LATS, LONS, r)
            assert (cell_res(c) == r).all()

    def test_parent_containment(self):
        c12 = cell_id(LATS, LONS, 12)
        c7 = cell_id(LATS, LONS, 7)
        assert (cell_parent(c12, 7) == c7).all()

    def test_center_in_cell(self):
        c = cell_id(LATS, LONS, 10)
        lat, lon = cell_center(c)
        assert (cell_id(lat, lon, 10) == c).all()

    def test_disk_and_ring(self):
        c = int(cell_id(np.array([10.0]), np.array([20.0]), 9)[0])
        d1 = cell_disk(c, 1)
        assert len(d1) == 9 and c in d1
        r1 = cell_ring(c, 1)
        assert len(r1) == 8 and c not in r1
        # pole clamp: cell at max iy has a truncated disk
        cp = int(cell_id(np.array([89.99]), np.array([0.0]), 5)[0])
        assert len(cell_disk(cp, 1)) == 6

    def test_lon_wrap(self):
        c = int(cell_id(np.array([0.0]), np.array([-179.99]), 6)[0])
        disk = cell_disk(c, 1)
        _, ixs, _ = cell_decode(disk)
        assert 0 in ixs and (2**6 - 1) in ixs  # wrapped across dateline

    def test_sql_mirror(self):
        import duckdb
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lat": LATS[:500], "lon": LONS[:500]}))
        got = con.sql(f"select {cell_sql('lat', 'lon', 9)} as c from pts").fetchnumpy()["c"]
        want = cell_id(LATS[:500], LONS[:500], 9)
        assert (got == want).all()


class TestHilbert:
    def test_matches_scalar_reference(self):
        xs = RNG.integers(0, 2**16, 300)
        ys = RNG.integers(0, 2**16, 300)
        fast = hilbert_d(xs, ys)
        for i in range(300):
            assert fast[i] == hilbert_d_slow(int(xs[i]), int(ys[i]))

    def test_bijective_small(self):
        n = 1 << 5
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        d = hilbert_d(xs.ravel(), ys.ravel(), order=5)
        assert len(np.unique(d)) == n * n
        assert d.min() == 0 and d.max() == n * n - 1

    def test_locality(self):
        k = hilbert_key(LATS, LONS)
        # successive keys along a short path are close on the curve
        lat = np.full(100, 10.0)
        lon = np.linspace(20.0, 20.1, 100)
        kk = hilbert_key(lat, lon)
        assert np.abs(np.diff(kk)).max() < 2**16


class TestS2:
    def test_faces_of_cardinal_points(self):
        lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        assert list(s2_face(s2_cell_id(lat, lon))) == [0, 1, 2, 3, 4, 5]

    def test_leaf_bit(self):
        ids = s2_cell_id(LATS, LONS).view(np.uint64)
        assert (ids & np.uint64(1) == 1).all()

    def test_nearby_share_prefix(self):
        a = s2_cell_id(np.array([45.0]), np.array([7.0]))
        b = s2_cell_id(np.array([45.0000001]), np.array([7.0000001]))
        assert s2_parent_pos(a, 20)[0] == s2_parent_pos(b, 20)[0]
        far = s2_cell_id(np.array([-45.0]), np.array([-120.0]))
        assert s2_parent_pos(a, 5)[0] != s2_parent_pos(far, 5)[0]

    def test_deterministic_unique(self):
        ids = s2_cell_id(LATS, LONS)
        assert len(np.unique(ids)) == len(ids)  # leaf cells ~1cm, all distinct
        assert (ids == s2_cell_id(LATS, LONS)).all()


class TestTiles:
    def test_known_tiles(self):
        # lon 0 lat 0 at z1 -> (1, 1) upper-left of SE quadrant boundary
        x, y = tile_xy(np.array([0.0]), np.array([0.0]), 1)
        assert (x[0], y[0]) == (1, 1)
        x, y = tile_xy(np.array([0.0]), np.array([0.0]), 0)
        assert (x[0], y[0]) == (0, 0)

    def test_range(self):
        for z in (7, 12):
            x, y = tile_xy(LATS, LONS, z)
            assert x.min() >= 0 and x.max() < 2**z
            assert y.min() >= 0 and y.max() < 2**z

    def test_sql_mirror(self):
        import duckdb, pandas as pd
        con = duckdb.connect()
        con.register("pts", pd.DataFrame({"lat": LATS[:500], "lon": LONS[:500]}))
        xe, ye = tile_sql("lat", "lon", 12)
        got = con.sql(f"select {xe} as x, {ye} as y from pts").fetchnumpy()
        wx, wy = tile_xy(LATS[:500], LONS[:500], 12)
        assert (got["x"] == wx).all() and (got["y"] == wy).all()


class TestSTRtree:
    def test_matches_brute_force(self):
        boxes = np.empty((200, 4))
        boxes[:, 0] = RNG.uniform(-180, 170, 200)
        boxes[:, 1] = RNG.uniform(-90, 80, 200)
        boxes[:, 2] = boxes[:, 0] + RNG.uniform(0.5, 20, 200)
        boxes[:, 3] = boxes[:, 1] + RNG.uniform(0.5, 20, 200)
        tree = STRtree(boxes)
        px = RNG.uniform(-180, 180, 1000)
        py = RNG.uniform(-90, 90, 1000)
        pi, bi = tree.query_points(px, py)
        got = set(zip(pi.tolist(), bi.tolist()))
        want = set()
        for b in range(200):
            hit = (px >= boxes[b, 0]) & (px <= boxes[b, 2]) & (py >= boxes[b, 1]) & (py <= boxes[b, 3])
            want.update((int(i), b) for i in np.flatnonzero(hit))
        assert got == want

    def test_empty(self):
        tree = STRtree(np.empty((0, 4)))
        pi, bi = tree.query_points(np.array([1.0]), np.array([2.0]))
        assert len(pi) == 0 and len(bi) == 0


class TestPIP:
    def test_square(self):
        rx = [0.0, 10.0, 10.0, 0.0]
        ry = [0.0, 0.0, 10.0, 10.0]
        px = np.array([5.0, 15.0, -1.0, 5.0])
        py = np.array([5.0, 5.0, 5.0, 15.0])
        assert list(points_in_ring(px, py, rx, ry)) == [True, False, False, False]

    def test_concave_and_closed_ring(self):
        # L-shape, explicitly closed
        rx = [0, 4, 4, 2, 2, 0, 0]
        ry = [0, 0, 2, 2, 4, 4, 0]
        px = np.array([1.0, 3.0, 3.0, 1.0])
        py = np.array([1.0, 1.0, 3.0, 3.0])
        assert list(points_in_ring(px, py, rx, ry)) == [True, True, False, True]

    def test_matches_scalar(self):
        theta = np.linspace(0, 2 * np.pi, 13)[:-1]
        rx = 5 * np.cos(theta) + RNG.uniform(-1, 1, 12)
        ry = 5 * np.sin(theta) + RNG.uniform(-1, 1, 12)
        px = RNG.uniform(-7, 7, 2000)
        py = RNG.uniform(-7, 7, 2000)
        fast = points_in_ring(px, py, rx, ry)
        for i in range(2000):
            assert fast[i] == point_in_ring_slow(px[i], py[i], rx, ry)


class TestDouglasPeucker:
    """Pin the breadth-first vectorized DP engine to the recursive
    textbook oracle point-for-point (exact big-int split test, first-
    point tie-break, degenerate zero-length chords)."""

    def _mask(self, tracks, eps):
        from skyway_ray.functions.simplify import dp_keep_mask
        xs = np.concatenate([np.asarray(t[0], np.int64) for t in tracks])
        ys = np.concatenate([np.asarray(t[1], np.int64) for t in tracks])
        first = np.zeros(len(xs), bool)
        first[np.cumsum([0] + [len(t[0]) for t in tracks[:-1]])] = True
        return dp_keep_mask(xs, ys, first, eps)

    def test_matches_reference_planted(self):
        from skyway_ray.functions.simplify import dp_reference
        tracks = [
            # zigzag well above tolerance: everything kept
            ([0, 10, 20, 30, 40], [0, 50, 0, 50, 0]),
            # exactly collinear run: interior dropped
            ([0, 10, 20, 30], [0, 10, 20, 30]),
            # single point / two points
            ([5], [5]),
            ([0, 100], [0, 7]),
            # duplicate coincident points (zero-length chord fallback)
            ([0, 0, 0, 0], [0, 0, 0, 0]),
            ([0, 0, 9, 0], [0, 0, 9, 0]),
            # tie: two symmetric extremes equidistant from the chord —
            # the FIRST must win
            ([0, 10, 20, 30, 40], [0, 8, 0, -8, 0]),
            # below tolerance: interior dropped
            ([0, 10, 20], [0, 3, 0]),
        ]
        for eps in (0, 4, 8, 1000):
            got = self._mask(tracks, eps)
            ofs = 0
            for xs, ys in tracks:
                want = dp_reference(list(xs), list(ys), eps)
                assert list(got[ofs:ofs + len(xs)]) == want, (xs, ys, eps)
                ofs += len(xs)

    def test_matches_reference_random(self):
        from skyway_ray.functions.simplify import dp_reference
        rng = np.random.default_rng(42)
        tracks = []
        for n in [2, 3, 5, 17, 64, 257]:
            tracks.append((rng.integers(-180_000_000, 180_000_000, n),
                           rng.integers(-60_000_000, 60_000_000, n)))
            # clustered walk (realistic small steps, many sub-eps wiggles)
            steps = rng.integers(-2_000_000, 2_000_000, (n, 2))
            tracks.append((np.cumsum(steps[:, 0]), np.cumsum(steps[:, 1])))
        eps = 5_000_000
        got = self._mask(tracks, eps)
        ofs = 0
        for xs, ys in tracks:
            want = dp_reference([int(v) for v in xs],
                                [int(v) for v in ys], eps)
            assert list(got[ofs:ofs + len(xs)]) == want
            ofs += len(xs)

    def test_query_matches_reference_sf(self, ray_session):
        """q_douglas_peucker on sf0.001 equals the recursive oracle
        computed per user straight from the parquet."""
        import pyarrow.parquet as pq
        from skyway_ray.functions.simplify import dp_reference
        from skyway_ray.queries import (_DP_EPS_MICRO, derive_latlon,
                                        q_douglas_peucker)

        sf = "/root/testdata/sf0.001"
        got = (q_douglas_peucker(sf).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
        t = pq.read_table(f"{sf}/events.parquet",
                          columns=["event_id", "ts", "user_id"]).to_pandas()
        t["t"] = t["ts"].astype("int64")
        lat, lon = derive_latlon(t["event_id"].to_numpy())
        t["x"] = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        t["y"] = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        t = t.sort_values(["user_id", "t", "event_id"])
        rows = []
        for uid, g in t.groupby("user_id", sort=True):
            keep = dp_reference([int(v) for v in g["x"]],
                                [int(v) for v in g["y"]], _DP_EPS_MICRO)
            ev = g["event_id"].to_numpy().astype(np.int64)
            rows.append((uid, len(g), int(np.sum(keep)),
                         int(ev[np.asarray(keep)].sum())))
        want = __import__("pandas").DataFrame(
            rows, columns=["user_id", "n_points", "n_kept",
                           "kept_checksum"])
        assert len(got) == len(want)
        for c in want.columns:
            assert (got[c].to_numpy().astype(np.int64)
                    == want[c].to_numpy().astype(np.int64)).all(), c
