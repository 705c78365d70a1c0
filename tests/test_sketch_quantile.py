"""Deterministic mergeable quantile sketch: error bounds, exactness
at small n, merge-order robustness, serialization round-trip."""

import numpy as np
import pytest

from skyway_ray.functions.sketch_quantile import DEFAULT_K, QuantileSketch

QS = (0.01, 0.25, 0.5, 0.9, 0.99)


def _rank_err(data: np.ndarray, q: float, est: float) -> int:
    s = np.sort(data)
    target = int(np.ceil(q * len(s)))
    lo = np.searchsorted(s, est, side="left")
    hi = np.searchsorted(s, est, side="right")
    if lo <= target <= hi:  # est's duplicate run covers the target rank
        return 0
    return int(min(abs(target - lo), abs(target - hi)))


DISTS = {
    "uniform": lambda rng, n: rng.random(n),
    "zipf-ish": lambda rng, n: 1.0 / (1 + rng.integers(0, 1000, n)),
    "sorted": lambda rng, n: np.arange(n, dtype=np.float64),
    "reverse": lambda rng, n: np.arange(n, 0, -1).astype(np.float64),
    "lognormal": lambda rng, n: rng.lognormal(0.0, 2.0, n),
    "constant-heavy": lambda rng, n: np.where(
        rng.random(n) < 0.7, 42.0, rng.random(n)),
}


@pytest.mark.parametrize("dist", sorted(DISTS))
def test_error_bound(dist):
    rng = np.random.default_rng(42)
    data = DISTS[dist](rng, 200_000)
    sk = QuantileSketch()
    for chunk in np.array_split(data, 37):  # uneven shards
        sk.update(chunk)
    assert sk.n() == len(data)
    bound = sk.error_bound()
    assert bound <= len(data) * 0.05  # k=512 keeps ε under 5% here
    for q in QS:
        err = _rank_err(data, q, float(sk.quantile(q)[0]))
        assert err <= bound, (dist, q, err, bound)


def test_exact_when_small():
    rng = np.random.default_rng(1)
    data = rng.random(DEFAULT_K)  # fits level 0: no compaction
    sk = QuantileSketch().update(data)
    s = np.sort(data)
    for q in QS:
        tgt = s[int(np.ceil(q * len(s))) - 1]
        assert float(sk.quantile(q)[0]) == tgt


def test_merge_order_and_roundtrip():
    rng = np.random.default_rng(7)
    data = rng.lognormal(0, 1, 120_000)
    shards = np.array_split(data, 16)

    def build(order):
        parts = [QuantileSketch().update(shards[i]) for i in order]
        # pairwise tree merge
        while len(parts) > 1:
            parts = [parts[i].merge(parts[i + 1])
                     if i + 1 < len(parts) else parts[i]
                     for i in range(0, len(parts), 2)]
        return parts[0]

    for order in (range(16), reversed(range(16))):
        sk = build(list(order))
        assert sk.n() == len(data)
        bound = sk.error_bound()
        for q in QS:
            assert _rank_err(data, q, float(sk.quantile(q)[0])) <= bound

    sk = build(list(range(16)))
    lvs, vs = sk.dump()
    sk2 = QuantileSketch.load(lvs, vs)
    assert sk2.n() == sk.n()
    for q in QS:
        # reload re-compacts; stay within the (slightly looser) bound
        assert _rank_err(data, q, float(sk2.quantile(q)[0])) \
            <= 2 * sk.error_bound()


def test_empty_and_single():
    sk = QuantileSketch()
    assert np.isnan(sk.quantile(0.5)).all()
    sk.update(np.array([3.0]))
    assert float(sk.quantile(0.99)[0]) == 3.0
    assert sk.n() == 1


def test_kll_query_vs_exact(ray_session):
    """The distributed sketch query's estimates stay within the
    deterministic rank-error bound of DuckDB's exact quantiles."""
    import duckdb

    from skyway_ray.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["kll_quantiles"](sf)
    exact = duckdb.sql(
        f"SELECT value FROM read_parquet('{sf}/events.parquet') "
        "ORDER BY value").df()["value"].to_numpy()
    for _, row in out.iterrows():
        assert _rank_err(exact, row["q"], row["value_est"]) \
            <= row["rank_err_bound"]
    assert (out["n"] == len(exact)).all()
