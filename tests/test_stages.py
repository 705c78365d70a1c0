"""Stage tests against pure-Python oracles (FIXTURES.md §4 goldens)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from skyway_ray.fixtures import (
    ensure_boundaries_parquet, ensure_images_parquet, make_boundaries,
    make_images,
)
from skyway_ray.geo.geotag import latlon_from_phash
from skyway_ray.geo.pip import point_in_ring_slow
from skyway_ray.geo.tiles import tile_xy
from skyway_ray.stages.pip_join import BoundaryIndex, PIPJoiner
from skyway_ray.stages.knn import CellKnnIndex


@pytest.fixture(scope="module")
def images():
    return make_images(1000)


@pytest.fixture(scope="module")
def boundaries():
    return make_boundaries(50)


def _oracle_pairs(images, boundaries):
    """Golden join pairs via the scalar oracle."""
    lat, lon = latlon_from_phash(images["phash"].to_numpy())
    lons = boundaries["ring_lon"].to_pylist()
    lats = boundaries["ring_lat"].to_pylist()
    pairs = set()
    for i in range(images.num_rows):
        for j in range(boundaries.num_rows):
            if point_in_ring_slow(lon[i], lat[i], lons[j], lats[j]):
                pairs.add((i, j))
    return pairs


class TestBoundaryIndex:
    def test_matches_oracle(self, images, boundaries):
        idx = BoundaryIndex(boundaries)
        lat, lon = latlon_from_phash(images["phash"].to_numpy())
        p, r = idx.match(lon, lat)
        got = set(zip(p.tolist(), r.tolist()))
        assert got == _oracle_pairs(images, boundaries)

    def test_hot_region_gets_skew_cluster(self, images, boundaries):
        idx = BoundaryIndex(boundaries)
        lat, lon = latlon_from_phash(images["phash"].to_numpy())
        p, r = idx.match(lon, lat)
        # region 0 is the hot region around the skew cluster (~10% of rows)
        hot = (r == 0).sum()
        assert hot >= 80


class TestPIPJoinerModes:
    def test_modes_consistent(self, images, boundaries):
        import pyarrow.parquet  # noqa: F401

        lat, lon = latlon_from_phash(images["phash"].to_numpy())
        batch = images.append_column("lat", pa.array(lat)).append_column(
            "lon", pa.array(lon))
        inner = PIPJoiner(boundaries_table=boundaries, mode="inner")(batch)
        semi = PIPJoiner(boundaries_table=boundaries, mode="semi")(batch)
        anti = PIPJoiner(boundaries_table=boundaries, mode="anti")(batch)
        left = PIPJoiner(boundaries_table=boundaries, mode="left")(batch)
        assert semi.num_rows + anti.num_rows == batch.num_rows
        assert inner.num_rows >= semi.num_rows
        assert left.num_rows == inner.num_rows + anti.num_rows
        assert set(semi["image_id"].to_pylist()) == set(inner["image_id"].to_pylist())
        # multi-match duplicates exist (overlapping region pairs)
        ids = inner["image_id"].to_pylist()
        assert len(ids) > len(set(ids))


class TestKnn:
    def test_exact_vs_bruteforce(self):
        rng = np.random.default_rng(5)
        n = 4000
        lat = rng.uniform(-60, 60, n)
        lon = rng.uniform(-180, 180, n)
        ids = np.arange(n)
        index = CellKnnIndex(lat, lon, ids, res=6)
        k = 7
        for qi in range(40):
            qlat, qlon = float(lat[qi] + 0.3), float(lon[qi] - 0.2)
            got_ids, got_d2 = index.query_one(qlat, qlon, k)
            d2 = (lat - qlat) ** 2 + (lon - qlon) ** 2
            want = np.lexsort((ids, d2))[:k]
            assert list(got_ids) == list(ids[want])
            assert np.allclose(got_d2, d2[want])

    def test_fewer_than_k(self):
        index = CellKnnIndex(np.array([1.0, 2.0]), np.array([1.0, 2.0]),
                             np.array([10, 20]), res=7)
        ids, d2 = index.query_one(0.0, 0.0, 5)
        assert list(ids) == [10, 20]

    def test_query_batch_equals_query_one(self):
        """The bulk vectorized disk-1 phase must agree with the exact
        per-probe ring expansion on every probe (dense AND sparse
        regions, so both the resolved and fallback paths fire)."""
        rng = np.random.default_rng(11)
        lat = np.concatenate([rng.uniform(-60, 60, 3000),
                              rng.uniform(10.0, 10.5, 3000)])  # dense patch
        lon = np.concatenate([rng.uniform(-180, 180, 3000),
                              rng.uniform(20.0, 20.5, 3000)])
        ids = np.arange(len(lat))
        index = CellKnnIndex(lat, lon, ids, res=6)
        qlat = np.concatenate([lat[:40] + 0.01, rng.uniform(-60, 60, 20)])
        qlon = np.concatenate([lon[:40] - 0.01, rng.uniform(-180, 180, 20)])
        out = index.query_batch(qlat, qlon, 5).to_pandas()
        for i in range(len(qlat)):
            want_ids, want_d2 = index.query_one(float(qlat[i]),
                                                float(qlon[i]), 5)
            got = out[out["probe_id"] == i]
            assert got["neighbor_id"].tolist() == list(want_ids), f"probe {i}"
            assert np.allclose(got["dist2"].to_numpy(), want_d2)


class TestRayStages:
    def test_flagship_smoke(self, ray_session):
        from skyway_ray.pipelines.flagship import flagship_pipeline, flagship_join

        images_path = ensure_images_parquet("smoke")
        boundaries_path = ensure_boundaries_parquet(50)
        stats = flagship_pipeline(images_path, boundaries_path, z=7).to_pandas()
        assert len(stats) > 0
        assert set(stats.columns) == {"tile_z", "tile_x", "tile_y", "n_images"}
        # total joined rows match the golden pair count for filtered regions
        joined = flagship_join(images_path, boundaries_path).to_pandas()
        assert stats["n_images"].sum() == len(joined)
        # tile assignment equals direct computation
        lat, lon = latlon_from_phash(joined["phash"].to_numpy())
        # joined dropped phash? it kept all columns (columns=None)
        tx, ty = tile_xy(joined["lat"].to_numpy(), joined["lon"].to_numpy(), 12)
        assert (joined["tile_x"].to_numpy() == tx).all()
        assert (joined["tile_y"].to_numpy() == ty).all()

    def test_join_golden_and_row_invariant(self, ray_session):
        """Row-for-row join golden + per-row invariant (decoded-pixel
        PSNR >= 40dB / exact for png, caption equality)."""
        from skyway_ray.fixtures import _gen_pixels
        from skyway_ray.functions.image_codec import decode_image, psnr
        from skyway_ray.pipelines.flagship import (
            flagship_join, load_filtered_boundaries)

        images_path = ensure_images_parquet("smoke")
        boundaries_path = ensure_boundaries_parquet(50)
        joined = flagship_join(images_path, boundaries_path).to_pandas()

        images = make_images(1000)
        fb = load_filtered_boundaries(boundaries_path)
        golden = _oracle_pairs(images, fb)
        got = set()
        id_to_i = {f"img_{i:012d}": i for i in range(1000)}
        rid_to_j = {rid: j for j, rid in enumerate(fb["region_id"].to_pylist())}
        for iid, rid in zip(joined["image_id"], joined["region_id"]):
            got.add((id_to_i[iid], rid_to_j[rid]))
        assert got == golden
        assert len(joined) == len(golden)  # no dup pairs

        # per-row invariant on EVERY emitted row (input_hint: decoded-
        # pixel allclose, PSNR >= 40 dB for lossy, caption equality)
        caps = {images["image_id"][i].as_py(): images["caption"][i].as_py()
                for i in range(1000)}
        for _, row in joined.iterrows():
            i = id_to_i[row["image_id"]]
            assert row["caption"] == caps[row["image_id"]]
            img = decode_image(row["bytes"], row["fmt"])
            ref_img = _gen_pixels(i, row["w"])
            if row["fmt"] == "png":
                assert (img == ref_img).all()
            else:
                assert psnr(img, ref_img) >= 40.0

    def test_exact_dedup(self, ray_session):
        import ray.data
        from skyway_ray.stages.dedup import exact_dedup, exact_dedup_projected

        images_path = ensure_images_parquet("smoke")
        ds = ray.data.read_parquet(images_path)
        out = exact_dedup(ds, key="phash", order_col="image_id").to_pandas()
        t = make_images(1000).to_pandas()
        want = t.sort_values("image_id").groupby("phash", as_index=False).first()
        assert len(out) == len(want)
        assert set(out["image_id"]) == set(want["image_id"])
        out2 = exact_dedup_projected(
            ray.data.read_parquet(images_path), "phash", "image_id").to_pandas()
        assert set(out2["image_id"]) == set(want["image_id"])

    def test_top_k(self, ray_session):
        import ray.data
        from skyway_ray.stages.topk import top_k

        images_path = ensure_images_parquet("smoke")
        ds = ray.data.read_parquet(images_path, columns=["image_id", "phash"])
        got = top_k(ds, "phash", 10, descending=True,
                    tiebreak_col="image_id").to_pandas()
        t = make_images(1000).to_pandas()
        want = t.sort_values(["phash", "image_id"],
                             ascending=[False, True]).head(10)
        assert got["image_id"].tolist() == want["image_id"].tolist()

    def test_sharded_knn_matches_broadcast(self, ray_session):
        """The sharded scale path (coarse-cell object-store shards,
        ring-expansion fetch) returns exactly the broadcast index's
        results."""
        import ray
        import ray.data
        from skyway_ray.stages.knn import (
            CellKnnIndex, ShardedKnnStage, build_sharded_knn)

        rng = np.random.default_rng(9)
        n = 20_000
        lat = rng.uniform(-60, 60, n)
        lon = rng.uniform(-180, 180, n)
        ids = np.arange(n, dtype=np.int64)
        ref_table = pa.table({"image_id": ids, "lat": lat, "lon": lon})
        directory_ref, cres = build_sharded_knn(
            ray.data.from_arrow(ref_table).repartition(8), coarse_res=4)
        probes = pa.table({"image_id": ids[:200],
                           "lat": lat[:200] + 0.05, "lon": lon[:200] - 0.05})
        out = (ray.data.from_arrow(probes)
               .map_batches(ShardedKnnStage,
                            fn_constructor_kwargs=dict(
                                directory_ref=directory_ref, coarse_res=cres,
                                k=5),
                            batch_format="pyarrow", concurrency=2)
               ).to_pandas()
        index = CellKnnIndex(lat, lon, ids, res=6)
        for i in range(200):
            want_ids, _ = index.query_one(float(lat[i] + 0.05),
                                          float(lon[i] - 0.05), 5)
            got = out[out["probe_id"] == i].sort_values("rank")
            assert got["neighbor_id"].tolist() == list(want_ids), f"probe {i}"

    def test_knn_stage(self, ray_session):
        import ray
        import ray.data
        from skyway_ray.stages.knn import KnnStage
        from skyway_ray.stages.geotag import add_geotag

        images = make_images(500)
        lat, lon = latlon_from_phash(images["phash"].to_numpy())
        ref_table = pa.table({
            "image_id": images["image_id"], "lat": pa.array(lat),
            "lon": pa.array(lon)})
        ref = ray.put(ref_table)
        probes = ray.data.from_arrow(ref_table.slice(0, 20))
        out = probes.map_batches(
            KnnStage, fn_constructor_kwargs=dict(ref_table_ref=ref, k=3),
            batch_format="pyarrow", concurrency=2).to_pandas()
        assert len(out) == 60
        # each probe's rank-1 neighbor is itself (dist 0)
        r1 = out[out["rank"] == 1]
        assert (r1["probe_id"] == r1["neighbor_id"]).all()


class TestBloomSemiJoin:
    def test_no_false_drops(self, ray_session):
        import ray.data
        from skyway_ray.stages.joins import bloom_semi_join, broadcast_semi_join

        rng = np.random.default_rng(4)
        vals = rng.integers(0, 1_000_000, 20_000)
        keys = rng.choice(vals, 500, replace=False)
        ds = ray.data.from_arrow(pa.table({"k": vals})).repartition(4)
        exact = set(broadcast_semi_join(ds, keys, on="k").to_pandas()["k"])
        approx = set(bloom_semi_join(
            ray.data.from_arrow(pa.table({"k": vals})).repartition(4),
            keys, on="k").to_pandas()["k"])
        assert exact <= approx                       # zero false drops
        non_keys = len(set(vals.tolist()) - exact)
        fp_rate = len(approx - exact) / max(1, non_keys)
        assert fp_rate < 0.03                        # ~1% theoretical FP


class TestBloomDedup:
    def test_matches_exact_dedup(self, ray_session):
        import ray.data

        from skyway_ray.stages.dedup import exact_dedup, exact_dedup_bloom

        rng = np.random.default_rng(11)
        n = 2000
        keys = rng.integers(0, 1500, n)  # ~30% keys duplicated
        tab = pa.table({"phash": keys.astype(np.int64),
                        "image_id": np.arange(n, dtype=np.int64),
                        "payload": rng.integers(0, 99, n)})
        ds = ray.data.from_arrow(tab).repartition(4)
        want = exact_dedup(ds, "phash", "image_id").to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        got = exact_dedup_bloom(
            ray.data.from_arrow(tab).repartition(4),
            "phash", "image_id").to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        assert got[sorted(got.columns)].equals(want[sorted(want.columns)])

    def test_no_duplicates_passthrough(self, ray_session):
        import ray.data

        from skyway_ray.stages.dedup import exact_dedup_bloom

        tab = pa.table({"phash": np.arange(100, dtype=np.int64),
                        "image_id": np.arange(100, dtype=np.int64)})
        ds = ray.data.from_arrow(tab)
        assert exact_dedup_bloom(ds, "phash", "image_id").count() == 100

    def test_string_keys(self, ray_session):
        import ray.data

        from skyway_ray.stages.dedup import exact_dedup_bloom

        tab = pa.table({"text": ["a", "b", "a", "c", "b", "d"],
                        "doc_id": np.arange(6, dtype=np.int64)})
        out = exact_dedup_bloom(
            ray.data.from_arrow(tab).repartition(2),
            "text", "doc_id").to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 3, 5]


class TestTileMergeRouting:
    def test_resolve_merge_policy(self):
        from skyway_ray.stages.tiling import resolve_merge

        # benchmarked z=12: 4^12 >> 2^16 -> distributed tree, no driver loop
        assert resolve_merge(12) == "tree"
        assert resolve_merge(8) == "tree"
        # small key spaces on a single node: driver streaming reduce
        assert resolve_merge(6) == "driver"
        # explicit override wins
        assert resolve_merge(12, "driver") == "driver"
        assert resolve_merge(3, "tree") == "tree"

    def test_tree_and_driver_agree(self, ray_session):
        import ray.data

        from skyway_ray.stages.tiling import tile_stats

        rng = np.random.default_rng(2)
        tab = pa.table({"lat": rng.uniform(-60, 60, 20000),
                        "lon": rng.uniform(-170, 170, 20000)})
        ds = ray.data.from_arrow(tab).repartition(4)
        a = tile_stats(ds, z=9, merge="tree").to_pandas() \
            .sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
        ds2 = ray.data.from_arrow(tab).repartition(4)
        b = tile_stats(ds2, z=9, merge="driver").to_pandas() \
            .sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
        assert a[sorted(a.columns)].equals(b[sorted(b.columns)])


class TestGroupedTopK:
    def test_matches_window_oracle(self, ray_session):
        import ray.data

        from skyway_ray.stages.topk import grouped_top_k

        rng = np.random.default_rng(3)
        n = 5000
        tab = pa.table({
            "g": rng.integers(0, 20, n),
            "v": rng.integers(0, 10_000, n),   # int values: exact ties
            "id": np.arange(n, dtype=np.int64)})
        ds = ray.data.from_arrow(tab).repartition(6)
        got = grouped_top_k(ds, "g", "v", 3, descending=True,
                            tiebreak_col="id").to_pandas()
        df = tab.to_pandas()
        want = (df.sort_values(["g", "v", "id"],
                               ascending=[True, False, True])
                .groupby("g").head(3))
        key = ["g", "v", "id"]
        assert (got.sort_values(key).reset_index(drop=True)[key]
                .equals(want.sort_values(key).reset_index(drop=True)[key]))

    def test_small_groups(self, ray_session):
        import ray.data

        from skyway_ray.stages.topk import grouped_top_k

        tab = pa.table({"g": [1, 1, 2], "v": [5, 9, 1],
                        "id": np.arange(3, dtype=np.int64)})
        got = grouped_top_k(ray.data.from_arrow(tab), "g", "v", 5,
                            tiebreak_col="id").to_pandas()
        assert len(got) == 3


class TestRangeJoin:
    def _oracle(self, big, iv, on="x"):
        import pandas as pd

        rows = []
        for _, r in big.iterrows():
            for _, b in iv.iterrows():
                if b["lo"] <= r[on] < b["hi"]:
                    rows.append({**r.to_dict(), **b.to_dict()})
        return pd.DataFrame(rows)

    def test_overlapping_bands_match_oracle(self, ray_session):
        import pandas as pd
        import ray.data

        from skyway_ray.stages.joins import broadcast_range_join

        rng = np.random.default_rng(3)
        big = pd.DataFrame({"rid": np.arange(400, dtype=np.int64),
                            "x": rng.uniform(0, 100, 400)})
        # overlapping + disjoint + boundary-exact intervals
        iv = pd.DataFrame({
            "band_id": np.arange(8, dtype=np.int64),
            "lo": np.array([0.0, 5.0, 5.0, 20.0, 20.0, 50.0, 90.0, 150.0]),
            "hi": np.array([10.0, 15.0, 30.0, 25.0, 60.0, 55.0, 95.0, 160.0]),
        })
        big.loc[0, "x"] = 5.0    # == lo of two bands, inside band 0
        big.loc[1, "x"] = 10.0   # == hi of band 0 (excluded), inside 1,2
        ds = ray.data.from_pandas(big).repartition(3)
        got = broadcast_range_join(ds, iv, on="x").to_pandas()
        want = self._oracle(big, iv)
        key = ["rid", "band_id"]
        g = got[key].sort_values(key).reset_index(drop=True)
        w = want[key].astype(np.int64).sort_values(key).reset_index(drop=True)
        assert g.equals(w)

    def test_left_join_keeps_unmatched(self, ray_session):
        import pandas as pd
        import ray.data

        from skyway_ray.stages.joins import broadcast_range_join

        big = pd.DataFrame({"rid": [0, 1, 2], "x": [1.0, 100.0, 5.0]})
        iv = pd.DataFrame({"band_id": [7], "lo": [0.0], "hi": [10.0]})
        got = broadcast_range_join(
            ray.data.from_pandas(big), iv, on="x", how="left").to_pandas()
        assert len(got) == 3
        miss = got[got["rid"] == 1]
        assert len(miss) == 1 and np.isnan(miss["band_id"].iloc[0])


class TestKeyedScan:
    def _events(self, n=500, seed=9):
        import pandas as pd

        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, 37, n),
            "t": rng.integers(0, 10_000, n),
            "v": rng.integers(-50, 50, n),
        })

    def test_running_sum_matches_pandas(self, ray_session):
        import ray.data

        from skyway_ray.stages.scan import running_sum

        df = self._events()
        ds = ray.data.from_pandas(df).repartition(5)
        got = running_sum(ds, key="k", order=["t", "id"], val="v",
                          keep=["id"], n_buckets=7).to_pandas()
        d = df.sort_values(["k", "t", "id"], kind="mergesort")
        want = d.assign(running_sum=d.groupby("k")["v"].cumsum())
        m = got.sort_values("id").reset_index(drop=True)
        w = want[["id", "running_sum"]].sort_values("id").reset_index(drop=True)
        assert m[["id", "running_sum"]].equals(w)

    def test_keyed_lag_matches_pandas(self, ray_session):
        import ray.data

        from skyway_ray.stages.scan import keyed_lag

        df = self._events(seed=11)
        ds = ray.data.from_pandas(df).repartition(4)
        got = keyed_lag(ds, key="k", order=["t", "id"], val="v",
                        out_col="prev_v", fill=-999, keep=["id"],
                        n_buckets=5).to_pandas()
        d = df.sort_values(["k", "t", "id"], kind="mergesort")
        want = d.assign(prev_v=d.groupby("k")["v"].shift(1).fillna(-999)
                        .astype(np.int64))
        m = got.sort_values("id").reset_index(drop=True)
        w = want[["id", "prev_v"]].sort_values("id").reset_index(drop=True)
        assert m[["id", "prev_v"]].equals(w)

    def test_auto_n_buckets_scales_with_rows(self):
        from skyway_ray.stages.scan import ROWS_PER_BUCKET, auto_n_buckets

        assert auto_n_buckets(0) == 32
        assert auto_n_buckets(ROWS_PER_BUCKET * 32) == 32
        # 1000x the data -> 1000x the buckets (fixed per-bucket budget)
        assert auto_n_buckets(ROWS_PER_BUCKET * 32 * 1000) == 32_000
        assert auto_n_buckets(10_000, rows_per_bucket=100) == 100

    def test_keyed_scan_auto_buckets_tiny_budget(self, ray_session):
        """A deliberately tiny per-bucket budget multiplies the bucket
        count (auto-scaling path) and the scan result is unchanged."""
        import ray.data

        from skyway_ray.stages.scan import running_sum

        df = self._events(n=2000, seed=13)
        ds = ray.data.from_pandas(df).repartition(5)
        got = running_sum(ds, key="k", order=["t", "id"], val="v",
                          keep=["id"], n_buckets=None, n_rows=len(df),
                          rows_per_bucket=10).to_pandas()
        d = df.sort_values(["k", "t", "id"], kind="mergesort")
        want = d.assign(running_sum=d.groupby("k")["v"].cumsum())
        m = got.sort_values("id").reset_index(drop=True)
        w = want[["id", "running_sum"]].sort_values("id").reset_index(drop=True)
        assert m[["id", "running_sum"]].equals(w)


class TestCountDistinct:
    def test_matches_pandas_nunique(self, ray_session):
        import pandas as pd
        import ray.data

        from skyway_ray.stages.agg_tree import grouped_count_distinct

        rng = np.random.default_rng(2)
        df = pd.DataFrame({"g": rng.choice(list("abcd"), 3000),
                           "u": rng.integers(0, 200, 3000)})
        ds = ray.data.from_pandas(df).repartition(6)
        got = grouped_count_distinct(ds, "g", "u", out_col="n").to_pandas()
        want = (df.groupby("g")["u"].nunique().rename("n")
                .reset_index().rename(columns={"g": "g"}))
        g = got.sort_values("g").reset_index(drop=True)
        w = want.sort_values("g").reset_index(drop=True)
        assert list(g["g"]) == list(w["g"])
        assert list(g["n"]) == list(w["n"])


class TestExactQuantiles:
    def test_matches_sorted_ranks(self, ray_session):
        import pandas as pd
        import ray.data

        from skyway_ray.stages.quantiles import exact_quantiles

        rng = np.random.default_rng(4)
        x = rng.lognormal(3, 1.5, 20_000)
        ds = ray.data.from_pandas(pd.DataFrame({"x": x})).repartition(8)
        qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
        got = exact_quantiles(ds, "x", qs)
        xs = np.sort(x)
        for q, v in zip(got["q"], got["value"]):
            assert v == xs[int(np.floor(q * (len(x) - 1)))]

    def test_refinement_rounds_and_duplicates(self, ray_session):
        """Tiny collect_limit forces multi-round refinement; heavy
        duplicate mass exercises rank arithmetic across equal runs."""
        import pandas as pd
        import ray.data

        from skyway_ray.stages.quantiles import exact_quantiles

        rng = np.random.default_rng(8)
        x = np.concatenate([
            np.full(5000, 42.0),
            rng.integers(0, 50, 4000).astype(np.float64),
            rng.uniform(40, 45, 1000),
        ])
        rng.shuffle(x)
        ds = ray.data.from_pandas(pd.DataFrame({"x": x})).repartition(7)
        qs = [0.1, 0.5, 0.6, 0.95]
        got = exact_quantiles(ds, "x", qs, sample_limit=64,
                              collect_limit=200)
        xs = np.sort(x)
        for q, v in zip(got["q"], got["value"]):
            assert v == xs[int(np.floor(q * (len(x) - 1)))]

    def test_all_equal_column(self, ray_session):
        import pandas as pd
        import ray.data

        from skyway_ray.stages.quantiles import exact_quantiles

        ds = ray.data.from_pandas(
            pd.DataFrame({"x": np.full(1000, 7.5)})).repartition(3)
        got = exact_quantiles(ds, "x", [0.5], sample_limit=16,
                              collect_limit=10)
        assert list(got["value"]) == [7.5]


class TestSetOps:
    def test_intersect_and_except_match_pandas(self, ray_session):
        import pandas as pd
        import ray.data

        from skyway_ray.stages.setops import keyed_set_op

        rng = np.random.default_rng(13)
        a = pd.DataFrame({"k": rng.integers(0, 60, 300)})
        b = pd.DataFrame({"k": rng.integers(30, 90, 300)})
        dsa = ray.data.from_pandas(a).repartition(4)
        dsb = ray.data.from_pandas(b).repartition(3)
        sa, sb = set(a["k"]), set(b["k"])
        inter = sorted(keyed_set_op(dsa, dsb, "k").to_pandas()["k"])
        assert inter == sorted(sa & sb)
        exc = sorted(keyed_set_op(dsa, dsb, "k", op="except")
                     .to_pandas()["k"])
        assert exc == sorted(sa - sb)

    def test_string_keys_and_empty_side(self, ray_session):
        import pandas as pd
        import ray.data

        from skyway_ray.stages.setops import keyed_set_op

        a = pd.DataFrame({"k": ["x", "y", "z", "x"]})
        b = pd.DataFrame({"k": pd.Series([], dtype=str)})
        dsa, dsb = ray.data.from_pandas(a), ray.data.from_pandas(b)
        assert sorted(keyed_set_op(dsa, dsb, "k", op="except")
                      .to_pandas()["k"]) == ["x", "y", "z"]
        assert len(keyed_set_op(dsa, dsb, "k").to_pandas()) == 0


class TestPivot:
    def test_pivot_counts_matches_crosstab(self, ray_session):
        import pandas as pd
        import ray.data

        from skyway_ray.stages.setops import pivot_counts

        rng = np.random.default_rng(14)
        vals = ["a", "b", "c"]
        df = pd.DataFrame({"g": rng.integers(0, 9, 2000),
                           "c": rng.choice(vals + ["other"], 2000)})
        ds = ray.data.from_pandas(df).repartition(5)
        got = (pivot_counts(ds, "g", "c", vals).to_pandas()
               .sort_values("g").reset_index(drop=True))
        ct = pd.crosstab(df["g"], df["c"])
        for v in vals:
            want = ct[v] if v in ct else 0
            assert list(got[f"n_{v}"]) == list(want)


class TestHeavyHitters:
    def _skewed(self, n=200_000, keys=5000, seed=42):
        rng = np.random.default_rng(seed)
        p = 1.0 / np.arange(1, keys + 1) ** 1.3
        p /= p.sum()
        items = rng.choice(np.array([f"k{i}" for i in range(keys)],
                                    dtype=object), size=n, p=p)
        return pd.DataFrame({"item": items.astype(str)})

    def test_exact_under_forced_compression(self, ray_session):
        import ray.data

        from skyway_ray.stages.heavy import exact_heavy_hitters

        df = self._skewed()
        # default k=1000 < 5000 distinct per block -> every block compresses
        ds = ray.data.from_pandas(df).repartition(16)
        got = (exact_heavy_hitters(ds, "item", 1, 500).to_pandas()
               .sort_values("item").reset_index(drop=True))
        vc = df["item"].value_counts()
        want = (vc[vc * 500 > len(df)].rename_axis("item")
                .reset_index(name="cnt").sort_values("item")
                .reset_index(drop=True).astype({"cnt": "int64"}))
        assert got.equals(want)
        assert len(got) > 10

    def test_partition_invariant(self, ray_session):
        import ray.data

        from skyway_ray.stages.heavy import exact_heavy_hitters

        df = self._skewed(n=50_000, keys=2000)
        outs = []
        for parts in (2, 9):
            ds = ray.data.from_pandas(df).repartition(parts)
            outs.append(exact_heavy_hitters(ds, "item", 1, 300)
                        .to_pandas().sort_values("item")
                        .reset_index(drop=True))
        assert outs[0].equals(outs[1])

    def test_tiny_k_raises_instead_of_lying(self, ray_session):
        import ray.data

        from skyway_ray.stages.heavy import exact_heavy_hitters

        ds = ray.data.from_pandas(self._skewed(n=20_000)).repartition(8)
        with pytest.raises(ValueError, match="too small"):
            exact_heavy_hitters(ds, "item", 1, 500, k=5).to_pandas()

    def test_no_heavy_hitters_on_flat_input(self, ray_session):
        import ray.data

        from skyway_ray.stages.heavy import exact_heavy_hitters

        flat = pd.DataFrame(
            {"item": np.char.add("u", np.arange(50_000).astype(str))})
        ds = ray.data.from_pandas(flat).repartition(4)
        out = exact_heavy_hitters(ds, "item", 1, 10, k=30_000).to_pandas()
        assert len(out) == 0

    def test_bigram_kernel(self):
        from skyway_ray.stages.heavy import bigram_items

        b = bigram_items(pd.DataFrame(
            {"text": ["Hello big world", "one", "", "a b"]}))
        assert list(b["item"]) == ["hello big", "big world", "a b"]
        empty = bigram_items(pd.DataFrame({"text": ["", "x"]}))
        assert len(empty) == 0


class TestHll:
    def test_error_bound_and_small_range(self, ray_session):
        import ray.data

        from skyway_ray.stages.hll import hll_distinct

        for true_n in (150, 10_000, 200_000):
            vals = np.char.add("user", np.arange(true_n).astype(str))
            reps = np.repeat(vals, 2) if true_n <= 10_000 else vals
            ds = ray.data.from_pandas(pd.DataFrame({"u": reps})).repartition(8)
            est = hll_distinct(ds, "u")
            # rse ~= 1.04/sqrt(2^14) = 0.8%; allow 3 sigma
            assert abs(est - true_n) / true_n < 0.025, (true_n, est)

    def test_partition_invariant(self, ray_session):
        import ray.data

        from skyway_ray.stages.hll import hll_distinct

        vals = np.char.add("x", np.arange(50_000).astype(str))
        ests = [hll_distinct(
            ray.data.from_pandas(pd.DataFrame({"u": vals})).repartition(n),
            "u") for n in (2, 13)]
        assert ests[0] == ests[1]

    def test_mergeable(self):
        import pyarrow as pa

        from skyway_ray.stages.hll import (_hash64, _register_blob,
                                           hll_merge)

        a = _register_blob(_hash64(pa.array([f"a{i}" for i in range(1000)])), 14)
        b = _register_blob(_hash64(pa.array([f"b{i}" for i in range(1000)])), 14)
        ab = _register_blob(_hash64(pa.array(
            [f"a{i}" for i in range(1000)] + [f"b{i}" for i in range(1000)])), 14)
        assert hll_merge(a.tobytes(), b.tobytes()) == ab.tobytes()

    def test_int_column(self, ray_session):
        import ray.data

        from skyway_ray.stages.hll import hll_distinct

        ds = ray.data.from_pandas(pd.DataFrame(
            {"u": np.arange(30_000, dtype=np.int64)})).repartition(4)
        est = hll_distinct(ds, "u")
        assert abs(est - 30_000) / 30_000 < 0.025


class TestProfile:
    def test_matches_pandas_with_nulls(self, ray_session):
        import ray.data

        from skyway_ray.stages.profile import profile_columns

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "a": pd.array(rng.integers(-50, 50, 5000), dtype="Int64"),
            "s": rng.choice(["x", "apple", "zebra", "m"], 5000),
        })
        df.loc[::7, "a"] = pd.NA  # nullable ints, dtype stays Int64
        ds = ray.data.from_pandas(df).repartition(6)
        got = profile_columns(ds, ["a", "s"]).set_index("column")
        assert got.loc["a", "n"] == 5000
        assert got.loc["a", "nulls"] == len(df.loc[::7])
        assert got.loc["a", "min_s"] == str(int(df["a"].min()))
        assert got.loc["a", "max_s"] == str(int(df["a"].max()))
        assert got.loc["s", "nulls"] == 0
        assert got.loc["s", "min_s"] == "apple"
        assert got.loc["s", "max_s"] == "zebra"

    def test_single_block(self, ray_session):
        import ray.data

        from skyway_ray.stages.profile import profile_columns

        ds = ray.data.from_pandas(pd.DataFrame({"v": [3, 1, 2]}))
        got = profile_columns(ds, ["v"])
        assert got.iloc[0].tolist() == ["v", 3, 0, "1", "3"]


class TestHllGrouped:
    def test_grouped_error_bound(self, ray_session):
        import ray.data

        from skyway_ray.stages.hll import hll_distinct_by

        rng = np.random.default_rng(0)
        df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 300_000),
                           "u": rng.integers(0, 50_000, 300_000)})
        exact = df.groupby("g")["u"].nunique()
        ds = ray.data.from_pandas(df).repartition(8)
        got = hll_distinct_by(ds, "g", "u").set_index("g")["n_distinct_est"]
        for k in exact.index:
            # rse ~= 1.04/sqrt(2^12) = 1.6%; allow 3 sigma
            assert abs(got[k] - exact[k]) / exact[k] < 0.05

    def test_grouped_partition_invariant(self, ray_session):
        import ray.data

        from skyway_ray.stages.hll import hll_distinct_by

        rng = np.random.default_rng(5)
        df = pd.DataFrame({"g": rng.choice(["x", "y"], 40_000),
                           "u": rng.integers(0, 5000, 40_000)})
        outs = [hll_distinct_by(
            ray.data.from_pandas(df).repartition(n), "g", "u")
            .sort_values("g").reset_index(drop=True) for n in (2, 11)]
        assert outs[0].equals(outs[1])


class TestSkewHybridJoin:
    @staticmethod
    def _dim(n=500):
        return pd.DataFrame({"d": np.arange(n, dtype=np.int64),
                             "name": [f"n{i}" for i in range(n)]})

    @staticmethod
    def _canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    def test_skewed_matches_plain_merge(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import skew_hybrid_join

        rng = np.random.default_rng(3)
        keys = rng.integers(0, 500, 60_000)
        keys[:18_000] = 7  # one viral key = 30% of rows
        rng.shuffle(keys)
        fact = pd.DataFrame({"k": keys.astype(np.int64),
                             "v": np.arange(60_000, dtype=np.int64)})
        dim = self._dim()
        out = skew_hybrid_join(
            ray.data.from_pandas(fact).repartition(8),
            ray.data.from_pandas(dim).repartition(4),
            "k", "d", phi_num=1, phi_den=10).to_pandas()
        want = fact.merge(dim, left_on="k", right_on="d").drop(columns=["d"])
        assert self._canon(out).equals(self._canon(want))

    def test_no_hot_keys_falls_back_to_plain_join(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import skew_hybrid_join

        fact = pd.DataFrame({"k": np.arange(2000, dtype=np.int64) % 500,
                             "v": np.arange(2000, dtype=np.int64)})
        dim = self._dim()
        out = skew_hybrid_join(
            ray.data.from_pandas(fact).repartition(4),
            ray.data.from_pandas(dim).repartition(2),
            "k", "d", phi_num=1, phi_den=100).to_pandas()
        want = fact.merge(dim, left_on="k", right_on="d").drop(columns=["d"])
        assert self._canon(out).equals(self._canon(want))

    def test_all_hot_skips_empty_cold_join(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import skew_hybrid_join

        # 3 keys, uniform: at phi=1/10 every key is hot -> cold side
        # fully empty, which Ray's shuffle join cannot take
        fact = pd.DataFrame({"k": np.arange(900, dtype=np.int64) % 3,
                             "v": np.arange(900, dtype=np.int64)})
        dim = self._dim(10)
        out = skew_hybrid_join(
            ray.data.from_pandas(fact).repartition(4),
            ray.data.from_pandas(dim).repartition(2),
            "k", "d", phi_num=1, phi_den=10).to_pandas()
        want = fact.merge(dim, left_on="k", right_on="d").drop(columns=["d"])
        assert self._canon(out).equals(self._canon(want))

    def test_hot_limit_guard(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import skew_hybrid_join

        fact = pd.DataFrame({"k": np.zeros(1000, dtype=np.int64)})
        # dim has MANY rows per key -> broadcast side unbounded
        dim = pd.DataFrame({"d": np.zeros(500, dtype=np.int64),
                            "name": [f"n{i}" for i in range(500)]})
        with pytest.raises(ValueError, match="hot_limit"):
            skew_hybrid_join(ray.data.from_pandas(fact).repartition(2),
                             ray.data.from_pandas(dim).repartition(2),
                             "k", "d", phi_num=1, phi_den=10,
                             hot_limit=100).to_pandas()


class TestBoxOverlapJoin:
    """PBSM rectangle join (stages/spatial_join.py)."""

    def _ds(self, rows):
        import ray.data

        t = pa.table({k: [r[i] for r in rows] for i, k in
                      enumerate(["id", "xmin", "ymin", "xmax", "ymax"])})
        return ray.data.from_arrow(t)

    def test_cross_cell_pairs_reported_once(self, ray_session):
        """Boxes spanning several grid cells join exactly once (the
        reference-point rule needs no post-dedup shuffle)."""
        from skyway_ray.stages.spatial_join import box_overlap_join

        # 20-degree-wide boxes over an 8-degree grid: covered cell
        # ranges overlap in multiple cells
        a = self._ds([(1, -10.0, -10.0, 10.0, 10.0),
                      (2, 50.0, 0.0, 70.0, 20.0)])
        b = self._ds([(10, -5.0, -5.0, 15.0, 15.0),
                      (20, 100.0, 0.0, 120.0, 20.0)])
        df = box_overlap_join(a, b).to_pandas()
        assert sorted(zip(df.id_a, df.id_b)) == [(1, 10)]

    def test_touching_edges_join_inclusive(self, ray_session):
        from skyway_ray.stages.spatial_join import box_overlap_join

        a = self._ds([(1, 0.0, 0.0, 4.0, 4.0)])
        b = self._ds([(10, 4.0, 4.0, 8.0, 8.0),   # corner touch
                      (20, 4.000001, 0.0, 8.0, 4.0)])  # just misses
        df = box_overlap_join(a, b).to_pandas()
        assert sorted(zip(df.id_a, df.id_b)) == [(1, 10)]

    def test_matches_bruteforce_random(self, ray_session):
        from skyway_ray.stages.spatial_join import box_overlap_join

        rng = np.random.default_rng(7)
        def boxes(n, seed_ids):
            x = rng.uniform(-170, 160, n); y = rng.uniform(-80, 70, n)
            w = rng.uniform(0.1, 12, n); h = rng.uniform(0.1, 12, n)
            return [(seed_ids + i, x[i], y[i], x[i] + w[i], y[i] + h[i])
                    for i in range(n)]
        ra, rb = boxes(150, 0), boxes(170, 1000)
        df = box_overlap_join(self._ds(ra), self._ds(rb)).to_pandas()
        got = sorted(zip(df.id_a, df.id_b))
        want = sorted((a[0], b[0]) for a in ra for b in rb
                      if a[1] <= b[3] and b[1] <= a[3]
                      and a[2] <= b[4] and b[2] <= a[4])
        assert got == want


class TestPercentileCont:
    def test_interpolation_matches_numpy(self, ray_session):
        """percentile_cont == numpy's 'linear' percentile on raw data
        (same h = q*(n-1) definition), including the q=0/1 edges."""
        import ray.data

        from skyway_ray.stages.quantiles import percentile_cont

        rng = np.random.default_rng(11)
        x = rng.normal(100.0, 17.0, 5003)
        ds = ray.data.from_arrow(pa.table({"x": x})).repartition(7)
        qs = [0.0, 0.1, 0.5, 0.9, 1.0]
        got = percentile_cont(ds, "x", qs, collect_limit=400)
        want = np.percentile(x, [q * 100 for q in qs],
                             method="linear")
        assert np.allclose(got["value"].to_numpy(), want, rtol=0, atol=1e-9)


class TestPointRadiusJoin:
    def test_matches_bruteforce_random(self, ray_session):
        import ray.data

        from skyway_ray.stages.spatial_join import point_radius_join

        rng = np.random.default_rng(23)
        def pts(n, base):
            x = rng.uniform(-170, 160, n); y = rng.uniform(-80, 70, n)
            return [(base + i, x[i], y[i]) for i in range(n)]
        A, B = pts(300, 0), pts(250, 10_000)
        def ds(rows):
            return ray.data.from_arrow(pa.table(
                {k: [r[i] for r in rows]
                 for i, k in enumerate(["id", "x", "y"])})).repartition(3)
        # radius larger than a cell: fan-out spans >= 2 cells each way
        df = point_radius_join(ds(A), ds(B), radius=9.0, cell=8.0).to_pandas()
        got = sorted(zip(df.id_a, df.id_b))
        want = sorted((a[0], b[0]) for a in A for b in B
                      if (a[1]-b[1])**2 + (a[2]-b[2])**2 <= 81.0)
        assert got == want and len(got) > 0


class TestSpatialJoinEdges:
    def test_empty_sides(self, ray_session):
        import ray.data

        from skyway_ray.stages.spatial_join import (box_overlap_join,
                                                    point_radius_join)

        empty_box = ray.data.from_arrow(pa.table(
            {"id": pa.array([], pa.int64()),
             "xmin": pa.array([], pa.float64()),
             "ymin": pa.array([], pa.float64()),
             "xmax": pa.array([], pa.float64()),
             "ymax": pa.array([], pa.float64())}))
        one_box = ray.data.from_arrow(pa.table(
            {"id": [1], "xmin": [0.0], "ymin": [0.0],
             "xmax": [1.0], "ymax": [1.0]}))
        assert len(box_overlap_join(one_box, empty_box).to_pandas()) == 0
        assert len(box_overlap_join(empty_box, one_box).to_pandas()) == 0

        empty_pt = ray.data.from_arrow(pa.table(
            {"id": pa.array([], pa.int64()),
             "x": pa.array([], pa.float64()),
             "y": pa.array([], pa.float64())}))
        one_pt = ray.data.from_arrow(pa.table(
            {"id": [1], "x": [0.0], "y": [0.0]}))
        assert len(point_radius_join(one_pt, empty_pt, 1.0).to_pandas()) == 0
        assert len(point_radius_join(empty_pt, one_pt, 1.0).to_pandas()) == 0

    def test_antimeridian_adjacent_extremes(self, ray_session):
        """Boxes at the domain edges (x near ±180, y near ±90) join
        correctly — negative grid cells encode consistently."""
        import ray.data

        from skyway_ray.stages.spatial_join import box_overlap_join

        a = ray.data.from_arrow(pa.table(
            {"id": [1, 2], "xmin": [-183.0, 175.0], "ymin": [-89.0, 85.0],
             "xmax": [-175.0, 183.0], "ymax": [-85.0, 89.0]}))
        b = ray.data.from_arrow(pa.table(
            {"id": [10, 20], "xmin": [-180.0, 179.0], "ymin": [-88.0, 86.0],
             "xmax": [-176.0, 184.0], "ymax": [-86.0, 88.0]}))
        df = box_overlap_join(a, b).to_pandas()
        assert sorted(zip(df.id_a, df.id_b)) == [(1, 10), (2, 20)]


class TestHotCellGuard:
    """Fragment-replicate hot-cell split (spatial_join._hot_plan /
    _salt_map): results bit-identical with the guard on or off, and no
    salted group assembles more than ~threshold rows per side."""

    def test_radius_join_parity_with_planted_hot_cell(self, ray_session):
        import ray.data

        from skyway_ray.stages.spatial_join import point_radius_join

        rng = np.random.default_rng(31)
        # 1,200 points of each side crammed into ONE 8-degree cell
        # (around (4, 4)), plus scattered background
        def pts(n_hot, n_bg, base):
            x = np.concatenate([rng.uniform(0.5, 7.5, n_hot),
                                rng.uniform(-170, 160, n_bg)])
            y = np.concatenate([rng.uniform(0.5, 7.5, n_hot),
                                rng.uniform(-80, 70, n_bg)])
            return pa.table({"id": np.arange(base, base + n_hot + n_bg),
                             "x": x, "y": y})
        A, B = pts(1200, 100, 0), pts(1200, 100, 10_000)

        def run(thr):
            ds_a = ray.data.from_arrow(A).repartition(3)
            ds_b = ray.data.from_arrow(B).repartition(3)
            df = point_radius_join(ds_a, ds_b, radius=0.5, cell=8.0,
                                   hot_threshold=thr).to_pandas()
            return sorted(zip(df.id_a, df.id_b))

        guarded, unguarded = run(200), run(None)
        assert guarded == unguarded and len(guarded) > 1000

    def test_box_join_parity_with_planted_hot_cell(self, ray_session):
        import ray.data

        from skyway_ray.stages.spatial_join import box_overlap_join

        rng = np.random.default_rng(37)
        def boxes(n_hot, base):
            # small boxes inside one cell; some straddle the cell edge
            # so the reference-point rule is exercised under salting
            x = rng.uniform(0.5, 7.8, n_hot)
            y = rng.uniform(0.5, 7.8, n_hot)
            w = rng.uniform(0.05, 0.6, n_hot)
            return pa.table({"id": np.arange(base, base + n_hot),
                             "xmin": x, "ymin": y,
                             "xmax": x + w, "ymax": y + w})
        A, B = boxes(900, 0), boxes(900, 10_000)

        def run(thr):
            ds_a = ray.data.from_arrow(A).repartition(3)
            ds_b = ray.data.from_arrow(B).repartition(3)
            df = box_overlap_join(ds_a, ds_b,
                                  hot_threshold=thr).to_pandas()
            return sorted(zip(df.id_a, df.id_b))

        guarded, unguarded = run(150), run(None)
        assert guarded == unguarded and len(guarded) > 100

    def test_salted_group_sizes_bounded(self):
        """Direct check of the salting internals: a 3000/2000-row hot
        cell at threshold 500 splits so no (_g, side) slice exceeds the
        threshold plus hash-unevenness slack, and every (a, b) pair
        meets in exactly one group."""
        from skyway_ray.stages.spatial_join import (_SALT_MAX, _hot_plan,
                                                    _salt_map)

        thr = 500
        counts = pd.DataFrame({"cell": [5, 5, 9], "side": [0, 1, 0],
                               "n": [3000, 2000, 100]})
        plan = _hot_plan(counts, thr)
        assert plan is not None
        tbl = pa.table({
            "cell": np.concatenate([np.full(3000, 5), np.full(2000, 5),
                                    np.full(100, 9)]).astype(np.int64),
            "side": np.concatenate([np.zeros(3000), np.ones(2000),
                                    np.zeros(100)]).astype(np.int8),
            "id": np.arange(5100, dtype=np.int64)})
        out = _salt_map(*plan)(tbl).to_pandas()
        sizes = out.groupby(["_g", "side"]).size()
        assert sizes.max() <= 2 * thr
        # hot cell fanned out into >1 salted group
        hot_groups = out.loc[out["cell"] == 5, "_g"].nunique()
        assert hot_groups > 1
        # cold cell untouched: exactly one group, salt 0
        assert (out.loc[out["cell"] == 9, "_g"] == 9 * _SALT_MAX).all()
        # every (a, b) pair in the hot cell meets in EXACTLY one group
        hot = out[out["cell"] == 5]
        a_g = hot[hot["side"] == 0].groupby("id")["_g"].agg(set)
        b_g = hot[hot["side"] == 1].groupby("id")["_g"].agg(set)
        rng = np.random.default_rng(3)
        for ai in rng.choice(a_g.index, 40, replace=False):
            for bi in rng.choice(b_g.index, 25, replace=False):
                assert len(a_g[ai] & b_g[bi]) == 1


class TestMomentsEdges:
    def test_constant_column_zero_variance(self, ray_session):
        """dx = 0 -> corr defined as 0, stddev 0 (no div-by-zero)."""
        import ray.data

        from skyway_ray.stages.moments import grouped_moments

        t = pa.table({"g": ["a"] * 50, "x": [7] * 50,
                      "y": list(range(50))})
        out = grouped_moments(
            ray.data.from_arrow(t).repartition(4), "g", "x", "y"
        ).to_pandas()
        assert out["corr_micro"].tolist() == [0]
        assert out["sdx_micro"].tolist() == [0]
        assert out["n"].tolist() == [50]


class TestKmeansMicro:
    def test_planted_clusters_partition_invariant(self, ray_session):
        """Well-separated planted clusters are recovered exactly and
        the result is identical across input partitionings (integer
        arithmetic end to end)."""
        import ray.data

        from skyway_ray.stages.kmeans import kmeans_micro

        rng = np.random.default_rng(9)
        centers = np.eye(4, 8) * 10.0
        vecs, ids = [], []
        # ids 0..3 are one point of each cluster (the deterministic init)
        for j in range(4):
            vecs.append(centers[j] + 0.05 * rng.standard_normal(8))
            ids.append(j)
        for i in range(4, 200):
            j = i % 4
            vecs.append(centers[j] + 0.05 * rng.standard_normal(8))
            ids.append(i)
        tab = pa.table({
            "vec_id": np.asarray(ids, np.int64),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})

        def run(nparts):
            out = kmeans_micro(
                ray.data.from_arrow(tab).repartition(nparts),
                k=4, iters=2).to_pandas().sort_values("cluster")
            return out

        a, b = run(2), run(7)
        assert a["n"].tolist() == [50, 50, 50, 50]
        assert a["n"].tolist() == b["n"].tolist()
        assert a["centroid_sum"].tolist() == b["centroid_sum"].tolist()


class TestCopartHashJoin:
    @staticmethod
    def _canon(df):
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    def test_inner_matches_pandas_merge(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import copart_hash_join

        rng = np.random.default_rng(11)
        left = pd.DataFrame({"k": rng.integers(0, 300, 5000).astype(np.int64),
                             "lv": np.arange(5000, dtype=np.int64)})
        right = pd.DataFrame({"rk": np.arange(0, 600, 2, dtype=np.int64),
                              "rv": np.arange(300, dtype=np.int64) * 10})
        out = copart_hash_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(3),
            "k", "rk").to_pandas()
        want = left.merge(right, left_on="k", right_on="rk").drop(
            columns=["rk"])
        assert list(out.columns) == ["k", "lv", "rv"]  # Dataset.join layout
        assert self._canon(out).equals(self._canon(want))

    def test_full_outer_keeps_both_null_sides(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import copart_hash_join

        left = pd.DataFrame({"k": np.array([1, 2, 3], np.int64),
                             "lv": np.array([10, 20, 30], np.int64)})
        right = pd.DataFrame({"rk": np.array([2, 3, 4], np.int64),
                              "rv": np.array([200, 300, 400], np.int64)})
        out = copart_hash_join(
            ray.data.from_pandas(left).repartition(2),
            ray.data.from_pandas(right).repartition(2),
            "k", "rk", how="full_outer").to_pandas()
        # coalesced key: right-only rows surface their key under "k"
        assert sorted(out["k"].tolist()) == [1, 2, 3, 4]
        by_k = out.set_index("k")
        assert pd.isna(by_k.loc[1, "rv"]) and pd.isna(by_k.loc[4, "lv"])
        assert by_k.loc[2, "rv"] == 200 and by_k.loc[4, "rv"] == 400

    def test_payload_name_clash_raises(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import copart_hash_join

        df = pd.DataFrame({"k": np.array([1], np.int64),
                           "v": np.array([1], np.int64)})
        with pytest.raises(ValueError, match="overlapping"):
            copart_hash_join(ray.data.from_pandas(df),
                             ray.data.from_pandas(df), "k", "k")

    def test_empty_right_side_inner(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import copart_hash_join

        left = pd.DataFrame({"k": np.array([1, 2], np.int64),
                             "lv": np.array([1, 2], np.int64)})
        right = pd.DataFrame({"rk": pd.Series([], dtype=np.int64),
                              "rv": pd.Series([], dtype=np.int64)})
        out = copart_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", "rk").to_pandas()
        assert len(out) == 0

    def test_string_payload_survives(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import copart_hash_join

        left = pd.DataFrame({"k": np.arange(4, dtype=np.int64),
                             "name": [f"n{i}" for i in range(4)]})
        right = pd.DataFrame({"rk": np.arange(0, 4, 2, dtype=np.int64),
                              "tag": ["a", "b"]})
        out = copart_hash_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            "k", "rk").to_pandas().sort_values("k")
        assert out["name"].tolist() == ["n0", "n2"]
        assert out["tag"].tolist() == ["a", "b"]

    def test_left_anti(self, ray_session):
        import ray.data

        from skyway_ray.stages.joins import copart_hash_join

        left = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                             "lv": np.arange(10, dtype=np.int64) * 2})
        right = pd.DataFrame({"rk": np.array([1, 3, 5, 99], np.int64),
                              "rv": np.array([0, 0, 0, 0], np.int64)})
        out = copart_hash_join(
            ray.data.from_pandas(left).repartition(3),
            ray.data.from_pandas(right).repartition(2),
            "k", "rk", how="left_anti").to_pandas().sort_values("k")
        assert list(out.columns) == ["k", "lv"]  # left columns only
        assert out["k"].tolist() == [0, 2, 4, 6, 7, 8, 9]



class TestHashBucketScanStringKeys:
    def test_string_key_copartition(self, ray_session):
        import ray.data

        from skyway_ray.stages.scan import hash_bucket_scan

        rng = np.random.default_rng(5)
        words = np.array([f"w{int(i)}" for i in rng.integers(0, 40, 3000)])
        df = pd.DataFrame({"tok": words,
                           "n": np.ones(3000, dtype=np.int64)})

        def bucket_sum(t):
            g = t.group_by(["tok"]).aggregate([("n", "sum")])
            return g.rename_columns(["tok", "n"])

        out = hash_bucket_scan(
            ray.data.from_pandas(df).repartition(6), ["tok"], bucket_sum,
            n_rows=3000).to_pandas()
        want = df.groupby("tok", as_index=False)["n"].sum()
        assert len(out) == len(want)  # each token merged exactly once
        m = out.set_index("tok")["n"]
        assert all(m[t] == n for t, n in zip(want["tok"], want["n"]))