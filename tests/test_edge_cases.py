"""Empty/degenerate inputs through every stage — driver edge insurance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from skyway_ray.filters.vector import CompiledFilter
from skyway_ray.fixtures import make_boundaries, make_images
from skyway_ray.schemas import IMAGE_SCHEMA, OSM_ELEMENT_SCHEMA
from skyway_ray.stages.cellencode import CellEncode
from skyway_ray.stages.geotag import add_geotag
from skyway_ray.stages.pip_join import BoundaryIndex, PIPJoiner
from skyway_ray.stages.tiling import add_tile_xy, _partial_tile_counts


def _empty_images() -> pa.Table:
    return IMAGE_SCHEMA.empty_table()


class TestEmptyBatches:
    def test_geotag_cellencode_empty(self):
        out = CellEncode()(add_geotag(_empty_images()))
        assert out.num_rows == 0
        assert "h3_r7" in out.column_names

    def test_pip_join_empty_batch(self):
        b = make_boundaries(10)
        empty = add_geotag(_empty_images())
        for mode in ("inner", "left", "semi", "anti"):
            out = PIPJoiner(boundaries_table=b, mode=mode)(empty)
            assert out.num_rows == 0

    def test_pip_join_empty_boundaries(self):
        import skyway_ray.schemas as sch

        empty_b = sch.BOUNDARY_SCHEMA.empty_table()
        batch = add_geotag(make_images(50))
        inner = PIPJoiner(boundaries_table=empty_b, mode="inner")(batch)
        anti = PIPJoiner(boundaries_table=empty_b, mode="anti")(batch)
        assert inner.num_rows == 0
        assert anti.num_rows == 50

    def test_tile_partial_empty(self):
        out = _partial_tile_counts(add_tile_xy(add_geotag(_empty_images()), 12))
        assert out.num_rows == 0

    def test_filter_empty_table(self):
        f = CompiledFilter.from_source("OSMFilter v0.2.0\n\nCOMMIT\n")
        out = f.apply_table(OSM_ELEMENT_SCHEMA.empty_table())
        assert out.num_rows == 0

    def test_tagless_rows(self):
        """Rows with empty tags survive HAS-negative, die HAS-positive."""
        f = CompiledFilter.from_source(
            'OSMFilter v0.2.0\n\nHAS "k"\n\tDROP\n')
        t = pa.table({
            "type": pa.array(["node"] * 3),
            "id": pa.array([1, 2, 3], pa.int64()),
            "tags": pa.array([[], None, [{"key": "k", "value": "v"}]],
                             type=pa.list_(pa.struct([("key", pa.string()),
                                                      ("value", pa.string())]))),
        })
        out = f.apply_table(t)
        assert out["id"].to_pylist() == [1, 2]

    def test_knn_empty_reference(self):
        from skyway_ray.stages.knn import CellKnnIndex

        idx = CellKnnIndex(np.empty(0), np.empty(0), np.empty(0, np.int64))
        ids, d2 = idx.query_one(0.0, 0.0, 5)
        assert len(ids) == 0

    def test_topk_smaller_than_k(self, ray_session):
        import ray.data
        from skyway_ray.stages.topk import top_k

        ds = ray.data.from_items([{"v": 1, "id": 1}, {"v": 2, "id": 2}])
        out = top_k(ds, "v", 10, tiebreak_col="id").to_pandas()
        assert out["v"].tolist() == [2, 1]

    def test_agg_tree_empty(self, ray_session):
        import ray.data
        from skyway_ray.stages.agg_tree import tree_aggregate_to_table

        ds = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                           "n": pa.array([], pa.int64())}))
        out = tree_aggregate_to_table(ds, ["k"], [("n", "sum")])
        assert out.num_rows == 0
