"""geospatial query family (split from the former single-file queries module)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy
from ._common import (
    _ADAPT_CAP,
    _ADAPT_ZMAX,
    _BOX_SQL,
    _BUFFER_D,
    _CHECKSUM_K,
    _COLOC_EPS,
    _GH32,
    _IDW_MIN_D2,
    _QT_VAR_T,
    _border_segments,
    _box_params,
    _event_boxes,
    _geotag_batch,
    _grid_cell_counts,
    _luma_table_sql,
    _nrows,
    _part_boxes,
    _read,
    derive_latlon,
    latlon_sql,
)




# ---------------------------------------------------------------------------
# hash-verified queries (Ray + SQL oracle)


def q_geotag(sf_dir: str):
    """events → derived (lat, lon) points (the geotag stage over a
    SQL-visible table)."""
    return _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: _geotag_batch(b, "event_id"), batch_format="pyarrow")


def q_geotag_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return f"SELECT event_id, {lat} AS lat, {lon} AS lon FROM events"


def q_cells(sf_dir: str):
    """Hierarchical cell encode (h3_r7/r9/r12) over derived points."""

    def enc(batch: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(batch["event_id"].to_numpy(zero_copy_only=False))
        for r in (7, 9, 12):
            batch = batch.append_column(
                f"h3_r{r}", pa.array(cell_id(lat, lon, r), pa.int64()))
        return batch

    return _read(sf_dir, "events", ["event_id"]).map_batches(
        enc, batch_format="pyarrow")


def q_cells_sql() -> str:
    lat, lon = latlon_sql("event_id")
    parts = ", ".join(f"{cell_sql(lat, lon, r)} AS h3_r{r}" for r in (7, 9, 12))
    return f"SELECT event_id, {parts} FROM events"


def q_tiles(sf_dir: str):
    """Web-mercator z=12 tile assignment over derived points."""

    def enc(batch: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(batch["event_id"].to_numpy(zero_copy_only=False))
        x, y = tile_xy(lat, lon, 12)
        return (batch.append_column("tile_x", pa.array(x, pa.int64()))
                     .append_column("tile_y", pa.array(y, pa.int64())))

    return _read(sf_dir, "events", ["event_id"]).map_batches(
        enc, batch_format="pyarrow")


def q_tiles_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 12)
    return f"SELECT event_id, {xe} AS tile_x, {ye} AS tile_y FROM events"


def q_tile_stats(sf_dir: str):
    """Per-tile counts at z=7 — pre-aggregated inside map_batches, then
    the Arrow combiner tree over the bounded tile space (the flagship
    reduction shape)."""

    def partial(batch: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(batch["event_id"].to_numpy(zero_copy_only=False))
        x, y = tile_xy(lat, lon, 7)
        t = pa.table({"tile_x": x, "tile_y": y})
        g = t.group_by(["tile_x", "tile_y"]).aggregate([("tile_x", "count")])
        return g.rename_columns(["tile_x", "tile_y", "partial_n"])

    from ..stages.agg_tree import tree_aggregate

    partials = _read(sf_dir, "events", ["event_id"]).map_batches(
        partial, batch_format="pyarrow")
    out = tree_aggregate(partials, ["tile_x", "tile_y"],
                         [("partial_n", "sum")])
    return out.map_batches(
        lambda b: b.rename_columns(["tile_x", "tile_y", "n_events"]),
        batch_format="pyarrow")


def q_tile_stats_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 7)
    return (f"SELECT {xe} AS tile_x, {ye} AS tile_y, "
            f"count(*) AS n_events FROM events GROUP BY 1, 2")


def q_pip_join_boxes(sf_dir: str):
    """Point-in-polygon inner join against rectangle regions derived
    from the nation table — the STRtree/ray-casting join on a geometry
    a SQL oracle can also express (BETWEEN on both axes)."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.pip_join import make_pip_join_fn

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    nk = nation["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    clat, clon, hh, hw = _box_params(nk)
    ring_lon = [[clon[j] - hw[j], clon[j] + hw[j], clon[j] + hw[j], clon[j] - hw[j]]
                for j in range(len(nk))]
    ring_lat = [[clat[j] - hh[j], clat[j] - hh[j], clat[j] + hh[j], clat[j] + hh[j]]
                for j in range(len(nk))]
    boundaries = pa.table({
        "region_id": nation["n_name"],
        "ring_lon": pa.array(ring_lon, pa.list_(pa.float64())),
        "ring_lat": pa.array(ring_lat, pa.list_(pa.float64())),
    })
    ref = ray.put(boundaries)
    pts = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: _geotag_batch(b, "event_id"), batch_format="pyarrow")
    joined = pts.map_batches(make_pip_join_fn(ref, mode="inner"),
                             batch_format="pyarrow")
    return joined.map_batches(
        lambda b: b.select(["event_id", "region_id"]), batch_format="pyarrow")


def q_pip_join_boxes_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH pts AS (SELECT event_id, {lat} AS lat, {lon} AS lon FROM events), "
        f"boxes AS ({_BOX_SQL}) "
        "SELECT p.event_id, b.region_id FROM pts p JOIN boxes b "
        "ON p.lat > b.clat - b.hh AND p.lat < b.clat + b.hh "
        "AND p.lon > b.clon - b.hw AND p.lon < b.clon + b.hw"
    )


def q_cell_stats(sf_dir: str):
    """Per-cell (h3_r7) counts with explicit hot-key salting: hot cells
    split across salt reducers then exactly re-merged (stages/salt.py).
    Result equals a plain groupby — the salting is transparent."""
    from ..stages.salt import salted_count

    pts = _read(sf_dir, "events", ["event_id"]).map_batches(
        lambda b: _geotag_batch(b, "event_id"), batch_format="pyarrow")

    def enc(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        return pa.table({"h3_r7": cell_id(lat, lon, 7)})

    cells = pts.map_batches(enc, batch_format="pyarrow")
    out = salted_count(cells, "h3_r7", num_salts=8, hot_threshold=3,
                       sample_fraction=1.0,
                       n_rows=_nrows(sf_dir, "events"))
    return out.map_batches(
        lambda b: b.rename_columns(["h3_r7", "n_events"]),
        batch_format="pyarrow")


def q_cell_stats_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (f"SELECT {cell_sql(lat, lon, 7)} AS h3_r7, count(*) AS n_events "
            f"FROM events GROUP BY 1")


def q_box_tile_cover(sf_dir: str):
    """Vector→raster: rasterize each nation box onto the z=7
    web-mercator grid — one row per (region, covering tile).  The
    corner tiles come from the same `tile_xy` math the hash-verified
    `tiles` query uses, so the integer tile ranges (and therefore the
    whole cover) mirror the SQL oracle exactly.  The expansion runs
    inside ``map_batches`` over the (small) nation side — boundary
    rasterization is a dimension-side op."""
    Z = 7

    def cover(batch: pa.Table) -> pa.Table:
        k = batch["n_nationkey"].to_numpy(zero_copy_only=False)
        name = batch["n_name"].to_numpy(zero_copy_only=False)
        clat, clon, hh, hw = _box_params(k)
        x0, _ = tile_xy(clat, clon - hw, Z)
        x1, _ = tile_xy(clat, clon + hw, Z)
        _, y0 = tile_xy(clat + hh, clon, Z)   # north edge → smaller y
        _, y1 = tile_xy(clat - hh, clon, Z)
        nx = (x1 - x0 + 1)
        ny = (y1 - y0 + 1)
        reps = nx * ny
        region = np.repeat(name, reps)
        xs_parts, ys_parts = [], []
        for i in range(len(k)):
            gx, gy = np.meshgrid(np.arange(x0[i], x1[i] + 1),
                                 np.arange(y0[i], y1[i] + 1))
            xs_parts.append(gx.ravel())
            ys_parts.append(gy.ravel())
        return pa.table({
            "region_id": pa.array(region, pa.string()),
            "tile_x": pa.array(np.concatenate(xs_parts), pa.int64()),
            "tile_y": pa.array(np.concatenate(ys_parts), pa.int64()),
        })

    return _read(sf_dir, "nation", ["n_nationkey", "n_name"]).map_batches(
        cover, batch_format="pyarrow")


def q_box_tile_cover_sql() -> str:
    xw, _ = tile_sql("clat", "(clon - hw)", 7)
    xe, _ = tile_sql("clat", "(clon + hw)", 7)
    _, yn = tile_sql("(clat + hh)", "clon", 7)
    _, ys = tile_sql("(clat - hh)", "clon", 7)
    return (
        f"WITH b AS ({_BOX_SQL}), "
        f"r AS (SELECT region_id, {xw} AS x0, {xe} AS x1, "
        f"{yn} AS y0, {ys} AS y1 FROM b), "
        "xr AS (SELECT region_id, unnest(generate_series(x0, x1)) "
        "AS tile_x, y0, y1 FROM r) "
        "SELECT region_id, tile_x, "
        "unnest(generate_series(y0, y1)) AS tile_y FROM xr"
    )


def q_tile_polygons(sf_dir: str):
    """Raster→vector: distinct z=6 tiles of the event points, converted
    back to lon/lat bounding boxes (tile polygonization)."""
    from ..geo.raster import tiles_to_polygons

    def enc(batch: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(batch["event_id"].to_numpy(zero_copy_only=False))
        x, y = tile_xy(lat, lon, 6)
        t = pa.table({"tile_x": x, "tile_y": y})
        return t.group_by(["tile_x", "tile_y"]).aggregate([])

    from ..stages.agg_tree import tree_aggregate

    tiles = _read(sf_dir, "events", ["event_id"]).map_batches(
        enc, batch_format="pyarrow")
    distinct = tree_aggregate(tiles.map_batches(
        lambda b: b.append_column("one", pa.array(np.ones(b.num_rows, np.int64))),
        batch_format="pyarrow"), ["tile_x", "tile_y"], [("one", "min")])
    def finish(b: pa.Table) -> pa.Table:
        b = tiles_to_polygons(b.drop_columns(["one"]), z=6)
        # north/south come through atan/exp, which differ by 1 ulp
        # across libms — emit microdegrees via floor(x*1e6 + 0.5)
        # (identical rounding on both sides; DuckDB round() is
        # half-away, numpy round() is half-even, so use neither)
        out = {"tile_x": b["tile_x"], "tile_y": b["tile_y"],
               "west": b["west"], "east": b["east"]}
        for c in ("south", "north"):
            v = b[c].to_numpy(zero_copy_only=False)
            out[f"{c}_udeg"] = pa.array(
                np.floor(v * 1e6 + 0.5).astype(np.int64), pa.int64())
        return pa.table(out)

    return distinct.map_batches(finish, batch_format="pyarrow")


def q_tile_polygons_sql() -> str:
    from ..geo.raster import tile_bounds_sql
    from ..geo.tiles import tile_sql

    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 6)
    w, s, e, n = tile_bounds_sql("tile_x", "tile_y", 6)
    return (
        f"WITH tiles AS (SELECT DISTINCT {xe} AS tile_x, {ye} AS tile_y "
        f"FROM events) SELECT tile_x, tile_y, {w} AS west, {e} AS east, "
        f"cast(floor(({s}) * 1000000 + 0.5) as bigint) AS south_udeg, "
        f"cast(floor(({n}) * 1000000 + 0.5) as bigint) AS north_udeg "
        f"FROM tiles"
    )


# ---------------------------------------------------------------------------
# rows-only queries (no SQL equivalent — driver records a weaker check)


def q_flagship_tiles(sf_dir: str):
    """The flagship filter→PIP-join→tile pipeline over the synthetic
    image fixture matching this sf (FIXTURES.md scale mapping)."""
    from ..fixtures import (ensure_boundaries_parquet, ensure_images_parquet,
                           scale_for_sf_dir)
    from ..pipelines.flagship import flagship_pipeline

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    boundaries = ensure_boundaries_parquet(50)
    return flagship_pipeline(images, boundaries, z=12)


def q_range_join(sf_dir: str):
    """Broadcast interval join: orders priced into OVERLAPPING price
    bands derived from nation keys (band k covers [8000k, 8000k+20000)
    — spacing < width, so a price matches up to 3 bands).  The band
    table is the broadcast small side; per batch the candidate run
    comes from two searchsorteds (stages/joins.py
    broadcast_range_join)."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_range_join

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey"]).to_pandas()
    k = nat["n_nationkey"].to_numpy(np.int64)
    bands = pd.DataFrame({"band_id": k,
                          "lo": k.astype(np.float64) * 8000.0,
                          "hi": k.astype(np.float64) * 8000.0 + 20000.0})
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = broadcast_range_join(ds, bands, on="o_totalprice")
    return out.map_batches(
        lambda b: b.select(["o_orderkey", "band_id"]),
        batch_format="pyarrow")


def q_range_join_sql() -> str:
    return (
        "SELECT o.o_orderkey, CAST(n.n_nationkey AS BIGINT) AS band_id "
        "FROM orders o JOIN nation n "
        "ON o.o_totalprice >= n.n_nationkey * 8000.0 "
        "AND o.o_totalprice < n.n_nationkey * 8000.0 + 20000.0"
    )


def q_box_join(sf_dir: str):
    """Large×large rectangle-overlap join (events boxes × part boxes)
    via Partition-Based Spatial-Merge (stages/spatial_join.py): grid
    co-partition + per-cell vectorized test, duplicate reports killed
    by the reference-point rule (no post-dedup shuffle)."""
    from ..stages.spatial_join import box_overlap_join

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        _event_boxes, batch_format="pyarrow")
    b = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        _part_boxes, batch_format="pyarrow")
    return box_overlap_join(a, b, cell=8.0,
                            out_a="event_id", out_b="p_partkey")


def q_box_join_sql() -> str:
    elat, elon = latlon_sql("event_id")
    plat, plon = latlon_sql("p_partkey")
    return f"""
WITH a AS (
  SELECT event_id,
         {elon} - (0.5 + (event_id % 5) * 0.6) AS xmin,
         {elon} + (0.5 + (event_id % 5) * 0.6) AS xmax,
         {elat} - (0.5 + (event_id % 4) * 0.75) AS ymin,
         {elat} + (0.5 + (event_id % 4) * 0.75) AS ymax
  FROM events
), b AS (
  SELECT p_partkey,
         {plon} - (1.0 + (p_partkey % 4) * 0.7) AS xmin,
         {plon} + (1.0 + (p_partkey % 4) * 0.7) AS xmax,
         {plat} - (1.0 + (p_partkey % 3) * 0.8) AS ymin,
         {plat} + (1.0 + (p_partkey % 3) * 0.8) AS ymax
  FROM part
)
SELECT a.event_id, b.p_partkey FROM a JOIN b
ON a.xmin <= b.xmax AND b.xmin <= a.xmax
AND a.ymin <= b.ymax AND b.ymin <= a.ymax
"""


def q_radius_join(sf_dir: str):
    """Point–point radius join (events points × part points within 1.5
    degrees): the no-dedup PBSM variant — only the probe side fans out
    to neighbor cells, each build point lives in exactly one cell, so
    every qualifying pair meets exactly once
    (stages/spatial_join.py::point_radius_join)."""
    from ..stages.spatial_join import point_radius_join

    def epoints(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    def ppoints(b: pa.Table) -> pa.Table:
        k = b["p_partkey"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        epoints, batch_format="pyarrow")
    b = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        ppoints, batch_format="pyarrow")
    return point_radius_join(a, b, radius=1.5, cell=8.0,
                             out_a="event_id", out_b="p_partkey")


def q_radius_join_sql() -> str:
    elat, elon = latlon_sql("event_id")
    plat, plon = latlon_sql("p_partkey")
    return (
        f"WITH a AS (SELECT event_id, {elon} AS x, {elat} AS y FROM events), "
        f"b AS (SELECT p_partkey, {plon} AS x, {plat} AS y FROM part) "
        "SELECT a.event_id, b.p_partkey FROM a JOIN b ON "
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 2.25"
    )


def q_tile_pyramid(sf_dir: str):
    """Tile-count pyramid (z12 → z10 → z8): ONE data pass aggregates
    the z12 leaf, coarser zooms re-derive from the leaf table by
    bit-shifting tile coords (web-mercator tiles nest exactly —
    ``x@z-2 == x@z >> 2`` is bit-exact because the tile formula scales
    one float by a power of two).  The SQL oracle computes each level
    directly from the points; equality is the nesting proof."""
    from ..stages.agg_tree import tree_aggregate

    def leaf(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        x, y = tile_xy(lat, lon, 12)
        t = pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y),
                      "n": pa.array(np.ones(len(x), np.int64))})
        g = t.group_by(["tile_x", "tile_y"]).aggregate([("n", "sum")])
        return g.rename_columns(["tile_x", "tile_y", "n"])

    def pyramid(leaf_tab: pa.Table) -> pa.Table:
        if leaf_tab.num_rows == 0:
            return pa.table({"tile_z": pa.array([], pa.int64()),
                             "tile_x": pa.array([], pa.int64()),
                             "tile_y": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = leaf_tab.to_pandas()
        outs = []
        for z in (12, 10, 8):
            shift = 12 - z
            lv = d.copy()
            lv["tile_x"] = lv["tile_x"].to_numpy() >> shift
            lv["tile_y"] = lv["tile_y"].to_numpy() >> shift
            lv = (lv.groupby(["tile_x", "tile_y"], as_index=False)
                  .agg(n=("n", "sum")))
            lv.insert(0, "tile_z", np.int64(z))
            outs.append(lv)
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    ds = _read(sf_dir, "events", ["event_id"])
    leaf_ds = tree_aggregate(ds.map_batches(leaf, batch_format="pyarrow"),
                             ["tile_x", "tile_y"], [("n", "sum")])
    return leaf_ds.map_batches(pyramid, batch_format="pyarrow")


def q_tile_pyramid_sql() -> str:
    lat, lon = latlon_sql("event_id")
    parts = []
    for z in (12, 10, 8):
        x, y = tile_sql(lat, lon, z)
        parts.append(
            f"SELECT CAST({z} AS BIGINT) AS tile_z, {x} AS tile_x, "
            f"{y} AS tile_y, CAST(count(*) AS BIGINT) AS n "
            f"FROM events GROUP BY 2, 3")
    return " UNION ALL ".join(parts)


def q_local_volume(sf_dir: str):
    """TPC-H Q5 shape (local supplier volume): revenue from 1996
    ASIA-region orders where the supplier and the ordering customer
    share a nation.  Both dimension chains (customer→nation and
    supplier→nation→region) broadcast once; the only exchange is the
    large×large lineitem⋈orders copart join; the 25-key nation rollup
    rides the bounded combiner tree.  Revenue terms are 1e-4-quantized
    ints so the distributed sum is exact."""
    import pyarrow.parquet as pq

    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.joins import broadcast_hash_join, copart_hash_join

    Y0 = np.datetime64("1996-01-01T00:00:00", "us").astype(np.int64)
    Y1 = np.datetime64("1997-01-01T00:00:00", "us").astype(np.int64)

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    region = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia_keys = region.loc[region["r_name"] == "ASIA", "r_regionkey"]
    nat = nation[nation["n_regionkey"].isin(set(asia_keys))]

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(set(nat["n_nationkey"]))]
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"]).to_pandas()

    def filt_orders(b: pa.Table) -> pa.Table:
        ts = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = b.filter(pa.array((ts >= Y0) & (ts < Y1)))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        filt_orders, batch_format="pyarrow")
    orders = broadcast_hash_join(orders, cust, on="o_custkey",
                                 small_on="c_custkey").map_batches(
        lambda d: d[["o_orderkey", "c_nationkey"]], batch_format="pandas")

    def line_rev(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 1e4 + 0.5).astype(np.int64)
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "rev_q4": pa.array(rev, pa.int64())})

    line = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
                 ).map_batches(line_rev, batch_format="pyarrow")
    line = broadcast_hash_join(line, supp, on="l_suppkey",
                               small_on="s_suppkey").map_batches(
        lambda d: d[["l_orderkey", "s_nationkey", "rev_q4"]],
        batch_format="pandas")

    j = copart_hash_join(
        orders, line, "o_orderkey", "l_orderkey",
        n_rows=_nrows(sf_dir, "orders") + _nrows(sf_dir, "lineitem"),
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("c_nationkey", pa.int32())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("s_nationkey", pa.int32()),
                                ("rev_q4", pa.int64())]))

    def local_only(b: pa.Table) -> pa.Table:
        cn = b["c_nationkey"].to_numpy(zero_copy_only=False)
        sn = b["s_nationkey"].to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(cn == sn))
        return pa.table({"s_nationkey": t["s_nationkey"].cast(pa.int64()),
                         "rev_q4": t["rev_q4"]})

    per_nation = tree_aggregate_to_table(
        j.map_batches(local_only, batch_format="pyarrow"),
        ["s_nationkey"], [("rev_q4", "sum")]).to_pandas()
    names = nat[["n_nationkey", "n_name"]].copy()
    names["n_nationkey"] = names["n_nationkey"].astype(np.int64)
    out = per_nation.merge(names, left_on="s_nationkey",
                           right_on="n_nationkey")
    return out[["n_name", "rev_q4"]].reset_index(drop=True)


def q_local_volume_sql() -> str:
    return (
        "SELECT n_name, CAST(sum(CAST(floor(l_extendedprice * "
        "(1.0 - l_discount) * 1e4 + 0.5) AS BIGINT)) AS BIGINT) AS rev_q4 "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name"
    )


def q_kring_smooth(sf_dir: str):
    """3×3 neighbor-smoothed density surface over a 1° grid (the
    heatmap / kernel-smoothing shape): per-batch partial cell counts
    merge on the combiner tree — grid resolution bounds the key space
    at 360×120 regardless of data volume — and the k-ring convolution
    is one vectorized sparse searchsorted pass over the realized cells
    on the driver.  The event stream itself never shuffles."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor(lon + 180.0).astype(np.int64)
        cy = np.floor(lat + 60.0).astype(np.int64)
        t = pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                      "n": pa.array(np.ones(len(cx), np.int64))})
        return (t.group_by(["cx", "cy"]).aggregate([("n", "sum")])
                 .rename_columns(["cx", "cy", "n"]))

    cells = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["cx", "cy"], [("n", "sum")]).to_pandas()
    cx = cells["cx"].to_numpy().astype(np.int64)
    cy = cells["cy"].to_numpy().astype(np.int64)
    n = cells["n"].to_numpy().astype(np.int64)
    # cy < 1024 always (grid is 120 tall), so the packed key is unique
    # and a ±1 cy probe can never alias a neighboring cx column
    key = cx * 1024 + cy
    order = np.argsort(key, kind="mergesort")
    skey, sn = key[order], n[order]
    smooth = np.zeros(len(cells), np.int64)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            q = key + dx * 1024 + dy
            idx = np.clip(np.searchsorted(skey, q), 0, len(skey) - 1)
            smooth += np.where(skey[idx] == q, sn[idx], 0)
    return pd.DataFrame({"cx": cx, "cy": cy, "n": n,
                         "smooth_n": smooth})


def q_kring_smooth_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH c AS (SELECT CAST(floor({lon} + 180.0) AS BIGINT) AS cx, "
        f"CAST(floor({lat} + 60.0) AS BIGINT) AS cy, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) "
        "SELECT a.cx, a.cy, a.n, CAST(sum(b.n) AS BIGINT) AS smooth_n "
        "FROM c a JOIN c b ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 "
        "AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 "
        "GROUP BY 1, 2, 3"
    )


def q_border_crossings(sf_dir: str):
    """Geofence line-crossing counts (border-crossing detection): each
    consecutive per-user trajectory step is tested for PROPER
    intersection against 25 broadcast 'border' segments using exact
    int64 orientation cross-products on microdegree coordinates (|d|
    < 2^58 — no float anywhere, so the SQL CASE oracle matches
    bit-for-bit).  Steps come from the coarse keyed_scan; the bounded
    25-key histogram merges on the combiner tree.  The segment loop is
    a fixed 25-iteration vectorized pass — O(n) memory per bucket."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import keyed_scan

    seg, ax, ay, bx, by = _border_segments(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        return pa.table({
            "user_id": b["user_id"], "t": b["ts"].cast(pa.int64()),
            "event_id": b["event_id"],
            "x": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            "y": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64))})

    def fn(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        x = d["x"].to_numpy()
        y = d["y"].to_numpy()
        step = np.r_[False, u[1:] == u[:-1]]  # row i: step (i-1)->(i)
        x1, y1 = x[:-1][step[1:]], y[:-1][step[1:]]
        x2, y2 = x[1:][step[1:]], y[1:][step[1:]]
        counts = np.zeros(len(seg), np.int64)
        for i in range(len(seg)):
            dx, dy = bx[i] - ax[i], by[i] - ay[i]
            d1 = dx * (y1 - ay[i]) - dy * (x1 - ax[i])
            d2 = dx * (y2 - ay[i]) - dy * (x2 - ax[i])
            sx, sy = x2 - x1, y2 - y1
            d3 = sx * (ay[i] - y1) - sy * (ax[i] - x1)
            d4 = sx * (by[i] - y1) - sy * (bx[i] - x1)
            hit = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) \
                & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
            counts[i] = int(np.count_nonzero(hit))
        return pd.DataFrame({"seg": seg, "n_cross": counts})

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"]
               ).map_batches(prep, batch_format="pyarrow")
    parts = keyed_scan(ds, "user_id", ["t", "event_id"], fn)
    return tree_aggregate_to_table(parts, ["seg"], [("n_cross", "sum")])


def q_border_crossings_sql() -> str:
    lat, lon = latlon_sql("event_id")
    a_lat, a_lon = latlon_sql("(CAST(n_nationkey AS BIGINT) * 2 + 1001)")
    b_lat, b_lon = latlon_sql("(CAST(n_nationkey AS BIGINT) * 2 + 1002)")
    return (
        f"WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
        f"CAST(floor({lon} * 1000000 + 0.5) AS BIGINT) AS x, "
        f"CAST(floor({lat} * 1000000 + 0.5) AS BIGINT) AS y "
        "FROM events), "
        "s AS (SELECT x AS x2, y AS y2, lag(x) OVER w AS x1, "
        "lag(y) OVER w AS y1 FROM p "
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), "
        f"g AS (SELECT CAST(n_nationkey AS BIGINT) AS seg, "
        f"CAST(floor({a_lon} * 1000000 + 0.5) AS BIGINT) AS ax, "
        f"CAST(floor({a_lat} * 1000000 + 0.5) AS BIGINT) AS ay, "
        f"CAST(floor({b_lon} * 1000000 + 0.5) AS BIGINT) AS bx, "
        f"CAST(floor({b_lat} * 1000000 + 0.5) AS BIGINT) AS by "
        "FROM nation), "
        "d AS (SELECT g.seg, "
        "(g.bx - g.ax) * (s.y1 - g.ay) - (g.by - g.ay) * (s.x1 - g.ax) "
        "AS d1, "
        "(g.bx - g.ax) * (s.y2 - g.ay) - (g.by - g.ay) * (s.x2 - g.ax) "
        "AS d2, "
        "(s.x2 - s.x1) * (g.ay - s.y1) - (s.y2 - s.y1) * (g.ax - s.x1) "
        "AS d3, "
        "(s.x2 - s.x1) * (g.by - s.y1) - (s.y2 - s.y1) * (g.bx - s.x1) "
        "AS d4 FROM g CROSS JOIN "
        "(SELECT * FROM s WHERE x1 IS NOT NULL) s) "
        "SELECT seg, CAST(sum(CASE WHEN "
        "((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0)) AND "
        "((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0)) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_cross FROM d GROUP BY seg"
    )


def q_geohash4(sf_dir: str):
    """Geohash-4 cell counts (the standard base-32 bit-interleaved
    spatial key): 10 lat + 10 lon bits interleave lon-first into a
    20-bit code — counted per batch as INTEGER codes (combiner), with
    only the realized distinct codes converted to strings on the
    driver after the tree merge.  The code space is bounded at 2^20
    regardless of data volume, so the tree holds at any scale; the
    SQL oracle mirrors the interleave with the same shift/mask
    arithmetic."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        latb = np.floor((lat + 90.0) / 180.0 * 1024.0).astype(np.int64)
        lonb = np.floor((lon + 180.0) / 360.0 * 1024.0).astype(np.int64)
        code = np.zeros(len(latb), np.int64)
        for j in range(10):
            code |= ((lonb >> (9 - j)) & 1) << (19 - 2 * j)
            code |= ((latb >> (9 - j)) & 1) << (18 - 2 * j)
        t = pa.table({"code": pa.array(code),
                      "n": pa.array(np.ones(len(code), np.int64))})
        return (t.group_by(["code"]).aggregate([("n", "sum")])
                 .rename_columns(["code", "n"]))

    cells = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["code"], [("n", "sum")]).to_pandas()
    code = cells["code"].to_numpy().astype(np.int64)
    alph = np.array(list(_GH32))
    gh = alph[(code >> 15) & 31]
    for sh in (10, 5, 0):
        gh = np.char.add(gh, alph[(code >> sh) & 31])
    return pd.DataFrame({"gh4": gh,
                         "n": cells["n"].to_numpy().astype(np.int64)})


def q_geohash4_sql() -> str:
    lat, lon = latlon_sql("event_id")
    interleave = " + ".join(
        f"(((lonb >> {9 - j}) & 1) << {19 - 2 * j}) + "
        f"(((latb >> {9 - j}) & 1) << {18 - 2 * j})"
        for j in range(10))
    chars = " || ".join(
        f"substr('{_GH32}', CAST(((code >> {sh}) & 31) AS INTEGER) + 1, 1)"
        for sh in (15, 10, 5, 0))
    return (
        f"WITH b AS (SELECT "
        f"CAST(floor(({lat} + 90.0) / 180.0 * 1024.0) AS BIGINT) AS latb, "
        f"CAST(floor(({lon} + 180.0) / 360.0 * 1024.0) AS BIGINT) AS lonb "
        "FROM events), "
        f"c AS (SELECT ({interleave}) AS code FROM b) "
        f"SELECT {chars} AS gh4, CAST(count(*) AS BIGINT) AS n "
        "FROM c GROUP BY 1"
    )


def q_adaptive_tiles(sf_dir: str):
    """Adaptive quadtree tiling: starting from the z=0 web-mercator
    root, any tile holding more than `_ADAPT_CAP` points splits into
    its four children, down to z=`_ADAPT_ZMAX` — the
    density-adaptive variant of the flagship fixed-zoom tiling.  ONE
    data pass builds per-batch z-max partial counts (pre-aggregated,
    so the combiner tree ships ≤ |tiles| rows per block over the
    bounded 4^zmax space); leaf selection is the vectorized
    ancestor-reachability walk in stages/tiling.py::adaptive_leaves,
    relying on bit-exact tile nesting (see q_tile_pyramid)."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.tiling import adaptive_leaves

    def leaf(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        x, y = tile_xy(lat, lon, _ADAPT_ZMAX)
        t = pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y),
                      "n": pa.array(np.ones(len(x), np.int64))})
        return (t.group_by(["tile_x", "tile_y"])
                 .aggregate([("n", "sum")])
                 .rename_columns(["tile_x", "tile_y", "n"]))

    parts = _read(sf_dir, "events", ["event_id"]).map_batches(
        leaf, batch_format="pyarrow")
    counts = tree_aggregate_to_table(
        parts, ["tile_x", "tile_y"], [("n", "sum")]).to_pandas()
    return adaptive_leaves(counts, _ADAPT_ZMAX, _ADAPT_CAP)


def q_adaptive_tiles_sql() -> str:
    lat, lon = latlon_sql("event_id")
    cap, zmax = _ADAPT_CAP, _ADAPT_ZMAX
    ctes = [f"p AS (SELECT {lat} AS lat, {lon} AS lon FROM events)"]
    for z in range(zmax + 1):
        xe, ye = tile_sql("lat", "lon", z)
        ctes.append(f"c{z} AS (SELECT {xe} AS x, {ye} AS y, "
                    "count(*) AS n FROM p GROUP BY 1, 2)")
    ctes.append("r0 AS (SELECT x, y, n FROM c0)")
    for z in range(1, zmax + 1):
        ctes.append(
            f"r{z} AS (SELECT c.x, c.y, c.n FROM c{z} c "
            f"JOIN r{z - 1} pa ON pa.x = c.x // 2 AND pa.y = c.y // 2 "
            f"WHERE pa.n > {cap})")
    leaves = [f"SELECT {z} AS tile_z, x AS tile_x, y AS tile_y, n "
              f"FROM r{z} WHERE n <= {cap}" for z in range(zmax)]
    leaves.append(f"SELECT {zmax} AS tile_z, x AS tile_x, y AS tile_y, "
                  f"n FROM r{zmax}")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT CAST(tile_z AS BIGINT) AS tile_z, "
        "CAST(tile_x AS BIGINT) AS tile_x, "
        "CAST(tile_y AS BIGINT) AS tile_y, CAST(n AS BIGINT) AS n "
        "FROM (" + " UNION ALL ".join(leaves) + ")"
    )


def q_colocation(sf_dir: str):
    """Spatial co-location mining: counts of unordered event-TYPE
    pairs whose instances fall within ε = 1° of each other (the
    classic co-location pattern-count).  The PBSM radius self-join
    emits id pairs only; event types attach as INT codes through two
    chained vertex-state exchanges (stages/graph: the pair stream
    keyed by u picks up u's type code bucket-locally and re-keys
    itself by v, where v's code attaches and the bounded (code,
    code) partial counts are emitted in-bucket) — half the exchange
    volume of the former two copart string joins, and only bounded
    partials leave the second exchange.  Codes are vocabulary-rank
    ints (the type space is bounded), so canonical min/max on codes
    equals the string ordering; the bounded type-pair space merges on
    the combiner tree and decodes at the end."""
    import pyarrow.compute as pc

    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.graph import edge_state_messages
    from ..stages.spatial_join import point_radius_join

    def pts(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    b = _read(sf_dir, "events", ["event_id"]).map_batches(
        pts, batch_format="pyarrow")
    pairs = point_radius_join(a, b, radius=_COLOC_EPS, cell=8.0,
                              out_a="u", out_b="v").map_batches(
        lambda t: t.filter(pc.less(t["u"], t["v"])),
        batch_format="pyarrow").materialize()  # ids only; counted
    # below so the exchanges size buckets without re-running the PBSM
    n_p = pairs.count()
    n = _nrows(sf_dir, "events")

    # bounded vocabulary (per-block distinct partials, driver-merged),
    # sorted so code order == string order
    vt = _read(sf_dir, "events", ["event_type"]).map_batches(
        lambda t: pa.table({"event_type": pc.unique(
            t["event_type"].combine_chunks())}),
        batch_format="pyarrow").to_pandas()
    vocab = np.sort(vt["event_type"].unique().astype("U"))

    def to_codes(t: pa.Table) -> pa.Table:
        ty = t["event_type"].to_numpy(zero_copy_only=False).astype("U")
        return pa.table({
            "node": t["event_id"].combine_chunks().cast(pa.int64()),
            "val": pa.array(np.searchsorted(vocab, ty), pa.int64())})

    tstate = _read(sf_dir, "events",
                   ["event_id", "event_type"]).map_batches(
        to_codes, batch_format="pyarrow")

    def attach_u(ek, pays, lookup):
        tu, _ = lookup(ek, default=0)
        return pa.table({"v": pa.array(pays["v"], pa.int64()),
                         "tu": pa.array(tu, pa.int64())})

    def attach_v_count(ek, pays, lookup):
        tv, _ = lookup(ek, default=0)
        tu = pays["tu"]
        c = pa.table({
            "ca": pa.array(np.minimum(tu, tv), pa.int64()),
            "cb": pa.array(np.maximum(tu, tv), pa.int64()),
            "n_pairs": pa.array(np.ones(len(tu), np.int64))})
        return (c.group_by(["ca", "cb"])
                .aggregate([("n_pairs", "sum")])
                .rename_columns(["ca", "cb", "n_pairs"]))

    part = edge_state_messages(
        edge_state_messages(pairs, tstate, "u", ["v"], attach_u,
                            n_rows=n_p + n),
        tstate, "v", ["tu"], attach_v_count, n_rows=n_p + n)
    agg = tree_aggregate_to_table(
        part, ["ca", "cb"], [("n_pairs", "sum")])
    return pa.table({
        "type_a": pa.array(
            vocab[agg["ca"].to_numpy(zero_copy_only=False)]),
        "type_b": pa.array(
            vocab[agg["cb"].to_numpy(zero_copy_only=False)]),
        "n_pairs": agg["n_pairs"]})


def q_colocation_sql() -> str:
    lat, lon = latlon_sql("event_id")
    e2 = _COLOC_EPS * _COLOC_EPS
    return (
        f"WITH p AS (SELECT event_id AS id, {lon} AS x, {lat} AS y "
        "FROM events), "
        "e AS (SELECT a.id AS u, b.id AS v FROM p a JOIN p b "
        "ON a.id < b.id AND (a.x - b.x) * (a.x - b.x) + "
        f"(a.y - b.y) * (a.y - b.y) <= {e2}), "
        "t AS (SELECT ea.event_type AS tu, eb.event_type AS tv FROM e "
        "JOIN events ea ON ea.event_id = e.u "
        "JOIN events eb ON eb.event_id = e.v) "
        "SELECT least(tu, tv) AS type_a, greatest(tu, tv) AS type_b, "
        "CAST(count(*) AS BIGINT) AS n_pairs FROM t GROUP BY 1, 2"
    )


def q_border_buffer(sf_dir: str):
    """Buffer-zone counts: events within 0.5° of each derived border
    segment (point-to-segment distance — projection parameter clamped
    to the segment, perpendicular case via cross²/len² in doubles with
    the identical expression order as the SQL CASE, so the comparison
    replays bit-for-bit).  The 25 segments are a broadcast constant;
    the whole query is one vectorized map over event batches (25-
    iteration fixed loop) plus the bounded combiner tree — the event
    stream never shuffles."""
    from ..stages.agg_tree import tree_aggregate_to_table

    seg, axm, aym, bxm, bym = _border_segments(sf_dir)
    # microdegree segment endpoints → degree doubles (exact: ints
    # < 2^53), matching the SQL's x/1e6 derivation
    ax, ay = axm / 1e6, aym / 1e6
    bx, by = bxm / 1e6, bym / 1e6
    dd = _BUFFER_D * _BUFFER_D

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        segs, cnts = [], []
        for i in range(len(seg)):
            dx, dy = bx[i] - ax[i], by[i] - ay[i]
            px, py = lon - ax[i], lat - ay[i]
            len2 = dx * dx + dy * dy
            tp = px * dx + py * dy
            qx, qy = lon - bx[i], lat - by[i]
            cross = px * dy - py * dx
            d2 = np.where(
                tp <= 0.0, px * px + py * py,
                np.where(tp >= len2, qx * qx + qy * qy,
                         cross * cross / len2))
            segs.append(seg[i])
            cnts.append(int(np.count_nonzero(d2 <= dd)))
        return pa.table({"seg": pa.array(np.array(segs, np.int64)),
                         "n_in": pa.array(np.array(cnts, np.int64))})

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        partial, batch_format="pyarrow")
    return tree_aggregate_to_table(ds, ["seg"], [("n_in", "sum")])


def q_border_buffer_sql() -> str:
    lat, lon = latlon_sql("event_id")
    a_lat, a_lon = latlon_sql("(CAST(n_nationkey AS BIGINT) * 2 + 1001)")
    b_lat, b_lon = latlon_sql("(CAST(n_nationkey AS BIGINT) * 2 + 1002)")
    dd = _BUFFER_D * _BUFFER_D
    return (
        f"WITH p AS (SELECT {lon} AS x, {lat} AS y FROM events), "
        "g AS (SELECT CAST(n_nationkey AS BIGINT) AS seg, "
        f"CAST(floor({a_lon} * 1000000 + 0.5) AS BIGINT) / 1e6 AS ax, "
        f"CAST(floor({a_lat} * 1000000 + 0.5) AS BIGINT) / 1e6 AS ay, "
        f"CAST(floor({b_lon} * 1000000 + 0.5) AS BIGINT) / 1e6 AS bx, "
        f"CAST(floor({b_lat} * 1000000 + 0.5) AS BIGINT) / 1e6 AS by "
        "FROM nation), "
        "d AS (SELECT g.seg, CASE "
        "WHEN (p.x - g.ax) * (g.bx - g.ax) + (p.y - g.ay) * "
        "(g.by - g.ay) <= 0.0 THEN "
        "(p.x - g.ax) * (p.x - g.ax) + (p.y - g.ay) * (p.y - g.ay) "
        "WHEN (p.x - g.ax) * (g.bx - g.ax) + (p.y - g.ay) * "
        "(g.by - g.ay) >= (g.bx - g.ax) * (g.bx - g.ax) + "
        "(g.by - g.ay) * (g.by - g.ay) THEN "
        "(p.x - g.bx) * (p.x - g.bx) + (p.y - g.by) * (p.y - g.by) "
        "ELSE ((p.x - g.ax) * (g.by - g.ay) - (p.y - g.ay) * "
        "(g.bx - g.ax)) * ((p.x - g.ax) * (g.by - g.ay) - "
        "(p.y - g.ay) * (g.bx - g.ax)) / ((g.bx - g.ax) * "
        "(g.bx - g.ax) + (g.by - g.ay) * (g.by - g.ay)) END AS d2 "
        "FROM p CROSS JOIN g) "
        f"SELECT seg, CAST(count(*) FILTER (d2 <= {dd}) AS BIGINT) "
        "AS n_in FROM d GROUP BY 1"
    )


def q_weighted_centroid(sf_dir: str):
    """Value-weighted centroid per 15° grid cell (the weighted-
    center-of-mass map shape): weights are exact cents ints
    (floor(value·100 + 0.5)), positions exact microdegrees, so the
    distributed Σw·x / Σw accumulates as pure int64 partials through
    the combiner tree with ONE pinned double division per cell at the
    end (house float protocol).  Events never shuffle."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        w = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        cx = np.floor((lon + 180.0) / 15.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 15.0).astype(np.int64)
        xm = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        ym = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        t = pa.table({"cx": pa.array(cx), "cy": pa.array(cy),
                      "sw": pa.array(w), "swx": pa.array(w * xm),
                      "swy": pa.array(w * ym)})
        return (t.group_by(["cx", "cy"]).aggregate(
            [("sw", "sum"), ("swx", "sum"), ("swy", "sum")])
            .rename_columns(["cx", "cy", "sw", "swx", "swy"]))

    ds = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        partial, batch_format="pyarrow")
    m = tree_aggregate_to_table(
        ds, ["cx", "cy"],
        [("sw", "sum"), ("swx", "sum"), ("swy", "sum")]).to_pandas()
    m = m[m["sw"] > 0]
    sw = m["sw"].to_numpy().astype(np.float64)
    wx = np.floor(m["swx"].to_numpy().astype(np.float64) / sw + 0.5)
    wy = np.floor(m["swy"].to_numpy().astype(np.float64) / sw + 0.5)
    return pd.DataFrame({
        "cx": m["cx"].to_numpy().astype(np.int64),
        "cy": m["cy"].to_numpy().astype(np.int64),
        "sw": m["sw"].to_numpy().astype(np.int64),
        "wx_micro": wx.astype(np.int64),
        "wy_micro": wy.astype(np.int64)})


def q_weighted_centroid_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 15.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 15.0) AS BIGINT) AS cy, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS w, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym FROM events), "
        "s AS (SELECT cx, cy, CAST(sum(w) AS BIGINT) AS sw, "
        "CAST(sum(w * xm) AS BIGINT) AS swx, "
        "CAST(sum(w * ym) AS BIGINT) AS swy FROM p GROUP BY 1, 2) "
        "SELECT cx, cy, sw, "
        "CAST(floor(CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) + 0.5) "
        "AS BIGINT) AS wx_micro, "
        "CAST(floor(CAST(swy AS DOUBLE) / CAST(sw AS DOUBLE) + 0.5) "
        "AS BIGINT) AS wy_micro FROM s WHERE sw > 0"
    )


def q_morans_i(sf_dir: str):
    """Global Moran's I spatial autocorrelation of event density over
    a 5° grid with queen (8-neighbour) contiguity — THE classic
    geospatial clustering statistic: one distributed counting pass
    (per-cell event counts on the bounded combiner tree, ≤ 72×24
    cells), then the I finalize on the driver over the tiny cell
    table in EXACT integer arithmetic — deviations are scaled by N
    (z·N = N·x_i − Σx, an integer), so the numerator
    Σ_ij w_ij (Nx_i−S)(Nx_j−S) and denominator Σ_i (Nx_i−S)² are
    exact Python bigints at any event count; the single division
    I = (N·num)/(W·den) is one double op pinned to nano (HUGEINT →
    DOUBLE on the oracle side, int → float here — both correctly
    rounded).  W counts ordered neighbour pairs among OCCUPIED cells
    (the empirical contiguity matrix)."""
    m = _grid_cell_counts(sf_dir)
    n_cells = len(m)
    s_tot = int(m["x"].sum())
    z = {(int(r.cx), int(r.cy)): n_cells * int(r.x) - s_tot
         for r in m.itertuples()}
    num = 0
    w_pairs = 0
    for (cx, cy), zi in z.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                zj = z.get((cx + dx, cy + dy))
                if zj is not None:
                    num += zi * zj
                    w_pairs += 1
    den = sum(v * v for v in z.values())
    if w_pairs == 0 or den == 0:
        raise RuntimeError("degenerate grid for Moran's I")
    i_nano = int(np.floor(float(n_cells * num) / float(w_pairs * den)
                          * 1e9 + 0.5))
    return pd.DataFrame({"n_cells": [np.int64(n_cells)],
                         "w_pairs": [np.int64(w_pairs)],
                         "i_nano": [np.int64(i_nano)]})


def q_morans_i_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 5.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 5.0) AS BIGINT) AS cy "
        "FROM events), "
        "c AS MATERIALIZED (SELECT cx, cy, "
        "CAST(count(*) AS BIGINT) AS x FROM p GROUP BY 1, 2), "
        "s AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS n, "
        "CAST(sum(x) AS HUGEINT) AS t FROM c), "
        "z AS MATERIALIZED (SELECT cx, cy, "
        "s.n * x - s.t AS zz FROM c, s), "
        "pr AS (SELECT a.zz AS za, b.zz AS zb FROM z a JOIN z b ON "
        "abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 "
        "AND NOT (a.cx = b.cx AND a.cy = b.cy)), "
        "agg AS (SELECT CAST(count(*) AS HUGEINT) AS w, "
        "CAST(sum(za * zb) AS HUGEINT) AS num FROM pr), "
        "dn AS (SELECT CAST(sum(zz * zz) AS HUGEINT) AS den FROM z) "
        "SELECT CAST(s.n AS BIGINT) AS n_cells, "
        "CAST(agg.w AS BIGINT) AS w_pairs, "
        "CAST(floor(CAST(s.n * agg.num AS DOUBLE) / "
        "CAST(agg.w * dn.den AS DOUBLE) * 1e9 + 0.5) AS BIGINT) "
        "AS i_nano FROM s, agg, dn"
    )


def q_idw_surface(sf_dir: str):
    """Inverse-distance-weighted interpolation of event values onto a
    coarse 48-probe grid (the raster-surface estimation kernel:
    kriging's cheap cousin): the probe grid broadcasts (it is tiny and
    fixed), each batch computes its (event × probe) pair terms
    vectorized — squared distance is an exact int64 in microdegree
    units, and both the value term v/d² and the weight 1/d² are fixed
    double sequences pinned to ints PER PAIR, so the distributed sums
    are exact integer adds in any order; the final estimate is one
    pinned division of the two sums.  Pairs beyond the 15° radius
    drop out, as do pairs INSIDE 0.001° (d² < 10^6 micro²): the inner
    cutoff bounds 1/d² so both pinned terms fit int64 at any point
    placement — without it a point within ~3e-5° of a probe would
    wrap numpy's float→int64 astype while the oracle's CAST raises,
    failing the two sides differently.  At 100 TB nothing changes:
    probes stay broadcast, partials stay (48 × n_blocks) rows on the
    combiner tree."""
    from ..stages.agg_tree import tree_aggregate_to_table

    pxs = np.array([-165 + 30 * k for k in range(12)], np.int64) * 1_000_000
    pys = np.array([-45 + 30 * j for j in range(4)], np.int64) * 1_000_000
    # probes are at whole degrees and fixture points never land on
    # one, so the inner cutoff excludes no fixture pair — it exists
    # to bound 1/d² (see docstring)
    pxm = np.repeat(pxs, len(pys))
    pym = np.tile(pys, len(pxs))
    r2 = (15 * 1_000_000) ** 2

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        v = np.floor(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
        xm = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        ym = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        dx = xm[:, None] - pxm[None, :]
        dy = ym[:, None] - pym[None, :]
        d2 = dx * dx + dy * dy
        ok = (d2 >= _IDW_MIN_D2) & (d2 < r2)
        ev, pr = np.nonzero(ok)
        d2deg = d2[ev, pr].astype(np.float64) / 1e12
        vterm = np.floor(v[ev].astype(np.float64) / d2deg
                         * 1e6 + 0.5).astype(np.int64)
        wterm = np.floor(1.0 / d2deg * 1e6 + 0.5).astype(np.int64)
        t = pa.table({"pxm": pa.array(pxm[pr]), "pym": pa.array(pym[pr]),
                      "n_pts": pa.array(np.ones(len(pr), np.int64)),
                      "sv": pa.array(vterm), "sw": pa.array(wterm)})
        return (t.group_by(["pxm", "pym"]).aggregate(
            [("n_pts", "sum"), ("sv", "sum"), ("sw", "sum")])
            .rename_columns(["pxm", "pym", "n_pts", "sv", "sw"]))

    g = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id", "value"]).map_batches(
            partial, batch_format="pyarrow"),
        ["pxm", "pym"],
        [("n_pts", "sum"), ("sv", "sum"), ("sw", "sum")]).to_pandas()
    g = g[g["sw"] > 0]
    est = np.floor(g["sv"].to_numpy().astype(np.float64)
                   / g["sw"].to_numpy().astype(np.float64)
                   * 100.0 + 0.5).astype(np.int64)
    return pd.DataFrame({
        "pxm": g["pxm"].to_numpy().astype(np.int64),
        "pym": g["pym"].to_numpy().astype(np.int64),
        "n_pts": g["n_pts"].to_numpy().astype(np.int64),
        "est_cq": est})


def q_idw_surface_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH pr AS (SELECT (-165 + 30 * k) * 1000000 AS pxm, "
        "(-45 + 30 * j) * 1000000 AS pym "
        "FROM range(12) t(k), range(4) u(j)), "
        "e AS (SELECT "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS ym, "
        "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v FROM events), "
        "pairs AS (SELECT pxm, pym, v, "
        "(xm - pxm) * (xm - pxm) + (ym - pym) * (ym - pym) AS d2 "
        "FROM e, pr), "
        "t AS (SELECT pxm, pym, "
        "CAST(floor(CAST(v AS DOUBLE) / (CAST(d2 AS DOUBLE) / 1e12) "
        "* 1e6 + 0.5) AS BIGINT) AS vterm, "
        "CAST(floor(1.0 / (CAST(d2 AS DOUBLE) / 1e12) * 1e6 + 0.5) "
        "AS BIGINT) AS wterm FROM pairs "
        f"WHERE d2 >= {_IDW_MIN_D2} AND d2 < {(15 * 1_000_000) ** 2}), "
        "g AS (SELECT pxm, pym, CAST(count(*) AS BIGINT) AS n_pts, "
        "CAST(sum(vterm) AS BIGINT) AS sv, "
        "CAST(sum(wterm) AS BIGINT) AS sw FROM t GROUP BY 1, 2) "
        "SELECT pxm, pym, n_pts, "
        "CAST(floor(CAST(sv AS DOUBLE) / CAST(sw AS DOUBLE) * 100.0 "
        "+ 0.5) AS BIGINT) AS est_cq FROM g WHERE sw > 0"
    )


def q_density_gradient(sf_dir: str):
    """Density gradient field over the 5° event grid (the raster
    derivative — Sobel's geospatial sibling): per-cell central
    differences gx = x[c+1] − x[c−1], gy likewise over the gap-filled
    grid (absent neighbours count 0), magnitude² = gx²+gy² exact
    int64.  One distributed counting pass; the bounded grid finalizes
    on the driver.  Output = the 10 steepest cells (mag² desc, cell
    asc)."""
    m = _grid_cell_counts(sf_dir)
    cells = {(int(r.cx), int(r.cy)): int(r.x) for r in m.itertuples()}
    rows = []
    for (cx, cy), x in cells.items():
        gx = cells.get((cx + 1, cy), 0) - cells.get((cx - 1, cy), 0)
        gy = cells.get((cx, cy + 1), 0) - cells.get((cx, cy - 1), 0)
        rows.append((cx, cy, x, gx * gx + gy * gy))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:10]
    return pd.DataFrame({
        "cx": np.array([r[0] for r in rows], np.int64),
        "cy": np.array([r[1] for r in rows], np.int64),
        "x": np.array([r[2] for r in rows], np.int64),
        "mag2": np.array([r[3] for r in rows], np.int64)})


def q_density_gradient_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 5.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 5.0) AS BIGINT) AS cy "
        "FROM events), "
        "c AS MATERIALIZED (SELECT cx, cy, "
        "CAST(count(*) AS BIGINT) AS x FROM p GROUP BY 1, 2), "
        "g AS (SELECT a.cx, a.cy, a.x, "
        "COALESCE(e.x, 0) - COALESCE(w.x, 0) AS gx, "
        "COALESCE(nn.x, 0) - COALESCE(ss.x, 0) AS gy "
        "FROM c a "
        "LEFT JOIN c e ON e.cx = a.cx + 1 AND e.cy = a.cy "
        "LEFT JOIN c w ON w.cx = a.cx - 1 AND w.cy = a.cy "
        "LEFT JOIN c nn ON nn.cx = a.cx AND nn.cy = a.cy + 1 "
        "LEFT JOIN c ss ON ss.cx = a.cx AND ss.cy = a.cy - 1) "
        "SELECT cx, cy, x, CAST(gx * gx + gy * gy AS BIGINT) AS mag2 "
        "FROM g ORDER BY mag2 DESC, cx, cy LIMIT 10"
    )


def q_getis_ord(sf_dir: str):
    """Getis-Ord Gi* hot-spot detection over the same 5° event grid
    as q_morans_i (the per-cell LOCAL autocorrelation statistic —
    Moran's I is the global one): one distributed counting pass, then
    per-cell Gi* on the driver's bounded cell table.  All moment
    ingredients (n, Σx, Σx², the 9-cell neighbourhood sum Lᵢ and size
    Wᵢ, self included) are exact ints; the Gi* finalize is a fixed
    per-cell double sequence (two correctly-rounded sqrts) pinned to
    nano.  Output = the 15 hottest cells (gi desc, cell asc) — the
    standard hot-spot readout."""
    m = _grid_cell_counts(sf_dir)
    cells = {(int(r.cx), int(r.cy)): int(r.x) for r in m.itertuples()}
    n = len(cells)
    sx = sum(cells.values())
    sxx = sum(v * v for v in cells.values())
    nd, xb = float(n), float(sx) / float(n)
    s = np.sqrt(float(sxx) / nd - xb * xb)
    rows = []
    for (cx, cy), x in cells.items():
        li, wi = 0, 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                xj = cells.get((cx + dx, cy + dy))
                if xj is not None:
                    li += xj
                    wi += 1
        wd = float(wi)
        den = s * np.sqrt((nd * wd - wd * wd) / (nd - 1.0))
        gi = (float(li) - xb * wd) / den
        rows.append((cx, cy, x, int(np.floor(gi * 1e9 + 0.5))))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:15]
    return pd.DataFrame({
        "cx": np.array([r[0] for r in rows], np.int64),
        "cy": np.array([r[1] for r in rows], np.int64),
        "x": np.array([r[2] for r in rows], np.int64),
        "gi_nano": np.array([r[3] for r in rows], np.int64)})


def q_getis_ord_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 5.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 5.0) AS BIGINT) AS cy "
        "FROM events), "
        "c AS MATERIALIZED (SELECT cx, cy, "
        "CAST(count(*) AS BIGINT) AS x FROM p GROUP BY 1, 2), "
        "s AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(x) AS BIGINT) AS sx, "
        "CAST(sum(x * x) AS BIGINT) AS sxx FROM c), "
        "nb AS (SELECT a.cx, a.cy, a.x, "
        "CAST(sum(b.x) AS BIGINT) AS li, "
        "CAST(count(*) AS BIGINT) AS wi FROM c a JOIN c b ON "
        "abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 "
        "GROUP BY 1, 2, 3), "
        "g AS (SELECT cx, cy, x, CAST(floor("
        "(CAST(li AS DOUBLE) - (CAST(sx AS DOUBLE) / "
        "CAST(n AS DOUBLE)) * CAST(wi AS DOUBLE)) / "
        "(sqrt(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE) - "
        "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * "
        "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) * "
        "sqrt((CAST(n AS DOUBLE) * CAST(wi AS DOUBLE) - "
        "CAST(wi AS DOUBLE) * CAST(wi AS DOUBLE)) / "
        "(CAST(n AS DOUBLE) - 1.0))) * 1e9 + 0.5) AS BIGINT) "
        "AS gi_nano FROM nb, s) "
        "SELECT cx, cy, x, gi_nano FROM g "
        "ORDER BY gi_nano DESC, cx, cy LIMIT 15"
    )


def q_quadtree_leaves(sf_dir: str):
    """Hash verification of VARIANCE-SPLIT QUADTREE coding (the
    adaptive raster tiling that q_adaptive_tiles does for the globe,
    applied per image): a block splits when its integer variance
    witness n·Σl² − (Σl)² exceeds T·n² (exact ints; T = 220), down to
    depth 3; block ids use (coord·2^ℓ)//side so non-power-of-two
    sides partition cleanly.  A level-ℓ block is a leaf when every
    ancestor split and it does not (depth-3 blocks are leaves
    whenever reached).  Output = per-image leaf counts per level.
    Oracle replays the pyramid as four grouped scans over the
    generator plane joined down the ancestor chain.  Same head-K /
    scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def quadtree(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.zeros((len(blobs), 4), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            side = y.shape[0]
            xs = np.arange(side, dtype=np.int64)
            split = []
            for lv in range(4):
                m = 1 << lv
                bid = (xs * m) // side
                bx = bid[None, :].repeat(side, 0)
                by = bid[:, None].repeat(side, 1)
                flat = (by * m + bx).ravel()
                n = np.bincount(flat, minlength=m * m)
                s = np.bincount(flat, weights=y.ravel().astype(
                    np.float64), minlength=m * m).astype(np.int64)
                ss = np.bincount(flat, weights=(y * y).ravel().astype(
                    np.float64), minlength=m * m).astype(np.int64)
                split.append((n * ss - s * s)
                             > _QT_VAR_T * n * n)
            alive = np.array([True])
            for lv in range(4):
                m = 1 << lv
                if lv > 0:
                    pm = m // 2
                    idx = np.arange(m * m)
                    pby, pbx = (idx // m) // 2, (idx % m) // 2
                    pidx = pby * pm + pbx
                    alive = alive[pidx] & split[lv - 1][pidx]
                if lv < 3:
                    out[i, lv] = int((alive & ~split[lv]).sum())
                else:
                    out[i, lv] = int(alive.sum())
        return pa.table({"image_id": b["image_id"],
                         "l0": pa.array(out[:, 0]),
                         "l1": pa.array(out[:, 1]),
                         "l2": pa.array(out[:, 2]),
                         "l3": pa.array(out[:, 3])})

    return ds.map_batches(quadtree, batch_format="pyarrow",
                          batch_size=128)


def q_quadtree_leaves_sql() -> str:
    t = _QT_VAR_T
    lvl = []
    for lv in range(4):
        m = 1 << lv
        lvl.append(
            f"b{lv} AS MATERIALIZED (SELECT i, "
            f"(x * {m}) // side AS bx, (y * {m}) // side AS by, "
            f"CAST(count(*) AS BIGINT) AS n, "
            f"CAST(sum(l) AS BIGINT) AS s, "
            f"CAST(sum(l * l) AS BIGINT) AS ss "
            f"FROM lum GROUP BY 1, 2, 3)")
    sp = [f"(b{lv}.n * b{lv}.ss - b{lv}.s * b{lv}.s > "
          f"{t} * b{lv}.n * b{lv}.n)" for lv in range(4)]
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        + ", ".join(lvl) + ", "
        "leaves AS ("
        f"SELECT i, 0 AS lvl FROM b0 WHERE NOT {sp[0]} "
        "UNION ALL "
        "SELECT b1.i, 1 FROM b1 JOIN b0 ON b0.i = b1.i "
        f"WHERE {sp[0]} AND NOT {sp[1]} "
        "UNION ALL "
        "SELECT b2.i, 2 FROM b2 "
        "JOIN b1 ON b1.i = b2.i AND b1.bx = b2.bx // 2 "
        "AND b1.by = b2.by // 2 "
        "JOIN b0 ON b0.i = b2.i "
        f"WHERE {sp[0]} AND {sp[1]} AND NOT {sp[2]} "
        "UNION ALL "
        "SELECT b3.i, 3 FROM b3 "
        "JOIN b2 ON b2.i = b3.i AND b2.bx = b3.bx // 2 "
        "AND b2.by = b3.by // 2 "
        "JOIN b1 ON b1.i = b3.i AND b1.bx = b3.bx // 4 "
        "AND b1.by = b3.by // 4 "
        "JOIN b0 ON b0.i = b3.i "
        f"WHERE {sp[0]} AND {sp[1]} AND {sp[2]}) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') "
        "AS image_id, "
        "CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS l0, "
        "CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS l1, "
        "CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS l2, "
        "CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS l3 FROM leaves GROUP BY 1"
    )


# ---------------------------------------------------------------------------
# round-5 computational-geometry pair: distributed convex hull and per-type
# diameter over exact micro-degree integer coordinates, so every orientation
# test is an exact int64 cross product on both the Ray and DuckDB sides.


_HULL_MOD = 67
_HULL_REM = 3


def _micro_coords(eid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact integer micro-degree coordinates from event_id.  A plain
    multiplicative hash mod 2^32 of the SEQUENTIAL fixture ids is
    affine between wraps, which manufactures EXACT collinear triples
    (seen at sf0.001: one sampled point landed on the precise midpoint
    of two hull vertices) — fatal for a strict-turn hull.  So the id
    goes through a murmur-style xor-shift finalizer first; the xors
    cut across carry chains, restoring general position.  numpy's
    int64 wraparound before a mod-2^32 is harmless (2^64 is a multiple
    of 2^32), mirrored by HUGEINT in the oracle."""
    eid = np.asarray(eid, dtype=np.int64)

    def mix(c1: int, c2: int) -> np.ndarray:
        u = (eid * c1 + c2) % 4294967296
        u = u ^ (u >> 16)
        u = (u * 2246822519) % 4294967296
        u = u ^ (u >> 13)
        return u

    u_hi = mix(2654435761, 12345)
    u_lo = mix(1103515245, 54321)
    latm = -60_000_000 + (120_000_000 * u_hi) // 4294967296
    lonm = -180_000_000 + (360_000_000 * u_lo) // 4294967296
    return latm, lonm


def _micro_sql() -> tuple[str, str]:
    def mix(c1: int, c2: int) -> str:
        u = (f"CAST((CAST(event_id AS HUGEINT) * {c1} + {c2}) "
             "% 4294967296 AS BIGINT)")
        u = f"xor({u}, {u} // 65536)"
        u = f"CAST((CAST({u} AS HUGEINT) * 2246822519) % 4294967296 AS BIGINT)"
        return f"xor({u}, {u} // 8192)"

    latm = (f"CAST(-60000000 + (120000000 * {mix(2654435761, 12345)}) "
            "// 4294967296 AS BIGINT)")
    lonm = (f"CAST(-180000000 + (360000000 * {mix(1103515245, 54321)}) "
            "// 4294967296 AS BIGINT)")
    return latm, lonm


def _chain(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Andrew monotone chain over unique sorted int points; strict
    turns (cross <= 0 pops) exclude collinear boundary points —
    matching the oracle's strictly-left edge test."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts

    def half(seq):
        out: list[tuple[int, int]] = []
        for p in seq:
            while len(out) >= 2 and (
                    (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                    - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]


def _hull_partials(sf_dir: str):
    """Sampled events → per-block LOCAL hulls (map_batches): each
    block reduces to its own hull vertices (O(log n) of a random
    block), so only hull candidates — never raw points — reach the
    merge.  Hulls compose (hull(A ∪ B) = hull(hull(A) ∪ hull(B))),
    which is the whole 100-TB story: the reduce set stays tiny no
    matter the input size."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        keep = eid % _HULL_MOD == _HULL_REM
        b = b.filter(pa.array(keep))
        eid = eid[keep]
        latm, lonm = _micro_coords(eid)
        types = b["event_type"].to_pylist()
        by_type: dict[str, list[tuple[int, int]]] = {}
        for t, x, y in zip(types, lonm.tolist(), latm.tolist()):
            by_type.setdefault(t, []).append((x, y))
        rows_t, rows_x, rows_y = [], [], []
        for t, pts in by_type.items():
            for x, y in _chain(pts):
                rows_t.append(t)
                rows_x.append(x)
                rows_y.append(y)
        return pa.table({"event_type": pa.array(rows_t, pa.string()),
                         "x": pa.array(rows_x, pa.int64()),
                         "y": pa.array(rows_y, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow")


def q_convex_hull(sf_dir: str):
    """GLOBAL CONVEX HULL of the sampled event points (event_id %
    67 == 3; exact micro-degree ints): per-block monotone-chain
    partials → one bounded driver fold over the few surviving hull
    candidates → final chain.  Emits the hull vertices as (latm,
    lonm).  Oracle = the O(n³) strictly-left edge test, feasible
    exactly because the sample is bounded at oracle scales; the Ray
    path's per-block contraction is scale-free.  Assumes points in
    general position (the pseudorandom micro grid makes an exact
    collinear hull triple ~1e-7 unlikely, and the fixture is
    deterministic)."""
    cand = _hull_partials(sf_dir).to_pandas()  # bounded: local hulls only
    pts = list(zip(cand["x"].tolist(), cand["y"].tolist()))
    hull = _chain(pts)
    return pd.DataFrame({"latm": [y for _, y in hull],
                         "lonm": [x for x, _ in hull]})


def q_convex_hull_sql() -> str:
    latm, lonm = _micro_sql()
    return (
        f"WITH pts AS (SELECT DISTINCT {lonm} AS x, {latm} AS y "
        f"FROM events WHERE event_id % {_HULL_MOD} = {_HULL_REM}) "
        "SELECT DISTINCT a.y AS latm, a.x AS lonm FROM pts a "
        "JOIN pts b ON NOT (a.x = b.x AND a.y = b.y) "
        "WHERE NOT EXISTS (SELECT 1 FROM pts r WHERE "
        "NOT (r.x = a.x AND r.y = a.y) "
        "AND NOT (r.x = b.x AND r.y = b.y) "
        "AND (b.x - a.x) * (r.y - a.y) "
        "- (b.y - a.y) * (r.x - a.x) <= 0) "
        "UNION SELECT y AS latm, x AS lonm FROM pts "
        "WHERE (SELECT count(*) FROM pts) <= 2"
    )


def q_cluster_diameter(sf_dir: str):
    """Per-event-type DIAMETER (max pairwise squared micro-degree
    distance) of the sampled points via ROTATING-CALIPERS-shaped
    reduction: the diameter pair of a Euclidean point set are both
    hull vertices, so per-block local hulls (shared with
    q_convex_hull) contract each type to a bounded candidate set and
    the exact O(h²) max runs over hulls only — never over raw points.
    Bounded key space (few event types) → driver fold is fine."""
    cand = _hull_partials(sf_dir).to_pandas()
    out_t, out_d = [], []
    for t, grp in cand.groupby("event_type", sort=True):
        hull = _chain(list(zip(grp["x"].tolist(), grp["y"].tolist())))
        best = 0
        for i in range(len(hull)):
            xi, yi = hull[i]
            for xj, yj in hull[i + 1:]:
                d = (xi - xj) ** 2 + (yi - yj) ** 2
                if d > best:
                    best = d
        out_t.append(t)
        out_d.append(best)
    return pd.DataFrame({"event_type": out_t,
                         "diam_sq": pd.array(out_d, dtype="int64")})


def q_cluster_diameter_sql() -> str:
    latm, lonm = _micro_sql()
    return (
        f"WITH pts AS (SELECT DISTINCT event_type, {lonm} AS x, "
        f"{latm} AS y FROM events "
        f"WHERE event_id % {_HULL_MOD} = {_HULL_REM}) "
        "SELECT a.event_type, CAST(COALESCE(max("
        "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)), 0) "
        "AS BIGINT) AS diam_sq "
        "FROM pts a LEFT JOIN pts b ON b.event_type = a.event_type "
        "AND NOT (b.x = a.x AND b.y = a.y) "
        "GROUP BY 1"
    )


def q_closest_pair(sf_dir: str):
    """GLOBAL CLOSEST PAIR of the derived event points — the classic
    computational-geometry primitive, distributed without an
    all-pairs pass: with n points in the data bbox, the pigeonhole
    grid (k = ⌊√(n−1)⌋ per axis ⇒ k² ≤ n−1 cells ⇒ some cell holds
    two points) bounds the answer by one cell diagonal
    r² = sx² + sy², so ONE PBSM radius self-join at r (candidate
    volume O(n) at any scale — each point sees ~2π·r²·density
    neighbours) provably contains the minimum.  Per-batch lexicographic
    (d2, id_a, id_b) partials fold to one driver row.  Skewed data
    only loosens r (more candidates, never a miss); production would
    shrink r by sampled quantiles first.  Oracle replays the same
    grid (3×3 neighbour-offset equijoin) — both sides filter on the
    exact d2 ≤ sx²+sy² sum, and d2 itself is the same IEEE expression
    on both, so the argmin row is bit-identical."""
    from ..stages.spatial_join import point_radius_join

    def pts_fn(b: pa.Table) -> pa.Table:
        k = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(k)
        return pa.table({"id": pa.array(k), "x": pa.array(lon),
                         "y": pa.array(lat)})

    def pts(): return _read(sf_dir, "events", ["event_id"]).map_batches(
        pts_fn, batch_format="pyarrow")

    # pass 1: bbox (per-batch 1-row partials → tiny driver fold)
    def bbox_partial(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        return pa.table({"minx": [float(x.min())], "maxx": [float(x.max())],
                         "miny": [float(y.min())], "maxy": [float(y.max())]})

    bb = pts().map_batches(bbox_partial, batch_format="pyarrow").to_pandas()
    minx, maxx = bb["minx"].min(), bb["maxx"].max()
    miny, maxy = bb["miny"].min(), bb["maxy"].max()
    n = _nrows(sf_dir, "events")
    k = max(1, int(np.floor(np.sqrt(n - 1.0))))
    sx = (maxx - minx) / k
    sy = (maxy - miny) / k
    r2 = sx * sx + sy * sy
    r = float(np.sqrt(r2))

    # pass 2: PBSM radius self-join at a hair over r (the capture set
    # is a superset either way; the EXACT gate below is d2 <= r2, the
    # unsquared sum, identical to the oracle's)
    pairs = point_radius_join(pts(), pts(), radius=r * (1.0 + 1e-12),
                              cell=max(2.0 * r, 1e-9),
                              out_a="event_a", out_b="event_b")

    def best_partial(b: pa.Table) -> pa.Table:
        ea = b["event_a"].to_numpy(zero_copy_only=False)
        eb = b["event_b"].to_numpy(zero_copy_only=False)
        keep = ea < eb
        ea, eb = ea[keep], eb[keep]
        empty = pa.table({"event_a": pa.array([], pa.int64()),
                          "event_b": pa.array([], pa.int64()),
                          "d2": pa.array([], pa.float64())})
        if not len(ea):
            return empty
        ya, xa = derive_latlon(ea)
        yb, xb = derive_latlon(eb)
        dx = xa - xb
        dy = ya - yb
        d2 = dx * dx + dy * dy
        ok = d2 <= r2
        if not ok.any():
            return empty
        ea, eb, d2 = ea[ok], eb[ok], d2[ok]
        i = np.lexsort((eb, ea, d2))[0]
        return pa.table({"event_a": pa.array([ea[i]], pa.int64()),
                         "event_b": pa.array([eb[i]], pa.int64()),
                         "d2": pa.array([d2[i]], pa.float64())})

    best = pairs.map_batches(best_partial,
                             batch_format="pyarrow").to_pandas()
    return (best.sort_values(["d2", "event_a", "event_b"],
                             kind="mergesort")
            .head(1).reset_index(drop=True))


def q_closest_pair_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH a AS (SELECT event_id, {lon} AS x, {lat} AS y "
        "FROM events), "
        "s AS (SELECT count(*) AS n, min(x) AS minx, max(x) AS maxx, "
        "min(y) AS miny, max(y) AS maxy FROM a), "
        "p AS (SELECT greatest(1.0, floor(sqrt(CAST(n AS DOUBLE) - 1.0)))"
        " AS k, * FROM s), "
        "q AS (SELECT (maxx - minx) / k AS sx, (maxy - miny) / k AS sy,"
        " * FROM p), "
        "rr AS (SELECT sx * sx + sy * sy AS r2, sqrt(sx * sx + sy * sy)"
        " AS r FROM q), "
        "g AS (SELECT a.event_id, a.x, a.y, "
        "CAST(floor(a.x / rr.r) AS BIGINT) AS cx, "
        "CAST(floor(a.y / rr.r) AS BIGINT) AS cy FROM a, rr), "
        "cand AS (SELECT p1.event_id AS event_a, p2.event_id AS event_b,"
        " (p1.x - p2.x) * (p1.x - p2.x) + (p1.y - p2.y) * (p1.y - p2.y)"
        " AS d2 FROM g p1 "
        "JOIN range(-1, 2) ox(dx) ON true "
        "JOIN range(-1, 2) oy(dy) ON true "
        "JOIN g p2 ON p2.cx = p1.cx + ox.dx AND p2.cy = p1.cy + oy.dy "
        "AND p1.event_id < p2.event_id) "
        "SELECT event_a, event_b, d2 FROM cand, rr WHERE d2 <= rr.r2 "
        "ORDER BY d2, event_a, event_b LIMIT 1"
    )


_RASTER_STEP = 500_000  # 0.5° lattice, microdegrees


def q_triangle_raster(sf_dir: str):
    """VECTOR→RASTER fill: each supplier derives a small triangle
    (v0 = its hashed point pinned to microdegree ints; v1/v2 = v0
    plus pure-integer ±3° deltas) and counts the 0.5° lattice points
    STRICTLY inside it — polygon rasterization by exact integer
    cross-product sign tests (the PIP kernel on a regular grid).
    Embarrassingly parallel: per-batch vectorized bbox→candidate
    expansion (the point_radius_join fan-out pattern), three cross
    products, one bincount — no shuffle at all; the per-triangle
    candidate count is bounded by (6°/0.5°+1)² = 169 at any corpus
    size.  area2 (twice the area, micro²) rides along as the exact
    affine cross-check.  Oracle = the same integer geometry over a
    global lattice restricted by BETWEEN bbox joins."""
    STEP = _RASTER_STEP

    def per(b: pa.Table) -> pa.Table:
        k = b["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(k):
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "n_cells": pa.array([], pa.int64()),
                             "area2": pa.array([], pa.int64())})
        lat, lon = derive_latlon(k)
        x0 = np.floor(lon * 1e6 + 0.5).astype(np.int64)
        y0 = np.floor(lat * 1e6 + 0.5).astype(np.int64)
        d1x = -3_000_000 + (k * 7919) % 1000 * 6000
        d1y = -3_000_000 + (k * 104729) % 1000 * 6000
        d2x = -3_000_000 + (k * 1299709) % 1000 * 6000
        d2y = -3_000_000 + (k * 15485863) % 1000 * 6000
        x1, y1 = x0 + d1x, y0 + d1y
        x2, y2 = x0 + d2x, y0 + d2y
        minx = np.minimum(np.minimum(x0, x1), x2)
        maxx = np.maximum(np.maximum(x0, x1), x2)
        miny = np.minimum(np.minimum(y0, y1), y2)
        maxy = np.maximum(np.maximum(y0, y1), y2)
        gx0 = -((-minx) // STEP)   # ceil
        gx1 = maxx // STEP         # floor
        gy0 = -((-miny) // STEP)
        gy1 = maxy // STEP
        nx = np.maximum(gx1 - gx0 + 1, 0)
        ny = np.maximum(gy1 - gy0 + 1, 0)
        total = nx * ny
        rep = np.repeat(np.arange(len(k), dtype=np.int64), total)
        offs = np.cumsum(total) - total
        local = np.arange(int(total.sum()), dtype=np.int64) \
            - np.repeat(offs, total)
        px = (gx0[rep] + local % nx[rep]) * STEP
        py = (gy0[rep] + local // nx[rep]) * STEP
        c1 = (x1 - x0)[rep] * (py - y0[rep]) \
            - (y1 - y0)[rep] * (px - x0[rep])
        c2 = (x2 - x1)[rep] * (py - y1[rep]) \
            - (y2 - y1)[rep] * (px - x1[rep])
        c3 = (x0 - x2)[rep] * (py - y2[rep]) \
            - (y0 - y2)[rep] * (px - x2[rep])
        inside = ((c1 > 0) & (c2 > 0) & (c3 > 0)) \
            | ((c1 < 0) & (c2 < 0) & (c3 < 0))
        cnt = np.bincount(rep[inside], minlength=len(k)).astype(np.int64)
        area2 = np.abs((x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0))
        return pa.table({"s_suppkey": pa.array(k),
                         "n_cells": pa.array(cnt),
                         "area2": pa.array(area2)})

    return _read(sf_dir, "supplier", ["s_suppkey"]).map_batches(
        per, batch_format="pyarrow")


def q_triangle_raster_sql() -> str:
    lat, lon = latlon_sql("s_suppkey")
    STEP = _RASTER_STEP
    return (
        f"WITH tri AS (SELECT s_suppkey AS k, "
        f"CAST(floor({lon} * 1e6 + 0.5) AS BIGINT) AS x0, "
        f"CAST(floor({lat} * 1e6 + 0.5) AS BIGINT) AS y0 "
        "FROM supplier), "
        "v AS (SELECT k, x0, y0, "
        "x0 - 3000000 + (k * 7919) % 1000 * 6000 AS x1, "
        "y0 - 3000000 + (k * 104729) % 1000 * 6000 AS y1, "
        "x0 - 3000000 + (k * 1299709) % 1000 * 6000 AS x2, "
        "y0 - 3000000 + (k * 15485863) % 1000 * 6000 AS y2 FROM tri), "
        "cand AS (SELECT v.*, "
        f"gx * {STEP} AS px, gy * {STEP} AS py "
        "FROM v JOIN range(-367, 368) tx(gx) "
        f"ON gx * {STEP} BETWEEN least(x0, x1, x2) "
        "AND greatest(x0, x1, x2) "
        "JOIN range(-127, 128) ty(gy) "
        f"ON gy * {STEP} BETWEEN least(y0, y1, y2) "
        "AND greatest(y0, y1, y2)), "
        "c AS (SELECT k, "
        "(x1 - x0) * (py - y0) - (y1 - y0) * (px - x0) AS c1, "
        "(x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) AS c2, "
        "(x0 - x2) * (py - y2) - (y0 - y2) * (px - x2) AS c3 "
        "FROM cand), "
        "n AS (SELECT k, count(*) AS cnt FROM c "
        "WHERE (c1 > 0 AND c2 > 0 AND c3 > 0) "
        "OR (c1 < 0 AND c2 < 0 AND c3 < 0) GROUP BY 1) "
        "SELECT v.k AS s_suppkey, "
        "CAST(COALESCE(n.cnt, 0) AS BIGINT) AS n_cells, "
        "CAST(abs((x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)) "
        "AS BIGINT) AS area2 "
        "FROM v LEFT JOIN n ON n.k = v.k"
    )


_MM_SCALE = 1_000  # interior-distance quantization: cross² ≤ ~8.7e14
# at centidegree scale (|w| ≤ 36600+12600, |d| ≤ 600), so ×10³ stays
# within int64 on both sides; 10⁶ overflows for antipodal points


def q_map_match(sf_dir: str):
    """MAP MATCHING: snap every event point to its nearest derived
    road segment (segments hashed off the nation table keys — a bounded
    small side, broadcast by construction; the per-batch kernel is one
    (n_points × n_segments) integer matrix, NO shuffle at all).
    Coordinates are centidegree ints; the point-to-segment distance is
    the exact integer CASE split on dot products (before-start /
    past-end endpoints vs interior), with the interior distance
    quantized as q = (cross²·10³) // len² — all products within int64
    at centidegree scale — so the argmin (ties broken by lowest
    seg_id, numpy argmin-first == SQL ORDER BY q, seg) is
    partition-exact.  At unbounded segment counts the broadcast
    becomes the cell-bucketed PBSM candidate join (stages/
    spatial_join.py); 25 keeps the oracle a cross join.  Oracle =
    the same integer geometry over events × nation."""
    S = _MM_SCALE

    def segs() -> tuple:
        # derive segments FROM the nation table keys (25 at TPC-H
        # scales) — the oracle reads the same table, so a fixture with
        # fewer nations stays in contract; the table is KB-sized, read
        # once on the driver and closure-broadcast
        import pyarrow.parquet as pq
        k = np.sort(pq.read_table(
            os.path.join(sf_dir, "nation.parquet"),
            columns=["n_nationkey"])["n_nationkey"].to_numpy(
            zero_copy_only=False).astype(np.int64))
        lat, lon = derive_latlon(k)
        ax = np.floor(lon * 1e2 + 0.5).astype(np.int64)
        ay = np.floor(lat * 1e2 + 0.5).astype(np.int64)
        bx = ax + (-600 + (k * 7919) % 100 * 12)
        by = ay + (-600 + (k * 104729) % 100 * 12)
        return ax, ay, bx, by

    ax, ay, bx, by = segs()
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy

    def per(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False)
        if not len(e):
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "seg": pa.array([], pa.int64()),
                             "q": pa.array([], pa.int64())})
        lat, lon = derive_latlon(e)
        px = np.floor(lon * 1e2 + 0.5).astype(np.int64)[:, None]
        py = np.floor(lat * 1e2 + 0.5).astype(np.int64)[:, None]
        wx, wy = px - ax[None, :], py - ay[None, :]
        dot = wx * dx[None, :] + wy * dy[None, :]
        cross = wx * dy[None, :] - wy * dx[None, :]
        d2a = wx * wx + wy * wy
        vx, vy = px - bx[None, :], py - by[None, :]
        d2b = vx * vx + vy * vy
        interior = (cross * cross * S) // len2[None, :]
        q = np.where(dot <= 0, d2a * S,
                     np.where(dot >= len2[None, :], d2b * S, interior))
        seg = np.argmin(q, axis=1).astype(np.int64)
        return pa.table({"event_id": pa.array(e),
                         "seg": pa.array(seg),
                         "q": pa.array(q[np.arange(len(e)), seg])})

    from ..stages.scan import hash_bucket_scan

    # one ids-only distinct exchange: the snap is functional in
    # event_id, and the oracle's rn=1 is per DISTINCT id — duplicate
    # event rows must not double-emit
    ids = hash_bucket_scan(
        _read(sf_dir, "events", ["event_id"]),
        ["event_id"],
        lambda t: t.group_by(["event_id"]).aggregate([]),
        n_rows=_nrows(sf_dir, "events"))
    return ids.map_batches(per, batch_format="pyarrow")


def q_map_match_sql() -> str:
    slat, slon = latlon_sql("CAST(n_nationkey AS BIGINT)")
    elat, elon = latlon_sql("event_id")
    S = _MM_SCALE
    return (
        f"WITH seg0 AS (SELECT CAST(n_nationkey AS BIGINT) AS seg, "
        f"CAST(floor({slon} * 1e2 + 0.5) AS BIGINT) AS ax, "
        f"CAST(floor({slat} * 1e2 + 0.5) AS BIGINT) AS ay "
        "FROM nation), "
        "seg AS (SELECT seg, ax, ay, "
        "ax - 600 + (seg * 7919) % 100 * 12 AS bx, "
        "ay - 600 + (seg * 104729) % 100 * 12 AS by FROM seg0), "
        f"pt AS (SELECT event_id, "
        f"CAST(floor({elon} * 1e2 + 0.5) AS BIGINT) AS px, "
        f"CAST(floor({elat} * 1e2 + 0.5) AS BIGINT) AS py FROM events), "
        "sc AS (SELECT event_id, seg, "
        "CASE WHEN (px - ax) * (bx - ax) + (py - ay) * (by - ay) <= 0 "
        f"THEN ((px - ax) * (px - ax) + (py - ay) * (py - ay)) * {S} "
        "WHEN (px - ax) * (bx - ax) + (py - ay) * (by - ay) >= "
        "(bx - ax) * (bx - ax) + (by - ay) * (by - ay) "
        f"THEN ((px - bx) * (px - bx) + (py - by) * (py - by)) * {S} "
        "ELSE ((px - ax) * (by - ay) - (py - ay) * (bx - ax)) "
        f"* ((px - ax) * (by - ay) - (py - ay) * (bx - ax)) * {S} "
        "// ((bx - ax) * (bx - ax) + (by - ay) * (by - ay)) END AS q "
        "FROM pt, seg), "
        "r AS (SELECT event_id, seg, q, row_number() OVER "
        "(PARTITION BY event_id ORDER BY q, seg) AS rn FROM sc) "
        "SELECT event_id, seg, q FROM r WHERE rn = 1"
    )


def q_box_isect_area(sf_dir: str):
    """RECTANGLE INTERSECTION AREA per overlapping (event, part) box
    pair — the spatial-overlay measure on top of the PBSM join: pairs
    from box_overlap_join (grid co-partition, reference-point dedup),
    then a map stage re-derives both boxes FROM THE IDS (coordinates
    never ride the shuffle — the q_traj_intersections trick) and pins
    area = (min(xmax)−max(xmin))·(min(ymax)−max(ymin)) as
    floor(·10⁶ + 0.5).  Oracle = the box_join SQL with the same
    least/greatest expression."""
    from ..stages.spatial_join import box_overlap_join

    a = _read(sf_dir, "events", ["event_id"]).map_batches(
        _event_boxes, batch_format="pyarrow")
    b = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        _part_boxes, batch_format="pyarrow")
    pairs = box_overlap_join(a, b, cell=8.0,
                             out_a="event_id", out_b="p_partkey")

    def area(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False)
        p = t["p_partkey"].to_numpy(zero_copy_only=False)
        elat, elon = derive_latlon(e)
        plat, plon = derive_latlon(p)
        ehw = 0.5 + (e % 5).astype(np.float64) * 0.6
        ehh = 0.5 + (e % 4).astype(np.float64) * 0.75
        phw = 1.0 + (p % 4).astype(np.float64) * 0.7
        phh = 1.0 + (p % 3).astype(np.float64) * 0.8
        ox = np.minimum(elon + ehw, plon + phw) \
            - np.maximum(elon - ehw, plon - phw)
        oy = np.minimum(elat + ehh, plat + phh) \
            - np.maximum(elat - ehh, plat - phh)
        return pa.table({
            "event_id": pa.array(e), "p_partkey": pa.array(p),
            "area_micro": pa.array(np.floor(ox * oy * 1e6 + 0.5
                                            ).astype(np.int64))})

    return pairs.map_batches(area, batch_format="pyarrow")


def q_box_isect_area_sql() -> str:
    elat, elon = latlon_sql("event_id")
    plat, plon = latlon_sql("p_partkey")
    return f"""
WITH a AS (
  SELECT event_id,
         {elon} - (0.5 + (event_id % 5) * 0.6) AS xmin,
         {elon} + (0.5 + (event_id % 5) * 0.6) AS xmax,
         {elat} - (0.5 + (event_id % 4) * 0.75) AS ymin,
         {elat} + (0.5 + (event_id % 4) * 0.75) AS ymax
  FROM events
), b AS (
  SELECT p_partkey,
         {plon} - (1.0 + (p_partkey % 4) * 0.7) AS xmin,
         {plon} + (1.0 + (p_partkey % 4) * 0.7) AS xmax,
         {plat} - (1.0 + (p_partkey % 3) * 0.8) AS ymin,
         {plat} + (1.0 + (p_partkey % 3) * 0.8) AS ymax
  FROM part
)
SELECT a.event_id, b.p_partkey,
 CAST(floor((least(a.xmax, b.xmax) - greatest(a.xmin, b.xmin))
  * (least(a.ymax, b.ymax) - greatest(a.ymin, b.ymin)) * 1e6 + 0.5)
  AS BIGINT) AS area_micro
FROM a JOIN b
ON a.xmin <= b.xmax AND b.xmin <= a.xmax
AND a.ymin <= b.ymax AND b.ymin <= a.ymax
"""


_HR_ORDER = 8
_HR_BOX = (100, 140, 80, 120)  # cx0, cx1, cy0, cy1 (cell coords, incl.)


def q_hilbert_range(sf_dir: str):
    """HILBERT-CURVE RANGE SCAN: count events inside a grid-aligned
    lat/lon box by (1) enumerating the box's cells on the order-8
    Hilbert curve driver-side (bounded — ≤ 41×41 cells), (2) merging
    consecutive keys into ranges, and (3) counting events whose
    Hilbert key lands in any range via one broadcast + searchsorted
    per batch + combiner-tree sum — the index-range-scan access path
    a curve-ordered 100 TB table uses instead of a full scan.  The
    oracle counts the SAME box directly on cell coordinates, so
    equality proves the curve encode and the cover enumeration agree
    exactly (the box is grid-aligned, so no partial-cell slack)."""
    from ..geo.hilbert import hilbert_d, hilbert_xy_from_latlon
    from ..stages.agg_tree import tree_aggregate_to_table

    cx0, cx1, cy0, cy1 = _HR_BOX
    gx, gy = np.meshgrid(np.arange(cx0, cx1 + 1, dtype=np.int64),
                         np.arange(cy0, cy1 + 1, dtype=np.int64))
    keys = np.sort(hilbert_d(gx.ravel(), gy.ravel(), _HR_ORDER))
    brk = np.flatnonzero(np.diff(keys) > 1)
    starts = keys[np.r_[0, brk + 1]]
    ends = keys[np.r_[brk, len(keys) - 1]]

    def partial(b: pa.Table) -> pa.Table:
        e = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = derive_latlon(e)
        x, y = hilbert_xy_from_latlon(lat, lon, _HR_ORDER)
        d = hilbert_d(x, y, _HR_ORDER)
        pos = np.searchsorted(starts, d, side="right") - 1
        inside = (pos >= 0) & (d <= ends[np.clip(pos, 0, len(ends) - 1)])
        return pa.table({"one": pa.array(np.zeros(1, np.int64)),
                         "n": pa.array(np.array([int(inside.sum())],
                                                np.int64))})

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            partial, batch_format="pyarrow"),
        ["one"], [("n", "sum")])
    return pd.DataFrame({"n_in_box": tab["n"].to_numpy(
        zero_copy_only=False).astype(np.int64)})


def q_hilbert_range_sql() -> str:
    lat, lon = latlon_sql("event_id")
    n = 1 << _HR_ORDER
    cx0, cx1, cy0, cy1 = _HR_BOX
    return (
        f"WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 360.0 * {n}) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 90.0) / 180.0 * {n}) AS BIGINT) AS cy "
        "FROM events) "
        "SELECT CAST(count(*) AS BIGINT) AS n_in_box FROM p "
        f"WHERE cx BETWEEN {cx0} AND {cx1} "
        f"AND cy BETWEEN {cy0} AND {cy1}"
    )


def q_quadkeys(sf_dir: str):
    """BING-MAPS QUADKEY encoding at z=12 — the string tile-key format
    interop layer (quadkey digit d_i interleaves the tile x/y bits at
    level i): per distinct tile its quadkey string and point count.
    The tile math is the hash-verified web-mercator path; the digit
    build is one vectorized base-4 loop over 12 levels.  Oracle
    rebuilds the string with 12 CASE digits — equality pins the bit
    interleave exactly."""
    from ..stages.agg_tree import tree_aggregate_to_table

    Z = 12

    def enc(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        x, y = tile_xy(lat, lon, Z)
        t = pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y),
                      "n": pa.array(np.ones(len(x), np.int64))})
        return (t.group_by(["tile_x", "tile_y"]).aggregate([("n", "sum")])
                .rename_columns(["tile_x", "tile_y", "n"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            enc, batch_format="pyarrow"),
        ["tile_x", "tile_y"], [("n", "sum")]).to_pandas()
    x = tab["tile_x"].to_numpy().astype(np.int64)
    y = tab["tile_y"].to_numpy().astype(np.int64)
    digits = np.zeros((len(x), Z), np.int64)
    for i in range(Z):
        bit = Z - 1 - i
        digits[:, i] = ((x >> bit) & 1) + 2 * ((y >> bit) & 1)
    qk = np.array(["".join(str(d) for d in row) for row in digits],
                  object)
    return pd.DataFrame({"quadkey": qk.astype(str),
                         "n": tab["n"].to_numpy().astype(np.int64)})


def q_quadkeys_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 12)
    digs = " || ".join(
        f"CAST((x // {1 << (11 - i)}) % 2 + 2 * ((y // {1 << (11 - i)})"
        " % 2) AS VARCHAR)" for i in range(12))
    return (
        f"WITH t AS (SELECT {xe} AS x, {ye} AS y FROM events), "
        "g AS (SELECT x, y, count(*) AS n FROM t GROUP BY 1, 2) "
        f"SELECT {digs} AS quadkey, CAST(n AS BIGINT) AS n FROM g"
    )


def q_clark_evans(sf_dir: str):
    """CLARK-EVANS nearest-neighbour inputs for the 'signup' point
    pattern — the aggregation-vs-dispersion screen: per point the
    distance to its nearest OTHER point (via the per-cell sorted
    Hilbert-key index, k=2 probed against the same point set, self
    dropped by id — coincident points still yield the correct 0), and
    the exact global fold (n, Σ floor(nn_dist·10⁶ + 0.5)).  Distances
    are re-derived FROM THE ID PAIR (the q_box_isect_area trick), so
    the index never needs to ship floats.  Oracle = the quadratic
    min-distance join over the same derived points."""
    import pyarrow.parquet as pq

    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.knn import CellKnnIndex

    con_cols = ["event_id", "event_type"]
    tab = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                        columns=con_cols)
    keep = tab["event_type"].to_numpy(zero_copy_only=False) == "signup"
    ids = tab["event_id"].to_numpy(zero_copy_only=False)[keep].astype(
        np.int64)
    lat, lon = derive_latlon(ids)
    index = CellKnnIndex(lat, lon, ids, res=5)

    def probe(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        e = b["event_id"].to_numpy(zero_copy_only=False)[
            et == "signup"].astype(np.int64)
        if not len(e):
            return pa.table({"one": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        plat, plon = derive_latlon(e)
        t = index.query_batch(plat, plon, 2, qids=e)
        pid = t["probe_id"].to_numpy(zero_copy_only=False)
        nid = t["neighbor_id"].to_numpy(zero_copy_only=False)
        ok = pid != nid
        pid, nid = pid[ok], nid[ok]
        alat, alon = derive_latlon(pid)
        blat, blon = derive_latlon(nid)
        dx = alon - blon
        dy = alat - blat
        d2 = dx * dx + dy * dy
        # per probe keep the min remaining d2 (k=2 minus self)
        order = np.lexsort((d2, pid))
        pid, d2 = pid[order], d2[order]
        first = np.ones(len(pid), dtype=bool)
        first[1:] = pid[1:] != pid[:-1]
        nn = np.floor(np.sqrt(d2[first]) * 1e6 + 0.5).astype(np.int64)
        return pa.table({"one": pa.array(np.zeros(1, np.int64)),
                         "n": pa.array(np.array([int(first.sum())],
                                                np.int64)),
                         "s": pa.array(np.array([int(nn.sum())],
                                                np.int64))})

    agg = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id", "event_type"]).map_batches(
            probe, batch_format="pyarrow"),
        ["one"], [("n", "sum"), ("s", "sum")]).to_pandas()
    if not len(agg):   # no points of the type: the (0, 0) total row
        return pd.DataFrame({"n": [np.int64(0)],
                             "sum_nn_micro": [np.int64(0)]})
    return pd.DataFrame({"n": agg["n"].to_numpy().astype(np.int64),
                         "sum_nn_micro": agg["s"].to_numpy().astype(
                             np.int64)})


def q_clark_evans_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        f"WITH p AS (SELECT event_id, {lon} AS x, {lat} AS y "
        "FROM events WHERE event_type = 'signup'), "
        "nn AS (SELECT a.event_id, min((a.x - b.x) * (a.x - b.x) "
        "+ (a.y - b.y) * (a.y - b.y)) AS d2 "
        "FROM p a JOIN p b ON b.event_id <> a.event_id GROUP BY 1) "
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(COALESCE(sum(CAST(floor(sqrt(d2) * 1e6 + 0.5) "
        "AS BIGINT)), 0) AS BIGINT) AS sum_nn_micro FROM nn"
    )


def q_tile_entropy(sf_dir: str):
    """MULTI-SCALE SPATIAL HETEROGENEITY: Shannon entropy of the
    event-count distribution over occupied web-mercator tiles at
    z ∈ {6, 8, 10} — ONE data pass builds the z10 leaf on the
    combiner tree and the coarser zooms re-derive by bit-shift (the
    q_tile_pyramid nesting), then each level's entropy folds from
    exact counts with int-pinned terms (q_type_entropy recipe).
    Emits (z, h_nano, n_tiles)."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def leaf(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        x, y = tile_xy(lat, lon, 10)
        t = pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y),
                      "n": pa.array(np.ones(len(x), np.int64))})
        return (t.group_by(["tile_x", "tile_y"]).aggregate([("n", "sum")])
                .rename_columns(["tile_x", "tile_y", "n"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            leaf, batch_format="pyarrow"),
        ["tile_x", "tile_y"], [("n", "sum")]).to_pandas()
    out = []
    for z in (10, 8, 6):
        shift = 10 - z
        d = pd.DataFrame({
            "x": tab["tile_x"].to_numpy() >> shift,
            "y": tab["tile_y"].to_numpy() >> shift,
            "n": tab["n"].to_numpy()})
        g = d.groupby(["x", "y"])["n"].sum()
        c = g.to_numpy().astype(np.float64)
        tot = c.sum()
        p = c / tot
        terms = np.floor(-(p * np.log(p)) * 1e9 + 0.5).astype(np.int64)
        out.append((z, int(terms.sum()), len(c)))
    return pd.DataFrame(out, columns=["z", "h_nano", "n_tiles"]
                        ).astype(np.int64)


def q_tile_entropy_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 10)
    parts = []
    for z in (10, 8, 6):
        shift = 10 - z
        parts.append(
            f"SELECT {z} AS z, CAST(sum(term) AS BIGINT) AS h_nano, "
            "CAST(count(*) AS BIGINT) AS n_tiles FROM ("
            f"SELECT CAST(floor(-((CAST(n AS DOUBLE) / tot) * "
            "ln(CAST(n AS DOUBLE) / tot)) * 1e9 + 0.5) AS BIGINT) "
            "AS term FROM ("
            f"SELECT x // {1 << shift} AS gx, y // {1 << shift} AS gy, "
            "sum(n) AS n, sum(sum(n)) OVER () AS tot "
            "FROM leaf GROUP BY 1, 2))")
    return (
        f"WITH pts AS (SELECT {xe} AS x, {ye} AS y FROM events), "
        "leaf AS (SELECT x, y, count(*) AS n FROM pts GROUP BY 1, 2) "
        + " UNION ALL ".join(parts)
    )


def q_box_cover_cells(sf_dir: str):
    """COVERAGE AREA of the union of event boxes, exactly, by 0.5°
    cell decomposition: every box enumerates the lattice cells whose
    center it contains (bounded fan-out — the box sizes are bounded by
    derivation), the distinct covered-cell count folds through one
    cell-keyed exchange, and the answer is exact — the scanline union
    without the sequential sweep.  Distinctness makes overlap
    handling free at any scale.  Oracle = the same enumeration via
    BETWEEN range joins + COUNT(DISTINCT)."""
    from ..stages.agg_tree import tree_aggregate_to_table
    from ..stages.scan import hash_bucket_scan

    STEP = 500_000  # microdegrees

    def cells(b: pa.Table) -> pa.Table:
        t = _event_boxes(b)
        xmin = np.floor(t["xmin"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        xmax = np.floor(t["xmax"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        ymin = np.floor(t["ymin"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        ymax = np.floor(t["ymax"].to_numpy() * 1e6 + 0.5).astype(np.int64)
        # cell center (gx+0.5)·STEP inside [xmin, xmax]:
        # gx ≥ ceil(xmin/STEP − 0.5), gx ≤ floor(xmax/STEP − 0.5)
        gx0 = -((-(2 * xmin - STEP)) // (2 * STEP))
        gx1 = (2 * xmax - STEP) // (2 * STEP)
        gy0 = -((-(2 * ymin - STEP)) // (2 * STEP))
        gy1 = (2 * ymax - STEP) // (2 * STEP)
        nx = np.maximum(gx1 - gx0 + 1, 0)
        ny = np.maximum(gy1 - gy0 + 1, 0)
        total = nx * ny
        rep = np.repeat(np.arange(len(nx), dtype=np.int64), total)
        offs = np.cumsum(total) - total
        loc = np.arange(int(total.sum()), dtype=np.int64) \
            - np.repeat(offs, total)
        gx = gx0[rep] + loc % nx[rep]
        gy = gy0[rep] + loc // nx[rep]
        tt = pa.table({"cell": pa.array(gy * np.int64(1 << 21) + gx),
                       "one": pa.array(np.ones(len(gx), np.int64))})
        return (tt.group_by(["cell"]).aggregate([("one", "min")])
                .rename_columns(["cell", "one"]))

    distinct = hash_bucket_scan(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            cells, batch_format="pyarrow"),
        ["cell"], lambda t: t.group_by(["cell"]).aggregate([]),
        n_rows=_nrows(sf_dir, "events") * 40)
    n = distinct.count()
    return pd.DataFrame({"n_cells": [np.int64(n)]})


def q_box_cover_cells_sql() -> str:
    elat, elon = latlon_sql("event_id")
    STEP = 500_000
    return f"""
WITH b AS (
  SELECT CAST(floor(({elon} - (0.5 + (event_id % 5) * 0.6)) * 1e6 + 0.5)
         AS BIGINT) AS xmin,
         CAST(floor(({elon} + (0.5 + (event_id % 5) * 0.6)) * 1e6 + 0.5)
         AS BIGINT) AS xmax,
         CAST(floor(({elat} - (0.5 + (event_id % 4) * 0.75)) * 1e6 + 0.5)
         AS BIGINT) AS ymin,
         CAST(floor(({elat} + (0.5 + (event_id % 4) * 0.75)) * 1e6 + 0.5)
         AS BIGINT) AS ymax
  FROM events
)
SELECT CAST(count(DISTINCT gy * 2097152 + gx) AS BIGINT) AS n_cells
FROM b
JOIN range(-367, 368) tx(gx)
  ON gx * {2 * STEP} >= 2 * b.xmin - {STEP}
 AND gx * {2 * STEP} <= 2 * b.xmax - {STEP}
JOIN range(-127, 128) ty(gy)
  ON gy * {2 * STEP} >= 2 * b.ymin - {STEP}
 AND gy * {2 * STEP} <= 2 * b.ymax - {STEP}
"""


def q_simpson_tiles(sf_dir: str):
    """SIMPSON DIVERSITY per z=6 tile — the ecology sibling of
    entropy, EXACT as integers: D_num = Σ_type n·(n−1) and
    D_den = N·(N−1) per tile (the probability two events in the tile
    share a type).  Bounded (tile, type) keys ride one combiner tree;
    no float anywhere."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        x, y = tile_xy(lat, lon, 6)
        t = pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y),
                      "et": b["event_type"],
                      "n": pa.array(np.ones(len(x), np.int64))})
        return (t.group_by(["tile_x", "tile_y", "et"])
                .aggregate([("n", "sum")])
                .rename_columns(["tile_x", "tile_y", "et", "n"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events",
              ["event_id", "event_type"]).map_batches(
            partial, batch_format="pyarrow"),
        ["tile_x", "tile_y", "et"], [("n", "sum")]).to_pandas()
    n = tab["n"].to_numpy().astype(np.int64)
    tab["num"] = n * (n - 1)
    g = (tab.groupby(["tile_x", "tile_y"], as_index=False)
         .agg(d_num=("num", "sum"), N=("n", "sum")))
    return pd.DataFrame({
        "tile_x": g["tile_x"].to_numpy().astype(np.int64),
        "tile_y": g["tile_y"].to_numpy().astype(np.int64),
        "d_num": g["d_num"].to_numpy().astype(np.int64),
        "d_den": (g["N"].to_numpy().astype(np.int64)
                  * (g["N"].to_numpy().astype(np.int64) - 1))})


def q_simpson_tiles_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 6)
    return (
        f"WITH p AS (SELECT {xe} AS tile_x, {ye} AS tile_y, event_type "
        "FROM events), "
        "c AS (SELECT tile_x, tile_y, event_type, count(*) AS n "
        "FROM p GROUP BY 1, 2, 3) "
        "SELECT tile_x, tile_y, "
        "CAST(sum(n * (n - 1)) AS BIGINT) AS d_num, "
        "CAST(sum(n) * (sum(n) - 1) AS BIGINT) AS d_den "
        "FROM c GROUP BY 1, 2"
    )


def q_tile_gini(sf_dir: str):
    """SPATIAL GINI — concentration of events over occupied z=8
    tiles, exact by the sorted-rank identity over the bounded
    tile-count table (the inequality view of q_tile_entropy's
    heterogeneity): G_num = Σ(2i−m−1)·cᵢ over counts sorted by
    (count, tile id), G_den = m·Σc.  One combiner-tree pass + a
    bounded driver fold; no floats."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def leaf(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        x, y = tile_xy(lat, lon, 8)
        t = pa.table({"tile": pa.array(y * np.int64(1 << 9) + x),
                      "n": pa.array(np.ones(len(x), np.int64))})
        return (t.group_by(["tile"]).aggregate([("n", "sum")])
                .rename_columns(["tile", "n"]))

    tab = tree_aggregate_to_table(
        _read(sf_dir, "events", ["event_id"]).map_batches(
            leaf, batch_format="pyarrow"),
        ["tile"], [("n", "sum")]).to_pandas()
    c = tab["n"].to_numpy().astype(np.int64)
    tile = tab["tile"].to_numpy().astype(np.int64)
    order = np.lexsort((tile, c))
    c = c[order]
    m = len(c)
    i = np.arange(1, m + 1, dtype=np.int64)
    return pd.DataFrame({
        "g_num": [np.int64(int(((2 * i - m - 1) * c).sum()))],
        "g_den": [np.int64(m * int(c.sum()))],
        "m": [np.int64(m)]})


def q_tile_gini_sql() -> str:
    lat, lon = latlon_sql("event_id")
    xe, ye = tile_sql(lat, lon, 8)
    return (
        f"WITH t AS (SELECT ({ye}) * 512 + ({xe}) AS tile FROM events),"
        " c AS (SELECT tile, count(*) AS n FROM t GROUP BY 1), "
        "r AS (SELECT n, row_number() OVER (ORDER BY n, tile) AS i, "
        "count(*) OVER () AS m FROM c) "
        "SELECT CAST(sum((2 * i - m - 1) * n) AS BIGINT) AS g_num, "
        "CAST(any_value(m) * sum(n) AS BIGINT) AS g_den, "
        "CAST(any_value(m) AS BIGINT) AS m FROM r"
    )
