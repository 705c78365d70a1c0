"""Web-mercator tile assignment + tile statistics (the wide step).

``add_tile_xy`` is a stateless vectorized transform.  ``tile_stats``
follows the pre-aggregate-then-shuffle pattern: counts are combined
*within* each batch first (one row per tile per batch), so the
``groupby`` shuffle moves only partial aggregates — at 100 TB the
all-to-all exchange carries ~|tiles| rows per block instead of every
image row.  Skew note: dense urban tiles are exactly the hot keys the
pre-aggregation collapses; residual skew across *distinct* tiles is
bounded by 4**z tile keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.tiles import tile_xy


def add_tile_xy(batch: pa.Table, z: int = 12, lat_col: str = "lat",
                lon_col: str = "lon") -> pa.Table:
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    x, y = tile_xy(lat, lon, z)
    batch = batch.append_column("tile_z", pa.array(np.full(len(x), z, np.int8), pa.int8()))
    batch = batch.append_column("tile_x", pa.array(x, pa.int64()))
    batch = batch.append_column("tile_y", pa.array(y, pa.int64()))
    return batch


def _partial_tile_counts(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch (tile_x, tile_y, n) partial counts."""
    g = batch.group_by(["tile_z", "tile_x", "tile_y"]).aggregate([("tile_x", "count")])
    return g.rename_columns(["tile_z", "tile_x", "tile_y", "n"])


def tile_stats(ds, z: int = 12, lat_col: str = "lat", lon_col: str = "lon"):
    """images/sec headline reduction: Dataset → per-tile image counts.

    read → add_tile_xy → per-batch partial counts → small groupby-sum.
    Returns a Dataset with columns (tile_z, tile_x, tile_y, n_images).
    """
    import ray.data

    from .agg_tree import tree_aggregate_to_table

    tiled = ds.map_batches(
        lambda b: _partial_tile_counts(add_tile_xy(b, z, lat_col, lon_col)),
        batch_format="pyarrow",
    )
    # distinct tiles are bounded by 4**z, so after the distributed
    # per-block combine the final merge is a streaming driver reduce
    # (stages/agg_tree.py) — keeping the plan free of all-to-all ops,
    # which would throttle the upstream map stages (executor reserves
    # them a resource share), and avoiding Ray Aggregate's per-group
    # Python overhead over 10^5+ tiny groups
    out = tree_aggregate_to_table(tiled, ["tile_z", "tile_x", "tile_y"],
                                  [("n", "sum")])
    out = out.rename_columns(["tile_z", "tile_x", "tile_y", "n_images"])
    return ray.data.from_arrow(out)
