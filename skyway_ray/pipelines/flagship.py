"""The flagship pipeline: read → geotag/cell-encode → tag filter →
STRtree point-in-polygon join → z/x/y tile stats.

This is the benchmarked end-to-end job (BASELINE.md): every stage is a
``map_batches`` over zero-copy Arrow except the final pre-aggregated
tile groupby.  The boundary side goes through the OSMFilter tag-filter
(the reference's element-selection semantics applied to region tags)
on the driver — it is the small side — then broadcasts via ``ray.put``
into the ``PIPJoiner`` actor pool.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ..filters.osmfilter import parse_osmfilter
from ..filters.vector import CompiledFilter
from ..stages.cellencode import CellEncode
from ..stages.geotag import add_geotag
from ..stages.pip_join import PIPJoiner, make_pip_join_fn
from ..stages.tiling import add_tile_xy, tile_stats


def _default_concurrency() -> int:
    """Actor-pool size that leaves headroom for read/shuffle tasks —
    a pool reserving every CPU starves the upstream read and the
    pipeline stalls; and spawning CPU-count actors costs seconds of
    startup the join doesn't need (its compute is a small fraction of
    the read). Cap at 16."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(2, min(16, cpus - 2))


def _default_read_blocks() -> int:
    """Block-count override for the fixture-scale read.  Measured on
    the bench fixtures: Ray's default (~200 blocks) makes per-block
    overhead dominate; fewer blocks than input files serializes the
    packed read+fused-map chains.  64 (or 2×CPUs if larger) is the
    stable optimum at every CPU level tested (2/8/32) and both 4M and
    16M rows.  At 100 TB the 128 MiB target block size governs instead
    and this override is a no-op-sized hint."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(64, 2 * cpus)

# Default region filter — exercises EQUALS/HAS selection, SET mutation,
# COMMIT/DROP short-circuit on the boundary tags (docs/src/osmfilter.md
# shape, retargeted at OSM-boundary-style tags).
FLAGSHIP_FILTER = (
    "OSMFilter v0.2.0\n"
    "\n"
    'EQUALS "admin_level" "2"\n'
    "\tDROP\n"
    'HAS "boundary"\n'
    '\tSET "included" "yes"\n'
    "\tCOMMIT\n"
    "DROP\n"
)


def load_filtered_boundaries(boundaries_path: str,
                             filter_source: str = FLAGSHIP_FILTER) -> pa.Table:
    """Driver-side: read the small boundary table and run the tag
    filter over it (it is broadcast state, not a Dataset)."""
    table = pq.read_table(boundaries_path)
    if filter_source:
        program = (filter_source if isinstance(filter_source, list)
                   else parse_osmfilter(filter_source))
        table = CompiledFilter(program).apply_table(table)
    return table


def flagship_pipeline(images_path, boundaries_path: str,
                      filter_source: str = FLAGSHIP_FILTER,
                      z: int = 12, mode: str = "inner",
                      concurrency: int | None = None,
                      columns=("image_id", "phash")):
    """Build (lazily) the flagship Dataset: per-tile image counts over
    filter-selected regions.  Consume with ``.to_pandas()`` /
    ``write_parquet`` — nothing is materialized here.

    ``columns`` prunes the read to what the pipeline needs (pass None
    to keep all columns, e.g. when the sink re-emits image bytes).
    """
    import ray
    import ray.data

    ds = ray.data.read_parquet(images_path,
                               columns=list(columns) if columns else None,
                               override_num_blocks=_default_read_blocks())
    ds = ds.map_batches(add_geotag, batch_format="pyarrow")
    ds = ds.map_batches(CellEncode(resolutions=(7, 12)), batch_format="pyarrow")

    boundaries = load_filtered_boundaries(boundaries_path, filter_source)
    ref = ray.put(boundaries)
    # stateless-task join: the 50-region index builds once per worker
    # (process cache) — no actor-pool spawn latency, stage fuses with
    # the upstream maps
    joined = ds.map_batches(make_pip_join_fn(ref, mode=mode),
                            batch_format="pyarrow")
    return tile_stats(joined, z=z)


def flagship_join(images_path, boundaries_path: str,
                  filter_source: str = FLAGSHIP_FILTER, mode: str = "inner",
                  concurrency: int | None = None, columns=None, z: int = 12):
    """The join itself (one row per image×region match, with tile
    columns) — used by golden tests and the per-row invariant check."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(images_path,
                               columns=list(columns) if columns else None,
                               override_num_blocks=_default_read_blocks())
    ds = ds.map_batches(add_geotag, batch_format="pyarrow")
    boundaries = load_filtered_boundaries(boundaries_path, filter_source)
    ref = ray.put(boundaries)
    joined = ds.map_batches(make_pip_join_fn(ref, mode=mode),
                            batch_format="pyarrow")
    return joined.map_batches(lambda b: add_tile_xy(b, z), batch_format="pyarrow")
