"""Resumable flagship job: per-shard join outputs + checkpointed tile
stats, with per-partition lineage (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Layout under ``out_dir``::

    join/<shard>/part-*.parquet      one directory per input shard
    join/<shard>/_lineage.json       rows, wall time, input fingerprint
    join/<shard>/_SUCCESS            atomic completion marker
    tiles/…                          stage checkpoint (tile histogram)
    metrics.json                     per-run counters

A rerun skips shards whose marker exists (``state/checkpoint.py``),
recomputes only missing ones, and rebuilds the tile stage from the
join checkpoints — a failed 100 TB run resumes without recomputation.
Entry point is ``ray job submit``-compatible::

    ray job submit -- python -m skyway_ray.pipelines.job \
        --images DIR --boundaries FILE --out DIR
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.cellencode import CellEncode
from ..stages.geotag import add_geotag
from ..stages.pip_join import make_pip_join_fn
from ..state.checkpoint import resumable_shards
from .flagship import FLAGSHIP_FILTER, load_filtered_boundaries


def run_flagship_job(images_path: str, boundaries_path: str, out_dir: str,
                     filter_source: str = FLAGSHIP_FILTER, z: int = 12) -> dict:
    """Returns metrics dict (also written to ``out_dir/metrics.json``)."""
    import ray
    import ray.data

    t_start = time.perf_counter()
    boundaries = load_filtered_boundaries(boundaries_path, filter_source)
    ref = ray.put(boundaries)

    shards = sorted(glob.glob(os.path.join(images_path, "*.parquet"))) \
        if os.path.isdir(images_path) else [images_path]

    enc = CellEncode(resolutions=(7, 12))

    def process_shard(shard: str, tmp_dir: str) -> dict:
        # one Dataset per shard so its output lands in its own
        # directory (the resume unit); stages identical to flagship
        ds = ray.data.read_parquet(shard, columns=["image_id", "phash"])
        ds = ds.map_batches(add_geotag, batch_format="pyarrow")
        ds = ds.map_batches(enc, batch_format="pyarrow")
        ds = ds.map_batches(make_pip_join_fn(ref, mode="inner"),
                            batch_format="pyarrow")
        ds.write_parquet(tmp_dir)
        rows = sum(pq.read_metadata(p).num_rows
                   for p in glob.glob(os.path.join(tmp_dir, "*.parquet")))
        return {"rows": rows, "input": os.path.basename(shard)}

    join_dir = os.path.join(out_dir, "join")
    # shard id = file stem (a '.parquet' suffix on the output DIRECTORY
    # would make readers treat it as a file)
    by_stem = {os.path.splitext(os.path.basename(s))[0]: s for s in shards}

    bst = os.stat(boundaries_path)

    def shard_fingerprint(stem: str) -> dict:
        """Everything a shard's join output depends on: the shard file
        itself, the boundaries table, and the filter program — a change
        in any re-processes instead of reusing stale output."""
        st = os.stat(by_stem[stem])
        return {
            "input": {"path": os.path.basename(by_stem[stem]),
                      "size": st.st_size, "mtime_ns": st.st_mtime_ns},
            "boundaries": {"path": os.path.basename(boundaries_path),
                           "size": bst.st_size, "mtime_ns": bst.st_mtime_ns},
            "filter": filter_source if isinstance(filter_source, str)
            else repr(filter_source),
        }

    shard_result = resumable_shards(
        sorted(by_stem),
        lambda stem, tmp: process_shard(by_stem[stem], tmp),
        join_dir,
        fingerprint_of=shard_fingerprint)

    # tile stage from the join checkpoints
    from ..stages.tiling import tile_stats

    part_files = []
    for d in sorted(os.listdir(join_dir)):
        if os.path.exists(os.path.join(join_dir, d, "_SUCCESS")):
            part_files.extend(sorted(glob.glob(
                os.path.join(join_dir, d, "*.parquet"))))
    joined = ray.data.read_parquet(part_files)
    stats = tile_stats(joined, z=z)
    tiles_dir = os.path.join(out_dir, "tiles")
    import shutil

    tmp = tiles_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    stats.write_parquet(tmp)
    shutil.rmtree(tiles_dir, ignore_errors=True)
    os.replace(tmp, tiles_dir)

    metrics = {
        "shards_done": shard_result["done"],
        "shards_skipped": shard_result["skipped"],
        "shards_stale": shard_result.get("stale", []),
        "n_tiles": sum(pq.read_metadata(p).num_rows
                       for p in glob.glob(os.path.join(tiles_dir, "*.parquet"))),
        "wall_time_sec": round(time.perf_counter() - t_start, 3),
    }
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True)
    p.add_argument("--boundaries", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--zoom", type=int, default=12)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    metrics = run_flagship_job(args.images, args.boundaries, args.out,
                               z=args.zoom)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
