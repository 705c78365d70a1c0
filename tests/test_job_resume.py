"""Resumable flagship job: per-shard outputs, lineage, skip-finished."""

import json
import os
import shutil

import pytest

from skyway_ray.fixtures import (
    ensure_boundaries_parquet, make_images, FIXTURE_DIR,
)


@pytest.fixture(scope="module")
def sharded_images(tmp_path_factory):
    """A 4-shard images dir (distinct from the cached single-file
    smoke fixture)."""
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("images_shards")
    t = make_images(2000)
    for s in range(4):
        pq.write_table(t.slice(s * 500, 500), str(d / f"shard-{s}.parquet"))
    return str(d)


class TestFlagshipJob:
    def test_run_and_resume(self, ray_session, sharded_images, tmp_path):
        from skyway_ray.pipelines.job import run_flagship_job

        boundaries = ensure_boundaries_parquet(50)
        out = str(tmp_path / "job_out")
        m1 = run_flagship_job(sharded_images, boundaries, out)
        assert len(m1["shards_done"]) == 4 and not m1["shards_skipped"]
        assert m1["n_tiles"] > 0

        # lineage sidecars exist per shard
        for shard in m1["shards_done"]:
            lineage = json.load(open(os.path.join(out, "join", shard,
                                                  "_lineage.json")))
            assert lineage["rows"] >= 0 and "wall_time_sec" in lineage

        # rerun: everything skipped, same result
        m2 = run_flagship_job(sharded_images, boundaries, out)
        assert not m2["shards_done"] and len(m2["shards_skipped"]) == 4
        assert m2["n_tiles"] == m1["n_tiles"]

        # simulate partial failure: remove one shard's marker -> only it reruns
        victim = m1["shards_done"][1]
        shutil.rmtree(os.path.join(out, "join", victim))
        m3 = run_flagship_job(sharded_images, boundaries, out)
        assert m3["shards_done"] == [victim]
        assert len(m3["shards_skipped"]) == 3
        assert m3["n_tiles"] == m1["n_tiles"]

    def test_matches_flagship_pipeline(self, ray_session, sharded_images,
                                       tmp_path):
        """The resumable job's tile histogram equals the streaming
        flagship pipeline's output on the same input."""
        import pandas as pd
        import ray.data
        from skyway_ray.pipelines.flagship import flagship_pipeline
        from skyway_ray.pipelines.job import run_flagship_job

        boundaries = ensure_boundaries_parquet(50)
        out = str(tmp_path / "job_out2")
        run_flagship_job(sharded_images, boundaries, out)
        job_tiles = ray.data.read_parquet(os.path.join(out, "tiles")).to_pandas()
        direct = flagship_pipeline(sharded_images, boundaries, z=12).to_pandas()
        key = ["tile_z", "tile_x", "tile_y"]
        a = job_tiles.sort_values(key).reset_index(drop=True)
        b = direct.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
