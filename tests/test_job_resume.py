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


class TestLineageFingerprint:
    def test_stale_shard_reprocessed(self, tmp_path):
        from skyway_ray.state.checkpoint import resumable_shards

        calls = []

        def process(shard, tmp):
            calls.append(shard)
            (tmp_path / "out" / shard).mkdir(parents=True, exist_ok=True)
            return {"rows": 1}

        fp = {"a": {"v": 1}, "b": {"v": 1}}
        r1 = resumable_shards(["a", "b"], process, str(tmp_path / "out"),
                              fingerprint_of=lambda s: fp[s])
        assert r1["done"] == ["a", "b"] and not r1["stale"]
        # unchanged inputs -> both skipped
        r2 = resumable_shards(["a", "b"], process, str(tmp_path / "out"),
                              fingerprint_of=lambda s: fp[s])
        assert r2["skipped"] == ["a", "b"] and not r2["done"]
        # change one shard's input -> only it reprocesses, marked stale
        fp["b"] = {"v": 2}
        calls.clear()
        r3 = resumable_shards(["a", "b"], process, str(tmp_path / "out"),
                              fingerprint_of=lambda s: fp[s])
        assert r3["skipped"] == ["a"]
        assert r3["done"] == ["b"] and r3["stale"] == ["b"]
        assert calls == ["b"]

    def test_legacy_marker_only(self, tmp_path):
        from skyway_ray.state.checkpoint import resumable_shards

        def process(shard, tmp):
            return {}

        r1 = resumable_shards(["x"], process, str(tmp_path / "o"))
        r2 = resumable_shards(["x"], process, str(tmp_path / "o"))
        assert r1["done"] == ["x"] and r2["skipped"] == ["x"]
