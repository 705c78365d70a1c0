import os

import numpy as np
import pyarrow as pa
import pytest

from skyway_ray.fixtures import ensure_images_parquet, make_images
from skyway_ray.stages.multimodal import (
    AudioFeatures, BinaryStats, ImageFeatures, ImageResize, VideoFrameSample,
)


class TestMultimodal:
    def test_image_features(self, ray_session):
        import ray.data

        ds = ray.data.read_parquet(ensure_images_parquet("smoke")).limit(200)
        out = ds.map_batches(ImageFeatures, batch_format="pyarrow",
                             batch_size=64, concurrency=2).to_pandas()
        assert len(out) == 200
        assert ((out["mean_r"] >= 0) & (out["mean_r"] <= 255)).all()
        assert (out["aspect"] == 1.0).all()  # square fixtures

    def test_image_resize(self, ray_session):
        import ray.data
        from skyway_ray.functions.image_codec import decode_png

        ds = ray.data.read_parquet(ensure_images_parquet("smoke")).limit(50)
        out = ds.map_batches(ImageResize, fn_constructor_kwargs=dict(side=8),
                             batch_format="pyarrow", batch_size=32,
                             concurrency=2).to_pandas()
        assert len(out) == 50
        img = decode_png(out["thumb"].iloc[0])
        assert img.shape == (8, 8, 3)

    def test_blur_score_exact_and_ordering(self):
        from skyway_ray.functions.image_codec import encode_png
        from skyway_ray.stages.multimodal import (
            ImageBlurScore, laplacian_sharpness)

        # hand-computable 3x4 gray image with one lit pixel: the two
        # interior Laplacians are 4y and -y (y = quantized luma of 10)
        v = np.array([[0, 0, 0, 0], [0, 10, 0, 0], [0, 0, 0, 0]], np.uint8)
        img = np.repeat(v[:, :, None], 3, axis=2)
        num, n = laplacian_sharpness(img)
        y = (77 * 10 + 150 * 10 + 29 * 10) >> 8
        assert n == 2
        assert num == 2 * 17 * y * y - (3 * y) ** 2  # n*s2 - s1^2

        rng = np.random.default_rng(42)
        sharp = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        k = np.ones((5, 5)) / 25.0
        blurred = sharp.astype(np.float64)
        for c in range(3):
            from numpy.lib.stride_tricks import sliding_window_view

            w = sliding_window_view(np.pad(sharp[:, :, c], 2, mode="edge"),
                                    (5, 5))
            blurred[:, :, c] = (w * k).sum(axis=(2, 3))
        blurred = blurred.astype(np.uint8)
        ns, cs = laplacian_sharpness(sharp)
        nb, cb = laplacian_sharpness(blurred)
        assert ns / cs**2 > 10 * (nb / cb**2)  # blur collapses the score

        batch = pa.table({
            "image_id": ["sharp", "blurred"],
            "bytes": pa.array([encode_png(sharp), encode_png(blurred)],
                              pa.binary()),
            "fmt": ["png", "png"]})
        out = ImageBlurScore()(batch).to_pandas()
        assert out["lap_var_num"][0] > out["lap_var_num"][1]
        assert (out["lap_n"] == 30 * 30).all()

    def test_patchify_reassembles_bit_exact(self):
        from skyway_ray.functions.image_codec import encode_png
        from skyway_ray.stages.multimodal import ImagePatchify

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        batch = pa.table({"image_id": ["a"],
                          "bytes": pa.array([encode_png(img)], pa.binary()),
                          "fmt": ["png"]})
        out = ImagePatchify(patch=16)(batch).to_pandas()
        assert len(out) == 9  # (48//16)^2
        back = np.zeros_like(img)
        for _, r in out.iterrows():
            patch = np.frombuffer(r["patch"], np.uint8).reshape(16, 16, 3)
            back[r["patch_y"] * 16:(r["patch_y"] + 1) * 16,
                 r["patch_x"] * 16:(r["patch_x"] + 1) * 16] = patch
        assert (back == img).all()
        # exact-int mean luma: verify one patch by hand
        r0 = out[(out["patch_y"] == 1) & (out["patch_x"] == 2)].iloc[0]
        sub = img[16:32, 32:48].astype(np.int64)
        luma = (77 * sub[:, :, 0] + 150 * sub[:, :, 1]
                + 29 * sub[:, :, 2]) >> 8
        assert r0["mean_luma"] == int(luma.sum()) // 256

        # non-divisible image keeps only full patches
        img2 = rng.integers(0, 256, (40, 24, 3), dtype=np.uint8)
        b2 = pa.table({"image_id": ["b"],
                       "bytes": pa.array([encode_png(img2)], pa.binary()),
                       "fmt": ["png"]})
        out2 = ImagePatchify(patch=16)(b2).to_pandas()
        assert len(out2) == 2  # 40//16=2 rows, 24//16=1 col

    def test_binary_stats(self):
        t = make_images(20)
        out = BinaryStats()(t).to_pandas()
        assert (out["n_bytes"] > 0).all()

    def test_audio_wav_real(self):
        from skyway_ray.functions.audio_codec import decode_wav, encode_wav

        t = 2.0 * np.pi * 440.0 * np.arange(16000) / 16000.0
        tone = (np.sin(t) * 20000).astype(np.int16)
        wav = encode_wav(tone, 16000)
        back, sr = decode_wav(wav)
        assert sr == 16000 and (back[:, 0] == tone).all()
        batch = pa.table({"audio_id": ["a1"], "bytes": pa.array([wav], pa.binary())})
        out = AudioFeatures()(batch).to_pandas()
        assert abs(out["duration_sec"][0] - 1.0) < 1e-9
        assert 0.4 < out["rms"][0] < 0.5  # sine RMS = peak/sqrt(2) ~ 0.43
        assert out["channels"][0] == 1

    def test_audio_compressed_stub_and_video_stub(self):
        batch = pa.table({"audio_id": ["a1"],
                          "bytes": pa.array([b"ID3\x03fakemp3data"], pa.binary())})
        with pytest.raises(NotImplementedError):
            AudioFeatures()(batch)
        t2 = make_images(2).rename_columns(
            ["video_id", "bytes", "w", "h", "fmt", "caption", "phash"])
        with pytest.raises(NotImplementedError):
            VideoFrameSample()(t2)


class TestCheckpoint:
    def test_run_with_checkpoint(self, ray_session, tmp_path):
        import ray.data
        from skyway_ray.state.checkpoint import run_with_checkpoint

        calls = {"n": 0}

        def factory():
            calls["n"] += 1
            return ray.data.range(100)

        ds1, was_cached = run_with_checkpoint("stage1", factory, str(tmp_path),
                                              inputs={"x": 1})
        assert not was_cached and ds1.count() == 100
        ds2, was_cached = run_with_checkpoint("stage1", factory, str(tmp_path),
                                              inputs={"x": 1})
        assert was_cached and calls["n"] == 1
        assert ds2.count() == 100
        # different inputs -> different fingerprint -> recompute
        _, was_cached = run_with_checkpoint("stage1", factory, str(tmp_path),
                                            inputs={"x": 2})
        assert not was_cached and calls["n"] == 2

    def test_lineage_manifest(self, ray_session, tmp_path):
        import json

        import ray.data
        from skyway_ray.state.checkpoint import checkpoint_dataset

        out = checkpoint_dataset(ray.data.range(50), str(tmp_path / "ck"),
                                 lineage={"stage": "test"})
        with open(os.path.join(out, "_lineage.json")) as f:
            m = json.load(f)
        assert m["rows"] == 50
        assert m["lineage"]["stage"] == "test"
        assert all(p["rows"] > 0 for p in m["partitions"])

    def test_resumable_shards(self, tmp_path):
        from skyway_ray.state.checkpoint import resumable_shards

        processed = []

        def work(shard, tmp_dir):
            processed.append(shard)
            with open(os.path.join(tmp_dir, "out.txt"), "w") as f:
                f.write(shard)
            return {"rows": 1}

        r1 = resumable_shards(["a", "b"], work, str(tmp_path / "out"))
        assert r1["done"] == ["a", "b"]
        r2 = resumable_shards(["a", "b", "c"], work, str(tmp_path / "out"))
        assert r2["skipped"] == ["a", "b"] and r2["done"] == ["c"]
        assert processed == ["a", "b", "c"]


class TestSalt:
    def test_salted_count_matches_plain(self, ray_session):
        import ray.data
        from skyway_ray.stages.salt import salted_count

        rng = np.random.default_rng(1)
        keys = np.concatenate([
            np.full(5000, 7, dtype=np.int64),          # hot key
            rng.integers(0, 50, 5000),                 # cold keys
        ])
        ds = ray.data.from_arrow(pa.table({"cell": keys})).repartition(8)
        got = salted_count(ds, "cell", num_salts=8, hot_threshold=1000,
                           sample_fraction=1.0).to_pandas()
        got = got.sort_values("cell").reset_index(drop=True)
        import pandas as pd

        want = pd.Series(keys).value_counts().sort_index()
        assert got["n"].tolist() == want.tolist()
        assert got["cell"].tolist() == want.index.tolist()

    def test_salted_count_string_keys(self, ray_session):
        """String (object-dtype) keys: the per-batch salt derives from
        a stable byte representation (str of the first key), not
        ndarray.tobytes() of PyObject pointers — counts must equal a
        plain groupby."""
        import pandas as pd
        import ray.data
        from skyway_ray.stages.salt import salted_count

        rng = np.random.default_rng(2)
        keys = np.array([f"cell_{i}" for i in rng.integers(0, 40, 8000)],
                        dtype=object)
        ds = ray.data.from_arrow(
            pa.table({"cell": pa.array(list(keys), pa.string())})
        ).repartition(8)
        got = (salted_count(ds, "cell", num_salts=8).to_pandas()
               .sort_values("cell").reset_index(drop=True))
        want = pd.Series(keys).value_counts().sort_index()
        assert got["n"].tolist() == want.tolist()
        assert got["cell"].tolist() == want.index.tolist()


class TestImagePyramid:
    def test_levels_decode_and_manifest(self, ray_session):
        """Each image yields one PNG per pyramid level; thumbs decode
        to the requested side and the run is deterministic."""
        import ray.data

        from skyway_ray.functions.image_codec import decode_png, encode_png
        from skyway_ray.stages.multimodal import ImagePyramid

        rng = np.random.default_rng(3)
        imgs = [rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
                for _ in range(6)]
        tab = pa.table({
            "image_id": list(range(6)),
            "bytes": pa.array([encode_png(i) for i in imgs], pa.binary()),
            "fmt": ["png"] * 6,
        })
        out = (ray.data.from_arrow(tab).repartition(2)
               .map_batches(ImagePyramid(levels=(16, 8)),
                            batch_format="pyarrow", batch_size=4)
               .to_pandas())
        assert len(out) == 12
        assert sorted(out["level"].unique()) == [8, 16]
        for _, r in out.iterrows():
            img = decode_png(r["thumb"])
            assert img.shape == (r["level"], r["level"], 3)
        # determinism: same inputs -> same thumb bytes
        out2 = (ray.data.from_arrow(tab).repartition(3)
                .map_batches(ImagePyramid(levels=(16, 8)),
                             batch_format="pyarrow", batch_size=4)
                .to_pandas())
        a = out.sort_values(["image_id", "level"]).reset_index(drop=True)
        b = out2.sort_values(["image_id", "level"]).reset_index(drop=True)
        assert (a["thumb"] == b["thumb"]).all()


class TestAudioFixtureQuery:
    def test_features_match_generating_params(self, ray_session):
        """The audio_features query decodes the deterministic WAV
        fixture; durations and channel counts equal the generator's
        parameters, and amplitude ordering follows the planted amps."""
        from skyway_ray.queries import QUERIES

        out = QUERIES["audio_features"]("/root/testdata/sf0.001")
        df = out.to_pandas().sort_values("audio_id").reset_index(drop=True)
        assert len(df) == 200
        assert np.allclose(df["duration_sec"], 0.25)
        assert (df["channels"].to_numpy() == 1 + (np.arange(200) % 2)).all()
        # peak tracks the planted amplitude ladder (i % 7)
        amp = 0.1 + 0.8 * ((np.arange(200) % 7) / 7.0)
        assert (np.corrcoef(df["peak"], amp)[0, 1]) > 0.99
