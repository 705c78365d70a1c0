"""Batch-kernel ↔ scalar-kernel parity for the vectorized multimodal
stages: every shape-grouped batch path must be bit-identical to the
per-image reference it replaced (the docstrings claim it; these tests
pin it), across MIXED-shape batches where the scatter-by-index logic
actually matters.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from skyway_ray.functions.image_codec import (
    _PNG_SIG, _chunk, decode_image, decode_png, encode_png)
from skyway_ray.functions.phash import (
    ahash64, ahash64_batch, dhash64, dhash64_batch)
from skyway_ray.stages.multimodal import (
    ImageBlurScore, ImageFeatures, ImagePatchify, ImagePyramid,
    PerceptualHash, laplacian_sharpness)

SHAPES = [(17, 23), (8, 8), (9, 16), (32, 32), (31, 47)]


def _imgs(rng, shapes, per_shape=4):
    out = []
    for h, w in shapes:
        for _ in range(per_shape):
            out.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    # interleave shapes so shape groups are non-contiguous in the batch
    order = rng.permutation(len(out))
    return [out[i] for i in order]


def _batch(imgs, ids=None):
    ids = ids if ids is not None else [f"img{i}" for i in range(len(imgs))]
    return pa.table({
        "image_id": pa.array(ids),
        "bytes": pa.array([encode_png(i) for i in imgs], pa.binary()),
        "fmt": pa.array(["png"] * len(imgs)),
    })


class TestPhashBatchParity:
    def test_ahash_dhash_batch_bit_identical(self):
        rng = np.random.default_rng(3)
        for h, w in SHAPES:
            stack = rng.integers(0, 256, (16, h, w, 3), dtype=np.uint8)
            # plant a constant image: mean-threshold tie-breaking path
            stack[7] = 128
            ab = ahash64_batch(stack)
            db = dhash64_batch(stack)
            for i in range(len(stack)):
                assert ab[i] == ahash64(stack[i]), (h, w, i)
                assert db[i] == dhash64(stack[i]), (h, w, i)

    def test_perceptual_hash_stage_mixed_shapes(self):
        rng = np.random.default_rng(4)
        imgs = _imgs(rng, SHAPES)
        out = PerceptualHash()(_batch(imgs)).to_pandas()
        assert list(out["image_id"]) == [f"img{i}" for i in range(len(imgs))]
        for i, img in enumerate(imgs):
            assert out["ahash64"][i] == ahash64(img)
            assert out["dhash64"][i] == dhash64(img)


class TestFeatureStagesMixedShapeParity:
    def test_image_features(self):
        rng = np.random.default_rng(5)
        imgs = _imgs(rng, SHAPES)
        out = ImageFeatures()(_batch(imgs)).to_pandas()
        for i, img in enumerate(imgs):
            means = img.reshape(-1, 3).mean(axis=0)
            assert out["mean_r"][i] == means[0]
            assert out["mean_g"][i] == means[1]
            assert out["mean_b"][i] == means[2]
            assert out["brightness"][i] == img.mean()
            h, w, _ = img.shape
            assert out["aspect"][i] == w / h

    def test_blur_score(self):
        rng = np.random.default_rng(6)
        imgs = _imgs(rng, SHAPES)
        # tiny image exercises the <3px guard inside a mixed batch
        imgs.insert(3, rng.integers(0, 256, (2, 5, 3), dtype=np.uint8))
        out = ImageBlurScore()(_batch(imgs)).to_pandas()
        for i, img in enumerate(imgs):
            num, cnt = laplacian_sharpness(img)
            assert out["lap_var_num"][i] == num, i
            assert out["lap_n"][i] == cnt, i


class TestPyramidBatchParity:
    def test_thumb_bytes_equal_encode_png(self):
        rng = np.random.default_rng(7)
        imgs = _imgs(rng, SHAPES, per_shape=2)
        levels = (16, 8, 5)
        out = ImagePyramid(levels=levels)(_batch(imgs)).to_pandas()
        assert len(out) == len(imgs) * len(levels)
        k = 0
        for i, img in enumerate(imgs):
            for side in levels:
                row = out.iloc[k]
                k += 1
                assert row["image_id"] == f"img{i}"
                assert row["level"] == side
                want = encode_png(ImagePyramid._downsample(img, side))
                assert bytes(row["thumb"]) == want, (i, side)
                assert row["n_bytes"] == len(want)


class TestPatchifyBatchParity:
    def test_mixed_shapes_match_per_image_loop(self):
        rng = np.random.default_rng(8)
        p = 8
        imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                for h, w in [(24, 16), (17, 9), (8, 8), (24, 16), (16, 25)]]
        # too-small image mid-batch: contributes no rows, shifts nothing
        imgs.insert(2, rng.integers(0, 256, (5, 40, 3), dtype=np.uint8))
        out = ImagePatchify(patch=p)(_batch(imgs)).to_pandas()

        # reference: the original per-image emission order and values
        want = []
        for i, img in enumerate(imgs):
            h, w, _ = img.shape
            gy, gx = h // p, w // p
            for iy in range(gy):
                for ix in range(gx):
                    sub = img[iy * p:(iy + 1) * p,
                              ix * p:(ix + 1) * p].astype(np.int64)
                    luma = (77 * sub[:, :, 0] + 150 * sub[:, :, 1]
                            + 29 * sub[:, :, 2]) >> 8
                    want.append((f"img{i}", iy, ix,
                                 sub.astype(np.uint8).tobytes(),
                                 int(luma.sum()) // (p * p)))
        assert len(out) == len(want)
        for k, (wid, wy, wx, wbuf, wluma) in enumerate(want):
            assert out["image_id"][k] == wid, k
            assert out["patch_y"][k] == wy and out["patch_x"][k] == wx, k
            assert bytes(out["patch"][k]) == wbuf, k
            assert out["mean_luma"][k] == wluma, k

    def test_all_too_small_batch_keeps_id_type(self):
        rng = np.random.default_rng(9)
        imgs = [rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)]
        t = ImagePatchify(patch=8)(_batch(imgs))
        assert t.num_rows == 0
        assert t["image_id"].type == pa.string()


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply PNG scanline filters forward (per the spec) to build raw
    pre-compression bytes — the inverse of image_codec._unfilter."""
    h, w, _ = img.shape
    flat = img.reshape(h, w * 3).astype(np.int32)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    for r in range(h):
        f = ftypes[r % len(ftypes)]
        raw[r, 0] = f
        cur = flat[r]
        prev = flat[r - 1] if r > 0 else np.zeros(w * 3, np.int32)
        line = np.zeros(w * 3, np.int32)
        for i in range(w * 3):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            line[i] = (cur[i] - pred) & 0xFF
        raw[r, 1:] = line.astype(np.uint8)
    return raw.tobytes()


class TestUnfilterPaths:
    def _png(self, img, ftypes):
        h, w, _ = img.shape
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        idat = zlib.compress(_forward_filter(img, ftypes), 6)
        return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
                + _chunk(b"IEND", b""))

    def test_all_filter_types_round_trip(self):
        rng = np.random.default_rng(10)
        img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
        # mixed per-row filters defeat the all-zero fast path; each of
        # 0..4 appears at least twice across the 10 rows
        got = decode_png(self._png(img, [0, 1, 2, 3, 4]))
        assert (got == img).all()
        for f in (1, 2, 3, 4):
            assert (decode_png(self._png(img, [f])) == img).all(), f

    def test_fast_path_matches_loop_path(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
        # same pixels through filter-0-everywhere (fast path) and
        # filter 2 everywhere (loop path) must agree
        a = decode_png(self._png(img, [0]))
        b = decode_png(self._png(img, [2]))
        assert (a == b).all() and (a == img).all()
        assert (decode_image(encode_png(img), "png") == img).all()
