"""Multimodal (image/audio/video) actor-pool stages.

Binary payloads stay opaque ``binary`` columns with typed metadata;
decode/feature/resize work happens in actor pools with small batches
(multi-MB rows × batch_size × concurrency must fit worker heaps — see
the ``batch_size`` guidance in each class).

Codec availability in this container (see functions/image_codec.py):
PNG decode/encode is real (pure zlib); jpeg/webp are deterministic
fake-lossy STUBS; genuine jpeg/webp byte streams raise
``NotImplementedError``.  Audio/video decoding has no available
library at all, so those stages are STUBS raising
``NotImplementedError`` at decode time — the Ray-side plumbing
(schemas, actor signatures, batch sizing, output layout) is real and
tested via the deterministic fake codec.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.image_codec import decode_image, encode_png


def decode_pool_size(cpus: int | None = None) -> int:
    """Actor-pool size for full-corpus decode stages: ~3/4 of the
    session CPUs, always leaving ≥ 2 slots for the read stage (an
    actor pool that reserves every CPU starves the reads and hangs
    the pipeline — CLAUDE.md invariant), floor 2.  The r4 bench ran
    these pools at a hardcoded 2 on a 32-CPU session — a 10-40×
    under-parallelization on the decode-bound entries (phash_dedup
    read 88 s)."""
    if cpus is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(cpus - 2, cpus * 3 // 4))


class ImageFeatures:
    """Decode → per-image features (mean RGB, brightness, aspect).

    Usage: ``ds.map_batches(ImageFeatures, batch_format="pyarrow",
    batch_size=256, concurrency=N)`` — small batches: decoded pixels
    are w*h*3 bytes each and live only inside the call."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(blobs)
        means = np.empty((n, 3), dtype=np.float64)
        bright = np.empty(n, dtype=np.float64)
        aspect = np.empty(n, dtype=np.float64)
        for i in range(n):
            img = decode_image(blobs[i], fmts[i])
            means[i] = img.reshape(-1, 3).mean(axis=0)
            bright[i] = img.mean()
            h, w, _ = img.shape
            aspect[i] = w / h
        return pa.table({
            self.id_col: batch[self.id_col],
            "mean_r": means[:, 0],
            "mean_g": means[:, 1],
            "mean_b": means[:, 2],
            "brightness": bright,
            "aspect": aspect,
        })


class ImageResize:
    """Decode → nearest-neighbor resize → re-encode PNG thumbnail.
    Output schema: (id, thumb:binary, thumb_w, thumb_h)."""

    def __init__(self, side: int = 8, bytes_col: str = "bytes",
                 fmt_col: str = "fmt", id_col: str = "image_id"):
        self.side = side
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.id_col = id_col

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        ys = (np.arange(self.side) * h // self.side).clip(0, h - 1)
        xs = (np.arange(self.side) * w // self.side).clip(0, w - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        thumbs = [encode_png(self._resize(decode_image(b, f)))
                  for b, f in zip(blobs, fmts)]
        return pa.table({
            self.id_col: batch[self.id_col],
            "thumb": pa.array(thumbs, pa.binary()),
            "thumb_w": pa.array([self.side] * len(thumbs), pa.int32()),
            "thumb_h": pa.array([self.side] * len(thumbs), pa.int32()),
        })


class ImagePyramid:
    """Decode ONCE → multi-resolution thumbnail pyramid (one output row
    per (image, level); levels are successive nearest-neighbor
    halvings re-encoded as PNG).

    Usage: ``ds.map_batches(ImagePyramid(levels=(32, 16, 8)),
    batch_format="pyarrow", batch_size=256, concurrency=N)`` — the
    row-count fan-out is len(levels)×, so batch_size bounds decoded
    pixels AND encoded thumb bytes in flight.  Downstream tile serving
    would ``write_parquet`` partitioned by ``level``."""

    def __init__(self, levels: tuple = (32, 16, 8),
                 bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.levels = tuple(levels)
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.id_col = id_col

    @staticmethod
    def _downsample(img: np.ndarray, side: int) -> np.ndarray:
        h, w, _ = img.shape
        ys = (np.arange(side) * h // side).clip(0, h - 1)
        xs = (np.arange(side) * w // side).clip(0, w - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        out_id, out_lv, out_thumb, out_n = [], [], [], []
        for bid, blob, fmt in zip(ids, blobs, fmts):
            img = decode_image(blob, fmt)
            for side in self.levels:
                t = encode_png(self._downsample(img, side))
                out_id.append(bid)
                out_lv.append(side)
                out_thumb.append(t)
                out_n.append(len(t))
        return pa.table({
            self.id_col: pa.array(out_id),
            "level": pa.array(out_lv, pa.int32()),
            "thumb": pa.array(out_thumb, pa.binary()),
            "n_bytes": pa.array(out_n, pa.int64()),
        })


class ImagePatchify:
    """Decode ONCE → non-overlapping P×P patch grid (the ViT-style
    patch-extraction shape of image training pipelines): one output
    row per (image, patch) with grid coordinates, the raw patch pixel
    buffer (P·P·3 bytes, row-major RGB — NOT re-encoded: training
    consumers want tensors, and PNG re-encode per patch would dominate
    the stage), and the patch's exact-int mean luma for cheap
    downstream filtering (drop all-black/all-white patches without
    touching bytes again).  Images not divisible by P keep only full
    patches (floor grid), matching common training preprocessing.

    Usage: ``ds.map_batches(ImagePatchify(patch=16),
    batch_format="pyarrow", batch_size=128, concurrency=N)`` — the
    fan-out is (side//P)² rows per image; batch_size × patch bytes
    bounds worker heap.  Downstream: ``write_parquet`` partitioned by
    the input shard, patches re-assemble bit-exactly (tested)."""

    def __init__(self, patch: int = 16, bytes_col: str = "bytes",
                 fmt_col: str = "fmt", id_col: str = "image_id"):
        self.patch = int(patch)
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.patch
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        out_id, out_px, out_py, out_buf, out_luma = [], [], [], [], []
        for bid, blob, fmt in zip(ids, blobs, fmts):
            img = decode_image(blob, fmt)
            h, w, _ = img.shape
            gy, gx = h // p, w // p
            if gy == 0 or gx == 0:
                continue
            # one reshape exposes the whole patch grid: (gy, gx, p, p, 3)
            grid = (img[:gy * p, :gx * p]
                    .reshape(gy, p, gx, p, 3).swapaxes(1, 2))
            g64 = grid.astype(np.int64)
            luma = (77 * g64[..., 0] + 150 * g64[..., 1]
                    + 29 * g64[..., 2]) >> 8
            mean_luma = luma.reshape(gy, gx, -1).sum(axis=2) // (p * p)
            for iy in range(gy):
                for ix in range(gx):
                    out_id.append(bid)
                    out_py.append(iy)
                    out_px.append(ix)
                    out_buf.append(grid[iy, ix].tobytes())
                    out_luma.append(int(mean_luma[iy, ix]))
        return pa.table({
            self.id_col: pa.array(out_id),
            "patch_y": pa.array(out_py, pa.int32()),
            "patch_x": pa.array(out_px, pa.int32()),
            "patch": pa.array(out_buf, pa.binary()),
            "mean_luma": pa.array(out_luma, pa.int64()),
        })


class PerceptualHash:
    """Decode → aHash64 + dHash64 perceptual fingerprints
    (functions/phash.py).  Output (id, ahash64, dhash64) — the tiny
    hash table then feeds :func:`..functions.phash.phash_near_dup`
    so image BYTES never enter the dedup shuffle.

    Usage: ``ds.map_batches(PerceptualHash, batch_format="pyarrow",
    batch_size=256, concurrency=N)``."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.phash import ahash64, dhash64

        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(blobs)
        ah = np.empty(n, dtype=np.int64)
        dh = np.empty(n, dtype=np.int64)
        for i in range(n):
            img = decode_image(blobs[i], fmts[i])
            ah[i] = ahash64(img)
            dh[i] = dhash64(img)
        return pa.table({
            self.id_col: batch[self.id_col],
            "ahash64": pa.array(ah, pa.int64()),
            "dhash64": pa.array(dh, pa.int64()),
        })


def laplacian_sharpness(img: np.ndarray) -> tuple[int, int]:
    """Exact-integer Laplacian-variance sharpness of one RGB uint8
    image: integer luma ``(77R + 150G + 29B) >> 8``, 4-neighbour
    Laplacian ``4c − up − down − left − right`` over interior pixels,
    then the integer variance numerator ``n·Σl² − (Σl)²`` (den = n²).
    Blurry images score low (a box blur shrinks ``l`` everywhere);
    all ops are int64, so the score is platform/partition-exact.
    Images smaller than 3×3 have no interior → (0, 0)."""
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    y = (77 * r + 150 * g + 29 * b) >> 8
    if y.shape[0] < 3 or y.shape[1] < 3:
        return 0, 0
    c = y[1:-1, 1:-1]
    lap = (4 * c - y[:-2, 1:-1] - y[2:, 1:-1]
           - y[1:-1, :-2] - y[1:-1, 2:])
    n = lap.size
    s1 = int(lap.sum())
    s2 = int((lap * lap).sum())
    return n * s2 - s1 * s1, n


class ImageBlurScore:
    """Decode → exact-integer Laplacian-variance sharpness score (the
    blur-filter shape of image-data curation: drop images whose score
    falls below a threshold).  Output (id, lap_var_num, lap_n) with
    variance = lap_var_num / lap_n² — kept as exact ints so
    distributed runs are bit-identical and threshold filters are
    reproducible.

    Usage: ``ds.map_batches(ImageBlurScore, batch_format="pyarrow",
    batch_size=256, concurrency=N)`` — same small-batch sizing as the
    other decode stages (pixels live only inside the call)."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id"):
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        fmts = batch[self.fmt_col].to_pylist()
        n = len(blobs)
        num = np.empty(n, dtype=np.int64)
        cnt = np.empty(n, dtype=np.int64)
        for i in range(n):
            num[i], cnt[i] = laplacian_sharpness(
                decode_image(blobs[i], fmts[i]))
        return pa.table({
            self.id_col: batch[self.id_col],
            "lap_var_num": pa.array(num, pa.int64()),
            "lap_n": pa.array(cnt, pa.int64()),
        })


class BinaryStats:
    """Modality-agnostic pass over any binary column: size + crc32 —
    cheap integrity/lineage features that need no codec."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "image_id"):
        self.bytes_col = bytes_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        blobs = batch[self.bytes_col].to_pylist()
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_bytes": pa.array([len(b) for b in blobs], pa.int64()),
            "crc32": pa.array([zlib.crc32(b) for b in blobs], pa.int64()),
        })


class AudioFeatures:
    """Audio decode → features.  REAL for PCM WAV (own pure-struct
    codec, functions/audio_codec.py): duration, RMS, peak, channels.
    Compressed formats (mp3/ogg/flac) raise ``NotImplementedError`` —
    swap in soundfile/librosa on a real cluster."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "audio_id"):
        self.bytes_col = bytes_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.audio_codec import decode_wav

        blobs = batch[self.bytes_col].to_pylist()
        n = len(blobs)
        dur = np.empty(n)
        rms = np.empty(n)
        peak = np.empty(n)
        ch = np.empty(n, dtype=np.int32)
        for i, b in enumerate(blobs):
            samples, sr = decode_wav(b)
            x = samples.astype(np.float64) / 32768.0
            dur[i] = len(samples) / sr
            rms[i] = float(np.sqrt(np.mean(x ** 2))) if len(x) else 0.0
            peak[i] = float(np.abs(x).max()) if len(x) else 0.0
            ch[i] = samples.shape[1]
        return pa.table({
            self.id_col: batch[self.id_col],
            "duration_sec": pa.array(dur, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "peak": pa.array(peak, pa.float64()),
            "channels": pa.array(ch, pa.int32()),
        })


class VideoFrameSample:
    """STUB — no video codec is available.  On a real cluster this is a
    `map_batches` actor stage with batch_size=1-8 (frames are large),
    emitting (video_id, frame_idx, frame_png) rows via flat output."""

    def __init__(self, bytes_col: str = "bytes", id_col: str = "video_id",
                 every_n: int = 30):
        self.bytes_col = bytes_col
        self.id_col = id_col
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video decode is STUBBED: no video library in this environment")
