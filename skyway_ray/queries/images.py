"""images query family (split from the former single-file queries module)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, cell_sql
from ..geo.tiles import tile_sql, tile_xy
from ._common import (
    _CHECKSUM_K,
    _PATCH_P,
    _THUMB_SIDE,
    _luma_table_sql,
    _read,
    derive_latlon,
    latlon_sql,
)




def q_exact_dedup_images(sf_dir: str):
    """Exact dedup by phash over the image fixture (projected shuffle —
    wide bytes never enter the shuffle)."""
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.dedup import exact_dedup_projected

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    cpus = int(__import__("ray").cluster_resources().get("CPU", 8))
    ds = ray.data.read_parquet(images, columns=["image_id", "phash"],
                               override_num_blocks=max(16, cpus))
    return exact_dedup_projected(ds, "phash", "image_id")


def q_image_features(sf_dir: str):
    """Multimodal decode → per-image features over the image fixture
    (PNG decode is real; jpeg/webp are the deterministic fake-lossy
    stubs — functions/image_codec.py).  Stateless tasks (the stage
    holds no state — stages/multimodal.as_tasks); batch_size bounds
    decoded-pixel heap per task, so MB-scale production images need it
    lowered with the blob size."""
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.multimodal import ImageFeatures, as_tasks

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(as_tasks(ImageFeatures), batch_format="pyarrow",
                          batch_size=2048)


def q_image_blur(sf_dir: str):
    """Blur / sharpness scoring over the image fixture (the
    blur-filter shape of image curation): actor-pool decode →
    exact-integer Laplacian variance per image
    (stages/multimodal.py::ImageBlurScore) — scores are int64
    num/den pairs, so threshold filters replay identically across
    partitionings.  Stateless tasks (as_tasks)."""
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.multimodal import ImageBlurScore, as_tasks

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])
    return ds.map_batches(as_tasks(ImageBlurScore), batch_format="pyarrow",
                          batch_size=2048)


def q_image_patches(sf_dir: str):
    """ViT-style patch extraction over the image fixture: actor-pool
    decode → non-overlapping 16×16 RGB patch rows with exact-int mean
    luma (stages/multimodal.py::ImagePatchify).  Returned as the
    per-image patch-count + luma-sum manifest so the driver check
    stays blob-free; the patch rows themselves are the stage's real
    output (write_parquet partitioned by shard downstream)."""
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.multimodal import ImagePatchify, as_tasks

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])

    # stateless tasks; patch rows inflate the batch ~(side/patch)² so
    # keep the batch a notch under the feature stages'.  The manifest
    # aggregates IN the same task: every image is one input row, so
    # its patches are complete within the call — no exchange needed
    # (the previous per-image groupby over the post-split patch stream
    # shuffled a corpus-sized key space purely defensively).
    patchify = as_tasks(ImagePatchify)

    def patches_manifest(b: pa.Table) -> pa.Table:
        p = patchify(b)
        t = pa.table({"image_id": p["image_id"],
                      "n_patches": pa.array(
                          np.ones(p.num_rows, np.int64)),
                      "luma_sum": p["mean_luma"]})
        return (t.group_by(["image_id"])
                 .aggregate([("n_patches", "sum"), ("luma_sum", "sum")])
                 .rename_columns(["image_id", "n_patches", "luma_sum"]))

    return ds.map_batches(patches_manifest, batch_format="pyarrow",
                          batch_size=1024)


def q_phash_dedup(sf_dir: str):
    """Perceptual-hash near-dedup over the image fixture: actor-pool
    decode → aHash/dHash (bytes never shuffle), then the distributed
    LSH dedup harness over the tiny (id, hash) table with 16-bit
    Hamming bands (functions/phash.py).  Rows-only (near-dup by
    construction; planted-duplicate recall is tested)."""
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.phash import phash_near_dup
    from ..stages.multimodal import PerceptualHash, as_tasks

    from ..stages.dedup import _key_hash64

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])

    hashes = ds.map_batches(as_tasks(PerceptualHash),
                            batch_format="pyarrow", batch_size=2048)

    # string image ids → int64 surrogate (the dedup pipeline sorts /
    # Blooms / CCs over int64 ids); survivors still carry image_id
    def add_iid(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_iid", pa.array(_key_hash64(
                b["image_id"].combine_chunks()).view(np.int64), pa.int64()))

    # materialize the hash table (24 B/row — tiny at any corpus size):
    # the dedup harness consumes its input THREE times (band pass,
    # Bloom-prefiltered sketch pass, loser drop); without this the
    # whole decode re-runs each time
    hashed = hashes.map_batches(add_iid, batch_format="pyarrow").materialize()
    out = phash_near_dup(hashed, id_col="_iid", hash_col="dhash64",
                         max_dist=3)
    return out.map_batches(lambda b: b.select(["image_id"]),
                           batch_format="pyarrow")


def q_knn_images(sf_dir: str):
    """kNN over the image fixture: 100 probe images against the full
    set, via the cell index (exact)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..geo.geotag import latlon_from_phash
    from ..stages.knn import KnnStage

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    tab = pq.read_table(images, columns=["image_id", "phash"])
    lat, lon = latlon_from_phash(tab["phash"].to_numpy(zero_copy_only=False))
    ref_table = pa.table({"image_id": tab["image_id"],
                          "lat": pa.array(lat), "lon": pa.array(lon)})
    ref = ray.put(ref_table)
    probes = ray.data.from_arrow(ref_table.slice(0, 100))
    return probes.map_batches(
        KnnStage, fn_constructor_kwargs=dict(ref_table_ref=ref, k=5, res=6),
        batch_format="pyarrow", concurrency=2)


def q_image_pyramid(sf_dir: str):
    """Multi-resolution thumbnail pyramid over the image fixture
    (stages/multimodal.py::ImagePyramid — decode once, emit 3 levels
    per image); returns the per-thumbnail manifest (blobs stay in the
    object store, never reach the driver)."""
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.multimodal import ImagePyramid, as_tasks

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])

    pyr = ds.map_batches(as_tasks(ImagePyramid), batch_format="pyarrow",
                         batch_size=2048)
    return pyr.map_batches(
        lambda b: b.select(["image_id", "level", "n_bytes"]),
        batch_format="pyarrow")


def q_compress_ratio(sf_dir: str):
    """Per-document zlib compression ratio (redundancy/entropy proxy
    for quality filtering) — vector stage over the documents stream;
    zlib output is deterministic at a fixed level but not
    SQL-expressible, so this is a rows-only entry (determinism is
    unit-tested instead)."""
    from ..functions.text import compression_ratio

    def score(b: pd.DataFrame) -> pd.DataFrame:
        r = compression_ratio(b["text"])
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "ratio_micro": np.floor(r * 1e6 + 0.5).astype(np.int64)})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score, batch_format="pandas")


def q_audio_features(sf_dir: str):
    """Audio decode → duration/RMS/peak/channels over the deterministic
    PCM-WAV fixture (stages/multimodal.py::AudioFeatures — the REAL
    pure-struct WAV codec; compressed formats are documented stubs).
    Actor pool, blobs never reach the driver; rows-only (no SQL can
    decode WAV) — decode correctness is unit-tested against the
    generating parameters instead."""
    import ray
    import ray.data

    from ..fixtures import ensure_audio_parquet
    from ..stages.multimodal import AudioFeatures

    path = ensure_audio_parquet(200)
    ds = ray.data.read_parquet(path, columns=["audio_id", "bytes"])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return ds.map_batches(AudioFeatures, batch_format="pyarrow",
                          batch_size=64, concurrency=max(2, cpus // 8))
# combos 20×.  K is a constant (not scale-derived) so the oracle SQL —
# which regenerates the pixels from the fixture's closed-form generator
# (fixtures.py::_gen_pixels) — is identical at every sf.


def q_image_checksum(sf_dir: str):
    """End-to-end hash verification of the IMAGE DECODE PATH: decode
    the first K fixture images (real from-spec PNG + the deterministic
    SKWJ/SKWW fake-lossy stubs — functions/image_codec.py) inside
    ``map_batches`` and emit each image's exact int64 pixel sum.  The
    DuckDB oracle never sees the bytes: it regenerates every pixel
    from the fixture's closed-form generator (fixtures.py::_gen_pixels
    — int64-wraparound noise replayed in HUGEINT) and applies the
    fake-lossy quantization ``p//4*4+2`` in SQL, so a single flipped
    byte anywhere in encode → parquet → Arrow → decode mismatches.

    Scale shape: the decode stage is the real per-batch kernel used by
    image_features/image_pyramid (bytes stay inside the task, only
    (id, fmt, sum) rows come out); the head-K filter is just what
    makes a fixed SQL oracle possible.  Valid at smoke/correctness
    scales (max_side=64); the bench fixture downsizes max_side to 16,
    where only the timing (never the hash) is used."""
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_image

    import pyarrow.dataset as pds

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    # row filter pushed to the parquet read: row groups whose
    # image_id stats exceed K never ship their bytes
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def sums(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):  # variable-size payloads: the
            # per-row loop is the decode itself (module docstring)
            out[i] = decode_image(blobs[i], fmts[i]).astype(np.int64).sum()
        return pa.table({"image_id": b["image_id"], "fmt": b["fmt"],
                         "pixel_sum": pa.array(out)})

    return ds.map_batches(sums, batch_format="pyarrow", batch_size=128)


def q_image_checksum_sql() -> str:
    # pixel formula mirror of fixtures.py::_gen_pixels: the noise
    # term's int64 wraparound is replayed exactly via HUGEINT mod 2^64
    # (numpy's arithmetic >>16 then floored %32 equals bits 16..20 of
    # the unsigned wrap, all-positive here)
    return (
        "WITH imgs AS (SELECT CAST(i AS BIGINT) AS i, "
        "CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 32 "
        "WHEN 3 THEN 48 ELSE 64 END AS side, "
        "CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
        "ELSE 'webp' END AS fmt "
        f"FROM range({_CHECKSUM_K}) t(i)), "
        "px AS (SELECT i, fmt, "
        "((x*3 + y*5 + c*11 + (i*37) % 256 + "
        "CAST((((CAST(i AS HUGEINT)*2654435761 + (y*side+x)*97 + c*131)"
        " * 1103515245) % 18446744073709551616) // 65536 % 32 "
        "AS BIGINT)) % 256) AS raw "
        "FROM imgs "
        "JOIN range(64) tx(x) ON tx.x < imgs.side "
        "JOIN range(64) ty(y) ON ty.y < imgs.side "
        "CROSS JOIN range(3) tc(c)) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " fmt, CAST(SUM(CASE WHEN fmt = 'png' THEN raw "
        "ELSE raw // 4 * 4 + 2 END) AS BIGINT) AS pixel_sum "
        "FROM px GROUP BY 1, 2"
    )


def q_thumb_checksum(sf_dir: str):
    """Hash verification of the RESIZE + RE-ENCODE path: run the real
    ``ImageResize`` stage (decode → nearest-neighbor resize to 8×8
    → PNG re-encode, stages/multimodal.py:63) over the first K fixture
    images, then decode each emitted thumb and report its exact int64
    pixel sum.  The oracle replays the nearest-neighbor index map
    ``src = dst*side//8`` on the closed-form pixel generator in SQL —
    pinning the resize kernel AND the PNG encoder round-trip (a lossy
    or shifted thumb mismatches).  Same head-K / scale caveats as
    image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_png
    from ..stages.multimodal import ImageResize

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)
    thumbs = ds.map_batches(ImageResize(side=_THUMB_SIDE),
                            batch_format="pyarrow", batch_size=128)

    def sums(b: pa.Table) -> pa.Table:
        blobs = b["thumb"].to_pylist()
        out = np.empty(len(blobs), np.int64)
        for i, blob in enumerate(blobs):
            out[i] = decode_png(blob).astype(np.int64).sum()
        return pa.table({"image_id": b["image_id"],
                         "thumb_sum": pa.array(out)})

    return thumbs.map_batches(sums, batch_format="pyarrow", batch_size=256)


def q_thumb_checksum_sql() -> str:
    s = _THUMB_SIDE
    return (
        "WITH imgs AS (SELECT CAST(i AS BIGINT) AS i, "
        "CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 32 "
        "WHEN 3 THEN 48 ELSE 64 END AS side, "
        "CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
        "ELSE 'webp' END AS fmt "
        f"FROM range({_CHECKSUM_K}) t(i)), "
        # nearest-neighbor source coords, then the generator replay
        "px AS (SELECT i, fmt, "
        "(dx.d * side) // " + str(s) + " AS x, "
        "(dy.d * side) // " + str(s) + " AS y, tc.c AS c, side "
        f"FROM imgs CROSS JOIN range({s}) dx(d) "
        f"CROSS JOIN range({s}) dy(d) CROSS JOIN range(3) tc(c)), "
        "v AS (SELECT i, fmt, "
        "((x*3 + y*5 + c*11 + (i*37) % 256 + "
        "CAST((((CAST(i AS HUGEINT)*2654435761 + (y*side+x)*97 + c*131)"
        " * 1103515245) % 18446744073709551616) // 65536 % 32 "
        "AS BIGINT)) % 256) AS raw FROM px) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(SUM(CASE WHEN fmt = 'png' THEN raw "
        "ELSE raw // 4 * 4 + 2 END) AS BIGINT) AS thumb_sum "
        "FROM v GROUP BY 1"
    )


def q_blur_checksum(sf_dir: str):
    """Hash verification of the BLUR-SCORE path: the real
    ``ImageBlurScore`` stage (decode → integer luma → 4-neighbour
    Laplacian → exact-int variance numerator n·Σl²−(Σl)²,
    stages/multimodal.py:232) over the first K fixture images.  The
    oracle rebuilds the decoded-luma plane from the pixel generator in
    SQL and takes the Laplacian via four neighbor equijoins — any
    drift in decode, luma weights, or interior handling mismatches.
    Same head-K / scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.multimodal import ImageBlurScore

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)
    return ds.map_batches(ImageBlurScore, batch_format="pyarrow",
                          batch_size=128, concurrency=2)


def q_blur_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "lap AS (SELECT c.i, "
        "4 * c.l - u.l - d.l - lf.l - rt.l AS v "
        "FROM lum c "
        "JOIN lum u ON u.i = c.i AND u.x = c.x AND u.y = c.y - 1 "
        "JOIN lum d ON d.i = c.i AND d.x = c.x AND d.y = c.y + 1 "
        "JOIN lum lf ON lf.i = c.i AND lf.x = c.x - 1 AND lf.y = c.y "
        "JOIN lum rt ON rt.i = c.i AND rt.x = c.x + 1 AND rt.y = c.y "
        "WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(count(*) * CAST(sum(v * v) AS BIGINT) "
        "- CAST(sum(v) AS BIGINT) * CAST(sum(v) AS BIGINT) AS BIGINT) "
        "AS lap_var_num, CAST(count(*) AS BIGINT) AS lap_n "
        "FROM lap GROUP BY 1"
    )


def q_patch_checksum(sf_dir: str):
    """Hash verification of the PATCHIFY path: the real
    ``ImagePatchify`` stage (decode → non-overlapping 16×16 patch grid
    → exact-int mean luma per patch, stages/multimodal.py:139) over
    the first K fixture images, returning the (image, patch_y,
    patch_x, mean_luma) manifest (the binary patch buffers stay inside
    the pipeline, as in production).  The oracle groups the replayed
    luma plane by floor-grid patch coordinates — the floor-crop of
    non-divisible sides (24 → one 16×16 patch) is pinned too."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.multimodal import ImagePatchify

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)
    patches = ds.map_batches(ImagePatchify(patch=_PATCH_P),
                             batch_format="pyarrow", batch_size=64)

    def manifest(b: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": b["image_id"],
            "patch_y": b["patch_y"].cast(pa.int64()),
            "patch_x": b["patch_x"].cast(pa.int64()),
            "mean_luma": b["mean_luma"]})

    return patches.map_batches(manifest, batch_format="pyarrow")


def q_patch_checksum_sql() -> str:
    p = _PATCH_P
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + " "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        f" y // {p} AS patch_y, x // {p} AS patch_x, "
        f"CAST(sum(l) AS BIGINT) // {p * p} AS mean_luma "
        f"FROM lum WHERE x < (side // {p}) * {p} "
        f"AND y < (side // {p}) * {p} "
        "GROUP BY 1, 2, 3"
    )


def q_dhash_checksum(sf_dir: str):
    """Hash verification of the PERCEPTUAL-HASH path: the real
    ``PerceptualHash`` stage (decode → float luma → 8×9 nearest-
    neighbor sample → horizontal-gradient dHash bit pack,
    stages/multimodal.py:198, functions/phash.py:53) over the first K
    fixture images.  dHash is float-exact across SQL/numpy because it
    never averages — each sampled luma is one (r·0.299 + g·0.587 +
    b·0.114) expression evaluated identically on both sides, and bits
    are strict comparisons of those exact doubles.  (aHash is NOT
    oracle-pinned: numpy's mean uses pairwise summation whose order
    SQL cannot replicate; it stays covered by kernel tests.)  The
    64-bit pack is replayed in HUGEINT and wrapped to signed int64."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.multimodal import PerceptualHash

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)
    hashes = ds.map_batches(PerceptualHash, batch_format="pyarrow",
                            batch_size=128, concurrency=2)
    return hashes.map_batches(
        lambda t: t.select(["image_id", "dhash64"]),
        batch_format="pyarrow")


def q_dhash_checksum_sql() -> str:
    def raw(c: str, xe: str, ye: str) -> str:
        return (f"(({xe}*3 + {ye}*5 + {c}*11 + (i*37) % 256 + "
                "CAST((((CAST(i AS HUGEINT)*2654435761 + "
                f"(({ye})*side+({xe}))*97 + {c}*131) * 1103515245) "
                "% 18446744073709551616) // 65536 % 32 AS BIGINT)) "
                "% 256)")

    def chan(c: str, xe: str, ye: str) -> str:
        r = raw(c, xe, ye)
        return f"(CASE WHEN fmt = 'png' THEN {r} ELSE {r} // 4 * 4 + 2 END)"

    def luma(xe: str, ye: str) -> str:
        return (f"({chan('0', xe, ye)} * 0.299 + "
                f"{chan('1', xe, ye)} * 0.587 + "
                f"{chan('2', xe, ye)} * 0.114)")

    # sample coords: row sy = gy*side//8; bit column pair uses the 8x9
    # grid's x(j) = j*side//9 with bit gx comparing j = gx+1 vs gx
    l2 = luma("((gx + 1) * side) // 9", "(gy * side) // 8")
    l1 = luma("(gx * side) // 9", "(gy * side) // 8")
    return (
        "WITH imgs AS (SELECT CAST(i AS BIGINT) AS i, "
        "CASE i % 5 WHEN 0 THEN 16 WHEN 1 THEN 24 WHEN 2 THEN 32 "
        "WHEN 3 THEN 48 ELSE 64 END AS side, "
        "CASE i % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' "
        "ELSE 'webp' END AS fmt "
        f"FROM range({_CHECKSUM_K}) t(i)), "
        "bits AS (SELECT i, gy, gx, "
        f"CASE WHEN {l2} > {l1} THEN 1 ELSE 0 END AS b "
        "FROM imgs CROSS JOIN range(8) ty(gy) CROSS JOIN range(8) "
        "tx(gx)), "
        "packed AS (SELECT i, sum(CASE WHEN b = 1 THEN "
        "CAST(1 AS HUGEINT) << CAST(gy * 8 + gx AS INTEGER) "
        "ELSE 0 END) AS h FROM bits GROUP BY 1) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(h - CASE WHEN h >= 9223372036854775808 "
        "THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS dhash64 "
        "FROM packed"
    )


def q_grad_energy(sf_dir: str):
    """Hash verification of a TOTAL-VARIATION energy score (the
    edge-density quality signal of image curation): decode → integer
    luma → Σ|∂x| + Σ|∂y| over the luma plane, exact int64.  Oracle =
    luma-plane replay + two neighbor equijoins.  Same head-K / scale
    caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def tv(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            out[i] = (np.abs(y[:, 1:] - y[:, :-1]).sum()
                      + np.abs(y[1:, :] - y[:-1, :]).sum())
        return pa.table({"image_id": b["image_id"],
                         "tv_energy": pa.array(out)})

    return ds.map_batches(tv, batch_format="pyarrow", batch_size=128)


def q_grad_energy_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "dx AS (SELECT c.i, abs(r.l - c.l) AS v FROM lum c "
        "JOIN lum r ON r.i = c.i AND r.y = c.y AND r.x = c.x + 1), "
        "dy AS (SELECT c.i, abs(d.l - c.l) AS v FROM lum c "
        "JOIN lum d ON d.i = c.i AND d.x = c.x AND d.y = c.y + 1), "
        "u AS (SELECT i, v FROM dx UNION ALL SELECT i, v FROM dy) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(v) AS BIGINT) AS tv_energy FROM u GROUP BY 1"
    )


def q_scatter_orientation(sf_dir: str):
    """Per-cell point-scatter principal orientation (anisotropy — the
    directional-trend spatial statistic): for each 15° grid cell, the
    covariance eigen-direction ``atan2(2·Mxy, Mxx − Myy) → micro-int``
    from EXACT integer central moments.  Per-batch Arrow group_by
    pre-reduces each block to per-cell int sums (n, Σx, Σy, Σx², Σy²,
    Σxy over millidegree offsets from the cell origin — shift-
    invariant for central moments and keeps n·Σx² < 2^63 up to ~2e5
    points/cell; beyond that, split cells or carry Welford partials);
    the bounded 24×8 cell space merges on the combiner tree and one
    double atan2 per cell runs on the driver.  Events never shuffle."""
    from ..stages.agg_tree import tree_aggregate_to_table

    def partial(b: pa.Table) -> pa.Table:
        lat, lon = derive_latlon(b["event_id"].to_numpy(
            zero_copy_only=False))
        cx = np.floor((lon + 180.0) / 15.0).astype(np.int64)
        cy = np.floor((lat + 60.0) / 15.0).astype(np.int64)
        xm = np.floor(lon * 1e3 + 0.5).astype(np.int64) \
            - (cx * 15000 - 180000)
        ym = np.floor(lat * 1e3 + 0.5).astype(np.int64) \
            - (cy * 15000 - 60000)
        t = pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "n": pa.array(np.ones(len(xm), np.int64)),
            "sx": pa.array(xm), "sy": pa.array(ym),
            "sxx": pa.array(xm * xm), "syy": pa.array(ym * ym),
            "sxy": pa.array(xm * ym)})
        return (t.group_by(["cx", "cy"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
            .rename_columns(["cx", "cy", "n", "sx", "sy",
                             "sxx", "syy", "sxy"]))

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        partial, batch_format="pyarrow")
    m = tree_aggregate_to_table(
        ds, ["cx", "cy"],
        [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
         ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]).to_pandas()
    m = m[m["n"] >= 2]
    n = m["n"].to_numpy()
    mxy = n * m["sxy"].to_numpy() - m["sx"].to_numpy() * m["sy"].to_numpy()
    mxx = n * m["sxx"].to_numpy() - m["sx"].to_numpy() ** 2
    myy = n * m["syy"].to_numpy() - m["sy"].to_numpy() ** 2
    theta = np.arctan2(2.0 * mxy.astype(np.float64),
                       (mxx - myy).astype(np.float64))
    return pd.DataFrame({
        "cx": m["cx"].to_numpy().astype(np.int64),
        "cy": m["cy"].to_numpy().astype(np.int64),
        "n": n.astype(np.int64),
        "theta_micro": np.floor(theta * 1e6 + 0.5).astype(np.int64)})


def q_scatter_orientation_sql() -> str:
    lat, lon = latlon_sql("event_id")
    return (
        "WITH p AS (SELECT "
        f"CAST(floor(({lon} + 180.0) / 15.0) AS BIGINT) AS cx, "
        f"CAST(floor(({lat} + 60.0) / 15.0) AS BIGINT) AS cy, "
        f"CAST(floor({lon} * 1e3 + 0.5) AS BIGINT) AS xm, "
        f"CAST(floor({lat} * 1e3 + 0.5) AS BIGINT) AS ym "
        "FROM events), "
        "c AS (SELECT cx, cy, xm - (cx * 15000 - 180000) AS dx, "
        "ym - (cy * 15000 - 60000) AS dy FROM p), "
        "s AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy, "
        "CAST(sum(dx * dx) AS BIGINT) AS sxx, "
        "CAST(sum(dy * dy) AS BIGINT) AS syy, "
        "CAST(sum(dx * dy) AS BIGINT) AS sxy "
        "FROM c GROUP BY 1, 2) "
        "SELECT cx, cy, n, CAST(floor(atan2("
        "CAST(2 * (n * sxy - sx * sy) AS DOUBLE), "
        "CAST((n * sxx - sx * sx) - (n * syy - sy * sy) AS DOUBLE)) "
        "* 1e6 + 0.5) AS BIGINT) AS theta_micro FROM s WHERE n >= 2"
    )


def q_histeq_checksum(sf_dir: str):
    """Hash verification of HISTOGRAM EQUALIZATION (the classic
    contrast-normalization preprocessing kernel): decode → integer
    luma → per-image CDF → ``eq(v) = (cdf(v) − cdf(min))·255 //
    (n − cdf(min))`` → Σ of the equalized plane, all exact ints.  The
    oracle replays the CDF as a window cumsum over the per-value luma
    counts of the generator plane.  Flat images (n == cdf(min)) pass
    through as identity — not present in the fixture but pinned in the
    kernel.  Same head-K / scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def eq(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            vals, counts = np.unique(y, return_counts=True)
            cdf = np.cumsum(counts)
            n, cmin = int(cdf[-1]), int(counts[0])
            if n == cmin:
                out[i] = int(vals[0]) * n  # flat: identity
            else:
                eqv = (cdf - cmin) * 255 // (n - cmin)
                out[i] = int((counts * eqv).sum())
        return pa.table({"image_id": b["image_id"],
                         "eq_sum": pa.array(out)})

    return ds.map_batches(eq, batch_format="pyarrow", batch_size=128)


def q_histeq_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "h AS (SELECT i, l, CAST(count(*) AS BIGINT) AS c "
        "FROM lum GROUP BY 1, 2), "
        "w AS (SELECT i, l, c, "
        "CAST(sum(c) OVER (PARTITION BY i ORDER BY l) AS BIGINT) "
        "AS cdf, CAST(sum(c) OVER (PARTITION BY i) AS BIGINT) AS n, "
        "CAST(first_value(c) OVER (PARTITION BY i ORDER BY l) "
        "AS BIGINT) AS cmin FROM h) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(CASE WHEN n = cmin THEN l * c "
        "ELSE c * ((cdf - cmin) * 255 // (n - cmin)) END) AS BIGINT) "
        "AS eq_sum FROM w GROUP BY 1"
    )


def q_glcm_texture(sf_dir: str):
    """Hash verification of GLCM TEXTURE features (Haralick's
    gray-level co-occurrence matrix at offset (+1, 0)): per image,
    contrast = Σ_pairs (l₁−l₂)² straight off the luma plane and
    energy = Σ_{(l₁,l₂)} c(l₁,l₂)² off the pair histogram — both
    exact ints (pairs ≤ 64·63, energy ≤ ~1.6e7).  The oracle rebuilds
    the plane from the pixel generator and takes the horizontal
    neighbour equijoin.  Same head-K / scale caveats as
    image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def glcm(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        con = np.empty(len(blobs), np.int64)
        ene = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            l1, l2 = y[:, :-1].ravel(), y[:, 1:].ravel()
            d = l1 - l2
            con[i] = int((d * d).sum())
            _, counts = np.unique(l1 * 256 + l2, return_counts=True)
            ene[i] = int((counts * counts).sum())
        return pa.table({"image_id": b["image_id"],
                         "contrast": pa.array(con),
                         "energy": pa.array(ene)})

    return ds.map_batches(glcm, batch_format="pyarrow", batch_size=128)


def q_glcm_texture_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "pr AS MATERIALIZED (SELECT a.i, a.l AS l1, b.l AS l2 "
        "FROM lum a JOIN lum b ON a.i = b.i AND a.y = b.y "
        "AND b.x = a.x + 1), "
        "con AS (SELECT i, CAST(sum((l1 - l2) * (l1 - l2)) AS BIGINT) "
        "AS contrast FROM pr GROUP BY 1), "
        "h AS (SELECT i, l1, l2, CAST(count(*) AS BIGINT) AS c "
        "FROM pr GROUP BY 1, 2, 3), "
        "ene AS (SELECT i, CAST(sum(c * c) AS BIGINT) AS energy "
        "FROM h GROUP BY 1) "
        "SELECT 'img_' || lpad(CAST(con.i AS VARCHAR), 12, '0') "
        "AS image_id, contrast, energy "
        "FROM con JOIN ene ON con.i = ene.i"
    )


def q_sobel_octants(sf_dir: str):
    """Hash verification of the SOBEL EDGE-ORIENTATION histogram (the
    HOG building block): 3×3 integer Sobel gradients over interior
    luma pixels, orientation binned into 8 octants by PURE INTEGER
    predicates — bin = quadrant(gx, gy)·2 + [|gy| > |gx|] — so there
    is no atan2 and no float anywhere; zero-gradient pixels count in
    a separate ``flat`` column.  The oracle replays the stencil as
    eight neighbour equijoins over the generator plane.  Same head-K
    / scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def sobel(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.zeros((len(blobs), 9), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            gx = (y[:-2, 2:] + 2 * y[1:-1, 2:] + y[2:, 2:]
                  - y[:-2, :-2] - 2 * y[1:-1, :-2] - y[2:, :-2])
            gy = (y[2:, :-2] + 2 * y[2:, 1:-1] + y[2:, 2:]
                  - y[:-2, :-2] - 2 * y[:-2, 1:-1] - y[:-2, 2:])
            flat = (gx == 0) & (gy == 0)
            quad = np.where(gx >= 0, np.where(gy >= 0, 0, 3),
                            np.where(gy >= 0, 1, 2))
            b8 = quad * 2 + (np.abs(gy) > np.abs(gx))
            cnt = np.bincount(b8[~flat].ravel(), minlength=8)
            out[i, :8] = cnt
            out[i, 8] = int(flat.sum())
        cols = {"image_id": b["image_id"]}
        for j in range(8):
            cols[f"b{j}"] = pa.array(out[:, j])
        cols["flat"] = pa.array(out[:, 8])
        return pa.table(cols)

    return ds.map_batches(sobel, batch_format="pyarrow", batch_size=128)


def q_sobel_octants_sql() -> str:
    bins = ", ".join(
        f"CAST(sum(CASE WHEN NOT (gx = 0 AND gy = 0) AND "
        f"(CASE WHEN gx >= 0 THEN (CASE WHEN gy >= 0 THEN 0 ELSE 3 "
        f"END) ELSE (CASE WHEN gy >= 0 THEN 1 ELSE 2 END) END) * 2 "
        f"+ (CASE WHEN abs(gy) > abs(gx) THEN 1 ELSE 0 END) = {j} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS b{j}" for j in range(8))
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "g AS MATERIALIZED (SELECT c.i, "
        "(ne.l + 2 * e.l + se.l - nw.l - 2 * w.l - sw.l) AS gx, "
        "(sw.l + 2 * s.l + se.l - nw.l - 2 * n.l - ne.l) AS gy "
        "FROM lum c "
        "JOIN lum nw ON nw.i = c.i AND nw.x = c.x - 1 AND nw.y = c.y - 1 "
        "JOIN lum n  ON n.i  = c.i AND n.x  = c.x     AND n.y  = c.y - 1 "
        "JOIN lum ne ON ne.i = c.i AND ne.x = c.x + 1 AND ne.y = c.y - 1 "
        "JOIN lum w  ON w.i  = c.i AND w.x  = c.x - 1 AND w.y  = c.y "
        "JOIN lum e  ON e.i  = c.i AND e.x  = c.x + 1 AND e.y  = c.y "
        "JOIN lum sw ON sw.i = c.i AND sw.x = c.x - 1 AND sw.y = c.y + 1 "
        "JOIN lum s  ON s.i  = c.i AND s.x  = c.x     AND s.y  = c.y + 1 "
        "JOIN lum se ON se.i = c.i AND se.x = c.x + 1 AND se.y = c.y + 1 "
        "WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') "
        "AS image_id, " + bins + ", "
        "CAST(sum(CASE WHEN gx = 0 AND gy = 0 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS flat FROM g GROUP BY 1"
    )


def q_otsu_checksum(sf_dir: str):
    """Hash verification of OTSU THRESHOLDING (the classic histogram
    segmentation kernel): decode → integer luma → per-image argmax of
    the between-class variance over the present luma values, computed
    as the EXACT integer score ((w0·S − n·S0)²·2^20) // (w0·(n−w0))
    (numerator ≤ ~2e25: Python bigints here, HUGEINT in the oracle;
    the shared floor-scaled score makes ties identical on both sides,
    broken by the smaller threshold).  Output = threshold plus the
    below-threshold pixel count and luma mass.  Same head-K / scale
    caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def otsu(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        ts = np.empty(len(blobs), np.int64)
        lo_n = np.empty(len(blobs), np.int64)
        lo_sum = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            vals, counts = np.unique(y, return_counts=True)
            cdf = np.cumsum(counts)
            s0c = np.cumsum(vals * counts)
            n, s = int(cdf[-1]), int(s0c[-1])
            best = (-1, -1, -1, -1)  # (score, -t) argmax w/ min-t tie
            for j in range(len(vals) - 1):  # last value has w0 == n
                w0, sj = int(cdf[j]), int(s0c[j])
                d = w0 * s - n * sj
                score = (d * d << 20) // (w0 * (n - w0))
                if score > best[0]:
                    best = (score, int(vals[j]), w0, sj)
            if best[1] < 0:  # flat image: single luma value
                best = (0, int(vals[0]), n, s)
            ts[i], lo_n[i], lo_sum[i] = best[1], best[2], best[3]
        return pa.table({"image_id": b["image_id"],
                         "otsu_t": pa.array(ts),
                         "lo_n": pa.array(lo_n),
                         "lo_sum": pa.array(lo_sum)})

    # smaller batches than the vectorized checksums: the per-image
    # threshold argmax is a (bounded) Python-bigint loop, so spread it
    return ds.map_batches(otsu, batch_format="pyarrow", batch_size=32)


def q_otsu_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "h AS (SELECT i, l, CAST(count(*) AS BIGINT) AS c "
        "FROM lum GROUP BY 1, 2), "
        "w AS (SELECT i, l, "
        "CAST(sum(c) OVER (PARTITION BY i ORDER BY l) AS HUGEINT) "
        "AS w0, "
        "CAST(sum(l * c) OVER (PARTITION BY i ORDER BY l) AS HUGEINT) "
        "AS s0, "
        "CAST(sum(c) OVER (PARTITION BY i) AS HUGEINT) AS n, "
        "CAST(sum(l * c) OVER (PARTITION BY i) AS HUGEINT) AS s "
        "FROM h), "
        "sc AS (SELECT i, l, w0, s0, "
        "(w0 * s - n * s0) * (w0 * s - n * s0) * 1048576 "
        "// (w0 * (n - w0)) AS score FROM w WHERE w0 < n), "
        "r AS (SELECT i, l, w0, s0, row_number() OVER "
        "(PARTITION BY i ORDER BY score DESC, l) AS rn FROM sc) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') "
        "AS image_id, l AS otsu_t, CAST(w0 AS BIGINT) AS lo_n, "
        "CAST(s0 AS BIGINT) AS lo_sum FROM r WHERE rn = 1 "
        # flat (single-luma) images have their only row dropped by the
        # sc filter (w0 = n); mirror the engine's fallback row
        # (t = the one value, lo_n = n, lo_sum = full mass) so a flat
        # image cannot split row-count parity
        "UNION ALL SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0'), "
        "min(l), CAST(sum(c) AS BIGINT), CAST(sum(l * c) AS BIGINT) "
        "FROM h GROUP BY i HAVING count(*) = 1"
    )


def q_hu_moment(sf_dir: str):
    """Hash verification of IMAGE MOMENTS (luma centroid + the first
    Hu invariant φ1 = (μ20+μ02)/μ00² — the scale-normalized spread
    feature): raw moments S, Σx·l, Σy·l, Σx²·l, Σy²·l are exact int64
    plane sums; central-moment numerators S·Mxx − Mx² (= S²·μ20) stay
    exact ints; the two finalize divisions (centroid micro-pixels,
    φ1 pico) are fixed double sequences pinned to ints.  Same head-K
    / scale caveats as image_checksum."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.image_codec import decode_image

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                               filter=pds.field("image_id") < hi)

    def moments(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        cxm = np.empty(len(blobs), np.int64)
        cym = np.empty(len(blobs), np.int64)
        phi = np.empty(len(blobs), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            side = y.shape[0]
            xs = np.arange(side, dtype=np.int64)[None, :]
            ys = np.arange(side, dtype=np.int64)[:, None]
            s = int(y.sum())
            mx, my = int((xs * y).sum()), int((ys * y).sum())
            mxx = int((xs * xs * y).sum())
            myy = int((ys * ys * y).sum())
            mu_num = (s * mxx - mx * mx) + (s * myy - my * my)
            cxm[i] = int(np.floor(float(mx) / float(s) * 1e6 + 0.5))
            cym[i] = int(np.floor(float(my) / float(s) * 1e6 + 0.5))
            phi[i] = int(np.floor(float(mu_num) / float(s * s * s)
                                  * 1e12 + 0.5))
        return pa.table({"image_id": b["image_id"],
                         "cx_micro": pa.array(cxm),
                         "cy_micro": pa.array(cym),
                         "phi1_pico": pa.array(phi)})

    return ds.map_batches(moments, batch_format="pyarrow", batch_size=128)


def q_hu_moment_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "m AS (SELECT i, CAST(sum(l) AS BIGINT) AS s, "
        "CAST(sum(x * l) AS BIGINT) AS mx, "
        "CAST(sum(y * l) AS BIGINT) AS my, "
        "CAST(sum(x * x * l) AS BIGINT) AS mxx, "
        "CAST(sum(y * y * l) AS BIGINT) AS myy FROM lum GROUP BY 1) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') "
        "AS image_id, "
        "CAST(floor(CAST(mx AS DOUBLE) / CAST(s AS DOUBLE) * 1e6 "
        "+ 0.5) AS BIGINT) AS cx_micro, "
        "CAST(floor(CAST(my AS DOUBLE) / CAST(s AS DOUBLE) * 1e6 "
        "+ 0.5) AS BIGINT) AS cy_micro, "
        "CAST(floor(CAST((s * mxx - mx * mx) + (s * myy - my * my) "
        "AS DOUBLE) / CAST(s * s * s AS DOUBLE) * 1e12 + 0.5) "
        "AS BIGINT) AS phi1_pico FROM m"
    )


# ---------------------------------------------------------------------------
# round-5 checksum kernels: each decodes the head-K fixture images inside
# map_batches (bytes never leave the task) and emits exact-integer per-image
# features; every oracle replays fixtures.py::_gen_pixels in HUGEINT like
# q_image_checksum_sql, so encode → parquet → Arrow → decode → kernel is
# pinned end-to-end.  Same head-K / scale caveats as image_checksum.


def _checksum_ds(sf_dir: str):
    """Pruned (image_id, bytes, fmt) stream of the first K fixture
    images — the row filter is pushed to the parquet read so row
    groups beyond K never ship their bytes."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir

    hi = f"img_{_CHECKSUM_K:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    return ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"],
                                 filter=pds.field("image_id") < hi)


def _luma_kernel(per_image):
    """Build a map_batches fn: decode → integer luma plane →
    ``per_image(y) -> {col: int}`` rows (all int64)."""
    from ..functions.image_codec import decode_image

    def fn(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        rows = []
        for i in range(len(blobs)):  # variable-size payloads: the
            # per-row loop is the decode itself (module docstring)
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            rows.append(per_image(y))
        cols = {"image_id": b["image_id"]}
        if rows:
            for k in rows[0]:
                cols[k] = pa.array(
                    np.array([r[k] for r in rows], np.int64))
        return pa.table(cols)

    return fn


def q_integral_checksum(sf_dir: str):
    """Hash verification of the INTEGRAL IMAGE (summed-area table —
    the Viola-Jones / box-filter building block): decode → luma →
    2-D inclusive prefix sums; emit the exact int64 sum of the table
    and its corner (= total luma mass).  The oracle uses the closed
    form Σ ii = Σ l(x,y)·(side−x)·(side−y), so any off-by-one in the
    cumulative sums mismatches."""
    def per(y: np.ndarray) -> dict:
        ii = y.cumsum(axis=0).cumsum(axis=1)
        return {"ii_sum": int(ii.sum()), "total": int(ii[-1, -1])}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_integral_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + " "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(l * (side - x) * (side - y)) AS BIGINT) AS ii_sum,"
        " CAST(sum(l) AS BIGINT) AS total FROM lum GROUP BY 1"
    )


def q_maxpool_checksum(sf_dir: str):
    """Hash verification of 2×2 stride-2 MAX POOLING (the CNN
    downsampling kernel; every fixture side is even): emit the pooled
    plane's exact sum and min.  Oracle pools by (x//2, y//2) groups."""
    def per(y: np.ndarray) -> dict:
        h, w = y.shape
        p = y.reshape(h // 2, 2, w // 2, 2).max(axis=(1, 3))
        return {"pool_sum": int(p.sum()), "pool_min": int(p.min())}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_maxpool_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "p AS (SELECT i, x // 2 AS px, y // 2 AS py, max(l) AS m "
        "FROM lum GROUP BY 1, 2, 3) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(min(m) AS BIGINT) AS pool_min,"
        " CAST(sum(m) AS BIGINT) AS pool_sum FROM p GROUP BY 1"
    )


def q_rle_runs(sf_dir: str):
    """Hash verification of ROW-WISE RUN-LENGTH structure on the
    binarized (luma ≥ 128) plane — the RLE-compressibility signal of
    image curation: n_runs = rows + horizontal transitions, n_set =
    set-pixel count.  Oracle counts transitions via one left-neighbor
    equijoin."""
    def per(y: np.ndarray) -> dict:
        bimg = y >= 128
        runs = bimg.shape[0] + int((bimg[:, 1:] != bimg[:, :-1]).sum())
        return {"n_runs": runs, "n_set": int(bimg.sum())}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_rle_runs_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "s1 AS (SELECT i, any_value(side) AS side, "
        "sum(CASE WHEN l >= 128 THEN 1 ELSE 0 END) AS n_set "
        "FROM lum GROUP BY 1), "
        "s2 AS (SELECT c.i, sum(CASE WHEN (c.l >= 128) <> (w.l >= 128) "
        "THEN 1 ELSE 0 END) AS chg FROM lum c "
        "JOIN lum w ON w.i = c.i AND w.y = c.y AND w.x = c.x - 1 "
        "GROUP BY 1) "
        "SELECT 'img_' || lpad(CAST(s1.i AS VARCHAR), 12, '0') "
        "AS image_id, "
        "CAST(s1.side + COALESCE(s2.chg, 0) AS BIGINT) AS n_runs, "
        "CAST(s1.n_set AS BIGINT) AS n_set "
        "FROM s1 LEFT JOIN s2 ON s2.i = s1.i"
    )


_LBP_OFFS = ((-1, -1), (0, -1), (1, -1), (1, 0),
             (1, 1), (0, 1), (-1, 1), (-1, 0))


def q_lbp_hist(sf_dir: str):
    """Hash verification of LOCAL BINARY PATTERNS (the classic
    texture descriptor): interior pixels get an 8-bit code — bit k
    set iff neighbor k's luma ≥ center luma, neighbor order fixed
    clockwise from NW — and each image emits the 8-bucket coarse
    histogram (code // 32) plus the exact code sum.  Oracle = eight
    neighbor equijoins, same shape as sobel_octants."""
    def per(y: np.ndarray) -> dict:
        h, w = y.shape
        c = y[1:-1, 1:-1]
        code = np.zeros_like(c)
        for k, (dx, dy) in enumerate(_LBP_OFFS):
            n = y[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
            code += (n >= c).astype(np.int64) << k
        cnt = np.bincount((code // 32).ravel(), minlength=8)
        d = {f"b{j}": int(cnt[j]) for j in range(8)}
        d["code_sum"] = int(code.sum())
        return d

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_lbp_hist_sql() -> str:
    names = ("nw", "n", "ne", "e", "se", "s", "sw", "w")
    joins = " ".join(
        f"JOIN lum {nm} ON {nm}.i = c.i AND {nm}.x = c.x + ({dx}) "
        f"AND {nm}.y = c.y + ({dy})"
        for nm, (dx, dy) in zip(names, _LBP_OFFS))
    code = " + ".join(
        f"(CASE WHEN {nm}.l >= c.l THEN {1 << k} ELSE 0 END)"
        for k, nm in enumerate(names))
    bins = ", ".join(
        f"CAST(sum(CASE WHEN code // 32 = {j} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS b{j}" for j in range(8))
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        f"g AS MATERIALIZED (SELECT c.i, {code} AS code FROM lum c "
        + joins +
        " WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id, "
        + bins + ", CAST(sum(code) AS BIGINT) AS code_sum "
        "FROM g GROUP BY 1"
    )


def q_median3_checksum(sf_dir: str):
    """Hash verification of the 3×3 MEDIAN FILTER (the denoise
    kernel): exact 5th-order statistic of each interior pixel's
    neighborhood; emit the filtered plane's sum and its ≥128 count.
    Oracle = nine shifted equijoins unioned, then quantile_disc(0.5)
    (the discrete 5th-of-9 — identical to numpy's sort[4])."""
    def per(y: np.ndarray) -> dict:
        h, w = y.shape
        stk = np.stack([y[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        med = np.sort(stk, axis=0)[4]
        return {"med_sum": int(med.sum()),
                "med_hi": int((med >= 128).sum())}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_median3_checksum_sql() -> str:
    shifts = " UNION ALL ".join(
        f"SELECT c.i, c.x, c.y, n.l FROM lum c "
        f"JOIN lum n ON n.i = c.i AND n.x = c.x + ({dx}) "
        f"AND n.y = c.y + ({dy}) "
        f"WHERE c.x BETWEEN 1 AND c.side - 2 "
        f"AND c.y BETWEEN 1 AND c.side - 2"
        for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "n9 AS MATERIALIZED (" + shifts + "), "
        "m AS (SELECT i, x, y, quantile_disc(l, 0.5) AS med "
        "FROM n9 GROUP BY 1, 2, 3) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(CASE WHEN med >= 128 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS med_hi, CAST(sum(med) AS BIGINT) AS med_sum "
        "FROM m GROUP BY 1"
    )


def q_euler4x(sf_dir: str):
    """Hash verification of the EULER NUMBER (components − holes) of
    the binarized (luma ≥ 128) plane via Gray's quad-counting — a
    pure LOCAL formula, no iterative labeling: over all 2×2 quads of
    the zero-padded image count q1 (one set pixel), q3 (three), qd
    (diagonal pairs); 4·E = q1 − q3 + 2·qd for 4-connectivity.  Emits
    the raw quad counts plus euler4x so both sides stay divisions-free.
    Oracle = four LEFT-JOIN probes of the luma plane per quad corner
    with COALESCE-0 padding."""
    def per(y: np.ndarray) -> dict:
        p = np.pad((y >= 128).astype(np.int64), 1)
        b00 = p[:-1, :-1]
        b01 = p[:-1, 1:]
        b10 = p[1:, :-1]
        b11 = p[1:, 1:]
        s = b00 + b01 + b10 + b11
        q1 = int((s == 1).sum())
        q3 = int((s == 3).sum())
        qd = int(((s == 2) & (b00 == b11)).sum())
        return {"q1": q1, "q3": q3, "qd": qd,
                "euler4x": q1 - q3 + 2 * qd}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_euler4x_sql() -> str:
    def probe(nm: str, dx: int, dy: int) -> str:
        return (f"LEFT JOIN lum {nm} ON {nm}.i = imgs.i "
                f"AND {nm}.x = u - 1 + {dx} AND {nm}.y = v - 1 + {dy}")

    def bit(nm: str) -> str:
        return f"COALESCE(CASE WHEN {nm}.l >= 128 THEN 1 ELSE 0 END, 0)"

    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "q AS MATERIALIZED (SELECT imgs.i, "
        f"{bit('p00')} AS b00, {bit('p01')} AS b01, "
        f"{bit('p10')} AS b10, {bit('p11')} AS b11 "
        "FROM imgs "
        "JOIN range(65) tu(u) ON tu.u <= imgs.side "
        "JOIN range(65) tv(v) ON tv.v <= imgs.side "
        + probe("p00", 0, 0) + " " + probe("p01", 1, 0) + " "
        + probe("p10", 0, 1) + " " + probe("p11", 1, 1) + "), "
        "c AS (SELECT i, b00 + b01 + b10 + b11 AS s, b00, b11 FROM q) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,"
        " CAST(sum(CASE WHEN s = 3 THEN 1 ELSE 0 END) AS BIGINT) AS q3,"
        " CAST(sum(CASE WHEN s = 2 AND b00 = b11 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS qd, "
        "CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) "
        "- sum(CASE WHEN s = 3 THEN 1 ELSE 0 END) "
        "+ 2 * sum(CASE WHEN s = 2 AND b00 = b11 THEN 1 ELSE 0 END) "
        "AS BIGINT) AS euler4x FROM c GROUP BY 1"
    )


def q_chan_corr(sf_dir: str):
    """Hash verification of CHANNEL COVARIANCE (the grayscale /
    color-cast screen of image curation): per image the exact integer
    co-moments n·Σab − Σa·Σb for (R,G), (G,B), (R,B) — all within
    int64 at side ≤ 64 — so a constant-hue image pins to equal
    covariances and any channel swap flips the triple.  Oracle rides
    the per-channel generator replay (_rgb_table_sql)."""
    from ..functions.image_codec import decode_image

    def fn(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        out = np.empty((len(blobs), 3), np.int64)
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            r = img[:, :, 0].ravel()
            g = img[:, :, 1].ravel()
            bl = img[:, :, 2].ravel()
            n = r.size
            out[i, 0] = n * int((r * g).sum()) - int(r.sum()) * int(g.sum())
            out[i, 1] = n * int((g * bl).sum()) - int(g.sum()) * int(bl.sum())
            out[i, 2] = n * int((r * bl).sum()) - int(r.sum()) * int(bl.sum())
        return pa.table({"image_id": b["image_id"],
                         "cov_rg": pa.array(out[:, 0]),
                         "cov_gb": pa.array(out[:, 1]),
                         "cov_rb": pa.array(out[:, 2])})

    return _checksum_ds(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=128)


def q_chan_corr_sql() -> str:
    from ._common import _rgb_table_sql

    return (
        "WITH " + _rgb_table_sql(_CHECKSUM_K) + " "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(count(*) * sum(r * g) - sum(r) * sum(g) AS BIGINT) "
        "AS cov_rg, "
        "CAST(count(*) * sum(g * b) - sum(g) * sum(b) AS BIGINT) "
        "AS cov_gb, "
        "CAST(count(*) * sum(r * b) - sum(r) * sum(b) AS BIGINT) "
        "AS cov_rb FROM rgb GROUP BY 1"
    )


# fixed-point cos/sin for the 8 Hough angles θ = k·π/8 (×1024,
# hardcoded identically in the Ray kernel and the oracle so no
# transcendental is ever evaluated at runtime on either side)
_HOUGH_COS = (1024, 946, 724, 392, 0, -392, -724, -946)
_HOUGH_SIN = (0, 392, 724, 946, 1024, 946, 724, 392)
_HOUGH_RHO_DIV = 4096          # 1024 fixed-point × 4-pixel rho bins
_HOUGH_RHO_OFF = 262144        # shifts rho non-negative BEFORE the bin
# division: numpy floors toward -inf, DuckDB's integer // truncates
# toward zero, so a negative rho would bin differently on the two sides
_HOUGH_EDGE_T2 = 3600          # gx² + gy² > 60²


def q_hough_lines(sf_dir: str):
    """Hash verification of an integer HOUGH LINE TRANSFORM (the
    classic global line detector): central-difference gradients pick
    edge pixels (gx²+gy² > T²), each votes for 8 discretized angles
    with fixed-point rho = (x·cos + y·sin) // 4096 — the cos/sin
    table is a shared integer constant, so both sides are
    transcendental-free — and the image reports its top (theta, rho)
    accumulator cell (ties broken by smaller theta then rho).  Oracle
    = 4 neighbor equijoins → 8-angle cross join → windowed argmax."""
    def per(y: np.ndarray) -> dict:
        h, w = y.shape
        gx = y[1:-1, 2:] - y[1:-1, :-2]
        gy = y[2:, 1:-1] - y[:-2, 1:-1]
        ex, ey = np.nonzero(gx * gx + gy * gy > _HOUGH_EDGE_T2)
        xs, ys = ey + 1, ex + 1  # full-image pixel coords
        votes: dict[tuple[int, int], int] = {}
        for k in range(8):
            rho = (xs * _HOUGH_COS[k] + ys * _HOUGH_SIN[k]
                   + _HOUGH_RHO_OFF) // _HOUGH_RHO_DIV
            vals, cnts = np.unique(rho, return_counts=True)
            for r, c in zip(vals.tolist(), cnts.tolist()):
                votes[(k, r)] = c
        n_edges = int(len(xs))
        if votes:
            (bk, br), bv = max(votes.items(),
                               key=lambda kv: (kv[1], -kv[0][0],
                                               -kv[0][1]))
        else:
            bk, br, bv = 0, 0, 0
        return {"theta_k": bk, "rho_bin": br, "votes": bv,
                "n_edges": n_edges}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_hough_lines_sql() -> str:
    ang = ", ".join(f"({k}, {_HOUGH_COS[k]}, {_HOUGH_SIN[k]})"
                    for k in range(8))
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "g AS MATERIALIZED (SELECT c.i, c.x, c.y, "
        "(e.l - w.l) AS gx, (s.l - n.l) AS gy FROM lum c "
        "JOIN lum e ON e.i = c.i AND e.y = c.y AND e.x = c.x + 1 "
        "JOIN lum w ON w.i = c.i AND w.y = c.y AND w.x = c.x - 1 "
        "JOIN lum s ON s.i = c.i AND s.x = c.x AND s.y = c.y + 1 "
        "JOIN lum n ON n.i = c.i AND n.x = c.x AND n.y = c.y - 1 "
        "WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2), "
        f"edges AS (SELECT i, x, y FROM g "
        f"WHERE gx * gx + gy * gy > {_HOUGH_EDGE_T2}), "
        # ne comes from g (never empty at side >= 16), so an image with
        # zero edge pixels still emits its fallback row like the engine
        f"ne AS (SELECT i, sum(CASE WHEN gx * gx + gy * gy > "
        f"{_HOUGH_EDGE_T2} THEN 1 ELSE 0 END) AS n_edges "
        "FROM g GROUP BY 1), "
        f"ang(k, c, s) AS (SELECT * FROM (VALUES {ang})), "
        "acc AS (SELECT e.i, ang.k, "
        f"(e.x * ang.c + e.y * ang.s + {_HOUGH_RHO_OFF}) "
        f"// {_HOUGH_RHO_DIV} AS rho, "
        "count(*) AS v FROM edges e CROSS JOIN ang GROUP BY 1, 2, 3), "
        "top AS (SELECT i, k, rho, v, row_number() OVER ("
        "PARTITION BY i ORDER BY v DESC, k, rho) AS rn FROM acc) "
        "SELECT 'img_' || lpad(CAST(ne.i AS VARCHAR), 12, '0') "
        "AS image_id, "
        "CAST(COALESCE(top.k, 0) AS BIGINT) AS theta_k, "
        "CAST(COALESCE(top.rho, 0) AS BIGINT) AS rho_bin, "
        "CAST(COALESCE(top.v, 0) AS BIGINT) AS votes, "
        "CAST(ne.n_edges AS BIGINT) AS n_edges "
        "FROM ne LEFT JOIN top ON top.i = ne.i AND top.rn = 1"
    )


_HARRIS_T = 100_000_000


def q_harris_corners(sf_dir: str):
    """Hash verification of the HARRIS CORNER response (the interest-
    point detector behind classical feature matching): central-
    difference gradients, 2×2 structure-tensor window sums, exact
    integer response R = 16·(Sxx·Syy − Sxy²) − (Sxx+Syy)² (k = 1/16
    cleared of the division).  Emits the count of responses above a
    fixed threshold and their exact sum.  Oracle = gradient CTE +
    four window self-joins."""
    def per(y: np.ndarray) -> dict:
        gx = (y[1:-1, 2:] - y[1:-1, :-2]).astype(np.int64)
        gy = (y[2:, 1:-1] - y[:-2, 1:-1]).astype(np.int64)
        xx, yy, xy = gx * gx, gy * gy, gx * gy
        sxx = xx[:-1, :-1] + xx[:-1, 1:] + xx[1:, :-1] + xx[1:, 1:]
        syy = yy[:-1, :-1] + yy[:-1, 1:] + yy[1:, :-1] + yy[1:, 1:]
        sxy = xy[:-1, :-1] + xy[:-1, 1:] + xy[1:, :-1] + xy[1:, 1:]
        r = 16 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
        hits = r > _HARRIS_T
        return {"n_corners": int(hits.sum()),
                "r_sum": int(r[hits].sum())}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_harris_corners_sql() -> str:
    probes = " ".join(
        f"JOIN g g{j} ON g{j}.i = g0.i AND g{j}.x = g0.x + {dx} "
        f"AND g{j}.y = g0.y + {dy}"
        for j, (dx, dy) in enumerate([(1, 0), (0, 1), (1, 1)], start=1))
    sxx = " + ".join(f"g{j}.gx * g{j}.gx" for j in range(4))
    syy = " + ".join(f"g{j}.gy * g{j}.gy" for j in range(4))
    sxy = " + ".join(f"g{j}.gx * g{j}.gy" for j in range(4))
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "g AS MATERIALIZED (SELECT c.i, c.side, c.x, c.y, "
        "(e.l - w.l) AS gx, (s.l - n.l) AS gy FROM lum c "
        "JOIN lum e ON e.i = c.i AND e.y = c.y AND e.x = c.x + 1 "
        "JOIN lum w ON w.i = c.i AND w.y = c.y AND w.x = c.x - 1 "
        "JOIN lum s ON s.i = c.i AND s.x = c.x AND s.y = c.y + 1 "
        "JOIN lum n ON n.i = c.i AND n.x = c.x AND n.y = c.y - 1 "
        "WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2), "
        f"r AS (SELECT g0.i, ({sxx}) AS sxx, ({syy}) AS syy, "
        f"({sxy}) AS sxy FROM g g0 {probes} "
        "WHERE g0.x < g0.side - 2 AND g0.y < g0.side - 2), "
        "resp AS (SELECT i, 16 * (sxx * syy - sxy * sxy) "
        "- (sxx + syy) * (sxx + syy) AS rr FROM r) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        f" CAST(sum(CASE WHEN rr > {_HARRIS_T} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_corners, "
        f"CAST(COALESCE(sum(CASE WHEN rr > {_HARRIS_T} THEN rr END), 0) "
        "AS BIGINT) AS r_sum FROM resp GROUP BY 1"
    )


def q_exact_dedup_head(sf_dir: str):
    """Hash verification of the PROJECTED EXACT-DEDUP path
    (stages/dedup.py::exact_dedup_projected — projected (key, id)
    shuffle, combiner-tree winners, broadcast semi-join back) over the
    head-K fixture images.  The fixture's duplicate STRUCTURE is pure
    index arithmetic — row i copies row i−1's phash exactly when
    i % 50 == 49 (fixtures.py::make_images), values are irrelevant to
    equality — so the surviving id set has a closed-form oracle valid
    at every scale: all head-K ids except the copies.  A 64-bit random
    collision would break it (~1e-14 at K=1000; the fixture is
    deterministic, so parity is stable)."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..stages.dedup import exact_dedup_projected

    k = 1000
    hi = f"img_{k:012d}"
    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "phash"],
                               filter=pds.field("image_id") < hi)
    out = exact_dedup_projected(ds, "phash", "image_id")
    return out.map_batches(lambda b: b.select(["image_id"]),
                           batch_format="pyarrow")


def q_exact_dedup_head_sql() -> str:
    return (
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id "
        "FROM range(1000) t(i) WHERE NOT (i % 50 = 49 AND i > 0)"
    )


_HAMPAIR_K = 2000


def q_hamming_pairs(sf_dir: str):
    """Hash verification of BANDED-LSH CANDIDATE GENERATION against
    brute force: all image pairs within Hamming ≤ 3 on the stored
    64-bit phash, via the 4×16-bit band explode → hash-bucket
    co-partition → in-bucket pair scan → vectorized popcount verify →
    pair dedupe — the exact machinery of the near-dup harness.  With
    4 bands and ≤ 3 differing bits, pigeonhole guarantees every true
    pair shares a band, so the banded result must EQUAL the O(K²)
    oracle (DuckDB bit_count(xor()) self-join over the same fixture
    parquet) — recall 1 is verified, not assumed.  Pinned to the
    correctness-scale fixture at every sf so the oracle is one fixed
    file read."""
    import pyarrow.dataset as pds
    import ray.data

    from ..fixtures import ensure_images_parquet
    from ..functions.near_dup import hamming64
    from ..stages.scan import hash_bucket_scan

    k = _HAMPAIR_K
    hi = f"img_{k:012d}"
    images = ensure_images_parquet("correctness")
    ds = ray.data.read_parquet(images, columns=["image_id", "phash"],
                               filter=pds.field("image_id") < hi)

    mask = np.uint64(0xFFFF)

    def band_fn(b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_numpy(zero_copy_only=False)
        h = b["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        if not n:
            return pa.table({"band_id": pa.array([], pa.int64()),
                             "band_hash": pa.array([], pa.int64()),
                             "image_id": pa.array([], pa.string()),
                             "phash": pa.array([], pa.int64())})
        band_id = np.repeat(np.arange(4, dtype=np.int64), n)
        band_hash = np.concatenate([
            ((h >> np.uint64(16 * j)) & mask).view(np.int64)
            for j in range(4)])
        return pa.table({
            "band_id": pa.array(band_id),
            "band_hash": pa.array(band_hash),
            "image_id": pa.array(np.tile(ids, 4), pa.string()),
            "phash": pa.array(np.tile(h.view(np.int64), 4))})

    bands_ds = ds.map_batches(band_fn, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        bid = t["band_id"].to_numpy(zero_copy_only=False)
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        ids = t["image_id"].to_numpy(zero_copy_only=False)
        ph = t["phash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bh, bid))
        bid, bh, ids, ph = bid[order], bh[order], ids[order], ph[order]
        new = np.r_[True, (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(bid)]
        out_a, out_b, out_d = [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            if e - s < 2:
                continue  # buckets are near-singletons; the rare run
                # is tiny, so this loop touches a handful of rows
            for i in range(s, e):
                d = hamming64(np.full(e - i - 1, ph[i]), ph[i + 1:e])
                hit = np.flatnonzero(d <= 3)
                for j in hit.tolist():
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + j])
                    out_d.append(int(d[j]))
        return pa.table({"id_a": pa.array(out_a, pa.string()),
                         "id_b": pa.array(out_b, pa.string()),
                         "dist": pa.array(out_d, pa.int64())})

    pairs = hash_bucket_scan(bands_ds, ["band_id", "band_hash"],
                             bucket_pairs, n_rows=4 * k)

    def dedupe(t: pa.Table) -> pa.Table:
        g = t.group_by(["id_a", "id_b"]).aggregate([("dist", "min")])
        return g.rename_columns(["id_a", "id_b", "dist"])

    return hash_bucket_scan(pairs, ["id_a", "id_b"], dedupe,
                            n_rows=16 * k)


def q_hamming_pairs_sql() -> str:
    from ..fixtures import FIXTURE_DIR

    path = os.path.join(FIXTURE_DIR, "images_correctness.parquet")
    hi = f"img_{_HAMPAIR_K:012d}"
    return (
        f"WITH p AS (SELECT image_id, phash FROM read_parquet('{path}') "
        f"WHERE image_id < '{hi}') "
        "SELECT a.image_id AS id_a, b.image_id AS id_b, "
        "CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS dist "
        "FROM p a JOIN p b ON a.image_id < b.image_id "
        "WHERE bit_count(xor(a.phash, b.phash)) <= 3"
    )


def q_image_tiles(sf_dir: str):
    """Hash verification of the FLAGSHIP's geotag → tile-stats spine
    over the images table (pipelines/flagship.py minus the polygon PIP
    join, which no SQL can replay): stages/geotag.add_geotag decodes
    the stored phash into (lat, lon) and stages/tiling.tile_stats
    produces the z=12 per-tile counts via the combiner tree.  The
    oracle reads the SAME fixture parquet (pinned to the correctness
    scale at every sf) and replays the unsigned phash split and the
    web-mercator math in SQL — the first end-to-end pin of the
    flagship's own stage functions on the images path."""
    import ray.data

    from ..fixtures import ensure_images_parquet
    from ..stages.geotag import add_geotag
    from ..stages.tiling import tile_stats

    images = ensure_images_parquet("correctness")
    ds = ray.data.read_parquet(images, columns=["image_id", "phash"])
    ds = ds.map_batches(add_geotag, batch_format="pyarrow")
    out = tile_stats(ds, z=12)
    return out.map_batches(
        lambda b: b.set_column(0, "tile_z",
                               b["tile_z"].cast(pa.int64())),
        batch_format="pyarrow")


def q_image_tiles_sql() -> str:
    from ..fixtures import FIXTURE_DIR
    from ..geo.tiles import tile_sql

    path = os.path.join(FIXTURE_DIR, "images_correctness.parquet")
    u = ("(CAST(phash AS HUGEINT) + CASE WHEN phash < 0 "
         "THEN 18446744073709551616 ELSE 0 END)")
    hi = f"CAST({u} // 4294967296 AS BIGINT)"
    lo = f"CAST({u} % 4294967296 AS BIGINT)"
    lat = f"(-60.0 + 120.0 * {hi} / 4294967296.0)"
    lon = f"(-180.0 + 360.0 * {lo} / 4294967296.0)"
    xe, ye = tile_sql(lat, lon, 12)
    return (
        f"SELECT CAST(12 AS BIGINT) AS tile_z, {xe} AS tile_x, "
        f"{ye} AS tile_y, CAST(count(*) AS BIGINT) AS n_images "
        f"FROM read_parquet('{path}') GROUP BY 2, 3"
    )


def q_knn_images_exact(sf_dir: str):
    """Hash verification of the CELL-INDEX kNN (stages/knn.py
    CellKnnIndex bulk disk-1 + ring fallback) on the images table: 100
    probe images against the first 2000, k=5, coordinates decoded from
    the stored phash.  The oracle brute-forces the same top-5 with a
    cross join over the same fixture parquet, ranked by (dist2,
    neighbor_id) exactly like the index's (d2, id) sort — so the
    index's candidate-ring logic must agree with exhaustive search on
    real values (the events-table knn twin pins the same code on int
    keys).  Pinned to the correctness-scale fixture at every sf."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from ..fixtures import ensure_images_parquet
    from ..geo.geotag import latlon_from_phash
    from ..stages.knn import KnnStage

    images = ensure_images_parquet("correctness")
    tab = pq.read_table(images, columns=["image_id", "phash"])
    tab = tab.slice(0, 2000)
    lat, lon = latlon_from_phash(tab["phash"].to_numpy(zero_copy_only=False))
    ref_table = pa.table({"image_id": tab["image_id"],
                          "lat": pa.array(lat), "lon": pa.array(lon)})
    ref = ray.put(ref_table)
    probes = ray.data.from_arrow(ref_table.slice(0, 100))
    out = probes.map_batches(
        KnnStage, fn_constructor_kwargs=dict(ref_table_ref=ref, k=5, res=6),
        batch_format="pyarrow", concurrency=2)
    return out.map_batches(
        lambda b: pa.table({"probe_id": b["probe_id"],
                            "neighbor_id": b["neighbor_id"],
                            "knn_rank": b["rank"]}),
        batch_format="pyarrow")


def q_knn_images_exact_sql() -> str:
    from ..fixtures import FIXTURE_DIR

    path = os.path.join(FIXTURE_DIR, "images_correctness.parquet")
    u = ("(CAST(phash AS HUGEINT) + CASE WHEN phash < 0 "
         "THEN 18446744073709551616 ELSE 0 END)")
    hi = f"CAST({u} // 4294967296 AS BIGINT)"
    lo = f"CAST({u} % 4294967296 AS BIGINT)"
    lat = f"(-60.0 + 120.0 * {hi} / 4294967296.0)"
    lon = f"(-180.0 + 360.0 * {lo} / 4294967296.0)"
    return (
        "WITH pts AS (SELECT image_id, "
        f"{lat} AS lat, {lon} AS lon "
        f"FROM read_parquet('{path}') "
        f"WHERE image_id < 'img_{2000:012d}'), "
        f"probes AS (SELECT * FROM pts WHERE image_id < 'img_{100:012d}'), "
        "d AS (SELECT p.image_id AS probe_id, r.image_id AS neighbor_id, "
        "(r.lat - p.lat) * (r.lat - p.lat) "
        "+ (r.lon - p.lon) * (r.lon - p.lon) AS dist2 "
        "FROM probes p CROSS JOIN pts r), "
        "ranked AS (SELECT probe_id, neighbor_id, row_number() OVER ("
        "PARTITION BY probe_id ORDER BY dist2, neighbor_id) AS knn_rank "
        "FROM d) SELECT probe_id, neighbor_id, knn_rank "
        "FROM ranked WHERE knn_rank <= 5"
    )


_VIDEO_N, _VIDEO_T2, _VIDEO_SIDE2 = 60, 8, 32
_VCUT_T = 70000


def _video_lum_sql() -> str:
    """Luma plane of every fixture video frame: frame t of video v is
    the closed-form pixel plane _gen_pixels(v*1000 + t, 32) — the same
    generator the image checksksums replay — stored LOSSLESSLY in the
    SKWV container (zlib), so no quantization branch applies."""
    from ._common import _raw_px_sql

    return (
        f"vf AS (SELECT CAST(a.v AS BIGINT) AS v, CAST(b.t AS BIGINT) "
        f"AS t, CAST(a.v * 1000 + b.t AS BIGINT) AS i, "
        f"CAST({_VIDEO_SIDE2} AS BIGINT) AS side "
        f"FROM range({_VIDEO_N}) a(v) CROSS JOIN range({_VIDEO_T2}) b(t)), "
        "vlum AS (SELECT v, t, x, y, "
        f"(77 * {_raw_px_sql('0')} + 150 * {_raw_px_sql('1')} "
        f"+ 29 * {_raw_px_sql('2')}) // 256 AS l "
        f"FROM vf JOIN range({_VIDEO_SIDE2}) tx(x) ON true "
        f"JOIN range({_VIDEO_SIDE2}) ty(y) ON true)"
    )


def q_video_frames(sf_dir: str):
    """Hash verification of VIDEO FRAME SAMPLING (the training-data
    frame-extraction shape): decode the SKWV fixture clips inside
    map_batches (stages/multimodal.py::VideoFrameSample), emit every
    2nd frame's exact int64 luma sum.  The oracle replays the frame
    generator per (video, frame) in SQL, so container encode →
    parquet → decode → sampling is pinned end-to-end.  Real codecs
    raise NotImplementedError in the codec module — the documented
    environment limit; the stage and schema are the real plumbing."""
    import ray.data

    from ..fixtures import ensure_videos_parquet
    from ..stages.multimodal import VideoFrameSample

    videos = ensure_videos_parquet(_VIDEO_N)
    ds = ray.data.read_parquet(videos, columns=["video_id", "bytes"])
    return ds.map_batches(VideoFrameSample(every_n=2),
                          batch_format="pyarrow", batch_size=8)


def q_video_frames_sql() -> str:
    return (
        "WITH " + _video_lum_sql() + " "
        "SELECT 'vid_' || lpad(CAST(v AS VARCHAR), 8, '0') AS video_id,"
        " t AS frame_idx, CAST(sum(l) AS BIGINT) AS luma_sum "
        "FROM vlum WHERE t % 2 = 0 GROUP BY 1, 2"
    )


def q_video_cuts(sf_dir: str):
    """Hash verification of SCENE-CUT DETECTION: per consecutive frame
    pair the exact L1 luma delta (stages/multimodal.py::VideoSceneCuts);
    a cut is a delta above the fixed threshold.  Oracle = one t+1
    equijoin over the replayed frame planes."""
    import ray.data

    from ..fixtures import ensure_videos_parquet
    from ..stages.multimodal import VideoSceneCuts

    videos = ensure_videos_parquet(_VIDEO_N)
    ds = ray.data.read_parquet(videos, columns=["video_id", "bytes"])
    return ds.map_batches(VideoSceneCuts(threshold=_VCUT_T),
                          batch_format="pyarrow", batch_size=8)


def q_video_cuts_sql() -> str:
    return (
        "WITH " + _video_lum_sql() + ", "
        "d AS (SELECT a.v, a.t, sum(abs(b.l - a.l)) AS dt "
        "FROM vlum a JOIN vlum b ON b.v = a.v AND b.x = a.x "
        "AND b.y = a.y AND b.t = a.t + 1 GROUP BY 1, 2) "
        "SELECT 'vid_' || lpad(CAST(v AS VARCHAR), 8, '0') AS video_id,"
        f" CAST(sum(CASE WHEN dt > {_VCUT_T} THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_cuts, "
        "CAST(sum(dt) AS BIGINT) AS delta_sum FROM d GROUP BY 1"
    )


_TONE_N = 200


def q_audio_checksum(sf_dir: str):
    """Hash verification of the PCM WAV DECODE PATH (the real
    pure-struct codec, functions/audio_codec.py): decode the noise-free
    tone fixture inside map_batches and emit exact integer features —
    frame count, channel count, Σ s² over all channels, peak |s|.  The
    oracle replays every sample from the closed form
    trunc(amp·sin(2π·f·t/8000)·32767) (fixtures.py::make_tones; numpy
    and DuckDB share libm trig on this platform, the same premise the
    hash-verified web-mercator tile math rests on), so a flipped byte
    anywhere in encode → parquet → decode mismatches."""
    import ray.data

    from ..fixtures import ensure_tones_parquet
    from ..functions.audio_codec import decode_wav

    path = ensure_tones_parquet(_TONE_N)
    ds = ray.data.read_parquet(path, columns=["audio_id", "bytes"])

    def feats(b: pa.Table) -> pa.Table:
        ids = b["audio_id"].to_pylist()
        n = len(ids)
        out = np.zeros((n, 4), np.int64)
        for i, blob in enumerate(b["bytes"].to_pylist()):
            s, _sr = decode_wav(blob)
            s64 = s.astype(np.int64)
            out[i] = (s.shape[0], s.shape[1],
                      int((s64 * s64).sum()), int(np.abs(s64).max()))
        return pa.table({"audio_id": b["audio_id"],
                         "n_frames": pa.array(out[:, 0]),
                         "channels": pa.array(out[:, 1]),
                         "sumsq": pa.array(out[:, 2]),
                         "peak": pa.array(out[:, 3])})

    return ds.map_batches(feats, batch_format="pyarrow", batch_size=64)


def q_audio_checksum_sql() -> str:
    from ..fixtures import _TONE_N_SAMP, _TONE_SR

    s = ("CAST(trunc((0.1 + 0.8 * ((i % 7) / 7.0)) "
         f"* sin(2.0 * pi() * (110.0 * (1 + (i % 17))) * t / {_TONE_SR}.0) "
         "* 32767.0) AS BIGINT)")
    return (
        f"WITH clips AS (SELECT CAST(i AS BIGINT) AS i, "
        f"CAST(1 + i % 2 AS BIGINT) AS ch FROM range({_TONE_N}) a(i)), "
        f"samp AS (SELECT i, ch, {s} AS s "
        f"FROM clips JOIN range({_TONE_N_SAMP}) b(t) ON true) "
        "SELECT 'tone_' || lpad(CAST(i AS VARCHAR), 6, '0') AS audio_id,"
        f" CAST({_TONE_N_SAMP} AS BIGINT) AS n_frames, "
        "any_value(ch) AS channels, "
        "CAST(any_value(ch) * sum(s * s) AS BIGINT) AS sumsq, "
        "CAST(max(abs(s)) AS BIGINT) AS peak "
        "FROM samp GROUP BY 1"
    )


def q_morph_checksum(sf_dir: str):
    """Hash verification of 3×3 GRAYSCALE MORPHOLOGY (erosion = min,
    dilation = max over each interior pixel's neighborhood, gradient
    = dilate − erode — the edge-strength / structuring-element
    building blocks): exact int64 plane sums of all three.  Oracle =
    the median3 shape with min/max in place of the order statistic
    (nine shifted equijoins unioned, then min/max per pixel)."""
    def per(y: np.ndarray) -> dict:
        h, w = y.shape
        stk = np.stack([y[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
                        for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
        er = stk.min(axis=0)
        di = stk.max(axis=0)
        return {"erode_sum": int(er.sum()), "dilate_sum": int(di.sum()),
                "grad_sum": int((di - er).sum())}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_morph_checksum_sql() -> str:
    shifts = " UNION ALL ".join(
        f"SELECT c.i, c.x, c.y, n.l FROM lum c "
        f"JOIN lum n ON n.i = c.i AND n.x = c.x + ({dx}) "
        f"AND n.y = c.y + ({dy}) "
        f"WHERE c.x BETWEEN 1 AND c.side - 2 "
        f"AND c.y BETWEEN 1 AND c.side - 2"
        for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "n9 AS MATERIALIZED (" + shifts + "), "
        "m AS (SELECT i, x, y, min(l) AS er, max(l) AS di "
        "FROM n9 GROUP BY 1, 2, 3) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(di) AS BIGINT) AS dilate_sum,"
        " CAST(sum(er) AS BIGINT) AS erode_sum,"
        " CAST(sum(di - er) AS BIGINT) AS grad_sum "
        "FROM m GROUP BY 1"
    )


# 8-point DCT-II basis, pinned to exact integers (×10^4, round-half-up)
# at module import — the SAME table is embedded as literals in the SQL
# oracle, so both sides share one basis by construction.
_DCT_C = np.array(
    [[int(np.floor(np.cos(np.pi * (2 * n + 1) * k / 16.0) * 1e4 + 0.5))
      for n in range(8)] for k in range(8)], np.int64)
_DCT_COEFFS = ((0, 1), (1, 0), (1, 1), (2, 3), (7, 7))


def q_block_dct(sf_dir: str):
    """Hash verification of the 8×8 BLOCK DCT-II (the JPEG transform
    kernel; every fixture side is a multiple of 8): five fixed (u, v)
    coefficients per block on the integer-pinned cosine basis
    (``_DCT_C``; |F| ≤ 255·64·10^8 < 2^63 and the per-image abs-sum
    over ≤ 64 blocks stays within int64), emitted as exact per-image
    abs-sums.  One int64 einsum over the reshaped block tensor per
    coefficient — no per-pixel Python.  Oracle = one pass over the
    luma plane with the basis inlined as CASE tables, per-block sums,
    then per-image abs-sums (DCT separability is the cross-check)."""
    def per(y: np.ndarray) -> dict:
        h, w = y.shape
        blk = y.reshape(h // 8, 8, w // 8, 8)  # (by, yl, bx, xl)
        out = {}
        for (u, v) in _DCT_COEFFS:
            f = np.einsum("aybx,y,x->ab", blk, _DCT_C[v], _DCT_C[u])
            out[f"d{u}{v}"] = int(np.abs(f).sum())
        return out

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_block_dct_sql() -> str:
    def case(col: str, k: int) -> str:
        whens = " ".join(f"WHEN {n} THEN ({int(_DCT_C[k, n])})"
                         for n in range(8))
        return f"(CASE {col} % 8 {whens} END)"

    per_block = ", ".join(
        f"sum(l * {case('x', u)} * {case('y', v)}) AS d{u}{v}"
        for u, v in _DCT_COEFFS)
    outer = ", ".join(
        f"CAST(sum(abs(d{u}{v})) AS BIGINT) AS d{u}{v}"
        for u, v in _DCT_COEFFS)
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        f"g AS (SELECT i, x // 8 AS bx, y // 8 AS by, {per_block} "
        "FROM lum GROUP BY 1, 2, 3) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id, "
        + outer + " FROM g GROUP BY 1"
    )


def q_bilinear_checksum(sf_dir: str):
    """Hash verification of BILINEAR 2× UPSAMPLING arithmetic (the
    interpolation kernel of resize pipelines): exact integer sums of
    the three interpolated planes — horizontal midpoints
    (l[x]+l[x+1])//2, vertical midpoints, and center points
    (4-neighbour sum)//4.  Floor division per element, so a rounding
    regression anywhere mismatches.  Oracle = one right-, one down-,
    and one diagonal-shifted equijoin."""
    def per(y: np.ndarray) -> dict:
        h = (y[:, :-1] + y[:, 1:]) // 2
        v = (y[:-1, :] + y[1:, :]) // 2
        c = (y[:-1, :-1] + y[:-1, 1:] + y[1:, :-1] + y[1:, 1:]) // 4
        return {"h_sum": int(h.sum()), "v_sum": int(v.sum()),
                "c_sum": int(c.sum())}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_bilinear_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "h AS (SELECT c.i, sum((c.l + r.l) // 2) AS s FROM lum c "
        "JOIN lum r ON r.i = c.i AND r.y = c.y AND r.x = c.x + 1 "
        "GROUP BY 1), "
        "v AS (SELECT c.i, sum((c.l + d.l) // 2) AS s FROM lum c "
        "JOIN lum d ON d.i = c.i AND d.x = c.x AND d.y = c.y + 1 "
        "GROUP BY 1), "
        "ce AS (SELECT c.i, sum((c.l + r.l + d.l + dr.l) // 4) AS s "
        "FROM lum c "
        "JOIN lum r ON r.i = c.i AND r.y = c.y AND r.x = c.x + 1 "
        "JOIN lum d ON d.i = c.i AND d.x = c.x AND d.y = c.y + 1 "
        "JOIN lum dr ON dr.i = c.i AND dr.x = c.x + 1 "
        "AND dr.y = c.y + 1 GROUP BY 1) "
        "SELECT 'img_' || lpad(CAST(h.i AS VARCHAR), 12, '0') "
        "AS image_id, CAST(h.s AS BIGINT) AS h_sum, "
        "CAST(v.s AS BIGINT) AS v_sum, CAST(ce.s AS BIGINT) AS c_sum "
        "FROM h JOIN v ON v.i = h.i JOIN ce ON ce.i = h.i"
    )


def q_image_entropy(sf_dir: str):
    """Hash verification of the LUMA HISTOGRAM ENTROPY quality screen
    (low-entropy = flat/synthetic images): Shannon entropy over the
    256-bin luma histogram, pinned per TERM as
    floor(−(p·ln p)·10⁹ + 0.5) and summed as int64 (the q_type_entropy
    recipe — numpy and DuckDB share libm ln on this platform).  Also
    emits n_distinct lumas as an integer cross-check."""
    def per(y: np.ndarray) -> dict:
        c = np.bincount(y.ravel(), minlength=256).astype(np.float64)
        c = c[c > 0]
        p = c / y.size
        terms = np.floor(-(p * np.log(p)) * 1e9 + 0.5).astype(np.int64)
        return {"entropy_nano": int(terms.sum()), "n_lumas": len(c)}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_image_entropy_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "c AS (SELECT i, any_value(side) AS side, l, count(*) AS c "
        "FROM lum GROUP BY i, l), "
        "t AS (SELECT i, CAST(floor(-((CAST(c AS DOUBLE) / "
        "(side * side)) * ln(CAST(c AS DOUBLE) / (side * side))) "
        "* 1e9 + 0.5) AS BIGINT) AS term FROM c) "
        "SELECT 'img_' || lpad(CAST(t.i AS VARCHAR), 12, '0') "
        "AS image_id, CAST(sum(term) AS BIGINT) AS entropy_nano, "
        "CAST(count(*) AS BIGINT) AS n_lumas FROM t GROUP BY 1"
    )


def q_audio_zcr(sf_dir: str):
    """Hash verification of the ZERO-CROSSING RATE feature (the
    classic voiced/unvoiced + pitch proxy) on the decoded tone
    fixture: per clip the exact count of consecutive-sample sign
    flips (s_t·s_{t+1} < 0) on channel 0, plus the positive-sample
    and exact-zero counts.  Oracle replays the closed-form tone with
    a t+1 self-join, like q_audio_checksum."""
    import ray.data

    from ..fixtures import ensure_tones_parquet
    from ..functions.audio_codec import decode_wav

    path = ensure_tones_parquet(_TONE_N)
    ds = ray.data.read_parquet(path, columns=["audio_id", "bytes"])

    def feats(b: pa.Table) -> pa.Table:
        ids = b["audio_id"].to_pylist()
        out = np.zeros((len(ids), 3), np.int64)
        for i, blob in enumerate(b["bytes"].to_pylist()):
            s, _sr = decode_wav(blob)
            s0 = s[:, 0].astype(np.int64)
            out[i] = (int((s0[:-1] * s0[1:] < 0).sum()),
                      int((s0 > 0).sum()), int((s0 == 0).sum()))
        return pa.table({"audio_id": b["audio_id"],
                         "zcr": pa.array(out[:, 0]),
                         "n_pos": pa.array(out[:, 1]),
                         "n_zero": pa.array(out[:, 2])})

    return ds.map_batches(feats, batch_format="pyarrow", batch_size=64)


def q_audio_zcr_sql() -> str:
    from ..fixtures import _TONE_N_SAMP, _TONE_SR

    def s(tcol: str) -> str:
        return ("CAST(trunc((0.1 + 0.8 * ((i % 7) / 7.0)) "
                f"* sin(2.0 * pi() * (110.0 * (1 + (i % 17))) * {tcol} "
                f"/ {_TONE_SR}.0) * 32767.0) AS BIGINT)")

    return (
        f"WITH clips AS (SELECT CAST(i AS BIGINT) AS i "
        f"FROM range({_TONE_N}) a(i)), "
        f"samp AS (SELECT i, t, {s('t')} AS s "
        f"FROM clips JOIN range({_TONE_N_SAMP}) b(t) ON true) "
        "SELECT 'tone_' || lpad(CAST(c.i AS VARCHAR), 6, '0') "
        "AS audio_id, "
        "CAST(sum(CASE WHEN c.s * n.s < 0 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS zcr, "
        "CAST(sum(CASE WHEN c.s > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_pos, "
        "CAST(sum(CASE WHEN c.s = 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_zero "
        "FROM samp c LEFT JOIN samp n ON n.i = c.i AND n.t = c.t + 1 "
        "GROUP BY 1"
    )


def q_haar_checksum(sf_dir: str):
    """Hash verification of the level-1 HAAR WAVELET transform (the
    JPEG2000 / multiresolution building block), kept exact by
    leaving the 2×2 butterfly UNDIVIDED: per block a = p00+p01+p10+p11
    (LL), h = (p00−p01)+(p10−p11) (LH), v = (p00+p01)−(p10+p11) (HL),
    d = (p00−p01)−(p10−p11) (HH); emit the LL plane sum and the exact
    abs-sums of the three detail planes (the compressibility signal).
    Oracle = one pass grouped by (x//2, y//2) with ±1 parity masks."""
    def per(y: np.ndarray) -> dict:
        p00 = y[0::2, 0::2]
        p01 = y[0::2, 1::2]
        p10 = y[1::2, 0::2]
        p11 = y[1::2, 1::2]
        a = p00 + p01 + p10 + p11
        h = (p00 - p01) + (p10 - p11)
        v = (p00 + p01) - (p10 + p11)
        d = (p00 - p01) - (p10 - p11)
        return {"ll_sum": int(a.sum()), "lh_abs": int(np.abs(h).sum()),
                "hl_abs": int(np.abs(v).sum()), "hh_abs": int(np.abs(d).sum())}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_haar_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "blk AS (SELECT i, x // 2 AS bx, y // 2 AS by, "
        "sum(l) AS a, "
        "sum(l * (1 - 2 * (x % 2))) AS h, "
        "sum(l * (1 - 2 * (y % 2))) AS v, "
        "sum(l * (1 - 2 * (x % 2)) * (1 - 2 * (y % 2))) AS d "
        "FROM lum GROUP BY 1, 2, 3) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(a) AS BIGINT) AS ll_sum,"
        " CAST(sum(abs(h)) AS BIGINT) AS lh_abs,"
        " CAST(sum(abs(v)) AS BIGINT) AS hl_abs,"
        " CAST(sum(abs(d)) AS BIGINT) AS hh_abs "
        "FROM blk GROUP BY 1"
    )


def q_image_prep(sf_dir: str):
    """End-to-end IMAGE curation prep (the multimodal composition
    story, mirroring q_prep_pipeline for text): ONE decode pass
    computes aHash64 + exact-integer Laplacian sharpness + dims per
    image (fused — bytes are read once and never shuffled), a
    deterministic quality gate drops tiny/flat images (side ≥ 24 and
    integer variance num ≥ den²), then exact perceptual dedup keeps
    the min-id representative per aHash via one projected hash-bucket
    exchange.  Returns the surviving-image manifest
    (image_id, ahash64, blur_num, blur_den, side).  Rows-only: every
    component is hash-pinned elsewhere (dhash_checksum /
    blur_checksum / exact_dedup_head)."""
    import ray.data

    from ..fixtures import ensure_images_parquet, scale_for_sf_dir
    from ..functions.phash import ahash64_batch
    from ..stages.multimodal import _shape_groups
    from ..stages.scan import hash_bucket_scan

    images = ensure_images_parquet(scale_for_sf_dir(sf_dir))
    ds = ray.data.read_parquet(images, columns=["image_id", "bytes", "fmt"])

    def fused(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        n = len(blobs)
        ah = np.zeros(n, np.int64)
        num = np.zeros(n, np.int64)
        den = np.zeros(n, np.int64)
        side = np.zeros(n, np.int64)
        for idxs, stack in _shape_groups(blobs, fmts):
            ah[idxs] = ahash64_batch(stack)
            s = stack.astype(np.int64)
            y = (77 * s[..., 0] + 150 * s[..., 1] + 29 * s[..., 2]) >> 8
            if y.shape[1] >= 3 and y.shape[2] >= 3:
                c = y[:, 1:-1, 1:-1]
                lap = (4 * c - y[:, :-2, 1:-1] - y[:, 2:, 1:-1]
                       - y[:, 1:-1, :-2] - y[:, 1:-1, 2:])
                m = lap[0].size
                s1 = lap.sum(axis=(1, 2))
                s2 = (lap * lap).sum(axis=(1, 2))
                num[idxs] = m * s2 - s1 * s1
                den[idxs] = m
            side[idxs] = y.shape[1]
        t = pa.table({"image_id": b["image_id"],
                      "ahash64": pa.array(ah), "blur_num": pa.array(num),
                      "blur_den": pa.array(den), "side": pa.array(side)})
        # sharpness-only gate: the bench-scale fixture caps every
        # side at 16 (FIXTURES.md), so a dimension gate would empty
        # the corpus there; num/den² = 500 drops the low-noise tail
        # at every scale
        keep = num >= 500 * den * den
        return t.filter(pa.array(keep))

    feats = ds.map_batches(fused, batch_format="pyarrow", batch_size=1024)

    def first_per_hash(t: pa.Table) -> pa.Table:
        h = t["ahash64"].to_numpy(zero_copy_only=False)
        # image_id strings sort lexicographically == numerically
        # (zero-padded); min-id per hash via one lexsort + run head
        iid = np.asarray(t["image_id"].to_pylist())
        order = np.lexsort((iid, h))
        hs = h[order]
        head = np.ones(len(hs), dtype=bool)
        head[1:] = hs[1:] != hs[:-1]
        return t.take(pa.array(order[head]))

    n = ds.count()
    return hash_bucket_scan(feats, ["ahash64"], first_per_hash, n_rows=n)


def q_hist_intersect(sf_dir: str):
    """HISTOGRAM INTERSECTION image similarity (the classic Swain-
    Ballard retrieval kernel): pair every fixture image i with i+5
    (same side class, so supports are comparable) and emit the exact
    Σ_l min(h_i(l), h_{i+5}(l)) over the 256-bin luma histograms.
    Distributed shape: decode + bincount per image in the map stage
    (bytes never shuffle), each image emits its NONZERO histogram
    rows under the ≤ 2 pair keys it participates in, one pair-keyed
    hash-bucket exchange, and the per-pair merge is a (pair, luma)
    sort + length-2-run min — histograms, never pixels, cross the
    wire.  Oracle = the luma-table counts self-joined at i+5."""
    from ..stages.scan import hash_bucket_scan

    K = _CHECKSUM_K

    def hists(b: pa.Table) -> pa.Table:
        from ..functions.image_codec import decode_image

        ids = b["image_id"].to_pylist()
        fmts = b["fmt"].to_pylist()
        blobs = b["bytes"].to_pylist()
        pair, role, luma, cnt = [], [], [], []
        for s in range(len(ids)):
            i = int(ids[s][4:])
            img = decode_image(blobs[s], fmts[s]).astype(np.int64)
            y = (77 * img[:, :, 0] + 150 * img[:, :, 1]
                 + 29 * img[:, :, 2]) >> 8
            h = np.bincount(y.ravel(), minlength=256)
            nz = np.flatnonzero(h)
            for p, r in ((i, 0), (i - 5, 1)):
                if 0 <= p <= K - 6:
                    pair.append(np.full(len(nz), p, np.int64))
                    role.append(np.full(len(nz), r, np.int64))
                    luma.append(nz.astype(np.int64))
                    cnt.append(h[nz])
        if not pair:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "role": pa.array([], pa.int64()),
                             "l": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"pair": pa.array(np.concatenate(pair)),
                         "role": pa.array(np.concatenate(role)),
                         "l": pa.array(np.concatenate(luma)),
                         "c": pa.array(np.concatenate(cnt))})

    def merge(t: pa.Table) -> pa.Table:
        p = t["pair"].to_numpy(zero_copy_only=False)
        l = t["l"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((l, p))
        p, l, c = p[order], l[order], c[order]
        # length-2 runs of equal (pair, l) = luma present in BOTH
        same = np.zeros(len(p), dtype=bool)
        if len(p) > 1:
            same[1:] = (p[1:] == p[:-1]) & (l[1:] == l[:-1])
        isect = np.minimum(c, np.roll(c, 1)) * same
        out_p = np.unique(p)
        sums = np.zeros(len(out_p), np.int64)
        idx = np.searchsorted(out_p, p[same])
        np.add.at(sums, idx, isect[same])
        return pa.table({"pair": pa.array(out_p),
                         "hist_isect": pa.array(sums)})

    rows = _checksum_ds(sf_dir).map_batches(hists, batch_format="pyarrow",
                                            batch_size=128)
    return hash_bucket_scan(rows, ["pair"], merge, n_rows=K * 300)


def q_hist_intersect_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "c AS (SELECT i, l, count(*) AS c FROM lum GROUP BY 1, 2), "
        "s AS (SELECT a.i, sum(least(a.c, b.c)) AS v "
        "FROM c a JOIN c b ON b.i = a.i + 5 AND b.l = a.l "
        "GROUP BY 1) "
        # total over every pair id: a zero-overlap pair must emit 0,
        # matching the Ray side's always-emitted pair rows
        f"SELECT r.p AS pair, CAST(COALESCE(s.v, 0) AS BIGINT) "
        f"AS hist_isect FROM range(0, {_CHECKSUM_K - 5}) r(p) "
        "LEFT JOIN s ON s.i = r.p"
    )


def q_audio_dft(sf_dir: str):
    """Hash verification of SINGLE-BIN DFT energy extraction (the
    spectral-feature primitive) on the decoded tone fixture: per clip
    and per probe bin (bin 0 = the clip's own tone frequency, bin 1 =
    a fixed 440 Hz), the cosine/sine correlation sums with each term
    pinned ``floor(s_t·cos(2πft/sr)·10⁶ + 0.5)`` BEFORE the sum —
    so only exact ints cross the aggregate (the repo's no-float-sums
    rule), while the trig itself rides the shared libm (the
    q_audio_checksum premise).  A clip's own-bin |C| dwarfs its
    440-bin leak, pinning both the decode and the correlation."""
    import ray.data

    from ..fixtures import _TONE_SR, ensure_tones_parquet
    from ..functions.audio_codec import decode_wav

    path = ensure_tones_parquet(_TONE_N)
    ds = ray.data.read_parquet(path, columns=["audio_id", "bytes"])

    def feats(b: pa.Table) -> pa.Table:
        ids = b["audio_id"].to_pylist()
        aid, bin_, cs, ss = [], [], [], []
        for s_i, blob in enumerate(b["bytes"].to_pylist()):
            i = int(ids[s_i][5:])
            s, sr = decode_wav(blob)
            s0 = s[:, 0].astype(np.float64)
            t = np.arange(s.shape[0], dtype=np.float64)
            for k, f in ((0, 110.0 * (1 + (i % 17))), (1, 440.0)):
                w = 2.0 * np.pi * f * t / float(_TONE_SR)
                c = np.floor(s0 * np.cos(w) * 1e6 + 0.5).astype(np.int64)
                sn = np.floor(s0 * np.sin(w) * 1e6 + 0.5).astype(np.int64)
                aid.append(ids[s_i])
                bin_.append(k)
                cs.append(int(c.sum()))
                ss.append(int(sn.sum()))
        return pa.table({"audio_id": pa.array(aid),
                         "bin": pa.array(np.array(bin_, np.int64)),
                         "c_sum": pa.array(np.array(cs, np.int64)),
                         "s_sum": pa.array(np.array(ss, np.int64))})

    return ds.map_batches(feats, batch_format="pyarrow", batch_size=64)


def q_audio_dft_sql() -> str:
    from ..fixtures import _TONE_N_SAMP, _TONE_SR

    s = ("CAST(trunc((0.1 + 0.8 * ((i % 7) / 7.0)) "
         f"* sin(2.0 * pi() * (110.0 * (1 + (i % 17))) * t / {_TONE_SR}.0)"
         " * 32767.0) AS BIGINT)")
    f = f"CASE k WHEN 0 THEN 110.0 * (1 + (i % 17)) ELSE 440.0 END"
    w = f"2.0 * pi() * ({f}) * t / {_TONE_SR}.0"
    return (
        f"WITH clips AS (SELECT CAST(i AS BIGINT) AS i "
        f"FROM range({_TONE_N}) a(i)), "
        f"samp AS (SELECT i, t, {s} AS s "
        f"FROM clips JOIN range({_TONE_N_SAMP}) b(t) ON true), "
        "terms AS (SELECT i, k, "
        f"CAST(floor(s * cos({w}) * 1e6 + 0.5) AS BIGINT) AS tc, "
        f"CAST(floor(s * sin({w}) * 1e6 + 0.5) AS BIGINT) AS ts "
        "FROM samp JOIN range(0, 2) kk(k) ON true) "
        "SELECT 'tone_' || lpad(CAST(i AS VARCHAR), 6, '0') AS audio_id,"
        " CAST(k AS BIGINT) AS bin, CAST(sum(tc) AS BIGINT) AS c_sum, "
        "CAST(sum(ts) AS BIGINT) AS s_sum FROM terms GROUP BY 1, 2"
    )


def q_kapur_threshold(sf_dir: str):
    """Hash verification of KAPUR'S MAXIMUM-ENTROPY THRESHOLD (the
    information-theoretic sibling of Otsu): per image, over thresholds
    t ∈ [0, 254], maximize H0 + H1 with Hk = ln(w_k) − s_k/(10⁶·w_k),
    where the only float SUMS are avoided — s_k are exact int
    cumulatives of per-luma pinned terms floor(c·ln c·10⁶ + 0.5), and
    w_k are exact count cumulatives, so both sides evaluate the same
    float expression on the same ints (libm ln parity, the
    q_type_entropy premise).  Ties → lowest t; flat (single-luma)
    images emit the (-1, 0) fallback, mirrored in the oracle (the
    q_otsu_checksum lesson).  Oracle = integer cumulatives via a
    grouped l ≤ t inequality join onto the dense threshold grid."""
    def per(y: np.ndarray) -> dict:
        c = np.bincount(y.ravel(), minlength=256).astype(np.int64)
        n = y.size
        term = np.zeros(256, np.int64)
        nz = c > 0
        term[nz] = np.floor(c[nz] * np.log(c[nz]) * 1e6
                            + 0.5).astype(np.int64)
        w0 = np.cumsum(c)
        s0 = np.cumsum(term)
        w0t, s0t = w0[:255], s0[:255]
        valid = (w0t > 0) & (w0t < n)
        if not valid.any():
            return {"t_best": -1, "score_nano": 0}
        sA = s0[255]
        w1 = (n - w0t).astype(np.float64)
        w0f = w0t.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = (np.log(w0f) - s0t / (1e6 * w0f)) \
                + (np.log(w1) - (sA - s0t) / (1e6 * w1))
        score[~valid] = -np.inf
        t = int(np.argmax(score))
        return {"t_best": t,
                "score_nano": int(np.floor(score[t] * 1e9 + 0.5))}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_kapur_threshold_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "c AS (SELECT i, any_value(side) AS side, l, count(*) AS c "
        "FROM lum GROUP BY i, l), "
        "tm AS (SELECT i, side, l, c, CAST(floor(CAST(c AS DOUBLE) * "
        "ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS term FROM c), "
        "sa_t AS (SELECT i, sum(term) AS sa FROM tm GROUP BY 1), "
        "grid AS (SELECT ii.i, tt.t, sum(tm.c) AS w0, "
        "sum(tm.term) AS s0, any_value(sa_t.sa) AS sa, "
        "ii.side * ii.side AS n FROM imgs ii "
        "JOIN range(0, 255) tt(t) ON true "
        "JOIN tm ON tm.i = ii.i AND tm.l <= tt.t "
        "JOIN sa_t ON sa_t.i = ii.i "
        "GROUP BY ii.i, tt.t, ii.side), "
        "sc AS (SELECT i, t, "
        "(ln(CAST(w0 AS DOUBLE)) - CAST(s0 AS DOUBLE) "
        "/ (1e6 * CAST(w0 AS DOUBLE))) + "
        "(ln(CAST(n - w0 AS DOUBLE)) - CAST(sa - s0 AS DOUBLE) "
        "/ (1e6 * CAST(n - w0 AS DOUBLE))) AS score "
        "FROM grid WHERE w0 > 0 AND w0 < n), "
        "r AS (SELECT i, t, score, row_number() OVER (PARTITION BY i "
        "ORDER BY score DESC, t) AS rn FROM sc), "
        "win AS (SELECT i, CAST(t AS BIGINT) AS t_best, "
        "CAST(floor(score * 1e9 + 0.5) AS BIGINT) AS score_nano "
        "FROM r WHERE rn = 1), "
        # flat (single-luma) images never reach sc — emit the fallback
        "flat AS (SELECT i, CAST(-1 AS BIGINT) AS t_best, "
        "CAST(0 AS BIGINT) AS score_nano FROM c GROUP BY i "
        "HAVING count(*) = 1) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " t_best, score_nano FROM (SELECT * FROM win "
        "UNION ALL SELECT * FROM flat)"
    )


def q_radial_profile(sf_dir: str):
    """Hash verification of the RADIAL LUMA PROFILE (the vignetting /
    center-bias screen): each pixel lands in one of 8 rings by the
    pure-integer band = (r²·8) // (2·(side/2)² + 1) around the image
    center (no sqrt, no float), and the per-ring exact luma sums are
    emitted as 8 columns.  Oracle = the same integer expression over
    the luma plane."""
    def per(y: np.ndarray) -> dict:
        h, w = y.shape
        cy, cx = h // 2, w // 2
        yy, xx = np.mgrid[0:h, 0:w]
        r2 = (xx - cx) ** 2 + (yy - cy) ** 2
        band = (r2 * 8) // (2 * (h // 2) ** 2 + 1)
        sums = np.zeros(8, np.int64)
        np.add.at(sums, band.ravel(), y.ravel())
        return {f"r{i}": int(sums[i]) for i in range(8)}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_radial_profile_sql() -> str:
    band = ("(((x - side // 2) * (x - side // 2) "
            "+ (y - side // 2) * (y - side // 2)) * 8) "
            "// (2 * (side // 2) * (side // 2) + 1)")
    cols = ", ".join(
        f"CAST(sum(CASE WHEN {band} = {i} THEN l ELSE 0 END) AS BIGINT)"
        f" AS r{i}" for i in range(8))
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + " "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        f" {cols} FROM lum GROUP BY 1"
    )


def q_caption_tile_tokens(sf_dir: str):
    """CROSS-MODAL aggregation — the image+caption north-star join:
    per (z=6 web-mercator tile, caption token) counts over the image
    fixture, where the coordinate comes from the stored phash geotag
    (stages/geotag) and the token is the caption's payload suffix
    (split-once semantics keep multi-word/unicode tokens whole).
    One pruned 2-column read → vectorized decode+tokenize → per-batch
    pre-aggregation → combiner tree on the data-bounded (tile, token)
    key space.  Oracle reads the same fixture parquet and replays the
    phash split, web-mercator, and the prefix-strip in SQL."""
    import ray.data

    from ..fixtures import ensure_images_parquet
    from ..geo.tiles import tile_xy
    from ..stages.agg_tree import tree_aggregate
    from ..stages.geotag import add_geotag

    images = ensure_images_parquet("correctness")
    ds = ray.data.read_parquet(images, columns=["image_id", "phash",
                                                "caption"])
    ds = ds.map_batches(add_geotag, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        lat = b["lat"].to_numpy(zero_copy_only=False)
        lon = b["lon"].to_numpy(zero_copy_only=False)
        x, y = tile_xy(lat, lon, 6)
        toks = np.array([c.split(" ", 2)[2]
                         for c in b["caption"].to_pylist()], object)
        t = pa.table({"tile_x": pa.array(x), "tile_y": pa.array(y),
                      "tok": pa.array(toks.astype(str)),
                      "n": pa.array(np.ones(len(x), np.int64))})
        return (t.group_by(["tile_x", "tile_y", "tok"])
                .aggregate([("n", "sum")])
                .rename_columns(["tile_x", "tile_y", "tok", "n"]))

    return tree_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                          ["tile_x", "tile_y", "tok"], [("n", "sum")])


def q_caption_tile_tokens_sql() -> str:
    from ..fixtures import FIXTURE_DIR
    from ..geo.tiles import tile_sql

    path = os.path.join(FIXTURE_DIR, "images_correctness.parquet")
    u = ("(CAST(phash AS HUGEINT) + CASE WHEN phash < 0 "
         "THEN 18446744073709551616 ELSE 0 END)")
    hi = f"CAST({u} // 4294967296 AS BIGINT)"
    lo = f"CAST({u} % 4294967296 AS BIGINT)"
    lat = f"(-60.0 + 120.0 * {hi} / 4294967296.0)"
    lon = f"(-180.0 + 360.0 * {lo} / 4294967296.0)"
    xe, ye = tile_sql(lat, lon, 6)
    return (
        f"SELECT {xe} AS tile_x, {ye} AS tile_y, "
        "regexp_replace(caption, '^caption [0-9]+ ', '') AS tok, "
        "CAST(count(*) AS BIGINT) AS n "
        f"FROM read_parquet('{path}') GROUP BY 1, 2, 3"
    )


def q_btc_checksum(sf_dir: str):
    """Hash verification of BLOCK TRUNCATION CODING structure (the
    classic 4×4 two-level codec): per block the bitmap splits pixels
    at the block mean — tested EXACTLY as 16·pixel ≥ block_sum, no
    division — and the per-image sums of (hi-count, hi-sum, lo-sum)
    pin both the threshold logic and the level reconstruction inputs.
    Oracle groups by (x//4, y//4) with the same integer compare."""
    def per(y: np.ndarray) -> dict:
        h, w = y.shape
        blk = y.reshape(h // 4, 4, w // 4, 4)
        bs = blk.sum(axis=(1, 3))
        hi = 16 * blk >= bs[:, None, :, None]
        n_hi = int(hi.sum())
        sum_hi = int((blk * hi).sum())
        return {"n_hi": n_hi, "sum_hi": sum_hi,
                "sum_lo": int(blk.sum()) - sum_hi}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_btc_checksum_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "bs AS (SELECT i, x // 4 AS bx, y // 4 AS by, sum(l) AS s "
        "FROM lum GROUP BY 1, 2, 3) "
        "SELECT 'img_' || lpad(CAST(lum.i AS VARCHAR), 12, '0') "
        "AS image_id, "
        "CAST(sum(CASE WHEN 16 * l >= bs.s THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_hi, "
        "CAST(sum(CASE WHEN 16 * l >= bs.s THEN l ELSE 0 END) "
        "AS BIGINT) AS sum_hi, "
        "CAST(sum(CASE WHEN 16 * l >= bs.s THEN 0 ELSE l END) "
        "AS BIGINT) AS sum_lo "
        "FROM lum JOIN bs ON bs.i = lum.i AND bs.bx = lum.x // 4 "
        "AND bs.by = lum.y // 4 GROUP BY 1"
    )


def q_noise_mad(sf_dir: str):
    """Hash verification of the NOISE ESTIMATE via the exact LOWER
    MEDIAN of |4-neighbour Laplacian| over interior pixels (the
    robust sensor-noise proxy a denoise stack thresholds on): the
    median is the order statistic at (n−1)//2 — no averaging, so it
    is an exact int.  Oracle = the shifted-equijoin Laplacian with a
    row_number pick."""
    def per(y: np.ndarray) -> dict:
        c = y[1:-1, 1:-1]
        lap = np.abs(4 * c - y[:-2, 1:-1] - y[2:, 1:-1]
                     - y[1:-1, :-2] - y[1:-1, 2:]).ravel()
        lap.sort()
        return {"mad_lap": int(lap[(len(lap) - 1) // 2]),
                "n_int": len(lap)}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_noise_mad_sql() -> str:
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        "lp AS (SELECT c.i, abs(4 * c.l - u.l - d.l - le.l - r.l) "
        "AS v FROM lum c "
        "JOIN lum u ON u.i = c.i AND u.x = c.x AND u.y = c.y - 1 "
        "JOIN lum d ON d.i = c.i AND d.x = c.x AND d.y = c.y + 1 "
        "JOIN lum le ON le.i = c.i AND le.x = c.x - 1 AND le.y = c.y "
        "JOIN lum r ON r.i = c.i AND r.x = c.x + 1 AND r.y = c.y "
        "WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2), "
        "rk AS (SELECT i, v, row_number() OVER (PARTITION BY i "
        "ORDER BY v) AS rn, count(*) OVER (PARTITION BY i) AS n "
        "FROM lp) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(v AS BIGINT) AS mad_lap, CAST(n AS BIGINT) AS n_int "
        "FROM rk WHERE rn = (n - 1) // 2 + 1"
    )


def q_audio_envelope(sf_dir: str):
    """Hash verification of WINDOWED ENERGY extraction (the RMS
    envelope every VAD / onset detector consumes): per clip, the
    exact Σs² of each 100-sample window on decoded channel 0 —
    20 windows per 2000-sample tone.  Oracle groups the closed-form
    samples by t // 100 (the q_audio_checksum replay)."""
    import ray.data

    from ..fixtures import ensure_tones_parquet
    from ..functions.audio_codec import decode_wav

    path = ensure_tones_parquet(_TONE_N)
    ds = ray.data.read_parquet(path, columns=["audio_id", "bytes"])

    def feats(b: pa.Table) -> pa.Table:
        ids = b["audio_id"].to_pylist()
        aid, win, ss = [], [], []
        for i, blob in enumerate(b["bytes"].to_pylist()):
            s, _sr = decode_wav(blob)
            s0 = s[:, 0].astype(np.int64)
            n = (len(s0) // 100) * 100
            w = (s0[:n] * s0[:n]).reshape(-1, 100).sum(axis=1)
            aid.extend([ids[i]] * len(w))
            win.extend(range(len(w)))
            ss.extend(int(v) for v in w)
        return pa.table({"audio_id": pa.array(aid),
                         "win": pa.array(np.array(win, np.int64)),
                         "sumsq": pa.array(np.array(ss, np.int64))})

    return ds.map_batches(feats, batch_format="pyarrow", batch_size=64)


def q_audio_envelope_sql() -> str:
    from ..fixtures import _TONE_N_SAMP, _TONE_SR

    s = ("CAST(trunc((0.1 + 0.8 * ((i % 7) / 7.0)) "
         f"* sin(2.0 * pi() * (110.0 * (1 + (i % 17))) * t / {_TONE_SR}.0)"
         " * 32767.0) AS BIGINT)")
    n_full = (_TONE_N_SAMP // 100) * 100
    return (
        f"WITH clips AS (SELECT CAST(i AS BIGINT) AS i "
        f"FROM range({_TONE_N}) a(i)), "
        f"samp AS (SELECT i, t, {s} AS sv "
        f"FROM clips JOIN range({n_full}) b(t) ON true) "
        "SELECT 'tone_' || lpad(CAST(i AS VARCHAR), 6, '0') "
        "AS audio_id, CAST(t // 100 AS BIGINT) AS win, "
        "CAST(sum(sv * sv) AS BIGINT) AS sumsq "
        "FROM samp GROUP BY 1, 2"
    )


def q_colorfulness(sf_dir: str):
    """Hash verification of the HASLER-SÜSSTRUNK COLORFULNESS
    opponent-channel moments (the aesthetic/colour-cast screen):
    rg = R−G and yb2 = R+G−2B (doubled to stay integer), pinned as
    the exact variance numerators n·Σc² − (Σc)² plus Σ|c| for both
    channels — the metric √(σ²_rg+σ²_yb) + 0.3·√(μ²…) is left to the
    reader, its inputs are exact.  Oracle rides the per-channel
    generator replay (_rgb_table_sql)."""
    from ..functions.image_codec import decode_image

    def fn(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        fmts = b["fmt"].to_pylist()
        cols = {k: [] for k in ("v_rg", "v_yb2", "a_rg", "a_yb2", "n")}
        for i in range(len(blobs)):
            img = decode_image(blobs[i], fmts[i]).astype(np.int64)
            r, g, bb = img[:, :, 0], img[:, :, 1], img[:, :, 2]
            rg = (r - g).ravel()
            yb2 = (r + g - 2 * bb).ravel()
            n = rg.size
            for key, c in (("rg", rg), ("yb2", yb2)):
                s1 = int(c.sum())
                s2 = int((c * c).sum())
                cols[f"v_{key}"].append(n * s2 - s1 * s1)
                cols[f"a_{key}"].append(int(np.abs(c).sum()))
            cols["n"].append(n)
        out = {"image_id": b["image_id"]}
        for k, v in cols.items():
            out[k] = pa.array(np.array(v, np.int64))
        return pa.table(out)

    return _checksum_ds(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=128)


def q_colorfulness_sql() -> str:
    from ._common import _rgb_table_sql

    return (
        "WITH " + _rgb_table_sql(_CHECKSUM_K) + ", "
        "ch AS (SELECT i, r - g AS rg, r + g - 2 * b AS yb2 FROM rgb) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(count(*) * sum(rg * rg) - sum(rg) * sum(rg) AS BIGINT) "
        "AS v_rg, "
        "CAST(count(*) * sum(yb2 * yb2) - sum(yb2) * sum(yb2) "
        "AS BIGINT) AS v_yb2, "
        "CAST(sum(abs(rg)) AS BIGINT) AS a_rg, "
        "CAST(sum(abs(yb2)) AS BIGINT) AS a_yb2, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM ch GROUP BY 1"
    )


def q_structure_tensor(sf_dir: str):
    """Hash verification of the STRUCTURE TENSOR moments (the edge-
    coherence / corner-ness inputs): over interior pixels the exact
    int64 sums Σgx², Σgy², Σgx·gy of the Sobel gradients — the
    eigen-gap coherence (λ1−λ2)²/(λ1+λ2)² is left to the reader,
    its inputs are exact.  Oracle = eight neighbour equijoins forming
    the same Sobel responses."""
    def per(y: np.ndarray) -> dict:
        gx = ((y[:-2, 2:] + 2 * y[1:-1, 2:] + y[2:, 2:])
              - (y[:-2, :-2] + 2 * y[1:-1, :-2] + y[2:, :-2]))
        gy = ((y[2:, :-2] + 2 * y[2:, 1:-1] + y[2:, 2:])
              - (y[:-2, :-2] + 2 * y[:-2, 1:-1] + y[:-2, 2:]))
        return {"sxx": int((gx * gx).sum()),
                "syy": int((gy * gy).sum()),
                "sxy": int((gx * gy).sum())}

    return _checksum_ds(sf_dir).map_batches(
        _luma_kernel(per), batch_format="pyarrow", batch_size=128)


def q_structure_tensor_sql() -> str:
    def nb(nm, dx, dy):
        return (f"JOIN lum {nm} ON {nm}.i = c.i AND {nm}.x = c.x + ({dx})"
                f" AND {nm}.y = c.y + ({dy}) ")

    joins = "".join(nb(nm, dx, dy) for nm, (dx, dy) in {
        "tl": (-1, -1), "t": (0, -1), "tr": (1, -1),
        "l": (-1, 0), "r": (1, 0),
        "bl": (-1, 1), "b": (0, 1), "br": (1, 1)}.items())
    gx = "(tr.l + 2 * r.l + br.l - tl.l - 2 * l.l - bl.l)"
    gy = "(bl.l + 2 * b.l + br.l - tl.l - 2 * t.l - tr.l)"
    return (
        "WITH " + _luma_table_sql(_CHECKSUM_K) + ", "
        f"g AS (SELECT c.i, {gx} AS gx, {gy} AS gy FROM lum c "
        + joins +
        "WHERE c.x BETWEEN 1 AND c.side - 2 "
        "AND c.y BETWEEN 1 AND c.side - 2) "
        "SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,"
        " CAST(sum(gx * gx) AS BIGINT) AS sxx, "
        "CAST(sum(gy * gy) AS BIGINT) AS syy, "
        "CAST(sum(gx * gy) AS BIGINT) AS sxy FROM g GROUP BY 1"
    )
