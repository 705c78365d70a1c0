"""Deterministic synthetic fixture tables (FIXTURES.md).

Everything derives from ``numpy.default_rng`` with fixed seeds plus pure
integer hashes of the row index — no wall clock, no external data — so
golden outputs are stable across runs, processes, and parallelism
levels.

Scales (FIXTURES.md): ``smoke``=1,000 rows, ``correctness``=20,000,
``bench``=500,000 (bytes column downsized at bench scale).

Tables are cached as parquet under ``/tmp/skyway_fixtures`` (written
atomically: temp dir + rename) so repeated test/bench runs skip
generation; the bench-scale images table is sharded into 16 files so
``ray.data.read_parquet`` parallelizes the read.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.image_codec import encode_image
from .geo.geotag import phash_from_latlon
from .schemas import BOUNDARY_SCHEMA, IMAGE_SCHEMA, OSM_ELEMENT_SCHEMA, TAGS_TYPE

FIXTURE_DIR = os.environ.get("SKYWAY_FIXTURE_DIR", "/tmp/skyway_fixtures")

SCALES = {"smoke": 1_000, "correctness": 20_000, "bench": 500_000,
          # xbench*: scaling-evidence runs (no bytes column payload);
          # sized so the job is compute-bound at the higher CPU level
          "xbench": 4_000_000, "xbench16m": 16_000_000,
          "xbench64m": 64_000_000}
# sf test-data dir name -> images fixture scale (queries() parameterization)
SF_TO_SCALE = {"sf0.001": "smoke", "sf0.01": "correctness", "sf0.1": "bench"}

HOT_LAT, HOT_LON = 37.7, -122.4  # the "hot" dense cluster / region center

_CAPTION_WORDS = [
    "alpha", "beta,comma", "gamma=equals", "delta@at", "epsilon space",
    "zeta\U0001F631", "eta%percent", "thetaćafé",
]
_FMTS = ["png", "jpeg", "webp"]


def _sides(max_side: int) -> list[int]:
    base = [16, 24, 32, 48, 64]
    return [min(s, max_side) for s in base]


def _gen_pixels(i: int, side: int) -> np.ndarray:
    """Deterministic per-row RGB gradient + integer-hash noise."""
    x = np.arange(side, dtype=np.int64)
    y = np.arange(side, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    grad = (x[None, :, None] * 3 + y[:, None, None] * 5
            + c[None, None, :] * 11 + (i * 37) % 256)
    pix = y[:, None, None] * side + x[None, :, None]
    noise = (((i * 2654435761 + pix * 97 + c[None, None, :] * 131)
              * 1103515245) >> 16) % 32
    return ((grad + noise) % 256).astype(np.uint8)


def make_images(n: int, seed: int = 42, max_side: int = 64,
                with_bytes: bool = True) -> pa.Table:
    """The primary input table (IMAGE_SCHEMA). Deterministic:

    * ``phash``: seeded 64-bit draws; 10% of rows (i % 10 == 7) rewritten
      to land in a 2°-radius disc around the hot region (skew cluster);
      afterwards every 50th row (i % 50 == 49) copies the previous row's
      phash (~2% controlled duplicates).
    * ``bytes``: synthetic RGB encoded per ``fmt`` (png real, jpeg/webp
      fake-lossy stubs — see functions/image_codec.py).
    """
    rng = np.random.default_rng(seed)
    phash = rng.integers(0, 1 << 64, n, dtype=np.uint64).view(np.int64)

    idx = np.arange(n)
    skew = idx % 10 == 7
    ang = 2.0 * np.pi * ((idx[skew] * 0.6180339887) % 1.0)
    rad = 2.0 * ((idx[skew] * 0.3819660113) % 1.0)
    phash[skew] = phash_from_latlon(HOT_LAT + rad * np.cos(ang),
                                    HOT_LON + rad * np.sin(ang))
    dup = (idx % 50 == 49) & (idx > 0)
    phash[dup] = phash[np.flatnonzero(dup) - 1]

    sides = _sides(max_side)
    side_arr = np.array([sides[i % len(sides)] for i in range(n)], dtype=np.int32)
    fmt = [_FMTS[i % 3] for i in range(n)]
    caption = [f"caption {i} {_CAPTION_WORDS[i % len(_CAPTION_WORDS)]}"
               for i in range(n)]
    image_id = [f"img_{i:012d}" for i in range(n)]

    if with_bytes:
        blobs = [encode_image(_gen_pixels(i, int(side_arr[i])), fmt[i])
                 for i in range(n)]
    else:
        blobs = [b""] * n

    return pa.Table.from_arrays(
        [
            pa.array(image_id, pa.string()),
            pa.array(blobs, pa.binary()),
            pa.array(side_arr, pa.int32()),
            pa.array(side_arr, pa.int32()),
            pa.array(fmt, pa.string()),
            pa.array(caption, pa.string()),
            pa.array(phash, pa.int64()),
        ],
        schema=IMAGE_SCHEMA,
    )


def make_boundaries(n_regions: int = 50, seed: int = 42) -> pa.Table:
    """Small polygon side table (broadcast to actor state).

    region_0000 is the "hot" region: a 5°-radius ring containing the skew
    cluster.  Regions (10, 11), (20, 21), (30, 31) deliberately overlap
    (multi-match join tests); others are spread to rarely overlap.
    """
    rng = np.random.default_rng(seed + 1000)
    region_id, ring_lon, ring_lat, tags = [], [], [], []
    centers = np.empty((n_regions, 2))
    radii = np.empty(n_regions)
    for j in range(n_regions):
        if j == 0:
            centers[j] = (HOT_LAT, HOT_LON)
            radii[j] = 5.0
        else:
            centers[j] = (rng.uniform(-55, 55), rng.uniform(-170, 170))
            radii[j] = rng.uniform(2.0, 8.0)
        if j in (11, 21, 31) and j < n_regions:
            centers[j] = centers[j - 1] + radii[j - 1] * 0.5
            radii[j] = radii[j - 1]
    for j in range(n_regions):
        k = 6 + (j * 7) % 19  # 6..24 vertices
        ang = 2.0 * np.pi * np.arange(k) / k + rng.uniform(0, 0.2, k)
        r = radii[j] * rng.uniform(0.6, 1.0, k)
        region_id.append(f"region_{j:04d}")
        ring_lat.append((centers[j, 0] + r * np.sin(ang)).tolist())
        ring_lon.append((centers[j, 1] + r * np.cos(ang)).tolist())
        tags.append([
            {"key": "boundary", "value": "administrative"},
            {"key": "admin_level", "value": str(2 + j % 10)},
            {"key": "name", "value": f"Region {j}"},
        ])
    return pa.Table.from_arrays(
        [
            pa.array(region_id, pa.string()),
            pa.array(ring_lon, pa.list_(pa.float64())),
            pa.array(ring_lat, pa.list_(pa.float64())),
            pa.array(tags, TAGS_TYPE),
        ],
        schema=BOUNDARY_SCHEMA,
    )


_TAG_VOCAB = [
    ("highway", ["residential", "footway", "primary", "service"]),
    ("surface", ["asphalt", "concrete", "gravel"]),
    ("oneway", ["yes", "no"]),
    ("footway", ["sidewalk", "crossing"]),
    ("type", ["route", "multipolygon", "boundary"]),
    ("route", ["bus", "bicycle"]),
    ("name", ["Main Street", "Čafé \U0001F631 Lane", "Ruta 66"]),
    ("cycleway:right", ["lane", "track"]),
]
_ROLES = ["outer", "inner", "stop", ""]
_USERS = ["alice", "bob", "carolé", None]


def make_osm_elements(n: int, seed: int = 42) -> pa.Table:
    """Filter-semantics conformance table (FIXTURES.md §3): 70% nodes /
    20% ways / 10% relations, tag vocabulary from the reference's
    example corpus so the canonical docs filter selects non-trivial
    subsets."""
    rng = np.random.default_rng(seed + 2000)
    lat_draw = rng.uniform(-85, 85, n)
    lon_draw = rng.uniform(-180, 180, n)
    rows = {k: [] for k in ("type", "id", "lat", "lon", "nodes", "members",
                            "tags", "changeset", "uid", "user", "version",
                            "timestamp", "visible")}
    for i in range(n):
        m = i % 10
        t = "node" if m < 7 else ("way" if m < 9 else "relation")
        rows["type"].append(t)
        rows["id"].append(i + 1)
        rows["lat"].append(float(lat_draw[i]) if t == "node" else None)
        rows["lon"].append(float(lon_draw[i]) if t == "node" else None)
        rows["nodes"].append(
            [(i * 13 + k) % n + 1 for k in range(2 + i % 7)] if t == "way" else None
        )
        if t == "relation":
            rows["members"].append([
                {"type": ["node", "way", "relation"][(i + k) % 3],
                 "ref": (i * 17 + k) % n + 1,
                 "role": _ROLES[(i + k) % len(_ROLES)]}
                for k in range(1 + i % 4)
            ])
        else:
            rows["members"].append(None)
        ntags = i % 6
        tags = []
        seen = set()
        for k in range(ntags):
            key, values = _TAG_VOCAB[(i * 3 + k) % len(_TAG_VOCAB)]
            if key in seen:
                continue
            seen.add(key)
            tags.append({"key": key, "value": values[(i + k) % len(values)]})
        # make sure the canonical docs filter has matches: some ways get
        # a footway tag, some relations get type=route
        if t == "way" and i % 4 == 0 and "footway" not in seen:
            tags.append({"key": "footway", "value": "sidewalk"})
        if t == "relation" and i % 3 == 0 and "type" not in seen:
            tags.append({"key": "type", "value": "route"})
        rows["tags"].append(tags)
        rows["changeset"].append(int(i * 31 % 99991) if i % 10 != 3 else None)
        rows["uid"].append(int(i % 1000) if i % 7 != 2 else None)
        rows["user"].append(_USERS[i % len(_USERS)])
        rows["version"].append(int(i % 20 + 1) if i % 5 != 4 else None)
        rows["timestamp"].append(
            f"2024-01-{(i % 28) + 1:02d}T12:{i % 60:02d}:00Z" if i % 6 != 5 else None
        )
        rows["visible"].append([True, False, None][i % 3])
    arrays = [pa.array(rows[f.name], f.type) for f in OSM_ELEMENT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=OSM_ELEMENT_SCHEMA)


def _atomic_write(table: pa.Table, dest: str, shards: int = 1) -> str:
    """Write parquet atomically: temp path then rename. ``shards > 1``
    writes a directory of part files (parallel read at bench scale)."""
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    tmp = dest + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.isfile(tmp):
            os.unlink(tmp)
    if shards == 1:
        pq.write_table(table, tmp)
        os.replace(tmp, dest)
    else:
        os.makedirs(tmp, exist_ok=True)
        n = len(table)
        per = (n + shards - 1) // shards
        for s in range(shards):
            chunk = table.slice(s * per, per)
            if len(chunk):
                pq.write_table(chunk, os.path.join(tmp, f"part-{s:05d}.parquet"))
        if os.path.exists(dest):
            shutil.rmtree(dest, ignore_errors=True)
        os.replace(tmp, dest)
    return dest


def ensure_images_parquet(scale: str = "correctness") -> str:
    n = SCALES[scale]
    max_side = 16 if scale.startswith(("bench", "xbench")) else 64
    shards = {"bench": 16, "xbench": 64, "xbench16m": 128,
              "xbench64m": 256}.get(scale, 1)
    # xbench exists to make the two-parallelism scaling run compute-
    # bound; bytes are empty there (FIXTURES.md: bytes downsized at
    # bench scale to keep disk bounded — xbench takes that to zero)
    with_bytes = not scale.startswith("xbench")
    dest = os.path.join(FIXTURE_DIR, f"images_{scale}.parquet")
    if os.path.exists(dest):
        return dest
    return _atomic_write(make_images(n, max_side=max_side,
                                     with_bytes=with_bytes),
                         dest, shards=shards)


def ensure_boundaries_parquet(n_regions: int = 50) -> str:
    dest = os.path.join(FIXTURE_DIR, f"boundaries_{n_regions}.parquet")
    if os.path.exists(dest):
        return dest
    return _atomic_write(make_boundaries(n_regions), dest)


def make_audio(n: int, sr: int = 16_000, dur_s: float = 0.25):
    """Deterministic PCM-WAV clips (seeded sine + noise mixes; varying
    frequency/amplitude/channels) — seed 42, no wall clock."""
    import pyarrow as pa

    from .functions.audio_codec import encode_wav

    rng = np.random.default_rng(42)
    ids, blobs = [], []
    t = np.arange(int(sr * dur_s)) / sr
    for i in range(n):
        freq = 110.0 * (1 + (i % 17))
        amp = 0.1 + 0.8 * ((i % 7) / 7.0)
        ch = 1 + (i % 2)
        wave = amp * np.sin(2 * np.pi * freq * t) \
            + 0.02 * rng.standard_normal(len(t))
        s = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        s = np.stack([s] * ch, axis=1)
        ids.append(i)
        blobs.append(encode_wav(s, sr))
    return pa.table({"audio_id": pa.array(ids, pa.int64()),
                     "bytes": pa.array(blobs, pa.binary()),
                     "fmt": pa.array(["wav"] * n, pa.string())})


def ensure_audio_parquet(n: int = 200) -> str:
    dest = os.path.join(FIXTURE_DIR, f"audio_{n}.parquet")
    if os.path.exists(dest):
        return dest
    return _atomic_write(make_audio(n), dest)


_TONE_N_SAMP, _TONE_SR = 2000, 8000


def make_tones(n: int) -> pa.Table:
    """Noise-free PCM tone clips: sample t of clip i is
    ``trunc(amp_i · sin(2π·f_i·t / 8000) · 32767)`` — every term a
    closed form of (i, t), so a DuckDB oracle replays the samples and
    pins the WAV codec end-to-end (make_audio's clips add a PCG noise
    stream, which no SQL can replay — hence this second fixture)."""
    from .functions.audio_codec import encode_wav

    t = np.arange(_TONE_N_SAMP)
    ids, blobs = [], []
    for i in range(n):
        freq = 110.0 * (1 + (i % 17))
        amp = 0.1 + 0.8 * ((i % 7) / 7.0)
        wave = amp * np.sin(2.0 * np.pi * freq * t / _TONE_SR)
        s = np.trunc(wave * 32767.0).astype(np.int16)
        ch = 1 + (i % 2)
        ids.append(f"tone_{i:06d}")
        blobs.append(encode_wav(np.stack([s] * ch, axis=1), _TONE_SR))
    return pa.table({"audio_id": pa.array(ids, pa.string()),
                     "bytes": pa.array(blobs, pa.binary())})


def ensure_tones_parquet(n: int = 200) -> str:
    dest = os.path.join(FIXTURE_DIR, f"tones_{n}.parquet")
    if os.path.exists(dest):
        return dest
    return _atomic_write(make_tones(n), dest)


_VIDEO_T, _VIDEO_SIDE = 8, 32


def make_videos(n: int) -> pa.Table:
    """Deterministic SKWV clips: frame t of video v is the closed-form
    pixel plane ``_gen_pixels(v * 1000 + t, 32)`` — the SAME generator
    the image-checksum oracles replay in SQL, so frame kernels
    (sampling sums, scene-cut deltas) are hash-verifiable end-to-end
    through container encode → parquet → decode."""
    from .functions.video_codec import encode_video

    ids, blobs = [], []
    for v in range(n):
        frames = np.stack([_gen_pixels(v * 1000 + t, _VIDEO_SIDE)
                           for t in range(_VIDEO_T)])
        ids.append(f"vid_{v:08d}")
        blobs.append(encode_video(frames))
    return pa.table({"video_id": pa.array(ids, pa.string()),
                     "bytes": pa.array(blobs, pa.binary()),
                     "fmt": pa.array(["skwv"] * n, pa.string()),
                     "n_frames": pa.array([_VIDEO_T] * n, pa.int32())})


def ensure_videos_parquet(n: int = 60) -> str:
    dest = os.path.join(FIXTURE_DIR, f"videos_{n}.parquet")
    if os.path.exists(dest):
        return dest
    return _atomic_write(make_videos(n), dest)


def ensure_osm_elements_parquet(scale: str = "correctness") -> str:
    n = SCALES[scale]
    dest = os.path.join(FIXTURE_DIR, f"osm_elements_{scale}.parquet")
    if os.path.exists(dest):
        return dest
    return _atomic_write(make_osm_elements(n), dest)


def scale_for_sf_dir(sf_dir: str) -> str:
    """Map a driver sf dir (…/sf0.01) to an images fixture scale."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return SF_TO_SCALE.get(base, "correctness")
