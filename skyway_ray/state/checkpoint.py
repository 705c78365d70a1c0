"""Stage-boundary checkpoints + per-partition lineage + resume.

Two granularities (SURVEY.md §4 "Checkpoint / resume"):

* **Stage checkpoint** (:func:`run_with_checkpoint`): a named stage
  output is written once as partitioned parquet with a lineage manifest
  and a ``_SUCCESS`` marker (atomic tmp+rename); a rerun with the same
  name + fingerprint loads the parquet instead of recomputing.
* **Shard resume** (:func:`resumable_shards`): a pipeline over many
  input shards writes one output directory per shard; finished shards
  (marker present) are skipped on rerun — a failed 100 TB run resumes
  where it stopped without recomputation.

Lineage sidecars record (partition id, input fingerprint, row count,
wall time) so a run's provenance is auditable per partition.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid


def _fingerprint(obj) -> str:
    import hashlib

    return hashlib.sha256(
        json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


def checkpoint_dataset(ds, out_dir: str, lineage: dict | None = None) -> str:
    """Write a Dataset as a parquet checkpoint with a lineage manifest,
    atomically (tmp dir + rename). Returns the final path."""
    tmp = out_dir + f".tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    t0 = time.perf_counter()
    ds.write_parquet(tmp)
    import pyarrow.parquet as pq

    parts = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    part_rows = {p: pq.read_metadata(os.path.join(tmp, p)).num_rows
                 for p in parts}
    manifest = {
        "rows": int(sum(part_rows.values())),
        "partitions": [
            {"file": p, "rows": int(r)} for p, r in part_rows.items()
        ],
        "wall_time_sec": round(time.perf_counter() - t0, 3),
        "lineage": lineage or {},
    }
    with open(os.path.join(tmp, "_lineage.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir


def load_checkpoint(out_dir: str):
    """Load a finished checkpoint; returns (Dataset, manifest) or
    (None, None) if absent/incomplete."""
    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return None, None
    import ray.data

    with open(os.path.join(out_dir, "_lineage.json")) as f:
        manifest = json.load(f)
    return ray.data.read_parquet(out_dir), manifest


def run_with_checkpoint(name: str, ds_factory, checkpoint_dir: str,
                        inputs: dict | None = None):
    """Run ``ds_factory()`` once per (name, input-fingerprint): a valid
    checkpoint with a matching fingerprint short-circuits recompute."""
    fp = _fingerprint({"name": name, "inputs": inputs or {}})
    out_dir = os.path.join(checkpoint_dir, f"{name}-{fp}")
    ds, manifest = load_checkpoint(out_dir)
    if ds is not None:
        return ds, True
    ds = ds_factory()
    checkpoint_dataset(ds, out_dir,
                       lineage={"name": name, "fingerprint": fp,
                                "inputs": inputs or {}})
    loaded, _ = load_checkpoint(out_dir)
    return loaded, False


def resumable_shards(shards, process_one, out_root: str,
                     fingerprint_of=None) -> dict:
    """Process input shards with per-shard resume: ``process_one(shard,
    tmp_dir)`` writes its output under ``tmp_dir``; finished shards are
    skipped ONLY when their recorded input fingerprint still matches.

    ``fingerprint_of(shard)`` returns a JSON-able description of
    everything the shard's output depends on (input file size/mtime,
    broadcast-side fingerprints, filter source, …); its hash is stored
    in ``_lineage.json`` and compared on rerun — a changed input,
    boundaries file or filter re-processes the shard instead of
    silently reusing stale output (mirrors ``run_with_checkpoint``'s
    name+fingerprint keying).  Without ``fingerprint_of`` the marker
    alone decides (legacy behavior).  Returns {"done": [...],
    "skipped": [...], "stale": [...]}."""
    os.makedirs(out_root, exist_ok=True)
    done, skipped, stale = [], [], []
    for shard in shards:
        shard_id = str(shard).replace("/", "_")
        final = os.path.join(out_root, shard_id)
        fp = _fingerprint(fingerprint_of(shard)) if fingerprint_of else None
        if os.path.exists(os.path.join(final, "_SUCCESS")):
            recorded = None
            lineage_path = os.path.join(final, "_lineage.json")
            if os.path.exists(lineage_path):
                try:
                    with open(lineage_path) as f:
                        recorded = json.load(f).get("fingerprint")
                except (OSError, json.JSONDecodeError):
                    recorded = None
            if fp is None or recorded == fp:
                skipped.append(shard_id)
                continue
            stale.append(shard_id)  # inputs changed → not-done
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        t0 = time.perf_counter()
        meta = process_one(shard, tmp) or {}
        with open(os.path.join(tmp, "_lineage.json"), "w") as f:
            json.dump({"shard": shard_id,
                       "fingerprint": fp,
                       "wall_time_sec": round(time.perf_counter() - t0, 3),
                       **meta}, f)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        done.append(shard_id)
    return {"done": done, "skipped": skipped, "stale": stale}
