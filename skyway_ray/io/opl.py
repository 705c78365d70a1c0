"""OPL (Osmium "object per line") source + sink.

Reader semantics mirror ``/root/reference/src/readers/opl.rs:93-242``
(field flags n/w/r/v/d/c/t/i/u/T/x/y/N/M, ``%hex%`` unescape, tags =
``k=v`` comma list keeping only entries containing ``=``); writer
mirrors ``/root/reference/src/writers/opl.rs:62-191`` (fixed field
order, escape char classes, nodes as ``nID``, members as
``tID@role``).

Ray Data shape: ``read_opl`` = ``read_text`` → ``map_batches(parse)``
(truly streaming, like the reference's line iterator);
``write_opl`` = ``map_batches(serialize_to_part_file)`` fan-out with a
driver-side manifest — one part file per block, so the sink streams and
a rerun can skip finished parts.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.opl_codec import escape_opl, unescape_opl
from ..schemas import OSM_ELEMENT_SCHEMA


def _fmt_f64(v: float) -> str:
    """Shortest round-trip float formatting (lexical::to_string analog)."""
    return repr(float(v))


def parse_opl_lines(lines) -> pa.Table:
    """Parse OPL lines → OSM_ELEMENT_SCHEMA Arrow table."""
    cols = {k: [] for k in ("type", "id", "lat", "lon", "nodes", "members",
                            "tags", "changeset", "uid", "user", "version",
                            "timestamp", "visible")}
    for line in lines:
        t = id_ = lat = lon = nodes = members = None
        tags = None
        changeset = uid = user = version = timestamp = visible = None
        for field in line.split():
            flag, value = field[0], field[1:]
            if flag in "nwr" and t is None:
                t = {"n": "node", "w": "way", "r": "relation"}[flag]
                id_ = int(value)
            elif flag == "v":
                version = int(value)
            elif flag == "d":
                visible = value == "V"
            elif flag == "c":
                changeset = int(value)
            elif flag == "t":
                timestamp = value
            elif flag == "i":
                uid = int(value)
            elif flag == "u":
                user = unescape_opl(value)
            elif flag == "T":
                tags = [
                    {"key": unescape_opl(kv[0]), "value": unescape_opl(kv[1])}
                    for kv in (t2.split("=", 1) for t2 in value.split(","))
                    if len(kv) == 2
                ]
            elif flag == "x":
                lon = float(value) if value else None
                t = "node"
            elif flag == "y":
                lat = float(value) if value else None
                t = "node"
            elif flag == "N":
                nodes = [int(e.split("x")[0].split("y")[0][1:])
                         for e in value.split(",")] if value else []
                t = "way"
            elif flag == "M":
                members = []
                if value:
                    for entry in value.split(","):
                        if "@" not in entry:
                            continue
                        ref_part, role = entry.split("@", 1)
                        tc = ref_part[0]
                        if tc not in "nwr":
                            continue
                        members.append({
                            "type": {"n": "node", "w": "way", "r": "relation"}[tc],
                            "ref": int(ref_part[1:]),
                            "role": unescape_opl(role),
                        })
                t = "relation"
        cols["type"].append(t)
        cols["id"].append(id_)
        cols["lat"].append(lat)
        cols["lon"].append(lon)
        cols["nodes"].append(nodes)
        cols["members"].append(members)
        cols["tags"].append(tags or [])
        cols["changeset"].append(changeset)
        cols["uid"].append(uid)
        cols["user"].append(user)
        cols["version"].append(version)
        cols["timestamp"].append(timestamp)
        cols["visible"].append(visible)
    arrays = [pa.array(cols[f.name], f.type) for f in OSM_ELEMENT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=OSM_ELEMENT_SCHEMA)


def serialize_opl_batch(table: pa.Table) -> list[str]:
    """OSM_ELEMENT_SCHEMA table → OPL lines (writer field order,
    ``writers/opl.rs:62-168``)."""
    rows = table.to_pylist()
    out = []
    for r in rows:
        t = r["type"]
        parts = [("n" if t == "node" else "w" if t == "way" else "r") + str(r["id"])]
        if r.get("version") is not None:
            parts.append(f"v{r['version']}")
        if r.get("visible") is not None:
            parts.append("dV" if r["visible"] else "dD")
        if r.get("changeset") is not None:
            parts.append(f"c{r['changeset']}")
        if r.get("timestamp") is not None:
            parts.append(f"t{r['timestamp']}")
        if r.get("uid") is not None:
            parts.append(f"i{r['uid']}")
        if r.get("user") is not None:
            parts.append("u" + escape_opl(r["user"]))
        tag_str = ",".join(
            escape_opl(kv["key"]) + "=" + escape_opl(kv["value"])
            for kv in (r.get("tags") or []))
        parts.append("T" + tag_str)
        if t == "node":
            parts.append("x" + (_fmt_f64(r["lon"]) if r.get("lon") is not None else ""))
            parts.append("y" + (_fmt_f64(r["lat"]) if r.get("lat") is not None else ""))
        elif t == "way":
            parts.append("N" + ",".join(f"n{n}" for n in (r.get("nodes") or [])))
        else:
            parts.append("M" + ",".join(
                f"{m['type'][0]}{m['ref']}@{escape_opl(m['role'] or '')}"
                for m in (r.get("members") or [])))
        out.append(" ".join(parts))
    return out


def read_opl(path: str):
    """Streaming OPL source: one parse task per text block."""
    import ray.data

    return ray.data.read_text(path).map_batches(
        lambda b: parse_opl_lines(b["text"].to_pylist()),
        batch_format="pyarrow",
    )


def write_opl(ds, out_dir: str) -> int:
    """Distributed OPL sink: each block becomes one part file (atomic
    tmp+rename). Returns total rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid

        lines = serialize_opl_batch(batch)
        name = f"part-{uuid.uuid4().hex}.opl"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
            if lines:
                f.write("\n")
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"rows": [len(lines)]})

    manifest = ds.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return int(manifest["rows"].sum())
