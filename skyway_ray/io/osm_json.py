"""OSM-JSON / Overpass-JSON source + sink.

Reader mirrors ``/root/reference/src/readers/json.rs``: the whole
document is parsed at once (the reference slurps it too), handling both
flat and ``osm3s``-nested metadata, numeric-or-string ``version``, and
silently dropping unknown element fields (``bounds``, ``geometry`` …)
— only the ``ElementDef`` fields survive (``json.rs:66-80``).

Writer mirrors ``/root/reference/src/writers/json.rs``: elements are
serialized per block in parallel (``map_batches``), with the driver
adding the header/footer.  Quirks preserved: ``visible`` emitted only
when ``false`` (``json.rs:165-168``); ``tags`` omitted when empty
(``json.rs:171``); ``overpass=True`` switches the header to the
``osm3s`` block + numeric version (``json.rs:23-72``).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..schemas import OSM_ELEMENT_SCHEMA

_VALID_TYPES = {"node", "way", "relation"}


def parse_osm_json(text: str) -> tuple[pa.Table, dict]:
    """Parse an OSM/Overpass JSON document → (elements table, metadata)."""
    doc = json.loads(text)
    version = doc.get("version")
    if isinstance(version, (int, float)):
        version = repr(float(version)) if isinstance(version, float) else str(version)
    metadata = {
        "version": version,
        "generator": doc.get("generator"),
        "license": doc.get("license"),
        "copyright": None,
        "timestamp": None,
    }
    if "osm3s" in doc:
        osm3s = doc["osm3s"] or {}
        metadata["copyright"] = osm3s.get("copyright")
        metadata["timestamp"] = osm3s.get("timestamp_osm_base")
    else:
        metadata["copyright"] = doc.get("copyright")

    cols = {k: [] for k in ("type", "id", "lat", "lon", "nodes", "members",
                            "tags", "changeset", "uid", "user", "version",
                            "timestamp", "visible")}
    for el in doc.get("elements", []):
        t = el.get("type")
        if t not in _VALID_TYPES:
            raise ValueError(f"invalid element type: {t}")
        cols["type"].append(t)
        cols["id"].append(el["id"])
        cols["lat"].append(el.get("lat") if t == "node" else None)
        cols["lon"].append(el.get("lon") if t == "node" else None)
        cols["nodes"].append(el.get("nodes") if t == "way" else None)
        if t == "relation":
            cols["members"].append([
                {"type": m.get("type"), "ref": m["ref"], "role": m.get("role")}
                for m in el.get("members", [])
            ])
        else:
            cols["members"].append(None)
        cols["tags"].append([{"key": k, "value": v}
                             for k, v in (el.get("tags") or {}).items()])
        cols["changeset"].append(el.get("changeset"))
        cols["uid"].append(el.get("uid"))
        cols["user"].append(el.get("user"))
        cols["version"].append(el.get("version"))
        cols["timestamp"].append(el.get("timestamp"))
        cols["visible"].append(el.get("visible"))
    arrays = [pa.array(cols[f.name], f.type) for f in OSM_ELEMENT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=OSM_ELEMENT_SCHEMA), metadata


def read_osm_json(path: str):
    """Driver-side doc parse → distributed Dataset (document formats are
    single-file; parallelism starts at the first map stage)."""
    import ray.data

    with open(path, encoding="utf-8") as f:
        table, metadata = parse_osm_json(f.read())
    ds = ray.data.from_arrow(table)
    return ds, metadata


def _fmt_num(v) -> str:
    if isinstance(v, float):
        return repr(v)
    return str(v)


def serialize_json_elements(table: pa.Table) -> str:
    """One block → comma-joined element objects (no brackets)."""
    out = []
    for r in table.to_pylist():
        t = r["type"]
        parts = [f'"type":{json.dumps(t)}']
        if t == "node":
            parts.append(f'"lat":{_fmt_num(r["lat"])}')
            parts.append(f'"lon":{_fmt_num(r["lon"])}')
        elif t == "way":
            parts.append('"nodes":[' + ",".join(str(n) for n in (r["nodes"] or [])) + "]")
        else:
            ms = []
            for m in (r["members"] or []):
                mp = [f'"ref":{m["ref"]}']
                if m.get("type") is not None:
                    mp.append(f'"type":{json.dumps(m["type"])}')
                mp.append(f'"role":{json.dumps(m.get("role") or "")}')
                ms.append("{" + ",".join(mp) + "}")
            parts.append('"members":[' + ",".join(ms) + "]")
        parts.append(f'"id":{r["id"]}')
        if r.get("changeset") is not None:
            parts.append(f'"changeset":{r["changeset"]}')
        if r.get("timestamp") is not None:
            parts.append(f'"timestamp":{json.dumps(r["timestamp"])}')
        if r.get("uid") is not None:
            parts.append(f'"uid":{r["uid"]}')
        if r.get("user") is not None:
            parts.append(f'"user":{json.dumps(r["user"])}')
        if r.get("visible") is False:  # only when false (json.rs:165-168)
            parts.append('"visible":false')
        tags = r.get("tags") or []
        if tags:  # omitted when empty (json.rs:171)
            body = ",".join(f'{json.dumps(kv["key"])}:{json.dumps(kv["value"])}'
                            for kv in tags)
            parts.append('"tags":{' + body + "}")
        out.append("{" + ",".join(parts) + "}")
    return ",".join(out)


def create_header(metadata: dict, overpass: bool) -> str:
    """Mirror of ``create_header`` (writers/json.rs:23-72)."""
    h = "{"
    if metadata.get("generator") is not None:
        h += f'"generator":{json.dumps(metadata["generator"])},'
    if overpass:
        h += '"osm3s":{'
        appended = False
        if metadata.get("timestamp") is not None:
            h += f'"timestamp_osm_base":{json.dumps(metadata["timestamp"])}'
            appended = True
        if metadata.get("copyright") is not None:
            if appended:
                h += ","
            h += f'"copyright":{json.dumps(metadata["copyright"])}'
        h += '},"version":0.6,"elements":['
    else:
        if metadata.get("copyright") is not None:
            h += f'"copyright":{json.dumps(metadata["copyright"])},'
        if metadata.get("license") is not None:
            h += f'"license":{json.dumps(metadata["license"])},'
        h += '"version":"0.6","elements":['
    return h


def write_osm_json(ds, path: str, metadata: dict | None = None,
                   overpass: bool = False) -> int:
    """Sink: blocks serialize in parallel; the driver streams chunks to
    the file between header and footer (arrival order — the reference's
    parallel serialize is likewise unordered, json.rs:212-222)."""
    metadata = metadata or {}
    rows = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write(create_header(metadata, overpass))
        first = True
        for chunk in ds.map_batches(
                lambda b: pa.table({"s": [serialize_json_elements(b)],
                                    "n": [b.num_rows]}),
                batch_format="pyarrow").iter_rows():
            if chunk["n"] == 0 or not chunk["s"]:
                continue
            if not first:
                f.write(",")
            first = False
            f.write(chunk["s"])
            rows += chunk["n"]
        f.write("]}")
    return rows
