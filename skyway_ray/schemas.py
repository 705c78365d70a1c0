"""Arrow schemas for the engine's tables.

``IMAGE_SCHEMA`` is the authoritative input shape from BASELINE.json
``input_hint``; ``OSM_ELEMENT_SCHEMA`` is the Arrow rendering of the
reference's row model (``/root/reference/src/elements.rs:23-41`` —
tagged union flattened into a ``type`` column + nullable type-specific
columns); ``BOUNDARY_SCHEMA`` is the small broadcast polygon side table.
"""

from __future__ import annotations

import pyarrow as pa

IMAGE_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

# tags as list<struct<key,value>> rather than map<> — identical logical
# content, but list<struct> round-trips through every pyarrow/pandas/
# parquet path in this stack without map-specific gaps.
TAGS_TYPE = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))

MEMBER_TYPE = pa.struct([
    ("type", pa.string()),   # node|way|relation (SimpleElementType)
    ("ref", pa.int64()),
    ("role", pa.string()),
])

OSM_ELEMENT_SCHEMA = pa.schema([
    ("type", pa.string()),               # node|way|relation
    ("id", pa.int64()),
    ("lat", pa.float64()),               # null unless node
    ("lon", pa.float64()),               # null unless node
    ("nodes", pa.list_(pa.int64())),     # null unless way
    ("members", pa.list_(MEMBER_TYPE)),  # null unless relation
    ("tags", TAGS_TYPE),
    ("changeset", pa.int64()),
    ("uid", pa.int32()),
    ("user", pa.string()),
    ("version", pa.int32()),
    ("timestamp", pa.string()),          # kept as string, never parsed (elements.rs:38)
    ("visible", pa.bool_()),
])

BOUNDARY_SCHEMA = pa.schema([
    ("region_id", pa.string()),
    ("ring_lon", pa.list_(pa.float64())),
    ("ring_lat", pa.list_(pa.float64())),
    ("tags", TAGS_TYPE),
])


def tags_to_pylist(tags_column) -> list[dict[str, str]]:
    """list<struct<key,value>> column → list of python dicts."""
    out = []
    for row in tags_column.to_pylist():
        if row is None:
            out.append({})
        else:
            out.append({kv["key"]: kv["value"] for kv in row})
    return out


def tags_from_pylist(dicts) -> pa.Array:
    """list of python dicts → list<struct<key,value>> array."""
    return pa.array(
        [[{"key": k, "value": v} for k, v in d.items()] for d in dicts],
        type=TAGS_TYPE,
    )
