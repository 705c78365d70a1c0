"""Format dispatch by flag or file extension.

Mirrors ``InputFileFormat::from_str`` / ``OutputFileFormat::from_str``
(``/root/reference/src/readers/mod.rs:36-50``,
``/root/reference/src/writers/mod.rs:33-48``): json/opl/osm(xml)/xml
for both directions, ``overpass`` as a JSON-writer variant, ``pbf``
read-only in the reference, read+write here (own pure-Python wire
codec — io/osm_pbf.py), ``o5m`` unfinished in the
reference and documented-only here.  ``parquet`` is this engine's
native format (the scale path).
"""

from __future__ import annotations

import os


def infer_format(path: str, explicit: str | None = None) -> str:
    if explicit:
        f = explicit.lower()
    else:
        f = os.path.splitext(path)[1].lstrip(".").lower()
    aliases = {"osm": "xml", "overpass": "json"}
    f = aliases.get(f, f)
    if f not in ("json", "opl", "xml", "pbf", "o5m", "parquet", "lance"):
        raise ValueError(f"unrecognized format {f!r} for {path!r}")
    return f


def read_elements(path: str, fmt: str | None = None):
    """Returns (Dataset, metadata dict)."""
    import ray.data

    f = infer_format(path, fmt)
    if f == "json":
        from .osm_json import read_osm_json
        return read_osm_json(path)
    if f == "xml":
        from .osm_xml import read_osm_xml
        return read_osm_xml(path)
    if f == "opl":
        from .opl import read_opl
        return read_opl(path), {}
    if f == "parquet":
        return ray.data.read_parquet(path), {}
    if f == "lance":
        from .lance_io import read_lance
        return read_lance(path), {}
    if f == "pbf":
        from .osm_pbf import read_pbf
        return read_pbf(path)
    if f == "o5m":
        from .o5m_io import read_o5m
        return read_o5m(path)
    raise NotImplementedError(f"no reader for {f!r}")


def write_elements(ds, path: str, fmt: str | None = None,
                   metadata: dict | None = None, overpass: bool = False) -> int:
    f = infer_format(path, fmt)
    if f == "json":
        from .osm_json import write_osm_json
        return write_osm_json(ds, path, metadata, overpass=overpass)
    if f == "xml":
        from .osm_xml import write_osm_xml
        return write_osm_xml(ds, path, metadata)
    if f == "opl":
        from .opl import write_opl
        return write_opl(ds, path)
    if f == "parquet":
        ds.write_parquet(path)
        return -1
    if f == "lance":
        from .lance_io import write_lance
        return write_lance(ds, path)
    if f == "pbf":
        from .osm_pbf import write_pbf
        return write_pbf(ds, path)
    if f == "o5m":
        from .o5m_io import write_o5m
        return write_o5m(ds, path)
    raise NotImplementedError(f"no writer for {f!r}")


READERS = ("json", "opl", "xml", "pbf", "o5m", "parquet", "lance")
WRITERS = ("json", "overpass-json", "opl", "xml", "pbf", "o5m", "parquet", "lance")
