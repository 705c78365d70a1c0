"""Geotag stage: derive (lat, lon) from ``phash`` (SURVEY.md §1.3).

Stateless, zero-copy Arrow: use as
``ds.map_batches(add_geotag, batch_format="pyarrow")``.
"""

from __future__ import annotations

import pyarrow as pa

from ..geo.geotag import latlon_from_phash


def add_geotag(batch: pa.Table, phash_col: str = "phash") -> pa.Table:
    lat, lon = latlon_from_phash(batch[phash_col].to_numpy(zero_copy_only=False))
    batch = batch.append_column("lat", pa.array(lat, pa.float64()))
    return batch.append_column("lon", pa.array(lon, pa.float64()))
