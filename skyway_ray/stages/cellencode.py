"""Cell-encode stage: add hierarchical cell ids, S2 leaf id, Hilbert key.

Stateless vectorized Arrow transform; use as
``ds.map_batches(CellEncode(), batch_format="pyarrow")``.  Adds:
``h3_r{r}`` for each requested resolution (grid cells — see
``geo/cells.py`` for why these are grid- rather than hexagon-based),
``s2_cell`` (level-30 leaf id), ``hilbert_key``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.cells import cell_id
from ..geo.hilbert import hilbert_key
from ..geo.s2 import s2_cell_id

DEFAULT_RESOLUTIONS = (7, 8, 9, 10, 11, 12)


class CellEncode:
    def __init__(self, resolutions=DEFAULT_RESOLUTIONS, with_s2: bool = True,
                 with_hilbert: bool = True, lat_col: str = "lat",
                 lon_col: str = "lon"):
        self.resolutions = tuple(resolutions)
        self.with_s2 = with_s2
        self.with_hilbert = with_hilbert
        self.lat_col = lat_col
        self.lon_col = lon_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        for r in self.resolutions:
            batch = batch.append_column(
                f"h3_r{r}", pa.array(cell_id(lat, lon, r), pa.int64()))
        if self.with_s2:
            batch = batch.append_column(
                "s2_cell", pa.array(s2_cell_id(lat, lon), pa.int64()))
        if self.with_hilbert:
            batch = batch.append_column(
                "hilbert_key", pa.array(hilbert_key(lat, lon), pa.int64()))
        return batch
