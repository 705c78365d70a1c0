from .cells import cell_id, cell_parent, cell_res, cell_xy, cell_disk, CELL_RES_BITS
from .hilbert import hilbert_key, hilbert_xy_from_latlon, HILBERT_ORDER
from .s2 import s2_cell_id
from .tiles import tile_xy, MAX_MERC_LAT

__all__ = [
    "cell_id", "cell_parent", "cell_res", "cell_xy", "cell_disk", "CELL_RES_BITS",
    "hilbert_key", "hilbert_xy_from_latlon", "HILBERT_ORDER",
    "s2_cell_id",
    "tile_xy", "MAX_MERC_LAT",
]
