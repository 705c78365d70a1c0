from .geotag import add_geotag
from .cellencode import CellEncode
from .pip_join import BoundaryIndex, PIPJoiner
from .tiling import add_tile_xy, tile_stats
from .dedup import exact_dedup, exact_dedup_projected
from .topk import top_k
from .knn import CellKnnIndex, KnnStage

__all__ = [
    "add_geotag", "CellEncode", "BoundaryIndex", "PIPJoiner",
    "add_tile_xy", "tile_stats", "exact_dedup", "exact_dedup_projected",
    "top_k", "CellKnnIndex", "KnnStage",
]
