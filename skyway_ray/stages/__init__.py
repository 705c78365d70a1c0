from .geotag import add_geotag
from .cellencode import CellEncode
from .pip_join import BoundaryIndex, PIPJoiner
from .tiling import add_tile_xy, tile_stats
from .dedup import exact_dedup, exact_dedup_bloom, exact_dedup_projected
from .topk import top_k
from .knn import CellKnnIndex, KnnStage
from .pip_join import make_pip_join_fn
from .joins import (asof_join_broadcast, broadcast_hash_join,
                    broadcast_range_join, broadcast_semi_join)
from .salt import salted_count
from .cc import connected_components
from .agg_tree import (grouped_count, grouped_count_distinct,
                       tree_aggregate, tree_aggregate_to_table)
from .scan import keyed_lag, keyed_scan, running_sum
from .quantiles import exact_quantiles
from .setops import keyed_set_op, pivot_counts
from .multimodal import (BinaryStats, ImageFeatures, ImageResize,
                         PerceptualHash)

__all__ = [
    "add_geotag", "CellEncode", "BoundaryIndex", "PIPJoiner",
    "make_pip_join_fn", "add_tile_xy", "tile_stats", "exact_dedup",
    "exact_dedup_bloom", "exact_dedup_projected", "top_k",
    "CellKnnIndex", "KnnStage", "connected_components",
    "asof_join_broadcast", "broadcast_hash_join", "broadcast_range_join",
    "broadcast_semi_join", "salted_count", "tree_aggregate",
    "tree_aggregate_to_table", "grouped_count", "grouped_count_distinct",
    "keyed_lag", "keyed_scan", "running_sum", "exact_quantiles",
    "keyed_set_op", "pivot_counts",
    "BinaryStats", "ImageFeatures", "ImageResize", "PerceptualHash",
]
