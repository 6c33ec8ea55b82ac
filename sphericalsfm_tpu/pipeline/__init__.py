from .pairwise import estimate_pairwise, all_pairs, pad_match_table, PairwiseResult
from .tracks import (
    Tracks, build_feature_tracks, largest_connected_component,
    filter_triplet_cycles, UnionFind,
)
from .sfm import SfMMap
