from .sharded import (
    make_mesh, pad_to_multiple, sharded_pairwise_ransac,
    sharded_retriangulate, shard_ba_problem, distributed_bundle_adjust,
)
from .ring_matching import ring_exhaustive_match, ring_match_pairs
