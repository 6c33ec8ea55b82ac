from .sharded import (
    make_mesh, pad_to_multiple, put_sharded, data_sharding, replicated,
    sharded_detect, sharded_pairwise_ransac,
    sharded_retriangulate, shard_ba_problem, distributed_bundle_adjust,
)
from .ring_matching import ring_exhaustive_match, ring_match_pairs
