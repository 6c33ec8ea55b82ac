from .matching import match_pair, match_to_index_pairs, pairwise_sq_dists
from .features import detect_and_describe, detect_batch, Features
from .optical_flow import horn_schunck_flow
