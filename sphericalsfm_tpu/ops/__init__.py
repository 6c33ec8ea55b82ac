from .matching import match_pair, match_to_index_pairs, pairwise_sq_dists
