from .lm import (
    levenberg_marquardt, LMResult,
    cauchy_rho, cauchy_weight, soft_l1_rho, soft_l1_weight,
    trivial_rho, trivial_weight,
)
from .ba import (
    BAProblem, BAResult, bundle_adjust, bundle_adjust_checkpointed,
    ba_cost, build_tracks,
    sort_obs_by_camera,
)
from .pose_graph import (
    RotationGraph, optimize_rotations, optimize_rotations_and_focal,
    pose_graph_cost, initialize_rotations_sequential, rotations_at_focal,
    initialize_rotations_global, initialize_rotations_tree,
    build_spanning_tree,
    loop_constraint_costs, find_best_focal_random, decompose_rotation_xy_z,
    warp_thetaxy,
)
