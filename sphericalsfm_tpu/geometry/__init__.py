from .so3 import skew, so3_exp, so3_log, rotation_angle, rotation_geodesic
from .pose import (
    Pose, Intrinsics, identity_pose, pose_apply, pose_apply_inverse,
    pose_inverse, pose_compose, pose_center, relative_pose,
    spherical_pose_translation, pixels_to_rays, project,
)
from .essential import (
    make_spherical_essential, decompose_spherical_essential,
    decompose_spherical_essential_cheirality, spherical_translation,
    essential_params, essential_from_params, conjugate_essential_by_focal,
)
