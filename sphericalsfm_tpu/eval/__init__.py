from .synthetic import make_random_problems, make_circular_scene, RelativePoseProblem
from .metrics import (
    frobenius_error, rotation_error_deg, translation_angle_deg,
    accuracy_at, auc_at, ate,
)
from .relpose_eval import evaluate_models, relative_pose_errors
