"""Multi-sequence end-to-end accuracy suite.

Renders several synthetic spherical captures (different focal lengths,
frame counts, textures), runs the full *uncalibrated* pipeline on each, and
evaluates the reconstruction against the rendered ground truth with the
PhoneSweep metric definitions (Racc/Tacc@{5,15,30}, AUC@30, relative focal
error — reference scripts/evaluate_sfm_relative.py:88-122). The aggregate
goes to BASELINE.md.

Usage: python scripts/eval_suite.py [out_dir]
"""

import json
import os
import sys

# TPU dtype regime unless explicitly running the CPU/f64 path: the
# accelerator backend has no f64 linalg, and x64 index dtypes break the
# Pallas matcher lowering.
os.environ.setdefault(
    "SPHERICALSFM_TPU_X64",
    "1" if "cpu" in os.environ.get("JAX_PLATFORMS", "") else "0",
)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    # sitecustomize registers the axon backend before us (CLAUDE.md): both
    # the env var AND the post-import config update are required for CPU
    import jax

    jax.config.update("jax_platforms", "cpu")

SEQUENCES = [
    dict(name="f260_16", focal=260.0, num_frames=16, seed=7),
    dict(name="f320_20", focal=320.0, num_frames=20, seed=11),
    dict(name="f210_14", focal=210.0, num_frames=14, seed=23),
    dict(name="f290_24", focal=290.0, num_frames=24, seed=31),
]
W, H = 320, 240


def run_sequence(spec, out_root):
    import numpy as np

    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.eval.relpose_eval import evaluate_models
    from sphericalsfm_tpu.eval.render import render_capture
    from sphericalsfm_tpu.io.colmap import rotmat_to_quat
    from sphericalsfm_tpu.pipeline.driver import run_uncalibrated
    from sphericalsfm_tpu.geometry.so3 import so3_exp
    import jax.numpy as jnp

    cam_r, cam_t, gray, color = render_capture(
        num_frames=spec["num_frames"], arc=1.0, focal=spec["focal"],
        width=W, height=H, seed=spec["seed"],
    )
    out = os.path.join(out_root, spec["name"])
    cfg = PipelineConfig()
    cfg.frontend.max_keypoints = 512
    cfg.frontend.max_matches_per_pair = 384
    cfg.ransac.num_hypotheses = 384
    cfg.ransac.min_num_inliers = 30
    cfg.focal.num_trials = 256
    cfg.ba.max_iters = 60
    m, focal = run_uncalibrated(None, out, cfg, gray=gray, color=color)

    # write the rendered ground truth as a COLMAP text model
    gt_dir = os.path.join(out, "gt")
    os.makedirs(gt_dir, exist_ok=True)
    Rs = np.asarray(so3_exp(jnp.asarray(cam_r)))
    with open(os.path.join(gt_dir, "cameras.txt"), "w") as f:
        f.write(f"1 SIMPLE_PINHOLE {W} {H} {spec['focal']} {W/2} {H/2}\n")
    with open(os.path.join(gt_dir, "images.txt"), "w") as f:
        for i in range(len(Rs)):
            q = rotmat_to_quat(Rs[i])
            t = cam_t[i]
            f.write(
                f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} "
                f"{t[0]} {t[1]} {t[2]} 1 {i:06d}.png\n\n"
            )
    open(os.path.join(gt_dir, "points3D.txt"), "w").close()

    rep = evaluate_models(os.path.join(out, "sparse", "final"), gt_dir)
    rep["sequence"] = spec["name"]
    rep["focal_true"] = spec["focal"]
    rep["focal_est"] = focal
    return rep


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfm_eval_suite"
    import numpy as np

    reports = []
    for spec in SEQUENCES:
        rep = run_sequence(spec, out_root)
        print(json.dumps(rep), flush=True)
        reports.append(rep)

    agg = {"sequences": len(reports)}
    for k in ("Racc@5", "Racc@15", "Racc@30", "Tacc@5", "Tacc@15", "Tacc@30",
              "AUC@30", "focal_rel_err_pct"):
        agg[f"mean_{k}"] = float(np.mean([r[k] for r in reports]))
    print(json.dumps(agg, indent=2))
    with open(os.path.join(out_root, "suite.json"), "w") as f:
        json.dump({"per_sequence": reports, "aggregate": agg}, f, indent=2)


if __name__ == "__main__":
    main()
