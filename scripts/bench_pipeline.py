"""End-to-end reconstruction benchmark on the current accelerator.

BASELINE.md config (2): the calibrated pipeline on a short circular capture
— rendered synthetic imagery with full parallax (the same ray-cast generator
as tests/test_driver.py, at VGA resolution), timed per stage, with final ATE
against the ground-truth trajectory.

Usage:  python scripts/bench_pipeline.py [--frames 48] [--size 640x480]
"""

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sphericalsfm_tpu  # noqa: E402,F401
from sphericalsfm_tpu.config import PipelineConfig  # noqa: E402
from sphericalsfm_tpu.eval.metrics import ate  # noqa: E402
from sphericalsfm_tpu.geometry import Intrinsics, so3_exp  # noqa: E402
from sphericalsfm_tpu.pipeline.driver import run_calibrated  # noqa: E402


def render(num_frames, W, H, focal):
    rng = np.random.default_rng(7)
    n_waves = 600
    wdir = rng.normal(size=(n_waves, 3))
    wdir /= np.linalg.norm(wdir, axis=-1, keepdims=True)
    wvec = wdir * rng.uniform(1.0, 25.0 * (W / 320), (n_waves, 1))
    phase = rng.uniform(0, 2 * np.pi, n_waves)
    amp = rng.uniform(0.3, 1.0, n_waves) / np.sqrt(n_waves)
    phi = np.arange(num_frames) * 2 * np.pi / num_frames
    cam_r = np.stack([np.zeros(num_frames), phi, np.zeros(num_frames)], -1)
    cam_t = np.tile([0.0, 0.0, -1.0], (num_frames, 1))
    R = np.asarray(so3_exp(jnp.asarray(cam_r)))
    ys, xs = np.mgrid[0:H, 0:W]
    dirs = np.stack([(xs - W / 2) / focal, (ys - H / 2) / focal,
                     np.ones_like(xs, float)], -1)
    frames = []
    for i in range(num_frames):
        c = -R[i].T @ cam_t[i]
        d = dirs @ R[i]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        cd = d @ c
        tt = -cd[..., None] + np.sqrt((cd**2 - (c @ c) + 64.0)[..., None])
        p = c + d * tt
        # one (HW, n_waves) matmul instead of a python loop over waves
        ph = p.reshape(-1, 3).astype(np.float32) @ wvec.T.astype(np.float32)
        tex = (np.cos(ph + phase.astype(np.float32))
               @ amp.astype(np.float32)).reshape(p.shape[:2])
        tex = (tex - tex.min()) / (tex.max() - tex.min())
        frames.append(tex.astype(np.float32))
    gray = np.stack(frames)
    color = (gray[..., None] * 255).astype(np.uint8).repeat(3, -1)
    return cam_r, cam_t, gray, color


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--size", default="640x480")
    ap.add_argument("--keypoints", type=int, default=1024)
    ap.add_argument("--runs", type=int, default=2,
                    help="pipeline runs: first is cold (in-process), last "
                    "is warm; each uses a fresh output dir")
    ap.add_argument("--matching", default="exhaustive",
                    choices=("exhaustive", "windows"),
                    help="pair candidates: O(F^2) exhaustive or the O(F) "
                    "adjacent-band + loop-closure-window mode")
    args = ap.parse_args()
    W, H = (int(x) for x in args.size.split("x"))
    focal = 0.8 * W

    t0 = time.time()
    cam_r_gt, cam_t_gt, gray, color = render(args.frames, W, H, focal)
    t_render = time.time() - t0

    cfg = PipelineConfig()
    cfg.frontend.matching = args.matching
    cfg.frontend.max_keypoints = args.keypoints
    cfg.frontend.max_matches_per_pair = 512
    cfg.ransac.num_hypotheses = 512
    cfg.ransac.min_num_inliers = 30
    cfg.ba.max_iters = 60
    cfg.ba.solve_dtype = "float32"

    intr = Intrinsics(jnp.asarray(focal), jnp.asarray(W / 2.0),
                      jnp.asarray(H / 2.0))
    walls = []
    for run in range(max(args.runs, 1)):
        out = tempfile.mkdtemp()
        t0 = time.time()
        m = run_calibrated(None, intr, out, cfg, gray=gray, color=color)
        walls.append(time.time() - t0)

    # Per-stage breakdown of the final (warm) run, from the driver's
    # structured stage log (VERDICT r1 item 6: prove where the wall goes).
    stages = {}
    with open(os.path.join(out, "stages.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            stages[rec["stage"]] = round(rec["seconds"], 2)

    R_gt = np.asarray(so3_exp(jnp.asarray(cam_r_gt)))
    centers_gt = -np.einsum("cji,cj->ci", R_gt, cam_t_gt)
    err = float(ate(jnp.asarray(np.asarray(m.centers(), np.float64)),
                    jnp.asarray(centers_gt)))
    print(json.dumps({
        "config": f"{args.frames} frames {W}x{H}, {args.keypoints} kp",
        "device": str(jax.devices()[0]),
        "render_s": round(t_render, 1),
        "pipeline_wall_s": round(walls[0], 1),
        "pipeline_wall_warm_s": round(walls[-1], 1),
        "frames_per_s_warm": round(args.frames / walls[-1], 2),
        "ate": round(err, 5),
        "points": int(m.point_valid().sum()),
        "stages_warm": stages,
    }))


if __name__ == "__main__":
    main()
