"""Evaluator tests (VERDICT item 7): exact Racc/Tacc/AUC values on
constructed model pairs, then the full pipeline → evaluator loop.

Reference semantics: scripts/evaluate_sfm_relative.py:88-122 +
scripts/metric.py:51-78 (PhoneSweep benchmark metrics)."""

import os

import numpy as np
import pytest

from sphericalsfm_tpu.io.colmap import rotmat_to_quat


def _rodrigues(r):
    r = np.asarray(r, float)
    th = np.linalg.norm(r)
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _write_model(path, Rs, ts, focal, width=320, height=240, names=None):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "cameras.txt"), "w") as f:
        f.write(f"1 SIMPLE_PINHOLE {width} {height} "
                f"{focal} {width / 2} {height / 2}\n")
    with open(os.path.join(path, "images.txt"), "w") as f:
        for i, (R, t) in enumerate(zip(Rs, ts)):
            q = rotmat_to_quat(R)
            name = names[i] if names else f"{i:06d}.png"
            f.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                    f"{t[0]} {t[1]} {t[2]} 1 {name}\n")
            f.write("\n")
    open(os.path.join(path, "points3D.txt"), "w").close()


def test_exact_racc_tacc_auc(tmp_path):
    """Perturb exactly one of five cameras by exactly 10°: the 4 pairs that
    involve it get a 10° relative-rotation error, the other 6 stay exact —
    every reported number is computable by hand."""
    from sphericalsfm_tpu.eval.relpose_eval import evaluate_models

    n = 5
    phi = np.arange(n) * 0.4
    Rs = [_rodrigues([0.0, p, 0.0]) for p in phi]
    ts = [np.array([0.0, 0.0, -1.0])] * n

    pred = [R.copy() for R in Rs]
    delta = _rodrigues([np.deg2rad(10.0), 0.0, 0.0])
    pred[4] = delta @ pred[4]  # camera-frame perturbation: every pair with
    # camera 4 gets cycle error exactly delta (10°)

    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    _write_model(str(gt_dir), Rs, ts, focal=500.0)
    _write_model(str(pred_dir), pred, ts, focal=525.0)

    rep = evaluate_models(str(pred_dir), str(gt_dir))
    assert rep["num_pairs"] == 10
    np.testing.assert_allclose(rep["Racc@5"], 60.0, atol=1e-9)
    np.testing.assert_allclose(rep["Racc@15"], 100.0, atol=1e-9)
    np.testing.assert_allclose(rep["Racc@30"], 100.0, atol=1e-9)
    # translations stored untouched, but t_rel = t_j − R_rel t_i moves under
    # the rotation perturbation; with the 23° (3,4) baseline the 10° rotation
    # tilts that short t_rel by 21.86° — the other cam-4 pairs stay < 9°.
    np.testing.assert_allclose(rep["Tacc@15"], 90.0, atol=1e-9)
    np.testing.assert_allclose(rep["Tacc@30"], 100.0, atol=1e-9)
    np.testing.assert_allclose(rep["focal_rel_err_pct"], 5.0, atol=1e-9)
    # AUC@30, histogram-cumsum over max(rot, trans) pair errors:
    # {0°×6, 10°×3, 21.86°×1} ⇒ cum 0.6 over bins 0-9, 0.9 over 10-20,
    # 1.0 over 21-29 ⇒ AUC = (10·0.6 + 11·0.9 + 9·1.0)/30 = 83%. One-bin
    # tolerance for the exactly-on-edge 10.0° errors.
    np.testing.assert_allclose(rep["AUC@30"], 100 * 24.9 / 30, atol=1.2)


def test_translation_direction_metric(tmp_path):
    """Pure translation-direction error: rotate one camera's center offset so
    only Tacc moves."""
    from sphericalsfm_tpu.eval.relpose_eval import evaluate_models

    n = 3
    Rs = [np.eye(3) for _ in range(n)]
    ts = [np.array([float(i), 0.0, -1.0]) for i in range(n)]
    pred_ts = [t.copy() for t in ts]
    # with identity rotations t_rel = t_j − t_i; shift camera 2's t by a
    # vector at exactly 20° to the GT direction, same magnitude
    d = np.deg2rad(20.0)
    # gt t_rel for pairs (0,2) = [2,0,0], (1,2) = [1,0,0]
    rot20 = np.array(
        [[np.cos(d), -np.sin(d), 0], [np.sin(d), np.cos(d), 0], [0, 0, 1]]
    )
    pred_ts[2] = rot20 @ np.array([2.0, 0.0, 0.0]) - np.array([2.0, 0, 0]) + ts[2]
    # now pred t_rel(0,2) = rot20·[2,0,0] → exactly 20° off; pair (1,2)
    # differs by a different angle; pair (0,1) unchanged.

    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    _write_model(str(gt_dir), Rs, ts, focal=500.0)
    _write_model(str(pred_dir), Rs, pred_ts, focal=500.0)
    rep = evaluate_models(str(pred_dir), str(gt_dir))
    # pair errors: (0,1) = 0°, (0,2) = 20° exactly, and (1,2) =
    # ∠(rot20·[2,0,0] − [1,0,0], [1,0,0]) = 37.88°
    assert rep["Racc@5"] == 100.0
    np.testing.assert_allclose(rep["Tacc@5"], 100 / 3, atol=1e-9)
    np.testing.assert_allclose(rep["Tacc@15"], 100 / 3, atol=1e-9)
    np.testing.assert_allclose(rep["Tacc@30"], 200 / 3, atol=1e-9)


def test_pipeline_to_evaluator_loop(tmp_path):
    """Full uncalibrated pipeline on a rendered capture → evaluator against
    the rendered ground truth (the PhoneSweep-style end-to-end loop)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_driver import render_capture, FOCAL, W, H

    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.eval.relpose_eval import evaluate_models
    from sphericalsfm_tpu.pipeline.driver import run_uncalibrated

    cam_r_gt, cam_t_gt, gray, color = render_capture(num_frames=16, arc=1.0)
    out = str(tmp_path / "run")
    cfg = PipelineConfig()
    cfg.frontend.max_keypoints = 512
    cfg.frontend.max_matches_per_pair = 384
    cfg.ransac.num_hypotheses = 384
    cfg.ransac.min_num_inliers = 30
    cfg.focal.num_trials = 256
    cfg.ba.max_iters = 60
    m, focal = run_uncalibrated(None, out, cfg, gray=gray, color=color)

    gt_dir = str(tmp_path / "gt")
    Rs = [_rodrigues(r) for r in np.asarray(cam_r_gt)]
    _write_model(gt_dir, Rs, list(np.asarray(cam_t_gt)), focal=FOCAL,
                 width=W, height=H)

    rep = evaluate_models(os.path.join(out, "sparse", "final"), gt_dir)
    assert rep["num_pairs"] == 16 * 15 // 2
    assert rep["Racc@5"] == 100.0, rep
    assert rep["Tacc@15"] >= 90.0, rep
    assert rep["AUC@30"] > 85.0, rep
    assert rep["focal_rel_err_pct"] < 6.0, rep
    return rep


if __name__ == "__main__":  # manual: record the numbers for BASELINE.md
    import json
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        print(json.dumps(test_pipeline_to_evaluator_loop(Path(td)), indent=2))
