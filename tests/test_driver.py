"""Full-driver test on rendered synthetic imagery: the complete calibrated
pipeline (real feature detection → matching → RANSAC → rotations → BA) must
reconstruct a rendered circular capture. This is the closest CPU-testable
analogue of the reference's run_spherical_sfm on a real video."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sphericalsfm_tpu.geometry import Intrinsics, so3_exp
from sphericalsfm_tpu.eval.metrics import ate, rotation_error_deg

FOCAL, W, H = 260.0, 320, 240
C = 12
ARC = 0.5  # half circle


def render_capture(num_frames=C, arc=ARC):
    """Ray-cast a band-limited random 3D texture on a radius-8 sphere from
    cameras on the unit circle — real parallax, dense texture."""
    rng = np.random.default_rng(7)
    n_waves = 600
    wdir = rng.normal(size=(n_waves, 3))
    wdir /= np.linalg.norm(wdir, axis=-1, keepdims=True)
    # frequencies up to ~25 rad/unit ⇒ image wavelengths down to ~8 px at
    # radius 8 — fine enough detail for octave-0/1 DoG extrema without
    # aliasing between views
    wvec = wdir * rng.uniform(1.0, 25.0, (n_waves, 1))
    phase = rng.uniform(0, 2 * np.pi, n_waves)
    amp = rng.uniform(0.3, 1.0, n_waves) / np.sqrt(n_waves)

    phi = np.arange(num_frames) * 2 * np.pi * arc / num_frames
    cam_r = np.stack([np.zeros(num_frames), phi, np.zeros(num_frames)], -1)
    cam_t = np.tile([0.0, 0.0, -1.0], (num_frames, 1))
    R = np.asarray(so3_exp(jnp.asarray(cam_r)))

    ys, xs = np.mgrid[0:H, 0:W]
    dirs_cam = np.stack(
        [(xs - W / 2) / FOCAL, (ys - H / 2) / FOCAL, np.ones_like(xs, float)], -1
    )
    frames = []
    for i in range(num_frames):
        center = -R[i].T @ cam_t[i]
        d = dirs_cam @ R[i]  # R^T applied to each dir (camera->world)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        cd = d @ center
        tt = -cd[..., None] + np.sqrt(
            (cd**2 - (center @ center) + 64.0)[..., None]
        )
        p = center + d * tt  # hit points on the sphere
        tex = np.zeros(p.shape[:2])
        for k in range(n_waves):
            tex += amp[k] * np.cos(p @ wvec[k] + phase[k])
        tex = (tex - tex.min()) / (tex.max() - tex.min())
        frames.append(tex.astype(np.float32))
    gray = np.stack(frames)
    color = (gray[..., None] * 255).astype(np.uint8).repeat(3, axis=-1)
    return cam_r, cam_t, gray, color


@pytest.fixture(scope="module")
def capture():
    return render_capture()


def test_calibrated_driver_on_rendered_frames(tmp_path_factory, capture):
    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.pipeline.driver import run_calibrated

    cam_r_gt, cam_t_gt, gray, color = capture
    out = str(tmp_path_factory.mktemp("sfm_out"))
    cfg = PipelineConfig()
    cfg.frontend.max_keypoints = 512
    cfg.frontend.max_matches_per_pair = 384
    cfg.ransac.num_hypotheses = 384
    cfg.ransac.min_num_inliers = 30
    cfg.ba.max_iters = 60

    intr = Intrinsics(jnp.asarray(FOCAL), jnp.asarray(W / 2.0), jnp.asarray(H / 2.0))
    m = run_calibrated(None, intr, out, cfg, gray=gray, color=color)

    R_gt = np.asarray(so3_exp(jnp.asarray(cam_r_gt)))
    centers_gt = -np.einsum("cji,cj->ci", R_gt, cam_t_gt)
    # After general BA + normalize, compare by similarity-aligned ATE.
    err = float(ate(jnp.asarray(m.centers()), jnp.asarray(centers_gt)))
    assert err < 0.05, err

    R_est = np.asarray(so3_exp(jnp.asarray(m.cam_r)))
    rel_err = [
        float(
            rotation_error_deg(
                jnp.asarray(R_est[i] @ R_est[0].T),
                jnp.asarray(R_gt[i] @ R_gt[0].T),
            )
        )
        for i in range(C)
    ]
    assert np.median(rel_err) < 2.0, rel_err

    # outputs written
    import os

    for fname in ["poses.txt", "points.obj", "cameras.obj", "stages.jsonl"]:
        assert os.path.exists(os.path.join(out, fname)), fname
    assert os.path.exists(os.path.join(out, "sparse/model/images.txt"))


def test_uncalibrated_driver_recovers_focal(tmp_path_factory):
    # Focal is only well-constrained by a closed 360° loop (the pose-graph
    # cycle cost is nearly focal-invariant on an open chain), so this test
    # renders a full-circle capture.
    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.pipeline.driver import run_uncalibrated

    cam_r_gt, cam_t_gt, gray, color = render_capture(num_frames=16, arc=1.0)
    out = str(tmp_path_factory.mktemp("sfm_uncalib_out"))
    cfg = PipelineConfig()
    cfg.frontend.max_keypoints = 512
    cfg.frontend.max_matches_per_pair = 384
    cfg.ransac.num_hypotheses = 384
    cfg.ransac.min_num_inliers = 30
    cfg.focal.num_trials = 256
    cfg.ba.max_iters = 60

    m, focal = run_uncalibrated(None, out, cfg, gray=gray, color=color)
    # (W+H)/2 = 280 guess; truth 260. BA-refined focal within 5%.
    assert abs(focal - FOCAL) / FOCAL < 0.05, focal

    import os

    assert os.path.exists(os.path.join(out, "calib.txt"))
    assert os.path.exists(os.path.join(out, "sparse/final/cameras.txt"))


def test_uncalibrated_driver_from_colmap_db(tmp_path_factory):
    """-colmap mode: features/matches loaded from a COLMAP SQLite database
    (the reference's PhoneSweep input path, run_spherical_sfm_uncalib.cpp
    -colmap flag) must drive the full uncalibrated pipeline."""
    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.io.colmap import ColmapDatabase, write_database
    from sphericalsfm_tpu.pipeline.driver import (
        StageLogger, run_frontend, run_uncalibrated,
    )

    cam_r_gt, cam_t_gt, gray, color = render_capture(num_frames=16, arc=1.0)
    out = str(tmp_path_factory.mktemp("sfm_colmap_out"))
    cfg = PipelineConfig()
    cfg.frontend.max_keypoints = 512
    cfg.frontend.max_matches_per_pair = 384
    cfg.ransac.num_hypotheses = 384
    cfg.ransac.min_num_inliers = 30
    cfg.focal.num_trials = 256
    cfg.ba.max_iters = 60

    # Build the database from our own frontend's features/matches.
    fr = run_frontend(None, cfg, StageLogger(out), gray, color)
    F = fr.feats.valid.shape[0]
    counts = fr.feats.counts
    keypoints = [np.asarray(fr.feats.xy[f][: counts[f]], np.float32)
                 for f in range(F)]
    descriptors = [np.asarray(fr.feats.descriptor[f][: counts[f]],
                              np.float32) for f in range(F)]
    matches = {}
    for p in range(len(fr.pair_i)):
        mk = np.asarray(fr.mmask[p])
        if mk.sum() < 5:
            continue
        matches[(int(fr.pair_i[p]), int(fr.pair_j[p]))] = np.stack(
            [np.asarray(fr.idx0[p][mk]), np.asarray(fr.idx1[p][mk])], -1
        ).astype(np.int32)
    db_path = f"{out}/features.db"
    write_database(db_path, ColmapDatabase(
        intrinsics=((W + H) / 2.0, W / 2.0, H / 2.0), width=W, height=H,
        names=[f"frame{f:04d}.png" for f in range(F)],
        keypoints=keypoints, descriptors=descriptors, matches=matches,
    ))

    m, focal = run_uncalibrated(None, out, cfg, colmap_db=db_path)
    assert abs(focal - FOCAL) / FOCAL < 0.05, focal
    import os

    assert os.path.exists(os.path.join(out, "calib.txt"))


def test_uncalibrated_five_point_mode(tmp_path_factory):
    """-fivepoint: general 5-pt pairwise estimation through the driver."""
    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.pipeline.driver import run_uncalibrated

    cam_r_gt, cam_t_gt, gray, color = render_capture(num_frames=12, arc=1.0)
    out = str(tmp_path_factory.mktemp("sfm_5pt_out"))
    cfg = PipelineConfig()
    cfg.five_point = True
    cfg.frontend.max_keypoints = 384
    cfg.frontend.max_matches_per_pair = 256
    cfg.ransac.num_hypotheses = 128
    cfg.ransac.min_num_inliers = 25
    cfg.focal.num_trials = 128
    cfg.ba.max_iters = 40

    m, focal = run_uncalibrated(None, out, cfg, gray=gray, color=color)
    # five-point relative rotations feed the same focal search; looser gate
    assert abs(focal - FOCAL) / FOCAL < 0.15, focal


def test_uncalibrated_sixpoint_mode(tmp_path_factory):
    """--sixpoint: shared-focal 6-pt joint (E, f) RANSAC replaces the focal
    search sweep (the reference's never-wired SixPointEstimator,
    six_point_estimator.h:15-37, as a live driver mode)."""
    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.pipeline.driver import run_uncalibrated

    cam_r_gt, cam_t_gt, gray, color = render_capture(num_frames=12, arc=1.0)
    out = str(tmp_path_factory.mktemp("sfm_6pt_out"))
    cfg = PipelineConfig()
    cfg.six_point = True
    cfg.frontend.max_keypoints = 384
    cfg.frontend.max_matches_per_pair = 256
    cfg.ransac.num_hypotheses = 128
    cfg.ransac.min_num_inliers = 25
    cfg.ba.max_iters = 40

    m, focal = run_uncalibrated(None, out, cfg, gray=gray, color=color)
    # 6-pt consensus + joint pose-graph polish + BA; per-pair focal from
    # small-baseline spherical pairs is noisier than the loop sweep
    assert abs(focal - FOCAL) / FOCAL < 0.15, focal
    import json as _json
    import os as _os

    with open(_os.path.join(out, "stages.jsonl")) as fh:
        stages = [_json.loads(line) for line in fh]
    fs = [s for s in stages if s.get("stage") == "focal_search"]
    assert fs and fs[-1].get("sixpoint", {}).get("pairs_used", 0) > 0, fs


def render_inward_capture(num_frames=16):
    """Object-centric capture: cameras on the unit circle looking at a
    textured radius-0.5 sphere at the origin (inward spherical constraint
    t = (0,0,+1)), with a far backdrop sphere so every ray hits texture."""
    rng = np.random.default_rng(9)
    n_waves = 500
    wdir = rng.normal(size=(n_waves, 3))
    wdir /= np.linalg.norm(wdir, axis=-1, keepdims=True)
    wvec_obj = wdir * rng.uniform(10.0, 150.0, (n_waves, 1))
    wvec_bg = wdir * rng.uniform(1.0, 10.0, (n_waves, 1))
    phase = rng.uniform(0, 2 * np.pi, n_waves)
    amp = rng.uniform(0.3, 1.0, n_waves) / np.sqrt(n_waves)

    phi = np.arange(num_frames) * 2 * np.pi / num_frames
    cam_r, cam_t, frames = [], [], []
    ys, xs = np.mgrid[0:H, 0:W]
    dirs_cam = np.stack(
        [(xs - W / 2) / FOCAL, (ys - H / 2) / FOCAL, np.ones_like(xs, float)], -1
    )
    for i in range(num_frames):
        p = np.array([np.sin(phi[i]), 0.0, np.cos(phi[i])])
        forward = -p
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, forward)
        R = np.stack([right, up, forward])  # rows: world->camera
        t = -R @ p
        assert np.allclose(t, [0, 0, 1], atol=1e-12)
        from sphericalsfm_tpu.geometry import so3_log

        cam_r.append(np.asarray(so3_log(jnp.asarray(R))))
        cam_t.append(t)

        d = dirs_cam @ R  # camera->world ray dirs
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        cd = d @ p
        # small object sphere radius 0.5 at origin
        disc = cd**2 - (p @ p) + 0.25
        hit_obj = disc > 0
        t_obj = -cd - np.sqrt(np.maximum(disc, 0.0))
        # backdrop sphere radius 8
        t_bg = -cd + np.sqrt(cd**2 - (p @ p) + 64.0)
        tt = np.where(hit_obj & (t_obj > 0), t_obj, t_bg)
        pt = p + d * tt[..., None]
        tex = np.zeros(pt.shape[:2])
        use_obj = hit_obj & (t_obj > 0)
        for k in range(n_waves):
            tex += amp[k] * np.where(
                use_obj,
                np.cos(pt @ wvec_obj[k] + phase[k]),
                0.5 * np.cos(pt @ wvec_bg[k] + phase[k]),
            )
        tex = (tex - tex.min()) / (tex.max() - tex.min())
        frames.append(tex.astype(np.float32))
    gray = np.stack(frames)
    color = (gray[..., None] * 255).astype(np.uint8).repeat(3, axis=-1)
    return np.stack(cam_r), np.stack(cam_t), gray, color


def test_calibrated_driver_inward(tmp_path_factory):
    """Inward-facing full pipeline (ECCV'16 object-centric mode)."""
    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.pipeline.driver import run_calibrated

    # 24 frames = 15 deg steps: close-object viewpoint change is the
    # hard case for SIFT; wider steps drop below matchability.
    cam_r_gt, cam_t_gt, gray, color = render_inward_capture(24)
    out = str(tmp_path_factory.mktemp("sfm_inward"))
    cfg = PipelineConfig()
    cfg.inward = True
    cfg.frontend.max_keypoints = 512
    cfg.frontend.max_matches_per_pair = 384
    cfg.ransac.num_hypotheses = 384
    cfg.ransac.min_num_inliers = 15
    cfg.ba.max_iters = 60

    intr = Intrinsics(jnp.asarray(FOCAL), jnp.asarray(W / 2.0), jnp.asarray(H / 2.0))
    m = run_calibrated(None, intr, out, cfg, gray=gray, color=color)

    R_gt = np.asarray(so3_exp(jnp.asarray(cam_r_gt)))
    centers_gt = -np.einsum("cji,cj->ci", R_gt, cam_t_gt)
    err = float(ate(jnp.asarray(m.centers()), jnp.asarray(centers_gt)))
    assert err < 0.08, err


def test_calibrated_driver_windows_matching(tmp_path_factory, capture):
    """windows matching mode (the wiring of numbegin/numend/bestonly,
    reference make_loop_closures flags): O(F) candidate pairs still
    reconstruct the capture; best_only leaves one loop-closure edge."""
    from sphericalsfm_tpu.config import PipelineConfig
    from sphericalsfm_tpu.geometry.pose import Intrinsics
    from sphericalsfm_tpu.pipeline.driver import run_calibrated

    import jax.numpy as jnp

    cam_r_gt, cam_t_gt, gray, color = capture
    out = str(tmp_path_factory.mktemp("sfm_windows_out"))
    cfg = PipelineConfig()
    cfg.frontend.max_keypoints = 512
    cfg.frontend.max_matches_per_pair = 384
    cfg.frontend.matching = "windows"
    cfg.frontend.adjacent_window = 2
    cfg.graph.num_frames_begin = 3
    cfg.graph.num_frames_end = 3
    cfg.ransac.num_hypotheses = 384
    cfg.ransac.min_num_inliers = 30
    cfg.ba.max_iters = 60

    intr = Intrinsics(jnp.asarray(FOCAL), jnp.asarray(W / 2.0),
                      jnp.asarray(H / 2.0))
    m = run_calibrated(None, intr, out, cfg, gray=gray, color=color)
    # reconstruction quality: relative rotation error vs GT
    import numpy as np
    from sphericalsfm_tpu.geometry.so3 import so3_exp as _exp

    R_est = np.asarray(_exp(jnp.asarray(m.cam_r)))
    R_gt = np.asarray(_exp(jnp.asarray(cam_r_gt)))
    rel_est = np.einsum("nij,nkj->nik", R_est[1:], R_est[:-1])
    rel_gt = np.einsum("nij,nkj->nik", R_gt[1:], R_gt[:-1])
    cyc = np.einsum("nij,nkj->nik", rel_est, rel_gt)
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(cyc, axis1=1, axis2=2) - 1) / 2, -1, 1)))
    assert np.median(ang) < 2.0, ang
