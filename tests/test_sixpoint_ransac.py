"""Shared-focal 6-pt RANSAC (--sixpoint capability: the reference built its
SixPointEstimator but never called it, six_point_estimator.h:15-37)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_five_point import _general_problems


def _nominal(x, f_true):
    x = np.asarray(x).copy()
    x[..., :2] *= f_true  # pixels at the true focal, rays at nominal 1.0
    return x


def test_sixpoint_ransac_recovers_focal_and_pose():
    from sphericalsfm_tpu.ransac.sixpoint import sixpoint_ransac

    f_true = 1.4
    u, v, E_gt, R_gt, t_gt, good = _general_problems(2, 6, 48)
    u = jnp.asarray(_nominal(u, f_true), jnp.float32)
    v = jnp.asarray(_nominal(v, f_true), jnp.float32)
    mask = jnp.asarray(np.asarray(good))
    keys = jax.random.split(jax.random.PRNGKey(0), u.shape[0])
    run = jax.jit(jax.vmap(lambda k, uu, vv, mm: sixpoint_ransac(
        k, uu, vv, mm, sq_thresh=jnp.float32(1e-6), num_hypotheses=24,
    )))
    res = run(keys, u, v, mask)
    f = np.asarray(res.focal_mult, float)
    ninl = np.asarray(res.num_inliers)
    ok = ninl >= 24
    assert ok.sum() >= 3, ninl
    rel = np.abs(f[ok] - f_true) / f_true
    assert np.median(rel) < 0.05, (f[ok], rel)
    # rotation of the consensus solution matches GT for the good pairs
    Rd = np.einsum("bij,bik->bjk", np.asarray(res.R, float)[ok],
                   np.asarray(R_gt, float)[ok])
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(Rd, axis1=-2, axis2=-1) - 1) / 2, -1, 1)))
    assert np.median(ang) < 2.0, ang


def test_estimate_focal_sixpoint_helper():
    from sphericalsfm_tpu.ransac.sixpoint import estimate_focal_sixpoint

    f_true_mult = 1.25
    focal_guess = 400.0
    W, H = 640, 480
    u, v, E_gt, R_gt, t_gt, good = _general_problems(5, 8, 40)
    # convert rays (calibrated) to pixel keypoints at the TRUE focal
    f_px = focal_guess * f_true_mult
    P, M = u.shape[0], u.shape[1]
    xy = np.zeros((2 * P, M, 2), np.float32)
    idx0 = np.tile(np.arange(M, dtype=np.int32), (P, 1))
    idx1 = idx0.copy()
    pair_i = np.arange(P, dtype=np.int32) * 2
    pair_j = pair_i + 1
    for p in range(P):
        xy[2 * p, :, 0] = u[p, :, 0] * f_px + W / 2
        xy[2 * p, :, 1] = u[p, :, 1] * f_px + H / 2
        xy[2 * p + 1, :, 0] = v[p, :, 0] * f_px + W / 2
        xy[2 * p + 1, :, 1] = v[p, :, 1] * f_px + H / 2
    mm = np.asarray(good)
    focal, info = estimate_focal_sixpoint(
        jax.random.PRNGKey(1), jnp.asarray(xy), pair_i, pair_j,
        idx0, idx1, mm, pair_weight=mm.sum(-1), focal_guess=focal_guess,
        width=W, height=H, inlier_threshold_px=0.5, num_pairs=6,
        num_hypotheses=24,
    )
    assert info["pairs_used"] >= 3, info
    assert abs(focal - f_px) / f_px < 0.05, (focal, f_px, info)
