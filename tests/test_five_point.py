"""5-pt general essential solver tests (comparison-solver parity, E3/T4)."""

import jax
import jax.numpy as jnp
import numpy as np

from sphericalsfm_tpu.eval.metrics import (
    frobenius_error,
    rotation_error_deg,
    translation_angle_deg,
)
from sphericalsfm_tpu.solvers.five_point import (
    cheirality_best,
    decompose_essential,
    solve_essential_5pt,
)
from sphericalsfm_tpu.geometry.so3 import skew, so3_exp


def _general_problems(seed, batch, n_corr, noise=0.0):
    """Random general two-view problems (not spherical): random R, random t."""
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(batch, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    r = axes * rng.uniform(0.05, 0.5, (batch, 1))
    R = np.asarray(so3_exp(jnp.asarray(r)))
    t = rng.normal(size=(batch, 3))
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    t *= 0.3
    E = np.asarray(skew(jnp.asarray(t))) @ R

    xy = rng.normal(size=(batch, n_corr, 2)) * 0.5
    u = np.concatenate([xy, np.ones((batch, n_corr, 1))], -1)
    X = u * rng.uniform(4, 8, (batch, n_corr, 1))
    PX = np.einsum("bij,bnj->bni", R, X) + t[:, None]
    good = PX[..., 2] > 0
    v = np.concatenate([PX[..., :2] / PX[..., 2:], np.ones((batch, n_corr, 1))], -1)
    if noise > 0:
        u[..., :2] += rng.normal(size=(batch, n_corr, 2)) * noise
        v[..., :2] += rng.normal(size=(batch, n_corr, 2)) * noise
    return jnp.asarray(u), jnp.asarray(v), jnp.asarray(E), R, t, good


def test_5pt_exact_recovery():
    u, v, E_gt, R, t, good = _general_problems(0, 64, 5)
    Es, valid = solve_essential_5pt(u, v)
    err = jnp.where(valid, frobenius_error(Es, E_gt[:, None]), jnp.inf)
    best = np.asarray(jnp.min(err, axis=-1))
    ok = good.all(axis=-1)
    assert np.median(best[ok]) < 1e-8, np.median(best[ok])


def test_5pt_nonminimal():
    u, v, E_gt, R, t, good = _general_problems(1, 32, 12)
    Es, valid = solve_essential_5pt(u, v)
    err = jnp.where(valid, frobenius_error(Es, E_gt[:, None]), jnp.inf)
    best = np.asarray(jnp.min(err, axis=-1))
    ok = good.all(axis=-1)
    assert np.median(best[ok]) < 1e-8


def test_decompose_and_cheirality():
    u, v, E_gt, R_gt, t_gt, good = _general_problems(2, 32, 30)
    Rs, ts = decompose_essential(E_gt)
    R, t, votes = cheirality_best(Rs, ts, u, v, jnp.asarray(good))
    rot_err = np.asarray(rotation_error_deg(R, jnp.asarray(R_gt)))
    tr_err = np.asarray(translation_angle_deg(t, jnp.asarray(t_gt)))
    sel = good.sum(-1) > 25
    assert np.median(rot_err[sel]) < 1e-5
    assert np.median(tr_err[sel]) < 1e-4
    # votes for the winner should be near the full inlier count
    assert (np.asarray(votes).max(-1)[sel] > 20).all()


def test_general_essential_ransac():
    from sphericalsfm_tpu.ransac import general_essential_ransac

    u, v, E_gt, R, t, good = _general_problems(3, 2, 100, noise=1 / 600)
    res = general_essential_ransac(
        jax.random.PRNGKey(0), u[0], v[0], jnp.asarray(good[0]),
        sq_thresh=jnp.asarray((2 / 600) ** 2), num_hypotheses=128,
    )
    err = float(rotation_error_deg(so3_exp(res.r), jnp.asarray(R[0])))
    assert err < 0.5, err
    assert int(res.num_inliers) > 80
