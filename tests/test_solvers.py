"""Minimal-solver tests against the synthetic generator.

Hard invariants (SURVEY.md §4): exact recovery at zero noise, E = [t]_x R with
t = R·e₃ − e₃, and graceful degradation with noise.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sphericalsfm_tpu.eval.synthetic import make_random_problems
from sphericalsfm_tpu.eval.metrics import (
    frobenius_error,
    rotation_error_deg,
    translation_angle_deg,
)
from sphericalsfm_tpu.geometry import (
    make_spherical_essential,
    decompose_spherical_essential,
    so3_exp,
)
from sphericalsfm_tpu.solvers import solve_quartic, solve_spherical_3pt


def test_quartic_known_roots():
    # (x-1)(x-2)(x-3)(x-4) = x^4 -10x^3 +35x^2 -50x +24
    re, im = solve_quartic(1.0, -10.0, 35.0, -50.0, 24.0)
    roots = np.sort(np.asarray(re))
    np.testing.assert_allclose(roots, [1.0, 2.0, 3.0, 4.0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(im), 0.0, atol=1e-8)


def test_quartic_batched_random():
    rng = np.random.default_rng(0)
    roots_gt = rng.uniform(-3, 3, size=(64, 4))
    coeffs = np.array([np.poly(r) for r in roots_gt])  # (64, 5)
    re, im = solve_quartic(*[jnp.asarray(coeffs[:, i]) for i in range(5)])
    got = np.sort(np.asarray(re), axis=-1)
    want = np.sort(roots_gt, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quartic_complex_pair():
    # (x^2+1)(x-2)(x-5) has roots 2, 5, ±i
    coeffs = np.poly([2.0, 5.0, 1j, -1j]).real
    re, im = solve_quartic(*coeffs)
    realness = np.abs(np.asarray(im)) < 1e-8
    assert realness.sum() == 2
    real_roots = np.sort(np.asarray(re)[realness])
    np.testing.assert_allclose(real_roots, [2.0, 5.0], atol=1e-8)


def _best_candidate_errors(Es, valid, E_gt):
    """Min-over-candidates Frobenius error per problem."""
    err = frobenius_error(Es, E_gt[:, None, :, :])
    err = jnp.where(valid, err, jnp.inf)
    return jnp.min(err, axis=-1)


def test_3pt_exact_recovery_outward():
    key = jax.random.PRNGKey(0)
    prob = make_random_problems(key, batch=256, num_corr=3, rotation_deg=5.0)
    Es, valid = solve_spherical_3pt(prob.u, prob.v)
    err = _best_candidate_errors(Es, valid, prob.E)
    # All-cheirality-valid problems must be recovered to numerical precision.
    ok_problems = jnp.all(prob.valid, axis=-1)
    err_ok = np.asarray(err)[np.asarray(ok_problems)]
    assert err_ok.shape[0] > 200
    assert np.median(err_ok) < 1e-10
    assert np.quantile(err_ok, 0.95) < 1e-6


def test_3pt_exact_recovery_inward():
    key = jax.random.PRNGKey(1)
    prob = make_random_problems(key, batch=256, num_corr=3, inward=True, rotation_deg=8.0)
    Es, valid = solve_spherical_3pt(prob.u, prob.v)
    err = _best_candidate_errors(Es, valid, prob.E)
    ok_problems = jnp.all(prob.valid, axis=-1)
    err_ok = np.asarray(err)[np.asarray(ok_problems)]
    assert np.median(err_ok) < 1e-10


def test_3pt_random_rotation_magnitudes():
    key = jax.random.PRNGKey(2)
    prob = make_random_problems(key, batch=512, num_corr=3, rotation_deg=-1.0)
    Es, valid = solve_spherical_3pt(prob.u, prob.v)
    err = _best_candidate_errors(Es, valid, prob.E)
    ok_problems = jnp.all(prob.valid, axis=-1)
    err_ok = np.asarray(err)[np.asarray(ok_problems)]
    assert np.median(err_ok) < 1e-9


def test_3pt_nonminimal_sample():
    """Same code path must work for N>3 (used by RANSAC non-minimal refits)."""
    key = jax.random.PRNGKey(3)
    prob = make_random_problems(key, batch=64, num_corr=8, rotation_deg=4.0)
    Es, valid = solve_spherical_3pt(prob.u, prob.v)
    err = _best_candidate_errors(Es, valid, prob.E)
    ok_problems = jnp.all(prob.valid, axis=-1)
    err_ok = np.asarray(err)[np.asarray(ok_problems)]
    assert np.median(err_ok) < 1e-9


def test_3pt_noise_degrades_gracefully():
    key = jax.random.PRNGKey(4)
    # 1 px noise at focal 600.
    prob = make_random_problems(
        key, batch=256, num_corr=3, rotation_deg=5.0, point_noise=1.0 / 600.0
    )
    Es, valid = solve_spherical_3pt(prob.u, prob.v)
    err = _best_candidate_errors(Es, valid, prob.E)
    ok_problems = jnp.all(prob.valid, axis=-1)
    err_ok = np.asarray(err)[np.asarray(ok_problems)]
    assert np.median(err_ok) < 0.1  # loose: minimal sample + noise


def test_decompose_exact():
    rng = np.random.default_rng(5)
    axes = rng.normal(size=(100, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    r_gt = jnp.asarray(axes * rng.uniform(0.01, 1.2, size=(100, 1)))
    R_gt = so3_exp(r_gt)
    E = make_spherical_essential(R_gt)
    r, t = decompose_spherical_essential(E)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_gt), atol=1e-7)
    t_gt = np.asarray(R_gt)[:, :, 2] - np.array([0, 0, 1.0])
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-7)


def test_decompose_inward():
    rng = np.random.default_rng(6)
    axes = rng.normal(size=(50, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    r_gt = jnp.asarray(axes * rng.uniform(0.05, 1.0, size=(50, 1)))
    R_gt = so3_exp(r_gt)
    E = make_spherical_essential(R_gt, inward=True)
    r, t = decompose_spherical_essential(E, inward=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_gt), atol=1e-7)


def test_full_pipeline_solver_to_pose():
    """Solve + decompose end-to-end: recovered (R, t) matches ground truth."""
    key = jax.random.PRNGKey(7)
    prob = make_random_problems(key, batch=128, num_corr=3, rotation_deg=6.0)
    Es, valid = solve_spherical_3pt(prob.u, prob.v)
    err = frobenius_error(Es, prob.E[:, None, :, :])
    err = jnp.where(valid, err, jnp.inf)
    best = jnp.argmin(err, axis=-1)
    E_best = jnp.take_along_axis(Es, best[:, None, None, None], axis=1)[:, 0]
    r, t = decompose_spherical_essential(E_best)
    ok = np.asarray(jnp.all(prob.valid, axis=-1) & (jnp.min(err, axis=-1) < 1e-8))
    rot_err = np.asarray(rotation_error_deg(so3_exp(r), prob.R))[ok]
    trans_err = np.asarray(translation_angle_deg(t, prob.t))[ok]
    assert np.median(rot_err) < 1e-5
    assert np.median(trans_err) < 1e-4
