"""6-pt shared-focal solver tests (T12 capability parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from sphericalsfm_tpu.eval.metrics import frobenius_error
from sphericalsfm_tpu.solvers.shared_focal import solve_shared_focal_6pt
from tests.test_five_point import _general_problems


def _to_nominal(x, f_true):
    x = np.asarray(x).copy()
    x[..., :2] *= f_true
    return jnp.asarray(x)


def test_shared_focal_recovers_focal_and_E():
    f_true = 1.3
    u, v, E_gt, R, t, good = _general_problems(0, 16, 6)
    Es, valid, f_est = solve_shared_focal_6pt(
        _to_nominal(u, f_true), _to_nominal(v, f_true)
    )
    ok = np.asarray(good).all(-1)
    err = jnp.where(valid, frobenius_error(Es, E_gt[:, None]), jnp.inf)
    best = np.asarray(jnp.argmin(err, -1))
    best_err = np.asarray(jnp.min(err, -1))
    f_best = np.asarray(f_est)[np.arange(len(best)), best]
    # The minimal problem has up to 15 solutions; the candidate matching GT
    # must be present and accurate for most problems.
    assert np.median(best_err[ok]) < 0.01, np.median(best_err[ok])
    assert np.median(np.abs(f_best[ok] - f_true) / f_true) < 0.01


def test_shared_focal_wide_range():
    """Recovery across a range of true focal multipliers."""
    for f_true in (0.6, 1.0, 2.0):
        u, v, E_gt, R, t, good = _general_problems(int(f_true * 10), 8, 6)
        Es, valid, f_est = solve_shared_focal_6pt(
            _to_nominal(u, f_true), _to_nominal(v, f_true)
        )
        ok = np.asarray(good).all(-1)
        err = jnp.where(valid, frobenius_error(Es, E_gt[:, None]), jnp.inf)
        best = np.asarray(jnp.argmin(err, -1))
        f_best = np.asarray(f_est)[np.arange(len(best)), best]
        med = np.median(np.abs(f_best[ok] - f_true) / f_true)
        assert med < 0.05, (f_true, med)
