"""Solver/RANSAC experiment harness — the reference's evaluation suite.

Capability parity with /root/reference/evaluation/scripts/
(run_noise_experiment, run_stability_experiment, run_timings_experiment,
run_ransac_experiment and their plotters): noise-response curves, zero-noise
numerical-stability distributions, per-solve timings, and full-RANSAC
accuracy sweeps, written as CSV artifacts (plus optional matplotlib plots).
The reference shells out to C++ binaries under OpenMP; here each sweep is a
batched jitted evaluation.
"""

from __future__ import annotations

import csv
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry.so3 import so3_exp
from ..ransac.spherical import spherical_ransac
from ..solvers.spherical import solve_spherical_3pt
from .metrics import frobenius_error, rotation_error_deg, translation_angle_deg
from .synthetic import make_random_problems

FOCAL = 600.0


def _best_errors(Es, valid, prob):
    frob = jnp.where(valid, frobenius_error(Es, prob.E[:, None]), jnp.inf)
    best = jnp.argmin(frob, axis=-1)
    E_best = jnp.take_along_axis(Es, best[:, None, None, None], 1)[:, 0]
    from ..geometry.essential import decompose_spherical_essential

    r, t = decompose_spherical_essential(E_best)
    return (
        np.asarray(jnp.min(frob, -1)),
        np.asarray(rotation_error_deg(so3_exp(r), prob.R)),
        np.asarray(translation_angle_deg(t, prob.t)),
        np.asarray(jnp.all(prob.valid, -1)),
    )


def noise_experiment(
    out_csv: str,
    noises_px=(0.0, 0.5, 1.0, 2.0, 3.0, 5.0, 10.0),
    trials: int = 10000,
    rotation_deg: float = -1.0,
    inward: bool = False,
    seed: int = 0,
):
    """Median solver errors vs pixel noise (run_noise_experiment.py parity)."""
    solve = jax.jit(solve_spherical_3pt)
    rows = []
    for i, noise in enumerate(noises_px):
        prob = make_random_problems(
            jax.random.PRNGKey(seed + i), batch=trials, num_corr=3,
            inward=inward, rotation_deg=rotation_deg,
            point_noise=noise / FOCAL,
        )
        frob, rot, trans, ok = _best_errors(*solve(prob.u, prob.v), prob)
        rows.append({
            "noise_px": noise,
            "median_frob": float(np.median(frob[ok])),
            "median_rot_deg": float(np.median(rot[ok])),
            "median_trans_deg": float(np.median(trans[ok])),
        })
    _write_csv(out_csv, rows)
    return rows


def stability_experiment(out_csv: str, trials: int = 10000, seed: int = 1):
    """Zero-noise log10 Frobenius error distribution
    (run_stability_experiment.py parity: the KDE input data)."""
    prob = make_random_problems(
        jax.random.PRNGKey(seed), batch=trials, num_corr=3, rotation_deg=-1.0
    )
    Es, valid = jax.jit(solve_spherical_3pt)(prob.u, prob.v)
    frob, _, _, ok = _best_errors(Es, valid, prob)
    vals = np.log10(np.maximum(frob[ok], 1e-300))
    rows = [{"log10_frob": float(v)} for v in vals]
    _write_csv(out_csv, rows)
    return {
        "median": float(np.median(vals)),
        "q95": float(np.quantile(vals, 0.95)),
    }


def timing_experiment(out_csv: str, batch: int = 4096, reps: int = 20, seed: int = 2):
    """Mean per-solve latency (run_timings_experiment.py parity)."""
    prob = make_random_problems(
        jax.random.PRNGKey(seed), batch=batch, num_corr=3, rotation_deg=5.0
    )
    solve = jax.jit(solve_spherical_3pt)
    Es, _ = solve(prob.u, prob.v)
    Es.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        Es, _ = solve(prob.u, prob.v)
    Es.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    rows = [{
        "solver": "spherical_3pt_batched",
        "batch": batch,
        "mean_us_per_solve": 1e6 * dt / batch,
        "solves_per_s": batch / dt,
    }]
    _write_csv(out_csv, rows)
    return rows[0]


def ransac_experiment(
    out_csv: str,
    trials: int = 200,
    num_corr: int = 100,
    rotation_deg: float = 2.0,
    noise_px: float = 1.0,
    outlier_frac: float = 0.0,
    num_hypotheses: int = 512,
    seed: int = 3,
):
    """Full-RANSAC accuracy (test_ransac.cpp / run_ransac_experiment parity)."""
    prob = make_random_problems(
        jax.random.PRNGKey(seed), batch=trials, num_corr=num_corr,
        rotation_deg=rotation_deg, point_noise=noise_px / FOCAL,
    )
    v = prob.v
    if outlier_frac > 0:
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
        is_out = jax.random.uniform(k1, prob.u.shape[:-1]) < outlier_frac
        junk = jax.random.normal(k2, v.shape) * 0.5
        junk = junk.at[..., 2].set(1.0)
        v = jnp.where(is_out[..., None], junk, v)

    run = jax.jit(
        jax.vmap(
            lambda k, uu, vv, mm: spherical_ransac(
                k, uu, vv, mm, sq_thresh=jnp.asarray((2.0 / FOCAL) ** 2),
                num_hypotheses=num_hypotheses,
            )
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(seed + 2), trials)
    res = run(keys, prob.u, v, prob.valid)
    rot = np.asarray(rotation_error_deg(so3_exp(res.r), prob.R))
    trans = np.asarray(translation_angle_deg(res.t, prob.t))
    rows = [{
        "noise_px": noise_px,
        "outlier_frac": outlier_frac,
        "median_rot_deg": float(np.median(rot)),
        "median_trans_deg": float(np.median(trans)),
        "mean_inliers": float(np.mean(np.asarray(res.num_inliers))),
    }]
    _write_csv(out_csv, rows)
    return rows[0]


def relpose_comparison(
    out_csv: str,
    angles_deg=(0.5, 1.0, 2.0, 5.0, 10.0),
    noises_px=(0.0, 1.0, 2.0),
    trials: int = 1000,
    seed: int = 5,
):
    """Spherical 3-pt vs general 5-pt accuracy over an angle × noise grid —
    the reference's test_spherical_relpose comparison benchmark
    (examples/test_spherical_relpose.cpp:596-631), as one CSV.

    The 5-pt eig path prefers a CPU backend (auto-dispatches a QR
    eigensolver elsewhere); the 7-pt (det-cubic) and 8-pt (DLT) baselines
    match the reference's `sevenpt`/`eightpt` comparison columns
    (test_spherical_relpose.cpp:596-631)."""
    from ..solvers.eight_point import solve_essential_8pt
    from ..solvers.five_point import solve_essential_5pt
    from ..solvers.seven_point import solve_essential_7pt

    solve3 = jax.jit(solve_spherical_3pt)
    solve5 = jax.jit(solve_essential_5pt)
    solve7 = jax.jit(solve_essential_7pt)
    solve8 = jax.jit(solve_essential_8pt)
    rows = []
    for a_i, angle in enumerate(angles_deg):
        for n_i, noise in enumerate(noises_px):
            prob = make_random_problems(
                jax.random.PRNGKey(seed + 100 * a_i + n_i), batch=trials,
                num_corr=8, rotation_deg=angle, point_noise=noise / FOCAL,
            )
            ok = np.asarray(jnp.all(prob.valid, -1))

            Es3, v3 = solve3(prob.u[:, :3], prob.v[:, :3])
            f3 = jnp.where(v3, frobenius_error(Es3, prob.E[:, None]), jnp.inf)
            med3 = float(np.median(np.asarray(jnp.min(f3, -1))[ok]))

            Es5, v5 = solve5(prob.u[:, :5], prob.v[:, :5])
            f5 = jnp.where(v5, frobenius_error(Es5, prob.E[:, None]), jnp.inf)
            med5 = float(np.median(np.asarray(jnp.min(f5, -1))[ok]))

            Es7, v7 = solve7(prob.u[:, :7], prob.v[:, :7])
            f7 = jnp.where(v7, frobenius_error(Es7, prob.E[:, None]), jnp.inf)
            med7 = float(np.median(np.asarray(jnp.min(f7, -1))[ok]))

            Es8, v8 = solve8(prob.u, prob.v)
            f8 = jnp.where(v8, frobenius_error(Es8, prob.E), jnp.inf)
            med8 = float(np.median(np.asarray(f8)[ok]))

            rows.append({
                "rotation_deg": angle, "noise_px": noise,
                "median_frob_spherical_3pt": med3,
                "median_frob_general_5pt": med5,
                "median_frob_sevenpt": med7,
                "median_frob_normalized_8pt": med8,
            })
    _write_csv(out_csv, rows)
    return rows


def _write_csv(path: str, rows):
    if not rows:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
