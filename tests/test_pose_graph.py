"""Rotation averaging, uncalibrated pose graph and focal search tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sphericalsfm_tpu.geometry import (
    make_spherical_essential,
    so3_exp,
    so3_log,
    conjugate_essential_by_focal,
)
from sphericalsfm_tpu.eval.metrics import rotation_error_deg
from sphericalsfm_tpu.optim.pose_graph import (
    RotationGraph,
    decompose_rotation_xy_z,
    find_best_focal_random,
    initialize_rotations_sequential,
    loop_constraint_costs,
    optimize_rotations,
    optimize_rotations_and_focal,
    pose_graph_cost,
    warp_thetaxy,
)


def _circle_rotations(n, loop_fraction=1.0):
    """Ground-truth rotations of a circular spherical capture about y."""
    phi = np.arange(n) * 2 * np.pi * loop_fraction / n
    return np.stack([np.zeros(n), phi, np.zeros(n)], -1)


def _graph_from_gt(r_gt, noise=0.0, seed=0, extra_edges=()):
    """Adjacent chain + given extra (loop-closure) edges."""
    rng = np.random.default_rng(seed)
    n = r_gt.shape[0]
    R = np.asarray(so3_exp(jnp.asarray(r_gt)))
    ei, ej, rm = [], [], []
    pairs = [(i, i + 1) for i in range(n - 1)] + list(extra_edges)
    for i, j in pairs:
        Rij = R[j] @ R[i].T
        if noise > 0:
            pert = rng.normal(size=3) * noise
            Rij = np.asarray(so3_exp(jnp.asarray(pert))) @ Rij
        ei.append(i)
        ej.append(j)
        rm.append(np.asarray(so3_log(jnp.asarray(Rij))))
    return RotationGraph(
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        r_meas=jnp.asarray(np.stack(rm)),
        edge_w=jnp.ones(len(ei)),
    )


def test_sequential_init_exact():
    r_gt = _circle_rotations(12, 0.5)
    g = _graph_from_gt(r_gt)
    rots = initialize_rotations_sequential(12, g)
    errs = np.asarray(rotation_error_deg(so3_exp(rots), so3_exp(jnp.asarray(r_gt))))
    np.testing.assert_allclose(errs, 0.0, atol=1e-8)


def test_pose_graph_cost_zero_at_gt():
    r_gt = _circle_rotations(10, 0.8)
    g = _graph_from_gt(r_gt, extra_edges=[(0, 9), (1, 8)])
    cost = float(pose_graph_cost(jnp.asarray(r_gt), g))
    assert cost < 1e-16


def test_rotation_averaging_denoises_with_loop_closure():
    n = 16
    r_gt = _circle_rotations(n, 1.0)
    g = _graph_from_gt(r_gt, noise=0.01, seed=1,
                       extra_edges=[(0, n - 1), (0, n - 2), (1, n - 1)])
    init = initialize_rotations_sequential(n, g)
    # drift before averaging
    init_err = np.asarray(
        rotation_error_deg(so3_exp(init), so3_exp(jnp.asarray(r_gt)))
    )
    rots, cost = optimize_rotations(init, g)
    final_err = np.asarray(
        rotation_error_deg(so3_exp(rots), so3_exp(jnp.asarray(r_gt)))
    )
    assert final_err.max() < init_err.max()
    # The optimum must fit the noisy measurements at least as well as GT does
    # (the solution is the MAP estimate, not GT itself).
    assert float(cost) <= float(pose_graph_cost(jnp.asarray(r_gt), g))
    assert final_err.max() < 4.0  # estimation error at 0.57°/link noise


def test_decompose_rotation_xy_z_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(10):
        axis = rng.normal(size=3)
        axis[2] *= 0.3
        axis /= np.linalg.norm(axis)
        r = jnp.asarray(axis * rng.uniform(0.05, 0.8))
        R = so3_exp(r)
        rx, ry, txy, tz = decompose_rotation_xy_z(R)
        Rxy = so3_exp(jnp.asarray([txy * rx, txy * ry, 0.0]))
        Rz = so3_exp(jnp.asarray([0.0, 0.0, tz]))
        np.testing.assert_allclose(np.asarray(Rxy @ Rz), np.asarray(R), atol=1e-9)


def test_warp_thetaxy_identity_at_f1():
    t = jnp.linspace(0.01, 1.5, 20)
    np.testing.assert_allclose(np.asarray(warp_thetaxy(t, 1.0)), np.asarray(t),
                               atol=1e-12)


def _uncalib_setup(n=14, f_true=480.0, f_guess=600.0, seed=3):
    """Pairwise E estimated at the wrong focal: lift GT E to pixel space at
    f_true, then normalize by f_guess — exactly the situation of the
    uncalibrated pipeline."""
    r_gt = _circle_rotations(n, 1.0)
    R = np.asarray(so3_exp(jnp.asarray(r_gt)))
    pairs = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1), (1, n - 1), (0, n - 2)]
    ei = jnp.asarray([p[0] for p in pairs], jnp.int32)
    ej = jnp.asarray([p[1] for p in pairs], jnp.int32)
    E_true = make_spherical_essential(
        jnp.asarray(np.stack([R[j] @ R[i].T for i, j in pairs]))
    )
    # E in normalized coords at f_true; measured rays were pixels/f_guess =
    # (f_true/f_guess)·x_true in the image plane, so the measured E satisfies
    # E_meas = diag(s,s,1)·E·diag(s,s,1) with s = f_guess/f_true (then the
    # hypothesis transform conj(·, f/f_guess) recovers E_true at f = f_true).
    E_meas = conjugate_essential_by_focal(E_true, f_guess / f_true)
    E_meas = E_meas / jnp.linalg.norm(E_meas, axis=(-2, -1), keepdims=True)
    return r_gt, ei, ej, E_meas, f_true, f_guess, n


def test_focal_search_finds_true_focal():
    r_gt, ei, ej, E_meas, f_true, f_guess, n = _uncalib_setup()
    w = jnp.ones(ei.shape[0])
    best, costs, focals = find_best_focal_random(
        jax.random.PRNGKey(0), f_guess, E_meas, ei, ej, w, n,
        min_focal=f_guess / 4, max_focal=f_guess * 2, num_trials=512,
    )
    assert abs(float(best) - f_true) / f_true < 0.05, float(best)


def test_joint_focal_rotation_optimization():
    r_gt, ei, ej, E_meas, f_true, f_guess, n = _uncalib_setup()
    w = jnp.ones(ei.shape[0])
    # start from a coarse focal (10% off) like the search output
    from sphericalsfm_tpu.optim.pose_graph import rotations_at_focal

    f0 = f_true * 1.1
    r_meas = rotations_at_focal(E_meas, f0 / f_guess)
    g = RotationGraph(ei, ej, r_meas, w)
    rots0 = initialize_rotations_sequential(n, g)
    # Optimizing the *multiplier* on top of f0 requires re-warping the
    # decomposed measurement; edge data comes from r_meas at f0.
    rots, fmult, cost = optimize_rotations_and_focal(
        rots0, g, jnp.asarray(1.0), jnp.asarray(0.25), jnp.asarray(4.0),
    )
    f_est = f0 * float(fmult)
    assert abs(f_est - f_true) / f_true < 0.02, f_est
    errs = np.asarray(rotation_error_deg(so3_exp(rots), so3_exp(jnp.asarray(r_gt))))
    assert errs.max() < 1.0, errs.max()


def _drop_edge(g: RotationGraph, i: int, j: int) -> RotationGraph:
    ei = np.asarray(g.edge_i)
    ej = np.asarray(g.edge_j)
    w = np.asarray(g.edge_w).copy()
    w[(ei == i) & (ej == j)] = 0.0
    return g._replace(edge_w=jnp.asarray(w))


def test_global_init_survives_broken_chain():
    """VERDICT item 2: drop an adjacent edge — the sequential chain breaks
    (identity from the gap on), the spanning-tree global init recovers the
    trajectory through the redundant skip edges."""
    from sphericalsfm_tpu.optim.pose_graph import initialize_rotations_global

    n = 16
    r_gt = _circle_rotations(n, 0.5)
    skips = [(i, i + 2) for i in range(n - 2)]
    g = _graph_from_gt(r_gt, extra_edges=skips)
    g = _drop_edge(g, 7, 8)  # break the adjacent chain mid-way

    R_gt = so3_exp(jnp.asarray(r_gt))

    seq = initialize_rotations_sequential(n, g)
    errs_seq = np.asarray(rotation_error_deg(so3_exp(seq), R_gt))
    assert errs_seq.max() > 5.0  # chain is broken: large error downstream

    glob = initialize_rotations_global(n, g)
    errs_glob = np.asarray(rotation_error_deg(so3_exp(glob), R_gt))
    assert errs_glob.max() < 1e-6, errs_glob

    # robust refinement stays at the optimum
    rots, cost = optimize_rotations(glob, g)
    errs = np.asarray(rotation_error_deg(so3_exp(rots), R_gt))
    assert errs.max() < 1e-6


def test_global_init_weights_prefer_heavy_edges():
    """Tree follows the heavier (more-inlier) edges when both exist."""
    from sphericalsfm_tpu.optim.pose_graph import (
        build_spanning_tree, initialize_rotations_global,
    )

    n = 8
    r_gt = _circle_rotations(n)
    skips = [(i, i + 2) for i in range(n - 2)]
    g = _graph_from_gt(r_gt, extra_edges=skips)
    E = len(np.asarray(g.edge_i))
    weights = np.ones(E)
    weights[: n - 1] = 100.0  # adjacent edges heaviest
    parent, eidx, sign = build_spanning_tree(
        n, np.asarray(g.edge_i), np.asarray(g.edge_j), weights
    )
    # with adjacent edges heaviest the tree must be the chain
    assert list(parent[1:]) == list(range(n - 1))
    glob = initialize_rotations_global(n, g, weights=weights)
    errs = np.asarray(rotation_error_deg(so3_exp(glob), so3_exp(jnp.asarray(r_gt))))
    assert errs.max() < 1e-6


def test_focal_search_global_init_matches_sequential():
    """Focal search under the spanning-tree init agrees with the sequential
    path on an intact graph (reference dispatcher parity,
    spherical_sfm_tools.cpp:1133-1140)."""
    focal_true, focal_guess = 500.0, 420.0
    n = 14
    r_gt = _circle_rotations(n)
    g = _graph_from_gt(r_gt, extra_edges=[(0, n - 1), (1, n - 2)])
    E_true = make_spherical_essential(so3_exp(jnp.asarray(g.r_meas)))
    # E as estimated at the wrong focal guess: conjugate by f0/f_true
    E_obs = conjugate_essential_by_focal(E_true, focal_guess / focal_true)

    out = {}
    for name, seq in (("seq", True), ("glob", False)):
        best, costs, focals = find_best_focal_random(
            jax.random.PRNGKey(0), focal_guess, E_obs,
            g.edge_i, g.edge_j, g.edge_w, n,
            min_focal=focal_guess / 4, max_focal=focal_guess * 2,
            num_trials=256, sequential=seq,
        )
        out[name] = float(best)
    assert abs(out["seq"] - out["glob"]) / out["seq"] < 0.02, out
    assert abs(out["glob"] - focal_true) / focal_true < 0.1, out


def test_focal_grid_and_bracketed_agree_with_random():
    """Strategy parity (reference find_best_focal_length_{grid,opt},
    spherical_sfm_tools.cpp:1191-1416): all three searches find the true
    focal on the synthetic uncalibrated setup."""
    from sphericalsfm_tpu.optim.pose_graph import (
        find_best_focal_bracketed, find_best_focal_grid,
    )

    r_gt, ei, ej, E_meas, f_true, f_guess, n = _uncalib_setup()
    w = jnp.ones(ei.shape[0])
    args = (E_meas, ei, ej, w, n)
    kw = dict(min_focal=f_guess / 4, max_focal=f_guess * 2)

    best_r, _, _ = find_best_focal_random(
        jax.random.PRNGKey(0), f_guess, *args, num_trials=512, **kw
    )
    best_g, costs_g, focals_g = find_best_focal_grid(
        f_guess, *args, num_steps=128, **kw
    )
    # The wide-bounds landscape has a second shallow basin near 2·f_true
    # (the reason the reference driver defaults to random search); the
    # bracketed strategy is exercised with bounds that isolate the true
    # basin, like the reference's "try increasing focal bounds" guidance
    # implies the user tunes them.
    best_o, ok = find_best_focal_bracketed(
        jax.random.PRNGKey(1), f_guess, *args,
        min_focal=f_guess / 4, max_focal=f_guess * 1.4,
    )
    assert ok
    for name, best in (("random", best_r), ("grid", best_g), ("opt", best_o)):
        assert abs(float(best) - f_true) / f_true < 0.06, (name, float(best))
    # grid resolution bound: best within one step of the random optimum
    step = (f_guess * 2 - f_guess / 4) / 127
    assert abs(float(best_g) - float(best_r)) < 3 * step


def test_total_rotation_cost_minimized_at_true_focal():
    """total_rotation_cost_fn parity (spherical_sfm_tools.cpp:1084-1116):
    |2π − Σ‖rel rot‖| dips at the true focal on a closed-loop capture."""
    from sphericalsfm_tpu.optim.pose_graph import total_rotation_costs

    r_gt, ei, ej, E_meas, f_true, f_guess, n = _uncalib_setup()
    w = jnp.ones(ei.shape[0])
    focals = jnp.linspace(f_guess / 4, f_guess * 2, 201)
    costs = np.asarray(total_rotation_costs(
        focals, jnp.asarray(float(f_guess)), E_meas, ei, ej, w, n
    ))
    best = float(focals[int(np.nanargmin(costs))])
    # The consecutive-link sum spans (n−1)/n of the circle, so the 2π target
    # biases the optimum high by ~1/n — inherent to the reference's cost
    # definition (it refines with run_optimization afterwards).
    assert abs(best - f_true) / f_true < 0.1, best
    # and the grid strategy accepts the alternative cost
    from sphericalsfm_tpu.optim.pose_graph import find_best_focal_grid

    best_g, _, _ = find_best_focal_grid(
        f_guess, E_meas, ei, ej, w, n, min_focal=f_guess / 4,
        max_focal=f_guess * 2, num_steps=128, cost="total_rotation",
    )
    assert abs(float(best_g) - f_true) / f_true < 0.1, float(best_g)


def test_pose_graph_pcg_matches_dense():
    """The scatter-free segment-sum PCG solver reaches the same optimum as
    the dense solve on both the calibrated and the joint-focal pose graph."""
    n = 16
    r_gt = _circle_rotations(n, 1.0)
    g = _graph_from_gt(r_gt, noise=0.01, seed=1,
                       extra_edges=[(0, n - 1), (0, n - 2), (1, n - 1)])
    init = initialize_rotations_sequential(n, g)
    rots_d, cost_d = optimize_rotations(init, g, solver="dense")
    rots_p, cost_p = optimize_rotations(init, g, solver="pcg")
    np.testing.assert_allclose(float(cost_p), float(cost_d), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(rots_p), np.asarray(rots_d),
                               atol=1e-6)

    # joint rotations + focal
    r_gt2, ei, ej, E_meas, f_true, f_guess, n2 = _uncalib_setup()
    from sphericalsfm_tpu.optim.pose_graph import rotations_at_focal

    f0 = f_true * 1.1
    r_meas = rotations_at_focal(E_meas, f0 / f_guess)
    g2 = RotationGraph(ei, ej, r_meas, jnp.ones(ei.shape[0]))
    rots0 = initialize_rotations_sequential(n2, g2)
    outs = {}
    for s in ("dense", "pcg"):
        rots, fmult, cost = optimize_rotations_and_focal(
            rots0, g2, jnp.asarray(1.0), jnp.asarray(0.25), jnp.asarray(4.0),
            solver=s,
        )
        outs[s] = (float(f0 * fmult), float(cost))
    assert abs(outs["pcg"][0] - outs["dense"][0]) / f_true < 1e-3, outs
    assert abs(outs["pcg"][0] - f_true) / f_true < 0.02, outs


def test_pose_graph_pcg_auto_at_scale():
    """auto switches to pcg above 400 frames and converges on a 500-frame
    ring with loop closures (no O(N²) dense system, no scatters)."""
    n = 500
    r_gt = _circle_rotations(n, 1.0)
    loops = [(i, (i + n // 2) % n) for i in range(0, n, 50)]
    loops = [(min(a, b), max(a, b)) for a, b in loops if abs(a - b) > 1]
    g = _graph_from_gt(r_gt, noise=0.005, seed=2, extra_edges=loops)
    init = initialize_rotations_sequential(n, g)
    rots, cost = optimize_rotations(init, g, max_iters=30)  # auto → pcg
    rots_d, cost_d = optimize_rotations(init, g, max_iters=30, solver="dense")
    init_errs = np.asarray(
        rotation_error_deg(so3_exp(init), so3_exp(jnp.asarray(r_gt)))
    )
    errs = np.asarray(rotation_error_deg(so3_exp(rots), so3_exp(jnp.asarray(r_gt))))
    assert errs.max() < init_errs.max()
    # pcg must land at the dense optimum (the MAP estimate, not GT)
    np.testing.assert_allclose(float(cost), float(cost_d), rtol=1e-4)
    d = np.asarray(rotation_error_deg(so3_exp(rots), so3_exp(rots_d)))
    assert d.max() < 0.1, d.max()
