"""RANSAC engine tests: recovery under outliers + noise, triangulation.

Mirrors the reference's RANSAC-level synthetic tests
(evaluation/test_ransac.cpp: 100-correspondence problems, noise + outliers).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sphericalsfm_tpu.eval.synthetic import make_random_problems
from sphericalsfm_tpu.eval.metrics import rotation_error_deg, translation_angle_deg
from sphericalsfm_tpu.geometry import so3_exp
from sphericalsfm_tpu.ransac import (
    sample_tuples,
    spherical_ransac,
    triangulation_ransac,
)

FOCAL = 600.0


def _corrupt(key, prob, outlier_frac):
    """Replace a fraction of second-view rays with random junk."""
    n = prob.u.shape[-2]
    k1, k2 = jax.random.split(key)
    is_out = jax.random.uniform(k1, prob.u.shape[:-1]) < outlier_frac
    junk = jax.random.normal(k2, prob.v.shape) * 0.5
    junk = junk.at[..., 2].set(1.0)
    v = jnp.where(is_out[..., None], junk, prob.v)
    return prob._replace(v=v), is_out


def test_sample_tuples_distinct_and_valid():
    key = jax.random.PRNGKey(0)
    mask = jnp.arange(100) < 37
    idx = sample_tuples(key, mask, 500, 3)
    idx = np.asarray(idx)
    assert idx.max() < 37
    assert (idx[:, 0] != idx[:, 1]).all()
    assert (idx[:, 0] != idx[:, 2]).all()
    assert (idx[:, 1] != idx[:, 2]).all()


def test_sample_tuples_k2():
    key = jax.random.PRNGKey(1)
    mask = jnp.ones(10, bool)
    idx = np.asarray(sample_tuples(key, mask, 300, 2))
    assert (idx[:, 0] != idx[:, 1]).all()
    # All indices should get sampled.
    assert len(np.unique(idx)) == 10


def test_spherical_ransac_clean():
    key = jax.random.PRNGKey(2)
    prob = make_random_problems(key, batch=1, num_corr=100, rotation_deg=2.0,
                                point_noise=0.0)
    res = spherical_ransac(
        jax.random.PRNGKey(3),
        prob.u[0], prob.v[0], prob.valid[0],
        sq_thresh=(2.0 / FOCAL) ** 2, num_hypotheses=256,
    )
    rot_err = float(rotation_error_deg(so3_exp(res.r), prob.R[0]))
    assert rot_err < 0.01
    assert int(res.num_inliers) > 90


def test_spherical_ransac_outliers_noise():
    key = jax.random.PRNGKey(4)
    prob = make_random_problems(key, batch=1, num_corr=100, rotation_deg=2.0,
                                point_noise=1.0 / FOCAL)
    prob, is_out = _corrupt(jax.random.PRNGKey(5), prob, 0.3)
    res = spherical_ransac(
        jax.random.PRNGKey(6),
        prob.u[0], prob.v[0], prob.valid[0],
        sq_thresh=(2.0 / FOCAL) ** 2, num_hypotheses=1024,
    )
    rot_err = float(rotation_error_deg(so3_exp(res.r), prob.R[0]))
    trans_err = float(translation_angle_deg(res.t, prob.t[0]))
    assert rot_err < 0.5, rot_err
    assert trans_err < 5.0, trans_err
    # Most outliers rejected.
    n_out_kept = int(jnp.sum(res.inlier_mask & is_out[0]))
    assert n_out_kept < 5


def test_spherical_ransac_vmapped_pairs():
    """Many pairs at once — the pipeline's estimate_pairwise pattern."""
    key = jax.random.PRNGKey(7)
    B = 8
    prob = make_random_problems(key, batch=B, num_corr=60, rotation_deg=3.0,
                                point_noise=0.5 / FOCAL)
    keys = jax.random.split(jax.random.PRNGKey(8), B)
    res = jax.vmap(
        lambda k, u, v, m: spherical_ransac(
            k, u, v, m, sq_thresh=(2.0 / FOCAL) ** 2, num_hypotheses=256
        )
    )(keys, prob.u, prob.v, prob.valid)
    rot_errs = np.asarray(rotation_error_deg(so3_exp(res.r), prob.R))
    assert np.median(rot_errs) < 0.2


def test_triangulation_ransac():
    rng = np.random.default_rng(0)
    # Cameras on unit sphere looking outward-ish at a point at radius 7.
    T = 8
    X_gt = np.array([0.5, -0.3, 7.0])
    rs, ts, obs = [], [], []
    for i in range(T):
        r = rng.normal(size=3) * 0.1
        t = np.array([0.0, 0.0, -1.0]) + rng.normal(size=3) * 0.05
        R = np.asarray(so3_exp(jnp.asarray(r)))
        PX = R @ X_gt + t
        xy = FOCAL * PX[:2] / PX[2]
        rs.append(r); ts.append(t); obs.append(xy)
    rs = jnp.asarray(rs); ts = jnp.asarray(ts); obs = jnp.asarray(obs)
    # Corrupt two observations, pad two slots invalid.
    obs = obs.at[3].add(50.0).at[5].add(-80.0)
    mask = jnp.ones(T, bool).at[6].set(False).at[7].set(False)
    res = triangulation_ransac(
        jax.random.PRNGKey(0), rs, ts, obs, mask, jnp.asarray(FOCAL),
        sq_thresh=4.0, num_hypotheses=32,
    )
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.X), X_gt, atol=1e-5)
    assert int(res.num_inliers) == 4  # 6 valid − 2 corrupted


def test_triangulate_midpoint_exact():
    """Noise-free rays from any number of views intersect exactly at the
    point — the closed-form hypothesis generator must recover it to f32
    precision (it feeds every RANSAC hypothesis, so a bias here would shift
    the whole consensus set)."""
    from sphericalsfm_tpu.ransac.triangulation import triangulate_midpoint

    rng = np.random.default_rng(3)
    X_gt = np.array([1.2, -0.4, 6.5])
    for V in (2, 3, 8):
        rs, ts, obs = [], [], []
        for _ in range(V):
            r = rng.normal(size=3) * 0.2
            t = np.array([0.0, 0.0, -1.0]) + rng.normal(size=3) * 0.1
            R = np.asarray(so3_exp(jnp.asarray(r)))
            PX = R @ X_gt + t
            rs.append(R); ts.append(t); obs.append(FOCAL * PX[:2] / PX[2])
        X = triangulate_midpoint(
            jnp.asarray(np.stack(rs)), jnp.asarray(np.stack(ts)),
            jnp.asarray(np.stack(obs)), jnp.asarray(FOCAL),
        )
        np.testing.assert_allclose(np.asarray(X), X_gt, atol=1e-4)


def test_triangulation_ransac_too_few():
    rs = jnp.zeros((4, 3)); ts = jnp.zeros((4, 3)).at[:, 2].set(-1.0)
    obs = jnp.zeros((4, 2))
    mask = jnp.array([True, True, False, False])
    res = triangulation_ransac(
        jax.random.PRNGKey(0), rs, ts, obs, mask, jnp.asarray(FOCAL)
    )
    assert not bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.X), 0.0)


def test_spherical_ransac_adaptive_matches_static():
    """Adaptive round-based termination (RansacLib bound, VERDICT item 3)
    reaches the same accuracy as the static full-budget engine, on clean and
    30%-outlier problems."""
    from sphericalsfm_tpu.ransac.spherical import spherical_ransac_adaptive

    B = 12
    prob = make_random_problems(
        jax.random.PRNGKey(5), batch=B, num_corr=128, rotation_deg=3.0,
        point_noise=1.0 / FOCAL,
    )
    prob_o, is_out = _corrupt(jax.random.PRNGKey(6), prob, 0.3)
    sq_thresh = jnp.asarray((2.0 / FOCAL) ** 2)
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    for pr in (prob, prob_o):
        res_s = jax.vmap(
            lambda k, uu, vv, mm: spherical_ransac(
                k, uu, vv, mm, sq_thresh=sq_thresh, num_hypotheses=1024,
            )
        )(keys, pr.u, pr.v, pr.valid)
        res_a = jax.vmap(
            lambda k, uu, vv, mm: spherical_ransac_adaptive(
                k, uu, vv, mm, sq_thresh=sq_thresh, round_size=128,
                max_rounds=8,
            )
        )(keys, pr.u, pr.v, pr.valid)
        err_s = np.median(np.asarray(rotation_error_deg(so3_exp(res_s.r), pr.R)))
        err_a = np.median(np.asarray(rotation_error_deg(so3_exp(res_a.r), pr.R)))
        assert err_a < max(2 * err_s, 0.2), (err_a, err_s)
        # inlier recovery comparable
        assert np.median(np.asarray(res_a.num_inliers)) > 0.8 * np.median(
            np.asarray(res_s.num_inliers)
        )


def test_adaptive_termination_bound():
    """At ~100% inliers one 128-hypothesis round satisfies the 0.99-confidence
    bound; the estimate must already be tight (indirect early-exit check:
    round 1 output is final because the bound says stop)."""
    from sphericalsfm_tpu.ransac.spherical import spherical_ransac_adaptive

    prob = make_random_problems(
        jax.random.PRNGKey(8), batch=4, num_corr=128, rotation_deg=3.0,
        point_noise=0.2 / FOCAL,
    )
    keys = jax.random.split(jax.random.PRNGKey(9), 4)
    res = jax.vmap(
        lambda k, uu, vv, mm: spherical_ransac_adaptive(
            k, uu, vv, mm, sq_thresh=jnp.asarray((2.0 / FOCAL) ** 2),
            round_size=128, max_rounds=1,  # forced single round
        )
    )(keys, prob.u, prob.v, prob.valid)
    errs = np.asarray(rotation_error_deg(so3_exp(res.r), prob.R))
    assert np.median(errs) < 0.2, errs
