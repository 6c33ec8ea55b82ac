"""Bundle adjustment: Levenberg–Marquardt with Schur-complement elimination.

The TPU-native replacement for the reference's Ceres SPARSE_SCHUR solve
(/root/reference/src/sfm.cpp:194-290): reprojection residuals
e = f·π(R(r)X + t) − uv with Cauchy(1.0) robust loss, per-parameter freeze
masks (focal / rotation / translation / point — sfm.h:33-36), trust-region LM
with 2000-iteration cap, and the camera/point Schur structure:

  per-point 3×3 Hessian blocks → batched inverse
  reduced camera system S = Hcc − W Hpp⁻¹ Wᵀ → dense Cholesky
  point back-substitution — all segment-sums and batched einsums.

Static-shape data model: observation table (camera index, point index, uv,
weight) plus a per-point padded track table bucketing observations by point,
so the whole Schur reduction is one fused kernel with no data-dependent
shapes. Camera parameter order per camera is [t(3), r(3)] matching the
reference's Camera = t∥r layout (sfm_types.h:9), with the shared focal as one
trailing parameter.

Works in float64 (CPU, exact parity testing) and float32 (TPU path, with
Jacobi equilibration of the reduced system).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.so3 import so3_exp
from .lm import cauchy_rho, cauchy_weight


class BAProblem(NamedTuple):
    """Static-shape bundle-adjustment problem.

    C cameras, P points, K observations, Tmax = max track length.
    """

    focal: jnp.ndarray        # scalar
    cam_t: jnp.ndarray        # (C, 3)
    cam_r: jnp.ndarray        # (C, 3)
    points: jnp.ndarray       # (P, 3)
    obs_cam: jnp.ndarray      # (K,) int32 camera index per observation
    obs_pt: jnp.ndarray       # (K,) int32 point index per observation
    obs_uv: jnp.ndarray       # (K, 2) principal-point-centered pixels
    obs_w: jnp.ndarray        # (K,) weight (0 = padding / disabled)
    track_obs: jnp.ndarray    # (P, Tmax) int32 obs indices per point (clamped)
    track_mask: jnp.ndarray   # (P, Tmax) validity
    focal_fixed: jnp.ndarray  # scalar bool
    rot_fixed: jnp.ndarray    # (C,) bool
    trans_fixed: jnp.ndarray  # (C,) bool
    point_fixed: jnp.ndarray  # (P,) bool


class BAResult(NamedTuple):
    focal: jnp.ndarray
    cam_t: jnp.ndarray
    cam_r: jnp.ndarray
    points: jnp.ndarray
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray


def _residuals(focal, cam_t, cam_r, points, p: BAProblem):
    """(K, 2) reprojection residuals of the current state."""
    R = so3_exp(cam_r[p.obs_cam])           # (K, 3, 3)
    X = points[p.obs_pt]                     # (K, 3)
    px = jnp.einsum("kij,kj->ki", R, X) + cam_t[p.obs_cam]
    z = px[..., 2]
    z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    proj = focal * px[..., :2] / z[..., None]
    return proj - p.obs_uv


def ba_cost(focal, cam_t, cam_r, points, p: BAProblem, loss_scale=1.0):
    """Robust total cost: Σ w · ½·rho(‖e‖²) with Cauchy loss (sfm.cpp:196)."""
    e = _residuals(focal, cam_t, cam_r, points, p)
    s = jnp.sum(e * e, axis=-1)
    return 0.5 * jnp.sum(p.obs_w * cauchy_rho(s, loss_scale))


def _per_obs_jacobians(focal, cam_t, cam_r, points, p: BAProblem):
    """Residuals and Jacobian blocks per observation.

    Returns e (K,2), Jf (K,2,1), Jc (K,2,6) [t then r], Jx (K,2,3), computed
    by forward-mode autodiff of the single-observation projection — exactly
    consistent with Ceres's autodiff of the same cost (sfm.cpp:30-66), with
    the raw-angle-axis parameterization (no local manifold), matching the
    reference.
    """

    def one(f, t, r, X, uv):
        Rm = so3_exp(r)
        px = Rm @ X + t
        z = jnp.where(jnp.abs(px[2]) > 1e-12, px[2], 1e-12)
        return f * px[:2] / z - uv

    # jacfwd over a 10-vector [f, t(3), r(3), X(3)] in one pass.
    def packed(theta, uv):
        f = theta[0]
        t = theta[1:4]
        r = theta[4:7]
        X = theta[7:10]
        return one(f, t, r, X, uv)

    thetas = jnp.concatenate(
        [
            jnp.broadcast_to(focal, (p.obs_cam.shape[0], 1)),
            cam_t[p.obs_cam],
            cam_r[p.obs_cam],
            points[p.obs_pt],
        ],
        axis=-1,
    )  # (K, 10)
    e = jax.vmap(packed)(thetas, p.obs_uv)
    J = jax.vmap(jax.jacfwd(packed))(thetas, p.obs_uv)  # (K, 2, 10)
    Jf = J[:, :, 0:1]
    Jc = J[:, :, 1:7]
    Jx = J[:, :, 7:10]
    return e, Jf, Jc, Jx


def _schur_solve(
    e, Jf, Jc, Jx, p: BAProblem, lam, loss_scale, solve_dtype
):
    """One damped Schur-complement Gauss-Newton step.

    Returns (d_focal, d_cam (C,6), d_points (P,3)).
    """
    C = p.cam_t.shape[0]
    P = p.points.shape[0]
    K = e.shape[0]
    dtype = e.dtype

    # Robust IRLS weights (Cauchy) × observation weights, applied as sqrt to
    # residual and Jacobian.
    s = jnp.sum(e * e, axis=-1)
    w = cauchy_weight(s, loss_scale) * p.obs_w
    sw = jnp.sqrt(w)[:, None]
    e_w = e * sw
    Jf_w = Jf * sw[..., None]
    Jc_w = Jc * sw[..., None]
    Jx_w = Jx * sw[..., None]

    # Freeze masks zero the corresponding Jacobian columns.
    free_f = jnp.where(p.focal_fixed, 0.0, 1.0).astype(dtype)
    free_t = (~p.trans_fixed).astype(dtype)[p.obs_cam]  # (K,)
    free_r = (~p.rot_fixed).astype(dtype)[p.obs_cam]
    free_x = (~p.point_fixed).astype(dtype)[p.obs_pt]
    Jf_w = Jf_w * free_f
    Jc_w = Jc_w * jnp.concatenate(
        [jnp.repeat(free_t[:, None], 3, -1), jnp.repeat(free_r[:, None], 3, -1)],
        axis=-1,
    )[:, None, :]
    Jx_w = Jx_w * free_x[:, None, None]

    # --- Hessian blocks (Gauss-Newton), scatter-free ---
    # Scatters serialize on TPU; every segment reduction below is either a
    # gather through the per-point track table or a one-hot contraction on
    # the MXU.
    Tmax = p.track_obs.shape[1]
    tmaskf = p.track_mask.astype(dtype)
    tJx = Jx_w[p.track_obs] * tmaskf[..., None, None]    # (P, T, 2, 3)
    tJc = Jc_w[p.track_obs] * tmaskf[..., None, None]    # (P, T, 2, 6)
    tJf = Jf_w[p.track_obs][..., 0] * tmaskf[..., None]  # (P, T, 2)
    te = e_w[p.track_obs] * tmaskf[..., None]            # (P, T, 2)
    tcam = jnp.where(p.track_mask, p.obs_cam[p.track_obs], C)  # (P, T)

    # Point blocks Hpp (P, 3, 3) and rhs b_p (P, 3) via track gathers.
    Hpp = jnp.einsum("ptdi,ptdj->pij", tJx, tJx)
    b_p = jnp.einsum("ptdi,ptd->pi", tJx, te)

    # Camera-side reductions via a one-hot (K, C) contraction (MXU).
    oh_cam = (p.obs_cam[:, None] == jnp.arange(C)[None, :]).astype(dtype)
    oh_cam = oh_cam * (p.obs_w > 0)[:, None]
    Hcc = jnp.einsum("kc,kdi,kdj->cij", oh_cam, Jc_w, Jc_w)
    b_c = jnp.einsum("kc,kdi,kd->ci", oh_cam, Jc_w, e_w)
    Hfc = jnp.einsum("kc,kd,kdj->cj", oh_cam, Jf_w[..., 0], Jc_w)
    Hff = jnp.sum(Jf_w * Jf_w)
    b_f = jnp.sum(Jf_w[..., 0] * e_w)

    # Camera-point coupling per track slot: U (P, T, 6, 3), focal-pt (P, T, 3).
    tU = jnp.einsum("ptdi,ptdj->ptij", tJc, tJx)
    tF_slot = jnp.einsum("ptd,ptdj->ptj", tJf, tJx)

    # --- damping (LM): add lam·diag(H) to each diagonal ---
    Hpp_d = Hpp + jnp.eye(3, dtype=dtype) * (
        lam * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-12)
    )[..., None, :] * jnp.eye(3, dtype=dtype)
    Hpp_inv = jnp.linalg.inv(
        Hpp_d + 1e-18 * jnp.eye(3, dtype=dtype)
    )  # (P, 3, 3); zero-track points → ~0 after masking below
    Hpp_inv = jnp.where(
        (jnp.sum(p.track_mask, axis=-1) > 0)[:, None, None], Hpp_inv, 0.0
    )

    # --- assemble the reduced camera system, scatter-free ---
    # S = Hcc − W Hpp⁻¹ Wᵀ factorizes through per-point camera aggregates:
    # A[p, c, i, x] = Σ_a 1[cam(p,a)=c]·(U_a Hpp⁻¹)[i, x] and
    # B[p, c, j, x] = Σ_b 1[cam(p,b)=c]·U_b[j, x], so the Schur term is the
    # single MXU contraction Σ_p A·Bᵀ. The per-point camera one-hot is built
    # in point chunks to bound memory (chunk × T × C floats).
    tU_inv = jnp.einsum("ptij,pjk->ptik", tU, Hpp_inv)         # U·Hpp⁻¹
    tF_sum = jnp.sum(tF_slot, axis=1)                          # (P, 3)
    tF_inv = jnp.einsum("pi,pij->pj", tF_sum, Hpp_inv)         # (P, 3)

    chunk = max(1, min(P, 4096))
    n_chunks = -(-P // chunk)
    Ppad = n_chunks * chunk

    def pad0(x):
        return jnp.zeros((Ppad,) + x.shape[1:], x.dtype).at[:P].set(x)

    tU_inv_c = pad0(tU_inv).reshape(n_chunks, chunk, Tmax, 6, 3)
    tU_c = pad0(tU).reshape(n_chunks, chunk, Tmax, 6, 3)
    tcam_c = pad0(jnp.where(p.track_mask, tcam, C)).reshape(n_chunks, chunk, Tmax)
    tF_inv_c = pad0(tF_inv).reshape(n_chunks, chunk, 3)
    tF_sum_c = pad0(tF_sum).reshape(n_chunks, chunk, 3)
    b_p_c = pad0(b_p).reshape(n_chunks, chunk, 3)

    def chunk_body(carry, xs):
        S_cc, S_fc, S_ff, rc_red, rf_red = carry
        tUi, tUo, tc, tFi, tFs, bp = xs
        oh = (tc[..., None] == jnp.arange(C)[None, None, :]).astype(dtype)
        A = jnp.einsum("ptc,ptix->pcix", oh, tUi)   # (chunk, C, 6, 3)
        B = jnp.einsum("ptc,ptjx->pcjx", oh, tUo)
        S_cc = S_cc - jnp.einsum("pcix,pejx->ceij", A, B)
        S_fc = S_fc - jnp.einsum("px,pejx->ej", tFi, B)
        S_ff = S_ff - jnp.sum(tFi * tFs)
        rc_red = rc_red + jnp.einsum("pcix,px->ci", A, bp)
        rf_red = rf_red + jnp.sum(tFi * bp)
        return (S_cc, S_fc, S_ff, rc_red, rf_red), None

    init = (
        jnp.zeros((C, C, 6, 6), dtype),
        jnp.zeros((C, 6), dtype),
        jnp.zeros((), dtype),
        jnp.zeros((C, 6), dtype),
        jnp.zeros((), dtype),
    )
    (S_cc, S_fc, S_ff, rc_red, rf_red), _ = jax.lax.scan(
        chunk_body, init,
        (tU_inv_c, tU_c, tcam_c, tF_inv_c, tF_sum_c, b_p_c),
    )

    # add the (damped) non-reduced parts
    diagC = jnp.maximum(jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-12)
    Hcc_d = Hcc + jnp.eye(6, dtype=dtype) * (lam * diagC)[..., None, :] * jnp.eye(
        6, dtype=dtype
    )
    S_cc = S_cc.at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
    S_fc = S_fc + Hfc
    S_ff = S_ff + Hff * (1.0 + lam) + 1e-12

    # reduced rhs
    r_c = b_c - rc_red
    r_f = b_f - rf_red

    # --- dense solve of the (6C+1) system with Jacobi equilibration ---
    D = 6 * C + 1
    S = jnp.zeros((D, D), solve_dtype)
    S = S.at[: 6 * C, : 6 * C].set(
        S_cc.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C).astype(solve_dtype)
    )
    S = S.at[6 * C, : 6 * C].set(S_fc.reshape(-1).astype(solve_dtype))
    S = S.at[: 6 * C, 6 * C].set(S_fc.reshape(-1).astype(solve_dtype))
    S = S.at[6 * C, 6 * C].set(S_ff.astype(solve_dtype))
    rhs = jnp.concatenate([r_c.reshape(-1), r_f[None]]).astype(solve_dtype)

    dscale = jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-12))
    S_eq = S / dscale[:, None] / dscale[None, :]
    S_eq = S_eq + 1e-10 * jnp.eye(D, dtype=solve_dtype)
    L = jnp.linalg.cholesky(S_eq)
    y = jax.scipy.linalg.solve_triangular(L, -(rhs / dscale), lower=True)
    dx = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    dx = (dx / dscale).astype(dtype)

    d_cam = dx[: 6 * C].reshape(C, 6)
    d_f = dx[6 * C]

    # --- back-substitute points: dx_p = Hpp⁻¹ (−b_p − Wᵀ dx_c − F d_f) ---
    # Gather-based: Σ_a U_aᵀ dx_c[cam(p, a)] through the track table (the
    # dump column C reads a zero row).
    d_cam_pad = jnp.concatenate([d_cam, jnp.zeros((1, 6), dtype)], axis=0)
    dc_track = d_cam_pad[tcam]  # (P, T, 6)
    Wt_dx = jnp.einsum("ptij,pti->pj", tU, dc_track)
    Ft_dx = tF_sum * d_f
    d_pts = jnp.einsum("pij,pj->pi", Hpp_inv, -b_p - Wt_dx - Ft_dx)
    return d_f, d_cam, d_pts


@partial(
    jax.jit,
    static_argnames=("max_iters", "loss_scale", "solve_dtype_name"),
)
def bundle_adjust(
    p: BAProblem,
    max_iters: int = 50,
    loss_scale: float = 1.0,
    init_lambda: float = 1e-4,
    ftol: float = 1e-9,
    solve_dtype_name: str = "float64",
) -> BAResult:
    """Robust LM bundle adjustment; returns the optimized state.

    Semantics match SfM::Optimize (sfm.cpp:228-290): Cauchy(1.0) loss,
    frozen-parameter masks, trust-region LM (max_num_iterations here defaults
    lower than Ceres's 2000 — the Schur step is exact, and tests assert
    convergence, raise for hard problems).
    """
    solve_dtype = jnp.dtype(solve_dtype_name)
    dtype = p.points.dtype

    def cost_of(state):
        f, ct, cr, pts = state
        return ba_cost(f, ct, cr, pts, p, loss_scale)

    def body(carry):
        f, ct, cr, pts, lam, cost, it, done = carry
        e, Jf, Jc, Jx = _per_obs_jacobians(f, ct, cr, pts, p)
        d_f, d_cam, d_pts = _schur_solve(
            e, Jf, Jc, Jx, p, lam, loss_scale, solve_dtype
        )
        f_n = f + d_f
        ct_n = ct + d_cam[:, :3]
        cr_n = cr + d_cam[:, 3:]
        pts_n = pts + d_pts
        new_cost = cost_of((f_n, ct_n, cr_n, pts_n))
        ok = jnp.isfinite(new_cost) & (new_cost < cost)
        lam = jnp.where(ok, jnp.maximum(lam * 0.33, 1e-12), lam * 4.0)
        f = jnp.where(ok, f_n, f)
        ct = jnp.where(ok, ct_n, ct)
        cr = jnp.where(ok, cr_n, cr)
        pts = jnp.where(ok, pts_n, pts)
        rel = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        cost2 = jnp.where(ok, new_cost, cost)
        done = (ok & (rel < ftol)) | (lam > 1e12)
        return f, ct, cr, pts, lam, cost2, it + 1, done

    def cond(carry):
        *_, it, done = carry
        return (it < max_iters) & (~done)

    c0 = cost_of((p.focal, p.cam_t, p.cam_r, p.points))
    f, ct, cr, pts, lam, cost, it, _ = jax.lax.while_loop(
        cond,
        body,
        (
            p.focal,
            p.cam_t,
            p.cam_r,
            p.points,
            jnp.asarray(init_lambda, dtype),
            c0,
            jnp.asarray(0),
            jnp.asarray(False),
        ),
    )
    return BAResult(
        focal=f, cam_t=ct, cam_r=cr, points=pts, cost=cost,
        initial_cost=c0, iterations=it,
    )


def build_tracks(obs_pt, num_points: int, max_track: int | None = None):
    """Host-side helper: bucket observation indices by point.

    Returns (track_obs (P, Tmax) int32, track_mask (P, Tmax) bool). Numpy,
    runs between BA rounds when the observation table changes.
    """
    import numpy as np

    obs_pt = np.asarray(obs_pt)
    counts = np.bincount(obs_pt, minlength=num_points)
    T = int(counts.max()) if max_track is None else max_track
    T = max(T, 1)
    track_obs = np.zeros((num_points, T), np.int32)
    track_mask = np.zeros((num_points, T), bool)
    cursor = np.zeros(num_points, np.int64)
    for k, j in enumerate(obs_pt):
        c = cursor[j]
        if c < T:
            track_obs[j, c] = k
            track_mask[j, c] = True
            cursor[j] = c + 1
    return track_obs, track_mask
