"""Spherical essential-matrix construction and decomposition (batched).

Capability parity with the reference's spherical_utils.{h,cpp}
(/root/reference/src/spherical_utils.cpp:9-173): build E = [t]_x R with
t = R·e₃ − e₃ (negated when inward-facing), and decompose E back into the two
rotation candidates R₁ = U D Vᵀ, R₂ = U Dᵀ Vᵀ, selecting either by
translation/U-column alignment (closed form) or by a cheirality vote over
inlier correspondences (midpoint triangulation). Everything is batched and
jit/vmap friendly; the cheirality vote is a masked reduction instead of a
loop.

Epipolar convention: for a correspondence (u, v) with u a ray in image i and
v a ray in image j, and relative pose x_j = R x_i + t, the constraint is
vᵀ E u = 0 with E = [t]_x R.
"""

from __future__ import annotations

import numpy as _np

import jax.numpy as jnp

from .so3 import skew, so3_exp, so3_log

# Plain numpy constants: a module-level jnp.array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize (it must
# run before any backend touch — parallel/multihost.py).
_E3 = _np.array([0.0, 0.0, 1.0])

# The two "twisted-pair" rotors of the essential decomposition.
_D = _np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
_DT = _D.T


def spherical_translation(R: jnp.ndarray, inward: bool) -> jnp.ndarray:
    """t = R·e₃ − e₃ (outward) or its negation (inward). (...,3,3) -> (...,3)."""
    t = R[..., :, 2] - _E3.astype(R.dtype)
    return -t if inward else t


def make_spherical_essential(R: jnp.ndarray, inward: bool = False) -> jnp.ndarray:
    """E = [t]_x R with the spherical translation. (..., 3, 3) -> (..., 3, 3)."""
    t = spherical_translation(R, inward)
    return skew(t) @ R


def essential_params(E: jnp.ndarray) -> jnp.ndarray:
    """Pack a structured spherical E into its 6 free parameters.

    Layout [E00, E01, E02, E12, E20, E21]; the structure is
    E = [[a, b, c], [b, -a, d], [e, f, 0]] (spherical_solvers.cpp:299-303).
    """
    return jnp.stack(
        [
            E[..., 0, 0],
            E[..., 0, 1],
            E[..., 0, 2],
            E[..., 1, 2],
            E[..., 2, 0],
            E[..., 2, 1],
        ],
        axis=-1,
    )


def essential_from_params(p: jnp.ndarray) -> jnp.ndarray:
    """Unpack 6 parameters into the structured spherical E. (...,6)->(...,3,3)."""
    a, b, c, d, e, f = (p[..., i] for i in range(6))
    z = jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([a, b, c], axis=-1),
            jnp.stack([b, -a, d], axis=-1),
            jnp.stack([e, f, z], axis=-1),
        ],
        axis=-2,
    )


def _rotation_candidates(E: jnp.ndarray):
    """SVD twisted-pair candidates (R1, R2, tu) from an essential matrix.

    tu is the left null direction U·e₃ (translation direction up to sign).
    Uses the rank-2-specialized Jacobi SVD (ops/linalg.py) — U is
    right-handed by construction; V's handedness is fixed by flipping its
    null column (which cannot change E). Mirrors the det-sign handling of
    the reference's closed-form variant (spherical_utils.cpp:23-29).
    """
    from ..ops.linalg import svd3_rank2

    U, _, Vt = svd3_rank2(E)
    detV = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2))
    Vt = Vt.at[..., 2, :].multiply(jnp.sign(detV)[..., None])
    D = _D.astype(E.dtype)
    DT = _DT.astype(E.dtype)
    R1 = U @ D @ Vt
    R2 = U @ DT @ Vt
    tu = U[..., :, 2]
    return R1, R2, tu


def decompose_spherical_essential(E: jnp.ndarray, inward: bool = False):
    """Closed-form decomposition: pick the candidate whose spherical
    translation aligns best with the translation direction U·e₃.

    Returns (r, t): axis-angle rotation and (unnormalized) spherical
    translation. Mirrors spherical_utils.cpp:16-66.
    """
    R1, R2, tu = _rotation_candidates(E)
    t1 = spherical_translation(R1, inward)
    t2 = spherical_translation(R2, inward)

    def _norm(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.where(n > 1e-12, n, 1.0)

    score1 = jnp.abs(jnp.sum(_norm(t1) * tu, axis=-1))
    score2 = jnp.abs(jnp.sum(_norm(t2) * tu, axis=-1))
    pick1 = score1 > score2
    r = jnp.where(pick1[..., None], so3_log(R1), so3_log(R2))
    t = jnp.where(pick1[..., None], t1, t2)
    return r, t


def _midpoint_depth_sign(R: jnp.ndarray, t: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Sign of the z-coordinate of the midpoint-triangulated point.

    Solves the 2-view ray intersection min ‖du·u − (c_v + dv·v')‖ in closed
    form (2x2 normal equations) instead of the reference's per-point 3x3 SVD
    (spherical_utils.cpp:68-87) — algebraically equivalent midpoint, but
    branch-free and cheap enough to vmap over every correspondence.

    u: rays in frame i (camera at origin). The second camera has center
    c = −Rᵀ t and the ray direction of v in frame-i coordinates is Rᵀ v.
    """
    Rt_v = jnp.einsum("...ji,...j->...i", R, v)
    c = -jnp.einsum("...ji,...j->...i", R, t)
    # Solve [u·u  -u·w; u·w  -w·w] [du, dv]ᵀ = [u·c, w·c] with w = Rᵀv.
    uu = jnp.sum(u * u, axis=-1)
    ww = jnp.sum(Rt_v * Rt_v, axis=-1)
    uw = jnp.sum(u * Rt_v, axis=-1)
    uc = jnp.sum(u * c, axis=-1)
    wc = jnp.sum(Rt_v * c, axis=-1)
    det = -uu * ww + uw * uw
    det = jnp.where(jnp.abs(det) > 1e-18, det, jnp.sign(det) * 1e-18 + 1e-30)
    du = (-uc * ww + uw * wc) / det
    dv = (uu * wc - uw * uc) / det
    X = 0.5 * (u * du[..., None] + c + Rt_v * dv[..., None])
    return X[..., 2]


def decompose_spherical_essential_cheirality(
    E: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    inlier_mask: jnp.ndarray,
    inward: bool = False,
):
    """Decomposition with cheirality voting over inlier correspondences.

    Shortcut (spherical_utils.cpp:130-134): if exactly one candidate rotation
    has magnitude < π/2, take it. Otherwise count midpoint-triangulated points
    with positive depth under each candidate and take the majority.

    E: (..., 3, 3); u, v: (..., N, 3); inlier_mask: (..., N) bool.
    Returns (r, t).
    """
    R1, R2, _ = _rotation_candidates(E)
    t1 = spherical_translation(R1, inward)
    t2 = spherical_translation(R2, inward)
    r1 = so3_log(R1)
    r2 = so3_log(R2)
    mag1 = jnp.linalg.norm(r1, axis=-1)
    mag2 = jnp.linalg.norm(r2, axis=-1)

    z1 = _midpoint_depth_sign(R1[..., None, :, :], t1[..., None, :], u, v)
    z2 = _midpoint_depth_sign(R2[..., None, :, :], t2[..., None, :], u, v)
    n1 = jnp.sum((z1 > 0) & inlier_mask, axis=-1)
    n2 = jnp.sum((z2 > 0) & inlier_mask, axis=-1)

    vote1 = n1 > n2
    pick1 = jnp.where(
        (mag2 > jnp.pi / 2) & (mag1 < jnp.pi / 2),
        True,
        jnp.where((mag1 > jnp.pi / 2) & (mag2 < jnp.pi / 2), False, vote1),
    )
    r = jnp.where(pick1[..., None], r1, r2)
    t = jnp.where(pick1[..., None], t1, t2)
    return r, t


def conjugate_essential_by_focal(E: jnp.ndarray, focal_ratio: jnp.ndarray) -> jnp.ndarray:
    """E' = diag(s, s, 1) · E · diag(s, s, 1) with s = f/f₀.

    How an essential matrix estimated at guessed focal f₀ transforms when the
    true focal is f (reference: transform_image_matches,
    spherical_sfm_tools.cpp:1118-1131). Broadcasts focal_ratio over E's batch.
    """
    s = jnp.asarray(focal_ratio)
    d = jnp.stack([s, s, jnp.ones_like(s)], axis=-1)
    return E * d[..., :, None] * d[..., None, :]
