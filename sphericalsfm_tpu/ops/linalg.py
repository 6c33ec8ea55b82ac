"""Batched small-matrix linear algebra tuned for TPU.

XLA lowers jnp.linalg.{eigh, svd} through QDWH-style iterations that are
wildly oversized for the 3×3/6×6 matrices at the heart of the minimal
solvers (SURVEY.md §7 hard-parts). The replacements here are *structure*
specializations with no iteration at all:

* the minimal sample's nullspace is an exact orthogonal complement →
  Gram-Schmidt basis completion;
* an essential matrix has singular values (s, s, 0), and the twisted-pair
  decomposition is invariant to the gauge inside the repeated subspace →
  the SVD reduces to one null vector (closed-form adjugate) plus a basis
  completion.

Everything is straight-line vectorized code that fuses into surrounding
kernels and vmaps cleanly in f32/f64 on any backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _mgs_complete(rows: jnp.ndarray, k_extra: int) -> jnp.ndarray:
    """Orthonormal completion of the row space of (..., R, n).

    Returns (..., n, k_extra): an orthonormal basis of the orthogonal
    complement. The candidate pool is the n standard basis vectors; the
    k_extra with the largest residual after projection are kept (pivoting),
    then re-orthonormalized. Exact (up to roundoff) when rows has full rank R.
    """
    R = rows.shape[-2]
    n = rows.shape[-1]
    # Orthonormalize the given rows (modified Gram-Schmidt, unrolled).
    q = []
    for i in range(R):
        v = rows[..., i, :]
        for qj in q:
            v = v - qj * jnp.sum(qj * v, axis=-1, keepdims=True)
        norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        q.append(v / jnp.maximum(norm, 1e-30))

    # Residuals of the standard basis vectors.
    eye = jnp.eye(n, dtype=rows.dtype)
    resid = jnp.broadcast_to(eye, rows.shape[:-2] + (n, n))
    for qj in q:
        resid = resid - qj[..., None, :] * jnp.sum(
            qj[..., None, :] * resid, axis=-1, keepdims=True
        )
    rnorm = jnp.linalg.norm(resid, axis=-1)
    # Pick the k_extra best-conditioned candidates (static top-k by sort).
    order = jnp.argsort(-rnorm, axis=-1)[..., :k_extra]
    cand = jnp.take_along_axis(resid, order[..., :, None], axis=-2)

    out = []
    for i in range(k_extra):
        v = cand[..., i, :]
        for qj in out:
            v = v - qj * jnp.sum(qj * v, axis=-1, keepdims=True)
        norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
        out.append(v / jnp.maximum(norm, 1e-30))
    return jnp.stack(out, axis=-1)  # (..., n, k_extra)


def nullspace_exact(A: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-dim nullspace of full-row-rank (..., R, n) with R + k = n."""
    return _mgs_complete(A, k)


def smallest_eigvec_3x3(S: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of a symmetric (..., 3, 3).

    Closed form: the smallest eigenvalue via the trigonometric (Cardano)
    formula, then the eigenvector from the largest column of the adjugate of
    S − λI. No iterations; accurate when the smallest eigenvalue is
    well-separated (the essential-matrix case: spectrum (s², s², 0)).
    """
    s00 = S[..., 0, 0]
    s11 = S[..., 1, 1]
    s22 = S[..., 2, 2]
    s01 = S[..., 0, 1]
    s02 = S[..., 0, 2]
    s12 = S[..., 1, 2]
    q = (s00 + s11 + s22) / 3.0
    p1 = s01 * s01 + s02 * s02 + s12 * s12
    p2 = (s00 - q) ** 2 + (s11 - q) ** 2 + (s22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-37))
    b00 = (s00 - q) / p
    b11 = (s11 - q) / p
    b22 = (s22 - q) / p
    b01 = s01 / p
    b02 = s02 / p
    b12 = s12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Eigenvector: adjugate columns of (S − λI); pick the largest.
    M = S - lam_min[..., None, None] * jnp.eye(3, dtype=S.dtype)
    c0 = jnp.cross(M[..., :, 1], M[..., :, 2], axis=-1)
    c1 = jnp.cross(M[..., :, 2], M[..., :, 0], axis=-1)
    c2 = jnp.cross(M[..., :, 0], M[..., :, 1], axis=-1)
    n0 = jnp.sum(c0 * c0, axis=-1)
    n1 = jnp.sum(c1 * c1, axis=-1)
    n2 = jnp.sum(c2 * c2, axis=-1)
    use0 = (n0 >= n1) & (n0 >= n2)
    use1 = (~use0) & (n1 >= n2)
    v = jnp.where(use0[..., None], c0, jnp.where(use1[..., None], c1, c2))
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(vn, 1e-30)


def svd3_rank2(E: jnp.ndarray):
    """SVD factors (U, s, Vt) of (..., 3, 3) rank-2 matrices with a repeated
    top singular value — the essential-matrix case.

    The twisted-pair decomposition is gauge-invariant inside the repeated
    subspace, so V = [v₀ v₁ v₂] takes v₂ = closed-form null vector of EᵀE and
    (v₀, v₁) = any orthonormal completion; U follows as u_k = Ê v_k with
    u₂ = u₀ × u₁ (right-handed by construction).
    """
    EtE = jnp.einsum("...ji,...jk->...ik", E, E, precision=_HI)
    v2 = smallest_eigvec_3x3(EtE)
    v01 = _mgs_complete(v2[..., None, :], 2)  # (..., 3, 2)
    v0 = v01[..., :, 0]
    v1 = v01[..., :, 1]

    u0 = jnp.einsum("...ij,...j->...i", E, v0)
    s0 = jnp.linalg.norm(u0, axis=-1)
    u0 = u0 / jnp.maximum(s0[..., None], 1e-30)
    u1 = jnp.einsum("...ij,...j->...i", E, v1)
    u1p = u1 - u0 * jnp.sum(u0 * u1, axis=-1, keepdims=True)
    s1 = jnp.linalg.norm(u1p, axis=-1)
    u1 = u1p / jnp.maximum(s1[..., None], 1e-30)
    u2 = jnp.cross(u0, u1, axis=-1)
    U = jnp.stack([u0, u1, u2], axis=-1)
    s = jnp.stack([s0, s1, jnp.zeros_like(s0)], axis=-1)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)
