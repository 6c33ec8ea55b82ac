"""SO(3) utilities: skew, exp, log — batched, branchless, vmappable.

Capability parity with the reference's so3.{h,cpp} (skew3, so3exp, so3ln;
see /root/reference/src/so3.cpp:6-69) but written as pure jnp functions with
`jnp.where` selects instead of data-dependent branches, so they trace cleanly
under jit/vmap and map onto the TPU VPU.

Conventions: rotation matrices are world->camera; axis-angle vectors r satisfy
R = exp([r]_x).
"""

from __future__ import annotations

import jax.numpy as jnp

_SQRT1_2 = 0.7071067811865476


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix. v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(r: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, r: (..., 3) -> (..., 3, 3).

    Uses the series-safe form R = I + a(θ)[r]_x + b(θ)[r]_x², with
    a = sinθ/θ and b = (1-cosθ)/θ² evaluated via their Taylor limits near 0 so
    the function is smooth and finite everywhere (no data-dependent branch).
    """
    theta2 = jnp.sum(r * r, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta2 < 1e-16
    # sin(θ)/θ and (1-cos θ)/θ² with guarded θ to avoid 0/0 under autodiff.
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta_safe) / theta_safe)
    b = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_safe)) / (theta_safe * theta_safe)
    )
    K = skew(r)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix log of a rotation, R: (..., 3, 3) -> (..., 3).

    Numerically-careful three-regime formulation (asin for small angles, acos
    for mid angles, symmetric part near π), mirroring the regime split of the
    reference implementation (so3.cpp:25-69) but fully branchless: all three
    candidates are computed and blended with `jnp.where`.
    """
    dtype = R.dtype
    cos_angle = jnp.clip(
        (R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5, -1.0, 1.0
    )
    asym = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_abs = jnp.linalg.norm(asym, axis=-1)
    sin_safe = jnp.where(sin_abs > 1e-12, sin_abs, jnp.ones_like(sin_abs))

    # Regime 1: θ in [0, π/4): r = asym * asin(|sin|)/|sin|
    scale1 = jnp.where(
        sin_abs > 1e-12, jnp.arcsin(jnp.clip(sin_abs, -1.0, 1.0)) / sin_safe, 1.0
    )
    r1 = asym * scale1[..., None]

    # Regime 2: θ in [π/4, 3π/4): r = asym * acos(cos)/|sin|
    scale2 = jnp.arccos(cos_angle) / sin_safe
    r2 = asym * scale2[..., None]

    # Regime 3: θ near π — antisymmetric part vanishes; recover the axis from
    # the symmetric part. Pick the column with the largest diagonal excess.
    angle3 = jnp.pi - jnp.arcsin(jnp.clip(sin_abs, -1.0, 1.0))
    d = jnp.stack(
        [
            R[..., 0, 0] - cos_angle,
            R[..., 1, 1] - cos_angle,
            R[..., 2, 2] - cos_angle,
        ],
        axis=-1,
    )
    cand0 = jnp.stack(
        [d[..., 0], 0.5 * (R[..., 1, 0] + R[..., 0, 1]), 0.5 * (R[..., 0, 2] + R[..., 2, 0])],
        axis=-1,
    )
    cand1 = jnp.stack(
        [0.5 * (R[..., 1, 0] + R[..., 0, 1]), d[..., 1], 0.5 * (R[..., 2, 1] + R[..., 1, 2])],
        axis=-1,
    )
    cand2 = jnp.stack(
        [0.5 * (R[..., 0, 2] + R[..., 2, 0]), 0.5 * (R[..., 2, 1] + R[..., 1, 2]), d[..., 2]],
        axis=-1,
    )
    absd = jnp.abs(d)
    use0 = (absd[..., 0] >= absd[..., 1]) & (absd[..., 0] >= absd[..., 2])
    use1 = (~use0) & (absd[..., 1] >= absd[..., 2])
    axis = jnp.where(
        use0[..., None], cand0, jnp.where(use1[..., None], cand1, cand2)
    )
    # Align with the antisymmetric part's direction (sign disambiguation).
    flip = jnp.sum(axis * asym, axis=-1) < 0
    axis = jnp.where(flip[..., None], -axis, axis)
    axis_norm = jnp.linalg.norm(axis, axis=-1)
    axis_norm = jnp.where(axis_norm > 1e-12, axis_norm, jnp.ones_like(axis_norm))
    r3 = axis / axis_norm[..., None] * angle3[..., None]

    in1 = cos_angle > _SQRT1_2
    in2 = (~in1) & (cos_angle > -_SQRT1_2)
    out = jnp.where(in1[..., None], r1, jnp.where(in2[..., None], r2, r3))
    return out.astype(dtype)


def rotation_angle(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle in radians, (..., 3, 3) -> (...,). Cheap trace formula."""
    cos_angle = jnp.clip(
        (R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5, -1.0, 1.0
    )
    return jnp.arccos(cos_angle)


def rotation_geodesic(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle between two rotations, (..., 3, 3) x2 -> (...,)."""
    return rotation_angle(Ra @ jnp.swapaxes(Rb, -1, -2))
