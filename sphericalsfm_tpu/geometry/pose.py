"""Poses, intrinsics and similarity transforms as batched functional ops.

Capability parity with the reference's sfm_types.{h,cpp} (Pose compose /
inverse / apply / getCenter, Intrinsics K / Kinv;
/root/reference/src/sfm_types.cpp:8-52) but stateless: a pose is a pair of
arrays (r, t) with world->camera action x_cam = R @ X + t, R = exp([r]_x).
All functions broadcast over leading batch axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .so3 import so3_exp, so3_log


class Pose(NamedTuple):
    """World->camera pose: x_cam = R(r) @ X + t. Arrays broadcast (..., 3)."""

    r: jnp.ndarray
    t: jnp.ndarray

    @property
    def R(self) -> jnp.ndarray:
        return so3_exp(self.r)

    def matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous matrix."""
        R = self.R
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)


def identity_pose(dtype=jnp.float64) -> Pose:
    return Pose(jnp.zeros(3, dtype), jnp.zeros(3, dtype))


def pose_apply(pose: Pose, X: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points: (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", so3_exp(pose.r), X) + pose.t


def pose_apply_inverse(pose: Pose, X: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...ji,...j->...i", so3_exp(pose.r), X - pose.t)


def pose_inverse(pose: Pose) -> Pose:
    R = so3_exp(pose.r)
    return Pose(-pose.r, -jnp.einsum("...ji,...j->...i", R, pose.t))


def pose_compose(a: Pose, b: Pose) -> Pose:
    """Composition (a ∘ b): apply b first, then a. x = Ra(Rb X + tb) + ta."""
    Ra, Rb = so3_exp(a.r), so3_exp(b.r)
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, b.t) + a.t
    return Pose(so3_log(R), t)


def pose_center(pose: Pose) -> jnp.ndarray:
    """Camera center in world coordinates: -Rᵀ t."""
    return -jnp.einsum("...ji,...j->...i", so3_exp(pose.r), pose.t)


def relative_pose(pose_i: Pose, pose_j: Pose) -> Pose:
    """Pose of camera j relative to camera i: x_j = R x_i + t.

    R = Rj Riᵀ, t = tj − Rj Riᵀ ti (reference: spherical_estimator.cpp:44-45).
    """
    Ri, Rj = so3_exp(pose_i.r), so3_exp(pose_j.r)
    R = Rj @ jnp.swapaxes(Ri, -1, -2)
    t = pose_j.t - jnp.einsum("...ij,...j->...i", R, pose_i.t)
    return Pose(so3_log(R), t)


def spherical_pose_translation(inward: bool, dtype=jnp.float64) -> jnp.ndarray:
    """The constrained translation of a spherical camera: (0,0,∓1).

    Outward-facing cameras sit at t=(0,0,-1) (center = Rᵀ e₃ on the unit
    sphere, optical axis pointing away from the origin); inward-facing flips
    the sign. Reference: spherical_sfm_tools.cpp build_sfm (t=(0,0,-1) or
    (0,0,1)) and spherical_estimator.cpp:112-119.
    """
    t = jnp.array([0.0, 0.0, 1.0 if inward else -1.0], dtype=dtype)
    return t


class Intrinsics(NamedTuple):
    """Pinhole intrinsics with a single focal and principal point."""

    focal: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    def K(self) -> jnp.ndarray:
        f = jnp.asarray(self.focal)
        z = jnp.zeros_like(f)
        o = jnp.ones_like(f)
        return jnp.stack(
            [
                jnp.stack([f, z, jnp.asarray(self.cx) * o], axis=-1),
                jnp.stack([z, f, jnp.asarray(self.cy) * o], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    def K_inv(self) -> jnp.ndarray:
        f = jnp.asarray(self.focal)
        z = jnp.zeros_like(f)
        o = jnp.ones_like(f)
        inv_f = 1.0 / f
        return jnp.stack(
            [
                jnp.stack([inv_f, z, -jnp.asarray(self.cx) * inv_f], axis=-1),
                jnp.stack([z, inv_f, -jnp.asarray(self.cy) * inv_f], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )


def pixels_to_rays(points_xy: jnp.ndarray, intrinsics: Intrinsics) -> jnp.ndarray:
    """Lift pixel coordinates (..., 2) to homogeneous rays (..., 3) via K⁻¹."""
    f = jnp.asarray(intrinsics.focal)
    x = (points_xy[..., 0] - intrinsics.cx) / f
    y = (points_xy[..., 1] - intrinsics.cy) / f
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def project(pose: Pose, X: jnp.ndarray, focal: jnp.ndarray) -> jnp.ndarray:
    """Project world points to (principal-point-centered) pixel coordinates.

    Matches the reference BA residual model (sfm.cpp:38-63): observations are
    stored relative to the principal point, so projection is just f·(x/z, y/z).
    """
    p = pose_apply(pose, X)
    return focal * p[..., :2] / p[..., 2:3]
