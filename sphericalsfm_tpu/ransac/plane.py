"""Plane RANSAC — batched 3-point plane fitting with MSAC selection.

Capability parity with the reference's PlaneEstimator + PreemptiveRANSAC use
in the stitcher (/root/reference/src/plane_estimator.cpp:15-66,
examples/stereo_panorama_tools.cpp:276-298): fit a plane to 3D points
(camera centers), score by squared point-plane distance. The preemptive
breadth-first scheme of the reference collapses naturally into the batched
hypothesize-and-score engine.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .engine import best_model, sample_tuples


class PlaneRansacResult(NamedTuple):
    normal: jnp.ndarray       # (3,) unit normal
    d: jnp.ndarray            # plane offset: n·x + d = 0
    inlier_mask: jnp.ndarray  # (N,)
    num_inliers: jnp.ndarray


def fit_plane_weighted(points: jnp.ndarray, w: jnp.ndarray):
    """Least-squares plane through weighted points: smallest eigenvector of
    the weighted scatter matrix. Returns (normal, d)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mean = jnp.sum(points * w[:, None], axis=0) / wsum
    centered = points - mean
    S = jnp.einsum("ni,nj,n->ij", centered, centered, w)
    _, V = jnp.linalg.eigh(S)
    n = V[:, 0]
    return n, -jnp.dot(n, mean)


def plane_sq_dist(normal, d, points):
    return (points @ normal + d) ** 2


@partial(jax.jit, static_argnames=("num_hypotheses",))
def plane_ransac(
    key: jax.Array,
    points: jnp.ndarray,   # (N, 3)
    mask: jnp.ndarray,     # (N,)
    sq_thresh,
    num_hypotheses: int = 128,
) -> PlaneRansacResult:
    triples = sample_tuples(key, mask, num_hypotheses, 3)
    p = points[triples]  # (M, 3, 3)
    n = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    valid = norm[:, 0] > 1e-12
    n = n / jnp.where(valid[:, None], norm, 1.0)
    d = -jnp.einsum("mi,mi->m", n, p[:, 0])

    errs = (jnp.einsum("mi,ni->mn", n, points) + d[:, None]) ** 2
    best, score, inliers = best_model(errs, valid, sq_thresh, mask)

    # least-squares polish on inliers
    n_ref, d_ref = fit_plane_weighted(points, inliers.astype(points.dtype))
    err_ref = plane_sq_dist(n_ref, d_ref, points)
    score_ref = jnp.sum(jnp.where(mask, jnp.minimum(err_ref, sq_thresh), 0.0))
    better = score_ref < score
    normal = jnp.where(better, n_ref, n[best])
    dd = jnp.where(better, d_ref, d[best])
    inl = jnp.where(better, (err_ref < sq_thresh) & mask, inliers)
    return PlaneRansacResult(
        normal=normal, d=dd, inlier_mask=inl, num_inliers=jnp.sum(inl)
    )
