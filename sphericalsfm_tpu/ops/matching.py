"""Descriptor matching as batched MXU contractions.

Capability parity with the reference's BFMatcher knn-2 + Lowe ratio matching
(/root/reference/examples/spherical_sfm_tools.cpp:235-251) and
match_exhaustive (:575-600). The reference loops over O(N²) image pairs with
OpenMP and brute-force L2 knn; here one pair's matching is a single
(K×128)·(128×K) matmul plus a two-smallest reduction, and many pairs batch
along a leading axis (vmap / shard over a mesh `pairs` axis — SURVEY.md §2.5
P2).

Convention (matching the reference's reversed query/train roles): features of
image j (second) are the *queries*; for each query the two nearest neighbors
in image i are found, the ratio test d₁ < ratio·d₂ is applied, and the
surviving pairs are scattered as m01[i_feature] = j_feature.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.inf


def pairwise_sq_dists(
    d0: jnp.ndarray, d1: jnp.ndarray, precision=jax.lax.Precision.HIGHEST
) -> jnp.ndarray:
    """Squared L2 distances (..., N, K) x (..., M, K) -> (..., N, M).

    The inner product rides the MXU; norms are rank-1 updates.
    """
    ip = jnp.einsum("...nk,...mk->...nm", d0, d1, precision=precision)
    n0 = jnp.sum(d0 * d0, axis=-1)
    n1 = jnp.sum(d1 * d1, axis=-1)
    return jnp.maximum(n0[..., :, None] + n1[..., None, :] - 2.0 * ip, 0.0)


def _two_smallest(d: jnp.ndarray):
    """Smallest and second-smallest along the last axis, plus argmin."""
    i1 = jnp.argmin(d, axis=-1)
    m1 = jnp.take_along_axis(d, i1[..., None], axis=-1)[..., 0]
    masked = jnp.where(
        jax.nn.one_hot(i1, d.shape[-1], dtype=bool), _INF, d
    )
    m2 = jnp.min(masked, axis=-1)
    return m1, m2, i1


@partial(jax.jit, static_argnames=("ratio",))
def match_pair(
    d0: jnp.ndarray,        # (N, K) descriptors image i
    d1: jnp.ndarray,        # (M, K) descriptors image j
    valid0: jnp.ndarray,    # (N,) bool
    valid1: jnp.ndarray,    # (M,) bool
    ratio: float = 0.75,
):
    """Lowe-ratio matching of one image pair.

    Returns (m01 (N,) int32: index into image j or −1, mask (N,) bool).
    vmap over a leading pair axis for exhaustive matching.
    """
    d = pairwise_sq_dists(d1, d0)  # queries are image-j features: (M, N)
    d = jnp.where(valid0[None, :], d, _INF)
    d = jnp.where(valid1[:, None], d, _INF)
    m1, m2, nn = _two_smallest(d)  # per query j: best train i
    # Lowe test on *distances* (not squared): d1 < ratio·d2 ⇔ d1² < ratio²·d2².
    accept = (m1 < (ratio * ratio) * m2) & valid1 & jnp.isfinite(m1)

    n = d0.shape[0]
    m01 = jnp.full((n,), -1, jnp.int32)
    scatter_idx = jnp.where(accept, nn, n)  # rejected queries → dump slot
    m01 = (
        jnp.concatenate([m01, jnp.full((1,), -1, jnp.int32)])
        .at[scatter_idx]
        .set(jnp.arange(d1.shape[0], dtype=jnp.int32))[:n]
    )
    mask = m01 >= 0
    return m01, mask


def match_to_index_pairs(m01: jnp.ndarray, mask: jnp.ndarray, max_matches: int):
    """Compact a match map (N,) into fixed-size index pairs.

    Returns (idx0 (max_matches,), idx1 (max_matches,), valid (max_matches,)).
    """
    n = m01.shape[0]
    order = jnp.argsort(~mask, stable=True)
    idx0 = order[:max_matches]
    valid = mask[idx0]
    idx1 = jnp.where(valid, m01[idx0], 0)
    return idx0.astype(jnp.int32), idx1.astype(jnp.int32), valid
