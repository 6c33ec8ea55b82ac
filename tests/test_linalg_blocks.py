"""Exactness tests for the blocked dense-SPD Cholesky solver
(`ops/linalg.py::block_chol_solve`) against the XLA cholesky/triangular
path it replaces in the BA dense camera solve."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sphericalsfm_tpu.ops.linalg import (
    block_chol_solve, chol_small, tri_inv_lower_small,
)


def _spd(rng, n, cond=1e3):
    A = rng.normal(size=(n, n + 8))
    S = A @ A.T
    S += n * np.eye(n) / cond * np.trace(S) / n
    return S.astype(np.float64)


@pytest.mark.parametrize("b", [3, 6, 8])
def test_chol_small_matches_numpy(b):
    rng = np.random.default_rng(0)
    A = _spd(rng, b)
    L = np.asarray(chol_small(jnp.asarray(A)))
    np.testing.assert_allclose(L, np.linalg.cholesky(A), rtol=1e-10,
                               atol=1e-10)
    # batched
    As = np.stack([_spd(rng, b) for _ in range(5)])
    Ls = np.asarray(chol_small(jnp.asarray(As)))
    for Ai, Li in zip(As, Ls):
        np.testing.assert_allclose(Li, np.linalg.cholesky(Ai), rtol=1e-10,
                                   atol=1e-10)


def test_chol_small_zero_block_nan_free():
    L = np.asarray(chol_small(jnp.zeros((4, 4))))
    assert np.all(np.isfinite(L))


@pytest.mark.parametrize("b", [2, 6, 8])
def test_tri_inv_lower_small(b):
    rng = np.random.default_rng(1)
    L = np.tril(rng.normal(size=(b, b))) + np.eye(b) * b
    X = np.asarray(tri_inv_lower_small(jnp.asarray(L)))
    np.testing.assert_allclose(X @ L, np.eye(b), rtol=0, atol=1e-10)
    assert np.allclose(np.triu(X, 1), 0.0)


@pytest.mark.parametrize("D,block", [(385, 8), (385, 16), (37, 8),
                                     (64, 8), (1, 8)])
def test_block_chol_solve_matches_direct(D, block):
    rng = np.random.default_rng(2)
    S = _spd(rng, D)
    rhs = rng.normal(size=(D,))
    x = np.asarray(block_chol_solve(jnp.asarray(S), jnp.asarray(rhs),
                                    block=block))
    x_ref = np.linalg.solve(S, rhs)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-8)


def test_block_chol_solve_f32_equilibrated():
    # The BA call site equilibrates then solves in f32: check the blocked
    # path matches the XLA cholesky+trisolve route at f32 tolerances on a
    # BA-shaped (6C+1) system.
    rng = np.random.default_rng(3)
    D = 6 * 64 + 1
    S = _spd(rng, D, cond=1e5).astype(np.float32)
    rhs = rng.normal(size=(D,)).astype(np.float32)
    dscale = np.sqrt(np.maximum(np.diagonal(S), 1e-12))
    S_eq = (S / dscale[:, None] / dscale[None, :]).astype(np.float32)
    b_eq = (rhs / dscale).astype(np.float32)

    x_blk = np.asarray(block_chol_solve(jnp.asarray(S_eq),
                                        jnp.asarray(b_eq), block=8))
    L = np.asarray(jnp.linalg.cholesky(jnp.asarray(S_eq)))
    y = np.asarray(jax.scipy.linalg.solve_triangular(
        jnp.asarray(L), jnp.asarray(b_eq), lower=True))
    x_ref = np.asarray(jax.scipy.linalg.solve_triangular(
        jnp.asarray(L).T, jnp.asarray(y), lower=False))
    denom = np.linalg.norm(x_ref) + 1e-30
    assert np.linalg.norm(x_blk - x_ref) / denom < 1e-4


def test_block_chol_solve_jit_and_grad_free_shapes():
    # jit-compiles once for the padded shape; D not a multiple of block.
    rng = np.random.default_rng(4)
    D = 101
    S = jnp.asarray(_spd(rng, D).astype(np.float32))
    rhs = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    f = jax.jit(lambda S, r: block_chol_solve(S, r, block=8))
    x = np.asarray(f(S, rhs))
    np.testing.assert_allclose(
        x, np.linalg.solve(np.asarray(S, np.float64),
                           np.asarray(rhs, np.float64)),
        rtol=2e-3, atol=2e-3)
