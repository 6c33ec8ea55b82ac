"""Generic dense Levenberg–Marquardt for small parameter vectors — jittable.

Replaces the reference's per-call Ceres solves for *small* problems (RANSAC
final least squares, triangulation refinement, rotation averaging, pose
graph). Bundle adjustment has its own Schur-structured solver (optim/ba.py).

Design: fixed iteration count inside `lax.while_loop` with trust-region-style
damping adaptation (multiplicative lambda), masked residuals for fixed-shape
batching, optional IRLS robust weighting. Everything vmaps: a batch of
independent LM problems (e.g. per-pair RANSAC refinement) runs as one fused
kernel.

Robust losses mirror Ceres semantics: given squared residual s, rho(s) defines
cost; IRLS weight = rho'(s) (Ceres's first-order correction).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


def cauchy_weight(s: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """rho(s) = c²·log(1 + s/c²); weight rho'(s) = 1/(1 + s/c²)."""
    c2 = scale * scale
    return 1.0 / (1.0 + s / c2)


def cauchy_rho(s: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    c2 = scale * scale
    return c2 * jnp.log1p(s / c2)


def soft_l1_weight(s: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Ceres SoftLOneLoss: rho(s) = 2 b (sqrt(1 + s/b) − 1), b = scale².

    weight rho'(s) = 1/sqrt(1 + s/b).
    """
    b = scale * scale
    return 1.0 / jnp.sqrt(1.0 + s / b)


def soft_l1_rho(s: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    b = scale * scale
    return 2.0 * b * (jnp.sqrt(1.0 + s / b) - 1.0)


def trivial_weight(s: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    return jnp.ones_like(s)


def trivial_rho(s: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    return s


class LMResult(NamedTuple):
    x: jnp.ndarray
    cost: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray


@partial(
    jax.jit,
    static_argnames=(
        "residual_fn",
        "max_iters",
        "rho",
        "weight",
        "ftol",
        "xtol",
    ),
)
def levenberg_marquardt(
    residual_fn: Callable[..., jnp.ndarray],
    x0: jnp.ndarray,
    args: tuple = (),
    mask: jnp.ndarray | None = None,
    max_iters: int = 50,
    init_lambda: float = 1e-4,
    rho=trivial_rho,
    weight=trivial_weight,
    ftol: float = 1e-10,
    xtol: float = 1e-14,
) -> LMResult:
    """Minimize 0.5·Σ_i m_i·rho(‖r_i‖²) over x.

    residual_fn(x, *args) -> residual array whose LAST axis (or the flat
    vector) is the residual; a 2-D return (N, D) is treated as N residual
    blocks of size D sharing one robust weight (Ceres residual-block
    semantics). `mask` (N,) zeroes out padded blocks.

    Returns the optimized x. Uses full dense J (via jacfwd) — intended for
    dim(x) up to a few thousand.
    """
    dtype = x0.dtype

    def _flat_res(x):
        r = residual_fn(x, *args)
        if r.ndim == 1:
            r = r[:, None]
        return r.reshape(-1, r.shape[-1])  # (N blocks, D)

    n_blocks = _flat_res(x0).shape[0]
    m = jnp.ones((n_blocks,), dtype) if mask is None else mask.reshape(-1).astype(dtype)

    def total_cost(x):
        r = _flat_res(x)
        s = jnp.sum(r * r, axis=-1)
        return 0.5 * jnp.sum(m * rho(s))

    def weighted_system(x):
        """Gauss-Newton normal equations with IRLS robust weights."""
        r = _flat_res(x)  # (N, D)
        J = jax.jacfwd(lambda xx: _flat_res(xx))(x)  # (N, D, P)
        s = jnp.sum(r * r, axis=-1)
        w = weight(s) * m  # (N,)
        Jw = J * w[:, None, None]
        JtJ = jnp.einsum("ndp,ndq->pq", Jw, J)
        Jtr = jnp.einsum("ndp,nd->p", Jw, r)
        return JtJ, Jtr

    def body(state):
        x, lam, cost, it, done = state
        JtJ, Jtr = weighted_system(x)
        diag = jnp.diagonal(JtJ)
        damp = jnp.diag(jnp.maximum(diag, 1e-12))

        def try_step(lam_):
            A = JtJ + lam_ * damp
            dx = jnp.linalg.solve(A, -Jtr)
            return dx

        dx = try_step(lam)
        x_new = x + dx
        cost_new = total_cost(x_new)
        bad = (~jnp.isfinite(cost_new)) | (cost_new > cost)
        # Reject: raise lambda; accept: lower it.
        lam = jnp.where(bad, lam * 10.0, jnp.maximum(lam * 0.3, 1e-12))
        x = jnp.where(bad, x, x_new)
        new_cost = jnp.where(bad, cost, cost_new)
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        step_small = jnp.linalg.norm(dx) < xtol * (jnp.linalg.norm(x) + xtol)
        done = ((~bad) & (rel_decrease < ftol)) | step_small | (lam > 1e10)
        return x, lam, new_cost, it + 1, done

    def cond(state):
        _, _, _, it, done = state
        return (it < max_iters) & (~done)

    init_cost = total_cost(x0)
    x, lam, cost, it, done = jax.lax.while_loop(
        cond,
        body,
        (x0, jnp.asarray(init_lambda, dtype), init_cost, jnp.asarray(0), jnp.asarray(False)),
    )
    return LMResult(x=x, cost=cost, iterations=it, converged=done)
