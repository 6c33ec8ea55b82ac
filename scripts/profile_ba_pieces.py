"""Micro-profile the BA step's pieces on the bench.py scene (TPU).

Times each stage of the three camera solvers separately (jacobians, O(K)
reduced assembly, pairs off-diagonal fill, dense factor+solve, PCG loop,
back-substitution) to locate where dense_pairs loses its 2.4x vs the
one-hot-scan dense solver on short-track maps.

Usage: python scripts/profile_ba_pieces.py
"""

import os
import sys
import time

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from profile_ba_bench import make_bench_scene  # noqa: E402
from sphericalsfm_tpu.optim import ba  # noqa: E402


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:8.3f} ms", flush=True)
    return out


def main():
    print("device:", jax.devices()[0])
    prob = make_bench_scene()
    p = ba.sort_obs_by_camera(prob)
    p = ba.build_cc_pairs(p)
    lam = jnp.float32(1e-4)
    HI = jax.default_matmul_precision("highest")

    with HI:
        jac = jax.jit(lambda: ba._per_obs_jacobians(
            p.focal, p.cam_t, p.cam_r, p.points, p))
        e, Jf, Jc, Jx = timeit("jacobians", jac)

        asm = jax.jit(lambda e, Jf, Jc, Jx: ba._assemble_reduced(
            e, Jf, Jc, Jx, p, lam, 1.0, jnp.float32))
        rs = timeit("assemble_reduced (O(K))", asm, e, Jf, Jc, Jx)

        C = p.cam_t.shape[0]

        def pairs_fill(U, Hpp_inv, free_c):
            Ua = U[p.cc_pair_a]
            Ub = U[p.cc_pair_b]
            Hpi_ab = Hpp_inv[p.obs_pt[p.cc_pair_a]]
            Mab = jnp.einsum("nix,nxy,njy->nij", Ua, Hpi_ab, Ub).reshape(-1, 36)
            off = ba._sorted_segment_sum(Mab, p.cc_ptr).reshape(C, C, 6, 6)
            off = off * (free_c[:, None, :, None] * free_c[None, :, None, :])
            return -(off + jnp.transpose(off, (1, 0, 3, 2)))

        pf = jax.jit(pairs_fill)
        timeit("pairs fill (einsum)", pf, rs.U, rs.Hpp_inv, rs.free_c)

        def pairs_fill_vpu(U, Hpp_inv, free_c):
            Ua = U[p.cc_pair_a]
            Ub = U[p.cc_pair_b]
            Hpi_ab = Hpp_inv[p.obs_pt[p.cc_pair_a]]
            tmp = jnp.sum(Ua[:, :, :, None] * Hpi_ab[:, None, :, :], axis=2)
            Mab = jnp.sum(
                tmp[:, :, None, :] * Ub[:, None, :, :], axis=3
            ).reshape(-1, 36)
            off = ba._sorted_segment_sum(Mab, p.cc_ptr).reshape(C, C, 6, 6)
            off = off * (free_c[:, None, :, None] * free_c[None, :, None, :])
            return -(off + jnp.transpose(off, (1, 0, 3, 2)))

        pfv = jax.jit(pairs_fill_vpu)
        timeit("pairs fill (vpu bcast)", pfv, rs.U, rs.Hpp_inv, rs.free_c)

        def segsum_only(Mab):
            return ba._sorted_segment_sum(Mab, p.cc_ptr)

        Mab0 = jnp.zeros((p.cc_pair_a.shape[0], 36), jnp.float32)
        timeit("  of which segsum(C^2 segs)", jax.jit(segsum_only), Mab0)

        full_pairs = jax.jit(lambda e, Jf, Jc, Jx: ba._schur_solve_dense_pairs(
            e, Jf, Jc, Jx, p, lam, 1.0, jnp.float32))
        timeit("schur dense_pairs total", full_pairs, e, Jf, Jc, Jx)

        full_dense = jax.jit(lambda e, Jf, Jc, Jx: ba._schur_solve(
            e, Jf, Jc, Jx, prob, lam, 1.0, jnp.float32))
        timeit("schur dense(scan) total", full_dense, e, Jf, Jc, Jx)

        full_pcg = jax.jit(lambda e, Jf, Jc, Jx: ba._schur_solve_pcg(
            e, Jf, Jc, Jx, p, lam, 1.0, jnp.float32, 25, 1e-2, 0))
        timeit("schur pcg(25) total", full_pcg, e, Jf, Jc, Jx)

        cost = jax.jit(lambda: ba.ba_cost(
            p.focal, p.cam_t, p.cam_r, p.points, p, 1.0))
        timeit("cost eval", cost)


if __name__ == "__main__":
    main()
