"""Fori-marginal timing of the FULL slot-major LM body (Schur step + cost
eval chained through the state) — the number that bounds ba_lm_iters_per_s.

Usage: python scripts/profile_slots_full.py [k ...]
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from profile_ba_bench import make_bench_scene  # noqa: E402
from sphericalsfm_tpu.optim import ba  # noqa: E402


def main():
    ks = [int(a) for a in sys.argv[1:]] or [4, 16]
    print("device:", jax.devices()[0], flush=True)
    p = make_bench_scene()
    lam = jnp.float32(1e-4)
    HI = jax.default_matmul_precision("highest")

    with HI:
        st = jax.jit(lambda: ba._build_slot_tables(p, jnp.float32))()
        jax.block_until_ready(st)

        def step_only(_, state):
            f, ct, cr, pts = state
            d_f, d_cam, d_pts, _ = ba._schur_solve_slots(
                f, ct, cr, pts, st, p, lam, 1.0, jnp.float32)
            return (f + 1e-30 * d_f, ct + 1e-30 * d_cam[:, :3],
                    cr + 1e-30 * d_cam[:, 3:], pts + 1e-30 * d_pts)

        def body_full(_, state):
            f, ct, cr, pts = state
            d_f, d_cam, d_pts, md = ba._schur_solve_slots(
                f, ct, cr, pts, st, p, lam, 1.0, jnp.float32)
            nc = ba._ba_cost_slots(
                f + d_f, ct + d_cam[:, :3], cr + d_cam[:, 3:],
                pts + d_pts, st, p, 1.0)
            return (f + 1e-30 * (d_f + nc + md), ct + 1e-30 * d_cam[:, :3],
                    cr + 1e-30 * d_cam[:, 3:], pts + 1e-30 * d_pts)

        for name, body in [("schur step", step_only),
                           ("LM body (step+cost)", body_full)]:
            for k in ks:
                def run(f, ct, cr, pts):
                    f, ct, cr, pts = jax.lax.fori_loop(
                        0, k, body, (f, ct, cr, pts))
                    return f + jnp.sum(ct) + jnp.sum(cr) + jnp.sum(pts)

                fn = jax.jit(run)
                out = fn(p.focal, p.cam_t, p.cam_r, p.points)
                jax.block_until_ready(out)
                reps = 5
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = fn(p.focal, p.cam_t, p.cam_r, p.points)
                float(out)
                dt = (time.perf_counter() - t0) / reps
                print(f"{name:24s} x{k:<3d} {dt * 1e3:8.3f} ms "
                      f"({dt * 1e3 / k:.3f}/step)", flush=True)


if __name__ == "__main__":
    main()
