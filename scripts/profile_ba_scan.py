"""Break down the one-hot-scan dense Schur solver (`ba._schur_solve`) piece
by piece on the bench.py scene (TPU) — locating where its ~13 ms goes at the
64-camera bench shape, since the dominant MXU contraction alone is ~0.3 ms.

Usage: python scripts/profile_ba_scan.py
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from profile_ba_bench import make_bench_scene  # noqa: E402
from sphericalsfm_tpu.optim import ba  # noqa: E402
from sphericalsfm_tpu.ops.linalg import inv3x3  # noqa: E402


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt * 1e3:8.3f} ms", flush=True)
    return out


def main():
    print("device:", jax.devices()[0])
    p = make_bench_scene()
    C = p.cam_t.shape[0]
    P = p.points.shape[0]
    lam = jnp.float32(1e-4)
    dtype = jnp.float32
    HI = jax.default_matmul_precision("highest")

    with HI:
        jac = jax.jit(lambda: ba._per_obs_jacobians(
            p.focal, p.cam_t, p.cam_r, p.points, p))
        e, Jf, Jc, Jx = timeit("jacobians", jac)

        wm = jax.jit(lambda e, Jf, Jc, Jx: ba._weight_and_mask(
            e, Jf, Jc, Jx, p, 1.0))
        e_w, Jf_w, Jc_w, Jx_w = timeit("weight+mask", wm, e, Jf, Jc, Jx)

        Tmax = p.track_obs.shape[1]
        tmaskf = p.track_mask.astype(dtype)

        def track_gather(Jx_w, Jc_w, Jf_w, e_w):
            tJx = Jx_w[p.track_obs] * tmaskf[..., None, None]
            tJc = Jc_w[p.track_obs] * tmaskf[..., None, None]
            tJf = Jf_w[p.track_obs][..., 0] * tmaskf[..., None]
            te = e_w[p.track_obs] * tmaskf[..., None]
            return tJx, tJc, tJf, te

        tg = jax.jit(track_gather)
        tJx, tJc, tJf, te = timeit("track gathers (P,T,...)", tg,
                                   Jx_w, Jc_w, Jf_w, e_w)

        def point_blocks(tJx, te, tJc, tJf):
            Hpp = jnp.einsum("ptdi,ptdj->pij", tJx, tJx)
            b_p = jnp.einsum("ptdi,ptd->pi", tJx, te)
            tU = jnp.einsum("ptdi,ptdj->ptij", tJc, tJx)
            tF_slot = jnp.einsum("ptd,ptdj->ptj", tJf, tJx)
            return Hpp, b_p, tU, tF_slot

        pb = jax.jit(point_blocks)
        Hpp, b_p, tU, tF_slot = timeit("point blocks (Hpp,b_p,U,F)", pb,
                                       tJx, te, tJc, tJf)

        def cam_onehot(Jc_w, Jf_w, e_w):
            oh_cam = (p.obs_cam[:, None] == jnp.arange(C)[None, :]).astype(dtype)
            oh_cam = oh_cam * (p.obs_w > 0)[:, None]
            Hcc = jnp.einsum("kc,kdi,kdj->cij", oh_cam, Jc_w, Jc_w)
            b_c = jnp.einsum("kc,kdi,kd->ci", oh_cam, Jc_w, e_w)
            Hfc = jnp.einsum("kc,kd,kdj->cj", oh_cam, Jf_w[..., 0], Jc_w)
            return Hcc, b_c, Hfc

        co = jax.jit(cam_onehot)
        Hcc, b_c, Hfc = timeit("camera one-hot reductions", co, Jc_w, Jf_w, e_w)

        def damp_inv(Hpp):
            Hpp_d = Hpp + jnp.eye(3, dtype=dtype) * (
                lam * jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-12)
            )[..., None, :] * jnp.eye(3, dtype=dtype)
            Hpp_inv = inv3x3(Hpp_d + 1e-18 * jnp.eye(3, dtype=dtype))
            return jnp.where(
                (jnp.sum(p.track_mask, axis=-1) > 0)[:, None, None], Hpp_inv, 0.0)

        di = jax.jit(damp_inv)
        Hpp_inv = timeit("damp + inv3x3", di, Hpp)

        tcam = jnp.where(p.track_mask, p.obs_cam[p.track_obs], C)

        def scan_fill(tU, Hpp_inv, tF_slot, b_p):
            tU_inv = jnp.einsum("ptij,pjk->ptik", tU, Hpp_inv)
            tF_sum = jnp.sum(tF_slot, axis=1)
            tF_inv = jnp.einsum("pi,pij->pj", tF_sum, Hpp_inv)
            chunk = max(128, min(P, (64 << 20) // max(Tmax * C, 1), 4096))
            n_chunks = -(-P // chunk)
            Ppad = n_chunks * chunk

            def pad0(x):
                return jnp.zeros((Ppad,) + x.shape[1:], x.dtype).at[:P].set(x)

            tU_inv_c = pad0(tU_inv).reshape(n_chunks, chunk, Tmax, 6, 3)
            tU_c = pad0(tU).reshape(n_chunks, chunk, Tmax, 6, 3)
            tcam_c = pad0(jnp.where(p.track_mask, tcam, C)).reshape(
                n_chunks, chunk, Tmax)
            tF_inv_c = pad0(tF_inv).reshape(n_chunks, chunk, 3)
            tF_sum_c = pad0(tF_sum).reshape(n_chunks, chunk, 3)
            b_p_c = pad0(b_p).reshape(n_chunks, chunk, 3)

            def chunk_body(carry, xs):
                S_cc, S_fc, S_ff, rc_red, rf_red = carry
                tUi, tUo, tc, tFi, tFs, bp = xs
                oh = (tc[..., None] == jnp.arange(C)[None, None, :]).astype(dtype)
                A = jnp.einsum("ptc,ptix->pcix", oh, tUi)
                B = jnp.einsum("ptc,ptjx->pcjx", oh, tUo)
                S_cc = S_cc - jnp.einsum("pcix,pejx->ceij", A, B)
                S_fc = S_fc - jnp.einsum("px,pejx->ej", tFi, B)
                S_ff = S_ff - jnp.sum(tFi * tFs)
                rc_red = rc_red + jnp.einsum("pcix,px->ci", A, bp)
                rf_red = rf_red + jnp.sum(tFi * bp)
                return (S_cc, S_fc, S_ff, rc_red, rf_red), None

            init = (
                jnp.zeros((C, C, 6, 6), dtype), jnp.zeros((C, 6), dtype),
                jnp.zeros((), dtype), jnp.zeros((C, 6), dtype),
                jnp.zeros((), dtype),
            )
            (S_cc, S_fc, S_ff, rc_red, rf_red), _ = jax.lax.scan(
                chunk_body, init,
                (tU_inv_c, tU_c, tcam_c, tF_inv_c, tF_sum_c, b_p_c))
            return S_cc, S_fc, S_ff, rc_red, rf_red

        sf = jax.jit(scan_fill)
        S_cc, S_fc, S_ff, rc_red, rf_red = timeit(
            "chunked one-hot scan (S fill)", sf, tU, Hpp_inv, tF_slot, b_p)

        # dense factor+solve on a representative SPD system
        rng = np.random.default_rng(0)
        D = 6 * C + 1
        A0 = rng.normal(size=(D, D + 8)).astype(np.float32)
        S_test = jnp.asarray(A0 @ A0.T + D * np.eye(D, dtype=np.float32))
        rhs = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))

        def chol_only(S):
            return jnp.linalg.cholesky(S)

        L = timeit("cholesky (385^2)", jax.jit(chol_only), S_test)

        def tri_solves(L, rhs):
            y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        timeit("2x triangular solve (1 rhs)", jax.jit(tri_solves), L, rhs)

        def cg_dense(S, rhs):
            dscale = jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-12))
            Se = S / dscale[:, None] / dscale[None, :]
            b = rhs / dscale

            def body(st, _):
                x, r, z, pvec, rz = st
                Ap = Se @ pvec
                alpha = rz / jnp.dot(pvec, Ap)
                x = x + alpha * pvec
                r = r - alpha * Ap
                z = r
                rz_new = jnp.dot(r, z)
                beta = rz_new / rz
                return (x, r, z, z + beta * pvec, rz_new), None

            x0 = jnp.zeros_like(b)
            st = (x0, b, b, b, jnp.dot(b, b))
            st, _ = jax.lax.scan(body, st, None, length=40)
            return st[0] / dscale

        timeit("CG-40 on dense S (matvec form)", jax.jit(cg_dense),
               S_test, rhs)

        full = jax.jit(lambda e, Jf, Jc, Jx: ba._schur_solve(
            e, Jf, Jc, Jx, p, lam, 1.0, jnp.float32))
        timeit("schur dense(scan) total", full, e, Jf, Jc, Jx)

        def lm_body_once(f, ct, cr, pts):
            e, Jf, Jc, Jx = ba._per_obs_jacobians(f, ct, cr, pts, p)
            d_f, d_cam, d_pts, md = ba._schur_solve(
                e, Jf, Jc, Jx, p, lam, 1.0, jnp.float32)
            nc = ba.ba_cost(f + d_f, ct + d_cam[:, :3], cr + d_cam[:, 3:],
                            pts + d_pts, p, 1.0)
            return nc, md

        timeit("full LM body (jac+solve+cost)", jax.jit(lm_body_once),
               p.focal, p.cam_t, p.cam_r, p.points)

        # --- slot-major rewrite -------------------------------------------
        st = jax.jit(lambda: ba._build_slot_tables(p, jnp.float32))()
        jax.block_until_ready(st)

        slots_full = jax.jit(lambda f, ct, cr, pts: ba._schur_solve_slots(
            f, ct, cr, pts, st, p, lam, 1.0, jnp.float32))
        timeit("schur slots total", slots_full,
               p.focal, p.cam_t, p.cam_r, p.points)

        def lm_body_slots(f, ct, cr, pts):
            d_f, d_cam, d_pts, md = ba._schur_solve_slots(
                f, ct, cr, pts, st, p, lam, 1.0, jnp.float32)
            nc = ba._ba_cost_slots(f + d_f, ct + d_cam[:, :3],
                                   cr + d_cam[:, 3:], pts + d_pts, st, p, 1.0)
            return nc, md

        timeit("full LM body (slots)", jax.jit(lm_body_slots),
               p.focal, p.cam_t, p.cam_r, p.points)

        # k-repeat fori marginal timing of the slot body (dispatch-floor
        # free): run the body k times chained through the state.
        def k_bodies(f, ct, cr, pts, k):
            def step(_, state):
                f, ct, cr, pts = state
                d_f, d_cam, d_pts, _ = ba._schur_solve_slots(
                    f, ct, cr, pts, st, p, lam, 1.0, jnp.float32)
                # 1e-30 (not 0.0): keeps the solve live against DCE while
                # leaving the state numerically unchanged across steps.
                return (f + 1e-30 * d_f, ct + 1e-30 * d_cam[:, :3],
                        cr + 1e-30 * d_cam[:, 3:], pts + 1e-30 * d_pts)
            f, ct, cr, pts = jax.lax.fori_loop(
                0, k, step, (f, ct, cr, pts))
            return f + jnp.sum(ct) + jnp.sum(cr) + jnp.sum(pts)

        for k in (4, 16):
            fn = jax.jit(partial(k_bodies, k=k))
            out = fn(p.focal, p.cam_t, p.cam_r, p.points)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = fn(p.focal, p.cam_t, p.cam_r, p.points)
            float(out)
            dt = (time.perf_counter() - t0) / reps
            print(f"slots schur x{k} (fori)            "
                  f"{dt * 1e3:8.3f} ms  ({dt * 1e3 / k:.3f}/step)",
                  flush=True)


if __name__ == "__main__":
    main()
