"""Fori-marginal breakdown of the slot-major dense Schur step
(`ba._schur_solve_slots`) on the bench scene: each sub-stage is chained
k times inside ONE jit (1e-30 feedback keeps it live), so the number is
true device time with no dispatch floor.

Usage: python scripts/profile_ba_slots.py
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
from sphericalsfm_tpu.ops.linalg import chol3x3, inv3x3  # noqa: E402


def fori_time(name, make_step, x0, k=16, reps=5):
    """make_step(x) -> y with y same structure as x (chained)."""

    def run(x):
        x = jax.lax.fori_loop(0, k, lambda _, s: make_step(s), x)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), x, jnp.float32(0.0))

    fn = jax.jit(run)
    out = fn(x0)
    float(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x0)
    float(out)
    dt = (time.perf_counter() - t0) / reps / k
    print(f"{name:38s} {dt * 1e3:8.3f} ms/step", flush=True)


def main():
    print("device:", jax.devices()[0])
    p = make_bench_scene()
    C = p.cam_t.shape[0]
    P = p.points.shape[0]
    lam = jnp.float32(1e-4)
    dtype = jnp.float32
    HI = jax.default_matmul_precision("highest")

    with HI:
        st = jax.jit(lambda: ba._build_slot_tables(p, dtype))()
        jax.block_until_ready(st)
        Tmax = st.cam.shape[1]
        print(f"scene: C={C} P={P} T={Tmax}")

        # stage 1: jacobians (incl. cam-param gathers)
        def s1(state):
            f, ct, cr, pts = state
            e, Jf, Jc, Jx = ba._slot_jacobians(f, ct, cr, pts, st)
            eps = 1e-30 * jnp.sum(e)
            return (f + eps, ct, cr, pts)

        fori_time("jacobians (slot)", s1,
                  (p.focal, p.cam_t, p.cam_r, p.points))

        # fixed jacobians for the downstream stages
        e, Jf, Jc, Jx = jax.jit(lambda: ba._slot_jacobians(
            p.focal, p.cam_t, p.cam_r, p.points, st))()
        jax.block_until_ready((e, Jf, Jc, Jx))

        from sphericalsfm_tpu.optim.lm import cauchy_weight

        free_f = jnp.where(p.focal_fixed, 0.0, 1.0).astype(dtype)
        free_x = (~p.point_fixed).astype(dtype)
        free_c = jnp.concatenate(
            [jnp.repeat(st.free_t[..., None], 3, -1),
             jnp.repeat(st.free_r[..., None], 3, -1)], axis=-1)

        def weights(e, Jf, Jc, Jx):
            s = jnp.sum(e * e, axis=-1)
            w = cauchy_weight(s, 1.0) * st.w
            sw = jnp.sqrt(w)[..., None]
            e_w = e * sw
            Jf_w = Jf[..., 0] * sw * free_f
            Jc_w = Jc * sw[..., None] * free_c[..., None, :]
            Jx_w = Jx * sw[..., None] * free_x[:, None, None, None]
            return e_w, Jf_w, Jc_w, Jx_w

        def s2(state):
            e, Jf, Jc, Jx = state
            e_w, Jf_w, Jc_w, Jx_w = weights(e, Jf, Jc, Jx)
            eps = 1e-30 * jnp.sum(e_w)
            return (e + eps, Jf, Jc, Jx)

        fori_time("weights+masks", s2, (e, Jf, Jc, Jx))

        e_w, Jf_w, Jc_w, Jx_w = jax.jit(weights)(e, Jf, Jc, Jx)
        jax.block_until_ready((e_w, Jf_w, Jc_w, Jx_w))

        def blocks(e_w, Jf_w, Jc_w, Jx_w):
            Hpp = jnp.sum(Jx_w[..., :, None] * Jx_w[..., None, :],
                          axis=(1, 2))
            b_p = jnp.sum(Jx_w * e_w[..., None], axis=(1, 2))
            tU = jnp.sum(Jc_w[..., :, None] * Jx_w[..., None, :], axis=2)
            tF_slot = jnp.sum(Jf_w[..., None] * Jx_w, axis=2)
            tF_sum = jnp.sum(tF_slot, axis=1)
            Y_cc = jnp.sum(Jc_w[..., :, None] * Jc_w[..., None, :], axis=2)
            y_bc = jnp.sum(Jc_w * e_w[..., None], axis=2)
            y_fc = jnp.sum(Jf_w[..., None] * Jc_w, axis=2)
            return Hpp, b_p, tU, tF_sum, Y_cc, y_bc, y_fc

        def s3(state):
            e_w, Jf_w, Jc_w, Jx_w = state
            out = blocks(e_w, Jf_w, Jc_w, Jx_w)
            eps = 1e-30 * jnp.sum(out[0])
            return (e_w + eps, Jf_w, Jc_w, Jx_w)

        fori_time("point/cam payload blocks", s3, (e_w, Jf_w, Jc_w, Jx_w))

        Hpp, b_p, tU, tF_sum, Y_cc, y_bc, y_fc = jax.jit(blocks)(
            e_w, Jf_w, Jc_w, Jx_w)
        jax.block_until_ready(Hpp)

        def invert(Hpp, b_p, tU, tF_sum):
            Hpp_d = Hpp + jnp.eye(3, dtype=dtype) * (
                lam * jnp.maximum(
                    jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-12)
            )[..., None, :] * jnp.eye(3, dtype=dtype)
            Hpp_inv = inv3x3(Hpp_d + 1e-18 * jnp.eye(3, dtype=dtype))
            Hpp_inv = jnp.where(
                (jnp.sum(st.mask, axis=-1) > 0)[:, None, None], Hpp_inv, 0.0)
            Lp = chol3x3(Hpp_inv)
            q1 = jnp.sum(Hpp_inv * b_p[:, None, :], axis=-1)
            hF = jnp.sum(Hpp_inv * tF_sum[:, None, :], axis=-1)
            W = sum(tU[..., x, None] * Lp[:, None, None, x, :]
                    for x in range(3))
            g_a = sum(tU[..., x] * q1[:, None, None, x] for x in range(3))
            g_f = sum(tU[..., x] * hF[:, None, None, x] for x in range(3))
            return Hpp_inv, W, g_a, g_f

        def s4(state):
            Hpp, b_p, tU, tF_sum = state
            out = invert(Hpp, b_p, tU, tF_sum)
            eps = 1e-30 * jnp.sum(out[0])
            return (Hpp + eps, b_p, tU, tF_sum)

        fori_time("inv3x3 + chol + W/g payloads", s4,
                  (Hpp, b_p, tU, tF_sum))

        Hpp_inv, W, g_a, g_f = jax.jit(invert)(Hpp, b_p, tU, tF_sum)
        jax.block_until_ready(W)

        chunk = max(128, min(P, (64 << 20) // max(Tmax * C, 1), 4096))
        n_chunks = -(-P // chunk)
        Ppad = n_chunks * chunk

        def pad0(x):
            return jnp.zeros((Ppad,) + x.shape[1:], x.dtype).at[:P].set(x)

        def scan_stage(Y_cc, y_bc, y_fc, g_a, g_f, W):
            payload = jnp.concatenate(
                [Y_cc.reshape(P, Tmax, 36), y_bc, y_fc, g_a, g_f], axis=-1)
            pay_c = pad0(payload).reshape(n_chunks, chunk, Tmax, 60)
            W_c = pad0(W.reshape(P, Tmax, 18)).reshape(
                n_chunks, chunk, Tmax, 18)
            cam_c = pad0(st.cam).reshape(n_chunks, chunk, Tmax)

            def chunk_body(carry, xs):
                S_corr, red = carry
                pay, Wk, tc = xs
                oh = (tc[..., None] == jnp.arange(C)[None, None, :]
                      ).astype(dtype)
                red = red + jnp.einsum(
                    "qc,qf->cf", oh.reshape(-1, C), pay.reshape(-1, 60))
                A = jnp.einsum("ptc,ptf->pcf", oh, Wk).reshape(
                    chunk, C, 6, 3)
                S_corr = S_corr + jnp.einsum("pcix,pejx->ceij", A, A)
                return (S_corr, red), None

            (S_corr, red), _ = jax.lax.scan(
                chunk_body,
                (jnp.zeros((C, C, 6, 6), dtype), jnp.zeros((C, 60), dtype)),
                (pay_c, W_c, cam_c))
            return S_corr, red

        def s5(state):
            Y_cc, y_bc, y_fc, g_a, g_f, W = state
            S_corr, red = scan_stage(Y_cc, y_bc, y_fc, g_a, g_f, W)
            eps = 1e-30 * jnp.sum(red)
            return (Y_cc + eps, y_bc, y_fc, g_a, g_f, W)

        fori_time("one-hot scan (payload+syrk)", s5,
                  (Y_cc, y_bc, y_fc, g_a, g_f, W))

        S_corr, red = jax.jit(scan_stage)(Y_cc, y_bc, y_fc, g_a, g_f, W)
        jax.block_until_ready(red)

        Hcc = red[:, :36].reshape(C, 6, 6)
        b_c = red[:, 36:42]

        def solve(S_corr, red):
            Hcc = red[:, :36].reshape(C, 6, 6)
            b_c = red[:, 36:42]
            Hfc = red[:, 42:48]
            rc_red = red[:, 48:54]
            S_fc_corr = red[:, 54:60]
            diagC = jnp.maximum(
                jnp.diagonal(Hcc, axis1=-2, axis2=-1), 1e-12)
            Hcc_d = Hcc + jnp.eye(6, dtype=dtype) * (
                lam * diagC)[..., None, :] * jnp.eye(6, dtype=dtype)
            S_cc = (-S_corr).at[jnp.arange(C), jnp.arange(C)].add(Hcc_d)
            S_fc = Hfc - S_fc_corr
            S_ff = jnp.float32(1.0)
            r_c = b_c - rc_red
            r_f = jnp.float32(0.0)
            return ba._dense_schur_factor_solve(
                S_cc, S_fc, S_ff, r_c, r_f, jnp.float32, dtype, C)

        def s6(state):
            S_corr, red = state
            d_cam, d_f = solve(S_corr, red)
            eps = 1e-30 * jnp.sum(d_cam)
            return (S_corr + eps, red)

        fori_time("assemble + dense solve", s6, (S_corr, red))

        d_cam, d_f = jax.jit(solve)(S_corr, red)
        jax.block_until_ready(d_cam)

        def backsub(d_cam, Jc_w, Jx_w, b_p, Hpp_inv, tF_sum):
            d_cam_pad = jnp.concatenate(
                [d_cam, jnp.zeros((1, 6), dtype)], axis=0)
            dc_s = d_cam_pad[st.cam]
            kappa = jnp.sum(Jc_w * dc_s[..., None, :], axis=-1)
            Wt_dx = jnp.sum(kappa[..., None] * Jx_w, axis=(1, 2))
            rhs_p = -b_p - Wt_dx - tF_sum * d_f
            return jnp.sum(Hpp_inv * rhs_p[:, None, :], axis=-1)

        def s7(state):
            d_cam, Jc_w2, Jx_w2 = state
            d_pts = backsub(d_cam, Jc_w2, Jx_w2, b_p, Hpp_inv, tF_sum)
            eps = 1e-30 * jnp.sum(d_pts)
            return (d_cam + eps, Jc_w2, Jx_w2)

        fori_time("back-substitution", s7, (d_cam, Jc_w, Jx_w))

        # cost eval (slot)
        def s8(state):
            f, ct, cr, pts = state
            c = ba._ba_cost_slots(f, ct, cr, pts, st, p, 1.0)
            return (f + 1e-30 * c, ct, cr, pts)

        fori_time("cost eval (slot)", s8,
                  (p.focal, p.cam_t, p.cam_r, p.points))


if __name__ == "__main__":
    main()
