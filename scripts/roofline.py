"""Speed-of-light (roofline/MFU) accounting for the four hot kernels.

For each kernel: analytic FLOP and minimum HBM byte counts, measured wall
time on the TPU, achieved TFLOP/s and GB/s, and the fraction of the v5e
peaks. Peaks used (public v5e specs): 197 TFLOP/s bf16 MXU (f32 inputs at
HIGHEST run 6 bf16 passes -> 32.8 TFLOP/s nominal-f32 ceiling), 819 GB/s
HBM. The point is the BOUND each kernel actually sits on: the matcher is
MXU-bound; detection / BA / RANSAC are op-latency- and gather-bound, so
their speed-of-light is set by bytes + dispatch, not FLOPs.

Writes a markdown table to stdout and a JSON blob to
BASELINE_roofline.json.

Usage: python scripts/roofline.py
"""

import json
import os
import sys
import time

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

PEAK_BF16 = 197e12        # v5e MXU, bf16
PEAK_F32_HIGHEST = PEAK_BF16 / 6.0  # 6-pass f32 emulation
PEAK_HBM = 819e9          # bytes/s


def _timeit(fn, reps=10):
    fn()  # compile/warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def bench_matcher():
    """Pallas streaming two-NN matcher: 2*K^2*D FLOPs per pair, marginal
    cost between two batch sizes (cancels the fixed tunnel latency)."""
    from sphericalsfm_tpu.ops.pallas_matching import (
        two_nearest_neighbors_batched,
    )

    K, D = 4096, 128
    rng = np.random.default_rng(0)

    def run(B):
        d0 = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
        d1 = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
        v = jnp.ones((B, K), bool)
        f = jax.jit(lambda a, b, va, vb: two_nearest_neighbors_batched(
            a, b, va, vb))
        t = _timeit(lambda: jax.block_until_ready(f(d0, d1, v, v)), reps=5)
        return t

    t8, t32 = run(8), run(32)
    per_pair = (t32 - t8) / 24.0
    flops = 2.0 * K * K * D
    bytes_ = 2 * K * D * 4 + K * 16  # descriptors in + match outputs
    return {
        "kernel": "pallas two-NN matcher (K=4096, D=128)",
        "time_ms": per_pair * 1e3,
        "flops": flops,
        "bytes": bytes_,
        "bound": "MXU",
        "peak": PEAK_BF16,
        "peak_name": "bf16 MXU",
    }


def bench_detector():
    """DoG/SIFT detection kernel (device-resident, no transfers): FLOPs are
    the pyramid blurs + DoG + descriptor contractions; the kernel is
    op-latency/sort-bound, far from either roof."""
    from sphericalsfm_tpu.ops.features import detect_batch

    Bf, H, W = 8, 480, 640
    rng = np.random.default_rng(0)
    imgs = jax.device_put((rng.random((Bf, H, W)) * 255).astype(np.uint8))
    t = _timeit(
        lambda: jax.block_until_ready(
            detect_batch(imgs, max_keypoints=1024, num_octaves=4)
        ),
        reps=5,
    ) / Bf
    # analytic: 4 octaves x 5 separable blurs (avg radius ~5 -> 44 FLOP/px)
    # on sum(1/4^o) ~ 1.33 HW, DoG diffs, 1024 descriptors x 40x40 patch x
    # one-hot (128-bin) contractions
    hw = 1.33 * H * W
    flops = hw * (5 * 44 + 10) + 1024 * 1600 * (2 * 128 + 20)
    bytes_ = hw * 11 * 4 + 1024 * 1600 * 4  # pyramid stacks + patches
    return {
        "kernel": "DoG/SIFT detect (640x480, 1024 kp)",
        "time_ms": t * 1e3,
        "flops": flops,
        "bytes": bytes_,
        "bound": "op-latency/sorts",
        "peak": PEAK_BF16,
        "peak_name": "bf16 MXU",
    }


def bench_ba_iter():
    """One LM iteration of the dense(scan) Schur solver on the bench.py
    scene: FLOPs dominated by the (P,C,6,3)x(P,C,6,3)->(C,C,6,6) Schur
    contraction; everything else is gathers + small ops."""
    from profile_ba_bench import make_bench_scene
    from sphericalsfm_tpu.optim import ba

    prob = make_bench_scene()
    C, P = prob.cam_t.shape[0], prob.points.shape[0]
    K = int(prob.obs_cam.shape[0])
    Tmax = prob.track_obs.shape[1]
    lam = jnp.float32(1e-4)
    with jax.default_matmul_precision("highest"):
        jac = jax.jit(lambda: ba._per_obs_jacobians(
            prob.focal, prob.cam_t, prob.cam_r, prob.points, prob))
        e, Jf, Jc, Jx = jac()
        solve = jax.jit(lambda e, Jf, Jc, Jx: ba._schur_solve(
            e, Jf, Jc, Jx, prob, lam, 1.0, jnp.float32))
        t = _timeit(lambda: jax.block_until_ready(solve(e, Jf, Jc, Jx)),
                    reps=10)
    D = 6 * C + 1
    flops = (
        2 * P * Tmax * C * 18 * 2      # one-hot aggregates A, B
        + 2 * P * C * C * 108          # Schur off-diagonal contraction
        + 2 * K * C * 36 * 3           # camera-side one-hots (Hcc, b, Hfc)
        + D ** 3 / 3                   # Cholesky
    )
    bytes_ = (P * Tmax * (18 + 18 + 1) * 4 * 2) + C * C * 36 * 4
    return {
        "kernel": f"BA Schur step dense-scan ({K} obs, {C} cams)",
        "time_ms": t * 1e3,
        "flops": flops,
        "bytes": bytes_,
        "bound": "gathers/small-ops (MXU contraction itself ~0.3 ms)",
        "peak": PEAK_F32_HIGHEST,
        "peak_name": "f32(HIGHEST) MXU",
    }


def bench_ransac_pair():
    """One pairwise spherical RANSAC (static 512 hyp, 256 corr): FLOPs are
    the 2048-candidate x 256-point Sampson scoring + 3pt solves; VPU/
    latency-bound by construction (tiny tensors)."""
    from sphericalsfm_tpu.eval.synthetic import make_random_problems
    from sphericalsfm_tpu.ransac.spherical import spherical_ransac

    B, N, M = 64, 256, 512
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prob = make_random_problems(
            jax.random.PRNGKey(0), batch=B, num_corr=N, rotation_deg=2.0,
            point_noise=1.0 / 600.0, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    f = jax.jit(jax.vmap(lambda k, u, v, m: spherical_ransac(
        k, u, v, m, sq_thresh=jnp.float32((2.0 / 600.0) ** 2),
        num_hypotheses=M)))
    args = (keys, jnp.asarray(prob.u, jnp.float32),
            jnp.asarray(prob.v, jnp.float32), jnp.asarray(prob.valid))
    t = _timeit(lambda: jax.block_until_ready(f(*args)), reps=10) / B
    flops = 4 * M * N * 45 + M * 1500 + 25 * N * 60  # score + solve + refine
    bytes_ = 4 * M * 9 * 4 + N * 6 * 4
    return {
        "kernel": f"spherical RANSAC pair ({N} corr, {M} hyp)",
        "time_ms": t * 1e3,
        "flops": flops,
        "bytes": bytes_,
        "bound": "VPU/latency (tiny tensors)",
        "peak": PEAK_BF16,
        "peak_name": "bf16 MXU",
    }


def main():
    print("device:", jax.devices()[0])
    rows = []
    for fn in (bench_matcher, bench_detector, bench_ba_iter,
               bench_ransac_pair):
        r = fn()
        dt = r["time_ms"] / 1e3
        r["achieved_tflops"] = r["flops"] / dt / 1e12
        r["achieved_gbs"] = r["bytes"] / dt / 1e9
        r["pct_of_peak"] = 100.0 * r["flops"] / dt / r["peak"]
        r["pct_of_hbm"] = 100.0 * r["bytes"] / dt / PEAK_HBM
        rows.append(r)
        print(f"{r['kernel']:48s} {r['time_ms']:8.3f} ms  "
              f"{r['achieved_tflops']:7.2f} TF/s "
              f"({r['pct_of_peak']:5.2f}% of {r['peak_name']})  "
              f"{r['achieved_gbs']:6.1f} GB/s ({r['pct_of_hbm']:4.1f}% HBM)"
              f"  bound: {r['bound']}", flush=True)
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BASELINE_roofline.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
