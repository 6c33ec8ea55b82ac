"""Speed-of-light (roofline/MFU) accounting for the four hot kernels.

For each kernel: analytic FLOP and minimum HBM byte counts, measured wall
time on the TPU, achieved TFLOP/s and GB/s, and the fraction of the v5e
peaks. Peaks used (public v5e specs): 197 TFLOP/s bf16 MXU (f32 inputs at
HIGHEST run 6 bf16 passes -> 32.8 TFLOP/s nominal-f32 ceiling), 819 GB/s
HBM. The point is the BOUND each kernel actually sits on: the matcher is
MXU-bound; detection / BA / RANSAC are op-latency- and gather-bound, so
their speed-of-light is set by bytes + dispatch, not FLOPs.

Measurement methodology (the axon tunnel makes naive timing lie twice):
`block_until_ready` without a host fetch returns unrealistically fast, and
any blocking fetch pays a ~30 ms fixed roundtrip. So each kernel runs
k times INSIDE one jitted `lax.fori_loop` (inputs perturbed per iteration
so XLA cannot CSE the repeats) returning a scalar checksum that is fetched;
the reported time is the marginal (t(k2) - t(k1)) / (k2 - k1).

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


def marginal_time(make_looped, k1=2, k2=10, outer=3):
    """Wall time per kernel invocation: jit a k-repeat fori_loop returning a
    scalar checksum (fetched), marginal between k1 and k2 repeats."""
    def timed(k):
        fn = make_looped(k)
        float(fn())  # compile + warm (fetch forces execution)
        best = np.inf
        for _ in range(outer):
            t0 = time.perf_counter()
            float(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(k1), timed(k2)
    return max((t2 - t1) / (k2 - k1), 1e-9)


def bench_matcher():
    """Pallas streaming two-NN matcher: 2*K^2*D FLOPs per pair."""
    from sphericalsfm_tpu.ops.pallas_matching import (
        two_nearest_neighbors_batched,
    )

    B, K, D = 8, 4096, 128
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    d1 = jnp.asarray(rng.normal(size=(B, K, D)), jnp.float32)
    v = jnp.ones((B, K), bool)

    def make_looped(k):
        @jax.jit
        def run():
            def body(i, acc):
                m1, m2, idx = two_nearest_neighbors_batched(
                    d0 + 1e-6 * i.astype(jnp.float32), d1, v, v)
                return acc + jnp.sum(m1)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    t = marginal_time(make_looped) / B
    flops = 2.0 * K * K * D
    bytes_ = 2 * K * D * 4 + K * 12
    return {
        "kernel": "pallas two-NN matcher (K=4096, D=128, per pair)",
        "time_ms": t * 1e3, "flops": flops, "bytes": bytes_,
        "bound": "MXU", "peak": PEAK_BF16, "peak_name": "bf16 MXU",
    }


def bench_detector():
    """DoG/SIFT detection kernel (device-resident): op-latency/sort-bound,
    far from either roof."""
    from sphericalsfm_tpu.ops.features import detect_batch

    Bf, H, W = 8, 480, 640
    rng = np.random.default_rng(0)
    imgs = jnp.asarray((rng.random((Bf, H, W)) * 255).astype(np.uint8))

    def make_looped(k):
        @jax.jit
        def run():
            def body(i, acc):
                r = detect_batch(
                    jnp.bitwise_xor(imgs, i.astype(jnp.uint8)),
                    max_keypoints=1024, num_octaves=4)
                return acc + jnp.sum(r.xy)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    t = marginal_time(make_looped, k1=1, k2=4) / Bf
    hw = 1.33 * H * W
    flops = hw * (5 * 44 + 10) + 1024 * 1600 * (2 * 128 + 20)
    bytes_ = hw * 11 * 4 + 1024 * 1600 * 4
    return {
        "kernel": "DoG/SIFT detect (640x480, 1024 kp, per frame)",
        "time_ms": t * 1e3, "flops": flops, "bytes": bytes_,
        "bound": "op-latency/sorts", "peak": PEAK_BF16,
        "peak_name": "bf16 MXU",
    }


def bench_ba_iter():
    """One damped Schur solve of the dense(scan) path on the bench.py scene:
    FLOPs dominated by the (P,C,6,3)x(P,C,6,3)->(C,C,6,6) contraction;
    everything else is gathers + small ops."""
    from profile_ba_bench import make_bench_scene
    from sphericalsfm_tpu.optim import ba

    prob = make_bench_scene()
    C, P = prob.cam_t.shape[0], prob.points.shape[0]
    K = int(prob.obs_cam.shape[0])
    Tmax = prob.track_obs.shape[1]

    with jax.default_matmul_precision("highest"):
        e, Jf, Jc, Jx = jax.jit(lambda: ba._per_obs_jacobians(
            prob.focal, prob.cam_t, prob.cam_r, prob.points, prob))()
        jax.block_until_ready(e)

        def make_looped(k):
            @jax.jit
            def run():
                def body(i, acc):
                    lam = jnp.float32(1e-4) * (1 + 1e-3 * i)
                    d_f, d_cam, d_pts, md = ba._schur_solve(
                        e, Jf, Jc, Jx, prob, lam, 1.0, jnp.float32)
                    return acc + jnp.sum(d_cam)
                return jax.lax.fori_loop(0, k, body, jnp.float32(0))
            return run

        t = marginal_time(make_looped, k1=1, k2=5)
    D = 6 * C + 1
    flops = (
        2 * P * Tmax * C * 18 * 2 + 2 * P * C * C * 108
        + 2 * K * C * 36 * 3 + D ** 3 / 3
    )
    bytes_ = (P * Tmax * 37 * 4 * 2) + C * C * 36 * 4
    return {
        "kernel": f"BA Schur step dense-scan ({K} obs, {C} cams)",
        "time_ms": t * 1e3, "flops": flops, "bytes": bytes_,
        "bound": "gathers/small-ops (the big MXU contraction alone ~0.3 ms)",
        "peak": PEAK_F32_HIGHEST, "peak_name": "f32(HIGHEST) MXU",
    }


def bench_ransac_pair():
    """One pairwise spherical RANSAC (static 512 hyp, 256 corr):
    VPU/latency-bound by construction (tiny tensors)."""
    from sphericalsfm_tpu.eval.synthetic import make_random_problems
    from sphericalsfm_tpu.ransac.spherical import spherical_ransac

    B, N, M = 64, 256, 512
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prob = make_random_problems(
            jax.random.PRNGKey(0), batch=B, num_corr=N, rotation_deg=2.0,
            point_noise=1.0 / 600.0, dtype=jnp.float32)
    u = jnp.asarray(np.asarray(prob.u), jnp.float32)
    v = jnp.asarray(np.asarray(prob.v), jnp.float32)
    m = jnp.asarray(np.asarray(prob.valid))
    key0 = jax.random.PRNGKey(1)

    def make_looped(k):
        @jax.jit
        def run():
            def body(i, acc):
                keys = jax.random.split(jax.random.fold_in(key0, i), B)
                res = jax.vmap(lambda kk, uu, vv, mm: spherical_ransac(
                    kk, uu, vv, mm,
                    sq_thresh=jnp.float32((2.0 / 600.0) ** 2),
                    num_hypotheses=M))(keys, u, v, m)
                return acc + jnp.sum(res.r)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    t = marginal_time(make_looped, k1=1, k2=3) / B
    flops = 4 * M * N * 45 + M * 1500 + 25 * N * 60
    bytes_ = 4 * M * 9 * 4 + N * 6 * 4
    return {
        "kernel": f"spherical RANSAC pair ({N} corr, {M} hyp)",
        "time_ms": t * 1e3, "flops": flops, "bytes": bytes_,
        "bound": "VPU/latency (tiny tensors)", "peak": PEAK_BF16,
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
        print(f"{r['kernel']:52s} {r['time_ms']:8.3f} ms  "
              f"{r['achieved_tflops']:7.2f} TF/s "
              f"({r['pct_of_peak']:5.2f}% of {r['peak_name']})  "
              f"{r['achieved_gbs']:6.1f} GB/s ({r['pct_of_hbm']:4.1f}% HBM)"
              f"  bound: {r['bound']}", flush=True)
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BASELINE_roofline.json"), "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
