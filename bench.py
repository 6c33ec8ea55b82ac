"""Round benchmark: pairwise spherical RANSAC throughput on TPU.

Measures the pipeline's hot step (estimate_pairwise: batched 3-pt spherical
RANSAC, SURVEY.md §3.1) on the default accelerator backend, and the same
workload on the host CPU backend as the baseline proxy (the reference is a
CPU OpenMP LO-RANSAC; it publishes no numbers — BASELINE.md — so the
measured CPU-vs-TPU ratio on identical work is the comparable).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

import json
import os
import time

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sphericalsfm_tpu  # noqa: E402,F401
from sphericalsfm_tpu.eval.synthetic import make_random_problems  # noqa: E402
from sphericalsfm_tpu.eval.metrics import rotation_error_deg  # noqa: E402
from sphericalsfm_tpu.geometry.so3 import so3_exp  # noqa: E402
from sphericalsfm_tpu.ransac.spherical import spherical_ransac  # noqa: E402

PAIRS = 64
CORR = 256
HYPOTHESES = 512
FOCAL = 600.0


def make_data():
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prob = make_random_problems(
            jax.random.PRNGKey(0), batch=PAIRS, num_corr=CORR,
            rotation_deg=2.0, point_noise=1.0 / FOCAL, dtype=jnp.float32,
        )
    u = np.asarray(prob.u, np.float32)
    v = np.asarray(prob.v, np.float32)
    m = np.asarray(prob.valid)
    R = np.asarray(prob.R, np.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), PAIRS)
    return u, v, m, R, np.asarray(keys)


def bench_backend(device, u, v, m, keys, reps):
    run = jax.jit(
        jax.vmap(
            lambda k, uu, vv, mm: spherical_ransac(
                k, uu, vv, mm,
                sq_thresh=jnp.float32((2.0 / FOCAL) ** 2),
                num_hypotheses=HYPOTHESES,
            )
        ),
        device=device,
    )
    args = [jax.device_put(x, device) for x in (keys, u, v, m)]
    res = run(*args)
    res.r.block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        res = run(*args)
    res.r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return PAIRS / dt, res


def bench_adaptive(device, u, v, m, keys, reps):
    """Adaptive round-based RANSAC (RansacLib termination bound) on the same
    high-inlier sweep — VERDICT item 3's >=2x throughput target."""
    from sphericalsfm_tpu.ransac.spherical import spherical_ransac_adaptive

    run = jax.jit(
        jax.vmap(
            lambda k, uu, vv, mm: spherical_ransac_adaptive(
                k, uu, vv, mm,
                sq_thresh=jnp.float32((2.0 / FOCAL) ** 2),
                round_size=128, max_rounds=HYPOTHESES // 128,
            )
        ),
        device=device,
    )
    args = [jax.device_put(x, device) for x in (keys, u, v, m)]
    res = run(*args)
    res.r.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        res = run(*args)
    res.r.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return PAIRS / dt, res


def bench_ba_scale(device):
    """VERDICT item 1 target: >=2000 cameras / >=1M obs on one chip via the
    matrix-free two-level PCG Schur solve. Returns (iters/s, obs count)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
    from bench_ba_scale import make_ring_scene
    from sphericalsfm_tpu.optim.ba import bundle_adjust

    prob = make_ring_scene(C=2000, W=520, P=131072)
    K = int(np.count_nonzero(np.asarray(prob.obs_w)))
    kw = dict(camera_solver="pcg", solve_dtype_name="float32",
              pcg_rtol=1e-2, pcg_iters=25, ftol=1e-12)
    with jax.default_device(device):
        res = bundle_adjust(prob, max_iters=10, **kw)
        float(res.cost)  # compile + warm (same static max_iters as timed)
        t0 = time.perf_counter()
        res = bundle_adjust(prob, max_iters=10, **kw)
        cost = float(res.cost)
        dt = time.perf_counter() - t0
    return int(res.iterations) / dt, K, cost


def bench_ba(device):
    """Secondary metric: LM iterations/s of the Schur BA on a mid-size map."""
    from sphericalsfm_tpu.optim.ba import BAProblem, bundle_adjust, build_tracks
    from sphericalsfm_tpu.geometry.so3 import so3_exp as _exp

    rng = np.random.default_rng(0)
    C, P = 64, 8000
    phi = np.arange(C) * 2 * np.pi / C
    cam_r = np.stack([np.zeros(C), phi, np.zeros(C)], -1).astype(np.float32)
    cam_t = np.tile([0, 0, -1.0], (C, 1)).astype(np.float32)
    R = np.asarray(_exp(jnp.asarray(cam_r)))
    dirs = rng.normal(size=(P, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = (dirs * rng.uniform(5, 9, (P, 1))).astype(np.float32)
    px = np.einsum("cij,pj->pci", R, pts) + cam_t[None]
    vis = (px[..., 2] > 1.0) & (np.abs(px[..., 0] / px[..., 2]) < 0.8) & (
        np.abs(px[..., 1] / px[..., 2]) < 0.6
    )
    obs_pt, obs_cam = np.nonzero(vis)
    sel = np.ones(len(obs_pt), bool)  # keep all
    obs_pt = obs_pt[sel].astype(np.int32)
    obs_cam = obs_cam[sel].astype(np.int32)
    obs_uv = (
        FOCAL * px[obs_pt, obs_cam, :2] / px[obs_pt, obs_cam, 2:]
        + rng.normal(size=(len(obs_pt), 2)) * 0.5
    ).astype(np.float32)
    cnt = np.bincount(obs_pt, minlength=P)
    w = (cnt[obs_pt] >= 3).astype(np.float32)
    track_obs, track_mask = build_tracks(obs_pt, P, max_track=16)
    track_mask = track_mask & (w[track_obs] > 0)
    prob = BAProblem(
        jnp.float32(FOCAL), jnp.asarray(cam_t),
        jnp.asarray(cam_r + rng.normal(size=cam_r.shape).astype(np.float32) * 0.003),
        jnp.asarray(pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05),
        jnp.asarray(obs_cam), jnp.asarray(obs_pt), jnp.asarray(obs_uv),
        jnp.asarray(w), jnp.asarray(track_obs), jnp.asarray(track_mask),
        jnp.asarray(True), jnp.asarray(np.eye(1, C, 0, dtype=bool)[0]),
        jnp.ones(C, bool), jnp.zeros(P, bool),
    )
    with jax.default_device(device):
        res = bundle_adjust(prob, max_iters=20, solve_dtype_name="float32")
        jax.block_until_ready(res.points)
        t0 = time.perf_counter()
        res = bundle_adjust(prob, max_iters=20, solve_dtype_name="float32")
        jax.block_until_ready(res.points)
        dt = time.perf_counter() - t0
    return int(res.iterations) / dt, len(obs_pt)


def _chip_watchdog(seconds: float = 240.0):
    """Emit a sentinel JSON line and exit if the first device op never
    returns — the axon tunnel can wedge so every client hangs (CLAUDE.md);
    a recorded error beats a silent timeout kill with no output."""
    import threading

    def bail():
        print(json.dumps({
            "metric": "spherical_ransac_pairs_per_s",
            "value": -1.0,
            "unit": "pairs/s",
            "vs_baseline": -1.0,
            "error": f"TPU unresponsive after {seconds:.0f}s "
                     "(axon tunnel wedge) — no measurements taken",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, bail)
    t.daemon = True
    t.start()
    x = jnp.ones((128, 128))
    (x @ x).block_until_ready()  # hangs here if the chip is wedged
    t.cancel()


def main():
    _chip_watchdog()
    u, v, m, R_gt, keys = make_data()
    accel = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    tpu_pairs_per_s, res = bench_backend(accel, u, v, m, keys, reps=10)
    adaptive_pairs_per_s, res_a = bench_adaptive(accel, u, v, m, keys, reps=10)
    cpu_pairs_per_s, _ = bench_backend(cpu, u, v, m, keys, reps=2)
    ba_iters_per_s, ba_obs = bench_ba(accel)
    try:
        ba_scale_ips, ba_scale_obs, ba_scale_cost = bench_ba_scale(accel)
    except Exception as e:  # keep the primary metric if the big run fails
        ba_scale_ips, ba_scale_obs, ba_scale_cost = -1.0, 0, float("nan")
        print(f"# ba_scale failed: {e}", flush=True)

    with jax.default_device(cpu):
        errs = np.asarray(
            rotation_error_deg(so3_exp(np.asarray(res.r, np.float64)),
                               np.asarray(R_gt, np.float64))
        )
        errs_a = np.asarray(
            rotation_error_deg(so3_exp(np.asarray(res_a.r, np.float64)),
                               np.asarray(R_gt, np.float64))
        )
    print(json.dumps({
        "metric": "spherical_ransac_pairs_per_s",
        "value": round(adaptive_pairs_per_s, 2),
        "unit": f"pairs/s ({CORR} corr, adaptive rounds of 128 hyp, f32)",
        "vs_baseline": round(adaptive_pairs_per_s / max(cpu_pairs_per_s, 1e-9), 2),
        "baseline": f"same workload, host CPU backend (static {HYPOTHESES} hyp): {cpu_pairs_per_s:.2f} pairs/s",
        "device": str(accel),
        "median_rot_err_deg": round(float(np.median(errs_a)), 4),
        "static_pairs_per_s": round(tpu_pairs_per_s, 2),
        "static_median_rot_err_deg": round(float(np.median(errs)), 4),
        "adaptive_speedup_vs_static": round(
            adaptive_pairs_per_s / max(tpu_pairs_per_s, 1e-9), 2
        ),
        "ba_lm_iters_per_s": round(ba_iters_per_s, 2),
        "ba_workload": f"{ba_obs} obs, 64 cams, 8000 pts, f32 Schur",
        "ba_scale_lm_iters_per_s": round(ba_scale_ips, 2),
        "ba_scale_workload": (
            f"{ba_scale_obs} obs, 2000 cams, 131072 pts, block-Jacobi PCG "
            f"Schur f32, final cost {ba_scale_cost:.4g}"
        ),
    }))


if __name__ == "__main__":
    main()
