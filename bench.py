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


def main():
    u, v, m, R_gt, keys = make_data()
    accel = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    tpu_pairs_per_s, res = bench_backend(accel, u, v, m, keys, reps=10)
    cpu_pairs_per_s, _ = bench_backend(cpu, u, v, m, keys, reps=2)

    with jax.default_device(cpu):
        errs = np.asarray(
            rotation_error_deg(so3_exp(np.asarray(res.r, np.float64)),
                               np.asarray(R_gt, np.float64))
        )
    print(json.dumps({
        "metric": "spherical_ransac_pairs_per_s",
        "value": round(tpu_pairs_per_s, 2),
        "unit": f"pairs/s ({CORR} corr x {HYPOTHESES} hyp, f32)",
        "vs_baseline": round(tpu_pairs_per_s / max(cpu_pairs_per_s, 1e-9), 2),
        "baseline": f"same workload, host CPU backend: {cpu_pairs_per_s:.2f} pairs/s",
        "device": str(accel),
        "median_rot_err_deg": round(float(np.median(errs)), 4),
    }))


if __name__ == "__main__":
    main()
