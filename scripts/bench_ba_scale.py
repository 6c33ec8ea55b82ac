"""Large-scale BA benchmark: the VERDICT item-1 target (≥2000 cameras,
≥1M observations on one chip, no OOM) for the matrix-free PCG Schur solve.

Scene: C cameras on the unit circle (every-frame-is-a-keyframe video regime,
reference sfm.cpp:200-212 SPARSE_SCHUR scale), P points in an annulus around
it, each camera observing a contiguous window of W points — observation table
built camera-major, so it is already camera-sorted for `cam_ptr`.

Usage: python scripts/bench_ba_scale.py [C] [W] [P]
"""

import os
import sys
import time

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

import sphericalsfm_tpu  # noqa: F401
from sphericalsfm_tpu.optim.ba import BAProblem, bundle_adjust, build_tracks


def _rodrigues(r):
    """Numpy Rodrigues — host-side, avoids eager TPU dispatch (each eager op
    pays the axon tunnel's per-call latency; CLAUDE.md)."""
    th = np.linalg.norm(r, axis=-1, keepdims=True)
    th = np.maximum(th, 1e-30)
    k = r / th
    K = np.zeros(r.shape[:-1] + (3, 3))
    K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
    K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
    th = th[..., None]
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def make_ring_scene(C=2000, W=520, P=131072, noise=0.5, seed=0,
                    dtype=np.float32):
    rng = np.random.default_rng(seed)
    FOCAL = 600.0
    phi = np.arange(C) * 2 * np.pi / C
    cam_r = np.stack([np.zeros(C), phi, np.zeros(C)], -1).astype(dtype)
    cam_t = np.tile([0, 0, -1.0], (C, 1)).astype(dtype)

    # point j at azimuth −2πj/P (so camera i≈jC/P sees it head-on)
    theta = -np.arange(P) * 2 * np.pi / P
    rad = rng.uniform(5.0, 9.0, P)
    y = rng.uniform(-1.5, 1.5, P)
    pts = np.stack(
        [rad * np.sin(theta), y, rad * np.cos(theta)], -1
    ).astype(dtype)

    # camera-major observation list: camera i observes the W points centred
    # on index i·P/C (contiguous → obs are sorted by camera by construction)
    centers = (np.arange(C) * (P / C)).astype(np.int64)
    win = np.arange(W) - W // 2
    obs_pt = ((centers[:, None] + win[None, :]) % P).reshape(-1).astype(np.int32)
    obs_cam = np.repeat(np.arange(C, dtype=np.int32), W)

    R = _rodrigues(cam_r.astype(np.float64))
    px = (
        np.einsum("kij,kj->ki", R[obs_cam], pts[obs_pt].astype(np.float64))
        + cam_t[obs_cam]
    )
    good = px[:, 2] > 0.5
    uv = FOCAL * px[:, :2] / np.where(good, px[:, 2], 1.0)[:, None]
    uv = uv + rng.normal(size=uv.shape) * noise
    w = good.astype(dtype)
    cnt = np.bincount(obs_pt, weights=w, minlength=P)
    w = w * (cnt[obs_pt] >= 3)

    track_obs, track_mask = build_tracks(obs_pt, P)
    track_mask = track_mask & (w[track_obs] > 0)
    cam_ptr = np.arange(C + 1, dtype=np.int32) * W

    rot_fixed = np.zeros(C, bool)
    rot_fixed[0] = True
    cam_r_pert = cam_r + rng.normal(size=cam_r.shape).astype(dtype) * 0.002
    cam_r_pert[0] = cam_r[0]
    pts_pert = pts + rng.normal(size=pts.shape).astype(dtype) * 0.03

    return BAProblem(
        focal=jnp.asarray(FOCAL, dtype),
        cam_t=jnp.asarray(cam_t),
        cam_r=jnp.asarray(cam_r_pert),
        points=jnp.asarray(pts_pert),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv.astype(dtype)),
        obs_w=jnp.asarray(w),
        track_obs=jnp.asarray(track_obs),
        track_mask=jnp.asarray(track_mask),
        focal_fixed=jnp.asarray(True),
        rot_fixed=jnp.asarray(rot_fixed),
        trans_fixed=jnp.ones(C, bool),
        point_fixed=jnp.zeros(P, bool),
        cam_ptr=jnp.asarray(cam_ptr),
    )


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 520
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 131072
    t0 = time.perf_counter()
    prob = make_ring_scene(C=C, W=W, P=P)
    K = int(np.count_nonzero(np.asarray(prob.obs_w)))
    print(f"scene: {C} cams, {P} pts, {K} obs "
          f"(built in {time.perf_counter()-t0:.1f}s)", flush=True)

    for coarse, rtol, cap in ((0, 1e-2, 25), (0, 1e-2, 12), (0, 1e-4, 100)):
        kw = dict(camera_solver="pcg", solve_dtype_name="float32",
                  pcg_rtol=rtol, pcg_iters=cap, ftol=1e-12,
                  pcg_coarse=coarse)
        t0 = time.perf_counter()
        res = bundle_adjust(prob, max_iters=15, **kw)
        cost_w = float(res.cost)  # force completion (block lies on axon)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = bundle_adjust(prob, max_iters=15, **kw)
        cost = float(res.cost)
        t_warm = time.perf_counter() - t0
        it = int(res.iterations)
        rms = np.sqrt(2 * cost / max(K, 1) / 2)
        print(f"coarse={coarse} rtol={rtol} cap={cap}: cold {t_cold:.1f}s; "
              f"warm {it} iters in {t_warm:.2f}s -> {it / t_warm:.2f} "
              f"iters/s  cost {float(res.initial_cost):.4g} -> {cost:.6g} "
              f"rms {rms:.3f}px", flush=True)


if __name__ == "__main__":
    main()
