"""Worker for the 2-process multi-host test (run as a subprocess).

Each process owns 4 virtual CPU devices; `jax.distributed` joins them into
one 8-device global mesh. The distributed BA's cross-shard reductions then
cross a real process boundary (DCN stand-in), proving SURVEY §5.8's
multi-host path end-to-end.
"""

import json
import os
import sys


def build_problem():
    """Deterministic small spherical BA problem (same on every process)."""
    import numpy as np
    import jax.numpy as jnp
    from sphericalsfm_tpu.optim.ba import BAProblem, build_tracks

    FOCAL = 500.0
    rng = np.random.default_rng(42)
    C, P = 8, 64
    phi = np.arange(C) * 2 * np.pi / C * 0.25
    cam_r = np.stack([np.zeros(C), phi, np.zeros(C)], -1)
    cam_t = np.tile(np.array([0.0, 0.0, -1.0]), (C, 1))
    dirs = rng.normal(size=(P, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = dirs * rng.uniform(5.0, 9.0, size=(P, 1))

    def rodrigues(r):
        th = np.linalg.norm(r, axis=-1, keepdims=True)
        th = np.maximum(th, 1e-30)
        k = r / th
        K = np.zeros(r.shape[:-1] + (3, 3))
        K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
        K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
        K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
        th = th[..., None]
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

    R = rodrigues(cam_r)
    obs_cam, obs_pt, obs_uv = [], [], []
    for i in range(C):
        px = pts @ R[i].T + cam_t[i]
        vis = (px[:, 2] > 1.0) & (np.abs(px[:, 0] / px[:, 2]) < 1.2) & (
            np.abs(px[:, 1] / px[:, 2]) < 1.2
        )
        for j in np.nonzero(vis)[0]:
            obs_cam.append(i)
            obs_pt.append(j)
            obs_uv.append(FOCAL * px[j, :2] / px[j, 2])
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_uv = np.array(obs_uv)
    cnt = np.bincount(obs_pt, minlength=P)
    w = (cnt[obs_pt] >= 3).astype(np.float64)

    pad = (-len(obs_cam)) % 8
    obs_cam = np.pad(obs_cam, (0, pad))
    obs_pt = np.pad(obs_pt, (0, pad))
    obs_uv = np.pad(obs_uv, ((0, pad), (0, 0)))
    w = np.pad(w, (0, pad))

    cam_r_pert = cam_r + rng.normal(size=cam_r.shape) * 0.01
    cam_r_pert[0] = cam_r[0]
    pts_pert = pts + rng.normal(size=pts.shape) * 0.05

    track_obs, track_mask = build_tracks(obs_pt, P)
    track_mask = track_mask & (w[track_obs] > 0)
    rot_fixed = np.zeros(C, bool)
    rot_fixed[0] = True
    return BAProblem(
        focal=jnp.asarray(FOCAL, jnp.float64),
        cam_t=jnp.asarray(cam_t),
        cam_r=jnp.asarray(cam_r_pert),
        points=jnp.asarray(pts_pert),
        obs_cam=jnp.asarray(obs_cam),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_w=jnp.asarray(w),
        track_obs=jnp.asarray(track_obs),
        track_mask=jnp.asarray(track_mask),
        focal_fixed=jnp.asarray(True),
        rot_fixed=jnp.asarray(rot_fixed),
        trans_fixed=jnp.ones(C, bool),
        point_fixed=jnp.zeros(P, bool),
    )


def main():
    out_path = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")
    from sphericalsfm_tpu.parallel.multihost import initialize_distributed

    distributed = initialize_distributed()
    import numpy as np
    from sphericalsfm_tpu.parallel import make_mesh, distributed_bundle_adjust

    p = build_problem()
    mesh = make_mesh()  # spans all global devices (both processes)
    res = distributed_bundle_adjust(mesh, p, max_iters=12)
    # matrix-free PCG camera solve: its per-CG-iteration segment sums and
    # gathers must also partition across the process boundary
    res_pcg = distributed_bundle_adjust(
        mesh, p, max_iters=12, camera_solver="pcg"
    )
    out = {
        "distributed": bool(distributed),
        "process_index": int(jax.process_index()),
        "num_devices": len(jax.devices()),
        "num_local_devices": len(jax.local_devices()),
        "cost": float(res.cost),
        "cam_r": np.asarray(res.cam_r).tolist(),
        "cost_pcg": float(res_pcg.cost),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
