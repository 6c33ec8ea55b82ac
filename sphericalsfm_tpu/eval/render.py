"""Synthetic capture renderer for end-to-end evaluation.

Ray-casts a band-limited random 3D texture on a sphere from cameras on the
unit circle (spherical capture geometry) — real parallax and dense texture,
the CPU-testable stand-in for the PhoneSweep sequences the reference
evaluates on (scripts/evaluate_sfm_relative.py; dataset not fetchable in
this environment).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..geometry.so3 import so3_exp


def render_capture(
    num_frames: int = 16,
    arc: float = 1.0,
    focal: float = 260.0,
    width: int = 320,
    height: int = 240,
    seed: int = 7,
    sphere_radius: float = 8.0,
    inward: bool = False,
    n_waves: int = 600,
):
    """Returns (cam_r (F,3) world→camera axis-angle, cam_t (F,3), gray
    (F,H,W) float32 in [0,1], color (F,H,W,3) uint8)."""
    rng = np.random.default_rng(seed)
    wdir = rng.normal(size=(n_waves, 3))
    wdir /= np.linalg.norm(wdir, axis=-1, keepdims=True)
    wvec = wdir * rng.uniform(1.0, 25.0, (n_waves, 1))
    phase = rng.uniform(0, 2 * np.pi, n_waves)
    amp = rng.uniform(0.3, 1.0, n_waves) / np.sqrt(n_waves)

    phi = np.arange(num_frames) * 2 * np.pi * arc / num_frames
    cam_r = np.stack([np.zeros(num_frames), phi, np.zeros(num_frames)], -1)
    tz = 1.0 if inward else -1.0
    cam_t = np.tile([0.0, 0.0, tz], (num_frames, 1))
    R = np.asarray(so3_exp(jnp.asarray(cam_r)))

    ys, xs = np.mgrid[0:height, 0:width]
    dirs_cam = np.stack(
        [
            (xs - width / 2) / focal,
            (ys - height / 2) / focal,
            np.ones_like(xs, float),
        ],
        -1,
    )
    r2 = sphere_radius * sphere_radius
    frames = []
    for i in range(num_frames):
        center = -R[i].T @ cam_t[i]
        d = dirs_cam @ R[i]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        cd = d @ center
        tt = -cd[..., None] + np.sqrt(
            np.maximum((cd**2 - (center @ center) + r2), 0.0)[..., None]
        )
        p = center + d * tt
        # one (HW, n_waves) matmul instead of a python loop over waves
        tex = (np.cos(p.reshape(-1, 3) @ wvec.T + phase) @ amp).reshape(
            p.shape[:2])
        tex = (tex - tex.min()) / max(tex.max() - tex.min(), 1e-9)
        frames.append(tex.astype(np.float32))
    gray = np.stack(frames)
    color = (gray[..., None] * 255).astype(np.uint8).repeat(3, axis=-1)
    return cam_r, cam_t, gray, color
