"""NeRF (instant-ngp) transforms.json export.

Capability parity with the reference's scripts/sphericalsfm2json.py: convert
a reconstructed trajectory (poses.txt + calib.txt) into an instant-ngp
`transforms.json` — per-frame sharpness scoring, up-vector alignment,
center-of-attention computation and scale normalization.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

import jax.numpy as jnp

from ..geometry.so3 import np_so3_exp


def read_poses(path: str):
    """poses.txt: index + 6 params (t then r) per line (WritePoses format)."""
    idx, ts, rs = [], [], []
    with open(path) as f:
        for line in f:
            el = line.split()
            if len(el) < 7:
                continue
            idx.append(int(el[0]))
            vals = [float(x) for x in el[1:7]]
            ts.append(vals[:3])
            rs.append(vals[3:])
    return np.asarray(idx), np.asarray(ts), np.asarray(rs)


def read_calib(path: str):
    with open(path) as f:
        vals = [float(x) for x in f.read().split()[:3]]
    return tuple(vals)  # focal, cx, cy


def sharpness(image: np.ndarray) -> float:
    """Variance-of-Laplacian sharpness score (same measure the reference
    uses via cv2.Laplacian)."""
    lap = (
        -4.0 * image[1:-1, 1:-1]
        + image[:-2, 1:-1] + image[2:, 1:-1]
        + image[1:-1, :-2] + image[1:-1, 2:]
    )
    return float(lap.var())


def poses_to_nerf_json(
    ts: np.ndarray,
    rs: np.ndarray,
    focal: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    frame_names: list,
    sharpness_scores=None,
    aabb_scale: int = 4,
) -> dict:
    """Build the instant-ngp transforms dict.

    Steps mirror sphericalsfm2json.py:58-143: camera-to-world matrices with
    the OpenGL-style (y,z flip) convention, rotate the average up-vector to
    +z, recenter on the center of attention, scale to ~4 units.
    """
    R = np_so3_exp(np.asarray(rs, np.float64))
    c2w = np.zeros((len(ts), 4, 4))
    for i in range(len(ts)):
        c2w[i, :3, :3] = R[i].T
        c2w[i, :3, 3] = -R[i].T @ ts[i]
        c2w[i, 3, 3] = 1.0
        # flip the y and z axes (OpenCV -> OpenGL camera convention)
        c2w[i, :3, 1] *= -1
        c2w[i, :3, 2] *= -1

    up = c2w[:, :3, 1].sum(axis=0)
    up /= np.linalg.norm(up)
    Rup = _rotmat_from_to(up, np.array([0.0, 0.0, 1.0]))
    T = np.eye(4)
    T[:3, :3] = Rup
    c2w = T @ c2w

    # center of attention: closest point to all optical axes
    totw = 0.0
    totp = np.zeros(3)
    for i in range(len(c2w)):
        for j in range(len(c2w)):
            if i == j:
                continue
            p, w = _closest_point_2_lines(
                c2w[i, :3, 3], c2w[i, :3, 2], c2w[j, :3, 3], c2w[j, :3, 2]
            )
            if w > 1e-5:
                totp += p * w
                totw += w
    if totw > 0:
        totp /= totw
    c2w[:, :3, 3] -= totp
    avglen = np.mean(np.linalg.norm(c2w[:, :3, 3], axis=-1))
    c2w[:, :3, 3] *= 4.0 / max(avglen, 1e-9)

    frames = []
    for i in range(len(c2w)):
        fr = {
            "file_path": frame_names[i],
            "transform_matrix": c2w[i].tolist(),
        }
        if sharpness_scores is not None:
            fr["sharpness"] = float(sharpness_scores[i])
        frames.append(fr)
    return {
        "camera_angle_x": 2 * math.atan(width / (2 * focal)),
        "camera_angle_y": 2 * math.atan(height / (2 * focal)),
        "fl_x": focal, "fl_y": focal,
        "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0,
        "cx": cx, "cy": cy, "w": width, "h": height,
        "aabb_scale": aabb_scale,
        "frames": frames,
    }


def _rotmat_from_to(a, b):
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.linalg.norm(v) < 1e-12:
        return np.eye(3) if c > 0 else -np.eye(3)
    K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    return np.eye(3) + K + K @ K / (1 + c)


def _closest_point_2_lines(oa, da, ob, db):
    da = da / np.linalg.norm(da)
    db = db / np.linalg.norm(db)
    c = np.cross(da, db)
    denom = np.linalg.norm(c) ** 2
    t = ob - oa
    if denom < 1e-12:
        return (oa + ob) * 0.5, 0.0
    ta = np.linalg.det(np.stack([t, db, c])) / denom
    tb = np.linalg.det(np.stack([t, da, c])) / denom
    ta = max(ta, 0.0)
    tb = max(tb, 0.0)
    return (oa + ta * da + ob + tb * db) * 0.5, denom


def export_nerf(
    poses_path: str, calib_path: str, out_path: str,
    width: int, height: int, frame_pattern: str = "images/%06d.png",
):
    idx, ts, rs = read_poses(poses_path)
    focal, cx, cy = read_calib(calib_path)
    names = [frame_pattern % i for i in idx]
    data = poses_to_nerf_json(ts, rs, focal, cx, cy, width, height, names)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(data, f, indent=2)
    return data
