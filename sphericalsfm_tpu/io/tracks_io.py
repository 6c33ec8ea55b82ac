"""Feature-track caching: keyframes.txt + features.dat + matches.dat.

Capability parity with the reference's write_feature_tracks /
read_feature_tracks (/root/reference/examples/spherical_sfm_io.cpp:10-145):
a text keyframe index, a binary per-keyframe feature file (x, y then the
128-float descriptor per feature) and a binary match file (pair indices,
match count, index pairs, then the 3×3 relative rotation). These files are
the reference pipeline's detection/matching checkpoint; the same layout is
written here so runs can resume and artifacts interoperate.
"""

from __future__ import annotations

import os
import struct

import numpy as np


def write_feature_tracks(
    out_dir: str,
    frame_indices,              # (F,) original frame numbers
    keypoints,                  # list/array of (K_f, 2)
    descriptors,                # list/array of (K_f, 128) float32
    pair_i, pair_j,             # (P,)
    matches,                    # list of (M_p, 2) int index pairs
    rotations,                  # (P, 3, 3) relative rotations
):
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "keyframes.txt"), "w") as f:
        for idx in frame_indices:
            f.write(f"{int(idx)}\n")

    with open(os.path.join(out_dir, "features.dat"), "wb") as f:
        f.write(struct.pack("<q", len(keypoints)))
        for kp, d in zip(keypoints, descriptors):
            kp = np.asarray(kp, np.float32)
            d = np.asarray(d, np.float32)
            f.write(struct.pack("<q", len(kp)))
            for i in range(len(kp)):
                f.write(struct.pack("<ff", float(kp[i, 0]), float(kp[i, 1])))
                f.write(d[i].tobytes())

    with open(os.path.join(out_dir, "matches.dat"), "wb") as f:
        f.write(struct.pack("<q", len(pair_i)))
        for p in range(len(pair_i)):
            m = np.asarray(matches[p], np.int64)
            f.write(struct.pack("<qqq", int(pair_i[p]), int(pair_j[p]), len(m)))
            for a, b in m:
                f.write(struct.pack("<qq", int(a), int(b)))
            R = np.asarray(rotations[p], np.float64)
            f.write(R.tobytes())


def read_feature_tracks(out_dir: str):
    """Returns (frame_indices, keypoints, descriptors, pair_i, pair_j,
    matches, rotations)."""
    with open(os.path.join(out_dir, "keyframes.txt")) as f:
        frame_indices = np.array([int(x) for x in f.read().split()], np.int64)

    keypoints, descriptors = [], []
    with open(os.path.join(out_dir, "features.dat"), "rb") as f:
        (nf,) = struct.unpack("<q", f.read(8))
        for _ in range(nf):
            (k,) = struct.unpack("<q", f.read(8))
            kp = np.zeros((k, 2), np.float32)
            d = np.zeros((k, 128), np.float32)
            for i in range(k):
                kp[i] = struct.unpack("<ff", f.read(8))
                d[i] = np.frombuffer(f.read(512), np.float32)
            keypoints.append(kp)
            descriptors.append(d)

    pair_i, pair_j, matches, rotations = [], [], [], []
    with open(os.path.join(out_dir, "matches.dat"), "rb") as f:
        (np_, ) = struct.unpack("<q", f.read(8))
        for _ in range(np_):
            a, b, m = struct.unpack("<qqq", f.read(24))
            pair_i.append(a)
            pair_j.append(b)
            arr = np.frombuffer(f.read(16 * m), np.int64).reshape(-1, 2).copy()
            matches.append(arr)
            R = np.frombuffer(f.read(72), np.float64).reshape(3, 3).copy()
            rotations.append(R)
    return (
        frame_indices, keypoints, descriptors,
        np.array(pair_i, np.int64), np.array(pair_j, np.int64),
        matches, np.stack(rotations) if rotations else np.zeros((0, 3, 3)),
    )
