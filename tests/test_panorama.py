"""Stereo panorama subsystem tests: plane RANSAC, optical flow, column
synthesis and the full stitcher on the rendered synthetic capture."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sphericalsfm_tpu.ops.optical_flow import horn_schunck_flow
from sphericalsfm_tpu.ransac.plane import plane_ransac


def test_plane_ransac_with_outliers():
    rng = np.random.default_rng(0)
    n_true, n_out = 80, 20
    normal = np.array([0.2, 0.9, -0.1])
    normal /= np.linalg.norm(normal)
    d = -1.3
    basis = np.linalg.svd(normal[None])[2][1:]
    pts_in = rng.normal(size=(n_true, 2)) @ basis - d * normal
    pts_in += rng.normal(size=pts_in.shape) * 0.002
    pts_out = rng.normal(size=(n_out, 3)) * 3
    pts = np.concatenate([pts_in, pts_out])
    res = plane_ransac(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.ones(len(pts), bool),
        sq_thresh=0.01**2,
    )
    n_est = np.asarray(res.normal)
    if np.dot(n_est, normal) < 0:
        n_est = -n_est
    assert np.arccos(np.clip(np.dot(n_est, normal), -1, 1)) < 0.01
    assert int(res.num_inliers) >= n_true - 2


def test_horn_schunck_recovers_shift():
    rng = np.random.default_rng(1)
    H, W = 96, 128
    base = rng.random((H + 8, W + 8)).astype(np.float32)
    # smooth the random field so it is differentiable-ish
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(base, 2.0)
    base = (base - base.min()) / (base.max() - base.min())
    I0 = base[4 : 4 + H, 4 : 4 + W]
    I1 = base[4 : 4 + H, 1 : 1 + W]  # shift by +3 px in x: I1(x) = I0(x+3)?
    # I1 column x corresponds to base column x+1; I0 col x is base x+4 ⇒
    # feature at I0 x appears at I1 x+3 ⇒ flow u ≈ +3.
    u, v = horn_schunck_flow(jnp.asarray(I0), jnp.asarray(I1),
                             num_levels=3, iters_per_level=80)
    inner_u = np.asarray(u)[20:-20, 20:-20]
    inner_v = np.asarray(v)[20:-20, 20:-20]
    assert abs(np.median(inner_u) - 3.0) < 0.35, np.median(inner_u)
    assert abs(np.median(inner_v)) < 0.3, np.median(inner_v)


def test_full_stitcher_on_rendered_capture(tmp_path):
    """Render a full-circle capture, write GT poses, run the stitcher, and
    check that panoramas are substantially filled and locally consistent."""
    from tests.test_driver import render_capture, FOCAL, W, H
    from sphericalsfm_tpu.pipeline.stereo_panorama import make_stereo_panoramas

    C = 16
    cam_r, cam_t, gray, color = render_capture(num_frames=C, arc=1.0)
    poses = tmp_path / "poses.txt"
    with open(poses, "w") as f:
        for i in range(C):
            vals = list(cam_t[i]) + list(cam_r[i])
            f.write(f"{i} " + " ".join(f"{v:.15f}" for v in vals) + " \n")

    frames = color  # (C, H, W, 3)
    out = tmp_path / "pano"
    sphericals = make_stereo_panoramas(
        str(poses), frames, (FOCAL, W / 2.0, H / 2.0), str(out),
        pano_width=360, nphi=3, is_loop=True, flow_levels=3,
    )
    assert len(sphericals) == 3
    import os

    assert os.path.exists(out / "cylindrical0.png")
    assert os.path.exists(out / "overunder20.png")
    # cylindrical panorama should be mostly filled
    import imageio.v2 as iio

    cyl = iio.imread(out / "cylindrical1.png")
    filled = (cyl.sum(axis=(0, 2)) > 0).mean()
    assert filled > 0.8, filled


def test_circle_views(tmp_path):
    from tests.test_driver import render_capture, FOCAL, W, H
    from sphericalsfm_tpu.pipeline.stereo_panorama import make_circle_views

    C = 12
    cam_r, cam_t, gray, color = render_capture(num_frames=C, arc=1.0)
    poses = tmp_path / "poses.txt"
    with open(poses, "w") as f:
        for i in range(C):
            vals = list(cam_t[i]) + list(cam_r[i])
            f.write(f"{i} " + " ".join(f"{v:.15f}" for v in vals) + " \n")
    out = tmp_path / "views"
    n = make_circle_views(
        str(poses), color, (FOCAL, W / 2.0, H / 2.0), str(out),
        num_views=8, is_loop=True, flow_levels=3,
    )
    assert n >= 6, n
    import imageio.v2 as iio
    import numpy as np

    img = iio.imread(out / "view0000.png")
    assert img.shape == (H, W, 3)
    assert (img.sum(axis=-1) > 0).mean() > 0.5
