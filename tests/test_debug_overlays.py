"""Reprojection-overlay debug artifact (reference show_reprojection_error,
spherical_sfm_tools.cpp:957-1005): JPEGs exist, observed pixels get colored
dots, error colormap clamps."""

import os
from types import SimpleNamespace

import numpy as np


def _tiny_map():
    # two cameras, three points straight ahead; obs centered coordinates
    pts = np.array([[0.0, 0, 5], [0.5, 0.2, 6], [-0.4, -0.3, 5.5]])
    obs_cam = np.array([0, 0, 0, 1, 1, 1], np.int32)
    obs_pt = np.array([0, 1, 2, 0, 1, 2], np.int32)
    f = 100.0
    proj = f * pts[obs_pt][:, :2] / pts[obs_pt][:, 2:]
    obs_uv = proj + np.array([[0.0, 0], [1, 0], [20, 0]] * 2)  # one big err
    m = SimpleNamespace(
        intrinsics=SimpleNamespace(focal=f, cx=64.0, cy=48.0),
        cam_t=np.zeros((2, 3)),
        cam_r=np.zeros((2, 3)),
        points=pts,
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_uv=obs_uv,
        obs_valid=np.ones(6, bool),
        num_cameras=2,
    )
    m.reprojection_errors = lambda: np.linalg.norm(
        proj - obs_uv, axis=-1)
    return m


def test_write_reprojection_overlays(tmp_path):
    from sphericalsfm_tpu.pipeline.debug import write_reprojection_overlays

    m = _tiny_map()
    frames = np.full((2, 96, 128), 0.5, np.float32)  # float gray like frontend
    n = write_reprojection_overlays(m, frames, str(tmp_path))
    assert n == 2
    import cv2

    img = cv2.imread(str(tmp_path / "reproj000000.jpg"))
    assert img is not None and img.shape == (96, 128, 3)
    # dots were drawn: some pixels differ from the gray background
    assert (np.abs(img.astype(int) - 128) > 40).any()
    # the zero-error dot is yellow (B~0,G~255,R~255), the 20px-error dot red
    assert os.path.exists(tmp_path / "reproj000001.jpg")
