"""Uncalibrated driver with COLMAP-database input (D2's -colmap branch)."""

import numpy as np

import jax
import jax.numpy as jnp

from sphericalsfm_tpu.config import FrontendConfig, PipelineConfig
from sphericalsfm_tpu.io import ColmapDatabase, write_database
from sphericalsfm_tpu.pipeline.frontend import detect_features, match_pairs
from sphericalsfm_tpu.pipeline.pairwise import all_pairs


def test_uncalibrated_from_colmap_db(tmp_path):
    from tests.test_driver import render_capture, FOCAL, W, H
    from sphericalsfm_tpu.pipeline.driver import run_uncalibrated

    cam_r_gt, cam_t_gt, gray, color = render_capture(num_frames=16, arc=1.0)
    fcfg = FrontendConfig(max_keypoints=512, max_matches_per_pair=384)
    feats = detect_features(gray, color, fcfg)
    pi, pj = all_pairs(len(gray))
    idx0, idx1, mmask = match_pairs(feats, pi, pj, fcfg)

    # Build a COLMAP feature database the way an external tool would: raw
    # keypoints, uint8-style descriptors, per-pair match index arrays.
    kps, descs, matches = [], [], {}
    for f in range(len(gray)):
        n = int(feats.counts[f])
        kps.append(feats.xy[f, :n].astype(np.float32))
        descs.append(np.clip(feats.descriptor[f, :n] * 512.0, 0, 255))
    for p in range(len(pi)):
        sel = mmask[p]
        if sel.sum() < 8:
            continue
        matches[(int(pi[p]), int(pj[p]))] = np.stack(
            [idx0[p][sel], idx1[p][sel]], -1
        ).astype(np.int32)
    db = ColmapDatabase(
        intrinsics=(float((W + H) / 2), W / 2.0, H / 2.0),
        width=W, height=H,
        names=[f"{i:06d}.png" for i in range(len(gray))],
        keypoints=kps, descriptors=descs, matches=matches,
    )
    db_path = str(tmp_path / "features.db")
    write_database(db_path, db)

    cfg = PipelineConfig()
    cfg.ransac.num_hypotheses = 256
    cfg.ransac.min_num_inliers = 25
    cfg.focal.num_trials = 256
    cfg.ba.max_iters = 40
    out = str(tmp_path / "out")
    m, focal = run_uncalibrated(None, out, cfg, colmap_db=db_path)
    assert abs(focal - FOCAL) / FOCAL < 0.12, focal

    import os

    assert os.path.exists(os.path.join(out, "sparse/final/images.txt"))
