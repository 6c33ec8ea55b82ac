"""End-to-end pipeline slice on a synthetic circular capture (SURVEY.md §7.5):
synthetic features → matching → pairwise spherical RANSAC → rotation init →
tracks → retriangulation → spherical BA → near-zero ATE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sphericalsfm_tpu.geometry import Intrinsics, so3_exp
from sphericalsfm_tpu.eval.metrics import ate, rotation_error_deg
from sphericalsfm_tpu.optim.pose_graph import (
    RotationGraph,
    initialize_rotations_sequential,
    optimize_rotations,
)
from sphericalsfm_tpu.ops.matching import match_pair
from sphericalsfm_tpu.pipeline import (
    SfMMap,
    all_pairs,
    build_feature_tracks,
    estimate_pairwise,
    filter_triplet_cycles,
    largest_connected_component,
)

FOCAL, W, H = 500.0, 800, 600


def synth_capture(seed=0, C=10, P=3000, noise_px=0.3, loop_fraction=1.0):
    """Cameras on the unit circle, random far points, per-frame keypoints.

    Returns gt rotations, keypoint table (C, Kmax, 2), per-frame point id of
    each keypoint (for synthetic 'descriptor' matching), counts.
    """
    rng = np.random.default_rng(seed)
    phi = np.arange(C) * 2 * np.pi * loop_fraction / C
    cam_r = np.stack([np.zeros(C), phi, np.zeros(C)], -1)
    cam_t = np.tile([0.0, 0.0, -1.0], (C, 1))
    dirs = rng.normal(size=(P, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = dirs * rng.uniform(5, 9, size=(P, 1))
    R = np.asarray(so3_exp(jnp.asarray(cam_r)))

    kps = np.zeros((C, P, 2))
    ids = np.full((C, P), -1, np.int64)
    counts = np.zeros(C, np.int64)
    for i in range(C):
        px = pts @ R[i].T + cam_t[i]
        vis = (px[:, 2] > 1.0) & (np.abs(px[:, 0] / px[:, 2]) < W / (2 * FOCAL)) & (
            np.abs(px[:, 1] / px[:, 2]) < H / (2 * FOCAL)
        )
        sel = np.nonzero(vis)[0]
        uv = FOCAL * px[sel, :2] / px[sel, 2:3] + np.array([W / 2, H / 2])
        uv += rng.normal(size=uv.shape) * noise_px
        k = len(sel)
        kps[i, :k] = uv
        ids[i, :k] = sel
        counts[i] = k
    return cam_r, cam_t, pts, kps, ids, counts


def synth_matches(ids, counts, pair_i, pair_j):
    """Ground-truth correspondence matching by point id (stands in for the
    descriptor matcher in this geometric end-to-end test)."""
    out = []
    for a, b in zip(pair_i, pair_j):
        ia = ids[a, : counts[a]]
        ib = ids[b, : counts[b]]
        common, ka, kb = np.intersect1d(ia, ib, return_indices=True)
        out.append((ka.astype(np.int32), kb.astype(np.int32)))
    return out


def test_end_to_end_synthetic_circle():
    # 20 frames over the full circle: 18° steps against a ~77° FOV leave
    # enough 3+-frame overlap for real tracks (at 10 frames the triple
    # overlap is a 5° sliver and nothing triangulates).
    C = 20
    cam_r_gt, cam_t_gt, pts_gt, kps, ids, counts = synth_capture(C=C)
    pair_i, pair_j = all_pairs(C)
    matches = synth_matches(ids, counts, pair_i, pair_j)

    from sphericalsfm_tpu.pipeline import pad_match_table

    idx0, idx1, mmask = pad_match_table(matches)
    intr = Intrinsics(jnp.asarray(FOCAL), jnp.asarray(W / 2.0), jnp.asarray(H / 2.0))
    pw = estimate_pairwise(
        jax.random.PRNGKey(0), kps, pair_i, pair_j, idx0, idx1, mmask, intr,
        inlier_threshold_px=2.0, min_num_inliers=20, num_hypotheses=256,
    )
    assert pw.keep.sum() >= C - 1
    assert pw.loop_closure_count > 0

    # view-graph hygiene
    keep = filter_triplet_cycles(pair_i, pair_j, pw.r, pw.keep)
    frames, remap = largest_connected_component(C, pair_i, pair_j, keep)
    assert len(frames) == C

    # rotation init + averaging
    g = RotationGraph(
        edge_i=jnp.asarray(pair_i), edge_j=jnp.asarray(pair_j),
        r_meas=jnp.asarray(pw.r), edge_w=jnp.asarray(keep.astype(float)),
    )
    rot0 = initialize_rotations_sequential(C, g)
    rots, _ = optimize_rotations(rot0, g)
    R_gt = so3_exp(jnp.asarray(cam_r_gt))
    R_est = so3_exp(rots)
    rel_errs = np.asarray(
        rotation_error_deg(R_est @ jnp.swapaxes(R_est[:1], -1, -2),
                           R_gt @ jnp.swapaxes(R_gt[:1], -1, -2))
    )
    assert np.max(rel_errs) < 0.5, rel_errs

    # tracks from pairwise inliers
    tr = build_feature_tracks(C, counts, pair_i, pair_j, idx0, idx1,
                              pw.inlier_mask & mmask & keep[:, None])
    assert tr.num_points > 100

    # map + retriangulate + BA
    m = SfMMap.build(intr, np.asarray(rots), tr, kps, spherical=True)
    m.retriangulate(jax.random.PRNGKey(1))
    assert m.point_valid().sum() > 80
    stats = m.optimize(max_iters=60)
    assert stats["final_cost"] < stats["initial_cost"]

    # trajectory accuracy: ATE vs GT centers after similarity alignment
    centers_gt = -np.einsum("cji,cj->ci", np.asarray(R_gt), cam_t_gt)
    err = float(ate(jnp.asarray(m.centers()), jnp.asarray(centers_gt)))
    assert err < 5e-3, err

    # unfreezing translations (general BA) must not blow up
    m.translation_fixed[:] = False
    m.translation_fixed[0] = True
    stats2 = m.optimize(max_iters=30)
    assert stats2["final_cost"] <= stats["final_cost"] * 1.01
    err2 = float(ate(jnp.asarray(m.centers()), jnp.asarray(centers_gt)))
    assert err2 < 5e-3, err2


def test_match_pair_synthetic_descriptors():
    """Descriptor matcher on unit-norm random descriptors with known GT."""
    rng = np.random.default_rng(0)
    N = 200
    d_true = rng.normal(size=(N, 128)).astype(np.float32)
    d_true /= np.linalg.norm(d_true, axis=-1, keepdims=True)
    perm = rng.permutation(N)
    noise = rng.normal(size=(N, 128)).astype(np.float32) * 0.05
    d1 = d_true[perm] + noise
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    m01, mask = match_pair(
        jnp.asarray(d_true), jnp.asarray(d1),
        jnp.ones(N, bool), jnp.ones(N, bool),
    )
    m01 = np.asarray(m01)
    got = 0
    for i in range(N):
        if m01[i] >= 0:
            assert perm[m01[i]] == i
            got += 1
    assert got > N * 0.9


def test_write_read_colmap_roundtrip(tmp_path):
    C = 6
    cam_r_gt, cam_t_gt, pts_gt, kps, ids, counts = synth_capture(C=C, P=600)
    pair_i, pair_j = all_pairs(C)
    matches = synth_matches(ids, counts, pair_i, pair_j)
    from sphericalsfm_tpu.pipeline import pad_match_table
    idx0, idx1, mmask = pad_match_table(matches)
    tr = build_feature_tracks(C, counts, pair_i, pair_j, idx0, idx1, mmask)
    intr = Intrinsics(jnp.asarray(FOCAL), jnp.asarray(W / 2.0), jnp.asarray(H / 2.0))
    m = SfMMap.build(intr, cam_r_gt, tr, kps)
    m.points = np.ones((m.num_points, 3))  # mark valid

    sparse = str(tmp_path / "sparse")
    m.write_colmap(sparse, W, H)
    from sphericalsfm_tpu.io import read_colmap_text
    model = read_colmap_text(sparse)
    assert len(model.images) == C
    assert model.cameras[1]["model"] == "SIMPLE_PINHOLE"
    np.testing.assert_allclose(model.cameras[1]["params"][0], FOCAL)
    # pose roundtrip
    from sphericalsfm_tpu.io import quat_to_rotmat
    R0 = quat_to_rotmat(model.images[1]["q"])
    np.testing.assert_allclose(
        R0, np.asarray(so3_exp(jnp.asarray(cam_r_gt[0]))), atol=1e-6
    )


def test_colmap_database_roundtrip(tmp_path):
    from sphericalsfm_tpu.io import ColmapDatabase, read_database, write_database
    rng = np.random.default_rng(1)
    db = ColmapDatabase(
        intrinsics=(500.0, 400.0, 300.0), width=800, height=600,
        names=["a.png", "b.png", "c.png"],
        keypoints=[rng.random((10, 2)).astype(np.float32) * 100 for _ in range(3)],
        descriptors=[rng.integers(0, 255, (10, 128)).astype(np.float32) for _ in range(3)],
        matches={(0, 1): np.stack([np.arange(5), np.arange(5) + 1], -1).astype(np.int32)},
    )
    path = str(tmp_path / "db.db")
    write_database(path, db)
    back = read_database(path, use_two_view_geometry=False)
    assert back.names == db.names
    assert back.intrinsics == db.intrinsics
    np.testing.assert_allclose(back.keypoints[0], db.keypoints[0], atol=1e-6)
    np.testing.assert_array_equal(back.matches[(0, 1)], db.matches[(0, 1)])


def test_make_loop_closures():
    """T5: begin/end-window loop-closure search with best_only."""
    from tests.test_driver import render_capture, FOCAL as F2, W as W2, H as H2
    from sphericalsfm_tpu.config import FrontendConfig
    from sphericalsfm_tpu.pipeline.frontend import detect_features, make_loop_closures

    cam_r_gt, cam_t_gt, gray, color = render_capture(num_frames=12, arc=1.0)
    cfg = FrontendConfig(max_keypoints=384, max_matches_per_pair=256)
    feats = detect_features(gray, color, cfg)
    intr = Intrinsics(jnp.asarray(F2), jnp.asarray(W2 / 2.0), jnp.asarray(H2 / 2.0))
    pi, pj, r, E, inl, i0, i1, mm = make_loop_closures(
        jax.random.PRNGKey(0), feats, intr, num_begin=3, num_end=3,
        min_num_inliers=20, cfg=cfg,
    )
    assert len(pi) >= 1
    # loop closures connect the start to the end of the circle
    assert (pj - pi).min() >= 2
    pi_b, pj_b, *_ = make_loop_closures(
        jax.random.PRNGKey(0), feats, intr, num_begin=3, num_end=3,
        min_num_inliers=20, best_only=True, cfg=cfg,
    )
    assert len(pi_b) == 1


def test_relpose_comparison_csv(tmp_path):
    from sphericalsfm_tpu.eval.experiments import relpose_comparison

    rows = relpose_comparison(
        str(tmp_path / "cmp.csv"), angles_deg=(2.0,), noises_px=(0.0,),
        trials=64,
    )
    # The comparison demonstrates the papers' point: on spherically
    # constrained motion the 3-pt solver is exact while the general 5-pt
    # degrades (small constrained baseline ⇒ near-degenerate for 5-pt).
    assert rows[0]["median_frob_spherical_3pt"] < 1e-8
    assert rows[0]["median_frob_general_5pt"] < 1e-2
    assert (
        rows[0]["median_frob_spherical_3pt"]
        < rows[0]["median_frob_general_5pt"]
    )


def test_relpose_comparison_cross_validates_against_opencv(tmp_path):
    """The repo's 5-pt must statistically track the INDEPENDENT OpenCV
    Nistér implementation under noise (VERDICT r3 #9: a shared systematic
    error between the repo's own solver columns would be invisible without
    an external column; reference does this against PoseLib/opengv,
    test_spherical_relpose.cpp:596-631)."""
    pytest.importorskip("cv2")
    from sphericalsfm_tpu.eval.experiments import relpose_comparison

    rows = relpose_comparison(
        str(tmp_path / "cmp.csv"), angles_deg=(5.0,), noises_px=(1.0,),
        trials=200,
    )
    ours = rows[0]["median_frob_general_5pt"]
    theirs = rows[0]["median_frob_opencv_5pt"]
    assert abs(ours - theirs) < 0.15 * max(ours, theirs), (ours, theirs)


def test_native_triplet_filter_matches_python():
    """The C++ triplet-cycle filter must reproduce the numpy fallback on a
    random view graph with consistent and corrupted triplets."""
    import numpy as np
    import jax.numpy as jnp

    from sphericalsfm_tpu.geometry.so3 import so3_exp, so3_log
    from sphericalsfm_tpu.native import graph as native
    from sphericalsfm_tpu.pipeline import tracks as T

    rng = np.random.default_rng(0)
    F = 20
    phi = np.arange(F) * 0.3
    R_gt = np.asarray(so3_exp(jnp.asarray(
        np.stack([np.zeros(F), phi, np.zeros(F)], -1))))
    pairs = [(i, j) for i in range(F) for j in range(i + 1, min(i + 5, F))]
    pi = np.asarray([p[0] for p in pairs], np.int32)
    pj = np.asarray([p[1] for p in pairs], np.int32)
    r_rel = []
    for (i, j), corrupt in zip(pairs, rng.uniform(size=len(pairs)) < 0.2):
        Rij = R_gt[j] @ R_gt[i].T
        if corrupt:  # bad edge: random large perturbation
            pert = rng.normal(size=3)
            pert = pert / np.linalg.norm(pert) * rng.uniform(0.2, 0.5)
            Rij = np.asarray(so3_exp(jnp.asarray(pert))) @ Rij
        r_rel.append(np.asarray(so3_log(jnp.asarray(Rij))))
    r_rel = np.stack(r_rel)
    keep = rng.uniform(size=len(pairs)) < 0.95

    out_native = T.filter_triplet_cycles(pi, pj, r_rel, keep, 2.0)
    # force the python fallback
    saved = T._native
    try:
        T._native = None
        out_python = T.filter_triplet_cycles(pi, pj, r_rel, keep, 2.0)
    finally:
        T._native = saved
    np.testing.assert_array_equal(out_native, out_python)
    # corrupted edges in triplets must actually be dropped
    assert out_native.sum() < keep.sum()
