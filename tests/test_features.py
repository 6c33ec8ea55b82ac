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
