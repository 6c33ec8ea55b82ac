"""Stage-level breakdown of the detection kernel on TPU.

Builds cumulative partial kernels (pyramid -> +extrema/top-k -> +NMS ->
+refine -> full) and times each with the fori-marginal methodology
(scripts/roofline.py): XLA dead-code-eliminates everything after the
returned value, so consecutive differences give per-stage costs.

Usage: python scripts/profile_detect_stages.py
"""

import math
import os
import sys
import time

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sphericalsfm_tpu.ops import features as ft  # noqa: E402

B, H, W = 8, 480, 640
KMAX = 1024
NOCT = 4


def partial_kernel(stage):
    """stage: pyramid | topk | nms | refine | full."""

    def one(img):
        img = img.astype(jnp.float32) / 255.0
        base = ft._blur(img, ft._SIGMA0)
        k_geom = 2.0 ** (1.0 / ft._NUM_SCALES)
        all_xy, all_resp, all_scale, all_oct, all_layer = [], [], [], [], []
        octave_images = []
        oct_img = base
        for o in range(NOCT):
            sigmas = [ft._SIGMA0 * (k_geom ** s)
                      for s in range(ft._NUM_SCALES + 3)]
            gauss = [oct_img]
            for s in range(1, ft._NUM_SCALES + 3):
                inc = math.sqrt(max(sigmas[s] ** 2 - sigmas[s - 1] ** 2, 0.01))
                gauss.append(ft._blur(gauss[-1], inc))
            gstack = jnp.stack(gauss)
            octave_images.append(gstack)
            dogs = gstack[1:] - gstack[:-1]
            resp = ft._dog_extrema(dogs, ft._CONTRAST_THRESH)
            s_ = resp.shape[0]
            scale_of_layer = jnp.asarray(
                [ft._SIGMA0 * (k_geom ** (s + 1)) * (2.0 ** o)
                 for s in range(s_)], jnp.float32)
            vals, lay, yy, xx = ft._block_topk(
                resp, block=max(16 >> o, 1), keep=8)
            cap = min(2 * KMAX, vals.shape[0])  # mirror the real kernel's
            vals, sel_o = jax.lax.top_k(vals, cap)  # per-octave prefilter
            all_xy.append(jnp.stack(
                [xx[sel_o] * 2.0 ** o, yy[sel_o] * 2.0 ** o], -1))
            all_resp.append(vals)
            all_scale.append(scale_of_layer[lay[sel_o]])
            all_oct.append(jnp.full(vals.shape, o, jnp.int32))
            all_layer.append(lay[sel_o])
            oct_img = ft._downsample2(gstack[ft._NUM_SCALES])
        if stage == "pyramid":
            return sum(jnp.sum(g) for g in octave_images)
        xy = jnp.concatenate(all_xy)
        resp = jnp.concatenate(all_resp)
        octv = jnp.concatenate(all_oct)
        layer = jnp.concatenate(all_layer)
        if stage == "topk":
            return jnp.sum(xy) + jnp.sum(resp)
        sel, valid = ft._grid_nms(resp, xy, cell=max(8.0, W / 64.0),
                                  width=float(W), per_cell=8, k=KMAX)
        if stage == "nms":
            return jnp.sum(xy[sel]) + jnp.sum(valid)
        if stage == "refine":
            # replicate the subpixel-refinement block (dog_pack + vmapped
            # quadratic fit) to split it from the descriptor stage
            xy_k = xy[sel]
            octv_k = octv[sel]
            layer_k = layer[sel]
            S2 = ft._NUM_SCALES + 2
            dog_pack = jnp.zeros((NOCT * S2, H, W), jnp.float32)
            for o in range(NOCT):
                dgs = octave_images[o][1:] - octave_images[o][:-1]
                h_o, w_o = dgs.shape[1], dgs.shape[2]
                dog_pack = dog_pack.at[o * S2: o * S2 + S2, :h_o, :w_o].set(dgs)

            def refine_xy(i):
                o = jnp.clip(octv_k[i], 0, NOCT - 1)
                lay_idx = o * S2 + layer_k[i] + 1
                inv = jnp.exp2(-o.astype(jnp.float32))
                xo = xy_k[i, 0] * inv
                yo = xy_k[i, 1] * inv

                def at(ddx, ddy):
                    return ft._bilinear_layer(dog_pack, lay_idx, xo + ddx,
                                              yo + ddy)

                dx_ = 0.5 * (at(1.0, 0.0) - at(-1.0, 0.0))
                dy_ = 0.5 * (at(0.0, 1.0) - at(0.0, -1.0))
                dxx = at(1.0, 0.0) + at(-1.0, 0.0) - 2.0 * at(0.0, 0.0)
                dyy = at(0.0, 1.0) + at(0.0, -1.0) - 2.0 * at(0.0, 0.0)
                dxy = 0.25 * (at(1.0, 1.0) + at(-1.0, -1.0)
                              - at(1.0, -1.0) - at(-1.0, 1.0))
                det = dxx * dyy - dxy * dxy
                det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
                off_x = -(dyy * dx_ - dxy * dy_) / det
                off_y = -(dxx * dy_ - dxy * dx_) / det
                return off_x, off_y

            rx, ry = jax.vmap(refine_xy)(jnp.arange(KMAX))
            return jnp.sum(rx) + jnp.sum(ry)
        return None  # full handled by the real kernel

    if stage in ("pyramid", "topk", "nms", "refine"):
        def batched(images):
            return jnp.sum(jax.vmap(one)(images))
    elif stage == "full":
        def batched(images):
            r = ft.detect_batch(images, max_keypoints=KMAX, num_octaves=NOCT)
            return jnp.sum(r.xy) + jnp.sum(r.descriptor)
    else:
        raise ValueError(stage)
    return batched


def marginal_time(batched, imgs, k1=1, k2=4, outer=3):
    def timed(k):
        @jax.jit
        def run():
            def body(i, acc):
                return acc + batched(jnp.bitwise_xor(imgs,
                                                     i.astype(jnp.uint8)))
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        float(run())
        best = np.inf
        for _ in range(outer):
            t0 = time.perf_counter()
            float(run())
            best = min(best, time.perf_counter() - t0)
        return best
    return max((timed(k2) - timed(k1)) / (k2 - k1), 1e-9)


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    imgs = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.uint8))
    prev = 0.0
    for stage in ("pyramid", "topk", "nms", "refine", "full"):
        t = marginal_time(partial_kernel(stage), imgs) / B
        print(f"{stage:8s} cumulative {t * 1e3:7.2f} ms/frame  "
              f"(stage +{(t - prev) * 1e3:6.2f} ms)", flush=True)
        prev = t


if __name__ == "__main__":
    main()
