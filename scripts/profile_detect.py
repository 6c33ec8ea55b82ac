"""Break down the detection stage's warm wall time: upload vs kernel vs
readback vs host post-processing. Run on the TPU (axon) backend.

Usage: python scripts/profile_detect.py [frames] [WxH] [batch]
"""

import os
import sys
import time

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import sphericalsfm_tpu  # noqa: F401
from sphericalsfm_tpu.ops.features import detect_batch
from sphericalsfm_tpu.config import PipelineConfig
from sphericalsfm_tpu.pipeline.frontend import detect_features


def t(fn, n=3):
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    W, H = (int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else
                             "640x480").split("x"))
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rng = np.random.default_rng(0)
    gray = (rng.random((F, H, W)) * 255).astype(np.uint8)
    color = np.zeros((F, H, W, 3), np.uint8)

    dev = jax.devices()[0]
    print("device:", dev)

    # 1. raw upload bandwidth (uint8 frames, chunk of B)
    chunk = gray[:B]
    up = t(lambda: jax.device_put(chunk, dev).block_until_ready())
    print(f"upload {chunk.nbytes/1e6:.1f} MB chunk: {up*1e3:.0f} ms "
          f"({chunk.nbytes/up/1e6:.1f} MB/s)")

    # 2. kernel alone (data already on device)
    dchunk = jax.device_put(chunk, dev)
    r = detect_batch(dchunk, max_keypoints=1024, num_octaves=4)
    jax.block_until_ready(r)  # compile
    k = t(lambda: jax.block_until_ready(
        detect_batch(dchunk, max_keypoints=1024, num_octaves=4)))
    print(f"kernel {B} frames: {k*1e3:.0f} ms ({B/k:.0f} frames/s)")

    # 3. readback of one chunk's outputs
    rb = t(lambda: (np.asarray(r.xy), np.asarray(r.descriptor),
                    np.asarray(r.valid)))
    nb = r.xy.nbytes + r.descriptor.nbytes + r.valid.nbytes
    print(f"readback {nb/1e6:.1f} MB: {rb*1e3:.0f} ms ({nb/rb/1e6:.1f} MB/s)")

    # 4. the full stage as the driver runs it
    cfg = PipelineConfig()
    cfg.frontend.max_keypoints = 1024
    detect_features(gray, color, cfg.frontend, batch=B)  # warm
    full = t(lambda: detect_features(gray, color, cfg.frontend, batch=B), n=2)
    print(f"full detect_features({F} frames, batch={B}): {full:.2f} s "
          f"({F/full:.1f} frames/s)")


if __name__ == "__main__":
    main()
