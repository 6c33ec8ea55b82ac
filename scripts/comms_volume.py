"""Comms-volume proxy for distributed BA on the virtual 8-way mesh.

Real multi-chip hardware is unavailable here (one tunneled v5e), so this
measures the thing that PREDICTS scaling instead: the bytes moved by
cross-shard collectives per LM iteration, read out of the compiled HLO of
`distributed_bundle_adjust` on the 8-device CPU mesh, for each camera
solver at several scene sizes. Per-iteration collective bytes vs the
per-shard FLOP/byte work is the weak-scaling story BASELINE.md's >=0.8
efficiency target needs: when (collective bytes / ICI bandwidth) is small
vs (local work / chip throughput), scaling is compute-bound.

Run on CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            JAX_PLATFORMS=cpu python scripts/comms_volume.py
"""

import os
import re
import sys

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=32")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np  # noqa: E402

import jax  # noqa: E402

# sitecustomize imports JAX and registers the axon TPU backend before this
# script runs, so the env vars above are too late on their own (CLAUDE.md):
# the post-import config update is also required to actually land on CPU.
jax.config.update("jax_platforms", "cpu")

DTYPE_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "bf16": 2,
               "s8": 1, "u8": 1, "f16": 2, "s64": 8, "u64": 8}

_SHAPE_RE = re.compile(r"(f32|f64|bf16|f16|s64|s32|s8|u64|u32|u8|pred)"
                       r"\[([\d,]*)\]")


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of every collective op in an HLO module dump."""
    out = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"[%\w.-]+\s*=\s*(\([^)]*\)|\S+)\s*(all-reduce|"
                     r"all-gather|reduce-scatter|all-to-all|"
                     r"collective-permute)", s)
        if not m:
            continue
        op = m.group(2)
        nbytes = 0
        for dt, dims in _SHAPE_RE.findall(m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * DTYPE_BYTES[dt]
        out[op] = out.get(op, 0) + nbytes
    return out


def scene(C, W, P):
    from bench_ba_scale import make_ring_scene

    return make_ring_scene(C=C, W=W, P=P)


def stage_rows():
    """Per-stage collective bytes + per-shard work for the sharded frontend
    stages the drivers actually run distributed (VERDICT r4 item 7: the BA
    proxy alone did not cover detection / ring matching / pairwise RANSAC).
    Lowered at 8/16/32-way meshes from compiled HLO."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sphericalsfm_tpu.parallel.ring_matching import ring_exhaustive_match
    from sphericalsfm_tpu.parallel.sharded import make_mesh
    from sphericalsfm_tpu.ransac.spherical import spherical_ransac

    H, W, KP = 240, 320, 512
    K, D, M = 512, 128, 256
    CORR, HYP = 256, 512
    print("\n== driver-stage comms proxy (collective bytes per call from "
          "compiled HLO; compute per shard analytic) ==")
    print(f"workloads: detect {W}x{H}/{KP}kp, ring-match K={K} D={D} "
          f"M={M}, RANSAC {CORR} corr x {HYP} hyp")
    for n in (8, 16, 32):
        mesh = make_mesh(n)
        axis = mesh.axis_names[0]

        # --- detection: F = 2n frames sharded on the frame axis ----------
        from sphericalsfm_tpu.parallel.sharded import sharded_detect

        F = 2 * n
        imgs = jnp.zeros((F, H, W), jnp.float32)
        txt = sharded_detect.lower(
            mesh, imgs, max_keypoints=KP, num_octaves=3
        ).compile().as_text()
        cb_d = collective_bytes(txt)
        flops_detect = F // n * (H * W * 3 * 6 * 13 * 2)  # pyramid convs

        # --- ring matching: F frames of descriptors around the ring ------
        desc = jnp.zeros((F, K, D), jnp.float32)
        val = jnp.ones((F, K), bool)
        txt = ring_exhaustive_match.lower(
            mesh, desc, val, max_matches=M
        ).compile().as_text()
        cb_r = collective_bytes(txt)
        Bf = F // n
        flops_ring = n * (Bf * Bf * K * K * D * 2)  # per shard, all steps

        # --- pairwise RANSAC: 4n pairs sharded on the pair axis ----------
        Pn = 4 * n
        spec = NamedSharding(mesh, P(axis))
        keys = jax.random.split(jax.random.PRNGKey(0), Pn)
        u = jnp.zeros((Pn, CORR, 3), jnp.float32)
        msk = jnp.ones((Pn, CORR), bool)

        fn = jax.jit(
            jax.vmap(lambda k, uu, vv, mm: spherical_ransac(
                k, uu, vv, mm, sq_thresh=jnp.float32(1e-5),
                num_hypotheses=HYP)),
            in_shardings=(spec, spec, spec, spec),
        )
        txt = fn.lower(keys, u, u, msk).compile().as_text()
        cb_s = collective_bytes(txt)
        flops_ransac = Pn // n * (HYP * CORR * 9 * 2 * 4)

        for name, cb, fl, per_shard_in in (
            ("detect", cb_d, flops_detect, F // n * H * W * 4),
            ("ring-match", cb_r, flops_ring, Bf * K * D * 4),
            ("ransac", cb_s, flops_ransac, Pn // n * CORR * 3 * 4 * 2),
        ):
            tot = sum(cb.values())
            detail = ", ".join(
                f"{k}={v / 1e6:.2f}MB" for k, v in sorted(cb.items())
            ) or "none"
            # v5e: ~186 GB/s ICI per link, ~49 f32 MXU Tflop/s
            t_comm = tot / 186e9
            t_comp = fl / 49e12
            ratio = t_comm / max(t_comp, 1e-12)
            print(f"mesh={n:2d} {name:10s} collectives={tot / 1e6:8.3f} MB "
                  f"({detail})  per-shard-in={per_shard_in / 1e6:.2f} MB  "
                  f"comm/compute~{ratio:.3f}", flush=True)


def main():
    from sphericalsfm_tpu.optim.ba import (
        _bundle_adjust_jit, prepare_problem,
    )
    from sphericalsfm_tpu.parallel.sharded import make_mesh, shard_ba_problem

    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")
    mesh = make_mesh(8)
    rows = []
    for C, W, P, solver in (
        (64, 680, 8192, "dense"),
        (64, 680, 8192, "dense_pairs"),
        (64, 680, 8192, "pcg"),
        (256, 560, 32768, "dense_pairs"),
        (256, 560, 32768, "pcg"),
        (1024, 520, 65536, "pcg"),
    ):
        p = scene(C, W, P)
        K = int(np.count_nonzero(np.asarray(p.obs_w)))
        p, solver_r = prepare_problem(p, solver)
        ps = shard_ba_problem(mesh, p)
        with mesh:
            lowered = _bundle_adjust_jit.lower(
                ps, max_iters=1, solve_dtype_name="float32",
                camera_solver=solver_r, pcg_iters=25, pcg_rtol=1e-2,
            )
            comp = lowered.compile()
        txt = comp.as_text()
        cb = collective_bytes(txt)
        total = sum(cb.values())
        # local per-shard working set: the sharded observation tables
        local_bytes = K // 8 * (4 + 4 + 8 + 4)
        rows.append((C, K, solver_r, total, cb, local_bytes))
        detail = ", ".join(f"{k}={v/1e6:.2f}MB" for k, v in sorted(cb.items()))
        print(f"C={C:5d} K={K:8d} solver={solver_r:12s} "
              f"collectives/iter={total/1e6:8.2f} MB  ({detail})  "
              f"sharded-obs/shard={local_bytes/1e6:.2f} MB", flush=True)
    # weak-scaling proxy: ICI v5e ~ 186 GB/s per link; a 2.4 MB all-reduce
    # costs ~13 us/hop — report the ratio against one LM iteration's compute
    print("\nproxy: iteration is compute-bound while "
          "(collective MB / 186 GB/s) << per-iteration wall time")

    stage_rows()


if __name__ == "__main__":
    main()
