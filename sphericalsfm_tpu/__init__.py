"""sphericalsfm_tpu — a TPU-native spherical structure-from-motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jonathanventura/spherical-sfm (C++/Ceres/OpenCV): structure-from-motion for
spherically-constrained camera motion (camera on a sphere, optical axis normal
to the surface), including

* minimal spherical essential-matrix solvers (3-pt; 5-pt/6-pt comparisons),
* batched vmapped LO-RANSAC,
* rotation averaging with loop closure,
* uncalibrated shared-focal pose-graph optimization (ICCV 2025),
* RANSAC triangulation and Levenberg-Marquardt bundle adjustment with
  Schur-complement elimination,
* feature detection/matching, COLMAP/OBJ/NeRF interop, and stereo-panorama
  synthesis.

Everything on the compute path is batched, functional, static-shape JAX,
designed for the MXU and for sharding over a `jax.sharding.Mesh`.

Design reference (capabilities only, re-designed TPU-first):
/root/reference (jonathanventura/spherical-sfm @ 2025-11-14).
"""

import os as _os

import jax as _jax

# Geometry kernels (minimal solvers, normal equations) want float64 on hosts
# that have it (CPU parity testing, offline pipelines). On TPU the native
# dtype is float32 (f64 linalg is unsupported and int64 upsets the backend),
# so TPU entrypoints (bench.py, __graft_entry__.py) disable x64 by setting
# SPHERICALSFM_TPU_X64=0 before importing the package.
if _os.environ.get("SPHERICALSFM_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the pipeline's kernels are shape-stable
# across runs, and first-compile dominates cold CLI invocations. Opt out
# with SPHERICALSFM_TPU_NO_COMPILE_CACHE=1. Not enabled for CPU backends:
# XLA:CPU AOT cache entries pin host machine features and can SIGILL when
# loaded under a different feature set.
if (
    _os.environ.get("SPHERICALSFM_TPU_NO_COMPILE_CACHE", "0") != "1"
    and "cpu" not in _os.environ.get("JAX_PLATFORMS", "")
):
    _cache = _os.environ.get(
        "SPHERICALSFM_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "sphericalsfm_tpu", "jax"),
    )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

__version__ = "0.1.0"
