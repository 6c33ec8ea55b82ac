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

import jax as _jax

# Geometry kernels (minimal solvers, normal equations) need float64 available.
# Image-space work explicitly requests float32/bfloat16 where appropriate.
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
