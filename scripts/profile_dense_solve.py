"""Compare the XLA cholesky+triangular dense solve against the blocked
scan solver (`ops/linalg.py::block_chol_solve`) at BA camera-system shapes
on the TPU. Usage: python scripts/profile_dense_solve.py [C ...]
"""

import os
import sys
import time

os.environ.setdefault("SPHERICALSFM_TPU_X64", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sphericalsfm_tpu.ops.linalg import block_chol_solve  # noqa: E402


def timeit(name, fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt * 1e3:8.3f} ms", flush=True)
    return out


def main():
    cams = [int(a) for a in sys.argv[1:]] or [64, 256]
    print("device:", jax.devices()[0])
    for C in cams:
        D = 6 * C + 1
        rng = np.random.default_rng(0)
        A0 = rng.normal(size=(D, D + 8)).astype(np.float32)
        S = jnp.asarray(A0 @ A0.T + D * np.eye(D, dtype=np.float32))
        rhs = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
        print(f"--- C={C} (D={D}) ---")

        def xla_solve(S, rhs):
            L = jnp.linalg.cholesky(S)
            y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        x_ref = timeit("xla chol+2 trisolve", jax.jit(xla_solve), S, rhs)

        for b in (8, 16, 32):
            f = jax.jit(lambda S, r, b=b: block_chol_solve(S, r, block=b))
            x = timeit(f"block_chol_solve b={b}", f, S, rhs)
            err = float(jnp.linalg.norm(x - x_ref) /
                        (jnp.linalg.norm(x_ref) + 1e-30))
            print(f"    rel err vs xla: {err:.2e}")


if __name__ == "__main__":
    main()
