"""A/B the Pallas solve kernels on the real GCR shapes, on-device.

    python scripts/profile_solvers.py
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from hydra_pspec_tpu.ops.pallas import spd_solve, spd_inv

B = int(os.environ.get("PROF_B", "100"))
N = int(os.environ.get("PROF_N", "240"))
K = int(os.environ.get("PROF_K", "203"))
REPS = int(os.environ.get("PROF_REPS", "7"))


def sync(x):
    return float(jnp.sum(x))


def timeit(name, fn, reps=REPS):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    print(f"{name:46s} median {np.median(ts)*1e3:8.2f} ms   min "
          f"{ts.min()*1e3:8.2f}", flush=True)


def main():
    print(f"backend={jax.default_backend()}  B={B} N={N} K={K}", flush=True)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((B, N, N)).astype(np.float32)
    e = np.einsum("bij,bkj->bik", a, a) / N + np.eye(N, dtype=np.float32)
    b = rng.standard_normal((B, N, K)).astype(np.float32)
    e = jnp.asarray(e)
    b = jnp.asarray(b)

    v2r1 = jax.jit(lambda e, b: spd_inv.spd_inv_solve(e, b, refine=1))
    timeit("v2 spd_inv_solve refine=1", lambda: sync(v2r1(e, b)))
    # accuracy spot check on device
    x = v2r1(e, b)
    resid = jnp.einsum("bij,bjk->bik", e, x,
                       precision=jax.lax.Precision.HIGHEST) - b
    print(f"  v2 refine=1 max|resid| {float(jnp.abs(resid).max()):.2e}",
          flush=True)

    v2r0 = jax.jit(lambda e, b: spd_inv.spd_inv_solve(e, b, refine=0))
    timeit("v2 spd_inv_solve refine=0", lambda: sync(v2r0(e, b)))
    x = v2r0(e, b)
    resid = jnp.einsum("bij,bjk->bik", e, x,
                       precision=jax.lax.Precision.HIGHEST) - b
    print(f"  v2 refine=0 max|resid| {float(jnp.abs(resid).max()):.2e}",
          flush=True)

    v1 = jax.jit(lambda e, b: spd_solve.spd_factor_solve(e, b))
    timeit("v1 spd_factor_solve", lambda: sync(v1(e, b)))

    for bt in (4, 16, 32):
        f = jax.jit(lambda e, b, bt=bt: spd_inv.spd_inv_solve(
            e, b, batch_tile=bt, refine=1))
        timeit(f"v2 batch_tile={bt} refine=1", lambda: sync(f(e, b)))


if __name__ == "__main__":
    main()
