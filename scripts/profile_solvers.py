"""A/B the Pallas solve kernels on the real GCR shapes, on-device.

Standalone dispatches cost ~25-30 ms through the axon relay, so each
measurement runs the solver NITER times inside one lax.scan (renormalizing
the carried RHS to keep f32 in range) and reports per-call time.

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
NITER = int(os.environ.get("PROF_ITERS", "20"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def timeit(name, fn, reps=REPS):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    print(f"{name:42s} median {np.median(ts)*1e3/NITER:8.3f} ms/call   "
          f"min {ts.min()*1e3/NITER:8.3f}", flush=True)


def scan_wrap(solver):
    @jax.jit
    def loop(e, b):
        def body(x, _):
            x = solver(e, x)
            x = x / jnp.maximum(jnp.mean(jnp.abs(x)), 1e-30)
            return x, ()
        x, _ = jax.lax.scan(body, b, None, length=NITER)
        return jnp.sum(x)
    return loop


CASES = {
    "v2r1": lambda e, b: spd_inv.spd_inv_solve(e, b, refine=1),
    "v2r0": lambda e, b: spd_inv.spd_inv_solve(e, b, refine=0),
    # 1-pass bf16 inverse build + full-precision refinement
    "v2f1": lambda e, b: spd_inv.spd_inv_solve(e, b, refine=1, inv_passes=1),
    "v2f2": lambda e, b: spd_inv.spd_inv_solve(e, b, refine=2, inv_passes=1),
    "v1": lambda e, b: spd_solve.spd_factor_solve(e, b),
    "v2bt16": lambda e, b: spd_inv.spd_inv_solve(e, b, batch_tile=16, refine=1),
    "v2bt4": lambda e, b: spd_inv.spd_inv_solve(e, b, batch_tile=4, refine=1),
    "v2bt32": lambda e, b: spd_inv.spd_inv_solve(e, b, batch_tile=32, refine=1),
    "v1bt16": lambda e, b: spd_solve.spd_factor_solve(e, b, batch_tile=16),
    "v2bt16r0": lambda e, b: spd_inv.spd_inv_solve(e, b, batch_tile=16,
                                                   refine=0),
    # pure launch + DMA floor: same shapes/grid as the solvers, no compute
    "copy": lambda e, b: _copy_kernel(e, b),
    # one fat batched matmul through the same pallas plumbing
    "matmul": lambda e, b: _matmul_kernel(e, b),
    # factor-only cost (K=1 RHS): isolates base-case + panel work
    "v1k1": lambda e, b: spd_solve.spd_factor_solve(e, b[:, :, :1]) + b,
    "v2k1": lambda e, b: spd_inv.spd_inv_solve(e, b[:, :, :1], refine=0) + b,
    # base-case microbenchmark: ONLY the 8 sequential chol32+inv32 chains
    "base": lambda e, b: _base_kernel(e, b),
}


def _base_kernel(e, b, batch_tile=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from hydra_pspec_tpu.ops.pallas.spd_solve import (_chol_block,
                                                      _inv_lower_block, NB)

    B, n, _ = e.shape
    k = b.shape[-1]
    npad = -(-n // 128) * 128
    kpad = -(-k // 128) * 128
    e = jnp.pad(e, ((0, 0), (0, npad - n), (0, npad - n)))
    b = jnp.pad(b, ((0, 0), (0, npad - n), (0, kpad - k)))
    pb = (-B) % batch_tile
    if pb:
        e = jnp.concatenate([e, e[:pb]], 0)
        b = jnp.concatenate([b, b[:pb]], 0)

    def kern(e_ref, b_ref, o_ref):
        acc = None
        for j in range(npad // NB):
            c0 = j * NB
            blk = e_ref[:, c0:c0 + NB, c0:c0 + NB]
            if acc is not None:
                # chain the blocks so nothing is dead-code-eliminated and
                # the sequential dependency matches the real factorization
                blk = blk + acc[:, :NB, :NB] * 1e-20
            l = _chol_block(blk)
            acc = _inv_lower_block(l)
        o_ref[:] = b_ref[:]
        o_ref[:, :NB, :NB] = acc

    out = pl.pallas_call(
        kern,
        grid=(e.shape[0] // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, npad, npad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, npad, kpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, npad, kpad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e.shape[0], npad, kpad), jnp.float32),
    )(e, b)
    return out[:B, :n, :k]


def _copy_kernel(e, b, batch_tile=8):
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = e.shape
    k = b.shape[-1]
    npad = -(-n // 128) * 128
    kpad = -(-k // 128) * 128
    e = jnp.pad(e, ((0, 0), (0, npad - n), (0, npad - n)))
    b = jnp.pad(b, ((0, 0), (0, npad - n), (0, kpad - k)))
    pb = (-B) % batch_tile
    if pb:
        e = jnp.concatenate([e, e[:pb]], 0)
        b = jnp.concatenate([b, b[:pb]], 0)

    def kern(e_ref, b_ref, o_ref):
        o_ref[:] = b_ref[:] + e_ref[:, :, :b_ref.shape[2]]

    out = pl.pallas_call(
        kern,
        grid=(e.shape[0] // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, npad, npad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, npad, kpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, npad, kpad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e.shape[0], npad, kpad), jnp.float32),
    )(e, b)
    return out[:B, :n, :k]


def _matmul_kernel(e, b, batch_tile=8):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from hydra_pspec_tpu.ops.pallas.spd_solve import _bmm

    B, n, _ = e.shape
    k = b.shape[-1]
    npad = -(-n // 128) * 128
    kpad = -(-k // 128) * 128
    e = jnp.pad(e, ((0, 0), (0, npad - n), (0, npad - n)))
    b = jnp.pad(b, ((0, 0), (0, npad - n), (0, kpad - k)))
    pb = (-B) % batch_tile
    if pb:
        e = jnp.concatenate([e, e[:pb]], 0)
        b = jnp.concatenate([b, b[:pb]], 0)

    def kern(e_ref, b_ref, o_ref):
        o_ref[:] = _bmm(e_ref[:], b_ref[:])

    out = pl.pallas_call(
        kern,
        grid=(e.shape[0] // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, npad, npad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, npad, kpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, npad, kpad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e.shape[0], npad, kpad), jnp.float32),
    )(e, b)
    return out[:B, :n, :k]


def main():
    case = os.environ.get("PROF_CASE", "v1")
    print(f"backend={jax.default_backend()}  case={case} B={B} N={N} K={K} "
          f"x{NITER}", flush=True)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((B, N, N)).astype(np.float32)
    e = np.einsum("bij,bkj->bik", a, a) / N + np.eye(N, dtype=np.float32)
    b = rng.standard_normal((B, N, K)).astype(np.float32)
    e = jax.device_put(jnp.asarray(e))
    b = jax.device_put(jnp.asarray(b))

    solver = CASES[case]
    f = scan_wrap(solver)
    timeit(case, lambda: float(f(e, b)))
    x = jax.jit(solver)(e, b)
    resid = jnp.einsum("bij,bjk->bik", e, x,
                       precision=jax.lax.Precision.HIGHEST) - b
    print(f"  {case} max|resid| {float(jnp.abs(resid).max()):.2e}", flush=True)


if __name__ == "__main__":
    main()
