"""Hardware probes for the Pallas per-call / per-grid-step cost model.

Cases (PROBE_CASE):
  copy_btN   — pure block copy at the solve shapes, batch_tile N: if time
               scales with grid-step count the kernel is step-overhead
               bound; if constant it is DMA/BW bound.
  chain_K    — grid (tiles, K): constants indexed by tile only (fetched
               once per tile thanks to Pallas's revisit-skip), per inner
               step one (bt,256,256)@(bt,256,256) batched matmul and a
               (bt,128) vector output. Models the megachain inner loop.
  chain0_K   — same grid, NO matmul (pure inner-step floor).

All timings are scan-amortized over NITER calls (axon dispatch is ~25 ms).
"""
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from hydra_pspec_tpu.ops.pallas.spd_solve import _bmm

B = int(os.environ.get("PROBE_B", "100"))
N = 256
T = 256
NITER = int(os.environ.get("PROBE_ITERS", "20"))
REPS = int(os.environ.get("PROBE_REPS", "5"))


def copy_case(bt):
    pb = (-B) % bt
    bp = B + pb

    def kern(e_ref, b_ref, o_ref):
        o_ref[:] = b_ref[:] + e_ref[:, :, :T]

    @jax.jit
    def call(e, b):
        return pl.pallas_call(
            kern,
            grid=(bp // bt,),
            in_specs=[
                pl.BlockSpec((bt, N, N), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, N, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, N, T), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bp, N, T), jnp.float32),
        )(e, b)

    e = jnp.ones((bp, N, N), jnp.float32)
    b = jnp.ones((bp, N, T), jnp.float32)

    @jax.jit
    def loop(e, b):
        def body(x, _):
            x = call(e, x)
            x = x * 0.5
            return x, ()
        x, _ = jax.lax.scan(body, b, None, length=NITER)
        return jnp.sum(x)

    return lambda: float(loop(e, b))


def chain_case(k_inner, with_mm=True, bt=8):
    pb = (-B) % bt
    bp = B + pb
    tiles = bp // bt

    def kern(e_ref, s_ref, o_ref, acc):
        kk = pl.program_id(1)

        @pl.when(kk == 0)
        def _():
            acc[:] = s_ref[:]

        if with_mm:
            x = _bmm(e_ref[:], acc[:])
            acc[:] = x * jnp.asarray(1e-3, jnp.float32)
        else:
            acc[:] = acc[:] * jnp.asarray(0.99, jnp.float32)
        o_ref[0] = jnp.sum(acc[:, :, :128], axis=1)

    @jax.jit
    def call(e, s):
        return pl.pallas_call(
            kern,
            grid=(tiles, k_inner),
            in_specs=[
                pl.BlockSpec((bt, N, N), lambda i, k: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, N, N), lambda i, k: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bt, 128), lambda i, k: (k, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k_inner, bp, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bt, N, N), jnp.float32)],
        )(e, s)

    e = jnp.full((bp, N, N), 1e-3, jnp.float32)
    s = jnp.ones((bp, N, N), jnp.float32)

    @jax.jit
    def loop(e, s):
        def body(c, _):
            o = call(e, s * c)
            return jnp.mean(o) * 1e-6 + 1.0, ()
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=NITER)
        return c

    return lambda: float(loop(e, s))


def main():
    case = os.environ.get("PROBE_CASE", "copy_bt8")
    if case.startswith("copy_bt"):
        fn = copy_case(int(case[7:]))
        steps = -(-B // int(case[7:])) * NITER
    elif case.startswith("chain0_"):
        k = int(case.split("_")[1])
        fn = chain_case(k, with_mm=False)
        steps = -(-B // 8) * k * NITER
    elif case.startswith("chain_"):
        k = int(case.split("_")[1])
        fn = chain_case(k, with_mm=True)
        steps = -(-B // 8) * k * NITER
    else:
        raise SystemExit(f"unknown case {case}")
    print(f"backend={jax.default_backend()} case={case} B={B} x{NITER}",
          flush=True)
    fn()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    med = np.median(ts)
    print(f"{case:14s} median {med*1e3/NITER:8.3f} ms/call   "
          f"min {ts.min()*1e3/NITER:8.3f}   "
          f"us/grid-step {med*1e6/steps:7.2f}", flush=True)


if __name__ == "__main__":
    main()
