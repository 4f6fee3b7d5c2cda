"""Per-matmul cost model for Mosaic batched dot_generals at the GCR solve
shapes: how much does ONE (bt, n, n) @ (bt, n, k) matmul cost in-kernel,
as a function of batch tile, matrix size, and bf16 pass count?

The megachain kernel runs ~8 ms/iter while its algebraic FLOP count is
~15 GFLOP (~0.2 ms at 50% MFU) — this probe separates per-instruction
overhead from arithmetic throughput so the kernel can be restructured
around whichever dominates.

    PROBE_CASE=bt8_n256_p3 python scripts/probe_matmul.py      (one case)
    python scripts/probe_matmul.py                             (all cases)

Each kernel body performs M dependent batched matmuls (chained through an
accumulator so none can be elided) on VMEM-resident operands; the
pallas_call is wrapped in a lax.scan over NITER steps so the per-call
dispatch floor amortizes away. Reported: microseconds per logical matmul.
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
from hydra_pspec_tpu.ops.pallas.spd_inv import _bmm1

NITER = int(os.environ.get("PROBE_ITERS", "30"))
M = int(os.environ.get("PROBE_M", "24"))  # matmuls per kernel invocation


def make_case(bt, n, k, passes):
    mm = _bmm if passes == 3 else _bmm1

    def kern(a_ref, b_ref, o_ref):
        acc = b_ref[:]
        for _ in range(M):
            acc = mm(a_ref[:], acc)
            # keep values bounded so the chain cannot overflow
            acc = acc * jnp.float32(1e-2)
        o_ref[:] = acc

    @jax.jit
    def call(a, b):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bt, n, k), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(a, b)

    @jax.jit
    def loop(a, b):
        def body(c, _):
            o = call(a, b * c)
            return jnp.max(jnp.abs(o)) * 1e-6 + jnp.float32(1.0), None
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=NITER)
        return c

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((bt, n, n)) / np.sqrt(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal((bt, n, k)), jnp.float32)
    return lambda: float(loop(a, b))


CASES = {
    # name: (bt, n, k, passes)
    "bt8_n256_p3": (8, 256, 256, 3),
    "bt8_n256_p1": (8, 256, 256, 1),
    "bt1_n256_p1": (1, 256, 256, 1),
    "bt8_n128_p1": (8, 128, 128, 1),
    "bt4_n512_p1": (4, 512, 512, 1),
    "bt1_n1024_p1": (1, 1024, 1024, 1),
    "bt8_n256_k32_p1": (8, 256, 32, 1),
}


def run(name):
    bt, n, k, p = CASES[name]
    fn = make_case(bt, n, k, p)
    fn()  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    per_mm = np.median(ts) / NITER / M * 1e6
    flops = 2 * bt * n * n * k * p
    eff = flops / (per_mm * 1e-6) / 1e12
    print(f"{name:18s} {per_mm:9.2f} us/matmul   {eff:7.2f} TFLOP/s "
          f"({bt}x{n}x{n}@{n}x{k}, {p}-pass)", flush=True)


def main():
    print(f"backend={jax.default_backend()} M={M} x{NITER}", flush=True)
    only = os.environ.get("PROBE_CASE")
    for name in ([only] if only else CASES):
        run(name)


if __name__ == "__main__":
    main()
