"""On-hardware statistical probe of the in-kernel RNG (core PRNG +
Box-Muller): generates normals with exactly the kernel's code path
(megastep.bits_to_normals inside a Pallas program) and prints moments.

Why: the megachain/mega engines run chi^2 ~ 1.0145 while the XLA-RNG
paths run ~1.000 — a ~0.7% inflation of the draw std would explain it.
This isolates whether the Mosaic log/cos/sin (or the 24-bit uniforms)
bias the normal moments.

    python scripts/probe_inkernel_rng.py        # TPU (takes the claim)
"""
import functools
import os
import sys
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

from hydra_pspec_tpu.ops.pallas.megastep import bits_to_normals

R, C = 128, 256


def _kernel(seed_ref, a_ref, b_ref, u1_ref, u2_ref):
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    bits1 = pltpu.bitcast(pltpu.prng_random_bits((R, C)), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits((R, C)), jnp.uint32)
    a, b = bits_to_normals(bits1, bits2, jnp.float32)
    a_ref[0] = a
    b_ref[0] = b
    scale = jnp.float32(1.0 / (1 << 24))
    u1_ref[0] = ((bits1 >> 8).astype(jnp.int32).astype(jnp.float32) * scale
                 + jnp.float32(2.0 ** -25))
    u2_ref[0] = (bits2 >> 8).astype(jnp.int32).astype(jnp.float32) * scale


@functools.partial(jax.jit, static_argnames=("k",))
def draw(seed, k: int):
    spec = pl.BlockSpec((1, R, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((k, R, C), jnp.float32)
    return pl.pallas_call(
        _kernel,
        interpret=(jax.default_backend() == "cpu"),
        grid=(k,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=[spec, spec, spec, spec],
        out_shape=[shape, shape, shape, shape],
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1))


def moments(x, name):
    x = np.asarray(x, np.float64).ravel()
    n = x.size
    m, v = x.mean(), x.var()
    m4 = ((x - m) ** 4).mean() / v**2
    se_v = np.sqrt(2.0 / n)
    print(f"{name}: n={n/1e6:.1f}M mean={m:+.5f} (se {1/np.sqrt(n):.1e}) "
          f"var={v:.5f} (se {se_v:.1e}) kurt={m4:.4f} (want 3)")
    return v


def main():
    k = int(os.environ.get("PROBE_K", "100"))
    a, b, u1, u2 = draw(12345, k)
    va = moments(a, "normal a (r*cos)")
    vb = moments(b, "normal b (r*sin)")
    moments(u1, "uniform u1")
    moments(u2, "uniform u2")
    # reference: XLA host Box-Muller over the same uniforms
    u1h = np.asarray(u1, np.float64).ravel()
    u2h = np.asarray(u2, np.float64).ravel()
    r = np.sqrt(-2.0 * np.log(u1h))
    ah = r * np.cos(2 * np.pi * u2h)
    moments(ah, "host BM same u")
    print(f"delta var vs host: a {va - ah.var():+.5f}")
    # chi^2 inflation prediction if draws feed the GCR fluctuations
    print(f"predicted chi^2 scale ~ var: {0.5 * (va + vb):.5f}")


if __name__ == "__main__":
    main()
