"""Batched SPD solve via fully-recursive Schur-complement inversion — the
v2 Pallas solve kernel.

Why a second kernel: the v1 kernel (spd_solve.py) is a blocked Cholesky
whose NB=32 panel/update matmuls are tiny (m,k <= 32) — Mosaic unrolls the
batch into per-element MXU issues, so the kernel is bound by instruction
issue/latency, not FLOPs (~1-2% MFU, ~4 ms of a 6.7 ms Gibbs iteration at
batch 100). This kernel restructures the same solve around *fat* matmuls:

  * the inverse is built by the 2x2 block Schur recursion
    (ops/cplx.py:hermitian_inverse's algorithm, proven on this exact
    problem in XLA form as solver="recinv") with 128/64/32-sized matmuls
    at the upper levels — full 128x128x128 MXU tiles instead of rank-32
    panel updates;
  * only the 32x32 base case touches the scalar/VPU path (unrolled
    Cholesky + nilpotent Neumann triangular inverse, shared with v1);
  * the application x = A^-1 b and the optional iterative-refinement step
    are single batched (N,N)@(N,K) matmuls — the best-pipelined shape the
    MXU has.

Accuracy: explicit-inverse solve error is ~cond(A)*eps like the
substitution path; callers equilibrate first (hermitian_solve_pallas2) and
one refinement step (default on) recovers the difference. All large
matmuls use the explicit 3-pass bf16 split (see spd_solve._bmm): the
backend's one-pass f32 matmul rounds operands to bf16.

Replaces reference hot path hydra_pspec/pspec.py:228 (per-time CG) —
drop-in for spd_solve.spd_factor_solve via solver="pallas2".
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import C
from .spd_solve import (_bmm, _chol_block, _inv_lower_block, _pad_to,
                        NB as _NB_V1)

NBASE = 32
assert NBASE == _NB_V1  # _chol_block/_inv_lower_block are NB=32-shaped


def _bmm1(a, b):
    """Single-pass batched matmul (operands rounded to bf16 by the
    backend's DEFAULT matmul). ~3x fewer MXU passes than the exact 3-pass
    split — accurate to ~1e-2 relative, which is enough when the result is
    only used as a PRECONDITIONER whose error is removed by full-precision
    iterative refinement."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _spd_inv_into(w_ref, inv_ref, off: int, s: int, mm=_bmm):
    """Invert the SPD block w_ref[:, off:off+s, off:off+s] into the same
    slot of inv_ref (full symmetric inverse, both triangles). The w block
    is consumed as workspace. All offsets are Python ints (unrolled), so
    every slice is static. ``mm``: the batched matmul to build with —
    ``_bmm`` (exact 3-pass) or ``_bmm1`` (1-pass bf16 preconditioner
    quality; pair with refinement).

        A = [[A11, A12], [A12^T, A22]],  S = A22 - A12^T A11^-1 A12
        A^-1 = [[A11^-1 + T S^-1 T^T, -T S^-1],
                [(-T S^-1)^T,          S^-1]],   T = A11^-1 A12
    """
    if s == NBASE:
        a = w_ref[:, off:off + s, off:off + s]
        # 1-pass bf16 Schur blocks can lose SPD-ness; a relative pivot
        # floor (diag ~1 after Jacobi equilibration) keeps the build
        # finite at preconditioner quality instead of NaN-ing the chain
        l = _chol_block(a, floor=(1e-3 if mm is _bmm1 else None))
        il = _inv_lower_block(l)
        inv_ref[:, off:off + s, off:off + s] = mm(
            jnp.swapaxes(il, 1, 2), il
        )
        return
    h = s // 2
    o2 = off + h
    oe = off + s
    _spd_inv_into(w_ref, inv_ref, off, h, mm)
    a11i = inv_ref[:, off:o2, off:o2]
    a12 = w_ref[:, off:o2, o2:oe]
    t = mm(a11i, a12)
    w_ref[:, o2:oe, o2:oe] = w_ref[:, o2:oe, o2:oe] - mm(
        jnp.swapaxes(a12, 1, 2), t
    )
    w_ref[:, off:o2, o2:oe] = t  # park T where A12 (now dead) lived
    _spd_inv_into(w_ref, inv_ref, o2, h, mm)
    sinv = inv_ref[:, o2:oe, o2:oe]
    t = w_ref[:, off:o2, o2:oe]
    ts = mm(t, sinv)
    inv_ref[:, off:o2, off:o2] = inv_ref[:, off:o2, off:o2] + mm(
        ts, jnp.swapaxes(t, 1, 2)
    )
    inv_ref[:, off:o2, o2:oe] = -ts
    inv_ref[:, o2:oe, off:o2] = -jnp.swapaxes(ts, 1, 2)


def _spd_inv_kernel(refine: int, inv_passes: int, e_ref, b_ref, x_ref,
                    w_ref, inv_ref):
    """Refs: e (bt,N,N) in (preserved — needed for refinement),
    b (bt,N,K) in, x (bt,N,K) out, scratch w + inv (bt,N,N)."""
    n = e_ref.shape[1]
    w_ref[:] = e_ref[:]
    _spd_inv_into(w_ref, inv_ref, 0, n,
                  mm=(_bmm if inv_passes == 3 else _bmm1))
    x = _bmm(inv_ref[:], b_ref[:])
    for _ in range(refine):
        r = b_ref[:] - _bmm(e_ref[:], x)
        x = x + _bmm(inv_ref[:], r)
    x_ref[:] = x


@functools.partial(jax.jit,
                   static_argnames=("batch_tile", "refine", "inv_passes"))
def spd_inv_solve(e, b, batch_tile: int = 8, refine: int = 1,
                  inv_passes: int = 3):
    """Solve ``e[i] @ x[i] = b[i]`` for a batch of SPD matrices via the
    recursive-inverse kernel. Same contract as spd_solve.spd_factor_solve:
    e (B, N, N) f32, b (B, N, K) f32; N, K padded to 128 internally with an
    identity diagonal / zero RHS on the pad."""
    e = jnp.asarray(e, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    B, n0, _ = e.shape
    k0 = b.shape[-1]

    e, _ = _pad_to(e, 1, 128)
    e, _ = _pad_to(e, 2, 128)
    n = e.shape[-1]
    if n != n0:
        diag_pad = (jnp.arange(n) >= n0).astype(e.dtype)
        e = e + jnp.diag(diag_pad)[None]
    b, _ = _pad_to(b, 1, 128)
    b, _ = _pad_to(b, 2, 128)
    k = b.shape[-1]

    pad_b = (-B) % batch_tile
    if pad_b:
        e = jnp.concatenate(
            [e, jnp.broadcast_to(jnp.eye(n, dtype=e.dtype), (pad_b, n, n))], 0
        )
        b = jnp.concatenate([b, jnp.zeros((pad_b, n, k), e.dtype)], 0)
    bp = e.shape[0]

    grid = (bp // batch_tile,)
    x = pl.pallas_call(
        functools.partial(_spd_inv_kernel, refine, inv_passes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch_tile, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, n, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((batch_tile, n, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, n, n), jnp.float32),
            pltpu.VMEM((batch_tile, n, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(e, b)
    return x[:B, :n0, :k0]


def hermitian_solve_pallas2(m: C, b: C, jitter: float = 0.0,
                            batch_tile: int = 8, refine: int = 1,
                            inv_passes: int = 3) -> C:
    """Drop-in for cplx.hermitian_solve via the v2 recursive-inverse kernel
    on the Jacobi-equilibrated real symmetric embedding."""
    from ..cplx import embed_hermitian, embed_rhs, unembed_solution

    d = jnp.sqrt(jnp.clip(jnp.diagonal(m.re, axis1=-2, axis2=-1),
                          jnp.finfo(m.re.dtype).tiny, None))
    dinv = 1.0 / d
    scale = dinv[..., :, None] * dinv[..., None, :]
    ms = C(m.re * scale, m.im * scale)
    if jitter:
        ms = ms + jitter * jnp.eye(ms.shape[-1], dtype=ms.dtype)
    bs = C(b.re * dinv[..., :, None], b.im * dinv[..., :, None])

    e = embed_hermitian(ms)
    rhs = embed_rhs(bs)
    batch_shape = e.shape[:-2]
    n2 = e.shape[-1]
    k = rhs.shape[-1]
    x = spd_inv_solve(e.reshape((-1, n2, n2)), rhs.reshape((-1, n2, k)),
                      batch_tile=batch_tile, refine=refine,
                      inv_passes=inv_passes)
    x = x.reshape(batch_shape + (n2, k))
    xs = unembed_solution(x)
    return C(xs.re * dinv[..., :, None], xs.im * dinv[..., :, None])
