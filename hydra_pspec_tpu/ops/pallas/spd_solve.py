"""Fused batched SPD Cholesky factor + multi-RHS solve, as one Pallas
kernel.

Why a custom kernel: XLA lowers Cholesky and TriangularSolve to while-loops
of O(n/8) block steps, and on the axon TPU backend every HLO step carries
~15-30 us of overhead — the factor+solves dominated the whole Gibbs
iteration (~13 ms of a 15 ms step at batch 100). Inside one Pallas program
the same blocked algorithm runs over VMEM-resident data: one kernel launch
per batch tile, MXU rank-updates, zero HLO-step overhead.

Precision: the backend's default MXU pass rounds f32 operands to bf16
(~2e-3 relative — fatally imprecise for a factorization), while Mosaic's
HIGHEST lowering multiplied compile time ~30x. The kernel therefore uses
an explicit 3-pass bf16 split (``ah bh + ah bl + al bh`` with f32
accumulation — ~f32-grade products) for the large matmuls, and pure-VPU
elementwise contractions (exact f32) for the small diagonal-block work.

Algorithm (per batch tile, all in VMEM): for each NB-column block —
Python-unrolled, since Mosaic requires *dynamic* lane offsets to be
128-aligned while static NB-wide slices are free — factor the NB x NB
diagonal block (unrolled scalar Cholesky), invert it via the nilpotent
Neumann product (L = D(I+M), M^NB = 0), form the panel, rank-NB trailing
update, and push the forward substitution of the RHS through the same
sweep; then a backward-substitution sweep. NB trades per-step work against
the number of unrolled steps; batched MXU dots are effectively unrolled
per batch element by Mosaic, so fewer/fatter steps win.

Layout: N, K padded to 128 multiples by the wrapper (pad rows carry an
identity diagonal / zero RHS — exactly block-diagonal, harmless).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..cplx import C, embed_hermitian, embed_rhs, unembed_solution

NB = 32  # factor block size (fewer block steps => fewer unrolled MXU ops)


def _split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _bmm(a, b):
    """Batched matmul with explicit 3-pass bf16 splitting (~f32 products,
    f32 accumulation) — Mosaic supports only DEFAULT (1-pass bf16, too
    coarse for a factorization) and HIGHEST (pathological compile time)."""
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ah, al = _split(a)
    bh, bl = _split(b)
    return dot(ah, bh) + (dot(ah, bl) + dot(al, bh))


def _vmm(a, b):
    """Small-block matmul on the VPU (exact f32, no MXU precision games):
    (bt, m, k) @ (bt, k, n) with m, k <= NB."""
    return jnp.sum(a[:, :, :, None] * b[:, None, :, :], axis=2)


def _iota(nb):
    return jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)


def _eye(nb, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    return (r == c).astype(dtype)


def _chol_block(a, floor=None):
    """Unrolled Cholesky of (bt, NB, NB) SPD blocks; returns lower L.
    Masks come from in-kernel iota (Pallas kernels cannot capture array
    constants). ``floor``: pivot clamp — pass a finite value (e.g. 1e-3
    for the unit-diagonal equilibrated system) when the input block may
    have lost positive-definiteness to low-precision arithmetic (the
    1-pass bf16 Schur build); the result is then only preconditioner
    quality but stays finite for iterative refinement to correct."""
    cols = []
    tiny = floor if floor is not None else jnp.finfo(a.dtype).tiny
    iota = _iota(NB)
    for k in range(NB):
        akk = jnp.sqrt(jnp.maximum(a[:, k, k], tiny))
        col = a[:, :, k] / akk[:, None]
        col = jnp.where(iota >= k, col, 0.0)
        a = a - col[:, :, None] * col[:, None, :]
        cols.append(col)
    return jnp.stack(cols, axis=2)


def _inv_lower_neumann(l, nb):
    """Inverse of (bt, nb, nb) lower-triangular blocks via the nilpotent
    Neumann factorization: with L = D (I + M), M^nb = 0,
    (I+M)^{-1} = (I-M)(I+M^2)(I+M^4)...(I+M^{nb/2})."""
    eye = _eye(nb, l.dtype)
    d = jnp.sum(l * eye[None], axis=2)  # batched diag via masked sum
    dinv = 1.0 / d
    m = l * dinv[:, :, None] - eye
    inv_unit = eye[None] - m
    p = m
    k = 2
    while k < nb:
        p = _vmm(p, p)          # M^k
        inv_unit = _vmm(inv_unit, eye[None] + p)
        k *= 2
    return inv_unit * dinv[:, None, :]


def _inv_lower_block(l):
    """Inverse of (bt, NB, NB) lower-triangular blocks. Above 16 the raw
    Neumann product loses accuracy (powers of the non-normal strictly-lower
    part grow before vanishing), so recurse on 2x2 block triangles:
    inv([[A,0],[B,C]]) = [[invA, 0], [-invC B invA, invC]]."""
    if NB <= 16:
        return _inv_lower_neumann(l, NB)
    h = NB // 2
    a = l[:, :h, :h]
    bb = l[:, h:, :h]
    c = l[:, h:, h:]
    inv_a = _inv_lower_neumann(a, h)
    inv_c = _inv_lower_neumann(c, h)
    off = -_vmm(inv_c, _vmm(bb, inv_a))
    top = jnp.concatenate([inv_a, jnp.zeros_like(bb).swapaxes(1, 2)], axis=2)
    bot = jnp.concatenate([off, inv_c], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _spd_kernel(e_ref, b_ref, x_ref, l_ref, invd_ref):
    """Refs: e (bt,N,N) in, b (bt,N,K) in, x (bt,N,K) out,
    scratch l (bt,N,N), invd (bt,N,NB)."""
    bt, n, _ = e_ref.shape
    nblocks = n // NB

    l_ref[:] = e_ref[:]
    x_ref[:] = b_ref[:]

    # All slice bounds below are Python ints (the block loops are
    # unrolled), so every operation touches exactly the live triangular
    # region — no masking, no wasted FLOPs, and static offsets satisfy
    # Mosaic's alignment rules at any granularity.

    # Factorization with the forward substitution fused into the sweep.
    for j in range(nblocks):
        c0 = j * NB
        c1 = c0 + NB
        ajj = l_ref[:, c0:c1, c0:c1]
        ljj = _chol_block(ajj)
        inv_ljj = _inv_lower_block(ljj)
        invd_ref[:, c0:c1, :] = inv_ljj
        l_ref[:, c0:c1, c0:c1] = ljj

        yj = _bmm(inv_ljj, x_ref[:, c0:c1, :])
        x_ref[:, c0:c1, :] = yj
        if j + 1 < nblocks:
            below = l_ref[:, c1:, c0:c1]
            lcol = _bmm(below, jnp.swapaxes(inv_ljj, 1, 2))
            l_ref[:, c1:, c0:c1] = lcol
            # rank-NB trailing update on the exact trailing submatrix
            l_ref[:, c1:, c1:] = l_ref[:, c1:, c1:] - _bmm(
                lcol, jnp.swapaxes(lcol, 1, 2)
            )
            x_ref[:, c1:, :] = x_ref[:, c1:, :] - _bmm(lcol, yj)

    # Backward substitution (updates touch only rows above the block).
    for j in range(nblocks - 1, -1, -1):
        c0 = j * NB
        c1 = c0 + NB
        inv_ljj = invd_ref[:, c0:c1, :]
        xj = _bmm(jnp.swapaxes(inv_ljj, 1, 2), x_ref[:, c0:c1, :])
        x_ref[:, c0:c1, :] = xj
        if j > 0:
            lrow = l_ref[:, c0:c1, :c0]   # L[block, above] == L^T[above, block]^T
            x_ref[:, :c0, :] = x_ref[:, :c0, :] - _bmm(
                jnp.swapaxes(lrow, 1, 2), xj
            )


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


@functools.partial(jax.jit, static_argnames=("batch_tile",))
def spd_factor_solve(e, b, batch_tile: int = 8):
    """Solve ``e[i] @ x[i] = b[i]`` for a batch of SPD matrices.

    e: (B, N, N) f32; b: (B, N, K) f32. N padded to 128, K to 128, B to
    batch_tile internally (identity diagonal on padded rows).
    """
    e = jnp.asarray(e, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    B, n0, _ = e.shape
    k0 = b.shape[-1]

    e, _ = _pad_to(e, 1, 128)
    e, _ = _pad_to(e, 2, 128)
    n = e.shape[-1]
    if n != n0:
        # identity on the padded diagonal keeps the system nonsingular
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
        _spd_kernel,
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
            pltpu.VMEM((batch_tile, n, NB), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(e, b)
    return x[:B, :n0, :k0]


def hermitian_solve_pallas(m: C, b: C, jitter: float = 0.0,
                           batch_tile: int = 8) -> C:
    """Drop-in for cplx.hermitian_solve: Jacobi-equilibrated solve of the
    Hermitian PD system via the fused Pallas kernel on the real symmetric
    embedding. Handles arbitrary leading batch dims (or none)."""
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
    e_flat = e.reshape((-1, n2, n2))
    r_flat = rhs.reshape((-1, n2, k))
    x = spd_factor_solve(e_flat, r_flat, batch_tile=batch_tile)
    x = x.reshape(batch_shape + (n2, k))
    xs = unembed_solution(x)
    return C(xs.re * dinv[..., :, None], xs.im * dinv[..., :, None])
