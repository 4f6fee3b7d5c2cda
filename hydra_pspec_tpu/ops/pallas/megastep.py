"""Whole-draw mega-kernel: RHS assembly, delay-basis system build,
equilibrated solve, and every per-iteration statistic in ONE Pallas
program per batch tile.

Why: on this backend each HLO op inside a jitted program costs ~15-30 us
of overhead; the Gibbs draw outside the solve is ~45 small XLA ops
(~1.5 ms of a 6.9 ms iteration at batch 100). Folding them into the solve
kernel leaves per iteration only the RNG draws, the bandpower sampler, and
ln_post assembly outside.

Everything works in the TIME-TRANSPOSED layout (B, Nfreqs, Ntimes): the
chain constants are pre-transposed host-side (models/rgibbs.py
build_mega_operators) and the omegas are drawn directly in (B, n, T)
shape, so the kernel contains no transposes of the big arrays.

Phases (per batch tile, all VMEM-resident; f32, 3-pass bf16-split
matmuls, Gauss 3-mult complex products):
  1. rc = ni_d + nih * omega_b                      (VPU)
  2. b_a = fg^H rc; rc_red = rc - g_mat b_a         (FG Schur reduction)
  3. frc = F rc_red; b_u = dd*frc + omega_a_delay   (delay-basis RHS)
  4. E = embed(I + dd dd^T * p_tilde), Jacobi-equilibrated; solve via the
     recursive Schur inverse (spd_inv._spd_inv_into) + optional refinement
  5. sk = dd*u -> beta; sig = F^H sk / n; amps = maa_inv b_a - G^H sig + a0
  6. model/resid -> chisq, per-channel noise term, masked delay stats

Replaces reference hot path pspec.py:151-374 + the per-iteration
diagnostics of pspec.py:377-490.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spd_solve import _bmm, _pad_to
from .spd_inv import _spd_inv_into, _bmm1


def _cmm(ar, ai, br, bi):
    """Batched complex matmul, Gauss 3-mult form, 3-pass bf16 products."""
    p1 = _bmm(ar, br)
    p2 = _bmm(ai, bi)
    p3 = _bmm(ar + ai, br + bi)
    return p1 - p2, p3 - p1 - p2


def _eye(n, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r == c).astype(dtype)


def bits_to_normals(bits1, bits2, dtype=jnp.float32):
    """Box-Muller: two uint32 bit tensors -> two standard-normal tensors.
    Pure jnp (unit-testable outside kernels); uses the top 24 bits as
    log-safe (0, 1) uniforms.

    (A sin-free variant — second coordinate as an independent-sign
    sqrt(1-cos^2), exactly Box-Muller in law — measured wall-neutral on
    the megachain hot path (2.216 vs 2.193 ms/iter, within cross-compile
    variance): the VPU sin is not the bottleneck. Kept in the simpler
    sin form.)"""
    scale = jnp.asarray(1.0 / (1 << 24), dtype)
    # Mosaic has no uint32->f32 cast; the top-24-bit values are < 2^24 so
    # the detour through int32 is exact.
    u1 = (bits1 >> 8).astype(jnp.int32).astype(dtype) * scale \
        + jnp.asarray(2.0 ** -25, dtype)
    u2 = (bits2 >> 8).astype(jnp.int32).astype(dtype) * scale
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = jnp.asarray(2.0 * np.pi, dtype) * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def _normal_pairs(shape, dtype):
    """Two independent standard-normal tensors from the core PRNG
    (pltpu.prng_random_bits + Box-Muller). Caller must have seeded.
    NOTE: real entropy only on hardware — the TPU interpreter stubs
    prng_random_bits, so in-kernel RNG is validated on device."""
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits_to_normals(bits1, bits2, dtype)


def _normal_pairs_t(bt, n, t, ntimes_true, dtype):
    """Normal pair of logical shape (bt, n, t) where only the first
    ``ntimes_true`` time lanes carry fluctuation draws (the rest are
    masked downstream anyway). The draw — and with it the Box-Muller
    transcendental volume, the dominant in-kernel RNG cost — happens at
    the 128-lane-rounded true time count; the tail is zero-filled."""
    td = min(t, -(-ntimes_true // 128) * 128)
    a, b = _normal_pairs((bt, n, td), dtype)
    if td < t:
        z = jnp.zeros((bt, n, t - td), dtype)
        a = jnp.concatenate([a, z], axis=2)
        b = jnp.concatenate([b, z], axis=2)
    return a, b


def _normal_quad_t(bt, n, t, ntimes_true, dtype):
    """Four (bt, n, t) normal tensors valid on the first ``ntimes_true``
    time lanes. (A lane-packed variant deriving all four from one
    Box-Muller pair via pltpu.roll was measured ~4 ms/iter SLOWER on
    hardware — Mosaic lowers the 64-lane rotate pathologically — so this
    is two independent pair draws at the 128-lane-rounded time count.)"""
    return (*_normal_pairs_t(bt, n, t, ntimes_true, dtype),
            *_normal_pairs_t(bt, n, t, ntimes_true, dtype))


def _draw_body(nfreqs_true: int, ntimes_true: int, refine: int,
               all_unflagged: bool,
               ptr, pti, ps, nih, nidr, nidi, dwr, dwi, ninvf, wv,
               fgr, fgi, gr, gi, mir, mii, a0r, a0i, fr, fi,
               oar, oai, obr, obi, e_s, w_s, inv_s, x_s,
               inv_passes: int = 3, apply_passes: int = 3,
               build_inv=None, tmask=None):
    """Phases 1-6 of one GCR draw + statistics on loaded VMEM values.

    All operands are values (already read from refs); ``e_s/w_s/inv_s/x_s``
    are the (bt, 2n, 2n)/(bt, 2n, t) scratch refs. ``fr/fi`` are already
    broadcast to (bt, n, n). Returns
    ``(sig_re, sig_im, amp_re, amp_im, chi, beta, noise_nu, bmask)``.
    Shared by the single-step kernel (``_mega_kernel``) and the
    multi-iteration chain kernel (megachain.py). ``tmask``: optional
    precomputed (row-broadcastable) valid-time mask — the grouped
    time-flags kernel passes a per-row (bt, 1, t) mask (rows carry
    different group time counts); default builds the shared
    ``ntimes_true`` mask."""
    bt, n, _ = ptr.shape
    t = nidr.shape[2]
    fdt = ptr.dtype
    # padded time columns must carry NO fluctuation draws (they'd leak into
    # beta/chisq): mask the omegas at the true time count
    if tmask is None:
        tmask = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
                 < ntimes_true).astype(fdt)

    # --- 1. rc = ni_d + nih * omega_b -------------------------------------
    nih = nih[:, :, None]
    rc_re = nidr + nih * (obr * tmask)
    rc_im = nidi + nih * (obi * tmask)

    # --- 2. FG Schur reduction -------------------------------------------
    ba_re, ba_im = _cmm(jnp.swapaxes(fgr, 1, 2), -jnp.swapaxes(fgi, 1, 2),
                        rc_re, rc_im)
    gb_re, gb_im = _cmm(gr, gi, ba_re, ba_im)
    rc_re = rc_re - gb_re
    rc_im = rc_im - gb_im

    # --- 3. delay-basis RHS ----------------------------------------------
    frc_re, frc_im = _cmm(fr, fi, rc_re, rc_im)
    dd = jnp.sqrt(jnp.clip(ps, 0.0, None) /
                  jnp.asarray(nfreqs_true, fdt))
    ddc = dd[:, :, None]
    bu_re = ddc * frc_re + oar * tmask
    bu_im = ddc * frc_im + oai * tmask

    # --- 4. embedded equilibrated system + solve --------------------------
    eye = _eye(n, fdt)
    diag_pt = jnp.sum(ptr * eye[None], axis=2)          # (bt, n)
    dinv = jax.lax.rsqrt(jnp.maximum(
        1.0 + dd * dd * diag_pt, jnp.finfo(fdt).tiny))
    outer = ddc * dd[:, None, :]
    dscale = dinv[:, :, None] * dinv[:, None, :]
    s_re = (outer * ptr + eye[None]) * dscale
    s_im = (outer * pti) * dscale
    e_s[:, :n, :n] = s_re
    e_s[:, :n, n:] = -s_im
    e_s[:, n:, :n] = s_im
    e_s[:, n:, n:] = s_re
    dvc = dinv[:, :, None]
    x_s[:, :n, :] = dvc * bu_re
    x_s[:, n:, :] = dvc * bu_im

    if build_inv is None:
        w_s[:] = e_s[:]
        _spd_inv_into(w_s, inv_s, 0, 2 * n,
                      mm=(_bmm if inv_passes == 3 else _bmm1))
    else:
        # caller-supplied policy (e.g. megachain's drift-gated
        # Newton-Schulz warm start over the VMEM-carried inverse)
        build_inv()
    # apply_passes: bf16 split passes for the INVERSE APPLICATIONS only.
    # The residual r = b - E x must stay 3-pass (it is a cancellation);
    # the applications' error is first-order-corrected by the refinement,
    # so 1-pass is a candidate fast path there. (r2 measured 1-pass
    # applications wall-neutral at B=100 — hidden behind other work;
    # re-evaluated at saturation each round, see ROADMAP.)
    amm = _bmm if apply_passes == 3 else _bmm1
    x = amm(inv_s[:], x_s[:])
    for _ in range(refine):
        r = x_s[:] - _bmm(e_s[:], x)
        x = x + amm(inv_s[:], r)
    u_re = dvc * x[:, :n, :]
    u_im = dvc * x[:, n:, :]

    # --- 5. delay stats + back-transform ---------------------------------
    sk_re = ddc * u_re
    sk_im = ddc * u_im
    beta = jnp.sum(sk_re * sk_re + sk_im * sk_im, axis=2)
    ninv_n = 1.0 / jnp.asarray(nfreqs_true, fdt)
    sig_re, sig_im = _cmm(fr * ninv_n, -fi * ninv_n, sk_re, sk_im)
    # amps = maa_inv b_a - G^H sig + a0
    ma_re, ma_im = _cmm(mir, mii, ba_re, ba_im)
    gs_re, gs_im = _cmm(jnp.swapaxes(gr, 1, 2),
                        -jnp.swapaxes(gi, 1, 2), sig_re, sig_im)
    # amp deviation from the host GLS point a0 — fluctuation-scale
    da_re = ma_re - gs_re
    da_im = ma_im - gs_im
    amp_re = da_re + a0r
    amp_im = da_im + a0i

    # --- 6. residual diagnostics -----------------------------------------
    # dwr/dwi are FG-DEFLATED (dw - Fg a0, float64 host-side), so the
    # in-kernel FG matmul sees only the small amplitude deviation:
    # res = (dw - Fg a0) - sig - Fg (amps - a0)  ==  dw - sig - Fg amps
    # exactly, without planting the bf16 rounding of a foreground-scale
    # product inside the noise-scale residual (chi^2 bias; see
    # models/mega.MegaOperators).
    fa_re, fa_im = _cmm(fgr, fgi, da_re, da_im)
    res_re = dwr - sig_re - fa_re
    res_im = dwi - sig_im - fa_im
    res2 = res_re * res_re + res_im * res_im
    ninvf = ninvf[:, :, None]
    chi = res2 * ninvf
    noise_nu = jnp.sum(res2 * (wv[:, :, None] * ninvf), axis=2)
    if all_unflagged:
        bmask = beta
    else:
        ws_re = wv[:, :, None] * sig_re
        ws_im = wv[:, :, None] * sig_im
        skm_re, skm_im = _cmm(fr, fi, ws_re, ws_im)
        bmask = jnp.sum(skm_re * skm_re + skm_im * skm_im, axis=2)
    return (sig_re, sig_im, amp_re, amp_im, chi, beta, noise_nu, bmask)


def _mega_kernel(nfreqs_true: int, ntimes_true: int, refine: int,
                 all_unflagged: bool, inkernel_rng: bool, inv_passes: int,
                 *refs):
    if inkernel_rng:
        (pt_re, pt_im, ps_ref, nih_ref,
         nid_re, nid_im, dw_re, dw_im, ninvf_ref, w_ref,
         fg_re, fg_im, g_re, g_im, mi_re, mi_im,
         a0_re, a0_im, f_re, f_im, seed_ref,
         sig_re_o, sig_im_o, amp_re_o, amp_im_o,
         chi_o, beta_o, noise_o, bmask_o,
         e_s, w_s, inv_s, x_s) = refs
    else:
        (pt_re, pt_im, ps_ref, nih_ref,
         nid_re, nid_im, dw_re, dw_im, ninvf_ref, w_ref,
         fg_re, fg_im, g_re, g_im, mi_re, mi_im,
         a0_re, a0_im, f_re, f_im,
         oa_re, oa_im, ob_re, ob_im,
         sig_re_o, sig_im_o, amp_re_o, amp_im_o,
         chi_o, beta_o, noise_o, bmask_o,
         e_s, w_s, inv_s, x_s) = refs
    bt, n, _ = pt_re.shape
    t = nid_re.shape[2]
    fdt = pt_re.dtype

    if inkernel_rng:
        # core PRNG: one stream per (iteration seed, grid step)
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        half = jnp.asarray(np.sqrt(0.5), fdt)
        sa = half * jnp.sqrt(jnp.asarray(float(nfreqs_true), fdt))
        obr, obi, oar, oai = _normal_quad_t(bt, n, t, ntimes_true, fdt)
        obr = obr * half
        obi = obi * half
        oar = oar * sa
        oai = oai * sa
    else:
        oar = oa_re[:]
        oai = oa_im[:]
        obr = ob_re[:]
        obi = ob_im[:]

    fr = jnp.broadcast_to(f_re[:][None], (bt, n, n))
    fi = jnp.broadcast_to(f_im[:][None], (bt, n, n))
    (sig_re, sig_im, amp_re, amp_im, chi, beta, noise_nu, bmask) = _draw_body(
        nfreqs_true, ntimes_true, refine, all_unflagged,
        pt_re[:], pt_im[:], ps_ref[:], nih_ref[:],
        nid_re[:], nid_im[:], dw_re[:], dw_im[:], ninvf_ref[:], w_ref[:],
        fg_re[:], fg_im[:], g_re[:], g_im[:], mi_re[:], mi_im[:],
        a0_re[:], a0_im[:], fr, fi, oar, oai, obr, obi,
        e_s, w_s, inv_s, x_s, inv_passes=inv_passes,
    )
    sig_re_o[:] = sig_re
    sig_im_o[:] = sig_im
    amp_re_o[:] = amp_re
    amp_im_o[:] = amp_im
    chi_o[:] = chi
    beta_o[:] = beta
    noise_o[:] = noise_nu
    bmask_o[:] = bmask


@functools.partial(
    jax.jit,
    static_argnames=("nfreqs_true", "ntimes_true", "batch_tile", "refine",
                     "all_unflagged", "inkernel_rng", "inv_passes"),
)
def gcr_megastep(pt_re, pt_im, ps, nih, nid_re, nid_im, dw_re, dw_im,
                 ninv_full, w, fg_re, fg_im, g_re, g_im, mi_re, mi_im,
                 a0_re, a0_im, f_re, f_im, oa_re=None, oa_im=None,
                 ob_re=None, ob_im=None, seed=None,
                 *, nfreqs_true: int, ntimes_true: int, batch_tile: int = 8,
                 refine: int = 1, all_unflagged: bool = True,
                 inkernel_rng: bool = False, inv_passes: int = 3):
    """One fused GCR draw + statistics for the whole batch.

    All array arguments are already padded/transposed by
    models/mega.build_mega_operators: matrices (B, n, n) with n a
    multiple of 128 (identity-safe zero padding), time-transposed arrays
    (B, n, T) with T a multiple of 128, mode arrays padded to m
    a multiple of 8. Returns
    ``(sig_re, sig_im, amp_re, amp_im, chisq_t, beta, noise_nu, beta_masked)``
    in the transposed layout.

    ``inkernel_rng``: draw the fluctuation vectors with the core PRNG
    (Box-Muller over pltpu.prng_random_bits) seeded from ``seed`` (a
    (1, 1) int32) — no omega inputs, no HBM traffic for randomness.
    Otherwise pass omegas explicitly.
    """
    B, n, _ = pt_re.shape
    t = nid_re.shape[2]
    m = fg_re.shape[2]

    pad_b = (-B) % batch_tile
    batched = [pt_re, pt_im, ps, nih, nid_re, nid_im, dw_re, dw_im,
               ninv_full, w, fg_re, fg_im, g_re, g_im, mi_re, mi_im,
               a0_re, a0_im]
    if not inkernel_rng:
        batched += [oa_re, oa_im, ob_re, ob_im]
    if pad_b:
        def pb(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad_b,) + x.shape[1:])], 0)
        batched = [pb(x) for x in batched]
    bp = batched[0].shape[0]
    grid = (bp // batch_tile,)

    bmat = lambda d2, d3: pl.BlockSpec((batch_tile, d2, d3),
                                       lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    bvec = pl.BlockSpec((batch_tile, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bshared = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)

    in_specs = [
        bmat(n, n), bmat(n, n),            # p_tilde
        bvec, bvec,                        # ps, nih
        bmat(n, t), bmat(n, t),            # ni_d
        bmat(n, t), bmat(n, t),            # d_w
        bvec, bvec,                        # ninv_full, w
        bmat(n, m), bmat(n, m),            # fg
        bmat(n, m), bmat(n, m),            # g_mat
        bmat(m, m), bmat(m, m),            # maa_inv
        bmat(m, t), bmat(m, t),            # a0
        bshared, bshared,                  # f
    ]
    operands = list(batched[:18]) + [f_re, f_im]
    if inkernel_rng:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(seed, dtype=jnp.int32).reshape(1, 1))
    else:
        in_specs += [bmat(n, t), bmat(n, t),   # omega_a (delay)
                     bmat(n, t), bmat(n, t)]   # omega_b
        operands += batched[18:]
    out_specs = [
        bmat(n, t), bmat(n, t),            # sig
        bmat(m, t), bmat(m, t),            # amps
        bmat(n, t),                        # chisq
        bvec, bvec, bvec,                  # beta, noise_nu, beta_masked
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bp, n, t), jnp.float32),
        jax.ShapeDtypeStruct((bp, n, t), jnp.float32),
        jax.ShapeDtypeStruct((bp, m, t), jnp.float32),
        jax.ShapeDtypeStruct((bp, m, t), jnp.float32),
        jax.ShapeDtypeStruct((bp, n, t), jnp.float32),
        jax.ShapeDtypeStruct((bp, n), jnp.float32),
        jax.ShapeDtypeStruct((bp, n), jnp.float32),
        jax.ShapeDtypeStruct((bp, n), jnp.float32),
    ]
    n2 = 2 * n
    outs = pl.pallas_call(
        functools.partial(_mega_kernel, nfreqs_true, ntimes_true, refine,
                          all_unflagged, inkernel_rng, inv_passes),
        # CPU (tests, CPU CLI runs): interpreter instead of Mosaic
        interpret=(jax.default_backend() == "cpu"),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((batch_tile, n2, n2), jnp.float32),  # E
            pltpu.VMEM((batch_tile, n2, n2), jnp.float32),  # Schur workspace
            pltpu.VMEM((batch_tile, n2, n2), jnp.float32),  # inverse
            pltpu.VMEM((batch_tile, n2, t), jnp.float32),   # embedded RHS
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(*operands)
    if pad_b:
        outs = [o[:B] for o in outs]
    return tuple(outs)
