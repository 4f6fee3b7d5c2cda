"""Mega-kernel execution path: the whole per-iteration GCR draw +
statistics in one Pallas program (ops/pallas/megastep.py), leaving only
the RNG draws, the bandpower sampler, and ln_post assembly as XLA ops.

Same math as models/rgibbs.py (pinned by tests/test_mega.py); arrays are
kept padded (Nfreqs->128-multiple, Ntimes/Nmodes->tile-aligned) and
TIME-TRANSPOSED (B, n, T) end to end. Sample outputs are trimmed back to
true sizes and the reference layout before leaving the step.

Reference semantics: hydra_pspec/pspec.py:151-490.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx
from ..ops.cplx import C
from ..ops.invgamma import InvGammaTable, sample_bandpowers_from_beta
from ..ops.pallas.megastep import gcr_megastep
from .rgibbs import RChainOperators, RGibbsSample, build_chain_operators


class MegaDims(NamedTuple):
    """Static (hashable) problem dims for the mega path."""

    nfreqs: int      # true Nfreqs (pre-padding)
    ntimes: int      # true Ntimes
    nmodes: int      # true Nmodes
    n: int           # padded freq dim (128-multiple)
    t: int           # padded time dim
    m: int           # padded mode dim
    all_unflagged: bool


class MegaOperators(NamedTuple):
    """Chain constants, padded + time-transposed (see megastep.py)."""

    pt_re: jax.Array
    pt_im: jax.Array
    nih: jax.Array
    nid_re: jax.Array
    nid_im: jax.Array
    # FG-DEFLATED masked visibilities: d_w - Fg a0, deflated in float64 on
    # the host. The kernel's residual is res = dw_defl - sig - Fg(amps-a0),
    # algebraically identical to d_w - sig - Fg amps but with only
    # fluctuation-scale operands in the in-kernel matmul: the foreground
    # amplitudes are ~1e2-1e3 x the noise scale, so computing Fg @ amps
    # directly at bf16-split precision plants a deterministic
    # data-correlated ~1e-5*|FG| error inside the noise-scale residual —
    # measured as a +0.5% (CPU) / +1.5% (TPU) chi^2 bias
    # (scripts/probe_step_diff.py bisection, 2026-08-17).
    dw_re: jax.Array
    dw_im: jax.Array
    ninv_full: jax.Array
    w: jax.Array
    fg_re: jax.Array
    fg_im: jax.Array
    g_re: jax.Array
    g_im: jax.Array
    mi_re: jax.Array
    mi_im: jax.Array
    a0_re: jax.Array
    a0_im: jax.Array
    f_re: jax.Array
    f_im: jax.Array
    igt: InvGammaTable


def _pad_np(x, shape):
    out = np.zeros(shape, dtype=x.dtype)
    out[tuple(slice(0, s) for s in x.shape)] = x
    return out


def from_chain_operators(ops: RChainOperators, t_pad=None) -> tuple:
    """Convert (a batch of) rgibbs chain operators into the padded
    transposed mega layout. Host-side, one-time. ``t_pad``: force the
    padded time dimension (>= the 128-rounded true count) — the grouped
    time-flags megachain path pads every group to a common width."""
    if ops.ni_dense is not None:
        raise NotImplementedError(
            "mega path supports diagonal noise; dense Ninv uses the "
            "rgibbs/complex engines")
    B, T0, n0 = ops.d_w.shape
    m0 = ops.fg.shape[-1]
    n = -(-n0 // 128) * 128
    t = -(-T0 // 128) * 128
    if t_pad is not None:
        if t_pad < t:
            raise ValueError(f"t_pad={t_pad} < required padded width {t}")
        t = t_pad
    m = -(-m0 // 8) * 8
    dt = np.float32

    def tpad(c, d2, d3, transpose=False):
        """C field -> padded numpy (B, d2, d3) pair, optionally
        time-transposing (B, T, x) -> (B, x, T)."""
        re = np.asarray(c.re, dtype=dt)
        im = np.asarray(c.im, dtype=dt)
        if transpose:
            re = np.swapaxes(re, 1, 2)
            im = np.swapaxes(im, 1, 2)
        return (_pad_np(re, (B, d2, d3)), _pad_np(im, (B, d2, d3)))

    pt_re, pt_im = tpad(ops.p_tilde, n, n)
    nid_re, nid_im = tpad(ops.ni_d, n, t, transpose=True)
    # FG-deflate the residual baseline in float64 (see MegaOperators note)
    dw64 = (np.asarray(ops.d_w.re, np.float64)
            + 1j * np.asarray(ops.d_w.im, np.float64))
    fg64 = (np.asarray(ops.fg.re, np.float64)
            + 1j * np.asarray(ops.fg.im, np.float64))
    a064 = (np.asarray(ops.a0.re, np.float64)
            + 1j * np.asarray(ops.a0.im, np.float64))
    dw_defl = dw64 - np.einsum("bxm,btm->btx", fg64, a064)
    dw_re, dw_im = tpad(
        C(dw_defl.real.astype(dt), dw_defl.imag.astype(dt)),
        n, t, transpose=True)
    fg_re, fg_im = tpad(ops.fg, n, m)
    g_re, g_im = tpad(ops.g_mat, n, m)
    mi_re, mi_im = tpad(ops.maa_inv, m, m)
    a0_re, a0_im = tpad(ops.a0, m, t, transpose=True)
    f_re = _pad_np(np.asarray(ops.f.re, dtype=dt), (n, n))
    f_im = _pad_np(np.asarray(ops.f.im, dtype=dt), (n, n))
    vec = lambda v: jnp.asarray(
        _pad_np(np.asarray(v, dtype=dt), (B, n)))

    mops = MegaOperators(
        pt_re=jnp.asarray(pt_re), pt_im=jnp.asarray(pt_im),
        nih=vec(ops.nih_diag),
        nid_re=jnp.asarray(nid_re), nid_im=jnp.asarray(nid_im),
        dw_re=jnp.asarray(dw_re), dw_im=jnp.asarray(dw_im),
        ninv_full=vec(ops.ninv_full_diag), w=vec(ops.w),
        fg_re=jnp.asarray(fg_re), fg_im=jnp.asarray(fg_im),
        g_re=jnp.asarray(g_re), g_im=jnp.asarray(g_im),
        mi_re=jnp.asarray(mi_re), mi_im=jnp.asarray(mi_im),
        a0_re=jnp.asarray(a0_re), a0_im=jnp.asarray(a0_im),
        f_re=jnp.asarray(f_re), f_im=jnp.asarray(f_im),
        igt=ops.igt,
    )
    all_unflagged = bool(np.all(np.asarray(ops.w) == 1))
    dims = MegaDims(n0, T0, m0, n, t, m, all_unflagged)
    return mops, dims


def build_mega_operators(vis, w, fgmodes, ninv):
    """Raw inputs -> (MegaOperators batch-of-one, MegaDims)."""
    return from_chain_operators(
        build_chain_operators(vis, w, fgmodes, ninv, dtype=jnp.float32))


def broadcast_mega_operators(mops: MegaOperators, batch: int) -> MegaOperators:
    def bc(x):
        return jnp.broadcast_to(x, (batch,) + x.shape[1:])

    body = jax.tree.map(bc, mops._replace(f_re=None, f_im=None, igt=None))
    return body._replace(f_re=mops.f_re, f_im=mops.f_im, igt=mops.igt)


def pad_ps(ps, dims: MegaDims):
    """(B, nfreqs) bandpower state -> padded (B, n); pad bins carry 0 and
    stay 0 through the sampler (beta = 0 there)."""
    B = ps.shape[0]
    return jnp.zeros((B, dims.n), dtype=jnp.float32).at[:, : dims.nfreqs].set(
        jnp.asarray(ps, dtype=jnp.float32))


def gibbs_step_mega(
    key: jax.Array,
    ps_pad: jax.Array,
    mops: MegaOperators,
    dims: MegaDims,
    ps_prior_pad: jax.Array,
    prior_idx=None,
    refine: int = 1,
    batch_tile: int = 8,
    store_cr: bool = True,
    inkernel_rng: bool = False,
    sids=None,
    chi_mask=None,
):
    """One Gibbs alternation through the mega-kernel. ``ps_pad`` and
    ``ps_prior_pad`` live in the padded basis (see :func:`pad_ps`).

    Randomness is keyed per chain on ``fold_in(key, sids[b])`` (``sids``
    defaults to the batch positions) so a chain's draws depend only on its
    global stream id — batch padding and slot placement leave real chains'
    samples bit-identical (same invariance contract as the megachain
    engine and rgibbs.gibbs_step).

    ``inkernel_rng``: draw the fluctuation vectors with the TPU core PRNG
    inside the kernel (profiling mode; streams are seeded per grid step,
    NOT composition-invariant)."""
    B = ps_pad.shape[0]
    n, t = dims.n, dims.t
    if sids is None:
        sids = jnp.arange(B, dtype=jnp.int32)
    common = dict(
        nfreqs_true=dims.nfreqs, ntimes_true=dims.ntimes,
        batch_tile=batch_tile, refine=refine,
        all_unflagged=dims.all_unflagged,
    )
    if inkernel_rng:
        seed = jax.random.randint(
            key, (1, 1), minval=-2**31, maxval=2**31 - 1, dtype=jnp.int32)
        omegas = dict(seed=seed, inkernel_rng=True)
        k_ps = jax.vmap(
            lambda s: jax.random.split(jax.random.fold_in(key, s), 3)[2]
        )(sids)
    else:
        half = np.sqrt(0.5).astype(np.float32)
        # omega_a drawn directly in the delay basis with covariance nfreqs*I
        sa = half * np.sqrt(np.float32(dims.nfreqs))

        def draw_one(sid):
            kc = jax.random.fold_in(key, sid)
            ka, kb, kp = jax.random.split(kc, 3)
            oa = jax.random.normal(ka, (2, n, t), dtype=jnp.float32) * sa
            ob = jax.random.normal(kb, (2, n, t), dtype=jnp.float32) * half
            return oa, ob, kp

        oa, ob, k_ps = jax.vmap(draw_one)(sids)     # (B, 2, n, t)
        omegas = dict(oa_re=oa[:, 0], oa_im=oa[:, 1],
                      ob_re=ob[:, 0], ob_im=ob[:, 1])

    sig_re, sig_im, amp_re, amp_im, chi, beta, noise_nu, bmask = gcr_megastep(
        mops.pt_re, mops.pt_im, ps_pad, mops.nih,
        mops.nid_re, mops.nid_im, mops.dw_re, mops.dw_im,
        mops.ninv_full, mops.w,
        mops.fg_re, mops.fg_im, mops.g_re, mops.g_im,
        mops.mi_re, mops.mi_im, mops.a0_re, mops.a0_im,
        mops.f_re, mops.f_im,
        **omegas, **common,
    )

    # vmapped over the per-chain keys (same batch-composition invariance
    # as the omega draws; the table is chain-shared)
    ps_new = jax.vmap(
        lambda k, b: sample_bandpowers_from_beta(
            k, b, dims.ntimes, ps_prior_pad, prior_idx, mops.igt
        )
    )(k_ps, beta)
    # pad bins: beta == 0 -> keep them exactly 0 so dd stays 0 next round
    npad_mask = (jnp.arange(n) < dims.nfreqs).astype(ps_new.dtype)
    ps_new = ps_new * npad_mask

    sig_term = jnp.sum(
        bmask / jnp.maximum(ps_new, jnp.finfo(jnp.float32).tiny), axis=-1)
    ln_post = -(jnp.sum(noise_nu, axis=-1) + sig_term)

    ps_out = ps_new[:, : dims.nfreqs]  # samples carry the true width
    if store_cr:
        nf, nt, nm = dims.nfreqs, dims.ntimes, dims.nmodes
        sample = RGibbsSample(
            signal_cr=C(jnp.swapaxes(sig_re[:, :nf, :nt], 1, 2),
                        jnp.swapaxes(sig_im[:, :nf, :nt], 1, 2)),
            ps=ps_out,
            fg_amps=C(jnp.swapaxes(amp_re[:, :nm, :nt], 1, 2),
                      jnp.swapaxes(amp_im[:, :nm, :nt], 1, 2)),
            chisq=jnp.swapaxes(chi[:, :nf, :nt], 1, 2),
            ln_post=ln_post,
        )
    else:
        zero = jnp.zeros((), dtype=jnp.float32)
        if chi_mask is not None:
            cm = jnp.zeros((chi.shape[1],), jnp.float32).at[
                : dims.nfreqs].set(jnp.asarray(chi_mask, jnp.float32))
            chi_mean = jnp.sum(chi * cm[None, :, None], axis=(1, 2)) / (
                jnp.sum(cm) * dims.ntimes)
        else:
            chi_mean = jnp.sum(chi, axis=(1, 2)) / (
                dims.nfreqs * dims.ntimes)
        sample = RGibbsSample(
            signal_cr=C(zero, zero), ps=ps_out,
            fg_amps=C(zero, zero), chisq=chi_mean, ln_post=ln_post,
        )
    return ps_new, sample


def run_chain_mega(
    key, mops: MegaOperators, dims: MegaDims, ps0_pad, ps_prior_pad,
    niter: int, store_cr: bool = True, prior_idx=None, refine: int = 1,
    batch_tile: int = 8, inkernel_rng: bool = False, sids=None,
    chi_mask=None,
):
    """``lax.scan`` over iterations of the mega step (batch-first)."""

    def body(ps, i):
        return gibbs_step_mega(
            jax.random.fold_in(key, i), ps, mops, dims, ps_prior_pad,
            prior_idx=prior_idx, refine=refine, batch_tile=batch_tile,
            store_cr=store_cr, inkernel_rng=inkernel_rng, sids=sids,
            chi_mask=chi_mask,
        )

    return jax.lax.scan(body, ps0_pad, jnp.arange(niter))


run_chain_mega_jit = jax.jit(
    run_chain_mega,
    static_argnames=("dims", "niter", "store_cr", "refine", "batch_tile",
                     "inkernel_rng"),
)
