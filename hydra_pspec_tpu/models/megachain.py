"""Driver for the multi-iteration chain kernel (ops/pallas/megachain.py):
K whole Gibbs iterations per Pallas program, bandpower conditional
included. Reuses the mega-path operator layout (models/mega.py).

Semantics are pinned against the single-step mega path + XLA sampler in
tests/test_megachain.py (external-randomness mode); the in-kernel-RNG
production mode is statistically validated on hardware (chi^2 ~ 1,
posterior-vs-truth) — the CPU interpreter stubs the core PRNG.

Reference: the Gibbs loop of hydra_pspec/pspec.py:606-638.
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cplx import C
from ..ops.pallas.megachain import gcr_megachain, _P_PAD
from .mega import MegaDims, MegaOperators, pad_ps
from .rgibbs import RGibbsSample


class MegaChainTables(NamedTuple):
    """Sublane-tiled InvGammaTable rows for the kernel."""

    tlog8: jax.Array  # (8, S) — log y, rows identical
    q8: jax.Array     # (8, S) — Q(alpha, y), rows identical


def make_chain_tables(mops: MegaOperators) -> MegaChainTables:
    tlog = np.asarray(mops.igt.log_y, dtype=np.float32)
    q = np.asarray(mops.igt.q, dtype=np.float32)
    return MegaChainTables(
        tlog8=jnp.asarray(np.tile(tlog[None], (8, 1))),
        q8=jnp.asarray(np.tile(q[None], (8, 1))),
    )


def prior_static_from(prior, dims: MegaDims):
    """Host-side (2, Nfreqs-or-n) prior -> static ((idx, lo, hi), ...) for
    the bounded bins. The prior must be concrete (numpy) — it is a run
    constant in every reference configuration."""
    p = np.asarray(prior)
    idxs = np.nonzero(np.any(p > 0, axis=0))[0]
    if len(idxs) > _P_PAD:
        raise NotImplementedError(
            f"megachain supports <= {_P_PAD} bounded prior bins; "
            f"got {len(idxs)} (use the mega/rgibbs engines)")
    return tuple(
        (int(i), float(p[1, i]), float(p[0, i])) for i in idxs)


def _ln_post(noise_nu, bmask, ps, nfreqs):
    """(K, B) log posterior from the per-iteration vector outputs —
    identical form to models/mega.gibbs_step_mega."""
    sig_term = jnp.sum(
        bmask / jnp.maximum(ps, jnp.finfo(jnp.float32).tiny), axis=-1)
    return -(jnp.sum(noise_nu, axis=-1) + sig_term)


def run_chunk_megachain(
    mops: MegaOperators,
    tables: MegaChainTables,
    dims: MegaDims,
    ps_pad: jax.Array,
    k_total: int,
    prior_static=(),
    *,
    seed=None,
    randomness=None,
    refine: int = 1,
    batch_tile: int = 8,
    store_cr: bool = True,
    inv_passes: int = 3,
    warm_ns: int = 0,
    drift_max: float = 0.25,
):
    """One kernel invocation of ``k_total`` iterations. ``randomness``
    (CPU tests): dict with oa/ob pairs (K, B, n, t), gam (K, B, n),
    u_pb (K, B, 128); otherwise ``seed`` drives the in-kernel PRNG.
    ``warm_ns > 0``: carry the system inverse across iterations in VMEM
    and refresh it with that many Newton-Schulz steps instead of a full
    rebuild when the relative bandpower move stays under ``drift_max``.
    Returns (ps_pad_final, RGibbsSample stacked over K)."""
    inkernel = randomness is None
    kwargs = dict(
        nfreqs_true=dims.nfreqs, ntimes_true=dims.ntimes,
        k_total=k_total, alpha_int=dims.ntimes - 1,
        prior_static=tuple(prior_static), batch_tile=batch_tile,
        refine=refine, all_unflagged=dims.all_unflagged,
        inkernel_rng=inkernel, inv_passes=inv_passes,
        warm_ns=warm_ns, drift_max=drift_max,
    )
    if inkernel:
        rng_args = dict(seed=seed)
    else:
        rng_args = dict(
            oa_re=randomness["oa_re"], oa_im=randomness["oa_im"],
            ob_re=randomness["ob_re"], ob_im=randomness["ob_im"],
            gam=randomness["gam"], u_pb=randomness["u_pb"],
        )
    (sig_re, sig_im, amp_re, amp_im, chi, ps_k, noise_nu, bmask,
     ps_final) = gcr_megachain(
        mops.pt_re, mops.pt_im, mops.nih,
        mops.nid_re, mops.nid_im, mops.dw_re, mops.dw_im,
        mops.ninv_full, mops.w,
        mops.fg_re, mops.fg_im, mops.g_re, mops.g_im,
        mops.mi_re, mops.mi_im, mops.a0_re, mops.a0_im,
        mops.f_re, mops.f_im, tables.tlog8, tables.q8, ps_pad,
        **rng_args, **kwargs,
    )
    ln_post = _ln_post(noise_nu, bmask, ps_k, dims.nfreqs)
    nf, nt, nm = dims.nfreqs, dims.ntimes, dims.nmodes
    ps_out = ps_k[:, :, :nf]
    if store_cr:
        sample = RGibbsSample(
            signal_cr=C(jnp.swapaxes(sig_re[:, :, :nf, :nt], 2, 3),
                        jnp.swapaxes(sig_im[:, :, :nf, :nt], 2, 3)),
            ps=ps_out,
            fg_amps=C(jnp.swapaxes(amp_re[:, :, :nm, :nt], 2, 3),
                      jnp.swapaxes(amp_im[:, :, :nm, :nt], 2, 3)),
            chisq=jnp.swapaxes(chi[:, :, :nf, :nt], 2, 3),
            ln_post=ln_post,
        )
    else:
        zero = jnp.zeros((), dtype=jnp.float32)
        chi_mean = jnp.sum(chi, axis=(2, 3)) / (nf * nt)
        sample = RGibbsSample(
            signal_cr=C(zero, zero), ps=ps_out,
            fg_amps=C(zero, zero), chisq=chi_mean, ln_post=ln_post,
        )
    return ps_final, sample


def run_chain_megachain(
    key,
    mops: MegaOperators,
    dims: MegaDims,
    ps0_pad: jax.Array,
    prior,
    niter: int,
    *,
    store_cr: bool = True,
    refine: int = 1,
    batch_tile: int = 8,
    chunk: Optional[int] = None,
    inv_passes: int = 3,
    warm_ns: int = 0,
    drift_max: float = 0.25,
):
    """Full chain via chunked kernel invocations (chunk defaults to
    min(niter, 100)); randomness from the in-kernel PRNG seeded off
    ``key``. Returns (ps_pad_final, samples stacked over niter)."""
    tables = make_chain_tables(mops)
    prior_static = prior_static_from(prior, dims)
    chunk = min(niter, chunk or 100)
    ps = ps0_pad
    pieces = []
    it = 0
    ci = 0
    while it < niter:
        k_total = min(chunk, niter - it)
        seed = jax.random.randint(
            jax.random.fold_in(key, ci), (), minval=-2**31, maxval=2**31 - 1,
            dtype=jnp.int32)
        ps, sample = run_chunk_megachain(
            mops, tables, dims, ps, k_total, prior_static,
            seed=seed, refine=refine, batch_tile=batch_tile,
            store_cr=store_cr, inv_passes=inv_passes,
            warm_ns=warm_ns, drift_max=drift_max,
        )
        pieces.append(sample)
        it += k_total
        ci += 1
    if len(pieces) == 1:
        return ps, pieces[0]
    cat = lambda *xs: (jnp.concatenate(xs, 0)
                       if getattr(xs[0], "ndim", 0) else xs[0])
    return ps, jax.tree.map(cat, *pieces)
