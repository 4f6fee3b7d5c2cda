"""The Gibbs sampler: single step, scanned chain, and the batched
(baseline x chain) driver entry points.

Reference call stack being replaced (hydra_pspec/pspec.py:377-658):
``gibbs_sample_with_fg`` -> ``gibbs_step_fgmodes`` -> {``build_matrices``,
``gcr_fgmodes`` (multiprocess Pool over times), ``sample_S``,
``covariance_from_pspec``}. Here one step is a pure jittable function of
``(key, ps)`` given chain constants; the chain is a ``lax.scan``; baselines
and chains are vmapped batch axes sharded over the device mesh.
"""
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fourier import cfft, covariance_from_pspec, pspec_from_covariance
from ..ops.invgamma import sample_bandpowers
from .gcr import ChainOperators, build_chain_operators, gcr_solve


class GibbsSample(NamedTuple):
    """Per-iteration outputs (mirrors the reference's sample arrays,
    pspec.py:590-596)."""

    signal_cr: jax.Array  # (Ntimes, Nfreqs) complex
    ps: jax.Array         # (Nfreqs,) real — delay bandpowers (centered order)
    fg_amps: jax.Array    # (Ntimes, Nmodes) complex
    chisq: jax.Array      # (Ntimes, Nfreqs) real
    ln_post: jax.Array    # () real


def initial_ps(S_initial, fourier_op) -> jax.Array:
    """Convert an initial signal covariance (run-hydra-pspec.py:417-425)
    into the ps-parameterized chain state by projecting onto delay-diagonal
    bandpowers. Exact when S_initial is delay-stationary (the bundled
    eor-cov.npy is constructed that way, test_data/README.md:9-12); the
    identity-matrix default maps to a flat spectrum exactly.

    The sampler-state convention is ``S = F^H diag(ps / n^2) F``
    (pspec.py:464 applies the 1/n^2 FFT normalization when rebuilding S
    from a drawn spectrum), hence the ``n^2`` rescale here."""
    S_initial = jnp.asarray(S_initial)
    n = S_initial.shape[-1]
    ps = pspec_from_covariance(S_initial, fourier_op) * n**2
    return jnp.clip(ps, 0.0, None)


def gibbs_step(
    key: jax.Array,
    ps: jax.Array,
    ops: ChainOperators,
    ps_prior: jax.Array,
    map_estimate: bool = False,
    jitter: float = 0.0,
    prior_idx=None,
) -> tuple[jax.Array, GibbsSample]:
    """One full Gibbs alternation (reference pspec.py:377-490):
      1. GCR draw of signal + FG amplitudes given ps,
      2. inverse-gamma bandpower draw given the signal realizations,
      3. chi^2 / log-posterior diagnostics.

    Returns ``(ps_new, sample)``; the next iteration consumes ``ps_new``.
    """
    ntimes, nfreqs = ops.d_w.shape
    dtype = ops.d_w.dtype
    rdtype = jnp.finfo(dtype).dtype
    k_oma, k_omb, k_ps = jax.random.split(key, 3)

    if map_estimate:
        omega_a = omega_b = None
    else:
        omega_a = jax.random.normal(k_oma, (ntimes, nfreqs), dtype=dtype)
        omega_b = jax.random.normal(k_omb, (ntimes, nfreqs), dtype=dtype)

    cr = gcr_solve(ops, ps, omega_a, omega_b, jitter=jitter)
    signal_cr, fg_amps = cr.signal_cr, cr.fg_amps

    # Full data model and chi^2 per (time, channel) against the *unmasked*
    # noise diagonal (reference pspec.py:447-452).
    model = signal_cr + fg_amps @ ops.fgmodes.T
    resid = ops.d_w - model
    chisq = (jnp.abs(resid) ** 2) * ops.noise.ninv_full_diag

    # Bandpower conditional draw from the delay transform of the CRs
    # (pspec.py:462). The (Ntimes - 1) complex-data alpha convention and the
    # truncated-prior handling live in ops/invgamma.py.
    sk = cfft(signal_cr, axis=-1)
    ps_new = sample_bandpowers(k_ps, sk, ps_prior.astype(rdtype), prior_idx)

    # Log posterior under the *new* covariance sample (pspec.py:472-485).
    # Boolean submatrix indexing becomes multiplicative masking (identical
    # quadratic forms); the S^{-1} form is analytic:
    # x^H S^{-1} x = sum_k |cfft(w*x)_k|^2 / ps_k with S = F^H diag(ps/n^2) F.
    noise_term = jnp.sum(ops.noise.apply_ni(resid).conj() * resid).real
    sk_masked = cfft(signal_cr * ops.w, axis=-1)
    sig_term = jnp.sum(
        (jnp.abs(sk_masked) ** 2) / jnp.maximum(ps_new, jnp.finfo(rdtype).tiny)
    )
    ln_post = -(noise_term + sig_term)

    sample = GibbsSample(
        signal_cr=signal_cr,
        ps=ps_new.astype(rdtype),
        fg_amps=fg_amps,
        chisq=chisq.astype(rdtype),
        ln_post=ln_post.astype(rdtype),
    )
    return ps_new, sample


def gibbs_step_fgmodes(
    key, vis, flags, signal_S, fgmodes, Ninv, ps_prior=None,
    map_estimate=False, jitter=0.0,
):
    """API mirror of reference ``gibbs_step_fgmodes`` (pspec.py:377-490):
    takes a dense covariance, returns
    ``(signal_cr, S_sample, ps_sample, fg_amps, chisq, ln_post)``.
    Prefer :func:`run_chain` for real work — this rebuilds chain constants
    every call."""
    ops = build_chain_operators(vis, flags, fgmodes, Ninv)
    if ps_prior is None:
        ps_prior = jnp.zeros((2, vis.shape[-1]))
    ps = initial_ps(signal_S, ops.fourier_op)
    ps_new, s = gibbs_step(
        key, ps, ops, jnp.asarray(ps_prior), map_estimate=map_estimate,
        jitter=jitter,
    )
    n = vis.shape[-1]
    S_sample = covariance_from_pspec(ps_new / n**2, ops.fourier_op)
    return s.signal_cr, S_sample, s.ps, s.fg_amps, s.chisq, s.ln_post


@partial(
    jax.jit,
    static_argnames=("niter", "map_estimate", "jitter", "store_cr"),
)
def run_chain(
    key: jax.Array,
    ops: ChainOperators,
    ps0: jax.Array,
    ps_prior: jax.Array,
    niter: int,
    map_estimate: bool = False,
    jitter: float = 0.0,
    store_cr: bool = True,
    prior_idx=None,
):
    """Run ``niter`` Gibbs iterations as a ``lax.scan``.

    Returns ``(ps_final, samples)`` where ``samples`` is a GibbsSample with
    a leading ``niter`` axis. With ``store_cr=False`` the per-iteration
    signal CRs / FG amplitudes / chi^2 maps are not materialized (only
    bandpowers + diagnostics), bounding device memory for long chains.
    Per-iteration keys are ``fold_in(key, i)`` — decorrelated by
    construction across (chain, iteration), unlike the reference's
    process-seed arithmetic (pspec.py:186-197).
    """

    def body(ps, i):
        ps_new, s = gibbs_step(
            jax.random.fold_in(key, i), ps, ops, ps_prior,
            map_estimate=map_estimate, jitter=jitter, prior_idx=prior_idx,
        )
        if not store_cr:
            s = GibbsSample(
                signal_cr=jnp.zeros((), dtype=ops.d_w.dtype),
                ps=s.ps,
                fg_amps=jnp.zeros((), dtype=ops.d_w.dtype),
                chisq=jnp.mean(s.chisq),
                ln_post=s.ln_post,
            )
        return ps_new, s

    return jax.lax.scan(body, ps0, jnp.arange(niter))


# Batched form: vmap over a leading batch axis of chain operators / state.
# ps_prior and the fourier operator are shared; everything else is per
# baseline (or per chain when running multiple chains per baseline).
run_chains_batched = jax.jit(
    jax.vmap(run_chain, in_axes=(0, 0, 0, None, None, None, None, None)),
    static_argnums=(4, 5, 6, 7),
)


def gibbs_sample_with_fg(
    vis,
    flags,
    S_initial,
    fgmodes,
    Ninv,
    ps_prior,
    Niter: int = 100,
    seed: Optional[int] = None,
    verbose: bool = True,
    write_Niter: int = 100,
    out_dir=None,
    map_estimate: bool = False,
    store_cr: bool = True,
    jitter: float = 0.0,
    dtype=None,
):
    """Single-baseline convenience API mirroring reference
    ``gibbs_sample_with_fg`` (pspec.py:493-658): returns
    ``(signal_cr, signal_S, signal_ps, fg_amps, chisq, ln_post, write_time)``
    as host numpy arrays and optionally writes incremental samples every
    ``write_Niter`` iterations via utils.io (crash resilience, pspec.py:625).

    ``signal_S`` is the *final* covariance sample with shape
    ``(Nfreqs, Nfreqs)`` (the reference's cov-eor output is buggy — it saves
    rows of the latest covariance, pspec.py:591,599,631; every per-iteration
    covariance is recoverable from ``signal_ps`` via
    ``covariance_from_pspec(ps / Nfreqs**2, F)``).
    """
    import time as _time

    from ..utils import io as hio

    if map_estimate:
        Niter = 1
        write_Niter = 1
    key = jax.random.key(seed if seed is not None else 0)
    ops = build_chain_operators(vis, flags, fgmodes, Ninv, dtype=dtype)
    ps = initial_ps(jnp.asarray(S_initial), ops.fourier_op)
    ps_prior = jnp.asarray(ps_prior)

    ntimes, nfreqs = ops.d_w.shape
    nmodes = ops.fgmodes.shape[-1]
    chunks = []
    write_time = 0.0
    done = 0
    chunk_idx = 0
    while done < Niter:
        n = min(write_Niter, Niter - done)
        chunk_key = jax.random.fold_in(key, chunk_idx)
        ps, samples = run_chain(
            chunk_key, ops, ps, ps_prior, n,
            map_estimate=map_estimate, jitter=jitter, store_cr=store_cr,
        )
        host = jax.device_get(samples)
        chunks.append(host)
        done += n
        chunk_idx += 1
        if verbose:
            print(
                f"iter {done}/{Niter}  chisq={np.mean(host.chisq):.4f}  "
                f"ln_post={host.ln_post[-1]:.1f}"
            )
        if out_dir is not None:
            t0 = _time.perf_counter()
            hio.write_numpy_files(
                out_dir,
                *_stack_chunks(chunks, ops, store_cr),
            )
            write_time += _time.perf_counter() - t0

    signal_cr, signal_S, signal_ps, fg_amps, chisq, ln_post = _stack_chunks(
        chunks, ops, store_cr
    )
    return signal_cr, signal_S, signal_ps, fg_amps, chisq, ln_post, write_time


def _stack_chunks(chunks, ops, store_cr):
    signal_ps = np.concatenate([c.ps for c in chunks])
    ln_post = np.concatenate([np.atleast_1d(c.ln_post) for c in chunks])
    if store_cr:
        signal_cr = np.concatenate([c.signal_cr for c in chunks])
        fg_amps = np.concatenate([c.fg_amps for c in chunks])
        chisq = np.concatenate([c.chisq for c in chunks])
    else:
        signal_cr = np.zeros((0,))
        fg_amps = np.zeros((0,))
        chisq = np.concatenate([np.atleast_1d(c.chisq) for c in chunks])
    n = signal_ps.shape[-1]
    S_final = np.asarray(
        covariance_from_pspec(
            jnp.asarray(signal_ps[-1]) / n**2, ops.fourier_op
        )
    )
    return signal_cr, S_final, signal_ps, fg_amps, chisq, ln_post


def gcr_fgmodes(key, vis, flags, signal_S, fgmodes, Ninv, map_estimate=False):
    """API mirror of reference ``gcr_fgmodes`` (pspec.py:238-310): draw
    signal + foreground-amplitude constrained realizations for every time
    sample of one baseline. Returns ``(Ntimes, Nfreqs + Nmodes)`` complex
    samples packed like the reference's solver output (signal columns then
    amplitude columns). Takes model inputs directly instead of the
    reference's precomputed ``matrices`` list (which existed only to hoist
    sqrtm/pinv out of the pool loop — both gone here)."""
    import numpy as _np

    ops = build_chain_operators(vis, flags, fgmodes, Ninv)
    ps = initial_ps(jnp.asarray(signal_S), ops.fourier_op)
    ntimes, nfreqs = ops.d_w.shape
    if map_estimate:
        omega_a = omega_b = None
    else:
        k_a, k_b = jax.random.split(key)
        omega_a = jax.random.normal(k_a, (ntimes, nfreqs), dtype=ops.d_w.dtype)
        omega_b = jax.random.normal(k_b, (ntimes, nfreqs), dtype=ops.d_w.dtype)
    res = gcr_solve(ops, ps, omega_a, omega_b)
    return jnp.concatenate([res.signal_cr, res.fg_amps], axis=-1)
