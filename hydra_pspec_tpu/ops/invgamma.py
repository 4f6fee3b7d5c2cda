"""Inverse-gamma bandpower sampling, including the truncated (bounded-prior)
variant via log-grid CDF inversion.

Reference semantics (hydra_pspec/pspec.py:11-127):
  * ``beta_k = sum_t |sk[t, k]|^2`` over the delay transform of the signal
    constrained realizations; ``alpha = Ntimes - 1`` (complex-data
    convention, pspec.py:104-108).
  * Unbounded bins: ``x = beta / Gamma(alpha)`` (equivalently
    ``invgamma.rvs(a=alpha) * beta``, pspec.py:125).
  * Bounded bins (prior > 0): inversion sampling of an inverse-gamma with
    shape ``alpha + 1`` (the log-uniform prior folds in an extra ``1/x``,
    pspec.py:113-123) on a 1000-point log grid between the prior bounds
    (pspec.py:50-62).

Everything is vectorized over delay bins; both branches are evaluated for
every bin and selected with ``jnp.where`` (static shapes, no host control
flow), which is the XLA-friendly equivalent of the reference's per-bin
Python loop (pspec.py:113-125).
"""
from functools import partial

import jax
import jax.numpy as jnp

from .fourier import cfft

_NGRID = 1000  # matches the reference's default interpolation grid


def invgamma_cdf(x, alpha, beta):
    """CDF of InverseGamma(alpha, scale=beta):
    ``P(X <= x) = Q(alpha, beta / x)`` (upper regularized gamma)."""
    return jax.scipy.special.gammaincc(alpha, beta / x)


@partial(jax.jit, static_argnames=("ngrid",))
def truncated_invgamma_sample(u, alpha, beta, lo, hi, ngrid: int = _NGRID):
    """Inverse-CDF draw from InverseGamma(alpha, scale=beta) truncated to
    ``[lo, hi]``, given a uniform variate ``u`` in [0, 1).

    Follows the reference's method (pspec.py:50-62): evaluate the CDF on a
    log-spaced grid over the bounds, renormalize to [0, 1] over the
    truncation region, then linearly interpolate the inverse CDF at ``u``.
    Flat (duplicate) CDF regions are handled with a clamped-denominator
    interpolation instead of the reference's ``np.unique`` dedupe — both
    pick the boundary of the flat region.

    All arguments may be broadcastable arrays; the grid axis is internal.
    """
    u, alpha, beta, lo, hi = jnp.broadcast_arrays(
        *[jnp.asarray(a, dtype=jnp.result_type(float)) for a in (u, alpha, beta, lo, hi)]
    )
    # log-spaced grid between bounds: shape (..., ngrid)
    t = jnp.linspace(0.0, 1.0, ngrid)
    log_lo = jnp.log10(lo)[..., None]
    log_hi = jnp.log10(hi)[..., None]
    x = 10.0 ** (log_lo + (log_hi - log_lo) * t)
    cdf = invgamma_cdf(x, alpha[..., None], beta[..., None])
    cdf = cdf - cdf[..., :1]
    denom = jnp.maximum(cdf[..., -1:], jnp.finfo(cdf.dtype).tiny)
    cdf = cdf / denom
    # Inverse interpolation of (cdf, x) at u. cdf is monotone nondecreasing.
    idx = jnp.clip(
        jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1), 1, ngrid - 1
    )
    c0 = jnp.take_along_axis(cdf, (idx - 1)[..., None], axis=-1)[..., 0]
    c1 = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
    x0 = jnp.take_along_axis(x, (idx - 1)[..., None], axis=-1)[..., 0]
    x1 = jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0]
    frac = (u - c0) / jnp.maximum(c1 - c0, jnp.finfo(cdf.dtype).tiny)
    frac = jnp.clip(frac, 0.0, 1.0)
    return x0 + frac * (x1 - x0)


def inversion_sample_invgamma(alpha, beta, prior_min, prior_max, *, key, ngrid=_NGRID):
    """Single-draw convenience wrapper mirroring the reference API and its
    input validation (pspec.py:40-47) but taking an explicit PRNG ``key``."""
    import numpy as np

    if np.ndim(prior_min) == 0 and not isinstance(prior_min, jax.core.Tracer):
        if prior_min <= 0:
            raise ValueError("prior_min must be greater than zero")
        if prior_max <= 0:
            raise ValueError("prior_max must be greater than zero")
        if not np.isfinite(prior_max):
            raise ValueError("prior_max must be finite")
        if prior_max <= prior_min:
            raise ValueError("prior_max must be greater than prior_min")
    u = jax.random.uniform(key)
    return truncated_invgamma_sample(u, alpha, beta, prior_min, prior_max, ngrid=ngrid)


@jax.jit
def sample_bandpowers(key, sk, prior):
    """Draw delay power spectrum bandpowers given delay-space signal samples.

    Parameters
    ----------
    key : PRNG key.
    sk : (Ntimes, Nfreqs) complex — centered delay transform of the signal
        constrained realizations.
    prior : (2, Nfreqs) real — [0] upper and [1] lower bound per bin; a bin
        is bounded iff either entry is > 0 (reference pspec.py:114).

    Returns
    -------
    ps : (Nfreqs,) real bandpower sample.
    """
    ntimes, nfreqs = sk.shape
    real_dtype = jnp.finfo(sk.dtype).dtype
    beta = jnp.sum((sk * sk.conj()).real, axis=0)
    alpha = jnp.asarray(ntimes - 1.0, dtype=real_dtype)

    k_gamma, k_u = jax.random.split(key)
    # Unbounded: x = beta / Gamma(alpha, 1)
    g = jax.random.gamma(k_gamma, alpha, shape=(nfreqs,), dtype=real_dtype)
    free = beta / g
    # Bounded: truncated inverse-gamma with shape alpha + 1 between
    # [prior[1], prior[0]] (log-uniform prior, pspec.py:113-123).
    u = jax.random.uniform(k_u, (nfreqs,), dtype=real_dtype)
    has_prior = jnp.any(prior > 0, axis=0)
    # Safe bounds for unbounded bins (values unused; avoid log10(0)).
    lo = jnp.where(has_prior, prior[1], 1.0)
    hi = jnp.where(has_prior, prior[0], 10.0)
    bounded = truncated_invgamma_sample(u, alpha + 1.0, beta, lo, hi)
    return jnp.where(has_prior, bounded, free)


def sample_S(key, s=None, sk=None, prior=None):
    """Bandpower conditional draw from real-space (``s``) or delay-space
    (``sk``) signal samples — API mirror of reference pspec.py:67-127."""
    if s is None and sk is None:
        raise ValueError("Must pass in s (real space) or sk (Fourier space).")
    if sk is None:
        sk = cfft(s, axis=-1)
    if prior is None:
        prior = jnp.zeros((2, sk.shape[-1]))
    return sample_bandpowers(key, sk, prior)


def sprior(signals, bins: int, factor: float):
    """Build a ``(2, Nfreqs)`` bandpower prior window from true signals
    (reference pspec.py:130-148): bounds ``ds * factor`` / ``ds / factor``
    within ``bins`` of delay 0 (wrap-ordered), zero elsewhere, normalized by
    ``(Ntimes / 2 - 1)``."""
    signals = jnp.asarray(signals)
    nobs, nfreq = signals.shape
    sk = jnp.fft.fft(signals, axis=-1)
    ds = jnp.sum((sk * sk.conj()).real, axis=0)
    prior = jnp.stack([ds * factor, ds / factor])
    mask = jnp.zeros(nfreq, dtype=bool).at[: bins + 1].set(True)
    mask = mask.at[-bins:].set(True) if bins > 0 else mask
    prior = prior * mask[None, :]
    return prior / (nobs / 2 - 1)
