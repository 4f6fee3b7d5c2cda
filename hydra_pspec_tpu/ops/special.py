"""Fixed-trip-count special functions for TPU.

``jax.scipy.special.gammaincc`` lowers to a data-dependent ``while_loop``;
under vmap every lane waits for the slowest, and at the Gibbs sampler's
parameter values (shape ~ Ntimes ~ 200, arguments spanning the prior grid)
it dominated the whole iteration (measured ~120 ms/iter at 100 baselines on
v5e vs <1 ms for all the linear algebra). This implementation uses the
classic series / continued-fraction split with a *static* iteration count —
a dense, branch-free ``fori_loop`` the VPU chews through in microseconds.

Accuracy: ~1e-6 relative against scipy for a in [1, 1e4] over the x ranges
the sampler produces (pinned in tests/test_special.py).
"""
from functools import partial

import jax
import jax.numpy as jnp

_SERIES_ITERS = 256
_CF_ITERS = 128


def _log_prefactor(a, x):
    """log(x^a e^-x / Gamma(a)) — the common prefactor of both branches."""
    safe_x = jnp.maximum(x, jnp.finfo(x.dtype).tiny)
    return a * jnp.log(safe_x) - safe_x - jax.lax.lgamma(a)


def _lower_series(a, x, iters=_SERIES_ITERS):
    """Regularized lower P(a, x) by power series (accurate for x < a + 1):
    P = pref * sum_k x^k / (a (a+1) ... (a+k))."""

    def body(k, carry):
        term, total = carry
        term = term * x / (a + k)
        return term, total + term

    term0 = 1.0 / a
    _, total = jax.lax.fori_loop(1, iters, body, (term0, term0))
    return jnp.exp(_log_prefactor(a, x)) * total


def _upper_cf(a, x, iters=_CF_ITERS):
    """Regularized upper Q(a, x) by Lentz continued fraction (accurate for
    x >= a + 1)."""
    tiny = jnp.asarray(1e-30, dtype=x.dtype)
    b0 = x + 1.0 - a
    c0 = jnp.full_like(x, 1.0 / 1e-30)
    d0 = 1.0 / jnp.where(b0 == 0, tiny, b0)
    h0 = d0

    def body(i, carry):
        c, d, h = carry
        i_f = i.astype(x.dtype)
        an = -i_f * (i_f - a)
        b = x + 2.0 * i_f + 1.0 - a
        d = b + an * d
        d = jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = b + an / c
        c = jnp.where(jnp.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        h = h * d * c
        return c, d, h

    _, _, h = jax.lax.fori_loop(1, iters, body, (c0, d0, h0))
    return jnp.exp(_log_prefactor(a, x)) * h


@jax.jit
def gammaincc_fixed(a, x):
    """Regularized upper incomplete gamma Q(a, x), static iteration count.
    Both branches are evaluated (no data-dependent control flow) and the
    applicable one is selected — on the VPU that is far cheaper than a
    convergence-tested while_loop."""
    a = jnp.asarray(a)
    x = jnp.asarray(x)
    dt = jnp.result_type(a.dtype, x.dtype, jnp.float32)
    a, x = jnp.broadcast_arrays(a.astype(dt), x.astype(dt))
    use_series = x < a + 1.0
    # Clamp each branch's argument into its convergent region — the value
    # is discarded for out-of-region lanes but must not produce inf/nan.
    xs = jnp.minimum(x, a + 1.0)
    xc = jnp.maximum(x, a + 1.0)
    q_series = 1.0 - _lower_series(a, xs)
    q_cf = _upper_cf(a, xc)
    q = jnp.where(use_series, q_series, q_cf)
    q = jnp.where(x <= 0, jnp.ones_like(q), q)
    return jnp.clip(q, 0.0, 1.0)


@jax.jit
def gammainc_fixed(a, x):
    """Regularized lower incomplete gamma P(a, x)."""
    return 1.0 - gammaincc_fixed(a, x)
