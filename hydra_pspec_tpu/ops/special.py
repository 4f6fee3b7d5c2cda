"""Fixed-trip-count special functions for TPU.

``jax.scipy.special.gammaincc`` lowers to a data-dependent ``while_loop``;
under vmap every lane waits for the slowest, and at the Gibbs sampler's
parameter values (shape ~ Ntimes ~ 200, arguments spanning the prior grid)
it dominated the whole iteration (measured ~120 ms/iter at 100 baselines on
v5e vs <1 ms for all the linear algebra). This implementation uses the
classic series / continued-fraction split with a *static* iteration count —
a dense, branch-free ``fori_loop`` the VPU chews through in microseconds.

Accuracy: both branches converge in O(sqrt(a)) iterations near the x ~ a
transition, so the *default* static counts (256 / 128) give ~1e-6 relative
accuracy against scipy for a up to ~2000; for larger shape parameters pass
``iters ~ 7 sqrt(a)`` explicitly (callers with a static shape parameter —
the bandpower sampler's alpha = Ntimes - 1 — use :func:`iters_for_shape`).
Pinned in tests/test_special.py.
"""
from functools import partial

import jax
import jax.numpy as jnp

_SERIES_ITERS = 256
_CF_ITERS = 128


def iters_for_shape(a_max: float) -> tuple:
    """Static (series, cf) trip counts sufficient for shape parameters up
    to ``a_max`` (~1e-6 relative; the series needs ~sqrt(2 a ln 1/eps)
    terms at the x ~ a transition point)."""
    import math

    s = max(_SERIES_ITERS, int(7.0 * math.sqrt(max(a_max, 1.0))) + 32)
    c = max(_CF_ITERS, int(4.0 * math.sqrt(max(a_max, 1.0))) + 32)
    return s, c


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


@partial(jax.jit, static_argnames=("iters",))
def gammaincc_fixed(a, x, iters=None):
    """Regularized upper incomplete gamma Q(a, x), static iteration count.
    Both branches are evaluated (no data-dependent control flow) and the
    applicable one is selected — on the VPU that is far cheaper than a
    convergence-tested while_loop. ``iters``: optional static
    ``(series_iters, cf_iters)`` pair for large shape parameters (see
    :func:`iters_for_shape`)."""
    s_it, c_it = iters if iters is not None else (_SERIES_ITERS, _CF_ITERS)
    a = jnp.asarray(a)
    x = jnp.asarray(x)
    dt = jnp.result_type(a.dtype, x.dtype, jnp.float32)
    a, x = jnp.broadcast_arrays(a.astype(dt), x.astype(dt))
    use_series = x < a + 1.0
    # Clamp each branch's argument into its convergent region — the value
    # is discarded for out-of-region lanes but must not produce inf/nan.
    xs = jnp.minimum(x, a + 1.0)
    xc = jnp.maximum(x, a + 1.0)
    q_series = 1.0 - _lower_series(a, xs, iters=s_it)
    q_cf = _upper_cf(a, xc, iters=c_it)
    q = jnp.where(use_series, q_series, q_cf)
    q = jnp.where(x <= 0, jnp.ones_like(q), q)
    return jnp.clip(q, 0.0, 1.0)


@partial(jax.jit, static_argnames=("iters",))
def gammainc_fixed(a, x, iters=None):
    """Regularized lower incomplete gamma P(a, x)."""
    return 1.0 - gammaincc_fixed(a, x, iters=iters)
