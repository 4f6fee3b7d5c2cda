"""Fixed-iteration incomplete gamma vs scipy over the sampler's ranges."""
import jax.numpy as jnp
import numpy as np
from scipy.special import gammaincc as sp_gammaincc

from hydra_pspec_tpu.ops.special import gammaincc_fixed, iters_for_shape


def test_matches_scipy_over_sampler_ranges():
    # a = Ntimes-ish shapes; x = beta / ps over the prior grid — decades of
    # dynamic range on both sides of a.
    a_vals = np.array([2.0, 10.0, 50.0, 202.0, 204.0, 1000.0])
    for a in a_vals:
        x = np.concatenate([
            np.logspace(-3, np.log10(a * 5 + 10), 200),
            np.linspace(max(a - 50, 0.1), a + 50, 100),
        ])
        want = sp_gammaincc(a, x)
        got = np.asarray(gammaincc_fixed(jnp.float64(a), jnp.asarray(x)))
        # absolute tolerance for underflowed tails, relative in the body
        err = np.abs(got - want) / np.maximum(want, 1e-12)
        mask = want > 1e-30
        assert err[mask].max() < 1e-5, (a, err[mask].max())
        np.testing.assert_allclose(got, want, atol=1e-8)


def test_large_shape_parameter_with_scaled_iters():
    """The default trip counts degrade above a ~ 2000 (ADVICE r1): with
    iters_for_shape the series/CF stay accurate to a = 1e4 (long-time
    chains, alpha = Ntimes)."""
    for a in [2000.0, 5000.0, 1e4]:
        x = np.concatenate([
            np.linspace(a - 5 * np.sqrt(a), a + 5 * np.sqrt(a), 101),
            np.logspace(np.log10(a / 100), np.log10(a * 3), 100),
        ])
        want = sp_gammaincc(a, x)
        got = np.asarray(gammaincc_fixed(jnp.float64(a), jnp.asarray(x),
                                         iters=iters_for_shape(a)))
        err = np.abs(got - want) / np.maximum(want, 1e-12)
        mask = want > 1e-30
        assert err[mask].max() < 1e-5, (a, err[mask].max())


def test_edge_cases():
    out = np.asarray(gammaincc_fixed(5.0, jnp.asarray([0.0, 1e-30, 1e6])))
    assert out[0] == 1.0
    assert abs(out[1] - 1.0) < 1e-6
    assert out[2] < 1e-12
    assert np.isfinite(out).all()


def test_f32_accuracy():
    a = jnp.float32(203.0)
    x = jnp.asarray(np.logspace(0, 3.2, 300), dtype=jnp.float32)
    want = sp_gammaincc(203.0, np.logspace(0, 3.2, 300))
    got = np.asarray(gammaincc_fixed(a, x))
    np.testing.assert_allclose(got, want, atol=2e-5)
