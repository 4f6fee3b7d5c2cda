"""Unit tests for ops/: Fourier operators, inverse-gamma sampling, masked
linear algebra — all against NumPy/SciPy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg
from scipy.stats import invgamma, kstest

from hydra_pspec_tpu.ops import fourier, invgamma as hig, linalg as hla
import reference_impl as ref

RNG = np.random.default_rng(42)


def crandn(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)) / np.sqrt(2)


class TestFourier:
    def test_operator_matches_reference(self):
        for n in (8, 120, 121):
            np.testing.assert_allclose(
                np.asarray(fourier.fourier_operator(n)),
                ref.fourier_operator(n),
                atol=1e-12,
            )

    def test_operator_equals_cfft(self):
        n = 120
        F = np.asarray(fourier.fourier_operator(n))
        x = crandn(n)
        np.testing.assert_allclose(
            F @ x, np.asarray(fourier.cfft(jnp.asarray(x))), atol=1e-9
        )

    def test_cfft_roundtrip(self):
        x = crandn(5, 64)
        y = fourier.icfft(fourier.cfft(jnp.asarray(x)))
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-12)

    def test_unitarity_identities(self):
        n = 32
        F = np.asarray(fourier.fourier_operator(n))
        np.testing.assert_allclose(F @ F.conj().T, n * np.eye(n), atol=1e-10)
        np.testing.assert_allclose(F, F.T, atol=0)

    def test_covariance_roundtrip(self):
        n = 48
        F = fourier.fourier_operator(n)
        ps = np.abs(RNG.standard_normal(n)) + 0.1
        C = fourier.covariance_from_pspec(jnp.asarray(ps), F)
        np.testing.assert_allclose(
            np.asarray(C), ref.covariance_from_pspec(ps, np.asarray(F)), atol=1e-9
        )
        ps_back = fourier.pspec_from_covariance(C, F)
        np.testing.assert_allclose(np.asarray(ps_back), ps, rtol=1e-9)

    def test_blackman_harris_matches_scipy(self):
        from scipy.signal.windows import blackmanharris

        for n in (16, 120):
            np.testing.assert_allclose(
                fourier.blackman_harris(n), blackmanharris(n), atol=1e-12
            )

    def test_naive_pspec_matches_reference_formula(self):
        d = crandn(7, 40)
        ours = np.asarray(fourier.naive_pspec(jnp.asarray(d)))
        from scipy.signal.windows import blackmanharris

        dd = d - d.mean(axis=1)[:, None]
        dd = dd * blackmanharris(40)
        want = np.fft.fftshift(np.abs(np.fft.fft(dd)) ** 2, axes=-1)
        np.testing.assert_allclose(ours, want, rtol=1e-9)


class TestInvGamma:
    def test_truncated_matches_reference_oracle(self):
        alpha, beta = 203.0, 150.0
        lo, hi = 0.1, 2.0
        for u in (0.0, 0.013, 0.42, 0.77, 0.999):
            ours = float(hig.truncated_invgamma_sample(u, alpha, beta, lo, hi))
            want = ref.truncated_invgamma_oracle(u, alpha, beta, lo, hi)
            assert ours == pytest.approx(want, rel=1e-6), u

    def test_truncated_inverse_is_cdf(self):
        alpha, beta, lo, hi = 50.0, 40.0, 0.3, 5.0
        u = np.linspace(0.01, 0.99, 21)
        x = np.asarray(hig.truncated_invgamma_sample(u, alpha, beta, lo, hi))
        assert np.all(x >= lo) and np.all(x <= hi)
        clo = invgamma.cdf(lo, a=alpha, scale=beta)
        chi = invgamma.cdf(hi, a=alpha, scale=beta)
        u_back = (invgamma.cdf(x, a=alpha, scale=beta) - clo) / (chi - clo)
        np.testing.assert_allclose(u_back, u, atol=2e-3)

    def test_free_draws_distribution(self):
        key = jax.random.key(0)
        ntimes, nfreqs = 204, 16
        sk = jnp.asarray(crandn(ntimes, nfreqs) * 3.0)
        prior = jnp.zeros((2, nfreqs))
        draws = []
        for i in range(200):
            draws.append(np.asarray(hig.sample_bandpowers(jax.random.fold_in(key, i), sk, prior)))
        draws = np.stack(draws)
        beta = np.sum(np.abs(np.asarray(sk)) ** 2, axis=0)
        alpha = ntimes - 1.0
        # KS test per a few bins against InvGamma(alpha, scale=beta)
        for k in (0, 7, 15):
            stat = kstest(draws[:, k], lambda x: invgamma.cdf(x, a=alpha, scale=beta[k]))
            assert stat.pvalue > 1e-3, (k, stat)

    def test_prior_bins_respect_bounds(self):
        key = jax.random.key(1)
        ntimes, nfreqs = 50, 8
        sk = jnp.asarray(crandn(ntimes, nfreqs))
        prior = np.zeros((2, nfreqs))
        prior[0, 3] = 2.0   # hi
        prior[1, 3] = 0.1   # lo
        ps = np.asarray(hig.sample_bandpowers(key, sk, jnp.asarray(prior)))
        assert 0.1 <= ps[3] <= 2.0

    def test_sprior_matches_reference(self):
        signals = crandn(11, 16)
        bins, factor = 2, 3.0
        ours = np.asarray(hig.sprior(signals, bins, factor))
        sk = np.fft.fft(signals, axis=-1)
        ds = np.sum(np.abs(sk) ** 2, axis=0)
        want = np.stack([ds * factor, ds / factor])
        want[:, bins + 1 : -bins] = 0
        want = want / (11 / 2 - 1)
        np.testing.assert_allclose(ours, want, rtol=1e-9)


class TestLinalg:
    def test_hermitian_sqrt_matches_sqrtm(self):
        n = 24
        X = crandn(n, n)
        m = X @ X.conj().T + 0.1 * np.eye(n)
        ours = np.asarray(hla.hermitian_sqrt(jnp.asarray(m)))
        want = scipy.linalg.sqrtm(m)
        np.testing.assert_allclose(ours, want, atol=1e-8)

    def test_noise_operators_diagonal(self):
        n = 10
        w = np.ones(n); w[3] = 0; w[7] = 0
        ninv = np.abs(RNG.standard_normal(n)) + 0.5
        ops = hla.make_noise_operators(jnp.asarray(w), jnp.asarray(ninv))
        assert ops.is_diagonal
        np.testing.assert_allclose(np.asarray(ops.ni_diag), w * ninv * w)
        np.testing.assert_allclose(np.asarray(ops.nih_diag), np.sqrt(w * ninv * w))
        np.testing.assert_allclose(np.asarray(ops.ninv_full_diag), ninv)
        x = crandn(4, n)
        np.testing.assert_allclose(
            np.asarray(ops.apply_ni(jnp.asarray(x))), x * (w * ninv * w), atol=1e-12
        )

    def test_noise_operators_dense(self):
        n = 12
        w = np.ones(n); w[0] = 0
        X = crandn(n, n)
        ninv = X @ X.conj().T + np.eye(n)
        ops = hla.make_noise_operators(jnp.asarray(w), jnp.asarray(ninv))
        assert not ops.is_diagonal
        Ni = w[:, None] * ninv * w[None, :]
        np.testing.assert_allclose(np.asarray(ops.ni_dense), Ni, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(ops.nih_dense), scipy.linalg.sqrtm(Ni), atol=1e-8
        )

    def test_cholesky_solve(self):
        n, k = 16, 5
        X = crandn(n, n)
        m = X @ X.conj().T + np.eye(n)
        b = crandn(n, k)
        x = np.asarray(hla.cholesky_solve(jnp.asarray(m), jnp.asarray(b)))
        np.testing.assert_allclose(m @ x, b, atol=1e-10)


class TestInvGammaTable:
    def test_table_sampler_matches_grid_sampler(self):
        from hydra_pspec_tpu.ops.invgamma import (
            make_invgamma_table, truncated_invgamma_sample,
            truncated_invgamma_sample_table,
        )

        alpha = 203.0
        table = make_invgamma_table(alpha, dtype=jnp.float64)
        beta = np.array([150.0, 80.0, 400.0])
        lo = np.array([0.1, 0.5, 1.0])
        hi = np.array([2.0, 3.0, 4.0])
        for u in (0.02, 0.5, 0.97):
            uu = np.full(3, u)
            a = np.asarray(truncated_invgamma_sample(uu, alpha, beta, lo, hi))
            b = np.asarray(
                truncated_invgamma_sample_table(
                    jnp.asarray(uu), jnp.asarray(beta), jnp.asarray(lo),
                    jnp.asarray(hi), table,
                )
            )
            np.testing.assert_allclose(a, b, rtol=2e-3)

    def test_table_respects_bounds(self):
        from hydra_pspec_tpu.ops.invgamma import (
            make_invgamma_table, truncated_invgamma_sample_table,
        )

        table = make_invgamma_table(203.0, dtype=jnp.float64)
        u = np.linspace(0.001, 0.999, 31)
        x = np.asarray(
            truncated_invgamma_sample_table(
                jnp.asarray(u), jnp.asarray(150.0), jnp.asarray(0.1),
                jnp.asarray(2.0), table,
            )
        )
        assert np.all(x >= 0.1) and np.all(x <= 2.0)
        assert np.all(np.diff(x) >= -1e-9)  # monotone in u
