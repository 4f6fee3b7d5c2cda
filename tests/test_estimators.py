"""LSSA / OQE / DPSS estimator tests against naive NumPy oracles (the
reference's loop-and-optimize formulations, with its missing-import bugs
fixed in the oracle)."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from hydra_pspec_tpu.models import lssa, oqe, dpss
from hydra_pspec_tpu.utils.uvh5 import trim_flagged_channels

RNG = np.random.default_rng(21)


def crandn(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)) / np.sqrt(2)


# --------------------------------------------------------------------------
# LSSA
# --------------------------------------------------------------------------
class TestLSSA:
    def setup_method(self):
        self.n = 12
        self.freqs = 100.0 + 0.1 * np.arange(self.n)  # MHz
        self.d = crandn(self.n)
        X = crandn(self.n, self.n)
        cov = X @ X.conj().T + np.eye(self.n)
        self.invcov = np.linalg.inv(cov)

    def _oracle_fit(self, tau_val, fit_amp_phase):
        """Reference lssa.py:170-207 semantics via scipy.optimize."""
        d, freqs, invcov = self.d, self.freqs, self.invcov

        def loglike(p):
            if fit_amp_phase:
                m = p[0] * np.exp(-2j * np.pi * tau_val * freqs + 1j * p[1])
            else:
                m = (p[0] + 1j * p[1]) * np.exp(-2j * np.pi * tau_val * freqs)
            x = d - m
            return 0.5 * np.real(x.conj() @ invcov @ x)

        best = None
        # The objective in z is convex with a unique minimum; multi-start
        # to derisk the amp/phase parameterization.
        for p0 in ([0.2, 0.5], [-0.3, 2.0], [1.0, 4.0]):
            r = minimize(loglike, p0, method="L-BFGS-B")
            if best is None or r.fun < best.fun:
                best = r
        return best

    def test_reim_fit_matches_optimizer(self):
        tau = lssa.default_tau(self.freqs)[:4]
        _, are, aim = lssa.lssa_fit_modes(
            self.d, self.freqs, self.invcov, fit_amp_phase=False, tau=tau
        )
        for i, t in enumerate(tau):
            r = self._oracle_fit(t, False)
            assert float(are[i]) == pytest.approx(r.x[0], abs=1e-4)
            assert float(aim[i]) == pytest.approx(r.x[1], abs=1e-4)

    def test_amp_phase_equivalent_model(self):
        tau = lssa.default_tau(self.freqs)[:4]
        _, amp, phase = lssa.lssa_fit_modes(
            self.d, self.freqs, self.invcov, fit_amp_phase=True, tau=tau
        )
        _, are, aim = lssa.lssa_fit_modes(
            self.d, self.freqs, self.invcov, fit_amp_phase=False, tau=tau
        )
        z1 = np.asarray(amp) * np.exp(1j * np.asarray(phase))
        z2 = np.asarray(are) + 1j * np.asarray(aim)
        np.testing.assert_allclose(z1, z2, atol=1e-8)

    def test_decorr_matrix_matches_reference_formula(self):
        w = np.ones(self.n); w[3] = 0
        t = 0.37
        rot, ev = lssa.decorr_matrix(w, t, self.freqs)
        cos = w * np.cos(2 * np.pi * t * self.freqs)
        sin = w * np.sin(2 * np.pi * t * self.freqs)
        theta = 0.5 * np.arctan2(2 * np.sum(cos * sin),
                                 np.sum(cos**2) - np.sum(sin**2))
        rot_ref = np.array([[np.cos(theta), np.sin(theta)],
                            [-np.sin(theta), np.cos(theta)]])
        np.testing.assert_allclose(np.asarray(rot), rot_ref, atol=1e-12)
        cov = np.array([[np.sum(cos * cos), np.sum(cos * sin)],
                        [np.sum(cos * sin), np.sum(sin * sin)]])
        np.testing.assert_allclose(
            np.asarray(ev), np.diag(rot_ref @ cov @ rot_ref.T), atol=1e-10
        )

    def test_decorr_pspec_loop_oracle(self):
        w = np.ones(self.n); w[2] = 0
        tau = lssa.default_tau(self.freqs)
        are = RNG.standard_normal(tau.size)
        aim = RNG.standard_normal(tau.size)
        ours = np.asarray(lssa.decorr_pspec(are, aim, w, tau, self.freqs))
        for i, t in enumerate(tau):
            rot, ev = lssa.decorr_matrix(w, t, self.freqs)
            a1, a2 = np.asarray(rot) @ np.array([are[i], aim[i]])
            ev = np.asarray(ev)
            want = ((a1 * ev[1]) ** 2 + (a2 * ev[0]) ** 2) / (ev[0] ** 2 + ev[1] ** 2)
            assert ours[i] == pytest.approx(want, rel=1e-9)

    def test_trim_flagged_channels(self):
        w = np.array([1.0, 0.0, 1.0, 1.0])
        v = np.arange(4.0)
        np.testing.assert_array_equal(trim_flagged_channels(w, v), [0, 2, 3])
        m = np.arange(16.0).reshape(4, 4)
        out = trim_flagged_channels(w, m)
        assert out.shape == (3, 3)
        np.testing.assert_array_equal(out[0], [0, 2, 3])


# --------------------------------------------------------------------------
# OQE
# --------------------------------------------------------------------------
class TestOQE:
    def setup_method(self):
        self.s = 10
        X = crandn(self.s, self.s)
        self.R = X + 2.0 * np.eye(self.s)  # generic non-Hermitian weighting
        self.C = np.eye(self.s) * 0.3 + 0.05 * np.ones((self.s, self.s))

    def _Q_naive(self, tau):
        y = np.zeros(self.s)
        y[tau] = 1
        mv = np.fft.fft(y)
        return np.outer(mv.conj(), mv)

    def test_Q_matches_naive(self):
        for tau in (0, 3, 7):
            np.testing.assert_allclose(
                np.asarray(oqe.Q(tau, self.s)), self._Q_naive(tau), atol=1e-10
            )

    def test_qhat_matches_naive(self):
        x = crandn(self.s)
        ours = np.asarray(oqe.qhat_all(jnp.asarray(x), jnp.asarray(self.R)))
        for tau in range(self.s):
            E = self.R.conj() @ self._Q_naive(tau) @ self.R
            want = 0.5 * (x.conj().T @ E @ x)
            assert ours[tau] == pytest.approx(want, rel=1e-9)

    def test_qhat_h_matches_naive(self):
        x1, x2 = crandn(self.s), crandn(self.s)
        ours = np.asarray(
            oqe.qhat_h_all(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(self.R))
        )
        for tau in range(self.s):
            Rx1, Rx2 = self.R @ x1, self.R @ x2
            want = 0.5 * Rx1.conj().T @ self._Q_naive(tau) @ Rx2
            assert ours[tau] == pytest.approx(want, rel=1e-9)

    def test_bias_matches_naive(self):
        ours = np.asarray(oqe.bias(jnp.asarray(self.R), jnp.asarray(self.C)))
        for tau in range(self.s):
            want = 0.5 * np.trace(
                self.C @ self.R.conj() @ self._Q_naive(tau) @ self.R
            )
            assert ours[tau] == pytest.approx(want, rel=1e-9)

    def test_fisher_matches_naive(self):
        ours = np.asarray(oqe.F(jnp.asarray(self.R)))
        want = np.zeros((self.s, self.s), dtype=complex)
        for a in range(self.s):
            for b in range(self.s):
                want[a, b] = 0.5 * np.trace(
                    self.R.conj() @ self._Q_naive(a) @ self.R @ self._Q_naive(b)
                )
        np.testing.assert_allclose(ours, want, atol=1e-8)

    def test_normalizations(self):
        Fm = np.asarray(oqe.F(jnp.asarray(self.R)))
        np.testing.assert_allclose(
            np.asarray(oqe.M_Finv(jnp.asarray(Fm))), np.linalg.inv(Fm), atol=1e-9
        )
        Mo = np.asarray(oqe.M_opt(jnp.asarray(Fm)))
        Md = np.diag(1.0 / np.diag(Fm))
        W = Md @ Fm
        want = Md / W.sum(axis=1)[:, None]
        np.testing.assert_allclose(Mo, want, atol=1e-9)

    def test_M_Fhalf_inverse_sqrt(self):
        # Hermitian PSD Fisher from a Hermitian R
        Rh = self.C * 3.0
        Fm = np.asarray(oqe.F(jnp.asarray(Rh)))
        Mh = np.asarray(oqe.M_Fhalf(jnp.asarray(Fm)))
        H = 0.5 * (Fm + Fm.conj().T)
        np.testing.assert_allclose(Mh @ H @ Mh, np.eye(self.s), atol=1e-7)

    def test_sig_qen_matches_naive(self):
        norm = 0.7
        ours = np.asarray(oqe.Sig_QEN(jnp.asarray(self.R), jnp.asarray(self.C), norm))
        for i in range(self.s):
            E = self.R @ self._Q_naive(i) @ self.R * norm
            want = 0.5 * np.trace(E @ self.C @ E @ self.C)
            assert ours[i] == pytest.approx(want, rel=1e-8)

    def test_sig_qesn_matches_naive(self):
        norm = 1.3
        Cs = np.eye(self.s) * 0.8 + 0.02
        ours = np.asarray(
            oqe.Sig_QESN(jnp.asarray(self.R), jnp.asarray(self.C), jnp.asarray(Cs), norm)
        )
        for i in range(self.s):
            E = self.R @ self._Q_naive(i) @ self.R * norm
            want = 0.5 * np.trace(
                E @ self.C @ E @ self.C + E @ Cs @ E @ self.C + E @ self.C @ E @ Cs
            )
            assert ours[i] == pytest.approx(want, rel=1e-8)

    def test_getqs_end_to_end(self):
        V = crandn(6, self.s)
        qs, Fm, MB, MA = oqe.getqs(V, jnp.asarray(self.C * 2.0))
        assert np.asarray(qs).shape == (3, self.s)
        assert np.all(np.isfinite(np.asarray(Fm)))
        # q_h pairs match manual qhat_h
        np.testing.assert_allclose(
            np.asarray(qs[0]),
            np.asarray(oqe.qhat_h_all(V[0], V[1], jnp.asarray(self.C * 2.0))),
            rtol=1e-9,
        )


# --------------------------------------------------------------------------
# DPSS
# --------------------------------------------------------------------------
class TestDPSS:
    def test_fit_matches_optimizer_oracle(self):
        n, nmodes = 24, 4
        freqs = 100 + 0.1 * np.arange(n)
        w = np.ones(n); w[5] = 0
        X = crandn(n, n)
        cov = X @ X.conj().T + 2.0 * np.eye(n)
        d = crandn(n) * 2

        modes, amps = dpss.dpss_fit_modes(d, w, freqs, cov, nmodes=nmodes)
        assert np.asarray(modes).shape == (nmodes, n)

        invcov = np.linalg.inv(cov)
        basis = np.asarray(modes)

        def loglike(p):
            m = (p[0::2, None] + 1j * p[1::2, None]) * basis
            m = m.sum(axis=0)
            x = w * (d - m)
            return 0.5 * np.real(x.conj() @ invcov @ x)

        r = minimize(loglike, np.zeros(2 * nmodes), method="L-BFGS-B")
        ours = loglike(np.asarray(amps))
        # Closed form must be at least as good as the optimizer.
        assert ours <= r.fun + 1e-6
        np.testing.assert_allclose(np.asarray(amps), r.x, atol=1e-3)

    def test_basis_matches_scipy(self):
        from scipy.signal.windows import dpss as sdpss

        b = dpss.dpss_basis(64, 6, alpha=1.5)
        np.testing.assert_allclose(b, sdpss(64, NW=1.5, Kmax=6, sym=False))

    def test_model_reconstruction(self):
        modes = dpss.dpss_basis(16, 3)
        amps = np.array([1.0, -0.5, 0.3, 0.2, 0.0, 1.1])
        m = np.asarray(dpss.dpss_model(modes, amps))
        z = amps[0::2] + 1j * amps[1::2]
        np.testing.assert_allclose(m, (z[:, None] * modes).sum(axis=0), atol=1e-12)
