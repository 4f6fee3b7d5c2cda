"""Real-pair (TPU) engine tests: exact agreement with the complex engine
at float64, plus the real-pair primitive layer against numpy complex."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydra_pspec_tpu.models import gcr, gibbs, rgibbs
from hydra_pspec_tpu.ops import cplx

RNG = np.random.default_rng(31)


def crandn(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)) / np.sqrt(2)


class TestCplxPrimitives:
    def test_matmul_gauss(self):
        a, b = crandn(9, 7), crandn(7, 5)
        out = cplx.to_numpy(
            cplx.matmul(cplx.from_numpy(a, jnp.float64), cplx.from_numpy(b, jnp.float64))
        )
        np.testing.assert_allclose(out, a @ b, atol=1e-12)

    def test_elementwise_and_adjoint(self):
        a, b = crandn(4, 6), crandn(4, 6)
        ca, cb = cplx.from_numpy(a, jnp.float64), cplx.from_numpy(b, jnp.float64)
        np.testing.assert_allclose(cplx.to_numpy(ca * cb), a * b, atol=1e-12)
        np.testing.assert_allclose(cplx.to_numpy(ca + cb), a + b, atol=1e-12)
        np.testing.assert_allclose(cplx.to_numpy(ca.conj()), a.conj(), atol=0)
        np.testing.assert_allclose(cplx.to_numpy(ca.adjoint()), a.conj().T, atol=0)
        np.testing.assert_allclose(np.asarray(ca.abs2()), np.abs(a) ** 2, atol=1e-12)

    def test_dft_matrix_matches_fourier_operator(self):
        from hydra_pspec_tpu.ops.fourier import fourier_operator

        for n in (8, 120):
            f = cplx.dft_matrix(n, jnp.float64)
            np.testing.assert_allclose(
                cplx.to_numpy(f), np.asarray(fourier_operator(n)), atol=1e-10
            )

    def test_cfft_rows(self):
        from hydra_pspec_tpu.ops.fourier import cfft

        x = crandn(5, 16)
        f = cplx.dft_matrix(16, jnp.float64)
        out = cplx.to_numpy(cplx.cfft_rows(cplx.from_numpy(x, jnp.float64), f))
        np.testing.assert_allclose(out, np.asarray(cfft(jnp.asarray(x))), atol=1e-10)

    def test_hermitian_solve(self):
        n, k = 12, 7
        X = crandn(n, n)
        m = X @ X.conj().T + np.eye(n)
        b = crandn(n, k)
        x = cplx.to_numpy(
            cplx.hermitian_solve(
                cplx.from_numpy(m, jnp.float64), cplx.from_numpy(b, jnp.float64)
            )
        )
        np.testing.assert_allclose(m @ x, b, atol=1e-10)

    def test_standard_normal_stats(self):
        z = cplx.standard_normal(jax.random.key(0), (20000,))
        zr, zi = np.asarray(z.re), np.asarray(z.im)
        assert abs(zr.var() - 0.5) < 0.02
        assert abs(zi.var() - 0.5) < 0.02
        assert abs(zr.mean()) < 0.02


def to_delay(oa):
    """Transform a freq-basis omega_a draw to the engine's delay-basis
    convention (rows per time: F @ oa_t  ==  oa @ F, F symmetric)."""
    from hydra_pspec_tpu.ops.fourier import fourier_operator
    F = np.asarray(fourier_operator(oa.shape[-1], dtype=jnp.complex128))
    return oa @ F


def make_problem(ntimes=17, nfreqs=24, nmodes=4):
    d = crandn(ntimes, nfreqs) * 2.0
    w = np.ones(nfreqs); w[3] = 0; w[11] = 0
    fg = crandn(nfreqs, nmodes)
    ninv = np.abs(RNG.standard_normal(nfreqs)) + 1.0
    ps = np.abs(RNG.standard_normal(nfreqs)) * 10.0 + 0.05
    prior = np.zeros((2, nfreqs))
    return d, w, fg, ninv, ps, prior


class TestEngineAgreement:
    def test_gcr_solve_matches_complex_engine(self):
        d, w, fg, ninv, ps, _ = make_problem()
        ntimes, nfreqs = d.shape
        oa, ob = crandn(ntimes, nfreqs), crandn(ntimes, nfreqs)

        cops = gcr.build_chain_operators(d, w, fg, ninv)
        cres = gcr.gcr_solve(cops, jnp.asarray(ps), jnp.asarray(oa), jnp.asarray(ob))

        rops = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float64)
        sig, amps, sk = rgibbs.gcr_solve(
            rops, jnp.asarray(ps)[None],
            cplx.from_numpy(to_delay(oa)[None], jnp.float64),
            cplx.from_numpy(ob[None], jnp.float64),
        )
        np.testing.assert_allclose(
            cplx.to_numpy(sig)[0], np.asarray(cres.signal_cr), atol=1e-9
        )
        np.testing.assert_allclose(
            cplx.to_numpy(amps)[0], np.asarray(cres.fg_amps), atol=1e-9
        )

    def test_map_step_matches(self):
        d, w, fg, ninv, ps, prior = make_problem()
        cops = gcr.build_chain_operators(d, w, fg, ninv)
        _, cs = gibbs.gibbs_step(
            jax.random.key(0), jnp.asarray(ps), cops, jnp.asarray(prior),
            map_estimate=True,
        )
        rops = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float64)
        _, rs = rgibbs.gibbs_step(
            jax.random.key(0), jnp.asarray(ps)[None], rops, jnp.asarray(prior),
            map_estimate=True,
        )
        np.testing.assert_allclose(
            cplx.to_numpy(rs.signal_cr)[0], np.asarray(cs.signal_cr), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(rs.chisq)[0], np.asarray(cs.chisq), atol=1e-9
        )

    def test_f32_engine_close_to_f64(self):
        """The production float32 path must track float64 to ~1e-4 relative
        on a well-conditioned problem (roundoff, not algorithm error)."""
        d, w, fg, ninv, ps, _ = make_problem()
        ntimes, nfreqs = d.shape
        oa, ob = crandn(ntimes, nfreqs), crandn(ntimes, nfreqs)
        r64 = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float64)
        r32 = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float32)
        s64, _, _ = rgibbs.gcr_solve(
            r64, jnp.asarray(ps)[None],
            cplx.from_numpy(to_delay(oa)[None], jnp.float64),
            cplx.from_numpy(ob[None], jnp.float64),
        )
        s32, _, _ = rgibbs.gcr_solve(
            r32, jnp.asarray(ps, dtype=jnp.float32)[None],
            cplx.from_numpy(to_delay(oa)[None], jnp.float32),
            cplx.from_numpy(ob[None], jnp.float32),
        )
        ref = cplx.to_numpy(s64)
        err = np.abs(cplx.to_numpy(s32) - ref) / (np.abs(ref).mean())
        assert err.max() < 1e-3, err.max()

    def test_chain_runs_and_is_consistent(self):
        """Distributional sanity of the full real-engine chain: chisq ~ 1
        on self-consistent synthetic data."""
        ntimes, nfreqs = 64, 16
        sig = crandn(ntimes, nfreqs) * 2.0
        noise = crandn(ntimes, nfreqs) * 0.5
        d = sig + noise
        w = np.ones(nfreqs)
        fg = np.zeros((nfreqs, 1), dtype=complex); fg[:, 0] = 1 / np.sqrt(nfreqs)
        ninv = np.full(nfreqs, 1 / 0.25)
        prior = np.zeros((2, nfreqs))
        rops = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float64)
        ps0 = jnp.full((1, nfreqs), 4.0 * nfreqs)
        ps, samples = rgibbs.run_chain_jit(
            jax.random.key(1), rops, ps0, jnp.asarray(prior), 100, store_cr=False
        )
        chi = np.asarray(samples.chisq)
        assert np.isfinite(chi).all()
        assert abs(chi[50:].mean() - 1.0) < 0.1, chi[50:].mean()

    def test_dense_ninv_matches_complex_engine(self):
        """Real-engine twin of test_gcr_matches_reference_system[True]:
        genuinely dense Hermitian Ninv through the real-pair path must
        reproduce the complex engine (itself pinned against the reference
        block system) exactly at float64."""
        d, w, fg, _, ps, _ = make_problem()
        ntimes, nfreqs = d.shape
        X = crandn(nfreqs, nfreqs)
        dense = X @ X.conj().T + 3.0 * np.eye(nfreqs)
        oa, ob = crandn(ntimes, nfreqs), crandn(ntimes, nfreqs)

        cops = gcr.build_chain_operators(d, w, fg, dense)
        cres = gcr.gcr_solve(cops, jnp.asarray(ps), jnp.asarray(oa),
                             jnp.asarray(ob))

        rops = rgibbs.build_chain_operators(d, w, fg, dense, dtype=jnp.float64)
        assert rops.ni_dense is not None and rops.nih_dense is not None
        sig, amps, _ = rgibbs.gcr_solve(
            rops, jnp.asarray(ps)[None],
            cplx.from_numpy(to_delay(oa)[None], jnp.float64),
            cplx.from_numpy(ob[None], jnp.float64),
        )
        np.testing.assert_allclose(
            cplx.to_numpy(sig)[0], np.asarray(cres.signal_cr), atol=1e-8
        )
        np.testing.assert_allclose(
            cplx.to_numpy(amps)[0], np.asarray(cres.fg_amps), atol=1e-8
        )

        # full step: chisq + ln_post diagnostics under dense noise
        _, cs = gibbs.gibbs_step(
            jax.random.key(0), jnp.asarray(ps), cops,
            jnp.zeros((2, nfreqs)), map_estimate=True,
        )
        _, rs = rgibbs.gibbs_step(
            jax.random.key(0), jnp.asarray(ps)[None], rops,
            jnp.zeros((2, nfreqs)), map_estimate=True,
        )
        np.testing.assert_allclose(
            np.asarray(rs.chisq)[0], np.asarray(cs.chisq), atol=1e-8
        )


class TestRecursiveInverse:
    def test_hermitian_inverse_matches_numpy(self):
        for n in (7, 33, 132):
            X = crandn(n, n)
            m = X @ X.conj().T + np.eye(n)
            minv = cplx.to_numpy(
                cplx.hermitian_inverse(cplx.from_numpy(m, jnp.float64))
            )
            np.testing.assert_allclose(minv, np.linalg.inv(m), atol=1e-8)

    def test_recinv_solve_matches_chol_solve(self):
        n, k = 40, 9
        X = crandn(n, n)
        m = X @ X.conj().T + np.eye(n)
        b = crandn(n, k)
        mc = cplx.from_numpy(m, jnp.float64)
        bc = cplx.from_numpy(b, jnp.float64)
        x1 = cplx.to_numpy(cplx.hermitian_solve(mc, bc))
        x2 = cplx.to_numpy(cplx.hermitian_solve_recinv(mc, bc))
        np.testing.assert_allclose(x1, x2, atol=1e-9)

    def test_recinv_f32_real_problem_accuracy(self):
        """f32 recinv on the ill-scaled GCR matrix must stay within solver
        tolerance of f64 (the deflation + Jacobi + refinement stack)."""
        d, w, fg, ninv, ps, _ = make_problem(ntimes=11, nfreqs=32, nmodes=5)
        oa, ob = crandn(11, 32), crandn(11, 32)
        r64 = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float64)
        r32 = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float32)
        s64, _, _ = rgibbs.gcr_solve(
            r64, jnp.asarray(ps)[None],
            cplx.from_numpy(to_delay(oa)[None], jnp.float64),
            cplx.from_numpy(ob[None], jnp.float64),
        )
        s32, _, _ = rgibbs.gcr_solve(
            r32, jnp.asarray(ps, dtype=jnp.float32)[None],
            cplx.from_numpy(to_delay(oa)[None], jnp.float32),
            cplx.from_numpy(ob[None], jnp.float32),
        )
        ref_ = cplx.to_numpy(s64)
        err = np.abs(cplx.to_numpy(s32) - ref_).max() / np.abs(ref_).mean()
        assert err < 1e-3, err
