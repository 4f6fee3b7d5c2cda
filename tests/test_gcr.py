"""GCR solver tests: our whitened-Hermitian multi-RHS formulation must
produce *exactly* the same solutions as the reference's non-Hermitian block
system given identical inputs and fluctuation vectors."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydra_pspec_tpu.models import gcr
from hydra_pspec_tpu.ops.fourier import fourier_operator
import reference_impl as ref

RNG = np.random.default_rng(7)


def crandn(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)) / np.sqrt(2)


def make_problem(ntimes=17, nfreqs=24, nmodes=4, flagged=(3, 11), dense_ninv=False):
    d = crandn(ntimes, nfreqs) * 2.0
    w = np.ones(nfreqs)
    for f in flagged:
        w[f] = 0.0
    fg = crandn(nfreqs, nmodes)
    if dense_ninv:
        X = crandn(nfreqs, nfreqs)
        ninv = X @ X.conj().T + 3.0 * np.eye(nfreqs)
    else:
        ninv = np.abs(RNG.standard_normal(nfreqs)) + 1.0
    ps = np.abs(RNG.standard_normal(nfreqs)) * 10.0 + 0.05
    return d, w, fg, ninv, ps


def reference_solution(d, w, fg, ninv, ps, omega_a, omega_b):
    nfreqs = d.shape[1]
    F = ref.fourier_operator(nfreqs)
    S = ref.covariance_from_pspec(ps / nfreqs**2, F)
    ninv_mat = np.diag(ninv) if np.ndim(ninv) == 1 else ninv
    mats = ref.build_matrices(w, S, ninv_mat, fg)
    d_w = d * w
    return ref.gcr_solve_direct(mats, fg, d_w, omega_a, omega_b)


@pytest.mark.parametrize("dense_ninv", [False, True])
def test_gcr_matches_reference_system(dense_ninv):
    d, w, fg, ninv, ps = make_problem(dense_ninv=dense_ninv)
    ntimes, nfreqs = d.shape
    omega_a = crandn(ntimes, nfreqs)
    omega_b = crandn(ntimes, nfreqs)

    ops = gcr.build_chain_operators(d, w, fg, ninv)
    res = gcr.gcr_solve(
        ops, jnp.asarray(ps), jnp.asarray(omega_a), jnp.asarray(omega_b)
    )
    sig_ref, amps_ref = reference_solution(d, w, fg, ninv, ps, omega_a, omega_b)
    np.testing.assert_allclose(np.asarray(res.signal_cr), sig_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.fg_amps), amps_ref, atol=1e-8)


def test_gcr_map_estimate():
    d, w, fg, ninv, ps = make_problem()
    ntimes, nfreqs = d.shape
    zeros = np.zeros((ntimes, nfreqs), dtype=complex)
    ops = gcr.build_chain_operators(d, w, fg, ninv)
    res = gcr.gcr_solve(ops, jnp.asarray(ps), None, None)
    sig_ref, amps_ref = reference_solution(d, w, fg, ninv, ps, zeros, zeros)
    np.testing.assert_allclose(np.asarray(res.signal_cr), sig_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.fg_amps), amps_ref, atol=1e-8)


def test_signal_sqrt_operator_is_sqrtm():
    import scipy.linalg

    nfreqs = 20
    ps = np.abs(RNG.standard_normal(nfreqs)) + 0.2
    F = ref.fourier_operator(nfreqs)
    S = ref.covariance_from_pspec(ps / nfreqs**2, F)
    d, w, fg, ninv, _ = make_problem(nfreqs=nfreqs, flagged=())
    ops = gcr.build_chain_operators(d, w, fg, ninv)
    sh = np.asarray(gcr.signal_sqrt_operator(ops, jnp.asarray(ps)))
    np.testing.assert_allclose(sh, scipy.linalg.sqrtm(S), atol=1e-9)
    np.testing.assert_allclose(sh @ sh, S, atol=1e-10)


def test_gcr_inpaints_flagged_channels():
    """On flagged channels Ni = 0, so the CR there must be a pure prior
    draw consistent with S — in particular finite and nonzero."""
    d, w, fg, ninv, ps = make_problem(flagged=(0, 5, 6))
    ntimes, nfreqs = d.shape
    omega_a = crandn(ntimes, nfreqs)
    omega_b = crandn(ntimes, nfreqs)
    ops = gcr.build_chain_operators(d, w, fg, ninv)
    res = gcr.gcr_solve(ops, jnp.asarray(ps), jnp.asarray(omega_a), jnp.asarray(omega_b))
    sig = np.asarray(res.signal_cr)
    assert np.all(np.isfinite(sig))
    assert np.abs(sig[:, [0, 5, 6]]).min() > 0
