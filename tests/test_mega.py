"""Mega-kernel path vs the rgibbs engine — interpret mode on CPU.

The mega step must reproduce rgibbs.gcr_solve + the per-iteration
statistics given identical fluctuation draws (both f32; differences only
from 3-pass-bf16 vs XLA-HIGHEST products and the solve method)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydra_pspec_tpu.models import mega, rgibbs
from hydra_pspec_tpu.ops import cplx
from hydra_pspec_tpu.ops.cplx import C

RNG = np.random.default_rng(217)


def crandn(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)) / np.sqrt(2)


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def make_problem(ntimes=10, nfreqs=24, nmodes=3):
    d = crandn(ntimes, nfreqs) * 2.0
    w = np.ones(nfreqs)
    fg = crandn(nfreqs, nmodes)
    ninv = np.abs(RNG.standard_normal(nfreqs)) + 1.0
    ps = np.abs(RNG.standard_normal(nfreqs)) * 10.0 + 0.05
    return d, w, fg, ninv, ps


def _pad_t(x, n, t):
    """(B, T, nf) complex -> padded transposed (B, n, t) f32 pair."""
    xt = np.swapaxes(np.asarray(x), 1, 2)
    out_re = np.zeros((x.shape[0], n, t), np.float32)
    out_im = np.zeros((x.shape[0], n, t), np.float32)
    out_re[:, : xt.shape[1], : xt.shape[2]] = xt.real
    out_im[:, : xt.shape[1], : xt.shape[2]] = xt.imag
    return out_re, out_im


def test_megastep_matches_rgibbs_draw():
    d, w, fg, ninv, ps = make_problem()
    ntimes, nfreqs = d.shape
    rops = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float32)
    mops, dims = mega.from_chain_operators(rops)
    oa = crandn(1, ntimes, nfreqs) * np.sqrt(nfreqs)  # delay-basis omega_a
    ob = crandn(1, ntimes, nfreqs)

    # reference: composed rgibbs draw + stats (f32, XLA chol solve)
    ps_j = jnp.asarray(ps, dtype=jnp.float32)[None]
    sig, amps, sk = rgibbs.gcr_solve(
        rops, ps_j, cplx.from_numpy(oa, jnp.float32),
        cplx.from_numpy(ob, jnp.float32), solver="chol",
    )
    model = sig + cplx.matmul(amps, rgibbs._t(rops.fg))
    resid = rops.d_w - model
    chisq_ref = np.asarray(resid.abs2() * rops.ninv_full_diag[:, None, :])
    beta_ref = np.asarray(jnp.sum(sk.abs2(), axis=1))

    oa_re, oa_im = _pad_t(oa, dims.n, dims.t)
    ob_re, ob_im = _pad_t(ob, dims.n, dims.t)
    ps_pad = mega.pad_ps(ps_j, dims)
    outs = mega.gcr_megastep(
        mops.pt_re, mops.pt_im, ps_pad, mops.nih,
        mops.nid_re, mops.nid_im, mops.dw_re, mops.dw_im,
        mops.ninv_full, mops.w,
        mops.fg_re, mops.fg_im, mops.g_re, mops.g_im,
        mops.mi_re, mops.mi_im, mops.a0_re, mops.a0_im,
        mops.f_re, mops.f_im,
        jnp.asarray(oa_re), jnp.asarray(oa_im),
        jnp.asarray(ob_re), jnp.asarray(ob_im),
        nfreqs_true=dims.nfreqs, ntimes_true=dims.ntimes,
        batch_tile=1, refine=1, all_unflagged=dims.all_unflagged,
    )
    m_sig_re, m_sig_im, m_amp_re, m_amp_im, m_chi, m_beta, m_noise, m_bmask = (
        np.asarray(o) for o in outs
    )

    sig_ref = cplx.to_numpy(sig)[0]                  # (T, nf)
    got_sig = (m_sig_re[0, :nfreqs, :ntimes]
               + 1j * m_sig_im[0, :nfreqs, :ntimes]).T
    scale = np.abs(sig_ref).mean()
    assert np.abs(got_sig - sig_ref).max() / scale < 3e-3

    amps_ref = cplx.to_numpy(amps)[0]                # (T, m)
    got_amp = (m_amp_re[0, :dims.nmodes, :ntimes]
               + 1j * m_amp_im[0, :dims.nmodes, :ntimes]).T
    ascale = np.abs(amps_ref).mean()
    assert np.abs(got_amp - amps_ref).max() / ascale < 3e-3

    got_chi = m_chi[0, :nfreqs, :ntimes].T
    assert np.abs(got_chi - chisq_ref[0]).max() < 5e-2
    np.testing.assert_allclose(
        m_beta[0, :nfreqs], beta_ref[0], rtol=5e-3, atol=1e-4)
    # pads carry nothing
    assert np.abs(m_beta[0, nfreqs:]).max() == 0
    assert np.abs(m_chi[0, :, ntimes:]).max() == 0
    assert np.abs(m_chi[0, nfreqs:, :]).max() == 0
    # unflagged: masked delay stats equal beta
    np.testing.assert_allclose(m_bmask, m_beta, rtol=1e-6)
    # noise term matches the composed computation
    noise_ref = float(jnp.sum(
        rops.ni_diag[:, None, :] * resid.abs2(), axis=(1, 2))[0])
    assert abs(m_noise[0].sum() - noise_ref) / abs(noise_ref) < 5e-3


def test_mega_chain_statistics():
    """Short mega chain on self-consistent data: chi^2 -> 1, finite ps."""
    ntimes, nfreqs = 32, 16
    sig = crandn(ntimes, nfreqs) * 2.0
    noise = crandn(ntimes, nfreqs) * 0.5
    d = sig + noise
    w = np.ones(nfreqs)
    fg = np.zeros((nfreqs, 1), dtype=complex)
    fg[:, 0] = 1 / np.sqrt(nfreqs)
    ninv = np.full(nfreqs, 1 / 0.25)
    mops, dims = mega.build_mega_operators(d, w, fg, ninv)
    mops_b = mega.broadcast_mega_operators(mops, 2)
    ps0 = mega.pad_ps(jnp.full((2, nfreqs), 4.0 * nfreqs), dims)
    prior_pad = jnp.zeros((2, dims.n), dtype=jnp.float32)
    ps_f, samples = mega.run_chain_mega(
        jax.random.key(3), mops_b, dims, ps0, prior_pad, 40,
        store_cr=False, batch_tile=2,
    )
    chi = np.asarray(samples.chisq)   # (niter, B) means
    assert np.isfinite(chi).all()
    assert abs(chi[20:].mean() - 1.0) < 0.15, chi[20:].mean()
    assert np.isfinite(np.asarray(samples.ln_post)).all()
    ps_np = np.asarray(ps_f)
    assert np.abs(ps_np[:, nfreqs:]).max() == 0  # pads stay zero


def test_runner_mega_engine(tmp_path):
    """run_baselines with engine=mega writes reference-layout outputs and
    tracks the real engine statistically (same data, short chain)."""
    from hydra_pspec_tpu.runner import BaselineJob, run_baselines

    d, w, fg, ninv, _ = make_problem(ntimes=12, nfreqs=16)
    job = BaselineJob(
        antpair=(0, 1), d=d, w=w, fgmodes=fg,
        S_initial=np.eye(d.shape[1]), Ninv=ninv, out_dir=tmp_path / "0-1",
    )
    niter = 5
    results, timings = run_baselines(
        [job], np.zeros((2, d.shape[1])), niter, seed=3, write_niter=3,
        engine="mega", use_mesh=False,
    )
    assert timings["engine"] == "mega"
    r = results[0]
    assert r.signal_ps.shape == (niter, d.shape[1])
    assert r.signal_cr.shape == (niter,) + d.shape
    assert r.chisq.shape == (niter,) + d.shape
    assert np.isfinite(r.signal_ps).all()
    dps = np.load(tmp_path / "0-1" / "dps-eor.npy")
    assert dps.shape == (niter, d.shape[1])


def test_bits_to_normals_statistics():
    """Box-Muller transform correctness on controlled bits (the kernel's
    pltpu.prng_random_bits is stubbed by the interpreter, so in-kernel
    entropy is validated on device; the transform itself is pinned here)."""
    from hydra_pspec_tpu.ops.pallas.megastep import bits_to_normals

    rng = np.random.default_rng(0)
    n = 200_000
    bits1 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    bits2 = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    a, b = (np.asarray(x) for x in bits_to_normals(bits1, bits2))
    for z in (a, b):
        assert np.isfinite(z).all()
        assert abs(z.mean()) < 0.01
        assert abs(z.std() - 1.0) < 0.01
        # tail sanity: |z| > 3 with ~2.7e-3 probability
        frac3 = (np.abs(z) > 3).mean()
        assert 1e-3 < frac3 < 6e-3
    # independence of the pair
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.01


def test_mega_store_cr_layout():
    d, w, fg, ninv, ps = make_problem()
    mops, dims = mega.build_mega_operators(d, w, fg, ninv)
    ps0 = mega.pad_ps(jnp.asarray(ps, dtype=jnp.float32)[None], dims)
    prior_pad = jnp.zeros((2, dims.n), dtype=jnp.float32)
    _, s = mega.gibbs_step_mega(
        jax.random.key(0), ps0, mops, dims, prior_pad, batch_tile=1,
        store_cr=True,
    )
    assert s.signal_cr.re.shape == (1, d.shape[0], d.shape[1])
    assert s.fg_amps.re.shape == (1, d.shape[0], fg.shape[1])
    assert s.chisq.shape == (1, d.shape[0], d.shape[1])
    assert np.isfinite(np.asarray(s.ln_post)).all()


def test_megastep_chi_unbiased_with_bright_foregrounds():
    """Regression for the FG-scale chi^2 bias: with foreground amplitudes
    ~1e3 x the noise scale, computing Fg @ amps at bf16-split precision
    inside the residual planted a deterministic error ~1e-5*|FG| into the
    noise-scale residual (chi^2 +0.5% on CPU, +1.5% on TPU). The kernel
    now FG-deflates the residual (dw - Fg a0 host-side in f64, in-kernel
    matmul on the amplitude DEVIATION only) — mean chi must match the
    composed rgibbs computation to well under the old bias."""
    ntimes, nfreqs, nmodes = 24, 16, 3
    # bright smooth foregrounds + faint signal + unit noise
    fg = np.linalg.qr(crandn(nfreqs, nmodes))[0]
    amps_true = crandn(ntimes, nmodes) * 3e3
    d = amps_true @ fg.T + crandn(ntimes, nfreqs) * 2.0 \
        + crandn(ntimes, nfreqs)
    w = np.ones(nfreqs)
    ninv = np.ones(nfreqs)
    ps = np.abs(RNG.standard_normal(nfreqs)) * 4.0 + 0.1

    rops = rgibbs.build_chain_operators(d, w, fg, ninv, dtype=jnp.float32)
    mops, dims = mega.from_chain_operators(rops)
    oa = crandn(1, ntimes, nfreqs) * np.sqrt(nfreqs)
    ob = crandn(1, ntimes, nfreqs)

    ps_j = jnp.asarray(ps, dtype=jnp.float32)[None]
    sig, amps, sk = rgibbs.gcr_solve(
        rops, ps_j, cplx.from_numpy(oa, jnp.float32),
        cplx.from_numpy(ob, jnp.float32), solver="chol",
    )
    model = sig + cplx.matmul(amps, rgibbs._t(rops.fg))
    resid = rops.d_w - model
    chisq_ref = np.asarray(resid.abs2() * rops.ninv_full_diag[:, None, :])

    oa_re, oa_im = _pad_t(oa, dims.n, dims.t)
    ob_re, ob_im = _pad_t(ob, dims.n, dims.t)
    outs = mega.gcr_megastep(
        mops.pt_re, mops.pt_im, mega.pad_ps(ps_j, dims), mops.nih,
        mops.nid_re, mops.nid_im, mops.dw_re, mops.dw_im,
        mops.ninv_full, mops.w,
        mops.fg_re, mops.fg_im, mops.g_re, mops.g_im,
        mops.mi_re, mops.mi_im, mops.a0_re, mops.a0_im,
        mops.f_re, mops.f_im,
        jnp.asarray(oa_re), jnp.asarray(oa_im),
        jnp.asarray(ob_re), jnp.asarray(ob_im),
        nfreqs_true=dims.nfreqs, ntimes_true=dims.ntimes,
        batch_tile=1, refine=1, all_unflagged=dims.all_unflagged,
    )
    m_chi = np.asarray(outs[4])
    got_chi = m_chi[0, :nfreqs, :ntimes].T
    ref_mean = chisq_ref[0].mean()
    # relative mean-chi agreement: the old FG-scale bias was ~5e-3 here
    assert abs(got_chi.mean() - ref_mean) / ref_mean < 5e-4, (
        got_chi.mean(), ref_mean)
