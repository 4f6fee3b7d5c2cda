"""Multi-iteration chain kernel vs the single-step mega path + XLA
sampler — interpret mode on CPU, external randomness (the interpreter
stubs the core PRNG; the in-kernel-RNG mode is validated on device)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydra_pspec_tpu.models import mega, megachain, rgibbs
from hydra_pspec_tpu.ops.invgamma import truncated_invgamma_sample_table

RNG = np.random.default_rng(31)


def crandn(*shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)) / np.sqrt(2)


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def make_problem(ntimes=10, nfreqs=16, nmodes=2, B=2):
    d = crandn(ntimes, nfreqs) * 2.0
    w = np.ones(nfreqs)
    fg = crandn(nfreqs, nmodes)
    ninv = np.abs(RNG.standard_normal(nfreqs)) + 1.0
    mops, dims = mega.build_mega_operators(d, w, fg, ninv)
    mops_b = mega.broadcast_mega_operators(mops, B)
    ps0 = np.abs(RNG.standard_normal((B, nfreqs))) * 10.0 + 0.5
    return mops_b, dims, ps0


def draw_randomness(K, B, dims, alpha_int):
    n, t = dims.n, dims.t
    tm = np.zeros((1, 1, n, t), np.float32)
    tm[:, :, :, : dims.ntimes] = 1.0  # kernel masks pads itself; keep full
    sa = np.float32(np.sqrt(0.5) * np.sqrt(dims.nfreqs))
    hf = np.float32(np.sqrt(0.5))
    rnd = {
        "oa_re": RNG.standard_normal((K, B, n, t)).astype(np.float32) * sa,
        "oa_im": RNG.standard_normal((K, B, n, t)).astype(np.float32) * sa,
        "ob_re": RNG.standard_normal((K, B, n, t)).astype(np.float32) * hf,
        "ob_im": RNG.standard_normal((K, B, n, t)).astype(np.float32) * hf,
        "gam": RNG.gamma(alpha_int, size=(K, B, n)).astype(np.float32),
        "u_pb": RNG.uniform(size=(K, B, 128)).astype(np.float32),
    }
    return {k: jnp.asarray(v) for k, v in rnd.items()}


def oracle_chain(mops_b, dims, ps0_pad, prior_static, rnd, K, refine=1):
    """Single-step mega kernel + XLA table sampler, same randomness."""
    table = mops_b.igt
    ps = ps0_pad
    outs = []
    for k in range(K):
        res = mega.gcr_megastep(
            mops_b.pt_re, mops_b.pt_im, ps, mops_b.nih,
            mops_b.nid_re, mops_b.nid_im, mops_b.dw_re, mops_b.dw_im,
            mops_b.ninv_full, mops_b.w,
            mops_b.fg_re, mops_b.fg_im, mops_b.g_re, mops_b.g_im,
            mops_b.mi_re, mops_b.mi_im, mops_b.a0_re, mops_b.a0_im,
            mops_b.f_re, mops_b.f_im,
            rnd["oa_re"][k], rnd["oa_im"][k],
            rnd["ob_re"][k], rnd["ob_im"][k],
            nfreqs_true=dims.nfreqs, ntimes_true=dims.ntimes,
            batch_tile=2, refine=refine,
            all_unflagged=dims.all_unflagged,
        )
        sig_re, sig_im, amp_re, amp_im, chi, beta, noise, bmask = res
        free = beta / rnd["gam"][k]
        ps_new = free
        for j, (idx, lo, hi) in enumerate(prior_static):
            bounded = truncated_invgamma_sample_table(
                rnd["u_pb"][k][:, j], beta[:, idx],
                jnp.float32(lo), jnp.float32(hi), table)
            ps_new = ps_new.at[:, idx].set(bounded)
        outs.append((sig_re, sig_im, amp_re, amp_im, chi, ps_new,
                     noise, bmask))
        ps = ps_new
    return ps, outs


def test_megachain_matches_composed():
    K, B = 3, 2
    mops_b, dims, ps0 = make_problem(B=B)
    nf = dims.nfreqs
    # prior on three central bins, reference-style bounds
    prior = np.zeros((2, nf))
    prior[0, nf // 2 - 1: nf // 2 + 2] = 300.0
    prior[1, nf // 2 - 1: nf // 2 + 2] = 0.5
    prior_static = megachain.prior_static_from(prior, dims)
    assert len(prior_static) == 3

    ps0_pad = mega.pad_ps(jnp.asarray(ps0, jnp.float32), dims)
    alpha_int = dims.ntimes - 1
    rnd = draw_randomness(K, B, dims, alpha_int)

    tables = megachain.make_chain_tables(mops_b)
    ps_f, sample = megachain.run_chunk_megachain(
        mops_b, tables, dims, ps0_pad, K, prior_static,
        randomness=rnd, refine=1, batch_tile=2, store_cr=True,
    )

    ps_ref, outs = oracle_chain(mops_b, dims, ps0_pad, prior_static, rnd, K)

    for k in range(K):
        sig_re, sig_im, amp_re, amp_im, chi, ps_new, noise, bmask = outs[k]
        got_sig = np.asarray(sample.signal_cr.re[k])
        ref_sig = np.swapaxes(
            np.asarray(sig_re)[:, :nf, : dims.ntimes], 1, 2)
        scale = np.abs(ref_sig).mean() + 1e-30
        assert np.abs(got_sig - ref_sig).max() / scale < 2e-4, k
        np.testing.assert_allclose(
            np.asarray(sample.ps[k]), np.asarray(ps_new)[:, :nf],
            rtol=2e-3, atol=1e-6)
        got_chi = np.asarray(sample.chisq[k])
        ref_chi = np.swapaxes(np.asarray(chi)[:, :nf, : dims.ntimes], 1, 2)
        assert np.abs(got_chi - ref_chi).max() < 5e-3, k
    np.testing.assert_allclose(
        np.asarray(ps_f), np.asarray(ps_ref), rtol=2e-3, atol=1e-6)
    # ln_post consistent with the composed pieces for the last iteration
    _, _, _, _, _, ps_new, noise, bmask = outs[-1]
    lp_ref = -(jnp.sum(noise, axis=-1)
               + jnp.sum(bmask / jnp.maximum(
                   ps_new, jnp.finfo(jnp.float32).tiny), axis=-1))
    np.testing.assert_allclose(
        np.asarray(sample.ln_post[-1]), np.asarray(lp_ref), rtol=2e-3)


def test_megachain_warm_ns_matches_exact():
    """Drift-gated Newton-Schulz warm start (warm_ns=2) vs the full
    per-iteration rebuild on identical external randomness: the carried
    inverse refreshed by NS steps must reproduce the exact path to solver
    tolerance. In interpret mode the 1-pass matmuls are exact f32, so NS
    reaches the same fixed point; hardware agreement is bounded by the
    refinement (validated on device via chi^2)."""
    K, B = 4, 2
    mops_b, dims, ps0 = make_problem(B=B)
    ps0_pad = mega.pad_ps(jnp.asarray(ps0, jnp.float32), dims)
    rnd = draw_randomness(K, B, dims, dims.ntimes - 1)
    tables = megachain.make_chain_tables(mops_b)

    ps_a, sa = megachain.run_chunk_megachain(
        mops_b, tables, dims, ps0_pad, K, (),
        randomness=rnd, refine=2, batch_tile=2, store_cr=True)
    ps_b, sb = megachain.run_chunk_megachain(
        mops_b, tables, dims, ps0_pad, K, (),
        randomness=rnd, refine=2, batch_tile=2, store_cr=True,
        warm_ns=2, drift_max=10.0)  # force NS on every k > 0 step

    np.testing.assert_allclose(
        np.asarray(ps_b), np.asarray(ps_a), rtol=5e-4, atol=1e-7)
    scale = np.abs(np.asarray(sa.signal_cr.re)).mean() + 1e-30
    assert (np.abs(np.asarray(sb.signal_cr.re)
                   - np.asarray(sa.signal_cr.re)).max() / scale) < 1e-3
    np.testing.assert_allclose(
        np.asarray(sb.ln_post), np.asarray(sa.ln_post), rtol=1e-3)


def test_runner_megachain_engine(tmp_path):
    """run_baselines with engine=megachain writes reference-layout outputs.
    NOTE: interpret mode stubs the core PRNG (constant bits), so only
    shapes/finiteness are checked here; statistics are validated on device
    and via the external-randomness tests above."""
    from hydra_pspec_tpu.runner import BaselineJob, run_baselines

    ntimes, nfreqs, nmodes = 12, 16, 2
    d = crandn(ntimes, nfreqs) * 2.0
    w = np.ones(nfreqs)
    fg = crandn(nfreqs, nmodes)
    ninv = np.abs(RNG.standard_normal(nfreqs)) + 1.0
    job = BaselineJob(
        antpair=(0, 1), d=d, w=w, fgmodes=fg,
        S_initial=np.eye(nfreqs), Ninv=ninv, out_dir=tmp_path / "0-1",
    )
    niter = 4
    results, timings = run_baselines(
        [job], np.zeros((2, nfreqs)), niter, seed=3, write_niter=2,
        engine="megachain", use_mesh=False,
    )
    assert timings["engine"] == "megachain"
    r = results[0]
    assert r.signal_ps.shape == (niter, nfreqs)
    assert r.signal_cr.shape == (niter, ntimes, nfreqs)
    assert r.chisq.shape == (niter, ntimes, nfreqs)
    assert np.isfinite(r.signal_ps).all()
    dps = np.load(tmp_path / "0-1" / "dps-eor.npy")
    assert dps.shape == (niter, nfreqs)


def test_megachain_lean_chi_mask_matches_store_cr_filtering():
    """Lean-mode masked chi reduction (used by long flagged validation
    runs) equals the per-channel chi filtered on the host."""
    ntimes, nfreqs, nmodes = 10, 16, 2
    d = crandn(ntimes, nfreqs) * 2.0
    w = np.ones(nfreqs)
    w[3] = 0.0
    w[9:11] = 0.0
    fg = crandn(nfreqs, nmodes)
    ninv = np.abs(RNG.standard_normal(nfreqs)) + 1.0
    mops, dims = mega.build_mega_operators(d, w, fg, ninv)
    B, K = 2, 3
    mops_b = mega.broadcast_mega_operators(mops, B)
    ps0 = mega.pad_ps(jnp.full((B, nfreqs), 5.0), dims)
    tables = megachain.make_chain_tables(mops_b)
    rnd = draw_randomness(K, B, dims, dims.ntimes - 1)

    _, full = megachain.run_chunk_megachain(
        mops_b, tables, dims, ps0, K, (),
        randomness=rnd, batch_tile=2, store_cr=True)
    _, lean = megachain.run_chunk_megachain(
        mops_b, tables, dims, ps0, K, (),
        randomness=rnd, batch_tile=2, store_cr=False,
        chi_mask=jnp.asarray(w, jnp.float32))
    unflagged = w.astype(bool)
    # full chisq: (K, B, nt, nf) — average over times x unflagged channels
    ref = np.asarray(full.chisq)[:, :, :, unflagged].mean(axis=(2, 3))
    np.testing.assert_allclose(np.asarray(lean.chisq), ref,
                               rtol=1e-5, atol=1e-7)


def test_megachain_chunked_driver_statistics():
    """Full driver path with external-style statistics: run a chain on
    self-consistent data through run_chunk_megachain and check chi^2."""
    ntimes, nfreqs = 32, 16
    sig = crandn(ntimes, nfreqs) * 2.0
    noise = crandn(ntimes, nfreqs) * 0.5
    d = sig + noise
    w = np.ones(nfreqs)
    fg = np.zeros((nfreqs, 1), dtype=complex)
    fg[:, 0] = 1 / np.sqrt(nfreqs)
    ninv = np.full(nfreqs, 1 / 0.25)
    mops, dims = mega.build_mega_operators(d, w, fg, ninv)
    B = 2
    mops_b = mega.broadcast_mega_operators(mops, B)
    ps0 = mega.pad_ps(jnp.full((B, nfreqs), 4.0 * nfreqs), dims)
    tables = megachain.make_chain_tables(mops_b)
    K = 30
    rnd = draw_randomness(K, B, dims, dims.ntimes - 1)
    ps_f, samples = megachain.run_chunk_megachain(
        mops_b, tables, dims, ps0, K, (),
        randomness=rnd, batch_tile=2, store_cr=False,
    )
    chi = np.asarray(samples.chisq)   # (K, B) means
    assert np.isfinite(chi).all()
    assert abs(chi[15:].mean() - 1.0) < 0.2, chi[15:].mean()
    assert np.isfinite(np.asarray(samples.ln_post)).all()
    assert np.abs(np.asarray(ps_f)[:, nfreqs:]).max() == 0


def test_auto_chunk_policy():
    """auto_chunk scales K up for small batches (dispatch amortization for
    validation-sized runs), quantizes to multiples of 100 (compile-set
    control: each (B, K) pair is its own Mosaic executable), caps the
    per-chunk HBM output footprint in store_cr mode, and never exceeds
    niter."""
    from hydra_pspec_tpu.models.megachain import auto_chunk

    dims = mega.MegaDims(
        n=128, t=208, m=16, nfreqs=120, ntimes=203, nmodes=12,
        all_unflagged=True)
    # lean (store_cr=False): inverse-in-B scaling, quantized
    assert auto_chunk(100000, 4, dims, False) == 1600
    assert auto_chunk(100000, 16, dims, False) == 400
    assert auto_chunk(100000, 100, dims, False) == 100
    assert auto_chunk(100000, 400, dims, False) == 100
    # the validation shapes divide exactly (no ragged-tail executable)
    assert 8000 % auto_chunk(8000, 4, dims, False) == 0
    assert 12000 % auto_chunk(12000, 16, dims, False) == 0
    # store_cr: the ~1 GiB HBM cap binds before the B-scaling target
    k4_store = auto_chunk(100000, 4, dims, True)
    bytes_per = 4 * (3 * dims.n * dims.t + 2 * dims.m * dims.t + 3 * dims.n)
    assert k4_store * 4 * bytes_per <= (1 << 30)
    assert k4_store % 100 == 0 and k4_store >= 100
    # short chains never get a chunk beyond niter (min applied by caller,
    # but auto_chunk itself stays sane)
    assert auto_chunk(100, 4, dims, False) == 100
