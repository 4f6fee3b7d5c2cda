"""Grouped time-flags megachain kernel vs the per-group single-step mega
composition — interpret mode on CPU, external randomness (the in-kernel
grouped RNG streams are validated on hardware like the plain kernel's).

Replaces the real-engine tflags demotion (runner round-4 behavior, a
measured 5.5x slowdown) with the megachain kernel: rows are chain-major
(chain, time-group) pairs, the kernel pools beta over each chain's rows
and draws ONE bandpower state per chain (models/tflags.py pooled
conditional; reference pspec.py:104-108 with alpha from the total time
count — the reference itself collapses time-dependent flags entirely,
run-hydra-pspec.py:541 FIXME)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydra_pspec_tpu.models import mega, megachain, rgibbs, tflags
from hydra_pspec_tpu.ops.invgamma import truncated_invgamma_sample_table

RNG = np.random.default_rng(77)


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


def make_grouped_problem(ntimes=12, nfreqs=16, nmodes=2, nchains=2,
                         three_groups=False):
    """One baseline with time-dependent flags, ``nchains`` chains."""
    d = crandn(ntimes, nfreqs) * 2.0
    fg = crandn(nfreqs, nmodes)
    ninv = np.abs(RNG.standard_normal(nfreqs)) + 1.0
    flags_tf = np.zeros((ntimes, nfreqs), dtype=bool)
    flags_tf[7:, 3] = True          # pattern B: channel 3 flagged
    if three_groups:
        flags_tf[10:, 8] = True     # pattern C: channels 3+8 flagged
    per_bl = tflags.build_grouped_operators_real(d, flags_tf, fg, ninv)
    groups = [
        tflags.TimeGroupReal(
            ops=rgibbs.stack_chain_operators([g.ops] * nchains),
            idx=g.idx,
        )
        for g in per_bl
    ]
    return groups, d, flags_tf


def draw_grouped_randomness(K, nchains, G, dims, alpha_int):
    n, t = dims.n, dims.t
    B = nchains * G
    sa = np.float32(np.sqrt(0.5) * np.sqrt(dims.nfreqs))
    hf = np.float32(np.sqrt(0.5))
    gam_c = RNG.gamma(alpha_int, size=(K, nchains, n)).astype(np.float32)
    u_c = RNG.uniform(size=(K, nchains, 128)).astype(np.float32)
    rnd = {
        "oa_re": RNG.standard_normal((K, B, n, t)).astype(np.float32) * sa,
        "oa_im": RNG.standard_normal((K, B, n, t)).astype(np.float32) * sa,
        "ob_re": RNG.standard_normal((K, B, n, t)).astype(np.float32) * hf,
        "ob_im": RNG.standard_normal((K, B, n, t)).astype(np.float32) * hf,
        # gamma/uniforms are CHAIN streams: identical for a chain's G rows
        "gam": np.repeat(gam_c, G, axis=1),
        "u_pb": np.repeat(u_c, G, axis=1),
    }
    return {k: jnp.asarray(v) for k, v in rnd.items()}


def grouped_oracle(groups, setup, ps0_pad_chain, prior_static, rnd, K,
                   batch_tile):
    """Per-group single-step mega + pooled XLA table sampler."""
    G = len(setup.group_times)
    g_real = len(groups)
    nchains = ps0_pad_chain.shape[0]
    per = [mega.from_chain_operators(g.ops, t_pad=setup.dims.t)
           for g in groups]
    table = setup.mops.igt
    ps = ps0_pad_chain                       # (nchains, n)
    outs = []
    for k in range(K):
        beta_pool = jnp.zeros_like(ps)
        noise_pool = jnp.zeros_like(ps)
        bmask_pool = jnp.zeros_like(ps)
        per_group = []
        for g in range(g_real):
            mops_g, dims_g = per[g]
            rows = np.asarray([c * G + g for c in range(nchains)])
            res = mega.gcr_megastep(
                mops_g.pt_re, mops_g.pt_im, ps, mops_g.nih,
                mops_g.nid_re, mops_g.nid_im, mops_g.dw_re, mops_g.dw_im,
                mops_g.ninv_full, mops_g.w,
                mops_g.fg_re, mops_g.fg_im, mops_g.g_re, mops_g.g_im,
                mops_g.mi_re, mops_g.mi_im, mops_g.a0_re, mops_g.a0_im,
                mops_g.f_re, mops_g.f_im,
                rnd["oa_re"][k][rows], rnd["oa_im"][k][rows],
                rnd["ob_re"][k][rows], rnd["ob_im"][k][rows],
                nfreqs_true=dims_g.nfreqs, ntimes_true=dims_g.ntimes,
                batch_tile=batch_tile, refine=1,
                all_unflagged=False,
            )
            sig_re, sig_im, amp_re, amp_im, chi, beta, noise, bmask = res
            beta_pool = beta_pool + beta
            noise_pool = noise_pool + noise
            bmask_pool = bmask_pool + bmask
            per_group.append((sig_re, sig_im, amp_re, amp_im, chi,
                              dims_g))
        gam_c = rnd["gam"][k][::G]           # chain streams
        u_c = rnd["u_pb"][k][::G]
        ps_new = beta_pool / gam_c
        for j, (idx, lo, hi) in enumerate(prior_static):
            bounded = truncated_invgamma_sample_table(
                u_c[:, j], beta_pool[:, idx],
                jnp.float32(lo), jnp.float32(hi), table)
            ps_new = ps_new.at[:, idx].set(bounded)
        outs.append((per_group, ps_new, noise_pool, bmask_pool))
        ps = ps_new
    return outs


@pytest.mark.parametrize("three_groups", [False, True])
def test_grouped_megachain_matches_composition(three_groups):
    """G=2 exact layout and G_real=3 -> G=4 dummy-pad layout both pin
    against the per-group composition, including bounded prior bins
    through the pooled-alpha table."""
    K, nchains, bt = 3, 2, 4
    groups, d, flags_tf = make_grouped_problem(three_groups=three_groups)
    setup = megachain.build_tflags_mega_setup(groups)
    G = len(setup.group_times)
    assert G == (4 if three_groups else 2)
    assert setup.dims.ntimes == d.shape[0]
    assert not setup.dims.all_unflagged
    nf = setup.dims.nfreqs

    prior = np.zeros((2, nf))
    prior[0, nf // 2 - 1: nf // 2 + 2] = 300.0
    prior[1, nf // 2 - 1: nf // 2 + 2] = 0.5
    prior_static = megachain.prior_static_from(prior, setup.dims)

    ps0 = np.abs(RNG.standard_normal((nchains, nf))) * 10.0 + 0.5
    ps0_pad_c = mega.pad_ps(jnp.asarray(ps0, jnp.float32), setup.dims)
    ps0_rows = jnp.repeat(ps0_pad_c, G, axis=0)

    alpha_int = setup.dims.ntimes - 1
    rnd = draw_grouped_randomness(K, nchains, G, setup.dims, alpha_int)

    tables = megachain.make_chain_tables(setup.mops)
    ps_f, sample = megachain.run_chunk_megachain(
        setup.mops, tables, setup.dims, ps0_rows, K, prior_static,
        randomness=rnd, refine=1, batch_tile=bt, store_cr=True,
        group_times=setup.group_times, group_idx=setup.group_idx,
    )

    outs = grouped_oracle(groups, setup, ps0_pad_c, prior_static, rnd, K,
                          batch_tile=bt)

    # final per-row ps state: every row carries its chain's pooled ps
    ps_f = np.asarray(ps_f)
    ref_final = np.asarray(outs[-1][1])
    for c in range(nchains):
        for g in range(G):
            np.testing.assert_allclose(
                ps_f[c * G + g], ref_final[c], rtol=2e-4, atol=1e-6)

    for k in range(K):
        per_group, ps_new, noise_pool, bmask_pool = outs[k]
        # pooled bandpower state
        got_ps = np.asarray(sample.ps[k])
        ref_ps = np.asarray(ps_new)[:, :nf]
        np.testing.assert_allclose(got_ps, ref_ps, rtol=2e-4, atol=1e-6)
        # ln_post from pooled statistics
        sig_term = np.sum(
            np.asarray(bmask_pool)
            / np.maximum(np.asarray(ps_new), np.finfo(np.float32).tiny),
            axis=-1)
        ref_lnp = -(np.sum(np.asarray(noise_pool), axis=-1) + sig_term)
        np.testing.assert_allclose(
            np.asarray(sample.ln_post[k]), ref_lnp, rtol=2e-3)
        # time-reassembled per-sample fields, group by group
        for g, (sig_re, sig_im, amp_re, amp_im, chi, dims_g) in enumerate(
                per_group):
            idx = np.asarray(setup.group_idx[g])
            tg = dims_g.ntimes
            ref_sig = np.swapaxes(np.asarray(sig_re)[:, :nf, :tg], 1, 2)
            got_sig = np.asarray(sample.signal_cr.re[k])[:, idx, :]
            scale = np.abs(ref_sig).mean() + 1e-30
            assert np.abs(got_sig - ref_sig).max() / scale < 5e-4
            ref_chi = np.swapaxes(np.asarray(chi)[:, :nf, :tg], 1, 2)
            got_chi = np.asarray(sample.chisq[k])[:, idx, :]
            np.testing.assert_allclose(got_chi, ref_chi, rtol=5e-3,
                                       atol=1e-5)


def test_grouped_lean_matches_store_cr():
    """Lean grouped outputs (pooled time-reduced chi, ps, ln_post) agree
    with the store_cr run on the same randomness."""
    K, nchains, bt = 2, 2, 4
    groups, d, _ = make_grouped_problem()
    setup = megachain.build_tflags_mega_setup(groups)
    G = len(setup.group_times)
    nf = setup.dims.nfreqs
    prior = np.zeros((2, nf))
    prior_static = megachain.prior_static_from(prior, setup.dims)

    ps0 = np.abs(RNG.standard_normal((nchains, nf))) * 10.0 + 0.5
    ps0_rows = jnp.repeat(
        mega.pad_ps(jnp.asarray(ps0, jnp.float32), setup.dims), G, axis=0)
    rnd = draw_grouped_randomness(K, nchains, G, setup.dims,
                                  setup.dims.ntimes - 1)
    tables = megachain.make_chain_tables(setup.mops)

    common = dict(randomness=rnd, refine=1, batch_tile=bt,
                  group_times=setup.group_times, group_idx=setup.group_idx)
    ps_a, full = megachain.run_chunk_megachain(
        setup.mops, tables, setup.dims, ps0_rows, K, prior_static,
        store_cr=True, **common)
    ps_b, lean = megachain.run_chunk_megachain(
        setup.mops, tables, setup.dims, ps0_rows, K, prior_static,
        store_cr=False, **common)

    np.testing.assert_allclose(np.asarray(ps_a), np.asarray(ps_b),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lean.ps), np.asarray(full.ps),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(lean.ln_post), np.asarray(full.ln_post), rtol=1e-4)
    # lean chi = mean over (freqs, TOTAL true times) of the full chi
    ref_chi = np.asarray(full.chisq).sum(axis=(2, 3)) / (
        nf * setup.dims.ntimes)
    np.testing.assert_allclose(np.asarray(lean.chisq), ref_chi, rtol=2e-3)


def test_tflags_real_engine_uses_pooled_alpha_table():
    """Regression for the pooled-conditional table bug: with unequal
    groups and a bounded prior bin, the real-engine tflags draw must use
    alpha + 1 = Ntimes_TOTAL (not group 0's table). Pinned by re-deriving
    the draw with the step's own key derivation."""
    from hydra_pspec_tpu.ops.invgamma import (make_invgamma_table,
                                              sample_bandpowers_from_beta)

    groups, d, _ = make_grouped_problem(nchains=1)
    ntimes_total = d.shape[0]
    nf = d.shape[1]
    prior = np.zeros((2, nf), dtype=np.float32)
    prior[0, 5] = 300.0
    prior[1, 5] = 0.5
    prior_j = jnp.asarray(prior)
    ps0 = jnp.asarray(
        np.abs(RNG.standard_normal((1, nf))) * 10.0 + 0.5, jnp.float32)

    key = jax.random.key(3)
    igt_tot = make_invgamma_table(ntimes_total)
    ps_new, _ = tflags.gibbs_step_tflags_real(
        key, ps0, groups, prior_j, igt_total=igt_tot)

    # re-derive: the step's beta is deterministic given (key, sids=[0]);
    # recompute it by running the same step with map_estimate=False and
    # extracting via a second call that shares the key -> compare the
    # prior-bin draw against sample_bandpowers_from_beta with the SAME
    # derived key and the pooled table
    row_key = jax.random.fold_in(key, 0)
    k_ps = jax.random.fold_in(row_key, 999_983)
    # beta reconstruction: free bins of ps_new give beta = ps * Gamma draw
    # with the step's own k_ps stream — instead reconstruct beta from the
    # free-bin identity by re-drawing with the same key
    beta_probe = jnp.ones((nf,), jnp.float32)
    probe = sample_bandpowers_from_beta(
        k_ps, beta_probe, ntimes_total, jnp.zeros((2, nf), jnp.float32),
        None, None)
    gam = 1.0 / probe                       # Gamma(alpha_total) variates
    # beta recovered from the free-bin identity ps = beta / gam; the prior
    # bin's beta comes from a zero-prior twin of the same step (identical
    # randomness streams). Everything stays float32: the in-step uniform
    # stream is drawn at beta.dtype, so an accidental float64 here would
    # change the draw.
    ps_free, _ = tflags.gibbs_step_tflags_real(
        key, ps0, groups, jnp.zeros_like(prior_j), igt_total=igt_tot)
    beta = jnp.asarray(np.asarray(ps_new[0] * gam), jnp.float32)
    beta5 = jnp.float32(float(ps_free[0, 5]) * float(gam[5]))
    ps_wrong = sample_bandpowers_from_beta(
        k_ps, beta.at[5].set(beta5), ntimes_total, prior_j,
        None, groups[0].ops.igt)            # the pre-round-5 wiring
    ps_right = sample_bandpowers_from_beta(
        k_ps, beta.at[5].set(beta5), ntimes_total, prior_j,
        None, igt_tot)
    # the step must agree with the pooled-alpha table draw...
    np.testing.assert_allclose(
        float(ps_new[0, 5]), float(ps_right[5]), rtol=1e-5)
    # ...and the group-0 table (alpha = first group's times) must give a
    # materially different value — i.e. the old wiring was a real bug
    assert abs(float(ps_wrong[5]) - float(ps_right[5])) > 1e-3 * abs(
        float(ps_right[5]))


# --- runner wiring (round 5: megachain engine runs tflags directly) ------

def _tflag_jobs(nbl=2, ntimes=10, nfreqs=16, out_root=None):
    """Baselines sharing one flag signature (2 time groups)."""
    from hydra_pspec_tpu.runner import BaselineJob

    flags = np.zeros((ntimes, nfreqs), dtype=bool)
    flags[6:, 3] = True
    jobs = []
    for ib in range(nbl):
        d = crandn(ntimes, nfreqs) * 2.0
        jobs.append(BaselineJob(
            antpair=(ib, ib + 1), d=d, w=np.ones(nfreqs),
            fgmodes=crandn(nfreqs, 2), S_initial=np.eye(nfreqs),
            Ninv=np.abs(RNG.standard_normal(nfreqs)) + 1.0,
            out_dir=None if out_root is None
            else out_root / f"{ib}-{ib + 1}",
            flags_tf=flags,
        ))
    return jobs


def test_runner_tflags_megachain_mesh_matches_single_device():
    """The grouped megachain runner path is bit-identical with and without
    the device mesh (chain-whole padding keeps G-row pooling blocks
    shard-aligned; per-chain external streams are keyed on global sids)."""
    from hydra_pspec_tpu.runner import run_baselines

    jobs = _tflag_jobs(nbl=2)
    prior = np.zeros((2, 16))
    kw = dict(seed=11, nchains=2, write_niter=4, engine="megachain")
    res_plain, t_plain = run_baselines(jobs, prior, 4, use_mesh=False, **kw)
    res_mesh, t_mesh = run_baselines(jobs, prior, 4, use_mesh=True, **kw)
    assert t_plain["engine"] == t_mesh["engine"] == "megachain"
    assert len(res_plain) == len(res_mesh) == 4
    for a, b in zip(res_plain, res_mesh):
        np.testing.assert_array_equal(a.signal_ps, b.signal_ps)
        np.testing.assert_array_equal(a.signal_cr, b.signal_cr)
        np.testing.assert_array_equal(a.chisq, b.chisq)


def test_runner_tflags_megachain_batch_composition_invariant():
    """A baseline's chains are bit-identical whether it runs alone or
    batched with another baseline (global sids key every stream: row
    streams sid*G+g, chain streams sid)."""
    from hydra_pspec_tpu.runner import run_baselines

    jobs = _tflag_jobs(nbl=2)
    prior = np.zeros((2, 16))
    kw = dict(seed=7, nchains=2, write_niter=3, engine="megachain",
              use_mesh=False)
    both, _ = run_baselines(jobs, prior, 3, **kw)
    solo, _ = run_baselines([jobs[1]], prior, 3,
                            global_baseline_ids=[1],
                            n_global_baselines=2, **kw)
    for ic in range(2):
        np.testing.assert_array_equal(
            both[2 + ic].signal_ps, solo[ic].signal_ps)
        np.testing.assert_array_equal(
            both[2 + ic].signal_cr, solo[ic].signal_cr)


def test_runner_tflags_megachain_resume_bitexact(tmp_path):
    """checkpoint + resume through the grouped megachain path yields the
    same complete output files as an uninterrupted run (chunk keys are
    absolute-iteration folds; the ps carry state round-trips through the
    chain-rows <-> per-chain checkpoint layout)."""
    from hydra_pspec_tpu.runner import run_baselines

    prior = np.zeros((2, 16))
    kw = dict(seed=5, nchains=1, write_niter=2, engine="megachain",
              use_mesh=False)

    jobs_a = _tflag_jobs(nbl=1, out_root=tmp_path / "straight")
    run_baselines(jobs_a, prior, 4, run_dir=tmp_path / "straight", **kw)

    jobs_b = _tflag_jobs(nbl=1, out_root=tmp_path / "resumed")
    run_baselines(jobs_b, prior, 2, run_dir=tmp_path / "resumed", **kw)
    run_baselines(jobs_b, prior, 4, run_dir=tmp_path / "resumed",
                  resume=True, **kw)

    for f in ("dps-eor.npy", "signal-cr.npy", "chisq.npy"):
        a = np.load(tmp_path / "straight" / "0-1" / f)
        b = np.load(tmp_path / "resumed" / "0-1" / f)
        assert a.shape[0] == 4
        np.testing.assert_array_equal(a, b)
