"""Runner tests: output shapes/layout for both engines, multi-chain,
checkpoint/resume, and the mesh-sharded batch path on 8 virtual devices."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydra_pspec_tpu.runner import BaselineJob, run_baselines, gelman_rubin

RNG = np.random.default_rng(55)


def crandn(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)) / np.sqrt(2)


def make_jobs(nbl=2, ntimes=12, nfreqs=16, nmodes=3, tmp=None):
    jobs = []
    for i in range(nbl):
        d = crandn(ntimes, nfreqs) * 2
        w = np.ones(nfreqs)
        fg = crandn(nfreqs, nmodes)
        ninv = np.abs(RNG.standard_normal(nfreqs)) + 1.0
        jobs.append(
            BaselineJob(
                antpair=(0, i + 1), d=d, w=w, fgmodes=fg,
                S_initial=np.eye(nfreqs), Ninv=ninv,
                out_dir=None if tmp is None else tmp / f"0-{i+1}",
            )
        )
    return jobs


@pytest.mark.parametrize("engine", ["complex", "real"])
def test_output_shapes_and_iteration_axis(engine, tmp_path):
    nbl, ntimes, nfreqs, niter = 2, 12, 16, 7
    jobs = make_jobs(nbl, ntimes, nfreqs, tmp=tmp_path)
    prior = np.zeros((2, nfreqs))
    results, timings = run_baselines(
        jobs, prior, niter, seed=3, write_niter=4, engine=engine,
        use_mesh=False, verbose=False,
    )
    assert timings["engine"] == engine
    assert len(results) == nbl
    for r in results:
        assert r.signal_ps.shape == (niter, nfreqs)
        assert r.ln_post.shape == (niter,)
        assert r.signal_cr.shape == (niter, ntimes, nfreqs)
        assert np.iscomplexobj(r.signal_cr)
        assert r.chisq.shape == (niter, ntimes, nfreqs)
        assert r.signal_S.shape == (nfreqs, nfreqs)
        assert np.isfinite(r.signal_ps).all()
        # files exist with full iteration axis
        dps = np.load(r.out_dir / "dps-eor.npy")
        assert dps.shape == (niter, nfreqs)
        np.testing.assert_allclose(dps, r.signal_ps)


def test_engines_agree_statistically():
    """Both engines sample the same posterior: compare bandpower posterior
    means over a short chain on identical data (MC-error tolerance)."""
    jobs = make_jobs(1, ntimes=48, nfreqs=8)
    prior = np.zeros((2, 8))
    niter = 300
    rc, _ = run_baselines(jobs, prior, niter, seed=1, engine="complex",
                          use_mesh=False, store_cr=False, write_niter=1000)
    rr, _ = run_baselines(jobs, prior, niter, seed=2, engine="real",
                          use_mesh=False, store_cr=False, write_niter=1000)
    mc = rc[0].signal_ps[100:].mean(axis=0)
    mr = rr[0].signal_ps[100:].mean(axis=0)
    ratio = mr / mc
    assert np.all(ratio > 0.6) and np.all(ratio < 1.6), ratio


def test_multichain_and_rhat(tmp_path):
    jobs = make_jobs(1, tmp=tmp_path)
    prior = np.zeros((2, 16))
    results, _ = run_baselines(
        jobs, prior, 20, seed=5, nchains=3, engine="complex",
        use_mesh=False, store_cr=False, write_niter=50,
    )
    assert len(results) == 3
    assert {r.chain for r in results} == {0, 1, 2}
    # chain outputs land in chain-k subdirectories
    assert (tmp_path / "0-1" / "chain-0" / "dps-eor.npy").exists()
    assert (tmp_path / "0-1" / "chain-2" / "dps-eor.npy").exists()
    # chains differ (independent RNG streams)
    assert not np.allclose(results[0].signal_ps, results[1].signal_ps)
    chains = np.stack([r.signal_ps for r in results])
    rhat = gelman_rubin(chains)
    assert rhat.shape == (16,)
    assert np.isfinite(rhat).all()


def test_checkpoint_resume(tmp_path):
    jobs = make_jobs(1, tmp=tmp_path)
    prior = np.zeros((2, 16))
    run_baselines(jobs, prior, 6, seed=9, engine="complex", use_mesh=False,
                  write_niter=3, store_cr=False)
    ck = tmp_path / "0-1" / "checkpoint.npz"
    assert ck.exists()
    # resume continues from the checkpoint without error
    results, _ = run_baselines(
        jobs, prior, 9, seed=9, engine="complex", use_mesh=False,
        write_niter=3, store_cr=False, resume=True, verbose=False,
    )
    assert results[0].signal_ps.shape[0] >= 3


def test_mesh_sharded_batch():
    """8 baselines over 8 virtual CPU devices — the production sharding."""
    assert len(jax.devices()) == 8
    jobs = make_jobs(8)
    prior = np.zeros((2, 16))
    results, _ = run_baselines(
        jobs, prior, 4, seed=11, engine="complex", use_mesh=True,
        store_cr=False, write_niter=10,
    )
    assert len(results) == 8
    for r in results:
        assert np.isfinite(r.signal_ps).all()
