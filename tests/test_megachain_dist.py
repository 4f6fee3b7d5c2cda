"""Megachain engine under distribution: mesh sharding, multi-process runs,
and multi-process resume must reproduce the single-device single-process
trajectories bit-for-bit.

This is VERDICT r2 item 1/2: the production engine's randomness is keyed
per (seed, global chain stream id, iteration) only — batch composition
(mesh padding, slot placement) must not change any real chain's samples.
On CPU the kernel runs in interpret mode with per-chain external draws
(models/megachain.draw_chunk_randomness); the in-kernel core-PRNG twin
uses the same (seed, sid, k) stream identity and is validated on hardware.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _make_jobs(nbl=5, ntimes=12, nfreqs=16, nmodes=2, tmp=None):
    from hydra_pspec_tpu.runner import BaselineJob

    rng = np.random.default_rng(17)

    def crandn(*s):
        return (rng.standard_normal(s) + 1j * rng.standard_normal(s)) / np.sqrt(2)

    jobs = []
    for ib in range(nbl):
        d = crandn(ntimes, nfreqs) * 2.0
        w = np.ones(nfreqs)
        fg = crandn(nfreqs, nmodes)
        ninv = np.abs(rng.standard_normal(nfreqs)) + 1.0
        jobs.append(BaselineJob(
            antpair=(0, ib + 1), d=d, w=w, fgmodes=fg,
            S_initial=np.eye(nfreqs), Ninv=ninv,
            out_dir=None if tmp is None else tmp / f"0-{ib + 1}",
        ))
    return jobs, nfreqs


def _run(jobs, nfreqs, use_mesh, nchains=1, niter=6, resume=False):
    from hydra_pspec_tpu.runner import run_baselines

    prior = np.zeros((2, nfreqs))
    prior[0, nfreqs // 2 - 1: nfreqs // 2 + 2] = 300.0
    prior[1, nfreqs // 2 - 1: nfreqs // 2 + 2] = 0.5
    results, timings = run_baselines(
        jobs, prior, niter, seed=11, nchains=nchains, write_niter=3,
        engine="megachain", use_mesh=use_mesh, resume=resume,
    )
    assert timings["engine"] == "megachain"
    return results


def test_megachain_mesh_matches_single_device():
    """5 baselines x 2 chains over the 8-virtual-device mesh (padding 10 ->
    16, per-device blocks re-tiled) vs the unsharded run: bit-identical."""
    jobs, nfreqs = _make_jobs(nbl=5)
    res_a = _run(jobs, nfreqs, use_mesh=False, nchains=2)
    res_b = _run(jobs, nfreqs, use_mesh=True, nchains=2)
    assert len(res_a) == len(res_b) == 10
    for ra, rb in zip(res_a, res_b):
        assert ra.antpair == rb.antpair and ra.chain == rb.chain
        np.testing.assert_array_equal(ra.signal_ps, rb.signal_ps)
        np.testing.assert_array_equal(ra.ln_post, rb.ln_post)
        np.testing.assert_array_equal(ra.chisq, rb.chisq)
        np.testing.assert_array_equal(ra.signal_cr, rb.signal_cr)


def test_megachain_stream_is_subset_invariant():
    """Running a SUBSET of the baselines with their global ids reproduces
    those chains exactly (the property multi-process slot layouts rely on)."""
    from hydra_pspec_tpu.runner import run_baselines

    jobs, nfreqs = _make_jobs(nbl=4)
    prior = np.zeros((2, nfreqs))
    kw = dict(seed=11, write_niter=4, engine="megachain", use_mesh=False)
    res_all, _ = run_baselines(jobs, prior, 4, **kw)
    res_sub, _ = run_baselines(jobs[2:], prior, 4,
                               global_baseline_ids=[2, 3],
                               n_global_baselines=4, **kw)
    for ra, rb in zip(res_all[2:], res_sub):
        assert ra.antpair == rb.antpair
        np.testing.assert_array_equal(ra.signal_ps, rb.signal_ps)
        np.testing.assert_array_equal(ra.ln_post, rb.ln_post)


# --- real 2-process runs (jax.distributed over localhost) -----------------

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_inputs(tmp):
    from hydra_pspec_tpu.utils import uvh5 as uv

    rng = np.random.default_rng(42)
    nt, nf = 8, 16
    pairs = [(1, 2), (1, 3), (2, 3)]
    vis = {
        p: rng.standard_normal((nt, nf)) + 1j * rng.standard_normal((nt, nf))
        for p in pairs
    }
    fp = tmp / "data.uvh5"
    uv.write_uvh5(fp, vis, freqs_hz=1e8 + np.arange(nf) * 1e5)
    return fp, [f"{a}-{b}" for a, b in pairs]


def _argv(fp, out_dir, niter=4, resume=False, engine="megachain"):
    args = [
        str(fp),
        "--out_dir", str(out_dir),
        "--dirname", "res",
        "--Niter", str(niter),
        "--write_Niter", "2",
        "--seed", "7",
        "--Nfgmodes", "2",
        "--engine", engine,
    ]
    if resume:
        args.append("--resume")
    return args


def _run_two_procs(fp, out_dir, niter=4, resume=False, engine="megachain"):
    port = _free_port()
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "hydra_pspec_tpu.cli.run",
            *_argv(fp, out_dir, niter=niter, resume=resume, engine=engine),
            "--num_processes", "2",
            "--process_id", str(pid),
            "--coordinator", f"localhost:{port}",
        ]
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\nstdout:{so}\nstderr:{se}"


FILES = ("dps-eor.npy", "ln-post.npy", "gcr-eor.npy", "chisq.npy")


def test_megachain_two_process_matches_single_process(tmp_path):
    """The production engine itself (not a fallback) under 2
    jax.distributed processes: per-baseline outputs must be bit-identical
    to the single-process mesh run — 3 baselines over 8 global slots
    exercises the interleaved dummy-slot padding that position-keyed
    streams would break."""
    fp, bl_strs = _write_inputs(tmp_path)

    from hydra_pspec_tpu.cli.run import main

    single_out = tmp_path / "single"
    assert main(_argv(fp, single_out)) == 0

    multi_out = tmp_path / "multi"
    _run_two_procs(fp, multi_out)

    for bl in bl_strs:
        for name in FILES:
            a = np.load(multi_out / "res" / bl / name)
            b = np.load(single_out / "res" / bl / name)
            assert a.shape == b.shape, (bl, name, a.shape, b.shape)
            np.testing.assert_array_equal(a, b, err_msg=f"{bl}/{name}")


def test_mega_engine_two_process_matches_single_process(tmp_path):
    """Fallback engine (mega, used for features outside the megachain
    kernel): also per-sid keyed, also bit-identical under 2 processes."""
    fp, bl_strs = _write_inputs(tmp_path)

    from hydra_pspec_tpu.cli.run import main

    single_out = tmp_path / "single"
    assert main(_argv(fp, single_out, engine="mega")) == 0

    multi_out = tmp_path / "multi"
    _run_two_procs(fp, multi_out, engine="mega")

    for bl in bl_strs:
        for name in FILES:
            a = np.load(multi_out / "res" / bl / name)
            b = np.load(single_out / "res" / bl / name)
            np.testing.assert_array_equal(a, b, err_msg=f"{bl}/{name}")


def test_two_process_resume_matches_uninterrupted(tmp_path):
    """Kill-and-resume under 2 processes (VERDICT r2 weak #1): a run
    stopped at iteration 2 and resumed to 4 must produce complete outputs
    bit-identical to an uninterrupted 4-iteration 2-process run."""
    fp, bl_strs = _write_inputs(tmp_path)

    full_out = tmp_path / "full"
    _run_two_procs(fp, full_out, niter=4)

    part_out = tmp_path / "part"
    _run_two_procs(fp, part_out, niter=2)           # "killed" after 2 iters
    for pid in range(2):
        assert (part_out / "res" / f"checkpoint-p{pid}.npz").exists()
    _run_two_procs(fp, part_out, niter=4, resume=True)

    for bl in bl_strs:
        for name in FILES:
            a = np.load(part_out / "res" / bl / name)
            b = np.load(full_out / "res" / bl / name)
            assert a.shape == b.shape, (bl, name, a.shape, b.shape)
            np.testing.assert_array_equal(a, b, err_msg=f"{bl}/{name}")
