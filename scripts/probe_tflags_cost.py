"""Measure the cost of the time-dependent-flags (tflags) path on
hardware vs the plain path (VERDICT r4 item 5): the runner demotes
mega/megachain to the real engine for any job carrying ``flags_tf``
(runner.py select-engine demotion), and this script quantifies what that
demotion costs so the decision (grouped-operator mega kernel vs "real
engine suffices") rests on a number.

Two timed configurations on the bundled test data (B identical
baselines, nchains=1, no output writes, store_cr=False so the relay
fetch of CR samples doesn't pollute the kernel timing; the plain
megachain comparison point comes from bench.py's committed sweep — its
executables are cache-warm and its numbers are the production ones):
  1. plain real       — the real engine without time groups
  2. tflags real      — 2 flag signatures x 2 time groups each, the
                        grouped real path (one factorization per group)

Usage:  python scripts/probe_tflags_cost.py          # TPU (takes claim)
        PROBE_B=32 PROBE_NITER=200 ... to resize

Appends the result row to ROADMAP.md by hand — the committed evidence is
the printed JSON.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

B = int(os.environ.get("PROBE_B", "32"))
NITER = int(os.environ.get("PROBE_NITER", "200"))


def make_jobs(with_tflags):
    from hydra_pspec_tpu.runner import BaselineJob
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5

    td = Path("/root/reference/test_data")
    bls, _ = read_uvh5(td / "vis-eor-fgs.uvh5")
    d = bls[0].vis + np.load(td / "0-1" / "noise.npy")
    noise_cov = np.load(td / "0-1" / "noise-cov.npy")
    fgmodes = np.load(td / "0-1" / "fgmodes.npy")[:, :12]
    ninv = np.diag(1.0 / np.diagonal(noise_cov))
    nt, nf = d.shape
    jobs = []
    for ib in range(B):
        flags_tf = None
        w = np.ones(nf)
        if with_tflags:
            # two signatures across the batch, each with two time groups
            # (realistic RFI: a channel block flagged during part of the
            # observation) — signature count drives sequential group runs,
            # time-group count drives per-iteration factorization count
            flags_tf = np.zeros((nt, nf), dtype=bool)
            if ib % 2 == 0:
                flags_tf[50:120, 30:34] = True
            else:
                flags_tf[0:60, 77:80] = True
                flags_tf[0:60, 100] = True
            w = (~np.any(flags_tf, 0)).astype(float)
        jobs.append(BaselineJob(
            antpair=(0, ib + 1), d=d, w=w, fgmodes=fgmodes,
            S_initial=np.load(td / "0-1" / "eor-cov.npy"), Ninv=ninv,
            out_dir=None, flags_tf=flags_tf,
        ))
    return jobs


def timed(engine, with_tflags, reps=3):
    from hydra_pspec_tpu.runner import run_baselines

    prior = np.zeros((2, 120))
    prior[0, 57:64] = 2.0
    prior[1, 57:64] = 0.1
    jobs = make_jobs(with_tflags)
    # compile + warm
    run_baselines(jobs, prior, NITER, seed=0, nchains=1,
                  write_niter=NITER, engine=engine, use_mesh=False,
                  store_cr=False)
    walls = []
    for rep in range(reps):
        t0 = time.perf_counter()
        _, timings = run_baselines(jobs, prior, NITER, seed=rep + 1,
                                   nchains=1, write_niter=NITER,
                                   engine=engine, use_mesh=False,
                                   store_cr=False)
        walls.append(time.perf_counter() - t0)
    sec = float(np.median(walls)) / NITER
    return {"ms_per_iter": round(sec * 1e3, 3),
            "baseline_iters_per_s": round(B / sec, 1),
            "engine_reported": timings["engine"]}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    out = {"B": B, "niter": NITER, "backend": jax.default_backend()}
    for name, engine, tf in (("plain_real", "real", False),
                             ("tflags_real_2sig", "real", True),
                             ("tflags_megachain_2sig", "megachain", True)):
        print(f"[probe] timing {name}...", file=sys.stderr)
        out[name] = timed(engine, tf)
        print(f"[probe] {name}: {out[name]}", file=sys.stderr)
    out["tflags_over_plain_real"] = round(
        out["tflags_real_2sig"]["ms_per_iter"]
        / out["plain_real"]["ms_per_iter"], 2)
    out["tflags_megachain_speedup_vs_real"] = round(
        out["tflags_real_2sig"]["ms_per_iter"]
        / out["tflags_megachain_2sig"]["ms_per_iter"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
