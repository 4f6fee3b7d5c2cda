"""Strong-scaling / throughput harness.

Equivalent of the reference's scripts/scaling_tests fixture
(set_up_scaling_data.py + SLURM sweep): replicate one baseline's data into
N identical baselines (identical results across baselines are then the
correctness oracle, scaling_tests_README.md:53-58) and sweep the batch
size on the available devices, writing a timings table.

Usage:
    python scripts/scaling_test.py --baselines 16,64,256 --niter 20 \
        [--data /root/reference/test_data] [--out scaling.json]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/root/reference/test_data")
    p.add_argument("--baselines", default="16,64,256")
    p.add_argument("--niter", type=int, default=20)
    p.add_argument("--out", default="scaling.json")
    p.add_argument("--solver", default="auto")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hydra_pspec_tpu.models import rgibbs
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5

    td = Path(args.data)
    bls, _ = read_uvh5(td / "vis-eor-fgs.uvh5")
    d = bls[0].vis + np.load(td / "0-1" / "noise.npy")
    noise_cov = np.load(td / "0-1" / "noise-cov.npy")
    fgmodes = np.load(td / "0-1" / "fgmodes.npy")[:, :12]
    eor_cov = np.load(td / "0-1" / "eor-cov.npy")
    nfreqs = d.shape[1]
    w = np.ones(nfreqs)
    ninv = 1.0 / np.diagonal(noise_cov)
    prior = np.zeros((2, nfreqs))
    prior[0, nfreqs // 2 - 3 : nfreqs // 2 + 4] = 2.0
    prior[1, nfreqs // 2 - 3 : nfreqs // 2 + 4] = 0.1
    prior_j = jnp.asarray(prior, dtype=jnp.float32)
    prior_idx = jnp.asarray(np.nonzero(np.any(prior > 0, axis=0))[0])

    i = np.arange(nfreqs) - nfreqs // 2
    F = np.exp(-2j * np.pi * np.outer(i, i) / nfreqs)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None)

    ops1 = rgibbs.build_chain_operators(d, w, fgmodes, ninv)
    results = []
    for nb in [int(x) for x in args.baselines.split(",")]:
        ops_b = rgibbs.broadcast_chain_operators(ops1, nb)
        ps_b = jnp.broadcast_to(jnp.asarray(ps0, dtype=jnp.float32), (nb, nfreqs))

        def once(rep):
            ps_f, samples = rgibbs.run_chain_jit(
                jax.random.fold_in(jax.random.key(0), rep), ops_b, ps_b,
                prior_j, niter=args.niter, store_cr=False,
                prior_idx=prior_idx, solver=args.solver,
            )
            return float(jnp.sum(ps_f)), float(jnp.mean(samples.chisq[-5:]))

        once(99)  # compile
        t0 = time.perf_counter()
        _, chi = once(0)
        wall = time.perf_counter() - t0
        row = {
            "baselines": nb,
            "niter": args.niter,
            "sec_per_iter": wall / args.niter,
            "baseline_iters_per_s": nb * args.niter / wall,
            "chisq": chi,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
