"""Strong-scaling / throughput harness.

Equivalent of the reference's scripts/scaling_tests fixture
(set_up_scaling_data.py + SLURM sweep): replicate one baseline's data into
N identical baselines (identical results across baselines are then the
correctness oracle, scaling_tests_README.md:53-58) and sweep the batch
size on the available devices, writing a timings table.

Usage:
    python scripts/scaling_test.py --baselines 16,64,256 --niter 20 \
        [--data /root/reference/test_data] [--out scaling.json]

Device sweep (the samples/s-efficiency metric from BASELINE.md's north
star — >=85% at N>=2 workers; reference plotter analog:
scripts/scaling_tests/plot_speed_up.py):
    python scripts/scaling_test.py --device_sweep 1,2,4,8 --baselines 64
On a multi-chip mesh the sweep measures real strong scaling; on the
8-virtual-device CPU mesh it validates the harness end-to-end.
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
    p.add_argument("--device_sweep", default=None,
                   help="comma list of device counts; fixed total batch "
                        "(--baselines first value) split over each mesh")
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

    if args.device_sweep:
        from hydra_pspec_tpu.parallel import mesh as pmesh

        nb = int(args.baselines.split(",")[0])
        counts = [int(x) for x in args.device_sweep.split(",")]
        avail = jax.devices()
        rows = []
        for nd in counts:
            if nd > len(avail):
                print(f"skip ndev={nd}: only {len(avail)} devices",
                      file=sys.stderr)
                continue
            mesh = pmesh.make_mesh(avail[:nd])
            ops_b = rgibbs.broadcast_chain_operators(ops1, nb)
            ps_b = jnp.broadcast_to(
                jnp.asarray(ps0, dtype=jnp.float32), (nb, nfreqs))
            shared = {"f": ops_b.f, "igt": ops_b.igt}
            rep = pmesh.replicated_sharding(mesh)
            ops_b = pmesh.shard_batch(
                ops_b._replace(f=None, igt=None), mesh
            )._replace(
                f=jax.tree.map(lambda x: jax.device_put(x, rep), shared["f"]),
                igt=jax.tree.map(lambda x: jax.device_put(x, rep), shared["igt"]),
            )
            ps_b = pmesh.shard_batch(ps_b, mesh)

            def once(rep_i):
                ps_f, samples = rgibbs.run_chain_jit(
                    jax.random.fold_in(jax.random.key(0), rep_i), ops_b, ps_b,
                    prior_j, niter=args.niter, store_cr=False,
                    prior_idx=prior_idx, solver=args.solver,
                )
                return float(jnp.sum(ps_f)), float(jnp.mean(samples.chisq[-5:]))

            once(99)
            t0 = time.perf_counter()
            _, chi = once(0)
            wall = time.perf_counter() - t0
            rows.append({
                "n_devices": nd,
                "baselines": nb,
                "niter": args.niter,
                "samples_per_s": nb * args.niter / wall,
                "chisq": chi,
            })
            print(json.dumps(rows[-1]), flush=True)
        base = rows[0]
        for r in rows:
            ideal = base["samples_per_s"] * r["n_devices"] / base["n_devices"]
            r["efficiency"] = r["samples_per_s"] / ideal
        Path(args.out).write_text(json.dumps(rows, indent=2))
        print(f"wrote {args.out}", file=sys.stderr)
        return

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
