"""CPU probe: per-Gibbs-iteration drift of the equilibrated GCR system,
to size the megachain Newton-Schulz warm start (warm_ns, drift_max).

For consecutive bandpower samples ps_k -> ps_{k+1} of a real chain it
measures
    delta_k = || (E_{k+1} - E_k) E_k^{-1} ||_2
(the NS warm-start contraction seed: err after ns steps ~ delta^(2^ns))
and the kernel's cheap gate statistic max_rel ps move, so we can pick a
drift_max that (a) passes often and (b) guarantees delta well below 1.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_ns_drift.py
"""
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def equilibrated_E(ps, ptr, pti, nfreqs_true):
    """Complex form of the kernel's embedded system (megastep phase 4):
    M = Dinv (I + dd P dd) Dinv with dd = sqrt(ps/n), Dinv from the Jacobi
    equilibration. Returns the complex matrix (2-norm of the real
    embedding equals the complex 2-norm)."""
    n = ps.shape[0]
    dd = np.sqrt(np.clip(ps, 0, None) / nfreqs_true)
    diag_pt = np.real(np.diagonal(ptr + 1j * pti))
    dinv = 1.0 / np.sqrt(np.maximum(1.0 + dd * dd * diag_pt, 1e-30))
    outer = np.outer(dd, dd)
    m = outer * (ptr + 1j * pti) + np.eye(n)
    return m * np.outer(dinv, dinv)


def main():
    import jax
    import jax.numpy as jnp

    from hydra_pspec_tpu.models import mega, rgibbs
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5

    td = Path("/root/reference/test_data")
    bls, _ = read_uvh5(td / "vis-eor-fgs.uvh5")
    d = bls[0].vis + np.load(td / "0-1" / "noise.npy")
    noise_cov = np.load(td / "0-1" / "noise-cov.npy")
    fgmodes = np.load(td / "0-1" / "fgmodes.npy")[:, :12]
    eor_cov = np.load(td / "0-1" / "eor-cov.npy")
    n = d.shape[1]
    w = np.ones(n)
    ninv = 1.0 / np.diagonal(noise_cov)
    prior = np.zeros((2, n), dtype=np.float32)
    prior[0, n // 2 - 3: n // 2 + 4] = 2.0
    prior[1, n // 2 - 3: n // 2 + 4] = 0.1

    ops1 = rgibbs.build_chain_operators(d, w, fgmodes, ninv)
    mops, dims = mega.from_chain_operators(ops1)
    ptr = np.asarray(mops.pt_re).reshape(-1, *mops.pt_re.shape[-2:])[0][:n, :n]
    pti = np.asarray(mops.pt_im).reshape(-1, *mops.pt_im.shape[-2:])[0][:n, :n]

    ops_b = rgibbs.broadcast_chain_operators(ops1, 1)
    i = np.arange(n) - n // 2
    F = np.exp(-2j * np.pi * np.outer(i, i) / n)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None)
    ps_b = jnp.asarray(ps0, dtype=jnp.float32)[None]
    prior_j = jnp.asarray(prior)
    prior_idx = jnp.asarray(np.nonzero(np.any(prior > 0, axis=0))[0])

    niter = int(os.environ.get("PROBE_ITERS", "120"))
    _, samples = rgibbs.run_chain_jit(
        jax.random.key(3), ops_b, ps_b, prior_j, niter,
        False, 0.0, False, prior_idx, "auto", True,
    )
    ps_traj = np.asarray(samples.ps)[:, 0, :]      # (niter, n)

    deltas, gates = [], []
    e_prev = equilibrated_E(ps_traj[0], ptr, pti, n)
    for k in range(1, niter):
        e_new = equilibrated_E(ps_traj[k], ptr, pti, n)
        delta = np.linalg.norm(
            (e_new - e_prev) @ np.linalg.inv(e_prev), 2)
        p0, p1 = ps_traj[k - 1], ps_traj[k]
        rel = np.abs(p1 - p0) / (
            0.5 * (np.abs(p1) + np.abs(p0)) + 1e-6 * p0.max() + 1e-30)
        deltas.append(delta)
        gates.append(rel.max())
        e_prev = e_new
    deltas = np.array(deltas)
    gates = np.array(gates)
    print(f"delta  (NS seed):  median {np.median(deltas):.3f}  "
          f"p90 {np.percentile(deltas, 90):.3f}  max {deltas.max():.3f}")
    print(f"gate (max rel ps): median {np.median(gates):.3f}  "
          f"p90 {np.percentile(gates, 90):.3f}  max {gates.max():.3f}")
    for thr in (0.25, 0.5, 0.8, 1.2, 2.0):
        m = gates <= thr
        frac = m.mean()
        dmax = deltas[m].max() if m.any() else float("nan")
        print(f"  drift_max={thr:4.2f}: gate passes {100*frac:5.1f}%   "
              f"worst delta when passing = {dmax:.3f} "
              f"-> err after NS2 ~ {dmax**4:.2e}, NS3 ~ {dmax**8:.2e}")
    # correlation: is the cheap gate a faithful predictor of delta?
    order = np.argsort(gates)
    print(f"corr(gate, delta) = {np.corrcoef(gates, deltas)[0,1]:.3f}")


if __name__ == "__main__":
    main()
