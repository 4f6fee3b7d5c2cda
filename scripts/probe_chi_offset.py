"""CPU bisection of the mega-path chi^2 offset (1.0145 vs 1.000 for the
real engine): run the mega kernel (interpret mode, exact f32 matmuls)
with XLA randomness and the real engine on the SAME data, and compare
equilibrium chi^2. If the offset reproduces on CPU it is deterministic
math in the mega operator assembly/statistics, not hardware precision.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_chi_offset.py
"""
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


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

    B = int(os.environ.get("PROBE_B", "2"))
    niter = int(os.environ.get("PROBE_ITERS", "120"))
    burn = int(os.environ.get("PROBE_BURN", "40"))

    ops1 = rgibbs.build_chain_operators(d, w, fgmodes, ninv)
    i = np.arange(n) - n // 2
    F = np.exp(-2j * np.pi * np.outer(i, i) / n)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None)
    prior_j = jnp.asarray(prior)
    prior_idx = jnp.asarray(np.nonzero(np.any(prior > 0, axis=0))[0])

    # --- real engine -----------------------------------------------------
    ops_b = rgibbs.broadcast_chain_operators(ops1, B)
    ps_b = jnp.broadcast_to(jnp.asarray(ps0, jnp.float32), (B, n))
    _, s_real = rgibbs.run_chain_jit(
        jax.random.key(11), ops_b, ps_b, prior_j, niter,
        False, 0.0, False, prior_idx, "auto", True,
    )
    chi_real = float(np.asarray(s_real.chisq)[burn:].mean())

    # --- mega engine (interpret kernel, XLA randomness) -------------------
    mops1, dims = mega.from_chain_operators(ops1)
    mops_b = mega.broadcast_mega_operators(mops1, B)
    ps_pad = mega.pad_ps(ps_b, dims)
    prior_pad = jnp.zeros((2, dims.n), jnp.float32).at[:, :n].set(prior_j)
    _, s_mega = mega.run_chain_mega_jit(
        jax.random.key(11), mops_b, dims, ps_pad, prior_pad, niter,
        store_cr=False, prior_idx=prior_idx, inkernel_rng=False,
        batch_tile=2,
    )
    chi_mega = float(np.asarray(s_mega.chisq)[burn:].mean())

    se = 0.009 / np.sqrt((niter - burn) * B)  # per-iter chi sd ~ 0.9%
    print(f"real engine chi^2 (post-burn mean): {chi_real:.5f}")
    print(f"mega engine chi^2 (post-burn mean): {chi_mega:.5f}")
    print(f"MC se ~ {se:.5f}; delta = {chi_mega - chi_real:+.5f} "
          f"({(chi_mega - chi_real) / se:+.1f} se)")


if __name__ == "__main__":
    main()
