"""On-device accuracy gate for the 1-pass-bf16 inverse build: relative
residual ||Ex - b|| / ||b|| on the REAL GCR system (the equilibrated
embedded E from the bench problem) for (inv_passes, refine) combinations.

    python scripts/probe_invp_accuracy.py
"""
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from hydra_pspec_tpu.models import rgibbs
from hydra_pspec_tpu.ops import cplx
from hydra_pspec_tpu.ops.pallas import spd_inv

B = int(os.environ.get("PROBE_B", "16"))


def main():
    td = Path("/root/reference/test_data")
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5
    bls, _ = read_uvh5(td / "vis-eor-fgs.uvh5")
    d = bls[0].vis + np.load(td / "0-1" / "noise.npy")
    noise_cov = np.load(td / "0-1" / "noise-cov.npy")
    fgmodes = np.load(td / "0-1" / "fgmodes.npy")[:, :12]
    eor_cov = np.load(td / "0-1" / "eor-cov.npy")
    n = d.shape[1]
    w = np.ones(n)
    ninv_diag = 1.0 / np.diagonal(noise_cov)
    ops = rgibbs.build_chain_operators(d, w, fgmodes, ninv_diag,
                                       dtype=jnp.float32)
    i = np.arange(n) - n // 2
    F = np.exp(-2j * np.pi * np.outer(i, i) / n)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None)

    # build the equilibrated embedded system exactly as gcr_solve does
    ps = jnp.asarray(np.broadcast_to(ps0, (B, n)), jnp.float32)
    dd = jnp.sqrt(jnp.clip(ps, 0.0, None) / n)
    pt = ops.p_tilde
    s_u = cplx.C(
        dd[:, :, None] * pt.re * dd[:, None, :] + jnp.eye(n, dtype=jnp.float32),
        dd[:, :, None] * pt.im * dd[:, None, :],
    )
    rng = np.random.default_rng(0)
    b = cplx.C(
        jnp.asarray(rng.standard_normal((B, n, 203)), jnp.float32),
        jnp.asarray(rng.standard_normal((B, n, 203)), jnp.float32),
    )

    for invp, refine in [(3, 1), (1, 0), (1, 1), (1, 2)]:
        x = spd_inv.hermitian_solve_pallas2(
            s_u, b, refine=refine, inv_passes=invp)
        r_re = (cplx.matmul(s_u, x).re - b.re)
        r_im = (cplx.matmul(s_u, x).im - b.im)
        num = float(jnp.sqrt(jnp.sum(r_re**2 + r_im**2)))
        den = float(jnp.sqrt(jnp.sum(b.re**2 + b.im**2)))
        print(f"invp={invp} refine={refine}: rel resid {num/den:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
