"""On-device megachain (multi-iteration kernel) timing — same workload as
bench.py.

    PROF_K=20 PROF_BT=8 PROF_REFINE=1 python scripts/profile_megachain.py
"""
import os
import sys
import time
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

from hydra_pspec_tpu.models import mega, megachain

B = int(os.environ.get("PROF_B", "100"))
NITER = int(os.environ.get("PROF_ITERS", "20"))
REPS = int(os.environ.get("PROF_REPS", "5"))
STORE_CR = os.environ.get("PROF_STORE_CR", "1") == "1"
REFINE = int(os.environ.get("PROF_REFINE", "1"))
BT = int(os.environ.get("PROF_BT", "8"))
CHUNK = int(os.environ.get("PROF_K", str(NITER)))
INV_PASSES = int(os.environ.get("PROF_INV_PASSES", "3"))
WARM_NS = int(os.environ.get("PROF_WARM_NS", "0"))
DRIFT_MAX = float(os.environ.get("PROF_DRIFT", "0.25"))
PREFETCH = os.environ.get("PROF_PREFETCH", "1") == "1"


def main():
    print(f"backend={jax.default_backend()} megachain B={B} "
          f"store_cr={STORE_CR} refine={REFINE} bt={BT} chunk={CHUNK} "
          f"invp={INV_PASSES} warm={WARM_NS} drift={DRIFT_MAX} x{NITER}",
          flush=True)
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
    prior = np.zeros((2, n), dtype=np.float32)
    prior[0, n // 2 - 3: n // 2 + 4] = 2.0
    prior[1, n // 2 - 3: n // 2 + 4] = 0.1

    mops, dims = mega.build_mega_operators(d, w, fgmodes, ninv_diag)
    mops_b = mega.broadcast_mega_operators(mops, B)
    i = np.arange(n) - n // 2
    F = np.exp(-2j * np.pi * np.outer(i, i) / n)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None)
    ps_b = mega.pad_ps(
        jnp.broadcast_to(jnp.asarray(ps0, dtype=jnp.float32), (B, n)), dims)

    def once(rep):
        ps_f, samples = megachain.run_chain_megachain(
            jax.random.fold_in(jax.random.key(0), rep), mops_b, dims, ps_b,
            prior, NITER, store_cr=STORE_CR, refine=REFINE, batch_tile=BT,
            chunk=CHUNK, inv_passes=INV_PASSES, warm_ns=WARM_NS,
            drift_max=DRIFT_MAX, prefetch_rng=PREFETCH,
        )
        chi = float(jnp.mean(samples.chisq[-5:]))
        lnp = float(jnp.sum(samples.ln_post))
        return chi, lnp

    chi, _ = once(99)
    print(f"chi^2 sanity: {chi:.4f}", flush=True)
    ts = []
    for r in range(REPS):
        t0 = time.perf_counter()
        once(r)
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    print(f"megachain store_cr={STORE_CR} refine={REFINE} bt={BT} "
          f"chunk={CHUNK} invp={INV_PASSES} warm={WARM_NS}: "
          f"median {np.median(ts)*1e3/NITER:8.3f} ms/iter   "
          f"min {ts.min()*1e3/NITER:8.3f}", flush=True)


if __name__ == "__main__":
    main()
