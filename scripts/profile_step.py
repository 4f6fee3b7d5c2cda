"""On-device breakdown of one Gibbs iteration: full step, solve kernel
alone, and solve kernel at reduced RHS width (factor-vs-substitution
split). Run on the TPU (sole claimant):

    python scripts/profile_step.py

Timing convention per ROADMAP: force a scalar transfer — block_until_ready
on this backend can return before remote execution completes.
"""
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from hydra_pspec_tpu.models import rgibbs
from hydra_pspec_tpu.ops import cplx
from hydra_pspec_tpu.ops.pallas import spd_solve

B = int(os.environ.get("PROF_B", "100"))
NITER = int(os.environ.get("PROF_ITERS", "20"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(name, fn, reps=REPS):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts)
    print(f"{name:40s} median {np.median(ts)*1e3:9.2f} ms   "
          f"min {ts.min()*1e3:9.2f}   max {ts.max()*1e3:9.2f}", flush=True)
    return float(np.median(ts))


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    td = Path("/root/reference/test_data")
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5
    bls, _ = read_uvh5(td / "vis-eor-fgs.uvh5")
    d = bls[0].vis + np.load(td / "0-1" / "noise.npy")
    noise_cov = np.load(td / "0-1" / "noise-cov.npy")
    fgmodes = np.load(td / "0-1" / "fgmodes.npy")[:, :12]
    eor_cov = np.load(td / "0-1" / "eor-cov.npy")
    n = d.shape[1]
    ntimes = d.shape[0]
    w = np.ones(n)
    ninv_diag = 1.0 / np.diagonal(noise_cov)
    prior = np.zeros((2, n), dtype=np.float32)
    prior[0, n // 2 - 3 : n // 2 + 4] = 2.0
    prior[1, n // 2 - 3 : n // 2 + 4] = 0.1

    ops1 = rgibbs.build_chain_operators(d, w, fgmodes, ninv_diag)
    ops_b = rgibbs.broadcast_chain_operators(ops1, B)
    i_idx = np.arange(n) - n // 2
    F = np.exp(-2j * np.pi * np.outer(i_idx, i_idx) / n)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None).astype(np.float32)
    ps_b = jnp.broadcast_to(jnp.asarray(ps0), (B, n))
    prior_j = jnp.asarray(prior)
    prior_idx = jnp.asarray(np.nonzero(np.any(prior > 0, axis=0))[0])

    key = jax.random.key(0)

    # ---- full step (as bench measures it) -------------------------------
    def full(niter=NITER, store_cr=True, solver="pallas"):
        ps_f, samples = rgibbs.run_chain_jit(
            key, ops_b, ps_b, prior_j, niter, False, 0.0, store_cr,
            prior_idx, solver, True)
        return sync(samples.ln_post)

    t_full = timeit(f"full step x{NITER} (store_cr)", lambda: full()) / NITER
    t_full_nocr = timeit(f"full step x{NITER} (no cr)",
                         lambda: full(store_cr=False)) / NITER
    print(f"  -> per-iter: store_cr {t_full*1e3:.3f} ms, "
          f"no-cr {t_full_nocr*1e3:.3f} ms", flush=True)

    # ---- solve kernel alone --------------------------------------------
    dd = jnp.sqrt(jnp.clip(ps_b, 0.0, None) / n)
    outer = dd[:, :, None] * dd[:, None, :]
    s_u = cplx.C(outer * ops_b.p_tilde.re + jnp.eye(n, dtype=jnp.float32),
                 outer * ops_b.p_tilde.im)
    kb = jax.random.split(key, 2)
    rhs = cplx.standard_normal(kb[0], (B, n, ntimes))

    e = cplx.embed_hermitian(s_u)        # (B, 2n, 2n)
    r = cplx.embed_rhs(rhs)              # (B, 2n, ntimes)
    e = jax.device_put(e)
    r = jax.device_put(r)

    solve_full = jax.jit(lambda e, r: spd_solve.spd_factor_solve(e, r))
    timeit("spd_factor_solve K=203", lambda: sync(solve_full(e, r)))

    r1 = r[:, :, :1]
    solve_k1 = jax.jit(lambda e, r: spd_solve.spd_factor_solve(e, r))
    timeit("spd_factor_solve K=1 (factor cost)",
           lambda: sync(solve_k1(e, r1)))

    # ---- gcr_solve without the solve (XLA rest of the draw) -------------
    oa = cplx.standard_normal(kb[0], (B, ntimes, n))
    ob = cplx.standard_normal(kb[1], (B, ntimes, n))

    def rest():
        rc = ops_b.ni_d + cplx.C(ops_b.nih_diag[:, None, :] * ob.re,
                                 ops_b.nih_diag[:, None, :] * ob.im)
        rc_t = rgibbs._t(rc)
        b_a = cplx.matmul(ops_b.fg.adjoint(), rc_t)
        rc_red = rc_t - cplx.matmul(ops_b.g_mat, b_a)
        frc = cplx.matmul(ops_b.f, rc_red)
        b_u = cplx.C(dd[:, :, None] * frc.re, dd[:, :, None] * frc.im)
        u = b_u  # pretend-solve
        sk_t = cplx.C(dd[:, :, None] * u.re, dd[:, :, None] * u.im)
        finv = cplx.C(ops_b.f.re.T / n, -ops_b.f.im.T / n)
        sig_t = cplx.matmul(finv, sk_t)
        amps_t = cplx.matmul(ops_b.maa_inv, b_a) - cplx.matmul(
            ops_b.g_mat.adjoint(), sig_t)
        return sig_t, amps_t, sk_t

    rest_j = jax.jit(rest)
    timeit("gcr rest (no solve, XLA ops)", lambda: sync(rest_j()))

    # ---- RNG cost -------------------------------------------------------
    rng_j = jax.jit(lambda k: cplx.standard_normal(k, (B, ntimes, n)))
    timeit("standard_normal (B,T,n)", lambda: sync(rng_j(kb[0])))


if __name__ == "__main__":
    main()
