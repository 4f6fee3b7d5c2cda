"""Benchmark: Gibbs iterations/s at 100 baselines on one chip, versus
the reference implementation's CPU speed (BASELINE.md: the reference
publishes no absolute numbers, so the same-hardware CPU measurement is
produced here with a faithful NumPy/SciPy implementation of the reference
algorithm — per-time preconditioned CG, per-iteration sqrtm/pinv, scipy
invgamma).

Prints the result as a JSON line (the LAST such line is the result):
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The headline metric and ``vs_baseline`` are the round-1..4 continuity
numbers: iterations/s with 100 baselines advancing together (sample
streaming on), and the ISO-CONCURRENCY ratio against 100 reference CPU
ranks — the BASELINE.json >= 50x north star. That line is printed and
flushed IMMEDIATELY after the core measurement, so a later timeout cannot
lose it. A time-boxed batch sweep then enriches ``detail`` with the
saturated baseline-iterations/s ceiling, small-batch (auto-K) points, the
analytic FLOP model, and MFU, and re-prints the full JSON as the final
line. Skipped sweep points are recorded in detail (no silent caps).
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

N_BASELINES = int(os.environ.get("BENCH_BASELINES", "100"))
# Timed chain length: long enough that the fixed ~25-30 ms axon dispatch
# round-trip is amortized to noise (real runs are Niter=1000; measuring
# steady-state throughput, not launch latency).
N_ITER = int(os.environ.get("BENCH_ITERS", "100"))
N_REPS = int(os.environ.get("BENCH_REPS", "5"))  # timed repetitions (median)
# Kernel-dispatch chunk (iterations per pallas_call): matches the runner's
# write_niter=100 production cadence; BENCH_ITERS > BENCH_CHUNK chains
# multiple async dispatches per timed rep, amortizing the fixed ~25-30 ms
# relay round-trip latency exactly the way a Niter=1000 production run does.
N_CHUNK = int(os.environ.get("BENCH_CHUNK", "100"))
CPU_CACHE = REPO / ".bench_cpu_baseline.json"


def load_problem():
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5

    td = Path("/root/reference/test_data")
    bls, _ = read_uvh5(td / "vis-eor-fgs.uvh5")
    d = bls[0].vis + np.load(td / "0-1" / "noise.npy")
    noise_cov = np.load(td / "0-1" / "noise-cov.npy")
    fgmodes = np.load(td / "0-1" / "fgmodes.npy")[:, :12]
    eor_cov = np.load(td / "0-1" / "eor-cov.npy")
    nfreqs = d.shape[1]
    w = np.ones(nfreqs)
    ninv_diag = 1.0 / np.diagonal(noise_cov)
    prior = np.zeros((2, nfreqs))
    prior[0, nfreqs // 2 - 3 : nfreqs // 2 + 4] = 2.0
    prior[1, nfreqs // 2 - 3 : nfreqs // 2 + 4] = 0.1
    return d, w, fgmodes, eor_cov, ninv_diag, prior


def measure_reference_cpu(d, w, fgmodes, eor_cov, ninv_diag, prior, niters=5):
    """Seconds per Gibbs iteration for ONE baseline with the reference
    algorithm (build_matrices + per-time CG + bandpower draw + diagnostics).
    """
    import reference_impl as ref
    from scipy.stats import invgamma

    nfreqs = d.shape[1]
    rng = np.random.default_rng(0)
    F = ref.fourier_operator(nfreqs)
    S = eor_cov.copy()
    d_w = d * w
    times = []
    for it in range(niters):
        t0 = time.perf_counter()
        mats = ref.build_matrices(w, S, np.diag(ninv_diag), fgmodes)
        ntimes = d.shape[0]
        oa = (rng.standard_normal((ntimes, nfreqs)) + 1j * rng.standard_normal((ntimes, nfreqs))) / np.sqrt(2)
        ob = (rng.standard_normal((ntimes, nfreqs)) + 1j * rng.standard_normal((ntimes, nfreqs))) / np.sqrt(2)
        signal_cr, fg_amps = ref.gcr_solve_cg(mats, fgmodes, d_w, oa, ob)
        beta, alpha = ref.sample_S_beta_alpha(signal_cr)
        ps = np.empty(nfreqs)
        for k in range(nfreqs):
            if prior[0, k] > 0 or prior[1, k] > 0:
                ps[k] = ref.truncated_invgamma_oracle(
                    rng.uniform(), alpha + 1, beta[k], prior[1, k], prior[0, k]
                )
            else:
                ps[k] = invgamma.rvs(a=alpha, random_state=rng) * beta[k]
        _chisq, _lnp = ref.chisq_and_lnpost(
            d_w, w, signal_cr, fg_amps, fgmodes, np.diag(ninv_diag), ps
        )
        S = ref.covariance_from_pspec(ps / nfreqs**2, F)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def get_cpu_baseline(problem, niters=5):
    """Reference s/iter, cached with provenance (host, timestamp, niters).
    Caches with fewer than ``niters`` timed iterations are remeasured —
    the denominator of the headline number should not rest on 2 samples."""
    if CPU_CACHE.exists() and not os.environ.get("BENCH_REMEASURE"):
        cache = json.loads(CPU_CACHE.read_text())
        if cache.get("niters", 0) >= niters:
            return cache["sec_per_iter"]
    sec = measure_reference_cpu(*problem, niters=niters)
    CPU_CACHE.write_text(json.dumps({
        "sec_per_iter": sec,
        "niters": niters,
        "host": os.uname().nodename,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }))
    return sec


def flop_model(dims, warm_ns=3, refine=1):
    """Analytic per-chain-per-iteration FLOP counts for the megachain
    kernel, from its actual matmul shapes (ops/pallas/megastep._draw_body +
    megachain NS warm start).

    ``executed``: bf16 MXU flops the hardware actually multiplies — every
    complex matmul is Gauss 3-mult with 3-pass bf16 splitting (9 passes),
    the solve/refine are 3-pass (_bmm), the Newton-Schulz refresh is
    1-pass (_bmm1, 2 matmuls per step), all at the PADDED dims. Steady
    state (the k=0 exact inverse rebuild is amortized over the chunk).

    ``algorithmic``: the complex-arithmetic minimum of the same Gibbs draw
    at the TRUE dims (8abc per complex matmul; inverse application instead
    of factorization, which is amortized) — the "useful" numerator.
    """
    n, t, m = dims.n, dims.t, dims.m
    n2 = 2 * n

    def cmm(a, b, c):          # Gauss 3-mult complex, 3-pass bf16 each
        return 9 * 2 * a * b * c

    executed = (
        cmm(m, n, t) + cmm(n, m, t)        # FG Schur reduce: ba, gb
        + cmm(n, n, t)                     # delay RHS: F @ rc
        + warm_ns * 2 * (2 * n2 ** 3)      # NS refresh (2x 1-pass per step)
        + (3 + 6 * refine) * (2 * n2 * n2 * t)  # solve + refinement
        + cmm(n, n, t)                     # back-transform: F^H @ sk
        + cmm(m, m, t) + cmm(m, n, t)      # amps: maa_inv b_a, G^H sig
        + cmm(n, m, t)                     # residual: Fg @ da
    )
    nf, nt, mm = dims.nfreqs, dims.ntimes, dims.nmodes

    def zmm(a, b, c):          # complex matmul, algorithmic count
        return 8 * a * b * c

    algorithmic = (
        zmm(mm, nf, nt) + zmm(nf, mm, nt)
        + 2 * zmm(nf, nf, nt)              # F rc, F^H sk
        + zmm(nf, nf, nt)                  # apply system inverse
        + zmm(mm, mm, nt) + zmm(mm, nf, nt) + zmm(nf, mm, nt)
    )
    return {"executed": int(executed), "algorithmic": int(algorithmic)}


# TPU v5e (v5 lite) peak dense bf16 matmul throughput per chip.
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12


def measure_sweep(problem, deadline=None):
    """Batch sweep of the compute core (store_cr=False: the bandpower
    stream is kept; CR sample streaming excluded — the saturation number).
    Returns ({B: {"ms_per_iter", "baseline_iters_per_s", "k_chunk"}},
    skipped, dims, warm_ns). B=200/400 use K=50 per dispatch to fit the
    kernel's per-iteration HBM outputs; B=4/16 use the production auto-K
    (models/megachain.auto_chunk — the small-batch dispatch-amortization
    path validation runs take). Points run in priority order (saturation
    first) and any point not started before ``deadline`` (time.monotonic)
    is skipped and reported — cold Mosaic compiles are 5-20 min each and
    must not starve the driver of the core result."""
    import jax
    import jax.numpy as jnp

    from hydra_pspec_tpu.models import mega, megachain, rgibbs
    import reference_impl as ref

    d, w, fgmodes, eor_cov, ninv_diag, prior = problem
    n = d.shape[1]
    ops1 = rgibbs.build_chain_operators(d, w, fgmodes, ninv_diag,
                                        dtype=jnp.float32)
    mops1, dims = mega.from_chain_operators(ops1)
    F = ref.fourier_operator(n)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None
                  ).astype(np.float32)
    warm_ns = int(os.environ.get("BENCH_WARM_NS", "3"))
    drift_max = float(os.environ.get("BENCH_DRIFT", "0.6"))
    points = {}
    skipped = []
    # priority order: saturation ceiling first, then the B=100 lean
    # continuity point, then the small-batch (auto-K) story, then B=200.
    # All points use K=auto_chunk (>= 100 iterations per Pallas program —
    # lean outputs are tiny, so nothing binds K at 50 any more) and time
    # niter = 2K so the ~27 ms dispatch round-trip amortizes across
    # chained async dispatches the way a production Niter>=1000 run does
    # (at the r4 K=50 sizing that overhead inflated B=400 by ~10%).
    plan = []
    for B in (400, 100, 4, 16, 200):
        k = megachain.auto_chunk(B * 1000, B, dims, False)
        plan.append((B, k))
    for B, k in plan:
        if deadline is not None and time.monotonic() > deadline:
            skipped.append(B)
            print(f"[bench] sweep B={B}: SKIPPED (time budget spent)",
                  file=sys.stderr)
            continue
        niter = 2 * k  # two chained async dispatches per timed rep
        mops_b = mega.broadcast_mega_operators(mops1, B)
        ps_b = mega.pad_ps(jnp.broadcast_to(jnp.asarray(ps0), (B, n)), dims)

        def once(rep):
            _, samples = megachain.run_chain_megachain(
                jax.random.fold_in(jax.random.key(0), rep), mops_b, dims,
                ps_b, prior, niter, store_cr=False, refine=1, batch_tile=8,
                chunk=k, warm_ns=warm_ns, drift_max=drift_max)
            return float(jnp.mean(samples.chisq[-5:]))

        once(99)  # compile
        walls = []
        for rep in range(3):
            t0 = time.perf_counter()
            once(rep)
            walls.append(time.perf_counter() - t0)
        sec = float(np.median(walls)) / niter
        points[B] = {
            "ms_per_iter": round(sec * 1e3, 4),
            "baseline_iters_per_s": round(B / sec, 1),
            "k_chunk": k,
        }
        print(f"[bench] sweep B={B} (K={k}): {sec * 1e3:.3f} ms/iter, "
              f"{B / sec:,.0f} baseline-iters/s", file=sys.stderr)
    return points, skipped, dims, warm_ns


def measure_ours(problem, n_baselines=N_BASELINES, niter=N_ITER):
    """Time the real-pair (TPU) engine on a batch of baselines."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax
    import jax.numpy as jnp

    # persistent compile cache: remote Pallas compiles take 5-8 min and
    # occasionally hang — a warm cache sidesteps both across invocations
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from hydra_pspec_tpu.models import rgibbs
    import reference_impl as ref

    d, w, fgmodes, eor_cov, ninv_diag, prior = problem
    solver = os.environ.get("BENCH_SOLVER", "auto")
    # The bench measures the engine the runner's auto-selection gives real
    # users on this backend (megachain on TPU: K Gibbs iterations per
    # Pallas program, in-kernel bandpower conditional + per-chain PRNG).
    # BENCH_ENGINE overrides for experiments only.
    from hydra_pspec_tpu.runner import select_engine

    auto_engine = select_engine("auto")
    engine = os.environ.get("BENCH_ENGINE", auto_engine)
    if "BENCH_ENGINE" not in os.environ:
        assert engine == auto_engine, (engine, auto_engine)
    if engine == "megachain" and jax.default_backend() != "tpu":
        # the megachain in-kernel PRNG is hardware-only (the plain HLO
        # interpreter has no prng_seed); CPU benching uses the real engine
        print("[bench] no TPU backend — falling back to BENCH_ENGINE=real",
              file=sys.stderr)
        engine = "real"
    dtype = jnp.float32
    ops1 = rgibbs.build_chain_operators(d, w, fgmodes, ninv_diag, dtype=dtype)
    # initial ps from the covariance — host-side numpy (the TPU backend has
    # no complex support; all complex prep stays on the host)
    n = d.shape[1]
    F = ref.fourier_operator(n)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None).astype(np.float32)

    prior_j = jnp.asarray(prior, dtype=jnp.float32)
    prior_idx = jnp.asarray(np.nonzero(np.any(prior > 0, axis=0))[0])
    all_unflagged = bool(np.all(w == 1))

    if engine == "megachain":
        from hydra_pspec_tpu.models import mega, megachain

        mops1, dims = mega.from_chain_operators(ops1)
        mops_b = mega.broadcast_mega_operators(mops1, n_baselines)
        ps_b = mega.pad_ps(
            jnp.broadcast_to(jnp.asarray(ps0), (n_baselines, n)), dims)
        refine = int(os.environ.get("BENCH_REFINE", "1"))
        bt = int(os.environ.get("BENCH_BT", "8"))
        # Newton-Schulz warm start of the VMEM-carried inverse: 2.45 ms/iter
        # vs 6.07 with the exact per-iteration rebuild (measured 2026-08-17);
        # drift gate sized by scripts/probe_ns_drift.py (worst NS seed
        # delta 0.26 -> solve error ~2e-5 after NS3 + exact refinement).
        warm_ns = int(os.environ.get("BENCH_WARM_NS", "3"))
        drift_max = float(os.environ.get("BENCH_DRIFT", "0.6"))

        def once(rep, it):
            ps_f, samples = megachain.run_chain_megachain(
                jax.random.fold_in(jax.random.key(0), rep), mops_b, dims,
                ps_b, prior, it, store_cr=True, refine=refine,
                batch_tile=bt, chunk=min(it, N_CHUNK), warm_ns=warm_ns,
                drift_max=drift_max,
            )
            chi = float(jnp.mean(samples.chisq[-5:]))
            lnp = float(jnp.sum(samples.ln_post))
            return chi, lnp
    elif engine == "mega":
        from hydra_pspec_tpu.models import mega

        mops1, dims = mega.from_chain_operators(ops1)
        mops_b = mega.broadcast_mega_operators(mops1, n_baselines)
        ps_b = mega.pad_ps(
            jnp.broadcast_to(jnp.asarray(ps0), (n_baselines, n)), dims)
        prior_pad = jnp.zeros((2, dims.n), dtype=jnp.float32).at[:, :n].set(
            prior_j)
        ink = os.environ.get("BENCH_INKERNEL_RNG", "1") == "1"
        refine = int(os.environ.get("BENCH_REFINE", "1"))
        bt = int(os.environ.get("BENCH_BT", "8"))

        def once(rep, it):
            ps_f, samples = mega.run_chain_mega_jit(
                jax.random.fold_in(jax.random.key(0), rep), mops_b, dims,
                ps_b, prior_pad, it, store_cr=True, prior_idx=prior_idx,
                refine=refine, batch_tile=bt, inkernel_rng=ink,
            )
            chi = float(jnp.mean(samples.chisq[-5:]))
            lnp = float(jnp.sum(samples.ln_post))
            return chi, lnp
    else:
        ops_b = rgibbs.broadcast_chain_operators(ops1, n_baselines)
        ps_b = jnp.broadcast_to(jnp.asarray(ps0), (n_baselines, n))
        fn = rgibbs.run_chain_jit

        def once(rep, it):
            ps_f, samples = fn(
                jax.random.fold_in(jax.random.key(0), rep), ops_b, ps_b,
                prior_j, it, False, 0.0, True, prior_idx, solver,
                all_unflagged,
            )
            # Force full dependency chain: block_until_ready on this
            # backend's remote buffers can return before execution completes.
            chi = float(jnp.mean(samples.chisq[-5:]))
            lnp = float(jnp.sum(samples.ln_post))
            return chi, lnp

    once(98, niter)  # compile + warm the timed executable outside the timing
    # The remote dispatch path adds tens of ms of per-call jitter (the r1
    # driver run measured 91 iter/s vs the builder's 148 on the same code)
    # — take the median of N_REPS timed calls.
    walls = []
    chi = float("nan")
    for rep in range(N_REPS):
        t0 = time.perf_counter()
        chi, _ = once(rep, niter)
        walls.append(time.perf_counter() - t0)
    wall = float(np.median(walls))

    assert np.isfinite(chi), "non-finite chi^2 in bench run"
    print(f"[bench] chi^2 sanity: {chi:.4f} (want ~1)", file=sys.stderr)
    print(f"[bench] rep walls (s): {[round(w, 3) for w in walls]}",
          file=sys.stderr)
    return wall / niter, chi, walls, engine, auto_engine


def main():
    t_start = time.monotonic()
    problem = load_problem()
    print(f"[bench] measuring reference CPU baseline...", file=sys.stderr)
    ref_sec_per_iter = get_cpu_baseline(problem)
    print(f"[bench] reference: {ref_sec_per_iter:.3f} s/iter (1 baseline, CPU)",
          file=sys.stderr)

    print(f"[bench] measuring ours: {N_BASELINES} baselines x {N_ITER} iters...",
          file=sys.stderr)
    sec_per_iter, chi, walls, engine, auto_engine = measure_ours(problem)
    ours_its = 1.0 / sec_per_iter            # iterations/s with all baselines advancing
    ref_its = 1.0 / ref_sec_per_iter         # reference: 100 ranks advance together
    cpu_cache = json.loads(CPU_CACHE.read_text()) if CPU_CACHE.exists() else {}
    detail = {
        "ref_cpu_sec_per_iter_1bl": round(ref_sec_per_iter, 4),
        "ref_cpu_niters": cpu_cache.get("niters"),
        "ref_cpu_host": cpu_cache.get("host"),
        "ours_sec_per_iter_batch": round(sec_per_iter, 4),
        "gibbs_iterations_per_s_100bl": round(ours_its, 3),
        "vs_100rank": round(ours_its / ref_its, 2),
        "baseline_iters_per_s_100bl_store_cr": round(ours_its * N_BASELINES, 1),
        "chisq_sanity": round(chi, 4),
        "niter": N_ITER,
        "engine": engine,
        "auto_engine": auto_engine,
        "rep_walls_s": [round(w, 3) for w in walls],
    }
    # Headline = the round-1..4 continuity metric: iterations/s at 100
    # baselines with sample streaming, vs_baseline = the iso-concurrency
    # 100-rank ratio (the BASELINE.json >= 50x north star). Printed and
    # FLUSHED before the sweep so a sweep timeout can never lose it — the
    # last JSON line on stdout wins.
    result = {
        "metric": f"gibbs_iterations_per_s_{N_BASELINES}bl_1chip",
        "value": round(ours_its, 3),
        "unit": "iter/s",
        "vs_baseline": round(ours_its / ref_its, 2),
        "detail": detail,
    }
    print(json.dumps(result), flush=True)

    # Time-boxed enrichment sweep: saturation ceiling, small-batch auto-K
    # points, FLOP model + MFU — appended to detail, same headline.
    do_sweep = (engine == "megachain"
                and os.environ.get("BENCH_SWEEP", "1") == "1")
    if do_sweep:
        budget = float(os.environ.get("BENCH_SWEEP_BUDGET", "900"))
        deadline = t_start + budget
        sweep, skipped, dims, warm_ns = measure_sweep(problem, deadline)
        if sweep:
            peak_b = max(sweep,
                         key=lambda b: sweep[b]["baseline_iters_per_s"])
            peak = sweep[peak_b]["baseline_iters_per_s"]
            flops = flop_model(dims, warm_ns=warm_ns)
            detail.update({
                "batch_sweep_store_cr0": {str(b): v for b, v in sweep.items()},
                "batch_sweep_skipped": skipped,
                "small_batch": {
                    str(b): sweep[b] for b in (4, 16) if b in sweep},
                "peak_baseline_iters_per_s": peak,
                "peak_at_baselines": peak_b,
                "vs_baseline_rank_equivalents": round(
                    peak * ref_sec_per_iter, 1),
                "flops_per_iter": flops["executed"],
                "flops_per_iter_note": (
                    "executed bf16 MXU flops per chain-iteration from the "
                    "kernel's matmul shapes (padded dims n=%d t=%d m=%d; Gauss "
                    "3-mult complex x 3-pass bf16 split, NS warm start %d, "
                    "refine 1); algorithmic complex-arithmetic minimum at true "
                    "dims = %d" % (dims.n, dims.t, dims.m, warm_ns,
                                   flops["algorithmic"])),
                "algorithmic_flops_per_iter": flops["algorithmic"],
                "mfu": round(peak * flops["executed"] / PEAK_FLOPS, 4),
                "mfu_algorithmic": round(
                    peak * flops["algorithmic"] / PEAK_FLOPS, 4),
                "peak_flops_assumed": PEAK_FLOPS,
            })
            result["detail"] = detail
            print(json.dumps(result), flush=True)


def _supervise():
    """Watchdog wrapper: the axon remote compiler occasionally hangs
    indefinitely; run the measurement in a child process with a timeout
    and retry so an unattended bench invocation still produces its JSON
    line. The child streams stdout to a file as it goes (the core-result
    line is flushed before the enrichment sweep), so even a timed-out
    attempt yields its last completed JSON line.
    """
    import subprocess
    import tempfile

    # The core result prints within a few cold compiles; keep each attempt
    # well inside the driver's budget — the persistent cache at
    # /root/.jax_cache makes warmed runs complete in a couple of minutes.
    timeout_s = int(os.environ.get("BENCH_TIMEOUT", "1100"))
    best = None
    for attempt in range(2):
        env = dict(os.environ, BENCH_CHILD="1")
        with tempfile.NamedTemporaryFile("w+", suffix=".bench.out") as out:
            timed_out = False
            proc = subprocess.Popen(
                [sys.executable, __file__], env=env,
                stdout=out, stderr=sys.stderr,
            )
            try:
                rc = proc.wait(timeout=timeout_s)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                rc = -9
                timed_out = True
            out.seek(0)
            lines = [l for l in out.read().splitlines()
                     if l.startswith("{")]
        if lines:
            best = lines[-1]
        if rc == 0 and lines:
            print(best)
            return 0
        print(f"[bench] attempt {attempt + 1} "
              f"{'timed out after %ds' % timeout_s if timed_out else 'failed (rc=%d)' % rc}"
              f"{' — partial result captured' if lines else ''}",
              file=sys.stderr)
        if best is not None:
            break  # a real measurement exists; don't burn time retrying
    if best is not None:
        print(best)
        return 0
    print(json.dumps({
        "metric": f"gibbs_iterations_per_s_{N_BASELINES}bl_1chip",
        "value": 0.0, "unit": "iter/s", "vs_baseline": 0.0,
        "detail": {"error": "all bench attempts timed out/failed"},
    }))
    return 1


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD"):
        main()
    else:
        sys.exit(_supervise())
