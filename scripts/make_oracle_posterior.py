"""Generate the committed long-run ORACLE posterior for MC-error-aware
acceptance (VERDICT r3 item 1).

Runs the reference-semantics NumPy Gibbs sampler (tests/reference_impl.py
— the independent oracle of /root/reference/hydra_pspec/pspec.py:377-490)
for many long chains on the bundled EoR+FG data, both unflagged and with
the RFI-flag pattern used by the hardware validation runs, and writes
per-delay-bin posterior statistics with Monte-Carlo error estimates:

    mean/sd/ESS of log(bandpower)  -> z-comparison denominator
    q5/q50/q95 of bandpower        -> CI-overlap check
    split-Rhat                     -> convergence gate on the oracle itself

scripts/validate_posterior.py compares the production engines against this
artifact with an ESS-scaled per-bin z bound instead of the former loose
truth-bracketing window (the reference's own acceptance is by-eye,
test_data/README.md:36-49; this is its quantitative replacement).

Two exact algebraic shortcuts are used for speed; both are mathematically
identical to the reference's operations (verified in tests/test_oracle.py):
  * sqrtm(S) = F^H diag(sqrt(ps)/n^1.5) F because S = F^H diag(ps/n^2) F
    and F F^H = n I (reference rebuilds S this way each iteration,
    pspec.py:313-322,464, then Schur-sqrtms it at :359)
  * Ni = w*Ninv*w is iteration-constant and diagonal in every shipped
    configuration, so Nih = diag(sqrt(Ni)) is computed once
    (reference recomputes both sqrtms every iteration, :359-362).

Usage:
    python scripts/make_oracle_posterior.py [--niter 2000] [--nchains 4]
Writes tests/oracle_posterior.json.
"""
import argparse
import json
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

# One BLAS thread per worker: this host's OpenBLAS thread pool thrashes on
# small LAPACK calls (measured 0.4 s vs 0.7 ms for a 132x132 dgesv), and the
# chains already saturate the cores one-per-worker.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

FLAG_CHANNELS = "12,30-33,77-79,100"  # matches validate_posterior flagged run


def parse_flags(spec, nfreqs):
    w = np.ones(nfreqs)
    if spec:
        for part in spec.split(","):
            if "-" in part:
                a, b = part.split("-")
                w[int(a): int(b) + 1] = 0
            else:
                w[int(part)] = 0
    return w


def load_problem(td):
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5

    bls, _ = read_uvh5(td / "vis-eor-fgs.uvh5")
    d = bls[0].vis + np.load(td / "0-1" / "noise.npy")
    noise_cov = np.load(td / "0-1" / "noise-cov.npy")
    fgmodes = np.load(td / "0-1" / "fgmodes.npy")[:, :12]
    eor_cov = np.load(td / "0-1" / "eor-cov.npy")
    nfreqs = d.shape[1]
    ninv = 1.0 / np.diagonal(noise_cov)
    prior = np.zeros((2, nfreqs))
    prior[0, nfreqs // 2 - 3: nfreqs // 2 + 4] = 2.0
    prior[1, nfreqs // 2 - 3: nfreqs // 2 + 4] = 0.1
    return d, ninv, fgmodes, eor_cov, prior


def oracle_step(d_w, ni_diag, fgmodes, F, Fh, ps, oa, ob):
    """One reference-semantics GCR draw for all times (pspec.py:219-228
    math with two exact algebraic shortcuts — see module docstring; the
    algebra is pinned against the brute reference forms in
    tests/test_oracle.py). Returns (signal_cr, fg_amps)."""
    n = d_w.shape[1]
    m = fgmodes.shape[1]
    fgH = fgmodes.conj().T
    # S and sqrtm(S) from current bandpowers (exact analytic forms)
    S = Fh @ (ps[:, None] / n**2 * F)
    Sh = Fh @ (np.sqrt(ps)[:, None] / n**1.5 * F)
    SNi = S * ni_diag[None, :]          # S @ diag(ni)
    SNih = S * np.sqrt(ni_diag)[None, :]
    # block A exactly as reference pspec.py:365-369
    A = np.zeros((n + m, n + m), dtype=complex)
    A[:n, :n] = np.eye(n) + SNi
    A[:n, n:] = SNi @ fgmodes
    A[n:, :n] = fgH * ni_diag[None, :]
    A[n:, n:] = (fgH * ni_diag[None, :]) @ fgmodes
    # GCR RHS for all times at once (same math as pspec.py:219-222)
    top = d_w @ SNi.T + oa @ Sh.T + ob @ SNih.T
    bot = (d_w * ni_diag[None, :] + ob * np.sqrt(ni_diag)[None, :]) @ fgmodes.conj()
    X = np.linalg.solve(A, np.concatenate([top, bot], axis=1).T)
    return X[:n].T, X[n:].T


def run_oracle_chain(seed, niter, d, w, ninv, fgmodes, eor_cov, prior):
    """One Gibbs chain with reference semantics; returns (ps, chisq_masked)
    where ps is (niter, nfreqs) bandpower samples and chisq_masked the
    per-iteration mean chi^2 over unflagged channels."""
    import reference_impl as ref

    nt, n = d.shape
    rng = np.random.default_rng(seed)
    F = ref.fourier_operator(n)
    Fh = F.conj().T
    d_w = d * w
    unflagged = w.astype(bool)
    # iteration-constant operators (Ninv diagonal in all shipped configs)
    ni_diag = ninv * w * w
    prior_on = (prior[0] > 0) | (prior[1] > 0)

    # initial S from the supplied covariance, like the driver
    # (run-hydra-pspec.py: sigcov0 = eor-cov.npy)
    ps = np.clip(np.diagonal(F @ eor_cov @ Fh).real, 1e-20, None)

    ps_out = np.empty((niter, n))
    chi_out = np.empty(niter)
    for it in range(niter):
        oa = (rng.standard_normal((nt, n)) + 1j * rng.standard_normal((nt, n))) / np.sqrt(2)
        ob = (rng.standard_normal((nt, n)) + 1j * rng.standard_normal((nt, n))) / np.sqrt(2)
        signal_cr, fg_amps = oracle_step(d_w, ni_diag, fgmodes, F, Fh, ps, oa, ob)
        # bandpower draw (pspec.py:67-127)
        beta, alpha = ref.sample_S_beta_alpha(signal_cr)
        new_ps = np.empty(n)
        for k in range(n):
            if prior_on[k]:
                new_ps[k] = ref.truncated_invgamma_oracle(
                    rng.uniform(), alpha + 1, beta[k], prior[1, k], prior[0, k])
            else:
                # invgamma(alpha, scale=beta) == beta / Gamma(alpha)
                new_ps[k] = beta[k] / rng.gamma(alpha)
        ps = new_ps
        ps_out[it] = ps
        model = signal_cr + fg_amps @ fgmodes.T
        chi = np.abs(d_w - model) ** 2 * ninv[None, :]
        chi_out[it] = chi[:, unflagged].mean()
    return ps_out, chi_out


def _worker(args):
    return run_oracle_chain(*args)


def posterior_stats(ps_chains, nburn):
    """ps_chains: (nchains, niter, nfreqs). Returns the per-bin statistics
    dict used by the acceptance comparison."""
    sys.path.insert(0, str(REPO))
    from hydra_pspec_tpu.runner import gelman_rubin
    from hydra_pspec_tpu.utils.mcstats import ess_geyer

    post = ps_chains[:, nburn:, :]                      # (m, nd, n)
    logp = np.log(post)
    mean_log = logp.mean(axis=(0, 1))
    sd_log = logp.reshape(-1, post.shape[2]).std(axis=0, ddof=1)
    ess = np.array([ess_geyer(logp[:, :, k]) for k in range(post.shape[2])])
    q5, q50, q95 = np.percentile(post.reshape(-1, post.shape[2]),
                                 [5, 50, 95], axis=0)
    rhat = gelman_rubin(post)
    return {
        "mean_log_ps": mean_log.round(6).tolist(),
        "sd_log_ps": sd_log.round(6).tolist(),
        "ess_log_ps": ess.round(1).tolist(),
        "q5_ps": [float(f"{v:.6g}") for v in q5],
        "q50_ps": [float(f"{v:.6g}") for v in q50],
        "q95_ps": [float(f"{v:.6g}") for v in q95],
        "split_rhat_max": round(float(np.nanmax(rhat)), 4),
        "split_rhat_median": round(float(np.nanmedian(rhat)), 4),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/root/reference/test_data")
    p.add_argument("--niter", type=int, default=2000)
    p.add_argument("--nburn", type=int, default=500)
    p.add_argument("--nchains", type=int, default=4)
    p.add_argument("--seed", type=int, default=20260820)
    p.add_argument("--out", default=str(REPO / "tests" / "oracle_posterior.json"))
    args = p.parse_args()

    td = Path(args.data)
    d, ninv, fgmodes, eor_cov, prior = load_problem(td)
    nfreqs = d.shape[1]

    # truth spectrum from the EoR-only visibilities (for the e2e ratio)
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5
    bls_e, _ = read_uvh5(td / "vis-eor.uvh5")
    ds = np.fft.fftshift(
        np.fft.fft(np.fft.ifftshift(bls_e[0].vis, axes=1), axis=1), axes=1)
    dps_true = (np.abs(ds) ** 2).mean(axis=0)

    out = {"provenance": {
        "generator": "scripts/make_oracle_posterior.py",
        "oracle": "tests/reference_impl.py (reference pspec.py semantics)",
        "niter": args.niter, "nburn": args.nburn, "nchains": args.nchains,
        "seed": args.seed,
        "data": "vis-eor-fgs.uvh5 + 0-1/{noise,noise-cov,fgmodes[:12],eor-cov}",
        "prior": "[0.1, 2] over the +-3 delay-0 bins (reference config.yaml)",
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }}

    draws_out = {}
    for case, flag_spec in (("unflagged", None), ("flagged", FLAG_CHANNELS)):
        w = parse_flags(flag_spec, nfreqs)
        t0 = time.perf_counter()
        jobs = [(args.seed + 1000 * c + (0 if flag_spec is None else 7),
                 args.niter, d, w, ninv, fgmodes, eor_cov, prior)
                for c in range(args.nchains)]
        with ProcessPoolExecutor(max_workers=args.nchains) as ex:
            results = list(ex.map(_worker, jobs))
        ps_chains = np.stack([r[0] for r in results])   # (m, niter, n)
        chi = np.stack([r[1] for r in results])
        stats = posterior_stats(ps_chains, args.nburn)
        stats["chisq_postburn_mean"] = round(
            float(chi[:, args.nburn:].mean()), 5)
        if flag_spec:
            stats["flag_channels"] = flag_spec
        # truth-ratio stats of the ORACLE itself (basis for the e2e bound)
        pwm = ps_chains[:, args.nburn:, :].mean(axis=(0, 1))
        edge = np.r_[0:40, 80:120]
        ratio = pwm[edge] / dps_true[edge]
        stats["edge_ratio_median"] = round(float(np.median(ratio)), 4)
        stats["edge_ratio_p5"] = round(float(np.percentile(ratio, 5)), 4)
        stats["edge_ratio_p95"] = round(float(np.percentile(ratio, 95)), 4)
        # sampling spread of the e2e acceptance statistic (the median edge
        # ratio of a 170-post-burn-draw window, tests/test_e2e.py) across
        # disjoint oracle windows -> the tightened e2e bound is derived
        # from THIS distribution instead of a guessed (0.85, 1.2) window
        wlen = 170
        post = ps_chains[:, args.nburn:, :]
        nwin = post.shape[1] // wlen
        wr = [
            float(np.median(
                post[c, i * wlen:(i + 1) * wlen].mean(axis=0)[edge]
                / dps_true[edge]))
            for c in range(post.shape[0]) for i in range(nwin)
        ]
        if wr:
            stats["e2e_window_ratio_median"] = {
                "window_len": wlen, "n_windows": len(wr),
                "min": round(min(wr), 4), "max": round(max(wr), 4),
                "p1": round(float(np.percentile(wr, 1)), 4),
                "p99": round(float(np.percentile(wr, 99)), 4),
            }
        stats["wall_s"] = round(time.perf_counter() - t0, 1)
        out[case] = stats
        # thinned draws sidecar for post-hoc statistics (float32, x10 thin)
        draws_out[case] = post[:, ::10, :].astype(np.float32)
        print(f"[oracle] {case}: rhat_max={stats['split_rhat_max']} "
              f"chisq={stats['chisq_postburn_mean']} "
              f"min_ess={min(stats['ess_log_ps']):.0f} "
              f"wall={stats['wall_s']}s", file=sys.stderr)

    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    np.savez_compressed(str(Path(args.out).with_suffix(".draws.npz")),
                        **draws_out)
    print(f"[oracle] wrote {args.out} (+ .draws.npz sidecar)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
