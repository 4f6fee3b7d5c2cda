"""Pin scripts/make_oracle_posterior.py's algebraic shortcuts against the
brute reference forms (tests/reference_impl.py, which mirrors
/root/reference/hydra_pspec/pspec.py:151-374 semantics).

The oracle chain replaces two O(n^3) reference operations with exact
closed forms:
  * sqrtm(S) = F^H diag(sqrt(ps)/n^1.5) F     (S = F^H diag(ps/n^2) F)
  * Nih = diag(sqrt(w^2 * ninv))              (Ni diagonal, iteration-const)
These tests prove "exact", so the long-run oracle posterior
(tests/oracle_posterior.json) is a valid acceptance target for the
production engines.
"""
import sys
from pathlib import Path

import numpy as np
import scipy.linalg

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

import reference_impl as ref
from make_oracle_posterior import oracle_step


def _problem(seed=0, n=24, nt=11, m=4, flag=True):
    rng = np.random.default_rng(seed)
    d = rng.standard_normal((nt, n)) + 1j * rng.standard_normal((nt, n))
    w = np.ones(n)
    if flag:
        w[[3, 4, 17]] = 0.0
    ninv = 1.0 / (0.5 + rng.uniform(size=n))
    fgmodes = np.linalg.qr(
        rng.standard_normal((n, m)) + 1j * rng.standard_normal((n, m))
    )[0]
    ps = np.exp(rng.standard_normal(n))
    return d, w, ninv, fgmodes, ps


def test_sqrtm_shortcut_is_exact():
    """F^H diag(sqrt(ps)/n^1.5) F is THE principal square root that the
    reference computes with scipy.linalg.sqrtm (pspec.py:359)."""
    _, _, _, _, ps = _problem(n=24)
    n = ps.shape[0]
    F = ref.fourier_operator(n)
    Fh = F.conj().T
    S = ref.covariance_from_pspec(ps / n**2, F)
    Sh_brute = scipy.linalg.sqrtm(S)
    Sh_fast = Fh @ (np.sqrt(ps)[:, None] / n**1.5 * F)
    np.testing.assert_allclose(Sh_fast, Sh_brute, atol=1e-10)
    # and it actually squares back to S
    np.testing.assert_allclose(Sh_fast @ Sh_fast, S, atol=1e-10)


def test_oracle_step_matches_brute_reference_solve():
    """One oracle_step == build_matrices + gcr_solve_direct with the same
    omega draws (the brute path uses sqrtm/dense Ni exactly as the
    reference builds them, pspec.py:325-374, 219-228)."""
    d, w, ninv, fgmodes, ps = _problem()
    nt, n = d.shape
    F = ref.fourier_operator(n)
    Fh = F.conj().T
    S = ref.covariance_from_pspec(ps / n**2, F)
    rng = np.random.default_rng(42)
    oa = (rng.standard_normal((nt, n)) + 1j * rng.standard_normal((nt, n))) / np.sqrt(2)
    ob = (rng.standard_normal((nt, n)) + 1j * rng.standard_normal((nt, n))) / np.sqrt(2)

    d_w = d * w
    mats = ref.build_matrices(w, S, np.diag(ninv).astype(complex), fgmodes)
    cr_brute, fg_brute = ref.gcr_solve_direct(mats, fgmodes, d_w, oa, ob)

    ni_diag = ninv * w * w
    cr_fast, fg_fast = oracle_step(d_w, ni_diag, fgmodes, F, Fh, ps, oa, ob)
    np.testing.assert_allclose(cr_fast, cr_brute, atol=1e-8)
    np.testing.assert_allclose(fg_fast, fg_brute, atol=1e-8)


def test_untruncated_bandpower_draw_identity():
    """beta / Gamma(alpha) draws ARE invgamma(alpha, scale=beta) draws —
    the oracle's replacement for scipy invgamma.rvs (pspec.py:121-125),
    checked against the scipy CDF with a KS statistic."""
    from scipy.stats import invgamma, kstest

    rng = np.random.default_rng(7)
    alpha, beta = 202.0, 3.7e5
    draws = beta / rng.gamma(alpha, size=20000)
    stat = kstest(draws, lambda x: invgamma.cdf(x, a=alpha, scale=beta)).statistic
    assert stat < 0.012, stat


def test_oracle_posterior_artifact_is_converged():
    """The committed acceptance target must itself pass the convergence
    gate it imposes on the engines (VERDICT r3 weak #3)."""
    import json

    path = REPO / "tests" / "oracle_posterior.json"
    art = json.loads(path.read_text())
    for case in ("unflagged", "flagged"):
        stats = art[case]
        assert stats["split_rhat_max"] < 1.1, (case, stats["split_rhat_max"])
        assert min(stats["ess_log_ps"]) > 50, (case, min(stats["ess_log_ps"]))
        # chi^2 over unflagged channels ~ 1 for a correctly-sampled chain
        assert abs(stats["chisq_postburn_mean"] - 1.0) < 0.01
