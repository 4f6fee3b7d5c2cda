"""Unit tests for the MC-error-aware posterior comparison
(hydra_pspec_tpu/utils/mcstats.py): ESS on processes with known
autocorrelation, and the oracle acceptance's detection power — it must
stay quiet for a correct sampler and fail loudly on the ~15% bias the
old truth-bracketing window could hide (VERDICT r3 weak #2).
"""
import numpy as np

from hydra_pspec_tpu.utils.mcstats import (compare_to_oracle, ess_geyer,
                                           oracle_acceptance)


def test_ess_iid_is_total_draws():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 2000))
    ess = ess_geyer(x)
    assert 0.6 * 8000 < ess <= 8000 * 1.3, ess


def test_ess_ar1_matches_theory():
    """AR(1) with coefficient rho has integrated autocorrelation time
    (1+rho)/(1-rho); ESS should land within ~25% of N/tau."""
    rho = 0.9
    rng = np.random.default_rng(1)
    m, nd = 4, 40000
    x = np.empty((m, nd))
    x[:, 0] = rng.standard_normal(m)
    eps = rng.standard_normal((m, nd)) * np.sqrt(1 - rho**2)
    for t in range(1, nd):
        x[:, t] = rho * x[:, t - 1] + eps[:, t]
    tau = (1 + rho) / (1 - rho)
    ess = ess_geyer(x)
    expect = m * nd / tau
    assert 0.75 * expect < ess < 1.25 * expect, (ess, expect)


def test_ess_antithetic_exceeds_draws():
    """With the Stan pairing Γ_k = ρ_{2k} + ρ_{2k+1} (including ρ_0),
    τ = -1 + 2ΣΓ is not floored at 1, so perfectly antithetic chains
    (negative lag-1 correlation) report super-efficient ESS > N."""
    rng = np.random.default_rng(5)
    half = rng.standard_normal((4, 1000))
    x = np.empty((4, 2000))
    x[:, ::2] = half
    x[:, 1::2] = -half
    assert ess_geyer(x) > 4 * 2000


def _synthetic(rng, nbins=120, nchains=4, nd=1500, bias_log=0.0):
    """Oracle stats + 'ours' draws from log-normal posteriors with per-bin
    scales; ours optionally biased by bias_log in log space."""
    mu = rng.uniform(8.0, 12.0, size=nbins)
    sd = rng.uniform(0.06, 0.12, size=nbins)
    # long-run oracle: big ESS, exact moments + quantiles
    oracle = {
        "mean_log_ps": mu.tolist(),
        "sd_log_ps": sd.tolist(),
        "ess_log_ps": [40000.0] * nbins,
        "q5_ps": np.exp(mu - 1.645 * sd).tolist(),
        "q95_ps": np.exp(mu + 1.645 * sd).tolist(),
    }
    draws = np.exp(mu + bias_log
                   + sd * rng.standard_normal((nchains, nd, nbins)))
    return oracle, draws


def test_correct_sampler_passes():
    rng = np.random.default_rng(2)
    oracle, draws = _synthetic(rng)
    cmp = compare_to_oracle(draws, oracle)
    assert oracle_acceptance(cmp), cmp


def test_fifteen_percent_bias_fails():
    rng = np.random.default_rng(3)
    oracle, draws = _synthetic(rng, bias_log=np.log(1.15))
    cmp = compare_to_oracle(draws, oracle)
    assert not oracle_acceptance(cmp), cmp
    # and by a wide margin, not a threshold graze
    assert cmp["max_z"] > 20, cmp
    assert cmp["n_z_gt3"] > 60, cmp


def test_negligible_numeric_offset_tolerated():
    """A sub-eps_log offset (e.g. bf16 rounding of the engine) must not
    fail the gate even with enormous ESS on both sides."""
    rng = np.random.default_rng(4)
    oracle, draws = _synthetic(rng, bias_log=0.01, nd=4000)
    cmp = compare_to_oracle(draws, oracle)
    assert oracle_acceptance(cmp), cmp
