"""Minimal programmatic usage example — the working counterpart of the
reference's stale scripts/simple_example.py (it unpacks 4 of the 7 values
gibbs_sample_with_fg returns, /root/reference/scripts/simple_example.py:59-71).

Runs a single-baseline Gibbs chain on the bundled test data through the
library API (no CLI, no MPI/mesh) and prints summary statistics.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/simple_example.py
"""
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from hydra_pspec_tpu.models.gibbs import gibbs_sample_with_fg
from hydra_pspec_tpu.utils.uvh5 import read_uvh5

TEST_DATA = Path("/root/reference/test_data")

# --- load one baseline of visibilities + its noise model -----------------
baselines, freqs = read_uvh5(TEST_DATA / "vis-eor-fgs.uvh5")
bl = baselines[0]
d = bl.vis + np.load(TEST_DATA / "0-1" / "noise.npy")  # inject noise
ntimes, nfreqs = d.shape
print(f"Baseline {bl.antpair}: Ntimes={ntimes} Nfreqs={nfreqs}")

w = np.ones(nfreqs)  # no flagged channels in the bundled data
noise_cov = np.load(TEST_DATA / "0-1" / "noise-cov.npy")
Ninv = np.linalg.inv(noise_cov)

# initial signal covariance + PCA foreground basis from the prep script
S_initial = np.load(TEST_DATA / "0-1" / "eor-cov.npy")
fgmodes = np.load(TEST_DATA / "0-1" / "fgmodes.npy")[:, :12]

# bandpower prior: restrict the +-3 bins around delay 0 to [0.1, 2]
# (shape (2, Ndelays): [0] = upper bound, [1] = lower; 0 = unconstrained)
ps_prior = np.zeros((2, nfreqs))
ps_prior[0, nfreqs // 2 - 3: nfreqs // 2 + 4] = 2.0
ps_prior[1, nfreqs // 2 - 3: nfreqs // 2 + 4] = 0.1

# --- run the Gibbs sampler ----------------------------------------------
signal_cr, signal_S, signal_ps, fg_amps, chisq, ln_post, write_time = \
    gibbs_sample_with_fg(
        d, w, S_initial, fgmodes, Ninv, ps_prior,
        Niter=100, seed=7123689, verbose=False,
    )

print(f"signal_cr {signal_cr.shape}  signal_ps {signal_ps.shape}  "
      f"fg_amps {fg_amps.shape}")
print(f"chi^2 (post burn-in) = {chisq[30:].mean():.4f}  (want ~1)")

# posterior-weighted mean delay spectrum vs the EoR-only truth
bls_eor, _ = read_uvh5(TEST_DATA / "vis-eor.uvh5")
ds = np.fft.fftshift(
    np.fft.fft(np.fft.ifftshift(bls_eor[0].vis, axes=1), axis=1), axes=1
)
dps_true = (np.abs(ds) ** 2).mean(axis=0)
pwm = np.average(signal_ps[30:], weights=ln_post[30:], axis=0)
edge = np.r_[0:40, 80:120]
print(f"median recovered/true (EoR bins) = "
      f"{np.median(pwm[edge] / dps_true[edge]):.3f}  (want ~1)")
