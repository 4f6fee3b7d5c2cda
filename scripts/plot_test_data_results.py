"""Validation plot: recovered vs true EoR delay power spectrum.

Drop-in equivalent of the reference's test_data/plot-test-data-results.py
(same statistics: posterior-weighted mean + percentile confidence band
against the truth recomputed from vis-eor.uvh5) without the pyuvdata /
jsonargparse dependencies. Also prints a quantitative summary so it works
headless.

Usage:
    python scripts/plot_test_data_results.py \
        --vis-eor /root/reference/test_data/vis-eor.uvh5 \
        --res-dir out/results-.../0-1 [--nburn 100] [--save plot.png]
"""
import argparse
from pathlib import Path

import numpy as np

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vis-eor", default="/root/reference/test_data/vis-eor.uvh5")
    p.add_argument("--res-dir", required=True)
    p.add_argument("--conf-interval", type=int, default=95)
    p.add_argument("--nburn", type=int, default=0)
    p.add_argument("--save", default=None, help="write a PNG instead of showing")
    args = p.parse_args()

    from hydra_pspec_tpu.utils.uvh5 import read_uvh5
    from hydra_pspec_tpu.ops.fourier import delay_array

    bls, freqs = read_uvh5(args.vis_eor)
    vis_eor = bls[0].vis
    nfreqs = vis_eor.shape[1]
    df = freqs[1] - freqs[0]

    ds_true = np.fft.fftshift(
        np.fft.fft(np.fft.ifftshift(vis_eor, axes=1), axis=1), axes=1
    )
    dps_true = (np.abs(ds_true) ** 2).mean(axis=0)
    delays = delay_array(nfreqs, df)

    res = Path(args.res_dir)
    dps = np.load(res / "dps-eor.npy")[args.nburn :]
    ln_post = np.load(res / "ln-post.npy")[args.nburn :]

    pwm = np.average(dps, weights=ln_post, axis=0)
    pc = args.conf_interval / 2 + 50
    ub = np.percentile(dps, pc, axis=0)
    lb = np.percentile(dps, 100 - pc, axis=0)

    inside = (dps_true >= lb) & (dps_true <= ub)
    ratio = np.median(pwm / dps_true)
    print(f"bins with truth inside {args.conf_interval}% CI: "
          f"{inside.sum()}/{nfreqs}")
    print(f"median recovered/true ratio: {ratio:.4f}")

    try:
        import matplotlib

        if args.save:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; numeric summary only")
        return

    fig, ax = plt.subplots(figsize=(12, 5))
    ax.plot(delays, dps_true, "k:", label="True")
    ax.errorbar(delays, pwm, yerr=np.vstack([pwm - lb, ub - pwm]),
                color="k", ls="", marker="o", capsize=3,
                label=f"Recovered ({args.conf_interval}% Confidence)")
    ax.legend(loc="upper right")
    ax.set_xlabel(r"$\tau$ [ns]")
    ax.set_ylabel(r"$P(\tau)$ [arb. units]")
    ax.set_title("EoR Delay Power Spectrum Comparison")
    ax.set_yscale("log")
    ax.grid()
    fig.tight_layout()
    if args.save:
        fig.savefig(args.save, dpi=120)
        print(f"wrote {args.save}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
