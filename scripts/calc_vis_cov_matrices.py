"""Per-baseline covariance / foreground-eigenmode preparation.

Equivalent of the reference's scripts/calc-vis-cov-matrices.py
(:182-249): for each baseline, the time-averaged frequency-frequency
covariance ``np.cov(d.T)`` and (optionally) its eigenvectors — the PCA
foreground basis the driver consumes as ``fgmodes`` (matched by the
default filename ``evecs-{freq_str}.npy``, run-hydra-pspec.py:444-449) —
plus a metadata record.

Usage:
    python scripts/calc_vis_cov_matrices.py data.uvh5 --out-dir prep/ \
        [--eig] [--ant-str 0_1,0_3] [--freq-range 100-120]
"""
import argparse
import json
from pathlib import Path

import numpy as np

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+")
    p.add_argument("--out-dir", default="./cov-prep")
    p.add_argument("--eig", action="store_true",
                   help="also write eigenvectors (the fgmodes PCA basis)")
    p.add_argument("--ant-str", default="cross")
    p.add_argument("--freq-range", default=None)
    args = p.parse_args()

    from hydra_pspec_tpu.utils.uvh5 import read_uvh5, parse_ant_str
    from hydra_pspec_tpu.utils.provenance import get_git_version_info

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    antpairs = parse_ant_str(args.ant_str)

    for fp in args.files:
        bls, freqs = read_uvh5(fp, antpairs=antpairs,
                               freq_range=args.freq_range)
        fmhz = freqs / 1e6
        freq_str = f"{fmhz.min():.3f}-{fmhz.max():.3f}MHz"
        # Run-level metadata record with the reference's keys
        # (calc-vis-cov-matrices.py:225-231): git / args / freqs (Hz) /
        # lsts (hours) / uvws (one row per baseline) / bls.
        lsts_h = np.unique(np.concatenate([bl.lsts for bl in bls])) \
            * 12.0 / np.pi
        meta = {
            "git": get_git_version_info(),
            "args": vars(args),
            "freqs": np.asarray(freqs, dtype=float),
            "lsts": lsts_h,
            "uvws": np.stack([
                bl.uvw[0] if bl.uvw.size else np.zeros(3) for bl in bls
            ]),
            "bls": [bl.antpair for bl in bls],
        }
        np.save(out / "metadata-dict.npy", meta, allow_pickle=True)
        for bl in bls:
            a, b = bl.antpair
            d = out / f"{a}-{b}"
            d.mkdir(exist_ok=True)
            cov = np.cov(bl.vis.T)  # (Nfreqs, Nfreqs), time-averaged
            np.save(d / f"cov-{freq_str}.npy", cov)
            if args.eig:
                vals, vecs = np.linalg.eig(cov)
                order = np.argsort(-np.abs(vals))
                np.save(d / f"evals-{freq_str}.npy", vals[order])
                np.save(d / f"evecs-{freq_str}.npy", vecs[:, order])
            print(f"{a}-{b}: cov {cov.shape}"
                  + (" + eigenmodes" if args.eig else ""))


if __name__ == "__main__":
    main()
