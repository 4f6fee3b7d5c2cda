"""Fabricate an N-baseline scaling dataset from the bundled single-baseline
test data — the reference's scaling fixture (set_up_scaling_data.py:19-34:
N identical baselines so identical per-baseline results are the
correctness oracle) taken one step further: a real multi-baseline uvh5
plus the per-baseline aux directory layout the driver consumes.

Usage:
    python scripts/make_scaling_data.py --n 16 --out scaling-data/
    python -m hydra_pspec_tpu.cli.run scaling-data/vis.uvh5 \
        --noise_cov scaling-data/aux --noise_cov_file noise-cov.npy \
        --fgmodes scaling-data/aux --fgmodes_file fgmodes.npy \
        --sigcov0 scaling-data/aux --sigcov0_file eor-cov.npy \
        --noise scaling-data/aux --noise_file noise.npy \
        --Niter 4 --Nfgmodes 12 --seed 7123689 --out_dir out/
"""
import argparse
import shutil
from pathlib import Path

import numpy as np

import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="/root/reference/test_data")
    p.add_argument("--n", type=int, default=8, help="number of baselines")
    p.add_argument("--out", default="./scaling-data")
    args = p.parse_args()

    from hydra_pspec_tpu.utils.uvh5 import read_uvh5, write_uvh5

    td = Path(args.data)
    out = Path(args.out)
    (out / "aux").mkdir(parents=True, exist_ok=True)

    bls, freqs = read_uvh5(td / "vis-eor-fgs.uvh5")
    vis = bls[0].vis
    pairs = {(0, i + 1): vis.copy() for i in range(args.n)}
    write_uvh5(out / "vis.uvh5", pairs, freqs, times=bls[0].times)

    for i in range(args.n):
        d = out / "aux" / f"0-{i + 1}"
        d.mkdir(exist_ok=True)
        for name in ("noise.npy", "noise-cov.npy", "fgmodes.npy", "eor-cov.npy"):
            shutil.copy(td / "0-1" / name, d / name)
    print(f"wrote {args.n} baselines to {out}/vis.uvh5 + aux dirs")


if __name__ == "__main__":
    main()
