"""Scaling-study parity: this repo's timings.json must drive the
*reference's* plot_speed_up.py unmodified
(/root/reference/scripts/scaling_tests/plot_speed_up.py:30-169) — real
timing files from a 1-process and a 2-process run, not fabricated dicts."""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from test_multihost import _argv, _free_port, _write_inputs

REPO = Path(__file__).resolve().parents[1]
REF_PLOTTER = Path("/root/reference/scripts/scaling_tests/plot_speed_up.py")

pytestmark = pytest.mark.skipif(
    not REF_PLOTTER.exists(), reason="reference plotter not available"
)


def test_reference_plotter_consumes_our_timings(tmp_path):
    fp, _ = _write_inputs(tmp_path)
    runs = tmp_path / "runs"

    # run 1: single process (in-process)
    from hydra_pspec_tpu.cli.run import main

    assert main(_argv(fp, runs / "n1")) == 0

    # run 2: two jax.distributed CPU processes
    port = _free_port()
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=str(REPO) + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "hydra_pspec_tpu.cli.run",
             *_argv(fp, runs / "n2"),
             "--num_processes", "2", "--process_id", str(pid),
             "--coordinator", f"localhost:{port}"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=360) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\nstdout:{so}\nstderr:{se}"

    # plotter wants run subdirs each holding a timings.json
    plot_dir = tmp_path / "plot"
    plot_dir.mkdir()
    for sub in ("n1", "n2"):
        d = plot_dir / sub
        d.mkdir()
        src = runs / sub / "res" / "timings.json"
        assert src.exists()
        d.joinpath("timings.json").write_text(src.read_text())

    # the REFERENCE plotter, unmodified, headless
    penv = dict(os.environ, MPLBACKEND="Agg", PALLAS_AXON_POOL_IPS="",
                JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(REF_PLOTTER),
         "--results_dir", str(plot_dir),
         "--timer", "process", "--reference_nranks", "1"],
        env=penv, capture_output=True, text=True, timeout=180,
    )
    assert r.returncode == 0, r.stderr

    combined = json.loads((plot_dir / "combined_timings.json").read_text())
    assert sorted(c["num_ranks"] for c in combined) == [1, 2]
    for c in combined:
        assert set(c["rank_0_timers"]) == {
            "load_data", "scatter", "process", "barrier", "total"
        }
        assert all(np.isfinite(v) for v in c["rank_0_timers"].values())
    assert (plot_dir / "speed_up-process.svg").exists()
    assert (plot_dir / "time_vs_ranks-process.svg").exists()
