"""Native thread-pool .npy writer (native/fastio.cpp via ctypes)."""
import shutil
import time

import numpy as np
import pytest

from hydra_pspec_tpu.utils import fastio

RNG = np.random.default_rng(5)

needs_native = pytest.mark.skipif(
    shutil.which("make") is None or shutil.which("g++") is None,
    reason="no C++ toolchain",
)


@needs_native
def test_native_writer_roundtrip(tmp_path):
    w = fastio.AsyncNpyWriter(nthreads=4)
    assert w.is_native, "native library failed to build/load"
    arrays = {
        "a.npy": RNG.standard_normal((7, 13)),
        "b.npy": (RNG.standard_normal((3, 4, 5))
                  + 1j * RNG.standard_normal((3, 4, 5))),
        "c.npy": RNG.integers(0, 100, size=(11,)).astype(np.int64),
        "d.npy": np.float32(RNG.standard_normal((64, 128))),
    }
    for name, arr in arrays.items():
        w.save(tmp_path / name, arr)
    assert w.wait() == 0
    for name, arr in arrays.items():
        got = np.load(tmp_path / name)
        assert got.dtype == np.asarray(arr).dtype
        np.testing.assert_array_equal(got, arr)
    assert w.write_seconds() > 0
    w.close()


@needs_native
def test_many_files_and_overwrite(tmp_path):
    w = fastio.AsyncNpyWriter(nthreads=8)
    assert w.is_native
    for rounds in range(3):  # overwrite-all contract, pspec.py:625-638
        for i in range(60):
            w.save(tmp_path / f"f{i}.npy", np.full((50,), rounds + i, float))
        assert w.wait() == 0
    for i in range(60):
        np.testing.assert_array_equal(
            np.load(tmp_path / f"f{i}.npy"), np.full((50,), 2 + i, float))
    w.close()


@needs_native
def test_failed_write_reported(tmp_path):
    w = fastio.AsyncNpyWriter(nthreads=2)
    assert w.is_native
    w.save(tmp_path / "missing-dir" / "x.npy", np.zeros(3))
    assert w.wait() == 1
    w.close()


def test_fallback_without_native(monkeypatch, tmp_path):
    monkeypatch.setattr(fastio, "_load_lib", lambda: None)
    w = fastio.AsyncNpyWriter()
    assert not w.is_native
    w.save(tmp_path / "x.npy", np.arange(4))
    assert w.wait() == 0
    np.testing.assert_array_equal(np.load(tmp_path / "x.npy"), np.arange(4))


@needs_native
def test_runner_uses_async_writer(tmp_path, monkeypatch):
    """The runner's flush path goes through the pool and still produces
    np.load-readable reference-named files."""
    import test_runner as tr
    from hydra_pspec_tpu.runner import run_baselines

    jobs = tr.make_jobs(1, tmp=tmp_path, data_seed=7)
    results, _ = run_baselines(
        jobs, np.zeros((2, 16)), 4, seed=1, engine="complex",
        use_mesh=False, write_niter=2,
    )
    dps = np.load(tmp_path / "0-1" / "dps-eor.npy")
    np.testing.assert_allclose(dps, results[0].signal_ps)
