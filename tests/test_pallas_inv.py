"""v2 recursive-inverse Pallas solve kernel — correctness in interpret
mode on CPU (same oracle pattern as test_pallas_solve.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydra_pspec_tpu.ops import cplx
from hydra_pspec_tpu.ops.pallas import spd_inv

RNG = np.random.default_rng(78)


def crandn(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)) / np.sqrt(2)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _make_spd(b, n):
    a = RNG.standard_normal((b, n, n)).astype(np.float32)
    return np.einsum("bij,bkj->bik", a, a) / n + np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n,k", [(128, 128), (256, 256)])
def test_solves_aligned_system(n, k):
    b = 3
    e = _make_spd(b, n)
    rhs = RNG.standard_normal((b, n, k)).astype(np.float32)
    x = np.asarray(spd_inv.spd_inv_solve(e, rhs, batch_tile=2))
    resid = np.einsum("bij,bjk->bik", e, x) - rhs
    assert np.abs(resid).max() < 2e-4, np.abs(resid).max()


def test_pads_odd_sizes():
    b, n, k = 5, 240, 203
    e = _make_spd(b, n)
    rhs = RNG.standard_normal((b, n, k)).astype(np.float32)
    x = np.asarray(spd_inv.spd_inv_solve(e, rhs, batch_tile=4))
    assert x.shape == (b, n, k)
    resid = np.einsum("bij,bjk->bik", e, x) - rhs
    assert np.abs(resid).max() < 2e-4, np.abs(resid).max()


def test_hermitian_solve_pallas2_matches_chol():
    b, n, k = 2, 120, 64
    X = crandn(b, n, n)
    m = np.einsum("bij,bkj->bik", X, X.conj()) / n + np.eye(n)
    scale = np.exp(RNG.standard_normal(n))
    m = m * np.outer(scale, scale)[None]
    rhs = crandn(b, n, k)
    mc = cplx.from_numpy(m, jnp.float32)
    bc = cplx.from_numpy(rhs, jnp.float32)
    want = cplx.to_numpy(cplx.hermitian_solve(mc, bc))
    got = cplx.to_numpy(spd_inv.hermitian_solve_pallas2(mc, bc, batch_tile=2))
    denom = np.abs(want).mean()
    assert np.abs(got - want).max() / denom < 3e-3


def test_gcr_step_matches_pallas_v1():
    """The two kernels must agree on the actual GCR system shape
    (240-real-embedded, 203 RHS) to solver accuracy."""
    from hydra_pspec_tpu.ops.pallas import spd_solve

    b, n, k = 2, 240, 203
    e = _make_spd(b, n)
    rhs = RNG.standard_normal((b, n, k)).astype(np.float32)
    x1 = np.asarray(spd_solve.spd_factor_solve(e, rhs, batch_tile=2))
    x2 = np.asarray(spd_inv.spd_inv_solve(e, rhs, batch_tile=2))
    denom = np.abs(x1).mean()
    assert np.abs(x1 - x2).max() / denom < 1e-3
