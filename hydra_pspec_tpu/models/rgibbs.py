"""Real-pair (TPU) execution engine for the Gibbs sampler.

Same math as models/gcr.py + models/gibbs.py — the whitened Hermitian GCR
system, analytic signal square roots, inverse-gamma bandpower draws — but
every complex quantity is a ``C(re, im)`` float32 pair (ops/cplx.py) and
the HPD solve is a Cholesky of the real symmetric embedding. This is the
engine production TPU runs use; the complex engine remains the readable
spec and the CPU/x64 parity path. Exact agreement between the two (float64,
same keys) is pinned by tests/test_rgibbs.py.

Reference semantics being implemented: hydra_pspec/pspec.py:151-490.
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx
from ..ops.cplx import C
from ..ops.invgamma import (InvGammaTable, make_invgamma_table,
                            sample_bandpowers_from_beta)


class RChainOperators(NamedTuple):
    """Per-chain constants, real-pair form. Built host-side (numpy) once
    per chain — only the per-iteration step must run on the TPU."""

    d_w: C            # (Ntimes, Nfreqs) masked visibilities
    w: jax.Array      # (Nfreqs,) flags
    fg: C             # (Nfreqs, Nmodes)
    f: C              # (Nfreqs, Nfreqs) centered DFT operator
    ni_diag: jax.Array
    nih_diag: jax.Array
    ninv_full_diag: jax.Array
    ni_d: C           # Ni @ (d_w - Fg a0) — FG-deflated (constant)
    ni_fg: C          # Ni @ fg (constant)
    maa: C            # fg^H Ni fg (constant)
    a0: C             # (Ntimes, Nmodes) host GLS foreground amplitudes
    igt: InvGammaTable  # tabulated Q(Ntimes, y) for truncated draws


def build_chain_operators(vis, w, fgmodes, ninv, dtype=jnp.float32) -> RChainOperators:
    """Host-side (numpy, float64) precompute, then cast to the engine dtype.

    ``ninv``: scalar, (Nfreqs,) diagonal, or (Nfreqs, Nfreqs) — dense
    matrices must be diagonal here (every shipped config is; the complex
    engine handles genuinely dense noise)."""
    vis = np.asarray(vis, dtype=np.complex128)
    nfreqs = vis.shape[-1]
    w = np.asarray(w, dtype=np.float64)
    ninv = np.asarray(ninv)
    if ninv.ndim == 2:
        off = ninv - np.diag(np.diag(ninv))
        if np.abs(off).max() > 0:
            raise NotImplementedError(
                "dense Ninv is not supported by the real-pair engine; "
                "use the complex engine (models.gibbs)"
            )
        ninv = np.diag(ninv).real
    ninv_full = np.broadcast_to(np.real(ninv), (nfreqs,)).astype(np.float64)
    ni = w * ninv_full * w
    nih = np.sqrt(ni)
    fg = np.asarray(fgmodes, dtype=np.complex128)
    d_w = vis * w
    ni_fg = ni[:, None] * fg
    maa = fg.conj().T @ ni_fg
    # FG deflation (exact): solve for amplitudes relative to the host-side
    # float64 GLS foreground fit a0. The raw solution vector mixes O(FG)
    # amplitudes with the O(EoR) signal, so a float32 solve's norm-wise
    # error (~cond * eps * |x|) would land entirely on the small signal
    # components; shifting by a0 balances the solution's dynamic range.
    rhs0 = fg.conj().T @ (ni * d_w).T               # (Nmodes, Ntimes)
    a0 = np.linalg.lstsq(maa, rhs0, rcond=None)[0].T  # (Ntimes, Nmodes)
    d_defl = d_w - a0 @ fg.T
    ni_d = ni * d_defl

    cv = lambda z: cplx.from_numpy(z, dtype=dtype)
    rv = lambda x: jnp.asarray(x, dtype=dtype)
    return RChainOperators(
        d_w=cv(d_w),
        w=rv(w),
        fg=cv(fg),
        f=cplx.dft_matrix(nfreqs, dtype=dtype),
        ni_diag=rv(ni),
        nih_diag=rv(nih),
        ninv_full_diag=rv(ninv_full),
        ni_d=cv(ni_d),
        ni_fg=cv(ni_fg),
        maa=cv(maa),
        a0=cv(a0),
        igt=make_invgamma_table(vis.shape[0], dtype=dtype),
    )


class RGibbsSample(NamedTuple):
    signal_cr: C
    ps: jax.Array
    fg_amps: C
    chisq: jax.Array
    ln_post: jax.Array


def _signal_sqrt(ops: RChainOperators, ps: jax.Array) -> C:
    """Sh = F^H diag(sqrt(ps) / n^{3/2}) F as a real pair (one complex
    matmul = 3 MXU matmuls)."""
    n = ps.shape[-1]
    s = jnp.sqrt(jnp.clip(ps, 0.0, None)) / (n * np.sqrt(n))
    fh_s = C(ops.f.re.T * s, -ops.f.im.T * s)  # F^H * diag(s)
    return cplx.matmul(fh_s, ops.f)


def gcr_solve(
    ops: RChainOperators,
    ps: jax.Array,
    omega_a: Optional[C],
    omega_b: Optional[C],
    jitter: float = 0.0,
):
    """Constrained-realization draw for all times (real-pair mirror of
    models/gcr.py:gcr_solve). ``omega_*`` are (Ntimes, Nfreqs) standard
    complex normal pairs, or None for the MAP estimate."""
    nfreqs = ops.d_w.shape[-1]
    sh = _signal_sqrt(ops, ps)

    # M = [[I + Sh Ni Sh, Sh Ni Fg], [(Ni Fg)^H Sh, Fg^H Ni Fg]]
    ni_sh = C(ops.ni_diag[:, None] * sh.re, ops.ni_diag[:, None] * sh.im)
    muu = cplx.matmul(sh, ni_sh) + jnp.eye(nfreqs, dtype=sh.dtype)
    mua = cplx.matmul(sh, ops.ni_fg)
    m = cplx.block2x2(muu, mua, mua.adjoint(), ops.maa)

    # RHS for all times: rc = Ni d + Nih w_b; b = [Sh rc + w_a ; Fg^H rc]
    rc = ops.ni_d
    if omega_b is not None:
        rc = rc + C(ops.nih_diag * omega_b.re, ops.nih_diag * omega_b.im)
    rc_t = C(rc.re.T, rc.im.T)                       # (Nfreqs, Ntimes)
    b_top = cplx.matmul(sh, rc_t)
    if omega_a is not None:
        b_top = b_top + C(omega_a.re.T, omega_a.im.T)
    b_bot = cplx.matmul(ops.fg.adjoint(), rc_t)
    b = C(
        jnp.concatenate([b_top.re, b_bot.re], axis=0),
        jnp.concatenate([b_top.im, b_bot.im], axis=0),
    )

    x = cplx.hermitian_solve_recinv(m, b, jitter=jitter)
    u = C(x.re[:nfreqs], x.im[:nfreqs])
    amps_t = C(x.re[nfreqs:], x.im[nfreqs:])
    sig_t = cplx.matmul(sh, u)                       # (Nfreqs, Ntimes)
    signal_cr = C(sig_t.re.T, sig_t.im.T)
    fg_amps = C(amps_t.re.T, amps_t.im.T) + ops.a0   # undo FG deflation
    return signal_cr, fg_amps


def gibbs_step(
    key: jax.Array,
    ps: jax.Array,
    ops: RChainOperators,
    ps_prior: jax.Array,
    map_estimate: bool = False,
    jitter: float = 0.0,
    prior_idx=None,
):
    """One Gibbs alternation (reference pspec.py:377-490), all-real ops."""
    ntimes, nfreqs = ops.d_w.shape
    k_oma, k_omb, k_ps = jax.random.split(key, 3)

    if map_estimate:
        omega_a = omega_b = None
    else:
        omega_a = cplx.standard_normal(k_oma, (ntimes, nfreqs), dtype=ops.d_w.dtype)
        omega_b = cplx.standard_normal(k_omb, (ntimes, nfreqs), dtype=ops.d_w.dtype)
    signal_cr, fg_amps = gcr_solve(ops, ps, omega_a, omega_b, jitter=jitter)

    # model = signal + amps @ fg^T ; chisq vs unmasked noise diagonal
    model = signal_cr + cplx.matmul(fg_amps, ops.fg.T)
    resid = ops.d_w - model
    chisq = resid.abs2() * ops.ninv_full_diag

    # Bandpower draw from beta_k = sum_t |F s_t|^2
    sk = cplx.cfft_rows(signal_cr, ops.f)
    beta = jnp.sum(sk.abs2(), axis=0)
    ps_new = sample_bandpowers_from_beta(k_ps, beta, ntimes, ps_prior,
                                         prior_idx, ops.igt)

    # ln posterior under the new sample (multiplicative masking form)
    noise_term = jnp.sum(ops.ni_diag * resid.abs2())
    skm = cplx.cfft_rows(C(signal_cr.re * ops.w, signal_cr.im * ops.w), ops.f)
    sig_term = jnp.sum(
        skm.abs2() / jnp.maximum(ps_new, jnp.finfo(ps_new.dtype).tiny)[None, :]
    )
    ln_post = -(noise_term + sig_term)

    return ps_new, RGibbsSample(signal_cr, ps_new, fg_amps, chisq, ln_post)


def run_chain(
    key, ops: RChainOperators, ps0, ps_prior, niter: int,
    map_estimate: bool = False, jitter: float = 0.0, store_cr: bool = True,
    prior_idx=None,
):
    """``lax.scan`` over iterations (mirror of gibbs.run_chain)."""

    def body(ps, i):
        ps_new, s = gibbs_step(
            jax.random.fold_in(key, i), ps, ops, ps_prior,
            map_estimate=map_estimate, jitter=jitter, prior_idx=prior_idx,
        )
        if not store_cr:
            zero = jnp.zeros((), dtype=ps_new.dtype)
            s = RGibbsSample(
                signal_cr=C(zero, zero),
                ps=s.ps,
                fg_amps=C(zero, zero),
                chisq=jnp.mean(s.chisq),
                ln_post=s.ln_post,
            )
        return ps_new, s

    return jax.lax.scan(body, ps0, jnp.arange(niter))


run_chain_jit = jax.jit(
    run_chain, static_argnames=("niter", "map_estimate", "jitter", "store_cr")
)
