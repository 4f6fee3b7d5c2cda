"""Optimal Quadratic Estimator (OQE) for the delay power spectrum.

Reference (hydra_pspec/oqe.py): delay-mode quadratic estimator built from
rank-1 operators ``Q(tau) = conj(m) m^T`` with ``m = fft(delta_tau)``
(oqe.py:7-20, disk-cached outer products), estimator values
``qhat = 0.5 x^H R^bar Q R x - bias`` (oqe.py:27-40), a Fisher matrix of
O(s^2) traces (oqe.py:43-66), normalizations (oqe.py:69-84) and error bars
(oqe.py:161-185). As shipped the reference's ``Q`` cache, ``getqs`` and
``M_Fhalf`` raise ``NameError`` (missing ``os``/``time``/``sp`` imports) —
rebuilt here working by construction.

TPU-native identities (no Q matrices are ever materialized; everything is
an FFT because ``m_tau[k] = exp(-2 pi i k tau / s)`` is a DFT row):

  * ``x^H Rbar Q_t R x  = conj(fft(R^T x)[t]) * fft(R x)[t]``
  * ``(Rx1)^H Q_t (Rx2) = conj(fft(R x1)[t]) * fft(R x2)[t]``
  * ``tr(A Q_t)`` terms reduce to diagonals of the 2D transform
    ``F A F^H`` — two FFT passes over a matrix.
  * Fisher: ``F[a,b] = 0.5 * G1[a,b] * G2[b,a]`` with
    ``G1 = dft2(R)``, ``G2 = dft2(conj(R))``.
"""
import jax
import jax.numpy as jnp

from ..ops.linalg import hermitian_sqrt


def m(tau, s):
    """DFT row ``m_tau = fft(delta_tau)`` (reference oqe.py:7-10)."""
    k = jnp.arange(s)
    return jnp.exp(-2.0j * jnp.pi * k * tau / s)


def Q(tau, s):
    """Rank-1 delay operator ``outer(conj(m), m)`` (reference oqe.py:13-20;
    no disk cache needed — it is two lines of math)."""
    mt = m(tau, s)
    return jnp.outer(mt.conj(), mt)


def _dft2(a):
    """``G[t, u] = sum_jk exp(-2pi i t j / s) a[j, k] exp(+2pi i u k / s)``
    = F a F^H for the unnormalized DFT matrix F."""
    s = a.shape[-1]
    return jnp.fft.ifft(jnp.fft.fft(a, axis=-2), axis=-1) * s


def _diag_dft2(a):
    """Diagonal of ``F a F^H``: the length-s vector ``m_t^T a conj(m_t)``."""
    return jnp.diagonal(_dft2(a), axis1=-2, axis2=-1)


@jax.jit
def bias(R, C_noise_total):
    """All-tau bias vector ``0.5 tr(C R^bar Q_t R)`` (reference oqe.py:23-24
    computes one tau at a time)."""
    return 0.5 * _diag_dft2(R @ C_noise_total @ R.conj())


@jax.jit
def qhat_all(x, R, bias_vec=None):
    """``0.5 x^H (Rbar Q_t R) x - bias`` for every tau at once (reference
    oqe.py:27-30 per tau). ``x``: (..., s)."""
    rx = jnp.fft.fft(x @ R.T, axis=-1)
    rtx = jnp.fft.fft(x @ R, axis=-1)
    q = 0.5 * rtx.conj() * rx
    if bias_vec is not None:
        q = q - bias_vec
    return q


@jax.jit
def qhat_h_all(x1, x2, R):
    """HERA-style cross-correlation ``0.5 (R x1)^H Q_t (R x2)`` for every
    tau (reference oqe.py:33-40 per tau). Inputs (..., s)."""
    f1 = jnp.fft.fft(x1 @ R.T, axis=-1)
    f2 = jnp.fft.fft(x2 @ R.T, axis=-1)
    return 0.5 * f1.conj() * f2


def qhat(x, tau, s, R, bias_scalar=0.0):
    """Single-tau mirror of reference oqe.py:27-30."""
    return qhat_all(x, R)[..., tau] - bias_scalar


def qhat_h(x1, x2, tau, s, R):
    """Single-tau mirror of reference oqe.py:33-40."""
    return qhat_h_all(x1, x2, R)[..., tau]


@jax.jit
def F(R):
    """Fisher matrix ``F[a,b] = 0.5 tr(Rbar Q_a R Q_b)`` (reference
    oqe.py:43-50 / the einsum-cached Ft at oqe.py:53-66) as two 2D DFTs."""
    g1 = _dft2(R)
    g2 = _dft2(R.conj())
    return 0.5 * g1 * g2.T


Ft = F  # reference keeps a cached variant; identical result


def M_Finv(Fm):
    """Normalization ``M = F^{-1}`` (reference oqe.py:73-74)."""
    return jnp.linalg.inv(Fm)


def M_Fhalf(Fm):
    """``M = F^{-1/2}`` via the Hermitian square root (reference
    oqe.py:69-70 is broken as shipped — missing ``sp`` import)."""
    return jnp.linalg.inv(hermitian_sqrt(0.5 * (Fm + Fm.conj().T)))


@jax.jit
def M_opt(Fm):
    """Window-normalized diagonal M (reference oqe.py:77-84)."""
    Md = jnp.diag(1.0 / jnp.diagonal(Fm))
    W = Md @ Fm
    return Md / jnp.sum(W, axis=1, keepdims=True)


def p(q, M):
    """Normalized bandpowers (reference oqe.py:117-118)."""
    return M @ q


def q(V, s, R, bias_vec):
    """Batched auto-correlation estimator over visibilities (reference
    oqe.py:88-101; the reference assigns complex values into a real array,
    silently discarding the imaginary part — we keep the real part
    explicitly)."""
    return qhat_all(jnp.asarray(V), R, jnp.asarray(bias_vec)).real


def q_h(V, s, R, taper=None):
    """Cross-correlation estimator over adjacent visibility pairs
    (reference oqe.py:104-114)."""
    V = jnp.asarray(V)
    return qhat_h_all(V[0::2], V[1::2], R)


def q_hp(V, s, R, ncpu=None):
    """Reference's multiprocessing variant (oqe.py:147-158) — the batched
    FFT form needs no process pool; ``ncpu`` accepted for API parity."""
    return q_h(V, s, R)


def matc(M):
    """Condition-number diagnostics (reference oqe.py:121-127). Returns
    (is_positive_definite, eigval_ratio, norm_condition) instead of
    printing."""
    evs = jnp.linalg.eigvals(M).real
    Minv = jnp.linalg.inv(M)
    return (
        bool(jnp.all(evs > 0)),
        float(jnp.max(evs) / jnp.min(evs)),
        float(jnp.linalg.norm(M) * jnp.linalg.norm(Minv)),
    )


def getqs(Vis, R, verbose=False):
    """End-to-end skeleton OQE (reference oqe.py:130-144, broken as shipped
    via missing ``time`` import): condition diagnostics, Fisher matrix,
    normalizations, and pair cross-correlation q's."""
    Vis = jnp.asarray(Vis)
    s = Vis.shape[-1]
    if verbose:
        pd, ratio, cond = matc(R)
        print(f"{pd} - positive definite; eig ratio {ratio:.3e}; cond {cond:.3f}")
    Fm = F(R)
    MB = M_opt(Fm)
    MA = M_Finv(Fm)
    qs = q_h(Vis, s, R)
    return qs, Fm, MB, MA


@jax.jit
def Sig_QEN(R, C_noise, norm):
    """Noise-only error bar ``0.5 tr(E C E C)`` with ``E = R Q_t R * norm``
    (reference oqe.py:161-173). ``norm`` scalar or per-tau vector. Uses
    ``tr(u v^T C u v^T C) = (v^T C u)^2`` with the rank-1 structure of E."""
    t = _diag_dft2(R @ C_noise @ R)
    norm = jnp.asarray(norm)
    return 0.5 * (norm * t) ** 2 * jnp.ones_like(t)


@jax.jit
def Sig_QESN(R, C_noise, C_S, norm):
    """Signal+noise error bar (reference oqe.py:177-185)."""
    tn = _diag_dft2(R @ C_noise @ R)
    ts = _diag_dft2(R @ C_S @ R)
    norm = jnp.asarray(norm)
    return 0.5 * norm**2 * (tn * tn + 2.0 * ts * tn)
