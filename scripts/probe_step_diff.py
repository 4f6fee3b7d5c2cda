"""Single-step mega-vs-real comparison at REAL problem shapes with
identical omegas (CPU interpret): which per-iteration output deviates?

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_step_diff.py
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hydra_pspec_tpu.models import mega, rgibbs
    from hydra_pspec_tpu.ops import cplx
    from hydra_pspec_tpu.utils.uvh5 import read_uvh5

    td = Path("/root/reference/test_data")
    bls, _ = read_uvh5(td / "vis-eor-fgs.uvh5")
    d = bls[0].vis + np.load(td / "0-1" / "noise.npy")
    noise_cov = np.load(td / "0-1" / "noise-cov.npy")
    fgmodes = np.load(td / "0-1" / "fgmodes.npy")[:, :12]
    eor_cov = np.load(td / "0-1" / "eor-cov.npy")
    nt, n = d.shape
    w = np.ones(n)
    ninv = 1.0 / np.diagonal(noise_cov)

    rng = np.random.default_rng(7)
    i = np.arange(n) - n // 2
    F = np.exp(-2j * np.pi * np.outer(i, i) / n)
    ps0 = np.clip(np.diagonal(F @ eor_cov @ F.conj().T).real, 0, None
                  ).astype(np.float32)

    B = 1
    ops1 = rgibbs.build_chain_operators(d, w, fgmodes, ninv,
                                        dtype=jnp.float32)
    ops_b = rgibbs.broadcast_chain_operators(ops1, B)
    ps_b = jnp.asarray(ps0)[None]

    # freq-basis omegas for the real engine
    oa = (rng.standard_normal((B, nt, n)) + 1j * rng.standard_normal(
        (B, nt, n))).astype(np.complex64) / np.sqrt(2)
    ob = (rng.standard_normal((B, nt, n)) + 1j * rng.standard_normal(
        (B, nt, n))).astype(np.complex64) / np.sqrt(2)

    # gcr_solve wants omega_a already in the DELAY basis (B, t, n):
    i2 = np.arange(n) - n // 2
    oa_delay_tn = np.einsum("kx,btx->btk", F.astype(np.complex64), oa)
    oa_c = cplx.C(jnp.asarray(oa_delay_tn.real.astype(np.float32)),
                  jnp.asarray(oa_delay_tn.imag.astype(np.float32)))
    ob_c = cplx.C(jnp.asarray(ob.real), jnp.asarray(ob.imag))
    sig, amps, sk = rgibbs.gcr_solve(ops_b, ps_b, oa_c, ob_c, solver="chol")
    model = sig + cplx.matmul(amps, rgibbs._t(ops_b.fg))
    res = cplx.C(ops_b.d_w.re - model.re, ops_b.d_w.im - model.im)
    ninv_b = ops_b.ninv_full_diag
    chi_real = (res.re**2 + res.im**2) * ninv_b[:, None, :]
    beta_real = jnp.sum(sk.re**2 + sk.im**2, axis=1)  # (B, n)

    # mega path, same omegas: kernel wants omega_a in the DELAY basis
    # (B, n, t) and omega_b time-transposed
    mops1, dims = mega.from_chain_operators(ops1)
    mops_b = mega.broadcast_mega_operators(mops1, B)
    ps_pad = mega.pad_ps(ps_b, dims)
    npad, tpad = dims.n, dims.t

    # delay-basis omega_a: the real engine's oa enters as F @ oa^T scaled?
    # rgibbs.gcr_solve applies: rhs_u += F oa ... replicate by
    # transforming: oa_delay = (F @ oa[b].T) / sqrt(n)? — use the engine's
    # own convention: mega's oar is drawn as sqrt(n/2)*normal in delay
    # space; the exact equivalent of a freq-basis draw is F @ oa (std
    # sqrt(n/2) per component).
    oa_delay = np.swapaxes(oa_delay_tn, 1, 2).astype(np.complex64)
    ob_t = np.swapaxes(ob, 1, 2)

    def pad_to(x, d2, d3):
        out = np.zeros((B, d2, d3), np.float32)
        out[:, : x.shape[1], : x.shape[2]] = x
        return jnp.asarray(out)

    res_m = mega.gcr_megastep(
        mops_b.pt_re, mops_b.pt_im, ps_pad, mops_b.nih,
        mops_b.nid_re, mops_b.nid_im, mops_b.dw_re, mops_b.dw_im,
        mops_b.ninv_full, mops_b.w,
        mops_b.fg_re, mops_b.fg_im, mops_b.g_re, mops_b.g_im,
        mops_b.mi_re, mops_b.mi_im, mops_b.a0_re, mops_b.a0_im,
        mops_b.f_re, mops_b.f_im,
        pad_to(oa_delay.real, npad, tpad), pad_to(oa_delay.imag, npad, tpad),
        pad_to(ob_t.real, npad, tpad), pad_to(ob_t.imag, npad, tpad),
        nfreqs_true=n, ntimes_true=nt, batch_tile=1,
        refine=int(__import__("os").environ.get("PROBE_REFINE", "1")),
        all_unflagged=True,
    )
    sig_re_m, sig_im_m, amp_re_m, amp_im_m, chi_m, beta_m, noise_m, bm_m = res_m

    chi_mega = np.swapaxes(np.asarray(chi_m)[:, :n, :nt], 1, 2)
    sig_mega = np.swapaxes(np.asarray(sig_re_m)[:, :n, :nt], 1, 2)

    cr = np.asarray(chi_real)
    sr = np.asarray(sig.re)
    print(f"chi  real mean {cr.mean():.6f}   mega mean "
          f"{chi_mega.mean():.6f}   ratio {chi_mega.mean()/cr.mean():.6f}")
    print(f"chi  max|diff| {np.abs(chi_mega - cr).max():.3e}")
    s = np.abs(sr).mean()
    print(f"sig  max|diff|/scale {np.abs(sig_mega - sr).max()/s:.3e}")
    br = np.asarray(beta_real)
    bm = np.asarray(beta_m)[:, :n]
    print(f"beta real mean {br.mean():.6e} mega mean {bm.mean():.6e} "
          f"ratio {bm.mean()/br.mean():.6f}")
    print(f"beta max rel diff {np.abs(bm/np.maximum(br,1e-20)-1).max():.3e}")

    # localize the chi difference
    dchi = (chi_mega - cr)[0]                       # (nt, n)
    per_f = np.abs(dchi).mean(axis=0)
    per_t = np.abs(dchi).mean(axis=1)
    topf = np.argsort(per_f)[-6:][::-1]
    topt = np.argsort(per_t)[-6:][::-1]
    print("worst freq channels:", topf, per_f[topf].round(4))
    print("worst times:        ", topt, per_t[topt].round(4))
    print("mean dchi per freq [first 8]:", dchi.mean(axis=0)[:8].round(5))
    print("mean dchi overall:", dchi.mean().round(6))
    # amps comparison
    am = np.swapaxes(np.asarray(amp_re_m)[:, : amps.re.shape[-1], :nt], 1, 2)
    ar = np.asarray(amps.re)
    sa = np.abs(ar).mean()
    print(f"amps max|diff|/scale {np.abs(am - ar).max()/sa:.3e}")

    # ------- exact complex128 oracle of the same draw --------------------
    ptc = (np.asarray(ops1.p_tilde.re)[0] + 1j * np.asarray(ops1.p_tilde.im)[0]).astype(np.complex128)
    nihd = np.asarray(ops1.nih_diag)[0].astype(np.float64)
    nid = (np.asarray(ops1.ni_d.re)[0] + 1j * np.asarray(ops1.ni_d.im)[0]).astype(np.complex128)
    fgc = (np.asarray(ops1.fg.re)[0] + 1j * np.asarray(ops1.fg.im)[0]).astype(np.complex128)
    gm = (np.asarray(ops1.g_mat.re)[0] + 1j * np.asarray(ops1.g_mat.im)[0]).astype(np.complex128)
    mi = (np.asarray(ops1.maa_inv.re)[0] + 1j * np.asarray(ops1.maa_inv.im)[0]).astype(np.complex128)
    a0c = (np.asarray(ops1.a0.re)[0] + 1j * np.asarray(ops1.a0.im)[0]).astype(np.complex128)
    dwc = (np.asarray(ops1.d_w.re)[0] + 1j * np.asarray(ops1.d_w.im)[0]).astype(np.complex128)
    ninvf = np.asarray(ops1.ninv_full_diag)[0].astype(np.float64)

    dd = np.sqrt(np.clip(np.asarray(ps0, np.float64), 0, None) / n)
    rc = (nid + nihd[None, :] * ob[0].astype(np.complex128)).T  # (n, t)
    ba = fgc.conj().T @ rc
    rc_red = rc - gm @ ba
    frc = F @ rc_red
    b_u = dd[:, None] * frc + oa_delay[0].astype(np.complex128)
    s_u = np.outer(dd, dd) * ptc + np.eye(n)
    u = np.linalg.solve(s_u, b_u)
    sk_e = dd[:, None] * u
    sig_e = (F.conj().T @ sk_e) / n                 # (n, t)
    amps_e = mi @ ba - gm.conj().T @ sig_e + a0c.T
    model_e = sig_e.T + amps_e.T @ fgc.T
    res_e = dwc - model_e
    chi_e = np.abs(res_e) ** 2 * ninvf[None, :]
    print(f"oracle chi mean {chi_e.mean():.6f}")
    print(f"real-vs-oracle chi maxdiff {np.abs(cr[0] - chi_e).max():.3e}  "
          f"mean {(cr[0]-chi_e).mean():+.6f}")
    print(f"mega-vs-oracle chi maxdiff {np.abs(chi_mega[0] - chi_e).max():.3e}  "
          f"mean {(chi_mega[0]-chi_e).mean():+.6f}")
    se = np.abs(sig_e.T).mean()
    print(f"real sig err/scale {np.abs(sr[0] - sig_e.T.real).max()/se:.3e}")
    print(f"mega sig err/scale {np.abs(sig_mega[0] - sig_e.T.real).max()/se:.3e}")


if __name__ == "__main__":
    main()
