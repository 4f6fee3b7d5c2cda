"""Driver for the multi-iteration chain kernel (ops/pallas/megachain.py):
K whole Gibbs iterations per Pallas program, bandpower conditional
included. Reuses the mega-path operator layout (models/mega.py).

Semantics are pinned against the single-step mega path + XLA sampler in
tests/test_megachain.py (external-randomness mode); the in-kernel-RNG
production mode is statistically validated on hardware (chi^2 ~ 1,
posterior-vs-truth) — the CPU interpreter stubs the core PRNG.

Reference: the Gibbs loop of hydra_pspec/pspec.py:606-638.
"""
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.cplx import C
from ..ops.pallas.megachain import gcr_megachain, _P_PAD
from ..parallel.mesh import BATCH_AXIS
from .mega import MegaDims, MegaOperators, pad_ps
from .rgibbs import RGibbsSample

MAX_PRIOR_BINS = _P_PAD  # kernel prior-lane capacity (runner demotion gate)


class MegaChainTables(NamedTuple):
    """Sublane-tiled InvGammaTable rows for the kernel."""

    tlog8: jax.Array  # (8, S) — log y, rows identical
    q8: jax.Array     # (8, S) — Q(alpha, y), rows identical


def make_chain_tables(mops: MegaOperators) -> MegaChainTables:
    tlog = np.asarray(mops.igt.log_y, dtype=np.float32)
    q = np.asarray(mops.igt.q, dtype=np.float32)
    return MegaChainTables(
        tlog8=jnp.asarray(np.tile(tlog[None], (8, 1))),
        q8=jnp.asarray(np.tile(q[None], (8, 1))),
    )


def prior_static_from(prior, dims: MegaDims):
    """Host-side (2, Nfreqs-or-n) prior -> static ((idx, lo, hi), ...) for
    the bounded bins. The prior must be concrete (numpy) — it is a run
    constant in every reference configuration."""
    p = np.asarray(prior)
    idxs = np.nonzero(np.any(p > 0, axis=0))[0]
    if len(idxs) > _P_PAD:
        raise NotImplementedError(
            f"megachain supports <= {_P_PAD} bounded prior bins; "
            f"got {len(idxs)} (use the mega/rgibbs engines)")
    return tuple(
        (int(i), float(p[1, i]), float(p[0, i])) for i in idxs)


def draw_chunk_randomness(key, sids, dims: MegaDims, k_total: int,
                          alpha_int: int):
    """Per-chain external randomness for the no-core-PRNG mode (CPU /
    interpret): each chain's stream is keyed by ``fold_in(key, sid)`` ONLY,
    so values are invariant to batch composition — mesh padding,
    multi-process slot layout, and shard placement leave every real
    chain's randomness (and with it the whole trajectory) bit-identical.
    Returns the dict gcr_megachain expects, arrays shaped (K, B, ...)."""
    n, t = dims.n, dims.t
    sa = np.float32(np.sqrt(0.5) * np.sqrt(dims.nfreqs))
    hf = np.float32(np.sqrt(0.5))
    K = k_total

    def one(sid):
        kc = jax.random.fold_in(key, sid)
        ka, kb, kg, ku = jax.random.split(kc, 4)
        oa = jax.random.normal(ka, (2, K, n, t), jnp.float32) * sa
        ob = jax.random.normal(kb, (2, K, n, t), jnp.float32) * hf
        gam = jax.random.gamma(kg, float(alpha_int), (K, n),
                               dtype=jnp.float32)
        u = jax.random.uniform(ku, (K, 128), dtype=jnp.float32)
        return oa[0], oa[1], ob[0], ob[1], gam, u

    oar, oai, obr, obi, gam, u = jax.vmap(one)(
        jnp.asarray(sids, dtype=jnp.int32))
    mv = lambda x: jnp.moveaxis(x, 0, 1)  # (B, K, ...) -> (K, B, ...)
    return dict(oa_re=mv(oar), oa_im=mv(oai), ob_re=mv(obr), ob_im=mv(obi),
                gam=mv(gam), u_pb=mv(u))


def _ln_post(noise_nu, bmask, ps, nfreqs):
    """(K, B) log posterior from the per-iteration vector outputs —
    identical form to models/mega.gibbs_step_mega."""
    sig_term = jnp.sum(
        bmask / jnp.maximum(ps, jnp.finfo(jnp.float32).tiny), axis=-1)
    return -(jnp.sum(noise_nu, axis=-1) + sig_term)


def run_chunk_megachain(
    mops: MegaOperators,
    tables: MegaChainTables,
    dims: MegaDims,
    ps_pad: jax.Array,
    k_total: int,
    prior_static=(),
    *,
    seed=None,
    randomness=None,
    chunk_key=None,
    sids=None,
    mesh=None,
    inkernel_rng: Optional[bool] = None,
    refine: int = 1,
    batch_tile: int = 8,
    store_cr: bool = True,
    chi_mask=None,
    inv_passes: int = 3,
    apply_passes: int = 3,
    warm_ns: int = 0,
    drift_max: float = 0.25,
    prefetch_rng: bool = False,
):
    """One kernel invocation of ``k_total`` iterations.

    ``chi_mask`` (optional, (nfreqs,) 0/1): lean mode only — the scalar
    chi^2 is averaged over the masked channels (e.g. unflagged ones, the
    reference's in-painting convention: flagged-channel "chi" is
    |model|^2 Ninv, not ~1), letting long flagged validation runs skip
    materializing per-channel chi.

    Randomness, one of three forms:
      * ``chunk_key`` (+ ``sids``, production): per-chain
        batch-composition-invariant streams — on TPU the in-kernel core
        PRNG seeded per (seed, sid, k); elsewhere (or with
        ``inkernel_rng=False``) per-chain external draws from
        :func:`draw_chunk_randomness`.
      * ``randomness`` dict (pinning tests): explicit (K, B, ...) arrays.
      * ``seed`` scalar: raw in-kernel mode (streams by batch position).

    ``mesh``: a 1D device mesh — the kernel call (and external randomness
    generation) runs under ``shard_map`` with the (baseline x chain) batch
    axis split over the mesh and chain constants sharded alongside; shared
    operators (F, tables, seed) are replicated. No collectives run inside
    (the sampler is embarrassingly parallel, SURVEY.md §2.6/2.7).

    ``warm_ns > 0``: carry the system inverse across iterations in VMEM
    and refresh it with that many Newton-Schulz steps instead of a full
    rebuild when the chain's relative bandpower move stays under
    ``drift_max``. Returns (ps_pad_final, RGibbsSample stacked over K)."""
    if inkernel_rng is None:
        inkernel_rng = randomness is None and (
            chunk_key is None or jax.default_backend() == "tpu")
    B = ps_pad.shape[0]
    if sids is None:
        sids = jnp.arange(B, dtype=jnp.int32)
    lean = not store_cr
    kwargs = dict(
        nfreqs_true=dims.nfreqs, ntimes_true=dims.ntimes,
        k_total=k_total, alpha_int=dims.ntimes - 1,
        prior_static=tuple(prior_static), batch_tile=batch_tile,
        refine=refine, all_unflagged=dims.all_unflagged,
        inkernel_rng=inkernel_rng, inv_passes=inv_passes,
        apply_passes=apply_passes,
        warm_ns=warm_ns, drift_max=drift_max, prefetch_rng=prefetch_rng,
        lean=lean,
    )
    batched_ops = (
        mops.pt_re, mops.pt_im, mops.nih,
        mops.nid_re, mops.nid_im, mops.dw_re, mops.dw_im,
        mops.ninv_full, mops.w,
        mops.fg_re, mops.fg_im, mops.g_re, mops.g_im,
        mops.mi_re, mops.mi_im, mops.a0_re, mops.a0_im,
    )
    shared = (mops.f_re, mops.f_im, tables.tlog8, tables.q8)

    def _rng_args(sid, ck, rnd):
        if rnd is not None:
            return rnd
        if ck is not None:
            if inkernel_rng:
                return dict(
                    seed=jax.random.randint(ck, (), -2**31, 2**31 - 1,
                                            dtype=jnp.int32),
                    sids=sid,
                )
            return draw_chunk_randomness(
                ck, sid, dims, k_total, dims.ntimes - 1)
        return dict(seed=seed, sids=sid)

    def _call(bops, shr, ps, sid, ck, rnd):
        return gcr_megachain(
            *bops, shr[0], shr[1], shr[2], shr[3], ps,
            **_rng_args(sid, ck, rnd), **kwargs,
        )

    if mesh is None:
        outs = _call(batched_ops, shared, ps_pad, sids, chunk_key,
                     randomness)
    else:
        from jax.experimental.shard_map import shard_map

        bspec = P(BATCH_AXIS)
        rep = P()
        kbspec = P(None, BATCH_AXIS)
        base_specs = (tuple(bspec for _ in batched_ops),
                      tuple(rep for _ in shared), bspec, bspec)
        out_specs = tuple([kbspec] * (4 if lean else 8) + [bspec])
        # None operands can't carry shard_map specs — bind whichever
        # randomness form is absent into the closure instead.
        if randomness is not None:
            fn = shard_map(
                lambda b, s, p, i, r: _call(b, s, p, i, None, r),
                mesh=mesh,
                in_specs=base_specs + ({k: kbspec for k in randomness},),
                out_specs=out_specs, check_rep=False,
            )
            outs = fn(batched_ops, shared, ps_pad, sids, randomness)
        elif chunk_key is not None:
            fn = shard_map(
                lambda b, s, p, i, c: _call(b, s, p, i, c, None),
                mesh=mesh,
                in_specs=base_specs + (rep,),
                out_specs=out_specs, check_rep=False,
            )
            outs = fn(batched_ops, shared, ps_pad, sids, chunk_key)
        else:
            raise ValueError(
                "mesh execution needs chunk_key or randomness (a raw "
                "position-seeded scalar seed is not composition-invariant)")

    nf, nt, nm = dims.nfreqs, dims.ntimes, dims.nmodes
    if store_cr:
        (sig_re, sig_im, amp_re, amp_im, chi, ps_k, noise_nu, bmask,
         ps_final) = outs
        ln_post = _ln_post(noise_nu, bmask, ps_k, nf)
        sample = RGibbsSample(
            signal_cr=C(jnp.swapaxes(sig_re[:, :, :nf, :nt], 2, 3),
                        jnp.swapaxes(sig_im[:, :, :nf, :nt], 2, 3)),
            ps=ps_k[:, :, :nf],
            fg_amps=C(jnp.swapaxes(amp_re[:, :, :nm, :nt], 2, 3),
                      jnp.swapaxes(amp_im[:, :, :nm, :nt], 2, 3)),
            chisq=jnp.swapaxes(chi[:, :, :nf, :nt], 2, 3),
            ln_post=ln_post,
        )
    else:
        # lean kernel outputs: chi already time-reduced in VMEM
        (chi_t, ps_k, noise_nu, bmask, ps_final) = outs
        ln_post = _ln_post(noise_nu, bmask, ps_k, nf)
        zero = jnp.zeros((), dtype=jnp.float32)
        if chi_mask is not None:
            cm = jnp.asarray(chi_mask, jnp.float32)
            chi_mean = jnp.sum(
                chi_t[:, :, :nf] * cm[None, None, :], axis=2
            ) / (jnp.sum(cm) * nt)
        else:
            chi_mean = jnp.sum(chi_t[:, :, :nf], axis=2) / (nf * nt)
        sample = RGibbsSample(
            signal_cr=C(zero, zero), ps=ps_k[:, :, :nf],
            fg_amps=C(zero, zero), chisq=chi_mean, ln_post=ln_post,
        )
    return ps_final, sample


def auto_chunk(niter: int, batch: int, dims: MegaDims,
               store_cr: bool) -> int:
    """Iterations per Pallas program (K) when the caller doesn't pin one.

    Small batches pay fixed per-dispatch costs — the ~25-30 ms remote
    dispatch round-trip and the per-chunk exact inverse rebuild (the
    warm-start carry resets at k=0) — so K scales up as the batch shrinks,
    targeting a roughly constant ``batch * K`` work quantum per dispatch.
    K is quantized to multiples of 100 (each distinct (B, K) pair is its
    own Mosaic executable; quantizing keeps the compile set small) and
    capped so one chunk's HBM sample outputs stay under ~1 GiB.
    """
    target = max(100, 6400 // max(batch, 1))    # B=4 -> 1600, B=16 -> 400
    if store_cr:
        n, t, m = dims.n, dims.t, dims.m
        bytes_per = 4 * (3 * n * t + 2 * m * t + 3 * n)
    else:
        bytes_per = 4 * 4 * dims.n              # lean: 4 (B, n) vectors
    cap = (1 << 30) // max(1, batch * bytes_per)
    k = min(target, max(100, cap), 1600, max(100, niter))
    return max(100, (k // 100) * 100)


def run_chain_megachain(
    key,
    mops: MegaOperators,
    dims: MegaDims,
    ps0_pad: jax.Array,
    prior,
    niter: int,
    *,
    sids=None,
    mesh=None,
    inkernel_rng: Optional[bool] = None,
    tables: Optional[MegaChainTables] = None,
    store_cr: bool = True,
    chi_mask=None,
    refine: int = 1,
    batch_tile: int = 8,
    chunk: Optional[int] = None,
    inv_passes: int = 3,
    apply_passes: int = 3,
    warm_ns: int = 0,
    drift_max: float = 0.25,
    prefetch_rng: bool = False,
):
    """Full chain via chunked kernel invocations (chunk defaults to
    :func:`auto_chunk` — batch-dependent, larger for small batches so
    e.g. 4-chain validation runs amortize dispatch costs over K=1600
    iterations per program); per-chain randomness streams keyed on
    (fold_in(key, chunk), sid) — in-kernel core PRNG on TPU, external
    draws elsewhere (``inkernel_rng`` overrides). ``mesh``: run sharded
    over a 1D device mesh (see run_chunk_megachain). ``tables``: pass
    pre-built host-side InvGammaTable rows when ``mops.igt`` is no longer
    host-addressable (multi-process globally-replicated operators).
    Returns (ps_pad_final, samples stacked over niter)."""
    if tables is None:
        tables = make_chain_tables(mops)
    prior_static = prior_static_from(prior, dims)
    if chunk is None:
        chunk = auto_chunk(niter, ps0_pad.shape[0], dims, store_cr)
    chunk = min(niter, chunk)
    ps = ps0_pad
    pieces = []
    it = 0
    ci = 0
    while it < niter:
        k_total = min(chunk, niter - it)
        ps, sample = run_chunk_megachain(
            mops, tables, dims, ps, k_total, prior_static,
            chunk_key=jax.random.fold_in(key, ci), sids=sids, mesh=mesh,
            inkernel_rng=inkernel_rng, refine=refine, batch_tile=batch_tile,
            store_cr=store_cr, chi_mask=chi_mask, inv_passes=inv_passes,
            apply_passes=apply_passes,
            warm_ns=warm_ns, drift_max=drift_max, prefetch_rng=prefetch_rng,
        )
        pieces.append(sample)
        it += k_total
        ci += 1
    if len(pieces) == 1:
        return ps, pieces[0]
    cat = lambda *xs: (jnp.concatenate(xs, 0)
                       if getattr(xs[0], "ndim", 0) else xs[0])
    return ps, jax.tree.map(cat, *pieces)
