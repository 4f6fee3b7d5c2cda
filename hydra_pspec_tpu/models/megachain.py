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
from .mega import MegaDims, MegaOperators, from_chain_operators, pad_ps
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


# --- grouped time-flags execution (tflags at megachain speed) ------------

class TflagsMegaSetup(NamedTuple):
    """Interleaved grouped-megachain layout for one flag signature.

    Replaces the per-iteration-per-group factorizations of the real-engine
    tflags path (models/tflags.py) with ONE grouped kernel launch: each
    chain spans G consecutive rows (chain-major), row chain*G + g carrying
    the operators of flag-pattern time group g; the kernel pools the delay
    statistics over the chain's rows and draws one bandpower state per
    chain (reference pooled-conditional semantics, pspec.py:104-108 with
    alpha from the total time count)."""

    mops: MegaOperators   # (Bc*G, ...) rows, chain-major
    dims: MegaDims        # ntimes = TOTAL true times; all_unflagged False
    group_times: tuple    # per row-group true time count (0 = dummy pad)
    group_idx: tuple      # per REAL group: time indices (reassembly)


def build_tflags_mega_setup(groups) -> TflagsMegaSetup:
    """Stacked per-group operators -> grouped-megachain setup.

    ``groups``: sequence of ``tflags.TimeGroupReal`` whose ``ops`` are
    batch-stacked RChainOperators (one stack per time group, identical
    chain batch — the contract of runner's tflags signature grouping). G
    is padded up to a power of two <= 8 with zero-operator dummy groups
    (``group_times`` 0: omegas fully masked, exactly zero contribution to
    every pooled statistic). The attached inverse-gamma table is rebuilt
    at alpha + 1 = TOTAL times — each group's own table carries its
    group's alpha, which is the wrong shape for the pooled conditional.
    """
    from ..ops.invgamma import make_invgamma_table

    g_real = len(groups)
    G = 1
    while G < g_real:
        G *= 2
    if G > 8:
        raise ValueError(
            f"grouped megachain supports <= 8 time groups; got {g_real}")
    t_req = max(-(-g.ops.d_w.shape[1] // 128) * 128 for g in groups)
    per = [from_chain_operators(g.ops, t_pad=t_req) for g in groups]
    dims0 = per[0][1]
    ntimes_total = sum(d.ntimes for _, d in per)

    batched_names = [f for f in MegaOperators._fields
                     if f not in ("f_re", "f_im", "igt")]
    mops_list = [m for m, _ in per]
    if G > g_real:
        zero = {name: jnp.zeros_like(getattr(mops_list[0], name))
                for name in batched_names}
        mops_list = mops_list + [mops_list[0]._replace(**zero)] \
            * (G - g_real)

    def interleave(xs):
        s = jnp.stack(xs, axis=1)               # (Bc, G, ...)
        return s.reshape((-1,) + s.shape[2:])   # (Bc*G, ...) chain-major

    inter = {name: interleave([getattr(m, name) for m in mops_list])
             for name in batched_names}
    mops = MegaOperators(
        **inter, f_re=per[0][0].f_re, f_im=per[0][0].f_im,
        igt=make_invgamma_table(ntimes_total),
    )
    dims = MegaDims(dims0.nfreqs, ntimes_total, dims0.nmodes,
                    dims0.n, t_req, dims0.m, False)
    group_times = tuple(d.ntimes for _, d in per) + (0,) * (G - g_real)
    group_idx = tuple(np.asarray(g.idx) for g in groups)
    return TflagsMegaSetup(mops, dims, group_times, group_idx)


def draw_chunk_randomness_tflags(key, sids_row, sidc_rows, G,
                                 dims: MegaDims, k_total: int,
                                 alpha_int: int):
    """Grouped-mode external randomness (CPU / interpret twin of the
    in-kernel streams): omegas are drawn per ROW from
    ``fold_in(key, sids_row[r])``; the gamma/uniform draws of the pooled
    bandpower conditional come from the CHAIN stream
    ``fold_in(key, sidc + 2**30)`` and are identical for all G rows of a
    chain (same disjoint-stream convention as the kernel's ``sidc + 1<<30``
    seeding). ``sidc_rows`` is the per-row chain id vector (constant
    within each chain's G-row block)."""
    n, t = dims.n, dims.t
    sa = np.float32(np.sqrt(0.5) * np.sqrt(dims.nfreqs))
    hf = np.float32(np.sqrt(0.5))
    K = k_total

    def row(sid_row):
        kc = jax.random.fold_in(key, sid_row)
        ka, kb = jax.random.split(kc, 2)
        oa = jax.random.normal(ka, (2, K, n, t), jnp.float32) * sa
        ob = jax.random.normal(kb, (2, K, n, t), jnp.float32) * hf
        return oa[0], oa[1], ob[0], ob[1]

    def chain(sidc):
        kc = jax.random.fold_in(key, sidc + 2 ** 30)
        kg, ku = jax.random.split(kc, 2)
        gam = jax.random.gamma(kg, float(alpha_int), (K, n),
                               dtype=jnp.float32)
        u = jax.random.uniform(ku, (K, 128), dtype=jnp.float32)
        return gam, u

    oar, oai, obr, obi = jax.vmap(row)(
        jnp.asarray(sids_row, dtype=jnp.int32))
    gam_c, u_c = jax.vmap(chain)(
        jnp.asarray(sidc_rows, dtype=jnp.int32)[::G])
    rep = lambda x: jnp.repeat(x, G, axis=0)    # (Bc, ...) -> (Bc*G, ...)
    mv = lambda x: jnp.moveaxis(x, 0, 1)        # (B, K, ...) -> (K, B, ...)
    return dict(oa_re=mv(oar), oa_im=mv(oai), ob_re=mv(obr), ob_im=mv(obi),
                gam=mv(rep(gam_c)), u_pb=mv(rep(u_c)))


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
    group_times=(),
    sidc=None,
    group_idx=(),
):
    """One kernel invocation of ``k_total`` iterations.

    ``group_times`` non-empty selects the grouped time-flags kernel mode
    (see :class:`TflagsMegaSetup`): ``mops``/``ps_pad``/``sids`` carry
    chain-major (chain, group) ROWS, ``sidc`` the per-row chain stream
    ids, ``dims.ntimes`` the TOTAL true time count, and ``group_idx`` the
    real groups' time indices for sample reassembly. The returned sample
    batch axis is CHAINS (rows pooled/reassembled).

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
    G = len(group_times) if group_times else 1
    if sids is None:
        sids = jnp.arange(B, dtype=jnp.int32)
    if G > 1:
        if sidc is None:
            sidc = jnp.repeat(jnp.arange(B // G, dtype=jnp.int32), G)
        sids = {"sids": jnp.asarray(sids, jnp.int32),
                "sidc": jnp.asarray(sidc, jnp.int32)}
    lean = not store_cr
    kwargs = dict(
        nfreqs_true=dims.nfreqs, ntimes_true=dims.ntimes,
        k_total=k_total, alpha_int=dims.ntimes - 1,
        prior_static=tuple(prior_static), batch_tile=batch_tile,
        refine=refine, all_unflagged=dims.all_unflagged,
        inkernel_rng=inkernel_rng, inv_passes=inv_passes,
        apply_passes=apply_passes,
        warm_ns=warm_ns, drift_max=drift_max, prefetch_rng=prefetch_rng,
        lean=lean, group_times=tuple(group_times),
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
        if isinstance(sid, dict):
            s_row, s_chain = sid["sids"], sid["sidc"]
        else:
            s_row, s_chain = sid, None
        if rnd is not None:
            return rnd
        if ck is not None:
            if inkernel_rng:
                d = dict(
                    seed=jax.random.randint(ck, (), -2**31, 2**31 - 1,
                                            dtype=jnp.int32),
                    sids=s_row,
                )
                if s_chain is not None:
                    d["sidc"] = s_chain
                return d
            if G > 1:
                return draw_chunk_randomness_tflags(
                    ck, s_row, s_chain, G, dims, k_total, dims.ntimes - 1)
            return draw_chunk_randomness(
                ck, s_row, dims, k_total, dims.ntimes - 1)
        d = dict(seed=seed, sids=s_row)
        if s_chain is not None:
            d["sidc"] = s_chain
        return d

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
        # grouped mode: the sid operand is a {"sids", "sidc"} bundle; rows
        # shard chain-whole (the runner pads CHAINS to the device count,
        # so every shard's row block is G-aligned — the in-tile pooling
        # blocks never straddle shards)
        sid_spec = ({"sids": bspec, "sidc": bspec} if G > 1 else bspec)
        base_specs = (tuple(bspec for _ in batched_ops),
                      tuple(rep for _ in shared), bspec, sid_spec)
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
    if G > 1:
        return _assemble_grouped(outs, dims, G, group_times, group_idx,
                                 store_cr, chi_mask)
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


def _assemble_grouped(outs, dims: MegaDims, G, group_times, group_idx,
                      store_cr, chi_mask):
    """Grouped-mode kernel outputs (rows = chain x group) -> per-CHAIN
    RGibbsSample: pool the per-iteration vector statistics over each
    chain's G rows, take the (identical-per-row) pooled ps from the
    group-0 rows, and reassemble the per-time sample fields into the
    original time order via ``group_idx`` (models/tflags.py scatter
    semantics). ``ps_final`` stays per-row (the chain continuation
    state; chains' values sit at rows ::G)."""
    nf, nt, nm = dims.nfreqs, dims.ntimes, dims.nmodes
    ps_final = outs[-1]
    Bc = outs[-1].shape[0] // G

    def dei(x):  # (K, Bc*G, ...) -> (K, Bc, G, ...)
        return x.reshape(x.shape[0], Bc, G, *x.shape[2:])

    if store_cr:
        (sig_re, sig_im, amp_re, amp_im, chi, ps_k, noise_nu, bmask,
         _) = outs
        noise_c = jnp.sum(dei(noise_nu), axis=2)
        bmask_c = jnp.sum(dei(bmask), axis=2)
        ps_c = dei(ps_k)[:, :, 0]
        ln_post = _ln_post(noise_c, bmask_c, ps_c, nf)
        K = ps_k.shape[0]
        f32 = jnp.float32
        sre = jnp.zeros((K, Bc, nt, nf), f32)
        sim = jnp.zeros((K, Bc, nt, nf), f32)
        are = jnp.zeros((K, Bc, nt, nm), f32)
        aim = jnp.zeros((K, Bc, nt, nm), f32)
        chf = jnp.zeros((K, Bc, nt, nf), f32)
        dsig_re, dsig_im = dei(sig_re), dei(sig_im)
        damp_re, damp_im = dei(amp_re), dei(amp_im)
        dchi = dei(chi)
        for g, idx in enumerate(group_idx):
            tg = int(group_times[g])
            idx = np.asarray(idx)
            blk = lambda x, d: jnp.swapaxes(x[:, :, g, :d, :tg], 2, 3)
            sre = sre.at[:, :, idx, :].set(blk(dsig_re, nf))
            sim = sim.at[:, :, idx, :].set(blk(dsig_im, nf))
            are = are.at[:, :, idx, :].set(blk(damp_re, nm))
            aim = aim.at[:, :, idx, :].set(blk(damp_im, nm))
            chf = chf.at[:, :, idx, :].set(blk(dchi, nf))
        sample = RGibbsSample(
            signal_cr=C(sre, sim), ps=ps_c[:, :, :nf],
            fg_amps=C(are, aim), chisq=chf, ln_post=ln_post,
        )
    else:
        (chi_t, ps_k, noise_nu, bmask, _) = outs
        chi_c = jnp.sum(dei(chi_t), axis=2)        # pooled over groups
        noise_c = jnp.sum(dei(noise_nu), axis=2)
        bmask_c = jnp.sum(dei(bmask), axis=2)
        ps_c = dei(ps_k)[:, :, 0]
        ln_post = _ln_post(noise_c, bmask_c, ps_c, nf)
        zero = jnp.zeros((), dtype=jnp.float32)
        if chi_mask is not None:
            cm = jnp.asarray(chi_mask, jnp.float32)
            chi_mean = jnp.sum(
                chi_c[:, :, :nf] * cm[None, None, :], axis=2
            ) / (jnp.sum(cm) * nt)
        else:
            chi_mean = jnp.sum(chi_c[:, :, :nf], axis=2) / (nf * nt)
        sample = RGibbsSample(
            signal_cr=C(zero, zero), ps=ps_c[:, :, :nf],
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
    group_times=(),
    sidc=None,
    group_idx=(),
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
            group_times=group_times, sidc=sidc, group_idx=group_idx,
        )
        pieces.append(sample)
        it += k_total
        ci += 1
    if len(pieces) == 1:
        return ps, pieces[0]
    cat = lambda *xs: (jnp.concatenate(xs, 0)
                       if getattr(xs[0], "ndim", 0) else xs[0])
    return ps, jax.tree.map(cat, *pieces)
