"""Multi-iteration chain kernel: K whole Gibbs iterations per Pallas
program — draw, solve, statistics AND the bandpower conditional all
in-kernel, with the bandpower state carried in VMEM scratch.

Why: the per-iteration cost floor of the single-step path is set by (a)
the ~45 XLA ops around the kernel (RNG, bandpower sampler, ln_post), (b)
the per-pallas_call DMA of all chain constants, and (c) fixed per-grid-step
overhead. Running K iterations inside ONE program with grid
``(batch_tiles, K)`` amortizes all three: chain constants have block index
maps that depend only on the tile index, so Pallas's pipeline emitter
fetches them once per tile (the index-unchanged copy is skipped); the
bandpower draw happens on the VPU between solves; only the per-iteration
sample outputs stream back to HBM.

In-kernel bandpower conditional (mirrors ops/invgamma.py semantics,
reference hydra_pspec/pspec.py:67-127):
  * free bins: ``ps_k = beta_k / Gamma(alpha)`` with the exact
    integer-alpha draw ``Gamma(alpha) = -sum_{r<alpha} log u_r``
    (alpha = Ntimes - 1 is a run constant).
  * prior bins (static index list): truncated inverse-gamma inversion
    sampling through the tabulated ``Q(alpha+1, y)`` (InvGammaTable),
    with searchsorted/gather realized as one-hot masked sums over the
    table lanes (Mosaic has no gather).

RNG: the TPU core PRNG (pltpu.prng_random_bits), seeded per (tile, k)
grid step; Box-Muller for normals. The interpreter stubs the PRNG, so
CPU tests drive the ``inkernel_rng=False`` mode where all randomness
(omegas, gamma variates, prior uniforms) is passed in as per-iteration
inputs — that mode is pinned against the single-step + XLA-sampler
composition in tests/test_megachain.py.

Replaces reference hot loop pspec.py:606-638 (the per-iteration Python
loop over gibbs_step_fgmodes) at the kernel level.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megastep import _draw_body, _eye, _normal_quad_t, bits_to_normals
from .spd_inv import _bmm1, _spd_inv_into
from .spd_solve import _bmm


def _uniform_bits(shape, dtype=jnp.float32):
    """(0, 1)-open uniforms from the core PRNG (top 24 bits; int32 detour
    — Mosaic has no uint32->float cast)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    scale = jnp.asarray(1.0 / (1 << 24), dtype)
    return ((bits >> 8).astype(jnp.int32).astype(dtype) * scale
            + jnp.asarray(2.0 ** -25, dtype))


def _gather_lane(row, idx):
    """row (1, 1, S); idx (bt, p) int32 -> (bt, p) values row[idx]."""
    s = row.shape[2]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    oh = (lanes == idx[:, :, None]).astype(row.dtype)
    return jnp.sum(oh * row, axis=2)


def _q_at(tlog, qrow, y):
    """Q(alpha, y) by linear interp in log y — in-kernel twin of
    ops/invgamma._table_q_at (same clamping semantics)."""
    s = tlog.shape[2]
    fdt = y.dtype
    ly = jnp.log(jnp.maximum(y, jnp.finfo(fdt).tiny))
    cnt = jnp.sum((tlog < ly[:, :, None]).astype(jnp.int32), axis=2)
    idx = jnp.clip(cnt, 1, s - 1)
    l0 = _gather_lane(tlog, idx - 1)
    l1 = _gather_lane(tlog, idx)
    q0 = _gather_lane(qrow, idx - 1)
    q1 = _gather_lane(qrow, idx)
    t = jnp.clip((ly - l0) / jnp.maximum(l1 - l0, 1e-30), 0.0, 1.0)
    return q0 + t * (q1 - q0)


def _y_at(tlog, qrow, c):
    """Inverse of the table: y with Q(alpha, y) = c — twin of
    ops/invgamma._table_y_at. q is decreasing in y, so the reference
    searches the reversed array; here the reversal is folded into the
    gather indices (qr[i] == q[S-1-i])."""
    s = tlog.shape[2]
    cnt = jnp.sum((qrow < c[:, :, None]).astype(jnp.int32), axis=2)
    idx = jnp.clip(cnt, 1, s - 1)
    j0 = s - idx        # reversed idx-1
    j1 = s - 1 - idx    # reversed idx
    q0 = _gather_lane(qrow, j0)
    q1 = _gather_lane(qrow, j1)
    l0 = _gather_lane(tlog, j0)
    l1 = _gather_lane(tlog, j1)
    t = jnp.clip((c - q0) / jnp.maximum(q1 - q0, 1e-30), 0.0, 1.0)
    return jnp.exp(l0 + t * (l1 - l0))


_P_PAD = 8  # prior-bin lanes (reference window: 7 of 120 bins)


def _sample_bandpowers_body(beta, g, u_pb, prior_static, tlog, qrow):
    """In-kernel bandpower conditional. beta, g: (bt, n); u_pb: (bt, _P_PAD)
    uniforms; prior_static: static tuple of (bin_index, lo, hi); tlog/qrow:
    (1, 1, S) table rows. Returns ps_new (bt, n).

    Pad delay bins carry beta == 0 and so stay exactly 0 (free = 0 / g)."""
    bt, n = beta.shape
    fdt = beta.dtype
    free = beta / g
    if not prior_static:
        return free

    # static one-hot selection of the prior bins into _P_PAD lanes
    r = jax.lax.broadcasted_iota(jnp.int32, (n, _P_PAD), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (n, _P_PAD), 1)
    sel = None
    for j, (idx, _, _) in enumerate(prior_static):
        term = (r == idx) & (cc == j)
        sel = term if sel is None else (sel | term)
    sel = sel.astype(fdt)                               # (n, _P_PAD)

    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _P_PAD), 1)
    lo = jnp.full((1, _P_PAD), 1.0, fdt)
    hi = jnp.full((1, _P_PAD), 10.0, fdt)
    for j, (_, lo_j, hi_j) in enumerate(prior_static):
        lo = jnp.where(lane8 == j, jnp.asarray(lo_j, fdt), lo)
        hi = jnp.where(lane8 == j, jnp.asarray(hi_j, fdt), hi)

    beta_sub = jnp.sum(beta[:, :, None] * sel[None], axis=1)   # (bt, _P_PAD)
    p_lo = _q_at(tlog, qrow, beta_sub / lo)
    p_hi = _q_at(tlog, qrow, beta_sub / hi)
    c = p_lo + u_pb * (p_hi - p_lo)
    y = _y_at(tlog, qrow, c)
    x = beta_sub / jnp.maximum(y, jnp.finfo(fdt).tiny)
    x = jnp.clip(x, lo, hi)                                    # (bt, _P_PAD)

    scat = jnp.sum(x[:, None, :] * sel[None], axis=2)          # (bt, n)
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    has = None
    for (idx, _, _) in prior_static:
        term = lane_n == idx
        has = term if has is None else (has | term)
    has = has.astype(fdt)
    return free * (1.0 - has) + scat * has


def _megachain_kernel(nfreqs_true: int, ntimes_true: int, refine: int,
                      all_unflagged: bool, inkernel_rng: bool,
                      k_total: int, alpha_int: int, prior_static,
                      inv_passes: int, apply_passes: int, warm_ns: int,
                      drift_max: float, prefetch_rng: bool, lean: bool,
                      group_times, *refs):
    # group_times: () = plain mode (one operator set per chain). Non-empty
    # = grouped time-flags mode: every chain occupies G = len(group_times)
    # consecutive rows (chain-major, G | batch_tile), row r solving the
    # (r % G)-th flag-pattern time group; group_times[g] is that group's
    # true time count (0 = dummy pad group: zero operators, zero mask).
    # The bandpower conditional pools beta over each chain's G rows and
    # draws ONE chained ps per chain (alpha_int = total times - 1), which
    # every row of the chain computes identically from identical pooled
    # inputs (gamma/uniform streams are seeded per CHAIN, not per row).
    G = len(group_times) if group_times else 1
    nscr = 6 + (1 if warm_ns > 0 else 0) \
        + (6 if (inkernel_rng and prefetch_rng) else 0)
    nout = 5 if lean else 9
    if inkernel_rng:
        ins = refs[: len(refs) - nout - nscr]
        if G > 1:
            (pt_re, pt_im, nih_ref,
             nid_re, nid_im, dw_re, dw_im, ninvf_ref, w_ref,
             fg_re, fg_im, g_re, g_im, mi_re, mi_im,
             a0_re, a0_im, f_re, f_im, tlog_ref, q_ref, ps0_ref,
             seed_ref, sid_ref, sidc_ref) = ins
        else:
            (pt_re, pt_im, nih_ref,
             nid_re, nid_im, dw_re, dw_im, ninvf_ref, w_ref,
             fg_re, fg_im, g_re, g_im, mi_re, mi_im,
             a0_re, a0_im, f_re, f_im, tlog_ref, q_ref, ps0_ref,
             seed_ref, sid_ref) = ins
    else:
        (pt_re, pt_im, nih_ref,
         nid_re, nid_im, dw_re, dw_im, ninvf_ref, w_ref,
         fg_re, fg_im, g_re, g_im, mi_re, mi_im,
         a0_re, a0_im, f_re, f_im, tlog_ref, q_ref, ps0_ref,
         oa_re, oa_im, ob_re, ob_im, gam_ref, u_ref) = refs[
             : len(refs) - nout - nscr]
    if lean:
        # lean mode: the per-(channel, time) fields never leave VMEM —
        # only the time-reduced chi and the per-iteration vectors stream
        # back to HBM (~5x less per-iteration write traffic)
        (chit_o, ps_o, noise_o, bmask_o, psf_o) = refs[
            len(refs) - nout - nscr: len(refs) - nscr]
    else:
        (sig_re_o, sig_im_o, amp_re_o, amp_im_o,
         chi_o, ps_o, noise_o, bmask_o, psf_o) = refs[
            len(refs) - nout - nscr: len(refs) - nscr]
    scratches = refs[len(refs) - nscr:]
    (e_s, w_s, inv_s, x_s, ps_s, psx_s) = scratches[:6]
    off = 6
    tmp_s = None
    if warm_ns > 0:
        tmp_s = scratches[off]
        off += 1
    rng_s = scratches[off:off + 6] if (inkernel_rng and prefetch_rng) \
        else None
    bt, n, _ = pt_re.shape
    t = nid_re.shape[2]
    fdt = pt_re.dtype
    i = pl.program_id(0)
    k = pl.program_id(1)

    # bandpower state: seed from the input at the first inner step
    @pl.when(k == 0)
    def _():
        ps_s[:] = ps0_ref[:]

    ps = ps_s[:]

    g_tmask = None
    if G > 1:
        # per-row valid-time mask: row r of the (G-aligned) tile solves
        # time group r % G with group_times[r % G] true times
        rowg = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, t), 0) % G
        tlane = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, t), 2)
        cnt = jnp.zeros((bt, 1, t), jnp.int32)
        for g, tg in enumerate(group_times):
            cnt = jnp.where(rowg == g, jnp.int32(tg), cnt)
        g_tmask = (tlane < cnt).astype(fdt)

    if inkernel_rng:
        half = jnp.asarray(np.sqrt(0.5), fdt)
        sa = half * jnp.sqrt(jnp.asarray(float(nfreqs_true), fdt))
        a_pad = -(-alpha_int // 8) * 8
        ntimes_draw = max(group_times) if G > 1 else ntimes_true
        td = min(t, -(-ntimes_draw // 128) * 128)

        def draw_rand(seed_word):
            # Per-chain streams: each chain's randomness is a fixed-shape
            # draw sequence from a PRNG seeded on (run seed, global chain
            # stream id, iteration) ONLY — so mesh sharding, multi-process
            # slot padding, and tile placement leave every real chain's
            # samples bit-identical to a single-device run (the reference's
            # per-process reseeding, pspec.py:186-197, attempted this and
            # had a known bug).
            # Two fused bit draws per chain (omega block + gamma/u block):
            # the naive form (6+ thin draws/chain) measured 0.9 ms/iter
            # slower.
            ob4_l, ug_l = [], []
            for c in range(bt):
                # sid_ref holds the FULL (1, bp) row (Mosaic requires SMEM
                # blocks equal to the array dims); index this tile's chains
                pltpu.prng_seed(seed_word, sid_ref[0, i * bt + c])
                ob4_l.append(pltpu.bitcast(
                    pltpu.prng_random_bits((1, 4, n, td)), jnp.uint32))
                if G > 1:
                    # gamma/uniform draws come from the CHAIN's stream
                    # (identical for all G rows of a chain -> identical
                    # pooled bandpower draw per row); the +2^30 offset
                    # keeps chain streams disjoint from row streams
                    pltpu.prng_seed(seed_word,
                                    sidc_ref[0, i * bt + c] + (1 << 30))
                ug_l.append(pltpu.bitcast(
                    pltpu.prng_random_bits((1, a_pad + 8, n)), jnp.uint32))
            ob4 = jnp.concatenate(ob4_l, 0)        # (bt, 4, n, td)
            ug = jnp.concatenate(ug_l, 0)          # (bt, a_pad + 8, n)
            # Box-Muller over the whole tile at once (one transcendental
            # group per bt*2*n*td values instead of per-chain slivers)
            obr, obi = bits_to_normals(ob4[:, 0], ob4[:, 1], fdt)
            oar, oai = bits_to_normals(ob4[:, 2], ob4[:, 3], fdt)

            def padt(x):
                if td < t:
                    return jnp.concatenate(
                        [x, jnp.zeros((bt, n, t - td), fdt)], axis=2)
                return x

            obr = padt(obr) * half
            obi = padt(obi) * half
            oar = padt(oar) * sa
            oai = padt(oai) * sa
            # Gamma(alpha), exact integer-alpha form -log(prod u_r), with
            # the logs taken on GROUP PRODUCTS of 8 uniforms: same
            # distribution (log prod == sum log), 8x fewer transcendentals.
            # f32 underflow of an 8-product needs ~2^-126 ~ 28 sigma of the
            # group log-sum — never happens; masked rows multiply as
            # exact 1.
            scale = jnp.asarray(1.0 / (1 << 24), fdt)
            u_all = ((ug[:, :a_pad] >> 8).astype(jnp.int32).astype(fdt)
                     * scale + jnp.asarray(2.0 ** -25, fdt))
            rmask = (jax.lax.broadcasted_iota(jnp.int32, (1, a_pad, 1), 1)
                     < alpha_int).astype(fdt)
            u_m = u_all * rmask + (1.0 - rmask)
            # group products via tile-aligned sublane split (a_pad % 8 == 0)
            u4 = u_m.reshape(bt, a_pad // 8, 8, n)
            prod8 = u4[:, :, 0]
            for r in range(1, 8):
                prod8 = prod8 * u4[:, :, r]
            gam = -jnp.sum(jnp.log(prod8), axis=1)       # (bt, n)
            u128 = ((ug[:, a_pad, :128] >> 8).astype(jnp.int32).astype(fdt)
                    * scale + jnp.asarray(2.0 ** -25, fdt))
            return obr, obi, oar, oai, gam, u128

        # Mosaic accepts at most 2 seed words: mix the iteration into the
        # first word with an odd multiplier (injective mod 2^32, so
        # distinct k -> distinct word; wraparound is deterministic).
        kmix = jnp.int32(-1640531527)  # 0x9E3779B9
        if not prefetch_rng:
            obr, obi, oar, oai, gam, u128 = draw_rand(
                seed_ref[0, 0] + k * kmix)
        else:
            # Software-pipelined streams: iteration k's randomness was
            # drawn into VMEM scratch during iteration k-1 (see the tail
            # of this kernel), so the Box-Muller/log transcendentals (VPU)
            # of the NEXT step are independent of THIS step's solve
            # matmuls (MXU) and Mosaic can interleave the two pipes.
            # Stream identity (seed, sid, k) is unchanged — outputs are
            # bit-identical to the unpipelined form (verified on hardware).
            # MEASURED SLOWER (default off): 2.55 vs 2.15 ms/iter at the
            # bench config — the ~16 MB/step VMEM round-trip through the
            # double buffers costs more than the overlap recovers.
            @pl.when(k == 0)
            def _():
                a_, b_, c_, d_, e_, f_ = draw_rand(seed_ref[0, 0])
                rng_s[0][:] = a_
                rng_s[1][:] = b_
                rng_s[2][:] = c_
                rng_s[3][:] = d_
                rng_s[4][:] = e_
                rng_s[5][:] = f_
            obr = rng_s[0][:]
            obi = rng_s[1][:]
            oar = rng_s[2][:]
            oai = rng_s[3][:]
            gam = rng_s[4][:]
            u128 = rng_s[5][:]
        u_pb = u128[:, :_P_PAD]
    else:
        oar = oa_re[0]
        oai = oa_im[0]
        obr = ob_re[0]
        obi = ob_im[0]
        gam = gam_ref[0]
        u_pb = u_ref[0][:, :_P_PAD]

    fr = jnp.broadcast_to(f_re[:][None], (bt, n, n))
    fi = jnp.broadcast_to(f_im[:][None], (bt, n, n))

    build_inv = None
    if warm_ns > 0:
        n2 = 2 * n

        def build_inv():
            # Drift-gated Newton-Schulz warm start, PER CHAIN: between
            # Gibbs iterations the system changes only through D(ps), so
            # the VMEM-carried inverse of the previous iteration is a
            # quadratically-converging starting point — ``warm_ns``
            # X <- X(2I - EX) steps (1-pass bf16; NS is self-correcting
            # and the solve is refined afterwards) replace the full
            # recursive rebuild unless the chain's relative bandpower move
            # exceeds ``drift_max`` (or this is the tile's first step).
            # The gate is evaluated per chain and applied with a select so
            # each chain's result depends only on its OWN trajectory —
            # a tile-wide max would couple chains and break bit-invariance
            # across batch compositions (mesh sharding / slot padding).
            psx = psx_s[:]
            rel = jnp.abs(ps - psx) / (
                0.5 * (jnp.abs(ps) + jnp.abs(psx))
                + 1e-6 * jnp.max(psx, axis=1, keepdims=True)
                + jnp.finfo(fdt).tiny)
            drift = jnp.max(rel, axis=1, keepdims=True)       # (bt, 1)
            # NaN-safe: warm-start ONLY when the drift is provably small —
            # a NaN drift (corrupted state) must fall through to the exact
            # rebuild, so the comparison is phrased as "k > 0 AND drift
            # small" (NaN <= x is False -> rebuild) rather than
            # "drift > max -> rebuild" (NaN > x is False -> would keep a
            # poisoned carried inverse forever).
            rebuild = jnp.logical_not(
                jnp.logical_and(k > 0, drift <= drift_max))   # (bt, 1)

            @pl.when(jnp.logical_not(jnp.all(rebuild)))
            def _():
                # NS refresh of the carried inverse; rebuild chains get
                # their lanes overwritten by the select below
                two_eye = 2.0 * _eye(n2, fdt)[None]
                for _ in range(warm_ns):
                    ex = _bmm1(e_s[:], inv_s[:])
                    inv_s[:] = _bmm1(inv_s[:], two_eye - ex)

            @pl.when(jnp.any(rebuild))
            def _():
                w_s[:] = e_s[:]
                _spd_inv_into(w_s, tmp_s, 0, n2,
                              mm=(_bmm if inv_passes == 3 else _bmm1))
                inv_s[:] = jnp.where(rebuild[:, :, None], tmp_s[:], inv_s[:])

            psx_s[:] = ps

    (sig_re, sig_im, amp_re, amp_im, chi, beta, noise_nu, bmask) = _draw_body(
        nfreqs_true, ntimes_true, refine, all_unflagged,
        pt_re[:], pt_im[:], ps, nih_ref[:],
        nid_re[:], nid_im[:], dw_re[:], dw_im[:], ninvf_ref[:], w_ref[:],
        fg_re[:], fg_im[:], g_re[:], g_im[:], mi_re[:], mi_im[:],
        a0_re[:], a0_im[:], fr, fi, oar, oai, obr, obi,
        e_s, w_s, inv_s, x_s, inv_passes=inv_passes,
        apply_passes=apply_passes, build_inv=build_inv, tmask=g_tmask,
    )

    if G > 1:
        # pool beta over each chain's G consecutive rows (chain-major,
        # G-aligned within the tile): every row then carries the chain's
        # TOTAL delay power and the pooled conditional below reproduces
        # the tflags semantics (models/tflags.py: beta sums over every
        # group's sk; alpha keeps the total-times convention)
        ri = jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 1)
        pool = ((ri // G) == (ci // G)).astype(fdt)
        beta = jnp.sum(pool[:, :, None] * beta[None, :, :], axis=1)

    # --- bandpower conditional, in-kernel --------------------------------
    # (gam / u_pb drawn in the per-chain streams above)
    tlog = tlog_ref[0:1, :][:, None, :]                       # (1, 1, S)
    qrow = q_ref[0:1, :][:, None, :]
    ps_new = _sample_bandpowers_body(beta, gam, u_pb, prior_static,
                                     tlog, qrow)

    if lean:
        if G > 1:
            tm = g_tmask
        else:
            tm = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, t), 2)
                  < ntimes_true).astype(fdt)
        chit_o[0] = jnp.sum(chi * tm, axis=2)
    else:
        sig_re_o[0] = sig_re
        sig_im_o[0] = sig_im
        amp_re_o[0] = amp_re
        amp_im_o[0] = amp_im
        chi_o[0] = chi
    ps_o[0] = ps_new
    noise_o[0] = noise_nu
    bmask_o[0] = bmask
    psf_o[:] = ps_new
    ps_s[:] = ps_new

    if inkernel_rng and prefetch_rng:
        # draw iteration k+1's randomness now — independent VPU work the
        # scheduler can overlap with this step's MXU matmuls
        @pl.when(k + 1 < k_total)
        def _():
            a_, b_, c_, d_, e_, f_ = draw_rand(
                seed_ref[0, 0] + (k + 1) * kmix)
            rng_s[0][:] = a_
            rng_s[1][:] = b_
            rng_s[2][:] = c_
            rng_s[3][:] = d_
            rng_s[4][:] = e_
            rng_s[5][:] = f_


@functools.partial(
    jax.jit,
    static_argnames=("nfreqs_true", "ntimes_true", "k_total", "alpha_int",
                     "prior_static", "batch_tile", "refine",
                     "all_unflagged", "inkernel_rng", "inv_passes",
                     "apply_passes", "warm_ns", "drift_max",
                     "prefetch_rng", "lean", "group_times"),
)
def gcr_megachain(pt_re, pt_im, nih, nid_re, nid_im, dw_re, dw_im,
                  ninv_full, w, fg_re, fg_im, g_re, g_im, mi_re, mi_im,
                  a0_re, a0_im, f_re, f_im, tlog8, q8, ps0,
                  oa_re=None, oa_im=None, ob_re=None, ob_im=None,
                  gam=None, u_pb=None, seed=None, sids=None, sidc=None,
                  *, nfreqs_true: int, ntimes_true: int, k_total: int,
                  alpha_int: int, prior_static=(), batch_tile: int = 8,
                  refine: int = 1, all_unflagged: bool = True,
                  inkernel_rng: bool = True, inv_passes: int = 3,
                  apply_passes: int = 3,
                  warm_ns: int = 0, drift_max: float = 0.25,
                  prefetch_rng: bool = False, lean: bool = False,
                  group_times=()):
    """K = ``k_total`` fused Gibbs iterations for the whole batch.

    Chain constants as in megastep.gcr_megastep; additionally ``tlog8/q8``
    are the (8, S) sublane-tiled InvGammaTable rows (log y and Q(alpha, y))
    and ``ps0`` the (B, n) initial padded bandpowers. ``prior_static`` is a
    static tuple of ``(bin_index, lo, hi)`` for the bounded bins.

    ``inkernel_rng=True`` (TPU production): ``sids`` is the (B,) int32
    global chain stream ids — each chain's in-kernel PRNG stream is seeded
    on (seed, sids[b], k) only, so results are invariant to batch
    composition (mesh sharding, multi-process slot padding, tile
    placement).

    With ``inkernel_rng=False`` (CPU / interpret), per-iteration randomness
    is passed in: omegas (K, B, n, t) x4, ``gam`` (K, B, n) Gamma(alpha)
    variates, ``u_pb`` (K, B, 128) uniforms (first 8 lanes used).

    Returns ``(sig_re, sig_im, amp_re, amp_im, chi, ps, noise_nu, bmask,
    ps_final)`` where the per-iteration outputs carry a leading K axis.

    ``lean=True``: the (n, t)-shaped fields (signal CRs, amplitudes,
    per-time chi) are never streamed to HBM; returns ``(chi_t, ps,
    noise_nu, bmask, ps_final)`` with ``chi_t`` (K, B, n) the chi sum over
    the true time samples — the only consumer of the big fields in
    store_cr=False runs (bench saturation sweeps, long validation chains).

    ``group_times`` (static, non-empty => grouped time-flags mode): each
    chain spans ``G = len(group_times)`` consecutive batch rows, row
    ``chain*G + g`` carrying the operators of the chain's g-th
    flag-pattern time group (``group_times[g]`` true times; 0 marks a
    dummy zero-operator pad group). The kernel pools beta over the
    chain's rows and draws ONE pooled bandpower state per chain
    (``alpha_int`` must be total-times - 1) — the tflags semantics of
    models/tflags.py at megachain speed. Requires G | batch_tile and
    chain-major rows; ``sidc`` gives the per-row CHAIN stream ids
    (defaults to row // G).
    """
    B, n, _ = pt_re.shape
    t = nid_re.shape[2]
    m = fg_re.shape[2]
    K = k_total

    G = len(group_times) if group_times else 1
    if G > 1:
        # grouped time-flags mode (see _megachain_kernel): rows are
        # chain-major (chain, group) pairs; pooling blocks of G rows must
        # stay aligned within every batch tile, and padding must append
        # whole chains
        if batch_tile % G:
            raise ValueError(
                f"len(group_times)={G} must divide batch_tile={batch_tile}")
        if B % G:
            raise ValueError(
                f"grouped batch rows ({B}) must be a multiple of "
                f"len(group_times)={G} (chain-major row layout)")

    pad_b = (-B) % batch_tile
    batched = [pt_re, pt_im, nih, nid_re, nid_im, dw_re, dw_im,
               ninv_full, w, fg_re, fg_im, g_re, g_im, mi_re, mi_im,
               a0_re, a0_im]
    per_iter = []
    if not inkernel_rng:
        per_iter = [oa_re, oa_im, ob_re, ob_im, gam, u_pb]
    else:
        if sids is None:
            sids = jnp.arange(B, dtype=jnp.int32)
        sids = jnp.asarray(sids, dtype=jnp.int32)
        if G > 1:
            if sidc is None:
                sidc = jnp.repeat(jnp.arange(B // G, dtype=jnp.int32), G)
            sidc = jnp.asarray(sidc, dtype=jnp.int32)
    if pad_b:
        def pb(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad_b,) + x.shape[1:])], 0)
        batched = [pb(x) for x in batched]
        ps0 = pb(ps0)
        if inkernel_rng:
            sids = pb(sids)
            if G > 1:
                sidc = pb(sidc)

        def pbk(x):  # (K, B, ...) -> pad axis 1
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:, :1], x.shape[:1] + (pad_b,)
                                     + x.shape[2:])], 1)
        per_iter = [pbk(x) for x in per_iter]
    bp = batched[0].shape[0]
    tiles = bp // batch_tile
    grid = (tiles, K)

    bmat = lambda d2, d3: pl.BlockSpec((batch_tile, d2, d3),
                                       lambda i, k: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    bvec = pl.BlockSpec((batch_tile, n), lambda i, k: (i, 0),
                        memory_space=pltpu.VMEM)
    bshared = pl.BlockSpec((n, n), lambda i, k: (0, 0),
                           memory_space=pltpu.VMEM)
    btab = pl.BlockSpec((8, tlog8.shape[1]), lambda i, k: (0, 0),
                        memory_space=pltpu.VMEM)
    kmat = lambda d2, d3: pl.BlockSpec((1, batch_tile, d2, d3),
                                       lambda i, k: (k, i, 0, 0),
                                       memory_space=pltpu.VMEM)
    kvec = pl.BlockSpec((1, batch_tile, n), lambda i, k: (k, i, 0),
                        memory_space=pltpu.VMEM)

    in_specs = [
        bmat(n, n), bmat(n, n),            # p_tilde
        bvec,                              # nih
        bmat(n, t), bmat(n, t),            # ni_d
        bmat(n, t), bmat(n, t),            # d_w
        bvec, bvec,                        # ninv_full, w
        bmat(n, m), bmat(n, m),            # fg
        bmat(n, m), bmat(n, m),            # g_mat
        bmat(m, m), bmat(m, m),            # maa_inv
        bmat(m, t), bmat(m, t),            # a0
        bshared, bshared,                  # f
        btab, btab,                        # invgamma table rows
        bvec,                              # ps0
    ]
    operands = list(batched) + [f_re, f_im, tlog8, q8, ps0]
    if inkernel_rng:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, k: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(seed, dtype=jnp.int32).reshape(1, 1))
        in_specs.append(pl.BlockSpec((1, bp), lambda i, k: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(sids.reshape(1, bp))
        if G > 1:
            in_specs.append(pl.BlockSpec((1, bp), lambda i, k: (0, 0),
                                         memory_space=pltpu.SMEM))
            operands.append(sidc.reshape(1, bp))
    else:
        in_specs += [kmat(n, t), kmat(n, t),   # omega_a (delay basis)
                     kmat(n, t), kmat(n, t),   # omega_b
                     kvec,                     # gamma variates
                     pl.BlockSpec((1, batch_tile, 128),
                                  lambda i, k: (k, i, 0),
                                  memory_space=pltpu.VMEM)]
        operands += per_iter
    if lean:
        out_specs = [
            kvec,                          # chi_t (time-reduced)
            kvec, kvec, kvec,              # ps, noise_nu, bmask
            bvec,                          # final ps state
        ]
        out_shape = [
            jax.ShapeDtypeStruct((K, bp, n), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, n), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, n), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, n), jnp.float32),
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
        ]
    else:
        out_specs = [
            kmat(n, t), kmat(n, t),            # sig
            kmat(m, t), kmat(m, t),            # amps
            kmat(n, t),                        # chisq
            kvec, kvec, kvec,                  # ps, noise_nu, bmask
            bvec,                              # final ps state
        ]
        out_shape = [
            jax.ShapeDtypeStruct((K, bp, n, t), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, n, t), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, m, t), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, m, t), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, n, t), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, n), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, n), jnp.float32),
            jax.ShapeDtypeStruct((K, bp, n), jnp.float32),
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
        ]
    n2 = 2 * n
    scratch_shapes = [
        pltpu.VMEM((batch_tile, n2, n2), jnp.float32),  # E
        pltpu.VMEM((batch_tile, n2, n2), jnp.float32),  # Schur workspace
        pltpu.VMEM((batch_tile, n2, n2), jnp.float32),  # inverse
        pltpu.VMEM((batch_tile, n2, t), jnp.float32),   # embedded RHS
        pltpu.VMEM((batch_tile, n), jnp.float32),       # ps state
        pltpu.VMEM((batch_tile, n), jnp.float32),       # ps of carried inv
    ]
    if warm_ns > 0:
        # rebuild target for the per-chain gate select
        scratch_shapes.append(pltpu.VMEM((batch_tile, n2, n2), jnp.float32))
    if inkernel_rng and prefetch_rng:
        # software-pipeline buffers for the next iteration's randomness
        scratch_shapes += [
            pltpu.VMEM((batch_tile, n, t), jnp.float32),  # omega_b re
            pltpu.VMEM((batch_tile, n, t), jnp.float32),  # omega_b im
            pltpu.VMEM((batch_tile, n, t), jnp.float32),  # omega_a re
            pltpu.VMEM((batch_tile, n, t), jnp.float32),  # omega_a im
            pltpu.VMEM((batch_tile, n), jnp.float32),     # Gamma(alpha)
            pltpu.VMEM((batch_tile, 128), jnp.float32),   # prior uniforms
        ]
    outs = pl.pallas_call(
        functools.partial(_megachain_kernel, nfreqs_true, ntimes_true,
                          refine, all_unflagged, inkernel_rng, K,
                          alpha_int, tuple(prior_static), inv_passes,
                          apply_passes, warm_ns, drift_max, prefetch_rng,
                          lean, tuple(group_times)),
        interpret=(jax.default_backend() == "cpu"),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(*operands)
    if pad_b:
        outs = [o[:, :B] for o in outs[:-1]] + [outs[-1][:B]]
    return tuple(outs)
