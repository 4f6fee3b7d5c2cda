"""Multi-baseline, multi-chain execution engine.

The reference distributes baselines over MPI ranks and times over forked
processes (run-hydra-pspec.py:483, pspec.py:287). Here the (baseline x
chain) product is one batch axis: chain constants are stacked into a single
pytree, the Gibbs chain is vmapped over it, and the batch axis is sharded
over the device mesh — so one jitted computation drives every chip with
zero collectives in the loop.
"""
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models import gcr, gibbs
from .models.gibbs import GibbsSample
from .parallel import mesh as pmesh
from .utils import io as hio


@dataclass
class BaselineJob:
    """One baseline's inference inputs (the reference's per-baseline dict,
    run-hydra-pspec.py:462-470)."""

    antpair: tuple
    d: np.ndarray              # (Ntimes, Nfreqs) complex, noise-injected
    w: np.ndarray              # (Nfreqs,) 1 = keep
    fgmodes: np.ndarray        # (Nfreqs, Nmodes)
    S_initial: np.ndarray      # (Nfreqs, Nfreqs) or bandpowers (Nfreqs,)
    Ninv: np.ndarray           # (Nfreqs,) diag, (Nfreqs, Nfreqs), or scalar
    out_dir: Optional[Path] = None


@dataclass
class RunResult:
    antpair: tuple
    chain: int
    signal_ps: np.ndarray
    ln_post: np.ndarray
    chisq: np.ndarray
    signal_cr: Optional[np.ndarray]
    fg_amps: Optional[np.ndarray]
    signal_S: np.ndarray
    out_dir: Optional[Path]
    write_time: float = 0.0


def _stack_ops(ops_list):
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ops_list)
    # The Fourier operator is identical across the batch (depends only on
    # Nfreqs) — keep a single shared copy, matching the vmap in_axes=None.
    return stacked._replace(fourier_op=ops_list[0].fourier_op)


def _batched_axes(ops):
    """vmap in_axes for a stacked ChainOperators: batch everything except
    the shared Fourier operator."""
    axes = jax.tree.map(lambda _: 0, ops)
    return axes._replace(fourier_op=None)


def run_baselines(
    jobs: Sequence[BaselineJob],
    ps_prior: np.ndarray,
    niter: int,
    *,
    seed: Optional[int] = None,
    nchains: int = 1,
    write_niter: int = 100,
    map_estimate: bool = False,
    store_cr: bool = True,
    jitter: float = 0.0,
    dtype=None,
    use_mesh: bool = True,
    checkpoint: bool = True,
    resume: bool = False,
    verbose: bool = False,
):
    """Run Gibbs chains for every (baseline, chain) pair.

    Returns a list of :class:`RunResult` (one per baseline per chain) and a
    timing dict. Incremental writes land every ``write_niter`` iterations
    with the reference's filenames (crash resilience, pspec.py:625-638) plus
    a resumable checkpoint (new capability; the reference cannot restart,
    SURVEY.md §5.4).
    """
    if map_estimate:
        niter = 1
        write_niter = 1
    nbl = len(jobs)
    batch = nbl * nchains

    # --- per-(baseline, chain) constants -------------------------------
    ops_list, ps_list, keys, meta = [], [], [], []
    base_key = jax.random.key(seed if seed is not None else 0)
    for ib, job in enumerate(jobs):
        ops = gcr.build_chain_operators(job.d, job.w, job.fgmodes, job.Ninv, dtype=dtype)
        S0 = np.asarray(job.S_initial)
        if S0.ndim == 1:
            ps0 = jnp.clip(jnp.asarray(S0), 0.0, None)
        else:
            ps0 = gibbs.initial_ps(S0, ops.fourier_op)
        for ic in range(nchains):
            ops_list.append(ops)
            ps_list.append(ps0)
            keys.append(jax.random.fold_in(jax.random.fold_in(base_key, ib), ic))
            meta.append((ib, ic))

    # --- pad to the mesh and shard --------------------------------------
    dev_mesh = pmesh.make_mesh() if use_mesh else None
    nshards = len(dev_mesh.devices.flat) if dev_mesh is not None else 1
    padded = pmesh.pad_batch(batch, nshards)
    while len(ops_list) < padded:
        ops_list.append(ops_list[-1])
        ps_list.append(ps_list[-1])
        keys.append(keys[-1])

    ops_b = _stack_ops(ops_list)
    ps_b = jnp.stack(ps_list)
    keys_b = jnp.stack(keys)
    prior = jnp.asarray(ps_prior)
    if dev_mesh is not None:
        fop = jax.device_put(
            ops_b.fourier_op, pmesh.replicated_sharding(dev_mesh)
        )
        sharded = pmesh.shard_batch(
            {"ops": ops_b._replace(fourier_op=None), "ps": ps_b, "keys": keys_b},
            dev_mesh,
        )
        ops_b = sharded["ops"]._replace(fourier_op=fop)
        ps_b, keys_b = sharded["ps"], sharded["keys"]

    chain_fn = jax.jit(
        jax.vmap(
            gibbs.run_chain,
            in_axes=(0, _batched_axes(ops_b), 0, None, None, None, None, None),
        ),
        static_argnums=(4, 5, 6, 7),
    )

    # --- resume ----------------------------------------------------------
    start_iter = 0
    if resume and jobs[0].out_dir is not None:
        ck = hio.load_checkpoint(_chain_dir(jobs[0].out_dir, jobs[0].antpair, 0, nchains))
        if ck is not None and ck["ps"].shape == (padded, ps_b.shape[-1]):
            start_iter = ck["iteration"]
            ps_b = jnp.asarray(ck["ps"])
            if verbose:
                print(f"resuming from iteration {start_iter}")

    # --- chunked scan with host flushes ---------------------------------
    host_chunks = []
    write_time = 0.0
    t_process0 = time.perf_counter()
    done = start_iter
    while done < niter:
        n = min(write_niter, niter - done)
        chunk_keys = jax.vmap(lambda k: jax.random.fold_in(k, done))(keys_b)
        ps_b, samples = chain_fn(
            chunk_keys, ops_b, ps_b, prior, n, map_estimate, jitter, store_cr
        )
        host = jax.device_get(samples)
        host_chunks.append(host)
        done += n
        if verbose:
            print(f"iter {done}/{niter}")
        t0 = time.perf_counter()
        if jobs[0].out_dir is not None:
            _flush(jobs, meta, host_chunks, ops_list, nchains, store_cr)
            if checkpoint:
                for (ib, ic) in meta:
                    hio.save_checkpoint(
                        _chain_dir(jobs[ib].out_dir, jobs[ib].antpair, ic, nchains),
                        iteration=done,
                        ps=np.asarray(ps_b),
                        key_data=jax.random.key_data(keys_b),
                        extra={"niter": niter},
                    )
                    break  # one global checkpoint (state covers all chains)
        write_time += time.perf_counter() - t0
    t_process = time.perf_counter() - t_process0

    results = _collect(jobs, meta, host_chunks, ops_list, nchains, store_cr, write_time)
    timings = {"process": t_process, "write": write_time, "niter": niter, "batch": batch}
    return results, timings


def _chain_dir(out_dir, antpair, chain, nchains):
    d = Path(out_dir)
    if nchains > 1:
        d = d / f"chain-{chain}"
    return d


def _slice_batch(host_chunks, idx, store_cr):
    ps = np.concatenate([c.ps[:, idx] for c in host_chunks])
    lnp = np.concatenate([np.atleast_1d(c.ln_post[:, idx]) for c in host_chunks])
    if store_cr:
        cr = np.concatenate([c.signal_cr[:, idx] for c in host_chunks])
        fga = np.concatenate([c.fg_amps[:, idx] for c in host_chunks])
        chi = np.concatenate([c.chisq[:, idx] for c in host_chunks])
    else:
        cr = None
        fga = None
        chi = np.concatenate([np.atleast_1d(c.chisq[:, idx]) for c in host_chunks])
    return ps, lnp, cr, fga, chi


def _final_S(ps_last, ops):
    n = ps_last.shape[-1]
    from .ops.fourier import covariance_from_pspec

    return np.asarray(
        covariance_from_pspec(jnp.asarray(ps_last) / n**2, ops.fourier_op)
    )


def _flush(jobs, meta, host_chunks, ops_list, nchains, store_cr):
    for bidx, (ib, ic) in enumerate(meta):
        job = jobs[ib]
        if job.out_dir is None:
            continue
        ps, lnp, cr, fga, chi = _slice_batch(host_chunks, bidx, store_cr)
        d = _chain_dir(job.out_dir, job.antpair, ic, nchains)
        hio.write_numpy_files(
            d,
            cr if cr is not None else np.zeros(0),
            _final_S(ps[-1], ops_list[bidx]),
            ps,
            fga if fga is not None else np.zeros(0),
            chi,
            lnp,
        )


def _collect(jobs, meta, host_chunks, ops_list, nchains, store_cr, write_time):
    results = []
    for bidx, (ib, ic) in enumerate(meta):
        job = jobs[ib]
        ps, lnp, cr, fga, chi = _slice_batch(host_chunks, bidx, store_cr)
        results.append(
            RunResult(
                antpair=job.antpair,
                chain=ic,
                signal_ps=ps,
                ln_post=lnp,
                chisq=chi,
                signal_cr=cr,
                fg_amps=fga,
                signal_S=_final_S(ps[-1], ops_list[bidx]),
                out_dir=None if job.out_dir is None
                else _chain_dir(job.out_dir, job.antpair, ic, nchains),
                write_time=write_time,
            )
        )
    return results


def gelman_rubin(ps_chains: np.ndarray) -> np.ndarray:
    """Split-R-hat convergence diagnostic over chains: input
    (Nchains, Niter, Nfreqs) bandpower samples, output (Nfreqs,). New
    capability enabled by cheap multi-chain batching (BASELINE.json calls
    for cross-host collectives only for convergence diagnostics)."""
    c, n, k = ps_chains.shape
    half = n // 2
    splits = ps_chains[:, :half], ps_chains[:, half : 2 * half]
    x = np.concatenate(splits, axis=0)  # (2c, half, k)
    m, nn = x.shape[0], x.shape[1]
    chain_means = x.mean(axis=1)
    chain_vars = x.var(axis=1, ddof=1)
    B = nn * chain_means.var(axis=0, ddof=1)
    W = chain_vars.mean(axis=0)
    var_hat = (nn - 1) / nn * W + B / nn
    return np.sqrt(var_hat / np.maximum(W, 1e-300))
