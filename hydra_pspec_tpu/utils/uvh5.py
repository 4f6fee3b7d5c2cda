"""Direct-HDF5 uvh5 reader and visibility preprocessing.

Replaces the reference's pyuvdata dependency (run-hydra-pspec.py:305-322,
utils.py:105-199) with a thin h5py reader for the uvh5 layout
(Header/{ant_1_array, ant_2_array, freq_array, polarization_array, ...},
Data/{visdata, flags, nsamples}). Per-host partial reads — each host can
read only its baselines' rows — fix the reference's rank-0-loads-everything
scaling bottleneck (scripts/scaling_tests/scaling_tests_README.md:74-80).
"""
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

# AIPS polarization codes used by uvh5 (pyuvdata convention).
POL_NUM = {"xx": -5, "yy": -6, "xy": -7, "yx": -8, "pI": 1}


@dataclass
class BaselineData:
    """One baseline's visibilities and metadata, shape (Ntimes, Nfreqs)."""

    antpair: tuple
    vis: np.ndarray
    flags: np.ndarray       # boolean, True = flagged (uvh5 convention)
    nsamples: np.ndarray
    freqs: np.ndarray       # Hz
    times: np.ndarray = field(default_factory=lambda: np.zeros(0))
    lsts: np.ndarray = field(default_factory=lambda: np.zeros(0))
    uvw: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))


def _decode(x):
    return x.decode() if isinstance(x, bytes) else x


def read_uvh5(
    path,
    antpairs: Optional[Sequence[tuple]] = None,
    freq_range: Optional[str] = None,
    pseudo_stokes: bool = True,
    convention: float = 1.0,
):
    """Read a uvh5 file into per-baseline arrays.

    Mirrors the reference ingest pipeline: baseline conjugation to
    ``ant1 < ant2`` (run-hydra-pspec.py:318 ``conjugate_bls``), pseudo-
    Stokes I formation ``pI = convention * (XX + YY)``
    (utils.py:105-132), and frequency selection (utils.py:135-199).

    Returns ``(baselines, freqs_hz)`` where ``baselines`` is a list of
    :class:`BaselineData` sorted by (ant1, ant2).
    """
    import h5py

    path = Path(path)
    with h5py.File(path, "r") as f:
        hdr = f["Header"]
        ant1 = hdr["ant_1_array"][:]
        ant2 = hdr["ant_2_array"][:]
        freqs = np.asarray(hdr["freq_array"][:]).reshape(-1)
        pols = list(hdr["polarization_array"][:])
        time_arr = hdr["time_array"][:]
        lst_arr = hdr["lst_array"][:] if "lst_array" in hdr else np.zeros_like(time_arr)
        uvw_arr = hdr["uvw_array"][:]

        freq_sel = np.arange(freqs.size)
        if freq_range:
            keep = filter_freqs(freq_range, freqs / 1e6)
            freq_sel = np.nonzero(np.isin(freqs / 1e6, keep))[0]
        freqs_out = freqs[freq_sel]

        # Conjugate to ant1 < ant2 ordering.
        conj = ant1 > ant2
        a_lo = np.where(conj, ant2, ant1)
        a_hi = np.where(conj, ant1, ant2)
        pairs = sorted({(int(a), int(b)) for a, b in zip(a_lo, a_hi)})
        if antpairs is not None:
            want = {tuple(sorted(p)) for p in antpairs}
            pairs = [p for p in pairs if p in want]

        vis_ds = f["Data/visdata"]
        flag_ds = f["Data/flags"]
        nsamp_ds = f["Data/nsamples"]

        def pol_index(name):
            code = POL_NUM[name]
            return pols.index(code) if code in pols else None

        ixx, iyy = pol_index("xx"), pol_index("yy")
        ipI = pols.index(POL_NUM["pI"]) if POL_NUM["pI"] in pols else None

        baselines = []
        for (a, b) in pairs:
            rows = np.nonzero((a_lo == a) & (a_hi == b))[0]
            order = np.argsort(time_arr[rows], kind="stable")
            rows = rows[order]
            vis = vis_ds[rows][:, freq_sel, :]
            flg = flag_ds[rows][:, freq_sel, :]
            nsm = nsamp_ds[rows][:, freq_sel, :]
            # Conjugate rows stored as (b, a).
            crow = conj[rows]
            vis[crow] = np.conj(vis[crow])
            if pseudo_stokes:
                if ipI is not None:
                    v = vis[..., ipI]
                    fl = flg[..., ipI]
                    ns = nsm[..., ipI]
                elif ixx is not None and iyy is not None:
                    v = convention * (vis[..., ixx] + vis[..., iyy])
                    fl = flg[..., ixx]  # see run-hydra-pspec.py:386-391 FIXME
                    ns = nsm[..., ixx]
                elif ixx is not None:
                    v = vis[..., ixx]
                    fl = flg[..., ixx]
                    ns = nsm[..., ixx]
                else:
                    raise ValueError(f"No xx/yy/pI polarization in {path}")
            else:
                v, fl, ns = vis, flg, nsm
            baselines.append(
                BaselineData(
                    antpair=(a, b),
                    vis=np.ascontiguousarray(v),
                    flags=np.ascontiguousarray(fl),
                    nsamples=np.ascontiguousarray(ns),
                    freqs=freqs_out,
                    times=time_arr[rows],
                    lsts=lst_arr[rows],
                    uvw=uvw_arr[rows],
                )
            )
    return baselines, freqs_out


def parse_ant_str(ant_str: str):
    """Parse the reference's ``--ant_str`` format: 'cross', 'all', or a
    comma list of underscore-joined pairs like '1_11,12_14'
    (run-hydra-pspec.py:40-47)."""
    ant_str = ant_str.strip()
    if ant_str in ("cross", "all", ""):
        return None
    pairs = []
    for tok in ant_str.split(","):
        a, b = tok.split("_")
        pairs.append((int(a), int(b)))
    return pairs


def filter_freqs(freq_str: str, freqs_in_mhz) -> np.ndarray:
    """Frequency subset selection (reference utils.py:135-199): a range
    '100-200.3', a comma list '100,110.4,150' (nearest-channel match), or a
    single value. Input/output in MHz."""
    freqs_in = np.asarray(freqs_in_mhz, dtype=float)
    if "-" in freq_str:
        lo, hi = (float(x) for x in freq_str.split("-"))
        mask = (freqs_in >= lo) & (freqs_in <= hi)
    else:
        vals = [float(x) for x in freq_str.split(",")]
        idx = [int(np.argmin(np.abs(freqs_in - v))) for v in vals]
        mask = np.zeros(freqs_in.size, dtype=bool)
        mask[idx] = True
    return freqs_in[mask]


def trim_flagged_channels(w, x):
    """Remove flagged channels from a 1D vector or square 2D matrix
    (reference utils.py:77-102). Host-side (dynamic output shape)."""
    w = np.asarray(w)
    x = np.asarray(x)
    assert x.shape in ((w.size,), (w.size, w.size)), (
        "Input array must have shape (w.size,) or (w.size, w.size)"
    )
    keep = w == 1.0
    if x.ndim == 1:
        return x[keep]
    return x[np.ix_(keep, keep)]


def collapse_flags_any_time(flags: np.ndarray) -> np.ndarray:
    """Per-channel weights: 0 if *any* time sample is flagged in that
    channel, else 1 (the driver's w_any collapse, run-hydra-pspec.py:529-535;
    input uses the uvh5 convention True = flagged)."""
    return (~np.any(flags, axis=0)).astype(float)
