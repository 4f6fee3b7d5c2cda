"""Baseline partitioning across hosts/devices.

Uses the reference's exact block rule (run-hydra-pspec.py:268-287) —
``quot + 1`` items for the first ``rem`` ranks — so per-rank workloads are
directly comparable with the reference's scaling study."""
from typing import Sequence


def split_for_ranks(data: Sequence, n_ranks: int):
    """Contiguous block partition of a list into ``n_ranks`` sublists
    (reference ``split_data_for_scatter``). Raises when there are fewer
    items than ranks (the reference calls comm.Abort,
    run-hydra-pspec.py:273-277)."""
    n = len(data)
    quot, rem = divmod(n, n_ranks)
    if quot == 0:
        raise ValueError(
            f"Number of baselines ({n}) should be >= number of ranks ({n_ranks})"
        )
    counts = [quot + 1 if r < rem else quot for r in range(n_ranks)]
    out, start = [], 0
    for c in counts:
        out.append(list(data[start : start + c]))
        start += c
    return out


def local_indices(n_items: int, process_id: int, num_processes: int):
    """Index range this process owns under :func:`split_for_ranks` — used
    for per-host partial file reads (fixing the reference's rank-0 load
    bottleneck, scaling_tests_README.md:74-80)."""
    quot, rem = divmod(n_items, num_processes)
    start = process_id * quot + min(process_id, rem)
    count = quot + (1 if process_id < rem else 0)
    return range(start, start + count)
