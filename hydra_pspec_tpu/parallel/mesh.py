"""Device mesh construction and batch sharding.

The sampler's parallelism axes are (baseline, chain) — both embarrassingly
parallel (SURVEY.md §2.6). We map their flattened product onto a 1D device
mesh; within a device the batch is a vmap axis. No collectives run inside
the sampling loop; cross-device communication exists only for diagnostics
aggregation (psum over the mesh), mirroring the reference's communication
pattern (object scatter + gather of timing dicts only, SURVEY.md §2.7).
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Sharding that splits a leading batch axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch(n: int, n_shards: int) -> int:
    """Padded batch size divisible by the mesh; padding entries are dummy
    chains whose outputs are dropped on the host."""
    return ((n + n_shards - 1) // n_shards) * n_shards


def shard_batch(tree, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place every array in ``tree`` with its leading axis sharded over the
    mesh (arrays must already have a batch-divisible leading axis)."""
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bootstrap: ``jax.distributed.initialize`` (the TPU-native
    replacement for the reference's MPI_COMM_WORLD setup,
    run-hydra-pspec.py:26-31). No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
