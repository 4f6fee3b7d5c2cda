"""Distribution layer: device meshes, baseline partitioning, multi-host
bootstrap. Replaces the reference's mpi4py scatter/gather/barrier
(run-hydra-pspec.py:26-31,483,557-560) with jax.sharding."""

from . import mesh, partition
from .mesh import make_mesh, shard_batch
from .partition import split_for_ranks
