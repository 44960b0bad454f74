"""Multi-chip scaling utilities."""

from .batch import batched_solve, dp_train_step, make_mesh, replicate
from .horizon import shard_over_horizon
from .particles import (particle_partition_specs, particle_sharded_solve,
                        particle_sharded_batched_solve)

__all__ = [
    "batched_solve",
    "dp_train_step",
    "make_mesh",
    "replicate",
    "particle_partition_specs",
    "particle_sharded_solve",
    "particle_sharded_batched_solve",
    "shard_over_horizon",
]
