"""Horizon-axis (sequence-parallel) sharding of the Riccati backward pass.

The associative-scan Riccati (ops.riccati.parallel_backward) is O(log N)
depth of batched matrix algebra over the time axis — exactly the shape
XLA's SPMD partitioner scales over a mesh: shard the local model's
time-major arrays over an ``sp`` axis and jit inserts the collectives for
the partitioned associative scan (the scaling-book "annotate shardings,
let XLA work" recipe; no shard_map needed). This is the long-horizon
scaling axis: the reference's per-step Python loop
(/root/reference/pddp/controllers/ilqr.py:627-672) is inherently
sequential, while this path splits H over devices.

Useful when H is large enough that one chip's Riccati pass dominates
(H >~ 10^4); at small H the sequential scan wins (docs/PERFORMANCE.md §8).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_over_horizon"]


def shard_over_horizon(derivs, mesh: Mesh, axis_name: str = "sp"):
    """Shards a local model's time-major arrays over the mesh.

    ``derivs`` is the (Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu) tuple
    produced by ``controllers.ilqr.forward``/``local_model`` (leading axis
    N or N+1). Leaves whose leading dimension divides the mesh axis are
    sharded over it; the rest (the N+1-length value arrays when N is
    divisible) stay replicated — XLA repartitions them internally.

    Feed the result to ``jax.jit(ops.riccati.parallel_backward)``: the
    computation follows the data onto the mesh.
    """
    n_dev = mesh.shape[axis_name]
    sharded = NamedSharding(mesh, P(axis_name))

    def put(x):
        if x.ndim >= 1 and x.shape[0] % n_dev == 0:
            return jax.device_put(x, sharded)
        return x

    return jax.tree_util.tree_map(put, derivs)
