"""Multi-chip scaling: batched solves and data-parallel training over a mesh.

The reference is strictly single-process/single-device (SURVEY §0); the
TPU-native scaling axis (P5, SURVEY §2.4) is *independent solves*:
the entire iLQR/PDDP solver is a pure function, so a batch of B problems
vmaps into one program and shards over ICI with no cross-solve
communication. BNN training additionally offers classic data parallelism
(psum of gradients over the mesh).

All entry points take an explicit ``jax.sharding.Mesh``; they work
unchanged on a single chip (1-device mesh), a TPU slice, or a CPU mesh of
virtual devices (tests / dry runs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..controllers.ilqr import ILQROptions, solve
from ..encoding import StateEncoding

__all__ = ["make_mesh", "batched_solve", "dp_train_step", "replicate"]


def make_mesh(axis_name="dp", devices=None) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Replicates a pytree across the mesh (weights, options...)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree)


def batched_solve(model, cost, z0s, U0s, opts: ILQROptions,
                  encoding: StateEncoding = StateEncoding.DEFAULT,
                  mesh: Mesh = None, axis_name="dp"):
    """B independent iLQR solves, vmapped and sharded over the mesh.

    z0s: (B, nz), U0s: (B, N, nu). B must divide by the mesh axis size.
    Returns an ILQRResult with a leading batch axis, sharded over the mesh.
    """

    def one(z0, U0):
        return solve(model, cost, z0, U0, opts, encoding=encoding)

    vsolve = jax.vmap(one)

    if mesh is None:
        return jax.jit(vsolve)(z0s, U0s)

    batch_sharding = NamedSharding(mesh, P(axis_name))
    z0s = jax.device_put(z0s, batch_sharding)
    U0s = jax.device_put(U0s, batch_sharding)

    # The solver is embarrassingly parallel over the batch: sharding the
    # batch axis is a complete SPMD partitioning — XLA inserts no
    # collectives (the scaling-book "pick a mesh, annotate, let XLA work"
    # recipe, degenerate case).
    fn = jax.jit(vsolve,
                 in_shardings=(batch_sharding, batch_sharding),
                 out_shardings=batch_sharding)
    return fn(z0s, U0s)


def dp_train_step(loss_fn, params, opt, opt_state, batch, mesh: Mesh,
                  axis_name="dp"):
    """One data-parallel optimizer step: per-shard grads + psum over ICI.

    Args:
        loss_fn: params, batch_shard -> scalar loss (mean over shard).
        params / opt_state: replicated pytrees.
        opt: optax optimizer.
        batch: pytree of arrays with leading batch axis divisible by mesh.

    Returns:
        (params, opt_state, loss) with params/opt_state replicated.
    """
    import optax

    data_spec = P(axis_name)
    repl_spec = P()
    axis_size = mesh.shape[axis_name]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(repl_spec, repl_spec, data_spec),
             out_specs=(repl_spec, repl_spec, repl_spec))
    def step(params, opt_state, batch_shard):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch_shard)
        # Under shard_map's varying-manual-axes semantics, the gradient
        # w.r.t. replicated params is ALREADY all-reduced over the mesh
        # (the transpose of the implicit broadcast of params into the
        # per-shard loss is a psum riding ICI). Dividing by the axis size
        # turns that sum of per-shard means into the global-batch mean.
        grads = jax.tree_util.tree_map(lambda g: g / axis_size, grads)
        # The per-shard loss IS device-varying: average it explicitly.
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step(params, opt_state, batch)
