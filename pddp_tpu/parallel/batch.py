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
                  mesh: Mesh = None, axis_name="dp", chunk=None):
    """B independent iLQR solves, vmapped and sharded over the mesh.

    z0s: (B, nz), U0s: (B, N, nu). B must divide by the mesh axis size.
    Returns an ILQRResult with a leading batch axis, sharded over the mesh.

    ``chunk`` bounds peak memory: the batch runs as ``B // chunk``
    host-dispatched calls of ONE compiled ``chunk``-wide vmapped program
    (results concatenated). Expensive models make this necessary — e.g.
    1024 BNN-dynamics solves (100 particles, [200, 200] MLP, Cholesky
    encoding) materialize ~20 GB of jacfwd activations fully vmapped, but
    fit comfortably at chunk=256. Host dispatch (µs) is negligible
    against a chunk's solve time (ms+); an in-graph ``lax.map`` variant
    measured ~25x slower (the loop-carried chunk layouts degenerate, the
    same pathology CLAUDE.md documents for cross-jit micro-benchmarks).
    With a mesh, ``chunk`` counts *global* problems (each device runs
    chunk / mesh-size lanes per call) and must divide by the mesh size.
    """

    # Batched solves are HBM-bound, where the structured Jacobian
    # factorization wins ~30% of local_model (docs/PERFORMANCE.md §8);
    # resolve the model's "auto" (None) setting to on. An explicit
    # True/False from the caller is respected.
    if getattr(model, "structured_jacobians", False) is None:
        from ..struct import replace
        model = replace(model, structured_jacobians=True)

    B = z0s.shape[0]
    chunked = chunk is not None and chunk < B
    if chunked and B % chunk:
        raise ValueError(f"batch {B} not divisible by chunk {chunk}")
    if chunked and mesh is not None:
        n_dev = mesh.devices.size
        if chunk % n_dev:
            raise ValueError(
                f"chunk {chunk} not divisible by mesh size {n_dev}")

    if mesh is None:
        put = lambda a: a
    else:
        # The solver is embarrassingly parallel over the batch: sharding
        # the batch axis is a complete SPMD partitioning — XLA inserts no
        # collectives (the scaling-book "pick a mesh, annotate, let XLA
        # work" recipe, degenerate case). Committed sharded inputs make
        # the jitted computation follow the data; each chunk is re-sharded
        # before dispatch (a host slice of a sharded array loses its
        # sharding).
        batch_sharding = NamedSharding(mesh, P(axis_name))
        put = lambda a: jax.device_put(a, batch_sharding)

    def call(zc, uc):
        return _vsolve_jit(model, cost, opts, put(zc), put(uc), encoding)

    if not chunked:
        return call(z0s, U0s)
    outs = [call(z0s[i:i + chunk], U0s[i:i + chunk])
            for i in range(0, B, chunk)]
    return jax.tree_util.tree_map(
        lambda *a: jnp.concatenate(a, axis=0), *outs)


@partial(jax.jit, static_argnames=("encoding",))
def _vsolve_jit(model, cost, opts, z0s, U0s, encoding):
    """Module-level jitted vmapped solve.

    Must NOT be rebuilt per batched_solve call: a fresh ``jax.jit(vmap(
    closure))`` misses JAX's in-memory executable cache every time and
    re-traces the whole solve graph per call (~40 s for a 100-particle
    BNN model — 100x the actual solve time — even when the persistent
    on-disk cache skips XLA recompilation). Model/cost/opts travel as
    pytree arguments, so distinct problem instances of the same structure
    reuse one executable."""

    def one(z0, U0):
        return solve(model, cost, z0, U0, opts, encoding=encoding)

    return jax.vmap(one)(z0s, U0s)


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
