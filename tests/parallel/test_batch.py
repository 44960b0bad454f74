"""Multi-chip scaling tests on the 8-virtual-device CPU mesh (P5 in
SURVEY §2.4: batched independent solves sharded over ICI; data-parallel
BNN training with psum'd gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pddp_tpu.controllers.ilqr import ILQROptions, solve
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.parallel import batched_solve, dp_train_step, make_mesh


def test_virtual_device_count():
    assert jax.device_count() == 8


@pytest.mark.proof
def test_batched_solve_sharded_matches_single_device():
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    opts = ILQROptions(n_iterations=2, max_evals=8)

    B = 16
    z0s = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 2))
    U0s = 0.1 * jnp.ones((B, 5, 1))

    mesh = make_mesh()
    r_sharded = batched_solve(model, cost, z0s, U0s, opts,
                              encoding=encoding, mesh=mesh)
    r_local = batched_solve(model, cost, z0s, U0s, opts, encoding=encoding)

    assert r_sharded.J_opt.shape == (B,)
    np.testing.assert_allclose(r_sharded.J_opt, r_local.J_opt, rtol=1e-5)
    np.testing.assert_allclose(r_sharded.U, r_local.U, rtol=1e-4, atol=1e-6)

    # The batch axis is actually sharded over the mesh.
    shard_devices = {s.device for s in r_sharded.J_opt.addressable_shards}
    assert len(shard_devices) == 8


def test_dp_train_step_matches_single_device_grads():
    """psum'd data-parallel step == full-batch step on one device."""
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    W = jax.random.normal(k1, (4, 2))
    batch = {
        "x": jax.random.normal(k2, (32, 4)),
        "y": jax.random.normal(k3, (32, 2)),
    }

    def loss_fn(W, b):
        pred = b["x"] @ W
        return jnp.mean((pred - b["y"]) ** 2)

    opt = optax.sgd(0.1)
    opt_state = opt.init(W)

    W_dp, _, loss_dp = dp_train_step(loss_fn, W, opt, opt_state, batch, mesh)

    grads = jax.grad(loss_fn)(W, batch)
    updates, _ = opt.update(grads, opt.init(W), W)
    W_ref = optax.apply_updates(W, updates)

    np.testing.assert_allclose(W_dp, W_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(loss_dp, loss_fn(W, batch), rtol=1e-5)


def test_graft_dryrun_multichip():
    """The driver's multi-chip validation path must pass on 8 devices."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)
    finally:
        sys.path.remove("/root/repo")


def test_batched_solve_chunked_matches_unchunked():
    """chunk= runs the batch as sequential lax.map steps of vmapped
    solves; results must be identical to the fully-vmapped batch, both
    locally and sharded over the mesh."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    opts = ILQROptions(n_iterations=2, max_evals=8)

    B = 16
    z0s = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (B, 2))
    U0s = 0.1 * jnp.ones((B, 5, 1))

    r_full = batched_solve(model, cost, z0s, U0s, opts, encoding=encoding)
    r_chunked = batched_solve(model, cost, z0s, U0s, opts,
                              encoding=encoding, chunk=8)
    np.testing.assert_allclose(r_chunked.J_opt, r_full.J_opt, rtol=1e-12)
    np.testing.assert_allclose(r_chunked.U, r_full.U, rtol=1e-12)

    mesh = make_mesh()
    r_sharded = batched_solve(model, cost, z0s, U0s, opts,
                              encoding=encoding, mesh=mesh, chunk=8)
    assert r_sharded.J_opt.shape == (B,)
    np.testing.assert_allclose(r_sharded.J_opt, r_full.J_opt, rtol=1e-5)

    with pytest.raises(ValueError):
        batched_solve(model, cost, z0s, U0s, opts, encoding=encoding,
                      chunk=7)


def test_batched_solve_reuses_one_executable():
    """Repeat batched_solve calls with same-structure problems must hit
    one cached executable — the jitted entry point is module-level with
    model/cost/opts as pytree arguments. (A per-call jax.jit(vmap(
    closure)) re-traces the whole solve graph every call: ~40 s/call for
    a 100-particle BNN model.)"""
    from pddp_tpu.parallel.batch import _vsolve_jit

    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    opts = ILQROptions(n_iterations=2, max_evals=8)
    z0s = 0.05 * jax.random.normal(jax.random.PRNGKey(2), (8, 2))
    U0s = 0.1 * jnp.ones((8, 5, 1))

    batched_solve(model, cost, z0s, U0s, opts, encoding=encoding)
    batched_solve(model, cost, z0s, U0s, opts, encoding=encoding, chunk=4)
    size0 = _vsolve_jit._cache_size()
    # Different problem values, same structure: no new trace — neither
    # full-batch nor chunked.
    batched_solve(model, cost, z0s + 0.1, 2 * U0s, opts, encoding=encoding)
    batched_solve(model, cost, z0s - 0.1, U0s, opts, encoding=encoding,
                  chunk=4)
    assert _vsolve_jit._cache_size() == size0


def test_batched_solve_bnn_bf16_close_to_f32():
    """The opt-in reduced-precision MLP (compute_dtype=bfloat16) tracks the
    f32 batched BNN solve: same shapes, finite costs, small relative J
    deviation (docs/PERFORMANCE.md §8)."""
    from pddp_tpu.encoding import encode
    from pddp_tpu.models.bnn import bnn_dynamics_model_factory

    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    N, B, P = 4, 4, 8

    def build(compute_dtype):
        cls = bnn_dynamics_model_factory(
            2, 1, [8, 8], angular_indices=(0,), non_angular_indices=(1,),
            compute_dtype=compute_dtype)
        return cls.init(jax.random.PRNGKey(0), n_particles=P, horizon=N + 1,
                        dtype=jnp.float64)

    z0 = encode(jnp.zeros(2), V=1e-2 * jnp.ones(2), encoding=enc)
    z0s = jnp.broadcast_to(z0, (B,) + z0.shape)
    U0s = 0.1 * jnp.ones((B, N, 1))
    opts = ILQROptions(n_iterations=2, max_evals=6)

    r32 = batched_solve(build(None), PendulumCost(), z0s, U0s, opts,
                        encoding=enc)
    r16 = batched_solve(build(jnp.bfloat16), PendulumCost(), z0s, U0s, opts,
                        encoding=enc)
    assert r16.J_opt.shape == r32.J_opt.shape
    assert bool(jnp.all(jnp.isfinite(r16.J_opt)))
    np.testing.assert_allclose(np.asarray(r16.J_opt), np.asarray(r32.J_opt),
                               rtol=0.05)
