"""Horizon-axis (sequence-parallel) sharding of the associative-scan
Riccati backward (parallel/horizon.py) on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pddp_tpu.controllers.ilqr import forward
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.ops.riccati import parallel_backward
from pddp_tpu.parallel import make_mesh, shard_over_horizon

ENC = StateEncoding.IGNORE_UNCERTAINTY


def _derivs(H=64):
    model = CartpoleDynamicsModel(dt=0.05)
    cost = CartpoleCost()
    z0 = jnp.array([0.0, 0.0, 0.1, 0.0])
    U0 = 0.1 * jnp.ones((H, 1))
    return jax.jit(lambda z, u: forward(z, u, model, cost, ENC))(z0, U0)


def test_sp_sharded_riccati_matches_replicated():
    derivs = _derivs()
    pb = jax.jit(parallel_backward)
    k_ref, K_ref, _ = pb(*derivs)

    mesh = make_mesh("sp")
    derivs_sh = shard_over_horizon(derivs, mesh, "sp")
    # The N-length arrays actually shard; N+1-length stay replicated.
    assert "sp" in str(derivs_sh[1].sharding)  # F_z (N, nz, nz)
    k_sh, K_sh, ok = pb(*derivs_sh)
    # The gains come back sharded over the mesh (computation followed the
    # data) and match the replicated run up to reassociation noise.
    assert "sp" in str(k_sh.sharding)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(k_sh), np.asarray(k_ref),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(K_sh), np.asarray(K_ref),
                               rtol=1e-7, atol=1e-10)


def test_shard_over_horizon_is_identity_on_values():
    """The helper only moves data (shards divisible leading axes,
    replicates the rest) — values are untouched.

    (Equivalence of parallel_backward itself against the sequential
    backward is pinned separately in tests/ops/test_riccati.py; this
    module only certifies that sharding the time axis changes nothing.)"""
    derivs = _derivs(H=24)
    mesh = make_mesh("sp")
    derivs_sh = shard_over_horizon(derivs, mesh, "sp")
    for a, b in zip(derivs, derivs_sh):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Z has N+1 = 25 rows: not divisible, stays unsharded.
    assert "sp" not in str(derivs_sh[0].sharding)
