"""Particle-axis sharding tests (parallel/particles.py) on the
8-virtual-device CPU mesh.

The sharded solver must reproduce the unsharded solver exactly (up to
reduction reassociation): the ensemble mean/covariance psums are the only
cross-device communication, and they recompose the global statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pddp_tpu.controllers.ilqr import ILQROptions, solve
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.parallel import (make_mesh, particle_partition_specs,
                               particle_sharded_batched_solve,
                               particle_sharded_solve)

H = 4


def _setup(n_particles=16, encoding=StateEncoding.UPPER_TRIANGULAR_CHOLESKY):
    cls = bnn_dynamics_model_factory(4, 1, [8, 8], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=n_particles,
                     horizon=H + 1, dtype=jnp.float64)
    cost = CartpoleCost()
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=encoding)
    U0 = 0.1 * jnp.ones((H, 1))
    opts = ILQROptions(n_iterations=2, max_evals=6)
    return model, cost, z0, U0, opts


@pytest.mark.parametrize("encoding", [
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
    StateEncoding.STANDARD_DEVIATION_ONLY,
])
def test_particle_sharded_solve_matches_unsharded(encoding):
    model, cost, z0, U0, opts = _setup(encoding=encoding)
    r_ref = solve(model, cost, z0, U0, opts, encoding=encoding)
    mesh = make_mesh("pp")
    r_sh = particle_sharded_solve(model, cost, z0, U0, opts,
                                  encoding=encoding, mesh=mesh)
    np.testing.assert_allclose(r_sh.J_opt, r_ref.J_opt, rtol=1e-9)
    np.testing.assert_allclose(r_sh.U, r_ref.U, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(r_sh.Z, r_ref.Z, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(r_sh.K, r_ref.K, rtol=1e-6, atol=1e-8)
    assert int(r_sh.state) == int(r_ref.state)


def test_particle_sharded_batched_solve_2d_mesh():
    """dp x pp: independent solves over one axis, each solve's ensemble
    over the other; every lane must match its single-device solve."""
    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    model, cost, z0, U0, opts = _setup(encoding=enc)
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("dp", "pp"))

    B = 4
    z0s = jnp.broadcast_to(z0, (B,) + z0.shape) + 0.001 * jax.random.normal(
        jax.random.PRNGKey(3), (B,) + z0.shape)
    U0s = 0.1 * jnp.ones((B, H, 1))
    rb = particle_sharded_batched_solve(model, cost, z0s, U0s, opts,
                                        encoding=enc, mesh=mesh)
    assert rb.J_opt.shape == (B,)
    J_ref = jnp.stack([
        solve(model, cost, z0s[i], U0s[i], opts, encoding=enc).J_opt
        for i in range(B)
    ])
    np.testing.assert_allclose(rb.J_opt, J_ref, rtol=1e-9)


def test_particle_specs_structure():
    model, *_ = _setup()
    specs = particle_partition_specs(model, "pp")
    from jax.sharding import PartitionSpec as P
    assert specs.eps_in == P(None, "pp")
    assert specs.eps_out == P(None, "pp")
    # Dropout noise is per-particle; weights replicate.
    assert specs.net.dropouts[0].noise == P("pp")
    assert specs.net.layers[0].W == P()
    assert specs.X_mean == P()


def test_indivisible_particles_raise():
    model, cost, z0, U0, opts = _setup(n_particles=12)  # 12 % 8 != 0
    mesh = make_mesh("pp")
    with pytest.raises(ValueError, match="not divisible"):
        particle_sharded_solve(model, cost, z0, U0, opts,
                               encoding=StateEncoding.
                               UPPER_TRIANGULAR_CHOLESKY, mesh=mesh)
